package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads travel as opaque
  * `binary` columns with a typed metadata struct alongside. The
  * decode/feature-extract step is STUBBED (no image/audio libs in
  * this container) behind [[MediaDecoder.decodeStub]], but the
  * Spark-side shape is real: schema, per-partition batched iteration
  * (the Scala analogue of mapInPandas' batch contract), and the
  * projection pipeline are all exercised and tested.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, fmt: String, payload: Array[Byte],
    width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, fmt: String, byte_len: Long,
    n_frames: Long, checksum: Long)

  /** Attach a fake-but-deterministic binary payload + metadata to each
    * document (stands in for an image/audio blob column). */
  def withMediaColumns(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("png"), lit("jpg"), lit("wav")),
        (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 512 + 64).cast("int").as("width"),
      (col("doc_id") % 256 + 64).cast("int").as("height"))

  /** Stubbed decoder: consumes payload bytes per partition in batches
    * — real pipelines swap the body for an image/audio library call;
    * the iterator/batch shape (and therefore the plan) is unchanged. */
  object MediaDecoder {
    def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.grouped(64).flatMap { batch => // batch like an Arrow chunk
        batch.iterator.map { r =>
          val len = r.payload.length.toLong
          MediaFeatures(r.doc_id, r.fmt, len,
            len / 256 + 1,
            r.payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000003))
        }
      }
  }

  /** Typed decode pipeline: DataFrame → Dataset[MediaRow] →
    * mapPartitions(decodeStub) → Dataset[MediaFeatures]. */
  def decodePipeline(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    withMediaColumns(docs).as[MediaRow]
      .mapPartitions(MediaDecoder.decodeStub)
  }

  /** Frame sampling over the (fake) media payload: one row per
    * 256-char frame with a deterministic content hash — the Spark-side
    * plumbing of a video/audio frame-sample stage (the real decoder
    * would replace the rolling hash with a codec call; the explode /
    * per-frame-row shape and partitioning are what scale). Frames are
    * char-addressed; ceil-division keeps the last frame non-empty, so
    * the per-frame fold never sees an empty range. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    frameSample(Tables.parallel(Tables.load(spark, dir, "documents")))

  def frameSample(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        // greatest(...,1): an EMPTY text would yield n_frames = 0 and
        // sequence(0, -1) defaults to step -1, emitting two bogus
        // frames (0 and -1) where the oracle's generate_series emits
        // none. Empty docs instead get one zero-length frame (hash 0)
        // on both engines.
        greatest(
          (floor((length(col("text")) - 1) / lit(256)) + lit(1)).cast("int"),
          lit(1)).as("n_frames"))
      .select(col("doc_id"), col("text"),
        col("n_frames").cast("long").as("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"),
        (least(col("frame_idx") * 256 + 256, length(col("text"))) -
          col("frame_idx") * 256).cast("long").as("frame_len"),
        // native PolyHash over the frame's substring — one linear pass
        // (the per-char ascii(substring) fold was O(frame²)); an
        // out-of-range substr yields "" → hash 0, matching the
        // oracle's empty generate_series fold
        graft.GraftFunctions.polyHash(
          col("text").substr(col("frame_idx") * 256 + 1, lit(256)))
          .as("frame_hash"))
      .orderBy("doc_id", "frame_idx")

  /** Oracle-checkable metadata projection (the decode-independent
    * part: format routing, payload sizing, frame estimation). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    withMediaColumns(docs)
      .select(col("doc_id"), col("fmt"),
        length(col("payload")).cast("long").as("byte_len"),
        (floor(length(col("payload")).cast("double") / lit(256.0)).cast("long") + 1L)
          .as("n_frames"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
      .orderBy("doc_id")
  }
}
