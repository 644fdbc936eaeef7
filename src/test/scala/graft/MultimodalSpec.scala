package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("decode pipeline produces features through mapPartitions") {
    val docs = Tables.load(spark, sfDir, "documents")
    val feats = Multimodal.decodePipeline(spark, docs)
    val n = docs.count()
    assert(feats.count() == n)
    val r = feats.filter(_.doc_id == 0).head()
    assert(Set("png", "jpg", "wav").contains(r.fmt))
    assert(r.byte_len > 0 && r.n_frames == r.byte_len / 256 + 1)
    assert(r.checksum >= 0 && r.checksum < 1000003)
  }

  test("media metadata is deterministic and schema-typed") {
    val m = Multimodal.mediaMeta(spark, sfDir)
    assert(m.schema.fieldNames.toSeq ==
      Seq("doc_id", "fmt", "byte_len", "n_frames", "width", "height"))
    val again = Multimodal.mediaMeta(spark, sfDir)
    assert(m.collect().toSeq == again.collect().toSeq)
  }

  test("frame sampling covers every char exactly once per document") {
    val docs = Tables.load(spark, sfDir, "documents")
    val frames = Multimodal.frameSample(spark, sfDir)
    // per doc: frame count = ceil(len/256), frame lengths sum to len
    val byDoc = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("nf"), max("n_frames").as("declared"),
        sum("frame_len").as("covered"))
      .join(docs.select(col("doc_id"), length(col("text")).cast("long").as("len")), "doc_id")
    assert(byDoc.filter(col("nf") =!= col("declared")).count() == 0)
    assert(byDoc.filter(col("covered") =!= col("len")).count() == 0,
      "frame lengths do not cover the payload exactly")
    assert(frames.filter(col("frame_len") <= 0).count() == 0, "empty frame emitted")
  }

  test("binary payload round-trips the text bytes") {
    val docs = Tables.load(spark, sfDir, "documents").limit(5)
    val back = Multimodal.withMediaColumns(docs)
      .select(col("doc_id"), decode(col("payload"), "UTF-8").as("text2"))
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .filter(col("text") =!= col("text2"))
    assert(back.count() == 0)
  }
}
