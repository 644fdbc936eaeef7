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

  test("ImageIO decode recovers a known-pixel image exactly") {
    // hand-built 2×1 image: pixel (0,0) = RGB(10, 20, 30),
    // pixel (1,0) = RGB(255, 0, 128) — encode via the JDK, decode via
    // the real decoder, expect exact stats and the row-major hash
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, (10 << 16) | (20 << 8) | 30)
    img.setRGB(1, 0, (255 << 16) | (0 << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val feats = Multimodal.ImageDecoder.decodeImageIO(
      Iterator(Multimodal.ImageRow(7L, bos.toByteArray))).toSeq
    assert(feats.size == 1)
    val f = feats.head
    assert(f.width == 2 && f.height == 1 && f.channels == 3)
    assert(f.sum_r == 265 && f.sum_g == 20 && f.sum_b == 158)
    val px0 = (10 << 16) | (20 << 8) | 30
    val px1 = (255 << 16) | (0 << 8) | 128
    assert(f.pixel_hash == ((0L * 31 + px0) % 1000003 * 31 + px1) % 1000003)
  }

  test("image decode pipeline round-trips synthetic PNGs distributed") {
    val out = Multimodal.imageDecode(spark, sfDir).collect()
    val n = Tables.load(spark, sfDir, "documents").count()
    assert(out.length == n)
    // dimensions follow the doc_id derivation; stats in range
    assert(out.forall { r =>
      val id = r.getLong(0)
      r.getInt(1) == (id % Multimodal.DimWMod + Multimodal.DimWBase).toInt &&
      r.getInt(2) == (id % Multimodal.DimHMod + Multimodal.DimHBase).toInt &&
      r.getInt(3) == 3 &&
      r.getLong(4) <= 255L * r.getInt(1) * r.getInt(2)
    })
    // spot-check one doc against the pixel formula computed directly
    val r0 = out.find(_.getLong(0) == 1L).get
    val (w, h) = (r0.getInt(1), r0.getInt(2))
    var sr = 0L
    for (y <- 0 until h; x <- 0 until w) sr += (1 * 31 + x * 7 + y * 13) % 256
    assert(r0.getLong(4) == sr, s"sum_r ${r0.getLong(4)} != formula $sr")
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
