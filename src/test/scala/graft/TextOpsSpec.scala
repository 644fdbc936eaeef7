package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TextOpsSpec extends SparkSpec {

  private lazy val tinyDir: String = {
    val dir = Files.createTempDirectory("graft-text").toString
    import spark.implicits._
    Seq(
      (0L, "hello world x", "en", "src0", 13L),
      (1L, "der und das nicht und der", "de", "src0", 25L),
      (2L, "the the the a of and or", "en", "src0", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("fingerprint matches the independently computed rolling hash") {
    // fold of 'hello world x': verified against DuckDB list_reduce
    val fp = TextOps.fingerprint(spark, tinyDir)
      .filter(col("doc_id") === 0).head().getLong(1)
    assert(fp == 855297371L, s"got $fp")
  }

  test("language ID picks the dominant marker profile") {
    val res = TextOps.langId(spark, tinyDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(res(1L) == "de", s"got $res")
    assert(res(2L) == "en", s"got $res")
  }

  test("quality scoring penalizes repetition") {
    val res = TextOps.qualityScore(spark, tinyDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    // doc 2 is stopword spam with repetition; doc 0 is all-distinct
    assert(res(0L) > res(2L), s"got $res")
  }

  test("token counts: whitespace vs BPE-ish pieces") {
    val r = TextOps.tokenCount(spark, tinyDir)
      .filter(col("doc_id") === 0).head()
    assert(r.getLong(1) == 3) // hello world x
    assert(r.getLong(2) == 2) // 'hello' and 'world' are > 4 chars
    assert(r.getLong(3) == 5) // hell|o|worl|d|x
  }
}
