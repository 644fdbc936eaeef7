package graft

import graft.sources.Ingest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

class IngestSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-ingest").toString

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("env", StringType),
    StructField("ph", DoubleType)))

  test("permissive csv ingest quarantines malformed rows") {
    val csv = s"$tmp/samples.csv"
    Files.writeString(Paths.get(csv),
      """id,env,ph
        |1,soil,6.5
        |2,marine,8.1
        |oops,not-a-long,xyz
        |3,soil,5.9
        |""".stripMargin)
    val (good, bad) = Ingest.readCsv(spark, csv, schema)
    assert(good.count() == 3)
    assert(bad.count() == 1)
    assert(bad.head().getString(0).startsWith("oops"))
  }

  test("re-ingesting an overlapping batch is idempotent") {
    import spark.implicits._
    val batch1 = Seq((1L, "soil", 6.5), (2L, "marine", 8.1)).toDF("id", "env", "ph")
    val batch2 = Seq((2L, "marine", 8.1), (3L, "soil", 5.9)).toDF("id", "env", "ph")
    val merged = Ingest.dedupOnKey(batch1.union(batch2), "id")
    assert(merged.count() == 3)
    assert(Ingest.dedupOnKey(merged.union(batch2), "id").count() == 3)
  }

  test("scd2 merge produces all four outcomes with correct versioning") {
    import spark.implicits._
    val cur = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "seg", "bal")
    val inc = Seq((1L, "a", 10.0),  // unchanged
      (2L, "b", 25.0),              // changed → close v1, add v2
      (4L, "d", 40.0))              // added; id 3 missing → closed
      .toDF("id", "seg", "bal")
    val got = Ingest.scd2Merge(cur, inc, "id", Seq("seg", "bal")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getInt(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, "a", 10.0, 1, true),
      (2L, "b", 20.0, 1, false), (2L, "b", 25.0, 2, true),
      (3L, "c", 30.0, 1, false),
      (4L, "d", 40.0, 1, true)), s"bad merge: ${got.toSeq}")
  }

  test("landing write partitions by column and prunes on read") {
    import spark.implicits._
    val df = Seq((1L, "soil", 6.5), (2L, "marine", 8.1), (3L, "soil", 5.9))
      .toDF("id", "env", "ph")
    Ingest.land(df, s"$tmp/landed", "env")
    val back = spark.read.parquet(s"$tmp/landed").filter(col("env") === "soil")
    assert(back.count() == 2)
    assert(Files.exists(Paths.get(s"$tmp/landed/env=soil")))
  }

  test("schema evolution: merged read null-backfills the old batch only") {
    val out = Files.createTempDirectory("graft-x8").toString
    val m = Ingest.x8SchemaEvolution(spark, sfDir, out)
    m.collect() // materialize (writes both batches)
    val unified = spark.read.option("mergeSchema", "true").parquet(out)
    assert(unified.columns.contains("lang"),
      "merged schema lost the evolved column")
    // the old batch (even ids) must read back as NULL lang, the new
    // batch must keep its values — no cross-contamination
    assert(unified.filter(col("doc_id") % 2 === 0 &&
      col("lang").isNotNull).count() == 0, "old batch grew lang values")
    assert(unified.filter(col("doc_id") % 2 === 1 &&
      col("lang").isNull).count() == 0, "new batch lost lang values")
    // total coverage: nothing dropped across the two batches
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(unified.count() == n)
  }
}
