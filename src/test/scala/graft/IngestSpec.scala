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

  test("x10 constraint suite passes a clean corpus and pinpoints " +
       "exactly the planted violations on a mutated one") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val clean = graft.sources.Ingest.x10Constraints(docs, emb).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(clean.size == 5 && clean.values.forall(_._2),
      s"clean corpus failed constraints: $clean")
    // plant one violation per constraint: null text on doc 0, a
    // duplicated doc_id 1, a bad source on doc 2, an empty text on
    // doc 3 (range), and an orphan embedding id
    val n = docs.count()
    val mutated = docs
      .withColumn("text", when(col("doc_id") === 0, lit(null))
        .when(col("doc_id") === 3, lit("")).otherwise(col("text")))
      .withColumn("source", when(col("doc_id") === 2, lit("BAD!"))
        .otherwise(col("source")))
      .unionByName(docs.filter(col("doc_id") === 1))
    val embBad = emb.unionByName(
      emb.limit(1).withColumn("vec_id", lit(99999999L)))
    val got = graft.sources.Ingest.x10Constraints(mutated, embBad).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val m = n + 1 // the duplicated row
    assert(got("completeness_text") == ((r6((m - 1.0) / m), false)), got.toString)
    assert(got("uniqueness_doc_id") == ((r6((m - 1.0) / m), false)), got.toString)
    assert(got("domain_source") == ((r6((m - 1.0) / m), false)), got.toString)
    // range: the null text row ALSO fails the length check (null
    // comparison is not-true), alongside the planted empty text
    assert(got("range_text_length") == ((r6((m - 2.0) / m), false)), got.toString)
    assert(got("referential_embeddings") == ((1.0, false)), got.toString)
  }

  test("x12 zone-map manifest pins bucket stats, null counts and the " +
       "prune flag on a planted layout, and its flags actually prune") {
    import spark.implicits._
    // buckets: 0 (keys 0..255), 1 (256..511), 2 (512..767).
    // bucket 0: qtys 10/20 (prunable: max ≤ 45); bucket 1: 30/50 + a
    // NULL qty (not prunable); bucket 2: exactly 45 (prunable — the
    // boundary is ≤)
    val rows = Seq(
      (0L, 0L, java.lang.Double.valueOf(10.0), 100.0),
      (255L, 1L, java.lang.Double.valueOf(20.0), 200.0),
      (256L, 2L, java.lang.Double.valueOf(50.0), 300.0),
      (400L, 3L, java.lang.Double.valueOf(30.0), 50.0),
      (511L, 4L, null.asInstanceOf[java.lang.Double], 75.0),
      (600L, 5L, java.lang.Double.valueOf(45.0), 10.0))
      .toDF("l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val got = Ingest.x12StatsManifest(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7))))
      .toMap
    assert(got(0L) == ((2L, Some(10.0), Some(20.0), 0L, 100.0, 200.0, true)),
      got.toString)
    assert(got(1L) == ((3L, Some(30.0), Some(50.0), 1L, 50.0, 300.0, false)),
      got.toString)
    assert(got(2L) == ((1L, Some(45.0), Some(45.0), 0L, 10.0, 10.0, true)),
      got.toString)
    // the flag is a sound prune: no bucket marked prunable contains a
    // row matching l_quantity > 45
    val matches = rows.filter(col("l_quantity") > Ingest.ManifestQtyGt)
      .select(expr(s"l_orderkey div ${Ingest.ManifestStride}").as("bucket"))
      .distinct().as[Long].collect().toSet
    val prunable = got.collect { case (b, t) if t._7 => b }.toSet
    assert(matches.intersect(prunable).isEmpty,
      s"prunable buckets $prunable contain matches $matches")
  }

  test("x13 snapshot diff classifies all four change types exactly " +
       "on planted versions") {
    import spark.implicits._
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, "alpha"), (2L, "beta v2"), (4L, "delta"), (9L, "new"))
      .toDF("doc_id", "text")
    val got = Ingest.x13SnapshotDiff(v1, v2).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      "added" -> ((1L, 9L, 9L)),
      "removed" -> ((1L, 3L, 3L)),
      "changed" -> ((1L, 2L, 2L)),
      "unchanged" -> ((2L, 1L, 4L))), got.toString)
    // identical snapshots: one all-unchanged row
    val same = Ingest.x13SnapshotDiff(v1, v1).collect()
    assert(same.length == 1 && same.head.getString(0) == "unchanged" &&
      same.head.getLong(1) == 4L, same.mkString(";"))
  }

  test("x14 round trip: the clean census matches the source slice, " +
       "exactly the three planted malformed lines quarantine, raw " +
       "text recoverable") {
    import org.apache.spark.sql.functions._
    val out = s"$tmp/x14"
    val got = Ingest.x14CsvQuarantine(spark, sfDir, out).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.toString.toDouble)))).toMap
    val want = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F").count()
    assert(got("clean")._1 == want, got.toString)
    assert(got("quarantined") == ((3L, None)), got.toString)
    // the quarantined raw lines are the planted ones, byte-for-byte
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE, " +
        "o_orderdate STRING")
    val (_, bad) = Ingest.readCsv(spark, out, schema, header = false)
    val lines = bad.collect().map(_.getString(0)).sorted.toSeq
    assert(lines == Seq("1,F,1.00,2024-01-01,EXTRA,EXTRA,EXTRA",
      "1,F,notaprice,2024-01-01", "notakey,F,1.00,2024-01-01"),
      lines.mkString("|"))
  }
}
