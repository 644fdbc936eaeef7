package graft

import graft.sources.Export
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Export round-trips: artifact layout, schema fidelity, and the
  * partition pruning the BIOM layout exists for. */
class ExportSpec extends SparkSpec {

  test("contextual CSV round-trip preserves schema and values") {
    val out = Files.createTempDirectory("graft-x1").toString + "/csv"
    val rt = Export.contextualCsv(spark, sfDir, out)
    assert(rt.columns.toSeq == Seq("c_custkey", "c_name", "c_mktsegment",
      "o_orderkey", "o_orderdate", "o_totalprice"))
    // re-read totals must equal the pre-write totals exactly (doubles
    // survive the text round-trip via shortest-round-trip formatting)
    val direct = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F")
    assert(rt.count() == direct.count())
    val a = rt.agg(sum(graft.Dec.dec(col("o_totalprice")))).head().getDecimal(0)
    val b = direct.agg(sum(graft.Dec.dec(col("o_totalprice")))).head().getDecimal(0)
    assert(a == b, s"CSV round-trip drifted totals: $a vs $b")
  }

  test("BIOM matrix export partition-prunes on the row key") {
    val out = Files.createTempDirectory("graft-x2").toString + "/biom"
    val full = Export.biomMatrix(spark, sfDir, out)
    val names = full.select("n_name").collect().map(_.getString(0))
    assert(names.length >= 2, "need at least two partitions to show pruning")
    val one = spark.read.parquet(out).filter(col("n_name") === names.head)
    assert(one.count() == 1)
    val scan = one.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    // the scan must read ONE partition directory's files, not all of them
    assert(scan.metrics("numFiles").value < full.inputFiles.length,
      s"no pruning: read ${scan.metrics("numFiles").value} of ${full.inputFiles.length} files")
    assert(scan.toString.contains("PartitionFilters"),
      s"scan lacks partition filters:\n${scan.toString.take(800)}")
  }
}
