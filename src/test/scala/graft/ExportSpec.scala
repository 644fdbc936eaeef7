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

  test("BIOM v1 JSON is format-conformant and matches the parquet matrix") {
    val out = Files.createTempDirectory("graft-x3").toString + "/biom.json"
    val rt = Export.biomJson(spark, sfDir, out)
    // structural conformance: required BIOM v1 keys, dense index space
    val raw = spark.read.option("multiLine", "true").json(out).head()
    assert(raw.getAs[String]("format") == "Biological Observation Matrix 1.0.0")
    assert(raw.getAs[String]("matrix_type") == "sparse")
    assert(raw.getAs[String]("type") == "OTU table")
    val shape = raw.getSeq[Long](raw.fieldIndex("shape"))
    val rows = raw.getSeq[Any](raw.fieldIndex("rows"))
    val cols = raw.getSeq[Any](raw.fieldIndex("columns"))
    assert(shape.toSeq == Seq(rows.length.toLong, cols.length.toLong),
      s"shape $shape != rows×cols ${rows.length}×${cols.length}")
    val data = raw.getSeq[scala.collection.Seq[Double]](raw.fieldIndex("data"))
    assert(data.nonEmpty && data.forall(t => t.length == 3 &&
      t(0) >= 0 && t(0) < shape(0) && t(1) >= 0 && t(1) < shape(1)),
      "data triples out of shape bounds")
    // the parsed-back matrix must equal the q7 pivot cell-for-cell
    val pivot = graft.operators.Relational.q7AbundanceMatrix(spark, sfDir)
    val cells = pivot.collect().flatMap { r =>
      pivot.columns.zipWithIndex.drop(1).flatMap { case (c, i) =>
        Option(r.get(i)).map(v => (r.getString(0), c, v.asInstanceOf[Double]))
      }
    }.toSet
    // columns read by NAME — position shifted when region metadata landed
    val parsed = rt.collect().map(r => (
      r.getAs[String]("n_name"), r.getAs[String]("region"),
      r.getAs[String]("p_type"), r.getAs[Double]("abundance")))
    val got = parsed.map { case (n, _, p, v) => (n, p, v) }.toSet
    assert(got == cells, s"JSON round-trip matrix diverges from q7: " +
      s"missing=${(cells -- got).take(3)} extra=${(got -- cells).take(3)}")
    // the row METADATA field must carry each nation's true region
    val regionOf = Tables.dim(spark, sfDir, "nation")
      .join(Tables.dim(spark, sfDir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name", "r_name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val badRegion = parsed.filter { case (n, reg, _, _) => regionOf(n) != reg }
    assert(badRegion.isEmpty,
      s"BIOM row metadata region wrong for: ${badRegion.take(3).mkString(", ")}")
  }

  test("Krona TSV leaves carry the full 5-level rollup") {
    val out = Files.createTempDirectory("graft-x4").toString + "/krona"
    val rollup = Export.kronaTsv(spark, sfDir, out)
    // leaf lines: abundance + 5 tab-separated levels
    val lines = spark.read.text(out)
    assert(lines.count() > 0)
    assert(lines.filter(not(col("value").rlike(
      "^\\d+(\\.\\d+)?\t[^\t]+\t[^\t]+\t[^\t]+\t[^\t]+\t[^\t]+$"))).count() == 0,
      "malformed Krona leaf line")
    // the grand-total row must equal the exact lineitem quantity total
    val total = rollup.filter(col("lvl_mfgr") === "ALL").collect()
    assert(total.length == 1, s"expected one grand-total row, got ${total.length}")
    val direct = Tables.load(spark, sfDir, "lineitem")
      .agg(sum(graft.Dec.dec(col("l_quantity"))).cast("double")).head().getDouble(0)
    assert(total.head.getAs[Double]("abundance") == direct,
      "rollup grand total drifted from the fact table")
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

  test("JSONL shard export covers the corpus and prunes to one shard") {
    val out = Files.createTempDirectory("graft-x6").toString + "/jsonl"
    val manifest = Export.jsonlShards(spark, sfDir, 8, out).collect()
    val docs = Tables.load(spark, sfDir, "documents")
    assert(manifest.map(_.getLong(1)).sum == docs.count(),
      "manifest doc counts do not cover the corpus")
    assert(manifest.map(_.getLong(0)).forall(s => s >= 0 && s < 8))
    // layout: hive-style shard directories a trainer can fetch singly
    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("shard=")).sorted
    assert(dirs.length == manifest.length, s"shard dirs $dirs vs manifest")
    // fetching one shard reads only that directory's files
    val one = spark.read
      .schema("doc_id LONG, text STRING, lang STRING, source STRING")
      .json(out).filter(col("shard") === manifest.head.getLong(0))
    assert(one.count() == manifest.head.getLong(1))
    val scan = one.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    assert(scan.toString.contains("PartitionFilters"),
      s"shard predicate not a partition filter:\n${scan.toString.take(800)}")
    // text survives the JSON round trip byte-exactly
    val back = spark.read
      .schema("doc_id LONG, text STRING, lang STRING, source STRING")
      .json(out).select("doc_id", "text")
    val diff = back.join(docs.select(col("doc_id"), col("text").as("t0")), "doc_id")
      .filter(col("text") =!= col("t0")).count()
    assert(diff == 0, s"$diff docs mutated in the JSON round trip")
  }

  test("partitioned export lands one file per (lang, source) cell and " +
       "prunes a lang filter to its directory") {
    val out = Files.createTempDirectory("graft-x9").toString + "/part"
    val cells = Export.partitionedExport(spark, sfDir, out).collect()
    val docs = Tables.load(spark, sfDir, "documents")
    // coverage + the one-file-per-cell write discipline
    assert(cells.map(_.getLong(2)).sum == docs.count(),
      "cell doc counts do not cover the corpus")
    assert(cells.forall(_.getLong(4) == 1L),
      s"small-files regression: ${cells.filter(_.getLong(4) != 1L).toSeq}")
    assert(cells.length ==
      docs.select("lang", "source").distinct().count())
    // a lang predicate must prune at the DIRECTORY level
    val lang = cells.head.getString(0)
    val one = spark.read.parquet(out).filter(col("lang") === lang)
    // execute THIS dataset first (collect, not count — count() builds
    // its own plan and leaves these scan metrics untouched)
    assert(one.collect().length ==
      cells.filter(_.getString(0) == lang).map(_.getLong(2)).sum)
    val scan = one.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    // check the predicate actually LANDED in the partition-filter list
    // ("PartitionFilters: []" prints even when empty, so a substring
    // check on the label alone is vacuous)
    assert(scan.partitionFilters.nonEmpty,
      s"lang predicate not a partition filter:\n${scan.toString.take(800)}")
    val langCells = cells.count(_.getString(0) == lang)
    assert(scan.metrics("numFiles").value == langCells,
      s"read ${scan.metrics("numFiles").value} files for a $langCells-cell lang")
    // text survives the partitioned round trip
    val diff = spark.read.parquet(out)
      .select(col("doc_id"), col("text"))
      .join(docs.select(col("doc_id"), col("text").as("t0")), "doc_id")
      .filter(col("text") =!= col("t0")).count()
    assert(diff == 0, s"$diff docs mutated in the partitioned round trip")
  }

  test("z-order export clusters BOTH key dimensions: every bucket's " +
       "bbox is cell-tight where single-key bucketing shreds the other " +
       "dim, files land one per bucket, and no row is lost") {
    val out = Files.createTempDirectory("graft-x11").toString + "/z"
    val cells = Export.zorderExport(spark, sfDir, out).collect()
    val l = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val (mnOk, mxOk, mnPk, mxPk, n) = {
      val r = l.agg(min("ok"), max("ok"), min("pk"), max("pk"),
        count(lit(1))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }
    // coverage + the one-file-per-bucket write discipline
    assert(cells.map(_.getLong(1)).sum == n, "bucket counts lose rows")
    assert(cells.forall(_.getLong(6) == 1L),
      s"small-files regression: ${cells.filter(_.getLong(6) != 1L).toSeq}")
    // BOTH dims are tight per bucket: each z-bucket is one 16×16 grid
    // cell, so each normalized span is ≈ 1/16 of its key range —
    // that's what lets min/max stats prune a predicate on EITHER key
    def span(lo: Long, hi: Long, mn: Long, mx: Long): Double =
      (hi - lo + 1).toDouble / (mx - mn + 1).toDouble
    val okSpans = cells.map(c => span(c.getLong(2), c.getLong(3), mnOk, mxOk))
    val pkSpans = cells.map(c => span(c.getLong(4), c.getLong(5), mnPk, mxPk))
    assert(okSpans.sum / okSpans.length < 0.15,
      f"ok spans not clustered: avg ${okSpans.sum / okSpans.length}%.4f")
    assert(pkSpans.sum / pkSpans.length < 0.15,
      f"pk spans not clustered: avg ${pkSpans.sum / pkSpans.length}%.4f")
    // the single-key counterfactual on the SAME data: bucketing by ok
    // range alone leaves the pk dimension unclustered (span ≈ 1) —
    // the failure mode z-order exists to fix
    val okOnly = l
      .groupBy(expr(s"(ok - $mnOk) * 256 div (${mxOk - mnOk + 1})").as("b"))
      .agg(min("pk").as("lo"), max("pk").as("hi"))
      .collect().map(r => span(r.getLong(1), r.getLong(2), mnPk, mxPk))
    assert(okOnly.sum / okOnly.length > 0.8,
      f"counterfactual unexpectedly clustered: ${okOnly.sum / okOnly.length}%.4f")
  }

  test("compaction collapses the fragmented table without losing a row") {
    val m = graft.sources.Export.compact(spark, sfDir).head()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    assert(m.getLong(0) == graft.sources.Export.FragFiles,
      s"fragment stage wrote ${m.getLong(0)} files")
    val expAfter = math.max(1L,
      (n + graft.sources.Export.RowsPerFile - 1) / graft.sources.Export.RowsPerFile)
    assert(m.getLong(1) == expAfter,
      s"compacted to ${m.getLong(1)} files, want $expAfter")
    assert(m.getLong(1) < m.getLong(0), "compaction did not reduce file count")
    // manifest equals a direct source-side computation (nothing lost
    // or duplicated through the write→read→write→read chain)
    val src = docs.agg(count(lit(1)), sum(length(col("text"))),
      sum(col("doc_id") * col("n_chars"))).head()
    assert(m.getLong(2) == src.getLong(0) && m.getLong(3) == src.getLong(1)
      && m.getLong(4) == src.getLong(2), s"manifest drifted: $m vs $src")
  }

  test("compaction file counts stay oracle-derivable on a corpus " +
       "smaller than FragFiles") {
    import spark.implicits._
    // 10 rows < FragFiles=64: round-robin fragmentation writes one
    // file per non-empty partition, i.e. 10, and the oracle's
    // least(FragFiles, count(*)) must agree (the r8/r9 hardcoded-64
    // oracle failed exactly this corpus)
    val tmp = java.nio.file.Files.createTempDirectory("x7small").toString
    (1 to 10).map(i => (i.toLong, "doc " * i, ("doc " * i).length.toLong))
      .toDF("doc_id", "text", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val m = graft.sources.Export.compact(spark, tmp,
      java.nio.file.Files.createTempDirectory("x7out").toString).head()
    val expBefore = math.max(1L, math.min(
      graft.sources.Export.FragFiles.toLong, 10L))
    assert(m.getLong(0) == expBefore,
      s"fragment stage wrote ${m.getLong(0)} files, oracle derives $expBefore")
    assert(m.getLong(1) == 1L, s"10 rows must compact to 1 file, got ${m.getLong(1)}")
    assert(m.getLong(2) == 10L)
  }
}
