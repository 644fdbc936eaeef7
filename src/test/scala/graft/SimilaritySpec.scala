package graft

import graft.operators.Similarity
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("brute-force ANN returns k ranked neighbours per query") {
    val res = Similarity.annBruteforce(spark, sfDir).collect()
    val byQuery = res.groupBy(_.getLong(0))
    assert(byQuery.size == 5)
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).toSeq.sorted == (1 to 10))
      val scores = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"scores not descending: ${scores.mkString(",")}")
    }
  }

  test("LSH ANN returns exactly k rows per query and overlaps brute force") {
    val bf = Similarity.annBruteforce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshRows = Similarity.annLsh(spark, sfDir).collect()
    // the k-guarantee: multi-probe must surface ≥ k candidates per query
    val byQuery = lshRows.groupBy(_.getLong(0))
    assert(byQuery.size == 5 && byQuery.values.forall(_.length == 10),
      s"expected 5×10 rows, got ${byQuery.view.mapValues(_.length).toMap}")
    val lsh = lshRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = bf.intersect(lsh).size
    assert(overlap > 0, s"LSH found none of the true top-10 pairs")
  }

  test("deterministic-centroid IVF returns ranked rows per query") {
    val res = Similarity.annIvfDet(spark, sfDir).collect()
    val byQuery = res.groupBy(_.getLong(0))
    assert(byQuery.size == 5)
    byQuery.foreach { case (_, rows) =>
      val ranks = rows.map(_.getInt(2)).toSeq.sorted
      assert(ranks == (1 to ranks.size), s"non-contiguous ranks $ranks")
      assert(ranks.size <= 10)
    }
    // both IVF variants share the join topology; the deterministic one
    // must also overlap the exact top-10 (cells carry near neighbours)
    val bf = Similarity.annBruteforce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val det = res.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bf.intersect(det).nonEmpty)
  }

  test("IVF ANN recalls a substantial share of brute-force top-10") {
    val bf = Similarity.annBruteforce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(ivf).size.toDouble / bf.size
    assert(recall >= 0.2, f"IVF recall $recall%.2f below floor")
    // every IVF hit must carry a correctly ranked score run
    Similarity.annIvf(spark, sfDir).collect().groupBy(_.getLong(0)).foreach {
      case (_, rows) =>
        val ranks = rows.map(_.getInt(2)).toSeq.sorted
        assert(ranks == (1 to ranks.size), s"non-contiguous ranks $ranks")
    }
  }

  test("IVF corpus written partitioned by cell prunes to the probed cells") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val out = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/corpus"
    Similarity.ivfAssign(e, Similarity.ivfCentroids(e, 16))
      .write.mode("overwrite").partitionBy("cell").parquet(out)
    val stored = spark.read.parquet(out)
    val probed = stored.filter(col("cell").isin(1, 2))
    probed.collect()
    val scan = probed.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan"))
    assert(scan.metrics("numFiles").value < stored.inputFiles.length,
      s"probe read ${scan.metrics("numFiles").value} of ${stored.inputFiles.length} files")
  }

  test("dot/cosine fold matches an independently computed value") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val d = df.select(VectorFunctions.dot(col("a"), col("b"))).head().getDouble(0)
    assert(d == 32.0)
    val c = df.select(VectorFunctions.cosine(col("a"), col("a"))).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }
}
