package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  /** Plain-Scala replica of the operator's recurrence — same edge
    * hash, same (src, j)-ordered fold, same base — so the engine is
    * checked against an INDEPENDENT implementation, not itself. */
  private def referencePr(n: Int, iters: Int): Array[Double] = {
    val edges = for {
      src <- 0 until n; j <- 1 to Graph.OutDeg
    } yield {
      val dst0 = ((((src.toLong * 7 + j) % 1000000000L) * 2654435761L)
        % 2147483647L % n).toInt
      (src, j, if (dst0 == src) (dst0 + 1) % n else dst0)
    }
    val inEdges = edges.groupBy(_._3).map { case (d, es) =>
      d -> es.map(e => (e._1, e._2)).sorted
    }
    var r = Array.fill(n)(1.0 / n)
    for (_ <- 1 to iters) {
      val next = Array.tabulate(n) { v =>
        inEdges.getOrElse(v, Seq.empty).foldLeft(0.15 / n) {
          case (acc, (src, _)) => acc + 0.85 * (r(src) / Graph.OutDeg.toDouble)
        }
      }
      r = next
    }
    r
  }

  test("pagerank matches an independent local solve bit-for-bit") {
    import spark.implicits._
    val n = 37
    val docs = (0L until n.toLong).toDF("doc_id")
    val got = Graph.g1Pagerank(docs, Graph.Iters).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val want = referencePr(n, Graph.Iters)
    assert(got.length == n)
    got.foreach { case (v, pr, _) =>
      val exp = BigDecimal(want(v.toInt))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(pr == exp, s"node $v: engine $pr vs reference $exp")
    }
  }

  test("pagerank mass is conserved (no dangling nodes by construction)") {
    val res = Graph.g1Pagerank(spark, sfDir)
    val s = res.agg(sum(col("pagerank"))).head().getDouble(0)
    assert(math.abs(s - 1.0) < 1e-3, s"total rank $s drifted from 1.0")
    // n_in totals must equal the edge count N * OutDeg
    val nin = res.agg(sum(col("n_in"))).head().getLong(0)
    val n = res.count()
    assert(nin == n * Graph.OutDeg, s"in-degree total $nin != ${n * Graph.OutDeg}")
  }

  test("pagerank refuses non-dense doc_ids (hash targets would dangle)") {
    import spark.implicits._
    val sparse = Seq(0L, 1L, 5L).toDF("doc_id")
    assertThrows[IllegalArgumentException] {
      Graph.g1Pagerank(sparse, 2).collect()
    }
  }
}
