package graft

import graft.operators.{Dedup, Events, TextOps}
import org.apache.spark.sql.functions._

/** Specs for the decontamination, sharding, and rolling-window ops. */
class PipelineOpsSpec extends SparkSpec {

  test("decontamination flags a doc copied from the benchmark slice") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "bench"),
      (2L, "alpha beta gamma delta epsilon", "train"), // full copy
      (3L, "zeta eta theta iota kappa", "train"))      // disjoint
      .toDF("doc_id", "text", "source")
    val res = Dedup.decontaminate(docs, "bench").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res(2L) > 0, s"copied doc not flagged: $res")
    assert(res(3L) == 0, s"clean doc flagged: $res")
  }

  test("shard assignment covers all docs and is deterministic") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = TextOps.shardAssign(docs, 128)
    val total = a.agg(sum("n_docs")).head().getLong(0)
    assert(total == docs.count())
    val b = TextOps.shardAssign(docs.repartition(7), 128)
    assert(a.collect().toSeq == b.collect().toSeq, "sharding depends on partitioning")
  }

  test("rolling average window frame is correct on a known sequence") {
    import spark.implicits._
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "c", 3.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 1L, "c", 6.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 1L, "c", 9.0),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), 1L, "c", 12.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val avgs = Events.rollingAvg(ev).collect().map(_.getDouble(3)).toSeq
    assert(avgs == Seq(3.0, 4.5, 6.0, 9.0), s"got $avgs")
  }
}
