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

  test("repetition scoring flags a degenerate document, passes a diverse one") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "every word in this sentence differs from all others"))
      .toDF("doc_id", "text")
    val res = TextOps.repetition(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(res(1L)._3, s"degenerate doc not flagged: $res")
    assert(res(1L)._1 > 0.8 && res(1L)._2 == 1.0)
    assert(!res(2L)._3, s"diverse doc flagged: $res")
  }

  test("Bray-Curtis covers every sample pair with values in [0,1]") {
    val res = graft.operators.Relational.q30BrayCurtis(spark, sfDir).collect()
    val samples = (res.map(_.getString(0)) ++ res.map(_.getString(1))).distinct.length
    assert(res.length == samples * (samples - 1) / 2,
      s"expected all ${samples * (samples - 1) / 2} pairs, got ${res.length}")
    assert(res.forall { r =>
      val v = r.getDouble(2); v >= 0.0 && v <= 1.0
    }, "Bray-Curtis outside [0,1]")
    // pairs are canonically ordered, no self-pairs
    assert(res.forall(r => r.getString(0) < r.getString(1)))
  }

  test("PCoA axis is max-normalized and separates the most dissimilar pair") {
    val axis = graft.operators.Ordination.q31Pcoa(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(axis.values.forall(v => v >= -1.0 && v <= 1.0))
    assert(math.abs(axis.values.map(math.abs).max - 1.0) < 1e-9,
      "power iteration result not max-normalized")
    // the two samples furthest apart on the axis must be far in BC too:
    // their Bray-Curtis distance is above the median pairwise distance
    val bc = graft.operators.Relational.q30BrayCurtis(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val hi = axis.maxBy(_._2)._1
    val lo = axis.minBy(_._2)._1
    val d = bc.collectFirst {
      case (a, b, v) if Set(a, b) == Set(hi, lo) => v
    }.get
    val median = bc.map(_._3).sorted.apply(bc.length / 2)
    assert(d >= median,
      f"axis extremes ($hi,$lo) BC=$d%.3f below median $median%.3f")
  }

  test("blocked PCoA equals the single-row form bit-for-bit") {
    // the (i,j,v)-triples variant must reproduce the single-row form
    // EXACTLY (same index-order folds ⇒ same doubles), so both can
    // share one DuckDB oracle — this is the gate on that claim
    val single = graft.operators.Ordination.q31Pcoa(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val blocked = graft.operators.Ordination.q31PcoaBlocked(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(single.nonEmpty)
    assert(blocked.toSeq == single.toSeq,
      s"blocked PCoA diverges from single-row form: " +
        s"${blocked.toSeq.diff(single.toSeq).take(3)} vs " +
        s"${single.toSeq.diff(blocked.toSeq).take(3)}")
  }

  test("batch interval join attributes purchases within the window only") {
    import spark.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, ts(0), 1L, "click", 0.0),
      (2L, ts(20), 1L, "purchase", 9.99), // within 30 min of click 1
      (3L, ts(10), 2L, "click", 0.0),
      (4L, ts(50), 2L, "purchase", 5.0))  // 40 min later: out of window
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = graft.operators.Events.intervalJoin(ev, 30).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 2L)), s"got $rows")
  }

  test("as-of join picks the latest click at or before each purchase") {
    import spark.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, ts(0), 1L, "click", 1.0),
      (2L, ts(5), 1L, "purchase", 0.0),  // → click 1
      (3L, ts(10), 1L, "click", 2.0),
      (4L, ts(10), 1L, "purchase", 0.0), // equal ts counts → click 3
      (5L, ts(20), 1L, "purchase", 0.0), // → still click 3 (latest ≤)
      (6L, ts(7), 2L, "purchase", 0.0),  // user 2 has no clicks → null
      (7L, ts(30), 1L, "click", 9.0),    // later click never attributed
      // same-ts click tie on user 3: max event_id (9) must win
      (8L, ts(0), 3L, "click", 5.0),
      (9L, ts(0), 3L, "click", 7.0),
      (10L, ts(1), 3L, "purchase", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.asofJoin(ev).collect().map { r =>
      (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(4)) -1L else r.getLong(4))
    }.toSet
    assert(got == Set(
      (2L, 1L, 5L * 60_000_000L),
      (4L, 3L, 0L),
      (5L, 3L, 10L * 60_000_000L),
      (6L, -1L, -1L),
      (10L, 9L, 60_000_000L)), s"got $got")
    // the tie-reduced click value rides along
    val v10 = Events.asofJoin(ev).collect()
      .find(_.getLong(1) == 10L).get.getDouble(3)
    assert(v10 == 7.0, s"tie not reduced to max event_id's value: $v10")
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
