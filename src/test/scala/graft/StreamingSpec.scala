package graft

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{Event, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, count, lit, max, when}
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Drives the streaming pipeline with MemoryStream sources:
  * readStream-equivalent input → watermark/window/state transforms →
  * memory sink, with watermark advancement triggering emission. */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")
  private def tsH(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  test("windowed aggregation over a stream emits finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = StreamingOps.windowedEventCounts(input.toDF(),
        watermark = "10 minutes", windowLen = "1 hour")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, tsH(0, 5), 1, "click", 1.0),
        Event(2, tsH(0, 40), 1, "click", 2.0),
        Event(3, tsH(0, 50), 2, "view", 3.0))
      q.processAllAvailable()
      // advance watermark past hour 0
      input.addData(Event(4, tsH(2, 0), 1, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L, 3.0)), s"got $rows")
      assert(rows.contains(("2024-01-01 00:00:00.0", "view", 1L, 3.0)), s"got $rows")
    } finally q.stop()
  }

  test("stateful sessionization emits sessions split by the gap") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = StreamingOps.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 5 min apart (one session), then 40-min gap
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(45), 1, "click", 3.0))
      q.processAllAvailable()
      // push watermark far forward so all sessions time out
      input.addData(Event(9, tsH(6, 0), 2, "view", 0.5))
      q.processAllAvailable()
      input.addData(Event(10, tsH(12, 0), 2, "view", 0.5))
      q.processAllAvailable()
      val sess = spark.table("sessions").as[SessionOut].collect()
        .filter(_.user_id == 1).sortBy(_.session_id)
      assert(sess.length == 2, s"expected 2 sessions, got ${sess.toSeq}")
      assert(sess(0).n_events == 2 && sess(0).total_value == 3.0)
      assert(sess(1).n_events == 1 && sess(1).total_value == 3.0)
    } finally q.stop()
  }

  test("native session_window sessionization agrees with the " +
       "explicit-state form away from the gap boundary") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = StreamingOps.sessionWindowStream(input.toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("native_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: (0,5) one session, 45 starts another; user 2 one
      // singleton. All gaps are strictly ≶ 30 min — the strict-< vs ≤
      // boundary difference between the two forms can't bite.
      input.addData(
        Event(1, ts(0), 1, "click", 1.5),
        Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(45), 1, "click", 3.0),
        Event(4, ts(10), 2, "view", 0.5))
      q.processAllAvailable()
      // push the watermark far forward so every session finalizes
      input.addData(Event(9, tsH(6, 0), 3, "view", 0.1))
      q.processAllAvailable()
      input.addData(Event(10, tsH(12, 0), 3, "view", 0.1))
      q.processAllAvailable()
      val got = spark.table("native_sessions").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      // sessions: u1 [ts0: 2 events, 3.5], u1 [ts45: 1 event, 3.0],
      // u2 [ts10: 1 event, 0.5]
      assert(got((1L, ts(0).toString)) == ((2L, 3.5)), s"got $got")
      assert(got((1L, ts(45).toString)) == ((1L, 3.0)), s"got $got")
      assert(got((2L, ts(10).toString)) == ((1L, 0.5)), s"got $got")
      // parity with the explicit-state sessionizer on the same events
      // (its session_id IS the start micros)
      val input2 = MemoryStream[Event]
      val q2 = StreamingOps.sessionize(input2.toDS(), gapMinutes = 30)
        .writeStream.format("memory").queryName("explicit_sessions")
        .outputMode(OutputMode.Append).start()
      try {
        input2.addData(
          Event(1, ts(0), 1, "click", 1.5),
          Event(2, ts(5), 1, "click", 2.0),
          Event(3, ts(45), 1, "click", 3.0),
          Event(4, ts(10), 2, "view", 0.5))
        q2.processAllAvailable()
        input2.addData(Event(9, tsH(6, 0), 3, "view", 0.1))
        q2.processAllAvailable()
        input2.addData(Event(10, tsH(12, 0), 3, "view", 0.1))
        q2.processAllAvailable()
        val exp = spark.table("explicit_sessions").as[SessionOut].collect()
          .filter(_.user_id <= 2)
          .map(o => (o.user_id,
            new java.sql.Timestamp(o.start_us / 1000).toString) ->
            ((o.n_events, o.total_value))).toMap
        assert(exp == got.filter(_._1._1 <= 2),
          s"forms diverged: explicit=$exp native=$got")
      } finally q2.stop()
    } finally q.stop()
  }

  test("streaming as-of replays the batch attribution on one batch") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ev = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 1, "purchase", 0.0),
      Event(3, ts(10), 1, "click", 2.0),
      Event(4, ts(10), 1, "purchase", 0.0), // equal ts → click 3
      Event(5, ts(20), 1, "purchase", 0.0),
      Event(6, ts(7), 2, "purchase", 0.0),  // no clicks → None
      Event(7, ts(30), 1, "click", 9.0),
      Event(8, ts(0), 3, "click", 5.0),     // same-ts tie: id 9 wins
      Event(9, ts(0), 3, "click", 7.0),
      Event(10, ts(1), 3, "purchase", 0.0),
      Event(11, ts(2), 3, "view", 4.0))     // non-click/purchase: ignored
    val input = MemoryStream[Event]
    val q = StreamingOps.asofAttribute(input.toDS())
      .writeStream.format("memory").queryName("asof")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev: _*)
      q.processAllAvailable()
      val got = spark.table("asof").as[StreamingOps.AsofOut].collect()
        .map(o => (o.purchase_id, o.click_id, o.gap_us)).toSet
      // the batch operator on the same events is the oracle
      val want = graft.operators.Events.asofJoin(
          ev.toDF("event_id", "ts", "user_id", "event_type", "value"))
        .collect().map { r =>
          (r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(4)) None else Some(r.getLong(4)))
        }.toSet
      assert(got == want, s"stream $got != batch $want")
      assert(want.contains((10L, Some(9L), Some(60000000L))),
        s"tie rule drifted: $want")
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to clicks") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = StreamingOps.attributeConversions(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Event(1, ts(0), 1, "click", 0.0), Event(2, ts(10), 2, "click", 0.0))
      purchases.addData(
        Event(100, ts(20), 1, "purchase", 9.99),  // within 30min of click 1
        Event(101, ts(50), 2, "purchase", 5.0))   // 40min after click 2: out of window
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 100L)), s"got $rows")
    } finally q.stop()
  }

  test("streaming exact dedup within the watermark drops replays") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = input.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(1), 1, "click", 1.0), // replay of event 1
        Event(2, ts(2), 1, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(1, ts(3), 1, "click", 1.0)) // replay again
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)
    } finally q.stop()
  }

  test("streaming minhash dedup suppresses exact and near re-posts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = graft.streaming.StreamingOps.dedupStream(
        input.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("minhash_dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, ts(0), base),
        (2L, ts(1), base), // exact re-post → same signature
        (3L, ts(2), (1 to 40).map(i => s"other$i").mkString(" ")))
      q.processAllAvailable()
      input.addData((4L, ts(3), base)) // late re-post, still in watermark
      q.processAllAvailable()
      val kept = spark.table("minhash_dedup_stream")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L), s"expected {1,3}, got $kept")
    } finally q.stop()
  }

  test("streaming quality gate replays the batch Gopher keep set") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.qualityGateStream(
        input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("quality_gate_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(docs.take(100).toSeq)
      q.processAllAvailable()
      input.addData(docs.drop(100).take(100).toSeq)
      q.processAllAvailable()
      val kept = spark.table("quality_gate_stream")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val want = graft.operators.TextOps.gopherRules(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("keep") &&
          org.apache.spark.sql.functions.col("doc_id") < 200)
        .collect().map(_.getLong(0)).toSet
      assert(kept == want,
        s"stream kept ${kept.size} docs, batch ${want.size}; " +
          s"diff ${(kept diff want) ++ (want diff kept)}")
      assert(want.nonEmpty && want.size < 200, "gate vacuous on this slice")
    } finally q.stop()
  }

  test("streaming sketch DAU merges sketches across micro-batches and " +
       "replays the batch estimates EXACTLY under a shuffled arrival order") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect()
    // adversarial arrival order: HLL register merges are order-free
    // maxes, so neither the shuffle nor the micro-batch split may
    // move ANY estimate — parity with batch e18 is exact integers,
    // not a tolerance band
    val shuffled = ev.sortBy(e => (e.event_id * 2654435761L) % 1000003)
    val (b1, b2) = shuffled.splitAt(shuffled.length / 2)
    val input = MemoryStream[Event]
    // watermark wider than the corpus horizon: the shuffled split
    // makes events arrive up to a month "late", and this spec tests
    // sketch merging, not the lateness-drop policy
    val q = graft.streaming.StreamingOps
      .dauSketchStream(input.toDF(), watermark = "40 days")
      .writeStream.format("memory").queryName("dau_sketch_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(b1.toSeq)
      q.processAllAvailable()
      input.addData(b2.toSeq)
      q.processAllAvailable()
      // a sentinel far past the horizon advances the watermark and
      // finalizes every real day window (its own day stays open and
      // is the one absent key)
      val maxTs = ev.map(_.ts.getTime).max
      input.addData(Event(-1L,
        new java.sql.Timestamp(maxTs + 90L * 86400 * 1000), -1L, "x", 0.0))
      q.processAllAvailable()
      val got = spark.table("dau_sketch_stream").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = graft.operators.Events.dauApprox(spark, sfDir).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want,
        s"stream/batch sketch DAU diverged: " +
          s"${(got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
      assert(want.size > 1, "corpus gave a vacuous single-day parity check")
    } finally q.stop()
  }

  test("streaming incremental dedup probes the static corpus index " +
       "statelessly and replays the batch candidate set") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpusText = (1 to 30).map(i => s"word$i").mkString(" ")
    val corpus = Seq((1L, corpusText), (2L, (31 to 60).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val index = graft.operators.Dedup.corpusBandIndex(corpus)
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.incrementalDedupStream(
        input.toDF().toDF("doc_id", "text"), index)
      .writeStream.format("memory").queryName("incdedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((10L, corpusText)) // copy of corpus doc 1
      q.processAllAvailable()
      input.addData((11L, (61 to 90).map(i => s"w$i").mkString(" "))) // novel
      q.processAllAvailable()
      val pairs = spark.table("incdedup_stream")
        .select("b_id", "c_id").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // the copy matches its corpus twin; the novel doc emits nothing
      assert(pairs == Set((10L, 1L)), s"pairs $pairs")
      // the join must be stateless: no state store rows accumulate
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0),
        "stream-static probe accumulated state")
    } finally q.stop()
  }

  test("batch and streaming sessionize agree on sub-millisecond gaps") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // Second event lands 30 min + 400 µs after the first: over the gap
    // at full micro precision, but exactly AT the gap if timestamps are
    // truncated to milliseconds — the old getTime*1000 path merged them.
    val e1 = Event(1, Timestamp.valueOf("2024-01-01 00:00:00.000500"), 1, "click", 1.0)
    val e2 = Event(2, Timestamp.valueOf("2024-01-01 00:30:00.000900"), 1, "click", 2.0)

    val batch = graft.operators.Events.sessionize(Seq(e1, e2).toDF())
      .filter($"user_id" === 1).collect()
    assert(batch.length == 2, s"batch merged the sessions: ${batch.toSeq}")

    val input = MemoryStream[Event]
    val q = StreamingOps.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("parity_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(e1, e2)
      q.processAllAvailable()
      input.addData(Event(9, tsH(6, 0), 2, "view", 0.5)) // push watermark
      q.processAllAvailable()
      input.addData(Event(10, tsH(12, 0), 2, "view", 0.5))
      q.processAllAvailable()
      val sess = spark.table("parity_sessions").as[SessionOut].collect()
        .filter(_.user_id == 1).sortBy(_.session_id)
      assert(sess.length == 2, s"streaming merged the sessions: ${sess.toSeq}")
      assert(sess.map(_.n_events).toSeq == Seq(1L, 1L))
      // ids are start-micros: stable, unique, chronologically ordered
      assert(sess.map(_.session_id).toSeq == sess.map(_.start_us).toSeq)
      assert(sess(0).start_us == 500L + // 2024-01-01 00:00:00.000500 UTC
        Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L)
    } finally q.stop()
  }

  test("batch and derived windowed aggregation agree on events table") {
    val batch = graft.operators.Events.eventWindows(spark, sfDir)
    val viaStreamingLogic = StreamingOps.windowedEventCounts(
      Tables.load(spark, sfDir, "events"))
    assert(viaStreamingLogic.count() == batch.count())
  }

  test("streaming funnel replays the batch operator's stages and latency") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ev = Seq(
      Event(1, ts(0), 1, "signup", 0.0),   // user 1: full ordered funnel
      Event(2, ts(10), 1, "view", 0.0),
      Event(3, ts(20), 1, "click", 0.0),
      Event(4, ts(30), 1, "purchase", 1.0),
      Event(5, ts(0), 2, "view", 0.0),     // view before signup: no credit
      Event(6, ts(10), 2, "signup", 0.0),
      Event(7, ts(0), 3, "signup", 0.0),   // purchase without ordered click
      Event(8, ts(5), 3, "view", 0.0),
      Event(9, ts(10), 3, "purchase", 1.0),
      Event(10, ts(0), 4, "click", 0.0),   // never signed up
      Event(11, ts(40), 1, "purchase", 2.0)) // second conversion: no re-emit
    val input = MemoryStream[Event]
    val q = StreamingOps.funnelStream(input.toDS())
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev: _*)
      q.processAllAvailable()
      val got = spark.table("funnel_stream").as[StreamingOps.FunnelOut]
        .collect()
      val byUser = got.groupBy(_.user_id)
      val stageMax = byUser.view.mapValues(_.map(_.stage).max).toMap
      val convert = byUser.view.mapValues(
        _.flatMap(_.convert_us).headOption).toMap
      // the batch operator on the same events is the oracle
      val want = graft.operators.Events.funnel(
          ev.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value))
            .toDF("event_id", "ts", "user_id", "event_type", "value"))
        .collect().map { r =>
          r.getLong(0) -> (r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)))
        }.toMap
      want.foreach { case (user, (nStages, cv)) =>
        assert(stageMax.getOrElse(user, 0).toLong == nStages,
          s"user $user: stream stage ${stageMax.get(user)} != batch $nStages")
        assert(convert.getOrElse(user, None) == cv,
          s"user $user: stream latency ${convert.get(user)} != batch $cv")
      }
      // exactly one emission per stage progression, none for repeats
      assert(got.count(_.user_id == 1) == 4, s"re-emission: ${got.toSeq}")
    } finally q.stop()
  }

  test("streaming anomaly scorer reproduces the batch flags on replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the e10 spike scenario: type x quiet at 10/day, one 30-event day
    val rows = (1 to 12).flatMap { d =>
      val n = if (d == 7) 30 else 10
      (1 to n).map(i => StreamingOps.Event(d * 1000L + i,
        java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00"), 1L, "x", 0.0))
    }
    val batchDf = rows.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val stats = graft.operators.Events.anomalyStats(batchDf)
    val wantFlags = graft.operators.Events.anomaly(batchDf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val input = MemoryStream[StreamingOps.Event]
    val q = StreamingOps.anomalyStream(input.toDS().toDF(), stats)
      .writeStream.format("memory").queryName("anomaly_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // a far-future event for a type absent from stats pushes the
      // watermark past every real window so they all finalize
      input.addData(StreamingOps.Event(99999L,
        Timestamp.valueOf("2024-03-01 00:00:00"), 1L, "zz", 0.0))
      q.processAllAvailable()
      val got = spark.table("anomaly_stream").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(got.sorted.toSeq == wantFlags.sorted.toSeq,
        s"stream flags ${got.toSeq} != batch ${wantFlags.toSeq}")
      assert(got.nonEmpty, "no anomaly emitted")
    } finally q.stop()
  }

  test("streaming transitions replay the batch pair counts") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ev = Seq(
      Event(1, ts(0), 1, "a", 0.0), Event(2, ts(1), 1, "b", 0.0),
      Event(3, ts(2), 1, "a", 0.0), // user 1: a→b, b→a
      Event(4, ts(0), 2, "a", 0.0), Event(5, ts(1), 2, "b", 0.0),
      Event(6, ts(3), 1, "c", 0.0)) // user 1: a→c
    val input = MemoryStream[Event]
    val q = StreamingOps.transitionsStream(input.toDS())
      .writeStream.format("memory").queryName("trans_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev: _*)
      q.processAllAvailable()
      val got = spark.table("trans_stream").as[StreamingOps.TransOut]
        .collect().groupBy(t => (t.from_type, t.to_type))
        .view.mapValues(_.length.toLong).toMap
      val want = graft.operators.Events.transitions(
          ev.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value))
            .toDF("event_id", "ts", "user_id", "event_type", "value"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(got == want, s"stream edges $got != batch counts $want")
    } finally q.stop()
  }

  test("streaming funnel evicts idle state past the event-time horizon") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = StreamingOps.funnelStream(input.toDS(), idleMinutes = 30)
      .writeStream.format("memory").queryName("funnel_evict")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: user 9 signs up at t=0 → stage-1 row, state created
      input.addData(Event(1, ts(0), 9, "signup", 0.0))
      q.processAllAvailable()
      // batch 2: unrelated activity at t=90 advances the watermark to
      // t=60 — past user 9's timeout (t=0 + 30 min)
      input.addData(Event(2, tsH(1, 30), 8, "signup", 0.0))
      q.processAllAvailable()
      // batch 3: user 9 absent from input → the timeout fires and the
      // state is removed (emitting nothing)
      input.addData(Event(3, tsH(1, 35), 8, "view", 0.0))
      q.processAllAvailable()
      // batch 4: user 9 signs up again — with the old state evicted
      // this starts a FRESH funnel and re-emits stage 1; under the
      // pre-r6 NoTimeout behavior the original state would suppress it
      input.addData(Event(4, tsH(1, 40), 9, "signup", 0.0))
      q.processAllAvailable()
      val got = spark.table("funnel_evict").as[StreamingOps.FunnelOut].collect()
      assert(got.count(u => u.user_id == 9 && u.stage == 1) == 2,
        s"evicted user's return did not restart the funnel: ${got.toSeq}")
    } finally q.stop()
  }

  test("lateness and idle horizon are independent funnel knobs") {
    // ADVICE r6: idleMinutes used to set BOTH the watermark delay and
    // the eviction horizon, so bounding state also dropped late events.
    // Run the same late-arrival scenario under each knob setting: an
    // event 100 min out-of-order survives a 120-min lateness even with
    // a 30-min idle horizon, and is watermark-dropped when lateness
    // defaults to the same 30 min.
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def run(name: String, lateness: Option[Int]): Int = {
      val input = MemoryStream[Event]
      val q = StreamingOps.funnelStream(input.toDS(), idleMinutes = 30,
          latenessMinutes = lateness)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        // watermark driver: user 8 active at t=5h
        input.addData(Event(1, tsH(5, 0), 8, "signup", 0.0))
        q.processAllAvailable()
        // late event: user 9 signs up at t=3h20m — 100 min behind the
        // max event time. watermark = 5h − lateness.
        input.addData(Event(2, tsH(3, 20), 9, "signup", 0.0))
        q.processAllAvailable()
        spark.table(name).as[StreamingOps.FunnelOut].collect()
          .count(_.user_id == 9)
      } finally q.stop()
    }
    assert(run("funnel_knob_wide", Some(120)) == 1,
      "late event within the 120-min lateness was dropped")
    assert(run("funnel_knob_tight", None) == 0,
      "event older than the 30-min watermark should be dropped")
  }

  test("streaming path mining replays batch e14's trigram counts on " +
       "the real events table") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().toSeq
    val input = MemoryStream[Event]
    val q = StreamingOps.pathStream(input.toDS())
      .writeStream.format("memory").queryName("path_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev: _*)
      q.processAllAvailable()
      val got = spark.table("path_stream")
        .groupBy("e1", "e2", "e3").count()
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
        .toMap
      // batch e14 WITHOUT the top-k cut is the oracle: every trigram
      // count must agree exactly
      val want = graft.operators.Events.pathTopk(
          graft.Tables.load(spark, sfDir, "events"), Int.MaxValue)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
        .toMap
      assert(got == want,
        s"stream/batch trigram divergence: stream ${got.size} keys, " +
        s"batch ${want.size}; sample diff ${(want.toSet -- got.toSet).take(3)}")
    } finally q.stop()
  }

  test("streaming lateness monitor replays batch e21's profile across " +
       "arbitrary micro-batch sizings and convicts planted disorder") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    // planted disorder appended AFTER the (ordered) real table: two
    // late events per their types' running maxes
    val real = graft.Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().toSeq.sortBy(_.event_id)
    val maxId = real.map(_.event_id).max
    // the running max is PER TYPE — plant against each type's own max
    val maxClick = real.filter(_.event_type == "click").map(_.ts.getTime).max
    val maxView = real.filter(_.event_type == "view").map(_.ts.getTime).max
    val planted = Seq(
      Event(maxId + 1, new Timestamp(maxClick - 120000L), 1L, "click", 0.0),
      Event(maxId + 2, new Timestamp(maxView + 1000L), 1L, "view", 0.0),
      // arrives after the new view max above: 45 s + that extra 1 s
      Event(maxId + 3, new Timestamp(maxView - 45000L), 2L, "view", 0.0))
    val all = real ++ planted
    val input = MemoryStream[Event]
    val q = StreamingOps.latenessStream(input.toDS())
      .writeStream.format("memory").queryName("late_stream")
      .outputMode(OutputMode.Append).start()
    try {
      // id-contiguous micro-batches of uneven sizes: state must carry
      // the running max across every boundary
      all.grouped(617).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark.table("late_stream")
        .groupBy("event_type")
        .agg(count(when(col("late_us") > 0, 1)).as("n_late"),
          max(col("late_us")).as("max_late_us"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      // batch e21 over the SAME frame (real + planted) is the oracle
      val batch = graft.operators.Events.watermarkAudit(
          all.toDF().withColumn("props", lit("{}")))
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(2), (r.getDouble(4) * 1000000.0).round, r.getLong(1))))
        .toMap
      assert(got.keySet == batch.keySet, s"types: $got vs $batch")
      got.foreach { case (t, (nl, mx, n)) =>
        val (bnl, bmx, bn) = batch(t)
        // max compares through batch's 4-dp-rounded seconds — exact
        // to the 50 µs half-step of that rounding
        assert(nl == bnl && math.abs(mx - bmx) <= 50L && n == bn,
          s"$t: stream ($nl, $mx, $n) != batch ($bnl, $bmx, $bn)")
      }
      // the planted rows were convicted with their exact µs lateness
      // (the type max carries sub-ms micros getTime truncates, so
      // derive the expectation through the same µs clock)
      def usOf(t: Timestamp): Long =
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
      val maxClickUs = real.filter(_.event_type == "click")
        .map(e => usOf(e.ts)).max
      val late = spark.table("late_stream").filter(col("late_us") > 0)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(late(maxId + 1) == maxClickUs - (maxClick - 120000L) * 1000L &&
        late(maxId + 3) == 46000000L,
        s"planted lateness wrong: $late")
      assert(!late.contains(maxId + 2), "the new-max event is not late")
    } finally q.stop()
  }

  test("streaming tumbling burst sandwiches batch e22's sliding peak " +
       "within factor 2 and equals it on aligned activity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().toSeq
    val input = MemoryStream[Event]
    val q = StreamingOps.burstTumblingStream(input.toDF())
      .writeStream.format("memory").queryName("burst_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev: _*)
      q.processAllAvailable()
      // advance the watermark far enough to finalize every window
      val lastTs = new Timestamp(ev.map(_.ts.getTime).max + 8 * 3600 * 1000L)
      input.addData(Event(-1L, lastTs, -1L, "x", 0.0))
      q.processAllAvailable()
      val tumbling = spark.table("burst_stream")
        .filter(col("user_id") >= 0)
        .groupBy("user_id").agg(max(col("n_events")).as("t_burst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exact = graft.operators.Events.burstProfile(
          graft.Tables.load(spark, sfDir, "events"))
        .collect() // histogram — recompute per-user for the sandwich
      val perUser = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy("us").rangeBetween(-(graft.operators.Events.BurstWindowUs - 1), 0)
        graft.Tables.load(spark, sfDir, "events")
          .withColumn("us", org.apache.spark.sql.functions.unix_micros(col("ts")))
          .withColumn("iw", count(lit(1)).over(w))
          .groupBy("user_id").agg(max(col("iw")).as("burst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      assert(exact.nonEmpty && tumbling.keySet == perUser.keySet)
      perUser.foreach { case (u, truth) =>
        val t = tumbling(u)
        assert(t <= truth && truth <= 2 * t,
          s"user $u: tumbling $t vs sliding $truth outside the sandwich")
      }
      // aligned activity: a user whose whole burst sits inside one
      // tumbling window — the approximation is exact
      val input2 = MemoryStream[Event]
      val q2 = StreamingOps.burstTumblingStream(input2.toDF())
        .writeStream.format("memory").queryName("burst_stream2")
        .outputMode(OutputMode.Append).start()
      try {
        def at(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)
        // window [..00:00, ..01:00): 4 events at +0..+3 s
        input2.addData((0 to 3).map(i =>
          Event(i.toLong, at(i.toLong), 7L, "a", 0.0)): _*)
        q2.processAllAvailable()
        input2.addData(Event(99L, at(9000L), 8L, "a", 0.0))
        q2.processAllAvailable()
        val got = spark.table("burst_stream2").filter(col("user_id") === 7L)
          .agg(max(col("n_events"))).head().getLong(0)
        assert(got == 4L, s"aligned burst should be exact: $got")
      } finally q2.stop()
    } finally q.stop()
  }

  test("streaming count-min sketch replays the batch counter table " +
       "BITWISE under a shuffled arrival order and micro-batch split") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect()
    // counter increments are commutative integer adds, so neither the
    // shuffle nor the split may move ANY counter — exact equality,
    // stronger than the HLL twin's same-estimate parity
    val shuffled = ev.sortBy(e => (e.event_id * 2654435761L) % 1000003)
    val (b1, b2) = shuffled.splitAt(shuffled.length / 3)
    val input = MemoryStream[Event]
    val q = graft.streaming.StreamingOps
      .cmsSketchStream(input.toDF(), watermark = "40 days")
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(b1.toSeq)
      q.processAllAvailable()
      input.addData(b2.toSeq)
      q.processAllAvailable()
      val maxTs = ev.map(_.ts.getTime).max
      input.addData(Event(-1L,
        new java.sql.Timestamp(maxTs + 90L * 86400 * 1000), -1L, "x", 0.0))
      q.processAllAvailable()
      val got = spark.table("cms_stream").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
        .toMap
      // batch replica of the per-day counter table over the same events
      val want = Tables.load(spark, sfDir, "events")
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("user_id").as("u"),
          explode(expr(s"sequence(0, ${
            graft.operators.Events.CmsDepth - 1})")).as("r"))
        .groupBy(col("day"), col("r"),
          graft.operators.Events.cmsBucket(col("u"), col("r")).as("bucket"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
        .toMap
      assert(got == want, s"stream/batch CMS counters diverged: " +
        s"${(got.toSet diff want.toSet).take(3)} vs ${
          (want.toSet diff got.toSet).take(3)}")
      // state-bound sanity: per day at most depth×width counter rows
      val perDay = got.keys.groupBy(_._1).map(_._2.size)
      assert(perDay.forall(_ <= graft.operators.Events.CmsDepth *
        graft.operators.Events.CmsWidth), "counter lattice overflowed")
      assert(want.size > 100, "vacuous counter parity")
    } finally q.stop()
  }

  test("streaming CUSUM reproduces the batch drift monitor under an " +
       "uneven micro-batch replay, including the slow-drift alarm") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def day(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // x: varied 7-day baseline (mu 10, sigma sqrt(14)/7), then a slow
    // +1/day drift — each day is well under the pointwise z bar but
    // the cumulative sum crosses 4*sigma within a few days.
    // y: monitored days at exactly the baseline mean — never alarms.
    def burst(tpe: String, d: Int, n: Int, base: Long) =
      (1 to n).map(i => StreamingOps.Event(base + d * 100L + i,
        day(d), 1L, tpe, 0.0))
    val xBase = Seq(9, 11, 10, 10, 9, 11, 10).zipWithIndex.flatMap {
      case (n, i) => burst("x", i + 1, n, 0L) }
    val yBase = Seq(5, 5, 5, 5, 5, 5, 5).zipWithIndex.flatMap {
      case (n, i) => burst("y", i + 1, n, 50000L) }
    val xMon = (8 to 14).flatMap(d => burst("x", d, 11, 100000L))
    val yMon = (8 to 14).flatMap(d => burst("y", d, 5, 150000L))
    val all = xBase ++ yBase ++ xMon ++ yMon
    val toDf = (es: Seq[StreamingOps.Event]) =>
      es.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
    val batch = graft.operators.Events.cusumDrift(toDf(all)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        Option(r.getString(3)), r.getDouble(4))).toMap
    assert(batch("x")._2 > 0L, s"no planted batch alarm: $batch")
    assert(batch("y")._2 == 0L, s"stable type alarmed in batch: $batch")
    val stats = graft.operators.Events.cusumBaseline(toDf(all))
    val input = MemoryStream[StreamingOps.Event]
    val q = StreamingOps.cusumStream(input.toDS(), stats)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode(OutputMode.Append).start()
    try {
      // replay ONLY the monitored days (the deployment cutover), in
      // deliberately uneven, type-interleaved micro-batches — in
      // event-time order, because the replay must RESPECT the 1-day
      // lateness contract: a feed that delivers one type's whole
      // fortnight before another type's first day is declaring those
      // rows late, and the watermark drops them by design
      val mon = (xMon ++ yMon).sortBy(e => (e.ts.getTime, e.event_id))
      val cuts = Seq(0, 7, 30, 31, 90, mon.length)
      cuts.sliding(2).foreach { case Seq(a, b) =>
        input.addData(mon.slice(a, b): _*)
        q.processAllAvailable()
      }
      // far-future flush on a type PRESENT in stats (the stream-static
      // join would drop an unknown type before the watermark sees it)
      input.addData(StreamingOps.Event(999999L,
        java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 1L, "x", 0.0))
      q.processAllAvailable()
      val rows = spark.table("cusum_stream")
        .as[StreamingOps.CusumOut].collect()
      val got = rows.groupBy(_.event_type).map { case (t, rs) =>
        t -> (rs.length.toLong,
          rs.count(_.alarm).toLong,
          rs.filter(_.alarm).map(_.day).sorted.headOption,
          math.rint(rs.map(_.cusum).max * 1e6) / 1e6)
      }
      assert(got == batch, s"stream summary $got != batch $batch")
      // per-day sequence is strictly ordered and x's drift is monotone
      val xs = rows.filter(_.event_type == "x").sortBy(_.day)
      assert(xs.map(_.day).toSeq == (8 to 14).map(d => f"2024-01-$d%02d"),
        s"x days: ${xs.map(_.day).toSeq}")
      assert(xs.zip(xs.tail).forall { case (a, b) => a.cusum <= b.cusum },
        s"x cusum not monotone under constant drift: ${xs.map(_.cusum).toSeq}")
    } finally q.stop()
  }

  test("streaming seasonal-naive emits exactly the batch calendar-join " +
       "rows (integer parity) under an uneven replay with gaps") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dayUs = 86400L * 1000000L
    def mk(tp: String, d: Int, cnt: Int, base: Long) =
      (1 to cnt).map { i =>
        val t = new java.sql.Timestamp(0L)
        t.setTime((d.toLong * dayUs + i.toLong * 1000000L) / 1000L)
        StreamingOps.Event(base + d * 1000L + i, t, 1L, tp, 0.0)
      }
    val pat = Seq(5, 20, 8, 13, 5, 30, 9)
    val ev =
      (0 until 21).flatMap(d => mk("rhythm", d, pat(d % 7), 0L)) ++
      (0 until 21).flatMap(d => mk("broken", d,
        if (d == 10) 2 * pat(d % 7) else pat(d % 7), 100000L)) ++
      (0 until 21).filter(d => d != 8 && d != 9)
        .flatMap(d => mk("gappy", d, 10, 200000L))
    def day(d: Int) = f"1970-01-${d + 1}%02d"
    val expect =
      (7 until 21).map(d => ("rhythm", day(d),
        pat(d % 7).toLong, pat(d % 7).toLong)) ++
      (7 until 21).map { d =>
        val c = if (d == 10) 2 * pat(d % 7) else pat(d % 7)
        val f = if (d == 17) 2 * pat(d % 7) else pat(d % 7)
        ("broken", day(d), c.toLong, f.toLong) } ++
      (7 until 21).filter(d => !Set(8, 9, 15, 16)(d))
        .map(d => ("gappy", day(d), 10L, 10L))
    val input = MemoryStream[StreamingOps.Event]
    val q = StreamingOps.seasonalNaiveStream(input.toDS())
      .writeStream.format("memory").queryName("snaive_stream")
      .outputMode(OutputMode.Append).start()
    try {
      val sorted = ev.sortBy(e => (e.ts.getTime, e.event_id))
      val cuts = Seq(0, 13, 100, 101, 350, sorted.length)
      cuts.sliding(2).foreach { case Seq(a, b) =>
        input.addData(sorted.slice(a, b): _*)
        q.processAllAvailable()
      }
      input.addData(StreamingOps.Event(999999L,
        java.sql.Timestamp.valueOf("1970-06-01 00:00:00"), 1L, "rhythm", 0.0))
      q.processAllAvailable()
      val got = spark.table("snaive_stream").as[StreamingOps.SnaiveOut]
        .collect().map(r => (r.event_type, r.day, r.n_events, r.fcst))
      assert(got.toSet == expect.toSet,
        s"missing: ${expect.toSet -- got.toSet}; extra: ${got.toSet -- expect.toSet}")
      assert(got.length == expect.length, "duplicate emissions")
    } finally q.stop()
  }

  test("streaming EWMA replays the batch monitor EXACTLY (double " +
       "equality) under an uneven replay, zero-filling the gap day") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dayUs = 86400L * 1000000L
    def mk(tp: String, d: Int, cnt: Int, base: Long) =
      (1 to cnt).map { i =>
        val t = new java.sql.Timestamp(0L)
        t.setTime((d.toLong * dayUs + i.toLong * 1000000L) / 1000L)
        StreamingOps.Event(base + d * 1000L + i, t, 1L, tp, 0.0)
      }
    // flat: constant level, no alarms; gappy: day 5 missing — the
    // stream must zero-fill it (and alarm) exactly like the batch
    // calendar join; jumpy: a spike day to exercise a real alarm on a
    // non-gap row
    val ev =
      (0 until 20).flatMap(d => mk("flat", d, 10, 0L)) ++
      (0 until 12).filter(_ != 5).flatMap(d => mk("gappy", d, 10, 100000L)) ++
      (0 until 12).flatMap(d => mk("jumpy", d,
        if (d == 8) 90 else 10, 200000L))
    val input = MemoryStream[StreamingOps.Event]
    val q = StreamingOps.ewmaStream(input.toDS())
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode(OutputMode.Append).start()
    try {
      val sorted = ev.sortBy(e => (e.ts.getTime, e.event_id))
      val cuts = Seq(0, 7, 64, 65, 230, sorted.length)
      cuts.sliding(2).foreach { case Seq(a, b) =>
        input.addData(sorted.slice(a, b): _*)
        q.processAllAvailable()
      }
      // flush: push the watermark far past every planted day
      input.addData(StreamingOps.Event(999999L,
        java.sql.Timestamp.valueOf("1970-06-01 00:00:00"), 1L, "flat", 0.0))
      q.processAllAvailable()
      val got = spark.table("ewma_stream").as[StreamingOps.EwmaOut]
        .collect()
        .map(o => (o.event_type, o.day, o.cnt, o.level, o.dev, o.alarm))
      val batch = graft.operators.Events.ewma(
        ev.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value))
          .toDF("event_id", "ts", "user_id", "event_type", "value"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getBoolean(5)))
      assert(got.toSet == batch.toSet,
        s"missing: ${batch.toSet -- got.toSet}; extra: ${got.toSet -- batch.toSet}")
      assert(got.length == batch.length, "duplicate emissions")
      // the plants actually exercised both alarm paths
      assert(batch.exists(r => r._1 == "gappy" && r._3 == 0L && r._6),
        "gap-day alarm missing")
      assert(batch.exists(r => r._1 == "jumpy" && r._3 == 90L && r._6),
        "spike alarm missing")
      assert(batch.filter(_._1 == "flat").forall(r => r._4 == 10.0 && !r._6),
        "flat level drifted")
    } finally q.stop()
  }

  test("streaming Holt-Winters replays the batch forecaster EXACTLY " +
       "(double equality) under an uneven replay with a gap and a break") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dayUs = 86400L * 1000000L
    def mk(tp: String, d: Int, cnt: Int, base: Long) =
      (1 to cnt).map { i =>
        val t = new java.sql.Timestamp(0L)
        t.setTime((d.toLong * dayUs + i.toLong * 1000000L) / 1000L)
        StreamingOps.Event(base + d * 1000L + i, t, 1L, tp, 0.0)
      }
    val pat = Seq(10, 20, 30, 40, 30, 20, 10)
    // rhythm: clean weekly pattern; broke: the pattern with day 17
    // collapsed (alarm) AND day 19 absent entirely — the stream must
    // zero-fill it exactly like the batch calendar join; short: under
    // two weeks, excluded by both engines
    val ev =
      (0 until 28).flatMap(d => mk("rhythm", d, pat(d % 7), 0L)) ++
      (0 until 24).filter(_ != 19).flatMap(d => mk("broke", d,
        if (d == 17) 1 else pat(d % 7), 100000L)) ++
      (0 until 10).flatMap(d => mk("short", d, 5, 200000L))
    val input = MemoryStream[StreamingOps.Event]
    val q = StreamingOps.hwStream(input.toDS())
      .writeStream.format("memory").queryName("hw_stream")
      .outputMode(OutputMode.Append).start()
    try {
      val sorted = ev.sortBy(e => (e.ts.getTime, e.event_id))
      val cuts = Seq(0, 13, 118, 119, 500, sorted.length)
      cuts.sliding(2).foreach { case Seq(a, b) =>
        input.addData(sorted.slice(a, b): _*)
        q.processAllAvailable()
      }
      // flush: push the watermark far past every planted day
      input.addData(StreamingOps.Event(999999L,
        java.sql.Timestamp.valueOf("1970-06-01 00:00:00"), 1L, "rhythm",
        0.0))
      q.processAllAvailable()
      val got = spark.table("hw_stream").as[StreamingOps.HwOut]
        .collect()
        .map(o => (o.event_type, o.day, o.cnt, o.yhat, o.err, o.alarm))
      val batch = graft.operators.Events.holtWinters(
        ev.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value))
          .toDF("event_id", "ts", "user_id", "event_type", "value"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      assert(got.toSet == batch.toSet,
        s"missing: ${batch.toSet -- got.toSet}; extra: ${got.toSet -- batch.toSet}")
      assert(got.length == batch.length, "duplicate emissions")
      assert(!batch.exists(_._1 == "short"), "short series not excluded")
      assert(batch.filter(_._1 == "rhythm").forall(r =>
        r._5 == 0.0 && !r._6), "rhythm not self-forecast")
      assert(batch.exists(r => r._1 == "broke" && r._3 == 1L && r._6),
        "break alarm missing")
      assert(batch.exists(r => r._1 == "broke" && r._2 == "1970-01-20"
        && r._3 == 0L), "gap day not zero-filled")
    } finally q.stop()
  }

  test("streaming attribution emits exactly the batch range-window " +
       "rows under an uneven replay (boundaries, ties, no-touch)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val hourUs = 3600L * 1000000L
    val dayUs = 24L * hourUs
    def ev(id: Long, usTs: Long, u: Long, tp: String) = {
      val t = new java.sql.Timestamp(0L)
      t.setTime(usTs / 1000L)
      StreamingOps.Event(id, t, u, tp, 0.0)
    }
    val base = 10L * dayUs
    val events = Seq(
      // user 1: view, click, purchase — first/last split
      ev(101L, base, 1L, "view"), ev(102L, base + hourUs, 1L, "click"),
      ev(103L, base + 2 * hourUs, 1L, "purchase"),
      // user 2: stale touch (4 days) — no credit
      ev(201L, base, 2L, "click"), ev(202L, base + 4 * dayUs, 2L, "purchase"),
      // user 3: exact lookback boundary + same-µs touch (click+view
      // tie at the purchase µs reduce to max event_id)
      ev(301L, base, 3L, "click"), ev(302L, base + 3 * dayUs, 3L, "view"),
      ev(304L, base + 3 * dayUs, 3L, "click"),
      ev(303L, base + 3 * dayUs, 3L, "purchase"),
      // user 4: touch after purchase — no credit
      ev(401L, base + hourUs, 4L, "purchase"),
      ev(402L, base + 2 * hourUs, 4L, "click"),
      // user 5: two purchases sharing one touch history
      ev(501L, base, 5L, "view"), ev(502L, base + hourUs, 5L, "purchase"),
      ev(503L, base + 5 * hourUs, 5L, "click"),
      ev(504L, base + 6 * hourUs, 5L, "purchase"))
    val input = MemoryStream[StreamingOps.Event]
    val q = StreamingOps.attributionStream(input.toDS())
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode(OutputMode.Append).start()
    try {
      val sorted = events.sortBy(e => (e.ts.getTime, e.event_id))
      val cuts = Seq(0, 3, 4, 9, sorted.length)
      cuts.sliding(2).foreach { case Seq(a, b) =>
        input.addData(sorted.slice(a, b): _*)
        q.processAllAvailable()
      }
      input.addData(ev(999999L, base + 400L * dayUs, 1L, "view"))
      q.processAllAvailable()
      val got = spark.table("attr_stream").as[StreamingOps.AttrOut]
        .collect()
        .map(o => (o.user_id, o.purchase_id, o.first_tid, o.first_type,
          o.last_tid, o.last_type, o.n_touches))
      val batch = graft.operators.Events.attribution(
        events.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value))
          .toDF("event_id", "ts", "user_id", "event_type", "value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          Option(r.getString(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          Option(r.getString(5)), r.getLong(6)))
      assert(got.toSet == batch.toSet,
        s"missing: ${batch.toSet -- got.toSet}; extra: ${got.toSet -- batch.toSet}")
      assert(got.length == batch.length, "duplicate emissions")
      // the plant exercised the semantics it claims to
      assert(batch.exists(r => r._1 == 3L && r._7 == 2L),
        "boundary + same-µs tie not exercised")
      assert(batch.exists(r => r._1 == 2L && r._7 == 0L), "stale not exercised")
    } finally q.stop()
  }
}
