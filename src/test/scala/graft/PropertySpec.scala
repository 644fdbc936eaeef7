package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Invariant checks over seeded random data — the properties the
  * 100 TB design leans on. */
class PropertySpec extends SparkSpec {

  private def randomFacts(seed: Long, n: Int) = {
    val rng = new scala.util.Random(seed)
    import spark.implicits._
    (1 to n).map { i =>
      (s"g${rng.nextInt(7)}", i.toLong, math.round(rng.nextDouble() * 10000) / 100.0)
    }.toDF("grp", "id", "amount")
  }

  test("decimal sums are identical at any parallelism") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val df = randomFacts(seed, 5000)
      def total(parts: Int): Map[String, Double] =
        df.repartition(parts).groupBy("grp")
          .agg(Dec.dsum(col("amount")).as("s"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(total(1) == total(13),
        s"seed $seed: decimal sum changed with partitioning")
    }
  }

  test("TopK operator matches window row_number on random data with ties") {
    for (seed <- Seq(7L, 8L)) {
      // coarse rounding forces plenty of exact ties; id breaks them
      val df = randomFacts(seed, 2000)
        .withColumn("amount", round(col("amount"), -2))
      val native = TopK.perGroup(df, Seq("grp"), Seq(("amount", false), ("id", true)), 5)
        .select("grp", "id", "amount", "rnk")
        .orderBy("grp", "rnk").collect().toSeq
      val w = Window.partitionBy("grp").orderBy(col("amount").desc, col("id"))
      val windowed = df.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("grp", "id", "amount", "rnk")
        .orderBy("grp", "rnk").collect().toSeq
      assert(native == windowed, s"seed $seed: TopK diverged from window form")
    }
  }

  test("minhash candidate generation is symmetric and self-free") {
    val res = operators.Dedup.minhashLsh(spark, sfDir).collect()
    assert(res.map(_.getLong(0)).distinct.length == res.length, "dup doc rows")
    assert(res.forall(_.getLong(3) >= 0))
  }

  test("as-of join matches the naive quadratic reference on random streams") {
    import spark.implicits._
    for (seed <- Seq(11L, 12L, 13L)) {
      val rng = new scala.util.Random(seed)
      // clustered timestamps force equal-ts collisions across users and
      // between clicks and purchases — the tie rules under test
      val ev = (1 to 800).map { i =>
        (i.toLong,
          new java.sql.Timestamp(1700000000000L + rng.nextInt(120) * 500L),
          rng.nextInt(6).toLong,
          if (rng.nextBoolean()) "click" else "purchase",
          rng.nextInt(100).toDouble)
      }
      val df = ev.toDF("event_id", "ts", "user_id", "event_type", "value")
      val got = operators.Events.asofJoin(df).collect().map { r =>
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))
      }.toSet
      // naive reference: for each purchase, scan ALL clicks of the user
      // at ts <= purchase ts; latest ts wins, max event_id breaks ties
      val clicks = ev.filter(_._4 == "click")
      val want = ev.filter(_._4 == "purchase").map { p =>
        val eligible = clicks.filter(c => c._3 == p._3 && !c._2.after(p._2))
        val best =
          if (eligible.isEmpty) -1L
          else eligible.maxBy(c => (c._2.getTime, c._1))._1
        (p._1, best)
      }.toSet
      assert(got == want, s"seed $seed: ${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
    }
  }

  test("sequence packing invariants hold on random token distributions") {
    import spark.implicits._
    for (seed <- Seq(21L, 22L)) {
      val rng = new scala.util.Random(seed)
      // token counts spanning under- and over-budget docs
      val docs = (0 until 1500).map { i =>
        (i.toLong, Seq.fill(rng.nextInt(200) + 1)("w").mkString(" "))
      }.toDF("doc_id", "text")
      val packed = operators.TextOps.sequencePack(
        spark, docs, nShards = 8, budget = 100L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(packed.length == 1500, "packing dropped or duplicated docs")
      packed.groupBy(p => (p._2, p._3)).foreach { case ((s, p), rows) =>
        // a multi-doc pack never exceeds the budget; an over-budget doc
        // is always alone in its pack
        if (rows.length > 1)
          assert(rows.map(_._4).sum <= 100L, s"pack ($s,$p) over budget")
        else if (rows.head._4 > 100L)
          assert(rows.length == 1, s"oversized doc shares pack ($s,$p)")
        // no pack is left emptier than a following pack's first doc
        // would have needed (greedy: doc opened a new pack only when it
        // did not fit) — verified by the full replay below
      }
      packed.groupBy(_._2).foreach { case (s, rows) =>
        var fill = 0L; var pack = 0L; var first = true
        rows.sortBy(_._1).foreach { case (id, _, p, t) =>
          if (first) { first = false; fill = t }
          else if (fill + t <= 100L) fill += t
          else { pack += 1; fill = t }
          assert(p == pack, s"seed $seed shard $s doc $id: $p != replay $pack")
        }
      }
    }
  }

  test("banded SW equals the full Gotoh reference on random strings") {
    // covering band (w >= len sum) ⇒ banded must EQUAL the unbanded
    // classic; narrow band ⇒ banded is a lower bound (it only removes
    // alignment paths) and exact whenever the optimum stays in-band
    def fullSW(t: String, q: String): Int = {
      val inf = Int.MinValue / 4
      val n = t.length; val m = q.length
      val H = Array.fill(m + 1, n + 1)(0)
      val E = Array.fill(m + 1, n + 1)(inf)
      val F = Array.fill(m + 1, n + 1)(inf)
      var best = 0
      for (i <- 1 to m; j <- 1 to n) {
        E(i)(j) = math.max(H(i)(j - 1) - 2, E(i)(j - 1) - 1)
        F(i)(j) = math.max(H(i - 1)(j) - 2, F(i - 1)(j) - 1)
        val s = if (t.charAt(j - 1) == q.charAt(i - 1)) 2 else -1
        H(i)(j) = math.max(math.max(0, H(i - 1)(j - 1) + s),
          math.max(E(i)(j), F(i)(j)))
        best = math.max(best, H(i)(j))
      }
      best
    }
    val rng = new scala.util.Random(42L)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
    import spark.implicits._
    val cases = (1 to 60).map { i =>
      (i.toLong, randStr(3 + rng.nextInt(25)), randStr(3 + rng.nextInt(12)))
    }
    // group by query (the expression binds one query per column)
    cases.groupBy(_._3).foreach { case (q, rows) =>
      val w = 40 // covers every diagonal of every pair
      val df = rows.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
        .withColumn("dstar", lit(0))
      val got = df.withColumn("sw",
          graft.GraftFunctions.bandedSw(col("text"), col("dstar"), q, w))
        .select("doc_id", "sw").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      rows.foreach { case (id, t, _) =>
        assert(got(id) == fullSW(t, q),
          s"covering band diverged from reference: q='$q' t='$t'")
      }
      // narrow band never exceeds the unbanded optimum
      val narrow = df.withColumn("sw",
          graft.GraftFunctions.bandedSw(col("text"), col("dstar"), q, 2))
        .select("doc_id", "sw").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      rows.foreach { case (id, t, _) =>
        assert(narrow(id) <= fullSW(t, q),
          s"narrow band exceeded the optimum: q='$q' t='$t'")
      }
    }
  }

  test("winnowing guarantee holds on random corpora with planted " +
       "shared substrings") {
    import spark.implicits._
    // property: for ANY padding and ANY positions, two docs sharing a
    // sufficiently long block surface as a pair. The op filters
    // n_shared >= 2, and one selected position can serve up to w
    // windows, so >= 2 guaranteed fingerprints needs G - w + 1 > w
    // fully-shared gram windows, i.e. block >= k + 2w - 1 = 39 chars
    // (47 here for margin; 31 guarantees only ONE fingerprint). Docs
    // sharing nothing that long must not pair (random 6-letter
    // alphabet: a chance 24-gram collision is ~6^-24 — negligible)
    val rng = new scala.util.Random(1234L)
    def randStr(n: Int) =
      (1 to n).map(_ => ('a' + rng.nextInt(6)).toChar).mkString
    for (trial <- 1 to 8) {
      val shared = randStr(47)
      val docs = Seq(
        (1L, randStr(20 + rng.nextInt(60)) + shared + randStr(rng.nextInt(40))),
        (2L, randStr(rng.nextInt(70)) + shared + randStr(10 + rng.nextInt(30))),
        (3L, randStr(120)),
        (4L, randStr(90))).toDF("doc_id", "text")
      val pairs = graft.operators.Dedup.winnowFingerprint(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)),
        s"trial $trial: planted 31-char block not detected")
      assert(!pairs.exists(p => p._1 >= 3L || p._2 >= 3L),
        s"trial $trial: unrelated random docs paired: $pairs")
    }
  }

  test("scd2 merge invariants hold on random snapshot pairs") {
    import spark.implicits._
    for (seed <- Seq(11L, 12L, 13L)) {
      val rng = new scala.util.Random(seed)
      // random current table and an incoming snapshot that mutates,
      // drops, and adds keys independently
      val cur = (1 to 60).map(i => (i.toLong, s"v${rng.nextInt(4)}"))
      val inc = (1 to 80).flatMap { i =>
        if (i <= 60 && rng.nextDouble() < 0.2) None // dropped key
        else Some((i.toLong, s"v${rng.nextInt(4)}"))
      }
      val curDf = cur.toDF("id", "attr")
      val incDf = inc.toDF("id", "attr")
      val got = graft.sources.Ingest.scd2Merge(curDf, incDf, "id", Seq("attr"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getBoolean(3)))
      val curM = cur.toMap
      val incM = inc.toMap
      // every key from either side appears; per-key shape follows the
      // (present-in, changed) outcome table; at most one current row
      (curM.keySet ++ incM.keySet).foreach { k =>
        val rows = got.filter(_._1 == k).toSeq
        assert(rows.count(_._4) <= 1, s"seed $seed key $k: multiple current rows")
        (curM.get(k), incM.get(k)) match {
          case (Some(o), Some(n)) if o == n =>
            assert(rows == Seq((k, o, 1, true)), s"seed $seed unchanged $k: $rows")
          case (Some(o), Some(n)) =>
            assert(rows.toSet == Set((k, o, 1, false), (k, n, 2, true)),
              s"seed $seed changed $k: $rows")
          case (Some(o), None) =>
            assert(rows == Seq((k, o, 1, false)), s"seed $seed removed $k: $rows")
          case (None, Some(n)) =>
            assert(rows == Seq((k, n, 1, true)), s"seed $seed added $k: $rows")
          case (None, None) => ()
        }
      }
    }
  }

  test("k-core fixpoint equals min-degree peeling on random sparse-id graphs") {
    // The r11 fixpoint loop must land on coreness for ANY graph shape,
    // not just the synthetic 3-out-regular corpus: random graphs with
    // sparse/negative 64-bit ids, self-loops, and parallel edges,
    // checked against an independent Batagelj–Zaveršnik peeling.
    import spark.implicits._
    for (seed <- Seq(11L, 12L, 13L)) {
      val rng = new scala.util.Random(seed)
      val nNodes = 40 + rng.nextInt(40)
      val ids = Array.tabulate(nNodes)(i =>
        rng.nextLong() % (1L << 50) - (if (i % 3 == 0) (1L << 40) else 0L))
      val m = nNodes * 2 + rng.nextInt(nNodes)
      val edges = (1 to m).map { _ =>
        (ids(rng.nextInt(nNodes)), ids(rng.nextInt(nNodes)))
      } ++ Seq((ids(0), ids(0))) // a self-loop simple semantics must drop
      // reference peeling over the simplified graph
      val simple = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      val touched = simple.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val adj = scala.collection.mutable.Map(
        touched.map(v => v -> scala.collection.mutable.Set[Long]()): _*)
      simple.foreach { case (a, b) => adj(a) += b; adj(b) += a }
      val core = scala.collection.mutable.Map[Long, Int]()
      val alive = scala.collection.mutable.Set(touched: _*)
      var kmax = 0
      while (alive.nonEmpty) {
        val v = alive.minBy(u => (adj(u).size, u))
        kmax = math.max(kmax, adj(v).size)
        core(v) = kmax
        adj(v).foreach(u => adj(u) -= v)
        adj(v).clear(); alive -= v
      }
      val want = core.toSeq.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (c, vs) => (c.toLong, vs.size.toLong,
          vs.map(_._1).min, vs.map(_._1).max) }
      val got = graft.operators.Graph.g5KcoreEdges(edges.toDF("src", "dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq == want, s"seed $seed: got ${got.toSeq}, want $want")
    }
  }

  test("components fixpoint equals union-find on random sparse-id graphs") {
    import spark.implicits._
    for (seed <- Seq(21L, 22L)) {
      val rng = new scala.util.Random(seed)
      val nNodes = 60 + rng.nextInt(40)
      val ids = Array.tabulate(nNodes)(_ => rng.nextLong() % (1L << 44))
      // sparse edge set (below the connectivity threshold → several
      // components, some singleton-free since nodes come from edges)
      val m = nNodes / 2 + rng.nextInt(nNodes / 2)
      val edges = (1 to m).map { _ =>
        (ids(rng.nextInt(nNodes)), ids(rng.nextInt(nNodes)))
      }
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        r
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.foreach { case (a, b) => parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b); union(a, b) }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = nodes.groupBy(find).toSeq.sortBy(_._1)
        .map { case (c, vs) => (c, vs.size.toLong, vs.min, vs.max) }
      val got = graft.operators.Graph.g2ComponentsEdges(edges.toDF("src", "dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.toSeq == want, s"seed $seed: got ${got.toSeq}, want $want")
    }
  }

  test("bfs fixpoint equals queue BFS on random sparse-id graphs") {
    // g8's min-plus relaxation must land on hop distance for ANY
    // graph shape — random sparse graphs (several components, so
    // unreachable −1 is exercised), sparse/negative 64-bit ids,
    // checked against an independent queue BFS.
    import spark.implicits._
    for (seed <- Seq(31L, 32L)) {
      val rng = new scala.util.Random(seed)
      val nNodes = 50 + rng.nextInt(40)
      val ids = Array.tabulate(nNodes)(i =>
        rng.nextLong() % (1L << 44) - (if (i % 4 == 0) (1L << 40) else 0L))
      val m = nNodes / 2 + rng.nextInt(nNodes)
      val edges = (1 to m).map { _ =>
        (ids(rng.nextInt(nNodes)), ids(rng.nextInt(nNodes)))
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val src = nodes.min
      val adj = scala.collection.mutable.Map(
        nodes.map(v => v -> scala.collection.mutable.Set[Long]()): _*)
      edges.foreach { case (a, b) => adj(a) += b; adj(b) += a }
      val dist = scala.collection.mutable.Map(src -> 0L)
      val q = scala.collection.mutable.Queue(src)
      while (q.nonEmpty) {
        val v = q.dequeue()
        adj(v).foreach { u =>
          if (!dist.contains(u)) { dist(u) = dist(v) + 1; q += u }
        }
      }
      val want = nodes.sorted.map(v => (v, dist.getOrElse(v, -1L)))
      val got = graft.operators.Graph
        .g8BfsEdges(edges.toDF("src", "dst"), src)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq == want, s"seed $seed: got ${got.toSeq}, want $want")
    }
  }

  test("weighted shortest paths equal Dijkstra on random sparse-id " +
       "weighted graphs") {
    import spark.implicits._
    for (seed <- Seq(51L, 52L)) {
      val rng = new scala.util.Random(seed)
      val nNodes = 40 + rng.nextInt(30)
      val ids = Array.tabulate(nNodes)(_ => rng.nextLong() % (1L << 42))
      val m = nNodes + rng.nextInt(nNodes)
      val edges = (1 to m).map { _ =>
        (ids(rng.nextInt(nNodes)), ids(rng.nextInt(nNodes)),
          1L + rng.nextInt(9))
      }.filter(e => e._1 != e._2)
      val src = edges.head._1
      // Dijkstra over the undirected weighted multigraph
      val adj = edges.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
        .groupBy(_._1).map { case (v, es) => v -> es.map(e => (e._2, e._3)) }
      val dist = scala.collection.mutable.Map(src -> 0L)
      val pq = scala.collection.mutable.PriorityQueue((0L, src))(
        Ordering.by[(Long, Long), Long](-_._1))
      while (pq.nonEmpty) {
        val (d, v) = pq.dequeue()
        if (dist(v) == d)
          adj.getOrElse(v, Seq.empty).foreach { case (u, w) =>
            if (dist.getOrElse(u, Long.MaxValue) > d + w) {
              dist(u) = d + w; pq.enqueue((d + w, u))
            }
          }
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val want = nodes.map(v => (v, dist.getOrElse(v, -1L)))
      val got = graft.operators.Graph
        .g12WspEdges(edges.toDF("src", "dst", "w"), src)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq == want, s"seed $seed: got ${got.toSeq}, want $want")
    }
  }

  test("weighted shortest paths refuse non-positive weights loudly") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      graft.operators.Graph.g12WspEdges(
        Seq((0L, 1L, 1L), (1L, 2L, 0L)).toDF("src", "dst", "w"), 0L)
    }
    // null weights: min(w) ignores NULLs, so without an explicit null
    // count the edge would be silently dropped from the relaxation
    // (r12 ADVICE) — one null among valid weights must refuse...
    val someNull = intercept[IllegalArgumentException] {
      graft.operators.Graph.g12WspEdges(
        Seq((0L, 1L, java.lang.Long.valueOf(1L)),
            (1L, 2L, null.asInstanceOf[java.lang.Long]))
          .toDF("src", "dst", "w"), 0L)
    }
    assert(someNull.getMessage.contains("null"), someNull.getMessage)
    // ...and an ALL-null column must refuse too, not NPE on min(w)
    val allNull = intercept[IllegalArgumentException] {
      graft.operators.Graph.g12WspEdges(
        Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
          .withColumn("w", lit(null).cast("long")), 0L)
    }
    assert(allNull.getMessage.contains("null"), allNull.getMessage)
  }

  test("LPA K-step plurality equals a sequential replica on random " +
       "sparse-id graphs") {
    // g10's deterministic plurality rule (max count, min label) must
    // reproduce a sequential synchronous replica for ANY graph shape,
    // including graphs that never reach a fixpoint — the fixed K is
    // the contract.
    import spark.implicits._
    for (seed <- Seq(41L, 42L)) {
      val rng = new scala.util.Random(seed)
      val nNodes = 50 + rng.nextInt(30)
      val ids = Array.tabulate(nNodes)(_ => rng.nextLong() % (1L << 43))
      val m = nNodes + rng.nextInt(2 * nNodes)
      val edges = (1 to m).map { _ =>
        (ids(rng.nextInt(nNodes)), ids(rng.nextInt(nNodes)))
      }
      val simple = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val adj = simple.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
      var lab = adj.keys.map(v => v -> v).toMap
      for (_ <- 1 to graft.operators.Graph.LpaIters)
        lab = adj.map { case (v, ns) =>
          v -> ns.map(lab).groupBy(identity).toSeq
            .map { case (l, xs) => (-xs.size.toLong, l) }.min._2
        }
      val want = lab.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (l, vs) => (l, vs.size.toLong, vs.keys.min, vs.keys.max) }
      val got = graft.operators.Graph
        .g10LpaEdges(edges.toDF("src", "dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      assert(got.toSeq == want, s"seed $seed: got ${got.toSeq}, want $want")
    }
  }

  test("roundz canonicalizes IEEE -0.0 at every rounded signed output " +
      "(the r12 t24 hash-gate class)") {
    import spark.implicits._
    // A tiny negative rounds to zero: DuckDB's float-side round keeps
    // the sign bit (-0.0), Spark's BigDecimal round drops it. The
    // driver hashes bytes, so the two zeros differ. roundz is the
    // class-wide fix: round then + 0.0 (IEEE: -0.0 + 0.0 = +0.0,
    // identity elsewhere). Bit-level assertions, not ==, throughout —
    // == is exactly the comparator that let the r12 escape through.
    def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    val negZeroBits = bits(-0.0)
    assert(negZeroBits != 0L, "sanity: -0.0 has its own bit pattern")
    val probes = Seq(-1e-9, -0.0, 0.0, 1e-9, -4.9999e-7, 0.1234565,
      -0.1234565, Double.NaN, 12.5)
    val got = probes.toDF("x")
      .select(GraftFunctions.roundz(col("x"), 6).as("r"))
      .collect().map(_.getDouble(0))
    got.zip(probes).foreach { case (r, p) =>
      assert(bits(r) != negZeroBits, s"roundz($p, 6) emitted -0.0")
    }
    // identity away from zero (rounding still applied)
    assert(got(8) == 12.5 && got(5) != 0.0 && got(5) > 0.12)
    // null passes through as null, not 0.0
    val nres = Seq[java.lang.Double](null).toDF("x")
      .select(GraftFunctions.roundz(col("x"), 6).as("r")).collect()
    assert(nres.head.isNullAt(0), "roundz(null) must stay null")

    // cosine-score family representative: a forced tiny-negative
    // cosine that rounds to zero flows through d5's rounded output
    // with +0.0 bits (same expression shape as s1/s2/s5/s6/s11/s12)
    val e = Seq(
      (0L, Array(1.0, 0.0), 0L),
      (1L, Array(-1e-8, 1.0), 0L)).toDF("vec_id", "embedding", "label")
    val d5 = operators.Dedup.embedNeardup(spark, e).collect()
    assert(d5.length == 1)
    val cos = d5.head.getDouble(2)
    assert(cos == 0.0 && bits(cos) == 0L,
      s"d5 cos_sim must be +0.0, got bits ${bits(cos).toHexString}")

    // t24 representative at data scale: every zero-valued dsir_score
    // on the real sf table must carry +0.0 bits (doc 194 at sf0.01 is
    // the known negative-numerator row the r12 driver gate caught)
    val t24 = operators.TextOps.dsirWeights(spark, sfDir)
      .filter(col("dsir_score") === 0.0).collect()
    t24.foreach { r =>
      val v = r.getDouble(2)
      assert(bits(v) == 0L,
        s"t24 doc ${r.getLong(0)}: dsir_score -0.0 leaked")
    }
  }

  test("d18 containment equals a quadratic JVM replica on random " +
       "corpora with planted subset structure") {
    import spark.implicits._
    val P = 2147483647L
    def shingles(text: String): Seq[String] = {
      val w = text.split(" ", -1)
      (0 until math.max(w.length - 2, 1))
        .map(i => w.slice(i, math.min(i + 3, w.length)).mkString(" "))
        .distinct
    }
    def h(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 131 + c.toLong) % P)
    for (seed <- Seq(21L, 22L)) {
      val rng = new scala.util.Random(seed)
      // random docs over a small vocabulary (forces shared shingles),
      // plus planted prefix-subsets of random hosts
      val base = (0 until 12).map { i =>
        i.toLong -> (1 to (8 + rng.nextInt(30)))
          .map(_ => s"v${rng.nextInt(12)}").mkString(" ")
      }
      val planted = (0 until 3).map { k =>
        val host = base(rng.nextInt(base.size))._2
        val words = host.split(" ")
        (100L + k) -> words.take(5 + rng.nextInt(words.length - 4))
          .mkString(" ")
      }
      val corpus = base ++ planted
      val got = graft.operators.Dedup
        .containment(corpus.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      // quadratic reference: all pairs, distinct-hash intersections
      val hl = corpus.map { case (id, t) => id -> shingles(t).map(h).distinct.toSet }.toMap
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val want = (for {
        (a, sa) <- hl; (b, sb) <- hl if a < b
        inter = (sa intersect sb).size
        small = math.min(sa.size, sb.size)
        c = r6(inter.toDouble / small)
        if c >= graft.operators.Dedup.ContainThresh
      } yield {
        val (cd, cr) = if (sa.size < sb.size || (sa.size == sb.size && a < b))
          (a, b) else (b, a)
        (cd, cr) -> ((inter.toLong, small.toLong, c))
      }).toMap
      assert(got == want, s"seed $seed: got $got, want $want")
      // the planted prefixes guarantee the suite is non-vacuous
      assert(want.nonEmpty, s"seed $seed produced no containment pairs")
    }
  }
}
