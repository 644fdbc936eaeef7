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

  test("bloom-prefiltered decontamination equals the exact operator, " +
       "even under a deliberately FP-riddled tiny bloom") {
    val docs = Tables.load(spark, sfDir, "documents")
    val exact = Dedup.decontaminate(docs, "src0").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // default sizing
    val bloomed = Dedup.bloomDecontaminate(docs, "src0").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bloomed == exact, "bloom path diverged from the exact operator")
    // 64-bit bloom over thousands of shingles: nearly every probe is a
    // false positive — the verify join must still produce the exact
    // answer (no-false-negatives + exact verify = correctness never
    // depends on bloom sizing)
    val tiny = Dedup.bloomDecontaminate(docs, "src0",
        estItems = 4L, numBits = 64L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(tiny == exact, "FP-riddled bloom changed the answer")
    // and the default bloom genuinely prunes: an impossible-shingle
    // stream (disjoint vocabulary) survives at well under 100%
    import spark.implicits._
    val clean = Seq((900L, "qq ww ee rr tt yy uu ii oo pp", "train"))
      .toDF("doc_id", "text", "source")
    val benchDocs = docs.filter(col("source") === "src0")
      .select(col("doc_id"), col("text"), col("source"))
    val res = Dedup.bloomDecontaminate(benchDocs.unionByName(clean), "src0")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(res == Map(900L -> 0L))
  }

  test("daily top-k ranks event types per day through TopKPerGroup, " +
       "matching a local recount") {
    val events = Tables.load(spark, sfDir, "events")
    val got = Events.dailyTopk(events, 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    // independent recount
    val counts = events
      .select(to_date(col("ts")).as("d"), col("event_type")).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)))
      .groupBy(identity).map { case (k, vs) => (k._1, k._2, vs.size.toLong) }
    val want = counts.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (day, ts) =>
        ts.toSeq.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex
          .map { case ((_, typ, c), i) => (day, typ, c, i + 1) }
    }
    assert(got.toSeq == want, s"first diff: ${
      got.toSeq.zip(want).find { case (g, w) => g != w }}")
    // the plan must rank through the native TopKPerGroup, not a window
    val plan = Events.dailyTopk(events, 3)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Window"),
      "daily top-k fell back to a window total sort")
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

  test("UniFrac covers every pair in [0,1] and rewards shared ancestry " +
       "where flat-taxon measures cannot") {
    import spark.implicits._
    val res = graft.operators.Relational.q44TaxonomyUnifrac(spark, sfDir)
      .collect()
    val samples = (res.map(_.getString(0)) ++ res.map(_.getString(1)))
      .distinct.length
    assert(res.length == samples * (samples - 1) / 2,
      s"expected all ${samples * (samples - 1) / 2} pairs, got ${res.length}")
    assert(res.forall { r =>
      val v = r.getDouble(2); v >= 0.0 && v <= 1.0
    }, "UniFrac outside [0,1]")
    assert(res.forall(r => r.getString(0) < r.getString(1)), "pair order")
    // planted tree geometry with EXACT expected values: A and B are
    // sibling taxa (same mfgr/brand/type, different size+part — they
    // differ on 2 of the 5 levels ⇒ Σ|pA−pB| = 4 ⇒ 4/10); C sits
    // under a different mfgr entirely (all 5 levels differ ⇒ 10/10).
    // A flat-taxon measure (q30 semantics) calls BOTH pairs maximally
    // dissimilar — the tree is what separates them.
    val leaves = Seq(
      ("A", "MFGR#1", "Brand#11", "ECONOMY", 1, 1L, BigDecimal("10.00")),
      ("B", "MFGR#1", "Brand#11", "ECONOMY", 2, 2L, BigDecimal("10.00")),
      ("C", "MFGR#2", "Brand#22", "STANDARD", 3, 3L, BigDecimal("10.00")))
      .toDF("n_name", "p_mfgr", "p_brand", "p_type", "p_size", "p_partkey",
        "qty")
    val got = graft.operators.Relational.unifracFromLeaves(leaves).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got == Map(("A", "B") -> 0.4, ("A", "C") -> 1.0,
      ("B", "C") -> 1.0), got.toString)
    // identical distributions are at distance exactly 0
    val twin = Seq(
      ("A", "MFGR#1", "Brand#11", "ECONOMY", 1, 1L, BigDecimal("7.00")),
      ("B", "MFGR#1", "Brand#11", "ECONOMY", 1, 1L, BigDecimal("3.00")))
      .toDF("n_name", "p_mfgr", "p_brand", "p_type", "p_size", "p_partkey",
        "qty")
    val z = graft.operators.Relational.unifracFromLeaves(twin).collect()
    assert(z.map(r => r.getDouble(2)).toSeq == Seq(0.0), z.mkString(","))
  }

  test("core-taxa screen keeps the 80%-prevalent taxon, drops the rare one, " +
       "and averages shares over PRESENT samples only") {
    import spark.implicits._
    // region R, 5 samples. Z everywhere (prevalence 1.0), X in 4/5
    // (exactly the 0.8 cut — must be KEPT, the boundary is >=),
    // Y in 2/5 (0.4 — dropped).
    val ab = Seq(
      ("R", "s1", "Z", "60.00"), ("R", "s1", "X", "40.00"),
      ("R", "s2", "Z", "60.00"), ("R", "s2", "X", "40.00"),
      ("R", "s3", "Z", "60.00"), ("R", "s3", "X", "40.00"),
      ("R", "s4", "Z", "20.00"), ("R", "s4", "X", "20.00"),
      ("R", "s4", "Y", "60.00"),
      ("R", "s5", "Z", "50.00"), ("R", "s5", "Y", "50.00"))
      .map { case (r, n, t, q) => (r, n, t, BigDecimal(q)) }
      .toDF("r_name", "n_name", "p_type", "qty")
    val got = graft.operators.Relational.coreTaxaFromAbundance(ab).collect()
      .map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == Set("X", "Z"), s"wrong core set: $got")
    // X present in s1..s4: shares 0.4, 0.4, 0.4, 0.2 → mean 0.35
    assert(got("X") == ((5L, 4L, 0.8, 0.35)), got.toString)
    // Z: 0.6, 0.6, 0.6, 0.2, 0.5 → mean 0.5
    assert(got("Z") == ((5L, 5L, 1.0, 0.5)), got.toString)
    // sf corpus invariants: prevalence respects the cut, present <= group
    val res = graft.operators.Relational.q45CoreTaxa(spark, sfDir).collect()
    assert(res.nonEmpty, "empty core set on the sf corpus")
    assert(res.forall(r => r.getDouble(4) >= 0.8 &&
      r.getLong(3) <= r.getLong(2)), "prevalence cut violated")
    assert(res.forall { r =>
      val m = r.getDouble(5); m > 0.0 && m <= 1.0 }, "mean share range")
  }

  test("PERMANOVA separates planted clusters, is exactly null-calibrated " +
       "on an all-equal matrix, and its permutation deal preserves sizes") {
    import spark.implicits._
    import graft.operators.Relational
    // 6 samples, 2 groups of 3. Within-group distance 0.1, between 0.9
    // → F is huge and (almost) no permutation reaches it
    val names = Seq("s1", "s2", "s3", "t1", "t2", "t3")
    val samples = names.zipWithIndex
      .map { case (nm, i) => (nm, i.toLong, nm.substring(0, 1)) }
      .toDF("n_name", "k", "r_name")
    val pairs = for {
      i <- names.indices; j <- names.indices if names(i) < names(j)
    } yield (names(i), names(j),
      if (names(i)(0) == names(j)(0)) 0.1 else 0.9)
    val sep = Relational.permanovaFromDistances(
      pairs.toDF("sample_a", "sample_b", "bray_curtis"), samples).head()
    assert(sep.getLong(0) == 6L && sep.getLong(1) == 2L)
    assert(sep.getDouble(2) > 10.0, s"separated F too small: $sep")
    assert(sep.getLong(3) == Relational.PermanovaPerms)
    assert(sep.getDouble(5) < 0.2, s"separated p not small: $sep")
    // all-equal distances: every labeling gives the identical F, so
    // ALL permutations tie the observed value and p = 1 exactly
    val flat = pairs.map { case (a, b, _) => (a, b, 0.5) }
    val nul = Relational.permanovaFromDistances(
      flat.toDF("sample_a", "sample_b", "bray_curtis"), samples).head()
    assert(nul.getLong(4) == Relational.PermanovaPerms &&
      nul.getDouble(5) == 1.0, s"null not calibrated: $nul")
    // real-corpus shape: one row, p in (0, 1], F finite
    val sf = Relational.q46Permanova(spark, sfDir).head()
    assert(sf.getLong(3) == Relational.PermanovaPerms)
    assert(sf.getDouble(5) > 0.0 && sf.getDouble(5) <= 1.0 &&
      !sf.getDouble(2).isNaN, s"sf PERMANOVA shape: $sf")
  }

  test("Mantel r is exactly 1 on identical matrices, detects planted " +
       "agreement, and its permutation null kills an unrelated matrix") {
    import spark.implicits._
    import graft.operators.Relational
    val names = (1 to 8).map(i => f"s$i%02d")
    val keys = names.zipWithIndex
      .map { case (nm, i) => (nm, i.toLong) }.toDF("n_name", "k")
    def pairsOf(f: (String, String) => Double) = (for {
      i <- names.indices; j <- names.indices if names(i) < names(j)
    } yield (names(i), names(j), f(names(i), names(j))))
    // identical matrices → r exactly 1 and NO permutation beats it
    // strictly... but ties count (>=): permutations of a constant-
    // structure matrix tie only if they preserve the values; use a
    // value pattern injective enough that ties are the identity only
    val base = pairsOf((a, b) => 0.1 * (a.hashCode % 7).abs
      + 0.05 * (b.hashCode % 5).abs + 0.2)
    val self = Relational.mantelFromDistances(
      base.toDF("sample_a", "sample_b", "x"),
      base.map { case (a, b, v) => (a, b, v) }
        .toDF("sample_a", "sample_b", "y"),
      keys).head()
    assert(self.getDouble(2) == 1.0, s"self-Mantel r != 1: $self")
    assert(self.getDouble(5) < 0.2, s"self-Mantel p not small: $self")
    // y = affine(x) still correlates exactly 1 (Pearson invariance)
    val affine = Relational.mantelFromDistances(
      base.toDF("sample_a", "sample_b", "x"),
      base.map { case (a, b, v) => (a, b, 0.5 * v + 0.1) }
        .toDF("sample_a", "sample_b", "y"),
      keys).head()
    assert(affine.getDouble(2) == 1.0, s"affine invariance: $affine")
    // an unrelated structure: p lands in the null's bulk (> 0.05)
    val other = pairsOf((a, b) =>
      0.1 * ((a + b).hashCode % 11).abs + 0.1)
    val un = Relational.mantelFromDistances(
      base.toDF("sample_a", "sample_b", "x"),
      other.toDF("sample_a", "sample_b", "y"), keys).head()
    assert(un.getDouble(5) > 0.05, s"unrelated matrix p too small: $un")
    // real corpus: the test's JOB is the honest verdict, whatever it
    // is — on this near-uniform synthetic corpus the tree-aware and
    // flat views genuinely disagree (r ≈ 0.11, p ≈ 0.3), which is
    // exactly the signal a practitioner reads off a Mantel report.
    // Gate the SHAPE: full pair census, r in [−1, 1], p in (0, 1]
    val sf = Relational.q47Mantel(spark, sfDir).head()
    assert(sf.getLong(0) == 25L && sf.getLong(1) == 300L, s"shape: $sf")
    assert(sf.getDouble(2) >= -1.0 && sf.getDouble(2) <= 1.0 &&
      !sf.getDouble(2).isNaN, s"Mantel r range: $sf")
    assert(sf.getDouble(5) > 0.0 && sf.getDouble(5) <= 1.0, s"p range: $sf")
  }

  test("Mantel correlogram: a planted linear gradient reads positive " +
       "at short range and negative at long range, a constant " +
       "community NULLs out, censuses complete") {
    import spark.implicits._
    import graft.operators.Relational
    val names = (1 to 8).map(i => f"s$i%02d")
    val keys = names.zipWithIndex
      .map { case (nm, i) => (nm, i.toLong) }.toDF("n_name", "k")
    val env = names.zipWithIndex
      .map { case (nm, i) => ("pos", nm, i.toDouble) }
      .toDF("variable", "n_name", "v")
    def pairsOf(f: (Int, Int) => Double) = (for {
      i <- names.indices; j <- names.indices if i < j
    } yield (names(i), names(j), f(i, j)))
    // community dissimilarity IS the env gap: near pairs similar, far
    // pairs different — the textbook gradient correlogram
    val grad = pairsOf((i, j) => (j - i) / 10.0)
    val rows = Relational.mantelCorrelogFromInputs(
      grad.toDF("sample_a", "sample_b", "x"), env, keys).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    // the |i−j| ∈ {1,2}/{3}/{4,5}/{6,7} class censuses: 13/5/7/3
    assert(rows.map(_._4).toSeq == Seq(13L, 5L, 7L, 3L),
      rows.mkString(";"))
    // d ladder contiguous: each class's hi is the next class's lo
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 == b._2, s"ladder gap: $a -> $b")
      case _ => }
    // Moran-style signs: positive (and significant) at short range,
    // negative (positive-side p near 1) at the longest range
    assert(rows(0)._5.get > 0.0 && rows(0)._6.get < 0.1,
      rows(0).toString)
    assert(rows(3)._5.get < 0.0 && rows(3)._6.get > 0.5,
      rows(3).toString)
    // progressive Bonferroni: p_adj = min(1, p·(class+1)), never
    // below the raw p
    rows.foreach { r0 => r0._6.foreach { p =>
      assert(r0._7.get >= p - 1e-12 && r0._7.get <= 1.0, r0.toString) } }
    // a constant community matrix has zero variance: every class NULL
    val const = Relational.mantelCorrelogFromInputs(
      pairsOf((_, _) => 0.3).toDF("sample_a", "sample_b", "x"),
      env, keys).collect()
    assert(const.length == 4 && const.forall(_.isNullAt(4)),
      const.mkString(";"))
    // corpus: full pair census across classes, r bounded, p in (0,1]
    val sf = Relational.q87MantelCorrelog(spark, sfDir).collect()
    assert(sf.map(_.getLong(3)).sum == 300L, sf.mkString(";"))
    sf.foreach { r0 =>
      if (!r0.isNullAt(4)) {
        assert(math.abs(r0.getDouble(4)) <= 1.0, r0.toString)
        assert(r0.getDouble(5) > 0.0 && r0.getDouble(5) <= 1.0,
          r0.toString)
      }
    }
  }

  test("Partial Mantel keeps r = 1 exactly when x and y agree beyond " +
       "the covariate, and strips a shared-gradient confound") {
    import spark.implicits._
    import graft.operators.Relational
    val names = (1 to 8).map(i => f"s$i%02d")
    val keys = names.zipWithIndex
      .map { case (nm, i) => (nm, i.toLong) }.toDF("n_name", "k")
    def pairsOf(f: (String, String) => Double) = (for {
      i <- names.indices; j <- names.indices if names(i) < names(j)
    } yield (names(i), names(j), f(names(i), names(j))))
    // y = x with an unrelated covariate: r_xy = 1 and r_xz = r_yz, so
    // the partial collapses to (1 − c²)/(1 − c²) = 1 exactly on the
    // round-9 grid
    val base = pairsOf((a, b) => 0.1 * (a.hashCode % 7).abs
      + 0.05 * (b.hashCode % 5).abs + 0.2)
    val other = pairsOf((a, b) => 0.1 * ((a + b).hashCode % 11).abs + 0.1)
    val self = Relational.partialMantelFromDistances(
      base.toDF("sample_a", "sample_b", "x"),
      base.map { case (a, b, v) => (a, b, v) }
        .toDF("sample_a", "sample_b", "y"),
      other.toDF("sample_a", "sample_b", "zv"), keys).head()
    assert(self.getDouble(2) == 1.0, s"agreement partial r != 1: $self")
    assert(self.getDouble(5) < 0.2, s"agreement p not small: $self")
    // confound: x and y each = shared gradient z + independent jitter.
    // The plain Mantel reads the shared gradient as agreement; the
    // partial controls it away — partial r must drop strictly below
    val grad = pairsOf((a, b) => 0.1 * ((a + b).hashCode % 13).abs + 0.2)
    val xj = pairsOf((a, b) =>
      0.1 * ((a + b).hashCode % 13).abs + 0.2
        + 0.03 * ((a.hashCode * 31 + b.hashCode) % 7).abs)
    val yj = pairsOf((a, b) =>
      0.1 * ((a + b).hashCode % 13).abs + 0.2
        + 0.03 * ((a.hashCode * 17 + b.hashCode) % 5).abs)
    val plain = Relational.mantelFromDistances(
      xj.toDF("sample_a", "sample_b", "x"),
      yj.toDF("sample_a", "sample_b", "y"), keys).head()
    val part = Relational.partialMantelFromDistances(
      xj.toDF("sample_a", "sample_b", "x"),
      yj.toDF("sample_a", "sample_b", "y"),
      grad.toDF("sample_a", "sample_b", "zv"), keys).head()
    assert(plain.getDouble(2) > 0.5, s"confounded plain r too low: $plain")
    assert(part.getDouble(2) < plain.getDouble(2) - 0.1,
      s"partial did not strip the gradient: plain=$plain partial=$part")
    // real corpus: full census, r in [−1, 1], p in (0, 1]
    val sf = Relational.q68PartialMantel(spark, sfDir).head()
    assert(sf.getLong(0) == 25L && sf.getLong(1) == 300L, s"shape: $sf")
    assert(sf.getDouble(2) >= -1.0 && sf.getDouble(2) <= 1.0 &&
      !sf.getDouble(2).isNaN, s"partial r range: $sf")
    assert(sf.getDouble(5) > 0.0 && sf.getDouble(5) <= 1.0, s"p range: $sf")
  }

  test("ANOSIM R is exactly 1 on perfectly separated groups, exactly 0 " +
       "with p = 1 on an all-equal matrix, and sane on the sf corpus") {
    import spark.implicits._
    import graft.operators.Relational
    // 6 samples, 2 groups of 3: all 6 within-pairs at 0.1 (tied ranks
    // 1..6, avg 3.5), all 9 between-pairs at 0.9 (avg rank 11) →
    // R = (11 − 3.5)/(15/2) = 1.0 EXACTLY, and no permutation that
    // moves any sample across groups can tie it, so p = 1/(P+1)
    val names = Seq("s1", "s2", "s3", "t1", "t2", "t3")
    val samples = names.zipWithIndex
      .map { case (nm, i) => (nm, i.toLong, nm.substring(0, 1)) }
      .toDF("n_name", "k", "r_name")
    val pairs = for {
      i <- names.indices; j <- names.indices if names(i) < names(j)
    } yield (names(i), names(j),
      if (names(i)(0) == names(j)(0)) 0.1 else 0.9)
    val sep = Relational.anosimFromDistances(
      pairs.toDF("sample_a", "sample_b", "bray_curtis"), samples).head()
    assert(sep.getLong(0) == 6L && sep.getLong(1) == 2L, sep.toString)
    assert(sep.getDouble(2) == 1.0, s"separated R != 1: $sep")
    assert(sep.getLong(3) == Relational.PermanovaPerms)
    assert(sep.getDouble(5) == math.rint(1.0e6
      / (Relational.PermanovaPerms + 1)) / 1.0e6,
      s"separated p not minimal: $sep")
    // all-equal distances: every pair carries the identical average
    // rank, so R = 0 for the observed AND every permuted labeling —
    // all permutations tie and p = 1 exactly
    val flat = pairs.map { case (a, b, _) => (a, b, 0.5) }
    val nul = Relational.anosimFromDistances(
      flat.toDF("sample_a", "sample_b", "bray_curtis"), samples).head()
    assert(nul.getDouble(2) == 0.0, s"null R != 0: $nul")
    assert(nul.getLong(4) == Relational.PermanovaPerms &&
      nul.getDouble(5) == 1.0, s"null not calibrated: $nul")
    // inverted structure (within pairs FAR, between pairs close) →
    // R is negative, the diagnostic reading ANOSIM is known for
    val inv = pairs.map { case (a, b, d) => (a, b, 1.0 - d) }
    val neg = Relational.anosimFromDistances(
      inv.toDF("sample_a", "sample_b", "bray_curtis"), samples).head()
    assert(neg.getDouble(2) == -1.0, s"inverted R != -1: $neg")
    // real corpus: gate the shape — full census, R in [−1, 1], p in (0, 1]
    val sf = Relational.q51Anosim(spark, sfDir).head()
    assert(sf.getLong(0) == 25L && sf.getLong(1) == 5L, s"sf shape: $sf")
    assert(sf.getDouble(2) >= -1.0 && sf.getDouble(2) <= 1.0 &&
      !sf.getDouble(2).isNaN, s"sf R range: $sf")
    assert(sf.getLong(3) == Relational.PermanovaPerms)
    assert(sf.getDouble(5) > 0.0 && sf.getDouble(5) <= 1.0, s"sf p: $sf")
  }

  test("MRPP delta is the within-group mean exactly, A = 0 with p = 1 " +
       "on an all-equal matrix, and sane on the sf corpus") {
    import spark.implicits._
    import graft.operators.Relational
    // 6 samples, 2 groups of 3: all within pairs at 0.1 → each group's
    // ξ = 0.1 and δ_obs = 0.1 exactly. A permuted δ ties 0.1 only when
    // the deal reproduces the set-partition — the SAME condition the
    // ANOSIM spec already proves never fires over these 60 deals — so
    // n_le = 0 and p = 1/(P+1) exactly; every permuted δ mixes in 0.9
    // pairs, so E(δ) > δ_obs and A > 0
    val names = Seq("s1", "s2", "s3", "t1", "t2", "t3")
    val samples = names.zipWithIndex
      .map { case (nm, i) => (nm, i.toLong, nm.substring(0, 1)) }
      .toDF("n_name", "k", "r_name")
    val pairs = for {
      i <- names.indices; j <- names.indices if names(i) < names(j)
    } yield (names(i), names(j),
      if (names(i)(0) == names(j)(0)) 0.1 else 0.9)
    val sep = Relational.mrppFromDistances(
      pairs.toDF("sample_a", "sample_b", "bray_curtis"), samples).head()
    assert(sep.getLong(0) == 6L && sep.getLong(1) == 2L, sep.toString)
    assert(sep.getDouble(2) == 0.1, s"separated delta != 0.1: $sep")
    assert(sep.getDouble(3) > 0.0, s"separated A not positive: $sep")
    assert(sep.getLong(4) == Relational.PermanovaPerms)
    assert(sep.getDouble(6) == math.rint(1.0e6
      / (Relational.PermanovaPerms + 1)) / 1.0e6,
      s"separated p not minimal: $sep")
    // all-equal distances: δ = 0.5 for the observed AND every permuted
    // labeling — all permutations tie (≤), p = 1, and A = 1 − 0.5/0.5
    // = 0 exactly
    val flat = pairs.map { case (a, b, _) => (a, b, 0.5) }
    val nul = Relational.mrppFromDistances(
      flat.toDF("sample_a", "sample_b", "bray_curtis"), samples).head()
    assert(nul.getDouble(2) == 0.5, s"null delta != 0.5: $nul")
    assert(nul.getDouble(3) == 0.0, s"null A != 0: $nul")
    assert(nul.getLong(5) == Relational.PermanovaPerms &&
      nul.getDouble(6) == 1.0, s"null not calibrated: $nul")
    // real corpus: gate the shape — full census, δ in (0, 1], A finite,
    // p in (0, 1]
    val sf = Relational.q67Mrpp(spark, sfDir).head()
    assert(sf.getLong(0) == 25L && sf.getLong(1) == 5L, s"sf shape: $sf")
    assert(sf.getDouble(2) > 0.0 && sf.getDouble(2) <= 1.0, s"sf delta: $sf")
    assert(!sf.getDouble(3).isNaN && sf.getDouble(3) < 1.0, s"sf A: $sf")
    assert(sf.getLong(4) == Relational.PermanovaPerms)
    assert(sf.getDouble(6) > 0.0 && sf.getDouble(6) <= 1.0, s"sf p: $sf")
  }

  test("Multipatt: a two-group taxon indicates the UNION exactly 1, " +
       "a half-present single-group taxon scores sqrt(1/2), corpus sane") {
    import spark.implicits._
    import graft.operators.Relational
    val names = Seq("a1", "a2", "b1", "b2", "c1", "c2")
    val samples = names.zipWithIndex
      .map { case (nm, i) => (nm, i.toLong, nm.substring(0, 1)) }
      .toDF("n_name", "k", "r_name")
    // X fills groups a AND b uniformly, absent from c: the single-group
    // IndVal (q52) splits its specificity, but the combination lattice
    // scores "a+b" at A = 1, B = 1 → √(A·B) = 1 exactly. Y sits in one
    // of c's two samples: best combo "c" at √(1 · 1/2)
    val ab = Seq(
      ("a1", "X", "2.00"), ("a2", "X", "2.00"),
      ("b1", "X", "2.00"), ("b2", "X", "2.00"),
      ("c1", "Y", "3.00"))
      .map { case (n, t, q) => (n, t, BigDecimal(q)) }
      .toDF("n_name", "p_type", "qty")
    val got = Relational
      .multipattFromAbundance(ab, samples, Seq("a", "b", "c")).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getDouble(2),
        r.getDouble(5)))).toMap
    assert(got("X")._1 == "a+b" && got("X")._2 == 1.0,
      s"X combo: ${got("X")}")
    assert(got("X")._3 < 0.2, s"X p not small: ${got("X")}")
    assert(got("Y")._1 == "c" && got("Y")._2 == 0.707107,
      s"Y combo: ${got("Y")}")
    // corpus: per-taxon census, indval in (0, 1], p in (0, 1]
    val sf = Relational.q71Multipatt(spark, sfDir).collect()
    assert(sf.nonEmpty, "empty multipatt")
    assert(sf.forall(r => r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0
      && r.getString(1).nonEmpty
      && r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0),
      s"corpus ranges: ${sf.mkString(",")}")
  }

  test("Rankindex: metrics whose ranks equal the gradient's score " +
       "rho = 1 exactly, a constant metric is NULL-last, corpus sane") {
    import spark.implicits._
    import graft.operators.Relational
    // one taxon X with abundance i on a 1-D gradient z = i: Manhattan
    // distance is |i−j| and squared Euclidean (i−j)² — both rank
    // EXACTLY like the gradient (ρ = 1); Bray (|i−j|/(i+j)) and
    // Kulczynski re-order pairs (ρ < 1); Jaccard is the constant 0
    // (every pair shares the single taxon) → NULL ρ, sorted last
    val ab = (1 to 6).map(i => (s"s$i", "X", BigDecimal(i).setScale(2)))
      .toDF("n_name", "p_type", "qty")
    val z = (1 to 6).map(i => ("v1", s"s$i", i.toDouble))
      .toDF("variable", "n_name", "z")
    val got = Relational.rankindexFromInputs(ab, z).collect()
    val rho = got.map(r => r.getString(1) ->
      (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(rho("euclidean").contains(1.0), s"euclidean: $rho")
    assert(rho("manhattan").contains(1.0), s"manhattan: $rho")
    assert(rho("jaccard").isEmpty, s"jaccard not NULL: $rho")
    assert(rho("bray").exists(v => v > 0.0 && v < 1.0), s"bray: $rho")
    assert(rho("kulczynski").exists(_ < 1.0), s"kulczynski: $rho")
    val byRnk = got.map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(byRnk(1) == "euclidean" && byRnk(2) == "manhattan" &&
      byRnk(5) == "jaccard", s"ranking: $byRnk")
    // corpus: five metrics, each NULL or in [−1, 1]
    val sf = Relational.q70Rankindex(spark, sfDir).collect()
    assert(sf.length == 5, s"rows: ${sf.length}")
    assert(sf.map(_.getString(1)).toSet == Set("bray", "euclidean",
      "jaccard", "kulczynski", "manhattan"))
    assert(sf.forall(r => r.isNullAt(2) ||
      (r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)), "rho range")
  }

  test("Adipart: identical communities put all diversity in alpha, " +
       "complete turnover puts it all in beta_group, corpus adds up") {
    import spark.implicits._
    import graft.operators.Relational
    val ln2r6 = 0.693147
    // identical composition everywhere: every level's H = ln 2, so
    // both betas are EXACTLY zero (and roundz keeps them +0.0)
    val same = Seq(
      ("R1", "n1", "X", 2L), ("R1", "n1", "Y", 2L),
      ("R1", "n2", "X", 2L), ("R1", "n2", "Y", 2L),
      ("R2", "n3", "X", 2L), ("R2", "n3", "Y", 2L),
      ("R2", "n4", "X", 2L), ("R2", "n4", "Y", 2L))
      .toDF("r_name", "n_name", "p_type", "cnt")
    val s = Relational.adipartFromCounts(same).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s("alpha_sample") == ln2r6 && s("alpha_group") == ln2r6 &&
      s("gamma") == ln2r6, s"identical alphas: $s")
    assert(s("beta_sample") == 0.0 && s("beta_group") == 0.0 &&
      !(1.0 / s("beta_sample") < 0), s"identical betas: $s")
    // complete between-group turnover: each region is a single-taxon
    // monoculture → alpha levels are 0 and ALL diversity is beta_group
    val turn = Seq(("R1", "n1", "X", 3L), ("R2", "n2", "Y", 3L))
      .toDF("r_name", "n_name", "p_type", "cnt")
    val t = Relational.adipartFromCounts(turn).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(t("alpha_sample") == 0.0 && t("alpha_group") == 0.0,
      s"turnover alphas: $t")
    assert(t("beta_sample") == 0.0 && t("beta_group") == ln2r6 &&
      t("gamma") == ln2r6, s"turnover betas: $t")
    // corpus: 5 components, additivity holds on the round-6 grid
    val sf = Relational.q69Adipart(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sf.keySet == Set("alpha_sample", "alpha_group", "beta_sample",
      "beta_group", "gamma"), s"components: $sf")
    assert(sf("gamma") > 0.0 && sf("alpha_sample") > 0.0, s"corpus: $sf")
    assert(math.abs(sf("alpha_sample") + sf("beta_sample")
      + sf("beta_group") - sf("gamma")) <= 2e-6, s"additivity: $sf")
  }

  test("IndVal scores a perfect indicator exactly 1, a ubiquitous " +
       "uniform taxon exactly 1/k with p = 1, and is sane on the corpus") {
    import spark.implicits._
    import graft.operators.Relational
    val names = Seq("a1", "a2", "a3", "b1", "b2", "b3")
    val samples = names.zipWithIndex
      .map { case (nm, i) => (nm, i.toLong, nm.substring(0, 1)) }
      .toDF("n_name", "k", "r_name")
    // X: all of group a, none of b → A = 1, B = 1, IndVal = 1 exactly.
    // U: every sample, identical abundance → A = 1/2, B = 1 in BOTH
    // groups under EVERY labeling → IndVal = 0.5 for observed and all
    // permutations, so p = 1 exactly.
    val ab = (names.filter(_.startsWith("a")).map(n => (n, "X", "5.00"))
      ++ names.map(n => (n, "U", "3.00")))
      .map { case (n, t, q) => (n, t, BigDecimal(q)) }
      .toDF("n_name", "p_type", "qty")
    val got = Relational.indvalFromAbundance(ab, samples).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getDouble(2), r.getLong(4), r.getDouble(5))).toMap
    assert(got.keySet == Set("X", "U"), got.toString)
    val (xg, xiv, _, xp) = got("X")
    assert(xg == "a" && xiv == 1.0, s"perfect indicator: ${got("X")}")
    // a permutation ties 1.0 only when all three X-samples land in one
    // group (same-size deal: chance 2·C(3,3)/C(6,3) = 0.1) — p is
    // small but not necessarily minimal; gate it below the null bulk
    assert(xp < 0.5, s"indicator p not small: ${got("X")}")
    val (_, uiv, unge, up) = got("U")
    assert(uiv == 0.5 && unge == Relational.PermanovaPerms && up == 1.0,
      s"uniform taxon not calibrated: ${got("U")}")
    // real corpus: every taxon reported once, indval in (0, 1],
    // p in (0, 1], group is one of the five regions
    val sf = Relational.q52Indval(spark, sfDir).collect()
    assert(sf.length == 6, s"expected 6 taxa, got ${sf.length}")
    assert(sf.forall { r =>
      r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0 &&
      r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0 }, sf.mkString(";"))
  }

  test("Chao1/ACE richness: exact on planted panels, collapse to S_obs " +
       "with no rare structure, NULL on degenerate coverage") {
    import spark.implicits._
    import graft.operators.Relational
    // s1: a:1 b:1 c:2 d:5 — S=4, f1=2, f2=1;
    //   Chao1 = 4 + 2·1/(2·2) = 4.5
    //   ACE: all rare, N=9, Σi(i−1)F=22, C=7/9,
    //        γ² = max((4/C)·22/72 − 1, 0), ACE = 4/C + (2/C)γ²
    // s2: every taxon ≥ 3 occurrences and ≤ 10 — f1=f2=0 ⇒ C=1, γ²=0
    //   ⇒ Chao1 = ACE = S_obs exactly
    // s3: ONLY singletons — C = 0 ⇒ ACE NULL (Chao1 still defined)
    // s4: one taxon once — N_rare < 2 ⇒ ACE NULL
    val ab = Seq(
      ("s1", 1L, 1L), ("s1", 2L, 1L), ("s1", 3L, 2L), ("s1", 4L, 5L),
      ("s2", 1L, 3L), ("s2", 2L, 4L), ("s2", 3L, 10L),
      ("s3", 1L, 1L), ("s3", 2L, 1L),
      ("s4", 1L, 1L))
      .toDF("n_name", "taxon", "cnt")
    val got = Relational.richnessFromCounts(ab).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toMap
    assert(got("s1")._1 == 4L && got("s1")._4 == 4.5, got("s1").toString)
    val c = 1.0 - 2.0 / 9.0
    val g2 = math.max(4.0 / c * 22.0 / 72.0 - 1.0, 0.0)
    val aceWant = math.rint((4.0 / c + 2.0 / c * g2) * 1e6) / 1e6
    assert(got("s1")._5.contains(aceWant), s"${got("s1")} want ace $aceWant")
    assert(got("s2") == ((3L, 0L, 0L, 3.0, Some(3.0))), got("s2").toString)
    assert(got("s3")._5.isEmpty && got("s3")._4 == 3.0, got("s3").toString)
    assert(got("s4")._5.isEmpty, got("s4").toString)
    // sf corpus: estimators never fall below observed richness
    val sf = Relational.q53RichnessEstimators(spark, sfDir).collect()
    assert(sf.nonEmpty && sf.forall { r =>
      r.getDouble(4) >= r.getLong(1).toDouble &&
      (r.isNullAt(5) || r.getDouble(5) >= r.getLong(1) * 0.9) },
      sf.mkString(";"))
  }

  test("rank-abundance curve: descending abundance, dense ranks, " +
       "cumulative share closes at 1") {
    import graft.operators.Relational
    val rows = Relational.q54RankAbundance(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byG = rows.groupBy(_.getString(0))
    byG.foreach { case (g, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rs.length),
        s"$g ranks not dense")
      assert(sorted.zip(sorted.tail).forall { case (a, b) =>
        a.getDouble(3) >= b.getDouble(3) }, s"$g not descending")
      assert(sorted.zip(sorted.tail).forall { case (a, b) =>
        a.getDouble(5) <= b.getDouble(5) }, s"$g cum not monotone")
      val last = sorted.last.getDouble(5)
      assert(math.abs(last - 1.0) < 1e-4, s"$g cum_share ends at $last")
    }
  }

  test("SIMPER attributes a planted between-group difference to exactly " +
       "the differing taxa and zeroes the shared one") {
    import spark.implicits._
    import graft.operators.Relational
    // group A eats X (80%) + Z (20%); group B eats Y (80%) + Z (20%).
    // Every cross pair: |Δ|/2 = 0.4 for X and Y, exactly 0 for Z.
    val ab = Seq(
      ("A", "s1", "X", "8.00"), ("A", "s1", "Z", "2.00"),
      ("A", "s2", "X", "8.00"), ("A", "s2", "Z", "2.00"),
      ("B", "t1", "Y", "8.00"), ("B", "t1", "Z", "2.00"),
      ("B", "t2", "Y", "8.00"), ("B", "t2", "Z", "2.00"))
      .map { case (g, n, t, q) => (g, n, t, BigDecimal(q)) }
      .toDF("r_name", "n_name", "p_type", "qty")
    val got = Relational.simperFromAbundance(ab).collect()
      .map(r => (r.getLong(2), r.getString(3), r.getDouble(4),
        r.getDouble(5)))
    assert(got.toSeq == Seq(
      (1L, "X", 0.4, 0.5), (2L, "Y", 0.4, 0.5), (3L, "Z", 0.0, 0.0)),
      s"planted attribution: ${got.toSeq}")
    // real corpus: every region pair reports SimperTopK taxa, percent
    // contributions positive and ≤ 1, ranks contiguous from 1
    val sf = Relational.q48Simper(spark, sfDir).collect()
    val byPair = sf.groupBy(r => (r.getString(0), r.getString(1)))
    assert(byPair.size == 10, s"expected all 10 region pairs: ${byPair.keys}")
    byPair.foreach { case (k, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq ==
        (1L to Relational.SimperTopK).toSeq, s"ranks for $k")
      assert(rows.forall(r => r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0),
        s"pct range for $k")
    }
  }

  test("betadisper detects a pure dispersion difference and is exactly " +
       "zero-calibrated on an all-equal matrix") {
    import spark.implicits._
    import graft.operators.Relational
    val names = Seq("a1", "a2", "a3", "b1", "b2", "b3")
    val keys = names.zipWithIndex
      .map { case (nm, i) => (nm, i.toLong, nm.substring(0, 1)) }
      .toDF("n_name", "k", "r_name")
    // group a TIGHT (within ≈ 0.1), group b SPREAD (within ≈ 0.8,
    // deliberately unequal so the within-group variance is nonzero),
    // across constant — a location test sees little, dispersion a lot
    def within(x: String, y: String): Double = (x, y) match {
      case ("b1", "b2") => 0.7
      case ("b1", "b3") => 0.8
      case ("b2", "b3") => 0.9
      case _ => 0.1
    }
    val pairs = for {
      i <- names.indices; j <- names.indices if names(i) < names(j)
    } yield (names(i), names(j),
      if (names(i)(0) == names(j)(0)) within(names(i), names(j)) else 0.5)
    val disp = Relational.betadisperFromDistances(
      pairs.toDF("sample_a", "sample_b", "bray_curtis"), keys).head()
    assert(disp.getLong(0) == 6L && disp.getLong(1) == 2L)
    assert(disp.getDouble(2) > 10.0, s"dispersion F too small: $disp")
    assert(disp.getDouble(5) < 0.2, s"dispersion p not small: $disp")
    // all-equal matrix: every z identical → within variance 0 → the
    // defined F = 0 for EVERY labeling → p = 1 exactly
    val flat = pairs.map { case (a, b, _) => (a, b, 0.5) }
    val nul = Relational.betadisperFromDistances(
      flat.toDF("sample_a", "sample_b", "bray_curtis"), keys).head()
    assert(nul.getDouble(2) == 0.0 && nul.getDouble(5) == 1.0,
      s"null not calibrated: $nul")
    // real corpus: one row, sane ranges
    val sf = Relational.q49Betadisper(spark, sfDir).head()
    assert(sf.getLong(3) == Relational.PermanovaPerms)
    assert(sf.getDouble(2) >= 0.0 && !sf.getDouble(2).isNaN &&
      sf.getDouble(5) > 0.0 && sf.getDouble(5) <= 1.0, s"sf shape: $sf")
  }

  test("rarefaction curve is monotone, agrees with q21 at its two depths, " +
       "and saturates to full richness") {
    import graft.operators.Relational
    val curve = Relational.q50RarefactionCurve(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val q21 = Relational.q21Rarefaction(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    q21.foreach { case (t, (rFull, rSub, nSub, nFull)) =>
      assert(curve((t, 20L)) == ((nSub, rSub)),
        s"$t depth 20 disagrees with q21: ${curve((t, 20L))} vs ($nSub, $rSub)")
      assert(curve((t, 100L)) == ((nFull, rFull)),
        s"$t depth 100 disagrees with q21's full census")
    }
    // structural monotonicity along the depth axis
    curve.keys.map(_._1).toSeq.distinct.foreach { t =>
      val byDepth = (1 to 10).map(d => curve((t, d * 10L)))
      assert(byDepth == byDepth.sorted,
        s"curve for $t not monotone: $byDepth")
    }
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

  test("blocked eigen summary equals the single-row form bit-for-bit") {
    // transfers q31c's oracle guarantee to the distributed eigen twin,
    // same as the axis-coordinate gate above
    val single = graft.operators.Ordination.q31cPcoaEigen(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    val blocked = graft.operators.Ordination.q31dPcoaBlockedEigen(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(single.length == 3, s"expected 3 axes: ${single.toSeq}")
    assert(blocked.toSeq == single.toSeq,
      s"blocked eigen diverges: ${blocked.toSeq} vs ${single.toSeq}")
    // the deflation order means non-increasing eigenvalues once the
    // iteration has converged to 6 dp, and axis 1 must carry real mass
    assert(single.map(_._2).sliding(2).forall(p => p(0) >= p(1) - 1e-6),
      s"eigenvalues not non-increasing: ${single.toSeq}")
    assert(single.head._3 > 0.0, "axis 1 explains no variance")
  }

  test("transition matrix counts per-user bigrams with row-stochastic p") {
    import spark.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, ts(0), 1L, "a", 0.0), (2L, ts(1), 1L, "b", 0.0),
      (3L, ts(2), 1L, "a", 0.0), // user 1: a→b, b→a
      (4L, ts(0), 2L, "a", 0.0), (5L, ts(1), 2L, "b", 0.0)) // user 2: a→b
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Events.transitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == Map(("a", "b") -> ((2L, 1.0)), ("b", "a") -> ((1L, 1.0))),
      s"unexpected transitions: $got")
  }

  test("anomaly flags exactly the spiking day, constant series flag nothing") {
    import spark.implicits._
    // type x: 11 quiet days of 10 events + one 30-event spike (z≈3.3);
    // type y: constant → zero variance → filtered by den > 0
    val rows = (1 to 12).flatMap { d =>
      val n = if (d == 7) 30 else 10
      (1 to n).map(i => (d * 1000L + i, java.sql.Timestamp.valueOf(
        f"2024-01-$d%02d 10:00:00"), 1L, "x", 0.0))
    } ++ (1 to 12).flatMap { d =>
      (1 to 5).map(i => (90000L + d * 100 + i, java.sql.Timestamp.valueOf(
        f"2024-01-$d%02d 11:00:00"), 2L, "y", 0.0))
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Events.anomaly(ev).collect()
    assert(got.length == 1, s"expected one flagged day: ${got.toSeq}")
    assert(got(0).getString(0) == "x" && got(0).getString(1) == "2024-01-07" &&
      got(0).getLong(2) == 30L && got(0).getDouble(3) > 2.0,
      s"wrong flag: ${got(0)}")
  }

  test("gap-fill emits explicit zeros and the rolling window spans them") {
    import spark.implicits._
    // type x active on Jan 1 and Jan 4 only — the sf0.01 corpus has no
    // calendar gaps, so the zero-fill path needs a synthetic exercise
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "x", 0.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 1L, "x", 0.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-04 10:00:00"), 1L, "x", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val filled = graft.operators.Events.gapFill(ev).collect()
      .map(r => r.getString(1) -> r.getLong(2))
    assert(filled.toSeq == Seq("2024-01-01" -> 2L, "2024-01-02" -> 0L,
      "2024-01-03" -> 0L, "2024-01-04" -> 1L), s"bad fill: ${filled.toSeq}")
    val rr = graft.operators.Events.rollingRate(ev).collect()
      .map(r => r.getString(1) -> r.getLong(3))
    // 7-day trailing sums over the filled series: 2,2,2,3
    assert(rr.toSeq == Seq("2024-01-01" -> 2L, "2024-01-02" -> 2L,
      "2024-01-03" -> 2L, "2024-01-04" -> 3L), s"bad rolling: ${rr.toSeq}")
  }

  test("WAU window: a user counts for 7 trailing days, then drops out") {
    import spark.implicits._
    // user 1 active on Jan 1 only; user 2 active Jan 1 and Jan 8
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "a", 0.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2L, "a", 0.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-08 10:00:00"), 2L, "a", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Events.dauWau(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // output days = observed activity days only (joined to DAU)
    assert(got.toSeq == Seq(("2024-01-01", 2L, 2L), ("2024-01-08", 1L, 1L)),
      s"bad dau/wau: ${got.toSeq}")
    // user 1's Jan-1 activity must NOT reach the Jan-8 window (7-day
    // horizon is days 1..7), which is exactly what wau=1 on Jan 8 shows
  }

  test("e18 sketch DAU/WAU tracks the exact e13 within HLL error " +
       "bounds, day by day") {
    // DataSketches HLL at the default lgConfigK=12 has ~1.6% relative
    // standard error; at the spec corpus's cardinalities the sketch
    // is still in (exact) sparse mode, but the gate allows the full
    // 3σ dense-mode band so a data regen can't break it spuriously.
    val exact = graft.operators.Events.dauWau(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val approx = graft.operators.Events.dauApprox(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(approx.keySet == exact.keySet,
      s"day sets differ: ${approx.keySet.diff(exact.keySet)} / " +
        s"${exact.keySet.diff(approx.keySet)}")
    exact.foreach { case (day, (dau, wau)) =>
      val (da, wa) = approx(day)
      assert(math.abs(da - dau) <= math.max(2.0, 0.05 * dau),
        s"$day: dau_approx $da vs exact $dau")
      assert(math.abs(wa - wau) <= math.max(2.0, 0.05 * wau),
        s"$day: wau_approx $wa vs exact $wau")
    }
  }

  test("e19 histogram quantiles sit within one bin width of the exact " +
       "percentiles, and a constant group degenerates exactly") {
    import spark.implicits._
    import graft.operators.Events
    val got = Events.quantileHist(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // the estimator's contract is RANK-based: the upper edge of the
    // bin holding the ⌈q·n⌉-th smallest value — so the bound is
    // against that exact ORDER STATISTIC (an interpolated percentile
    // can sit a value-GAP below it on a sparse tail, which says
    // nothing about the histogram's accuracy)
    val byType = Tables.load(spark, sfDir, "events")
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    assert(got.keySet == byType.keySet && got.nonEmpty)
    got.foreach { case (t, (n, lo, hi, p50, p95, p99)) =>
      val w = (hi - lo) / Events.QhBins
      val vs = byType(t)
      def stat(q: Int): Double = vs(((n * q + 99) / 100).toInt - 1)
      Seq(("p50", p50, stat(50)), ("p95", p95, stat(95)),
        ("p99", p99, stat(99))).foreach { case (name, est, ex) =>
        // the selected bin CONTAINS the order statistic: its upper
        // edge is never below it and at most one bin width above
        assert(est >= ex - 1e-9 && est <= ex + w + 1e-9,
          s"$t $name: est $est vs order stat $ex (bin width $w, n=$n)")
      }
    }
    // constant-valued group: every estimate must land on hi exactly
    val const = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      1L, "k", 7.5), (2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"),
      2L, "k", 7.5)).toDF("event_id", "ts", "user_id", "event_type", "value")
    val c = Events.quantileHist(const).head()
    assert(c.getDouble(4) == 7.5 && c.getDouble(5) == 7.5 &&
      c.getDouble(6) == 7.5, s"degenerate group drifted: $c")
  }

  test("e20 log-bin quantiles bound the TAIL relatively where fixed " +
       "bins blow it, refuse non-positive domains, and degenerate exactly") {
    import spark.implicits._
    import graft.operators.Events
    // seeded lognormal-ish corpus: exp(uniform · ln(1e6)) spans six
    // decades — the shape whose p50 sits thousands of fixed-bin
    // widths below the top
    val rng = new scala.util.Random(99L)
    val vals = (1 to 4000).map(i => math.exp(rng.nextDouble() * math.log(1e6)))
    val df = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        i.toLong, "skewed", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.logQuantileHist(df).head()
    val (n, lo, hi) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
    val ratio = math.pow(hi / lo, 1.0 / Events.QhBins) // one log-bin factor
    val sorted = vals.sorted
    def stat(q: Int): Double = sorted(((n * q + 99) / 100).toInt - 1)
    Seq(("p50", r.getDouble(4), stat(50)), ("p95", r.getDouble(5), stat(95)),
      ("p99", r.getDouble(6), stat(99))).foreach { case (name, est, ex) =>
      // upper edge of the bin CONTAINING the order statistic: never
      // below it, at most one log-bin FACTOR above (1e-6 slack for
      // the round(6) the estimate passes through)
      assert(est >= ex * (1 - 1e-6) && est <= ex * ratio * (1 + 1e-6),
        s"$name: est $est vs order stat $ex (bin factor $ratio)")
      // and the relative bound is one fixed-width e19 bin CANNOT
      // honor at the median of this distribution: the absolute bin
      // width exceeds the median itself
      assert((hi - lo) / Events.QhBins > stat(50),
        "corpus not skewed enough to demonstrate the fixed-bin failure")
    }
    // positive domain refused loudly, nulls counted not skipped
    val neg = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      1L, "k", -1.0)).toDF("event_id", "ts", "user_id", "event_type", "value")
    val e1 = intercept[IllegalArgumentException](Events.logQuantileHist(neg))
    assert(e1.getMessage.contains("positive"), e1.getMessage)
    val withNull = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      1L, "k", java.lang.Double.valueOf(2.0)),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        2L, "k", null.asInstanceOf[java.lang.Double]))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val e2 = intercept[IllegalArgumentException](Events.logQuantileHist(withNull))
    assert(e2.getMessage.contains("null"), e2.getMessage)
    // constant-valued group: every estimate lands on hi exactly
    val const = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      1L, "k", 7.5), (2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"),
      2L, "k", 7.5)).toDF("event_id", "ts", "user_id", "event_type", "value")
    val c = Events.logQuantileHist(const).head()
    assert(c.getDouble(4) == 7.5 && c.getDouble(5) == 7.5 &&
      c.getDouble(6) == 7.5, s"degenerate group drifted: $c")
    // empty frame: loud refusal, not an NPE inside the null min read
    val empty = df.filter(col("value") < 0.0)
    val e3 = intercept[IllegalArgumentException](Events.logQuantileHist(empty))
    assert(e3.getMessage.contains("non-empty"), e3.getMessage)
  }

  test("e21 watermark audit pins planted lateness exactly, reports " +
       "all-zero on an ordered stream, and stitches across blocks") {
    import spark.implicits._
    import graft.operators.Events
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // planted: arrival order 0..4; event 2 is 30 s late vs the running
    // max (100), event 4 is 10 s late vs 130
    val planted = Seq(
      (0L, ts(50L), 1L, "a", 0.0, "{}"),
      (1L, ts(100L), 1L, "a", 0.0, "{}"),
      (2L, ts(70L), 1L, "a", 0.0, "{}"),
      (3L, ts(130L), 1L, "a", 0.0, "{}"),
      (4L, ts(120L), 1L, "a", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.watermarkAudit(planted).head()
    assert(r.getLong(1) == 5L && r.getLong(2) == 2L, r.toString)
    assert(r.getDouble(3) == 0.4, r.toString)       // late_rate
    assert(r.getDouble(4) == 30.0, r.toString)      // max_late_s
    // p95 over exact lateness ints [0,0,0,10e6,30e6]: linear
    // interpolation at rank 0.95·4 = 3.8 → 26 s; p99 → 29.2 s
    assert(r.getDouble(5) == 26.0 && r.getDouble(6) == 29.2, r.toString)
    // ordered stream (the shipped corpus): zero lateness everywhere
    val sf = Events.watermarkAudit(spark, sfDir).collect()
    assert(sf.nonEmpty && sf.forall(x =>
      x.getLong(2) == 0L && x.getDouble(4) == 0.0), sf.mkString(";"))
    // block stitching: the late event sits in a LATER 65536-block than
    // the running max that convicts it — the prefix-max join must
    // carry it across
    val cross = Seq(
      (0L, ts(1000L), 1L, "a", 0.0, "{}"),
      (Events.WaBlock + 5L, ts(400L), 1L, "a", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val c = Events.watermarkAudit(cross).head()
    assert(c.getLong(2) == 1L && c.getDouble(4) == 600.0,
      s"cross-block lateness missed: $c")
  }

  test("e22 burst profile pins planted peaks with exact window-edge " +
       "semantics and counts same-timestamp peers together") {
    import spark.implicits._
    import graft.operators.Events
    def ts(s: Long, us: Long = 0L) = {
      val t = new java.sql.Timestamp(s * 1000L)
      t.setNanos((us * 1000L).toInt); t
    }
    val rows = Seq(
      // user 1: three events inside one 60 s window → burst 3; the
      // event at +60 s exactly is OUTSIDE the trailing window of the
      // first (window is (t−60 s, t], 59999999 µs back)
      (0L, ts(0L), 1L), (1L, ts(30L), 1L), (2L, ts(59L, 999999L), 1L),
      (3L, ts(60L), 1L),
      // user 2: two events at the IDENTICAL timestamp are range-frame
      // peers — both see burst 2 regardless of row order
      (4L, ts(1000L), 2L), (5L, ts(1000L), 2L),
      // user 3: fully spread — burst 1
      (6L, ts(0L), 3L), (7L, ts(100L), 3L), (8L, ts(200L), 3L))
      .map { case (id, t, u) => (id, t, u, "view", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.burstProfile(rows).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // user 3 → burst 1; user 2 → burst 2; user 1 → burst 3 (events
    // 0,1,2 share a window; event 3's window holds 1,2,3 — also 3,
    // and event 0 has dropped out by exactly one µs)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), got.toString)
  }

  test("count-min heavy-hitter audit matches a JVM sketch replica and " +
       "never underestimates") {
    import spark.implicits._
    import graft.operators.Events
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // user 1 × 5 events, user 2 × 3, users 3..12 × 1 → top-10 by
    // (count desc, id) = 1, 2, then 3..10
    val evs = (Seq.fill(5)(1L) ++ Seq.fill(3)(2L) ++ (3L to 12L))
      .zipWithIndex
      .map { case (u, i) => (i.toLong, ts(i.toLong), u, "view", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.cmsHeavyHitters(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // JVM sketch replica with the operator's exact hash lattice
    val counts = (Seq.fill(5)(1L) ++ Seq.fill(3)(2L) ++ (3L to 12L))
      .groupBy(identity).map { case (u, l) => u -> l.size.toLong }
    def bucket(u: Long, r: Int): Long =
      ((u % Events.CmsPrime) * Events.CmsA(r) + Events.CmsB(r)) %
        Events.CmsPrime % Events.CmsWidth
    val counters = (for { (u, c) <- counts.toSeq; r <- 0 until Events.CmsDepth }
      yield ((r, bucket(u, r)), c))
      .groupBy(_._1).map { case (k, l) => k -> l.map(_._2).sum }
    val want = counts.toSeq.sortBy { case (u, c) => (-c, u) }
      .take(Events.CmsTopK)
      .map { case (u, c) =>
        val est = (0 until Events.CmsDepth)
          .map(r => counters((r, bucket(u, r)))).min
        (u, c, est, est - c)
      }
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // CMS structural guarantee + audit shape on the sf corpus
    val sf = Events.cmsHeavyHitters(spark, sfDir).collect()
    assert(sf.length == Events.CmsTopK, s"expected top-${Events.CmsTopK}")
    assert(sf.forall(r => r.getLong(3) >= 0L && r.getLong(2) >= r.getLong(1)),
      "CMS underestimated a count")
  }

  test("CUSUM accumulates a sub-z-threshold drift into an alarm and " +
       "stays silent on a flat series") {
    import spark.implicits._
    import graft.operators.Events
    val dayUs = 86400L * 1000000L
    def mkEvents(series: Seq[(String, Int, Int)]) = {
      val rows = for {
        ((tp, d, cnt), gi) <- series.zipWithIndex
        i <- 0 until cnt
      } yield {
        val t = new java.sql.Timestamp(0L)
        val us = d.toLong * dayUs + i.toLong * 1000000L
        t.setTime(us / 1000L)
        ((gi * 1000 + i).toLong, t, 1L, tp, 0.0, "{}")
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }
    // flat: zero-σ baseline, monitored days identical → S = 0, silent.
    // step: zero-σ baseline then +1/day → S = 1, 2, 3; h = 4σ = 0, so
    // EVERY monitored day alarms and the peak is exactly 3
    val flat = (0 until 10).map(d => ("flat", d, 10))
    val step = (0 until 7).map(d => ("step", d, 10)) ++
      (7 until 10).map(d => ("step", d, 11))
    val got = Events.cusumDrift(mkEvents(flat ++ step)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.getString(3)), r.getDouble(4)))).toMap
    assert(got("flat") == ((3L, 0L, None, 0.0)), s"flat: $got")
    assert(got("step") == ((3L, 3L, Some("1970-01-08"), 3.0)), s"step: $got")
    // slow drift: baseline 8,12,8,12,8,12,10 (μ=10, σ=√(24/7)≈1.852);
    // monitored days at 12 → per-day z ≈ 1.08 (silent for e10's 2.0
    // pointwise rule) but dev = 2 − σ/2 accumulates past h = 4σ on
    // day 7 of monitoring — the sequential detection z-scores can't do
    val baseCnts = Seq(8, 12, 8, 12, 8, 12, 10)
    val drift = baseCnts.zipWithIndex.map { case (c, d) => ("drift", d, c) } ++
      (7 until 17).map(d => ("drift", d, 12))
    val sigma = math.sqrt((7.0 * (baseCnts.map(c => c * c).sum)
      - 70.0 * 70.0)) / 7.0
    val dev = BigDecimal(12.0 - 10.0 - 0.5 * sigma)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val firstAlarm = (1 to 10).find(dd =>
      BigDecimal((dev * dd).toDouble).setScale(9,
        BigDecimal.RoundingMode.HALF_UP) >
      BigDecimal(4.0 * sigma).setScale(9,
        BigDecimal.RoundingMode.HALF_UP)).get
    val dr = Events.cusumDrift(mkEvents(drift)).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), Option(r.getString(3)))))
      .toMap
    val wantDay = f"1970-01-${8 + firstAlarm - 1}%02d"
    assert(dr("drift") == (((10 - firstAlarm + 1).toLong, Some(wantDay))),
      s"drift detection: $dr expected first alarm $wantDay")
    // single-day z on the drifted days stays under e10's threshold
    assert((12.0 - 10.0) / sigma < 2.0, "plant lost its sub-z property")
  }

  test("keep-best picks the highest-quality cluster member, min id on ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the the"),          // cluster 10: all stopwords → low
      (2L, "alpha beta gamma delta"),   // cluster 10: distinct, no stop → high
      (3L, "solo document"),            // singleton cluster
      (4L, "same text twice"), (5L, "same text twice")) // tie → min id
      .toDF("doc_id", "text")
    val decision = Seq((1L, 10L), (2L, 10L), (3L, 3L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster_id")
    val got = graft.operators.Dedup.keepBest(decision, docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true, 5L -> false),
      s"wrong representatives: $got")
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

  test("retention cohorts: day-0 row carries the full cohort, offsets are exact") {
    import spark.implicits._
    val ts = (d: Int, h: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val ev = Seq(
      // user 1: cohort Jan 1, active on day 0 (twice) and day 2
      (1L, ts(1, 9), 1L, "view", 0.0),
      (2L, ts(1, 17), 1L, "click", 0.0),
      (3L, ts(3, 9), 1L, "view", 0.0),
      // user 2: cohort Jan 1, active day 0 only
      (4L, ts(1, 23), 2L, "view", 0.0),
      // user 3: cohort Jan 2, active day 0 and day 1
      (5L, ts(2, 1), 3L, "view", 0.0),
      (6L, ts(3, 1), 3L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.retention(ev).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      ("2024-01-01", 0) -> (2L, 3L),   // users 1+2, 3 events
      ("2024-01-01", 2) -> (1L, 1L),   // user 1 returns on day 2
      ("2024-01-02", 0) -> (1L, 1L),
      ("2024-01-02", 1) -> (1L, 1L)), s"got $got")
    // invariant on real data: no cohort's later offset exceeds its day 0
    val sf = Events.retention(Tables.load(spark, sfDir, "events")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val day0 = sf.collect { case (c, 0, n) => c -> n }.toMap
    assert(sf.forall { case (c, _, n) => n <= day0(c) },
      "an offset row exceeds its cohort's day-0 user count")
  }

  test("funnel requires stage order and reports signup→purchase latency") {
    import spark.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 1: full ordered funnel, converts in 30 min
      (1L, ts(0), 1L, "signup", 0.0),
      (2L, ts(10), 1L, "view", 0.0),
      (3L, ts(20), 1L, "click", 0.0),
      (4L, ts(30), 1L, "purchase", 1.0),
      // user 2: view BEFORE signup doesn't count; funnel stops at signup
      (5L, ts(0), 2L, "view", 0.0),
      (6L, ts(10), 2L, "signup", 0.0),
      // user 3: purchase without a preceding ordered click never counts
      (7L, ts(0), 3L, "signup", 0.0),
      (8L, ts(5), 3L, "view", 0.0),
      (9L, ts(10), 3L, "purchase", 1.0),
      // user 4: no signup at all
      (10L, ts(0), 4L, "click", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.funnel(ev).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got == Map(
      1L -> (4L, 30L * 60_000_000L),
      2L -> (1L, -1L),
      3L -> (2L, -1L),
      4L -> (0L, -1L)), s"got $got")
  }

  test("unpivot melts the abundance matrix losslessly (re-pivot round trip)") {
    val types = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
    val wide = operators.Relational.q7AbundanceMatrix(spark, sfDir).collect()
      .flatMap { r =>
        types.zipWithIndex.collect {
          case (t, i) if !r.isNullAt(i + 1) =>
            (r.getString(0), t) -> r.getDouble(i + 1)
        }
      }.toMap
    val long = operators.Relational.q34Unpivot(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(long == wide, "melted triples diverge from the wide matrix")
  }

  test("histogram conserves totals and bins on exact width multiples") {
    val width = 25000.0
    val rows = operators.Relational.q35Histogram(spark, sfDir, width).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    val orders = Tables.load(spark, sfDir, "orders")
    assert(rows.map(_._2).sum == orders.count(), "orders lost in binning")
    assert(rows.forall { case (b, _, _) => b % width == 0.0 },
      "bin start not a width multiple")
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate bins")
  }

  test("co-occurrence matches a brute-force recomputation at sf0.001") {
    val tiny = "/root/testdata/sf0.001"
    val presence = Tables.load(spark, tiny, "lineitem")
      .join(Tables.load(spark, tiny, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySample = presence.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val df = presence.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expected = bySample.values.flatMap { brands =>
      brands.toSeq.sorted.combinations(2).map(p => (p(0), p(1)))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = operators.Relational.q36Cooccurrence(spark, tiny).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == expected.keySet, "pair universe differs from brute force")
    got.foreach { case ((a, b), (n, j)) =>
      assert(n == expected((a, b)), s"count mismatch for ($a,$b)")
      val expJ = BigDecimal(n.toDouble / (df(a) + df(b) - n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(j == expJ, s"jaccard mismatch for ($a,$b): $j vs $expJ")
    }
  }

  test("split is deterministic, covering, and near the 75/12.5/12.5 design") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = TextOps.split3(docs).collect().map(r => r.getLong(0) -> r.getString(1))
    val b = TextOps.split3(docs.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(a.toSeq == b.toSeq, "split depends on partitioning")
    assert(a.length == docs.count(), "docs lost in split")
    val frac = a.groupBy(_._2).view.mapValues(_.length.toDouble / a.length).toMap
    assert(frac.keySet == Set("train", "val", "test"))
    assert(frac("train") > 0.65 && frac("train") < 0.85, s"train frac: $frac")
    assert(frac("val") > 0.05 && frac("test") > 0.05, s"tail fracs: $frac")
  }

  test("term frequency matches a brute-force recount on synthetic docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "a b b d"),
      (3L, "a e")).toDF("doc_id", "text")
    val got = TextOps.termFreq(docs, 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = Seq(
      ("a", 4L, 3L, 0.0),
      ("b", 3L, 2L, r6(math.log(1.5))),
      ("c", 1L, 1L, r6(math.log(3.0))),
      ("d", 1L, 1L, r6(math.log(3.0))),
      ("e", 1L, 1L, r6(math.log(3.0))))
    assert(got.toSeq == exp, s"got ${got.toSeq}")
  }

  test("path trigrams respect session boundaries: a 30-min gap cuts the path") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // one user, four events; the >30-min gap after event 2 must forbid
    // any trigram spanning it — so only (a,b,c) from the second session
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "a", 0.0),
      (2L, t("2024-01-01 10:05:00"), 1L, "b", 0.0),
      (3L, t("2024-01-01 11:00:00"), 1L, "a", 0.0),
      (4L, t("2024-01-01 11:01:00"), 1L, "b", 0.0),
      (5L, t("2024-01-01 11:02:00"), 1L, "c", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Events.pathTopk(ev, 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", "b", "c", 1L)),
      s"trigram crossed a session boundary: ${got.toSeq}")
  }

  test("RFM: four cleanly-separated users land in the four diagonal cells") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user k (1..4): more recent, more frequent, higher-value than
    // user k-1 on every axis — quartile edges must place user k in
    // cell (5-k, k, k) (recency is inverted: most recent = seg 1)
    val ev = (1 to 4).flatMap { k =>
      (1 to k * 2).map { i =>
        ((k * 100 + i).toLong, t(f"2024-01-${k * 5}%02d 10:${i}%02d:00"),
          k.toLong, "e", k * 10.0)
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Events.rfmSegments(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 4 users, 4 distinct cells, one user each
    assert(got.length == 4 && got.forall(_._4 == 1L), s"bad cells: ${got.toSeq}")
    val cells = got.map(c => (c._1, c._2, c._3)).toSet
    (1 to 4).foreach { k =>
      val exp = ((5 - k).toLong, k.toLong, k.toLong)
      // quartile interpolation places the extreme users at 1/4 and
      // the middle two strictly between edges — the diagonal holds
      assert(cells.contains(exp) || k == 2 || k == 3,
        s"user $k missing from ${cells}")
    }
    assert(cells.contains((4L, 1L, 1L)) && cells.contains((1L, 4L, 4L)),
      s"extreme users misplaced: $cells")
  }

  test("cohort triangle: a user's value lands in their first-seen week's row") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1 first seen Mon Jan 1 (week 2024-01-01), active again 2
    // weeks later; user 2 first seen the following week
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "a", 10.0),
      (2L, t("2024-01-15 10:00:00"), 1L, "a", 5.0),
      (3L, t("2024-01-10 10:00:00"), 2L, "a", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Events.cohortValue(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0L, 1L, 1L, 10.0),
      ("2024-01-01", 2L, 1L, 1L, 5.0),
      ("2024-01-08", 0L, 1L, 1L, 7.0)), s"bad triangle: ${got.toSeq}")
  }

  test("seasonal-naive audit: zero error on a perfect weekly rhythm, " +
       "pins the broken day, and a calendar gap yields no forecast") {
    import spark.implicits._
    import graft.operators.Events
    val dayUs = 86400L * 1000000L
    def mkEvents(series: Seq[(String, Int, Int)]) = {
      val rows = for {
        ((tp, d, cnt), gi) <- series.zipWithIndex
        i <- 0 until cnt
      } yield {
        val t = new java.sql.Timestamp(0L)
        t.setTime((d.toLong * dayUs + i.toLong * 1000000L) / 1000L)
        ((gi * 1000 + i).toLong, t, 1L, tp, 0.0, "{}")
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }
    // rhythm: counts cycle 5,20,5,20,... with period dividing 7? No —
    // use EXACT weekly repetition: day d count = pattern(d % 7); every
    // day from 7 on forecasts perfectly → mape = bias = 0
    val pat = Seq(5, 20, 8, 13, 5, 30, 9)
    val rhythm = (0 until 21).map(d => ("rhythm", d, pat(d % 7)))
    // broken: same rhythm but day 10 doubles — worst_day = 1970-01-11,
    // and day 17 (its next-week echo) also misses; mape > 0
    val broken = (0 until 21).map(d =>
      ("broken", d, if (d == 10) 2 * pat(d % 7) else pat(d % 7)))
    // gappy: weekly-flat 10/day but days 8..9 absent — the absent days
    // produce NO forecast row for day 15..16 targets? No: forecast for
    // d needs d−7 observed; missing 8,9 removes forecasts for 15,16
    // AND the absent days themselves are never scored
    val gappy = (0 until 21).filter(d => d != 8 && d != 9)
      .map(d => ("gappy", d, 10))
    val got = Events.seasonalNaive(mkEvents(rhythm ++ broken ++ gappy))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getString(4), r.getDouble(5)))).toMap
    // all APEs tie at 0 → worst-day pick falls to the tie-break
    // (latest day), i.e. the final scored day 20
    assert(got("rhythm") == ((14L, 0.0, 0.0, "1970-01-21", 0.0)),
      s"rhythm: ${got("rhythm")}")
    val b = got("broken")
    assert(b._5 == 1.0 && b._4 == "1970-01-11",
      s"worst day not the planted break: $b")
    assert(b._2 > 0.0, s"broken mape zero: $b")
    // gappy: 21 − 2 absent = 19 observed days; scored days = those
    // with an observed d−7: days 7..20 minus {8,9 themselves} minus
    // {15,16 whose lag is absent} = 10 days, all exact
    assert(got("gappy")._1 == 10L && got("gappy")._2 == 0.0,
      s"gappy: ${got("gappy")}")
    // sf corpus shape: every type scored, mape finite and >= 0
    val sf = Events.seasonalNaive(
      graft.Tables.load(spark, sfDir, "events")).collect()
    assert(sf.nonEmpty && sf.forall(r => r.getDouble(2) >= 0.0
      && !r.getDouble(2).isNaN), sf.mkString(";"))
  }

  test("PROTEST m2 is exactly 0 under rotation, reflection and scaling " +
       "of the same configuration, and kills an unrelated one") {
    import spark.implicits._
    import graft.operators.Relational
    val names = (1 to 8).map(i => f"s$i%02d")
    val keys = names.zipWithIndex
      .map { case (nm, i) => (nm, i.toLong) }.toDF("n_name", "k")
    // a non-degenerate planted configuration
    val xs = names.zipWithIndex.map { case (nm, i) =>
      (nm, 0.1 * ((i * 7) % 11) + 0.05, 0.1 * ((i * 3) % 5) - 0.2) }
    val x = xs.toDF("n_name", "x1", "x2")
    def run(y: Seq[(String, Double, Double)]) =
      Relational.procrustesFromConfigs(x,
        y.toDF("n_name", "y1", "y2"), keys).head()
    // identity: perfect fit, and every permutation is at best as good
    val self = run(xs)
    assert(self.getDouble(1) == 0.0 && self.getDouble(2) == 1.0,
      s"self-fit not exact: $self")
    assert(self.getDouble(5) < 0.2, s"self p not small: $self")
    // rotation by 90°, reflection (axis swap), and uniform 3× scale +
    // translation are all absorbed by the Procrustes superimposition
    assert(run(xs.map { case (n, a, b) => (n, -b, a) }).getDouble(1) == 0.0,
      "rotation not absorbed")
    assert(run(xs.map { case (n, a, b) => (n, b, a) }).getDouble(1) == 0.0,
      "reflection not absorbed")
    assert(run(xs.map { case (n, a, b) =>
      (n, 3.0 * a + 5.0, 3.0 * b - 2.0) }).getDouble(1) == 0.0,
      "scale+translation not absorbed")
    // an unrelated configuration: m2 large, p in the null bulk
    val un = run(names.zipWithIndex.map { case (nm, i) =>
      (nm, 0.1 * ((i * 5 + 3) % 7), 0.1 * ((i * 11 + 1) % 13)) })
    assert(un.getDouble(1) > 0.2, s"unrelated m2 too small: $un")
    assert(un.getDouble(5) > 0.05, s"unrelated p too small: $un")
    // sf corpus: one row, m2 in [0, 1], honest p in (0, 1]
    val sf = Relational.q55Protest(spark, sfDir).head()
    assert(sf.getLong(0) == 25L, s"sf samples: $sf")
    assert(sf.getDouble(1) >= 0.0 && sf.getDouble(1) <= 1.0, s"m2: $sf")
    assert(sf.getDouble(5) > 0.0 && sf.getDouble(5) <= 1.0, s"p: $sf")
  }

  test("beta partition: pure turnover, pure nestedness, identity, and " +
       "the Baselga decomposition identity holds corpus-wide") {
    import spark.implicits._
    import graft.operators.Relational
    // t1/t2: disjoint equal-size communities → pure turnover:
    //   a=0, b=c=2 → βsor = 1, βsim = 1, βsne = 0
    // n1/n2: n2 ⊂ n1 → pure nestedness: a=2, b=2, c=0 →
    //   βsim = 0, βsor = βsne = 2/(2·2+2) = 1/3
    // i1/i2: identical → all zero
    val pres = Seq(
      ("t1", 1L), ("t1", 2L), ("t2", 3L), ("t2", 4L),
      ("n1", 10L), ("n1", 11L), ("n1", 12L), ("n1", 13L),
      ("n2", 10L), ("n2", 11L),
      ("i1", 20L), ("i1", 21L), ("i2", 20L), ("i2", 21L))
      .toDF("n_name", "taxon")
    val got = Relational.betaPartitionFromPresence(pres).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    assert(got(("t1", "t2")) == ((0L, 2L, 2L, 1.0, 1.0, 0.0)),
      s"turnover pair: ${got(("t1", "t2"))}")
    assert(got(("n1", "n2")) == ((2L, 2L, 0L, 0.333333, 0.0, 0.333333)),
      s"nested pair: ${got(("n1", "n2"))}")
    assert(got(("i1", "i2")) == ((2L, 0L, 0L, 0.0, 0.0, 0.0)),
      s"identical pair: ${got(("i1", "i2"))}")
    // corpus: decomposition identity and ranges on every pair
    val sf = Relational.q56BetaPartition(spark, sfDir).collect()
    assert(sf.length == 300, s"pair census: ${sf.length}")
    assert(sf.forall { r =>
      val (so, si, sn) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
      so >= 0 && so <= 1 && si >= 0 && si <= 1 && sn >= -1e-9 &&
        math.abs(so - si - sn) < 2e-6 }, "decomposition identity broken")
  }

  test("multi-site beta: exact on planted turnover/nested panels and " +
       "consistent with the pairwise decomposition bounds corpus-wide") {
    import spark.implicits._
    import graft.operators.Relational
    def run(rows: Seq[(String, Long)]) =
      Relational.multiBetaFromPresence(rows.toDF("n_name", "taxon")).head()
    // three mutually disjoint equal-size sites → pure turnover:
    // core = 0, every pair min = max = 2 → βSIM = βSOR = 1, βSNE = 0
    val turn = run(Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L),
      ("c", 5L), ("c", 6L)))
    assert((turn.getLong(2), turn.getDouble(5), turn.getDouble(6),
      turn.getDouble(7)) == ((0L, 1.0, 1.0, 0.0)), turn.toString)
    // perfectly nested ladder {1}, {1,2}, {1,2,3} → Σmin = 0 ⇒
    // βSIM = 0, pure nestedness: Σmax = 1+2+1 = 4, core = 6 − 3 = 3,
    // βSOR = 4/(6+4) = 0.4 = βSNE
    val nest = run(Seq(("a", 1L), ("b", 1L), ("b", 2L),
      ("c", 1L), ("c", 2L), ("c", 3L)))
    assert((nest.getLong(2), nest.getLong(3), nest.getLong(4),
      nest.getDouble(5), nest.getDouble(6), nest.getDouble(7))
      == ((3L, 0L, 4L, 0.0, 0.4, 0.4)), nest.toString)
    // identical sites → core = 4 − 2 = 2 but Σmin = Σmax = 0 ⇒ all
    // three dissimilarities exactly 0 (NOT degenerate: core > 0)
    val ident = run(Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)))
    assert((ident.getLong(2), ident.getDouble(5), ident.getDouble(6),
      ident.getDouble(7)) == ((2L, 0.0, 0.0, 0.0)), ident.toString)
    // corpus: decomposition identity + [0,1] ranges on the one row
    val sf = Relational.q63MultiBeta(spark, sfDir).head()
    val (si, so, sn) = (sf.getDouble(5), sf.getDouble(6), sf.getDouble(7))
    assert(si >= 0 && si <= 1 && so >= si && sn >= -1e-9 &&
      math.abs(so - si - sn) < 2e-6, sf.toString)
  }

  test("NODF: planted perfect nesting = 100, disjoint = 0, and the " +
       "occupancy-histogram column half equals brute-force pairs") {
    import spark.implicits._
    import graft.operators.Relational
    def run(rows: Seq[(String, Long)]) =
      Relational.nodfFromPresence(rows.toDF("n_name", "taxon")).head()
    // perfectly nested ladder with strictly decreasing fills AND
    // strictly decreasing occupancies → every pair overlap = 1 → 100
    val nest = run(Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 1L), ("b", 2L), ("c", 1L)))
    assert((nest.getLong(0), nest.getLong(1), nest.getDouble(2),
      nest.getDouble(3), nest.getDouble(4))
      == ((3L, 3L, 100.0, 100.0, 100.0)), nest.toString)
    // two disjoint equal-fill sites → rows: equal fill ⇒ 0; cols: the
    // two taxa never co-occur ⇒ 0
    val disj = run(Seq(("a", 1L), ("b", 2L)))
    assert((disj.getDouble(2), disj.getDouble(3), disj.getDouble(4))
      == ((0.0, 0.0, 0.0)), disj.toString)
    // column half vs brute force on a mixed fixture: taxa occupancies
    // t1:3, t2:2, t3:1, t4:1 → ordered pairs (m_k > m_l) share samples:
    // (t1,t2): 2 shared / 2 → 1.0; (t1,t3): 1/1 → 1.0; (t1,t4): 1/1 →
    // 1.0; (t2,t3): 1/1 → 1.0; (t2,t4): 0; (t3,t4): equal occupancy 0
    // → col_sum = 4, C(4,2) = 6 → nodf_cols = 100·4/6 = 66.666667
    val mixed = run(Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 1L), ("b", 2L), ("c", 1L), ("c", 4L)))
    assert(mixed.getDouble(3) == 66.666667, mixed.toString)
    // corpus: one row, all three panels in [0, 100]
    val sf = Relational.q64Nodf(spark, sfDir).head()
    Seq(sf.getDouble(2), sf.getDouble(3), sf.getDouble(4)).foreach(v =>
      assert(v >= 0.0 && v <= 100.0, sf.toString))
  }

  test("envfit: an exactly axis-aligned variable fits r2=1 with the " +
       "right arrow, a constant variable is NULL, noise stays weak") {
    import spark.implicits._
    import graft.operators.Relational
    val names = ('a' to 'y').map(c => s"s$c")
    val axes = names.zipWithIndex.map { case (nm, i) =>
      (nm, 0.1 * ((i * 7 + 3) % 11) - 0.5, 0.1 * ((i * 13 + 5) % 9) - 0.4)
    }
    val keys = names.zipWithIndex
      .map { case (nm, i) => (nm, i.toLong) }.toDF("n_name", "k")
    def run(env: Seq[(String, String, Double)]) =
      Relational.envfitFromConfig(
        axes.toDF("n_name", "x1", "x2"),
        env.toDF("variable", "n_name", "v"), keys).collect()
        .map(r => r.getString(0) -> r).toMap
    val env =
      axes.map { case (nm, x1, _) => ("aligned", nm, 3.0 * x1 + 7.0) } ++
      axes.map { case (nm, _, _) => ("flat", nm, 42.0) } ++
      names.zipWithIndex.map { case (nm, i) =>
        ("noise", nm, 0.1 * ((i * 31 + 17) % 23)) }
    val got = run(env)
    // a variable that IS 3·axis1 + 7: r2 = 1 exactly, arrow = (1, 0)
    assert(got("aligned").getDouble(3) == 1.0, got("aligned").toString)
    assert(got("aligned").getDouble(1) == 1.0
      && got("aligned").getDouble(2) == 0.0, got("aligned").toString)
    // constant variable: Svv = 0 → NULL r2 and arrow, p from NULL
    // compares (n_ge = 0 → p = 1/(P+1) is NOT emitted as significant
    // semantics — the r2 NULL is the signal)
    assert(got("flat").isNullAt(3), got("flat").toString)
    // hash noise: r2 well below 1
    assert(got("noise").getDouble(3) < 0.9, got("noise").toString)
    // corpus: 3 variables, r2 in [0,1], p in (0,1]
    val sf = Relational.q61Envfit(spark, sfDir).collect()
    assert(sf.length == 3, sf.mkString(";"))
    sf.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, r.toString)
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0, r.toString)
      val (dx, dy) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(dx * dx + dy * dy - 1.0) < 1e-5, r.toString)
    }
  }

  test("bioenv: the variable that GENERATED the distances wins, its " +
       "supersets tie at rho=1, and a constant variable nulls out") {
    import spark.implicits._
    import graft.operators.Relational
    // 6 samples at SIDON-set positions {0,1,3,7,12,20} — all 15
    // pairwise differences distinct, so NO rank ties exist and the
    // 1e-12 z-quantization noise cannot split a tie group: a monotone
    // env distance in the same order gives Spearman rho = 1 EXACTLY
    val pos = Seq(0, 1, 3, 7, 12, 20)
    val names = pos.indices.map(i => s"s$i")
    val bcp = (for {
      i <- pos.indices; j <- i + 1 until pos.size
    } yield (names(i), names(j), 0.01 * (pos(j) - pos(i))))
      .toDF("sample_a", "sample_b", "bc")
    // acctbal_mean sits at the Sidon positions (scaled); totalprice_
    // mean is hash noise; orders_per_cust is CONSTANT (sd = 0 → its
    // singleton subset has no distance signal → NULL rho)
    val env = names.zipWithIndex.flatMap { case (nm, i) => Seq(
      ("acctbal_mean", nm, 10.0 * pos(i)),
      ("totalprice_mean", nm, ((i * 17 + 5) % 7).toDouble),
      ("orders_per_cust", nm, 3.0)) }
      .toDF("variable", "n_name", "v")
    val got = Relational.bioenvFromInputs(bcp, env).collect()
      .map(r => r.getString(1) ->
        (r.getInt(0), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got.size == 7, got.toString)
    // the generating variable alone: rho = 1 (rank 1 after tie-break)
    assert(got("acctbal_mean")._2.contains(1.0), got.toString)
    // adding the constant variable changes nothing: still rho = 1
    assert(got("acctbal_mean+orders_per_cust")._2.contains(1.0),
      got.toString)
    // the constant variable alone: all distances tie → NULL rho, last
    assert(got("orders_per_cust")._2.isEmpty, got.toString)
    assert(got("orders_per_cust")._1 == 7, got.toString)
    // noise alone must not reach 1
    assert(got("totalprice_mean")._2.exists(_ < 1.0), got.toString)
    // corpus: 7 subsets, ranks 1..7, rho in [-1, 1]
    val sf = Relational.q62Bioenv(spark, sfDir).collect()
    assert(sf.length == 7 && sf.map(_.getInt(0)).sorted.sameElements(1 to 7),
      sf.mkString(";"))
    sf.filterNot(_.isNullAt(3)).foreach(r =>
      assert(math.abs(r.getDouble(3)) <= 1.0, r.toString))
  }

  test("Renyi profile: flat at ln k on a uniform community, strictly " +
       "decreasing under dominance, exactly zero for a single taxon, " +
       "and consistent with q58's Hill points corpus-wide") {
    import spark.implicits._
    import graft.operators.Relational
    def run(rows: Seq[(String, Long, Long)]) =
      Relational.renyiFromCounts(rows.toDF("n_name", "taxon", "cnt"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getDouble(2), r.getDouble(3))).toMap
    val got = run(
      (1L to 4L).map(t => ("uni", t, 25L)) ++
      Seq(("dom", 1L, 97L), ("dom", 2L, 1L), ("dom", 3L, 1L),
        ("dom", 4L, 1L)) ++
      Seq(("solo", 1L, 42L)))
    val alphas = Seq("0", "0.5", "1", "2", "4", "inf")
    // uniform: H = ln 4 at every alpha, hill = 4 everywhere
    val ln4 = math.rint(math.log(4.0) * 1e6) / 1e6
    alphas.foreach { a =>
      assert(got(("uni", a))._1 == ln4 && got(("uni", a))._2 == 4.0,
        s"uniform profile not flat at alpha=$a: ${got(("uni", a))}") }
    // dominance: profile strictly decreasing along the alpha ladder
    val dom = alphas.map(a => got(("dom", a))._1)
    assert(dom.zip(dom.tail).forall { case (x, y) => x > y },
      s"dominated profile not strictly decreasing: $dom")
    assert(got(("dom", "0"))._1 == ln4, "H0 must be ln richness")
    // single taxon: exactly 0 (positive zero via roundz), hill = 1
    alphas.foreach { a =>
      val (h, d) = got(("solo", a))
      assert(h == 0.0 && !(1.0 / h < 0) && d == 1.0,
        s"solo not canonical zero at alpha=$a: ($h, $d)") }
    // corpus: profile non-increasing per group; hill at alpha 1 and 2
    // equals q58's hill1/hill2 (two operators, one truth)
    val sf = Relational.q65Renyi(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val q58 = Relational.q58HillNumbers(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    q58.foreach { case (g, (hill1, hill2)) =>
      assert(sf((g, "1"))._2 == hill1, s"$g hill1 disagrees with q58")
      assert(sf((g, "2"))._2 == hill2, s"$g hill2 disagrees with q58")
      val prof = alphas.map(a => sf((g, a))._1)
      assert(prof.zip(prof.tail).forall { case (x, y) => x >= y },
        s"$g profile not non-increasing: $prof")
    }
  }

  test("individual rarefaction: exact hypergeometric means on a " +
       "planted panel, monotone and bounded by richness corpus-wide") {
    import spark.implicits._
    import graft.operators.Relational
    // N = 3 individuals, taxa A:2, B:1 — E[S(1)] = 2/3 + 1/3 = 1,
    // E[S(2)] = 1 + 2/3 = 5/3, E[S(3)] = S_obs = 2 exactly
    val ab = Seq(("s1", 1L, 2L), ("s1", 2L, 1L))
      .toDF("n_name", "taxon", "cnt")
    val got = Relational.rarefyFromCounts(ab, Seq(1, 2, 3)).collect()
      .map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(got == Map(1 -> 1.0, 2 -> 1.666667, 3 -> 2.0), got.toString)
    // grid points beyond the sample's depth emit nothing
    val deep = Relational.rarefyFromCounts(ab, Seq(2, 99)).collect()
    assert(deep.length == 1 && deep(0).getInt(1) == 2, deep.mkString(";"))
    // corpus: per sample the curve is monotone non-decreasing in n
    // and strictly below observed richness at every finite depth
    val sf = Relational.q66Rarefy(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(sf.nonEmpty)
    sf.groupBy(_._1).foreach { case (g, rs) =>
      val curve = rs.sortBy(_._2)
      assert(curve.zip(curve.tail).forall { case (a, b) => a._4 <= b._4 },
        s"$g curve not monotone")
      assert(curve.forall(r => r._4 > 0 && r._4 < r._3.toDouble),
        s"$g curve out of bounds")
    }
  }

  test("Markov mix: exact stationary vectors on planted chains, the " +
       "absorbing completion drains, and the corpus mix is a " +
       "distribution") {
    import spark.implicits._
    import graft.operators.Events
    def run(ps: Seq[(String, String, Long)]) =
      Events.markovMixFromPairs(ps.toDF("from_type", "to_type", "n"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2))).toMap
    // alternating 2-cycle: uniform IS stationary (exact at every step)
    val alt = run(Seq(("A", "B", 5L), ("B", "A", 5L)))
    assert(alt("A")._2 == 0.5 && alt("B")._2 == 0.5, alt.toString)
    // A→B always, B→A w.p. 1/3: π = (1/4, 3/4); |λ₂| = 1/3 puts the
    // 40-step iterate ~1e-19 from the limit → round-6 exact
    val bias = run(Seq(("A", "B", 6L), ("B", "A", 2L), ("B", "B", 4L)))
    assert(bias("A")._2 == 0.25 && bias("B")._2 == 0.75, bias.toString)
    // B has no outgoing row → the absorbing self-loop completion:
    // everything drains into B (exactly, after one step)
    val drain = run(Seq(("A", "B", 5L)))
    assert(drain("A") == ((5L, 0.0)) && drain("B") == ((0L, 1.0)),
      drain.toString)
    // corpus: one row per type, a probability distribution
    val sf = Events.markovMix(
      graft.Tables.load(spark, sfDir, "events")).collect()
    assert(sf.length == 5, sf.mkString(";"))
    assert(sf.forall(r => r.getDouble(2) >= 0.0))
    assert(math.abs(sf.map(_.getDouble(2)).sum - 1.0) < 1e-4,
      sf.mkString(";"))
  }

  test("Good-Turing coverage: exact on a planted frequency panel") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(("A", 1L, "a b a c"), ("A", 2L, "d"),
      ("B", 3L, "x x x x"))
      .toDF("source", "doc_id", "text")
    val got = TextOps.goodTuring(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    // A: 5 tokens {a:2, b:1, c:1, d:1} → f1=3, f2=1, P0=0.6
    assert(got("A") == ((5L, 4L, 3L, 1L, 0.6, 0.4)), got("A").toString)
    // B: one type seen 4× → no singletons, full coverage
    assert(got("B") == ((4L, 1L, 0L, 0L, 0.0, 1.0)), got("B").toString)
    val sf = TextOps.goodTuring(
      graft.Tables.load(spark, sfDir, "documents")).collect()
    assert(sf.nonEmpty && sf.forall { r =>
      val p = r.getDouble(5); p >= 0.0 && p <= 1.0 }, sf.mkString(";"))
  }

  test("species accumulation: exact hypergeometric means on a planted " +
       "panel, monotone, and closes at total richness") {
    import spark.implicits._
    import graft.operators.Relational
    // X in both samples, Y only in s1: E[S(1)] = (2 + 1)/2 = 1.5,
    // E[S(2)] = 2 exactly
    val pres = Seq(("s1", 1L), ("s1", 2L), ("s2", 1L))
      .toDF("n_name", "taxon")
    val got = Relational.specAccumFromPresence(pres).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got == Map(1 -> 1.5, 2 -> 2.0), got.toString)
    // sf corpus: strictly monotone non-decreasing, tail = the global
    // distinct-taxon count exactly (every taxon certainly included)
    val sf = Relational.q57SpecAccum(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    assert(sf.zip(sf.tail).forall { case (a, b) => a._2 <= b._2 },
      "curve not monotone")
    val presSf = graft.Tables.load(spark, sfDir, "lineitem")
      .join(graft.Tables.load(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.dim(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.dim(spark, sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("l_partkey")).distinct().count()
    assert(sf.last._2 == presSf.toDouble,
      s"tail ${sf.last} != total richness $presSf")
  }

  test("species pool: exact planted Chao2/jackknife/bootstrap panel, " +
       "one-sample degenerate NULL jack2, corpus estimators bound " +
       "observed richness") {
    import spark.implicits._
    import graft.operators.Relational
    // A={t1,t2}, B={t2,t3}, C={t2}: N=3, S=3, Q1=2 (t1,t3), Q2=0.
    // chao2 = 3 + (2/3)·2·1/(2·1) = 3.666667; jack1 = 3 + 2·2/3 =
    // 4.333333; jack2 = 3 + 2·3/3 − 0 = 5; boot = 3 + 2·(2/3)³ =
    // 3 + 2·0.296296296 = 3.592593 (round-9 terms, round-6 output)
    val pres = Seq(("A", 1L), ("A", 2L), ("B", 2L), ("B", 3L), ("C", 2L))
      .toDF("n_name", "taxon")
    val got = Relational.specPoolFromPresence(pres).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 3L, 2L, 0L)), r.toString)
    assert((r.getDouble(4), r.getDouble(5), r.getDouble(6),
      r.getDouble(7)) == ((3.666667, 4.333333, 5.0, 3.592593)),
      r.toString)
    // one-sample survey: jack2's N(N−1) denominator degenerates →
    // NULL; the other estimators collapse to S (no between-sample
    // signal: Q1 carries zero weight at N = 1, boot's (1−1)¹ = 0)
    val one = Relational.specPoolFromPresence(
      Seq(("s1", 1L), ("s1", 2L)).toDF("n_name", "taxon")).collect().head
    assert(one.getLong(0) == 1L && one.getLong(1) == 2L &&
      one.getDouble(4) == 2.0 && one.getDouble(5) == 2.0 &&
      one.isNullAt(6) && one.getDouble(7) == 2.0, one.toString)
    // sf corpus: every estimator extrapolates (≥ S_obs), and the
    // sample count is the nation dimension's cardinality
    val sf = Relational.q80SpecPool(spark, sfDir).collect().head
    val sObs = sf.getLong(1).toDouble
    assert(sf.getLong(0) == 25L, sf.toString)
    assert(sf.getDouble(4) >= sObs && sf.getDouble(5) >= sObs &&
      sf.getDouble(7) >= sObs, sf.toString)
  }

  test("gini concentration: equality zero, planted 0.81 with 0.91 " +
       "top-decile share, sub-decile NULL, corpus in [0,1)") {
    import spark.implicits._
    import graft.operators.Events
    def run(counts: Seq[Long]) = Events.giniFromCounts(
      counts.zipWithIndex.map { case (c, u) => (u.toLong, c) }
        .toDF("user_id", "cnt")).collect().head
    // perfect equality → exactly 0; fewer than 10 users → NULL share
    val eq = run(Seq(1L, 1L, 1L, 1L))
    assert(eq.getLong(0) == 4L && eq.getLong(1) == 4L &&
      eq.getDouble(2) == 0.0 && eq.isNullAt(3), eq.toString)
    // nine users at 1, one at 91: Σ(2i−11)xᵢ = 810 → G = 0.81; the
    // top ⌊10/10⌋ = 1 user holds 91/100 of the events
    val conc = run(Seq.fill(9)(1L) :+ 91L)
    assert(conc.getDouble(2) == 0.81 && conc.getDouble(3) == 0.91,
      conc.toString)
    // a single user is a degenerate Lorenz curve: G = 0
    val solo = run(Seq(42L))
    assert(solo.getDouble(2) == 0.0 && solo.isNullAt(3), solo.toString)
    // sf corpus: G ∈ [0, 1), share a fraction when defined
    val sf = Events.e36Gini(spark, sfDir).collect().head
    assert(sf.getDouble(2) >= 0.0 && sf.getDouble(2) < 1.0, sf.toString)
    assert(sf.isNullAt(3) ||
      (sf.getDouble(3) > 0.0 && sf.getDouble(3) <= 1.0), sf.toString)
  }

  test("tail index: bitwise JVM replica on planted power-law and " +
       "random count multisets, flat tail NULL, corpus not heavy") {
    import spark.implicits._
    import graft.operators.Events
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the operator's arithmetic replayed exactly: round-12 ln grid,
    // order-free BigDecimal sums, one round-6 division per output
    def replica(counts: Seq[Long])
        : (Long, Long, Option[Long], Option[Double], Long, Option[Double]) = {
      val sorted = counts.sorted
      val n = counts.size
      val k = math.max(1, n / 10)
      val xmin = if (n - k >= 1) Some(sorted(n - k - 1)) else None
      val slog = xmin.map { xm =>
        sorted.drop(n - k)
          .map(c => BigDecimal(r(math.log(c.toDouble / xm), 12))).sum
      }
      val alpha = slog.filter(_ > 0).map(s => r(k / s.toDouble, 6))
      val dist = counts.groupBy(identity).keys.toSeq.sorted
      val pts = dist.map { v =>
        (BigDecimal(r(math.log(v.toDouble), 12)),
          BigDecimal(r(math.log(
            counts.count(_ >= v).toDouble / n), 12)))
      }
      val m = pts.size
      val sx = pts.map(_._1).sum.toDouble
      val sy = pts.map(_._2).sum.toDouble
      val sxy = pts.map { case (x, y) =>
        BigDecimal(r(x.toDouble * y.toDouble, 12)) }.sum.toDouble
      val sxx = pts.map { case (x, _) =>
        BigDecimal(r(x.toDouble * x.toDouble, 12)) }.sum.toDouble
      val den = m * sxx - sx * sx
      val slope = if (m >= 2 && den != 0.0)
        Some(r((m * sxy - sx * sy) / den, 6) + 0.0) else None
      (n.toLong, k.toLong, xmin, alpha, m.toLong, slope)
    }
    def run(counts: Seq[Long]) = {
      val row = Events.tailIndexFromCounts(
        counts.zipWithIndex.map { case (c, u) => (u.toLong, c) }
          .toDF("user_id", "cnt")).collect().head
      (row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) None else Some(row.getLong(2)),
        if (row.isNullAt(3)) None else Some(row.getDouble(3)),
        row.getLong(4),
        if (row.isNullAt(5)) None else Some(row.getDouble(5)))
    }
    // exact power-law plant: ccdf(1,2,4) = 1, 1/4, 1/16 → the ln-ln
    // points are exactly collinear with slope −2 on the round-12 grid;
    // Hill at k=1 over threshold 2: α = 1/ln 2 = 1.442695
    val pow = Seq.fill(12)(1L) ++ Seq.fill(3)(2L) :+ 4L
    val gotPow = run(pow)
    assert(gotPow == replica(pow), s"$gotPow vs ${replica(pow)}")
    assert(gotPow._4 == Some(1.442695) && gotPow._6 == Some(-2.0), gotPow)
    // flat tail: every user identical → no defined index (slog = 0)
    // and a single CCDF point → no slope
    val flat = run(Seq.fill(20)(7L))
    assert(flat._4 == None && flat._5 == 1L && flat._6 == None, flat)
    // one user: no below-tail rank → NULL threshold, NULL α
    val solo = run(Seq(42L))
    assert(solo._3 == None && solo._4 == None, solo)
    // random multisets: bitwise replica equality
    for (seed <- Seq(7L, 8L)) {
      val rng = new scala.util.Random(seed)
      val counts = Seq.fill(30 + rng.nextInt(40))(
        (1L + rng.nextInt(60)).toLong)
      assert(run(counts) == replica(counts), s"seed $seed")
    }
    // sf corpus: near-uniform per-user activity → a LARGE Hill α (not
    // heavy-tailed; heavy is α ≤ 2) and a negative CCDF slope
    val sf = Events.e37TailIndex(spark, sfDir).collect().head
    assert(sf.getDouble(3) > 2.0, sf.toString)
    assert(sf.getDouble(5) < 0.0, sf.toString)
  }

  test("dow profile: uniform cells normalize to exactly 1, a single " +
       "spike is +0.0 entropy with NULL norm, Monday anchors dow 0, " +
       "corpus near-flat") {
    import spark.implicits._
    import graft.operators.Events
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    def run(rows: Seq[(String, String)]) = Events.dowProfile(
      rows.toDF("event_type", "ts0")
        .withColumn("ts", to_timestamp(col("ts0"))).drop("ts0"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getDouble(3),
        if (x.isNullAt(4)) None else Some(x.getDouble(4)),
        x.getLong(5), x.getLong(6), x.getDouble(7)))
    // four equal cells → entropy ln 4, normalized EXACTLY 1; and
    // 2024-01-01 is a Monday → dow 0 under the 1970-01-05 anchor
    val flat = run(Seq(
      ("a", "2024-01-01 05:00:00"), ("a", "2024-01-01 09:00:00"),
      ("a", "2024-01-02 05:00:00"), ("a", "2024-01-02 09:00:00")))
    assert(flat.toSeq == Seq(("a", 4L, 4L, 1.386294, Some(1.0),
      0L, 5L, 0.25)), flat.mkString(";"))
    // one hot cell of 3 + one of 1: peak share 0.75, the exact
    // round-12 term grid for H(3/4, 1/4)
    val skew = run(Seq(
      ("b", "2024-01-03 12:10:00"), ("b", "2024-01-03 12:20:00"),
      ("b", "2024-01-03 12:30:00"), ("b", "2024-01-03 13:00:00")))
    val s34 = BigDecimal(r(0.75 * math.log(0.75), 12)) +
      BigDecimal(r(0.25 * math.log(0.25), 12))
    assert(skew.head._4 == r(-s34.toDouble, 6) &&
      skew.head._5 == Some(r(-s34.toDouble / math.log(2.0), 6)) &&
      skew.head._6 == 2L && skew.head._7 == 12L &&
      skew.head._8 == 0.75, skew.mkString(";"))
    // a single cell: entropy POSITIVE zero, no normalizer
    val spike = run(Seq.fill(5)(("c", "2024-01-07 23:59:59")))
    assert(java.lang.Double.doubleToLongBits(spike.head._4) == 0L &&
      spike.head._5 == None && spike.head._8 == 1.0,
      spike.mkString(";"))
    // corpus: 168 cells per type on hash-uniform traffic, norm near 1
    val sf = Events.e40DowProfile(spark, sfDir).collect()
    assert(sf.nonEmpty)
    sf.foreach { x =>
      assert(x.getLong(2) <= 168L, x.toString)
      assert(x.getDouble(4) > 0.9 && x.getDouble(4) <= 1.0, x.toString)
      assert(x.getLong(5) >= 0L && x.getLong(5) <= 6L &&
        x.getLong(6) >= 0L && x.getLong(6) <= 23L, x.toString) }
  }

  test("croston: steady demand degenerates to SES size over interval 1, " +
       "planted every-3rd-day and random patterns match a JVM replica, " +
       "corpus rates bounded") {
    import spark.implicits._
    import graft.operators.Events
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val A = Events.CrostonAlpha
    // the operator's two folds replayed exactly (same IEEE sequence)
    def replica(rows: Seq[(Long, String, Long)])
        : Seq[(Long, Long, Double, Double, Double, Double, Double)] = {
      val d0 = rows.map(_._2).min
      def dn(d: String) = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(d0), java.time.LocalDate.parse(d))
      val span = rows.map(t => dn(t._2)).max + 1
      rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, rs) =>
        val ds = rs.map(t => (dn(t._2), t._3)).sortBy(_._1)
        val z = ds.tail.map(_._2.toDouble)
          .foldLeft(ds.head._2.toDouble)((acc, q) => acc + A * (q - acc))
        val p = ds.sliding(2).collect { case Seq(x, y) =>
          (y._1 - x._1).toDouble }.toSeq
          .foldLeft((ds.head._1 + 1).toDouble)((acc, i) => acc + A * (i - acc))
        (u, ds.size.toLong, r6(z), r6(p), r6(z / p),
          r6((1.0 - A / 2) * z / p), r6(ds.size.toDouble / span))
      }
    }
    def run(rows: Seq[(Long, String, Long)]) =
      Events.crostonFromDaily(rows.toDF("user_id", "day", "q")
        .withColumn("day", to_date(col("day"))))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toSeq
    // steady: q = 5 every day → z = 5 exactly, all intervals 1 from
    // init 1 → p = 1 exactly, forecast 5, SBA 4.75, rate 1
    val steady = (0 until 10).map(i =>
      (1L, f"2024-01-${i + 1}%02d", 5L))
    assert(run(steady) ==
      Seq((1L, 10L, 5.0, 1.0, 5.0, 4.75, 1.0)), run(steady).toString)
    // every 3rd day + a later-starting second user (larger p init):
    // bitwise replica equality
    val lumpy = (0 until 5).map(i => (1L, f"2024-01-${3 * i + 1}%02d", 2L)) ++
      Seq((2L, "2024-01-05", 7L), (2L, "2024-01-11", 1L))
    assert(run(lumpy) == replica(lumpy), s"${run(lumpy)} vs ${replica(lumpy)}")
    // a single demand day: z = q, p = 1-based first offset, no folds
    val solo = Seq((9L, "2024-02-03", 4L))
    assert(run(solo) == Seq((9L, 1L, 4.0, 1.0, 4.0, 3.8, 1.0)),
      run(solo).toString)
    for (seed <- Seq(31L, 32L)) {
      val rng = new scala.util.Random(seed)
      val rows = for {
        u <- 1L to 5L
        d <- 1 to 28 if rng.nextDouble() < 0.4
      } yield (u, f"2024-03-$d%02d", (1L + rng.nextInt(9)).toLong)
      assert(run(rows) == replica(rows), s"seed $seed")
    }
    // corpus: one row per user, interval ≥ 1, rate ∈ (0, 1]
    val sf = Events.e39Croston(spark, sfDir).collect()
    assert(sf.length == 150 || sf.length == 15, sf.length.toString)
    sf.foreach { r =>
      assert(r.getDouble(3) >= 1.0 && r.getDouble(6) > 0.0 &&
        r.getDouble(6) <= 1.0 && r.getDouble(4) > 0.0, r.toString) }
  }

  test("transition entropy: scripted chain is +0.0, fair coin is ln 2, " +
       "random bigram frames match a JVM replica, corpus bounded") {
    import spark.implicits._
    import graft.operators.Events
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    def replica(bi: Seq[(String, String, Long)])
        : Seq[(String, Long, Long, Double)] = {
      val nn = bi.map(_._3).sum
      val per = bi.groupBy(_._1).toSeq.map { case (s, rows) =>
        val tot = rows.map(_._3).sum
        val h = -rows.map(t => BigDecimal(r(
          (t._3.toDouble / tot) * math.log(t._3.toDouble / tot), 12))).sum
        (s, tot, rows.size.toLong, r(h.toDouble, 6) + 0.0)
      }
      val hAll = -bi.map { case (s, _, n) =>
        val tot = bi.filter(_._1 == s).map(_._3).sum
        BigDecimal(r((n.toDouble / nn) * math.log(n.toDouble / tot), 12))
      }.sum
      (per :+ (("*", nn, bi.size.toLong, r(hAll.toDouble, 6) + 0.0)))
        .sortBy(_._1)
    }
    def run(bi: Seq[(String, String, Long)]) =
      Events.transitionEntropyFromBigrams(
        bi.toDF("from_type", "to_type", "n")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
    // a scripted 2-cycle: every state fully determined → H = +0.0
    // (POSITIVE zero — roundz; the decimal-sum negation mints −0.0)
    val chain = run(Seq(("a", "b", 5L), ("b", "a", 3L)))
    chain.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row._4) == 0L,
        s"signed zero leaked: $row") }
    // a fair coin at 'a': H(a) = ln 2; the '*' row weights a's coin
    // by its 2/3 share of all bigrams
    val coin = run(Seq(("a", "x", 2L), ("a", "y", 2L), ("b", "z", 2L)))
      .map(t => t._1 -> t).toMap
    assert(coin("a")._4 == 0.693147 && coin("b")._4 == 0.0, coin.toString)
    assert(coin("*")._2 == 6L && coin("*")._3 == 3L, coin.toString)
    assert(coin("*")._4 == replica(
      Seq(("a", "x", 2L), ("a", "y", 2L), ("b", "z", 2L)))
      .find(_._1 == "*").get._4, coin.toString)
    // random bigram frames: bitwise replica equality
    for (seed <- Seq(11L, 12L)) {
      val rng = new scala.util.Random(seed)
      val states = Seq("s1", "s2", "s3", "s4")
      val bi = (for {
        a <- states; b <- states
        if rng.nextDouble() < 0.7
      } yield (a, b, (1L + rng.nextInt(50)).toLong))
      assert(run(bi) == replica(bi), s"seed $seed")
    }
    // sf corpus: every row obeys 0 ≤ H ≤ ln(n_next); the '*' row is a
    // convex mixture of the per-state entropies (≤ their max)
    val sf = Events.e38TransitionEntropy(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val star = sf.find(_._1 == "*").get
    val states = sf.filter(_._1 != "*")
    assert(states.nonEmpty && star._2 == states.map(_._2).sum)
    sf.foreach { row =>
      assert(row._4 >= 0.0 && row._4 <= math.log(row._3.toDouble) + 1e-9,
        row.toString) }
    assert(star._4 <= states.map(_._4).max + 1e-9, star.toString)
  }

  test("seasonal strength: pure-trend/pure-season/pure-noise planted " +
       "panels, undecomposable rows drop, corpus strengths in [0,1]") {
    import spark.implicits._
    import graft.operators.Events
    def mk(rows: Seq[(String, Option[Double], Double, Double)]) =
      rows.zipWithIndex.map { case ((t, r, tr, se), i) =>
        (t, f"1970-01-${i % 28 + 1}%02d", 0L, tr, se, r) }
        .toDF("event_type", "day", "cnt", "trend", "seasonal", "resid")
    // tr: rising trend, zero resid → F_T = 1; flat seasonal → F_S NULL
    val tr = (1 to 6).map(i => ("tr", Some(0.0), i.toDouble, 0.0))
    // se: alternating season, zero resid → F_S = 1; flat trend → NULL
    val se = (1 to 6).map(i =>
      ("se", Some(0.0), 5.0, if (i % 2 == 0) 1.0 else -1.0))
    // nz: all the variance is residual → both strengths exactly 0;
    // one undecomposable (NULL-resid) day must not enter the censuses
    val nz = (1 to 6).map(i =>
      ("nz", Some(if (i % 2 == 0) 1.0 else -1.0), 2.0, 0.0)) :+
      (("nz", Option.empty[Double], 99.0, 99.0))
    val got = Events.strengthFromStl(mk(tr ++ se ++ nz)).collect()
      .map(r => r.getString(0) -> r).toMap
    val t = got("tr")
    assert(t.getLong(1) == 6L && t.getDouble(2) == 1.0 && t.isNullAt(3),
      t.toString)
    val s = got("se")
    assert(s.isNullAt(2) && s.getDouble(3) == 1.0, s.toString)
    val z = got("nz")
    assert(z.getLong(1) == 6L && z.getDouble(2) == 0.0 &&
      z.getDouble(3) == 0.0, z.toString)
    // sf corpus: strengths are clamped shares
    val sf = Events.seasonalStrength(spark, sfDir).collect()
    assert(sf.nonEmpty && sf.forall { r =>
      (r.isNullAt(2) || (r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)) &&
      (r.isNullAt(3) || (r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)) },
      sf.mkString(";"))
  }

  test("changepoint: clean step found exactly with share 1, constant " +
       "series ties to day 1 with NULL share, calendar gap is a real " +
       "zero, corpus shares in [0,1]") {
    import spark.implicits._
    import graft.operators.Events
    val dayUs = 86400L * 1000000L
    def mkEvents(series: Seq[(String, Int, Int)]) = {
      val rows = for {
        ((tp, d, cnt), gi) <- series.zipWithIndex
        i <- 0 until cnt
      } yield {
        val t = new java.sql.Timestamp(0L)
        t.setTime((d.toLong * dayUs + i.toLong * 1000000L) / 1000L)
        ((gi * 1000 + i).toLong, t, 1L, tp, 0.0, "{}")
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }
    // step: 10/day for 10 days then 30/day for 10 — the split after
    // day 10 explains ALL the variance (gain = SST = 2000, share 1)
    val step = (0 until 10).map(d => ("step", d, 10)) ++
      (10 until 20).map(d => ("step", d, 30))
    // const: no shift — every gain is exactly 0, tie → earliest day,
    // share NULL on the zero-SSE series
    val const = (0 until 5).map(d => ("const", d, 10))
    // gapz: day 3 has NO events; the calendar fill makes it a real
    // zero and the best split isolates the dip: 10,10,10 | 0,10
    val gapz = Seq(0, 1, 2, 4).map(d => ("gapz", d, 10))
    val got = Events.changepoint(mkEvents(step ++ const ++ gapz))
      .collect().map(r => r.getString(0) -> r).toMap
    val s = got("step")
    assert(s.getString(1) == "1970-01-10" && s.getLong(2) == 20L &&
      s.getDouble(3) == 10.0 && s.getDouble(4) == 30.0 &&
      s.getDouble(5) == 2000.0 && s.getDouble(6) == 1.0, s.toString)
    val c = got("const")
    assert(c.getString(1) == "1970-01-01" && c.getDouble(5) == 0.0 &&
      c.isNullAt(6), c.toString)
    val g = got("gapz")
    assert(g.getString(1) == "1970-01-03" && g.getLong(2) == 5L &&
      g.getDouble(3) == 10.0 && g.getDouble(4) == 5.0, g.toString)
    // sf corpus: one row per type, gain ≥ 0, the explained share is a
    // fraction of total SSE
    val sf = Events.changepoint(spark, sfDir).collect()
    assert(sf.nonEmpty && sf.forall { r =>
      r.getDouble(5) >= 0.0 && (r.isNullAt(6) ||
        (r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)) },
      sf.mkString(";"))
  }

  test("envfit factor: perfectly separated groups hit r2=1 with exact " +
       "centroids, degenerate configuration NULLs, corpus r2 in [0,1]") {
    import spark.implicits._
    import graft.operators.Relational
    val x = Seq(("s1", -1.0, 0.0), ("s2", -1.0, 0.0),
      ("s3", 1.0, 0.0), ("s4", 1.0, 0.0)).toDF("n_name", "x1", "x2")
    val grp = Seq(("s1", "A"), ("s2", "A"), ("s3", "B"), ("s4", "B"))
      .toDF("n_name", "g")
    val keys = Seq(("s1", 1L), ("s2", 2L), ("s3", 3L), ("s4", 4L))
      .toDF("n_name", "k")
    val got = Relational.factorFitFromConfig(x, grp, keys).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("A").getLong(1) == 2L && got("A").getDouble(2) == -1.0 &&
      got("A").getDouble(3) == 0.0 && got("A").getDouble(4) == 1.0,
      got("A").toString)
    assert(got("B").getDouble(2) == 1.0 && got("B").getDouble(4) == 1.0,
      got("B").toString)
    assert(got("A").getDouble(7) > 0.0 && got("A").getDouble(7) <= 1.0,
      got("A").toString)
    // all-identical configuration: SS_total = 0 → NULL r², no test
    val flat = Relational.factorFitFromConfig(
      Seq(("s1", 0.0, 0.0), ("s2", 0.0, 0.0), ("s3", 0.0, 0.0),
        ("s4", 0.0, 0.0)).toDF("n_name", "x1", "x2"), grp, keys)
      .collect()
    assert(flat.forall(_.isNullAt(4)), flat.mkString(";"))
    // sf corpus: 5 region levels covering all 25 samples, r² a share
    val sf = Relational.q85EnvfitFactor(spark, sfDir).collect()
    assert(sf.length == 5 && sf.map(_.getLong(1)).sum == 25L)
    assert(sf.forall { r => r.getDouble(4) >= 0.0 &&
      r.getDouble(4) <= 1.0 && r.getDouble(7) > 0.0 &&
      r.getDouble(7) <= 1.0 }, sf.mkString(";"))
  }

  test("decostand: hand-computed 2x2 standardization panel, Hellinger " +
       "rows unit-norm on the corpus, Wisconsin rows sum to 1") {
    import spark.implicits._
    import graft.operators.Relational
    // s1: A=1, B=4; s2: A=9. rows 5/9; col A sum 10 max 9, col B 4/4;
    // grand 14. hellinger s1B = √(4/5); chisq s1B = 4√14/(5·√4);
    // maxstd s1A = 1/9; wisconsin s1 = (1/9, 1)/Σ → (0.1, 0.9)
    val ab = Seq(("s1", "A", 1L), ("s1", "B", 4L), ("s2", "A", 9L))
      .toDF("n_name", "p_type", "cnt")
    val got = Relational.decostandFromCounts(ab).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val s1a = got(("s1", "A"))
    assert(s1a.getDouble(3) == 0.447214 && s1a.getDouble(5) == 0.111111
      && s1a.getDouble(6) == 0.1, s1a.toString)
    val s1b = got(("s1", "B"))
    assert(s1b.getDouble(3) == 0.894427 && s1b.getDouble(4) == 1.496663
      && s1b.getDouble(5) == 1.0 && s1b.getDouble(6) == 0.9,
      s1b.toString)
    val s2a = got(("s2", "A"))
    assert(s2a.getDouble(3) == 1.0 && s2a.getDouble(4) == 1.183216 &&
      s2a.getDouble(5) == 1.0 && s2a.getDouble(6) == 1.0, s2a.toString)
    // sf corpus: Hellinger rows have unit squared norm (Σ x/row = 1),
    // Wisconsin rows sum to 1, every value positive
    val sf = Relational.q84Decostand(spark, sfDir).collect()
    assert(sf.nonEmpty && sf.forall(r => r.getDouble(3) > 0.0 &&
      r.getDouble(4) > 0.0 && r.getDouble(5) > 0.0 &&
      r.getDouble(6) > 0.0))
    sf.groupBy(_.getString(0)).foreach { case (s, rows) =>
      val h2 = rows.map(r => r.getDouble(3) * r.getDouble(3)).sum
      val ws = rows.map(_.getDouble(6)).sum
      assert(math.abs(h2 - 1.0) < 1e-4, s"$s hellinger norm $h2")
      assert(math.abs(ws - 1.0) < 1e-4, s"$s wisconsin sum $ws")
    }
  }

  test("Morisita dispersion: clumped/uniform planted panel, " +
       "absent samples count, singleton NULL, corpus nonnegative") {
    import spark.implicits._
    import graft.operators.Relational
    // 3 samples in the survey. clump: all 4 tokens in s1 →
    // I = 3·12/(4·3) = 3; spread: (2,1,1) → I = 3·2/12 = 0.5;
    // solo: X = 1 → no pairs → NULL. s3 holds only 'spread'/'solo'
    // mass, but N = 3 counts it for 'clump' too — absence is signal.
    val ab = Seq(
      ("s1", 1L, 4L),
      ("s1", 2L, 2L), ("s2", 2L, 1L), ("s3", 2L, 1L),
      ("s3", 3L, 1L))
      .toDF("n_name", "taxon", "cnt")
    val got = Relational.dispersionFromCounts(ab).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 3L && got(1L).getLong(2) == 4L &&
      got(1L).getDouble(3) == 3.0, got(1L).toString)
    assert(got(2L).getDouble(3) == 0.5, got(2L).toString)
    assert(got(3L).getLong(2) == 1L && got(3L).isNullAt(3),
      got(3L).toString)
    // sf corpus: N = 25 nations everywhere; defined indices ≥ 0 and
    // capped by N (all mass in one sample)
    val sf = Relational.q83Dispersion(spark, sfDir).collect()
    assert(sf.nonEmpty && sf.forall { r =>
      r.getLong(1) == 25L && (r.isNullAt(3) ||
        (r.getDouble(3) >= 0.0 && r.getDouble(3) <= 25.0)) },
      sf.length.toString)
  }

  test("broken stick: exact planted expectations with tie-break, " +
       "expectations decrease with rank on the corpus") {
    import spark.implicits._
    import graft.operators.Relational
    // g: t1=4, t2=1, t3=1 → N=6, S=3, N/S=2. Tail harmonic sums:
    // r1: 1+1/2+1/3, r2: 1/2+1/3, r3: 1/3 → expected 3.666667 /
    // 1.666667 / 0.666667; the t2/t3 count tie breaks by taxon id
    val ab = Seq(("g", 1L, 4L), ("g", 2L, 1L), ("g", 3L, 1L))
      .toDF("n_name", "taxon", "cnt")
    val got = Relational.bstickFromCounts(ab).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (1, 1L, 4L, 3.666667, 1.090909),
      (2, 2L, 1L, 1.666667, 0.6),
      (3, 3L, 1L, 0.666667, 1.5)), got.mkString(";"))
    // sf corpus: every group's expectation strictly decreases with
    // rank (the tail harmonic sum loses a positive term per step) and
    // observed counts are weakly decreasing by construction
    val sf = Relational.q81Bstick(spark, sfDir).collect()
      .groupBy(_.getString(0))
    assert(sf.nonEmpty)
    sf.foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(1))
      byRank.zip(byRank.tail).foreach { case (a, b) =>
        assert(a.getDouble(4) > b.getDouble(4), s"$a !> $b")
        assert(a.getLong(3) >= b.getLong(3), s"$a cnt < $b")
      }
    }
  }

  test("taxonomic distinctness: hand-computed planted tree, " +
       "brute-force pair cross-check, single-taxon NULL, corpus in " +
       "path-unit bounds") {
    import spark.implicits._
    import graft.operators.Relational
    // s: A,B sibling leaves under one size node (ω=1), C in another
    // brand (ω=4 to each); x = 1,1,2 →
    // Δ+ = (1+4+4)/3 = 3, Δ* = (1·1·1 + 1·2·4 + 1·2·4)/(1+2+2) = 3.4
    val ab = Seq(
      ("s", "m1", "b1", "t1", 1, 101L, 1L),
      ("s", "m1", "b1", "t1", 1, 102L, 1L),
      ("s", "m1", "b2", "t1", 1, 103L, 2L),
      ("solo", "m1", "b1", "t1", 1, 101L, 7L))
      .toDF("n_name", "p_mfgr", "p_brand", "p_type", "p_size",
        "p_partkey", "cnt")
    val got = Relational.taxondiveFromLeaves(ab).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("s").getLong(1) == 3L &&
      got("s").getDouble(2) == 3.0 && got("s").getDouble(3) == 3.4,
      got("s").toString)
    assert(got("solo").getLong(1) == 1L && got("solo").isNullAt(2) &&
      got("solo").isNullAt(3), got("solo").toString)
    // brute-force cross-check on a denser planted frame: enumerate
    // every pair, count separation levels, compare exactly
    val rows = for (i <- 0 until 12) yield
      (s"g", s"m${i % 2}", s"m${i % 2}|b${i % 4}", s"t${i % 3}",
        i % 5, 200L + i, (i % 3 + 1).toLong)
    val dense = rows.toDF("n_name", "p_mfgr", "p_brand", "p_type",
      "p_size", "p_partkey", "cnt")
    val d = Relational.taxondiveFromLeaves(dense).collect().head
    def omega(a: (String, String, String, Int), b: (String, String, String, Int)): Int =
      if (a._1 != b._1) 5 else if (a._2 != b._2) 4
      else if (a._3 != b._3) 3 else if (a._4 != b._4) 2 else 1
    val keyed = rows.map(r => ((r._2, r._3, r._4, r._5), r._7))
    val pairs = for {
      i <- keyed.indices; j <- keyed.indices if i < j
    } yield (omega(keyed(i)._1, keyed(j)._1), keyed(i)._2 * keyed(j)._2)
    // exact integer sums, ONE double division, HALF_UP round-6 — the
    // operator's arithmetic ((2a)/(2b) = a/b exactly in IEEE)
    def r6(num: Long, den: Long): Double =
      BigDecimal(num.toDouble / den.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d.getDouble(2) ==
      r6(pairs.map(_._1.toLong).sum, pairs.length.toLong), d.toString)
    assert(d.getDouble(3) ==
      r6(pairs.map(p => p._1 * p._2).sum, pairs.map(_._2).sum), d.toString)
    // sf corpus: ω lives on path units [1, 5]; so do both means
    val sf = Relational.q82Taxondive(spark, sfDir).collect()
    assert(sf.nonEmpty && sf.forall { r =>
      r.getDouble(2) >= 1.0 && r.getDouble(2) <= 5.0 &&
      r.getDouble(3) >= 1.0 && r.getDouble(3) <= 5.0 }, sf.mkString(";"))
  }

  test("Hill numbers: uniform panel hits S exactly at every order, " +
       "dominance orders the ladder, singleton group degenerates to 1") {
    import spark.implicits._
    import graft.operators.Relational
    // u4: 4 equally-common taxa — all Hill numbers = 4, J = 1;
    // dom: one taxon holds 97/100 — ⁰D > ¹D > ²D, J < 1;
    // one: a single taxon — H = 0, ¹D = ²D = 1, J undefined (NULL)
    val ab = Seq(
      ("u4", 1L, 1L), ("u4", 2L, 1L), ("u4", 3L, 1L), ("u4", 4L, 1L),
      ("dom", 1L, 97L), ("dom", 2L, 1L), ("dom", 3L, 1L), ("dom", 4L, 1L),
      ("one", 1L, 5L))
      .toDF("n_name", "taxon", "cnt")
    val got = Relational.hillFromCounts(ab).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toMap
    val u4 = got("u4")
    assert(u4._1 == 4L && u4._3 == 4.0 && u4._4 == 4.0 &&
      u4._5.contains(1.0), u4.toString)
    assert(math.abs(u4._2 - math.log(4.0)) < 1e-6, u4.toString)
    val dom = got("dom")
    assert(dom._1.toDouble > dom._3 && dom._3 > dom._4 &&
      dom._5.exists(_ < 1.0), dom.toString)
    val one = got("one")
    assert(one._1 == 1L && one._2 == 0.0 && one._3 == 1.0 &&
      one._4 == 1.0 && one._5.isEmpty, one.toString)
    // sf corpus: the ladder ⁰D ≥ ¹D ≥ ²D holds for every group
    // (Hill numbers are non-increasing in the order q), J ∈ (0, 1]
    val sf = Relational.q58HillNumbers(spark, sfDir).collect()
    assert(sf.nonEmpty)
    assert(sf.forall { r =>
      r.getLong(1).toDouble >= r.getDouble(3) - 1e-9 &&
      r.getDouble(3) >= r.getDouble(4) - 1e-9 &&
      r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0 + 1e-9 },
      sf.mkString(";"))
  }

  test("Fisher alpha: fixed-point limit satisfies the defining " +
       "equation, predicts singletons, NULL on the all-singleton " +
       "degenerate") {
    import spark.implicits._
    import graft.operators.Relational
    // fit: S=25 taxa over N=2400 individuals (23 filler taxa carry the
    // bulk) — the map contracts fast; the limit must satisfy
    // S = α·ln(1 + N/α) to well under the round-6 grid.
    // deg: S = N (all singletons) — no finite α; NULL end-to-end.
    val fit = (1L to 23L).map(i => ("fit", i, 103L)) ++
      Seq(("fit", 24L, 15L), ("fit", 25L, 16L)) // N = 23*103 + 31 = 2400
    val deg = Seq(("deg", 1L, 1L), ("deg", 2L, 1L), ("deg", 3L, 1L))
    val ab = (fit ++ deg).toDF("n_name", "taxon", "cnt")
    val got = Relational.fisherAlphaFromCounts(ab).collect()
      .map(r => r.getString(0) -> r).toMap
    val f = got("fit")
    assert(f.getLong(1) == 25L && f.getLong(2) == 2400L)
    val alpha = f.getDouble(4)
    assert(math.abs(25.0 - alpha * math.log1p(2400.0 / alpha)) < 1e-3,
      s"defining equation violated at alpha=$alpha")
    val x = f.getDouble(5)
    assert(math.abs(x - 2400.0 / (2400.0 + alpha)) < 1e-5, f.toString)
    assert(math.abs(f.getDouble(6) - alpha * x) < 1e-4, f.toString)
    val d = got("deg")
    assert(d.isNullAt(4) && d.isNullAt(5) && d.isNullAt(6), d.toString)
    // sf corpus: α finite and positive everywhere, defining equation
    // holds on every group to the same tolerance
    val sf = Relational.q59FisherAlpha(spark, sfDir).collect()
    assert(sf.nonEmpty)
    sf.foreach { r =>
      val a = r.getDouble(4)
      val s = r.getLong(1).toDouble
      assert(a > 0.0 &&
        math.abs(s - a * math.log1p(r.getLong(2).toDouble / a)) < 1e-3,
        r.toString)
    }
  }

  test("Raup-Crick: exact hypergeometric tails on planted panels — " +
       "identical, overlapping, and disjoint sample pairs") {
    import spark.implicits._
    import graft.operators.Relational
    // pool = 10 taxa. sa = {1..4}, sb = {3..6}, sc = {5..10},
    // sd = {1..4} (sa's twin)
    val pres = (
      (1L to 4L).map(t => ("sa", t)) ++ (3L to 6L).map(t => ("sb", t)) ++
      (5L to 10L).map(t => ("sc", t)) ++ (1L to 4L).map(t => ("sd", t)))
      .toDF("n_name", "taxon")
    val got = Relational.raupCrickFromPresence(pres).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // (sa, sb): Hyp(10,4,4), s=2: (6·15 + 4·6 + 1)/210 = 115/210
    assert(got(("sa", "sb")) == ((4L, 4L, 2L, r6(115.0 / 210.0))),
      got(("sa", "sb")).toString)
    // (sa, sd): identical — s=4: 1/210
    assert(got(("sa", "sd")) == ((4L, 4L, 4L, r6(1.0 / 210.0))),
      got(("sa", "sd")).toString)
    // (sa, sc): disjoint — s=0: the tail is the whole mass
    assert(got(("sa", "sc")) == ((4L, 6L, 0L, 1.0)),
      got(("sa", "sc")).toString)
    // (sb, sc): Hyp(10,4,6), s=2: 1 − (1 + 24)/210 = 185/210
    assert(got(("sb", "sc")) == ((4L, 6L, 2L, r6(185.0 / 210.0))),
      got(("sb", "sc")).toString)
    // sf corpus: probabilities in (0, 1], shared obeys the
    // inclusion-exclusion floor on every pair
    val sf = Relational.q60RaupCrick(spark, sfDir).collect()
    assert(sf.length == 300)
    val stot = 2000L
    assert(sf.forall { r =>
      val p = r.getDouble(5)
      p > 0.0 && p <= 1.0 &&
      r.getLong(4) >= r.getLong(2) + r.getLong(3) - stot }, "corpus gate")
  }

  test("attribution: first/last touch split, inclusive lookback " +
       "boundary, post-purchase and stale touches excluded") {
    import spark.implicits._
    import graft.operators.Events
    val hourUs = 3600L * 1000000L
    val dayUs = 24L * hourUs
    def ts(us: Long) = { val t = new java.sql.Timestamp(0L); t.setTime(us / 1000L); t }
    val base = 10L * dayUs
    val rows = Seq(
      // user 1: view then click then purchase — first=view, last=click
      (101L, ts(base), 1L, "view", 0.0, "{}"),
      (102L, ts(base + hourUs), 1L, "click", 0.0, "{}"),
      (103L, ts(base + 2 * hourUs), 1L, "purchase", 5.0, "{}"),
      // user 2: click 4 days before purchase — outside the 3-day
      // lookback, no credit
      (201L, ts(base), 2L, "click", 0.0, "{}"),
      (202L, ts(base + 4 * dayUs), 2L, "purchase", 5.0, "{}"),
      // user 3: one touch EXACTLY lookback days before, one at the
      // purchase µs — both inclusive
      (301L, ts(base), 3L, "click", 0.0, "{}"),
      (302L, ts(base + 3 * dayUs), 3L, "view", 0.0, "{}"),
      (303L, ts(base + 3 * dayUs), 3L, "purchase", 5.0, "{}"),
      // user 4: touch AFTER the purchase — no credit
      (401L, ts(base + hourUs), 4L, "purchase", 5.0, "{}"),
      (402L, ts(base + 2 * hourUs), 4L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.attribution(rows).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(2)).map(_.toString),
        Option(r.getString(3)), Option(r.get(4)).map(_.toString),
        Option(r.getString(5)), r.getLong(6)))).toMap
    assert(got(1L) == ((Some("101"), Some("view"), Some("102"),
      Some("click"), 2L)), got(1L).toString)
    assert(got(2L) == ((None, None, None, None, 0L)), got(2L).toString)
    assert(got(3L) == ((Some("301"), Some("click"), Some("302"),
      Some("view"), 2L)), got(3L).toString)
    assert(got(4L) == ((None, None, None, None, 0L)), got(4L).toString)
    // sf corpus: every purchase appears exactly once; touch ids when
    // present are real click/view event ids
    val ev = Tables.load(spark, sfDir, "events")
    val sf = Events.attribution(spark, sfDir)
    assert(sf.count() ==
      ev.filter(col("event_type") === "purchase").count())
    val touchIds = ev.filter(col("event_type").isin("click", "view"))
      .select(col("event_id")).as[Long].collect().toSet
    assert(sf.filter(col("first_tid").isNotNull).select(col("first_tid"))
      .as[Long].collect().forall(touchIds.contains))
  }

  test("EWMA: flat series holds the level exactly with no alarms; a " +
       "spike and a zero-filled gap day both alarm") {
    import spark.implicits._
    import graft.operators.Events
    val dayUs = 86400L * 1000000L
    def mkEvents(series: Seq[(String, Int, Int)]) = {
      val rows = for {
        ((tp, d, cnt), gi) <- series.zipWithIndex
        i <- 0 until cnt
      } yield {
        val t = new java.sql.Timestamp(0L)
        t.setTime((d.toLong * dayUs + i.toLong * 1000000L) / 1000L)
        ((gi * 1000 + i).toLong, t, 1L, tp, 0.0, "{}")
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }
    // flat: the normalized weight ladder reproduces 10.0 EXACTLY
    // (num = 10·Σw, den = Σw) on every day including the ramp-in
    val flat = (0 until 20).map(d => ("flat", d, 10))
    // spike: day 10 jumps to 100 — dev = 90 > 3√10
    val spike = (0 until 10).map(d => ("spike", d, 10)) :+ (("spike", 10, 100))
    // gap: day 5 has NO events — the calendar fill makes it a real
    // zero day and |0 − 10| = 10 > 3√10 ≈ 9.49 alarms
    val gap = (0 until 11).filter(_ != 5).map(d => ("gap", d, 10))
    val got = Events.ewma(mkEvents(flat ++ spike ++ gap)).collect()
    val byType = got.groupBy(_.getString(0))
    byType("flat").foreach { r =>
      assert(r.getDouble(3) == 10.0, s"flat level drifted: $r")
      assert(!r.getBoolean(5), s"flat alarmed: $r") }
    val spikeDay = byType("spike").find(_.getString(1) == "1970-01-11").get
    assert(spikeDay.getLong(2) == 100L && spikeDay.getDouble(4) == 90.0
      && spikeDay.getBoolean(5), spikeDay.toString)
    val gapDay = byType("gap").find(_.getString(1) == "1970-01-06").get
    assert(gapDay.getLong(2) == 0L && gapDay.getDouble(4) == -10.0
      && gapDay.getBoolean(5), gapDay.toString)
    // the day after the gap sees a lowered level, not a broken ladder
    val after = byType("gap").find(_.getString(1) == "1970-01-07").get
    assert(after.getDouble(3) < 10.0 && after.getDouble(3) > 5.0,
      after.toString)
  }

  test("ACF: a pure weekly rhythm lands exactly 0.75/0.5 at lags 7/14 " +
       "with a negative lag-1, a constant series is NULL, corpus sane") {
    import spark.implicits._
    import graft.operators.Events
    val dayUs = 86400L * 1000000L
    def mkEvents(series: Seq[(String, Int, Int)]) = {
      val rows = for {
        ((tp, d, cnt), gi) <- series.zipWithIndex
        i <- 0 until cnt
      } yield {
        val t = new java.sql.Timestamp(0L)
        t.setTime((d.toLong * dayUs + i.toLong * 1000000L) / 1000L)
        ((gi * 1000 + i).toLong, t, 1L, tp, 0.0, "{}")
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }
    // weekly: 28 days, 10 events every 7th day, 1 otherwise (every day
    // has events, so the span is the full 4 weeks). The truncated
    // lag-k sum keeps (4 − k/7)/4 of the aligned weeks and the
    // per-product round-12 factors cancel in the ratio EXACTLY:
    // acf(7) = 3/4 and acf(14) = 2/4; lag 1 pairs spikes with troughs
    // → strictly negative
    val weekly = (0 until 28)
      .map(d => ("weekly", d, if (d % 7 == 0) 10 else 1))
    // flat: zero variance → den = 0 → NULL acf at every lag
    val flat = (0 until 28).map(d => ("flat", d, 5))
    val got = Events.acf(mkEvents(weekly ++ flat)).collect()
    val wk = got.filter(_.getString(0) == "weekly")
      .map(r => r.getInt(1) -> r).toMap
    assert(wk(7).getDouble(3) == 0.75, s"lag-7: ${wk(7)}")
    assert(wk(14).getDouble(3) == 0.5, s"lag-14: ${wk(14)}")
    assert(wk(1).getDouble(3) < 0.0, s"lag-1 not negative: ${wk(1)}")
    assert(wk.values.forall(_.getLong(2) == 28L), "zero-filled span")
    val fl = got.filter(_.getString(0) == "flat")
    assert(fl.nonEmpty && fl.forall(_.isNullAt(3)),
      s"flat series acf not NULL: ${fl.mkString(",")}")
    // sf corpus: every (type, lag) within |acf| <= 1 (Cauchy–Schwarz
    // bounds the truncated numerator by the full denominator)
    val sf = Events.acf(spark, sfDir).collect()
    assert(sf.nonEmpty, "empty corpus ACF")
    assert(sf.forall(r => r.isNullAt(3) ||
      (r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0)),
      "ACF out of [-1, 1]")
    val lags = sf.map(_.getInt(1)).distinct.sorted
    assert(lags.toSeq == Events.AcfLags.sorted, s"lag grid: ${lags.toSeq}")
  }

  test("Decompose: a pure weekly rhythm leaves zero residual with the " +
       "exact seasonal pattern, a spike alarms only its own day") {
    import spark.implicits._
    import graft.operators.Events
    val dayUs = 86400L * 1000000L
    def mkEvents(series: Seq[(String, Int, Int)]) = {
      val rows = for {
        ((tp, d, cnt), gi) <- series.zipWithIndex
        i <- 0 until cnt
      } yield {
        val t = new java.sql.Timestamp(0L)
        t.setTime((d.toLong * dayUs + i.toLong * 1000000L) / 1000L)
        ((gi * 1000 + i).toLong, t, 1L, tp, 0.0, "{}")
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }
    // clean: 10 on day%7==0, 3 otherwise over 28 days → interior trend
    // = 28/7 = 4 exactly, seasonal = {+6, −1}, residual = 0 everywhere
    val clean = (0 until 28).map(d => ("clean", d, if (d % 7 == 0) 10 else 3))
    // spiky: same rhythm, day 14 erupts to 100
    val spiky = (0 until 28).map(d =>
      ("spiky", d, if (d == 14) 100 else if (d % 7 == 0) 10 else 3))
    val got = Events.decompose(mkEvents(clean ++ spiky)).collect()
    val cl = got.filter(_.getString(0) == "clean")
    assert(cl.length == 28, s"clean rows: ${cl.length}")
    assert(cl.count(_.isNullAt(3)) == 6, "edge days lack trend")
    val interior = cl.filter(!_.isNullAt(3))
    assert(interior.forall(_.getDouble(3) == 4.0), "clean trend != 4")
    assert(interior.forall(r => r.getDouble(4) == (if (r.getLong(2) == 10L)
      6.0 else -1.0)), "clean seasonal pattern")
    assert(interior.forall(r => r.getDouble(5) == 0.0 && !r.getBoolean(6)),
      "clean residual not zero / alarmed")
    val sp = got.filter(_.getString(0) == "spiky")
    val spikeDay = sp.find(_.getString(1) == "1970-01-15").get
    assert(spikeDay.getBoolean(6), s"spike day not alarmed: $spikeDay")
    assert(sp.filter(!_.isNullAt(5)).forall(r =>
      r.getString(1) == "1970-01-15" || !r.getBoolean(6)),
      s"non-spike day alarmed: ${sp.mkString(",")}")
    // corpus: every type carries exactly 6 trendless edge days and the
    // additive identity holds on the round-6 grid where defined
    val sf = Events.decompose(spark, sfDir).collect()
    val byType = sf.groupBy(_.getString(0))
    assert(byType.values.forall(_.count(_.isNullAt(3)) == 6),
      "corpus edge-day census")
    assert(sf.filter(!_.isNullAt(5)).forall(r =>
      math.abs(r.getLong(2).toDouble - r.getDouble(3) - r.getDouble(4)
        - r.getDouble(5)) < 2e-6), "additive identity broken")
  }

  test("e32 STL: rhythm-only decomposition matches e31 exactly where " +
       "both define trend, loess covers EVERY day, a spike alarms " +
       "only itself") {
    import spark.implicits._
    import graft.operators.Events
    val dayUs = 86400L * 1000000L
    def mkEvents(series: Seq[(String, Int, Int)]) = {
      val rows = for {
        ((tp, d, cnt), gi) <- series.zipWithIndex
        i <- 0 until cnt
      } yield {
        val t = new java.sql.Timestamp(0L)
        t.setTime((d.toLong * dayUs + i.toLong * 1000000L) / 1000L)
        ((gi * 1000 + i).toLong, t, 1L, tp, 0.0, "{}")
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }
    // rhythm-only: deseasonalized series is the CONSTANT 4, and a
    // degree-1 loess of a constant returns it exactly (the numerator
    // sw·swxy − swx·swy cancels bitwise because every product is the
    // same real value rounded once) — so e32's trend is 4.0 on ALL 28
    // days where e31's MA left 6 edge days NULL
    val clean = (0 until 28).map(d => ("clean", d, if (d % 7 == 0) 10 else 3))
    val spiky = (0 until 28).map(d =>
      ("spiky", d, if (d == 14) 100 else if (d % 7 == 0) 10 else 3))
    val ev = mkEvents(clean ++ spiky)
    val got = Events.stlDecompose(ev).collect()
    val cl = got.filter(_.getString(0) == "clean")
    assert(cl.length == 28 && cl.forall(!_.isNullAt(3)),
      "loess trend must exist on every day")
    assert(cl.forall(_.getDouble(3) == 4.0), "clean trend != 4")
    assert(cl.forall(r => r.getDouble(4) == (if (r.getLong(2) == 10L)
      6.0 else -1.0)), "clean seasonal pattern")
    assert(cl.forall(r => r.getDouble(5) == 0.0 && !r.getBoolean(6)),
      "clean residual not zero / alarmed")
    // PARITY GATE vs e31 (the r16 verdict's done-criterion): on the
    // rhythm-only fixture the two decompositions agree BITWISE on
    // seasonal everywhere and on trend/residual wherever e31 defines
    // them
    val e31 = Events.decompose(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    got.foreach { r =>
      val o = e31((r.getString(0), r.getString(1)))
      assert(r.getDouble(4) == o.getDouble(4),
        s"seasonal parity broken at $r vs $o")
      if (r.getString(0) == "clean" && !o.isNullAt(3)) {
        assert(r.getDouble(3) == o.getDouble(3) &&
          r.getDouble(5) == o.getDouble(5),
          s"rhythm-only trend/residual parity broken at $r vs $o")
      }
    }
    // the spike alarms itself and nothing else (the loess trend
    // spreads some of the spike onto neighbours, but well under the
    // 3-sigma gate the spike itself inflates)
    val sp = got.filter(_.getString(0) == "spiky")
    assert(sp.find(_.getString(1) == "1970-01-15").get.getBoolean(6),
      "spike day not alarmed")
    assert(sp.count(_.getBoolean(6)) == 1,
      s"non-spike day alarmed: ${sp.filter(_.getBoolean(6)).mkString(",")}")
    // corpus: trend on every day, additive identity on the round-6
    // grid wherever the residual is defined
    val sf = Events.stlDecompose(spark, sfDir).collect()
    assert(sf.nonEmpty && sf.forall(!_.isNullAt(3)),
      "corpus loess trend must cover every day")
    assert(sf.filter(!_.isNullAt(5)).forall(r =>
      math.abs(r.getLong(2).toDouble - r.getDouble(3) - r.getDouble(4)
        - r.getDouble(5)) < 2e-6), "additive identity broken")
  }

  test("e33 MASE: a weekly rhythm scores 0, a flat series NULLs, a " +
       "linear trend lands exactly at 7") {
    import spark.implicits._
    import graft.operators.Events
    val dayUs = 86400L * 1000000L
    def mkEvents(series: Seq[(String, Int, Int)]) = {
      val rows = for {
        ((tp, d, cnt), gi) <- series.zipWithIndex
        i <- 0 until cnt
      } yield {
        val t = new java.sql.Timestamp(0L)
        t.setTime((d.toLong * dayUs + i.toLong * 1000000L) / 1000L)
        ((gi * 1000 + i).toLong, t, 1L, tp, 0.0, "{}")
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }
    // rhythm: the lag-7 forecast is exact (MASE 0); the lag-1 naive
    // pays the rhythm. flat: both MAEs are 0 → MASE NULL (not 0/0).
    // trend +1/day: |e7| = 7 and |e1| = 1 on every day → MASE = 7.
    val rows = mkEvents(
      (0 until 28).map(d => ("rhythm", d, if (d % 7 == 0) 10 else 3)) ++
      (0 until 28).map(d => ("flat", d, 5)) ++
      (0 until 28).map(d => ("trend", d, 3 + d)))
    val got = Events.mase(rows).collect()
      .map(r => r.getString(0) -> r).toMap
    val rh = got("rhythm")
    assert(rh.getLong(1) == 21L && rh.getDouble(2) == 0.0 &&
      rh.getDouble(3) > 0.0 && rh.getDouble(4) == 0.0, s"rhythm: $rh")
    val fl = got("flat")
    assert(fl.getDouble(2) == 0.0 && fl.getDouble(3) == 0.0 &&
      fl.isNullAt(4), s"flat: $fl")
    val tr = got("trend")
    assert(tr.getDouble(2) == 7.0 && tr.getDouble(3) == 1.0 &&
      tr.getDouble(4) == 7.0, s"trend: $tr")
    // corpus: MASE defined and positive for every type (no flat
    // series in the synthetic events), n_days consistent
    val sf = Events.e33Mase(spark, sfDir).collect()
    assert(sf.nonEmpty && sf.forall(r => !r.isNullAt(4) &&
      r.getDouble(4) > 0.0 && r.getLong(1) > 0L), "corpus MASE sanity")
  }

  test("Holt-Winters: a pure weekly rhythm forecasts itself exactly, " +
       "a linear trend is tracked, a break day alarms, short series " +
       "are excluded") {
    import spark.implicits._
    import graft.operators.Events
    val dayUs = 86400L * 1000000L
    def mkEvents(series: Seq[(String, Int, Int)]) = {
      val rows = for {
        ((tp, d, cnt), gi) <- series.zipWithIndex
        i <- 0 until cnt
      } yield {
        val t = new java.sql.Timestamp(0L)
        t.setTime((d.toLong * dayUs + i.toLong * 1000000L) / 1000L)
        ((gi * 1000 + i).toLong, t, 1L, tp, 0.0, "{}")
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }
    // rhythm: weekly pattern 10,20,30,40,30,20,10 repeated 4 weeks —
    // week means equal ⇒ b0 = 0, s0 = exact deviations, and every
    // recurrence reproduces the pattern: err = 0 on every emitted day
    val pat = Seq(10, 20, 30, 40, 30, 20, 10)
    val rhythm = (0 until 28).map(d => ("rhythm", d, pat(d % 7)))
    // trend: y_d = 10 + 2d — b0 = 2 exactly, but the init ALSO reads
    // the within-week ramp into the seasonal slots (s0 = −6..+6), so
    // forecasts are close, converging, and never alarming — not exact
    val trend = (0 until 21).map(d => ("trend", d, 10 + 2 * d))
    // break: rhythm for 3 weeks, then day 17 collapses to 1
    val broke = (0 until 21).map(d =>
      ("broke", d, if (d == 17) 1 else pat(d % 7)))
    // short: 10 days < 15 → excluded entirely
    val short = (0 until 10).map(d => ("short", d, 5))
    val got = Events.holtWinters(
      mkEvents(rhythm ++ trend ++ broke ++ short)).collect()
    val byType = got.groupBy(_.getString(0))
    assert(!byType.contains("short"), "short series not excluded")
    // emission starts on day 15 exactly
    assert(byType("rhythm").map(_.getString(1)).min == "1970-01-15")
    byType("rhythm").foreach { r =>
      assert(r.getDouble(4) == 0.0 && !r.getBoolean(5),
        s"rhythm err nonzero: $r") }
    val tr = byType("trend").sortBy(_.getString(1))
    tr.foreach { r =>
      assert(math.abs(r.getDouble(4)) < 10.0 && !r.getBoolean(5),
        s"trend err out of band: $r") }
    assert(math.abs(tr.last.getDouble(4)) < math.abs(tr.head.getDouble(4)),
      s"trend error not shrinking: ${tr.head} .. ${tr.last}")
    val breakDay = byType("broke").find(_.getString(1) == "1970-01-18").get
    assert(breakDay.getLong(2) == 1L && breakDay.getBoolean(5),
      breakDay.toString)
    // corpus: rows for every type, yhat finite, err = cnt - yhat
    val sf = Events.holtWinters(
      graft.Tables.load(spark, sfDir, "events")).collect()
    assert(sf.nonEmpty && sf.forall(r => !r.getDouble(3).isNaN))
  }
}
