package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scale-mechanism specs: salting preserves semantics; bucketed
  * co-located joins avoid the shuffle entirely. */
class ScaleSpec extends SparkSpec {

  test("assert-carrying iterative operators complete at the BENCH scale (sf0.1)") {
    // The driver verifies correctness at the 500-doc scale but benches
    // at sf0.1 (5000 docs), so any data-size-dependent behavior —
    // iteration budgets, convergence caps, thresholds — is invisible
    // to CORRECTNESS: r10's g5_kcore shipped green and then failed its
    // own convergence assert in every sf0.1 run. Run the construction
    // of every operator that carries a convergence/runaway require at
    // the bench scale, so scale-dependent refusal fails the SUITE.
    val sf01 = "/root/testdata/sf0.1"
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    noop(graft.operators.Graph.g2Components(spark, sf01)) // min-label fixpoint
    noop(graft.operators.Graph.g5Kcore(spark, sf01))      // h-index fixpoint
    noop(graft.operators.Graph.g8Bfs(spark, sf01))        // min-plus fixpoint
    noop(SparkEntry.queries("d7_dedup_pipeline")(spark, sf01)) // label-prop maxIter
    noop(graft.operators.Graph.g19Scc(spark, sf01))       // SCC peel cap (r16)
  }

  test("NN-Descent survives a degenerate all-identical embedding corpus " +
       "(every cosine ties at 1.0 — the reverse-cap/tie-break torture case)") {
    // a hub vector appearing in EVERYONE's kNN is the quadratic risk
    // the reverse cap exists for; the extreme form is all-identical
    // vectors, where every candidate scores 1.0 and only the (score,
    // id) tie-break keeps the selection deterministic
    import spark.implicits._
    val e = (0L until 60L).map(i => (i, Array.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
    val g = graft.operators.Similarity.knnGraph(e, 5, 2).collect()
    assert(g.length == 60 * 5, s"not k-regular: ${g.length}")
    // ties broken on the smaller id: every node's neighbor list is the
    // 5 smallest OTHER ids it ever saw as a candidate — in particular
    // all scores are exactly 1.0 and ranks are dense
    assert(g.forall(_.getDouble(3) == 1.0), "tie scores drifted")
    assert(g.forall(r => r.getLong(0) != r.getLong(2)), "self edge")
    val byV = g.groupBy(_.getLong(0))
    assert(byV.forall(_._2.map(_.getInt(1)).sorted.toSeq == (1 to 5)),
      "ranks not dense under total ties")
    // the search half on the same degenerate corpus: completes, emits
    // dense ranks, never a self hit
    val out = graft.operators.Similarity.graphSearch(e, 5, 2, 5, 3).collect()
    assert(out.nonEmpty && out.forall(r => r.getLong(0) != r.getLong(1)),
      "graph search broke on the tie corpus")
  }

  test("AQE splits a deliberately hot join key (OptimizeSkewedJoin " +
       "exercised end to end)") {
    // The linear joins the dedup family leans on at scale (d13's
    // count re-attach, d15's verify legs) are documented as "AQE
    // skew-split applies" — but no spec ever forced a skewed exchange
    // through OptimizeSkewedJoin (r11 verdict #3). Do it for real:
    // one key carries 1e5 padded rows (~12 MB in one hash partition
    // vs a ~4 KB median), the skew thresholds are lowered to
    // local-box sizes, broadcast is disabled so the join is a
    // sort-merge over both shuffles, and the FINAL adaptive plan must
    // show the skew-split join — the same mechanism that splits a
    // hot-key task at 100 TB.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1MB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // the pad must be per-row unique: skew detection reads the
      // COMPRESSED shuffle block sizes, and a constant pad lz4's to
      // nothing (the first cut of this spec never crossed the
      // threshold for exactly that reason)
      val pad = sha2(concat(col("id").cast("string"), lit("p")), 512)
      val left = spark.range(0, 100000)
        .select(lit(0L).as("k"), pad.as("pad"))
        .unionByName(spark.range(1, 1001)
          .select(col("id").as("k"), pad.as("pad")))
      val right = spark.range(0, 1001).select(col("id").as("k"),
        (col("id") % 5).as("vb"))
      val joined = left.join(right, "k")
      val n = joined.collect().length
      assert(n == 101000, s"skewed join lost rows: $n")
      val fin = joined.queryExecution.executedPlan.toString
      assert(fin.contains("skew=true"),
        s"final adaptive plan shows no skew-split join:\n${fin.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join preserves inner-join semantics exactly") {
    val l = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val p = Tables.load(spark, sfDir, "part").select("p_partkey", "p_brand")
    val plain = l.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedJoin(l, p, "l_partkey", "p_partkey")
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(plain == salted, "salting changed join cardinalities")
  }

  test("hot-band cap keeps an all-identical corpus linear, invariant elsewhere") {
    import spark.implicits._
    // 2000 identical docs share every band bucket: uncapped that is
    // 16 bands × 2000²/2 = 32M clique pairs; capped it is a star of
    // 1999 edges per band. The run must finish fast AND still flag
    // every document as a duplicate candidate.
    val identical = (0L until 2000L).map(i => (i, "same text repeated for every single document here"))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val res = graft.operators.Dedup.minhashLsh(identical, maxBucket = 100)
      .agg(count(when(col("n_dup_candidates") > 0, 1)).as("flagged"),
        max("n_dup_candidates").as("mx"))
      .head()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(res.getLong(0) == 2000L, s"not all docs flagged: $res")
    // star topology: the representative pairs with everyone, members with 1
    assert(res.getLong(1) == 1999L, s"expected star rep degree 1999, got $res")
    assert(secs < 60, f"capped pathological run took $secs%.1f s")
    // the capped pipeline still clusters the whole bucket transitively
    val clusters = graft.operators.Dedup.dedupPipeline(identical, 0.5, maxBucket = 100)
      .agg(countDistinct("cluster_id").as("n"), count(when(col("keep"), 1)).as("kept"))
      .head()
    assert(clusters.getLong(0) == 1L && clusters.getLong(1) == 1L,
      s"star edges failed to form one cluster: $clusters")
    // and a 1000-member cap (the decision-pipeline default) must not
    // change results on normal data, whose buckets sit far below it —
    // i.e. the capped and exact/uncapped (diagnostic default) forms
    // agree whenever the cap doesn't trigger
    val docs = Tables.load(spark, sfDir, "documents")
    val a = graft.operators.Dedup.minhashLsh(docs).collect()
    val b = graft.operators.Dedup.minhashLsh(docs, maxBucket = 1000).collect()
    assert(a.sameElements(b), "bucket cap changed results on normal data")
  }

  test("d17 truth-index df-cut keeps an all-identical corpus linear " +
       "and surfaces the capped-bucket count loudly") {
    import spark.implicits._
    // The d17 truth index pairs every two docs sharing a shingle hash
    // — 2000 identical docs would enumerate 2000²/2 pairs per shingle.
    // With the df-cut engaged (the d2/d10 hot-bucket pattern), the run
    // must finish fast, and the output row must carry the number of
    // dropped shingle buckets instead of hiding the truncation.
    val identical = (0L until 2000L)
      .map(i => (i, "same text repeated for every single document here"))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val row = graft.operators.Dedup
      .lshRecall(identical, maxBucket = 100, maxShingleDf = 50)
      .head()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 120, f"capped d17 run took $secs%.1f s")
    // every shingle of the identical corpus has df = 2000 > 50: all
    // buckets capped (6 distinct 3-gram shingles of an 8-word doc),
    // truth lower-bounds to empty, recall degenerates to 1.0 by the
    // n_truth = 0 convention — and the capped count says WHY
    assert(row.getAs[Long]("n_capped_shingles") == 6L, row.toString)
    assert(row.getAs[Long]("n_truth") == 0L, row.toString)
    assert(row.getAs[Double]("recall") == 1.0, row.toString)
    // candidates stay the production star-capped path: nonzero
    assert(row.getAs[Long]("n_candidates") > 0L, row.toString)
    // and the cut must be invariant on normal data whose shingle df
    // sits below the bound — capped vs uncapped agree bit-for-bit
    val docs = Tables.load(spark, sfDir, "documents")
    val a = graft.operators.Dedup.lshRecall(docs).collect()
    val b = graft.operators.Dedup
      .lshRecall(docs, maxShingleDf = 1000000L).collect()
    assert(a.sameElements(b), "df-cut changed results on normal data")
  }

  test("d18 containment's df-cut keeps an all-identical corpus linear") {
    import spark.implicits._
    // Uncapped, 2000 identical docs would pair quadratically through
    // the inverted index (every shingle shared by every doc). With
    // the df-cut engaged the run must finish fast; the capped pairs
    // are dropped LOUDLY via the n_capped_shingles column semantics
    // (here: every shingle capped ⇒ no pairs survive at all).
    val identical = (0L until 2000L)
      .map(i => (i, "same text repeated for every single document here"))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val rows = graft.operators.Dedup
      .containment(identical, maxShingleDf = 50L).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(rows.isEmpty, s"capped flood still paired: ${rows.length}")
    assert(secs < 120, f"capped d18 flood took $secs%.1f s")
    // and the cut is invariant on normal data below the bound
    val docs = Tables.load(spark, sfDir, "documents")
    val a = graft.operators.Dedup.containment(docs).collect()
    val b = graft.operators.Dedup
      .containment(docs, maxShingleDf = 1000000L).collect()
    assert(a.sameElements(b), "df-cut changed results on normal data")
  }

  test("simhash fingerprint compression keeps an identical-doc flood linear") {
    import spark.implicits._
    // 2000 identical docs share ONE 60-bit fingerprint. Pre-compression
    // that bucket emitted 2000²/2 ≈ 2M clique pairs (the r3 16 s
    // regression at sf0.1 was exactly this shape); compressed, the
    // flood is a single (simhash, m=2000) row, the fingerprint-level
    // pair list stays tiny, and every doc still gets its EXACT
    // uncapped-clique count of 1999 Hamming-0 twins.
    val flood = (0L until 2000L).map(i => (i, "same text repeated for every single document here")) ++
      (2000L until 2005L).map(i => (i, s"unique filler document number $i with distinct words"))
    val docs = flood.toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      graft.GraftFunctions.simhashBits(
        transform(split(col("text"), " "),
          w => graft.GraftFunctions.polyHash(w)), 60).as("simhash"))
    val fp = sh.groupBy("simhash").agg(count(lit(1)).as("m"))
    val nFp = fp.count()
    assert(nFp <= 6L, s"expected ≤6 distinct fingerprints, got $nFp")
    // pair cost is bounded by distinct-fingerprint pairs, not doc pairs
    val fpPairs = graft.operators.Dedup.simhashFpPairs(fp, Int.MaxValue).count()
    assert(fpPairs <= nFp * (nFp - 1) / 2,
      s"fingerprint pair list not compressed: $fpPairs pairs from $nFp fingerprints")
    val res = graft.operators.Dedup.simhash(docs)
    val floodCounts = res.filter(col("doc_id") < 2000).select("n_near")
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(floodCounts == Seq(1999L),
      s"flood docs must each count exactly their 1999 twins: $floodCounts")
  }

  test("bucketed tables join with no exchange on the join key") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(wh.contains("graft"), s"unexpected warehouse dir $wh")
    val l = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
    l.write.mode("overwrite").bucketBy(4, "l_orderkey").saveAsTable("li_bkt")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").saveAsTable("or_bkt")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bkt")
        .join(spark.table("or_bkt"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join still shuffles the fact side:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("blocked PCoA equals single-row at n=60 synthetic samples") {
    // beyond the 25-nation corpus: 60 samples placed deterministically
    // on a 2-D grid, euclidean dissimilarity scaled into [0,1] — the
    // two forms must stay bit-identical at a size where the matrix is
    // 3600 triples (ids, rm, vector still broadcast-bounded)
    import spark.implicits._
    val n = 60
    val pts = (0 until n).map { i =>
      (f"s$i%03d", (i * 37 % n).toDouble, (i * 53 % n).toDouble)
    }
    val pairs = (for {
      (a, ax, ay) <- pts; (b, bx, by) <- pts if a < b
    } yield {
      val d = math.sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by))
      (a, b, d / (n * math.sqrt(2.0)))
    }).toDF("sample_a", "sample_b", "bray_curtis")
    val single = graft.operators.Ordination.pcoa(pairs, iters = 5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val blocked = graft.operators.Ordination.pcoaBlocked(pairs, iters = 5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(single.length == n)
    assert(blocked.toSeq == single.toSeq,
      s"forms diverge at n=$n: ${blocked.toSeq.diff(single.toSeq).take(3)}")
  }

  test("pcoaAuto picks the form by sample count and stays exact on both sides") {
    // r6 verdict ask #6: one entry point, threshold-switched. 60
    // synthetic samples: under the default 2000-sample bound the
    // single-row form runs; forcing the bound to 10 must route to the
    // blocked form — visibly (distributed mat-vec ⇒ strictly more
    // exchanges in the plan) and bit-identically.
    import spark.implicits._
    val n = 60
    val pts = (0 until n).map { i =>
      (f"s$i%03d", (i * 37 % n).toDouble, (i * 53 % n).toDouble)
    }
    val pairs = (for {
      (a, ax, ay) <- pts; (b, bx, by) <- pts if a < b
    } yield {
      val d = math.sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by))
      (a, b, d / (n * math.sqrt(2.0)))
    }).toDF("sample_a", "sample_b", "bray_curtis")
    assert(graft.operators.Ordination.useSingleRow(60))
    assert(!graft.operators.Ordination.useSingleRow(60, maxSingleRow = 10))
    assert(!graft.operators.Ordination.useSingleRow(2001))
    val viaSingle = graft.operators.Ordination.pcoaAuto(pairs, iters = 5)
    val viaBlocked = graft.operators.Ordination.pcoaAuto(pairs, iters = 5,
      maxSingleRow = 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val a = rows(viaSingle)
    val b = rows(viaBlocked)
    assert(a.length == n && a == b, "auto forms diverge")
    def exchanges(df: org.apache.spark.sql.DataFrame) =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString()).size
    assert(exchanges(viaBlocked) > exchanges(viaSingle),
      "threshold=10 did not route to the distributed form")
  }

  test("PCoA convergence is gated by an independent local eigensolve, not self-agreement") {
    // ADVICE r6: the iteration count was a determinism contract with
    // the oracle, but convergence was assumed, not gated — and the r7
    // audit showed Iters=12 left residuals at 1e-3 (axes wrong in the
    // 2nd decimal). Gate it INDEPENDENTLY: rebuild the centered Gram
    // matrix locally in plain Scala from the same dissimilarity frame,
    // run the identical max-abs power recursion, and require
    //   (a) per-axis residual ‖B_a v − λ v‖∞ / λ₁ < 1e-5 at Iters,
    //   (b) the engine's published axes within 1e-4 of a 200-iteration
    //       reference solve (effectively exact for these spectra),
    //   (c) the negative control: 12 iterations FAILS the residual bar
    //       — proving the gate can reject an unconverged count.
    val ord = graft.operators.Ordination
    val k = 3
    val pairs = graft.operators.Relational.q30BrayCurtis(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val samples = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val n = samples.length
    val idx = samples.zipWithIndex.toMap
    val d2 = Array.fill(n, n)(0.0)
    pairs.foreach { case (a, b, d) =>
      d2(idx(a))(idx(b)) = d * d; d2(idx(b))(idx(a)) = d * d
    }
    val rm = d2.map(row => row.sum / n)
    val gmean = rm.sum / n
    val b0 = Array.tabulate(n, n)((i, j) =>
      -0.5 * (d2(i)(j) - rm(i) - rm(j) + gmean))
    // (axes, eigenvalues, worst relative residual across axes)
    def solve(iters: Int): (Seq[Array[Double]], Seq[Double], Double) = {
      val bm = b0.map(_.clone())
      var worst = 0.0
      var lam1 = 0.0
      val axes = Seq.newBuilder[Array[Double]]
      val lams = Seq.newBuilder[Double]
      for (a <- 1 to k) {
        var v = Array.tabulate(n)(i => if (i == 0) 1.0 else 0.0)
        for (_ <- 1 to iters) {
          val bv = bm.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
          val m = bv.map(math.abs).max
          v = bv.map(_ / m)
        }
        val bv = bm.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
        val den = v.map(x => x * x).sum
        val lam = v.zip(bv).map { case (x, y) => x * y }.sum / den
        if (a == 1) lam1 = lam
        val res = v.indices.map(i => math.abs(bv(i) - lam * v(i))).max / lam1
        worst = math.max(worst, res)
        axes += v; lams += lam
        for (i <- 0 until n; j <- 0 until n)
          bm(i)(j) -= lam * v(i) * v(j) / den
      }
      (axes.result(), lams.result(), worst)
    }
    val (_, _, resAtIters) = solve(ord.Iters)
    assert(resAtIters < 1e-5,
      f"Iters=${ord.Iters} not converged: worst residual $resAtIters%.2e")
    val (_, _, resAt12) = solve(12)
    assert(resAt12 > 1e-4,
      f"negative control: 12 iters should fail the bar, got $resAt12%.2e")
    val (refAxes, refLams, _) = solve(200)
    def signFix(v: Array[Double]) = if (v(0) >= 0) v else v.map(-_)
    val ref1 = signFix(refAxes(0)); val ref2 = signFix(refAxes(1))
    val eng = ord.q31Pcoa(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(eng.map(_._1).toSeq == samples.toSeq, "sample order mismatch")
    val axErr = eng.zipWithIndex.map { case ((_, a1, a2), i) =>
      math.max(math.abs(a1 - ref1(i)), math.abs(a2 - ref2(i)))
    }.max
    assert(axErr < 1e-4, f"published axes off the reference solve by $axErr%.2e")
    val engEig = ord.q31cPcoaEigen(spark, sfDir).collect()
      .map(r => r.getDouble(1))
    val eigErr = engEig.zip(refLams).map { case (e, r) => math.abs(e - r) }.max
    assert(eigErr < 1e-5, f"eigenvalues off the reference solve by $eigErr%.2e")
  }

  test("q73 CA convergence is gated by an independent local eigensolve " +
       "and a planted block contingency separates on axis 1") {
    import spark.implicits._
    val ord = graft.operators.Ordination
    // local replica of the chi-square residual Gram from the same
    // contingency (PCoA-gate style: the gate is an independent solve,
    // not the engine recursion agreeing with itself)
    val ab = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.dim(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .join(Tables.load(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.dim(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables.dim(spark, sfDir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("p_type"))
      .agg(sum(graft.Dec.dec(col("l_quantity"))).as("qty"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDecimal(2).doubleValue()))
    val samples = ab.map(_._1).distinct.sorted
    val taxa = ab.map(_._2).distinct.sorted
    val (n, t) = (samples.length, taxa.length)
    val cell = ab.map { case (a, b, q) => (a, b) -> q }.toMap
    val g = ab.map(_._3).sum
    val rs = samples.map(a => taxa.map(b => cell.getOrElse((a, b), 0.0)).sum / g)
    val cs = taxa.map(b => samples.map(a => cell.getOrElse((a, b), 0.0)).sum / g)
    val sMat = Array.tabulate(n, t)((i, j) =>
      (cell.getOrElse((samples(i), taxa(j)), 0.0) / g - rs(i) * cs(j))
        / math.sqrt(rs(i) * cs(j)))
    val a0 = Array.tabulate(n, n)((i, k) =>
      (0 until t).map(j => sMat(i)(j) * sMat(k)(j)).sum)
    def solve(iters: Int): (Seq[Array[Double]], Seq[Double], Double) = {
      val bm = a0.map(_.clone()); var worst = 0.0; var lam1 = 0.0
      val axes = Seq.newBuilder[Array[Double]]
      val lams = Seq.newBuilder[Double]
      for (a <- 1 to 2) {
        var v = Array.tabulate(n)(i => if (i == 0) 1.0 else 0.0)
        for (_ <- 1 to iters) {
          val bv = bm.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
          val m = bv.map(math.abs).max
          v = bv.map(_ / m)
        }
        val bv = bm.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
        val den = v.map(x => x * x).sum
        val lam = v.zip(bv).map { case (x, y) => x * y }.sum / den
        if (a == 1) lam1 = lam
        worst = math.max(worst,
          v.indices.map(i => math.abs(bv(i) - lam * v(i))).max / lam1)
        axes += v; lams += lam
        for (i <- 0 until n; j <- 0 until n)
          bm(i)(j) -= lam * v(i) * v(j) / den
      }
      (axes.result(), lams.result(), worst)
    }
    val (_, _, res) = solve(ord.CaIters)
    assert(res < 1e-5, f"CaIters=${ord.CaIters} not converged: $res%.2e")
    val (refAxes, refLams, _) = solve(400)
    def principal(v: Array[Double], lam: Double): Array[Double] = {
      val u = { val s = if (v(0) >= 0) v else v.map(-_)
        val nn = math.sqrt(s.map(x => x * x).sum); s.map(_ / nn) }
      u.indices.map(i => u(i) * math.sqrt(lam) / math.sqrt(rs(i))).toArray
    }
    val ref1 = principal(refAxes(0), refLams(0))
    val ref2 = principal(refAxes(1), refLams(1))
    val eng = ord.q73Ca(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(eng.map(_._1).toSeq == samples.toSeq, "sample order mismatch")
    val err = eng.zipWithIndex.map { case ((_, c1, c2), i) =>
      math.max(math.abs(c1 - ref1(i)), math.abs(c2 - ref2(i))) }.max
    assert(err < 1e-4, f"published CA axes off the reference solve by $err%.2e")
    // planted block structure: two sample groups on disjoint taxa —
    // ONE nontrivial CA dimension whose sign separates the groups
    // exactly; the rank-deflated second axis collapses to ±0 on the
    // round-6 grid
    val block = Seq(("A", "t1", java.math.BigDecimal.valueOf(5)),
      ("B", "t1", java.math.BigDecimal.valueOf(7)),
      ("C", "t2", java.math.BigDecimal.valueOf(4)),
      ("D", "t2", java.math.BigDecimal.valueOf(6)))
      .toDF("n_name", "p_type", "qty")
      .select(col("n_name"), col("p_type"), graft.Dec.dec(col("qty")).as("qty"))
    val got = ord.caFromAbundance(block).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val byS = got.map(r => r._1 -> r._2).toMap
    assert(byS("A") * byS("B") > 0 && byS("C") * byS("D") > 0 &&
      byS("A") * byS("C") < 0,
      s"block structure not separated on ca1: ${got.toSeq}")
    assert(got.forall(r => math.abs(r._3) <= 1e-3),
      s"rank-1 table must leave axis 2 at noise level: ${got.toSeq}")
    // q76 species scores on the same block: the two taxa sit on
    // OPPOSITE sides of axis 1, each on the SAME side as the sample
    // group that uses it (the biplot orientation invariant — sign
    // convention shared with the row side)
    val sp = ord.caSpeciesFromAbundance(block).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(sp("t1") * sp("t2") < 0, s"taxa not separated: $sp")
    assert(sp("t1") * byS("A") > 0 && sp("t2") * byS("C") > 0,
      s"biplot orientation broken: species $sp vs samples $byS")
  }

  test("q74 CCA convergence is gated by an independent local eigensolve " +
       "of the constrained Gram, and a group-indicator constraint " +
       "separates the planted blocks") {
    import spark.implicits._
    val ord = graft.operators.Ordination
    // rebuild S and rvec locally (the q73 gate's machinery)
    val ab = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.dim(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .join(Tables.load(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.dim(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables.dim(spark, sfDir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("p_type"))
      .agg(sum(graft.Dec.dec(col("l_quantity"))).as("qty"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDecimal(2).doubleValue()))
    val samples = ab.map(_._1).distinct.sorted
    val taxa = ab.map(_._2).distinct.sorted
    val (n, t) = (samples.length, taxa.length)
    val cell = ab.map { case (a, b, q) => (a, b) -> q }.toMap
    val g = ab.map(_._3).sum
    val rs = samples.map(a => taxa.map(b => cell.getOrElse((a, b), 0.0)).sum / g)
    val cs = taxa.map(b => samples.map(a => cell.getOrElse((a, b), 0.0)).sum / g)
    val sMat = Array.tabulate(n, t)((i, j) =>
      (cell.getOrElse((samples(i), taxa(j)), 0.0) / g - rs(i) * cs(j))
        / math.sqrt(rs(i) * cs(j)))
    // env matrix in variable-name order, weighted-centered, sqrt(r)
    val env = graft.operators.Relational.bioenvEnv(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val vars = env.map(_._1).distinct.sorted
    assert(vars.length == 3, s"env arity: ${vars.toSeq}")
    val ev = env.map { case (v, s, x) => (s, v) -> x }.toMap
    val xr = {
      val x0 = Array.tabulate(n, 3)((i, a) => ev((samples(i), vars(a))))
      val wm = (0 until 3).map(a =>
        (0 until n).map(i => rs(i) * x0(i)(a)).sum)
      Array.tabulate(n, 3)((i, a) =>
        math.sqrt(rs(i)) * (x0(i)(a) - wm(a)))
    }
    // M^-1 via plain Gaussian elimination, then A = (Xr M^-1 Xr' S)(…)'
    val mM = Array.tabulate(3, 3)((a, b) =>
      (0 until n).map(i => xr(i)(a) * xr(i)(b)).sum)
    val aug = Array.tabulate(3, 6)((a, b) =>
      if (b < 3) mM(a)(b) else if (b - 3 == a) 1.0 else 0.0)
    for (c <- 0 until 3) {
      val p = (c until 3).maxBy(r => math.abs(aug(r)(c)))
      val tmp = aug(c); aug(c) = aug(p); aug(p) = tmp
      val d = aug(c)(c)
      for (b <- 0 until 6) aug(c)(b) /= d
      for (r <- 0 until 3 if r != c) {
        val f = aug(r)(c)
        for (b <- 0 until 6) aug(r)(b) -= f * aug(c)(b)
      }
    }
    val mInv = Array.tabulate(3, 3)((a, b) => aug(a)(b + 3))
    val bbM = Array.tabulate(3, t)((a, j) =>
      (0 until n).map(i => xr(i)(a) * sMat(i)(j)).sum)
    val ccM = Array.tabulate(3, t)((a, j) =>
      (0 until 3).map(b => mInv(a)(b) * bbM(b)(j)).sum)
    val sh = Array.tabulate(n, t)((i, j) =>
      (0 until 3).map(a => xr(i)(a) * ccM(a)(j)).sum)
    val a0 = Array.tabulate(n, n)((i, k) =>
      (0 until t).map(j => sh(i)(j) * sh(k)(j)).sum)
    def solve(iters: Int): (Seq[Array[Double]], Seq[Double], Double) = {
      val bm = a0.map(_.clone()); var worst = 0.0; var lam1 = 0.0
      val axes = Seq.newBuilder[Array[Double]]
      val lams = Seq.newBuilder[Double]
      for (a <- 1 to 2) {
        var v = Array.tabulate(n)(i => if (i == 0) 1.0 else 0.0)
        for (_ <- 1 to iters) {
          val bv = bm.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
          val m = bv.map(math.abs).max
          v = bv.map(_ / m)
        }
        val bv = bm.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
        val den = v.map(x => x * x).sum
        val lam = v.zip(bv).map { case (x, y) => x * y }.sum / den
        if (a == 1) lam1 = lam
        worst = math.max(worst,
          v.indices.map(i => math.abs(bv(i) - lam * v(i))).max / lam1)
        axes += v; lams += lam
        for (i <- 0 until n; j <- 0 until n)
          bm(i)(j) -= lam * v(i) * v(j) / den
      }
      (axes.result(), lams.result(), worst)
    }
    val (_, _, res) = solve(ord.CaIters)
    assert(res < 1e-5, f"CaIters=${ord.CaIters} not converged on CCA: $res%.2e")
    val (refAxes, refLams, _) = solve(400)
    def principal(v: Array[Double], lam: Double): Array[Double] = {
      val u = { val s = if (v(0) >= 0) v else v.map(-_)
        val nn = math.sqrt(s.map(x => x * x).sum); s.map(_ / nn) }
      u.indices.map(i => u(i) * math.sqrt(lam) / math.sqrt(rs(i))).toArray
    }
    val ref1 = principal(refAxes(0), refLams(0))
    val ref2 = principal(refAxes(1), refLams(1))
    val eng = ord.q74Cca(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(eng.map(_._1).toSeq == samples.toSeq, "sample order mismatch")
    val err = eng.zipWithIndex.map { case ((_, c1, c2), i) =>
      math.max(math.abs(c1 - ref1(i)), math.abs(c2 - ref2(i))) }.max
    assert(err < 1e-4, f"published CCA axes off the reference solve by $err%.2e")
    // constrained inertia can never exceed the unconstrained: the
    // hat-matrix projection only removes variation (Cauchy interlacing)
    assert(refLams(0) > 0 && refLams(0) <= {
      val caA = Array.tabulate(n, n)((i, k) =>
        (0 until t).map(j => sMat(i)(j) * sMat(k)(j)).sum)
      var v = Array.tabulate(n)(i => if (i == 0) 1.0 else 0.0)
      for (_ <- 1 to 400) {
        val bv = caA.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
        val m = bv.map(math.abs).max; v = bv.map(_ / m)
      }
      val bv = caA.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
      v.zip(bv).map { case (x, y) => x * y }.sum / v.map(x => x * x).sum
    } + 1e-12, "constrained eigenvalue exceeds unconstrained")
    // planted blocks with a group-indicator constraint: env CAN
    // explain the split, so cca1 separates exactly like CA's fixture
    val block = Seq(("A", "t1", 5), ("B", "t1", 7), ("C", "t2", 4),
      ("D", "t2", 6))
      .map { case (a, b, q) => (a, b, java.math.BigDecimal.valueOf(q.toLong)) }
      .toDF("n_name", "p_type", "qty")
      .select(col("n_name"), col("p_type"), graft.Dec.dec(col("qty")).as("qty"))
    val benv = Seq.tabulate(4, 3) { (i, a) =>
      val s = Seq("A", "B", "C", "D")(i)
      val v = a match {
        case 0 => if (i < 2) 1.0 else 0.0 // the group indicator
        case 1 => i.toDouble              // nuisance, non-collinear
        case _ => (i * i).toDouble
      }
      (s"var$a", s, v)
    }.flatten.toDF("variable", "n_name", "v")
    val got = ord.ccaFromInputs(block, benv).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val byS = got.toMap
    assert(byS("A") * byS("B") > 0 && byS("C") * byS("D") > 0 &&
      byS("A") * byS("C") < 0,
      s"indicator constraint did not separate the blocks: ${got.toSeq}")
  }

  test("q77 dbRDA convergence is gated by an independent local " +
       "eigensolve of H*G*H, and the indicator constraint separates " +
       "planted distance blocks") {
    import spark.implicits._
    val ord = graft.operators.Ordination
    // local Gower-centered Gram off the corpus Bray-Curtis frame
    val bc = graft.operators.Relational.q30BrayCurtis(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val samples = bc.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val n = samples.length
    val dm = {
      val d = Array.fill(n, n)(0.0)
      bc.foreach { case (a, b, v) =>
        val (i, j) = (samples.indexOf(a), samples.indexOf(b))
        d(i)(j) = v * v; d(j)(i) = v * v
      }
      d
    }
    val rm = dm.map(_.sum / n)
    val gmean = rm.sum / n
    val gB = Array.tabulate(n, n)((i, j) =>
      -0.5 * (dm(i)(j) - rm(i) - rm(j) + gmean))
    // env basis at uniform weights
    val env = graft.operators.Relational.bioenvEnv(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val vars = env.map(_._1).distinct.sorted
    val ev = env.map { case (v, s, x) => (s, v) -> x }.toMap
    val rs = Array.fill(n)(1.0 / n)
    val xr = {
      val x0 = Array.tabulate(n, 3)((i, a) => ev((samples(i), vars(a))))
      val wm = (0 until 3).map(a => (0 until n).map(i => rs(i) * x0(i)(a)).sum)
      Array.tabulate(n, 3)((i, a) => math.sqrt(rs(i)) * (x0(i)(a) - wm(a)))
    }
    val mM = Array.tabulate(3, 3)((a, b) =>
      (0 until n).map(i => xr(i)(a) * xr(i)(b)).sum)
    val aug = Array.tabulate(3, 6)((a, b) =>
      if (b < 3) mM(a)(b) else if (b - 3 == a) 1.0 else 0.0)
    for (c <- 0 until 3) {
      val p = (c until 3).maxBy(r => math.abs(aug(r)(c)))
      val tmp = aug(c); aug(c) = aug(p); aug(p) = tmp
      val d = aug(c)(c)
      for (b <- 0 until 6) aug(c)(b) /= d
      for (r <- 0 until 3 if r != c) {
        val f = aug(r)(c)
        for (b <- 0 until 6) aug(r)(b) -= f * aug(c)(b)
      }
    }
    val mInv = Array.tabulate(3, 3)((a, b) => aug(a)(b + 3))
    // G' = P W P' with P = Xr Minv, W = Xr' G Xr — the rank-3 factoring
    val pM = Array.tabulate(n, 3)((i, a) =>
      (0 until 3).map(b => xr(i)(b) * mInv(b)(a)).sum)
    val gx = Array.tabulate(n, 3)((i, b) =>
      (0 until n).map(j => gB(i)(j) * xr(j)(b)).sum)
    val wM = Array.tabulate(3, 3)((a, b) =>
      (0 until n).map(i => xr(i)(a) * gx(i)(b)).sum)
    val a0 = Array.tabulate(n, n)((i, k) =>
      (0 until 3).map(b => (0 until 3).map(a => pM(i)(a) * wM(a)(b)).sum
        * pM(k)(b)).sum)
    def solve(iters: Int): (Seq[Array[Double]], Seq[Double], Double) = {
      val bm = a0.map(_.clone()); var worst = 0.0; var lam1 = 0.0
      val axes = Seq.newBuilder[Array[Double]]
      val lams = Seq.newBuilder[Double]
      for (a <- 1 to 2) {
        var v = Array.tabulate(n)(i => if (i == 0) 1.0 else 0.0)
        for (_ <- 1 to iters) {
          val bv = bm.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
          val m = bv.map(math.abs).max
          v = bv.map(_ / m)
        }
        val bv = bm.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
        val den = v.map(x => x * x).sum
        val lam = v.zip(bv).map { case (x, y) => x * y }.sum / den
        if (a == 1) lam1 = lam
        worst = math.max(worst,
          v.indices.map(i => math.abs(bv(i) - lam * v(i))).max / lam1)
        axes += v; lams += lam
        for (i <- 0 until n; j <- 0 until n)
          bm(i)(j) -= lam * v(i) * v(j) / den
      }
      (axes.result(), lams.result(), worst)
    }
    val (_, _, res) = solve(ord.CaIters)
    assert(res < 1e-5, f"CaIters=${ord.CaIters} not converged on dbRDA: $res%.2e")
    val (refAxes, refLams, _) = solve(400)
    def principal(v: Array[Double], lam: Double): Array[Double] = {
      val u = { val s = if (v(0) >= 0) v else v.map(-_)
        val nn = math.sqrt(s.map(x => x * x).sum); s.map(_ / nn) }
      u.indices.map(i => u(i) * math.sqrt(lam) / math.sqrt(rs(i))).toArray
    }
    val ref1 = principal(refAxes(0), refLams(0))
    val ref2 = principal(refAxes(1), refLams(1))
    val eng = ord.q77Dbrda(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(eng.map(_._1).toSeq == samples.toSeq, "sample order mismatch")
    val err = eng.zipWithIndex.map { case ((_, c1, c2), i) =>
      math.max(math.abs(c1 - ref1(i)), math.abs(c2 - ref2(i))) }.max
    assert(err < 1e-4, f"published dbRDA axes off the reference solve by $err%.2e")
    // constrained inertia can never exceed the unconstrained leading
    // eigenvalue of G (the hat projection only removes variation)
    val gLam = {
      var v = Array.tabulate(n)(i => if (i == 0) 1.0 else 0.0)
      for (_ <- 1 to 400) {
        val bv = gB.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
        val m = bv.map(math.abs).max; v = bv.map(_ / m)
      }
      val bv = gB.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
      v.zip(bv).map { case (x, y) => x * y }.sum / v.map(x => x * x).sum
    }
    assert(refLams(0) > 0 && refLams(0) <= gLam + 1e-12,
      "constrained eigenvalue exceeds unconstrained")
    // planted distance blocks with an indicator constraint: {A,B} vs
    // {C,D} far apart, env can explain the split → dbrda1 separates
    val pbc = Seq(("A", "B", 0.1), ("A", "C", 0.9), ("A", "D", 0.9),
      ("B", "C", 0.9), ("B", "D", 0.9), ("C", "D", 0.1))
      .toDF("sample_a", "sample_b", "bray_curtis")
    val benv = Seq.tabulate(4, 3) { (i, a) =>
      val s = Seq("A", "B", "C", "D")(i)
      val v = a match {
        case 0 => if (i < 2) 1.0 else 0.0
        case 1 => i.toDouble
        case _ => (i * i).toDouble
      }
      (s"var$a", s, v)
    }.flatten.toDF("variable", "n_name", "v")
    val got = ord.dbrdaFromInputs(pbc, benv).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val byS = got.toMap
    assert(byS("A") * byS("B") > 0 && byS("C") * byS("D") > 0 &&
      byS("A") * byS("C") < 0,
      s"indicator constraint did not separate the distance blocks: ${got.toSeq}")
  }

  test("q86 anova: a spanning constraint captures the whole inertia, " +
       "a singular basis NULLs the test loudly, corpus test is a " +
       "calibrated share") {
    import spark.implicits._
    val ord = graft.operators.Ordination
    // 1-D Euclidean geometry: G = c·cᵀ with c the centered coordinate,
    // and the env columns {z, z², z³} SPAN c — the hat projection
    // keeps everything, so constrained inertia = total (r² → 1)
    val z = Map("A" -> 0.0, "B" -> 1.0 / 3, "C" -> 2.0 / 3, "D" -> 1.0)
    val names = Seq("A", "B", "C", "D")
    val bc = (for {
      i <- names.indices; j <- names.indices if i < j
    } yield (names(i), names(j), math.abs(z(names(i)) - z(names(j)))))
      .toDF("sample_a", "sample_b", "bray_curtis")
    val env = (for {
      s <- names; a <- 0 until 3
    } yield (s"var$a", s, math.pow(z(s), a + 1)))
      .toDF("variable", "n_name", "v")
    val keys = names.zipWithIndex.map { case (s, i) => (s, i.toLong) }
      .toDF("n_name", "k")
    val got = ord.anovaDbrdaFromInputs(bc, env, keys).collect().head
    assert(got.getLong(0) == 4L && got.getDouble(1) > 0.0, got.toString)
    assert(got.getDouble(3) >= 0.999, s"spanning constraint r2: $got")
    assert(got.getDouble(2) / got.getDouble(1) >= 0.999, got.toString)
    assert(got.getLong(5) == 60L, got.toString)
    // a constant env column zeroes a row of M → det exactly 0 → the
    // whole test NULLs (the loud degenerate), total inertia stays
    val flatEnv = (for { s <- names; a <- 0 until 3 }
      yield (s"var$a", s, if (a == 0) 7.0 else math.pow(z(s), a)))
      .toDF("variable", "n_name", "v")
    val sing = ord.anovaDbrdaFromInputs(bc, flatEnv, keys).collect().head
    assert(sing.getDouble(1) > 0.0 && sing.isNullAt(2) &&
      sing.isNullAt(3) && sing.isNullAt(4) && sing.isNullAt(7),
      sing.toString)
    // corpus: a share in (0,1), a positive F, a proper p in (0,1]
    val sf = ord.q86AnovaDbrda(spark, sfDir).collect().head
    assert(sf.getDouble(3) > 0.0 && sf.getDouble(3) < 1.0, sf.toString)
    assert(sf.getDouble(2) <= sf.getDouble(1), sf.toString)
    assert(sf.getDouble(4) > 0.0, sf.toString)
    assert(sf.getDouble(7) > 0.0 && sf.getDouble(7) <= 1.0, sf.toString)
  }

  test("q88 varpart: orthogonal constraint blocks make raw R2 " +
       "additive, a collinear basis NULLs out, fractions sum to one, " +
       "r2_both is q86's r2") {
    import spark.implicits._
    val ord = graft.operators.Ordination
    val names = Seq("A", "B", "C", "D", "E", "F")
    // any planted distance geometry works — additivity is a property
    // of the CONSTRAINT blocks, not of G
    val bc = (for {
      i <- names.indices; j <- names.indices if i < j
    } yield (names(i), names(j), 0.1 * ((i * 3 + j * 5) % 7 + 1)))
      .toDF("sample_a", "sample_b", "bray_curtis")
    // v1 ⟂ {v2, v3} after centering (all means already 0; the ±1/6
    // cross terms cancel pairwise EXACTLY in the fold order), so M is
    // block-diagonal and tr(M⁻¹W) splits: r²(both) = r²(X1) + r²(X2)
    // up to the two independent round-6 output quantizations
    val v1 = Seq(1.0, -1.0, 1.0, -1.0, 1.0, -1.0)
    val v2 = Seq(1.0, 1.0, -1.0, -1.0, 0.0, 0.0)
    val v3 = Seq(0.0, 0.0, 1.0, 1.0, -1.0, -1.0)
    def envOf(c1: Seq[Double], c2: Seq[Double], c3: Seq[Double]) =
      names.indices.flatMap(i => Seq(
        ("a_v1", names(i), c1(i)), ("b_v2", names(i), c2(i)),
        ("c_v3", names(i), c3(i))))
        .toDF("variable", "n_name", "v")
    val got = ord.varpartFromInputs(bc, envOf(v1, v2, v3))
      .collect().head
    assert(got.getLong(0) == 6L && got.getDouble(1) > 0.0, got.toString)
    assert(math.abs(got.getDouble(4)
      - (got.getDouble(2) + got.getDouble(3))) <= 2e-6,
      s"orthogonal additivity: $got")
    // fractions are an exact partition of 1 (inclusion–exclusion),
    // up to the four output roundings
    assert(math.abs(got.getDouble(8) + got.getDouble(9)
      + got.getDouble(10) + got.getDouble(11) - 1.0) <= 3e-6,
      got.toString)
    // frac identities vs the adjusted R² columns
    assert(math.abs(got.getDouble(8)
      - (got.getDouble(7) - got.getDouble(6))) <= 2e-6, got.toString)
    assert(math.abs(got.getDouble(11) - (1.0 - got.getDouble(7)))
      <= 2e-6, got.toString)
    // singular basis (constant v3 → exactly-zero centered column →
    // det exactly 0): everything NULL but the census and total
    // inertia. n = 4 so the 1/n weight folds are exact powers of two
    // — at n = 6 the centering residue is ~1e-16 and det ~1e-32 ≠ 0,
    // which is a float-collinear basis, NOT the guarded shape
    val names4 = Seq("A", "B", "C", "D")
    val bc4 = (for {
      i <- names4.indices; j <- names4.indices if i < j
    } yield (names4(i), names4(j), 0.1 * ((i + 2 * j) % 5 + 1)))
      .toDF("sample_a", "sample_b", "bray_curtis")
    val env4 = names4.indices.flatMap(i => Seq(
      ("a_v1", names4(i), Seq(1.0, -1.0, 1.0, -1.0)(i)),
      ("b_v2", names4(i), Seq(1.0, 1.0, -1.0, -1.0)(i)),
      ("c_v3", names4(i), 7.0)))
      .toDF("variable", "n_name", "v")
    val sing = ord.varpartFromInputs(bc4, env4).collect().head
    assert(sing.getLong(0) == 4L && sing.getDouble(1) > 0.0,
      sing.toString)
    (2 to 11).foreach(i => assert(sing.isNullAt(i), s"col $i: $sing"))
    // corpus: r2_both is BITWISE q86's r² (same trace identity, same
    // basis), fractions partition 1 within rounding
    val vp = ord.q88Varpart(spark, sfDir).collect().head
    val anova = ord.q86AnovaDbrda(spark, sfDir).collect().head
    assert(vp.getDouble(4) == anova.getDouble(3),
      s"varpart r2_both ${vp.getDouble(4)} != q86 r2 ${anova.getDouble(3)}")
    assert(math.abs(vp.getDouble(8) + vp.getDouble(9)
      + vp.getDouble(10) + vp.getDouble(11) - 1.0) <= 3e-6, vp.toString)
  }

  test("q78 wascores puts a single-site taxon exactly on its site, a " +
       "shared taxon at the abundance-weighted mean, and every corpus " +
       "score inside the site-score hull") {
    import spark.implicits._
    val ord = graft.operators.Ordination
    val scores = Seq(("A", 0.5, -0.2), ("B", -0.3, 0.6))
      .toDF("sample", "axis1", "axis2")
    val ab = Seq(("A", "only_a", 7), ("A", "both", 1), ("B", "both", 3))
      .map { case (s, t, q) => (s, t, java.math.BigDecimal.valueOf(q.toLong)) }
      .toDF("n_name", "p_type", "qty")
      .select(col("n_name"), col("p_type"), graft.Dec.dec(col("qty")).as("qty"))
    val got = ord.wascoresFromInputs(ab, scores).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got("only_a") == (0.5, -0.2), s"single-site taxon: $got")
    // both: (1*0.5 + 3*(-0.3))/4 = -0.1; (1*(-0.2) + 3*0.6)/4 = 0.4
    assert(got("both") == (-0.1, 0.4), s"weighted mean: $got")
    // corpus: a weighted mean can never leave the site-score hull
    val site = ord.q31Pcoa(spark, sfDir).collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val (lo1, hi1) = (site.map(_._1).min, site.map(_._1).max)
    val (lo2, hi2) = (site.map(_._2).min, site.map(_._2).max)
    val wa = ord.q78Wascores(spark, sfDir).collect()
    assert(wa.nonEmpty && wa.forall(r =>
      r.getDouble(1) >= lo1 - 1e-6 && r.getDouble(1) <= hi1 + 1e-6 &&
      r.getDouble(2) >= lo2 - 1e-6 && r.getDouble(2) <= hi2 + 1e-6),
      s"wascores left the site hull: ${wa.toSeq}")
  }

  test("q79 Beals smoothing matches the hand-computed grid, predicts " +
       "absences, NULLs the no-evidence cell, and stays in [0,1] on " +
       "the corpus") {
    import spark.implicits._
    // S1:{a,b} S2:{a,b,c} S3:{c} -> N(a)=N(b)=N(c)=2, M(ab)=2,
    // M(ac)=M(bc)=1; every cell hand-checked incl. the absent-taxon
    // predictions and the S3/c cell with no companions (NULL)
    val ab = Seq(("S1", "a", 5), ("S1", "b", 2), ("S2", "a", 1),
      ("S2", "b", 4), ("S2", "c", 3), ("S3", "c", 7))
      .map { case (s, t, q) => (s, t, java.math.BigDecimal.valueOf(q.toLong)) }
      .toDF("n_name", "p_type", "qty")
      .select(col("n_name"), col("p_type"), graft.Dec.dec(col("qty")).as("qty"))
    val got = graft.operators.Relational.bealsFromAbundance(ab).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val expect = Map(
      ("S1", "a") -> Some(1.0), ("S1", "b") -> Some(1.0),
      ("S1", "c") -> Some(0.5),
      ("S2", "a") -> Some(0.75), ("S2", "b") -> Some(0.75),
      ("S2", "c") -> Some(0.5),
      ("S3", "a") -> Some(0.5), ("S3", "b") -> Some(0.5),
      ("S3", "c") -> None)
    assert(got == expect, s"beals grid:\n$got\nvs\n$expect")
    // corpus: dense grid, every defined value a probability
    val sf = graft.operators.Relational.q79Beals(spark, sfDir).collect()
    val ns = sf.map(_.getString(0)).distinct.length
    val nt = sf.map(_.getString(1)).distinct.length
    assert(sf.length == ns * nt, s"grid not dense: ${sf.length} vs $ns*$nt")
    assert(sf.forall(r => r.isNullAt(2) ||
      (r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)),
      "beals outside [0,1]")
  }

  test("q74/q75 constrained chain fails LOUDLY on a non-3 env arity " +
       "instead of NULL-propagating to the det=0 shape (r17 ADVICE)") {
    import spark.implicits._
    val ord = graft.operators.Ordination
    val block = Seq(("A", "t1", 5), ("B", "t1", 7), ("C", "t2", 4),
      ("D", "t2", 6))
      .map { case (a, b, q) => (a, b, java.math.BigDecimal.valueOf(q.toLong)) }
      .toDF("n_name", "p_type", "qty")
      .select(col("n_name"), col("p_type"), graft.Dec.dec(col("qty")).as("qty"))
    // only TWO variables per sample: element_at(xrow, 3) would be a
    // silent NULL without the guard, and the output would be all-null
    // rows — exactly the singular-basis (det = 0) output
    val twoVar = Seq.tabulate(4, 2) { (i, a) =>
      (s"var$a", Seq("A", "B", "C", "D")(i), (i + a).toDouble)
    }.flatten.toDF("variable", "n_name", "v")
    val ex = intercept[Exception] {
      ord.ccaFromInputs(block, twoVar).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("EXACTLY 3 env variables")),
      s"wrong-arity env did not raise the guard: $ex")
    // and the rda path shares the guard
    val ex2 = intercept[Exception] {
      ord.rdaFromInputs(block, twoVar).collect()
    }
    assert(messages(ex2).exists(_.contains("EXACTLY 3 env variables")),
      s"rda wrong-arity env did not raise the guard: $ex2")
    // and the dbrda path (Gram-side projection) shares it too
    val pbc = Seq(("A", "B", 0.5), ("A", "C", 0.6), ("B", "C", 0.7))
      .toDF("sample_a", "sample_b", "bray_curtis")
    val ex3 = intercept[Exception] {
      ord.dbrdaFromInputs(pbc, twoVar).collect()
    }
    assert(messages(ex3).exists(_.contains("EXACTLY 3 env variables")),
      s"dbrda wrong-arity env did not raise the guard: $ex3")
  }

  test("q75 RDA convergence is gated by an independent local eigensolve " +
       "of the linear constrained Gram, and the indicator constraint " +
       "separates the planted blocks") {
    import spark.implicits._
    val ord = graft.operators.Ordination
    val ab = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.dim(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .join(Tables.load(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.dim(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables.dim(spark, sfDir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("p_type"))
      .agg(sum(graft.Dec.dec(col("l_quantity"))).as("qty"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDecimal(2).doubleValue()))
    val samples = ab.map(_._1).distinct.sorted
    val taxa = ab.map(_._2).distinct.sorted
    val (n, t) = (samples.length, taxa.length)
    val cell = ab.map { case (a, b, q) => (a, b) -> q }.toMap
    // column-centered linear matrix, uniform weights r = 1/n
    val y0 = Array.tabulate(n, t)((i, j) =>
      cell.getOrElse((samples(i), taxa(j)), 0.0))
    val cm = (0 until t).map(j => (0 until n).map(i => y0(i)(j)).sum / n)
    val yc = Array.tabulate(n, t)((i, j) => y0(i)(j) - cm(j))
    val rs = Array.fill(n)(1.0 / n)
    val env = graft.operators.Relational.bioenvEnv(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val vars = env.map(_._1).distinct.sorted
    val ev = env.map { case (v, s, x) => (s, v) -> x }.toMap
    val xr = {
      val x0 = Array.tabulate(n, 3)((i, a) => ev((samples(i), vars(a))))
      val wm = (0 until 3).map(a => (0 until n).map(i => rs(i) * x0(i)(a)).sum)
      Array.tabulate(n, 3)((i, a) => math.sqrt(rs(i)) * (x0(i)(a) - wm(a)))
    }
    val mM = Array.tabulate(3, 3)((a, b) =>
      (0 until n).map(i => xr(i)(a) * xr(i)(b)).sum)
    val aug = Array.tabulate(3, 6)((a, b) =>
      if (b < 3) mM(a)(b) else if (b - 3 == a) 1.0 else 0.0)
    for (c <- 0 until 3) {
      val p = (c until 3).maxBy(r => math.abs(aug(r)(c)))
      val tmp = aug(c); aug(c) = aug(p); aug(p) = tmp
      val d = aug(c)(c)
      for (b <- 0 until 6) aug(c)(b) /= d
      for (r <- 0 until 3 if r != c) {
        val f = aug(r)(c)
        for (b <- 0 until 6) aug(r)(b) -= f * aug(c)(b)
      }
    }
    val mInv = Array.tabulate(3, 3)((a, b) => aug(a)(b + 3))
    val bbM = Array.tabulate(3, t)((a, j) =>
      (0 until n).map(i => xr(i)(a) * yc(i)(j)).sum)
    val ccM = Array.tabulate(3, t)((a, j) =>
      (0 until 3).map(b => mInv(a)(b) * bbM(b)(j)).sum)
    val sh = Array.tabulate(n, t)((i, j) =>
      (0 until 3).map(a => xr(i)(a) * ccM(a)(j)).sum)
    val a0 = Array.tabulate(n, n)((i, k) =>
      (0 until t).map(j => sh(i)(j) * sh(k)(j)).sum)
    def solve(iters: Int): (Seq[Array[Double]], Seq[Double], Double) = {
      val bm = a0.map(_.clone()); var worst = 0.0; var lam1 = 0.0
      val axes = Seq.newBuilder[Array[Double]]
      val lams = Seq.newBuilder[Double]
      for (a <- 1 to 2) {
        var v = Array.tabulate(n)(i => if (i == 0) 1.0 else 0.0)
        for (_ <- 1 to iters) {
          val bv = bm.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
          val m = bv.map(math.abs).max
          v = bv.map(_ / m)
        }
        val bv = bm.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
        val den = v.map(x => x * x).sum
        val lam = v.zip(bv).map { case (x, y) => x * y }.sum / den
        if (a == 1) lam1 = lam
        worst = math.max(worst,
          v.indices.map(i => math.abs(bv(i) - lam * v(i))).max / lam1)
        axes += v; lams += lam
        for (i <- 0 until n; j <- 0 until n)
          bm(i)(j) -= lam * v(i) * v(j) / den
      }
      (axes.result(), lams.result(), worst)
    }
    val (_, _, res) = solve(ord.CaIters)
    assert(res < 1e-5, f"CaIters=${ord.CaIters} not converged on RDA: $res%.2e")
    val (refAxes, refLams, _) = solve(400)
    def principal(v: Array[Double], lam: Double): Array[Double] = {
      val u = { val s = if (v(0) >= 0) v else v.map(-_)
        val nn = math.sqrt(s.map(x => x * x).sum); s.map(_ / nn) }
      u.indices.map(i => u(i) * math.sqrt(lam) / math.sqrt(rs(i))).toArray
    }
    val ref1 = principal(refAxes(0), refLams(0))
    val ref2 = principal(refAxes(1), refLams(1))
    val eng = ord.q75Rda(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(eng.map(_._1).toSeq == samples.toSeq, "sample order mismatch")
    // relative tolerance: RDA coordinates ride raw abundance
    // magnitudes (thousands), so the gate scales by the axis norm
    val scale1 = math.max(ref1.map(math.abs).max, 1.0)
    val err = eng.zipWithIndex.map { case ((_, c1, c2), i) =>
      math.max(math.abs(c1 - ref1(i)), math.abs(c2 - ref2(i))) }.max / scale1
    assert(err < 1e-4, f"published RDA axes off the reference solve by $err%.2e")
    // planted blocks with the indicator constraint (q74's fixture,
    // linear geometry)
    val block = Seq(("A", "t1", 5), ("B", "t1", 7), ("C", "t2", 4),
      ("D", "t2", 6))
      .map { case (a, b, q) => (a, b, java.math.BigDecimal.valueOf(q.toLong)) }
      .toDF("n_name", "p_type", "qty")
      .select(col("n_name"), col("p_type"), graft.Dec.dec(col("qty")).as("qty"))
    val benv = Seq.tabulate(4, 3) { (i, a) =>
      val s = Seq("A", "B", "C", "D")(i)
      val v = a match {
        case 0 => if (i < 2) 1.0 else 0.0
        case 1 => i.toDouble
        case _ => (i * i).toDouble
      }
      (s"var$a", s, v)
    }.flatten.toDF("variable", "n_name", "v")
    val got = ord.rdaFromInputs(block, benv).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val byS = got.toMap
    assert(byS("A") * byS("B") > 0 && byS("C") * byS("D") > 0 &&
      byS("A") * byS("C") < 0,
      s"indicator constraint did not separate the blocks: ${got.toSeq}")
  }

  test("q72 NMDS matches a bitwise JVM replica of the full trajectory, " +
       "holds an exact-metric fixed point, is invariant to monotone " +
       "dissimilarity transforms, and improves on the PCoA init") {
    // The r16-verdict-authorized spec-gated-only class: stress
    // majorization has no closed-form unique fixpoint for a DuckDB
    // oracle, so correctness = this replica (the identical 12-step
    // arithmetic in plain Scala, double-for-double) + planted
    // geometry fixtures.
    import spark.implicits._
    val ord = graft.operators.Ordination
    def r12(x: Double) = BigDecimal.valueOf(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6z(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    // plain-Scala replica of nmds(): identical rank spine, prefix-sum
    // minimax isotonic fit, Guttman transform with r12 decimal sums
    def replica(pairs0: Seq[(String, String, Double)],
        init: Seq[(String, Double, Double)], iters: Int)
        : (Seq[(String, Double, Double)], Option[Double]) = {
      val samples = init.map(_._1).sorted
      val n = samples.length
      val idx = samples.zipWithIndex.map { case (s, i) => s -> (i + 1) }.toMap
      val prs = pairs0.map { case (a, b, dd) => (idx(a), idx(b), dd) }
        .sortBy { case (i, j, dd) => (dd, i, j) }
      val m = prs.length
      val x = Array.ofDim[Double](n + 1); val y = Array.ofDim[Double](n + 1)
      init.foreach { case (s, a1, a2) => x(idx(s)) = a1; y(idx(s)) = a2 }
      def dists(): Array[Double] = Array.tabulate(m) { k =>
        val (i, j, _) = prs(k)
        math.sqrt((x(i) - x(j)) * (x(i) - x(j))
          + (y(i) - y(j)) * (y(i) - y(j)))
      }
      def disparity(d: Array[Double]): Array[Double] = {
        val ps = new Array[Double](m)
        var run = 0.0
        for (k <- 0 until m) { run += d(k); ps(k) = run }
        def avg(a: Int, b: Int) =
          (ps(b) - ps(a) + d(a)) / (b - a + 1).toDouble
        val smin = Array.ofDim[Double](m, m)
        for (a <- 0 until m) {
          var mn = Double.PositiveInfinity
          for (b <- m - 1 to a by -1) {
            mn = math.min(mn, avg(a, b)); smin(a)(b) = mn
          }
        }
        Array.tabulate(m) { k =>
          var best = Double.NegativeInfinity
          for (a <- 0 to k) best = math.max(best, smin(a)(k))
          best
        }
      }
      for (_ <- 1 to iters) {
        val d = dists(); val dh = disparity(d)
        val sx = Array.fill(n + 1)(BigDecimal(0))
        val sy = Array.fill(n + 1)(BigDecimal(0))
        for (k <- 0 until m) {
          val (i, j, _) = prs(k)
          val w = if (d(k) > 0.0) dh(k) / d(k) else 0.0
          sx(i) += r12(w * (x(i) - x(j))); sy(i) += r12(w * (y(i) - y(j)))
          sx(j) += r12(w * (x(j) - x(i))); sy(j) += r12(w * (y(j) - y(i)))
        }
        for (u <- 1 to n) {
          x(u) = r12(sx(u).toDouble / n.toDouble).toDouble
          y(u) = r12(sy(u).toDouble / n.toDouble).toDouble
        }
      }
      val d = dists(); val dh = disparity(d)
      var num = BigDecimal(0); var den = BigDecimal(0)
      for (k <- 0 until m) {
        num += r12((d(k) - dh(k)) * (d(k) - dh(k)))
        den += r12(d(k) * d(k))
      }
      val stress =
        if (den > 0) Some(r6z(math.sqrt(num.toDouble / den.toDouble)))
        else None
      (samples.map(s => (s, r6z(x(idx(s))), r6z(y(idx(s))))), stress)
    }
    def collectEngine(bc: Seq[(String, String, Double)],
        init: Seq[(String, Double, Double)], iters: Int) =
      ord.nmds(bc.toDF("sample_a", "sample_b", "bray_curtis"),
        init.toDF("sample", "axis1", "axis2"), iters).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3)))
    // FIXED POINT: a centered square whose dissimilarity ranks agree
    // with its exact metric distances — isotonic fit is the identity,
    // every weight is 1, the Guttman transform subtracts the (zero)
    // centroid: coords bitwise unchanged, stress exactly 0
    val sqInit = Seq(("A", 1.0, 1.0), ("B", -1.0, 1.0),
      ("C", -1.0, -1.0), ("D", 1.0, -1.0))
    val sqBc = Seq(("A", "B", 0.2), ("B", "C", 0.2), ("C", "D", 0.2),
      ("A", "D", 0.2), ("A", "C", 0.5), ("B", "D", 0.5))
    val fp = collectEngine(sqBc, sqInit, ord.NmdsIters)
    assert(fp.toSeq == Seq(("A", 1.0, 1.0, 0.0), ("B", -1.0, 1.0, 0.0),
      ("C", -1.0, -1.0, 0.0), ("D", 1.0, -1.0, 0.0)),
      s"fixed point broken: ${fp.toSeq}")
    // NONMETRIC INVARIANCE: cubing the dissimilarities preserves
    // ranks (and ties), so the entire trajectory — coords AND stress
    // — is bitwise identical (the property that makes NMDS NMDS)
    val cubed = collectEngine(sqBc.map { case (a, b, v) =>
      (a, b, v * v * v) }, sqInit, ord.NmdsIters)
    assert(cubed.toSeq == fp.toSeq,
      s"monotone invariance broken: ${cubed.toSeq}")
    // RANK VIOLATOR: collinear points whose farthest pair claims the
    // SMALLEST dissimilarity — the isotonic fit pools, stress is
    // positive, and the engine still matches the replica bitwise
    val vInit = Seq(("A", -1.0, 0.0), ("B", 0.0, 0.0), ("C", 1.0, 0.0))
    val vBc = Seq(("A", "C", 0.1), ("A", "B", 0.5), ("B", "C", 0.6))
    val vGot = collectEngine(vBc, vInit, ord.NmdsIters)
    val (vRep, vStress) = replica(vBc, vInit, ord.NmdsIters)
    assert(vGot.map(t => (t._1, t._2, t._3)).toSeq == vRep &&
      vGot.forall(_._4 == vStress.get) && vStress.get > 0.0,
      s"violator: got ${vGot.toSeq}\nrep $vRep stress $vStress")
    // CORPUS: the engine's published 12-step trajectory equals the
    // replica double-for-double, and the final stress does not exceed
    // the metric init's stress (the majorization actually helps)
    val bc = graft.operators.Relational.q30BrayCurtis(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSeq
    val init = ord.q31Pcoa(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val eng = ord.q72Nmds(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    val (rep, repStress) = replica(bc, init, ord.NmdsIters)
    assert(eng.map(t => (t._1, t._2, t._3)).toSeq == rep,
      s"corpus replica drift:\n eng ${eng.toSeq}\n rep $rep")
    assert(eng.forall(_._4 == repStress.get),
      s"corpus stress drift: ${eng.head._4} vs $repStress")
    val (_, initStress) = replica(bc, init, 0)
    assert(repStress.get <= initStress.get,
      s"stress worsened: init $initStress final $repStress")
    assert(repStress.get > 0.0 && repStress.get < 0.3,
      s"corpus stress implausible: $repStress")
  }

  test("as-of join stays linear on a single hot user") {
    // one user emitting every event: the union-window form processes
    // the timeline in ONE sorted pass — output must still be exact
    import spark.implicits._
    val n = 20000
    val ev = (0 until n).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L),
        1L, if (i % 2 == 0) "click" else "purchase", i.toDouble)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.Events.asofJoin(ev).collect()
    assert(out.length == n / 2)
    // every purchase i attributes to click i-1 (1 second earlier)
    assert(out.forall { r =>
      r.getLong(2) == r.getLong(1) - 1 && r.getLong(4) == 1000000L
    }, "hot-user attribution drifted")
  }

  test("sequence packing handles a giant single shard exactly") {
    // force ALL docs into one shard (nShards=1): the per-shard linear
    // scan must still pack the full corpus correctly — this is the
    // worst-case skew (shard >> others), bounded by one task's docs
    import spark.implicits._
    val docs = (0 until 5000).map { i =>
      (i.toLong, Seq.fill(i % 50 + 1)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val packed = graft.operators.TextOps.sequencePack(
      spark, docs, nShards = 1, budget = 128L).collect()
    assert(packed.length == 5000)
    // greedy replay over the whole corpus in doc order
    var fill = 0L; var pack = 0L; var first = true
    packed.sortBy(_.getLong(0)).foreach { r =>
      val t = r.getLong(3)
      if (first) { first = false; fill = t }
      else if (fill + t <= 128L) fill += t
      else { pack += 1; fill = t }
      assert(r.getLong(2) == pack,
        s"doc ${r.getLong(0)}: pack ${r.getLong(2)} != replay $pack")
    }
  }
}
