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

  test("LSH ANN k-guarantee survives an adversarial bucket distribution") {
    import spark.implicits._
    // Build a corpus whose SRP buckets are pairwise ≥2 bit-flips apart
    // in EVERY hash table: then no probe key (home ∪ 1-bit flips) ever
    // lands in another vector's home bucket, so pure LSH yields ZERO
    // candidates and only the deficit-triggered brute-force fallback
    // can satisfy k. Greedily select such vectors from the real
    // embeddings via their actual bucket signatures.
    val e = Tables.load(spark, sfDir, "embeddings")
    val buckets = e.select(col("vec_id"),
        graft.GraftFunctions.srpBuckets(col("embedding"),
          Similarity.lshPlanes, Similarity.LshTables, Similarity.LshBits).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    def farApart(a: Seq[Long], b: Seq[Long]): Boolean =
      a.zip(b).forall { case (x, y) => java.lang.Long.bitCount(x ^ y) >= 2 }
    val kept = buckets.foldLeft(Vector.empty[(Long, Seq[Long])]) {
      case (acc, (id, bs)) =>
        if (acc.size < 12 && acc.forall(k => farApart(k._2, bs))) acc :+ ((id, bs))
        else acc
    }.map(_._1)
    assert(kept.size == 12, s"could not assemble adversarial corpus: ${kept.size}")
    // relabel 0..11 so vec_id < 5 selects 5 queries
    val idMap = kept.zipWithIndex.toMap
    val adv = e.filter(col("vec_id").isin(kept: _*))
      .collect().map(r => (idMap(r.getLong(0)).toLong, r.getSeq[Float](1)))
      .toSeq.toDF("vec_id", "embedding")
    val res = Similarity.annLsh(adv).collect()
    val byQuery = res.groupBy(_.getLong(0))
    assert(byQuery.keySet == (0L until 5L).toSet,
      s"missing queries: ${byQuery.keySet}")
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == 10, s"query $q returned ${rows.length} rows, not k=10")
      assert(rows.map(_.getInt(2)).toSeq.sorted == (1 to 10))
    }
    // the fallback path must reproduce exact brute-force ranking
    val bf = Similarity.annBruteforce(adv).collect()
      .filter(_.getInt(2) <= 10).map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    res.foreach { r =>
      assert(bf((r.getLong(0), r.getInt(2))) == r.getLong(1),
        s"fallback ranking diverges from brute force at ${(r.getLong(0), r.getInt(2))}")
    }
  }

  test("filtered ANN returns only allowed docs, k rows per query") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, sfDir, "documents")
    val allowed = docs.filter(col("source") === "src3")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(allowed.size >= Similarity.AnnK, "filter leaves fewer than k docs")
    val res = Similarity.annFiltered(
      Tables.load(spark, sfDir, "embeddings"), docs, "src3").collect()
    assert(res.forall(r => allowed.contains(r.getLong(1))),
      "a result escaped the metadata filter")
    val byQuery = res.groupBy(_.getLong(0))
    assert(byQuery.size == 5 && byQuery.values.forall(_.length == Similarity.AnnK),
      s"expected 5×${Similarity.AnnK} rows: ${byQuery.view.mapValues(_.length).toMap}")
  }

  test("KMeans IVF recall@10 holds the 0.7 floor at sf0.1") {
    // nProbe=8 of 16 cells: the synthetic embeddings are near-isotropic
    // (no real cluster structure), so IVF recall tracks the probed
    // fraction — 4 probes ≈ 0.5, 8 probes ≈ 0.74. The spec pins the
    // dial that honours the floor; real embedding corpora cluster far
    // more sharply and reach it with fewer probes.
    val dir = "/root/testdata/sf0.1"
    val e = Tables.parallel(Tables.load(spark, dir, "embeddings"))
    val bf = Similarity.annBruteforce(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvf(e, 16, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(ivf).size.toDouble / bf.size
    assert(recall >= 0.7, f"IVF recall@10 $recall%.2f below 0.7 at sf0.1")
  }

  test("KMeans assignment stage is exact under the trained centroids") {
    // The hard gate on the trained path (r6): whatever centroids Lloyd
    // produced, the distributed assignment must equal an independent
    // local argmin over the same centroid matrix — same index-order
    // double fold, so equality is exact, not recall. Gates BOTH the
    // native EuclidArgmin projection and the join-form fallback.
    val e = Tables.load(spark, sfDir, "embeddings")
    val centers = Similarity.kmeansCenterArrays(e, 16)
    val centerArr = centers.map(_.toArray).toArray
    assert(centerArr.length == 16)
    val got = Similarity.kmeansAssign(e, centers).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val viaJoin = Similarity.kmeansAssignJoin(
        e, Similarity.centroidsDf(spark, centers)).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == viaJoin, "native argmin diverges from the join form")
    val corpus = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    assert(got.size == corpus.length)
    corpus.foreach { case (id, v) =>
      val want = centerArr.zipWithIndex.map { case (c, cell) =>
        var acc = 0.0
        var i = 0
        while (i < v.length) {
          val d = v(i).toDouble - c(i); acc += d * d; i += 1
        }
        (cell, acc)
      }.minBy { case (cell, d2) => (d2, cell) }._1
      assert(got(id) == want,
        s"vector $id assigned to cell ${got(id)}, exact argmin is $want")
    }
  }

  test("both assignment forms fail loudly on a vector/centroid dimension mismatch") {
    // ADVICE r6: the native expression used to truncate to the shorter
    // length while the join form nulled out — the two "bit-identical"
    // paths diverged on malformed input. Both must now throw.
    import spark.implicits._
    val ragged = Seq((1L, Array(0.1f, 0.2f, 0.3f)))
      .toDF("vec_id", "embedding")
    val centers = Seq(Seq(0.0, 0.0), Seq(1.0, 1.0))
    val eNative = intercept[Exception] {
      Similarity.kmeansAssign(ragged, centers).collect()
    }
    assert(eNative.getMessage.contains("euclid_argmin")
      || Option(eNative.getCause).exists(_.getMessage.contains("euclid_argmin")))
    val eJoin = intercept[Exception] {
      Similarity.kmeansAssignJoin(
        ragged, Similarity.centroidsDf(spark, centers)).collect()
    }
    assert(eJoin.getMessage.contains("dimension")
      || Option(eJoin.getCause).exists(_.getMessage.contains("dimension")))
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
    // SURVEY §3's scale claim for IVF: the corpus is WRITTEN
    // partitioned by centroid id, so a probe of nProbe cells reads
    // nProbe/k of the data. Prove it end-to-end: write the kmeansAssign
    // output partitioned by `cell`, probe 4 cells, and assert the scan
    // touched EXACTLY those 4 partitions — metadata-level pruning
    // (a PartitionFilter), not a post-scan filter over all files.
    val e = Tables.load(spark, sfDir, "embeddings")
    // fixed literal centroids: the claim is about the write/probe
    // layout, which is independent of what Lloyd produced
    val centers = Seq.tabulate(16)(i =>
      Seq.tabulate(64)(j => ((i * 7 + j * 3) % 13 - 6) * 0.05))
    val out = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/corpus"
    Similarity.kmeansAssign(e, centers)
      .write.mode("overwrite").partitionBy("cell").parquet(out)
    val stored = spark.read.parquet(out)
    val cells = stored.select("cell").distinct().collect()
      .map(_.getInt(0)).sorted
    assert(cells.length > 4, s"corpus collapsed into ${cells.length} cells")
    val probe = cells.take(4)
    val probed = stored.filter(col("cell").isin(probe.map(Integer.valueOf): _*))
    probed.collect()
    val scan = probed.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan"))
    assert(scan.metrics("numPartitions").value == probe.length,
      s"probe of ${probe.length} cells read " +
        s"${scan.metrics("numPartitions").value} partitions")
    assert(scan.toString.contains("PartitionFilters"),
      "cell predicate did not become a partition filter")
    // and strictly fewer files than the full corpus layout
    assert(scan.metrics("numFiles").value < stored.inputFiles.length,
      s"probe read ${scan.metrics("numFiles").value} of ${stored.inputFiles.length} files")
  }

  test("PQ ADC arithmetic is exact and recall holds a floor") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val nSub = 4; val ks = 16
    val res = Similarity.annPq(e, nSub, ks, 10).collect()
    // shape: 10 contiguous ranks per query
    res.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to 10), s"ranks broken for q$q")
    }
    // ADC exactness: recompute approx_d2 locally for every output row
    // from the raw embeddings + the same codebook — codes by local
    // argmin, table by local subtract-square sums
    val cbFull = Similarity.pqCodebook(e, ks)
    val dim = cbFull.head.length; val sub = dim / nSub
    val vecs = e.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def subD2(v: Array[Double], s: Int, code: Int): Double = {
      var d2 = 0.0; var i = 0
      while (i < sub) {
        val d = v(s * sub + i) - cbFull(code)(s * sub + i); d2 += d * d; i += 1
      }
      d2
    }
    def codesOf(v: Array[Double]): Seq[Int] = (0 until nSub).map { s =>
      (0 until ks).minBy(c => subD2(v, s, c))
    }
    res.foreach { r =>
      val (q, c, got) = (r.getLong(0), r.getLong(1), r.getDouble(3))
      val want = codesOf(vecs(c)).zipWithIndex
        .map { case (code, s) => subD2(vecs(q), s, code) }.sum
      // HALF_UP mirrors Spark's round(), unlike math.rint's HALF_EVEN
      val wantR = BigDecimal(want)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got - wantR) < 1e-12,
        s"ADC mismatch q$q c$c: engine $got local $want")
    }
    // recall floor vs exact brute force (PQ is lossy; the floor gates
    // that the geometry is sane, the oracle gates the arithmetic)
    val bf = Similarity.annBruteforce(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = res.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(pq).size.toDouble / bf.size
    assert(recall >= 0.15, f"PQ recall $recall%.2f below floor")
  }

  test("PQ encoding is a zero-shuffle projection and codes stay in range") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val enc = Similarity.pqEncode(e, Similarity.pqCodebook(e, 16), 4)
    enc.write.mode("overwrite").format("noop").save()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def shuffles(p: SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      val kids: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(shuffles).sum
    }
    assert(shuffles(enc.queryExecution.executedPlan) == 0,
      "PQ encoding pass shuffles — it must be a pure scan projection")
    val rows = enc.collect()
    assert(rows.length == e.count())
    rows.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 4 && cs.forall(c => c >= 0 && c < 16),
        s"codes out of range: $cs")
    }
  }

  test("rerank recall dominates pure-PQ recall and keeps exact scores") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val bf = Similarity.annBruteforce(e).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    val rr = Similarity.annRerank(e, 4, 16, 50, 10).collect()
    rr.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to 10), s"ranks broken for q$q")
    }
    // exact stage: every reranked pair that brute force also ranked
    // must carry the IDENTICAL rounded cosine
    rr.foreach { r =>
      bf.get((r.getLong(0), r.getLong(1))).foreach { s =>
        assert(s == r.getDouble(3),
          s"rerank score drifted from exact: ${r.getLong(0)}→${r.getLong(1)}")
      }
    }
    // recall@10: reranking the wide-50 set with the exact metric can
    // only match or beat the pure-PQ top-10 (true top vectors present
    // in the candidate set always win an exact re-rank)
    val pq = Similarity.annPq(e, 4, 16, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rrSet = rr.map(r => (r.getLong(0), r.getLong(1))).toSet
    val bfSet = bf.keySet
    val recallPq = bfSet.intersect(pq).size.toDouble / bfSet.size
    val recallRr = bfSet.intersect(rrSet).size.toDouble / bfSet.size
    assert(recallRr >= recallPq,
      f"rerank recall $recallRr%.2f below pure PQ $recallPq%.2f")
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

  test("range search returns exactly the above-threshold subset of " +
       "brute-force scores") {
    val all = Similarity.rangeSearch(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(all.nonEmpty)
    assert(all.values.forall(_ >= 0.3), "a below-threshold pair leaked")
    // cross-check against the independently-ranked s1 result: every
    // brute-force top-10 hit for queries 0..4 scoring >= tau must be
    // in the range result with the same score
    Similarity.annBruteforce(spark, sfDir).collect()
      .filter(r => r.getDouble(3) >= 0.3)
      .foreach { r =>
        val key = (r.getLong(0), r.getLong(1))
        assert(all.get(key).contains(r.getDouble(3)),
          s"s1 hit $key missing or score drifted in range result")
      }
  }

  test("maxsim is invariant to token permutation where full-vector " +
       "cosine is not — the late-interaction property") {
    import spark.implicits._
    val a = (1 to 64).map(i => (i % 13 + 1).toFloat).toArray
    // b = a with its 8 token blocks rotated by one position
    val b = (a.slice(8, 64) ++ a.slice(0, 8))
    val e = Seq((0L, a), (1L, b), (2L, a.map(x => (x * 0.5f + 3f))))
      .toDF("vec_id", "embedding")
    val res = Similarity.maxSim(e, 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    // every token of a exists verbatim in b => maxsim(a, b) is the
    // perfect 8.0 even though the vectors differ elementwise
    assert(res((0L, 1L)) == 8.0, s"permuted twin scored ${res((0L, 1L))}")
    val cosAB = e.filter(col("vec_id") === 1).select(
      graft.GraftFunctions.cosineSim(spark, lit(a).cast("array<float>"),
        col("embedding"))).head().getDouble(0)
    assert(cosAB < 0.999, s"full-vector cosine should break under permutation, got $cosAB")
  }

  test("maxsim defines a zero-norm token slice's sub-cosine as 0, " +
       "never NaN") {
    import spark.implicits._
    val a = (1 to 64).map(i => (i % 13 + 1).toFloat).toArray
    // b: token block 0 is all zeros -> its norm is 0; the unguarded
    // division would yield NaN and poison b's whole MaxSim sum
    val b = Array.fill(8)(0.0f) ++ a.slice(8, 64)
    val zero = Array.fill(64)(0.0f) // every slice zero on BOTH sides
    val e = Seq((0L, a), (1L, b), (2L, zero), (3L, a.map(_ * 2f)))
      .toDF("vec_id", "embedding")
    val res = Similarity.maxSim(e, 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(res.values.forall(v => !v.isNaN), s"NaN leaked: $res")
    // all-zero corpus doc scores exactly 0 against any query
    assert(res((0L, 2L)) == 0.0, s"all-zero doc scored ${res((0L, 2L))}")
    // b still earns its 7 intact token matches against a (each
    // sub-cosine 1.0); query token 0 maxes over b's OTHER tokens
    // (< 1.0), the zeroed slice itself contributing 0 — so the total
    // lands in [7, 8), where an unguarded NaN would have erased it
    assert(res((0L, 1L)) >= 7.0 && res((0L, 1L)) < 8.0,
      s"partial-zero doc scored ${res((0L, 1L))}")
  }

  test("semdedup drops planted twins within a cell and never a cell's " +
       "lowest id") {
    import spark.implicits._
    // 20 base vectors + an exact twin of id 3 planted at id 100:
    // identical vectors assign to the same cell, so the twin MUST drop
    // with dup_of <= 3 and max_cos = 1.0
    def vec(seed: Long): Array[Float] =
      Array.tabulate(64)(i => ((seed * 31 + i * 13) % 97 - 48).toFloat)
    val e = ((0L until 20L).map(i => (i, vec(i))) :+ (100L, vec(3L)))
      .toDF("vec_id", "embedding")
    val res = Similarity.semDedup(e, 4, 0.9999).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!res(100L).getBoolean(2), "planted twin not dropped")
    assert(res(100L).getLong(3) <= 3L, "twin attributed to a later doc")
    assert(res(100L).getDouble(4) == 1.0, "twin cosine below 1.0")
    // invariant: the lowest id in every cell is always kept
    val byCell = res.values.groupBy(_.getInt(1))
    byCell.foreach { case (cell, rows) =>
      val minId = rows.map(_.getLong(0)).min
      assert(rows.find(_.getLong(0) == minId).get.getBoolean(2),
        s"cell $cell dropped its lowest id $minId")
    }
    // and on the real corpus the decision covers every vector exactly once
    val full = Similarity.semDedup(spark, sfDir)
    assert(full.count() ==
      spark.read.parquet(s"$sfDir/embeddings.parquet").count())
  }

  test("hybrid search fuses: a both-list doc outranks single-list leaders") {
    import spark.implicits._
    def v(dir: Double*): Array[Float] = dir.map(_.toFloat).toArray
    // query 0; doc 1 = lexical twin but opposite embedding; doc 2 =
    // embedding twin but disjoint words; doc 3 = moderate on BOTH
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),
      (2L, "zu zv zw zx"),
      (3L, "alpha beta yy zz"),
      (4L, "qq rr ss tt")).toDF("doc_id", "text")
    val e = Seq(
      (0L, v(1, 0, 0, 0)), (1L, v(-1, 0.1, 0, 0)), (2L, v(1, 0, 0, 0.001)),
      (3L, v(0.9, 0.3, 0, 0)), (4L, v(0, 0, 1, 0))).toDF("vec_id", "embedding")
    val res = Similarity.hybridSearch(docs, e, 5).collect()
      .filter(_.getLong(0) == 0L)
      .sortBy(_.getInt(5))
      .map(r => (r.getLong(1), Option(r.get(2)), Option(r.get(3))))
    // doc 3 carries BOTH a keyword rank and a strong vector rank —
    // RRF must put it above the lexical-only and vector-only twins
    assert(res.head._1 == 3L, s"fusion failed: $res")
    assert(res.head._2.isDefined && res.head._3.isDefined,
      s"winner should appear in both lists: $res")
    // every emitted row carries at least one leg
    assert(res.forall(r => r._2.isDefined || r._3.isDefined))
  }

  test("hybrid search on the corpus: k ranked rows per query, legs consistent") {
    val res = Similarity.hybridSearch(spark, sfDir).collect()
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(5)).toSeq.sorted == (1 to 10))
      val scores = rows.sortBy(_.getInt(5)).map(_.getDouble(4))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // vec_rank values must agree with s1's independent ranking
    val s1 = Similarity.annBruteforce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    res.filter(r => !r.isNullAt(3) && r.getInt(3) <= 10).foreach { r =>
      assert(s1.get((r.getLong(0), r.getLong(1))).contains(r.getInt(3)),
        s"vec leg diverged from s1 at ${(r.getLong(0), r.getLong(1))}")
    }
  }

  test("maxsim ranks k per query through the native top-k plan") {
    val res = Similarity.maxSim(spark, sfDir).collect()
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(2)).toSeq.sorted == (1 to 10))
      val scores = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
    val plan = Similarity.maxSim(spark, sfDir).queryExecution.executedPlan
    assert(!plan.toString.contains("Window"),
      "maxsim must rank through TopKPerGroup, not a window total sort")
  }

  test("s10 recall eval reproduces the set overlap of s1 and s3 and " +
       "is exact when the approximate path IS the exact path") {
    val exact = Similarity.annBruteforce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val approx = Similarity.annIvfDet(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.recallEval(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L))
    exact.foreach { case (q, rows) =>
      val hit = rows.count(approx.contains)
      val want = (rows.length.toLong, hit.toLong,
        BigDecimal(hit.toDouble / rows.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(got(q) == want, s"q$q: ${got(q)} want $want")
    }
    // at least one query must show a genuine recall deficit at
    // nProbe = 4/16, or the evaluation measures nothing
    assert(got.values.exists(_._3 < 1.0),
      "IVF recall identically 1.0 — eval is vacuous at this config")
  }

  test("cluster profile matches an independent JVM replica") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val rows = e.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val vecs = rows.map(t => t._1 -> t._2).toMap
    val labels = rows.map(t => t._1 -> t._3).toMap
    // replica: same Knuth-hash centroids, cosine argmax with the
    // (sim desc, cell asc) tie-break, 12-dp-rounded cosine mean,
    // smaller-label tie-break for the dominant label
    val k = 16
    val cents = rows.map(_._1).sortBy(id =>
        (((id % 1000000000L) * 2654435761L) % 2147483647L, id))
      .take(k).zipWithIndex.map { case (id, i) => (i + 1, vecs(id)) }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val members = rows.map { case (id, v, _) =>
      val best = cents.map { case (c, cv) => (c, cos(v, cv)) }
        .minBy { case (c, s) => (-s, c) }
      (best._1, id, BigDecimal(best._2).setScale(12,
        BigDecimal.RoundingMode.HALF_UP))
    }.groupBy(_._1)
    val want = members.toSeq.sortBy(_._1).map { case (cell, ms) =>
      val n = ms.size.toLong
      val labs = ms.map(m => labels(m._2)).groupBy(identity)
        .map { case (l, ls) => (l, ls.size.toLong) }
      val (topL, topN) = labs.toSeq.minBy { case (l, c) => (-c, l) }
      (cell.toLong, n, ms.map(_._2).min, ms.map(_._2).max, topL, topN,
        BigDecimal(topN.toDouble / n).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble,
        // the engine's exact op order: exact decimal sum → double →
        // one double division → HALF_UP round
        BigDecimal(ms.map(_._3).sum.toDouble / n.toDouble).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Similarity.clusterProfile(e, k).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"cell ${g._1}: $g vs $w")
    }
    // the profile must be non-degenerate: multiple occupied cells and
    // a cohesion spread (not every cell identically tight)
    assert(got.length > 4 && got.map(_._8).distinct.length > 1)
  }

  test("SQ8 handles a constant dimension (zero range) without dividing " +
       "by zero: code 0, reconstruction = the constant") {
    import spark.implicits._
    // dim 2 is constant 5.0f across the corpus: step = 0 there, so the
    // guard must take the code-0/recon-mn branch; dims 1 and 3 vary
    val e = Seq(
      (0L, Array(0.0f, 5.0f, 1.0f)),
      (1L, Array(1.0f, 5.0f, 0.0f)),
      (2L, Array(2.0f, 5.0f, 2.0f))).toDF("vec_id", "embedding")
    val got = Similarity.annSq(e, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    // replica: mins (0,5,0), steps ((2-0)/256, 0, (2-0)/256)
    val st = 2.0 / 256
    def recon(v: Array[Float]) = Array(
      (math.min(math.max(math.floor(v(0) / st), 0), 255) + 0.5) * st,
      5.0, // constant dim: recon = mn exactly
      (math.min(math.max(math.floor(v(2) / st), 0), 255) + 0.5) * st)
    val vecs = Map(0L -> Array(0.0f, 5.0f, 1.0f),
      1L -> Array(1.0f, 5.0f, 0.0f), 2L -> Array(2.0f, 5.0f, 2.0f))
    val want = vecs.keys.toSeq.sorted.flatMap { q =>
      vecs.toSeq.filter(_._1 != q).map { case (c, cv) =>
        val rv = recon(cv)
        val d2 = (0 until 3).map(i =>
          (vecs(q)(i).toDouble - rv(i)) * (vecs(q)(i).toDouble - rv(i))).sum
        (q, c, d2)
      }.sortBy(p => (p._3, p._2)).take(2).zipWithIndex.map {
        case ((_, c, d2), r) => (q, c, r + 1, BigDecimal(d2).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
  }

  test("SQ8 codec matches an independent JVM replica bit-for-bit and " +
       "recall vs brute force is near-exact") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val dim = vecs.head._2.length
    // independent replica: per-dim ranges -> clamp/floor encode ->
    // midpoint recon -> d² in index order, same op order as the engine
    val mns = (0 until dim).map(i => vecs.values.map(_(i).toDouble).min)
    val sts = (0 until dim).map { i =>
      (vecs.values.map(_(i).toDouble).max - mns(i)) /
        Similarity.SqLevels.toDouble
    }
    def recon(v: Array[Float]): Array[Double] = Array.tabulate(dim) { i =>
      val code = if (sts(i) > 0.0)
        math.min(math.max(math.floor((v(i).toDouble - mns(i)) / sts(i)), 0.0),
          255.0)
      else 0.0
      (code + 0.5) * sts(i) + mns(i)
    }
    val want = (0L until 5L).flatMap { q =>
      val qv = vecs(q)
      vecs.toSeq.filter(_._1 != q).map { case (c, cv) =>
        val rv = recon(cv)
        var d2 = 0.0
        var i = 0
        while (i < dim) {
          val d = qv(i).toDouble - rv(i); d2 += d * d; i += 1
        }
        (q, c, d2)
      }.sortBy(p => (p._3, p._2)).take(Similarity.AnnK)
        .zipWithIndex.map { case ((_, c, d2), r) =>
          (q, c, r + 1, BigDecimal(d2).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }
    val got = Similarity.annSq(e, Similarity.AnnK).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq == want, s"first mismatch: ${
      got.toSeq.zip(want).find { case (g, w) => g != w }}")
    // 8 bits/dim is near-exact: the SQ8 top-10 sets must recall at
    // least 80% of the exact brute-force top-10 (lossier PQ holds a
    // lower floor; SQ8 justifies its 4× memory vs PQ's 64× here)
    val bf = Similarity.annBruteforce(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = got.count(g => bf.contains((g._1, g._2)))
    assert(hits >= (bf.size * 0.8).toInt,
      s"SQ8 recall ${hits.toDouble / bf.size} below the 0.8 floor")
  }

  test("s13 MIPS ranking equals cosine ANN over the norm-augmented " +
       "corpus (the documented scale reduction), and differs from raw " +
       "cosine where norms carry signal") {
    import org.apache.spark.sql.functions._
    val e = Tables.parallel(Tables.load(spark, sfDir, "embeddings"))
    val mips = Similarity.mipsTopk(e).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    // Bachrach et al. 2014: x̃ = [x, sqrt(M² − ‖x‖²)], q̃ = [q, 0];
    // ‖x̃‖ = M ∀x, so cos(q̃, x̃) = ⟨q,x⟩/(‖q‖·M) — monotone in the dot
    // product per query ⇒ identical per-query rankings
    val mx = e.select(sqrt(expr(
      "aggregate(embedding, cast(0.0 as double), (a, x) -> a + x * x)"))
      .as("nrm")).agg(max(col("nrm"))).head().getDouble(0)
    val aug = e.select(col("vec_id"),
      expr(s"""concat(embedding, array(sqrt(
        $mx * $mx - aggregate(embedding, cast(0.0 as double),
          (a, x) -> a + x * x))))""").as("cv"))
    val q = e.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"),
      expr("concat(embedding, array(cast(0.0 as double)))").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    val augTop = broadcast(q)
      .join(aug.select(col("vec_id").as("c_id"), col("cv")),
        col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        graft.GraftFunctions.cosineSim(spark, col("qv"), col("cv")).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= Similarity.AnnK)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(mips.keySet == augTop.keySet && mips.nonEmpty)
    val agree = mips.keys.count(k => mips(k) == augTop(k))
    // float tie-wobble tolerance: the augmented path divides by ‖q̃‖·M
    // where MIPS compares raw dots — allow rank swaps only between
    // adjacent candidates whose dots collide, which the corpus
    // doesn't produce: require exact agreement
    assert(agree == mips.size,
      s"augmented-cosine ranking diverged from MIPS on ${mips.size - agree} slots")
    // and the operator must NOT be cosine in disguise. The synthetic
    // corpus has near-uniform norms (cosine and MIPS top-k happen to
    // coincide there), so the separation is pinned on a PLANTED
    // micro-corpus where the norm IS the signal: c=11 is perfectly
    // aligned with the query but short (dot 1); c=12 is off-axis but
    // long (dot 3). Cosine must prefer the aligned short vector,
    // MIPS the long one.
    import spark.implicits._
    val planted = Seq(
      (0L, Array(1.0f, 0.0f), 0L),
      (11L, Array(1.0f, 0.0f), 0L),
      (12L, Array(3.0f, 3.0f), 0L),
      (13L, Array(-1.0f, 0.0f), 0L)).toDF("vec_id", "embedding", "label")
    val pm = Similarity.mipsTopk(planted, k = 3).collect()
      .map(r => r.getInt(2) -> r.getLong(1)).toMap
    assert(pm(1) == 12L && pm(2) == 11L && pm(3) == 13L,
      s"MIPS ignored the norm signal: $pm")
    val pc = Similarity.annBruteforceK(planted, 3).collect()
      .map(r => r.getInt(3) -> r.getLong(1)).toMap
    assert(pc(1) == 11L && pc(2) == 12L,
      s"cosine baseline lost its alignment preference: $pc")
  }

  test("s14 MMR equals a JVM greedy replica on the real corpus and " +
       "demotes a planted near-duplicate a plain top-k keeps adjacent") {
    import spark.implicits._
    val e = Tables.load(spark, sfDir, "embeddings")
    // JVM replica of the identical quantized greedy
    def q9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def replica(emb: Map[Long, Array[Float]], qIds: Seq[Long])
        : Map[(Long, Long), (Long, Double)] = {
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var dt = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dt += x * y; na += x * x; nb += y * y; i += 1
        }
        dt / (math.sqrt(na) * math.sqrt(nb))
      }
      qIds.flatMap { q =>
        val scored = emb.keys.filter(_ != q).toSeq
          .map(c => (q9(cos(emb(q), emb(c))), c))
          .sortBy { case (s, c) => (-s, c) }.take(Similarity.MmrWide)
        val simq = scored.map { case (s, c) => c -> s }.toMap
        val cand = scored.map(_._2)
        var sel = List.empty[Long]
        (1 to Similarity.MmrK).map { step =>
          val (winner, score) = cand.filterNot(sel.contains)
            .map { c =>
              // max over the SELECTED set — negative similarity is a
              // diversity BONUS, not floored at 0 (only an empty set
              // contributes nothing)
              val ms = if (sel.isEmpty) 0.0
                else sel.map(s => q9(cos(emb(c), emb(s)))).max
              (c, q9(0.7 * simq(c) - 0.3 * ms))
            }
            .minBy { case (c, s) => (-s, c) }
          sel = sel :+ winner
          (q, step.toLong) -> ((winner,
            BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble))
        }
      }.toMap
    }
    val emb = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = Similarity.mmrRerank(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == replica(emb, 0L until 5L), {
      val want = replica(emb, 0L until 5L)
      s"diff: ${(want.toSet -- got.toSet).take(3)} vs ${(got.toSet -- want.toSet).take(3)}"
    })
    // planted diversity win: query q; a and a' near-identical and most
    // relevant; b distinct and slightly less relevant. Plain top-2 =
    // (a, a'); MMR keeps a then PREFERS b (a' pays the redundancy
    // penalty). ids < 5 are queries, so plant q at id 0
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    // sim(q,·): a ≈ .8985 > a' ≈ .8944 > b ≈ .8924 — plain rank (a, a');
    // but cos(a, a') ≈ .99996 while cos(a, b) ≈ .6035, so MMR step 2:
    // score(a') ≈ .7·.8944 − .3·1 ≈ .326 < score(b) ≈ .7·.8924 −
    // .3·.604 ≈ .444 — b overtakes
    val planted = Seq(
      0L -> v(1.0, 0.0, 0.0, 0.0),     // the query
      10L -> v(0.9, 0.44, 0.0, 0.0),   // a
      11L -> v(0.9, 0.45, 0.0, 0.0),   // a' ≈ a
      12L -> v(0.87, -0.44, 0.0, 0.0), // b: same relevance tier, far side
      13L -> v(0.0, 0.1, 0.0, 1.0),    // filler
      1L -> v(0.0, 1.0, 0.0, 0.0), 2L -> v(0.0, 0.0, 1.0, 0.0),
      3L -> v(0.0, 0.0, 0.0, 1.0), 4L -> v(0.5, 0.5, 0.0, 0.0))
    val pdf = planted.toDF("vec_id", "embedding")
    val topPlain = Similarity.annBruteforce(pdf)
      .filter(col("q_id") === 0L).orderBy("rnk")
      .collect().map(_.getLong(1)).take(2).toSeq
    assert(topPlain == Seq(10L, 11L),
      s"planted corpus lost the adjacent near-dup property: $topPlain")
    val mmr = Similarity.mmrRerank(pdf, wide = 4, k = 2)
      .filter(col("q_id") === 0L).orderBy("mmr_rank")
      .collect().map(_.getLong(2)).toSeq
    assert(mmr == Seq(10L, 12L),
      s"MMR failed to demote the near-duplicate: $mmr")
  }

  test("IVF append: batch assignment under frozen centroids equals the " +
       "batch slice of a full union re-assignment") {
    // the law that makes append-without-retrain safe: with centroids
    // FROZEN, assignment is per-row, so assigning only the batch must
    // be bit-identical to re-assigning the whole union and slicing out
    // the batch ids. If an implementation ever derives centroids from
    // the union (a silent retrain), this breaks.
    val e = Tables.load(spark, sfDir, "embeddings")
    val h = pmod(pmod(col("vec_id"), lit(1000000000L)) * lit(2654435761L),
      lit(100))
    val index = e.filter(h < Similarity.IvfAppendSplit)
    val batch = e.filter(h >= Similarity.IvfAppendSplit)
    val cents = Similarity.ivfCentroids(index, Similarity.IvfAppendK)
    val direct = Similarity.ivfAssign(batch, cents)
      .select(col("c_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batchIds = direct.keySet
    val viaUnion = Similarity.ivfAssign(index.union(batch), cents)
      .select(col("c_id"), col("cell")).collect()
      .filter(r => batchIds(r.getLong(0)))
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(direct.nonEmpty, "empty batch — split broken")
    assert(direct == viaUnion, "append diverged from union re-assignment")
  }

  test("IVF append audit: planted far-off batch mass trips the drift " +
       "retrain flag, nearby mass does not") {
    import spark.implicits._
    // two tight index clusters on the axes (3 members each); k = 2
    // hash-selected centroids land one per cluster (ids 1 and 5 carry
    // the two smallest Knuth hashes of 1..6)
    val index = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.05f)), (3L, Seq(1.0f, -0.05f)),
      (4L, Seq(0.0f, 1.0f)), (5L, Seq(0.05f, 1.0f)), (6L, Seq(-0.05f, 1.0f)))
      .toDF("vec_id", "embedding")
    // batch: one vector snug inside cluster A, one far from every
    // centroid (lands somewhere, but with a collapsed cosine)
    val batch = Seq(
      (101L, Seq(1.0f, 0.02f)), (102L, Seq(-1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.ivfAppendFrom(index, batch, 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(6), r.getBoolean(7)))
    assert(got.length == 2 && got.map(_._1).sum == 6 &&
      got.map(_._2).sum == 2, got.mkString(","))
    // growth never triggers here (2·1 < 3); retrain is drift-only
    val flagged = got.filter(_._4)
    assert(flagged.length == 1, s"expected exactly one flagged cell: " +
      got.mkString(","))
    assert(flagged.head._3 <= -0.02 &&
      got.filterNot(_._4).head._3 > -0.02,
      s"drift/flag inconsistent: ${got.mkString(",")}")
  }

  test("s16 k-center equals a JVM farthest-first replica and one pick " +
       "lands in each planted cluster") {
    import spark.implicits._
    val e = Tables.load(spark, sfDir, "embeddings")
    def q9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dt = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dt += x * y; na += x * x; nb += y * y; i += 1
      }
      dt / (math.sqrt(na) * math.sqrt(nb))
    }
    def replica(emb: Map[Long, Array[Float]], k: Int)
        : Seq[(Long, Long, Double)] = {
      val seed = emb.keys.min
      var sel = Vector((1L, seed, 0.0))
      var md = emb.keys.filter(_ != seed)
        .map(v => v -> (1.0 - q9(cos(emb(v), emb(seed))))).toMap
      for (step <- 2 to k) {
        val (w, d) = md.toSeq.minBy { case (v, dd) => (-dd, v) }
        sel = sel :+ ((step.toLong, w, r6(d)))
        md = (md - w).map { case (v, m) =>
          v -> math.min(m, 1.0 - q9(cos(emb(v), emb(w)))) }
      }
      sel
    }
    val emb = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = Similarity.kcenterSelect(e, Similarity.KCenterK).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = replica(emb, Similarity.KCenterK)
    assert(got == want, s"got $got\nwant $want")
    // the coverage radius can only shrink as picks accumulate
    val ds = got.drop(1).map(_._3)
    assert(ds == ds.sorted.reverse, s"coverage trace not non-increasing: $ds")
    // three tight planted clusters, k = 3: farthest-first must take
    // exactly one pick from each (a random or top-density pick won't)
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val planted = Seq(
      0L -> v(1.0, 0.0, 0.0, 0.0), 1L -> v(0.99, 0.01, 0.0, 0.0),
      2L -> v(0.98, 0.02, 0.0, 0.0),
      10L -> v(0.0, 1.0, 0.0, 0.0), 11L -> v(0.01, 0.99, 0.0, 0.0),
      20L -> v(0.0, 0.0, 1.0, 0.0), 21L -> v(0.0, 0.01, 0.99, 0.0))
      .toDF("vec_id", "embedding")
    val picks = Similarity.kcenterSelect(planted, 3).collect()
      .map(_.getLong(1)).toSeq
    assert(picks.head == 0L, s"seed must be the min id: $picks")
    assert(picks.map(_ / 10L).toSet == Set(0L, 1L, 2L),
      s"picks $picks did not cover all three clusters")
  }

  test("s17 NN-Descent: rounds strictly improve recall vs the exact " +
       "k-NN graph, output shape is a valid k-regular ranking") {
    import graft.operators.Similarity
    val e = graft.Tables.parallel(
      graft.Tables.load(spark, sfDir, "embeddings"))
    val spark0 = spark
    // exact k-NN graph (the s1 machinery over EVERY node — n² is fine
    // at spec scale; the operator never builds this)
    val vecs = e.select(col("vec_id"), col("embedding"))
    val exact = vecs.select(col("vec_id").as("v"), col("embedding").as("ev"))
      .join(vecs.select(col("vec_id").as("u"), col("embedding").as("eu")),
        col("v") =!= col("u"))
      .select(col("v"), col("u"),
        round(graft.GraftFunctions.cosineSim(spark0, col("ev"), col("eu")), 9)
          .as("s"))
      .withColumn("rnk", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy("v").orderBy(col("s").desc, col("u"))))
      .filter(col("rnk") <= Similarity.KnnK)
      .select(col("v"), col("u")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def edges(rounds: Int): Set[(Long, Long)] =
      Similarity.knnGraph(e, Similarity.KnnK, rounds).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(g: Set[(Long, Long)]): Double =
      g.count(exact.contains).toDouble / exact.size
    val r0 = recall(edges(0))
    val r1 = recall(edges(1))
    val r2 = recall(edges(2))
    val r4 = recall(edges(Similarity.KnnRounds))
    // the hash init is random noise; each local-join round must climb
    // (this synthetic corpus is near-uniform in 64-d — NN-Descent's
    // WORST case, no cluster structure to exploit — so the floor is
    // honest for unstructured data; structured corpora converge faster)
    assert(r0 < 0.1, s"random init suspiciously good: $r0")
    assert(r1 > r0 && r2 > r1 && r4 > r2,
      s"refinement not monotone: $r0 -> $r1 -> $r2 -> $r4")
    assert(r2 >= 0.55, s"round-2 recall floor: $r0 -> $r1 -> $r2")
    assert(r4 >= 0.7, s"contract-rounds recall floor: $r4")
    info(s"recall@${Similarity.KnnK}: init $r0, r1 $r1, r2 $r2, " +
      s"r${Similarity.KnnRounds} $r4")
    // shape: every node present with exactly k dense ranks 1..k
    val out = Similarity.knnGraph(e, Similarity.KnnK, Similarity.KnnRounds)
      .collect()
    val n = e.count()
    assert(out.length == n * Similarity.KnnK, s"not k-regular: ${out.length}")
    val byV = out.groupBy(_.getLong(0))
    assert(byV.forall(_._2.map(_.getInt(1)).sorted.toSeq
      == (1 to Similarity.KnnK)), "ranks not dense 1..k")
    assert(out.forall(r => r.getLong(0) != r.getLong(2)), "self edge")
  }

  test("s18 graph search: recall vs the exact top-k climbs with hops " +
       "and candidate volume stays corpus-independent") {
    import graft.operators.Similarity
    val e = graft.Tables.parallel(
      graft.Tables.load(spark, sfDir, "embeddings"))
    val exact = Similarity.annBruteforce(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def got(hops: Int): Set[(Long, Long)] =
      Similarity.graphSearch(e, Similarity.KnnK, Similarity.KnnRounds,
        Similarity.SearchBeam, hops).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(g: Set[(Long, Long)]): Double =
      g.count(exact.contains).toDouble / exact.size
    val r1 = recall(got(1))
    val rH = recall(got(Similarity.SearchHops))
    assert(rH >= r1, s"more hops lost recall: $r1 -> $rH")
    assert(rH >= 0.6, s"contract-hops recall floor: $r1 -> $rH")
    // the scale property: candidates scored per query are bounded by
    // 1 + hops·beam·k — independent of corpus size (s1 scans all n)
    val n = e.count()
    val bound = 1 + Similarity.SearchHops.toLong *
      Similarity.SearchBeam * Similarity.KnnK
    assert(bound < n, s"spec corpus too small to show the bound")
    // output shape: 5 queries × AnnK dense ranks, no self hits
    val out = Similarity.graphSearch(e, Similarity.KnnK,
      Similarity.KnnRounds, Similarity.SearchBeam,
      Similarity.SearchHops).collect()
    assert(out.length == 5 * Similarity.AnnK, s"shape: ${out.length}")
    assert(out.forall(r => r.getLong(0) != r.getLong(1)), "self hit")
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.forall(_._2.map(_.getInt(2)).sorted.toSeq
      == (1 to Similarity.AnnK)), "ranks not dense")
    info(s"s18 recall@${Similarity.AnnK}: hop1 $r1, " +
      s"hop${Similarity.SearchHops} $rH (exact candidates bound $bound of $n)")
  }

  test("s19 PCA: recovers a planted rotated 2-D structure exactly, " +
       "corpus axes ordered by variance") {
    import spark.implicits._
    // structure: x_k = t_k·d̂1 + u_k·d̂2 with d1 = (1,1,0,0)/√2 and
    // d2 = (1,-1,0,0)/√2, Σt = Σu = Σt·u = 0 — the scatter matrix is
    // exactly λ1=Σt²=10 on d1 and λ2=Σu²=1 on d2, so pc1 = t and
    // pc2 = u in the unit basis (sign pinned by the first-component
    // convention; the rotation keeps the e₁ start out of both null
    // spaces)
    val t = Seq(-2.0, -1.0, 0.0, 1.0, 2.0)
    val u = Seq(0.5, -0.5, -0.5, 0.5, 0.0)
    val s2 = math.sqrt(2.0)
    val vecs = t.zip(u).zipWithIndex.map { case ((tk, uk), k) =>
      (k.toLong, Array(((tk + uk) / s2).toFloat, ((tk - uk) / s2).toFloat,
        0.0f, 0.0f), k)
    }.toDF("vec_id", "embedding", "label")
    val got = Similarity.pcaEmbed(vecs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    t.zip(u).zipWithIndex.foreach { case ((tk, uk), k) =>
      val (p1, p2) = got(k.toLong)
      assert(math.abs(p1 - tk) < 1e-3 && math.abs(p2 - uk) < 1e-3,
        s"vec $k: ($p1, $p2) != ($tk, $uk)")
    }
    // sf corpus: 500 coordinates, first axis carries at least as much
    // empirical variance as the second
    val sf = Similarity.pcaEmbed(spark, sfDir).collect()
    assert(sf.length == 500)
    def variance(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val v1 = variance(sf.map(_.getDouble(2)).toSeq)
    val v2 = variance(sf.map(_.getDouble(3)).toSeq)
    assert(v1 >= v2 - 1e-9, s"axis order violated: $v1 < $v2")
  }

  test("s20 binary quantization: exact sign packs, opposite vectors at " +
       "Hamming 64, recall vs the exact top-k measured and floored") {
    import spark.implicits._
    // pack: first half all-positive → 2³²−1; second half alternating
    // +/− from + → 0b1010…10 = 0xAAAAAAAA
    val v = (Array.fill(32)(0.5f) ++
      (0 until 32).map(i => if (i % 2 == 0) 0.5f else -0.5f)).toArray
    val packed = Similarity.withBqWords(
        Seq((0L, v, 0), (1L, v.map(-_), 0)).toDF("vec_id", "embedding", "label"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(packed(0L) == (((1L << 32) - 1L, 0xAAAAAAAAL)), packed.toString)
    // negation flips every sign bit (no zero entries planted)
    assert(packed(1L) == ((0L, 0x55555555L)), packed.toString)
    // end-to-end: the negated twin lands at Hamming 64, the identical
    // twin at Hamming 0 with cosine 1
    val trio = Seq((0L, v, 0), (1L, v.map(-_), 0), (2L, v.clone, 0))
      .toDF("vec_id", "embedding", "label")
    val res = Similarity.bqHamming(trio, k = 2, cand = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    assert(res((0L, 2L)) == ((0L, 1.0)), res.toString)
    assert(res((0L, 1L)) == ((64L, -1.0)), res.toString)
    // corpus recall@k of the BQ two-stage vs s1's exact scan — the
    // sign sketch must recover most of the true neighbourhood from a
    // 50-deep pool
    val e = Tables.parallel(Tables.load(spark, sfDir, "embeddings"))
    val exact = Similarity.annBruteforce(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bq = Similarity.bqHamming(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & bq).size.toDouble / exact.size
    info(s"s20 recall@10 from ${Similarity.BqCandidates} candidates: $recall")
    assert(recall >= 0.5, s"BQ recall collapsed: $recall")
  }

  test("s21 IVF-PQ: dense ranks, ADC arithmetic exact against a full " +
       "local replica, candidates confined to probed cells") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val kCells = 16; val nProbe = 4; val nSub = 4; val ks = 16
    val s21 = Similarity.ivfPq(e, kCells, nProbe, nSub, ks, 10).collect()
    s21.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to 10),
        s"ranks broken for q$q") }
    // full local replica of the pipeline: hash centroids → cosine
    // argmax assignment → residuals → hash residual codebook →
    // per-subspace argmin codes → per-(query, cell) ADC tables
    val all = e.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val vecs = all.toMap
    def knuth(id: Long) = ((id % 1000000000L) * 2654435761L) % 2147483647L
    val cents = all.sortBy(v => (knuth(v._1), v._1)).take(kCells)
      .map(_._2).zipWithIndex.map { case (v, i) => (i + 1, v) }
    def cos(a: Array[Double], b: Array[Double]) = {
      val dt = a.zip(b).map { case (x, y) => x * y }.sum
      dt / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def assignOf(v: Array[Double]): Int =
      cents.map { case (c, cv) => (c, cos(v, cv)) }
        .maxBy { case (c, s) => (s, -c) }._1
    val cellOf = all.map { case (id, v) => id -> assignOf(v) }.toMap
    def resid(id: Long): Array[Double] = {
      val c = cents(cellOf(id) - 1)._2
      vecs(id).zip(c).map { case (x, y) => x - y }
    }
    val cb = all.map(_._1).sortBy(id => (knuth(id), id)).take(ks).map(resid)
    val dim = 64; val sub = dim / nSub
    def subD2(v: Array[Double], s: Int, code: Int): Double = {
      var d2 = 0.0; var i = 0
      while (i < sub) {
        val d = v(s * sub + i) - cb(code)(s * sub + i); d2 += d * d; i += 1 }
      d2
    }
    def codesOf(rv: Array[Double]): Seq[Int] =
      (0 until nSub).map(s => (0 until ks).minBy(c => subD2(rv, s, c)))
    def probesOf(q: Long): Seq[Int] =
      cents.map { case (c, cv) => (c, cos(vecs(q), cv)) }
        .sortBy { case (c, s) => (-s, c) }.take(nProbe).map(_._1)
    s21.foreach { r =>
      val (q, c, got) = (r.getLong(0), r.getLong(1), r.getDouble(3))
      assert(probesOf(q).contains(cellOf(c)),
        s"candidate $c outside q$q's probed cells")
      val qres = vecs(q).zip(cents(cellOf(c) - 1)._2)
        .map { case (x, y) => x - y }
      val want = codesOf(resid(c)).zipWithIndex
        .map { case (code, s) => subD2(qres, s, code) }.sum
      val wantR = BigDecimal(want)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got - wantR) < 1e-9, s"ADC drift q$q c$c: $got vs $wantR")
    }
    // honest fidelity note: on THIS near-uniform corpus the residual
    // codebook does NOT beat s4's raw codebook (residuals only
    // concentrate under real cluster structure) — recorded, not
    // asserted; the operator's value here is the index SHAPE
    def meanErr(rows: Array[org.apache.spark.sql.Row]): Double =
      rows.map { r =>
        val (q, c) = (r.getLong(0), r.getLong(1))
        val t = vecs(q).zip(vecs(c)).map { case (x, y) => (x - y) * (x - y) }.sum
        math.abs(r.getDouble(3) - t) }.sum / rows.length
    info(s"mean ADC error: s21 ${meanErr(s21)} vs " +
      s"s4 ${meanErr(Similarity.annPq(e, nSub, ks, 10).collect())} " +
      "(near-uniform corpus: no residual advantage expected)")
  }

  test("s22 HNSW hierarchy: the coarse layer routes a far-from-entry " +
       "query that strands s18's fixed-entry beam, and the corpus run " +
       "keeps s18's output shape") {
    import spark.implicits._
    // 100 unit vectors on a smooth arc: curve position p has
    // v_p = (cos(p·θ), sin(p·θ)) with θ = π/220, so top-10 cosine
    // neighbors are the ±5 adjacent positions and a beam walks the
    // arc ~5 positions per hop. Queries are HARDWIRED to ids 1..4 by
    // the operator; place them at the FAR end of the arc (positions
    // 96..99) while id 0 (s18's fixed entry) sits at position 0: four
    // hops from position 0 reach ~position 25, so the flat beam can
    // NEVER see the queries' true neighborhood; the coarse layer's
    // ~12-node graph spans the whole arc in 3 hops and routes the
    // base beam to the right region.
    val n = 100
    val theta = math.Pi / 220.0
    // id 0 -> position 0; ids 1..4 -> positions 96..99; ids 5..99 ->
    // positions 1..95 in order
    def posOf(id: Int): Int =
      if (id == 0) 0 else if (id <= 4) 95 + id else id - 4
    val e = (0 until n).map { id =>
      val p = posOf(id)
      (id.toLong, Array(math.cos(p * theta).toFloat,
        math.sin(p * theta).toFloat))
    }.toDF("vec_id", "embedding")
    def top1(rows: Array[org.apache.spark.sql.Row]) = rows
      .filter(_.getInt(2) == 1)
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val flat = top1(Similarity.graphSearch(e, Similarity.KnnK,
      Similarity.KnnRounds, Similarity.SearchBeam,
      Similarity.SearchHops).collect())
    val hier = top1(Similarity.hnswSearch(e, Similarity.KnnK,
      Similarity.KnnRounds, Similarity.SearchBeam,
      Similarity.SearchHops).collect())
    // for every stranded query the hierarchy's best hit is strictly
    // better — and essentially exact (an arc neighbor: cos(θ·d) with
    // d <= 3 => score > 0.999)
    (1L to 4L).foreach { q =>
      assert(hier(q)._2 > flat(q)._2,
        s"hierarchy no better for q$q: ${hier(q)} vs ${flat(q)}")
      assert(hier(q)._2 > 0.999, s"hierarchy missed the neighborhood: " +
        s"q$q -> ${hier(q)}")
      assert(flat(q)._2 < 0.9, s"flat beam unexpectedly reached q$q's " +
        s"neighborhood: ${flat(q)} (plant broken)")
    }
    // corpus: s18's exact output shape — 5 queries x top-10, scores
    // descending per query, no self hits
    val sf = Similarity.hnswSearch(
      graft.Tables.load(spark, sfDir, "embeddings"),
      Similarity.KnnK, Similarity.KnnRounds, Similarity.SearchBeam,
      Similarity.SearchHops).collect()
    assert(sf.length == 50, s"corpus rows: ${sf.length}")
    assert(sf.forall(r => r.getLong(0) != r.getLong(1)), "self hit")
    sf.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val scores = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("s23 rank eval: bitwise JVM replica from the two gated " +
       "rankings, n_hit agrees with s10, NDCG and RR live on their " +
       "scales") {
    val sim = graft.operators.Similarity
    val e = graft.Tables.parallel(
      graft.Tables.load(spark, sfDir, "embeddings"))
    val exact = sim.annBruteforce(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (11 - r.getInt(2))).toMap
    val approx = sim.annIvfDet(e, 16, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // replica: the identical round-12 decimal term grid and single
    // rounded divisions, in plain Scala
    def r(d: Double, s: Int) = BigDecimal(d)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val rep = approx.groupBy(_._1).map { case (q, rows) =>
      val terms = rows.map { case (_, c, pos) =>
        r(exact.getOrElse((q, c), 0).toDouble * sim.NdcgW(pos - 1), 12) }
      val nHit = terms.count(_ > 0).toLong
      val ndcg = r((terms.sum.toDouble / sim.NdcgIdeal), 6).toDouble
      val rr = rows.collectFirst {
        case (_, c, pos) if exact.get((q, c)).contains(10) =>
          r(1.0 / pos, 6).toDouble }.getOrElse(0.0)
      q -> ((nHit, ndcg, rr))
    }
    val got = sim.rankEval(e).collect()
      .map(r0 => r0.getLong(0) -> ((r0.getLong(1), r0.getDouble(2),
        r0.getDouble(3)))).toMap
    assert(got == rep, s"replica diverged:\n$got\nvs\n$rep")
    // n_hit is s10's overlap census (same index, same queries)
    val s10 = sim.recallEval(e).collect()
      .map(r0 => r0.getLong(0) -> r0.getLong(2)).toMap
    assert(got.view.mapValues(_._1).toMap == s10,
      s"n_hit disagrees with s10: $got vs $s10")
    // scales: NDCG a share, RR in {0} ∪ {1/1..1/10}
    assert(got.values.forall { case (_, n, rr) =>
      n >= 0.0 && n <= 1.0 && rr >= 0.0 && rr <= 1.0 })
  }

  test("s24 probe sweep: ladder complete, cost and recall monotone, " +
       "nProbe=4 rung pools exactly s10's hit census, micro = macro " +
       "under equal truth sizes") {
    val sim = graft.operators.Similarity
    val e = graft.Tables.parallel(
      graft.Tables.load(spark, sfDir, "embeddings"))
    val rows = sim.probeSweep(e, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // one row per rung, in ladder order
    assert(rows.map(_._1).toSeq == sim.SweepProbes.map(_.toLong),
      rows.mkString(";"))
    // widening the probe set can only add candidates AND hits (every
    // rung's candidate set is a superset of the previous rung's)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3 && b._4 >= a._4 && b._6 >= a._6 - 1e-12,
        s"non-monotone: $a -> $b")
      case _ => }
    // the nProbe=4 rung IS s10's configuration: pooled hits must match
    val s10hits = sim.recallEval(e).collect().map(_.getLong(2)).sum
    val rung4 = rows.find(_._1 == 4L).get
    assert(rung4._4 == s10hits, s"rung4 $rung4 vs s10 $s10hits")
    // every query has the same truth size (s1 always fills k = 10
    // on this corpus), so micro and macro recall coincide exactly
    rows.foreach { r =>
      assert(r._5 == r._2 * 10 && r._6 == r._7, r.toString) }
  }
}
