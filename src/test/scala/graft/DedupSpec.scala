package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Plants near-duplicates in a synthetic documents table and asserts
  * the signature-based dedup operators find them (the real corpus has
  * none, so the verify gate only proves they run clean there). */
class DedupSpec extends SparkSpec {

  private lazy val dupDir: String = {
    val dir = Files.createTempDirectory("graft-dedup").toString
    val base = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    import spark.implicits._
    val texts = base.select("doc_id", "text").as[(Long, String)].collect()
    // 3 exact copies + 2 near copies (one word appended / one dropped)
    val planted = texts.take(3).map { case (id, t) => (1000L + id, t) } ++
      texts.slice(3, 5).map { case (id, t) =>
        (2000L + id, if (id % 2 == 0) t + " extra" else t.split(" ").dropRight(1).mkString(" "))
      }
    val extra = planted.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("dup"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    base.select("doc_id", "text", "lang", "source", "n_chars").union(extra)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup finds planted exact copies") {
    val res = Dedup.exact(spark, dupDir)
    val dups = res.filter(col("n_copies") > 1).count()
    assert(dups == 3, s"expected 3 duplicate groups, got $dups")
  }

  test("minhash LSH flags exact and near duplicates as candidates") {
    val res = Dedup.minhashLsh(spark, dupDir)
    val flagged = res.filter(col("n_dup_candidates") > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every planted copy and its original must be flagged
    assert(Set(0L, 1L, 2L, 1000L, 1001L, 1002L).subsetOf(flagged),
      s"exact-copy pairs missing from $flagged")
    assert(flagged.exists(_ >= 2000L), s"near-dup copies not flagged: $flagged")
  }

  test("simhash flags near duplicates within hamming distance") {
    val res = Dedup.simhash(spark, dupDir)
    val flagged = res.filter(col("n_near") > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(Set(0L, 1L, 2L, 1000L, 1001L, 1002L).subsetOf(flagged),
      s"exact-copy pairs missing from $flagged")
  }

  test("fused shingle hashes equal the composed split/concat/hash form") {
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val edges = Seq((9001L, ""), (9002L, "one"), (9003L, "one two"),
      (9004L, "a  b   c"), (9005L, "trailing space "), (9006L, " leading"),
      (9007L, (1 to 50).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val docs = corpus.union(edges)
    val diff = docs.select(col("doc_id"),
        array_sort(graft.GraftFunctions.wordShingleHashes(col("text"), 3)).as("fused"),
        array_sort(array_distinct(
          graft.operators.Dedup.composedShingleHashes(col("text")))).as("composed"))
      .filter(col("fused") =!= col("composed"))
    assert(diff.count() == 0,
      s"fused/composed shingle hashes diverge: ${diff.take(3).mkString(";")}")
    // and the string-valued sibling against the composed string form
    val sdiff = docs.select(col("doc_id"),
        array_sort(graft.GraftFunctions.wordShingles(col("text"), 3)).as("fused"),
        array_sort(expr(
          """array_distinct(transform(
               sequence(1, greatest(size(split(text, ' ')) - 2, 1)),
               i -> concat_ws(' ', slice(split(text, ' '), i, 3))))""")).as("composed"))
      .filter(col("fused") =!= col("composed"))
    assert(sdiff.count() == 0,
      s"fused/composed shingle strings diverge: ${sdiff.take(3).mkString(";")}")
  }

  test("aggregated minhash signatures equal the nested-HOF form bit-for-bit") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val agg = Dedup.minhashSigs(docs)
    val hof = docs.select(col("doc_id"), Dedup.minhashSignature("text").as("sig"))
    val diff = agg.as("a").join(hof.as("h"), Seq("doc_id"))
      .filter(col("a.sig") =!= col("h.sig"))
    assert(diff.count() == 0, "explode+agg signatures diverge from HOF fold")
  }

  test("dedup pipeline is identical under reliable checkpointing") {
    import spark.implicits._
    val words = (1 to 40).map(i => s"tok$i")
    val a = words.mkString(" ")
    val b = (words.dropRight(1) :+ "changedend").mkString(" ")
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val docs = Seq((20L, a), (21L, b), (22L, unrelated)).toDF("doc_id", "text")
    val local = Dedup.dedupPipeline(docs, 0.5).collect().map(_.toSeq).toSeq
    val ckptDir = Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set("spark.graft.checkpointDir", ckptDir)
    try {
      val reliable = Dedup.dedupPipeline(docs, 0.5).collect().map(_.toSeq).toSeq
      assert(reliable == local,
        s"reliable-checkpoint run diverges: $reliable vs $local")
      // prove the reliable path actually ran: checkpoint files on disk
      val written = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(written > 0, "no checkpoint files written to the reliable dir")
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("cluster-size histogram counts singletons and planted clusters") {
    import spark.implicits._
    val words = (1 to 40).map(i => s"tok$i")
    val a = words.mkString(" ")
    val b = (words.dropRight(1) :+ "changedend").mkString(" ")
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val docs = Seq((30L, a), (31L, b), (32L, unrelated)).toDF("doc_id", "text")
    val hist = Dedup.clusterHistogram(Dedup.dedupPipeline(docs, 0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one 2-cluster (a~b) and one singleton
    assert(hist == Map(1L -> 1L, 2L -> 1L), s"unexpected histogram $hist")
  }

  test("sequence alignment ranks an exact query match first") {
    import spark.implicits._
    val q = "the fast key order sort table scan merge"
    val docs = Seq(
      (1L, q),
      (2L, q + " extra tail"),
      (3L, "completely unrelated words about nothing at all"),
      (4L, "the fast key order sort merge")).toDF("doc_id", "text")
    val res = Dedup.sequenceAlign(docs, q).collect()
    assert(res.head.getLong(0) == 1L && res.head.getLong(2) == 0L,
      s"exact match not first with distance 0: ${res.head}")
    val dists = res.map(_.getLong(2)).toSeq
    assert(dists == dists.sorted, s"not sorted by edit distance: $dists")
  }

  test("source overlap matrix computes planted pairwise shingle jaccard") {
    import spark.implicits._
    // A: two docs, 4 distinct shingles; B: one doc equal to A's first
    // (2 shingles, all shared); C: disjoint → no row at all
    val docs = Seq(
      (1L, "a b c d", "srcA"),
      (2L, "x y z w", "srcA"),
      (3L, "a b c d", "srcB"),
      (4L, "q r s t", "srcC")).toDF("doc_id", "text", "source")
    val rows = Dedup.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(("srcA", "srcB", 2L, 0.5)),
      s"unexpected overlap matrix: ${rows.toSeq}")
  }

  test("banded SW is blast-like: an embedded query aligns at full score") {
    import spark.implicits._
    val q = "the fast key order sort table scan merge"
    // doc 2 CONTAINS the query inside a long unrelated text — local
    // alignment gives it the perfect score 2·|q| that a global edit
    // distance (b2) would bury under the flanking text's deletions
    val docs = Seq(
      (1L, q),
      (2L, "aaaa bbbb cccc dddd eeee " + q + " ffff gggg hhhh iiii jjjj"),
      (3L, "completely unrelated words about nothing at all"),
      (4L, "the fast key order sort merge")).toDF("doc_id", "text")
    val res = Dedup.bandedAlign(docs, q, 8).collect()
    val byId = res.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(1L) == 2L * q.length, s"exact doc not full score: ${byId(1L)}")
    assert(byId(2L) == 2L * q.length,
      s"embedded query not full score (seed diagonal / band failed): ${byId(2L)}")
    assert(byId(2L) > byId(4L) && byId(4L) > byId(3L),
      s"ranking not by local alignment quality: $byId")
  }

  test("banded SW with a covering band equals a full unbanded Gotoh reference") {
    import spark.implicits._
    // reference: classic full-matrix affine-gap local alignment
    def fullSW(t: String, q: String, ms: Int, mm: Int, go: Int, ge: Int): Int = {
      val inf = Int.MinValue / 4
      val n = t.length; val m = q.length
      val H = Array.fill(m + 1, n + 1)(0)
      val E = Array.fill(m + 1, n + 1)(inf)
      val F = Array.fill(m + 1, n + 1)(inf)
      var best = 0
      for (i <- 1 to m; j <- 1 to n) {
        E(i)(j) = math.max(H(i)(j - 1) - go, E(i)(j - 1) - ge)
        F(i)(j) = math.max(H(i - 1)(j) - go, F(i - 1)(j) - ge)
        val s = if (t.charAt(j - 1) == q.charAt(i - 1)) ms else mm
        H(i)(j) = math.max(math.max(0, H(i - 1)(j - 1) + s),
          math.max(E(i)(j), F(i)(j)))
        best = math.max(best, H(i)(j))
      }
      best
    }
    val q = "key order sort"
    val texts = Seq(
      "key order sort",          // exact: 28
      "key ordXr sort",          // one mismatch mid-run
      "key orrder sort",         // one inserted char (gap open)
      "key ordddder sort",       // longer gap (open + extends)
      "sort order key",          // scrambled
      "xx key order sort yy",    // embedded
      "zzzzzzzz")                // nothing
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .withColumn("dstar", org.apache.spark.sql.functions.lit(0))
    // w covers every diagonal of every pair (max len 20), so banded ≡ full
    val w = 24
    val got = df.withColumn("sw",
        graft.GraftFunctions.bandedSw(col("text"), col("dstar"), q, w))
      .select("doc_id", "sw")
      .collect().map(r => r.getLong(0).toInt -> r.getInt(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = fullSW(t, q, 2, -1, 2, 1)
      assert(got(i) == want, s"doc $i '$t': banded=${got(i)} full=$want")
    }
    // spot-check the affine accounting itself
    assert(got(0) == 28)
    assert(got(2) == 28 - 2, "single insertion should cost gapOpen")
    assert(got(3) == 28 - 2 - 2, "3-char gap should cost open + 2·ext")
  }

  test("dedup pipeline assigns transitive chains to one cluster, keep-first") {
    import spark.implicits._
    // A~B and B~C are near-identical (1 word changed each, at opposite
    // ends), A~C two words apart — the cluster must form via the chain
    // even if A–C were never a direct candidate pair.
    val words = (1 to 40).map(i => s"tok$i")
    val a = words.mkString(" ")
    val b = (words.dropRight(1) :+ "changedend").mkString(" ")
    val c = ("changedstart" +: words.drop(1).dropRight(1) :+ "changedend").mkString(" ")
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val docs = Seq((10L, a), (11L, b), (12L, c), (13L, unrelated))
      .toDF("doc_id", "text")
    val res = Dedup.dedupPipeline(docs, 0.5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(res(10L) == (10L, true), s"got $res")
    assert(res(11L) == (10L, false), s"chain member 11 not clustered: $res")
    assert(res(12L) == (10L, false), s"transitive member 12 not clustered: $res")
    assert(res(13L) == (13L, true), s"unrelated doc pulled into cluster: $res")
  }

  test("trigram jaccard is 1.0 only for identical neighbours") {
    val res = Dedup.ngramJaccard(spark, sfDir)
    val j = res.agg(max(col("jaccard")), min(col("jaccard"))).head()
    assert(j.getDouble(0) <= 1.0 && j.getDouble(1) >= 0.0)
    assert(res.count() > 0)
  }

  test("embedding near-dup emits one row per consecutive pair") {
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(Dedup.embedNeardup(spark, sfDir).count() == n - 1)
  }

  test("winnowing guarantee: a shared substring of length >= k+w-1 " +
       "always yields a shared fingerprint, regardless of position") {
    import spark.implicits._
    // the shared block is k+w-1 = 31 chars, embedded at DIFFERENT
    // offsets inside otherwise-unrelated padding; winnowing's window
    // min is position-independent, so the pair must surface
    val shared = "the quick brown fox jumps today" // 31 chars
    val pad1 = "a" * 40 + "completely different lead-in text here"
    val pad2 = "unrelated opening that shares nothing at all " + "z" * 40
    val docs = Seq(
      (1L, pad1 + shared + "trailing one"),
      (2L, pad2 + shared + " other tail"),
      (3L, "this document shares no thirty-one character block with any " +
        "other and is long enough to fingerprint on its own")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowFingerprint(docs).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      s"planted pair not found: ${pairs.mkString(",")}")
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L),
      s"unrelated doc matched: ${pairs.mkString(",")}")
  }

  test("winnowing hot-fingerprint cap drops corpus-wide boilerplate " +
       "before the quadratic pair fan-out") {
    import spark.implicits._
    val boiler = "standard footer all documents carry verbatim every time"
    // 40 docs sharing ONLY boilerplate: with cap below 40 the shared
    // fingerprints are dropped, so no pair may surface
    // leads must share no 31-char block with EACH OTHER (an earlier
    // draft used an "x"*i run — its common suffix was itself a shared
    // substring among subsets of docs, a correct match, not a cap leak)
    val docs = (1L to 40L).map(i =>
      (i, s"lead ${i * 7919} mark ${i * 104729} v${i * 13} " + boiler))
      .toDF("doc_id", "text")
    val capped = Dedup.winnowFingerprint(docs, cap = 10).collect()
    assert(capped.isEmpty,
      s"boilerplate-only pairs survived the cap: ${capped.length}")
    // and with the cap relaxed the same corpus explodes into pairs —
    // the cap, not selectivity, is what bounded it
    assert(Dedup.winnowFingerprint(docs, cap = 64).count() > 100)
  }

  test("d13 chunk dedup counts cross-doc AND within-doc duplicated " +
       "spans and cuts majority-duplicate docs") {
    import spark.implicits._
    // k = 4 word chunks. doc 1 ≡ doc 2 (8 words → both chunks shared:
    // dup_frac 1, cut). doc 3 repeats ONE 4-word span twice inside
    // itself (within-doc duplication counts — C4 counts occurrences,
    // not documents) plus one unique chunk: 2 of 3 chunks duplicated,
    // cut at > 0.5. doc 4 is fully unique: kept. doc 5 has 5 words →
    // trailing partial chunk of 1 word, unique: kept.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "red green blue cyan red green blue cyan lone tail word x"),
      (4L, "totally unique words that appear nowhere else at all"),
      (5L, "five little words here now")
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(docs, 4).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((2L, 2L, 1.0, false)), s"doc1 ${got(1L)}")
    assert(got(2L) == ((2L, 2L, 1.0, false)), s"doc2 ${got(2L)}")
    assert(got(3L) == ((3L, 2L, 0.666667, false)), s"doc3 ${got(3L)}")
    assert(got(4L) == ((3L, 0L, 0.0, true)), s"doc4 ${got(4L)}")
    assert(got(5L) == ((2L, 0L, 0.0, true)), s"doc5 ${got(5L)}")
  }

  test("incremental dedup flags a batch doc copied from the corpus, " +
       "never pairs corpus with corpus, and survives the star cap") {
    import spark.implicits._
    val corpusText = (1 to 30).map(i => s"word$i").mkString(" ")
    val otherText = (31 to 60).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, corpusText, "corpus"),          // standing corpus
      (2L, corpusText, "corpus"),          // corpus-internal dup: NOT reported
      (3L, otherText, "corpus"),
      (10L, corpusText, "batch"),          // batch copy of corpus doc
      (11L, (61 to 90).map(i => s"w$i").mkString(" "), "batch")) // novel
      .toDF("doc_id", "text", "source")
    val got = graft.operators.Dedup.incrementalDedup(docs, "batch").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2)),
        Option(r.get(3)), r.getBoolean(4)))).toMap
    // batch doc 10 matches corpus twins 1 and 2; best match = smaller id
    assert(got(10L)._1 == 2L && got(10L)._2.contains(1L) &&
      got(10L)._3.contains(1.0) && got(10L)._4, s"doc10 ${got(10L)}")
    // the novel batch doc reports no candidates, null best match
    assert(got(11L) == ((0L, None, None, false)), s"doc11 ${got(11L)}")
    // only batch docs appear (corpus-internal dup 1↔2 is not this
    // operator's concern)
    assert(got.keySet == Set(10L, 11L))
    // star cap: capping corpus buckets at 1 member keeps doc 10
    // connected through the min-id representative, answer unchanged
    val capped = graft.operators.Dedup
      .incrementalDedup(docs, "batch", maxBucket = 1).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(2)), r.getBoolean(4)))).toMap
    assert(capped(10L)._1.contains(1L) && capped(10L)._2)
  }

  test("d17 LSH recall audit matches a JVM replica of the full " +
       "signature/band/truth pipeline on a handcrafted corpus") {
    import spark.implicits._
    val P = 2147483647L
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = ((1 to 22).map(i => s"w$i") ++ (1 to 8).map(i => s"x$i"))
      .mkString(" ") // shares 20 of its shingles with base
    val corpus = Seq(
      (1L, base), (2L, base), (3L, near),
      (4L, (1 to 30).map(i => s"q$i").mkString(" ")),
      (5L, (1 to 30).map(i => s"z$i").mkString(" ")))
    val got = graft.operators.Dedup.lshRecall(corpus.toDF("doc_id", "text"))
      .head()
    // JVM replica: distinct 3-word shingle strings → 131-fold char
    // hash mod p → 64 permutation minima → 16 band keys → clique
    // candidates; truth = distinct-hash-set Jaccard ≥ 0.5
    def shingles(text: String): Seq[String] = {
      val w = text.split(" ", -1)
      (0 until math.max(w.length - 2, 1))
        .map(i => w.slice(i, math.min(i + 3, w.length)).mkString(" "))
        .distinct
    }
    def h(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 131 + c.toLong) % P)
    val hl = corpus.map { case (id, t) => id -> shingles(t).map(h) }.toMap
    val sig = hl.map { case (id, hs) =>
      id -> (0 until 64).map(j => hs.map(x => ((2 * j + 1) * x + j * 12345L + 7) % P).min)
    }
    val bandKeys = sig.map { case (id, s) =>
      id -> (0 until 16).map(b =>
        s.slice(b * 4, b * 4 + 4).foldLeft(0L)((a, m) => (a * 1000003 + m) % P))
    }
    val ids = corpus.map(_._1)
    val cands = (for {
      a <- ids; b <- ids if a < b
      if (0 until 16).exists(i => bandKeys(a)(i) == bandKeys(b)(i))
    } yield (a, b)).toSet
    val truth = (for {
      a <- ids; b <- ids if a < b
      sa = hl(a).distinct.toSet; sb = hl(b).distinct.toSet
      inter = (sa intersect sb).size
      if inter * 2 >= sa.size + sb.size - inter
    } yield (a, b)).toSet
    val hit = truth intersect cands
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      ((truth.size.toLong, cands.size.toLong, hit.size.toLong)),
      s"got $got, want (${truth.size}, ${cands.size}, ${hit.size})")
    // uncapped default: the df-cut drops nothing on this corpus
    assert(got.getAs[Long]("n_capped_shingles") == 0L, got.toString)
    assert(got.getAs[Double]("recall") ==
      (if (truth.isEmpty) 1.0 else r6(hit.size.toDouble / truth.size)))
    assert(got.getAs[Double]("candidate_precision") ==
      (if (cands.isEmpty) 1.0 else r6(hit.size.toDouble / cands.size)))
    // structural: the exact twin shares every band — always captured
    assert(truth.contains((1L, 2L)) && cands.contains((1L, 2L)))
    // the near pair is genuinely near (in truth), making the audit
    // non-vacuous beyond exact twins
    assert(truth.contains((1L, 3L)), "near pair fell below the threshold")
  }

  test("d18 containment flags a planted prefix-doc at 1.0 where " +
       "Jaccard sits far below threshold, with exact orientation") {
    import spark.implicits._
    // B = A ++ suffix: every 3-shingle of A appears in B (containment
    // of A in B = 1.0) while Jaccard(A, B) = |A|/|B| is small. C is
    // unrelated. D shares a fragment with B but below threshold.
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val suffix = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, a),
      (2L, s"$a $suffix"),
      (3L, "completely different words that never overlap anything"),
      (4L, s"alpha beta gamma ${(1 to 30).map(i => s"x$i").mkString(" ")}"))
      .toDF("doc_id", "text")
    val got = operators.Dedup.containment(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // A has 6 distinct 3-shingles, all inside B ⇒ containment 1.0,
    // contained = A (smaller set), container = B
    assert(got.keySet == Set((1L, 2L)), s"got ${got.keySet}")
    val (nInter, nContained, c) = got((1L, 2L))
    assert(nInter == 6L && nContained == 6L && c == 1.0, got.toString)
    // the Jaccard view of the same pair sits FAR below the 0.5 d2
    // verify threshold — the pair containment exists to catch
    val hlB = 6 + 2 + 38 // |B| shingles: A's 6 + 2 bridge + 38 suffix
    assert(6.0 / (6 + hlB - 6) < 0.2, "planted pair not asymmetric")
    // df-cut path: capping every shingle (df ≥ 2 cut) removes the
    // pair and surfaces the capped count loudly
    val capped = operators.Dedup.containment(docs, maxShingleDf = 1L)
      .collect()
    assert(capped.isEmpty, s"capped run still paired: ${capped.toSeq}")
  }

  test("d19 edit-distance dedup verifies candidates at character " +
       "grain: substitutions pass, heavy rewrites fail, exact distances") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      // one in-token substitution: shingles mostly survive (candidate),
      // lev = 1 → near-identical
      (2L, base.replace("gamma", "gamme")),
      // same TOKEN SET, harder rewrite: a swapped tail — candidates
      // still fire on the shared prefix shingles, but the character
      // distance is large enough to stay under threshold? No: keep a
      // clearly-below-threshold rewrite instead
      (3L, "alpha beta gamma " + (1 to 20).map(i => s"q$i").mkString(" ")),
      (4L, "unrelated words that share nothing with anyone at all"))
      .toDF("doc_id", "text")
    val got = operators.Dedup.editDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // only (1,2) survives the 0.8 normalized-similarity bar
    assert(got.keySet == Set((1L, 2L)), s"got ${got.keySet}")
    val (_, lev, maxLen, sim) = got((1L, 2L))
    assert(lev == 1L && maxLen == base.length.toLong, got.toString)
    val want = BigDecimal(1.0 - 1.0 / base.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(sim == want, s"sim $sim != $want")
    // JVM cross-check of the verifier itself on the planted pair
    assert(org.apache.commons.text.similarity.LevenshteinDistance
      .getDefaultInstance.apply(base, base.replace("gamma", "gamme")) == 1)
    // pre-cut: pairs sharing fewer than EditMinShared cold shingles
    // never reach the DP — doc 3 shares exactly 1 shingle with base
    // ("alpha beta gamma") so it was cut before any levenshtein ran
    val cands = operators.Dedup.editDedup(docs, thresh = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!cands.contains((1L, 3L)),
      s"pre-cut failed to drop the 1-shared-shingle pair: $cands")
    // df-cut path: cap everything → no candidates at all
    assert(operators.Dedup.editDedup(docs, maxShingleDf = 1L)
      .collect().isEmpty)
  }

  test("d19 per-pair levenshtein band: a book-length outlier neither " +
       "changes the answer nor widens short pairs' DP cut") {
    import spark.implicits._
    // r14 derived the band from the GLOBAL max length (plus a
    // separate driver-side max(len) planning scan): one long outlier
    // widened every short pair's DP band (cost ≈ len × band). The
    // band is now greatest(la, lb) per pair — this spec pins (a)
    // answer invariance under an outlier, (b) the banded distance
    // stays EXACT at the threshold edge for a short pair.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = base.replace("gamma", "gamme")
    val small = Seq((1L, base), (2L, near)).toDF("doc_id", "text")
    // (a) plant a ~120k-char unrelated outlier (shares no shingle)
    val outlier = (1 to 20000).map(i => s"w$i").mkString(" ")
    val withOutlier = small.union(Seq((3L, outlier)).toDF("doc_id", "text"))
    val a = operators.Dedup.editDedup(small).collect().toSeq
    val b = operators.Dedup.editDedup(withOutlier).collect().toSeq
    assert(a == b, s"outlier changed the answer: $a vs $b")
    // (b) the pair's own band ceil((1-0.8+5e-7)*56)+1 = 13 admits the
    // true distance 1 — exact lev and sim survive the banded form
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))) ==
      Seq((1L, 2L, 1L)), a.toString)
  }

  test("d20 exact-substring dedup: shifted cross-doc spans, in-doc " +
       "repeats, run merging and sub-width docs land exactly") {
    import spark.implicits._
    val L = 5
    // shared 7-token span planted at DIFFERENT offsets in docs 1 and 2
    // — a fixed-chunk dedup (d13) grid-aligns and misses the shifted
    // overlap; exact-substring coverage must catch every token of it
    val span = "one two three four five six seven"
    val d1 = s"aa bb cc $span xx yy zz"       // span at tokens 4..10
    val d2 = s"$span pp qq rr ss tt uu vv"    // span at tokens 1..7
    // doc 3: an IN-DOC repeat (the paper counts self-repeats) of a
    // 5-token phrase, separated so the two runs do NOT merge
    val rep = "k1 k2 k3 k4 k5"
    val d3 = s"$rep m1 m2 m3 m4 m5 m6 $rep"
    // doc 4: unique text, and doc 5: shorter than L tokens
    val d4 = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"
    val d5 = "s1 s2 s3"
    val docs = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4), (5L, d5))
      .toDF("doc_id", "text")
    val got = operators.Dedup.exactSubstring(docs, spanTokens = L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    // docs 1/2: the 7-token span yields 3 matched 5-gram starts that
    // merge into ONE run covering exactly the 7 span tokens
    assert(got(1L) == ((13L, 7L, math.rint(7.0 / 13 * 1e6) / 1e6, 1L)),
      got.toString)
    assert(got(2L) == ((14L, 7L, math.rint(7.0 / 14 * 1e6) / 1e6, 1L)),
      got.toString)
    // doc 3: two non-adjacent occurrences of the 5-token phrase = two
    // runs of 5 covered tokens each
    assert(got(3L) == ((16L, 10L, math.rint(10.0 / 16 * 1e6) / 1e6, 2L)),
      got.toString)
    // unique and sub-width docs report zero coverage (and the
    // sub-width doc never produced a gram at all)
    assert(got(4L) == ((10L, 0L, 0.0, 0L)), got.toString)
    assert(got(5L) == ((3L, 0L, 0.0, 0L)), got.toString)
    // adjacency boundary, both sides: matched starts exactly L apart
    // cover contiguous tokens ([p, p+L−1] then [p+L, p+2L−1]) and MUST
    // merge into one run; starts L+1 apart leave one uncovered token
    // between the regions and MUST stay two runs. A and B are two
    // L-token phrases each shared across docs 6/7; doc 7's extra "x"
    // pushes B one token further.
    val A = (1 to L).map(i => s"v$i").mkString(" ")
    val B = (1 to L).map(i => s"b$i").mkString(" ")
    val more = Seq((6L, s"$A $B"), (7L, s"$A x $B")).toDF("doc_id", "text")
    val got2 = operators.Dedup.exactSubstring(more, spanTokens = L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4))))
      .toMap
    assert(got2(6L) == ((10L, 1L)), s"L-apart starts did not merge: $got2")
    assert(got2(7L) == ((10L, 2L)),
      s"(L+1)-apart starts wrongly merged: $got2")
  }

  test("d16 duplicate-ngram rate: cross-doc shared grams, in-doc " +
       "repeats, unique and sub-width docs all land exactly") {
    import spark.implicits._
    val phrase = "one two three four five"
    val docs = Seq(
      // 10 words → 6 sliding 5-grams; only the leading one is shared
      (1L, s"$phrase alpha beta gamma delta epsilon"),
      // 7 words → 3 grams; the middle one is the shared phrase
      (2L, s"zeta $phrase eta"),
      // 6 words → 2 grams, nothing shared
      (3L, "totally unique words nothing shared here"),
      // 6 identical words → 2 IDENTICAL grams: an in-document repeat
      // is memorization surface and must count as duplicated
      (4L, "rep rep rep rep rep rep"),
      // shorter than n → exactly one whole-text gram, still in output
      (5L, "short")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.dupNgramRate(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Map(
      1L -> ((6L, 1L, r6(1.0 / 6))),
      2L -> ((3L, 1L, r6(1.0 / 3))),
      3L -> ((2L, 0L, 0.0)),
      4L -> ((2L, 2L, 1.0)),
      5L -> ((1L, 0L, 0.0))), s"got $got")
  }

  test("b5 minimizers match a JVM replica, and a shifted shared substring " +
       "shares interior minimizers regardless of offset") {
    import spark.implicits._
    val k = Dedup.MinimizerK
    val w = Dedup.MinimizerW
    def replica(text: String): Set[String] = {
      if (text.length < k) return Set.empty
      val kmers = (0 to text.length - k).map(i => text.substring(i, i + k))
      if (kmers.length < w) return Set.empty
      (0 to kmers.length - w).map(i => kmers.slice(i, i + w).min).toSet
    }
    // replica parity on the real corpus, including census and anchor
    val docs = Tables.load(spark, sfDir, "documents")
    val got = Dedup.minimizerProfile(docs, k, w).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), Option(r.getString(4))))).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, t) =>
      val m = replica(t)
      val wantN = if (t.length >= k) (t.length - k + 1).toLong else 0L
      assert(got(id)._1 == wantN && got(id)._2 == m.size.toLong &&
        got(id)._4 == (if (m.isEmpty) None else Some(m.min)),
        s"doc $id: got ${got(id)} want ($wantN, ${m.size}, ${m.minOption})")
    }
    // density sits at the 2/(w+1) scale. The DISTINCT census dedups
    // repeated minimizers, so a repetitive small-vocabulary corpus
    // lands below the random-sequence expectation — but the same
    // order of magnitude, never the ~1.0 of no sampling at all
    val dens = got.values.map(_._3).toSeq
    val mean = dens.sum / dens.size
    assert(mean > 0.5 / (w + 1) && mean < 4.0 / (w + 1),
      s"density $mean far from the 2/(w+1) = ${2.0 / (w + 1)} scale")
    // position robustness: the SAME long substring at two different
    // offsets shares interior minimizers (the overlap-seed property
    // a fixed-grid chunking scheme like d13 loses under shift)
    val core = "npqrstuvwxyzabcdefghijklm"
    val a = replica("xx" + core + "yy")
    val b = replica("qqqqqqq" + core)
    assert((a & b).nonEmpty, s"shifted copies share no minimizer: $a vs $b")
  }

  test("URL dedup: every planted variant of one page collapses to one " +
       "canonical form; distinct pages and real paths stay apart") {
    import spark.implicits._
    val variants = Seq(
      (1L, "http://example.com/doc/7"),
      (2L, "http://example.com/doc/7/"),
      (3L, "https://example.com/doc/7"),
      (4L, "http://www.example.com/doc/7"),
      (5L, "HTTP://EXAMPLE.COM/DOC/7"),
      (6L, "http://example.com/doc/7?utm_source=newsletter"),
      (7L, "http://example.com/doc/7#section-2"),
      // NOT the same page:
      (8L, "http://example.com/doc/70"),
      (9L, "http://other.com/doc/7"),
      (10L, "http://example.com/doc/7?page=2")) // a REAL param survives
      .toDF("doc_id", "url")
    val got = Dedup.urlDedupCore(variants).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got("http://example.com/doc/7") == ((1L, 7L, 7L)), got.toString)
    assert(got.contains("http://example.com/doc/70") &&
      got.contains("http://other.com/doc/7") &&
      got.contains("http://example.com/doc/7?page=2"), got.toString)
    assert(got.size == 4, s"wrong group count: $got")
    // corpus: the div-3 fixture makes every canonical group carry all
    // its variant fetches; copies per group never exceed 3
    val sf = Dedup.urlDedup(spark, sfDir).collect()
    assert(sf.nonEmpty && sf.forall(r =>
      r.getLong(2) >= 1L && r.getLong(2) <= 3L &&
      r.getLong(3) <= r.getLong(2)), "corpus group shape violated")
    assert(sf.exists(_.getLong(2) == 3L), "no collapsed group on corpus")
  }

  test("d22 CDC chunking: a head insertion re-aligns (shift-robust " +
       "where fixed chunks are not), identical docs fully duplicate") {
    import spark.implicits._
    // 100 deterministic pseudo-words; doc 2 = the same text with two
    // words PREPENDED — content-defined boundaries in the shared
    // suffix land on the same windows, so chunks after the first cut
    // are identical across the pair
    val words = (0 until 100).map(i => s"w${(i * 37 + 11) % 83}")
    val base = words.mkString(" ")
    val shifted = "zz yy " + base
    val pair = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val cdc = Dedup.cdcChunkDedup(pair).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cdc(1L)._2 >= 1 && cdc(2L)._2 >= 1,
      s"CDC found no re-aligned duplicate chunks: $cdc")
    // fixed k-word chunking on the SAME pair: the 2-word shift
    // misaligns every boundary, so it finds strictly fewer duplicated
    // chunks than CDC — the measured shift-robustness claim
    val fixed = Dedup.chunkDedup(pair, Dedup.ChunkWords).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fixed(1L) < cdc(1L)._2,
      s"fixed chunking matched CDC on a shifted pair: $fixed vs $cdc")
    // two identical docs: every chunk duplicated, keep = false at the
    // half cut (dup_frac = 1)
    val twins = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val tw = Dedup.cdcChunkDedup(twins).collect()
    assert(tw.forall(r => r.getLong(1) == r.getLong(2) && !r.getBoolean(4)),
      tw.mkString(";"))
    // degenerate: an empty text still yields one chunk and a row
    val e = Dedup.cdcChunkDedup(Seq((9L, "")).toDF("doc_id", "text"))
      .collect()
    assert(e.length == 1 && e(0).getLong(1) == 1L, e.mkString(";"))
    // corpus: every doc present, dup_frac in [0, 1]
    val sf = Dedup.cdcChunkDedup(
      graft.Tables.load(spark, sfDir, "documents")).collect()
    assert(sf.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }
}
