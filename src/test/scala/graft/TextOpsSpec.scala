package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TextOpsSpec extends SparkSpec {

  private lazy val tinyDir: String = {
    val dir = Files.createTempDirectory("graft-text").toString
    import spark.implicits._
    Seq(
      (0L, "hello world x", "en", "src0", 13L),
      (1L, "der und das nicht und der", "de", "src0", 25L),
      (2L, "the the the a of and or", "en", "src0", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("fingerprint matches the independently computed rolling hash") {
    // fold of 'hello world x': verified against DuckDB list_reduce
    val fp = TextOps.fingerprint(spark, tinyDir)
      .filter(col("doc_id") === 0).head().getLong(1)
    assert(fp == 855297371L, s"got $fp")
  }

  test("language ID picks the dominant marker profile") {
    val res = TextOps.langId(spark, tinyDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(res(1L) == "de", s"got $res")
    assert(res(2L) == "en", s"got $res")
  }

  test("quality scoring penalizes repetition") {
    val res = TextOps.qualityScore(spark, tinyDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    // doc 2 is stopword spam with repetition; doc 0 is all-distinct
    assert(res(0L) > res(2L), s"got $res")
  }

  test("token counts: whitespace vs BPE-ish pieces") {
    val r = TextOps.tokenCount(spark, tinyDir)
      .filter(col("doc_id") === 0).head()
    assert(r.getLong(1) == 3) // hello world x
    assert(r.getLong(2) == 2) // 'hello' and 'world' are > 4 chars
    assert(r.getLong(3) == 5) // hell|o|worl|d|x
  }

  test("PII redaction finds exactly the injected PII and scrubs it") {
    val res = TextOps.piiRedact(spark, tinyDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 0: 0%3==0 email, 0%4==0 url, 0%5==0 phone — all three
    assert(res(0L).getLong(1) == 1 && res(0L).getLong(2) == 1 &&
      res(0L).getLong(3) == 1)
    val clean0 = res(0L).getString(4)
    assert(clean0.contains("<EMAIL>") && clean0.contains("<URL>") &&
      clean0.contains("<PHONE>"))
    assert(!clean0.contains("@") && !clean0.contains("http"),
      s"PII survived redaction: $clean0")
    // doc 1 and 2: no injected PII, text unchanged
    assert(res(1L).getLong(1) == 0 && res(1L).getLong(2) == 0 &&
      res(1L).getLong(3) == 0)
    assert(res(2L).getString(4) == "the the the a of and or")
  }

  test("sequence packing respects the budget and never splits a shard's order") {
    val docs = Tables.load(spark, sfDir, "documents")
    val packed = TextOps.sequencePack(spark, docs, nShards = 16, budget = 128L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packed.length == docs.count())
    // per (shard, pack): fill ≤ budget unless the pack is one oversized doc
    packed.groupBy(p => (p._2, p._3)).foreach { case ((s, p), rows) =>
      val fill = rows.map(_._4).sum
      assert(fill <= 128L || rows.length == 1,
        s"pack ($s,$p) over budget with ${rows.length} docs: $fill")
    }
    // pack ids are contiguous from 0 within each shard, in doc_id order
    packed.groupBy(_._2).foreach { case (s, rows) =>
      val inOrder = rows.sortBy(_._1).map(_._3)
      assert(inOrder.head == 0L, s"shard $s starts at pack ${inOrder.head}")
      assert(inOrder.zip(inOrder.tail).forall { case (a, b) => b == a || b == a + 1 },
        s"shard $s pack ids not contiguous: ${inOrder.toSeq}")
    }
    // greedy replay: recompute pack ids sequentially per shard and
    // compare — a doc opens a new pack ONLY if it would not have fit
    packed.groupBy(_._2).foreach { case (s, rows) =>
      var fill = 0L; var pack = 0L; var first = true
      rows.sortBy(_._1).foreach { case (id, _, p, t) =>
        if (first) { first = false; fill = t }
        else if (fill + t <= 128L) fill += t
        else { pack += 1; fill = t }
        assert(p == pack, s"shard $s doc $id: pack $p, greedy replay says $pack")
      }
    }
  }

  test("chunking is content-defined: early edits leave the tail chunks intact") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def sizes(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      graft.operators.TextOps.chunking(df, 16).collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq).toMap
    val base = sizes(docs)
    // prepend two words: fixed-offset chunking would shift EVERY
    // boundary; content-defined boundaries re-align at the first
    // surviving boundary, so the chunk-size suffix is preserved
    val edited = sizes(docs.withColumn("text",
      concat(lit("zz qq "), col("text"))))
    val multi = base.filter(_._2.length >= 2)
    assert(multi.nonEmpty, "no multi-chunk docs to exercise")
    multi.foreach { case (id, b) =>
      val e = edited(id)
      val tail = b.tail // everything after the first original boundary
      assert(e.takeRight(tail.length) == tail,
        s"doc $id tail reshuffled: base=$b edited=$e")
    }
  }

  test("sample weights: stochastic, order-preserving, temperature-flattened") {
    val rows = graft.operators.TextOps.sampleWeights(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length > 1)
    // weights and shares are both distributions
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "shares do not sum to 1")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "weights do not sum to 1")
    // α = 0.5 preserves source ordering but compresses the ratios
    val byTokens = rows.sortBy(_._2)
    assert(byTokens.map(_._4).zip(byTokens.tail.map(_._4))
      .forall { case (a, b) => a <= b + 1e-9 }, "weights not monotone in tokens")
    val shareRatio = byTokens.last._3 / byTokens.head._3
    val weightRatio = byTokens.last._4 / byTokens.head._4
    assert(weightRatio <= shareRatio + 1e-9,
      f"temperature did not flatten: weight ratio $weightRatio%.3f vs share $shareRatio%.3f")
  }

  /** Plain-Scala scan-greedy BPE — an INDEPENDENT formulation (the
    * engine merges via a fold, the oracle via parity islands). */
  private def referenceBpe(vocab: Seq[(String, Long)],
      m: Int): Seq[(String, String, Long)] = {
    var words = vocab.map { case (w, c) => (w.map(_.toString).toList, c) }
    (1 to m).map { _ =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      val maxC = counts.values.max
      val best = counts.filter(_._2 == maxC).keys.min
      words = words.map { case (syms, c) =>
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && (syms(i), syms(i + 1)) == best) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.toList, c)
      }
      (best._1, best._2, maxC)
    }
  }

  test("BPE merges match an independent scan-greedy reference, " +
       "including overlapping runs and ties") {
    import spark.implicits._
    // classic BPE example + an adversarial all-'a' run (overlap
    // handling: 'aaaa' merges to two 'aa', not three)
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("aaaa", 4L), ("aaab", 4L))
    val docs = vocab.zipWithIndex.map { case ((w, c), i) =>
      (i.toLong, (Seq.fill(c.toInt)(w)).mkString(" "))
    }.toDF("doc_id", "text")
    val got = graft.operators.TextOps.bpeMerges(docs, 5).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    val want = referenceBpe(vocab, 5)
    assert(got.toSeq == want, s"got ${got.toSeq}, want $want")
  }

  test("surprisal orders common-token docs below rare-token docs") {
    import spark.implicits._
    // 10 docs of a dominant token, one doc of hapaxes: the boilerplate
    // doc must score strictly lower (its tokens are corpus-common)
    val docs = ((1L to 10L).map(i => (i, "common common common common")) :+
      (99L, "zephyr quixotic ineffable brouhaha")).toDF("doc_id", "text")
    val res = graft.operators.TextOps.surprisal(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(res(1L) < res(99L),
      s"common-token doc ${res(1L)} not below rare-token doc ${res(99L)}")
    // mean -ln p of the all-common doc: p = 40/44, surprisal = ln(44/40)
    val exp = BigDecimal(math.log(44.0 / 40.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(res(1L) == exp, s"got ${res(1L)}, want $exp")
  }

  test("t19 classifier matches a reference dot product and handles " +
       "one-word and empty docs") {
    import spark.implicits._
    val docs = Seq((0L, "the quick brown fox"), (1L, "solo"), (2L, ""))
      .toDF("doc_id", "text")
    val res = graft.operators.TextOps.ftQuality(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    // independent JVM reference of the same shipped-weight model
    val P = graft.operators.TextOps.FtPrime
    val B = graft.operators.TextOps.FtBuckets
    def h(g: String): Long =
      if (g.isEmpty) 0L
      else g.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % B)
    def num(g: String): Long = (h(g) * 2654435761L + 12345L) % P - (P - 1) / 2
    def score(text: String): (Long, Double, Boolean) = {
      val w = text.split(" ", -1).toSeq
      val grams = w ++ w.sliding(2).filter(_.size == 2).map(p => s"${p(0)}_${p(1)}")
      val s = BigDecimal(grams.map(num).sum.toDouble / (P.toDouble * grams.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (grams.size.toLong, s, s >= 0.0)
    }
    for (d <- Seq(0L, 1L, 2L))
      assert(res(d) == score(Seq("the quick brown fox", "solo", "")(d.toInt)),
        s"doc $d: got ${res(d)}")
    // one-word doc: exactly 1 gram (no bigrams); empty doc: the single
    // empty token hashes to bucket 0, never NaN or a crash
    assert(res(1L)._1 == 1L && res(2L)._1 == 1L)
  }

  test("t20 bigram cross-entropy matches a JVM reference and sees " +
       "word order that unigram surprisal cannot") {
    import spark.implicits._
    // doc 1 cycles one predictable transition; doc 2 uses rare ones;
    // doc 3 has a single word — no bigram, so it must drop out
    val docs = Seq((1L, "a b a b a b"), (2L, "a c b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextOps.bigramLm(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(!got.contains(3L), "one-word doc produced a bigram row")
    // corpus model: c(a b)=3 c(b a)=2 c(a c)=1 c(c b)=1; ctx a=4 b=2
    // c=1; V=4 (a, b, c, solo). add-one smoothing.
    def ce(terms: Seq[(Long, Double)]): Double = {
      val s = terms.map { case (tf, p) => tf.toDouble * -math.log(p) }.sum
      val n = terms.map(_._1).sum
      BigDecimal(s / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // fold order is bigram-sorted: doc 1 = ("a b" ×3, "b a" ×2)
    val want1 = ce(Seq((3L, 4.0 / 8.0), (2L, 3.0 / 6.0)))
    val want2 = ce(Seq((1L, 2.0 / 8.0), (1L, 2.0 / 5.0)))
    assert(got(1L) == ((5L, want1)), s"doc1 ${got(1L)} want $want1")
    assert(got(2L) == ((2L, want2)), s"doc2 ${got(2L)} want $want2")
    // the ordered model separates them; their UNIGRAM histograms are
    // near-identical in commonness terms
    assert(got(1L)._2 < got(2L)._2,
      "predictable transitions did not score below rare ones")
  }

  /** Independent scan-greedy BPE ENCODER: train m merges (same greedy
    * tie-break as [[referenceBpe]]) and return each word's final
    * symbol count. */
  private def referenceBpeTokens(vocab: Seq[(String, Long)],
      m: Int): Map[String, Long] = {
    var words = vocab.map { case (w, c) => (w, w.map(_.toString).toList, c) }
    (1 to m).foreach { _ =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (_, syms, c) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      val maxC = counts.values.max
      val best = counts.filter(_._2 == maxC).keys.min
      words = words.map { case (w, syms, c) =>
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && (syms(i), syms(i + 1)) == best) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        (w, out.toList, c)
      }
    }
    words.map { case (w, syms, _) => w -> syms.length.toLong }.toMap
  }

  test("t21 BPE encoding matches the independent encoder: per-doc " +
       "token counts are tf-weighted word encodings") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low low low low low lower lower"),
      (2L, "newest newest newest widest widest low"),
      (3L, "aaaa aaab aaaa")).toDF("doc_id", "text")
    val vocab = Seq(("low", 6L), ("lower", 2L), ("newest", 3L),
      ("widest", 2L), ("aaaa", 2L), ("aaab", 1L))
    val tok = referenceBpeTokens(vocab, 5)
    def expect(ws: Seq[String]): (Long, Long, Double) = {
      val nTok = ws.map(tok).sum
      val nChar = ws.map(_.length.toLong).sum
      (ws.size.toLong, nTok, BigDecimal(nChar.toDouble / nTok.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = graft.operators.TextOps.bpeEncode(docs, 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == expect(Seq.fill(5)("low") ++ Seq.fill(2)("lower")),
      s"doc1 ${got(1L)}")
    assert(got(2L) == expect(Seq.fill(3)("newest") ++
      Seq.fill(2)("widest") :+ "low"), s"doc2 ${got(2L)}")
    assert(got(3L) == expect(Seq("aaaa", "aaab", "aaaa")), s"doc3 ${got(3L)}")
    // merges compress: tokens strictly under characters, at least one
    // multi-char token learned
    assert(got(1L)._2 < Seq.fill(5)("low").map(_.length).sum +
      Seq.fill(2)("lower").map(_.length).sum)
  }

  test("mix apply matches a JVM replica and its manifest is a " +
       "genuine down-sampling plan on the corpus") {
    import spark.implicits._
    // two sources, 4:1 token imbalance → sqrt temperature pushes the
    // big source's share DOWN: epochs < 1 (down-sample) for big,
    // > 1 (repeat) for small
    val docs = (0L until 40L).map { i =>
      val src = if (i < 32) "big" else "small"
      (i, src, "tok " * 9 + "tok") // 10 words each
    }.toDF("doc_id", "source", "text")
    val bigT = 320.0; val smallT = 80.0; val t = 400.0
    val wsum = math.sqrt(bigT / t) + math.sqrt(smallT / t)
    def row(srcT: Double, nDocs: Long, ids: Seq[Long]) = {
      val w0 = math.sqrt(srcT / t) / wsum
      val ep = w0 * t / srcT
      val thresh = math.floor(math.min(ep, 1.0) * 1000000.0).toLong
      val keptIds = ids.filter(id =>
        ((id % 1000000000L) * 2654435761L) % 1000000L < thresh)
      (nDocs, srcT.toLong,
        BigDecimal(w0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(ep).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        thresh, keptIds.size.toLong, keptIds.size * 10L)
    }
    val want = Map(
      "big" -> row(bigT, 32L, 0L until 32L),
      "small" -> row(smallT, 8L, 32L until 40L))
    val got = graft.operators.TextOps.mixApply(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))).toMap
    assert(got == want, s"got $got\nwant $want")
    // the plan must genuinely re-shape: big down-samples (epochs < 1,
    // kept < all), small repeats (epochs > 1, threshold saturated)
    assert(got("big")._4 < 1.0 && got("big")._6 < 32L)
    assert(got("small")._4 > 1.0 && got("small")._5 == 1000000L &&
      got("small")._6 == 8L)
    // corpus run: thresholds in range, kept ≤ docs per source
    val corpus = graft.operators.TextOps.mixApply(spark, sfDir).collect()
    corpus.foreach { r =>
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000000L)
      assert(r.getLong(6) <= r.getLong(1))
    }
  }

  test("gopher rules match a JVM replica on handcrafted docs and " +
       "discriminate on the corpus") {
    import spark.implicits._
    // doc 10: passes everything; doc 11: too short + one stopword;
    // doc 12: long enough but mean word length beyond 10; doc 13:
    // no alphabetic words at all
    // 30 words, mean length 19/6 ≈ 3.17, stopwords {the, of}
    val pass = ("the cats sat of the mats " * 5).trim
    val short = "the end"                                      // 2 words
    // 30 words, mean length (28·15 + 3 + 1)/30 ≈ 14.1 > 10: only the
    // word-length rule fails (count ok, alphabetic ok, 2 stopwords ok)
    val longw = (Seq.fill(28)("extraordinarily") ++ Seq("the", "a"))
      .mkString(" ")
    val digits = (1 to 25).map(_.toString).mkString(" ")
    // doc 14: empty text — split yields one empty word; every ratio
    // must stay finite (n_words = 1, mean 0, alpha 0) and keep false
    val docs = Seq((10L, pass), (11L, short), (12L, longw), (13L, digits),
      (14L, "")).toDF("doc_id", "text")
    def replica(text: String) = {
      val ws = text.split(" ", -1)
      val nWords = ws.length.toLong
      val meanW = ws.map(_.length.toLong).sum.toDouble / nWords
      val alphaF = ws.count(_.exists(_.isLetter)).toDouble / nWords
      val stops = TextOps.GopherStops.count(ws.contains).toLong
      val keep = nWords >= TextOps.GopherMinWords &&
        nWords <= TextOps.GopherMaxWords &&
        meanW >= 3.0 && meanW <= 10.0 && alphaF >= 0.8 &&
        stops >= TextOps.GopherMinStops
      (nWords, BigDecimal(meanW).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, stops, keep)
    }
    val got = TextOps.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getLong(4), r.getBoolean(9)))).toMap
    Seq(10L -> pass, 11L -> short, 12L -> longw, 13L -> digits, 14L -> "")
      .foreach { case (id, t) =>
        assert(got(id) == replica(t), s"doc $id: ${got(id)} vs ${replica(t)}")
      }
    assert(got(10L)._4 && !got(11L)._4 && !got(12L)._4 && !got(13L)._4 &&
      !got(14L)._4)
    // the corpus gate must be non-vacuous: both outcomes occur
    val corpus = TextOps.gopherRules(spark, sfDir).collect()
      .map(_.getBoolean(9))
    assert(corpus.contains(true) && corpus.contains(false),
      "gopher keep gate is vacuous on the corpus")
  }

  test("t25 leakage audit flags an eval doc copying train text and " +
       "clears a novel one, under t9's exact split rule") {
    import spark.implicits._
    import graft.operators.TextOps
    def splitOf(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.charAt(0)
      if (h < 'c') "train" else if (h < 'e') "val" else "test"
    }
    val ids = (0L to 200L).toSeq
    val trainId = ids.find(splitOf(_) == "train").get
    val testIds = ids.filter(splitOf(_) == "test").take(2)
    val valId = ids.find(splitOf(_) == "val").get
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (trainId, shared),
      (testIds(0), shared), // verbatim copy of a train doc → leaky
      (testIds(1), "nu xi omicron pi rho sigma"), // novel → clean
      // val doc sharing ONE of its five shingles (1/5 = exactly the
      // 20% cut, which the ≥ comparison must flag)
      (valId, s"alpha beta gamma h1 h2 h3 h4")).toDF("doc_id", "text")
    val got = TextOps.leakageSplit(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    assert(!got.contains(trainId), "train doc leaked into the audit")
    assert(got(testIds(0)) == (("test", 4L, 4L, true)),
      s"copy not flagged: ${got(testIds(0))}")
    assert(got(testIds(1)) == (("test", 4L, 0L, false)),
      s"novel doc flagged: ${got(testIds(1))}")
    assert(got(valId) == (("val", 5L, 1L, true)),
      s"exact-20% doc not flagged: ${got(valId)}")
  }

  test("t24 DSIR weights match a JVM reference, target-heavy docs " +
       "score positive and selection is non-vacuous") {
    import spark.implicits._
    import graft.operators.TextOps
    val corpus = Seq(
      (0L, "alpha beta alpha", "src0"),
      (1L, "alpha beta gamma", "src1"),
      (2L, "delta epsilon zeta delta", "src1"),
      (3L, "alpha alpha beta", "src2"),
      (4L, "beta", "src0"),
      (5L, "delta epsilon", "src2"))
    val got = TextOps.dsirWeights(corpus.toDF("doc_id", "text", "source"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap

    // independent reference: same grams, same 31-ary bucket fold, the
    // linearized score num = Σ tf_b·(T_b·R − R_b·T) in BigInt, one
    // division + HALF_UP round(6)
    def gramsOf(text: String): Seq[String] = {
      val w = text.split(" ", -1).toSeq
      w ++ w.sliding(2).filter(_.size == 2).map(p => p(0) + "_" + p(1))
    }
    def bucket(g: String): Long =
      g.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % TextOps.FtBuckets)
    val byDoc = corpus.map { case (id, text, src) =>
      (id, src, gramsOf(text).map(bucket)) }
    val rB = byDoc.flatMap(_._3).groupBy(identity).map { case (b, xs) =>
      b -> xs.size.toLong }
    val tB = byDoc.filter(_._2 == "src0").flatMap(_._3).groupBy(identity)
      .map { case (b, xs) => b -> xs.size.toLong }
    val rTot = rB.values.sum
    val tTot = tB.values.sum
    byDoc.foreach { case (id, _, bs) =>
      val tf = bs.groupBy(identity).map { case (b, xs) => b -> xs.size }
      val num = tf.map { case (b, c) =>
        BigInt(c) * (BigInt(tB.getOrElse(b, 0L)) * rTot -
          BigInt(rB(b)) * tTot) }.sum
      val score = BigDecimal(
        new java.math.BigDecimal(num.bigInteger).doubleValue
          / (bs.size.toDouble * tTot.toDouble * rTot.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (nG, s, sel) = got(id)
      assert(nG == bs.size && s == score && sel == (num > 0),
        s"doc $id: got ($nG, $s, $sel), want (${bs.size}, $score, ${num > 0})")
    }
    // the gate must separate: src0's own docs lean target-positive,
    // the delta/epsilon docs (zero target mass) lean negative
    assert(got(0L)._3 && got(4L)._3, "target-heavy docs not selected")
    assert(!got(2L)._3 && !got(5L)._3, "zero-target-mass docs selected")
  }

  test("t28 source diversity equals a JVM replica, pins the uniform " +
       "and single-gram extremes, and never emits -0.0") {
    import spark.implicits._
    import graft.operators.TextOps
    // srcU: 4 docs of all-distinct bigrams → entropy = ln(n), evenness 1
    // srcT: one templated bigram repeated → entropy 0, evenness 1 by
    //        the single-gram convention — and the 0 must be +0.0 bits
    // srcM: mixed — replica-checked exactly
    val docs = Seq(
      (1L, "a1 a2 a3 a4 a5", "srcU"), (2L, "b1 b2 b3 b4 b5", "srcU"),
      (3L, "t t t t t t", "srcT"),
      (4L, "m1 m2 m1 m2 m1", "srcM"), (5L, "m1 m2 m9", "srcM"))
      .toDF("doc_id", "text", "source")
    val got = TextOps.sourceDiversity(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def replica(texts: Seq[String]): (Long, Long, Double, Double, Double) = {
      val grams = texts.flatMap(t => t.split(" ").sliding(2)
        .filter(_.length == 2).map(_.mkString("_")))
      val tf = grams.groupBy(identity).map { case (_, xs) => xs.size }
      val n = grams.size.toDouble
      val terms = tf.map { c =>
        BigDecimal(c / n * math.log(c / n))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      val ent = r6(-terms.sum.toDouble)
      val even = if (tf.size == 1) 1.0
        else r6(-terms.sum.toDouble / math.log(tf.size.toDouble))
      (grams.size.toLong, tf.size.toLong, r6(tf.size / n), ent, even)
    }
    assert(got("srcU") == replica(Seq("a1 a2 a3 a4 a5", "b1 b2 b3 b4 b5")))
    assert(got("srcM") == replica(Seq("m1 m2 m1 m2 m1", "m1 m2 m9")))
    assert(got("srcT") == replica(Seq("t t t t t t")))
    // extremes: uniform source maximally even; templated source has
    // entropy exactly +0.0 (bit-level — the -0.0 class guard)
    assert(got("srcU")._5 == 1.0 && got("srcU")._4 == r6(math.log(8.0)))
    assert(got("srcT")._4 == 0.0 && got("srcT")._5 == 1.0)
    assert(java.lang.Double.doubleToRawLongBits(got("srcT")._4) == 0L,
      "templated source's zero entropy carries the sign bit")
  }

  test("t27 span-mask manifest equals a sequential replica and hits " +
       "the T5 corruption budget corpus-wide") {
    import graft.operators.TextOps
    val docs = Tables.load(spark, sfDir, "documents")
    val got = TextOps.spanMask(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // sequential replica of the greedy fold, plain Scala
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty && got.size == texts.length)
    texts.foreach { case (id, text) =>
      val n = text.split(" ", -1).length.toLong
      var nf = 1L; var nm = 0L; var ns = 0L
      var i = 1L
      while (i <= n) {
        val h = ((id * 1000003L + i) % 1000000000L) * 2654435761L %
          2147483647L
        if (i >= nf && h % TextOps.SpanStartMod == 0) {
          val len = 1 + (h / TextOps.SpanStartMod) % TextOps.SpanLenRange
          ns += 1; nm += math.min(len, n - i + 1); nf = i + len
        }
        i += 1
      }
      val rate = BigDecimal(nm.toDouble / n.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) == ((n, ns, nm, rate)),
        s"doc $id: got ${got(id)}, want ($n, $ns, $nm, $rate)")
    }
    // the corruption budget: ≈ 3/20 = 15% corpus-wide (±5 pts — the
    // hash is uniform, docs are 10..99 tokens)
    val totTok = got.values.map(_._1).sum.toDouble
    val totMask = got.values.map(_._3).sum.toDouble
    assert(totMask / totTok > 0.10 && totMask / totTok < 0.20,
      f"corpus mask rate ${totMask / totTok}%.3f off the 15%% budget")
    // spans never overlap and never run off the doc: nm ≥ ns, nm ≤ n
    got.foreach { case (id, (n, ns, nm, _)) =>
      assert(nm >= ns && nm <= n, s"doc $id: impossible manifest")
    }
  }

  test("t27 refuses a doc beyond the 999,999-token packing bound " +
       "loudly instead of corrupting the packed counters") {
    import spark.implicits._
    import graft.operators.TextOps
    // exactly 1e6 tokens: at the bound nm can reach 1e6 and overflow
    // its 6-digit field into next_free — the in-row raise_error gate
    // must fire before the fold runs
    val over = Seq((0L, Array.fill(1000000)("a").mkString(" ")))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextOps.spanMask(over).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("packing")), msgs(e).mkString(" | "))
    // one token under the bound still computes
    val ok = Seq((1L, Array.fill(999999)("a").mkString(" ")))
      .toDF("doc_id", "text")
    assert(TextOps.spanMask(ok).head().getLong(1) == 999999L)
  }

  test("t29 zipf slope equals a JVM replica, reads ≈ -1 on a planted " +
       "power law and ≈ 0 on a uniform source") {
    import spark.implicits._
    import graft.operators.TextOps
    // planted zipf source: token wi repeated round(1000/i) times — an
    // exact rank^-1 law; uniform source: 50 tokens, 7 occurrences each
    val zipfTokens = (1 to 60).flatMap(i =>
      Seq.fill(math.max(1, math.round(1000.0 / i).toInt))(f"w$i%03d"))
    val uniTokens = (1 to 50).flatMap(i => Seq.fill(7)(f"u$i%03d"))
    def docsOf(src: String, toks: Seq[String], base: Long) =
      toks.grouped(40).zipWithIndex.map { case (g, i) =>
        (base + i, g.mkString(" "), "en", src, g.mkString(" ").length.toLong)
      }.toSeq
    val docs = (docsOf("zipfy", zipfTokens, 0L) ++
      docsOf("flat", uniTokens, 100000L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.zipfFit(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // JVM replica with the identical quantized fold
    def replica(toks: Seq[String]): (Long, Long, Long, Double) = {
      val tf = toks.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      val top = tf.toSeq.sortBy { case (w, f) => (-f, w) }
        .take(TextOps.ZipfTopK).zipWithIndex
      def q12(x: Double) = BigDecimal(x)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      val terms = top.map { case ((_, f), i) =>
        val x = q12(math.log(i + 1.0)).toDouble
        val y = q12(math.log(f.toDouble)).toDouble
        (q12(x * y), BigDecimal(x), BigDecimal(y), q12(x * x))
      }
      val n = top.size.toDouble
      val sxy = terms.map(_._1).sum.toDouble
      val sx = terms.map(_._2).sum.toDouble
      val sy = terms.map(_._3).sum.toDouble
      val sxx = terms.map(_._4).sum.toDouble
      val slope = BigDecimal((n * sxy - sx * sy) / (n * sxx - sx * sx))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (tf.values.sum, tf.size.toLong, top.size.toLong, slope)
    }
    assert(got("zipfy") == replica(zipfTokens),
      s"zipfy: got ${got("zipfy")}, want ${replica(zipfTokens)}")
    assert(got("flat") == replica(uniTokens),
      s"flat: got ${got("flat")}, want ${replica(uniTokens)}")
    // and the slopes READ right: the planted law fits ≈ -1, the
    // uniform source is flat
    assert(math.abs(got("zipfy")._4 + 1.0) < 0.05, got("zipfy").toString)
    assert(math.abs(got("flat")._4) < 1e-5, got("flat").toString)
  }

  test("t30 template-prefix detection pins a planted boilerplate " +
       "source exactly and breaks prefix ties deterministically") {
    import spark.implicits._
    import graft.operators.TextOps
    val header = "cookie notice please accept our terms"
    val docs = (
      // templated source: 9 of 12 docs share the 5-token header prefix
      (1 to 9).map(i => (i.toLong, s"$header body $i words", "en", "tmpl")) ++
      (10 to 12).map(i => (i.toLong, s"unique opening line number $i", "en", "tmpl")) ++
      // diverse source: every prefix distinct → ties broken by prefix asc
      (20 to 25).map(i => (i.toLong, s"doc $i starts differently here always", "en", "divr")))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.templatePrefix(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getDouble(5)))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("tmpl") == ((12L, 4L, "cookie notice please accept our",
      9L, r6(9.0 / 12))), got.toString)
    // all-distinct source: count ties at 1, smallest prefix wins
    val wantDivr = (20 to 25).map(i => s"doc $i starts differently here").min
    assert(got("divr") == ((6L, 6L, wantDivr, 1L, r6(1.0 / 6))),
      got.toString)
  }

  test("t31 frequency spectrum pins a planted Good-Turing profile " +
       "exactly and conserves vocab and occurrence mass on the corpus") {
    import spark.implicits._
    import graft.operators.TextOps
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // planted: 3 hapaxes (tf 1 → bucket 0), 2 tokens at tf 2 and one
    // at tf 3 (bucket 1), one at tf 5 (bucket 2)
    val toks = Seq("h1", "h2", "h3") ++
      Seq.fill(2)("d1") ++ Seq.fill(2)("d2") ++ Seq.fill(3)("d3") ++
      Seq.fill(5)("p1")
    val docs = Seq((0L, toks.mkString(" "))).toDF("doc_id", "text")
    val got = TextOps.freqSpectrum(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    val v = 7.0; val n = 15.0
    assert(got == Map(
      0L -> ((3L, 1L, 1L, 3L, r6(3 / v), r6(3 / n))),
      1L -> ((3L, 2L, 3L, 7L, r6(3 / v), r6(7 / n))),
      2L -> ((1L, 5L, 5L, 5L, r6(1 / v), r6(5 / n)))), got.toString)
    // corpus-level conservation: vocab shares and occurrence shares
    // must each sum to 1 (±rounding), and occurrences to the corpus
    // token count
    val corpus = TextOps.freqSpectrum(
      Tables.load(spark, sfDir, "documents")).collect()
    val totalTokens = Tables.load(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(col("text"), " ")).as("n"))
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(corpus.map(_.getLong(4)).sum == totalTokens)
    assert(math.abs(corpus.map(_.getDouble(5)).sum - 1.0) < 1e-4)
    assert(math.abs(corpus.map(_.getDouble(6)).sum - 1.0) < 1e-4)
  }

  test("t32 unigram-LM training matches a JVM hard-EM replica and " +
       "beats greedy longest-match where greedy mis-segments") {
    import spark.implicits._
    // corpus engineered so Viterbi and greedy longest-match DISAGREE
    // on "aab" under the learned scores: "ab" is frequent, "aa" rare,
    // so a+ab beats greedy's aa+b. maxPiece = 2 keeps whole words
    // from being single pieces.
    val docs = (
      (1 to 100).map(i => (i.toLong, "ab")) ++
      (1 to 5).map(i => (100L + i, "aab"))).toDF("doc_id", "text")
    val got = graft.operators.TextOps.unigramLm(docs, maxPiece = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // ---- JVM replica with the operator's exact quantization ----
    def r6(x: Double): Double = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val words = Map("ab" -> 100L, "aab" -> 5L)
    val subs = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    for ((w, c) <- words; i <- 0 until w.length;
         j <- 1 to math.min(2, w.length - i))
      subs(w.substring(i, i + j)) += c
    val seedSet = (subs.toSeq.sortBy { case (p, f) => (-f, p) }.take(40) ++
      subs.toSeq.filter(_._1.length == 1)).distinct
    val tot0 = seedSet.map(_._2).sum
    var logp: Map[String, Double] =
      seedSet.map { case (p, f) => p -> r6(math.log(f.toDouble / tot0)) }.toMap
    def viterbi(w: String): Seq[String] = {
      val bs = Array.fill(w.length + 1)(0.0)
      val bp = Array.fill(w.length + 1)(0)
      for (i <- 1 to w.length) {
        var best = Double.NegativeInfinity; var bj = 0
        for (j <- 1 to math.min(i, 2)) {
          val s = bs(i - j) +
            logp.getOrElse(w.substring(i - j, i), -1.0e18)
          if (s > best) { best = s; bj = j }
        }
        bs(i) = best; bp(i) = bj
      }
      var pos = w.length
      val ps = scala.collection.mutable.ArrayBuffer[String]()
      while (pos > 0) { ps += w.substring(pos - bp(pos), pos); pos -= bp(pos) }
      ps.toSeq
    }
    var cnts: Map[String, Long] = Map.empty
    for (_ <- 1 to graft.operators.TextOps.T32EmSteps) {
      cnts = words.toSeq.flatMap { case (w, c) =>
        viterbi(w).map(_ -> c) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      val tc = cnts.values.sum
      logp = cnts.map { case (p, c) => p -> r6(math.log(c.toDouble / tc)) }
    }
    val want = cnts.toSeq.sortBy(_._1)
      .map { case (p, c) => (p, c, r6(logp(p)) + 0.0) }
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // ---- greedy cross-check: Viterbi strictly beats longest-match ----
    def score(ps: Seq[String]): Double =
      ps.map(p => logp.getOrElse(p, -1.0e18)).sum
    def greedy(w: String): Seq[String] = {
      var pos = 0
      val ps = scala.collection.mutable.ArrayBuffer[String]()
      while (pos < w.length) {
        val j = (math.min(2, w.length - pos) to 1 by -1)
          .find(j => logp.contains(w.substring(pos, pos + j))).getOrElse(1)
        ps += w.substring(pos, pos + j); pos += j
      }
      ps.toSeq
    }
    assert(words.keys.forall(w => score(viterbi(w)) >= score(greedy(w))),
      "Viterbi below greedy — DP broken")
    // the planted word: the prune dropped aa/b (never used by any
    // best segmentation), and Viterbi routes a+ab where a greedy
    // longest-match under the SEED vocab would have taken aa+b
    assert(viterbi("aab") == Seq("ab", "a"),
      s"unexpected segmentation ${viterbi("aab")}")
    assert(got.map(_._1).toSet == Set("a", "ab"),
      s"prune kept unused pieces: ${got.map(_._1).toSet}")
  }

  test("t33 Kneser-Ney matches a JVM replica and rewards continuation " +
       "diversity where add-one smoothing is blind") {
    import spark.implicits._
    // 'hub' follows THREE distinct contexts (q, a, b); 'solo' follows
    // only q. The bigrams "q hub" and "q solo" have identical counts
    // and the identical context total, so ONLY the continuation term
    // can separate the two docs.
    val corpus = Seq(
      (1L, "q hub"), (2L, "q solo"), (3L, "a hub"), (4L, "b hub"))
    val got = TextOps.knBigramLm(corpus.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // JVM replica with the operator's exact arithmetic
    val D = TextOps.KnDiscount
    val bgs = corpus.flatMap { case (id, t) =>
      t.split(" ").sliding(2).filter(_.length == 2)
        .map(p => (id, p(0) + " " + p(1))).toSeq }
    val perDoc = bgs.groupBy(identity).toSeq
      .map { case ((id, bg), l) => (id, bg, l.size.toLong) }
    val cb = bgs.map(_._2).groupBy(identity)
      .map { case (bg, l) => bg -> l.size.toLong }
    val ctx = cb.groupBy(_._1.split(" ")(0))
      .map { case (w1, m) => w1 -> ((m.values.sum, m.size)) }
    val cont = cb.groupBy(_._1.split(" ").last)
      .map { case (w2, m) => w2 -> m.size }
    val nTypes = cb.size
    val want = perDoc.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, l) =>
      val cs = l.sortBy(_._2).map { case (_, bg, tf) =>
        val (cc, n1f) = ctx(bg.split(" ")(0))
        val p = (cb(bg).toDouble - D) / cc.toDouble +
          (D * n1f.toDouble / cc.toDouble) *
            (cont(bg.split(" ").last).toDouble / nTypes.toDouble)
        tf.toDouble * -math.log(p)
      }
      val n = l.map(_._3).sum
      (id, n, BigDecimal(cs.foldLeft(0.0)(_ + _) / n.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    val ce = got.map(r => r._1 -> r._3).toMap
    assert(ce(1L) < ce(2L),
      s"diverse continuation not rewarded: hub=${ce(1L)} solo=${ce(2L)}")
    // sf corpus sanity: every scored doc finite and positive
    val sf = TextOps.knBigramLm(spark, sfDir).collect()
    assert(sf.nonEmpty && sf.forall { r =>
      val v = r.getDouble(2); !v.isNaN && v > 0.0 }, "sf corpus scoring")
  }

  test("t34 Heaps fit is exactly 1 on an all-novel corpus, exactly 0 on " +
       "a closed vocabulary, and lands between on real text") {
    import spark.implicits._
    // every doc introduces only new tokens → V = T at every power-of-2
    // checkpoint → the ln-ln points are collinear with slope exactly 1
    // and intercept exactly 0 (K = 1)
    val novel = (0L until 8L)
      .map(i => (i, s"w${i}a w${i}b")).toDF("doc_id", "text")
    val gotNovel = TextOps.heapsFit(novel).head()
    assert((gotNovel.getLong(0), gotNovel.getLong(1), gotNovel.getLong(2),
      gotNovel.getDouble(3), gotNovel.getDouble(4)) ==
      ((3L, 16L, 16L, 1.0, 1.0)), s"novel corpus: $gotNovel")
    // one fixed token everywhere → V = 1 at every checkpoint → slope
    // exactly 0, K = exp(0) = 1
    val closed = (0L until 8L).map(i => (i, "w w w")).toDF("doc_id", "text")
    val gotClosed = TextOps.heapsFit(closed).head()
    assert((gotClosed.getLong(0), gotClosed.getLong(1), gotClosed.getLong(2),
      gotClosed.getDouble(3), gotClosed.getDouble(4)) ==
      ((3L, 24L, 1L, 0.0, 1.0)), s"closed corpus: $gotClosed")
    // sf corpus: the generator draws from a FIXED word list, so the
    // fit must detect saturation — β at (or near) 0 with K ≈ the
    // full vocabulary. That is the diagnosis the operator exists to
    // make: this corpus adds no novelty at the frontier.
    val sf = TextOps.heapsFit(spark, sfDir).head()
    assert(sf.getDouble(3) >= 0.0 && sf.getDouble(3) < 0.5 &&
      sf.getDouble(4) > 0.0, s"sf Heaps fit: $sf")
    assert(sf.getDouble(4) <= sf.getLong(2).toDouble,
      s"K above the total vocabulary: $sf")
  }

  test("fertility: short-word language at 1 piece/word, long-word " +
       "language fragments, exact byte panel") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ab cd", "xx", "s0", 5L),       // 2 words, 2 pieces, 5 bytes
      (2L, "abcdefgh", "yy", "s0", 8L),    // 1 word, 2 pieces (4+4)
      (3L, "abcd efgh", "xx", "s0", 9L))   // 2 words, 2 pieces
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.fertility(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(got("xx") == ((2L, 4L, 4L, 14L, 1.0, 3.5)), got("xx").toString)
    assert(got("yy") == ((1L, 1L, 2L, 8L, 2.0, 4.0)), got("yy").toString)
    // sf corpus: fertility ≥ 1 for every language of 1–4-char-piece
    // lexing, bytes_per_piece bounded by the piece length cap + slack
    val sfRows = TextOps.fertility(spark, sfDir).collect()
    assert(sfRows.nonEmpty && sfRows.forall(r =>
      r.getDouble(5) >= 1.0 && r.getDouble(6) > 0.0), sfRows.mkString(";"))
  }

  test("char entropy: zero on constant text, exact ln2/ln4 on uniform " +
       "panels, other-bin counted, prose scores high") {
    import spark.implicits._
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val docs = Seq(
      (1L, "aaaa", "en", "s0", 4L),
      (2L, "abab", "en", "s0", 4L),   // two bins, ln 2
      (3L, "a!a!", "en", "s0", 4L),   // a + other, ln 2
      (4L, "the quick brown fox jumps over the lazy dog", "en", "s0", 43L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.charEntropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((4L, 0L, 0.0, true)), got(1L).toString)
    assert(got(2L) == ((4L, 0L, r6(math.log(2.0)), true)), got(2L).toString)
    assert(got(3L) == ((4L, 2L, r6(math.log(2.0)), true)), got(3L).toString)
    assert(got(4L)._3 > TextOps.CharEntropyJunkNats && !got(4L)._4,
      got(4L).toString)
    // sf corpus: entropies live in [0, ln 28]
    val sfRows = TextOps.charEntropy(spark, sfDir).collect()
    assert(sfRows.nonEmpty && sfRows.forall { r =>
      val h = r.getDouble(3)
      h >= 0.0 && h <= math.log(28.0) + 1e-9 }, "entropy out of range")
  }

  test("Moore-Lewis: domain-like text scores positive, background " +
       "text negative, and the domain slice outranks the rest on sf") {
    import spark.implicits._
    // domain docs speak 'aa', background speaks 'bb'; the probe docs
    // repeat one dialect each
    val docs = Seq(
      (1L, "aa aa aa aa", "dd", "s0", 11L),
      (2L, "aa aa aa aa", "dd", "s0", 11L),
      (3L, "bb bb bb bb", "xx", "s0", 11L),
      (4L, "bb bb bb bb", "xx", "s0", 11L),
      (5L, "aa aa", "xx", "s0", 5L),   // domain-like but labeled xx
      (6L, "bb bb", "dd", "s0", 5L))   // background-like but labeled dd
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.mooreLewis(docs, "dd").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(5), r.getBoolean(6)))).toMap
    assert(got(5L)._1 > 0.0 && got(5L)._2,
      s"domain-like probe not selected: ${got(5L)}")
    assert(got(3L)._1 < 0.0 && !got(3L)._2,
      s"background probe selected: ${got(3L)}")
    // sf corpus: the en slice's mean score exceeds the non-en mean —
    // the selector finds its own training domain
    val sf = TextOps.mooreLewis(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getDouble(5)))
    val en = sf.filter(_._1 == "en").map(_._2)
    val rest = sf.filter(_._1 != "en").map(_._2)
    assert(en.sum / en.length > rest.sum / rest.length,
      "en slice does not outrank the background")
  }

  test("t39 readability: exact counts and scores on planted prose, " +
       "fragments floor at one sentence, and corpus rows are total") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      // 6 words, 2 sentences, syllable groups: the(1) cat(1) sat(1) =
      // 3; it(1) was(1) flat(1) = 3 → 6 syllables, w/s = 3, syl/w = 1
      (1L, "the cat sat. it was flat."),
      // a fragment: no terminal punctuation → 1 sentence
      (2L, "no end in sight"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextOps.readability(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((6L, 2L, 6L)),
      r1.toString)
    // FRE = 206.835 − 1.015·3 − 84.6·1 = 119.19; FK = 0.39·3 + 11.8·1
    // − 15.59 = −2.62 (simple prose IS negative-grade)
    assert(r1.getDouble(4) == 119.19 && r1.getDouble(5) == -2.62,
      r1.toString)
    assert(got(2L).getLong(2) == 1L, "fragment not floored")
    // empty text: split yields [""] → 1 word, 0 syllables, defined
    assert(got(3L).getLong(1) == 1L && got(3L).getLong(3) == 0L)
    val sf = TextOps.readability(
      graft.Tables.load(spark, sfDir, "documents")).collect()
    assert(sf.length == 500 && sf.forall(!_.isNullAt(4)))
  }

  test("t40 RAKE: deg/freq favors long runs exactly, stopword-only " +
       "docs vanish, occurrence/doc censuses are exact, corpus sane") {
    import spark.implicits._
    import graft.operators.TextOps
    // deg(w) sums the lengths of phrases containing w, so a 3-word run
    // scores 3 per word = 9 total; "alpha beta" scores 2+2 = 4 (alpha
    // and beta each appear twice, always in 2-word runs); "gamma"
    // appears 3× always alone → score 1; the all-stopword doc yields
    // no phrase at all
    val docs = Seq(
      (0L, "alpha beta the alpha beta the gamma"),
      (1L, "gamma the gamma"),
      (2L, "delta epsilon zeta"),
      (3L, "the a to of and")).toDF("doc_id", "text")
    val got = TextOps.rakeKeywords(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      (1, "delta epsilon zeta", 3L, 1L, 1L, 9.0),
      (2, "alpha beta", 2L, 2L, 1L, 4.0),
      (3, "gamma", 1L, 3L, 2L, 1.0)), s"got: ${got.toSeq}")
    // corpus: top-k census, scores positive and ranked descending
    val sf = TextOps.rakeKeywords(spark, sfDir).collect()
    assert(sf.length == TextOps.RakeTopK, s"rows: ${sf.length}")
    assert(sf.map(_.getDouble(5)).toSeq ==
      sf.map(_.getDouble(5)).sortBy(-_).toSeq, "not rank-ordered")
    assert(sf.forall(r => r.getDouble(5) > 0.0 && r.getLong(3) >= 1L
      && r.getLong(4) >= 1L), "degenerate corpus row")
  }

  test("t41 MTLD: factor resets land exactly, the partial tail earns " +
       "fractional credit, diverse-short docs are NULL, corpus sane") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      // walk: a b c d keep TTR = 1; 5th a → 4/5 = 0.8; 6th a → 4/6 <
      // 0.72 → factor 1, reset; a (1/1), a (1/2 < 0.72) → factor 2,
      // reset; end flush → mtld = 8/2 = 4
      (0L, "a b c d a a a a"),
      // all distinct: TTR never drops, no factors, zero partial → NULL
      (1L, "x y z"),
      // w w: 1/2 < 0.72 every second token → 2 factors in 4 tokens
      (2L, "w w w w"),
      // ends mid-factor at TTR = 3/4: partial = (1−0.75)/0.28 and
      // mtld = 4/partial = 4.48 exactly on the round-6 grid
      (3L, "p q r r")).toDF("doc_id", "text")
    val got = TextOps.mtld(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got(0L) == ((8L, 2L, Some(4.0))), s"doc 0: ${got(0L)}")
    assert(got(1L) == ((3L, 0L, None)), s"doc 1: ${got(1L)}")
    assert(got(2L) == ((4L, 2L, Some(2.0))), s"doc 2: ${got(2L)}")
    assert(got(3L) == ((4L, 0L, Some(4.48))), s"doc 3: ${got(3L)}")
    // corpus: total census, mtld positive where present
    val sf = TextOps.mtld(spark, sfDir).collect()
    assert(sf.length == 500, s"rows: ${sf.length}")
    assert(sf.forall(r => r.isNullAt(3) || r.getDouble(3) > 0.0),
      "non-positive MTLD")
  }

  test("t42 JSD: identical sources score 0, disjoint vocabularies " +
       "score exactly ln 2 (norm 1), corpus stays inside the bound") {
    import spark.implicits._
    import graft.operators.TextOps
    def mk(rows: Seq[(Long, String, String)]) =
      rows.map { case (id, src, txt) => (id, txt, "en", src, 1L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    // same: identical token distributions → every shared contribution
    // is p·ln 1 = 0 and the one-sided tails vanish on the round-6
    // grid (roundz keeps −0.0 out); disjoint: NO shared terms → the
    // analytic tail alone = ½·ln2·(1+1) = ln 2, norm exactly 1
    val docs = mk(Seq(
      (1L, "sameA", "alpha beta beta gamma"),
      (2L, "sameB", "beta alpha gamma beta"),
      (3L, "onlyX", "delta delta epsilon"),
      (4L, "onlyY", "zeta eta eta theta"),
      (5L, "mixed", "alpha delta delta")))
    val got = TextOps.jsDivergence(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val byPair = got.map(t => (t._1, t._2) -> t).toMap
    val same = byPair(("sameA", "sameB"))
    assert(same._3 == 3L && same._4 == 0.0 && same._5 == 0.0,
      s"identical sources: $same")
    val disj = byPair(("onlyX", "onlyY"))
    assert(disj._3 == 0L && disj._5 == 1.0 &&
      math.abs(disj._4 - math.log(2.0)) < 1e-6,
      s"disjoint sources: $disj")
    assert(got.length == 10, s"pair universe: ${got.length}")
    // a partial overlap (one shared term) sits strictly between the
    // extremes
    val mid = byPair(("mixed", "sameA"))
    assert(mid._3 == 1L && mid._4 > 0.0 && mid._5 < 1.0,
      s"partial overlap: $mid")
    // corpus: symmetric-bounded in [0, ln 2], every pair emitted
    val sf = TextOps.t42JsDivergence(spark, sfDir).collect()
    val ns = Tables.load(spark, sfDir, "documents")
      .select(col("source")).distinct().count()
    assert(sf.length == (ns * (ns - 1) / 2).toInt, s"pairs: ${sf.length}")
    assert(sf.forall(r => r.getDouble(3) >= 0.0 &&
      r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0 + 1e-9),
      "JSD out of [0, ln 2]")
  }

  test("t43 compression signal matches an exact JVM replica on the " +
       "corpus and separates planted repetitive vs incompressible docs") {
    import spark.implicits._
    // exact replica gate (the operator's oracle — DuckDB has no
    // deflate): same deflateLen, same arithmetic, bitwise equality
    val docs = Tables.load(spark, sfDir, "documents")
    val got = TextOps.t43CompressionSignal(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    val expect = docs.select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
      .filter { case (_, _, t) => t != null && t.nonEmpty }
      .map { case (id, src, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val dl = TextOps.deflateLen(bytes)
        val len = bytes.length.toLong
        val ratio = BigDecimal(dl.toDouble / len)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        (id, src, len, dl, ratio,
          math.min(dl * 10L / len, TextOps.T43BucketCap))
      }.sortBy(_._1)
    assert(got.length == expect.length && got.length > 0,
      s"row count: ${got.length} vs ${expect.length}")
    got.zip(expect).foreach { case (g, e) =>
      assert(g == e, s"replica mismatch: $g vs $e") }
    // planted tails: template spam deflates to a sliver; hex soup
    // stays near (or past) its raw size band
    val spam = "the cat sat on the mat and " * 200
    val soup = (0 until 400).map(i =>
      Integer.toHexString((i * 2654435761L % 2147483647L).toInt))
      .mkString("")
    val planted = Seq((0L, spam, "en", "spam", spam.length.toLong),
      (1L, soup, "xx", "soup", soup.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val p = TextOps.t43CompressionSignal(planted).collect()
      .map(r => r.getLong(0) -> (r.getDouble(4), r.getLong(5))).toMap
    assert(p(0L)._1 < 0.05 && p(0L)._2 == 0L,
      s"repetitive doc not detected: ${p(0L)}")
    assert(p(1L)._1 > 0.5 && p(1L)._2 >= 5L,
      s"incompressible doc not detected: ${p(1L)}")
    assert(p(0L)._1 > 0.0, "deflate_len can never be zero")
    // the per-source buckets are the exact integer-sum rollup of the
    // per-doc frame (order-free longs, one division)
    val perDoc = TextOps.t43CompressionSignal(docs)
    val buckets = TextOps.t43CompressionBuckets(perDoc).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val local = got.groupBy(g => (g._2, g._6)).map { case (k, rows) =>
      k -> (rows.length.toLong,
        BigDecimal(rows.map(_._4).sum.toDouble / rows.map(_._3).sum.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
    }
    assert(buckets == local, s"bucket rollup diverged:\n$buckets\nvs\n$local")
  }

  test("burstiness: exact planted censuses, content-word adaptation " +
       "beats prior, tied top-k boundary cuts by term order, corpus " +
       "bounds") {
    import spark.implicits._
    import graft.operators.TextOps
    // a: cf=4 df=2 df2=1 (clumps in d1); b: cf=2 df=2 df2=0 (spread);
    // c: cf=3 df=2 df2=1. D=3
    val docs = Seq((1L, "a a a b"), (2L, "a c"), (3L, "b c c"))
      .toDF("doc_id", "text")
    val got = TextOps.burstiness(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(got("a") == ((4L, 2L, 1L, 2.0, 0.5, 0.666667)), got("a").toString)
    assert(got("b") == ((2L, 2L, 0L, 1.0, 0.0, 0.666667)), got("b").toString)
    assert(got("c") == ((3L, 2L, 1L, 1.5, 0.5, 0.666667)), got("c").toString)
    // 60 singleton terms tie on cf — the cut keeps the 50 smallest by
    // term order (the total-order contract at the boundary)
    val wide = Seq((1L, (0 until 60).map(i => f"w$i%02d").mkString(" ")))
      .toDF("doc_id", "text")
    val cut = TextOps.burstiness(wide).collect().map(_.getString(0))
    assert(cut.length == TextOps.BurstTopK &&
      cut.toSeq == (0 until 50).map(i => f"w$i%02d"), cut.take(5).mkString(","))
    // sf corpus: ratios live on their probability/mean scales
    val sf = TextOps.burstiness(spark, sfDir).collect()
    assert(sf.nonEmpty && sf.forall { r =>
      r.getDouble(4) >= 1.0 && r.getDouble(5) >= 0.0 &&
      r.getDouble(5) <= 1.0 && r.getDouble(6) > 0.0 &&
      r.getDouble(6) <= 1.0 }, sf.length.toString)
  }

  test("Yule's K: exact planted spectra, all-singleton zero, corpus " +
       "under the 10^4 ceiling") {
    import spark.implicits._
    import graft.operators.TextOps
    // rep: "a a a b" → c = {3, 1}, N = 4, Σc² = 10 →
    // K = 10⁴(10−4)/16 = 3750; div: three singletons → K = 0
    val docs = Seq(("rep", 1L, "a a a b"), ("div", 2L, "x y z"))
      .toDF("source", "doc_id", "text")
    val got = TextOps.yuleK(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got("rep") == ((4L, 2L, 3750.0)), got("rep").toString)
    assert(got("div") == ((3L, 3L, 0.0)), got("div").toString)
    // sf corpus: K lives in [0, 10⁴) — the one-type ceiling is open
    val sf = TextOps.yuleK(spark, sfDir).collect()
    assert(sf.nonEmpty && sf.forall { r =>
      r.getDouble(3) >= 0.0 && r.getDouble(3) < 10000.0 },
      sf.mkString(";"))
  }

  test("t46 KS drift: disjoint supports hit 1.0, identical halves 0.0, " +
       "single source NULL, random frames match a JVM replica") {
    import spark.implicits._
    import graft.operators.TextOps
    def run(rows: Seq[(String, Long)]) =
      TextOps.ksDriftFromLengths(rows.toDF("source", "n_chars"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    def replica(rows: Seq[(String, Long)])
        : Seq[(String, Long, Long, Option[Double])] = {
      val nn = rows.size.toLong
      val vals = rows.map(_._2).distinct.sorted
      rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, mine) =>
        val ns = mine.size.toLong
        val nr = nn - ns
        val scored = vals.map { v =>
          val cs = mine.count(_._2 <= v).toLong
          val cr = rows.count(t => t._1 != src && t._2 <= v).toLong
          ((cs * nr - cr * ns).abs, v)
        }
        val best = scored.maxBy(t => (t._1, -t._2))
        val at = scored.filter(_._1 == best._1).map(_._2).min
        val ks = if (nr > 0) Some(BigDecimal(
          best._1.toDouble / (ns.toDouble * nr.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) else None
        (src, ns, at, ks)
      }
    }
    // disjoint supports: both ECDFs saturate before the other starts →
    // KS exactly 1.0, argmax at the low block's last value
    val far = Seq.tabulate(4)(i => ("lo", (i + 1).toLong)) ++
      Seq.tabulate(4)(i => ("hi", (i + 11).toLong))
    assert(run(far) == Seq(("hi", 4L, 4L, Some(1.0)),
      ("lo", 4L, 4L, Some(1.0))), run(far).toString)
    // identical length multisets: zero everywhere, argmax tie-breaks
    // to the smallest value, ks is POSITIVE zero
    val same = Seq(("a", 5L), ("a", 5L), ("a", 7L),
      ("b", 5L), ("b", 5L), ("b", 7L))
    run(same).foreach { r =>
      assert(r._3 == 5L &&
        java.lang.Double.doubleToLongBits(r._4.get) == 0L, r.toString) }
    // hand geometry: A={1,1,1,2}, B={1,2,2,2} → KS = |3−1|/4 = 0.5 at 1
    val half = Seq(("A", 1L), ("A", 1L), ("A", 1L), ("A", 2L),
      ("B", 1L), ("B", 2L), ("B", 2L), ("B", 2L))
    assert(run(half) == Seq(("A", 4L, 1L, Some(0.5)),
      ("B", 4L, 1L, Some(0.5))), run(half).toString)
    // a single-source corpus has no "rest": NULL, not a throw
    assert(run(Seq(("only", 3L), ("only", 9L)))
      == Seq(("only", 2L, 3L, None)))
    // random frames: exact replica equality
    for (seed <- Seq(21L, 22L)) {
      val rng = new scala.util.Random(seed)
      val rows = Seq.fill(120)(
        (s"s${rng.nextInt(5)}", (1L + rng.nextInt(12)).toLong))
      assert(run(rows) == replica(rows), s"seed $seed")
    }
    // sf corpus: one row per source, every KS in [0, 1]
    val sf = TextOps.t46KsDrift(spark, sfDir).collect()
    assert(sf.length == 20, sf.length.toString)
    sf.foreach { r => assert(r.getDouble(3) >= 0.0 &&
      r.getDouble(3) <= 1.0, r.toString) }
  }

  test("t47 PMI: planted perfect collocations score ln 8 with NPMI 3, " +
       "one-bigram corpus NULLs NPMI, count floor filters, corpus sane") {
    import spark.implicits._
    import graft.operators.TextOps
    def run(texts: Seq[String]) = TextOps.pmiCollocations(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))
    // two disjoint perfect collocations: p(ab) = 1/2, p(a) = p(b) =
    // 1/4 → PMI = ln 8 = 2.079442; NPMI = ln 8 / −ln(1/2) = exactly 3
    // (the >1 value is the known adjacent-bigram artifact: token
    // probabilities are over N = 2B positions, not B); tie-break by
    // bigram text
    val two = run(Seq.fill(5)("aa bb") ++ Seq.fill(5)("cc dd"))
    assert(two.toSeq == Seq(
      (1L, "aa bb", 5L, 2.079442, Some(3.0)),
      (2L, "cc dd", 5L, 2.079442, Some(3.0))), two.mkString(";"))
    // a single distinct bigram: p(ab) = 1 → −ln p(ab) = 0 → NPMI NULL
    val one = run(Seq.fill(6)("aa bb"))
    assert(one.length == 1 && one.head._4 == 1.386294 &&
      one.head._5 == None, one.mkString(";"))
    // the count floor: 4 < PmiMinCount occurrences never rank
    assert(run(Seq.fill(4)("ee ff")).isEmpty)
    // corpus: full top-k, contiguous ranks, NPMI defined and ≤ 3
    val sf = TextOps.t47Pmi(spark, sfDir).collect()
    assert(sf.length == TextOps.PmiTopK, sf.length.toString)
    assert(sf.map(_.getLong(0)).toSeq ==
      (1 to TextOps.PmiTopK).map(_.toLong))
    sf.foreach { r => assert(!r.isNullAt(6) &&
      r.getDouble(6) <= 3.0 && r.getDouble(6) >= -1.0, r.toString) }
  }
}
