package graft.operators

import graft.{GraftFunctions, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the
  * LLM-training-pipeline extension (language ID, quality scoring,
  * token counting, fingerprinting). Everything is a per-row
  * projection: embarrassingly parallel, no shuffle, whole-stage
  * codegen (higher-order functions, no UDFs) — the shape that scales
  * linearly to 100 TB.
  */
object TextOps {

  private def words(c: Column): Column = split(c, " ")

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "or", "and", "of"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "es" -> Seq("el", "la", "los", "que", "de"),
    "fr" -> Seq("le", "les", "des", "et", "une"),
    "zh" -> Seq("shi", "bu", "wo", "ni", "ta"))

  /** Stopword-profile language ID: score each language by marker-word
    * hits, predict the argmax (ties resolved in fixed language order). */
  def langId(spark: SparkSession, dir: String): DataFrame =
    langId(Tables.parallel(Tables.load(spark, dir, "documents")))

  def langId(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(w, t => t.isInCollection(markers))).cast("long")
    }
    val scored = docs.select(
      (col("doc_id") +: scores.map { case (l, c) => c.as(s"s_$l") }): _*)
    val best = scores.map(_._1).map(l => col(s"s_$l"))
    // argmax with first-wins tie-break, expressed as a CASE chain that
    // the oracle mirrors literally.
    val caseChain = langMarkers.map(_._1).reverse
      .foldLeft(lit(null: String)) { case (els, lang) =>
        val c = col(s"s_$lang")
        val isMax = langMarkers.map(_._1).filter(_ != lang)
          .map(o => c >= col(s"s_$o")).reduce(_ && _)
        when(isMax, lit(lang)).otherwise(els)
      }
    scored.select(col("doc_id"),
      caseChain.as("pred_lang"),
      greatest(best: _*).as("n_markers"))
      .orderBy("doc_id")
  }

  /** Document quality scoring from lexical statistics: vocabulary
    * diversity, stopword density, mean word length, length credit. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    qualityScore(Tables.parallel(Tables.load(spark, dir, "documents")))

  def qualityScore(docs: DataFrame): DataFrame =
    qualityScored(docs).orderBy("doc_id")

  /** [[qualityScore]] without the presentation sort — the form other
    * operators (d9 canonical-doc selection) compose with, so no Sort
    * node sits in the middle of their plans. */
  def qualityScored(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val stop = Seq("the", "a", "or", "and", "of", "in", "is")
    docs.select(col("doc_id"),
        size(w).cast("long").as("n_words"),
        size(array_distinct(w)).cast("long").as("n_distinct"),
        size(filter(w, t => t.isInCollection(stop))).cast("long").as("n_stop"),
        length(col("text")).cast("long").as("n_chars_m"))
      .select(col("doc_id"), col("n_words"),
        (col("n_distinct").cast("double") / col("n_words").cast("double"))
          .as("distinct_ratio"),
        (col("n_stop").cast("double") / col("n_words").cast("double"))
          .as("stop_ratio"),
        ((col("n_chars_m").cast("double") - (col("n_words").cast("double") - lit(1.0))) /
          col("n_words").cast("double")).as("mean_word_len"))
      .withColumn("quality",
        round(lit(0.5) * col("distinct_ratio") +
          lit(0.3) * (lit(1.0) - col("stop_ratio")) +
          lit(0.2) * least(lit(1.0), col("n_words").cast("double") / lit(200.0)), 6))
  }

  /** Token counting: whitespace tokens, long tokens, and a BPE-ish
    * greedy ≤4-char alpha piece count via regexp. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    tokenCount(Tables.parallel(Tables.load(spark, dir, "documents")))

  def tokenCount(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    docs.select(col("doc_id"),
        size(w).cast("long").as("n_tokens"),
        size(filter(w, t => length(t) > 4)).cast("long").as("n_long_tokens"),
        regexp_count(col("text"), lit("[a-z]{1,4}")).cast("long").as("n_bpe_pieces"))
      .orderBy("doc_id")
  }

  /** Rolling polynomial hash fingerprint over the word stream
    * (mod 2^31-1 so the fold never overflows in either engine). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    fingerprint(Tables.parallel(Tables.load(spark, dir, "documents")))

  /** The rolling-hash fingerprint as a reusable column so consumers
    * (shardAssign, sequencePack) compute it inside their own single
    * scan instead of joining a second corpus-scale projection. */
  private def fpCol: Column =
    expr("""aggregate(
              transform(split(text, ' '), w -> CAST(length(w)*131 + ascii(w) AS BIGINT)),
              CAST(0 AS BIGINT),
              (acc, c) -> (acc * 1000003 + c) % 2147483647)""")

  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fpCol.as("fp")).orderBy("doc_id")

  /** Repetition-based quality signals (the Gopher/C4-style filters):
    * duplicate word-bigram fraction and the most-frequent-token share.
    * Pure per-row projection; the mode count is O(distinct × n) per
    * document, bounded by document length, not corpus size. */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    repetition(Tables.parallel(Tables.load(spark, dir, "documents")))

  def repetition(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    // native shingler, duplicates kept (the dup-fraction needs the
    // multiset); the composed transform re-ran split once per bigram
    val bigrams = graft.GraftFunctions.wordShingles(col("text"), 2, dedup = false)
    docs.select(col("doc_id"), w.as("ws"), bigrams.as("bg"))
      .select(col("doc_id"),
        size(col("bg")).cast("long").as("n_bigrams"),
        round(lit(1.0) - size(array_distinct(col("bg"))).cast("double") /
          size(col("bg")).cast("double"), 6).as("dup_bigram_frac"),
        round(expr("array_max(transform(array_distinct(ws), t -> size(filter(ws, x -> x = t))))")
          .cast("double") / size(col("ws")).cast("double"), 6).as("top_token_frac"))
      .withColumn("is_repetitive",
        col("dup_bigram_frac") > 0.2 || col("top_token_frac") > 0.2)
      .orderBy("doc_id")
  }

  /** Deterministic shard assignment for training-data layout: docs
    * land in `nShards` shards by fingerprint hash (reproducible at any
    * parallelism), with per-shard doc and token budgets — the write
    * side would be `partitionBy("shard")`. */
  def shardAssign(spark: SparkSession, dir: String, nShards: Int = 128): DataFrame =
    shardAssign(Tables.parallel(Tables.load(spark, dir, "documents")), nShards)

  def shardAssign(docs: DataFrame, nShards: Int): DataFrame =
    // ONE scan: fingerprint + token count in the same projection (the
    // former fingerprint ⋈ tokens form read the corpus twice and paid
    // a doc_id shuffle before the aggregation)
    docs.select(pmod(fpCol, lit(nShards.toLong)).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .orderBy("shard")

  /** PII redaction — the scrub pass every public-web training corpus
    * runs before tokenization. The synthetic corpus carries no natural
    * PII, so deterministic PII (email/URL/phone derived from doc_id)
    * is INJECTED first and the redactor must find exactly that — the
    * oracle replays injection + redaction, so a pattern that over- or
    * under-matches breaks the gate. Patterns stay in the
    * Java-regex ∩ RE2 common subset (char classes + bounded
    * quantifiers, no lookaround) so both engines mean the same thing.
    * Pure per-row projection: codegen'd regexps, zero shuffle. */
  final val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  final val UrlRe = "https?://[A-Za-z0-9./_-]+"
  final val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    piiRedact(Tables.parallel(Tables.load(spark, dir, "documents")))

  def piiRedact(docs: DataFrame): DataFrame = {
    val injected = concat(col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 4 === 0,
        concat(lit(" see https://site"), col("doc_id"), lit(".example/page")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call 555-"), (pmod(col("doc_id"), lit(900)) + 100),
          lit("-"), (pmod(col("doc_id"), lit(9000)) + 1000)))
        .otherwise(lit("")))
    docs.select(col("doc_id"), injected.as("t"))
      .select(col("doc_id"),
        regexp_count(col("t"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("t"), lit(UrlRe)).cast("long").as("n_urls"),
        regexp_count(col("t"), lit(PhoneRe)).cast("long").as("n_phones"),
        regexp_replace(regexp_replace(regexp_replace(col("t"),
          EmailRe, "<EMAIL>"), UrlRe, "<URL>"), PhoneRe, "<PHONE>")
          .as("clean"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[piiRedact]] — same injection arithmetic, same
    * patterns, 'g'-flagged replaces (Spark replaces globally by
    * default; DuckDB needs the flag). */
  def piiOracleSql: String = s"""
      WITH inj AS (
        SELECT doc_id, text
          || CASE WHEN doc_id % 3 = 0
               THEN ' contact user' || doc_id || '@example.com' ELSE '' END
          || CASE WHEN doc_id % 4 = 0
               THEN ' see https://site' || doc_id || '.example/page' ELSE '' END
          || CASE WHEN doc_id % 5 = 0
               THEN ' call 555-' || (doc_id % 900 + 100)
                 || '-' || (doc_id % 9000 + 1000) ELSE '' END AS t
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(t, '$UrlRe')) AS BIGINT) AS n_urls,
        CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phones,
        regexp_replace(regexp_replace(regexp_replace(t,
          '$EmailRe', '<EMAIL>', 'g'), '$UrlRe', '<URL>', 'g'),
          '$PhoneRe', '<PHONE>', 'g') AS clean
      FROM inj ORDER BY doc_id"""

  /** Boilerplate stripping — the crawl-cleaning stage before any
    * dedup/quality pass: drop markup tags, collapse runs of
    * whitespace, trim. Deterministic markup is INJECTED from doc_id
    * (the corpus has none), so the oracle verifies exact tag counts
    * and the md5 of the cleaned text — the t7 injected-PII pattern.
    * Patterns stay in the Java-regex ∩ RE2 common subset; pure
    * zero-shuffle projection. */
  final val TagRe = "<[^>]*>"

  def boilerplate(spark: SparkSession, dir: String): DataFrame =
    boilerplate(Tables.parallel(Tables.load(spark, dir, "documents")))

  def boilerplate(docs: DataFrame): DataFrame = {
    val injected = concat(
      when(col("doc_id") % 2 === 0,
        lit("<div class=nav>Home | About</div> ")).otherwise(lit("")),
      col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" <b>ad"), col("doc_id"), lit("</b>  <i>click</i>")))
        .otherwise(lit("")),
      lit("  "))
    docs.select(col("doc_id"), injected.as("t"))
      .select(col("doc_id"),
        regexp_count(col("t"), lit(TagRe)).cast("long").as("n_tags"),
        trim(regexp_replace(regexp_replace(col("t"), TagRe, " "), " {2,}", " "))
          .as("clean"))
      .select(col("doc_id"), col("n_tags"),
        length(col("clean")).cast("long").as("clean_len"),
        md5(col("clean")).as("clean_hash"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[boilerplate]] — same injection arithmetic,
    * same patterns, 'g'-flagged replaces. */
  def t12OracleSql: String = s"""
      WITH inj AS (
        SELECT doc_id,
          CASE WHEN doc_id % 2 = 0
            THEN '<div class=nav>Home | About</div> ' ELSE '' END
          || text
          || CASE WHEN doc_id % 3 = 0
            THEN ' <b>ad' || doc_id || '</b>  <i>click</i>' ELSE '' END
          || '  ' AS t
        FROM documents),
      cl AS (
        SELECT doc_id, t,
          trim(regexp_replace(regexp_replace(t, '$TagRe', ' ', 'g'),
            ' {2,}', ' ', 'g')) AS clean
        FROM inj)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t, '$TagRe')) AS BIGINT) AS n_tags,
        CAST(length(clean) AS BIGINT) AS clean_len,
        md5(clean) AS clean_hash
      FROM cl ORDER BY doc_id"""

  /** Deterministic train/val/test split — the reproducible corpus
    * split every training pipeline needs. The split key is the first
    * hex nibble of md5(doc_id): content-independent, stable across
    * engines/runs/parallelism, and uniform, giving a 12/2/2 nibble
    * split (75% train, 12.5% val, 12.5% test). Comparing on the hex
    * CHARACTER avoids any hex→int conversion mismatch between engines.
    * Pure zero-shuffle projection; at 100 TB the assignment rides
    * along any scan for free (the write side is
    * `partitionBy("split")`). */
  def split3(spark: SparkSession, dir: String): DataFrame =
    split3(Tables.parallel(Tables.load(spark, dir, "documents")))

  def split3(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        substring(md5(col("doc_id").cast("string")), 1, 1).as("h"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .select(col("doc_id"),
        when(col("h") < "c", "train")
          .when(col("h") < "e", "val")
          .otherwise("test").as("split"),
        col("n_tokens"))
      .orderBy("doc_id")

  def split3OracleSql: String = """
      SELECT doc_id,
        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
             ELSE 'test' END AS split,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents ORDER BY doc_id"""

  /** t25: leakage audit of the train/val/test split — t9 assigns
    * membership by hash, but a hash split knows nothing about
    * CONTENT: near-copies of training documents routinely land in
    * the eval splits and silently inflate benchmark numbers (the
    * train→test contamination problem, the intra-corpus face of
    * d6's benchmark decontamination). For every val/test document:
    * how many of its distinct 3-word shingles also occur anywhere in
    * the TRAIN split, and the `leaky` cut at ≥ 20% overlap —
    * integer-exact as 5·hits ≥ shingles (no float share), guarded to
    * false for a shingle-less doc.
    *
    * Scale shape: one corpus pass splits and shingles in-row; the
    * train side collapses to a DISTINCT shingle set (vocabulary-
    * bounded, d10's discipline) and meets the eval shingle stream in
    * a LINEAR equi-join on the shingle key (shuffle join — at a real
    * 90/10 split NEITHER side is broadcastable, unlike d6 whose
    * benchmark side is small by assumption; AQE skew-split handles a
    * boilerplate shingle). One per-doc rollup. Nothing quadratic. */
  def leakageSplit(spark: SparkSession, dir: String): DataFrame =
    leakageSplit(Tables.parallel(Tables.load(spark, dir, "documents")))

  def leakageSplit(docs: DataFrame): DataFrame = {
    // t9's split expression VERBATIM — the audit must see the same
    // membership the split operator ships
    val splitCol = {
      val h = substring(md5(col("doc_id").cast("string")), 1, 1)
      when(h < "c", "train").when(h < "e", "val").otherwise("test")
    }
    val tagged = docs.select(col("doc_id"), splitCol.as("split"),
      col("text"))
    val trainSh = tagged.filter(col("split") === "train")
      .select(explode(graft.GraftFunctions.wordShingles(col("text"), 3))
        .as("sh"))
      .distinct()
      .withColumn("hit", lit(1))
    tagged.filter(col("split") =!= "train")
      .select(col("doc_id"), col("split"),
        explode_outer(graft.GraftFunctions.wordShingles(col("text"), 3))
          .as("sh"))
      .join(trainSh, Seq("sh"), "left_outer")
      .groupBy("doc_id", "split")
      .agg(countDistinct(col("sh")).as("n_shingles"),
        countDistinct(when(col("hit").isNotNull, col("sh")))
          .as("n_train_hits"))
      .select(col("doc_id"), col("split"), col("n_shingles"),
        col("n_train_hits"),
        (col("n_shingles") > 0 &&
          col("n_train_hits") * 5 >= col("n_shingles")).as("leaky"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[leakageSplit]] — t9's split CASE, the d6
    * shingle replica, the same distinct-set counts and integer cut. */
  def t25OracleSql: String = """
      WITH tagged AS (
        SELECT doc_id,
          CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                 THEN 'train'
               WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
                 THEN 'val'
               ELSE 'test' END AS split,
          text
        FROM documents),
      sh AS (
        SELECT doc_id, split,
          unnest(list_distinct(list_transform(
            generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
            i -> array_to_string(
              list_slice(string_split(text, ' '), i, i + 2), ' ')))) AS s
        FROM tagged),
      train AS (SELECT DISTINCT s FROM sh WHERE split = 'train'),
      agg AS (
        SELECT e.doc_id, e.split,
          CAST(count(DISTINCT e.s) AS BIGINT) AS n_shingles,
          CAST(count(DISTINCT CASE WHEN t.s IS NOT NULL THEN e.s END)
            AS BIGINT) AS n_train_hits
        FROM sh e LEFT JOIN train t ON t.s = e.s
        WHERE e.split <> 'train'
        GROUP BY e.doc_id, e.split)
      SELECT doc_id, split, n_shingles, n_train_hits,
        n_shingles > 0 AND n_train_hits * 5 >= n_shingles AS leaky
      FROM agg ORDER BY doc_id"""

  /** Corpus term statistics — term frequency, document frequency, and
    * IDF for the top terms (the vocabulary/stopword-profiling pass a
    * corpus pipeline runs before filtering). Explode → partial-agg:
    * the shuffle moves one row per DISTINCT term per partition (map-
    * side combine), the top-k is a TakeOrdered (no global sort
    * materialization), and the corpus size for IDF is a broadcast
    * single-row aggregate — never a driver-side collect. */
  def termFreq(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    termFreq(Tables.parallel(Tables.load(spark, dir, "documents")), k)

  def termFreq(docs: DataFrame, k: Int): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    docs.select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .crossJoin(broadcast(n))
      .select(col("term"), col("tf"), col("df"),
        round(log(col("n_docs").cast("double") / col("df").cast("double")), 6)
          .as("idf"))
      .orderBy(col("tf").desc, col("term"))
      .limit(k)
  }

  def termFreqOracleSql(k: Int = 100): String = s"""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      ag AS (
        SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
        FROM tok GROUP BY term),
      n AS (SELECT count(*) AS n_docs FROM documents)
      SELECT term, tf, df,
        round(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS idf
      FROM ag, n
      ORDER BY tf DESC, term
      LIMIT $k"""

  /** TF-IDF top terms per document (t14) — the per-doc keyword view
    * that [[termFreq]]'s corpus-level stats feed: score = tf ·
    * ln(N/df), top-k terms per document.
    *
    * Scale shape: one token explode + (doc, term) partial agg (the
    * fact-scale stage, map-side combined), a term-keyed agg for df
    * (bounded by vocabulary), N as a single-row broadcast, and a
    * per-document ranking window (partition = doc_id, bounded by
    * per-doc vocab — never a global sort). Ranking compares the
    * ROUNDED score (6 dp, term tie-break) so the order is identical
    * in both engines even if ln() differs in the last ulp. */
  def tfidfTopTerms(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    tfidfTopTerms(Tables.parallel(Tables.load(spark, dir, "documents")), k)

  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs.select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfTerm = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(dfTerm, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf").cast("double") *
        log(col("n_docs").cast("double") / col("df").cast("double")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("rnk"), col("score"))
      .orderBy("doc_id", "rnk")
  }

  def t14OracleSql(k: Int = 3): String = s"""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      sc AS (
        SELECT doc_id, term, tf,
          round(CAST(tf AS DOUBLE)
            * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS score
        FROM tf JOIN dfq USING (term), n),
      rk AS (
        SELECT doc_id, term, tf, score,
          CAST(row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term) AS INT) AS rnk
        FROM sc)
      SELECT doc_id, term, tf, rnk, score FROM rk
      WHERE rnk <= $k ORDER BY doc_id, rnk"""

  /** Deterministic stratified sample (t15) — k documents per language
    * stratum, selected by Knuth-multiplicative hash of doc_id (the
    * repo-wide reproducible-sampling idiom: same rows at any
    * parallelism, any engine, any day — what a training-data pipeline
    * needs from a "sample" far more than statistical novelty).
    *
    * Scale shape: the rank-within-stratum runs through the native
    * [[graft.plans.TopKPerGroupPlan]] (map-side per-stratum heaps,
    * shuffle carries ≤ k·strata rows) — NOT a window, which would
    * total-sort every stratum; with ~dozens of language strata over
    * billions of rows the heap path is the only shape that holds. */
  def stratifiedSample(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    stratifiedSample(Tables.parallel(Tables.load(spark, dir, "documents")), k)

  def stratifiedSample(docs: DataFrame, k: Int): DataFrame = {
    val hashed = docs.select(col("lang"), col("doc_id"),
      pmod(pmod(col("doc_id"), lit(1000000000L)) * lit(2654435761L),
        lit(2147483647L)).as("hsh"))
    graft.plans.TopK.perGroup(hashed, Seq("lang"),
        Seq(("hsh", true), ("doc_id", true)), k)
      .select(col("lang"), col("doc_id"), col("hsh"), col("rnk"))
      .orderBy("lang", "rnk")
  }

  def t15OracleSql(k: Int = 5): String = s"""
      WITH h AS (
        SELECT lang, doc_id,
          ((doc_id % 1000000000) * 2654435761) % 2147483647 AS hsh
        FROM documents),
      rk AS (
        SELECT lang, doc_id, hsh,
          CAST(row_number() OVER (PARTITION BY lang
            ORDER BY hsh, doc_id) AS INT) AS rnk
        FROM h)
      SELECT lang, doc_id, hsh, rnk FROM rk
      WHERE rnk <= $k ORDER BY lang, rnk"""

  /** Canonical text normalization + duplicate-key annotation (t16) —
    * the canonicalization pass exact dedup should run AFTER (d1 on raw
    * bytes misses case/punctuation/whitespace variants of the same
    * document): keep [a-zA-Z0-9 ], collapse runs of spaces, trim,
    * lowercase — deliberately ASCII-scoped so Java and DuckDB regex
    * semantics coincide exactly — then annotate each doc with its
    * canonical-form md5 and how many docs share it.
    *
    * Shape: the normalization is a zero-shuffle projection; the only
    * shuffle is the md5-keyed count (map-side combined), joined back
    * as a group count — candidate volume scales with duplicate
    * density, same argument as d1. */
  def normalize(spark: SparkSession, dir: String): DataFrame =
    normalize(Tables.parallel(Tables.load(spark, dir, "documents")))

  def normalize(docs: DataFrame): DataFrame = {
    val norm = lower(trim(regexp_replace(
      regexp_replace(col("text"), "[^a-zA-Z0-9 ]", " "), " +", " ")))
    val keyed = docs.select(col("doc_id"), md5(norm).as("norm_md5"),
      length(norm).cast("long").as("n_chars_norm"))
    val groups = keyed.groupBy("norm_md5").agg(count(lit(1)).as("canon_dups"))
    keyed.join(groups, "norm_md5")
      .select(col("doc_id"), col("norm_md5"), col("n_chars_norm"),
        col("canon_dups"))
      .orderBy("doc_id")
  }

  def t16OracleSql: String = """
      WITH norm AS (
        SELECT doc_id,
          lower(trim(regexp_replace(
            regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS nt
        FROM documents),
      keyed AS (
        SELECT doc_id, md5(nt) AS norm_md5, length(nt) AS n_chars_norm
        FROM norm),
      groups AS (
        SELECT norm_md5, count(*) AS canon_dups FROM keyed GROUP BY 1)
      SELECT k.doc_id, k.norm_md5, k.n_chars_norm, g.canon_dups
      FROM keyed k JOIN groups g USING (norm_md5)
      ORDER BY k.doc_id"""

  /** Greedy sequence packing — grouping documents into fixed-token-
    * budget training sequences. The packing recurrence (pack fill
    * carries doc-to-doc) is inherently sequential WITHIN a shard and
    * embarrassingly parallel ACROSS shards, so the scale shape is:
    * hash-shard (reproducible fingerprint shards, same as
    * [[shardAssign]]), repartition by shard, sort within, one linear
    * mapPartitions scan per shard — the sanctioned per-partition-
    * imperative case. At 100 TB, nShards ≫ executor count keeps every
    * core busy and no shard's doc list exceeds one task. A doc larger
    * than the budget occupies a pack alone (the standard rule). */
  case class PackIn(shard: Long, doc_id: Long, n_tokens: Long)
  case class PackOut(doc_id: Long, shard: Long, pack_id: Long, n_tokens: Long)

  def sequencePack(spark: SparkSession, dir: String, nShards: Int = 16,
      budget: Long = 128L): DataFrame =
    sequencePack(spark, Tables.parallel(Tables.load(spark, dir, "documents")),
      nShards, budget)

  def sequencePack(spark: SparkSession, docs: DataFrame, nShards: Int,
      budget: Long): DataFrame = {
    import spark.implicits._
    // ONE scan: shard key + token count in the same projection
    val base = docs.select(pmod(fpCol, lit(nShards.toLong)).as("shard"),
      col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    base.repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .as[PackIn]
      .mapPartitions { it =>
        // a partition holds whole shards (hash-partitioned on shard),
        // sorted (shard, doc_id): reset the greedy state on shard change
        var shard = -1L; var pack = 0L; var fill = 0L
        it.map { r =>
          if (r.shard != shard) { shard = r.shard; pack = 0L; fill = r.n_tokens }
          else if (fill + r.n_tokens <= budget) fill += r.n_tokens
          else { pack += 1L; fill = r.n_tokens }
          PackOut(r.doc_id, r.shard, pack, r.n_tokens)
        }
      }
      .toDF()
      .orderBy("shard", "doc_id")
  }

  /** DuckDB oracle for [[sequencePack]]: the same greedy recurrence as
    * a recursive CTE stepping all shards in lock-step by within-shard
    * rank (recursion depth = max docs per shard, not corpus size). */
  def packOracleSql(nShards: Int = 16, budget: Long = 128L): String = s"""
      WITH RECURSIVE fp AS (
        SELECT doc_id, list_reduce(
            list_prepend(CAST(0 AS BIGINT),
              list_transform(string_split(text, ' '),
                w -> CAST(length(w)*131 + ascii(w) AS BIGINT))),
            (acc, c) -> (acc * 1000003 + c) % 2147483647) AS f,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      base AS (
        SELECT f % $nShards AS shard, doc_id, n_tokens,
          row_number() OVER (PARTITION BY f % $nShards ORDER BY doc_id) AS rn
        FROM fp),
      rec AS (
        SELECT shard, doc_id, n_tokens, rn,
          CAST(0 AS BIGINT) AS pack_id, n_tokens AS fill
        FROM base WHERE rn = 1
        UNION ALL
        SELECT b.shard, b.doc_id, b.n_tokens, b.rn,
          CASE WHEN r.fill + b.n_tokens <= $budget
               THEN r.pack_id ELSE r.pack_id + 1 END,
          CASE WHEN r.fill + b.n_tokens <= $budget
               THEN r.fill + b.n_tokens ELSE b.n_tokens END
        FROM rec r JOIN base b ON b.shard = r.shard AND b.rn = r.rn + 1)
      SELECT doc_id, shard, pack_id, n_tokens
      FROM rec ORDER BY shard, doc_id"""

  /** Content-defined chunking — the RAG/embedding-prep stage: split
    * each document into chunks whose boundaries come from a rolling
    * hash of the CONTENT (a position is a boundary when the hash of
    * the trailing word-trigram ≡ 0 mod 16), not fixed offsets — so an
    * insertion early in a document only reshuffles chunks up to the
    * next content boundary, which is what makes chunk-level caches and
    * near-dup detection survive edits.
    *
    * Boundary flags are per-row HOF arithmetic over the word array
    * (the native polyHash expression inside the lambda — same char
    * fold as the d2 shingle hash, so the oracle reuses that exact
    * formula). Chunk ids are then a LINEAR running sum: posexplode
    * the flags and take `sum(flag) over (partition by doc_id order by
    * pos)` — one doc_id shuffle, O(words) per doc, so a book-length
    * 10⁵-word document costs 10⁵ window steps, not the 10¹⁰ adds an
    * in-row prefix-sum transform would pay inside ONE task. The
    * running sum is over integer flags, so it is exact and
    * order-independent given the (doc_id, pos) sort. */
  def chunking(spark: SparkSession, dir: String): DataFrame =
    chunking(Tables.parallel(Tables.load(spark, dir, "documents")), 16)

  def chunking(docs: DataFrame, boundaryMod: Int): DataFrame = {
    val w = words(col("text"))
    val shingleAt = (i: Column) => concat_ws(" ", slice(w, i - 2, lit(3)))
    val bounds = transform(sequence(lit(1), size(w)), i =>
      when(i >= 3 &&
        pmod(graft.GraftFunctions.polyHash(shingleAt(i)), lit(boundaryMod)) === 0,
        lit(1L)).otherwise(lit(0L)))
    val run = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), posexplode(bounds))
      .withColumn("chunk_id", sum(col("col")).over(run))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_words"),
        (min(col("pos")) + 1).cast("long").as("start_idx"))
      .orderBy("doc_id", "chunk_id")
  }

  /** DuckDB oracle for [[chunking]] — the DedupCte char-fold hash,
    * inclusive list_slice mirroring Spark's (start, length) slice;
    * chunk ids mirror the engine's linear running window sum. */
  def t13OracleSql(boundaryMod: Int = 16): String = s"""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      b AS (
        SELECT doc_id, list_transform(generate_series(1, len(ws)), i ->
          CASE WHEN i >= 3 AND list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(generate_series(1,
                  length(array_to_string(list_slice(ws, i - 2, i), ' '))), ci ->
                CAST(ascii(substr(array_to_string(list_slice(ws, i - 2, i), ' '), ci, 1)) AS BIGINT))),
              (acc, ch) -> (acc * 131 + ch) % 2147483647) % $boundaryMod = 0
          THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS bs
        FROM w),
      e AS (
        SELECT doc_id, unnest(bs) AS flag,
          unnest(generate_series(1, len(bs))) AS pos
        FROM b),
      c AS (
        SELECT doc_id, pos,
          CAST(sum(flag) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS chunk_id
        FROM e)
      SELECT doc_id, chunk_id, count(*) AS n_words,
        CAST(min(pos) AS BIGINT) AS start_idx
      FROM c GROUP BY doc_id, chunk_id
      ORDER BY doc_id, chunk_id"""

  /** Training-mix sampling weights per source (the domain-mixing knob
    * every large-corpus training pipeline sets): token share per
    * source, temperature-flattened with α = 0.5 and renormalized —
    * w_s = √(tokens_s/total) / Σ_s √(tokens_s/total). √ is α = 0.5
    * temperature sampling chosen deliberately: IEEE sqrt is correctly
    * rounded, so the weights are bit-identical across engines (a pow()
    * α would not be).
    *
    * Scale shape: one corpus scan → per-source counts (map-side
    * partial agg); everything after runs on the source DIMENSION
    * (dozens of rows) collected into a single sorted row, where the
    * Σ√ normalizer is an index-order fold — the same discipline as
    * the ordination folds. Token totals are exact integer sums
    * (order-independent at any parallelism). */
  def sampleWeights(spark: SparkSession, dir: String): DataFrame =
    sampleWeights(Tables.parallel(Tables.load(spark, dir, "documents")))

  def sampleWeights(docs: DataFrame): DataFrame = {
    val per = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(words(col("text"))).cast("long")).as("n_tokens"))
    val asm = per.agg(
      sort_array(collect_list(struct(col("source"), col("n_docs"),
        col("n_tokens")))).as("ps"),
      sum(col("n_tokens")).as("t"))
    asm
      .withColumn("wsum", aggregate(
        transform(col("ps"),
          s => sqrt(s("n_tokens").cast("double") / col("t").cast("double"))),
        lit(0.0), (a, x) => a + x))
      .select(posexplode(transform(col("ps"), s =>
        struct(s("source").as("source"),
          s("n_docs").as("n_docs"),
          s("n_tokens").as("n_tokens"),
          round(s("n_tokens").cast("double") / col("t").cast("double"), 6)
            .as("share"),
          round(sqrt(s("n_tokens").cast("double") / col("t").cast("double"))
            / col("wsum"), 6).as("weight")))))
      .select(col("col.source").as("source"), col("col.n_docs").as("n_docs"),
        col("col.n_tokens").as("n_tokens"), col("col.share").as("share"),
        col("col.weight").as("weight"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[sampleWeights]]: same sorted single-row
    * assembly, same index-order Σ√ fold. */
  def t11OracleSql: String = """
      WITH per AS (
        SELECT source, count(*) AS n_docs,
          CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
      asm AS (
        SELECT list_sort(list(struct_pack(source := source, n_docs := n_docs,
                 n_tokens := n_tokens))) AS ps,
          CAST(sum(n_tokens) AS BIGINT) AS t
        FROM per),
      w AS (
        SELECT ps, t,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(ps, s -> sqrt(CAST(s['n_tokens'] AS DOUBLE) / CAST(t AS DOUBLE)))),
            (a, x) -> a + x) AS wsum
        FROM asm),
      u AS (SELECT unnest(ps) AS s, t, wsum FROM w)
      SELECT s['source'] AS source,
        s['n_docs'] AS n_docs,
        s['n_tokens'] AS n_tokens,
        round(CAST(s['n_tokens'] AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share,
        round(sqrt(CAST(s['n_tokens'] AS DOUBLE) / CAST(t AS DOUBLE)) / wsum, 6) AS weight
      FROM u ORDER BY source"""

  /** t17: unigram surprisal scoring — each doc's mean -ln p(token)
    * under the corpus unigram model. The cheap statistical proxy for
    * "model perplexity" quality filters (CCNet-style): very LOW
    * surprisal means the doc is built from the corpus's most common
    * tokens (boilerplate, repetition); very high means out-of-
    * distribution noise. Scale shape: token counts are the t10/t14
    * aggregates (term-key shuffles bounded by vocabulary); the
    * per-doc sum folds the (term, contribution) list in term order —
    * the repo's index-order-fold discipline — so engine and oracle
    * execute the same IEEE sequence up to ln()'s libm ulp, absorbed
    * by t14's round-before-compare rule. The low_info flag compares
    * the ROUNDED score so the cut is boundary-stable cross-engine (3.4 sits at this corpus 25th pctile, so the flag genuinely splits). */
  def surprisal(spark: SparkSession, dir: String): DataFrame =
    surprisal(Tables.parallel(Tables.load(spark, dir, "documents")))

  def surprisal(docs: DataFrame): DataFrame = {
    // the per-doc term profile feeds BOTH the corpus model (cf/tot)
    // and the scoring join; checkpoint it so the corpus scan and the
    // (doc, term) aggregation run once, not once per consumer (the
    // alias-renamed consumers would defeat exchange reuse — d10's
    // lesson; one materialization beats two corpus aggregations)
    val tf = graft.Ckpt(
      docs.select(col("doc_id"), explode(words(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val cf = tf.groupBy("term").agg(sum(col("tf")).as("cnt"))
    val tot = cf.agg(sum(col("cnt")).as("t_tokens"))
    tf.join(cf, "term")
      .crossJoin(broadcast(tot))
      .withColumn("contrib", col("tf").cast("double") *
        -log(col("cnt").cast("double") / col("t_tokens").cast("double")))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("term"), col("contrib"))))
          .as("cs"),
        sum(col("tf")).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        round(aggregate(col("cs"), lit(0.0),
            (acc, x) => acc + x.getField("contrib"))
          / col("n_tokens").cast("double"), 6).as("surprisal"))
      .withColumn("low_info", col("surprisal") < 3.4)
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[surprisal]] — identical term-ordered fold. */
  def t17OracleSql: String = """
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      cf AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY 1),
      tot AS (SELECT sum(cnt) AS t_tokens FROM cf),
      contribs AS (
        SELECT doc_id, term,
          CAST(tf AS DOUBLE)
            * -ln(CAST(cnt AS DOUBLE) / CAST(t_tokens AS DOUBLE)) AS contrib,
          tf
        FROM tf JOIN cf USING (term), tot),
      perdoc AS (
        SELECT doc_id,
          list_transform(list_sort(list(struct_pack(term := term,
            contrib := contrib))), s -> s['contrib']) AS cs,
          CAST(sum(tf) AS BIGINT) AS n_tokens
        FROM contribs GROUP BY doc_id)
      SELECT doc_id, n_tokens,
        round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), cs),
            (acc, x) -> acc + x)
          / CAST(n_tokens AS DOUBLE), 6) AS surprisal,
        round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), cs),
            (acc, x) -> acc + x)
          / CAST(n_tokens AS DOUBLE), 6) < 3.4 AS low_info
      FROM perdoc ORDER BY doc_id"""

  /** t18: BPE merge induction — byte-pair-encoding tokenizer TRAINING
    * as a distributed query: start from the character-split word
    * vocabulary, then [[BpeMerges]] times pick the highest-frequency
    * adjacent symbol pair (ties to the lexicographically smallest)
    * and greedily merge its non-overlapping occurrences left-to-
    * right. The output is the learned merge table — the artifact a
    * tokenizer ships.
    *
    * All-integer counts and string symbols ⇒ exact. Ties and overlap
    * handling are pinned down hard: the engine merges via an in-row
    * left-to-right fold; the oracle merges via the equivalent
    * RELATIONAL parity-islands form (gaps-and-islands over matched
    * positions, merge even offsets within each island) — two
    * independent formulations of greedy non-overlap that a spec
    * proves equal on adversarial runs (aaaa / abab / aab).
    *
    * Scale shape: everything after the one corpus tokenize-and-count
    * shuffle operates on the VOCABULARY (Heaps-law bounded, ~100k
    * rows at 100 TB): per step one vocab-bounded pair aggregate, a
    * 1-row TakeOrdered argmax broadcast back, and an in-row merge
    * fold; the vocabulary frame is checkpointed per step (the plan
    * would otherwise double per iteration — each step consumes the
    * previous one twice). */
  val BpeMerges = 6

  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeMerges(Tables.parallel(Tables.load(spark, dir, "documents")), BpeMerges)

  def bpeMerges(docs: DataFrame, m: Int): DataFrame =
    bpeChain(docs, m)._1.reduce(_ unionByName _).orderBy("step")

  /** The shared BPE merge chain: runs `m` greedy merge steps over the
    * character-split word vocabulary and returns BOTH artifacts — the
    * per-step merge table rows (t18's output) and the final merged
    * vocabulary `(word, cnt, syms)` (t21's tokenizer). One chain, two
    * consumers, so the training and encoding operators can never
    * disagree about what the learned tokenizer is. */
  private def bpeChain(docs: DataFrame, m: Int): (Seq[DataFrame], DataFrame) = {
    var vocab = graft.Ckpt(
      docs.select(explode(words(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .withColumn("syms", expr(
          "transform(sequence(1, length(word)), i -> substring(word, i, 1))")))
    val mergeFold = """aggregate(syms, cast(array() as array<string>),
      (acc, s) -> CASE
        WHEN size(acc) > 0 AND element_at(acc, -1) = ba AND s = bb
        THEN concat(slice(acc, 1, size(acc) - 1), array(concat(ba, bb)))
        ELSE concat(acc, array(s)) END)"""
    val steps = (1 to m).map { step =>
      // slice-based pair builder: slice(_, 1, size-1) is EMPTY for
      // 1-symbol words (sequence(1, 0) would descend [1, 0] and
      // element_at out of bounds)
      val pairs = vocab.select(col("cnt"), explode(expr(
        """transform(slice(syms, 1, size(syms) - 1),
           (s, idx) -> struct(s as a, element_at(syms, idx + 2) as b))"""))
        .as("p"))
      val best = pairs
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("s"))
        .orderBy(col("s").desc, col("a"), col("b"))
        .limit(1)
      vocab = graft.Ckpt(vocab
        .crossJoin(broadcast(best.select(col("a").as("ba"), col("b").as("bb"))))
        .select(col("word"), col("cnt"), expr(mergeFold).as("syms")))
      best.select(lit(step).as("step"), col("a").as("left_sym"),
        col("b").as("right_sym"), col("s").as("pair_count"))
    }
    (steps, vocab)
  }

  /** DuckDB oracle for [[bpeMerges]] — the same chain unrolled as
    * generated CTE blocks (the q31 per-axis discipline), with the
    * parity-islands merge (see [[bpeMerges]]). */
  def t18OracleSql(m: Int = BpeMerges): String = {
    val finals = (1 to m).map(k =>
      s"""SELECT $k AS step, a AS left_sym, b AS right_sym,
          CAST(s AS BIGINT) AS pair_count FROM best$k""")
      .mkString(" UNION ALL ")
    s"""
      WITH ${bpeChainCtes(m)}
      SELECT * FROM ($finals) ORDER BY step"""
  }

  /** The t18 merge chain as a CTE block string (`words0` … `words$m`
    * plus the per-step `best$k`), shared by the t18 and t21 oracles so
    * both query the SAME learned tokenizer — the SQL mirror of
    * [[bpeChain]]'s two-consumer contract. */
  private def bpeChainCtes(m: Int): String = {
    def step(k: Int) = s"""
      pos$k AS (
        SELECT word, cnt, i, syms[i] AS a, syms[i + 1] AS b, len(syms) AS L
        FROM words${k - 1}, unnest(generate_series(1, len(syms))) AS u$k(i)),
      best$k AS MATERIALIZED (
        SELECT a, b, s FROM (
          SELECT a, b, sum(cnt) AS s FROM pos$k WHERE i < L GROUP BY a, b)
        ORDER BY s DESC, a, b LIMIT 1),
      m$k AS (
        SELECT p.word, p.i,
          p.i - row_number() OVER (PARTITION BY p.word ORDER BY p.i) AS isl
        FROM pos$k p, best$k
        WHERE p.i < p.L AND p.a = best$k.a AND p.b = best$k.b),
      mm$k AS (
        SELECT word, i FROM (
          SELECT word, i, i - min(i) OVER (PARTITION BY word, isl) AS off
          FROM m$k)
        WHERE off % 2 = 0),
      words$k AS MATERIALIZED (
        SELECT p.word, any_value(p.cnt) AS cnt,
          list(CASE WHEN cur.i IS NOT NULL THEN p.a || p.b ELSE p.a END
            ORDER BY p.i) AS syms
        FROM pos$k p
        LEFT JOIN mm$k cur ON cur.word = p.word AND cur.i = p.i
        LEFT JOIN mm$k prv ON prv.word = p.word AND prv.i = p.i - 1
        WHERE prv.i IS NULL
        GROUP BY p.word)"""
    s"""words0 AS MATERIALIZED (
        SELECT word, cnt,
          list_transform(generate_series(1, len(word)),
            i -> substr(word, i, 1)) AS syms
        FROM (
          SELECT word, count(*) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
          WHERE len(word) > 0 GROUP BY word) v),
      ${(1 to m).map(step).mkString(",")}"""
  }

  /** t21: BPE ENCODING — the use side of the t18-trained tokenizer,
    * closing the train→apply loop every real pipeline runs (train
    * merges once, then tokenize the whole corpus to budget sequence
    * lengths and packing). BPE merges never cross word boundaries, so
    * a document's token count decomposes exactly as Σ_w tf(doc, w) ×
    * |encode(w)| — encode the VOCABULARY once (re-running [[bpeChain]]
    * to its final merged state) and the corpus pass reduces to a
    * term-frequency join, never re-merging inside documents. Output
    * per doc: word count, BPE token count, and the chars-per-token
    * compression ratio a tokenizer is judged by.
    *
    * Exactness: all-integer counts; one correctly-rounded division per
    * doc (round(6), t17's discipline).
    *
    * Scale shape: the chain's per-step work is vocabulary-bounded
    * (Heaps-law ~10⁵ rows at 100 TB — see [[bpeMerges]]); the corpus
    * side is one (doc, word) count shuffle with map-side combine plus
    * a join against the vocab map, which the planner broadcasts at
    * real vocab sizes; final rollup shuffles on doc_id. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeEncode(Tables.parallel(Tables.load(spark, dir, "documents")), BpeMerges)

  def bpeEncode(docs: DataFrame, m: Int): DataFrame = {
    val wmap = bpeChain(docs, m)._2
      .select(col("word"), size(col("syms")).cast("long").as("tok"),
        length(col("word")).cast("long").as("wlen"))
    val tf = docs.select(col("doc_id"), explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    tf.join(wmap, "word")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_words"),
        sum(col("tf") * col("tok")).as("n_tokens"),
        sum(col("tf") * col("wlen")).as("n_word_chars"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"),
        round(col("n_word_chars").cast("double")
          / col("n_tokens").cast("double"), 6).as("chars_per_token"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[bpeEncode]] — t18's shared chain CTEs run to
    * `words$m`, then the identical tf × |encode(word)| rollup. */
  def t21OracleSql(m: Int = BpeMerges): String = s"""
      WITH ${bpeChainCtes(m)},
      tf AS (
        SELECT doc_id, word, count(*) AS tf FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents) t
        WHERE len(word) > 0 GROUP BY 1, 2),
      wmap AS (
        SELECT word, len(syms) AS tok, length(word) AS wlen FROM words$m)
      SELECT doc_id,
        CAST(sum(tf) AS BIGINT) AS n_words,
        CAST(sum(tf * tok) AS BIGINT) AS n_tokens,
        round(CAST(sum(tf * wlen) AS DOUBLE)
          / CAST(sum(tf * tok) AS DOUBLE), 6) AS chars_per_token
      FROM tf JOIN wmap USING (word)
      GROUP BY doc_id ORDER BY doc_id"""

  /** t20: bigram-LM cross-entropy scoring — the step up from t17's
    * unigram surprisal that CCNet-class quality filters actually take:
    * score each document by its mean −ln p(w₂|w₁) under the corpus
    * bigram model with add-one smoothing, p(w₂|w₁) = (c(w₁w₂) + 1) /
    * (c(w₁·) + V). Low cross-entropy = the document is stitched from
    * the corpus's most predictable word transitions (templates,
    * boilerplate); high = out-of-distribution noise — and unlike the
    * unigram score it sees WORD ORDER, so shuffled or repeated-phrase
    * text separates from natural text with the same word histogram.
    *
    * Exactness: counts and the smoothing sums are all-integer, so each
    * probability is one correctly-rounded double division; the per-doc
    * sum folds (bigram, contribution) pairs in bigram-sorted order
    * (t17's index-order-fold discipline) and round(6) absorbs ln()'s
    * libm ulp. Documents with fewer than two words have no bigram and
    * drop out — in both engines.
    *
    * Scale shape: the model frames are VOCABULARY-bounded (bigram
    * types ≪ corpus tokens by Zipf; context counts derive from the
    * bigram frame by one more vocab-scale aggregate — no second corpus
    * scan); V is a one-row broadcast scalar. The corpus pays one
    * (doc, bigram) count shuffle (map-side combine), one equi-join per
    * model frame on the bigram/context key — sort-merge at real scale,
    * AQE skew-split if one context dominates — and the doc_id rollup.
    * The tf frame feeds the model AND the scoring join: checkpointed
    * (t17's two-consumer discipline). */
  def bigramLm(spark: SparkSession, dir: String): DataFrame =
    bigramLm(Tables.parallel(Tables.load(spark, dir, "documents")))

  def bigramLm(docs: DataFrame): DataFrame = {
    val bg = graft.Ckpt(
      docs.select(col("doc_id"), explode(expr(
        """transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
           (s, idx) -> concat(s, ' ', element_at(split(text, ' '), idx + 2)))"""))
        .as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("tf")))
    val cb = bg.groupBy("bg").agg(sum(col("tf")).as("cnt"))
    val ctx = cb.withColumn("w1", substring_index(col("bg"), " ", 1))
      .groupBy("w1").agg(sum(col("cnt")).as("ctx_cnt"))
    val vocab = docs.select(explode(words(col("text"))).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    bg.join(cb, "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(ctx, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("contrib", col("tf").cast("double") *
        -log((col("cnt") + 1).cast("double")
          / (col("ctx_cnt") + col("v")).cast("double")))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("bg"), col("contrib"))))
          .as("cs"),
        sum(col("tf")).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        round(aggregate(col("cs"), lit(0.0),
            (acc, x) => acc + x.getField("contrib"))
          / col("n_bigrams").cast("double"), 6).as("cross_entropy"))
      .orderBy("doc_id")
  }

  /** t26: perplexity bucketing — CCNet's quality triage (Wenzek et
    * al. 2020): score every document with the corpus bigram LM
    * ([[bigramLm]]'s cross-entropy) and split the corpus into
    * head / middle / tail TERCILES — the buckets CCNet keeps,
    * down-weights, and drops. Production CCNet cuts at thresholds
    * computed from a sample, NOT by globally sorting every document;
    * this form does the same deterministically: tercile thresholds
    * come from e19's fixed-bin histogram machinery over the
    * cross-entropy axis (bin-bounded state, exact integer rank
    * targets ⌈n/3⌉ and ⌈2n/3⌉, threshold = the rank bin's upper
    * edge), then bucketing is a stateless value comparison — no
    * global sort anywhere, and the ≤-threshold rule is deterministic
    * under ties BY VALUE, which is what threshold triage means.
    *
    * Mean cross-entropy per bucket is an exact DECIMAL(18,6) sum of
    * the per-doc round-6 values (order-free) with one final rounded
    * division. Population = docs with ≥ 1 bigram (the LM's own
    * domain), identical in both engines. */
  val PplBins = 256

  def perplexityBuckets(spark: SparkSession, dir: String): DataFrame =
    perplexityBuckets(Tables.parallel(Tables.load(spark, dir, "documents")))

  def perplexityBuckets(docs: DataFrame): DataFrame = {
    val ce = graft.Ckpt(bigramLm(docs))
    val bounds = ce.agg(min(col("cross_entropy")).as("lo"),
      max(col("cross_entropy")).as("hi"), count(lit(1)).as("n"))
    val wexp = (col("hi") - col("lo")) / lit(PplBins.toDouble)
    val binned = ce.crossJoin(broadcast(bounds))
      .select(when(col("hi") === col("lo"), lit(0L))
        .otherwise(least(
          floor((col("cross_entropy") - col("lo")) / wexp).cast("long"),
          lit(PplBins - 1L))).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("k"))
    // the cumulative walk runs over ≤ PplBins rows — the bounded
    // global window with the repo's constant non-foldable key
    val cum = binned.withColumn("cum",
      sum(col("k")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("bin") * 0).orderBy("bin")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
    val thr = cum.crossJoin(broadcast(bounds))
      .agg(min(when(col("cum") >= expr("(n + 2) div 3"), col("bin")))
          .as("b1"),
        min(when(col("cum") >= expr("(2 * n + 2) div 3"), col("bin")))
          .as("b2"),
        min(col("lo")).as("lo"), min(col("hi")).as("hi"))
    def edge(b: org.apache.spark.sql.Column) =
      when(col("hi") === col("lo"), col("hi"))
        .otherwise(col("lo") + (b + 1).cast("double")
          * ((col("hi") - col("lo")) / lit(PplBins.toDouble)))
    ce.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("n_bigrams"), col("cross_entropy"),
        when(col("cross_entropy") <= edge(col("b1")), "head")
          .when(col("cross_entropy") <= edge(col("b2")), "middle")
          .otherwise("tail").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("n_bigrams"),
        round(sum(col("cross_entropy").cast("decimal(18,6)"))
          .cast("double") / count(lit(1)).cast("double"), 6).as("mean_ce"))
      .orderBy("bucket")
  }

  /** DuckDB oracle for [[perplexityBuckets]] — t20's oracle as a
    * nested CTE, then the identical histogram-threshold arithmetic. */
  def t26OracleSql: String = s"""
      WITH ce AS ($t20OracleSql),
      bounds AS (
        SELECT min(cross_entropy) AS lo, max(cross_entropy) AS hi,
          count(*) AS n FROM ce),
      binned AS (
        SELECT CASE WHEN b.hi = b.lo THEN CAST(0 AS BIGINT)
          ELSE least(CAST(floor((c.cross_entropy - b.lo)
            / ((b.hi - b.lo) / $PplBins.0)) AS BIGINT), ${PplBins - 1})
          END AS bin, count(*) AS k
        FROM ce c, bounds b GROUP BY 1),
      cum AS (
        SELECT bin, sum(k) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
          AS cum
        FROM binned),
      thr AS (
        SELECT min(CASE WHEN c.cum >= (b.n + 2) // 3 THEN c.bin END) AS b1,
          min(CASE WHEN c.cum >= (2 * b.n + 2) // 3 THEN c.bin END) AS b2,
          min(b.lo) AS lo, min(b.hi) AS hi
        FROM cum c, bounds b),
      tagged AS (
        SELECT c.doc_id, c.n_bigrams, c.cross_entropy,
          CASE WHEN c.cross_entropy <=
              (CASE WHEN t.hi = t.lo THEN t.hi
                ELSE t.lo + CAST(t.b1 + 1 AS DOUBLE)
                  * ((t.hi - t.lo) / $PplBins.0) END) THEN 'head'
            WHEN c.cross_entropy <=
              (CASE WHEN t.hi = t.lo THEN t.hi
                ELSE t.lo + CAST(t.b2 + 1 AS DOUBLE)
                  * ((t.hi - t.lo) / $PplBins.0) END) THEN 'middle'
            ELSE 'tail' END AS bucket
        FROM ce c, thr t)
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
        round(CAST(sum(CAST(cross_entropy AS DECIMAL(18,6))) AS DOUBLE)
          / CAST(count(*) AS DOUBLE), 6) AS mean_ce
      FROM tagged GROUP BY bucket ORDER BY bucket"""

  /** DuckDB oracle for [[bigramLm]] — identical bigram construction,
    * add-one smoothing and bigram-ordered fold. */
  def t20OracleSql: String = """
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      bgx AS (
        SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
          i -> ws[i] || ' ' || ws[i + 1])) AS bg
        FROM w),
      bg AS (SELECT doc_id, bg, count(*) AS tf FROM bgx GROUP BY 1, 2),
      cb AS (SELECT bg, sum(tf) AS cnt FROM bg GROUP BY 1),
      ctx AS (
        SELECT string_split(bg, ' ')[1] AS w1, sum(cnt) AS ctx_cnt
        FROM cb GROUP BY 1),
      voc AS (SELECT count(DISTINCT t) AS v FROM (
        SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
      contribs AS (
        SELECT doc_id, bg.bg AS bg, tf,
          CAST(tf AS DOUBLE) * -ln(CAST(cnt + 1 AS DOUBLE)
            / CAST(ctx_cnt + v AS DOUBLE)) AS contrib
        FROM bg JOIN cb USING (bg)
        JOIN ctx ON ctx.w1 = string_split(bg.bg, ' ')[1], voc),
      perdoc AS (
        SELECT doc_id,
          list_transform(list_sort(list(struct_pack(bg := bg,
            contrib := contrib))), s -> s['contrib']) AS cs,
          CAST(sum(tf) AS BIGINT) AS n_bigrams
        FROM contribs GROUP BY doc_id)
      SELECT doc_id, n_bigrams,
        round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), cs),
            (acc, x) -> acc + x)
          / CAST(n_bigrams AS DOUBLE), 6) AS cross_entropy
      FROM perdoc ORDER BY doc_id"""

  /** t19: model-based quality classifier — a fastText-style LINEAR
    * scorer over hashed unigram + word-bigram features (the
    * architecture of every production "model-based quality filter":
    * fastText is bag-of-n-grams → hashed buckets → linear layer →
    * sigmoid). The weight table is the shipped model artifact: weight
    * of bucket b is the RATIONAL ((b·2654435761 + 12345) mod P −
    * (P−1)/2)/P with P = [[FtPrime]] — a fixed pseudo-random
    * init standing in for trained parameters, so the OPERATOR (hash,
    * pool, dot product, cut) is the real thing while the weights stay
    * reproducible from public arithmetic. keep ⇔ mean-pooled score ≥
    * 0, i.e. sigmoid ≥ 0.5 — the fastText decision rule.
    *
    * Exactness: weights share denominator P, so the dot product's
    * numerator Σ tf·num(bucket) is ALL-INTEGER (int64, order-free —
    * no IEEE fold-order discipline needed); the single final division
    * and round(6) are reproduced bit-for-bit by the oracle.
    *
    * Scale shape: the whole classifier — char-fold feature hash,
    * bigram construction, weight lookup (a pure function of the
    * bucket id: NO weight-table join or broadcast), pooling — is ONE
    * in-row projection over the corpus scan: zero shuffle, zero
    * joins, embarrassingly parallel at 100 TB. A real trained model
    * ships as a [[FtBuckets]]-row table; at 2^20 rows it would join
    * in as one broadcast, leaving the plan shape unchanged. */
  val FtBuckets = 1048576L // 2^20 hashed feature buckets
  val FtPrime = 1000003L // weight denominator (prime)

  def ftQuality(spark: SparkSession, dir: String): DataFrame =
    ftQuality(Tables.parallel(Tables.load(spark, dir, "documents")))

  def ftQuality(docs: DataFrame): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    val w = "split(text, ' ')"
    // unigrams ++ bigrams ("a_b"); slice/zip_with (not sequence) so a
    // one-word doc yields [] — Spark's sequence(1, 0) is DESCENDING
    // [1, 0], not empty
    val grams = s"""concat($w,
      zip_with(slice($w, 1, size($w) - 1), slice($w, 2, size($w) - 1),
        (x, y) -> concat(x, '_', y)))"""
    // h(g): the NATIVE 31-ary rolling hash mod FtBuckets (one linear
    // allocation-free pass — the composed ascii(substring) fold is
    // O(len²) per string, against the hot-loop discipline even though
    // grams are short; empty-string parity: both hash to 0, so no
    // length guard is needed). num(h): the weight numerator, centered
    // to [-(P-1)/2, (P-1)/2]. Oracle unchanged — same arithmetic.
    def num(g: String) = s"""(poly_hash($g, 31, $FtBuckets)
      * 2654435761 + 12345) % $FtPrime - ${(FtPrime - 1) / 2}"""
    docs
      .select(col("doc_id"), expr(grams).as("grams"))
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        expr(s"""aggregate(grams, cast(0 as bigint),
          (acc, g) -> acc + (${num("g")}))""").as("sum_num"))
      .select(col("doc_id"), col("n_grams"),
        GraftFunctions.roundz(col("sum_num").cast("double")
          / (lit(FtPrime.toDouble) * col("n_grams").cast("double")), 6)
          .as("ft_score"))
      .withColumn("keep", col("ft_score") >= 0.0)
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[ftQuality]] — same integer dot-product
    * numerator, same single division and rounded cut. */
  def t19OracleSql: String = {
    val half = (FtPrime - 1) / 2
    s"""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      g AS (
        SELECT doc_id, list_concat(w,
          list_transform(generate_series(1, len(w) - 1),
            i -> w[i] || '_' || w[i + 1])) AS grams FROM t),
      s AS (
        SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(grams, gr ->
              ((CASE WHEN length(gr) = 0 THEN CAST(0 AS BIGINT)
                ELSE list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(generate_series(1, length(gr)),
                    i -> CAST(ord(substring(gr, i, 1)) AS BIGINT))),
                  (a, c) -> (a * 31 + c) % $FtBuckets) END)
              * 2654435761 + 12345) % $FtPrime - $half)),
            (acc, x) -> acc + x) AS sum_num
        FROM g)
      SELECT doc_id, n_grams,
        (round(CAST(sum_num AS DOUBLE) / ($FtPrime.0 * n_grams), 6) + 0.0)
          AS ft_score,
        round(CAST(sum_num AS DOUBLE) / ($FtPrime.0 * n_grams), 6) >= 0.0
          AS keep
      FROM s ORDER BY doc_id"""
  }

  /** t23: source-mix APPLICATION — the second half of the mixing loop
    * t11 starts (t11 derives temperature-style target shares; t23
    * turns them into a concrete per-source sampling manifest): for
    * each source, epochs = targetShare·T / T_s (how many passes the
    * source needs to hit its target — >1 means repeat/up-sample, <1
    * means down-sample), the down-sampling acceptance threshold
    * floor(min(1, epochs)·10⁶), and the EXACT kept doc/token counts
    * under the deterministic Knuth-hash accept test (reproducible at
    * any parallelism — no rand()). This is the Dolma/DoReMi-class
    * "turn mixture weights into a physical corpus" step.
    *
    * 100 TB contract: one corpus-scale aggregate for the per-source
    * totals, the (sources-bounded) weight fold, a broadcast
    * threshold join + in-row hash filter, and one more per-source
    * aggregate — nothing beyond t11's shapes plus one broadcast. */
  def mixApply(spark: SparkSession, dir: String): DataFrame =
    mixApply(Tables.parallel(Tables.load(spark, dir, "documents")))

  def mixApply(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      size(words(col("text"))).cast("long").as("n_toks"))
    val per = toks.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    // t11's sorted-fold weight discipline, verbatim
    val asm = per.agg(
      sort_array(collect_list(struct(col("source"), col("n_docs"),
        col("n_tokens")))).as("ps"),
      sum(col("n_tokens")).as("t"))
    // sources-bounded and TWO consumers (the broadcast threshold join
    // and the final select) — checkpointed so the corpus-scale source
    // aggregate behind it runs once (the m9/d14 discipline)
    val rates = graft.Ckpt(asm
      .withColumn("wsum", aggregate(
        transform(col("ps"),
          s => sqrt(s("n_tokens").cast("double") / col("t").cast("double"))),
        lit(0.0), (a, x) => a + x))
      .select(col("t"), col("wsum"), explode(col("ps")).as("p"))
      .select(col("p.source").as("source"), col("p.n_docs").as("n_docs"),
        col("p.n_tokens").as("n_tokens"),
        (sqrt(col("p.n_tokens").cast("double") / col("t").cast("double"))
          / col("wsum")).as("w0"), col("t"))
      .withColumn("epochs0",
        col("w0") * col("t").cast("double") / col("n_tokens").cast("double"))
      .withColumn("thresh",
        floor(least(col("epochs0"), lit(1.0)) * lit(1000000.0)).cast("long")))
    val kept = toks
      .join(broadcast(rates.select(col("source"), col("thresh"))), "source")
      .filter(pmod(pmod(col("doc_id"), lit(1000000000L)) * lit(2654435761L),
        lit(1000000L)) < col("thresh"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum(col("n_toks")).as("kept_tokens"))
    rates
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("w0"), 6).as("target_share"),
        round(col("epochs0"), 6).as("epochs"), col("thresh"))
      .join(kept, Seq("source"), "left_outer")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("target_share"), col("epochs"), col("thresh"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[mixApply]] — t11's fold CTEs, the identical
    * epochs/threshold arithmetic ((sqrt(x)/wsum · T) / T_s, floored
    * at 10⁶ after the min-1 clamp), the same Knuth accept test. */
  def t23OracleSql: String = """
      WITH per AS (
        SELECT source, count(*) AS n_docs,
          CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
            AS n_tokens
        FROM documents GROUP BY source),
      asm AS (
        SELECT list_sort(list(struct_pack(source := source, n_docs := n_docs,
                 n_tokens := n_tokens))) AS ps,
          CAST(sum(n_tokens) AS BIGINT) AS t
        FROM per),
      w AS (
        SELECT ps, t,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(ps, s ->
              sqrt(CAST(s['n_tokens'] AS DOUBLE) / CAST(t AS DOUBLE)))),
            (a, x) -> a + x) AS wsum
        FROM asm),
      u AS (SELECT unnest(ps) AS s, t, wsum FROM w),
      rates AS (
        SELECT s['source'] AS source, s['n_docs'] AS n_docs,
          s['n_tokens'] AS n_tokens,
          sqrt(CAST(s['n_tokens'] AS DOUBLE) / CAST(t AS DOUBLE)) / wsum
            AS w0,
          sqrt(CAST(s['n_tokens'] AS DOUBLE) / CAST(t AS DOUBLE)) / wsum
            * CAST(t AS DOUBLE) / CAST(s['n_tokens'] AS DOUBLE) AS epochs0
        FROM u),
      thr AS (
        SELECT source, n_docs, n_tokens, w0, epochs0,
          CAST(floor(least(epochs0, 1.0) * 1000000.0) AS BIGINT) AS thresh
        FROM rates),
      kept AS (
        SELECT d.source, count(*) AS n_kept,
          CAST(sum(CAST(len(string_split(d.text, ' ')) AS BIGINT)) AS BIGINT)
            AS kept_tokens
        FROM documents d JOIN thr ON thr.source = d.source
        WHERE ((d.doc_id % 1000000000) * 2654435761) % 1000000 < thr.thresh
        GROUP BY d.source)
      SELECT thr.source, thr.n_docs, thr.n_tokens,
        round(thr.w0, 6) AS target_share,
        round(thr.epochs0, 6) AS epochs, thr.thresh,
        COALESCE(kept.n_kept, CAST(0 AS BIGINT)) AS n_kept,
        COALESCE(kept.kept_tokens, CAST(0 AS BIGINT)) AS kept_tokens
      FROM thr LEFT JOIN kept ON kept.source = thr.source
      ORDER BY thr.source"""

  /** t24: DSIR-style importance weights — hashed-n-gram importance
    * scoring (Xie et al. 2023, "Data Selection for Language Models
    * via Importance Resampling"): estimate a target and a raw
    * feature distribution over hashed unigram+bigram buckets
    * (t19's exact feature map), score every document by how much
    * more target-like than raw-like its grams are, and flag the
    * docs a DSIR selection keeps. This is the data-SELECTION step
    * between t11's mixture weights and t23's physical sampling —
    * the "make the corpus look like the target domain" stage every
    * current pretraining pipeline runs.
    *
    * Exactness (the t19 trick, lifted to data-derived weights): the
    * paper's per-gram log(p̂/q̂) is float and unordered-sum-hostile,
    * so the score here is the LINEARIZED importance score over one
    * shared denominator — per bucket b the rational
    * p̂(b) − q̂(b) = (T_b·R − R_b·T)/(T·R), so a doc's score
    * numerator Σ_b tf_b·(T_b·R − R_b·T) is ALL-INTEGER. It is
    * summed as DECIMAL(38,0) (T, R are gram-scale counts — at 100 TB
    * the per-bucket product tops int64, and decimal sums stay exact
    * and order-free), divided ONCE by n_grams·T·R for the per-gram
    * mean, and rounded — reproduced bit-for-bit by the HUGEINT
    * oracle (both sides canonicalize the signed zero — a tiny negative
    * numerator rounds to DuckDB −0.0 but Spark/BigDecimal +0.0, so the
    * output goes through [[GraftFunctions.roundz]] and the oracle adds
    * `+ 0.0`; values equal, bytes now equal too).
    * `selected` ⇔ numerator > 0: the doc's gram mass sits
    * closer to the target than to the raw distribution. Smoothing is
    * unnecessary by construction: every gram of every scored doc is
    * in the raw counts, and T_b = 0 just contributes its negative
    * raw term — no log singularities anywhere.
    *
    * Scale shape: one gram-scale (doc, bucket) tf aggregate (map-side
    * combine collapses repeats), one gram-scale bucket-stats
    * aggregate behind a checkpoint, then the tf frame joins the
    * stats table — bounded by [[FtBuckets]] rows (2²⁰ ≈ 24 MB), a
    * BROADCAST by constructor bound, the PQ-codebook class — plus a
    * one-row totals crossJoin, and a per-doc fold. No corpus-scale
    * join, nothing quadratic, zero UDFs. */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame =
    dsirWeights(Tables.parallel(Tables.load(spark, dir, "documents")))

  def dsirWeights(docs: DataFrame,
                  targetSource: String = "src0"): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    val w = "split(text, ' ')"
    val grams = s"""concat($w,
      zip_with(slice($w, 1, size($w) - 1), slice($w, 2, size($w) - 1),
        (x, y) -> concat(x, '_', y)))"""
    // gram stream → hashed bucket ids, all in-row (native poly_hash)
    val db = docs
      .select(col("doc_id"), col("source"), explode(expr(grams)).as("g"))
      .select(col("doc_id"), col("source"),
        expr(s"poly_hash(g, 31, $FtBuckets)").as("b"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    // bucket → (raw count, target count); ≤ FtBuckets rows, two
    // consumers (totals + scoring join) ⇒ checkpointed once
    val stats = graft.Ckpt(db.groupBy("b").agg(
      count(lit(1)).as("r_b"),
      sum(when(col("source") === targetSource, 1L).otherwise(0L))
        .as("t_b")))
    val tot = stats.agg(sum(col("r_b")).as("r_tot"),
      sum(col("t_b")).as("t_tot"))
    val perDoc = db.groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("tf"))
    perDoc
      .join(broadcast(stats), "b")
      .crossJoin(broadcast(tot)) // one row — in-plan, not a head()
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_grams"),
        sum(dec(col("tf")) * (dec(col("t_b")) * dec(col("r_tot"))
          - dec(col("r_b")) * dec(col("t_tot")))).as("num"),
        min(col("t_tot")).as("t_tot"), min(col("r_tot")).as("r_tot"))
      .select(col("doc_id"), col("n_grams"),
        GraftFunctions.roundz(col("num").cast("double")
          / (col("n_grams").cast("double") * col("t_tot").cast("double")
            * col("r_tot").cast("double")), 6).as("dsir_score"),
        (col("num") > 0).as("selected"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[dsirWeights]] — same grams, same poly hash,
    * same integer numerator in HUGEINT, same single division. */
  def t24OracleSql(targetSource: String = "src0"): String = s"""
      WITH t AS (
        SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
      g AS (
        SELECT doc_id, source, unnest(list_concat(w,
          list_transform(generate_series(1, len(w) - 1),
            i -> w[i] || '_' || w[i + 1]))) AS gr
        FROM t),
      bk AS (
        SELECT doc_id, source,
          CASE WHEN length(gr) = 0 THEN CAST(0 AS BIGINT)
            ELSE list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(generate_series(1, length(gr)),
                i -> CAST(ord(substring(gr, i, 1)) AS BIGINT))),
              (a, c) -> (a * 31 + c) % $FtBuckets) END AS b
        FROM g),
      stats AS (
        SELECT b, count(*) AS r_b,
          sum(CASE WHEN source = '$targetSource' THEN 1 ELSE 0 END) AS t_b
        FROM bk GROUP BY b),
      tot AS (
        SELECT CAST(sum(r_b) AS BIGINT) AS r_tot,
          CAST(sum(t_b) AS BIGINT) AS t_tot FROM stats),
      perdoc AS (
        SELECT doc_id, b, count(*) AS tf FROM bk GROUP BY doc_id, b),
      sc AS (
        SELECT p.doc_id, CAST(sum(p.tf) AS BIGINT) AS n_grams,
          sum(CAST(p.tf AS HUGEINT)
            * (CAST(s.t_b AS HUGEINT) * tt.r_tot
               - CAST(s.r_b AS HUGEINT) * tt.t_tot)) AS num
        FROM perdoc p JOIN stats s USING (b), tot tt
        GROUP BY p.doc_id)
      SELECT sc.doc_id, sc.n_grams,
        (round(CAST(sc.num AS DOUBLE)
          / (CAST(sc.n_grams AS DOUBLE) * CAST(tt.t_tot AS DOUBLE)
            * CAST(tt.r_tot AS DOUBLE)), 6) + 0.0) AS dsir_score,
        sc.num > 0 AS selected
      FROM sc, tot tt ORDER BY sc.doc_id"""

  /** The Gopher stopword list (Rae et al. 2021, §A1.1): a document
    * must contain at least [[GopherMinStops]] of these to pass the
    * "natural language" rule. */
  final val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "a", "in", "that", "have", "i")
  final val GopherMinWords = 20
  final val GopherMaxWords = 80
  final val GopherMinStops = 2

  /** t22: Gopher-style HARD quality rules — the rule-based gate (Rae
    * et al. 2021 §A1.1 / the C4 heuristics) that runs BEFORE any
    * learned classifier (t19) in a web-corpus pipeline: word-count
    * bounds, mean-word-length window, alphabetic-word fraction, and
    * minimum stopword presence; `keep` is their conjunction. The
    * word-count window is tightened to [[GopherMinWords]]..
    * [[GopherMaxWords]] for the synthetic corpus (docs run 10–99
    * words, vs Gopher's 50–100k for web pages) so the gate is
    * non-vacuous — the spec asserts both outcomes occur. Distinct
    * from t2 (a continuous score), t6 (repetition signals), and t19
    * (a learned linear model): this is the thresholded boolean
    * rule-set as data pipelines actually ship it.
    *
    * 100 TB contract: a pure per-row projection — every statistic is
    * an in-row fold over the word array, zero shuffles, whole-stage
    * codegen; thresholds are literals so the filter composes with
    * parquet scan pruning downstream. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRules(Tables.parallel(Tables.load(spark, dir, "documents")))

  def gopherRules(docs: DataFrame): DataFrame =
    gopherRulesCols(docs).orderBy("doc_id")

  /** The rule projection without the output sort — the stream form
    * ([[graft.streaming.StreamingOps.qualityGateStream]]) reuses it
    * directly (a sort is illegal on an unbounded stream; the batch
    * entry adds it for the deterministic dump). */
  def gopherRulesCols(docs: DataFrame): DataFrame = {
    val stopArr = GopherStops.map(s => s"'$s'").mkString("array(", ", ", ")")
    docs.select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        (aggregate(transform(col("ws"), w => length(w).cast("long")),
          lit(0L), (a, b) => a + b).cast("double")
          / size(col("ws")).cast("double")).as("mean_wlen0"),
        (size(filter(col("ws"), w => w.rlike("[A-Za-z]"))).cast("double")
          / size(col("ws")).cast("double")).as("alpha_frac0"),
        expr(s"size(filter($stopArr, s -> array_contains(ws, s)))")
          .cast("long").as("stop_hits"))
      .select(col("doc_id"), col("n_words"),
        round(col("mean_wlen0"), 6).as("mean_wlen"),
        round(col("alpha_frac0"), 6).as("alpha_frac"),
        col("stop_hits"),
        (col("n_words") >= GopherMinWords &&
          col("n_words") <= GopherMaxWords).as("words_ok"),
        (col("mean_wlen0") >= 3.0 && col("mean_wlen0") <= 10.0).as("wlen_ok"),
        (col("alpha_frac0") >= 0.8).as("alpha_ok"),
        (col("stop_hits") >= GopherMinStops).as("stop_ok"))
      .withColumn("keep",
        col("words_ok") && col("wlen_ok") && col("alpha_ok") && col("stop_ok"))
  }

  /** DuckDB oracle for [[gopherRules]] — same word split, same in-row
    * folds (integer length sum, so fold order is immaterial; the two
    * divisions are the identical double ops), same literal
    * thresholds applied to the UNROUNDED statistics. */
  def t22OracleSql: String = {
    val stops = GopherStops.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""
      WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      m AS (
        SELECT doc_id,
          CAST(len(ws) AS BIGINT) AS n_words,
          CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(ws, x -> CAST(len(x) AS BIGINT))),
            (a, b) -> a + b) AS DOUBLE)
            / CAST(len(ws) AS DOUBLE) AS mean_wlen0,
          CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
              AS DOUBLE)
            / CAST(len(ws) AS DOUBLE) AS alpha_frac0,
          CAST(len(list_filter($stops, s -> list_contains(ws, s)))
            AS BIGINT) AS stop_hits
        FROM w)
      SELECT doc_id, n_words,
        round(mean_wlen0, 6) AS mean_wlen,
        round(alpha_frac0, 6) AS alpha_frac,
        stop_hits,
        n_words >= $GopherMinWords AND n_words <= $GopherMaxWords AS words_ok,
        mean_wlen0 >= 3.0 AND mean_wlen0 <= 10.0 AS wlen_ok,
        alpha_frac0 >= 0.8 AS alpha_ok,
        stop_hits >= $GopherMinStops AS stop_ok,
        (n_words >= $GopherMinWords AND n_words <= $GopherMaxWords)
          AND (mean_wlen0 >= 3.0 AND mean_wlen0 <= 10.0)
          AND alpha_frac0 >= 0.8 AND stop_hits >= $GopherMinStops AS keep
      FROM m ORDER BY doc_id"""
  }

  /** t28: per-source n-gram DIVERSITY — the corpus-curation telemetry
    * (Dolma/RefinedWeb-style source reports) that catches templated or
    * spammy sources before they swamp a mixture: per source, the
    * bigram token count, distinct-bigram count, distinct ratio,
    * Shannon entropy of the bigram distribution and Pielou evenness
    * (entropy / ln(distinct) — the scale-free "how templated is this
    * source" number; a one-gram source is trivially even = 1).
    * Distinct from t10 (corpus term frequencies), t14 (per-doc
    * tf-idf), d16 (duplicate-gram memorization): this is the
    * SOURCE-level distributional summary a curation dashboard plots.
    *
    * Determinism: entropy is a float sum over gram-scale terms — the
    * classic order-sensitive fold. Each term p·ln(p) is rounded to
    * 12 dp (absorbing the ≤1-ulp ln() divergence between engines,
    * t14/s12's discipline) and summed as DECIMAL(38,12) — exact and
    * order-free, so the result is partitioning-independent and
    * bit-reproducible; the negated total goes through the roundz
    * signed-zero canonicalization (a single-gram source sums to
    * exactly 0, and DuckDB's negation of +0.0 is −0.0).
    *
    * Scale shape: one (source, gram) tf aggregate (map-side combine
    * collapses repeats — gram-scale, never doc×gram), one
    * source-scale rollup over it, a broadcast-joined per-source
    * total. Zero UDFs, zero collects. */
  def sourceDiversity(spark: SparkSession, dir: String): DataFrame =
    sourceDiversity(Tables.parallel(Tables.load(spark, dir, "documents")))

  def sourceDiversity(docs: DataFrame): DataFrame = {
    val w = "split(text, ' ')"
    val grams = s"""zip_with(slice($w, 1, size($w) - 1),
      slice($w, 2, size($w) - 1), (x, y) -> concat(x, '_', y))"""
    val tf = docs
      .select(col("source"), explode(expr(grams)).as("g"))
      .groupBy("source", "g").agg(count(lit(1)).as("tf"))
    val tot = tf.groupBy("source").agg(sum(col("tf")).as("n_grams"))
    val terms = tf.join(broadcast(tot), "source")
      .select(col("source"), col("n_grams"),
        round((col("tf").cast("double") / col("n_grams").cast("double"))
          * log(col("tf").cast("double") / col("n_grams").cast("double")), 12)
          .cast("decimal(38,12)").as("term"))
    terms.groupBy("source")
      .agg(min(col("n_grams")).as("n_grams"),
        count(lit(1)).as("n_distinct"),
        sum(col("term")).as("s12"))
      .select(col("source"), col("n_grams"), col("n_distinct"),
        round(col("n_distinct").cast("double")
          / col("n_grams").cast("double"), 6).as("distinct_ratio"),
        GraftFunctions.roundz(-col("s12").cast("double"), 6).as("entropy"),
        when(col("n_distinct") === 1, lit(1.0))
          .otherwise(GraftFunctions.roundz(-col("s12").cast("double")
            / log(col("n_distinct").cast("double")), 6)).as("evenness"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[sourceDiversity]] — identical grams,
    * identical round-12/DECIMAL(38,12) term fold, identical
    * canonicalized outputs. */
  def t28OracleSql: String = """
      WITH t AS (
        SELECT source, string_split(text, ' ') AS w FROM documents),
      g AS (
        SELECT source, unnest(list_transform(
          generate_series(1, len(w) - 1), i -> w[i] || '_' || w[i + 1]))
          AS gr
        FROM t),
      tf AS (SELECT source, gr, count(*) AS tf FROM g GROUP BY 1, 2),
      tot AS (SELECT source, CAST(sum(tf) AS BIGINT) AS n_grams
        FROM tf GROUP BY 1),
      terms AS (
        SELECT f.source, t2.n_grams,
          CAST(round((CAST(f.tf AS DOUBLE) / t2.n_grams)
            * ln(CAST(f.tf AS DOUBLE) / t2.n_grams), 12)
            AS DECIMAL(38,12)) AS term
        FROM tf f JOIN tot t2 USING (source))
      SELECT source, any_value(n_grams) AS n_grams,
        count(*) AS n_distinct,
        round(CAST(count(*) AS DOUBLE)
          / CAST(any_value(n_grams) AS DOUBLE), 6) AS distinct_ratio,
        (round(-CAST(sum(term) AS DOUBLE), 6) + 0.0) AS entropy,
        CASE WHEN count(*) = 1 THEN 1.0
          ELSE (round(-CAST(sum(term) AS DOUBLE)
            / ln(CAST(count(*) AS DOUBLE)), 6) + 0.0) END AS evenness
      FROM terms GROUP BY source ORDER BY source"""

  /** Span-start probability is 1/[[SpanStartMod]] per eligible token;
    * span length is uniform 1..[[SpanLenRange]] (mean 3), so the
    * expected corpus mask rate is ≈ 3/20 = 15% — T5's corruption
    * budget. */
  final val SpanStartMod = 20L
  final val SpanLenRange = 5L

  /** t27: span-corruption manifest — the T5/UL2 denoising-objective
    * data-prep step: for every document, plan which token SPANS get
    * masked (start positions + lengths), reporting per doc the token
    * count, span count, masked-token count and mask rate. Production
    * pipelines precompute exactly this manifest so the same corpus
    * yields the same corruption under retries and re-shards — which
    * is why selection here is a DETERMINISTIC position hash (the
    * repo's Knuth-multiplier form, t23's no-rand() discipline), not
    * an RNG: position i starts a span iff it's outside the previous
    * span and h(doc_id, i) ≡ 0 (mod [[SpanStartMod]]); its length is
    * 1 + (h/[[SpanStartMod]]) mod [[SpanLenRange]], truncated at the
    * doc end. Greedy left-to-right, non-overlapping — the fold is a
    * sequential recurrence over positions, run IN-ROW as one
    * `aggregate` over `sequence(1, n)` with the (next_free, n_masked,
    * n_spans) state packed into a single BIGINT (nf·10¹² + nm·10⁶ +
    * ns — exact integer arithmetic both engines reproduce bit-level).
    * The nm/ns fields carry 6 decimal digits, so the packing is only
    * sound for docs of ≤ 999,999 tokens (nm = n at the limit; one
    * more digit overflows nm into nf and silently corrupts all three
    * counters) — ENFORCED in-row via `raise_error` gating the packed
    * value (no extra scan, not prunable), so an over-cap doc fails
    * loudly instead of corrupting the fold.
    *
    * 100 TB contract: a pure per-row projection — zero shuffles
    * (ordering aside), whole-stage codegen, linear in corpus tokens;
    * composes with t8's packing and t23's sampling unchanged. */
  def spanMask(spark: SparkSession, dir: String): DataFrame =
    spanMask(Tables.parallel(Tables.load(spark, dir, "documents")))

  def spanMask(docs: DataFrame): DataFrame = {
    // h(doc_id, i), pre-mod to keep the Knuth product inside int64
    val h = s"(((doc_id * 1000003 + i) % 1000000000) * 2654435761)" +
      s" % 2147483647"
    val len = s"(1 + (($h div $SpanStartMod) % $SpanLenRange))"
    docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        expr(s"""if(n <= 999999,
          aggregate(sequence(1L, n), cast(1000000000000 as bigint),
          (acc, i) -> if(i >= acc div 1000000000000 and $h % $SpanStartMod = 0,
            (i + $len) * 1000000000000
              + ((acc div 1000000) % 1000000
                 + least($len, n - i + 1)) * 1000000
              + (acc % 1000000 + 1),
            acc)),
          cast(raise_error(concat('t27 spanMask: doc ', doc_id,
            ' has ', n, ' tokens, beyond the 999,999-token packing',
            ' bound')) as bigint))""").as("packed"))
      .select(col("doc_id"), col("n_tokens"),
        (col("packed") % 1000000L).as("n_spans"),
        // Column./ is DOUBLE division — past 2^53 it silently loses
        // low bits of the packed word; `div` keeps it integral
        expr("(packed div 1000000) % 1000000").as("n_masked"),
        round(expr("(packed div 1000000) % 1000000").cast("double")
          / col("n_tokens").cast("double"), 6).as("mask_rate"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[spanMask]] — the identical greedy
    * recurrence, expressed as a RECURSIVE CTE stepping every doc's
    * position counter in lockstep rather than a list_reduce lambda:
    * DuckDB 1.0's vectorized list_reduce mis-evaluates branching
    * lambdas on ~96+-element lists (7 of sf0.01's 500 docs came back
    * with wrong span counts; the same fold on a single row is
    * correct), and an oracle must not stand on a construct with a
    * row-count-dependent failure mode. Plain scalar arithmetic per
    * step, ≤ max(n) iterations of doc-count rows — oracle-scale. */
  def t27OracleSql: String = {
    val h = s"(((doc_id * 1000003 + pos + 1) % 1000000000)" +
      s" * 2654435761) % 2147483647"
    val len = s"(1 + (($h // $SpanStartMod) % $SpanLenRange))"
    val fire = s"pos + 1 >= nf AND $h % $SpanStartMod = 0"
    s"""
      WITH RECURSIVE t AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        FROM documents),
      st(doc_id, n, pos, nf, nm, ns) AS (
        SELECT doc_id, n, CAST(0 AS BIGINT), CAST(1 AS BIGINT),
          CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        FROM t
        UNION ALL
        SELECT doc_id, n, pos + 1,
          CASE WHEN $fire THEN pos + 1 + $len ELSE nf END,
          CASE WHEN $fire
            THEN nm + least($len, n - (pos + 1) + 1) ELSE nm END,
          CASE WHEN $fire THEN ns + 1 ELSE ns END
        FROM st WHERE pos < n)
      SELECT doc_id, n AS n_tokens, ns AS n_spans, nm AS n_masked,
        round(CAST(nm AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mask_rate
      FROM st WHERE pos = n ORDER BY doc_id"""
  }

  /** Ranks entering the Zipf regression per source — the standard
    * head-of-distribution fit window (the tail bends away from the
    * power law and a fit over it measures vocabulary truncation, not
    * the exponent). */
  final val ZipfTopK = 100

  /** t29: per-source Zipf exponent — the corpus-health number next to
    * t28's entropy on a curation dashboard: natural text follows
    * rank⁻ˢ with s ≈ 1; a templated or machine-generated source bends
    * flat (s → 0) and a spam source with a few hammered tokens bends
    * steep. Fit = ordinary least squares of ln(freq) on ln(rank) over
    * the top-[[ZipfTopK]] tokens per source (rank ties broken by
    * token asc — deterministic in both engines).
    *
    * Determinism: ln() terms are rounded to 12 dp (the t14/t28
    * cross-engine ulp absorption) and every sum runs as
    * DECIMAL(38,12) — order-free, partitioning-independent; the
    * slope's single double division is identically phrased in both
    * engines and the (negative) result passes through roundz.
    *
    * Scale shape: one (source, token) tf aggregate with map-side
    * combine (gram-scale, never corpus-scale rows out), then the
    * NATIVE TopKPerGroup plan takes the top-100 per source with a
    * per-partition bounded heap — no per-source sort, no windowed
    * skew partition (one hot source never becomes one hot task) —
    * and the regression runs on ≤ 100·|sources| rows. */
  def zipfFit(spark: SparkSession, dir: String): DataFrame =
    zipfFit(Tables.parallel(Tables.load(spark, dir, "documents")))

  def zipfFit(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("tf"))
    val tot = tf.groupBy("source").agg(
      sum(col("tf")).as("n_tokens"), count(lit(1)).as("n_vocab"))
    val top = graft.plans.TopK.perGroup(tf, Seq("source"),
      Seq(("tf", false), ("w", true)), k = ZipfTopK)
    val q = top.select(col("source"),
      round(log(col("rnk").cast("double")), 12).as("x"),
      round(log(col("tf").cast("double")), 12).as("y"))
    val s = q.groupBy("source").agg(
      count(lit(1)).as("n_top"),
      sum(round(col("x") * col("y"), 12).cast("decimal(38,12)"))
        .cast("double").as("sxy"),
      sum(col("x").cast("decimal(38,12)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(38,12)")).cast("double").as("sy"),
      sum(round(col("x") * col("x"), 12).cast("decimal(38,12)"))
        .cast("double").as("sxx"))
    s.join(broadcast(tot), "source")
      .select(col("source"), col("n_tokens"), col("n_vocab"), col("n_top"),
        when(col("n_top") < 2, lit(null).cast("double"))
          .otherwise(GraftFunctions.roundz(
            (col("n_top").cast("double") * col("sxy") - col("sx") * col("sy"))
              / (col("n_top").cast("double") * col("sxx")
                - col("sx") * col("sx")), 6)).as("zipf_slope"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[zipfFit]] — identical tf/rank derivation
    * (row_number with the same tie-break), identical round-12 /
    * DECIMAL(38,12) term folds, identical slope arithmetic. */
  def t29OracleSql: String = s"""
      WITH tf AS (
        SELECT source, w, count(*) AS tf FROM (
          SELECT source, unnest(string_split(text, ' ')) AS w
          FROM documents) t
        GROUP BY 1, 2),
      tot AS (
        SELECT source, CAST(sum(tf) AS BIGINT) AS n_tokens,
          count(*) AS n_vocab
        FROM tf GROUP BY 1),
      rk AS (
        SELECT source, tf, row_number() OVER (
          PARTITION BY source ORDER BY tf DESC, w ASC) AS rnk
        FROM tf),
      q AS (
        SELECT source,
          round(ln(CAST(rnk AS DOUBLE)), 12) AS x,
          round(ln(CAST(tf AS DOUBLE)), 12) AS y
        FROM rk WHERE rnk <= $ZipfTopK),
      s AS (
        SELECT source, count(*) AS n_top,
          CAST(sum(CAST(round(x * y, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
          CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
          CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
          CAST(sum(CAST(round(x * x, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sxx
        FROM q GROUP BY 1)
      SELECT s.source, t.n_tokens, t.n_vocab, s.n_top,
        CASE WHEN s.n_top < 2 THEN NULL
          ELSE (round((CAST(s.n_top AS DOUBLE) * sxy - sx * sy)
            / (CAST(s.n_top AS DOUBLE) * sxx - sx * sx), 6) + 0.0) END
          AS zipf_slope
      FROM s JOIN tot t USING (source) ORDER BY source"""

  /** Tokens of leading context t30 fingerprints as "the template". */
  final val PrefixTokens = 5

  /** t30: TEMPLATE-PREFIX detection — the boilerplate-header telemetry
    * (RefinedWeb/Dolma curation): scraped sources ship thousands of
    * documents opening with the same navigation header, cookie banner
    * or license blurb; a source whose single most-common
    * [[PrefixTokens]]-token prefix covers a large share of its docs
    * needs a stripping rule BEFORE tokenization (t12 removes
    * known-boilerplate LINES; this finds which sources need one). Per
    * source: doc count, distinct prefix count, the dominant prefix
    * with its count and share.
    *
    * Scale shape: the prefix is an in-row projection (never the full
    * text as a key — 5 tokens bound the key width); one (source,
    * prefix) tf aggregate with map-side combine; the dominant prefix
    * via the NATIVE TopKPerGroup plan (bounded per-partition heap —
    * the hot-source-as-hot-partition trap again avoided); one
    * broadcast-joined per-source total. Ties break on prefix asc in
    * both engines. */
  def templatePrefix(spark: SparkSession, dir: String): DataFrame =
    templatePrefix(Tables.parallel(Tables.load(spark, dir, "documents")))

  def templatePrefix(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("source"),
        expr(s"array_join(slice(split(text, ' '), 1, $PrefixTokens), ' ')")
          .as("prefix"))
      .groupBy("source", "prefix").agg(count(lit(1)).as("cnt"))
    val tot = tf.groupBy("source").agg(
      sum(col("cnt")).as("n_docs"), count(lit(1)).as("n_prefixes"))
    graft.plans.TopK.perGroup(tf, Seq("source"),
        Seq(("cnt", false), ("prefix", true)), k = 1)
      .join(broadcast(tot), "source")
      .select(col("source"), col("n_docs"), col("n_prefixes"),
        col("prefix").as("top_prefix"), col("cnt").as("top_count"),
        round(col("cnt").cast("double") / col("n_docs").cast("double"), 6)
          .as("top_share"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[templatePrefix]] — identical prefix
    * derivation, row_number with the same tie-break. */
  def t30OracleSql: String = s"""
      WITH tf AS (
        SELECT source,
          array_to_string(list_slice(string_split(text, ' '),
            1, $PrefixTokens), ' ') AS prefix,
          count(*) AS cnt
        FROM documents GROUP BY 1, 2),
      tot AS (
        SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs,
          count(*) AS n_prefixes
        FROM tf GROUP BY 1),
      rk AS (
        SELECT source, prefix, cnt, row_number() OVER (
          PARTITION BY source ORDER BY cnt DESC, prefix ASC) AS rnk
        FROM tf)
      SELECT r.source, t.n_docs, t.n_prefixes,
        r.prefix AS top_prefix, r.cnt AS top_count,
        round(CAST(r.cnt AS DOUBLE) / CAST(t.n_docs AS DOUBLE), 6)
          AS top_share
      FROM rk r JOIN tot t USING (source)
      WHERE r.rnk = 1 ORDER BY source"""

  /** t31: token FREQUENCY SPECTRUM — Good–Turing
    * frequencies-of-frequencies: how many distinct tokens occur k
    * times, rolled into log₂ occurrence buckets (g13's digit-count
    * bucket — pure integer, engine-shared). The two numbers every
    * tokenizer/vocab decision reads: the hapax mass (bucket 0 — the
    * singleton tail a vocab cut drops) and where the occurrence mass
    * concentrates. Distinct from t10 (top terms), t29 (rank
    * exponent): this is the FULL spectrum, computed with NO global
    * sort or rank — a ranked coverage curve needs a corpus-wide
    * ordering, the spectrum needs only aggregates.
    *
    * Scale shape: one (token) tf aggregate with map-side combine,
    * one tf-keyed rollup (distinct-tf scale), a ≤64-row bucket
    * rollup + a one-row total broadcast. All integers except the
    * final share divisions. */
  def freqSpectrum(spark: SparkSession, dir: String): DataFrame =
    freqSpectrum(Tables.parallel(Tables.load(spark, dir, "documents")))

  def freqSpectrum(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("tf"))
    val spec = tf.groupBy("tf").agg(count(lit(1)).as("n_tok"))
    val tot = spec.agg(sum(col("n_tok")).as("vocab"),
      sum(col("tf") * col("n_tok")).as("n_total"))
    spec
      .withColumn("bucket", (length(bin(col("tf"))) - 1).cast("long"))
      .groupBy("bucket")
      .agg(sum(col("n_tok")).as("n_tokens"),
        min(col("tf")).as("min_occ"), max(col("tf")).as("max_occ"),
        sum(col("tf") * col("n_tok")).as("occurrences"))
      .crossJoin(broadcast(tot)) // one row — in-plan, not a head()
      .select(col("bucket"), col("n_tokens"), col("min_occ"),
        col("max_occ"), col("occurrences"),
        round(col("n_tokens").cast("double") / col("vocab").cast("double"), 6)
          .as("vocab_share"),
        round(col("occurrences").cast("double")
          / col("n_total").cast("double"), 6).as("occ_share"))
      .orderBy("bucket")
  }

  /** DuckDB oracle for [[freqSpectrum]] — identical tf spectrum and
    * digit-count bucket. */
  def t31OracleSql: String = """
      WITH tf AS (
        SELECT w, count(*) AS tf FROM (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        GROUP BY w),
      spec AS (SELECT tf, count(*) AS n_tok FROM tf GROUP BY tf),
      tot AS (
        SELECT CAST(sum(n_tok) AS BIGINT) AS vocab,
          CAST(sum(tf * n_tok) AS BIGINT) AS n_total
        FROM spec)
      SELECT length(bin(tf)) - 1 AS bucket,
        CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        min(tf) AS min_occ, max(tf) AS max_occ,
        CAST(sum(tf * n_tok) AS BIGINT) AS occurrences,
        round(CAST(sum(n_tok) AS DOUBLE) / CAST(any_value(t.vocab) AS DOUBLE), 6)
          AS vocab_share,
        round(CAST(sum(tf * n_tok) AS DOUBLE)
          / CAST(any_value(t.n_total) AS DOUBLE), 6) AS occ_share
      FROM spec, tot t
      GROUP BY bucket ORDER BY bucket"""

  /** t32 parameters: max piece length, seed-vocabulary size (top-N
    * substrings by occurrence-weighted frequency, PLUS every single
    * character — the coverage guarantee that keeps Viterbi total),
    * and the FIXED EM step count (hard-EM has no finite fixpoint
    * guarantee under re-quantized scores, so "the vocabulary after
    * exactly K steps" is the scale-stable exact contract — the g1
    * class). */
  final val T32MaxPiece = 4
  final val T32SeedN = 40
  final val T32EmSteps = 2

  /** t32: UNIGRAM-LM tokenizer training (Kudo 2018, the SentencePiece
    * unigram model) beside t18's BPE — the OTHER mainstream subword
    * trainer: instead of greedy pair merges, a piece VOCABULARY with
    * log-probabilities under which each word is segmented by Viterbi
    * into its most probable piece sequence. This implementation is
    * the hard-EM (Viterbi-EM) form: (1) seed = the [[T32SeedN]] most
    * frequent substrings of length ≤ [[T32MaxPiece]] plus all single
    * chars, scored by ln frequency share; (2) each EM step Viterbi-
    * segments the word vocabulary under current scores (E) and
    * re-estimates scores from the weighted piece usage counts (M);
    * pieces the Viterbi never uses drop out — the unigram PRUNE,
    * emerging from the E-step rather than a separate heuristic.
    *
    * Determinism contract: piece scores are round-6 quantized before
    * any comparison (t14's ln-ulp absorption); DP candidate scores
    * are sums of those identical doubles in identical order; score
    * ties break to the SHORTER piece (first-wins ascending-j fold,
    * mirrored exactly by the oracle's list_reduce). Fixed
    * [[T32EmSteps]] by contract.
    *
    * Scale shape: ONE corpus-scale tokenize+count shuffle builds the
    * word vocabulary; everything after — substring explode, seed
    * top-N, per-step Viterbi + usage aggregate — is VOCABULARY-
    * bounded (Heaps-law ~10⁵ words at 100 TB), t18's exact cost
    * class. The Viterbi is an in-row packed DP (t27's discipline):
    * one `aggregate` builds the (score, backpointer) array — the
    * per-position argmax is a nested constant-width fold over
    * [[T32MaxPiece]] candidates — and one `aggregate` walks the
    * backpointers out; the piece scores ride along as a broadcast
    * one-row map column (vocab-bounded), so the whole E-step is a
    * zero-shuffle projection over the word frame. */
  def unigramLm(spark: SparkSession, dir: String): DataFrame =
    unigramLm(Tables.parallel(Tables.load(spark, dir, "documents")))

  def unigramLm(docs: DataFrame, seedN: Int = T32SeedN,
                emSteps: Int = T32EmSteps,
                maxPiece: Int = T32MaxPiece): DataFrame = {
    require(emSteps >= 1, s"t32 needs >= 1 EM step, got $emSteps")
    val M = maxPiece
    val w = graft.Ckpt(docs.select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("len", length(col("word"))))
    // seed: every substring occurrence of length 1..M, weighted
    val subs = graft.Ckpt(w.select(col("cnt"), explode(expr(
      s"""flatten(transform(sequence(1, len), i ->
            transform(sequence(1, least($M, len - i + 1)), j ->
              substring(word, i, j))))""")).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("freq")))
    val topN = subs.orderBy(col("freq").desc, col("piece")).limit(seedN)
    val singles = subs.filter(length(col("piece")) === 1)
    val seed = topN.unionByName(singles).distinct()
    val tot0 = seed.agg(sum(col("freq")).as("tf"))
    var vocab: DataFrame = graft.Ckpt(seed.crossJoin(broadcast(tot0))
      .select(col("piece"),
        round(log(col("freq").cast("double") / col("tf").cast("double")), 6)
          .as("logp")))
    // in-row Viterbi: dp = array of (best score, chosen piece length)
    // per prefix; missing pieces carry a -1e18 penalty (never chosen
    // while single chars exist); ties to the shorter piece via the
    // strict-> first-wins ascending-j fold
    val dpExpr = s"""aggregate(sequence(1, len),
        array(struct(0.0D as s, 0 as j)),
        (acc, i) -> concat(acc, array(
          aggregate(sequence(1, least(i, $M)),
            struct(cast('-Infinity' as double) as s, 0 as j),
            (b, j) -> CASE WHEN element_at(acc, i - j + 1).s
                + coalesce(element_at(pm, substring(word, i - j + 1, j)),
                    -1.0E18D) > b.s
              THEN struct(element_at(acc, i - j + 1).s
                + coalesce(element_at(pm, substring(word, i - j + 1, j)),
                    -1.0E18D) as s, j as j)
              ELSE b END))))"""
    val btExpr = """aggregate(sequence(1, len),
        struct(len as pos, cast(array() as array<string>) as ps),
        (a, x) -> CASE WHEN a.pos > 0 THEN struct(
            a.pos - element_at(dp, a.pos + 1).j as pos,
            concat(a.ps, array(substring(word,
              a.pos - element_at(dp, a.pos + 1).j + 1,
              element_at(dp, a.pos + 1).j))) as ps)
          ELSE a END).ps"""
    for (_ <- 1 to emSteps) {
      val pm = vocab.agg(map_from_entries(
        collect_list(struct(col("piece"), col("logp")))).as("pm"))
      val counts = w.crossJoin(broadcast(pm))
        .withColumn("dp", expr(dpExpr))
        .withColumn("ps", expr(btExpr))
        .select(col("cnt"), explode(col("ps")).as("piece"))
        .groupBy("piece").agg(sum(col("cnt")).as("c"))
      val tot = counts.agg(sum(col("c")).as("tc"))
      vocab = graft.Ckpt(counts.crossJoin(broadcast(tot))
        .select(col("piece"), col("c"),
          round(log(col("c").cast("double") / col("tc").cast("double")), 6)
            .as("logp")))
    }
    vocab.select(col("piece"), col("c").as("cnt"),
      graft.GraftFunctions.roundz(col("logp"), 6).as("logp"))
      .orderBy("piece")
  }

  /** DuckDB oracle for [[unigramLm]] — identical seed construction,
    * then [[T32EmSteps]] unrolled Viterbi-EM blocks (t18's generated-
    * CTE discipline): the DP is a per-word list recursion carrying
    * (scores, backpointers), the per-position argmax the same
    * first-wins ascending-j fold, piece lookups through a sorted
    * (piece, logp) list pair (missing → the same -1e18 penalty). */
  def t32OracleSql(seedN: Int = T32SeedN, emSteps: Int = T32EmSteps): String = {
    val M = T32MaxPiece
    def step(k: Int) = s"""
      pm$k AS MATERIALIZED (
        SELECT list(piece ORDER BY piece) AS pl,
          list(logp ORDER BY piece) AS ll FROM voc${k - 1}),
      vit$k AS (
        SELECT word, cnt, L, 0 AS i,
          [CAST(0.0 AS DOUBLE)] AS bs, [0] AS bp
        FROM wv
        UNION ALL
        SELECT word, cnt, L, i + 1,
          list_append(bs, best['s']), list_append(bp, best['j'])
        FROM (
          SELECT word, cnt, L, i, bs, bp,
            list_reduce(
              list_transform(generate_series(1, least(i + 1, $M)), j ->
                struct_pack(
                  s := bs[i + 2 - j] + coalesce(
                    ll[list_position(pl, substr(word, i + 2 - j, j))],
                    -1e18),
                  j := j)),
              (a, b) -> CASE WHEN b['s'] > a['s'] THEN b ELSE a END) AS best
          FROM vit$k, pm$k WHERE i < L) t),
      f$k AS MATERIALIZED (
        SELECT word, cnt, L, bp FROM vit$k WHERE i = L),
      bt$k AS (
        SELECT word, cnt, L AS pos, CAST([] AS VARCHAR[]) AS ps, bp FROM f$k
        UNION ALL
        SELECT word, cnt, pos - bp[pos + 1],
          list_append(ps,
            substr(word, pos - bp[pos + 1] + 1, bp[pos + 1])), bp
        FROM bt$k WHERE pos > 0),
      cnt$k AS MATERIALIZED (
        SELECT piece, sum(cnt) AS c FROM (
          SELECT cnt, unnest(ps) AS piece FROM bt$k WHERE pos = 0) t
        GROUP BY piece),
      tt$k AS (SELECT sum(c) AS tc FROM cnt$k),
      voc$k AS MATERIALIZED (
        SELECT piece, c,
          round(ln(CAST(c AS DOUBLE) / CAST(tc AS DOUBLE)), 6) AS logp
        FROM cnt$k, tt$k)"""
    s"""
      WITH RECURSIVE wv AS MATERIALIZED (
        SELECT word, count(*) AS cnt, len(word) AS L FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        WHERE len(word) > 0 GROUP BY word),
      subs AS MATERIALIZED (
        SELECT substr(word, i, j) AS piece, sum(cnt) AS freq
        FROM wv,
          LATERAL unnest(generate_series(1, L)) a(i),
          LATERAL unnest(generate_series(1, $M)) b(j)
        WHERE i + j - 1 <= L
        GROUP BY 1),
      topn AS (
        SELECT piece, freq FROM subs ORDER BY freq DESC, piece LIMIT $seedN),
      seed AS (
        SELECT DISTINCT piece, freq FROM (
          SELECT * FROM topn
          UNION ALL SELECT piece, freq FROM subs WHERE len(piece) = 1) u),
      t0 AS (SELECT sum(freq) AS tf FROM seed),
      voc0 AS MATERIALIZED (
        SELECT piece,
          round(ln(CAST(freq AS DOUBLE) / CAST(tf AS DOUBLE)), 6) AS logp
        FROM seed, t0),
      ${(1 to emSteps).map(step).mkString(",")}
      SELECT piece, CAST(c AS BIGINT) AS cnt,
        (round(logp, 6) + 0.0) AS logp
      FROM voc$emSteps ORDER BY piece"""
  }

  /** Absolute discount of [[knBigramLm]] — the conventional 0.75 of
    * the Kneser–Ney literature (Chen & Goodman 1999 report D ≈
    * n₁/(n₁+2n₂) ≈ 0.75 across corpora; the fixed literal keeps the
    * operator parameter-free and the oracle byte-identical). */
  final val KnDiscount = 0.75

  /** t33: interpolated KNESER–NEY bigram scoring (Kneser & Ney 1995;
    * Chen & Goodman 1999) — the smoothing the production LM-quality
    * stack (KenLM / CCNet) actually uses, beside t20's add-one
    * baseline: P(w₂|w₁) = (c(w₁w₂) − D)/c(w₁·) +
    * (D·N₁₊(w₁·)/c(w₁·)) · N₁₊(·w₂)/N₁₊(··). The continuation
    * probability is what add-one cannot express: a word that appears
    * OFTEN but only after one fixed context ("Francisco") gets a low
    * backoff weight even though its unigram count is high — exactly
    * the template/boilerplate signature the quality filter wants to
    * see through. Per-doc output = mean −ln P over the doc's bigrams
    * (t20's fold), so the two scores are directly comparable.
    *
    * Exactness: every model quantity (bigram count, context total,
    * distinct-successor/predecessor counts, type count) is an exact
    * integer; each probability is ONE double expression phrased
    * identically in both engines (c ≥ 1 > D so the max(·,0) clamp of
    * the general form is vacuous within-corpus, stated not coded);
    * the per-doc fold runs in bigram-sorted order (t17's index-order
    * fold) and round(6) absorbs ln()'s libm ulp.
    *
    * Scale shape: identical to t20 — the corpus pays ONE (doc,
    * bigram) count shuffle; all four model frames derive from the
    * checkpointed bigram-type frame by vocab-scale aggregates (no
    * second corpus scan); the type-count total is a one-row
    * broadcast; scoring is two vocab-keyed equi-joins (sort-merge at
    * scale, AQE skew-split if one context dominates). */
  def knBigramLm(spark: SparkSession, dir: String): DataFrame =
    knBigramLm(Tables.parallel(Tables.load(spark, dir, "documents")))

  def knBigramLm(docs: DataFrame): DataFrame = {
    val d = lit(KnDiscount)
    val bg = graft.Ckpt(
      docs.select(col("doc_id"), explode(expr(
        """transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
           (s, idx) -> concat(s, ' ', element_at(split(text, ' '), idx + 2)))"""))
        .as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("tf")))
    val cb = graft.Ckpt(bg.groupBy("bg").agg(sum(col("tf")).as("cnt"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1)))
    val ctx = cb.groupBy("w1")
      .agg(sum(col("cnt")).as("ctx_cnt"), count(lit(1)).as("n1_fwd"))
    val cont = cb.groupBy("w2").agg(count(lit(1)).as("n1_bwd"))
    val types = cb.agg(count(lit(1)).as("n_types"))
    bg.join(cb.select(col("bg"), col("cnt"), col("w1"), col("w2")), "bg")
      .join(ctx, "w1")
      .join(cont, "w2")
      .crossJoin(broadcast(types))
      .withColumn("contrib", col("tf").cast("double") * -log(
        (col("cnt").cast("double") - d) / col("ctx_cnt").cast("double")
          + (d * col("n1_fwd").cast("double")
              / col("ctx_cnt").cast("double"))
            * (col("n1_bwd").cast("double") / col("n_types").cast("double"))))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("bg"), col("contrib"))))
          .as("cs"),
        sum(col("tf")).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        round(aggregate(col("cs"), lit(0.0),
            (acc, x) => acc + x.getField("contrib"))
          / col("n_bigrams").cast("double"), 6).as("kn_cross_entropy"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[knBigramLm]] — identical model counts and
    * the byte-identical probability expression. */
  def t33OracleSql: String = s"""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      bgx AS (
        SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
          i -> ws[i] || ' ' || ws[i + 1])) AS bg
        FROM w),
      bg AS (SELECT doc_id, bg, count(*) AS tf FROM bgx GROUP BY 1, 2),
      cb AS MATERIALIZED (
        SELECT bg, sum(tf) AS cnt,
          string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[-1] AS w2
        FROM bg GROUP BY bg),
      ctx AS (
        SELECT w1, sum(cnt) AS ctx_cnt, count(*) AS n1_fwd
        FROM cb GROUP BY 1),
      cont AS (SELECT w2, count(*) AS n1_bwd FROM cb GROUP BY 1),
      types AS (SELECT count(*) AS n_types FROM cb),
      contribs AS (
        SELECT doc_id, bg.bg AS bg, tf,
          CAST(tf AS DOUBLE) * -ln(
            (CAST(cnt AS DOUBLE) - $KnDiscount) / CAST(ctx_cnt AS DOUBLE)
              + ($KnDiscount * CAST(n1_fwd AS DOUBLE)
                  / CAST(ctx_cnt AS DOUBLE))
                * (CAST(n1_bwd AS DOUBLE) / CAST(n_types AS DOUBLE)))
            AS contrib
        FROM bg JOIN cb USING (bg)
        JOIN ctx ON ctx.w1 = cb.w1
        JOIN cont ON cont.w2 = cb.w2, types),
      perdoc AS (
        SELECT doc_id,
          list_transform(list_sort(list(struct_pack(bg := bg,
            contrib := contrib))), s -> s['contrib']) AS cs,
          CAST(sum(tf) AS BIGINT) AS n_bigrams
        FROM contribs GROUP BY doc_id)
      SELECT doc_id, n_bigrams,
        round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), cs),
            (acc, x) -> acc + x)
          / CAST(n_bigrams AS DOUBLE), 6) AS kn_cross_entropy
      FROM perdoc ORDER BY doc_id"""

  /** t34: HEAPS-LAW vocabulary-growth fit — V(n) ≈ K·nᵝ (Heaps 1978),
    * the projection every tokenizer/vocab budget decision at 100 TB
    * rests on: how fast does the vocabulary still grow at the corpus
    * frontier? β near 1 means unbounded novelty (OCR noise, ids,
    * boilerplate churn); β ≈ 0.4–0.6 is natural text. Checkpoints are
    * the power-of-two doc-id prefixes (the log₂ bucket family of
    * g13/t31): V_i and T_i at prefix doc_id < 2ⁱ come from ONE
    * first-occurrence aggregate (token → min doc_id) and one per-doc
    * token count, both bucketed by bit length and cumulated over the
    * ≤64-row bucket frame — NO corpus-order scan, NO corpus-scale
    * window. OLS of ln V on ln T over the checkpoints runs t29's
    * round-12 / DECIMAL(38,12) term lattice; K = exp(intercept) uses
    * the UNROUNDED slope so both engines exponentiate the identical
    * double.
    *
    * Scale shape: one (token) min-aggregate with map-side combine
    * (vocab-bounded output), one doc-scale projection + ≤64-bucket
    * rollup, a ≤64-row cumulative window (constant non-foldable key),
    * and a one-row OLS aggregate. Requires dense doc_ids 0..N−1 (the
    * g1 guard) so prefixes are id ranges. */
  def heapsFit(spark: SparkSession, dir: String): DataFrame =
    heapsFit(Tables.parallel(Tables.load(spark, dir, "documents")))

  def heapsFit(docs: DataFrame): DataFrame = {
    val h = docs.agg(count(lit(1)), min(col("doc_id")), max(col("doc_id")))
      .head()
    val n = h.getLong(0)
    require(n > 0, "t34 needs a non-empty documents frame")
    require(h.getLong(1) == 0L && h.getLong(2) == n - 1,
      s"t34 needs dense doc_ids 0..N-1, got [${h.get(1)}, ${h.get(2)}] of $n")
    val fp = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(min(col("doc_id")).as("fp"))
    val vb = fp.groupBy((length(bin(col("fp"))) - 1).cast("long").as("b"))
      .agg(count(lit(1)).as("nv"))
    val tb = docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy((length(bin(col("doc_id"))) - 1).cast("long").as("b"))
      .agg(sum(col("nt")).as("ntok"))
    val wcum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b") * 0).orderBy("b")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = graft.Ckpt(tb.join(vb, Seq("b"), "left_outer")
      .select(col("b"), coalesce(col("nv"), lit(0L)).as("nv"), col("ntok"))
      .select(col("b"), sum(col("nv")).over(wcum).as("v"),
        sum(col("ntok")).over(wcum).as("t")))
    val pts = cum.select(
      round(log(col("t").cast("double")), 12).as("x"),
      round(log(col("v").cast("double")), 12).as("y"))
    val s = pts.agg(count(lit(1)).as("c"),
      sum(round(col("x") * col("y"), 12).cast("decimal(38,12)"))
        .cast("double").as("sxy"),
      sum(col("x").cast("decimal(38,12)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(38,12)")).cast("double").as("sy"),
      sum(round(col("x") * col("x"), 12).cast("decimal(38,12)"))
        .cast("double").as("sxx"))
    val beta = (col("c").cast("double") * col("sxy") - col("sx") * col("sy")) /
      (col("c").cast("double") * col("sxx") - col("sx") * col("sx"))
    s.crossJoin(broadcast(cum.agg(max(col("t")).as("n_tokens"),
        max(col("v")).as("n_vocab"))))
      .select(col("c").as("n_checkpoints"), col("n_tokens"), col("n_vocab"),
        graft.GraftFunctions.roundz(beta, 6).as("heaps_beta"),
        round(exp((col("sy") - beta * col("sx")) / col("c").cast("double")),
          6).as("heaps_k"))
  }

  /** DuckDB oracle for [[heapsFit]] — identical bucket prefixes,
    * cumulative lattice, and OLS term quantization. */
  def t34OracleSql: String = """
      WITH fp AS (
        SELECT w, min(doc_id) AS fp FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents) t
        GROUP BY w),
      vb AS (
        SELECT length(bin(fp)) - 1 AS b, count(*) AS nv
        FROM fp GROUP BY 1),
      tb AS (
        SELECT length(bin(doc_id)) - 1 AS b,
          CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ntok
        FROM documents GROUP BY 1),
      cum AS (
        SELECT b,
          sum(coalesce(nv, 0)) OVER (ORDER BY b) AS v,
          sum(ntok) OVER (ORDER BY b) AS t
        FROM tb LEFT JOIN vb USING (b)),
      pts AS (
        SELECT round(ln(CAST(t AS DOUBLE)), 12) AS x,
          round(ln(CAST(v AS DOUBLE)), 12) AS y
        FROM cum),
      s AS (
        SELECT count(*) AS c,
          CAST(sum(CAST(round(x * y, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
          CAST(sum(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
          CAST(sum(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
          CAST(sum(CAST(round(x * x, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sxx
        FROM pts),
      tot AS (
        SELECT CAST(max(t) AS BIGINT) AS n_tokens,
          CAST(max(v) AS BIGINT) AS n_vocab
        FROM cum)
      SELECT c AS n_checkpoints, n_tokens, n_vocab,
        (round((CAST(c AS DOUBLE) * sxy - sx * sy)
          / (CAST(c AS DOUBLE) * sxx - sx * sx), 6) + 0.0) AS heaps_beta,
        round(exp((sy - (CAST(c AS DOUBLE) * sxy - sx * sy)
            / (CAST(c AS DOUBLE) * sxx - sx * sx) * sx)
          / CAST(c AS DOUBLE)), 6) AS heaps_k
      FROM s, tot"""

  /** t35: GOOD–TURING COVERAGE — per source, the unseen-probability
    * mass estimate P₀ = N₁/N (Good 1953): the fraction of the NEXT
    * token expected to be a type never seen in this source, from the
    * singleton count alone. This is the text-side twin of q53's
    * Chao1 (both extrapolate the unseen from the once-seen): a
    * source with high unseen mass is under-sampled for vocabulary
    * coverage — the signal a data-mixing pipeline reads before
    * deciding a source is "covered". Reports the full frequency-of-
    * frequency head (types, singletons f1, doubletons f2), P₀, and
    * coverage = 1 − P₀.
    *
    * Determinism: all inputs are exact integer aggregates (token
    * multiset → type counts → f-of-f); P₀ is one double division
    * rounded once.
    *
    * Scale shape: one (source, token) count aggregate with map-side
    * combine (the t10 class), one vocabulary-scale f-of-f rollup,
    * then source-bounded. */
  def goodTuring(spark: SparkSession, dir: String): DataFrame =
    goodTuring(Tables.parallel(Tables.load(spark, dir, "documents")))

  def goodTuring(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    tf.groupBy("source")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .withColumn("p_unseen", round(col("f1").cast("double")
        / col("n_tokens").cast("double"), 6))
      .withColumn("coverage", round(lit(1.0) - col("f1").cast("double")
        / col("n_tokens").cast("double"), 6))
      .orderBy("source")
  }

  /** DuckDB oracle for [[goodTuring]] — identical token multiset,
    * f-of-f census, and single rounded divisions. */
  def t35OracleSql: String = """
      WITH tf AS (
        SELECT source, w, count(*) AS c
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY 1, 2),
      agg AS (
        SELECT source, sum(c) AS n_tokens, count(*) AS n_types,
          sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
          sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
        FROM tf GROUP BY 1)
      SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(n_types AS BIGINT) AS n_types,
        CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
        round(CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
          AS p_unseen,
        round(1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
          AS coverage
      FROM agg ORDER BY source"""

  /** t36: TOKENIZER FERTILITY / COMPRESSION per language — the
    * multilingual-pipeline dial "how many subword pieces does this
    * tokenizer spend per word, and how many bytes ride in each
    * piece?" (fertility ≈ 1 for a well-fit language; ≫ 1 signals the
    * tokenizer fragments it, so the language pays more sequence
    * length per content — the standard argument for vocabulary
    * rebalancing). Pieces use t3's BPE-ish lexer; words are the
    * whitespace stream; bytes are octets.
    *
    * Determinism: all sums are exact integers; each output ratio is
    * ONE double division, round-6.
    *
    * Scale shape: one projection + one (lang)-keyed aggregate with
    * map-side combine — the per-doc counting happens before the
    * shuffle, so the exchange carries one row per language per
    * partition. */
  def fertility(spark: SparkSession, dir: String): DataFrame =
    fertility(Tables.parallel(Tables.load(spark, dir, "documents")))

  def fertility(docs: DataFrame): DataFrame = {
    docs.select(col("lang"),
        size(words(col("text"))).cast("long").as("nw"),
        regexp_count(col("text"), lit("[a-z]{1,4}")).cast("long").as("np"),
        octet_length(col("text")).cast("long").as("nb"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_words"),
        sum(col("np")).as("n_pieces"), sum(col("nb")).as("n_bytes"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_pieces"), col("n_bytes"),
        round(col("n_pieces").cast("double")
          / col("n_words").cast("double"), 6).as("fertility"),
        round(col("n_bytes").cast("double")
          / col("n_pieces").cast("double"), 6).as("bytes_per_piece"),
        round(col("n_words").cast("double")
          / col("n_docs").cast("double"), 6).as("words_per_doc"))
      .orderBy("lang")
  }

  /** DuckDB oracle for [[fertility]] — identical integer panels and
    * single-division ratios. */
  def t36OracleSql: String = """
      WITH per_doc AS (
        SELECT lang,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
          CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS BIGINT)
            AS np,
          CAST(strlen(text) AS BIGINT) AS nb
        FROM documents),
      agg AS (
        SELECT lang, count(*) AS n_docs, sum(nw) AS n_words,
          sum(np) AS n_pieces, sum(nb) AS n_bytes
        FROM per_doc GROUP BY 1)
      SELECT lang, n_docs, CAST(n_words AS BIGINT) AS n_words,
        CAST(n_pieces AS BIGINT) AS n_pieces,
        CAST(n_bytes AS BIGINT) AS n_bytes,
        round(CAST(n_pieces AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
          AS fertility,
        round(CAST(n_bytes AS DOUBLE) / CAST(n_pieces AS DOUBLE), 6)
          AS bytes_per_piece,
        round(CAST(n_words AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
          AS words_per_doc
      FROM agg ORDER BY lang"""

  /** t38: MOORE–LEWIS CROSS-ENTROPY DIFFERENCE SELECTION (Moore &
    * Lewis 2010) — the classic targeted-data-selection method beside
    * t24's DSIR: score each document by H_general(doc) − H_indomain
    * (doc), the per-token cross-entropy difference between a language
    * model of the TARGET domain and one of the general corpus; high
    * scores read "looks like the target, unlike the background", the
    * criterion used to mine general crawls for domain-relevant
    * training data. Here the target domain is the `en` slice and the
    * LMs are add-one unigram models over the SHARED corpus
    * vocabulary (so both assign every token nonzero mass — the
    * smoothing convention that keeps the difference finite).
    *
    * Determinism: counts are exact integers; each token's two
    * log-probs are single expressions of those integers; the per-doc
    * sums ride round-12 quantized DECIMAL terms (order-free); the two
    * cross-entropies divide once each, and the score is one roundz.
    *
    * Scale: tokenize once (corpus-linear), two token-keyed count
    * aggregates (map-side combine), one token-keyed join back
    * (vocabulary-scale side), one doc-keyed rollup. The three corpus
    * scalars ride a one-row broadcast. */
  def mooreLewis(spark: SparkSession, dir: String): DataFrame =
    mooreLewis(Tables.parallel(Tables.load(spark, dir, "documents")), "en")

  def mooreLewis(docs: DataFrame, domainLang: String): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(words(col("text"))).as("w"))
    val gen = toks.groupBy("w").agg(count(lit(1)).as("c_gen"))
    val ind = toks.filter(col("lang") === domainLang)
      .groupBy("w").agg(count(lit(1)).as("c_in"))
    val lm = graft.Ckpt(gen.join(ind, Seq("w"), "left")
      .select(col("w"), col("c_gen"),
        coalesce(col("c_in"), lit(0L)).as("c_in")))
    val scal = lm.agg(sum(col("c_gen")).as("n_gen"),
      sum(col("c_in")).as("n_in"), count(lit(1)).as("v"))
    val scored = toks.join(lm, "w")
      .crossJoin(broadcast(scal)) // one-row corpus scalars
      .select(col("doc_id"), col("lang"),
        round(log((col("c_in") + 1).cast("double")
          / (col("n_in") + col("v")).cast("double")), 12)
          .cast("decimal(25,12)").as("lp_in"),
        round(log((col("c_gen") + 1).cast("double")
          / (col("n_gen") + col("v")).cast("double")), 12)
          .cast("decimal(25,12)").as("lp_gen"))
    scored.groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("lp_in")).as("s_in"), sum(col("lp_gen")).as("s_gen"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        round(-col("s_in").cast("double")
          / col("n_tokens").cast("double"), 6).as("ce_in"),
        round(-col("s_gen").cast("double")
          / col("n_tokens").cast("double"), 6).as("ce_gen"),
        graft.GraftFunctions.roundz(
          (-col("s_gen").cast("double") / col("n_tokens").cast("double"))
            - (-col("s_in").cast("double") / col("n_tokens").cast("double")),
          6).as("ml_score"))
      .withColumn("selected", col("ml_score") > 0.0)
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[mooreLewis]] — identical count panels,
    * add-one log-prob grids, and per-doc decimal folds. */
  def t38OracleSql(domainLang: String = "en"): String = s"""
      WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        FROM documents),
      gen AS (SELECT w, count(*) AS c_gen FROM toks GROUP BY 1),
      ind AS (SELECT w, count(*) AS c_in FROM toks
              WHERE lang = '$domainLang' GROUP BY 1),
      lm AS (
        SELECT gen.w, c_gen, coalesce(c_in, 0) AS c_in
        FROM gen LEFT JOIN ind ON gen.w = ind.w),
      scal AS (
        SELECT sum(c_gen) AS n_gen, sum(c_in) AS n_in, count(*) AS v
        FROM lm),
      scored AS (
        SELECT doc_id, lang,
          CAST(round(ln(CAST(c_in + 1 AS DOUBLE)
            / CAST(n_in + v AS DOUBLE)), 12) AS DECIMAL(25,12)) AS lp_in,
          CAST(round(ln(CAST(c_gen + 1 AS DOUBLE)
            / CAST(n_gen + v AS DOUBLE)), 12) AS DECIMAL(25,12)) AS lp_gen
        FROM toks JOIN lm ON toks.w = lm.w, scal),
      agg AS (
        SELECT doc_id, lang, count(*) AS n_tokens,
          sum(lp_in) AS s_in, sum(lp_gen) AS s_gen
        FROM scored GROUP BY 1, 2)
      SELECT doc_id, lang, n_tokens,
        round(-CAST(s_in AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
          AS ce_in,
        round(-CAST(s_gen AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
          AS ce_gen,
        (round((-CAST(s_gen AS DOUBLE) / CAST(n_tokens AS DOUBLE))
          - (-CAST(s_in AS DOUBLE) / CAST(n_tokens AS DOUBLE)), 6)
          + 0.0) AS ml_score,
        (round((-CAST(s_gen AS DOUBLE) / CAST(n_tokens AS DOUBLE))
          - (-CAST(s_in AS DOUBLE) / CAST(n_tokens AS DOUBLE)), 6)
          + 0.0) > 0.0 AS selected
      FROM agg ORDER BY doc_id"""

  /** The character-entropy junk threshold (bits-e, i.e. nats): real
    * prose over a ~27-symbol alphabet runs ≈ 2.8–3.1 nats; repeated
    * filler and single-char spam fall well under 2. */
  final val CharEntropyJunkNats = 2.0

  /** t37: CHARACTER-ENTROPY JUNK SCORE per document — the cheapest
    * content-quality signal in the stack: Shannon entropy of the
    * character distribution over the fixed bins {a..z, space, other}.
    * Keyboard-mash, repeated-filler, and truncated-binary documents
    * collapse to low entropy long before a language model sees them;
    * the t2/t22 quality screens read this as one more column.
    *
    * Shape: a PURE per-row projection — each bin count is
    * length − length(replace(text, ch)) (no explode: a (doc, char)
    * exchange would ship every byte of a 100 TB corpus through a
    * shuffle for a statistic each row already holds); the entropy is
    * a FIXED-ORDER in-row chain (a…z, space, other) of one-division
    * p·ln p terms, so the IEEE sequence is identical in both engines
    * (q57's in-row fold discipline). Zero shuffle, zero state.
    *
    * Literal replace targets, not regex — nothing here can collide
    * with a regex metacharacter. */
  def charEntropy(spark: SparkSession, dir: String): DataFrame =
    charEntropy(Tables.parallel(Tables.load(spark, dir, "documents")))

  def charEntropy(docs: DataFrame): DataFrame = {
    val bins: Seq[String] = ('a' to 'z').map(_.toString) :+ " "
    val counts = bins.map(ch =>
      (length(col("text")) - length(expr(
        s"replace(text, '$ch', '')"))).cast("long"))
    val known = counts.reduce(_ + _)
    val withBins = docs.select(col("doc_id"),
      length(col("text")).cast("long").as("n_total"),
      (length(col("text")).cast("long") - known).as("n_other"),
      struct(counts.zipWithIndex.map { case (c, i) =>
        c.as(s"b$i") }: _*).as("bc"))
    val total = col("n_total").cast("double")
    def term(cnt: Column): Column = when(cnt > 0,
      -(cnt.cast("double") / total) * log(cnt.cast("double") / total))
      .otherwise(lit(0.0))
    val entropy = (0 until bins.size)
      .map(i => term(col(s"bc.b$i")))
      .reduce(_ + _) + term(col("n_other"))
    withBins
      .select(col("doc_id"), col("n_total"), col("n_other"),
        round(entropy, 6).as("entropy"))
      .withColumn("low_entropy", col("entropy") < CharEntropyJunkNats)
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[charEntropy]] — the identical fixed-order
    * bin chain. */
  def t37OracleSql: String = {
    val bins: Seq[String] = ('a' to 'z').map(_.toString) :+ " "
    val cnts = bins.zipWithIndex.map { case (ch, i) =>
      s"CAST(length(text) - length(replace(text, '$ch', '')) AS BIGINT) AS b$i"
    }.mkString(",\n          ")
    val known = bins.indices.map(i => s"b$i").mkString(" + ")
    def term(c: String) =
      s"CASE WHEN $c > 0 THEN -(CAST($c AS DOUBLE) / CAST(n_total AS DOUBLE)) * ln(CAST($c AS DOUBLE) / CAST(n_total AS DOUBLE)) ELSE 0.0 END"
    val entropy = (bins.indices.map(i => term(s"b$i")) :+ term("n_other"))
      .mkString(" + ")
    s"""
      WITH bc AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n_total,
          $cnts
        FROM documents),
      wo AS (
        SELECT *, n_total - ($known) AS n_other FROM bc)
      SELECT doc_id, n_total, CAST(n_other AS BIGINT) AS n_other,
        round($entropy, 6) AS entropy,
        round($entropy, 6) < $CharEntropyJunkNats AS low_entropy
      FROM wo ORDER BY doc_id"""
  }

  /** t39: READABILITY PANEL — Flesch Reading Ease + Flesch–Kincaid
    * grade (Kincaid et al. 1975), the classic audience-level dial a
    * curation pipeline slices corpora by (t2 scores junk; this scores
    * REGISTER — textbook vs legalese both pass t2): per document,
    * words (the house whitespace split), sentences (terminal-
    * punctuation runs, floored at 1 so a fragment is one sentence),
    * and the standard syllable PROXY = vowel-group runs ([aeiouy]+,
    * lowercased — the published approximation; a real hyphenator is a
    * dictionary, not an expression). FRE = 206.835 − 1.015·(w/s) −
    * 84.6·(syl/w); FK grade = 0.39·(w/s) + 11.8·(syl/w) − 15.59.
    *
    * Determinism: counts are exact integers from regexp_extract_all
    * on a shared Java∩RE2 regex (d21's discipline — '[aeiouy]+' and
    * '[.!?]+' parse identically in both engines); the two scores are
    * single double expressions (roundz — FK is negative for very
    * simple text, FRE can exceed 100).
    *
    * Scale: a PURE per-row projection — the output sort is the only
    * exchange (t37's class, PlanSpec-gated). */
  def readability(spark: SparkSession, dir: String): DataFrame =
    readability(Tables.parallel(Tables.load(spark, dir, "documents")))

  def readability(docs: DataFrame): DataFrame = {
    val words = size(split(col("text"), " "))
    val sents = greatest(
      size(expr("regexp_extract_all(text, '[.!?]+', 0)")), lit(1))
    val sylls = size(expr(
      "regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
    val wps = words.cast("double") / sents.cast("double")
    val spw = sylls.cast("double") / words.cast("double")
    docs.select(col("doc_id"),
      words.cast("long").as("n_words"),
      sents.cast("long").as("n_sentences"),
      sylls.cast("long").as("n_syllables"),
      graft.GraftFunctions.roundz(lit(206.835) - lit(1.015) * wps
        - lit(84.6) * spw, 6).as("flesch_ease"),
      graft.GraftFunctions.roundz(lit(0.39) * wps + lit(11.8) * spw
        - lit(15.59), 6).as("fk_grade"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[readability]] — identical splits, the same
    * RE2-safe regexes, and the same double expressions. */
  def t39OracleSql: String = """
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
          AS BIGINT) AS n_sentences,
        CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
          AS BIGINT) AS n_syllables,
        (round(CAST(206.835 AS DOUBLE)
          - CAST(1.015 AS DOUBLE) * (CAST(len(string_split(text, ' '))
              AS DOUBLE)
            / CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS DOUBLE))
          - CAST(84.6 AS DOUBLE)
            * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
              AS DOUBLE)
            / CAST(len(string_split(text, ' ')) AS DOUBLE)), 6) + 0.0)
          AS flesch_ease,
        (round(CAST(0.39 AS DOUBLE) * (CAST(len(string_split(text, ' '))
              AS DOUBLE)
            / CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS DOUBLE))
          + CAST(11.8 AS DOUBLE)
            * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
              AS DOUBLE)
            / CAST(len(string_split(text, ' ')) AS DOUBLE))
          - CAST(15.59 AS DOUBLE), 6) + 0.0) AS fk_grade
      FROM documents ORDER BY doc_id"""

  /** TTR factor threshold of [[mtld]] (McCarthy & Jarvis 2010's
    * published 0.72). */
  final val MtldThreshold = 0.72

  /** t41: MTLD — Measure of Textual Lexical Diversity (McCarthy &
    * Jarvis 2010), the length-robust lexical-diversity score t29's
    * Zipf fit and t34's Heaps fit do not give per document: walk the
    * token stream keeping a running type-token ratio; every time TTR
    * drops below [[MtldThreshold]] one "factor" completes and the
    * type set resets; MTLD = n_tokens / (factors + partial) with the
    * standard partial credit (1 − TTR_remaining)/(1 − threshold) for
    * the unfinished tail. Unlike raw TTR it does not collapse with
    * document length — the reason corpus-quality suites report it.
    * Forward-pass form (the bidirectional mean is the average of this
    * operator run on the reversed stream — compose, don't duplicate).
    *
    * Determinism: the fold is exact integer state (factor count,
    * token count, type set) with ONE double compare per step —
    * size/count division against the identical 0.72 literal in both
    * engines (IEEE-identical inputs ⇒ identical branch); the output
    * is one round-6 double expression. A document whose TTR never
    * drops below the threshold (short or fully distinct) has zero
    * factors and zero partial → NULL mtld in both engines ("too
    * short to estimate" — the published convention).
    *
    * Scale shape: a PURE per-row projection — the sequential
    * recurrence is ONE in-row `aggregate` fold over the word array
    * (t27/t32's packed-DP discipline, O(factor-span) set membership
    * per step), zero shuffles except the output sort; the oracle
    * replays the identical expression tree via a token-stepping
    * recursive CTE (e28's pattern, NOT the list_reduce
    * struct-accumulator bug path). */
  def mtld(spark: SparkSession, dir: String): DataFrame =
    mtld(Tables.parallel(Tables.load(spark, dir, "documents")))

  def mtld(docs: DataFrame): DataFrame = {
    val th = MtldThreshold
    val nty = "CASE WHEN array_contains(acc.ty, w) THEN acc.ty " +
      "ELSE array_append(acc.ty, w) END"
    val fold = s"""aggregate(
      split(text, ' '),
      named_struct('f', CAST(0 AS INT), 't', CAST(0 AS INT),
        'ty', CAST(array() AS array<string>)),
      (acc, w) -> CASE
        WHEN CAST(size($nty) AS DOUBLE) / CAST(acc.t + 1 AS DOUBLE) < $th
          THEN named_struct('f', acc.f + 1, 't', CAST(0 AS INT),
            'ty', CAST(array() AS array<string>))
        ELSE named_struct('f', acc.f, 't', acc.t + 1, 'ty', $nty)
        END)"""
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        expr(fold).as("st"))
      .select(col("doc_id"), col("n_tokens"),
        col("st.f").cast("long").as("factors"),
        col("st.t").as("tt"), col("st.ty").as("tyv"))
      .select(col("doc_id"), col("n_tokens"), col("factors"),
        when(col("tt") > 0,
          (lit(1.0) - size(col("tyv")).cast("double")
            / col("tt").cast("double")) / lit(1.0 - th))
          .otherwise(lit(0.0)).as("partial"))
      .select(col("doc_id"), col("n_tokens"), col("factors"),
        when(col("factors").cast("double") + col("partial") > 0.0,
          round(col("n_tokens").cast("double")
            / (col("factors").cast("double") + col("partial")), 6))
          .as("mtld"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[mtld]] — the identical factor fold replayed
    * token-by-token in a recursive CTE, same 0.72 compare, same
    * partial-credit and round-6 output expressions. */
  def t41OracleSql: String = {
    val th = MtldThreshold
    s"""
      WITH RECURSIVE docsw AS MATERIALIZED (
        SELECT doc_id, string_split(text, ' ') AS ws,
          len(string_split(text, ' ')) AS n
        FROM documents),
      r AS (
        SELECT doc_id, ws, n, 0 AS i, 0 AS f, 0 AS t,
          CAST([] AS VARCHAR[]) AS ty
        FROM docsw
        UNION ALL
        SELECT doc_id, ws, n, i + 1,
          CASE WHEN CAST(len(nty) AS DOUBLE)
              / CAST(t + 1 AS DOUBLE) < $th
            THEN f + 1 ELSE f END,
          CASE WHEN CAST(len(nty) AS DOUBLE)
              / CAST(t + 1 AS DOUBLE) < $th
            THEN 0 ELSE t + 1 END,
          CASE WHEN CAST(len(nty) AS DOUBLE)
              / CAST(t + 1 AS DOUBLE) < $th
            THEN CAST([] AS VARCHAR[]) ELSE nty END
        FROM (
          SELECT doc_id, ws, n, i, f, t, ty,
            CASE WHEN list_contains(ty, ws[i + 1]) THEN ty
              ELSE list_append(ty, ws[i + 1]) END AS nty
          FROM r WHERE i < n) s),
      fin AS (
        SELECT doc_id, n, f, t, ty FROM r WHERE i = n)
      SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        CAST(f AS BIGINT) AS factors,
        CASE WHEN CAST(f AS DOUBLE) + partial > 0.0
          THEN round(CAST(n AS DOUBLE) / (CAST(f AS DOUBLE) + partial), 6)
          END AS mtld
      FROM (
        SELECT doc_id, n, f,
          CASE WHEN t > 0
            THEN (1.0 - CAST(len(ty) AS DOUBLE) / CAST(t AS DOUBLE))
              / ${1.0 - th}
            ELSE 0.0 END AS partial
        FROM fin) p
      ORDER BY doc_id"""
  }

  /** Phrases reported by [[rakeKeywords]]. */
  final val RakeTopK = 20

  /** t40: RAKE KEYWORD EXTRACTION (Rose et al. 2010) — the unsupervised
    * keyphrase surfacer beside t10's unigram profile and t14's TF-IDF:
    * candidate phrases are the maximal stopword-free word runs
    * (delimiters = the [[GopherStops]] vocabulary — ONE source of
    * truth rendered into both engines), each word scores
    * deg(w)/freq(w) (deg = Σ length of phrases containing w — words
    * that live in LONG phrases beat equally-frequent loners), and a
    * phrase scores the sum of its word scores; the corpus-level
    * report is the [[RakeTopK]] highest-scoring distinct phrases with
    * occurrence/document counts.
    *
    * Determinism: deg and freq are exact integers; each word score is
    * ONE round-12 double division re-entering DECIMAL(38,12), so
    * phrase scores are order-free exact decimal sums ranked directly
    * (no float ordering) with phrase-text tie-breaks; the output
    * score is one round-6 cast.
    *
    * Scale shape: two fact-scale in-row explodes (phrase runs, then
    * words — no pair join anywhere); word stats are vocab-bounded;
    * the word-stat join is vocab-keyed (unhinted — AQE broadcasts
    * while genuinely small); per-occurrence scores partial-aggregate
    * map-side; the distinct-phrase frame is content-bounded and the
    * final rank is a TakeOrdered horizon, never a full sort. Phrase
    * GROUP BY keys are the phrase strings themselves — the same bytes
    * the report must output, and one key per ~phrase-length words
    * (unlike a per-position gram key, which is why d20 hashes and
    * this does not). */
  def rakeKeywords(spark: SparkSession, dir: String): DataFrame =
    rakeKeywords(Tables.parallel(Tables.load(spark, dir, "documents")))

  def rakeKeywords(docs: DataFrame): DataFrame = {
    val d3812 = "decimal(38,12)"
    val marked = concat_ws(" ",
      org.apache.spark.sql.functions.transform(split(col("text"), " "),
        w => when(w.isin(GopherStops: _*), lit("|")).otherwise(w)))
    val phraseArr = org.apache.spark.sql.functions.filter(
      org.apache.spark.sql.functions.transform(split(marked, "\\|"),
        p => trim(p)),
      p => p =!= "")
    val phrases = docs.select(col("doc_id"),
      posexplode(phraseArr).as(Seq("pidx", "phrase")))
    val pw = phrases.select(col("doc_id"), col("pidx"), col("phrase"),
      size(split(col("phrase"), " ")).cast("long").as("n_words"),
      explode(split(col("phrase"), " ")).as("w"))
    val ws = pw.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum(col("n_words")).as("deg"))
    val scored = pw.join(ws, "w")
      .groupBy("doc_id", "pidx")
      .agg(first(col("phrase")).as("phrase"),
        first(col("n_words")).as("n_words"),
        sum(round(col("deg").cast("double") / col("freq").cast("double"),
          12).cast(d3812)).as("ps"))
    val agg = scored.groupBy("phrase")
      .agg(first(col("n_words")).as("n_words"),
        count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        max(col("ps")).as("ps"))
    agg.orderBy(col("ps").desc, col("phrase")).limit(RakeTopK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("ps").desc, col("phrase"))).cast("int"))
      .select(col("rnk"), col("phrase"), col("n_words"), col("n_occ"),
        col("n_docs"),
        round(col("ps").cast("double"), 6).as("score"))
  }

  /** DuckDB oracle for [[rakeKeywords]] — identical stopword-run
    * phrase derivation, exact integer deg/freq, round-12 word-score
    * grid, exact-decimal phrase ranking. */
  def t40OracleSql: String = {
    val stops = GopherStops.map(s => s"'$s'").mkString(", ")
    s"""
      WITH raw AS (
        SELECT doc_id, string_split(array_to_string(list_transform(
          string_split(text, ' '),
          w -> CASE WHEN w IN ($stops) THEN '|' ELSE w END), ' '), '|')
          AS pl
        FROM documents),
      phrases AS MATERIALIZED (
        SELECT doc_id, s['pidx'] AS pidx, s['phrase'] AS phrase
        FROM (
          SELECT doc_id, unnest(list_transform(
            generate_series(1, len(pl)),
            i -> struct_pack(pidx := i, phrase := trim(pl[i])))) AS s
          FROM raw)
        WHERE s['phrase'] <> ''),
      pw AS MATERIALIZED (
        SELECT doc_id, pidx, phrase,
          CAST(len(string_split(phrase, ' ')) AS BIGINT) AS n_words,
          unnest(string_split(phrase, ' ')) AS w
        FROM phrases),
      ws AS (
        SELECT w, count(*) AS freq, sum(n_words) AS deg
        FROM pw GROUP BY 1),
      scored AS (
        SELECT doc_id, pidx, any_value(phrase) AS phrase,
          any_value(n_words) AS n_words,
          sum(CAST(round(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE), 12)
            AS DECIMAL(38,12))) AS ps
        FROM pw JOIN ws USING (w)
        GROUP BY doc_id, pidx),
      agg AS (
        SELECT phrase, any_value(n_words) AS n_words,
          count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs,
          max(ps) AS ps
        FROM scored GROUP BY 1)
      SELECT CAST(row_number() OVER (ORDER BY ps DESC, phrase) AS INT)
          AS rnk,
        phrase, n_words, n_occ, n_docs,
        round(CAST(ps AS DOUBLE), 6) AS score
      FROM agg ORDER BY rnk LIMIT $RakeTopK"""
  }

  /** t42: JENSEN–SHANNON DIVERGENCE between source unigram
    * distributions (Lin 1991) — the corpus-mixing diagnostic beside
    * t28's entropy and d10's shingle overlap: "how far apart are two
    * sources' vocabularies as DISTRIBUTIONS" (symmetric, bounded by
    * ln 2, defined even with disjoint support — the three properties
    * per-direction KL lacks), the number a mixture designer reads
    * before t23 reweights sources. One identity keeps absent terms
    * out of the plan entirely: a term present in only one source
    * contributes ½·p·ln 2, so the one-sided tail is
    * ½·ln 2·((1 − Σp_shared) + (1 − Σq_shared)) — an ANALYTIC
    * function of the shared-term mass, never an outer join.
    *
    * Determinism: shared-term contributions fold in term order
    * (t17's sort_array discipline — ln agreement is the adjudicated
    * t14/t17 class); the tail is one mirrored double expression;
    * outputs roundz-6 (jsd and the ln 2-normalized [0, 1] form).
    *
    * Scale shape: one fact-scale token aggregate; the (source, term)
    * frame is vocab × sources; the shared-term pair join fans out
    * ≤ sources² per term; pair universe = dim² cross. */
  def t42JsDivergence(spark: SparkSession, dir: String): DataFrame =
    jsDivergence(Tables.parallel(Tables.load(spark, dir, "documents")))

  def jsDivergence(docs: DataFrame): DataFrame = {
    val ts = graft.Ckpt(docs
      .select(col("source"), explode(words(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("cnt")))
    val tot = ts.groupBy("source").agg(sum(col("cnt")).as("tot"))
    val p = ts.join(tot, "source")
      .select(col("source"), col("term"),
        (col("cnt").cast("double") / col("tot").cast("double")).as("p"))
    val shared = p.as("a")
      .join(p.select(col("source").as("sb"), col("term"),
        col("p").as("q")).as("b"), "term")
      .filter(col("source") < col("sb"))
      .withColumn("m", (col("p") + col("q")) / lit(2.0))
      .withColumn("c", lit(0.5) * (col("p") * log(col("p") / col("m"))
        + col("q") * log(col("q") / col("m"))))
    val agg = shared
      .groupBy(col("source").as("source_a"), col("sb").as("source_b"))
      .agg(sort_array(collect_list(struct(col("term"), col("c"),
          col("p"), col("q")))).as("cs"),
        count(lit(1)).as("n_shared"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        aggregate(col("cs"), lit(0.0),
          (acc, x) => acc + x.getField("c")).as("csum"),
        aggregate(col("cs"), lit(0.0),
          (acc, x) => acc + x.getField("p")).as("psum"),
        aggregate(col("cs"), lit(0.0),
          (acc, x) => acc + x.getField("q")).as("qsum"))
    val pairs = tot.select(col("source").as("source_a"))
      .crossJoin(tot.select(col("source").as("source_b")))
      .filter(col("source_a") < col("source_b"))
    val raw = coalesce(col("csum"), lit(0.0)) +
      lit(0.5) * log(lit(2.0)) *
        ((lit(1.0) - coalesce(col("psum"), lit(0.0))) +
          (lit(1.0) - coalesce(col("qsum"), lit(0.0))))
    pairs.join(agg, Seq("source_a", "source_b"), "left_outer")
      .select(col("source_a"), col("source_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        graft.GraftFunctions.roundz(raw, 6).as("jsd"),
        graft.GraftFunctions.roundz(raw / log(lit(2.0)), 6).as("jsd_norm"))
      .orderBy("source_a", "source_b")
  }

  /** DuckDB oracle for [[jsDivergence]] — identical term-ordered
    * shared fold, identical analytic one-sided tail. */
  def t42OracleSql: String = """
      WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS term
        FROM documents),
      ts AS MATERIALIZED (
        SELECT source, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
      tot AS (SELECT source, sum(cnt) AS tot FROM ts GROUP BY 1),
      p AS (
        SELECT ts.source, term,
          CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE) AS p
        FROM ts JOIN tot ON ts.source = tot.source),
      shared AS (
        SELECT a.source AS source_a, b.source AS source_b, a.term,
          a.p AS p, b.p AS q,
          0.5 * (a.p * ln(a.p / ((a.p + b.p) / 2.0))
            + b.p * ln(b.p / ((a.p + b.p) / 2.0))) AS c
        FROM p a JOIN p b ON a.term = b.term AND a.source < b.source),
      agg AS (
        SELECT source_a, source_b, count(*) AS n_shared,
          list_transform(list_sort(list(struct_pack(term := term, c := c,
            p := p, q := q))), x -> x['c']) AS cl,
          list_transform(list_sort(list(struct_pack(term := term, c := c,
            p := p, q := q))), x -> x['p']) AS pl,
          list_transform(list_sort(list(struct_pack(term := term, c := c,
            p := p, q := q))), x -> x['q']) AS ql
        FROM shared GROUP BY 1, 2),
      folded AS (
        SELECT source_a, source_b, n_shared,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE), cl),
            (acc, x) -> acc + x) AS csum,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE), pl),
            (acc, x) -> acc + x) AS psum,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ql),
            (acc, x) -> acc + x) AS qsum
        FROM agg),
      prs AS (
        SELECT a.source AS source_a, b.source AS source_b
        FROM tot a, tot b WHERE a.source < b.source)
      SELECT prs.source_a, prs.source_b,
        coalesce(n_shared, 0) AS n_shared,
        (round(coalesce(csum, 0.0) + 0.5 * ln(2.0)
          * ((1.0 - coalesce(psum, 0.0)) + (1.0 - coalesce(qsum, 0.0))),
          6) + 0.0) AS jsd,
        (round((coalesce(csum, 0.0) + 0.5 * ln(2.0)
          * ((1.0 - coalesce(psum, 0.0)) + (1.0 - coalesce(qsum, 0.0))))
          / ln(2.0), 6) + 0.0) AS jsd_norm
      FROM prs LEFT JOIN folded
        ON folded.source_a = prs.source_a
        AND folded.source_b = prs.source_b
      ORDER BY prs.source_a, prs.source_b"""

  // ── t43: compression-ratio quality signal (spec-gated by nature) ──

  /** Deflate level of [[t43CompressionSignal]], fixed explicitly (the
    * zlib default) so the ratio is a pure deterministic function of
    * the text bytes — the level is part of the operator's contract,
    * never the JVM default's. */
  final val T43Level = 6

  /** Bucket ceiling: deflate's container overhead can push a tiny or
    * incompressible doc's ratio past 1.0, so the decile bucket is
    * capped — everything at or past ratio 1.0 is equally "keep" from
    * a compression-quality standpoint. */
  final val T43BucketCap = 10L

  case class CompressionRow(doc_id: Long, source: String, text_len: Long,
    deflate_len: Long, ratio: Double, bucket: Long)

  /** Deflated byte length at the fixed [[T43Level]] — the ONE
    * function both the Spark operator and the spec's JVM replica
    * call (zlib RFC 1950/1951 via `java.util.zip.Deflater`, default
    * strategy, zlib wrapper). Deterministic: the output depends only
    * on the input bytes and these fixed settings. */
  def deflateLen(bytes: Array[Byte],
      d: java.util.zip.Deflater = null): Long = {
    val defl = if (d != null) d else new java.util.zip.Deflater(T43Level)
    try {
      defl.reset()
      defl.setInput(bytes)
      defl.finish()
      val buf = new Array[Byte](8192)
      var n = 0L
      while (!defl.finished()) n += defl.deflate(buf)
      n
    } finally if (d == null) defl.end()
  }

  /** t43: per-document COMPRESSION-RATIO quality signal — the
    * Gopher-class repetitiveness filter (Rae et al. 2021 use exactly
    * this family of redundancy signals) that t6's window repetition
    * and d16's duplicate-n-gram rate approximate lexically: deflate
    * the UTF-8 text at the fixed [[T43Level]] and report
    * deflate_len / text_len. Near 0 = pathologically repetitive
    * (template spam, keyword stuffing); near 1 = incompressible
    * (hash soup, minified blobs, base64); natural prose sits in a
    * recognizable middle band — both tails are what a training-data
    * quality gate drops. `bucket` = the exact integer decile
    * min(deflate_len·10 div text_len, [[T43BucketCap]]) — no float
    * enters the bucketing. Empty/null texts are excluded (no bytes,
    * no ratio).
    *
    * Spec-gated by nature (r17 verdict authorization): DuckDB has no
    * deflate, so there is no SQL oracle; the gate is an exact JVM
    * replica (same [[deflateLen]], same arithmetic, bitwise equality
    * on the corpus) plus planted compressible/incompressible
    * fixtures in TextOpsSpec.
    *
    * Determinism: Deflater output is a pure function of (bytes,
    * level, strategy) — all fixed; ratio/bucket are per-row scalars.
    * Scale shape: ONE mapPartitions pass over the documents scan (the
    * sanctioned per-row-binary class — deflate, like WAV decode, has
    * no Catalyst expression), one Deflater reused per partition,
    * embarrassingly parallel, zero shuffles beyond the output sort;
    * the signal row is 5 scalars per doc regardless of text size. */
  def t43CompressionSignal(docs0: DataFrame): DataFrame = {
    val spark = docs0.sparkSession
    import spark.implicits._
    docs0
      .select(col("doc_id"), col("source"), col("text"))
      .where(col("text").isNotNull && length(col("text")) > 0)
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val d = new java.util.zip.Deflater(T43Level)
        // materialize the partition's (small, 5-scalar) rows so the
        // shared Deflater can be released eagerly — the lazy-iterator
        // alternative leaks native zlib memory until GC
        val rows = it.map { case (id, src, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val dl = deflateLen(bytes, d)
          val len = bytes.length.toLong
          CompressionRow(id, src, len, dl, dl.toDouble / len,
            math.min(dl * 10L / len, T43BucketCap))
        }.toVector
        d.end()
        rows.iterator
      }
      .toDF()
      .withColumn("ratio", GraftFunctions.roundz(col("ratio"), 6))
      .orderBy("doc_id")
  }

  /** t43's per-source report: decile-bucket census + the bucket's
    * aggregate ratio as EXACT integer byte sums (Σ deflate_len /
    * Σ text_len — order-free longs, one division at the end; a
    * float `avg` over per-doc ratios would be shuffle-order-
    * sensitive AND weight a 10-byte doc like a 10 KB one). */
  def t43CompressionBuckets(perDoc: DataFrame): DataFrame =
    perDoc.groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("text_len")).as("sum_text"),
        sum(col("deflate_len")).as("sum_deflate"))
      .select(col("source"), col("bucket"), col("n_docs"),
        GraftFunctions.roundz(
          col("sum_deflate").cast("double") / col("sum_text").cast("double"),
          6).as("bucket_ratio"))
      .orderBy("source", "bucket")

  /** t44: YULE'S CHARACTERISTIC K per source (Yule 1944; Tweedie &
    * Baayen 1998) — the classic SIZE-INVARIANT lexical-repetitiveness
    * constant: K = 10⁴·(Σ_m m²V_m − N)/N² over the frequency-of-
    * frequency spectrum (V_m = types seen m times, N = tokens). Raw
    * type/token ratios (t3) shrink mechanically as a source grows —
    * K does not (it estimates 10⁴× the probability two random tokens
    * are the same type, bias-corrected), so it is the repetitiveness
    * dial that stays comparable across sources of wildly different
    * volume: boilerplate-heavy crawl slices score high, diverse prose
    * low, beside t6's within-doc repetition and t41's MTLD. All-
    * singleton text lands at exactly 0; a one-type source approaches
    * the 10⁴ ceiling.
    *
    * Determinism: Σ_m m²V_m = Σ_types c² and N are exact integer
    * aggregates off t35's (source, type, count) frame; K is ONE
    * double expression phrased identically in both engines, rounded
    * once.
    *
    * Scale shape: one corpus-scale explode + map-side-combined count
    * (t10's class), one source-keyed integer rollup; output is one
    * row per source. */
  def yuleK(spark: SparkSession, dir: String): DataFrame =
    yuleK(Tables.parallel(Tables.load(spark, dir, "documents")))

  /** [[yuleK]]'s core over a (source, text) documents frame — split
    * out for planted specs. */
  def yuleK(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    tf.groupBy("source")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("m2"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        round(lit(10000.0) * (col("m2") - col("n_tokens")).cast("double")
          / (col("n_tokens").cast("double")
            * col("n_tokens").cast("double")), 6).as("yule_k"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[yuleK]] — identical token multiset, square
    * census, and single rounded expression. */
  def t44OracleSql: String = """
      WITH tf AS (
        SELECT source, w, count(*) AS c
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY 1, 2),
      agg AS (
        SELECT source, sum(c) AS n_tokens, count(*) AS n_types,
          sum(c * c) AS m2
        FROM tf GROUP BY 1)
      SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(n_types AS BIGINT) AS n_types,
        round(10000.0 * CAST(m2 - n_tokens AS DOUBLE)
          / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6)
          AS yule_k
      FROM agg ORDER BY source"""

  /** Terms the burstiness panel reports — t10's top-k discipline. */
  final val BurstTopK = 50

  /** t45: TERM BURSTINESS / ADAPTATION (Church & Gale 1995 Poisson
    * mixtures; Church 2000 "Empirical estimates of adaptation") — the
    * anti-IDF insight: content words do not arrive Poisson — seeing a
    * term once makes a SECOND occurrence in the same document far
    * likelier than its corpus rate predicts. Per top-[[BurstTopK]]
    * term (by collection frequency, term tie-break): Katz's
    * burstiness B = cf/df (mean occurrences per containing doc),
    * adaptation = P(≥2 | ≥1) = df2/df, and the prior P(≥1) = df/D it
    * must beat — adaptation ≫ prior is the content-word signature,
    * adaptation ≈ prior the function-word one. The dial that
    * separates "frequent because it is everywhere" (stopwords, t1's
    * profiles) from "frequent because it CLUMPS" (topical terms) —
    * what a keyword extractor (t40) or quality filter reads beside
    * raw tf-idf (t14).
    *
    * Determinism: cf/df/df2/D are exact integer censuses; each output
    * is ONE rounded double division phrased identically in both
    * engines; the top-k cut is a total order (cf desc, term asc).
    *
    * Scale shape: one corpus-scale explode to (term, doc) counts
    * (map-side combine — t10's class), one term-keyed rollup, a
    * one-row doc-count broadcast, and a TakeOrdered top-k. Nothing
    * quadratic. */
  def burstiness(spark: SparkSession, dir: String): DataFrame =
    burstiness(Tables.parallel(Tables.load(spark, dir, "documents")))

  /** [[burstiness]]'s core over a (doc_id, text) documents frame —
    * split out for planted specs. */
  def burstiness(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("w", "doc_id").agg(count(lit(1)).as("c"))
    val terms = tf.groupBy("w").agg(
      sum(col("c")).as("cf"),
      count(lit(1)).as("df"),
      sum(when(col("c") >= 2, 1L).otherwise(0L)).as("df2"))
    val nd = docs.agg(count(lit(1)).as("d"))
    terms.crossJoin(broadcast(nd))
      .select(col("w"), col("cf"), col("df"), col("df2"),
        round(col("cf").cast("double") / col("df").cast("double"), 6)
          .as("burstiness"),
        round(col("df2").cast("double") / col("df").cast("double"), 6)
          .as("adaptation"),
        round(col("df").cast("double") / col("d").cast("double"), 6)
          .as("prior"))
      .orderBy(col("cf").desc, col("w"))
      .limit(BurstTopK)
  }

  /** DuckDB oracle for [[burstiness]] — identical censuses, rounded
    * divisions, and top-k total order. */
  def t45OracleSql: String = s"""
      WITH tf AS (
        SELECT w, doc_id, count(*) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY 1, 2),
      terms AS (
        SELECT w, sum(c) AS cf, count(*) AS df,
          sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS df2
        FROM tf GROUP BY 1),
      nd AS (SELECT count(*) AS d FROM documents)
      SELECT w, CAST(cf AS BIGINT) AS cf, CAST(df AS BIGINT) AS df,
        CAST(df2 AS BIGINT) AS df2,
        round(CAST(cf AS DOUBLE) / CAST(df AS DOUBLE), 6) AS burstiness,
        round(CAST(df2 AS DOUBLE) / CAST(df AS DOUBLE), 6) AS adaptation,
        round(CAST(df AS DOUBLE) / CAST(d AS DOUBLE), 6) AS prior
      FROM terms, nd
      ORDER BY cf DESC, w LIMIT $BurstTopK"""

  /** t46: PER-SOURCE DISTRIBUTION DRIFT — the two-sample
    * Kolmogorov–Smirnov distance (Kolmogorov 1933; Smirnov 1939)
    * between each source's document-length distribution and the REST
    * of the corpus, with the length at which the ECDFs diverge most:
    * the outlier-source detector a mixture pipeline runs per ingest
    * snapshot BEFORE the expensive signals (a crawler that started
    * truncating, a source that switched extractors, a feed gone
    * boilerplate shifts its length ECDF long before t2/t22 quality
    * scores move). Leave-one-out (source vs rest), so one bad source
    * cannot hide inside the corpus ECDF it dominates.
    *
    * Exactness: D = max_v |c_s(v)/n_s − c_r(v)/n_r| is evaluated as
    * the EXACT integer |c_s·n_r − c_r·n_s| (DECIMAL(38,0) — the cross
    * product overflows BIGINT at ~10¹⁰-doc corpus scale), the argmax
    * taken on the (num DESC, v ASC) total order, and the single
    * division to ks_stat happens once, NULL-guarded for the
    * single-source corpus where no "rest" exists (ANSI Divide throws
    * on /0 even for DOUBLE).
    *
    * Scale shape: one fact-scale (source, length) count aggregate
    * (map-side combine); the evaluation grid is sources × distinct
    * lengths (both aggregate-bounded; a 100 TB corpus quantizes raw
    * byte lengths to a fixed grid first — the operator reads any
    * integer length column); cumsums ride per-source windows, the
    * corpus cumsum a single-partition window over distinct lengths
    * (e36's col*0 contract — block-prefix offsets at scale); one-row
    * total broadcast; dim-bounded output. */
  def t46KsDrift(spark: SparkSession, dir: String): DataFrame =
    ksDriftFromLengths(Tables.parallel(Tables.load(spark, dir, "documents"))
      .select(col("source"), col("n_chars")))

  /** [[t46KsDrift]]'s core over a (source, n_chars) frame — split out
    * for planted shifted/identical-distribution specs. */
  def ksDriftFromLengths(lens: DataFrame): DataFrame = {
    val d380 = "decimal(38,0)"
    val sv = lens.groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val sources = sv.groupBy("source").agg(sum(col("c")).as("n_s"))
    val values = sv.select(col("v")).distinct()
    val grid = sources.crossJoin(values)
      .join(sv, Seq("source", "v"), "left_outer")
      .na.fill(0L, Seq("c"))
    val wS = Window.partitionBy("source").orderBy("v")
    val cum = grid.withColumn("cs", sum(col("c")).over(wS))
    val wAll = Window.partitionBy(col("v") * 0).orderBy("v")
    val cumT = sv.groupBy("v").agg(sum(col("c")).as("ct"))
      .withColumn("cT", sum(col("ct")).over(wAll))
      .select(col("v"), col("cT"))
    val nn = lens.agg(count(lit(1)).as("nn"))
    val scored = cum.join(cumT, "v").crossJoin(broadcast(nn))
      .withColumn("n_r", col("nn") - col("n_s"))
      .withColumn("num", abs(col("cs").cast(d380) * col("n_r").cast(d380)
        - (col("cT") - col("cs")).cast(d380) * col("n_s").cast(d380)))
    val wPick = Window.partitionBy("source")
      .orderBy(col("num").desc, col("v"))
    scored.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("source"), col("n_s").as("n_docs"),
        col("v").as("at_value"),
        when(col("n_r") > 0, round(col("num").cast("double")
          / (col("n_s").cast("double") * col("n_r").cast("double")), 6))
          .as("ks_stat"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[t46KsDrift]] — identical grid, exact integer
    * cross products (HUGEINT), identical argmax order and guard. */
  def t46OracleSql: String = """
      WITH lens AS (SELECT source, n_chars AS v FROM documents),
      sv AS (SELECT source, v, count(*) AS c FROM lens GROUP BY 1, 2),
      sources AS (SELECT source, sum(c) AS n_s FROM sv GROUP BY 1),
      vals AS (SELECT DISTINCT v FROM sv),
      grid AS (
        SELECT s.source, s.n_s, vals.v, coalesce(sv.c, 0) AS c
        FROM sources s CROSS JOIN vals
        LEFT JOIN sv ON sv.source = s.source AND sv.v = vals.v),
      cum AS (
        SELECT source, n_s, v,
          sum(c) OVER (PARTITION BY source ORDER BY v) AS cs
        FROM grid),
      ct AS (
        SELECT v, sum(cv) OVER (ORDER BY v) AS cT
        FROM (SELECT v, sum(c) AS cv FROM sv GROUP BY 1) t),
      nn AS (SELECT count(*) AS nn FROM lens),
      scored AS (
        SELECT source, n_s, v, nn - n_s AS n_r,
          abs(CAST(cs AS HUGEINT) * CAST(nn - n_s AS HUGEINT)
            - CAST(cT - cs AS HUGEINT) * CAST(n_s AS HUGEINT)) AS num
        FROM cum JOIN ct USING (v), nn),
      picked AS (
        SELECT *, row_number() OVER (PARTITION BY source
          ORDER BY num DESC, v) AS rn
        FROM scored)
      SELECT source, CAST(n_s AS BIGINT) AS n_docs, v AS at_value,
        CASE WHEN n_r > 0 THEN
          round(CAST(num AS DOUBLE)
            / (CAST(n_s AS DOUBLE) * CAST(n_r AS DOUBLE)), 6)
          END AS ks_stat
      FROM picked WHERE rn = 1 ORDER BY source"""

  /** Collocations reported by [[t47Pmi]] and its count floor —
    * Church & Hanks' caveat made structural: PMI explodes on
    * singletons (a typo pair seen once has maximal PMI), so
    * candidates under [[PmiMinCount]] never rank. */
  final val PmiTopK = 20
  final val PmiMinCount = 5L

  /** t47: PMI COLLOCATIONS (Church & Hanks 1989; Bouma 2009 for the
    * NPMI normalization) — the top adjacent-bigram collocations by
    * pointwise mutual information: PMI(a,b) = ln(p(ab)/(p(a)·p(b))),
    * the "these two tokens are a UNIT" detector behind tokenizer
    * merge inspection (t18's BPE picks by raw frequency; PMI is the
    * statistical counterweight — frequent-but-independent pairs score
    * ~0), multi-word-expression mining, and boilerplate phrase
    * discovery. NPMI = PMI/(−ln p(ab)) rescales to [−1, 1] so
    * thresholds transfer across corpus sizes.
    *
    * Determinism: all censuses exact integers; PMI is ONE ln of a
    * ratio of exact-integer ratios, round-9 for the ranking grid
    * (rank order = (pmi DESC, bigram) total order), roundz-6 on
    * output (independent pairs land near 0 from both sides); NPMI's
    * denominator NULL-guarded for the one-distinct-bigram corpus
    * (−ln 1 = 0; ANSI throws on /0).
    *
    * Scale shape: one fact-scale bigram explode + count (map-side
    * combine) and one token count (t20's shapes); the candidate frame
    * is bigram-vocabulary-bounded with the count floor applied BEFORE
    * the joins; global top-k via orderBy+limit (TakeOrderedAndProject
    * — no global sort materialized); two one-row broadcasts. */
  def t47Pmi(spark: SparkSession, dir: String): DataFrame =
    pmiCollocations(Tables.parallel(Tables.load(spark, dir, "documents")))

  def pmiCollocations(docs: DataFrame): DataFrame = {
    val bg = docs.select(explode(expr(
      """transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
         (s, idx) -> concat(s, ' ', element_at(split(text, ' '), idx + 2)))"""))
      .as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cnt"))
    val uni = docs.select(explode(words(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum(col("c")).as("nt"))
    val btot = bg.agg(sum(col("cnt")).as("nb"))
    val scored = bg.filter(col("cnt") >= PmiMinCount)
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(uni.select(col("t").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("t").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(btot))
      .withColumn("pmi", round(log(
        (col("cnt").cast("double") / col("nb").cast("double"))
          / ((col("c1").cast("double") / col("nt").cast("double"))
            * (col("c2").cast("double") / col("nt").cast("double")))), 9))
    val wR = Window.partitionBy(col("cnt") * 0)
      .orderBy(col("pmi").desc, col("bg"))
    scored.orderBy(col("pmi").desc, col("bg")).limit(PmiTopK)
      .withColumn("rnk", row_number().over(wR).cast("long"))
      .select(col("rnk"), col("bg").as("bigram"), col("cnt"),
        col("c1"), col("c2"),
        graft.GraftFunctions.roundz(col("pmi"), 6).as("pmi"),
        when(col("cnt") < col("nb"), graft.GraftFunctions.roundz(
          col("pmi") / -log(col("cnt").cast("double")
            / col("nb").cast("double")), 6)).as("npmi"))
      .orderBy("rnk")
  }

  /** DuckDB oracle for [[pmiCollocations]] — t20's bigram CTEs, the
    * identical round-9 ranking grid and guarded NPMI. */
  def t47OracleSql: String = s"""
      WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      bgx AS (
        SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
          i -> ws[i] || ' ' || ws[i + 1])) AS bg
        FROM w),
      bg AS (SELECT bg, count(*) AS cnt FROM bgx GROUP BY 1),
      uni AS (SELECT t, count(*) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        GROUP BY 1),
      tot AS (SELECT sum(c) AS nt FROM uni),
      btot AS (SELECT sum(cnt) AS nb FROM bg),
      scored AS (
        SELECT bg.bg, cnt, u1.c AS c1, u2.c AS c2, nt, nb,
          round(ln((CAST(cnt AS DOUBLE) / CAST(nb AS DOUBLE))
            / ((CAST(u1.c AS DOUBLE) / CAST(nt AS DOUBLE))
              * (CAST(u2.c AS DOUBLE) / CAST(nt AS DOUBLE)))), 9) AS pmi
        FROM bg
        JOIN uni u1 ON u1.t = string_split(bg.bg, ' ')[1]
        JOIN uni u2 ON u2.t = string_split(bg.bg, ' ')[-1],
        tot, btot
        WHERE cnt >= $PmiMinCount),
      ranked AS (
        SELECT *, CAST(row_number() OVER (ORDER BY pmi DESC, bg)
          AS BIGINT) AS rnk
        FROM scored)
      SELECT rnk, bg AS bigram, cnt, c1, c2,
        (round(pmi, 6) + 0.0) AS pmi,
        CASE WHEN cnt < nb THEN
          (round(pmi / -ln(CAST(cnt AS DOUBLE) / CAST(nb AS DOUBLE)), 6)
            + 0.0) END AS npmi
      FROM ranked WHERE rnk <= $PmiTopK ORDER BY rnk"""
}
