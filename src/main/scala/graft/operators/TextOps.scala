package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  def qualityScore(docs: DataFrame): DataFrame = {
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
      .orderBy("doc_id")
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

  def fingerprint(docs: DataFrame): DataFrame = {
    docs.select(col("doc_id"),
        expr("""aggregate(
                  transform(split(text, ' '), w -> CAST(length(w)*131 + ascii(w) AS BIGINT)),
                  CAST(0 AS BIGINT),
                  (acc, c) -> (acc * 1000003 + c) % 2147483647)""").as("fp"))
      .orderBy("doc_id")
  }

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
    fingerprint(docs)
      .join(docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens")),
        Seq("doc_id"))
      .withColumn("shard", pmod(col("fp"), lit(nShards.toLong)))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .orderBy("shard")
}
