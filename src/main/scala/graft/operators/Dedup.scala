package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: signature computation (minhash/simhash/shingles) is a
  * per-row projection; candidate generation is always an equi-join on
  * small band keys (explode bands → shuffle on band key → group), so
  * work scales with true-duplicate density, never O(n²). No collect(),
  * no cross joins.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on the full text, keep-first policy.
    * At 100 TB this is one shuffle on a 128-bit digest. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("kept_doc_id"),
        count(lit(1)).as("n_copies"))
      .orderBy("kept_doc_id")

  /** Word-level shingles (3-grams) of a text column. */
  private def shingles(text: Column, n: Int = 3): Column = {
    val w = split(text, " ")
    array_distinct(transform(
      sequence(lit(1), greatest(size(w) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(w, i, lit(n)))))
  }

  private val HashPrime = 2147483647L // 2^31 - 1

  /** 64-permutation MinHash signature via universal hashing of
    * xxhash64(shingle) folded to 31 bits: h_j(x) = (a_j*x + b_j) mod p
    * with a_j ≤ 127, so products stay < 2^38 (no ANSI overflow). */
  private def minhashSignature(text: Column, k: Int = 64): Column =
    transform(sequence(lit(0), lit(k - 1)), j =>
      array_min(transform(shingles(text), s =>
        pmod(pmod(xxhash64(s), lit(HashPrime)) * (j * 2 + 1) + j * 12345 + 7,
          lit(HashPrime)))))

  /** MinHash + LSH banding: 16 bands × 4 rows. Emits one row per doc
    * with its signature head and the number of near-dup candidates
    * found through band-bucket joins (the dedup decision table). */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), minhashSignature(col("text")).as("sig"))
    val bands = docs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(15)), b =>
          xxhash64(slice(col("sig"), b * lit(4) + lit(1), lit(4))))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_key")
    val candidates = bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val candCount = candidates.select(col("a_id").as("doc_id"))
      .union(candidates.select(col("b_id").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_candidates"))
    docs.join(candCount, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        element_at(col("sig"), 1).as("mh0"),
        element_at(col("sig"), 2).as("mh1"),
        coalesce(col("n_candidates"), lit(0L)).as("n_dup_candidates"))
      .orderBy("doc_id")
  }

  /** 64-bit SimHash from word-level xxhash64; near-dups found by
    * 4×16-bit band join + popcount(xor) ≤ 8 verification. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val sh = docs.select(col("doc_id"),
      expr("""aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, i) ->
                acc + CASE WHEN aggregate(split(text, ' '), CAST(0 AS BIGINT),
                  (s, w) -> s + CASE WHEN (shiftright(xxhash64(w), i) & 1) = 1
                                 THEN 1 ELSE -1 END) >= 0
                      THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END)""")
        .as("simhash"))
    val bandStructs = (0 until 4).map(b =>
      struct(lit(b).as("band_idx"),
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("band_key")))
    val bands = sh.select(col("doc_id"), col("simhash"),
        explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("simhash"),
        col("b.band_idx").as("band_idx"), col("b.band_key").as("band_key"))
    val near = bands.as("x").join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.simhash").as("sa"), col("y.simhash").as("sb"))
      .distinct()
      .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 8)
    val nearCount = near.select(col("a_id").as("doc_id"))
      .union(near.select(col("b_id").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    sh.join(nearCount, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("simhash"),
        coalesce(col("n"), lit(0L)).as("n_near"))
      .orderBy("doc_id")
  }

  /** Character-trigram Jaccard similarity over sorted-neighbor pairs
    * (doc_id, doc_id+1) — the verification metric applied to candidate
    * pairs (here a deterministic linear pairing so the oracle can
    * reproduce it). */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val tri = Tables.load(spark, dir, "documents").select(col("doc_id"),
      expr("array_distinct(transform(sequence(1, length(text)-2), i -> substring(text, i, 3)))")
        .as("tg"))
    val a = tri.select(col("doc_id").as("a_id"), col("tg").as("ta"))
    val b = tri.select(col("doc_id").as("b_id"), col("tg").as("tb"))
    a.join(b, col("b_id") === col("a_id") + 1)
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("n_inter"),
        (size(col("ta")) + size(col("tb")) -
          size(array_intersect(col("ta"), col("tb")))).cast("long").as("n_union"))
      .withColumn("jaccard",
        round(col("n_inter").cast("double") / col("n_union").cast("double"), 6))
      .orderBy("a_id")
  }

  /** Blast-like sequence search (bpaotu's BLAST endpoint re-expressed):
    * rank all documents by character-trigram Jaccard against a fixed
    * query string. The query's trigram set is a literal (broadcast by
    * constant folding); scoring is a per-row projection over one scan,
    * then a global top-k. */
  def sequenceSearch(spark: SparkSession, dir: String,
      query: String = "the fast key order sort table scan merge"): DataFrame = {
    val qGrams = (1 to query.length - 2).map(i => query.substring(i - 1, i + 2)).distinct
    val qLit = array(qGrams.map(lit): _*)
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        expr("array_distinct(transform(sequence(1, length(text)-2), i -> substring(text, i, 3)))")
          .as("tg"))
      .select(col("doc_id"),
        size(array_intersect(col("tg"), qLit)).cast("long").as("n_inter"),
        (size(col("tg")) + lit(qGrams.size) -
          size(array_intersect(col("tg"), qLit))).cast("long").as("n_union"))
      .withColumn("score",
        round(col("n_inter").cast("double") / col("n_union").cast("double"), 6))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  /** Embedding-cosine near-duplicate detection over sorted-neighbor
    * pairs; cosine folded sequentially in double precision so the
    * oracle's index-ordered sum matches bit-for-bit. */
  def embedNeardup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    a.join(b, col("b_id") === col("a_id") + 1)
      .select(col("a_id"), col("b_id"),
        round(graft.GraftFunctions.cosineSim(spark, col("ea"), col("eb")), 6)
          .as("cos_sim"))
      .withColumn("is_near", col("cos_sim") > 0.95)
      .orderBy("a_id")
  }
}
