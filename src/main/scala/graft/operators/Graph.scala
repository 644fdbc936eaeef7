package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph processing over a deterministic document link
  * graph — the citation/hyperlink analysis a training-data pipeline
  * runs to weight sources (domain authority) before mixing.
  *
  * The corpus carries no explicit link column, so the graph is DERIVED
  * deterministically: each doc emits [[OutDeg]] out-links whose targets
  * come from the repo's Knuth-multiplicative hash of (doc_id, j) —
  * bit-identical in the DuckDB oracle, so the whole iteration is
  * oracle-checked end to end, not just smoke-tested.
  *
  * Scale design (the standard distributed PageRank shape):
  *   - edges are computed once, hash-partitioned by `src`, and pinned
  *     (MEMORY_AND_DISK, spill-safe) — partitioning survives so each
  *     iteration's rank join is co-located on `src`;
  *   - per iteration exactly ONE corpus-scale shuffle: the `dst`
  *     aggregation (the rank frame arrives partitioned by the previous
  *     step's groupBy key);
  *   - rank lineage is truncated every [[CkptEvery]] steps (the PCoA
  *     cadence) so the plan does not grow linearly with iterations;
  *   - no collect(): N is one count() action (GraphX does the same),
  *     and the per-node fold is bounded by in-degree.
  *
  * Bit-exact determinism: contributions are folded per dst in
  * (src, j) index order from the SAME initial value, so engine and
  * oracle execute the identical IEEE-754 op sequence (the repo's
  * index-order-fold discipline); the oracle keeps the rank vector as
  * one list-valued row and recurses (the q31 pattern).
  */
object Graph {

  val Damping = 0.85
  val Iters = 10
  val OutDeg = 3
  val CkptEvery = 3

  def g1Pagerank(spark: SparkSession, dir: String,
                 iters: Int = Iters): DataFrame =
    g1Pagerank(Tables.load(spark, dir, "documents"), iters)

  def g1Pagerank(docs0: DataFrame, iters: Int): DataFrame = {
    val docs = docs0.select(col("doc_id")).persist(StorageLevel.MEMORY_AND_DISK)
    // the hash-derived dst lands in [0, N) — valid only if doc_ids are
    // dense 0..N-1 (true for this corpus; one cheap aggregate guards it)
    val h = docs.agg(count(lit(1)), min(col("doc_id")), max(col("doc_id"))).head()
    val n = h.getLong(0)
    require(h.getLong(1) == 0L && h.getLong(2) == n - 1,
      s"g1 needs dense doc_ids 0..N-1, got [${h.get(1)}, ${h.get(2)}] of $n")
    val base = 0.15 / n // fl(0.15)/N — same literal-then-divide both engines
    val edges = docs
      .select(col("doc_id").as("src"),
        explode(expr(s"sequence(1, $OutDeg)")).as("j"))
      .withColumn("dst0", pmod(
        pmod(col("src") * 7 + col("j"), lit(1000000000L)) * lit(2654435761L),
        lit(2147483647L)) % n)
      .withColumn("dst", when(col("dst0") === col("src"),
        pmod(col("dst0") + 1, lit(n))).otherwise(col("dst0")))
      .select(col("src"), col("j"), col("dst"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // (src = -1) sentinel rows keep zero-in-degree nodes in the
    // aggregate (acc + 0.0 is a bit-exact no-op) — no per-step spine
    // join needed, and n_in falls out as size(cs) - 1
    val sentinel = docs.select(lit(-1L).as("src"), lit(0L).as("j"),
      col("doc_id").as("dst"), lit(0.0).as("c"))

    var ranks = docs.select(col("doc_id").as("v"),
      lit(1.0 / n).as("r"))
    for (t <- 1 to iters) {
      val contribs = edges
        .join(ranks, col("src") === col("v"))
        .select(col("src"), col("j"), col("dst"),
          (lit(Damping) * (col("r") / lit(OutDeg.toDouble))).as("c"))
        .unionByName(sentinel)
      val next = contribs
        .groupBy(col("dst"))
        .agg(sort_array(collect_list(struct(col("src"), col("j"), col("c"))))
          .as("cs"))
        .select(col("dst").as("v"),
          aggregate(col("cs"), lit(base),
            (acc, x) => acc + x.getField("c")).as("r"),
          (size(col("cs")) - 1).cast("long").as("n_in"))
      ranks = if (t % CkptEvery == 0 && t < iters) graft.Ckpt(next) else next
    }
    val out = ranks
      .select(col("v").as("doc_id"), round(col("r"), 6).as("pagerank"),
        col("n_in"))
      .orderBy("doc_id")
    out
  }

  /** DuckDB oracle for [[g1Pagerank]] — identical edge hash, identical
    * (src, j)-ordered fold from the identical base; the rank vector
    * recurses as one list-valued row (q31's single-row pattern), with
    * the static CTEs MATERIALIZED so the recursion doesn't re-derive
    * them each step. */
  def g1OracleSql(iters: Int = Iters): String = s"""
      WITH RECURSIVE nn AS MATERIALIZED (
        SELECT count(*) AS n, CAST(count(*) AS INT) AS ni FROM documents),
      edges AS MATERIALIZED (
        SELECT src, j,
          CASE WHEN dst0 = src THEN (dst0 + 1) % n ELSE dst0 END AS dst
        FROM (
          SELECT doc_id AS src, j,
            (((doc_id * 7 + j) % 1000000000) * 2654435761)
              % 2147483647 % n AS dst0, n
          FROM documents, nn, generate_series(1, $OutDeg) t(j)) e),
      inb AS MATERIALIZED (
        SELECT d.doc_id AS dst,
          coalesce(i.ins, CAST([] AS STRUCT(src BIGINT, j BIGINT)[])) AS ins
        FROM documents d
        LEFT JOIN (
          SELECT dst, list_sort(list(struct_pack(src := src, j := j))) AS ins
          FROM edges GROUP BY dst) i ON i.dst = d.doc_id),
      inm AS MATERIALIZED (
        SELECT list_transform(
          list_sort(list(struct_pack(dst := dst, ins := ins))),
          s -> s['ins']) AS m
        FROM inb),
      pr AS (
        SELECT 0 AS k,
          list_transform(generate_series(1, ni),
            i -> CAST(1.0 AS DOUBLE) / n) AS r
        FROM nn
        UNION ALL
        SELECT k + 1,
          list_transform(generate_series(1, ni), v ->
            list_reduce(
              list_prepend(CAST(0.15 AS DOUBLE) / n,
                list_transform(inm.m[v], e ->
                  CAST($Damping AS DOUBLE)
                    * (pr.r[CAST(e['src'] AS INT) + 1]
                       / CAST($OutDeg AS DOUBLE)))),
              (acc, x) -> acc + x))
        FROM pr, nn, inm WHERE k < $iters)
      SELECT i - 1 AS doc_id, round(f.r[i], 6) AS pagerank,
        CAST(len(inm.m[i]) AS BIGINT) AS n_in
      FROM (SELECT r FROM pr WHERE k = $iters) f,
        inm, (SELECT unnest(generate_series(1, ni)) AS i FROM nn) t
      ORDER BY doc_id"""
}
