package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordination over the sample-dissimilarity matrix — the analysis the
  * reference's comparison layer feeds into its sample-plot views:
  * classical PCoA (metric MDS) reduced to its first principal axis.
  *
  * Numerical design: eigensolvers are library- and order-dependent, so
  * this uses FIXED-COUNT POWER ITERATION over the double-centered Gram
  * matrix where every reduction is a SEQUENTIAL index-order fold over
  * arrays — the same deterministic-fold discipline as the cosine /
  * SRP oracles — making all 20 iterations bit-reproducible in a DuckDB
  * recursive CTE (full oracle, no rows-only concession).
  *
  * Scale shape: the only fact-scale work is the abundance aggregation
  * inside [[Relational.q30BrayCurtis]]. Everything after runs on the
  * aggregate-bounded sample×sample matrix, carried as ONE row of
  * array<array<double>> (samples are a dimension: 25 here, thousands
  * at most — megabytes, not fact-scale). Each power-iteration step is
  * a tiny checkpointed job; lineage is truncated per step
  * ([[graft.Ckpt]]) exactly like d7's label-propagation loop.
  */
object Ordination {

  /** Fold helpers mirrored 1:1 by the oracle's list_reduce calls. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)
  private def foldMaxAbs(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => greatest(acc, abs(x)))

  def q31Pcoa(spark: SparkSession, dir: String, iters: Int = 20): DataFrame =
    pcoa(Relational.q30BrayCurtis(spark, dir), iters)

  /** Single-row PCoA over any pairwise-dissimilarity frame
    * (sample_a, sample_b, bray_curtis — upper triangle). */
  def pcoa(bc0: DataFrame, iters: Int = 20): DataFrame = {
    // checkpointed: the symmetric-matrix assembly references the pair
    // frame four ways; materializing the bounded 300-row result keeps
    // the fact-scale aggregation inside q30 from re-running per branch
    val bc = graft.Ckpt(bc0)
    // symmetric D² matrix rows, canonically ordered by sample name both
    // ways (sort_array on (name, value) structs pins fold order)
    // endpoint set in one pass (a two-branch union reads bc twice)
    val names = bc.select(explode(array(col("sample_a"), col("sample_b")))
      .as("si")).distinct()
    val sym = bc.select(col("sample_a").as("si"), col("sample_b").as("sj"),
        (col("bray_curtis") * col("bray_curtis")).as("d2"))
      .union(bc.select(col("sample_b"), col("sample_a"),
        (col("bray_curtis") * col("bray_curtis"))))
      .union(names.select(col("si"), col("si").as("sj"), lit(0.0).as("d2")))
    val rows = sym.groupBy("si")
      .agg(transform(sort_array(collect_list(struct(col("sj"), col("d2")))),
        s => s("d2")).as("row"))
    // the whole matrix as one array<array<double>> row + the sample
    // list that indexes it
    val mat = rows
      .agg(transform(sort_array(collect_list(struct(col("si"), col("row")))),
        s => s("row")).as("d2m"),
        sort_array(collect_list(col("si"))).as("samples"))
      .select(col("d2m"), col("samples"), size(col("samples")).as("n"))
      // ordination needs ≥2 samples; on a degenerate corpus the global
      // agg still emits one row with n=0 and sequence(1, 0) would run
      // DESCENDING into out-of-bounds element_at — emit nothing, like
      // the oracle's empty recursion
      .filter(col("n") >= 2)
    // double centering: B = −½ (D² − rowmean_i − rowmean_j + grandmean)
    val centered = mat
      .withColumn("rm", transform(col("d2m"), r => foldSum(r) / col("n")))
      .withColumn("gmean", foldSum(col("rm")) / col("n"))
      .select(col("samples"), col("n"),
        transform(sequence(lit(1), col("n")), i =>
          transform(sequence(lit(1), col("n")), j =>
            lit(-0.5) * (element_at(element_at(col("d2m"), i), j)
              - element_at(col("rm"), i) - element_at(col("rm"), j)
              + col("gmean")))).as("gm"))
    // power iteration from e₁ (the all-ones start lies in the centered
    // matrix's null space), max-abs normalized each step; every step a
    // tiny 1-row job, checkpointed so the plan stays linear
    def e1(n: Column): Column =
      transform(sequence(lit(1), n),
        i => when(i === 1, lit(1.0)).otherwise(lit(0.0)))
    def iterate(init: DataFrame, gmCol: String, vCol: String): DataFrame = {
      var st = graft.Ckpt(init)
      for (_ <- 1 to iters) {
        val stepped = st.withColumn("vv",
          transform(sequence(lit(1), col("n")), i =>
            foldSum(zip_with(element_at(col(gmCol), i), col(vCol), (a, b) => a * b))))
        st = graft.Ckpt(stepped
          .withColumn("m", foldMaxAbs(col("vv")))
          .withColumn(vCol, transform(col("vv"), x => x / col("m")))
          .drop("vv", "m"))
      }
      st
    }
    val s1 = iterate(centered.withColumn("v", e1(col("n"))), "gm", "v")
    // Hotelling deflation for the SECOND axis (the ordination plot is
    // 2-D): B₂ = B − λ₁·v₁v₁ᵀ/(v₁ᵀv₁), λ₁ the Rayleigh quotient — all
    // sequential folds, mirrored op-for-op in the oracle.
    val deflated = s1
      .withColumn("bv", transform(sequence(lit(1), col("n")), i =>
        foldSum(zip_with(element_at(col("gm"), i), col("v"), (a, b) => a * b))))
      .withColumn("lam_num", foldSum(zip_with(col("v"), col("bv"), (a, b) => a * b)))
      .withColumn("lam_den", foldSum(transform(col("v"), x => x * x)))
      .withColumn("lam", col("lam_num") / col("lam_den"))
      .withColumn("gm2", transform(sequence(lit(1), col("n")), i =>
        transform(sequence(lit(1), col("n")), j =>
          element_at(element_at(col("gm"), i), j)
            - col("lam") * element_at(col("v"), i) * element_at(col("v"), j)
              / col("lam_den"))))
      .drop("bv", "lam_num", "lam")
    val s2 = iterate(deflated.withColumn("v2", e1(col("n"))), "gm2", "v2")
    // sign convention: first component of each axis non-negative
    s2
      .withColumn("sgn1",
        when(element_at(col("v"), 1) >= 0, lit(1.0)).otherwise(lit(-1.0)))
      .withColumn("sgn2",
        when(element_at(col("v2"), 1) >= 0, lit(1.0)).otherwise(lit(-1.0)))
      .select(posexplode(transform(sequence(lit(1), col("n")), i =>
        struct(element_at(col("samples"), i).as("sample"),
          round(element_at(col("v"), i) * col("sgn1"), 6).as("axis1"),
          round(element_at(col("v2"), i) * col("sgn2"), 6).as("axis2")))))
      .select(col("col.sample").as("sample"),
        col("col.axis1").as("axis1"), col("col.axis2").as("axis2"))
      .orderBy("sample")
  }

  /** BLOCK-PARTITIONED PCoA — the 100 TB-scale form of [[q31Pcoa]].
    *
    * [[q31Pcoa]] carries the whole Gram matrix in ONE row of
    * array<array<double>>: a single-task O(n²·iters) computation that
    * is fine while samples are a small dimension (n² doubles ≈ 32 MB
    * at n = 2 000) but dead at a real reference deployment's 10⁴–10⁵
    * samples. This variant distributes the SAME arithmetic:
    *
    *   - the D²/Gram matrix is (i, j, v) TRIPLES spread across the
    *     cluster (n² rows — at n = 10⁵ that's 10¹⁰ rows ≈ 240 GB,
    *     shuffle-partitionable, never resident in one task);
    *   - a power-iteration step is broadcast-join + aggregate: the
    *     n-entry vector broadcasts to the triples, products group by
    *     row index i;
    *   - every dimension-bounded side (ids, vector, scalars) is an
    *     explicit `broadcast`, so the only shuffle per step is the
    *     n²-row group-by — the minimum a distributed mat-vec needs.
    *
    * BIT-IDENTICAL to the single-row form (and so shares its DuckDB
    * oracle): double addition is order-sensitive, so per-row sums are
    * NOT `sum()` aggregates (shuffle-order-dependent) but
    * collect_list → sort_array → sequential fold in index order — the
    * exact add sequence of the single-row form's array folds. The
    * per-group collected list is one matrix ROW (n doubles, ~800 KB at
    * n = 10⁵) — bounded by the sample dimension, not the corpus.
    * max-abs normalization uses a plain max (order-independent).
    *
    * Lineage: the triples matrix is checkpointed once and reused by
    * all 2×iters steps; the iterated vector is checkpointed every
    * `ckptEvery` steps (plan depth stays bounded, jobs stay tiny). */
  def q31PcoaBlocked(spark: SparkSession, dir: String, iters: Int = 20,
      ckptEvery: Int = 2): DataFrame =
    pcoaBlocked(Relational.q30BrayCurtis(spark, dir), iters, ckptEvery)

  /** Blocked PCoA over any pairwise-dissimilarity frame — same input
    * contract as [[pcoa]]; bit-identical output by construction. */
  def pcoaBlocked(bc0: DataFrame, iters: Int = 20,
      ckptEvery: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // sequential index-order fold over collected (idx, x) pairs — the
    // blocked mirror of the single-row form's foldSum over an array
    def idxFold(pairs: Column): Column =
      aggregate(transform(sort_array(pairs), s => s("x")),
        lit(0.0), (acc, x) => acc + x)
    // per-row sorted fold back into a single-row array in index order
    def toRow(grouped: DataFrame, out: String): DataFrame =
      grouped.agg(transform(
        sort_array(collect_list(struct(col("i"), col("x")))),
        s => s("x")).as(out))

    val bc = graft.Ckpt(bc0)
    // dense 1-based ids in sample-name order, so index order == the
    // single-row form's name-sorted array order. The ranking window is
    // bounded by the sample DIMENSION (10⁴–10⁵ rows, megabytes in one
    // partition); constant non-foldable key per the repo's
    // WindowExec-warning discipline.
    val ids = graft.Ckpt(
      bc.select(explode(array(col("sample_a"), col("sample_b")))
          .as("sample")).distinct()
        .withColumn("i", row_number().over(
          Window.partitionBy(length(col("sample")) * 0).orderBy("sample"))))
    val nf = broadcast(ids.agg(max(col("i")).as("n")).filter(col("n") >= 2))
    // symmetric D² triples: both orientations of each pair + zero diagonal
    val half = bc
      .join(broadcast(ids.select(col("sample").as("sample_a"), col("i").as("ti"))), "sample_a")
      .join(broadcast(ids.select(col("sample").as("sample_b"), col("i").as("tj"))), "sample_b")
      .select(col("ti"), col("tj"),
        (col("bray_curtis") * col("bray_curtis")).as("d2"))
    // both orientations in ONE pass over the pair frame (a two-branch
    // union evaluates its upstream twice — an extra full read of the
    // n²/2-row frame at scale); the zero diagonal unions from the
    // dimension-bounded ids
    val trip = half.select(explode(array(
        struct(col("ti").as("i"), col("tj").as("j"), col("d2")),
        struct(col("tj").as("i"), col("ti").as("j"), col("d2")))).as("t"))
      .select(col("t.i").as("i"), col("t.j").as("j"), col("t.d2").as("d2"))
      .union(ids.select(col("i"), col("i").as("j"), lit(0.0).as("d2")))
    // double centering as joins: rm_i (row means), grand mean, then
    // b_ij = −½ (d2 − rm_i − rm_j + gmean) — operand-for-operand the
    // single-row expression
    val rm = trip.groupBy("i")
      .agg(idxFold(collect_list(struct(col("j"), col("d2").as("x")))).as("rs"))
      .crossJoin(nf)
      .select(col("i"), (col("rs") / col("n")).as("rm"))
    val gmean = rm
      .agg(idxFold(collect_list(struct(col("i"), col("rm").as("x")))).as("gs"))
      .crossJoin(nf).select((col("gs") / col("n")).as("gmean"))
    val b = graft.Ckpt(trip
      .join(broadcast(rm.select(col("i"), col("rm").as("rmi"))), "i")
      .join(broadcast(rm.select(col("i").as("j"), col("rm").as("rmj"))), "j")
      .crossJoin(broadcast(gmean))
      .select(col("i"), col("j"), (lit(-0.5) *
        (col("d2") - col("rmi") - col("rmj") + col("gmean"))).as("b")))

    // One mat-vec: the dimension-bounded VECTOR rides as a single-row
    // array broadcast into the distributed triples (10⁵ doubles ≈
    // 800 KB — always broadcastable); products group by row index with
    // the index-order fold, then collect back to a single-row array.
    // Only the matrix is ever corpus-of-pairs-scale.
    def matVec(m: DataFrame, vrow: DataFrame, vExpr: Column => Column,
        out: String): DataFrame =
      toRow(m.crossJoin(broadcast(vrow))
        .select(col("i"), col("j"),
          (col("b") * vExpr(col("j"))).as("x"))
        .groupBy("i")
        .agg(idxFold(collect_list(struct(col("j"), col("x")))).as("x")), out)
    // power iteration carrying (varr = unnormalized B·v, mdiv = its
    // max-abs); the division is applied at each USE (x/m per product),
    // which is the same double as the single-row form's pre-divided
    // vector element
    def iterate(m: DataFrame, v0: DataFrame): DataFrame = {
      var v = v0
      for (k <- 1 to iters) {
        val next = matVec(m, v,
            j => element_at(col("varr"), j) / col("mdiv"), "varr")
          .select(col("varr"), foldMaxAbs(col("varr")).as("mdiv"))
        v = if (k % ckptEvery == 0 || k == iters) graft.Ckpt(next) else next
      }
      v.select(transform(col("varr"), x => x / col("mdiv")).as("varr"))
    }
    // e₁ start, gated on n ≥ 2 like the single-row form's filter
    val v0 = nf.select(transform(sequence(lit(1), col("n")),
      i => when(i === 1, lit(1.0)).otherwise(lit(0.0))).as("varr"),
      lit(1.0).as("mdiv"))
    val v1 = iterate(b, v0)
    // Hotelling deflation: B·v₁ via one distributed mat-vec, the
    // Rayleigh scalars as the single-row form's zip_with/fold shapes
    val bv = matVec(b, v1, j => element_at(col("varr"), j), "bvarr")
    val scal = broadcast(v1.crossJoin(bv).select(col("varr"),
      foldSum(zip_with(col("varr"), col("bvarr"), (a, c) => a * c))
        .as("lam_num"),
      foldSum(transform(col("varr"), x => x * x)).as("lam_den")))
    val b2 = graft.Ckpt(b.crossJoin(scal)
      .select(col("i"), col("j"), (col("b") -
        (col("lam_num") / col("lam_den"))
          * element_at(col("varr"), col("i"))
          * element_at(col("varr"), col("j")) / col("lam_den")).as("b")))
    val v2 = iterate(b2, v0)
    // sign convention + explode back to (sample, axis1, axis2) rows —
    // the same tail as the single-row form
    v1.crossJoin(v2.select(col("varr").as("v2arr")))
      .crossJoin(broadcast(nf))
      .crossJoin(broadcast(ids.agg(
        sort_array(collect_list(col("sample"))).as("samples"))))
      .withColumn("sgn1",
        when(element_at(col("varr"), 1) >= 0, lit(1.0)).otherwise(lit(-1.0)))
      .withColumn("sgn2",
        when(element_at(col("v2arr"), 1) >= 0, lit(1.0)).otherwise(lit(-1.0)))
      .select(posexplode(transform(sequence(lit(1), col("n")), i =>
        struct(element_at(col("samples"), i).as("sample"),
          round(element_at(col("varr"), i) * col("sgn1"), 6).as("axis1"),
          round(element_at(col("v2arr"), i) * col("sgn2"), 6).as("axis2")))))
      .select(col("col.sample").as("sample"),
        col("col.axis1").as("axis1"), col("col.axis2").as("axis2"))
      .orderBy("sample")
  }

  /** DuckDB oracle: identical folds through a recursive CTE. */
  def q31OracleSql(iters: Int = 20): String = s"""
      WITH RECURSIVE ab AS (
        SELECT n_name, p_type, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, p_type),
      tot AS (SELECT n_name, sum(qty) AS s FROM ab GROUP BY n_name),
      cm AS (
        SELECT a.n_name AS sample_a, b.n_name AS sample_b,
          sum(least(a.qty, b.qty)) AS c
        FROM ab a JOIN ab b ON a.p_type = b.p_type AND a.n_name < b.n_name
        GROUP BY 1, 2),
      bc AS (
        SELECT ta.n_name AS sample_a, tb.n_name AS sample_b,
          round(1.0 - 2.0 * CAST(coalesce(cm.c, 0) AS DOUBLE)
            / (CAST(ta.s AS DOUBLE) + CAST(tb.s AS DOUBLE)), 6) AS d
        FROM tot ta JOIN tot tb ON ta.n_name < tb.n_name
        LEFT JOIN cm ON cm.sample_a = ta.n_name AND cm.sample_b = tb.n_name),
      sym AS (
        SELECT sample_a AS si, sample_b AS sj, d*d AS d2 FROM bc
        UNION ALL SELECT sample_b, sample_a, d*d FROM bc
        UNION ALL SELECT n_name, n_name, CAST(0.0 AS DOUBLE) FROM tot),
      rows_ AS (
        SELECT si, list_transform(
          list_sort(list(struct_pack(sj := sj, d2 := d2))), s -> s['d2']) AS r
        FROM sym GROUP BY si),
      mat AS (
        SELECT list_transform(list_sort(list(struct_pack(si := si, r := r))),
                 s -> s['r']) AS d2m,
               list_sort(list(si)) AS samples,
               count(*) AS n
        FROM rows_),
      cent AS (
        SELECT samples, n,
          list_transform(generate_series(1, CAST(n AS INT)), i ->
            list_transform(generate_series(1, CAST(n AS INT)), j ->
              -0.5 * (d2m[i][j] - rm[i] - rm[j] + gmean))) AS gm
        FROM (
          SELECT samples, n, d2m, rm,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE), rm), (a, x) -> a + x) / n AS gmean
          FROM (
            SELECT samples, n, d2m,
              list_transform(d2m, r ->
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE), r), (a, x) -> a + x) / n) AS rm
            FROM mat) t1) t2
        WHERE n >= 2),
      it AS (
        SELECT 0 AS k,
          list_transform(generate_series(1, CAST(n AS INT)),
            i -> CASE WHEN i = 1 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) AS v
        FROM cent
        UNION ALL
        SELECT k + 1,
          list_transform(vv, x -> x /
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(vv, y -> abs(y))), (a, x2) -> greatest(a, x2)))
        FROM (
          SELECT it.k,
            list_transform(generate_series(1, CAST(cent.n AS INT)), i ->
              list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(generate_series(1, CAST(cent.n AS INT)),
                  j -> cent.gm[i][j] * it.v[j])), (a, x) -> a + x)) AS vv
          FROM it, cent WHERE it.k < $iters) t),
      fin AS (
        SELECT v, CASE WHEN v[1] >= 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS sgn
        FROM it WHERE k = $iters),
      defl AS (
        SELECT n, gm2 FROM (
          SELECT n,
            list_transform(generate_series(1, CAST(n AS INT)), i ->
              list_transform(generate_series(1, CAST(n AS INT)), j ->
                gm[i][j] - (lam_num / lam_den) * v[i] * v[j] / lam_den)) AS gm2
          FROM (
            SELECT cent.n, cent.gm, fin.v,
              list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(generate_series(1, CAST(cent.n AS INT)), i ->
                  fin.v[i] * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                    list_transform(generate_series(1, CAST(cent.n AS INT)),
                      j -> cent.gm[i][j] * fin.v[j])), (a, x) -> a + x))),
                (a, x) -> a + x) AS lam_num,
              list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(fin.v, x -> x * x)), (a, x) -> a + x) AS lam_den
            FROM cent, fin) t0) t1),
      it2 AS (
        SELECT 0 AS k,
          list_transform(generate_series(1, CAST(n AS INT)),
            i -> CASE WHEN i = 1 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) AS v
        FROM defl
        UNION ALL
        SELECT k + 1,
          list_transform(vv, x -> x /
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list_transform(vv, y -> abs(y))), (a, x2) -> greatest(a, x2)))
        FROM (
          SELECT it2.k,
            list_transform(generate_series(1, CAST(defl.n AS INT)), i ->
              list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(generate_series(1, CAST(defl.n AS INT)),
                  j -> defl.gm2[i][j] * it2.v[j])), (a, x) -> a + x)) AS vv
          FROM it2, defl WHERE it2.k < $iters) t),
      fin2 AS (
        SELECT v AS v2, CASE WHEN v[1] >= 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS sgn2
        FROM it2 WHERE k = $iters),
      idx AS (
        SELECT unnest(generate_series(1, CAST(n AS INT))) AS i, samples
        FROM cent)
      SELECT idx.samples[idx.i] AS sample,
        round(fin.v[idx.i] * fin.sgn, 6) AS axis1,
        round(fin2.v2[idx.i] * fin2.sgn2, 6) AS axis2
      FROM idx, fin, fin2
      ORDER BY sample"""
}
