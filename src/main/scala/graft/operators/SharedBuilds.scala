package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** "One expensive build, many consumers" memo registry for builds
  * shared across OPERATOR families — the fourth/fifth/sixth instance
  * of the SURVEY §4 build-memo pattern (d7Memo, annMemo, msfMemo in
  * SparkEntry; the r17 verdict named and mandated the discipline).
  *
  * What is shared and why (r18 optimization round, measured at sf0.1
  * before the change — every number from BENCH_LOCAL_r22/this
  * round's baseline):
  *
  *  - [[bc]] — q30's checkpointed Bray–Curtis pair frame. SIXTEEN
  *    registry keys (q31/q31b/q31c, q46, q49, q51, q55, q61, q62,
  *    q67, q72, q77, q85, q86, q87, q88) each re-ran the identical
  *    fact-scale 5-table join + abundance aggregate (~1.5–2 s each at
  *    sf0.1) to derive the SAME 300-row pair frame before their own
  *    dimension-bounded analysis. A production vegan-style session
  *    computes the distance matrix once (`vegdist`) and feeds the
  *    same object to mantel/adonis/anosim/ordination — this memo IS
  *    that shape.
  *  - [[ufLeaves]] — q44's checkpointed UniFrac leaf-abundance frame
  *    (the widest fact-scale aggregate in the suite, ~4 s at sf0.1);
  *    q47 (Mantel) and q68 (partial Mantel) re-built it wholesale.
  *  - [[pcoaAxes]] — the q31 PCoA configuration over [[bc]]; q55
  *    (PROTEST), q61 (envfit), q72 (NMDS init) and q85 (factor fit)
  *    each re-ran the 2-axis power iteration (~1–2 s each).
  *
  * HONESTY RULE (the pattern's contract, spec-gated like msfMemo's):
  * each frame's BUILDER registry key ALWAYS rebuilds and refreshes
  * the memo — q30_bray_curtis for [[bc]], q44_taxonomy_unifrac for
  * [[ufLeaves]], q31_pcoa for [[pcoaAxes]] — so the bench always
  * times each build honestly under its owner's key; consumers reuse.
  *
  * NO CROSS-RUN STATE: the outer map is weakly keyed on the
  * SparkSession, so nothing survives the session/JVM — every bench or
  * verify invocation recomputes every frame from the parquet inputs.
  * All three frames are deterministic (exact DECIMAL aggregates /
  * fixed-iteration power steps), so reuse is observationally
  * identical to a rebuild (memo-vs-rebuild identity spec-gated in
  * SharedBuildsSpec).
  */
object SharedBuilds {
  private val memo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]])
  private def memoFor(s: SparkSession) = memo.computeIfAbsent(
    s, _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame])

  private def rebuild(s: SparkSession, dir: String, tag: String)(
      build: => DataFrame): DataFrame = {
    val f = build
    memoFor(s).put(tag + "|" + dir, f)
    f
  }
  private def getOrBuild(s: SparkSession, dir: String, tag: String)(
      build: => DataFrame): DataFrame =
    Option(memoFor(s).get(tag + "|" + dir))
      .getOrElse(rebuild(s, dir, tag)(build))

  /** The checkpointed (n_name, p_type, qty DECIMAL) community
    * abundance matrix ([[Relational.abundanceQty]]). Builder:
    * q30_bray_curtis (whose own build consumes it); consumers:
    * q52/q70/q71/q73–q76/q78/q79. */
  def abq(s: SparkSession, dir: String): DataFrame =
    getOrBuild(s, dir, "abq")(Relational.abundanceQty(s, dir))

  /** Always-rebuild twin of [[abq]] (q30's build path). */
  def abqRebuild(s: SparkSession, dir: String): DataFrame =
    rebuild(s, dir, "abq")(Relational.abundanceQty(s, dir))

  /** The checkpointed (n_name, taxon) presence frame
    * ([[Relational.presenceFrame]]). Builder: q56_beta_partition;
    * consumers: q57/q60/q63/q64/q80. */
  def pres(s: SparkSession, dir: String): DataFrame =
    getOrBuild(s, dir, "pres")(Relational.presenceFrame(s, dir))

  /** Always-rebuild twin of [[pres]] for the q56 builder entry. */
  def presRebuild(s: SparkSession, dir: String): DataFrame =
    rebuild(s, dir, "pres")(Relational.presenceFrame(s, dir))

  /** The checkpointed (n_name, l_partkey, cnt) count-abundance frame
    * ([[Relational.abundanceCnt]]). Builder: q53_richness; consumers:
    * q58/q65/q66. */
  def abCnt(s: SparkSession, dir: String): DataFrame =
    getOrBuild(s, dir, "abcnt")(Relational.abundanceCnt(s, dir))

  /** Always-rebuild twin of [[abCnt]] for the q53 builder entry. */
  def abCntRebuild(s: SparkSession, dir: String): DataFrame =
    rebuild(s, dir, "abcnt")(Relational.abundanceCnt(s, dir))

  /** The checkpointed q30 Bray–Curtis (sample_a, sample_b,
    * bray_curtis) pair frame. Builder key: q30_bray_curtis. */
  def bc(s: SparkSession, dir: String): DataFrame =
    getOrBuild(s, dir, "bc")(graft.Ckpt(Relational.q30BrayCurtis(s, dir)))

  /** Always-rebuild twin of [[bc]] for the builder entry. */
  def bcRebuild(s: SparkSession, dir: String): DataFrame =
    rebuild(s, dir, "bc")(graft.Ckpt(Relational.q30BrayCurtis(s, dir)))

  /** The checkpointed UniFrac (n_name, …path levels…, p_partkey, qty)
    * leaf-abundance frame. Builder key: q44_taxonomy_unifrac. */
  def ufLeaves(s: SparkSession, dir: String): DataFrame =
    getOrBuild(s, dir, "ufleaves")(Relational.unifracLeafAbundance(s, dir))

  /** Always-rebuild twin of [[ufLeaves]] for the builder entry. */
  def ufLeavesRebuild(s: SparkSession, dir: String): DataFrame =
    rebuild(s, dir, "ufleaves")(Relational.unifracLeafAbundance(s, dir))

  /** The checkpointed q44 UniFrac (sample_a, sample_b, unifrac) pair
    * frame over [[ufLeaves]] — q44's own result. Consumers: q47
    * (Mantel) and q68 (partial Mantel), which previously each re-ran
    * the five level rollups + node-matched pair join (~4 s / 42 MB of
    * shuffle each at sf0.1). No rebuild twin: q44's entry rebuilds
    * the LEAVES and returns the lazy pair derivation unchanged (its
    * bench timing stays byte-comparable to every prior round); the
    * first pair consumer materializes this memo. */
  def uf(s: SparkSession, dir: String): DataFrame =
    getOrBuild(s, dir, "uf")(
      graft.Ckpt(Relational.unifracFromLeaves(ufLeaves(s, dir))))

  /** The checkpointed q31 PCoA (sample, axis1, axis2) configuration
    * over [[bc]]. Builder key: q31_pcoa. */
  def pcoaAxes(s: SparkSession, dir: String): DataFrame =
    getOrBuild(s, dir, "pcoa")(graft.Ckpt(Ordination.pcoa(bc(s, dir))))

  /** Always-rebuild twin of [[pcoaAxes]] for the builder entry (the
    * power iteration reruns; the [[bc]] input is the shared frame —
    * q30 owns that build's timing). */
  def pcoaAxesRebuild(s: SparkSession, dir: String): DataFrame =
    rebuild(s, dir, "pcoa")(graft.Ckpt(Ordination.pcoa(bc(s, dir))))
}
