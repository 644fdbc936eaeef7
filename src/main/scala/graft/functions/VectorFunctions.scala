package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs,
  * so they stay inside whole-stage codegen.
  *
  * Determinism: products are computed in double precision and folded
  * sequentially in index order, which makes the result independent of
  * partitioning and identical to an index-ordered oracle sum.
  */
object VectorFunctions {

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with precomputed norms (preferred: norms are
    * computed once per row before a join fans rows out). */
  def cosineWithNorms(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol / (normA * normB)

  /** Cosine similarity of two vectors. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Signed-random-projection bucket id from a fixed literal plane
    * matrix: bit i is the sign of `dot(planes(i), v)`. Planes are
    * generated from a fixed seed, so buckets are stable across runs
    * and executors. */
  def srpBucket(planes: Seq[Seq[Double]], v: Column): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(planeLit, v) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic pseudo-random hyperplanes (fixed seed). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }
}
