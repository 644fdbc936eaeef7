package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: index of the nearest centroid (squared
  * euclidean, smallest index on ties) out of a fixed centroid matrix —
  * the IVF/KMeans assignment stage as a SINGLE projection.
  *
  * Replaces the crossJoin(×k centroids) → per-pair distance fold →
  * max_by argmin reduction, which materializes n×k rows map-side and
  * pays a shuffle to get back to one row per vector. Here the centroid
  * matrix rides as a codegen reference object (one `double[][]` per
  * executor, same pattern as [[SrpBuckets]]' plane matrix) and the
  * whole assignment is a zero-shuffle, whole-stage-codegen scan — the
  * shape that turns the trained-IVF corpus pass into pure scan
  * throughput at 100 TB.
  *
  * Determinism: each distance accumulates (x_j − c_j)² in index order
  * in double precision — bit-identical to the
  * `aggregate(zip_with(...))` fold of the join form, so the two paths
  * agree exactly (spec-gated) and either satisfies the assignment
  * oracle. Strict `<` keeps the first (smallest) cell index on ties,
  * matching the join form's max_by(cell, (−d², −cell)). */
case class EuclidArgmin(child: Expression, centers: Seq[Seq[Double]])
    extends UnaryExpression {

  require(centers.nonEmpty, "euclid_argmin needs at least one centroid")
  require(centers.forall(_.length == centers.head.length),
    "euclid_argmin centroids must share one dimension")

  // all centroids share this dimension; input vectors must match it
  private val dim: Int = centers.head.length

  // Seq (not Array) so case-class equality compares contents —
  // Catalyst canonicalization/subexpression-elimination depends on it
  @transient private lazy val centersArr: Array[Array[Double]] =
    centers.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"euclid_argmin expects array<float|double>, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "euclid_argmin"

  private lazy val elemGetter: (ArrayData, Int) => Double =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => (a, i) => a.getFloat(i).toDouble
      case DoubleType => (a, i) => a.getDouble(i)
      case t => throw new IllegalArgumentException(
        s"euclid_argmin: unsupported element type $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // fail loudly on dimension mismatch rather than silently truncate —
    // the join form nulls out on ragged zip_with, which is just as
    // silent; a malformed embedding column is corrupt input, not a row
    // to misassign (ADVICE r6)
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"euclid_argmin: vector dimension ${v.numElements()} != centroid dimension $dim")
    val get = elemGetter
    var best = Double.PositiveInfinity
    var bestIdx = 0
    var ci = 0
    while (ci < centersArr.length) {
      val c = centersArr(ci)
      var d2 = 0.0
      var j = 0
      while (j < dim) {
        val d = get(v, j) - c(j); d2 += d * d; j += 1
      }
      if (d2 < best) { best = d2; bestIdx = ci }
      ci += 1
    }
    bestIdx
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centersRef = ctx.addReferenceObj("argminCenters", centersArr, "double[][]")
    def getter(arr: String, i: String): String =
      child.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case DoubleType => s"$arr.getDouble($i)"
        case t => throw new IllegalArgumentException(
          s"euclid_argmin: unsupported element type $t")
      }
    nullSafeCodeGen(ctx, ev, v => {
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val ci = ctx.freshName("ci")
      val c = ctx.freshName("c")
      val d2 = ctx.freshName("d2")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      s"""
        if ($v.numElements() != $dim) {
          throw new IllegalArgumentException(
            "euclid_argmin: vector dimension " + $v.numElements() +
            " != centroid dimension " + $dim);
        }
        double $best = Double.POSITIVE_INFINITY;
        int $bestIdx = 0;
        for (int $ci = 0; $ci < ${centers.length}; $ci++) {
          double[] $c = $centersRef[$ci];
          double $d2 = 0.0;
          for (int $j = 0; $j < $dim; $j++) {
            double $d = ${getter(v, j)} - $c[$j];
            $d2 += $d * $d;
          }
          if ($d2 < $best) { $best = $d2; $bestIdx = $ci; }
        }
        ${ev.value} = $bestIdx;
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): EuclidArgmin =
    copy(child = newChild)
}
