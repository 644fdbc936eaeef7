package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: all signed-random-projection LSH bucket
  * ids of a vector in ONE pass — `nTables` buckets of `bitsPerTable`
  * bits each, bit b of table t = sign of `dot(planes(t*bits+b), v)`.
  *
  * Replaces the composed form (32 × `aggregate(zip_with(...))` over
  * literal plane arrays), whose Catalyst tree was large enough to risk
  * codegen-size fallback and dominated s2's wall time. Here the plane
  * matrix rides along as a codegen reference object (one `double[][]`
  * per executor, not per row or per expression node) and the generated
  * loop stays inside whole-stage codegen.
  *
  * Determinism: each dot product accumulates in index order in double
  * precision — bit-identical to the `aggregate(zip_with(...))` fold and
  * to a DuckDB `list_reduce` over the per-index products, which is what
  * lets the whole LSH pipeline be oracle-checked.
  */
case class SrpBuckets(child: Expression, planes: Seq[Seq[Double]],
    nTables: Int, bitsPerTable: Int) extends UnaryExpression {

  require(planes.length == nTables * bitsPerTable,
    s"need ${nTables * bitsPerTable} planes, got ${planes.length}")
  require(bitsPerTable <= 63, "bucket bits must fit a Long")

  // planes stay a Seq so the case-class equals/hashCode compare
  // CONTENTS (Array fields fall back to reference identity, which
  // defeats Catalyst canonicalization — semanticEquals, subexpression
  // elimination, exchange reuse); eval/codegen use this flat copy
  @transient private lazy val planesArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_buckets expects array<float|double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_buckets"

  private lazy val elemGetter: (ArrayData, Int) => Double =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => (a, i) => a.getFloat(i).toDouble
      case DoubleType => (a, i) => a.getDouble(i)
      case t => throw new IllegalArgumentException(s"srp_buckets: unsupported element type $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val get = elemGetter
    val buckets = new Array[Long](nTables)
    var pi = 0
    while (pi < planesArr.length) {
      val p = planesArr(pi)
      val n = math.min(p.length, v.numElements())
      var dot = 0.0
      var j = 0
      while (j < n) { dot += p(j) * get(v, j); j += 1 }
      if (dot > 0.0) buckets(pi / bitsPerTable) |= 1L << (pi % bitsPerTable)
      pi += 1
    }
    new GenericArrayData(buckets)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("srpPlanes", planesArr, "double[][]")
    def getter(arr: String, i: String): String =
      child.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case DoubleType => s"$arr.getDouble($i)"
        case t => throw new IllegalArgumentException(s"srp_buckets: unsupported element type $t")
      }
    nullSafeCodeGen(ctx, ev, v => {
      val buckets = ctx.freshName("buckets")
      val pi = ctx.freshName("pi")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val j = ctx.freshName("j")
      s"""
        long[] $buckets = new long[$nTables];
        for (int $pi = 0; $pi < ${planes.length}; $pi++) {
          double[] $p = $planesRef[$pi];
          int $n = java.lang.Math.min($p.length, $v.numElements());
          double $dot = 0.0;
          for (int $j = 0; $j < $n; $j++) { $dot += $p[$j] * ${getter(v, j)}; }
          if ($dot > 0.0) $buckets[$pi / $bitsPerTable] |= 1L << ($pi % $bitsPerTable);
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($buckets);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}
