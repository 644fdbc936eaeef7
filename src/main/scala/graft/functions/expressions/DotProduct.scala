package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: raw inner product of two float/double
  * array columns — the MIPS scoring kernel (s13). [[CosineSimilarity]]
  * minus the norms: one fused index-order pass in double precision
  * (each element WIDENED to double before the multiply — float×float
  * in float precision would diverge from the oracle's DOUBLE
  * products), whole-stage codegen via [[doGenCode]]. Semantics match
  * the `zip_with`+`aggregate` HOF fold it replaces bit-for-bit ON THE
  * FULL INPUT DOMAIN, not just the happy path: unequal-length arrays
  * yield NULL (zip_with pads the shorter side with nulls and the
  * null product poisons the fold) and a NULL element in either array
  * yields NULL (the fold's `acc + null` is null) — a min-length
  * partial sum or a silently-zeroed null element would diverge from
  * the fold, and `dot_product` is SQL-registered so arbitrary user
  * data can hit both cases.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // null is produced for valid non-null inputs (length mismatch /
  // null element), so nullability cannot be derived from the children
  override def nullable: Boolean = true

  private def numericArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (numericArray(left.dataType) && numericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def elemGetter(e: Expression): (ArrayData, Int) => Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => (a, i) => a.getFloat(i).toDouble
      case DoubleType => (a, i) => a.getDouble(i)
      case t => throw new IllegalArgumentException(s"dot_product: unsupported element type $t")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val getX = elemGetter(left)
    val getY = elemGetter(right)
    val n = x.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += getX(x, i) * getY(y, i)
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, arr: String, i: String): String =
      e.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case DoubleType => s"$arr.getDouble($i)"
        case t => throw new IllegalArgumentException(s"dot_product: unsupported element type $t")
      }
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val bad = ctx.freshName("bad")
      s"""
        if ($x.numElements() != $y.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $x.numElements();
          double $dot = 0.0;
          boolean $bad = false;
          for (int $i = 0; $i < $n && !$bad; $i++) {
            if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; }
            else { $dot += ${getter(left, x, i)} * ${getter(right, y, i)}; }
          }
          if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $dot; }
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
