package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two float/double
  * array columns in a single fused pass (dot + both norms in one
  * loop), with whole-stage codegen via [[doGenCode]].
  *
  * Semantics match the composable
  * [[graft.functions.VectorFunctions.cosine]] fold bit-for-bit: the
  * accumulation runs in index order in double precision, so results
  * are identical to the HOF version and to an index-ordered oracle —
  * but ~3× cheaper (one pass, no intermediate arrays, no lambda
  * dispatch). The equivalence holds on the FULL input domain:
  * unequal-length arrays and arrays with a NULL element yield NULL,
  * exactly as the HOF fold does (`zip_with` pads with nulls and
  * `acc + null` poisons the aggregate) — `cosine_sim` is
  * SQL-registered, so arbitrary user data can hit both cases.
  */
case class CosineSimilarity(left: Expression, right: Expression)
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
      s"cosine_sim expects array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def elemGetter(e: Expression): (ArrayData, Int) => Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => (a, i) => a.getFloat(i).toDouble
      case DoubleType => (a, i) => a.getDouble(i)
      case t => throw new IllegalArgumentException(s"cosine_sim: unsupported element type $t")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val getX = elemGetter(left)
    val getY = elemGetter(right)
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = getX(x, i); val yi = getY(y, i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, arr: String, i: String): String =
      e.dataType.asInstanceOf[ArrayType].elementType match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case DoubleType => s"$arr.getDouble($i)"
        case t => throw new IllegalArgumentException(s"cosine_sim: unsupported element type $t")
      }
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val bad = ctx.freshName("bad")
      s"""
        if ($x.numElements() != $y.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $x.numElements();
          double $dot = 0.0, $nx = 0.0, $ny = 0.0;
          boolean $bad = false;
          for (int $i = 0; $i < $n && !$bad; $i++) {
            if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; }
            else {
              double $xi = ${getter(left, x, i)};
              double $yi = ${getter(right, y, i)};
              $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
            }
          }
          if ($bad) { ${ev.isNull} = true; }
          else { ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny)); }
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
