package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: banded affine-gap Smith–Waterman
  * (Gotoh) local-alignment score of a fixed query against the row's
  * text, restricted to diagonals within ±[[w]] of the row's seed
  * diagonal — the BLAST-shaped "extend around the seed" stage, fused
  * into one projection.
  *
  * The DP is ALL-INTEGER (match/mismatch/gap scores are ints), so the
  * engine and the DuckDB recursive-CTE oracle (which runs the
  * IDENTICAL recurrence over the same band coordinates —
  * [[graft.operators.Dedup.b4OracleSql]]) agree exactly, with no
  * floating-point ordering concerns at all.
  *
  * Band coordinates: band slot k ∈ [0, 2w] holds text position
  * j = d* + i + (k − w) for query row i. A cell's diagonal
  * predecessor H[i−1][j−1] sits at the SAME slot k in the previous
  * row, the gap-in-query predecessor H[i−1][j] at slot k+1, and the
  * gap-in-text predecessor H[i][j−1] at slot k−1 of the current row —
  * so each row is one left-to-right pass over 2w+1 slots, O(m·w) per
  * document, never O(m·n).
  *
  * Boundary encoding shared with the oracle: cells at text position
  * j = 0 store 0 (the local-alignment zero column), positions outside
  * [0, n] store [[BandedSW.Neg]]; E/F lanes store Neg wherever the
  * H boundary is not a real cell. Gap of length L costs
  * gapOpen + (L−1)·gapExt (the open charge applies to the first gap
  * character).
  *
  * Scale shape: runs only on the trigram-seeded top-k candidates
  * (b1's plan: one corpus scan + TakeOrdered), so the alignment cost
  * is top-k × m × (2w+1) ints regardless of corpus size. */
case class BandedSW(left: Expression, right: Expression, query: String,
    w: Int, matchScore: Int, mismatchScore: Int, gapOpen: Int, gapExt: Int)
    extends BinaryExpression {

  require(query.nonEmpty, "banded_sw needs a non-empty query")
  require(w >= 1, "banded_sw needs band half-width >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"banded_sw expects (string, int), got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "banded_sw"

  /** The whole banded DP as one plain loop nest — referenced from
    * both eval and the generated code (same pattern as the reference
    * object call in [[SrpBuckets]]: one virtual call per row keeps
    * whole-stage codegen intact and the row count here is top-k). */
  def compute(textU: UTF8String, dstar: Int): Int = {
    val text = textU.toString
    val n = text.length
    val m = query.length
    val B = 2 * w + 1
    val Neg = BandedSW.Neg
    var h = new Array[Int](B)
    var f = new Array[Int](B)
    var k = 0
    while (k < B) {
      val j0 = dstar + k - w
      h(k) = if (j0 >= 0 && j0 <= n) 0 else Neg
      f(k) = Neg
      k += 1
    }
    var best = 0
    var i = 1
    while (i <= m) {
      val qc = query.charAt(i - 1)
      val nh = new Array[Int](B)
      val nf = new Array[Int](B)
      var e = Neg
      k = 0
      while (k < B) {
        val j = dstar + i + k - w
        val hUp = if (k + 1 < B) h(k + 1) else Neg
        val fUp = if (k + 1 < B) f(k + 1) else Neg
        val fv = math.max(hUp - gapOpen, fUp - gapExt)
        val hLeft = if (k == 0) { if (j == 1) 0 else Neg } else nh(k - 1)
        val eLeft = if (k == 0) Neg else e
        val ev = math.max(hLeft - gapOpen, eLeft - gapExt)
        val hv =
          if (j < 0 || j > n) Neg
          else if (j == 0) 0
          else {
            val sc = if (text.charAt(j - 1) == qc) matchScore else mismatchScore
            val sH = if (h(k) == Neg) Neg else h(k) + sc
            math.max(math.max(0, sH), math.max(ev, fv))
          }
        nh(k) = hv
        nf(k) = if (j < 1 || j > n) Neg else fv
        e = if (j < 1 || j > n) Neg else ev
        if (j >= 1 && j <= n && hv > best) best = hv
        k += 1
      }
      h = nh; f = nf
      i += 1
    }
    best
  }

  override def nullSafeEval(textAny: Any, dstarAny: Any): Any =
    compute(textAny.asInstanceOf[UTF8String], dstarAny.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bandedSw", this, classOf[BandedSW].getName)
    nullSafeCodeGen(ctx, ev, (t, d) => s"${ev.value} = $self.compute($t, $d);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BandedSW =
    copy(left = newLeft, right = newRight)
}

object BandedSW {
  /** Out-of-band / invalid-cell sentinel. Large enough that even after
    * a gap-penalty subtraction it can never reach a real score, small
    * enough in magnitude that Int arithmetic can't wrap. */
  final val Neg: Int = -1000000
}
