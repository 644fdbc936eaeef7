package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared bits of the signature expressions: both consume an
  * `array<bigint>` of 31-bit feature hashes and reduce it per ROW —
  * signature computation is a pure per-document function, so it
  * belongs in a projection, not behind an explode + shuffle + k-way
  * aggregate. At 100 TB the explode form shuffles docs × features
  * rows; these run in one scan pass with zero shuffle (the LSH band
  * join stays the only shuffle in the dedup pipelines). */
trait HashArrayExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${t.simpleString}")
  }
}

/** All `k` MinHash permutation minima of a feature-hash array in one
  * pass: `sig[j] = min_h ((2j+1)·h + j·12345 + 7) mod p`, `p = 2³¹−1`
  * — the exact arithmetic of the previous explode + 64-partial-agg
  * pipeline and of the DuckDB oracle's nested `list_transform` folds,
  * so candidate sets are bit-identical. Empty input yields null
  * (callers guarantee ≥1 shingle via the `greatest(...,1)` guard). */
case class MinHashSig(child: Expression, k: Int)
    extends HashArrayExpression {

  require(k > 0 && k <= 4096, "minhash k out of range")
  private val P = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  def sigImpl(hashes: ArrayData): Any = {
    val n = hashes.numElements()
    if (n == 0) return null
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = ((2L * j + 1) * h + j * 12345L + 7L) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(input: Any): Any =
    sigImpl(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, v => s"""
      Object r = $self.sigImpl($v);
      if (r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) r; }
    """)
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** SimHash fingerprint of a feature-hash array in one pass: bit `i`
  * (of `bits`) is set when `Σ_h sign(((2i+1)·h + i·12345 + 7) mod p
  * ≥ 2³⁰)` is non-negative (each feature votes ±1 per bit; feature
  * multiplicity weights votes, matching the word-list fold in the
  * DuckDB oracle). Replaces the explode + 60-conditional-sum
  * aggregate — same arithmetic, zero shuffle. */
case class SimHashBits(child: Expression, bits: Int)
    extends HashArrayExpression {

  require(bits > 0 && bits <= 63, "simhash bits must fit a signed Long")
  private val P = 2147483647L
  private val Half = 1073741824L // 2^30 = ceil(p/2)

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  def bitsImpl(hashes: ArrayData): Long = {
    val votes = new Array[Long](bits)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < bits) {
        val v = ((2L * b + 1) * h + b * 12345L + 7L) % P
        votes(b) += (if (v >= Half) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { if (votes(b) >= 0L) out |= 1L << b; b += 1 }
    out
  }

  override def nullSafeEval(input: Any): Any =
    bitsImpl(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhashBits", this, classOf[SimHashBits].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.bitsImpl($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}
