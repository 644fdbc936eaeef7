package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash of a string:
  * `acc := (acc * mult + codepoint) % mod` over the code points, in
  * order, starting from 0.
  *
  * Semantically identical to the composed form used previously —
  * `aggregate(transform(sequence(1, length(s)), ci ->
  * ascii(substring(s, ci, 1))), 0L, (acc, ch) -> (acc*mult + ch) %
  * mod)` — and to the DuckDB oracle's `list_reduce` fold (`ascii` =
  * first code point; `substring` indexes by code point in both
  * engines). The composed form is O(len²) per string (each
  * `substring(s, ci, 1)` walks the UTF-8 bytes from the start) and
  * allocates an intermediate long array per string; this is one
  * linear, allocation-free pass, sitting in the hot loop of every
  * MinHash/SimHash signature (millions of shingles per partition at
  * real scale).
  *
  * Edge parity: an empty string hashes to 0 here; the composed form's
  * `sequence(1, 0)` quirk (descending [1,0]) also folds to 0 because
  * `ascii("") = 0` — same result either way.
  */
case class PolyHash(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression {

  require(mod > 0, "poly_hash modulus must be positive")
  require(mult > 0 && mult < mod, "poly_hash multiplier must be in (0, mod)")
  // largest intermediate is acc*mult + cp < mod*mult + 0x10FFFF
  require(mult <= Long.MaxValue / mod - 1,
    "poly_hash mult*mod must not overflow a Long")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  /** One pass over the code points. ASCII fast path iterates the raw
    * UTF-8 bytes (identical values for 7-bit input); the general path
    * decodes code points, matching `ascii(substring(s, ci, 1))`. */
  def hashImpl(u: UTF8String): Long = {
    val b = u.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < b.length) { if (b(i) < 0) ascii = false; i += 1 }
    var acc = 0L
    if (ascii) {
      var j = 0
      while (j < b.length) { acc = (acc * mult + (b(j) & 0xffL)) % mod; j += 1 }
    } else {
      val s = u.toString
      var k = 0
      while (k < s.length) {
        val cp = s.codePointAt(k)
        acc = (acc * mult + cp) % mod
        k += Character.charCount(cp)
      }
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    hashImpl(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the loop lives in this (JIT-compiled) class; codegen emits one
    // virtual call, which keeps the surrounding operators in
    // whole-stage codegen without inlining the decode logic
    val self = ctx.addReferenceObj("polyHash", this, classOf[PolyHash].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.hashImpl($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}
