package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-`n`-gram shingle STRINGS of a text in one linear
  * pass — the string-valued sibling of [[WordShingleHashes]], for
  * operators that join on the shingles themselves (decontamination's
  * corpus↔benchmark overlap join needs exact strings, not 31-bit
  * hashes with their collision tolerance).
  *
  * Same word-boundary semantics as the composed
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * slice(split(text,' '), i, n))))` (split on every single space,
  * empties kept, `max(words−n+1, 1)` shingles) — which re-evaluated
  * the split once per shingle after CollapseProject, O(words²) per
  * document. Each shingle here is one UTF8String slice of the
  * original text (words are consecutive, so a shingle is a contiguous
  * substring — no per-shingle string building at all). */
case class WordShingles(child: Expression, n: Int, dedup: Boolean = true)
    extends UnaryExpression {

  require(n >= 1 && n <= 16, "shingle width out of range")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${t.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  def shinglesImpl(u: UTF8String): GenericArrayData = {
    val bytes = u.getBytes
    // word start offsets: split on every single space byte (0x20 can
    // never occur inside a UTF-8 multi-byte sequence)
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) starts += i + 1
      i += 1
    }
    val nWords = starts.length
    def wordEnd(w: Int): Int =
      if (w + 1 < nWords) starts(w + 1) - 1 else bytes.length
    val nShingles = math.max(nWords - n + 1, 1)
    // dedup=false keeps every shingle INSTANCE (duplicate-fraction
    // metrics need the multiset, mirroring the composed form without
    // its array_distinct)
    val seen = if (dedup) new java.util.HashSet[UTF8String]() else null
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](nShingles)
    var w = 0
    while (w < nShingles) {
      val last = math.min(w + n, nWords) - 1
      val s = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, starts(w), wordEnd(last)))
      if (seen == null || seen.add(s)) out += s
      w += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    shinglesImpl(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordShingles", this,
      classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.shinglesImpl($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
