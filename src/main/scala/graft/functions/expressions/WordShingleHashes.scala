package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-`n`-gram polynomial hashes of a text in ONE linear
  * pass — the fused form of
  * `transform(array_distinct(transform(sequence(...), i ->
  * concat_ws(' ', slice(split(text,' '), i, n)))), s -> poly_hash(s))`.
  *
  * Two problems with the composed form at scale: `split(text, ' ')`
  * sits INSIDE the shingling lambda, and after CollapseProject inlines
  * the projection Catalyst re-evaluates it once per shingle — O(words²)
  * char work per document; and every shingle materializes a string
  * only to be hashed and thrown away. Here the text is scanned once,
  * each shingle's hash folds over the word code points plus the single
  * joining spaces (identical arithmetic to [[PolyHash]] over the
  * concat_ws string), and distinctness applies to the hash values.
  *
  * Semantics parity (spec-pinned against the composed form):
  *  - words = split on every single space, keeping empties (Spark's
  *    `split(text, ' ')` with its implicit -1 limit);
  *  - `max(words − n + 1, 1)` shingles, so short texts yield exactly
  *    one shingle covering all their words;
  *  - hash-level distinct instead of string-level: every consumer
  *    (MinHash minima, set intersections) sees the same value SET, so
  *    candidate sets and Jaccard scores are unchanged.
  */
case class WordShingleHashes(child: Expression, n: Int, mult: Long, mod: Long)
    extends UnaryExpression {

  require(n >= 1 && n <= 16, "shingle width out of range")
  require(mod > 0 && mult > 0 && mult < mod, "bad hash parameters")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  def hashesImpl(u: UTF8String): GenericArrayData = {
    val s = u.toString
    // word boundaries: split on every single space, keep empties
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') starts += i + 1
      i += 1
    }
    val nWords = starts.length
    def wordEnd(w: Int): Int = if (w + 1 < nWords) starts(w + 1) - 1 else s.length
    val nShingles = math.max(nWords - n + 1, 1)
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](nShingles)
    var w = 0
    while (w < nShingles) {
      val last = math.min(w + n, nWords) - 1
      var acc = 0L
      var wi = w
      while (wi <= last) {
        var k = starts(wi)
        val end = wordEnd(wi)
        while (k < end) {
          val cp = s.codePointAt(k)
          acc = (acc * mult + cp) % mod
          k += Character.charCount(cp)
        }
        if (wi < last) acc = (acc * mult + 32L) % mod // joining space
        wi += 1
      }
      if (seen.add(acc)) out += acc
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    hashesImpl(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleHashes", this,
      classOf[WordShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.hashesImpl($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}
