package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native k-word shingles over a token array — the space-joined sliding
  * windows every fingerprint/minhash/n-gram operator consumes.
  *
  * Why custom (the CanonicalText pattern): the composable form —
  *
  *   when(size(toks) < k, array()).otherwise(transform(
  *     sequence(1, size(toks) − (k−1)),
  *     i => array_join(slice(toks, i, k), " ")))
  *
  * — evaluates interpreted (higher-order functions are CodegenFallback)
  * and allocates, per output shingle, a sequence element, a sliced
  * k-element array copy, and the join buffer; ~10 queries pay it on
  * every corpus pass (winnowing, CDC chunking, substring spans, MinHash
  * shingling, bigrams, ROUGE/BLEU grams, novelty, sparse-cosine grams).
  * This expression emits the same strings from one pass over the token
  * array, building each shingle with `UTF8String.concatWs` — the exact
  * routine `array_join` uses, including its skip-null semantics — so
  * outputs are byte-identical (property-pinned in
  * NativeFoldEquivalenceSpec against the kept HOF form).
  *
  * Input: array<string>; returns array<string> — empty when the doc has
  * fewer than k tokens (the `sequence(1, n)` n<1 guard of the original).
  */
@ExpressionDescription(
  usage = "_FUNC_(toks, k) - space-joined k-token sliding windows of a token array.")
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"word_shingles needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WordShingles.shingles($c, $k);")

  override protected def withNewChildInternal(
      newChild: Expression): WordShingles = copy(child = newChild)
}

object WordShingles {

  private val Space = UTF8String.fromString(" ")

  def shingles(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val strs = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      strs(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    val parts = new Array[UTF8String](k)
    var s = 0
    while (s <= n - k) {
      var j = 0
      while (j < k) { parts(j) = strs(s + j); j += 1 }
      // concatWs is array_join's exact building block (skip-null, same
      // separator placement), so the emitted strings are byte-identical
      out(s) = UTF8String.concatWs(Space, parts: _*)
      s += 1
    }
    new GenericArrayData(out)
  }
}
