package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass canonical text form — lowercase, non-alphanumerics
  * to spaces, space runs collapsed, trimmed — replacing the two-regex
  * chain `trim(regexp_replace(regexp_replace(lower(t), "[^a-z0-9 ]",
  * " "), " +", " "))` with one allocation-light byte scan.
  *
  * Why a custom expression: the regex chain was the suite's heaviest
  * per-row scalar (dedup_canonical's ×10 wall was dominated by two
  * full java.util.regex passes per document plus their intermediate
  * string copies — the first CPU wall a 100× corpus hits), yet the
  * transform is a character-class map a single pass computes exactly.
  *
  * Equivalence to the regex chain is structural, not approximate:
  * lowering uses the SAME UTF8String.toLowerCase the built-in `lower`
  * uses, and after lowering the regex maps each char outside
  * [a-z0-9 ] to a space then collapses/trims space runs — i.e. every
  * maximal run of non-[a-z0-9] chars becomes one inner space. A byte
  * scan reproduces that exactly: ASCII alphanumerics are single bytes,
  * every other byte (including each byte of a multi-byte codepoint —
  * runs collapse, so char-vs-byte granularity cannot differ) folds into
  * the pending-space state. Property-tested against the regex chain on
  * randomized unicode inputs (TextDedupSpec).
  */
@ExpressionDescription(
  usage = "_FUNC_(text) - lowercased text with non-alphanumeric runs collapsed to single spaces, trimmed.")
case class CanonicalText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"canonical_text requires string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_text"

  override protected def nullSafeEval(input: Any): Any =
    CanonicalText.canon(input.asInstanceOf[UTF8String])

  // per-row byte buffer, so the body lives in one static method both
  // eval paths share; codegen emits a direct call inside the
  // whole-stage loop (the JaroWinkler pattern).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CanonicalText.canon($c);")

  override protected def withNewChildInternal(
      newChild: Expression): CanonicalText = copy(child = newChild)
}

object CanonicalText {

  /** One pass over the lowercased bytes: emit [a-z0-9] bytes verbatim,
    * fold everything else into a pending single space emitted only
    * between alphanumeric runs (never leading/trailing). Output length
    * never exceeds input length, so one exact-size buffer suffices.
    */
  def canon(s: UTF8String): UTF8String = {
    val in = s.toLowerCase.getBytes
    val out = new Array[Byte](in.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < in.length) {
      val b = in(i)
      if ((b >= 'a'.toByte && b <= 'z'.toByte) ||
          (b >= '0'.toByte && b <= '9'.toByte)) {
        if (pendingSpace && n > 0) { out(n) = ' '.toByte; n += 1 }
        out(n) = b
        n += 1
        pendingSpace = false
      } else pendingSpace = true
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }
}
