package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Hamming distance between two equal-length bit strings (as
  * produced by graft.ops.DedupOps.simhash).
  *
  * Why a custom Catalyst expression (SURVEY.md §2f said "none needed" for
  * reference parity — this is for the SimHash near-dup extension): the
  * built-in way to compare two 64-char fingerprints position-by-position
  * is 64 substr() equality terms, or a higher-order `zip_with` lambda —
  * the former bloats the plan, the latter drops out of whole-stage
  * codegen and allocates per row. This expression generates a tight byte
  * loop via `doGenCode`, so simhash pair verification at 100 TB stays
  * inside codegen with zero allocation.
  *
  * Returns -1 when lengths differ (caller bug); null-safe like any binary
  * expression.
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - Hamming distance between two equal-length strings, -1 on length mismatch.")
case class BitStringHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is off-limits (AbstractDataType is private[sql] in
  // Spark 4), so input validation happens here instead.
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"bit_hamming requires (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bit_hamming"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ab = a.asInstanceOf[UTF8String].getBytes
    val bb = b.asInstanceOf[UTF8String].getBytes
    if (ab.length != bb.length) -1
    else {
      var i = 0; var d = 0
      while (i < ab.length) { if (ab(i) != bb(i)) d += 1; i += 1 }
      d
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ab = ctx.freshName("ab")
      val bb = ctx.freshName("bb")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |byte[] $ab = $a.getBytes();
         |byte[] $bb = $b.getBytes();
         |if ($ab.length != $bb.length) {
         |  ${ev.value} = -1;
         |} else {
         |  int $d = 0;
         |  for (int $i = 0; $i < $ab.length; $i++) {
         |    if ($ab[$i] != $bb[$i]) $d++;
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitStringHamming =
    copy(left = newLeft, right = newRight)
}
