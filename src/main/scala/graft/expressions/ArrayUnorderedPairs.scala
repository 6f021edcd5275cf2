package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** All unordered (i, j > i) element pairs of an array, as
  * array<struct<a: T, b: T>> — the native form of the suite-wide
  * in-list pair expansion
  *
  *   flatten(transform(xs, (a, i) =>
  *     transform(slice(xs, i + 2, size(xs)), b => struct(a, b))))
  *
  * (winnow candidate pairs, per-gram source-overlap pairs, simhash
  * block pairs, banded-MinHash bucket pairs, the edit-distance/Jaro
  * block arms). Higher-order functions are CodegenFallback, so the
  * composed chain runs interpreted and `slice` allocates an O(m)
  * element-suffix copy per anchor — O(m²) copies per group before a
  * single pair is consumed. This expression reads each element ONCE
  * (copied out of its unsafe backing buffer so the output owns its
  * memory), then emits pair structs holding two references each —
  * O(m) copies + O(m²) two-pointer structs, inside whole-stage
  * codegen.
  *
  * Pair ORDER is the composed form's exactly: outer index ascending,
  * inner j > i ascending — flatten concatenates the per-anchor runs.
  * m ≤ 1 yields an empty array (flatten of empties), null in → null
  * out. Element VALUES are whatever the array holds (ids, strings,
  * member structs); callers project the fields they need downstream —
  * same rows, same values, field paths `p.a…`/`p.b…` instead of the
  * site-local struct names (ArrayUnorderedPairsSpec pins native ==
  * composed per element type).
  */
@ExpressionDescription(
  usage = "_FUNC_(xs) - array of struct(a, b) for every unordered element pair, i < j order.")
case class ArrayUnorderedPairs(child: Expression) extends UnaryExpression {

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_unordered_pairs requires an array, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", elemType, elemNullable),
    StructField("b", elemType, elemNullable))), containsNull = false)
  override def prettyName: String = "array_unordered_pairs"

  override protected def nullSafeEval(input: Any): Any =
    ArrayUnorderedPairs.pairs(input.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemType)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ArrayUnorderedPairs.pairs($c, $et);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ArrayUnorderedPairs = copy(child = newChild)
}

object ArrayUnorderedPairs {

  def pairs(xs: ArrayData, elemType: DataType): ArrayData = {
    val n = xs.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    // n(n-1)/2 structs: guard the int arithmetic the same way the
    // upstream hot-key guards bound the group size
    require(n <= 46340, s"array_unordered_pairs: $n elements overflow the pair count")
    val elems = new Array[Any](n)
    var i = 0
    while (i < n) {
      // copy ONCE per element: unsafe-backed structs/strings are views
      // into the input row buffer, which the runtime reuses; the copies
      // are then shared by reference across every pair they appear in
      elems(i) = if (xs.isNullAt(i)) null
        else InternalRow.copyValue(xs.get(i, elemType))
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](elems(i), elems(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column form over an array column. */
  def of(xs: Column): Column =
    ColumnBridge.column(ArrayUnorderedPairs(ColumnBridge.expression(xs)))
}
