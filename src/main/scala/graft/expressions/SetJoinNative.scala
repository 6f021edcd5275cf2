package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Distinct-overlap count of two SORTED long arrays — the stage-1
  * verify primitive of the exact set-similarity join
  * ([[graft.ops.DedupOps.similarityJoinExact]]).
  *
  * Why custom: `size(array_intersect(h_a, h_b))` builds a hash set per
  * CANDIDATE PAIR (the join's measured dominant cost — ~500× more
  * candidates than output), where a single merge scan over two sorted
  * primitive arrays computes the same count with zero allocation. The
  * semantics replicated exactly: `array_intersect` returns the DISTINCT
  * elements of a that occur in b, so the count is
  * |distinct(a) ∩ distinct(b)| — the merge scan advances past duplicate
  * runs on both sides after each match (and past equal-value runs on
  * one side otherwise), counting each common VALUE once. Inputs must be
  * sorted ascending (the caller sorts once per doc at build time, not
  * per pair); property-pinned against size(array_intersect) on
  * randomized duplicate-carrying arrays in NativeFoldEquivalenceSpec.
  *
  * Returns int (the size() of the composed form); null if either side
  * is null.
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - |distinct(a) ∩ distinct(b)| of two sorted bigint arrays.")
case class SortedLongOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_long_overlap requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_long_overlap"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedLongOverlap.overlap(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.SortedLongOverlap.overlap($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongOverlap =
    copy(left = newLeft, right = newRight)
}

object SortedLongOverlap {

  def overlap(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        cnt += 1
        while (i < n && a.getLong(i) == x) i += 1
        while (j < m && b.getLong(j) == x) j += 1
      }
    }
    cnt
  }
}

/** Native PPJoin-style prefix candidate-pair expansion — the in-bucket
  * pair generator of [[graft.ops.DedupOps.similarityJoinExact]]: for a
  * sorted bucket entry array es = array<struct<doc_id, rk, n>> (all
  * docs sharing one prefix shingle), emit every (i, j > i) pair whose
  * POSITIONAL overlap bound reaches the required exact-join overlap:
  *
  *   1 + min(n_a − rk_a, n_b − rk_b) ≥ ⌈t/(1+t)·(n_a + n_b) − ε⌉
  *
  * Why custom: the composable form (kept as
  * `DedupOps.setJoinExpandHof`, the equivalence reference) is the same
  * interpreted `transform(slice(...))` shape as the LSH bucket
  * expansion — O(|es|) struct-suffix copies per anchor plus a boxed
  * struct per CANDIDATE, before the filter. The native loop reads the
  * entries once into primitive arrays and allocates only for pairs
  * that pass the bound. The arithmetic is the identical expression
  * tree: coef = t/(1+t) is the same Scala-computed double literal, the
  * product is coef · (double)(n_a + n_b), and the bound is Spark
  * `ceil` = math.ceil(·).toLong.
  *
  * Input struct fields: (doc_id: bigint, rk: int|bigint, n: int|bigint)
  * — rk/n arrive as the types posexplode/size produce. Returns
  * array<struct<doc_a: bigint, doc_b: bigint>>.
  */
@ExpressionDescription(
  usage = "_FUNC_(es) - positional-bound-passing candidate pairs of a sorted prefix bucket.")
case class PrefixCandidatePairs(child: Expression, threshold: Double,
    eps: Double) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _) if fs.length == 3 &&
        fs(0).dataType == LongType &&
        (fs(1).dataType == IntegerType || fs(1).dataType == LongType) &&
        (fs(2).dataType == IntegerType || fs(2).dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"prefix_candidate_pairs requires array<struct<bigint, int, int>>, " +
        s"got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "prefix_candidate_pairs"

  private lazy val rkIsLong: Boolean = child.dataType match {
    case ArrayType(StructType(fs), _) => fs(1).dataType == LongType
    case _ => false
  }
  private lazy val nIsLong: Boolean = child.dataType match {
    case ArrayType(StructType(fs), _) => fs(2).dataType == LongType
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    PrefixCandidatePairs.pairs(input.asInstanceOf[ArrayData], threshold,
      eps, rkIsLong, nIsLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PrefixCandidatePairs.pairs(" +
        s"$c, $threshold, $eps, $rkIsLong, $nIsLong);")

  override protected def withNewChildInternal(
      newChild: Expression): PrefixCandidatePairs = copy(child = newChild)
}

object PrefixCandidatePairs {

  def pairs(es: ArrayData, threshold: Double, eps: Double,
      rkIsLong: Boolean, nIsLong: Boolean): ArrayData = {
    val m = es.numElements()
    val ids = new Array[Long](m)
    val rks = new Array[Long](m)
    val ns = new Array[Long](m)
    var i = 0
    while (i < m) {
      val r = es.getStruct(i, 3)
      ids(i) = r.getLong(0)
      rks(i) = if (rkIsLong) r.getLong(1) else r.getInt(1).toLong
      ns(i) = if (nIsLong) r.getLong(2) else r.getInt(2).toLong
      i += 1
    }
    val coef = threshold / (1 + threshold) // the same Scala double the
    // Column form embeds as lit(threshold / (1 + threshold))
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var a = 0
    while (a < m) {
      var b = a + 1
      while (b < m) {
        val bound =
          math.ceil(coef * (ns(a) + ns(b)).toDouble - eps).toLong
        if (math.min(ns(a) - rks(a), ns(b) - rks(b)) + 1 >= bound)
          buf += new GenericInternalRow(Array[Any](ids(a), ids(b)))
        b += 1
      }
      a += 1
    }
    new GenericArrayData(buf.toArray)
  }
}
