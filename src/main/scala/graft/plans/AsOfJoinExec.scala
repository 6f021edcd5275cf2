package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Physical sort-merge AS-OF join.
  *
  * Declares `ClusteredDistribution` on each side's key and a required
  * (key, time) sort order, so EnsureRequirements inserts exactly one
  * co-partitioned Exchange + Sort per side — after which each partition
  * is a LINEAR two-pointer merge with O(1) state (one buffered right
  * row): no window buffering, no union row padding, no per-key
  * materialization. This is the 100 TB shape: the right (usually
  * dimension-sized) side sorts alone instead of riding through a window
  * over the union of both sides, and a hot left key streams — nothing
  * accumulates per key.
  *
  * Semantics (matching `JoinOps.asofJoinPrior/Next` and DuckDB ASOF):
  * inclusive comparison; null keys never match and null-key right rows
  * are dropped; null left times never match; null right times are
  * skipped. Right-side (key, time) ties resolve to the LAST row in sort
  * order (prior) / the first (forward) — callers wanting determinism
  * pre-aggregate, same contract as the sweep form.
  */
case class AsOfJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    matchedOut: Seq[Attribute],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ matchedOut

  override def outputPartitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOutput = left.output
    val rightOutput = right.output
    val outAttrs = output
    val (lk, rk, lt, rt, rv, mo, fwd) =
      (leftKey, rightKey, leftTime, rightTime, rightValues, matchedOut, forward)
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(Seq[org.apache.spark.sql.catalyst.expressions.Expression](lk), leftOutput)
      val rKeyProj = UnsafeProjection.create(Seq[org.apache.spark.sql.catalyst.expressions.Expression](rk), rightOutput)
      val lTimeProj = UnsafeProjection.create(Seq[org.apache.spark.sql.catalyst.expressions.Expression](lt), leftOutput)
      val rTimeProj = UnsafeProjection.create(Seq[org.apache.spark.sql.catalyst.expressions.Expression](rt), rightOutput)
      val matchProj = UnsafeProjection.create((rt +: rv).map(a => a: org.apache.spark.sql.catalyst.expressions.Expression), rightOutput)
      val outProj = UnsafeProjection.create(outAttrs.map(a => a: org.apache.spark.sql.catalyst.expressions.Expression), leftOutput ++ mo)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val nullMatch = new GenericInternalRow(mo.length)
      val joined = new JoinedRow

      val rBuf = ri.buffered
      // prior: the most recent right row folded so far, with its key
      var matchRow: UnsafeRow = null
      var matchKey: UnsafeRow = null

      li.map { l =>
        val lKeyRow = lKeyProj(l)
        val lTimeRow = lTimeProj(l)
        val lKeyNull = lKeyRow.isNullAt(0)
        val lTimeNull = lTimeRow.isNullAt(0)
        var matched: InternalRow = nullMatch
        if (!lKeyNull && !lTimeNull) {
          if (fwd) {
            // advance past right rows strictly before (lkey, ltime);
            // null right keys/times sort first and are discarded here
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val rKeyRow = rKeyProj(rBuf.head)
              val c = if (rKeyRow.isNullAt(0)) -1 else keyOrd.compare(rKeyRow, lKeyRow)
              if (c < 0) { rBuf.next(); () }
              else if (c == 0) {
                val rTimeRow = rTimeProj(rBuf.head)
                if (rTimeRow.isNullAt(0) || timeOrd.compare(rTimeRow, lTimeRow) < 0) {
                  rBuf.next(); ()
                } else advancing = false
              } else advancing = false
            }
            // peek, never consume: the same head may serve later lefts
            if (rBuf.hasNext) {
              val rKeyRow = rKeyProj(rBuf.head)
              if (!rKeyRow.isNullAt(0) && keyOrd.compare(rKeyRow, lKeyRow) == 0)
                matched = matchProj(rBuf.head)
            }
          } else {
            // consume right rows at-or-before (lkey, ltime), folding the
            // latest same-key one into matchRow
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val rKeyRow = rKeyProj(rBuf.head)
              val c = if (rKeyRow.isNullAt(0)) -1 else keyOrd.compare(rKeyRow, lKeyRow)
              if (c < 0) { rBuf.next(); () }
              else if (c == 0) {
                val rTimeRow = rTimeProj(rBuf.head)
                if (rTimeRow.isNullAt(0)) { rBuf.next(); () }
                else if (timeOrd.compare(rTimeRow, lTimeRow) <= 0) {
                  val row = rBuf.next()
                  matchRow = matchProj(row).copy()
                  matchKey = rKeyProj(row).copy()
                } else advancing = false
              } else advancing = false
            }
            if (matchKey != null && keyOrd.compare(matchKey, lKeyRow) == 0)
              matched = matchRow
          }
        }
        outProj(joined(l, matched))
      }
    }
  }
}

/** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rv, mo, fwd) =>
      AsOfJoinExec(lk, rk, lt, rt, rv, mo, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
