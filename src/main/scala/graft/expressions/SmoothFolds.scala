package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native recursive-smoothing folds over a sorted (t, q, v) event array
  * — EMA, Holt linear, and Holt-Winters additive — one tight loop per
  * key instead of the interpreted `aggregate(...)` higher-order fold.
  *
  * Why custom: the Column-level fold accumulates its per-step outputs
  * with `concat(acc.outs, array(step))`, which copies the whole
  * accumulated array EVERY step — O(m²) boxed-struct allocations per
  * key — and the step expression tree itself evaluates interpreted
  * (higher-order functions are CodegenFallback). The recursion is the
  * operator's essence (each state depends on the previous SMOOTHED
  * value, which is why no window frame expresses it), so the fix is a
  * native fold that appends into a preallocated array.
  *
  * Arithmetic is pinned 1:1 to the Column form (SmoothFoldNativeSpec
  * property-tests all three against the original `aggregate` chains):
  * every rounded step is Spark's `round(double)` — HALF_UP on
  * `java.math.BigDecimal.valueOf` of the same double, computed in the
  * same IEEE operation order — then cast to long, exactly as the
  * Column expressions did.
  *
  * Input: array<struct<t: bigint, q: bigint, v: double>>, sorted; the
  * fold consumes array order (t is the sort key, not an operand).
  */
private[expressions] object SmoothFolds {

  /** Spark's round(double, 0) on the JVM: HALF_UP over
    * BigDecimal.valueOf — identical to the codegen the built-in Round
    * emits. Non-finite inputs pass through (Round's guard).
    */
  def roundD(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  def roundL(d: Double): Long = roundD(d).toLong

  val InTypeOk: DataType => Boolean = {
    case ArrayType(StructType(fs), _) =>
      fs.length == 3 && fs(0).dataType == LongType &&
        fs(1).dataType == LongType && fs(2).dataType == DoubleType
    case _ => false
  }
}

/** EMA (α = 1/2): s₀ = round(v₀·1e6), sₜ = round((0.5·vₜ)·1e6 +
  * 0.5·(double)sₜ₋₁). Returns array<struct<q: bigint, m: bigint>> —
  * one entry per input event, in order.
  */
@ExpressionDescription(
  usage = "_FUNC_(evs) - per-event EMA(1/2) micro-long states over a sorted (t, q, v) array.")
case class EmaFold(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (SmoothFolds.InTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ema_fold requires array<struct<bigint, bigint, double>>, got " +
        child.dataType.simpleString)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("q", LongType, nullable = false),
    StructField("m", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "ema_fold"

  override protected def nullSafeEval(input: Any): Any =
    EmaFold.fold(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.EmaFold.fold($c);")

  override protected def withNewChildInternal(newChild: Expression): EmaFold =
    copy(child = newChild)
}

object EmaFold {
  import SmoothFolds.roundL

  def fold(evs: ArrayData): ArrayData = {
    val m = evs.numElements()
    val out = new Array[Any](m)
    var last = 0L
    var started = false
    var i = 0
    while (i < m) {
      val r = evs.getStruct(i, 3)
      val q = r.getLong(1)
      val v = r.getDouble(2)
      val e =
        if (!started) roundL(v * 1000000.0)
        else roundL(0.5 * v * 1000000.0 + 0.5 * last.toDouble)
      out(i) = new GenericInternalRow(Array[Any](q, e))
      last = e
      started = true
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Holt linear (α = β = 1/2):
  *   l₀ = round(v₀·1e6), b₀ = 0,
  *   lₜ = round((0.5·vₜ)·1e6 + 0.5·(double)(lₜ₋₁ + bₜ₋₁)),
  *   bₜ = round(0.5·(double)(lₜ − lₜ₋₁) + 0.5·(double)bₜ₋₁).
  * Returns array<struct<q, l, b>> per event, in order.
  */
@ExpressionDescription(
  usage = "_FUNC_(evs) - per-event Holt(1/2,1/2) level/trend micro-longs over a sorted (t, q, v) array.")
case class HoltFold(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (SmoothFolds.InTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"holt_fold requires array<struct<bigint, bigint, double>>, got " +
        child.dataType.simpleString)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("q", LongType, nullable = false),
    StructField("l", LongType, nullable = false),
    StructField("b", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "holt_fold"

  override protected def nullSafeEval(input: Any): Any =
    HoltFold.fold(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HoltFold.fold($c);")

  override protected def withNewChildInternal(newChild: Expression): HoltFold =
    copy(child = newChild)
}

object HoltFold {
  import SmoothFolds.roundL

  def fold(evs: ArrayData): ArrayData = {
    val m = evs.numElements()
    val out = new Array[Any](m)
    var lvl = 0L
    var trd = 0L
    var started = false
    var i = 0
    while (i < m) {
      val r = evs.getStruct(i, 3)
      val q = r.getLong(1)
      val v = r.getDouble(2)
      val lvlNew =
        if (!started) roundL(v * 1000000.0)
        else roundL(0.5 * v * 1000000.0 + 0.5 * (lvl + trd).toDouble)
      val trdNew =
        if (!started) 0L
        else roundL(0.5 * (lvlNew - lvl).toDouble + 0.5 * trd.toDouble)
      out(i) = new GenericInternalRow(Array[Any](q, lvlNew, trdNew))
      lvl = lvlNew
      trd = trdNew
      started = true
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Holt-Winters additive (α = β = γ = 1/2, seasonal period `period` by
  * arrival index):
  *   y6  = round(vₜ·1e6)                                  (a double)
  *   lₜ  = y₀6 first, else round(0.5·(y6 − (double)s_{t−p}) +
  *                               0.5·(double)(lₜ₋₁ + bₜ₋₁))
  *   bₜ  = 0 first, else round(0.5·(double)(lₜ − lₜ₋₁) +
  *                             0.5·(double)bₜ₋₁)
  *   sₜ  = round(0.5·(y6 − (double)lₜ) + 0.5·(double)s_{t−p})
  * with the seasonal ring initialized to zeros. Returns
  * array<struct<q, l, b, s>> per event, in order.
  */
@ExpressionDescription(
  usage = "_FUNC_(evs, period) - per-event Holt-Winters(1/2) level/trend/seasonal micro-longs.")
case class HoltWintersFold(child: Expression, period: Int)
    extends UnaryExpression {
  require(period >= 2, s"holt_winters_fold needs period >= 2, got $period")

  override def checkInputDataTypes(): TypeCheckResult =
    if (SmoothFolds.InTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"holt_winters_fold requires array<struct<bigint, bigint, double>>, " +
        s"got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("q", LongType, nullable = false),
    StructField("l", LongType, nullable = false),
    StructField("b", LongType, nullable = false),
    StructField("s", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "holt_winters_fold"

  override protected def nullSafeEval(input: Any): Any =
    HoltWintersFold.fold(input.asInstanceOf[ArrayData], period)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.HoltWintersFold.fold($c, $period);")

  override protected def withNewChildInternal(
      newChild: Expression): HoltWintersFold = copy(child = newChild)
}

object HoltWintersFold {
  import SmoothFolds.{roundD, roundL}

  def fold(evs: ArrayData, period: Int): ArrayData = {
    val m = evs.numElements()
    val out = new Array[Any](m)
    val seas = new Array[Long](period)
    var lvl = 0L
    var trd = 0L
    var t = 0
    var started = false
    var i = 0
    while (i < m) {
      val r = evs.getStruct(i, 3)
      val q = r.getLong(1)
      val v = r.getDouble(2)
      val slot = t % period
      val sPrev = seas(slot)
      val y6 = roundD(v * 1000000.0)
      val lvlNew =
        if (!started) y6.toLong
        else roundL(0.5 * (y6 - sPrev.toDouble) + 0.5 * (lvl + trd).toDouble)
      val trdNew =
        if (!started) 0L
        else roundL(0.5 * (lvlNew - lvl).toDouble + 0.5 * trd.toDouble)
      val sNew = roundL(0.5 * (y6 - lvlNew.toDouble) + 0.5 * sPrev.toDouble)
      out(i) = new GenericInternalRow(Array[Any](q, lvlNew, trdNew, sNew))
      seas(slot) = sNew
      lvl = lvlNew
      trd = trdNew
      t += 1
      started = true
      i += 1
    }
    new GenericArrayData(out)
  }
}
