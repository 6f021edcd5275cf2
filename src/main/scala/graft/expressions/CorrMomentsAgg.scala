package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** The pairwise-correlation moment pass (`ProfileOps.corrCard`) as ONE
  * native aggregate over exact micro-unit longs.
  *
  * The composable form computes, per row, k self-products and
  * k(k−1)/2 cross-products of `decimal(18,6)` values and folds them
  * into `decimal(38,12)` sums — every product and every running sum
  * above 18 digits of precision leaves Spark's compact (single long)
  * decimal representation and allocates+computes through
  * `java.math.BigDecimal`. For k=3 that is 9 BigDecimal multiplies and
  * 10 wide-decimal accumulator updates per row — the whole cost of the
  * query (the scan reads 3 doubles).
  *
  * A `decimal(18,6)` is exactly its unscaled long (micro-units), so
  * every moment is exact integer arithmetic:
  *
  *   Σ v            = Σ m · 10⁻⁶          (scale-6 integer sum)
  *   Σ v_a · v_b    = Σ m_a·m_b · 10⁻¹²   (scale-12 integer sum)
  *
  * Products of micro-longs overflow 64 bits (a squared price is
  * ~10²²), so sums accumulate in 128 bits: (hi, lo) two's-complement
  * pairs via `Math.multiplyHigh` + carry — fixed-size state, no
  * allocation per row. `eval` converts each 128-bit integer back to a
  * `Decimal` at the EXACT precision/scale Spark's `sum` would produce
  * (decimal(28,6) for Σv, decimal(38,12) for the products), so the
  * downstream Pearson arithmetic — `cast("double")` then the fixed
  * double expression — consumes bit-identical values
  * (CorrMomentsSpec pins agg == composed sums on random data,
  * including per-column nulls and the all-null → null sums edge).
  *
  * Null semantics replicate the composable sums exactly: a null
  * `v(c)` row skips that column's Σv/Σv² and every cross term
  * involving it (a null operand nulls the product), `n` counts ALL
  * rows (`count(lit(1))`), and a column with zero non-null rows yields
  * null sums. Children are the same `round(x,6) :: decimal(18,6)`
  * expressions the composable form aggregates, evaluated once per row.
  *
  * Input: k ≥ 2 decimal(18,6) columns. Output struct (field order):
  * n, sx_i (k), sxx_i (k), sxy_ij (i<j in `combinations(2)` order) —
  * the names carry the caller's column names so `select("mm.*")`
  * reproduces the composable aggregation's column list.
  */
@ExpressionDescription(
  usage = "_FUNC_(c1, c2, ...) - exact decimal correlation moments (n, sums, cross sums).")
case class CorrMomentsAgg(
    children: Seq[Expression],
    colNames: Seq[String],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val k = children.size
  require(k >= 2, "corr_moments needs at least two columns")
  require(colNames.size == k, "corr_moments: one name per column")

  private val nPairs = k * (k - 1) / 2
  // buffer layout: [0]=n, [1..k]=ci, [k+1..k+nPairs]=cij,
  // then (hi,lo) pairs: sx_i, sxx_i, sxy_ij
  private val sumsBase = 1 + k + nPairs
  private val bufLen = sumsBase + 2 * (2 * k + nPairs)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DecimalType(18, 6)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"corr_moments requires decimal(18,6) inputs, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def nullable: Boolean = false
  override def prettyName: String = "corr_moments"

  /** i<j pairs in Seq.combinations(2) order — the composable form's
    * `cols.combinations(2)` ordering, so sxy field order matches.
    */
  private val pairIdx: IndexedSeq[(Int, Int)] =
    (0 until k).combinations(2).map { case Seq(a, b) => (a, b) }.toIndexedSeq

  override def dataType: DataType = StructType(
    StructField("n", LongType, nullable = false) +:
      (colNames.map(c => StructField(s"sx_$c", DecimalType(28, 6))) ++
        colNames.map(c => StructField(s"sxx_$c", DecimalType(38, 12))) ++
        pairIdx.map { case (a, b) =>
          StructField(s"sxy_${colNames(a)}_${colNames(b)}", DecimalType(38, 12))
        }))

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  // scratch for the per-row unscaled micro values; update() is
  // single-threaded per buffer, and the aggregate instance is
  // per-task-thread, so instance scratch is safe — but keep it
  // thread-local anyway: one instance can be shared by concurrent
  // tasks of the same stage.
  @transient private lazy val scratch = new ThreadLocal[(Array[Long], Array[Boolean])] {
    override def initialValue(): (Array[Long], Array[Boolean]) =
      (new Array[Long](k), new Array[Boolean](k))
  }

  /** Add signed 128-bit value (vh, vl) into buf at (hi, lo) slot `s`
    * (hi index sumsBase+2s, lo sumsBase+2s+1; lo unsigned).
    */
  private def add128(buf: Array[Long], s: Int, vh: Long, vl: Long): Unit = {
    val i = sumsBase + 2 * s
    val lo = buf(i + 1) + vl
    // unsigned overflow iff result < either operand
    val carry = if (java.lang.Long.compareUnsigned(lo, vl) < 0) 1L else 0L
    buf(i + 1) = lo
    buf(i) = buf(i) + vh + carry
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    buf(0) += 1L
    val (m, ok) = scratch.get()
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      if (v == null) ok(i) = false
      else {
        ok(i) = true
        m(i) = v.asInstanceOf[org.apache.spark.sql.types.Decimal].toUnscaledLong
      }
      i += 1
    }
    i = 0
    while (i < k) {
      if (ok(i)) {
        buf(1 + i) += 1L
        val mi = m(i)
        // Σv: sign-extended 64→128 add
        add128(buf, i, mi >> 63, mi)
        // Σv²
        add128(buf, k + i, Math.multiplyHigh(mi, mi), mi * mi)
      }
      i += 1
    }
    var p = 0
    while (p < nPairs) {
      val (a, b) = pairIdx(p)
      if (ok(a) && ok(b)) {
        buf(1 + k + p) += 1L
        add128(buf, 2 * k + p, Math.multiplyHigh(m(a), m(b)), m(a) * m(b))
      }
      p += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < sumsBase) { buf(i) += other(i); i += 1 }
    var s = 0
    while (s < 2 * k + nPairs) {
      add128(buf, s, other(sumsBase + 2 * s), other(sumsBase + 2 * s + 1))
      s += 1
    }
    buf
  }

  private def dec(buf: Array[Long], s: Int, scale: Int, precision: Int): Decimal = {
    val hi = buf(sumsBase + 2 * s)
    val lo = buf(sumsBase + 2 * s + 1)
    val bi = java.math.BigInteger.valueOf(hi).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
    Decimal(new java.math.BigDecimal(bi, scale), precision, scale)
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](1 + 2 * k + nPairs)
    out(0) = buf(0)
    var i = 0
    while (i < k) {
      if (buf(1 + i) > 0L) {
        out(1 + i) = dec(buf, i, 6, 28)
        out(1 + k + i) = dec(buf, k + i, 12, 38)
      }
      i += 1
    }
    var p = 0
    while (p < nPairs) {
      if (buf(1 + k + p) > 0L) out(1 + 2 * k + p) = dec(buf, 2 * k + p, 12, 38)
      p += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bufLen * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bufLen)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CorrMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CorrMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CorrMomentsAgg =
    copy(children = newChildren)
}
