package graft.expressions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count estimate as a native one-pass
  * aggregate: each buffer keeps only the k lexicographically smallest
  * DISTINCT md5 hex digests of the input, so partial aggregation ships
  * at most k short strings per group per partition — versus the
  * composable formulation (distinct → window rank), which shuffles
  * EVERY distinct hash to rank them. Same estimate, bit-identical:
  * the k-th smallest digest is a pure function of the value set, so the
  * result still hash-matches the DuckDB oracle.
  *
  * Returns (k−1)/u_k where u_k = the k-th smallest digest's first 8 hex
  * chars as a fraction of 2^32; null when the group has fewer than k
  * distinct values (the caller filters — such groups are exactly
  * countable anyway).
  *
  * The estimator needs a buffer with per-group state and merge
  * semantics, which is what `TypedImperativeAggregate` is for — a plain
  * `Expression` (vec_dot, bit_hamming) has no state, and a Scala UDAF
  * would box every row.
  */
@ExpressionDescription(
  usage = "_FUNC_(expr, k) - KMV estimate of distinct count from the k smallest md5 digests.")
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  require(k >= 2, "kmv_distinct requires k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct requires a string input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  private def add(buf: java.util.TreeSet[String], h: String): Unit = {
    // keep only the k smallest: skip anything not smaller than the
    // current k-th once the buffer is full (TreeSet dedupes ties)
    if (buf.size < k) { buf.add(h); () }
    else if (h.compareTo(buf.last) < 0) {
      if (buf.add(h)) buf.pollLast()
      ()
    }
  }

  override def update(
      buf: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) add(buf, md5Hex(v.toString))
    buf
  }

  override def merge(
      buf: java.util.TreeSet[String],
      other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[String]): Any =
    if (buf.size < k) null
    else {
      val kth = buf.last
      val u = java.lang.Long.parseLong(kth.substring(0, 8), 16).toDouble / 4294967296.0
      (k - 1) / u
    }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(buf.size * 33)
    val it = buf.iterator()
    while (it.hasNext) { sb.append(it.next()); sb.append('\n') }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val buf = createAggregationBuffer()
    val s = new String(bytes, StandardCharsets.UTF_8)
    if (s.nonEmpty) s.split('\n').foreach(h => if (h.nonEmpty) buf.add(h))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
}
