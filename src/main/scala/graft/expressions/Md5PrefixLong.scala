package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's deterministic hash draw,
  * `conv(substring(md5(s), 1, nHex), 16, 10) :: long`, as ONE native
  * codegen expression over the digest bytes.
  *
  * The composed form is the suite-wide convention for engine-replayable
  * uniform draws (feature hashing, winnow/CDC gram fingerprints, CMS
  * buckets, HLL draws, sampling/split draws, seeded shuffles, DP noise,
  * checksums — 12 call sites), and it pays a string round trip per row
  * per draw: the 16-byte digest is hex-encoded to a 32-char string,
  * substring copies a prefix, `conv` parses it to a long AND formats
  * the result back into a decimal string, and the final cast parses
  * that string again. Only the digest and the first ⌈nHex/2⌉ bytes were
  * ever needed. This expression computes the same value — the first
  * `nHex` hex digits (nibbles) of the MD5 digest read as an unsigned
  * base-16 integer — straight from the digest, with a thread-local
  * MessageDigest (the composed form constructs one per row inside
  * Spark's own `Md5`).
  *
  * Bit-equivalence with the composed form (property-pinned in
  * Md5PrefixLongSpec): identical bytes enter MD5 (the child is the same
  * string column; Spark's md5 hashes its UTF-8 bytes), the hex string
  * is just the digest's nibbles, so its first-nHex prefix as an
  * unsigned integer IS the nibble fold below; nHex ≤ 15 keeps the value
  * under 2^60, so the long cast never wraps. Nulls propagate exactly as
  * through md5/conv/cast (all null-in → null-out).
  */
@ExpressionDescription(
  usage = "_FUNC_(s, nHex) - first nHex hex digits of md5(s) as an unsigned long.")
case class Md5PrefixLong(child: Expression, nHex: Int)
    extends UnaryExpression {

  require(nHex >= 1 && nHex <= 15,
    s"md5_prefix_long supports 1..15 hex digits, got $nHex")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix_long requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"

  override protected def nullSafeEval(s: Any): Any =
    Md5PrefixLong.hashPrefix(s.asInstanceOf[UTF8String].getBytes, nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.expressions.Md5PrefixLong.hashPrefix($s.getBytes(), $nHex)")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

object Md5PrefixLong {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First `nHex` nibbles of md5(bytes) as an unsigned long — exactly
    * `conv(substring(md5hex, 1, nHex), 16, 10)` for nHex ≤ 15.
    */
  def hashPrefix(bytes: Array[Byte], nHex: Int): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < nHex) {
      val b = d(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }

  /** Column form: the native draw over an already-string column. Call
    * sites keep their own concat/cast shape and pass it here unchanged.
    */
  def draw(s: Column, nHex: Int): Column =
    ColumnBridge.column(Md5PrefixLong(ColumnBridge.expression(s), nHex))
}
