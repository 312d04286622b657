package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First 8 bytes of md5(input) as a big-endian long, as a native codegen
  * expression.
  *
  * The portable hash ladder (MinHash seeds, SimHash bit votes, LSH band
  * keys — [[graft.ops.Dedup]]) derives every per-seed hash from two
  * 32-bit halves of one md5, chosen so a SQL oracle reproduces the
  * values bit-for-bit as `CONV(SUBSTRING(md5(x), 1|9, 8), 16, 10)`. The
  * expression form of that — md5 to a 32-char hex string, SUBSTRING,
  * then a base-16 string parse, twice per input — allocates three
  * strings per hash and dominates the signature stage of the near-dup
  * pipeline. This computes the digest once (thread-local MessageDigest,
  * no hex round-trip) and callers split the halves with plain long
  * arithmetic:
  *   a = prefix >>> 32          ≡ CONV(SUBSTRING(md5(x), 1, 8), 16, 10)
  *   b = prefix & 0xFFFFFFFF    ≡ CONV(SUBSTRING(md5(x), 9, 8), 16, 10)
  *
  * MD5 here is SEMANTIC, not an equality token: the value must match
  * the SQL `md5()` the oracle reproduces, so it cannot move to
  * [[graft.engine.format.Fp128]] (the FIPS-safe replacement used where
  * only equality matters). On a FIPS-hardened JVM this expression fails
  * exactly as Spark's own `md5()` builtin does — per-query, never at
  * scan construction.
  */
case class Md5Prefix64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix64"

  override protected def nullSafeEval(s: Any): Any =
    Md5Prefix64.prefix(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.Md5Prefix64.prefix($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix64 =
    copy(child = newChild)
}

object Md5Prefix64 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def prefix(s: UTF8String): Long = {
    val m = md.get()
    m.reset()
    val dg = m.digest(s.getBytes)
    ((dg(0) & 0xFFL) << 56) | ((dg(1) & 0xFFL) << 48) |
      ((dg(2) & 0xFFL) << 40) | ((dg(3) & 0xFFL) << 32) |
      ((dg(4) & 0xFFL) << 24) | ((dg(5) & 0xFFL) << 16) |
      ((dg(6) & 0xFFL) << 8) | (dg(7) & 0xFFL)
  }
}
