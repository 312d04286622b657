package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native Catalyst aggregate —
  * approximate top-k frequent items over a 100 TB token stream WITHOUT
  * shuffling the full (token, count) space.
  *
  * The exact plan (explode → groupBy token → count → top-k) shuffles
  * every distinct token; on a web-scale corpus that's billions of
  * grouping keys moved for a 20-row answer. This sketch keeps at most
  * `k` counters per partition, merges associatively (map-side partial
  * aggregation applies — each partition ships ≤ k entries), and
  * guarantees: every item with true frequency > N/(k+1) survives, and
  * each reported count is an UNDERCOUNT by at most N/(k+1) (Misra &
  * Gries 1982; merge rule from Agarwal et al., "Mergeable Summaries",
  * PODS 2012). Size k ≈ 10× the wanted top count and rank order of
  * well-separated heavy items is preserved — HeavyHittersSpec pins
  * this against the exact plan.
  *
  * Update: hit → +1; miss with room → insert 1; miss when full →
  * decrement ALL counters (drop zeros) — the classical O(k) amortized
  * step. Merge: sum counters, then subtract the (k+1)-th largest and
  * drop non-positives, restoring the ≤ k invariant with the same error
  * bound. Eval emits array<struct<token,count>> sorted (count desc,
  * token asc) for deterministic output.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k > 0, s"approx_top_k: k must be positive, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("count", LongType, nullable = false))))
  override def prettyName: String = "approx_top_k_mg"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    new mutable.HashMap[UTF8String, Long]

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None if buf.size < k =>
          // copy: the evaluated UTF8String may alias a reused row buffer
          buf.update(UTF8String.fromBytes(s.getBytes), 1L)
        case None =>
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.filterInPlace((_, c) => c > 0L)
      }
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[UTF8String, Long],
      b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (t, c) => b1.update(t, b1.getOrElse(t, 0L) + c) }
    if (b1.size > k) {
      // subtract the (k+1)-th largest counter from all, drop ≤ 0:
      // at most k survive and total error stays ≤ N/(k+1) per stream
      val cut = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      b1.mapValuesInPlace((_, c) => c - cut)
      b1.filterInPlace((_, c) => c > 0L)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    implicit val utf8Ord: Ordering[UTF8String] =
      (a: UTF8String, b: UTF8String) => a.compareTo(b)
    val rows = buf.toArray
      .sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => InternalRow(t, c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new mutable.HashMap[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
