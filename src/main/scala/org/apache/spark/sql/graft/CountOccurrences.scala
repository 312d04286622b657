package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of non-overlapping left-to-right occurrences of `word` in
  * `str`, as one allocation-free indexOf scan.
  *
  * Bit-identical to the SQL counting trick
  * `(length(s) - length(replace(s, w, ''))) / length(w)` — replace
  * removes exactly the left-to-right non-overlapping matches — which
  * is what the DuckDB oracles keep using. The replace form allocates a
  * full copy of the string PER COUNTED WORD per row; the language-ID
  * row scores 15 marker words and the quality row ~8 signals, so a
  * corpus scan paid ~20 string copies per document. Here each count is
  * a tight scan over the existing UTF8String bytes (Janino calls the
  * static forwarder directly — the [[Md5Prefix64]] pattern).
  */
case class CountOccurrences(str: Expression, word: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = str
  override def right: Expression = word
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "count_occurrences"

  override protected def nullSafeEval(s: Any, w: Any): Any =
    CountOccurrences.count(s.asInstanceOf[UTF8String], w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, w) => s"org.apache.spark.sql.graft.CountOccurrences.count($s, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountOccurrences =
    copy(str = newLeft, word = newRight)
}

object CountOccurrences {
  /** Non-overlapping left-to-right match count as ONE linear byte scan.
    *
    * Byte-level matching is exact for UTF-8: the pattern's first byte
    * is a leading byte, and a leading byte can never appear inside
    * another character's continuation bytes (UTF-8 self-synchronizes),
    * so every byte-pattern match lies on a character boundary — byte
    * count == character count. NOT UTF8String.indexOf in a loop: that
    * API takes a code-point start and re-walks the string from byte 0
    * on every call, which is quadratic when matches are frequent
    * (counting spaces, the quality row's word-count signal).
    *
    * Empty word → 0, mirroring that the replace trick is never called
    * with one (it would divide by zero). */
  def count(s: UTF8String, w: UTF8String): Long = {
    val n = s.numBytes
    val m = w.numBytes
    if (m == 0 || m > n) return 0L
    val sb = s.getBaseObject
    val so = s.getBaseOffset
    val wb = w.getBaseObject
    val wo = w.getBaseOffset
    val first = org.apache.spark.unsafe.Platform.getByte(wb, wo)
    val limit = n.toLong - m
    var i = 0L
    var cnt = 0L
    while (i <= limit) {
      if (org.apache.spark.unsafe.Platform.getByte(sb, so + i) == first) {
        var j = 1
        while (j < m && org.apache.spark.unsafe.Platform.getByte(sb, so + i + j) ==
            org.apache.spark.unsafe.Platform.getByte(wb, wo + j)) j += 1
        if (j == m) { cnt += 1; i += m } else i += 1
      } else i += 1
    }
    cnt
  }
}
