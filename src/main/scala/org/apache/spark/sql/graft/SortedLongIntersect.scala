package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** |A ∩ B| of two SORTED-ascending distinct long arrays as one merge
  * scan — the exact-verify hot path of near-dup detection. The string
  * formulation (array_distinct + array_intersect over token arrays)
  * re-builds hash sets of UTF8 strings for every candidate PAIR; with
  * tokens hashed once at tokenization and kept sorted, the per-pair
  * cost drops to an O(n+m) primitive walk with no allocation.
  *
  * Inputs NOT sorted ascending give an undefined (too-small) count —
  * callers own the sort_array(array_distinct(…)) contract; duplicates
  * within one side would be counted once per match-run start, so keep
  * the inputs distinct (the evaluator also skips equal neighbours
  * defensively, making duplicate inputs count once, matching set
  * semantics as long as both sides are sorted). */
case class SortedLongIntersect(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_long_intersect"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedLongIntersect.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"org.apache.spark.sql.graft.SortedLongIntersect.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersect =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersect {
  def count(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        c += 1
        // skip any equal run on both sides: set semantics even if a
        // caller passes non-distinct (but sorted) input
        val v = x
        while (i < n && a.getLong(i) == v) i += 1
        while (j < m && b.getLong(j) == v) j += 1
      }
    }
    c
  }
}
