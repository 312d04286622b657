package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Exact integer dot product of two long vectors as a native codegen
  * expression. The HOF formulation (`aggregate(zip_with(...))`) is
  * interpreted per element per row — at 4M candidate pairs × dim 64
  * that interpretation dominates the ANN/near-dup runtime; this runs a
  * tight JIT'd loop over the unsafe array data instead (null elements
  * are read as 0 — quantized embeddings are null-free by construction). */
case class LongVectorDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LongVectorDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"org.apache.spark.sql.graft.LongVectorDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVectorDot =
    copy(left = newLeft, right = newRight)
}

object LongVectorDot {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"long_vector_dot: vector length mismatch ($n vs ${b.numElements()}) — " +
          "query and corpus embeddings must share a dimension")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}
