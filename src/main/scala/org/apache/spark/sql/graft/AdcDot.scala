package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** ADC (asymmetric distance computation) lookup-sum as a native codegen
  * expression: `Σ_b lut[b][codes[b]]` — the PQ candidate-scoring inner
  * loop. The HOF formulation (`aggregate(sequence(...), element_at ∘
  * element_at)`) is interpreted per block per candidate pair; at
  * |Q|×cell-candidates pairs × M blocks that interpretation dominates
  * the IVF-PQ probe stage. Summation order is ascending b, matching the
  * HOF fold it replaces, so scores are bit-identical. */
case class AdcDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ArrayType(DoubleType)), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    AdcDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"org.apache.spark.sql.graft.AdcDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDot =
    copy(left = newLeft, right = newRight)
}

object AdcDot {
  def dot(lut: ArrayData, codes: ArrayData): Double = {
    val m = codes.numElements()
    if (m != lut.numElements())
      throw new IllegalArgumentException(
        s"adc_dot: ${lut.numElements()} lookup tables for $m code blocks — " +
          "codes and LUT must share the block count M")
    var acc = 0.0
    var b = 0
    while (b < m) {
      acc += lut.getArray(b).getDouble(codes.getInt(b))
      b += 1
    }
    acc
  }
}
