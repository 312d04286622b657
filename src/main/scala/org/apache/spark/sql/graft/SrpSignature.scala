package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** Sign-random-projection bucket signature as a native codegen
  * expression: `numPlanes` hyperplane dots starting at plane
  * `planeOffset` (the multi-table band hook), packed MSB-first into one
  * long — bit-identical to the former nested-`aggregate` HOF fold, which
  * was interpreted per plane per row (element_at over the plane-matrix
  * literal + a boxed zip_with per dot) and dominated the LSH signature
  * stage. The plane matrix rides along as a flat constant
  * (`totalPlanes × dim` row-major doubles), referenced once per
  * generated class, looped tight.
  *
  * left: quantized vector (array<long>); right: plane offset (int/long). */
case class SrpSignature(left: Expression, right: Expression,
    planes: IndexedSeq[Double], numPlanes: Int)
  extends BinaryExpression with ExpectsInputTypes {

  @transient private lazy val planesArr: Array[Double] = planes.toArray

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_signature"

  override protected def nullSafeEval(qv: Any, off: Any): Any =
    SrpEval.signature(qv.asInstanceOf[ArrayData], planesArr, numPlanes,
      off.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("srpPlanes", planesArr, "double[]")
    // NB the evaluator lives in a DIFFERENTLY-NAMED object: a companion
    // of this case class would get no static forwarder (the class
    // already has eval(InternalRow)), and Janino would resolve the
    // qualified call to the instance method and fail the whole stage
    // into interpreted mode
    defineCodeGen(ctx, ev, (qv, off) =>
      s"org.apache.spark.sql.graft.SrpEval.signature($qv, $planesRef, $numPlanes, $off)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SrpSignature =
    copy(left = newLeft, right = newRight)
}

/** Static evaluator (top-level object ⇒ Java static forwarder Janino
  * can call; see the naming note in [[SrpSignature.doGenCode]]). */
object SrpEval {
  /** MSB-first fold of sign bits of `numPlanes` consecutive plane dots.
    * Plane p's components live at `planes[p*dim .. p*dim+dim)`. */
  def signature(qv: ArrayData, planes: Array[Double], numPlanes: Int,
      planeOffset: Int): Long = {
    val dim = qv.numElements()
    val need = (planeOffset + numPlanes) * dim
    if (need > planes.length)
      throw new IllegalArgumentException(
        s"srp_signature: plane band [$planeOffset, ${planeOffset + numPlanes})" +
          s" × dim $dim exceeds the ${planes.length}-element plane matrix — " +
          "vector dimension must match the one the planes were built for")
    var sig = 0L
    var p = planeOffset
    while (p < planeOffset + numPlanes) {
      var dot = 0.0
      val base = p * dim
      var i = 0
      while (i < dim) {
        dot += qv.getLong(i).toDouble * planes(base + i)
        i += 1
      }
      sig = sig * 2 + (if (dot >= 0) 1L else 0L)
      p += 1
    }
    sig
  }
}
