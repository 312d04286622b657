package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, LongType}

/** Z-order geoId as a first-class Catalyst expression (SURVEY §4.1's
  * "custom Expression beats UDF" ladder; reference GeoHashUtils.java).
  * Lives in the spark package tree because `AbstractDataType` is
  * `private[sql]` — the reference integrates the same way.
  *
  * `doGenCode` emits one static call into the scalar engine — the
  * interleave loop runs as plain JIT'd bytecode inside whole-stage
  * codegen, with no per-row boxing (a UDF) and no ~60-node expression
  * tree (the previous shift/mask formulation). */
case class GeoIdExpression(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "lat_lng_to_geo_id"

  override protected def nullSafeEval(lat: Any, lng: Any): Any =
    graft.geo.Geo.latLngToGeoIdScalar(lat.asInstanceOf[Double], lng.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (la, ln) => s"graft.geo.Geo.latLngToGeoIdScalar($la, $ln)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GeoIdExpression =
    copy(left = newLeft, right = newRight)
}
