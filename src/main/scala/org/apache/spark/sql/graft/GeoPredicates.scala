package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, DoubleType, LongType}

/** Static evaluation engines for the geo predicates — called from both
  * interpreted eval and generated code (top-level object ⇒ Java static
  * forwarders, so Janino can call them unqualified by MODULE$).
  * Replaces the former `udf()` ray-cast / binary-search residuals
  * (reference keeps polygon verify as an expression too:
  * geo/scan/expression/PolygonExpression.java:50). */
object GeoEval {
  /** ray-casting point-in-polygon over parallel coordinate arrays. */
  def rayCastConst(lat: Double, lng: Double,
      lats: Array[Double], lngs: Array[Double]): Boolean = {
    var inside = false
    var i = 0
    val n = lats.length
    while (i < n) {
      val j = if (i + 1 == n) 0 else i + 1
      val y1 = lats(i); val x1 = lngs(i)
      val y2 = lats(j); val x2 = lngs(j)
      if (((y1 > lat) != (y2 > lat)) &&
        (lng < (x2 - x1) * (lat - y1) / (y2 - y1) + x1)) inside = !inside
      i += 1
    }
    inside
  }

  /** per-row polygon form (polygonJoin residual: the polygon arrives as
    * two array columns from the broadcast side). */
  def rayCast(lat: Double, lng: Double, lats: ArrayData, lngs: ArrayData): Boolean = {
    var inside = false
    var i = 0
    val n = lats.numElements()
    while (i < n) {
      val j = if (i + 1 == n) 0 else i + 1
      val y1 = lats.getDouble(i); val x1 = lngs.getDouble(i)
      val y2 = lats.getDouble(j); val x2 = lngs.getDouble(j)
      if (((y1 > lat) != (y2 > lat)) &&
        (lng < (x2 - x1) * (lat - y1) / (y2 - y1) + x1)) inside = !inside
      i += 1
    }
    inside
  }

  /** geoId ∈ sorted disjoint ranges via one binary search. */
  def inRanges(g: Long, los: Array[Long], his: Array[Long]): Boolean = {
    var lo = 0; var hi = los.length - 1; var idx = -1
    while (lo <= hi) {
      val m = (lo + hi) >>> 1
      if (los(m) <= g) { idx = m; lo = m + 1 } else hi = m - 1
    }
    idx >= 0 && g <= his(idx)
  }

  /** within `buffer` degrees of ANY polyline (each line as parallel
    * arrays; flat-earth segment distance — see Geo.pointToSegment). */
  def nearAnyPolyline(lat: Double, lng: Double,
      lineLats: Array[Array[Double]], lineLngs: Array[Array[Double]],
      buffer: Double): Boolean = {
    var l = 0
    while (l < lineLats.length) {
      val lats = lineLats(l); val lngs = lineLngs(l)
      var i = 0
      while (i + 1 < lats.length) {
        if (graft.geo.Geo.pointToSegment(lat, lng,
          lats(i), lngs(i), lats(i + 1), lngs(i + 1)) <= buffer) return true
        i += 1
      }
      l += 1
    }
    false
  }
}

/** Codegen'd point-in-polygon against a CONSTANT polygon — the
  * `in_polygon` residual after range pruning. The polygon ships once as
  * two reference arrays; each row costs one static ray-cast call inside
  * whole-stage codegen (no per-row boxing / ser-de like the former
  * Scala UDF). */
case class PointInPolygon(left: Expression, right: Expression,
    lats: Seq[Double], lngs: Seq[Double])
  extends BinaryExpression with ExpectsInputTypes {

  require(lats.size == lngs.size && lats.size >= 3,
    s"polygon needs >= 3 points, got ${lats.size}")
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "in_polygon"

  @transient private lazy val latsArr = lats.toArray
  @transient private lazy val lngsArr = lngs.toArray

  override protected def nullSafeEval(lat: Any, lng: Any): Any =
    GeoEval.rayCastConst(lat.asInstanceOf[Double], lng.asInstanceOf[Double],
      latsArr, lngsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = ctx.addReferenceObj("polyLats", latsArr, "double[]")
    val ln = ctx.addReferenceObj("polyLngs", lngsArr, "double[]")
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.GeoEval.rayCastConst($a, $b, $la, $ln)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PointInPolygon =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd geoId-in-ranges membership (single evaluation + binary
  * search; the range list ships once as two reference arrays). */
case class GeoIdInRanges(child: Expression, los: Seq[Long], his: Seq[Long])
  extends UnaryExpression with ExpectsInputTypes {

  require(los.size == his.size && los.nonEmpty, "empty range list")
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "geo_id_in_ranges"

  @transient private lazy val losArr = los.toArray
  @transient private lazy val hisArr = his.toArray

  override protected def nullSafeEval(g: Any): Any =
    GeoEval.inRanges(g.asInstanceOf[Long], losArr, hisArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lo = ctx.addReferenceObj("rangeLos", losArr, "long[]")
    val hi = ctx.addReferenceObj("rangeHis", hisArr, "long[]")
    defineCodeGen(ctx, ev, g =>
      s"org.apache.spark.sql.graft.GeoEval.inRanges($g, $lo, $hi)")
  }

  override protected def withNewChildInternal(newChild: Expression): GeoIdInRanges =
    copy(child = newChild)
}

/** Codegen'd point-in-polygon where the polygon VARIES PER ROW (the
  * polygonJoin residual: coordinates come from the broadcast side's
  * array columns). */
case class PointInPolygonVar(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
  extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, DoubleType, ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "in_polygon_var"

  override protected def nullSafeEval(lat: Any, lng: Any, lats: Any, lngs: Any): Any =
    GeoEval.rayCast(lat.asInstanceOf[Double], lng.asInstanceOf[Double],
      lats.asInstanceOf[ArrayData], lngs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"org.apache.spark.sql.graft.GeoEval.rayCast($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): PointInPolygonVar =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Codegen'd polyline-buffer membership against CONSTANT polylines. */
case class PointNearPolylines(left: Expression, right: Expression,
    lineLats: Seq[Seq[Double]], lineLngs: Seq[Seq[Double]], buffer: Double)
  extends BinaryExpression with ExpectsInputTypes {

  require(lineLats.size == lineLngs.size && lineLats.nonEmpty, "no polylines")
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "in_polyline_list"

  @transient private lazy val latsArr = lineLats.map(_.toArray).toArray
  @transient private lazy val lngsArr = lineLngs.map(_.toArray).toArray

  override protected def nullSafeEval(lat: Any, lng: Any): Any =
    GeoEval.nearAnyPolyline(lat.asInstanceOf[Double], lng.asInstanceOf[Double],
      latsArr, lngsArr, buffer)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = ctx.addReferenceObj("lineLats", latsArr, "double[][]")
    val ln = ctx.addReferenceObj("lineLngs", lngsArr, "double[][]")
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.GeoEval.nearAnyPolyline($a, $b, $la, $ln, ${buffer}D)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PointNearPolylines =
    copy(left = newLeft, right = newRight)
}
