package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Table-property-driven spatial index — the reference's
  * `TBLPROPERTIES('SPATIAL_INDEX'='mygeohash',
  * 'SPATIAL_INDEX.mygeohash.type'='geohash',
  * 'SPATIAL_INDEX.mygeohash.sourcecolumns'='longitude, latitude')`
  * (spatial-index-guide.md:34-56, CarbonTable's index-handler
  * properties): the user never writes the index column — CREATE adds
  * it to the schema, every load DERIVES it from the source lat/lng
  * columns, and polygon filters use it implicitly for range pruning.
  *
  * The generated id is the morton/z-order geoId ([[Geo.latLngToGeoId]],
  * a codegen'd native expression); with the table sorted on it
  * (CREATE defaults the sort when none is given, as the reference
  * guide recommends) bbox BETWEEN disjunctions prune at segment stats,
  * file stats, and parquet row groups — the four-rung ladder — before
  * the exact ray-cast residual runs.
  */
object SpatialIndex {

  /** Parsed spec: generated column `name` derived from (lngCol, latCol)
    * — longitude FIRST in `sourcecolumns`, per the reference guide. */
  final case class Spec(name: String, lngCol: String, latCol: String)

  /** Case-insensitive property parse; None when the table has no
    * spatial index. Fails loudly on a malformed declaration. */
  def of(properties: Map[String, String]): Option[Spec] = {
    val byLower = properties.map { case (k, v) => k.toLowerCase -> v }
    byLower.get("spatial_index").map { name0 =>
      val name = name0.trim
      require(name.nonEmpty, "SPATIAL_INDEX: empty index name")
      val tpe = byLower.getOrElse(s"spatial_index.${name.toLowerCase}.type", "geohash")
      require(tpe.equalsIgnoreCase("geohash"),
        s"SPATIAL_INDEX.$name.type: only 'geohash' is supported, got '$tpe'")
      val src = byLower.getOrElse(s"spatial_index.${name.toLowerCase}.sourcecolumns",
        throw new IllegalArgumentException(
          s"SPATIAL_INDEX.$name.sourcecolumns is required ('lngCol, latCol')"))
      src.split(",").map(_.trim).filter(_.nonEmpty) match {
        case Array(lng, lat) => Spec(name, lng, lat)
        case other => throw new IllegalArgumentException(
          s"SPATIAL_INDEX.$name.sourcecolumns must name exactly two columns " +
            s"('lngCol, latCol'), got '${other.mkString(",")}'")
      }
    }
  }

  /** CREATE-side schema: append the generated LongType column when the
    * user didn't declare it; validate the source columns exist. */
  def addToSchema(schema: StructType, spec: Spec): StructType = {
    Seq(spec.lngCol, spec.latCol).foreach { c =>
      require(schema.fieldNames.contains(c),
        s"SPATIAL_INDEX source column '$c' not in schema " +
          s"(${schema.fieldNames.mkString(",")})")
    }
    if (schema.fieldNames.contains(spec.name)) schema
    else StructType(schema.fields :+ StructField(spec.name, LongType, nullable = false))
  }

  /** Load-side derivation: add the generated column when the incoming
    * batch doesn't carry it (the normal case — source data has only
    * lat/lng). A batch that already has the column is passed through
    * (compaction rewrites, CTAS from another spatial table). */
  def derive(df: DataFrame, spec: Spec): DataFrame =
    if (df.columns.exists(_.equalsIgnoreCase(spec.name))) df
    else df.withColumn(spec.name,
      Geo.latLngToGeoId(col(spec.latCol), col(spec.lngCol)))

  /** Implicit-index IN_POLYGON (reference InPolygonUDF — carbon injects
    * the index column; here the table supplies its spec): morton-range
    * BETWEEN disjunctions on the STORED id (segment/file/row-group
    * pruning) + the exact ray-cast residual on the source columns. */
  def inPolygonFilter(spec: Spec, polygon: String, maxRanges: Int = 64): Column = {
    val pts = Geo.parsePolygon(polygon)
    require(pts.nonEmpty, s"empty polygon: $polygon")
    val lats = pts.map(_._1); val lngs = pts.map(_._2)
    val ranges = Geo.bboxRanges(lats.min, lats.max, lngs.min, lngs.max, maxRanges)
    Geo.geoIdInRanges(col(spec.name), ranges) &&
      Geo.inPolygon(col(spec.latCol), col(spec.lngCol), pts)
  }
}
