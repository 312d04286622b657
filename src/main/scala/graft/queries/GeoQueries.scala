package graft.queries

import graft.engine.GraftTable
import graft.geo.Geo
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Geo pack CORRECTNESS rows (reference geo/ module, SURVEY §2.6):
  * polygon join via the cell-prefilter equi-join, polygon/polyline list
  * membership, and the stored-geoId range-list pruning path.
  *
  * Oracle strategy: the DuckDB side re-states the EXACT same double
  * arithmetic (ray-casting parity, point-to-segment distance) as
  * generated SQL — every literal is CAST AS DOUBLE so both engines run
  * identical IEEE operations in identical order, making the comparison
  * hash-exact even at geometric boundaries. */
object GeoQueries {

  // deterministic synthetic points over events (same recipe as q_geo_bbox)
  private def pts(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").select(
      col("event_type"),
      ((col("user_id") % 120) - 60 + 0.5).as("lat"),
      (((col("event_id") * 7) % 360) - 180 + 0.5).as("lng"))

  private val oPts =
    """SELECT event_type,
         (user_id % 120) - 60 + 0.5 AS lat,
         ((event_id * 7) % 360) - 180 + 0.5 AS lng
       FROM events"""

  // fixed test polygons: (lat, lng) vertices, non-degenerate, inside the
  // points' lat∈[-59.5,59.5] × lng∈[-179.5,179.5] domain
  private val tri = Seq((12.3, 32.1), (18.7, 35.6), (14.2, 44.9))
  private val quad = Seq((-5.2, -60.3), (2.8, -55.1), (6.4, -40.7), (-3.9, -38.2))
  private val farTri = Seq((40.1, 100.2), (49.8, 104.4), (44.6, 112.3))

  private def oD(x: Double): String = s"CAST($x AS DOUBLE)"

  /** Ray-casting parity as SQL — term-for-term the same formula and
    * evaluation order as [[Geo.pointInPolygon]]. */
  private def oRayCast(latE: String, lngE: String, poly: Seq[(Double, Double)]): String = {
    val terms = poly.indices.map { i =>
      val (y1, x1) = poly(i)
      val (y2, x2) = poly((i + 1) % poly.size)
      s"""CASE WHEN ((${oD(y1)} > $latE) != (${oD(y2)} > $latE))
            AND ($lngE < (${oD(x2)} - ${oD(x1)}) * ($latE - ${oD(y1)}) / (${oD(y2)} - ${oD(y1)}) + ${oD(x1)})
          THEN 1 ELSE 0 END"""
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }

  /** point-to-segment distance ≤ buffer as SQL — mirrors
    * [[Geo.pointToSegment]] (t is inlined twice; IEEE ops are
    * deterministic so double evaluation is safe). */
  private def oSegDist(latE: String, lngE: String,
      a: (Double, Double), b: (Double, Double), buffer: Double): String = {
    val (ay, ax) = a; val (by, bx) = b
    val dx = s"(${oD(bx)} - ${oD(ax)})"
    val dy = s"(${oD(by)} - ${oD(ay)})"
    val len2 = s"($dx * $dx + $dy * $dy)"
    val tt = s"GREATEST(${oD(0.0)}, LEAST(${oD(1.0)}, (($lngE - ${oD(ax)}) * $dx + ($latE - ${oD(ay)}) * $dy) / $len2))"
    val cx = s"(${oD(ax)} + $tt * $dx)"
    val cy = s"(${oD(ay)} + $tt * $dy)"
    s"(sqrt(($lngE - $cx) * ($lngE - $cx) + ($latE - $cy) * ($latE - $cy)) <= ${oD(buffer)})"
  }

  private val line = Seq((20.5, -100.3), (25.7, -90.2), (33.1, -85.6))
  private val lineBuffer = 3.0

  /** events points with a STORED geoId, loaded as 3 geoId-range segments
    * sorted by geo_id — the fixture for range-list segment pruning. */
  def geopts(s: SparkSession, d: String): GraftTable = {
    val base = new java.io.File(d).getName
    val p = s"${Fixtures.root}/$base/geopts"
    val layout = new graft.engine.format.TableLayout(p, s.sessionState.newHadoopConf())
    GeoQueries.synchronized {
      if (layout.exists && layout.readStatus().visible.size == 3) GraftTable.at(s, p)
      else {
        if (layout.exists) GraftTable.drop(s, p)
        // persist: the geoId expression is ~20 shift/mask terms per row —
        // compute it once, not once per range-segment insert
        val src = pts(s, d).withColumn("geo_id",
          Geo.latLngToGeoId(col("lat"), col("lng"))).persist()
        try {
          val tbl = GraftTable.create(s, p, src.schema, Seq("geo_id"))
          val third = (1L << (2 * Geo.Bits)) / 3
          tbl.insert(src.filter(col("geo_id") < third))
          tbl.insert(src.filter(col("geo_id") >= third && col("geo_id") < 2 * third))
          tbl.insert(src.filter(col("geo_id") >= 2 * third))
          tbl
        } finally src.unpersist()
      }
    }
  }

  def queries: Map[String, QFn] = Map(
    // polygon join: covering-cell broadcast equi-join + exact residual —
    // NOT a nested loop (plan-asserted in GeoSpec)
    "q_geo_polyjoin" -> ((s, d) =>
      Geo.polygonJoin(pts(s, d), "lat", "lng",
        Seq("tri" -> tri, "quad" -> quad, "far" -> farTri))
        .groupBy("poly_name", "event_type").agg(count(lit(1)).as("cnt"))),

    // IN_POLYGON_LIST (union of polygons)
    "q_geo_polylist" -> ((s, d) =>
      pts(s, d)
        .filter(Geo.inPolygonList(col("lat"), col("lng"), Seq(tri, quad, farTri)))
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))),

    // IN_POLYLINE_LIST (buffered corridor membership)
    "q_geo_polyline" -> ((s, d) =>
      pts(s, d)
        .filter(Geo.inPolylineList(col("lat"), col("lng"), Seq(line), lineBuffer))
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))),

    // stored geoId + IN_POLYGON_RANGE_LIST: BETWEEN disjunctions on the
    // sorted geo_id column push to segment stats + parquet min/max
    // (segment skip is asserted in GeoSpec); exact bbox residual on top
    "q_geo_storedid" -> ((s, d) => {
      val ranges = Geo.bboxRanges(10, 20, 30, 40, maxRanges = 64)
      geopts(s, d).read
        .filter(Geo.geoIdInRanges(col("geo_id"), ranges))
        .filter(col("lat").between(10, 20) && col("lng").between(30, 40))
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q_geo_polyjoin" -> {
      val arms = Seq("tri" -> tri, "quad" -> quad, "far" -> farTri).map {
        case (n, poly) =>
          s"SELECT '$n' AS poly_name, event_type FROM p WHERE ${oRayCast("lat", "lng", poly)}"
      }
      s"""WITH p AS ($oPts)
          SELECT poly_name, event_type, count(*) AS cnt
          FROM (${arms.mkString(" UNION ALL ")})
          GROUP BY poly_name, event_type"""
    },
    "q_geo_polylist" ->
      s"""WITH p AS ($oPts)
          SELECT event_type, count(*) AS cnt FROM p
          WHERE ${Seq(tri, quad, farTri).map(oRayCast("lat", "lng", _)).mkString(" OR ")}
          GROUP BY event_type""",
    "q_geo_polyline" -> {
      val segs = line.sliding(2).map {
        case Seq(a, b) => oSegDist("lat", "lng", a, b, lineBuffer)
      }.mkString(" OR ")
      s"""WITH p AS ($oPts)
          SELECT event_type, count(*) AS cnt FROM p
          WHERE $segs
          GROUP BY event_type"""
    },
    "q_geo_storedid" ->
      s"""WITH p AS ($oPts)
          SELECT event_type, count(*) AS cnt FROM p
          WHERE lat BETWEEN 10 AND 20 AND lng BETWEEN 30 AND 40
          GROUP BY event_type"""
  )
}
