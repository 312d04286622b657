package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RANGE (interval) join: pair each point x with every interval
  * [s, e] containing it — the "which session/window/price-band does
  * this event fall into" join.
  *
  * Spark plans a raw `x BETWEEN s AND e` as BroadcastNestedLoop (or a
  * cartesian) — points × intervals work. This bucketized form is the
  * standard scale plan: both sides map onto fixed-width buckets of the
  * value domain (an interval explodes into the buckets it covers, a
  * point into exactly one), the join becomes a hash EQUI-join on the
  * bucket key with the exact BETWEEN as residual, and the cost is
  * |points| + Σ(interval spans)/bucketWidth shuffled rows. Pick
  * `bucketWidth` near the typical interval span: much smaller multiplies
  * the interval side, much larger multiplies residual false hits.
  * Empty intervals (e < s) match nothing, as in the SQL formulation.
  */
object RangeJoin {

  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      x: String,
      s: String,
      e: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(points.columns.contains(x), s"points missing '$x'")
    require(intervals.columns.contains(s) && intervals.columns.contains(e),
      s"intervals missing '$s'/'$e'")
    def bucket(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / bucketWidth).cast("long")
    val pb = points.withColumn("__pb", bucket(col(x))).as("p")
    val ib = intervals
      .filter(col(e) >= col(s)) // empty intervals match nothing
      .withColumn("__ib", explode(sequence(bucket(col(s)), bucket(col(e)))))
      .as("i")
    pb.join(ib, col("__pb") === col("__ib") &&
        col(s"p.$x") >= col(s"i.$s") && col(s"p.$x") <= col(s"i.$e"))
      .drop("__pb", "__ib")
  }
}
