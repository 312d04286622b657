package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (point-in-time) join: for every left row, the payload of the
  * LATEST right row with the same key and `right.ts <= left.ts`
  * (inclusive) — the feature-lookup / slowly-changing-state join of
  * event pipelines.
  *
  * Spark-first exact plan with ONE hash shuffle and no range
  * explosion: tag both sides, union them, and run a per-key running
  * `last(payload, ignoreNulls)` ordered by (ts, side) — right rows
  * sort before left rows at equal ts, which yields the inclusive
  * boundary. No per-row range scan, no broadcast of the right side,
  * no skew-prone interval join: the cost is the same as one window
  * aggregation over the concatenated inputs, so it scales exactly like
  * a groupBy on the key. (DuckDB's native ASOF JOIN is the oracle in
  * the correctness row.)
  *
  * Determinism: right rows must be unique per (key, ts) — pre-aggregate
  * duplicates (e.g. latest-wins) before joining; among equal sort keys
  * `last()` has no defined winner.
  */
object AsOf {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(leftCols.contains(key) && leftCols.contains(ts),
      s"left must carry '$key' and '$ts'")
    require(right.columns.contains(key) && right.columns.contains(ts),
      s"right must carry '$key' and '$ts'")
    require(payload.nonEmpty, "no payload columns to carry over")
    require(payload.forall(right.columns.contains),
      s"missing payload columns on right: ${payload.filterNot(right.columns.contains).mkString(",")}")
    require(!payload.contains(key) && !payload.contains(ts),
      "payload must not repeat the key/ts columns")
    val collide = payload.filter(leftCols.contains)
    require(collide.isEmpty, s"payload collides with left columns: ${collide.mkString(",")}")

    // payload travels as ONE struct: filling columns independently with
    // last(ignoreNulls) could stitch fields from DIFFERENT right rows
    // when payloads carry nulls — the whole-row as-of match must win,
    // nulls included
    val payType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(right.schema.fieldIndex(p))))
    val lu = left.select(
      leftCols.map(col) :+
        lit(null).cast(payType).as("__pay") :+
        lit(1).as("__side"): _*)
    val ru = right.select(
      leftCols.map(c =>
        if (c == key || c == ts) col(c)
        else lit(null).cast(left.schema(left.schema.fieldIndex(c)).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__pay") :+
        lit(0).as("__side"): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lu.unionByName(ru)
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__pay").getField(p).as(p)): _*)
  }
}
