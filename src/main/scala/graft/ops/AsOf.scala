package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, StructType}

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
  * SKEW: a window partitioned by key alone serializes a hot key's
  * entire history into one task, and AQE skew-splitting does not apply
  * to window partitions. `tsBuckets = B > 1` switches to the
  * sub-bucketed plan: rows are ranged into B ts-buckets per key (window
  * partitions become `(key, bucket)`, so a hot key's work spreads over
  * B tasks), each bucket's latest right-state is aggregated, a per-key
  * running window over those (keys x B rows — tiny) carries the opening
  * state forward across buckets (including empty ones), and each left
  * row takes `coalesce(within-bucket match, opening state)`. Costs one
  * extra min/max pass over the right side and one (key,bucket)
  * equi-join; same results for any B (spec-asserted).
  *
  * NULL timestamps: `ts >= NULL` is never true in SQL asof semantics,
  * so right rows with a NULL ts are dropped up front (they must never
  * become anyone's match) and left rows with a NULL ts surface a NULL
  * payload.
  *
  * Determinism: right rows must be unique per (key, ts) — pre-aggregate
  * duplicates (e.g. latest-wins) before joining; among equal sort keys
  * `last()` has no defined winner.
  */
object AsOf {

  /** `tsRange`: optional (min, max) of the right side's ts as doubles —
    * supplies the bucket bounds WITHOUT the extra min/max pass over the
    * right side (worth it when the state table is itself huge; segment
    * or catalog stats usually know the range already). Bounds only
    * steer bucketing — out-of-range timestamps saturate into the edge
    * buckets, so approximate bounds stay correct. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      tsBuckets: Int = 1,
      tsRange: Option[(Double, Double)] = None): DataFrame = {
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
    require(tsBuckets >= 1, s"tsBuckets must be >= 1, got $tsBuckets")

    // payload travels as ONE struct: filling columns independently with
    // last(ignoreNulls) could stitch fields from DIFFERENT right rows
    // when payloads carry nulls — the whole-row as-of match must win,
    // nulls included
    val payType = StructType(
      payload.map(p => right.schema(right.schema.fieldIndex(p))))
    val lu = left.select(
      leftCols.map(col) :+
        lit(null).cast(payType).as("__pay") :+
        lit(1).as("__side"): _*)
    // a NULL-ts right row would sort before every real timestamp
    // (nulls-first) and wrongly match left rows that precede all real
    // right rows — SQL asof semantics never match it, so drop it here
    val ru = right.filter(col(ts).isNotNull).select(
      leftCols.map(c =>
        if (c == key || c == ts) col(c)
        else lit(null).cast(left.schema(left.schema.fieldIndex(c)).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__pay") :+
        lit(0).as("__side"): _*)

    val unioned = lu.unionByName(ru)

    if (tsBuckets == 1) {
      val w = Window.partitionBy(col(key))
        .orderBy(col(ts).asc, col("__side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      unioned
        .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
        .filter(col("__side") === 1)
        .select(leftCols.map(col) ++
          payload.map(p => col("__pay").getField(p).as(p)): _*)
    } else {
      // monotonic numeric image of ts for range-bucketing (boundary
      // precision is irrelevant to correctness — any monotonic
      // non-decreasing ts -> bucket map works; ties share a bucket)
      def tsNum(c: Column): Column = left.schema(left.schema.fieldIndex(ts)).dataType match {
        case DateType => c.cast("timestamp").cast("double")
        case _        => c.cast("double")
      }
      // bounds from the RIGHT side only (usually the smaller state
      // table) unless the caller supplied them; timestamps outside the
      // range saturate into the first/last bucket, preserving ordering
      val boundsOpt: Option[(Double, Double)] = tsRange.orElse {
        val b = ru.agg(min(tsNum(col(ts))), max(tsNum(col(ts)))).head()
        if (b.isNullAt(0)) None else Some((b.getDouble(0), b.getDouble(1)))
      }
      boundsOpt match {
        case None => return asofJoin(left, right, key, ts, payload, tsBuckets = 1)
        case Some((a, b)) if a == b =>
          // single timestamp: bucketing cannot spread anything
          return asofJoin(left, right, key, ts, payload, tsBuckets = 1)
        case _ =>
      }
      val (mn, mx) = boundsOpt.get
      val bkt = least(greatest(
        floor((tsNum(col(ts)) - lit(mn)) * tsBuckets / lit(mx - mn)), lit(0L)),
        lit(tsBuckets - 1L))

      val wIn = Window.partitionBy(col(key), col("__bkt"))
        .orderBy(col(ts).asc, col("__side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val within = unioned
        .withColumn("__bkt", bkt)
        .withColumn("__run", last(col("__pay"), ignoreNulls = true).over(wIn))

      // one row per (key, bucket) seen on EITHER side, carrying that
      // bucket's final right-state (null if the bucket has no right
      // rows); max_by ignores rows whose ordering value is null, so
      // left-only groups aggregate to null
      val perBkt = unioned
        .withColumn("__bkt", bkt)
        .groupBy(col(key), col("__bkt"))
        .agg(max_by(
          when(col("__side") === 0, col("__pay")),
          when(col("__side") === 0, col(ts))).as("__lastr"))
      // opening state of each bucket = latest right-state of any
      // EARLIER bucket of the same key: a running window over keys x B
      // rows — negligible even for a hot key
      val wOpen = Window.partitionBy(col(key))
        .orderBy(col("__bkt").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val opening = perBkt
        .withColumn("__open", last(col("__lastr"), ignoreNulls = true).over(wOpen))
        .select(col(key).as("__ok"), col("__bkt").as("__ob"), col("__open"))

      within
        .filter(col("__side") === 1)
        .join(opening, col(key) === col("__ok") && col("__bkt") === col("__ob"), "left")
        .withColumn("__pay", coalesce(col("__run"), col("__open")))
        .select(leftCols.map(col) ++
          payload.map(p => col("__pay").getField(p).as(p)): _*)
    }
  }
}
