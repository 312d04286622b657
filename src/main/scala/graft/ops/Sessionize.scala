package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization of an event stream — the standard clickstream
  * / activity-log operator: a new session starts when the gap to the
  * user's previous event exceeds a threshold.
  *
  * Batch form ([[assign]]/[[sessions]]): ONE hash shuffle on the user
  * key, then two window passes (lag → boundary flags, running sum →
  * session seq) over the same partitioning — Catalyst plans a single
  * sort + exchange reused by both windows. Gap numbering is inherently a
  * per-key prefix scan, so — like any ordered-window op — a single
  * pathologically hot key serializes into one task with the default
  * plan; `tsBuckets = B > 1` switches to the skew-safe sub-bucketed
  * plan (same trick as [[AsOf.asofJoin]]): rows are ranged into B
  * ts-buckets per key so a hot key's window work spreads over B tasks,
  * and the cross-bucket dependency — "does this bucket's FIRST row open
  * a new session, and how many sessions came before it?" — is resolved
  * on a keys × B per-bucket summary (last event ts + within-bucket new
  * count) with a running window, then joined back. Results are
  * B-invariant (spec-asserted); the price is one min/max bounds pass
  * plus a second, column-pruned evaluation of the within-bucket window
  * feeding the summary agg (the summary side shares no stage with the
  * per-row side) — roughly 2× the B=1 plan, traded for hot keys not
  * serializing.
  *
  * Streaming form ([[streamingSessions]]): the same semantics as an
  * incremental `flatMapGroupsWithState` with event-time timeout —
  * sessions are emitted exactly once, when the watermark passes their
  * close (gap) boundary. State per key is O(1): the open session's
  * bounds + aggregates, never the events.
  */
object Sessionize {

  /** Per-event session assignment: adds `session_seq` (1-based per key).
    * `tieCol` must make (tsCol, tieCol) unique per key so the ordering —
    * and therefore the numbering — is total and deterministic.
    * `tsBuckets > 1` selects the skew-safe sub-bucketed plan; any B
    * yields identical results. */
  def assign(events: DataFrame, userCol: String, tsCol: String, tieCol: String,
      gapUs: Long, tsBuckets: Int = 1): DataFrame = {
    require(tsBuckets >= 1, s"tsBuckets must be >= 1, got $tsBuckets")
    val us = unix_micros(col(tsCol))
    if (tsBuckets == 1) {
      val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
      val marked = events.withColumn("__is_new",
        when(lag(us, 1).over(w).isNull || us - lag(us, 1).over(w) > gapUs, 1L)
          .otherwise(0L))
      marked.withColumn("session_seq",
          sum(col("__is_new")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .drop("__is_new")
    } else {
      // Bounds from one metadata-cheap min/max pass; ts outside them
      // saturates into the edge buckets, so approximate bounds stay
      // correct (same contract as AsOf).
      val b = events.agg(min(us), max(us)).head()
      if (b.isNullAt(0) || b.getLong(0) == b.getLong(1))
        return assign(events, userCol, tsCol, tieCol, gapUs, tsBuckets = 1)
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val bkt = least(greatest(
        floor((us - lit(mn)).cast("double") * tsBuckets / lit((mx - mn).toDouble)),
        lit(0L)), lit(tsBuckets - 1L)).cast("long")

      // Within-bucket pass: lag is NULL exactly on each bucket's first
      // row; __inner_new counts only non-first boundaries, which do not
      // depend on anything outside the bucket. The running sum shares
      // the same partitioning + order, so Catalyst computes both in ONE
      // Window over one shuffle — and because the first row's inner
      // flag is 0, the final numbering needs no second window:
      // session_seq = offset + firstnew + running inner sum.
      val wIn = Window.partitionBy(col(userCol), col("__bkt"))
        .orderBy(col(tsCol), col(tieCol))
      val marked = events
        .withColumn("__bkt", bkt)
        .withColumn("__lag", lag(us, 1).over(wIn))
        .withColumn("__inner_new",
          when(col("__lag").isNotNull && us - col("__lag") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("__innerrun",
          sum(when(col("__lag").isNotNull && us - col("__lag") > gapUs, 1L)
            .otherwise(0L)).over(
              wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

      // keys × B summary. Buckets are ts-ranges, so __last is
      // nondecreasing across a key's buckets and lag(__last) IS the max
      // event ts of all earlier (non-empty) buckets — the carry-in the
      // first row's boundary flag needs. __offset accumulates the
      // session-starts of earlier buckets.
      val wKey = Window.partitionBy(col("__sk")).orderBy(col("__sb"))
      val perBkt = marked
        .groupBy(col(userCol).as("__sk"), col("__bkt").as("__sb"))
        .agg(min(us).as("__first"), max(us).as("__last"),
          sum(col("__inner_new")).as("__innern"))
        .withColumn("__carry", lag(col("__last"), 1).over(wKey))
        .withColumn("__firstnew",
          when(col("__carry").isNull || col("__first") - col("__carry") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("__offset", coalesce(
          sum(col("__firstnew") + col("__innern"))
            .over(wKey.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("__sk"), col("__sb"), col("__firstnew"), col("__offset"))

      marked
        .join(perBkt,
          // null-safe on both sides: the B=1 window plan sessionizes
          // NULL user keys (partitionBy groups nulls) and a NULL ts
          // yields a NULL bucket — a plain equi-join would silently
          // drop those rows and break the "any B yields identical
          // results" contract
          (col(userCol) <=> col("__sk")) && (col("__bkt") <=> col("__sb")))
        .withColumn("session_seq",
          col("__offset") + col("__firstnew") + col("__innerrun"))
        .drop("__bkt", "__lag", "__inner_new", "__innerrun", "__sk", "__sb",
          "__firstnew", "__offset")
    }
  }

  /** Per-session rollup: (user, session_seq, start, end, n_events). */
  def sessions(events: DataFrame, userCol: String, tsCol: String, tieCol: String,
      gapUs: Long, tsBuckets: Int = 1): DataFrame =
    assign(events, userCol, tsCol, tieCol, gapUs, tsBuckets)
      .groupBy(col(userCol), col("session_seq"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))

  /** Event for the streaming form: micros timestamp + a value to fold. */
  case class Ev(user_id: Long, ts_us: Long, value: Double)
  /** Open-session state carried between micro-batches (O(1) per key). */
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, sum: Double)
  /** A closed session, emitted once its gap has definitely elapsed. */
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_value: Double)

  /** Incremental sessionization over a stream. The input must carry a
    * watermark on an event-time column derived from `ts_us` (the spec
    * shows the canonical wiring); sessions close either when a later
    * event of the same key arrives past the gap, or when the event-time
    * timeout fires (watermark > last event + gap) — so results match the
    * batch [[sessions]] on the same data, emitted append-only. */
  def streamingSessions(events: Dataset[Ev], gapUs: Long): Dataset[ClosedSession] = {
    implicit val evEnc: Encoder[Ev] = Encoders.product[Ev]
    implicit val outEnc: Encoder[ClosedSession] = Encoders.product[ClosedSession]
    implicit val stEnc: Encoder[OpenSession] = Encoders.product[OpenSession]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    def fn(userId: Long, it: Iterator[Ev], state: GroupState[OpenSession])
        : Iterator[ClosedSession] = {
      var open = state.getOption
      val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      if (it.isEmpty && state.hasTimedOut) {
        open.foreach(o => closed +=
          ClosedSession(userId, o.startUs, o.lastUs, o.n, o.sum))
        state.remove()
        return closed.iterator
      }
      // within a micro-batch events arrive unordered; the per-key,
      // per-batch volume is micro-batch-bounded, so an in-memory sort is
      // the right tool here (NOT a driver-side one)
      val evs = it.toArray.sortBy(e => (e.ts_us, e.value))
      evs.foreach { e =>
        open match {
          case Some(o) if e.ts_us - o.lastUs > gapUs =>
            closed += ClosedSession(userId, o.startUs, o.lastUs, o.n, o.sum)
            open = Some(OpenSession(e.ts_us, e.ts_us, 1L, e.value))
          case Some(o) =>
            open = Some(OpenSession(o.startUs, math.max(o.lastUs, e.ts_us),
              o.n + 1L, o.sum + e.value))
          case None =>
            open = Some(OpenSession(e.ts_us, e.ts_us, 1L, e.value))
        }
      }
      open.foreach { o =>
        state.update(o)
        // close when the watermark passes last event + gap
        state.setTimeoutTimestamp((o.lastUs + gapUs) / 1000L + 1L)
      }
      closed.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** DuckDB oracle mirror of [[sessions]] over a relation
    * `evRel(user, ts, tie)` — same lag/cumsum windows; the running sum
    * is cast to BIGINT (DuckDB windowed SUM widens to HUGEINT). */
  def oSessions(evRel: String, userCol: String, tsCol: String, tieCol: String,
      gapUs: Long): String =
    s"""marked AS (
          SELECT *, CASE WHEN lag(epoch_us($tsCol)) OVER w IS NULL
                       OR epoch_us($tsCol) - lag(epoch_us($tsCol)) OVER w > $gapUs
                     THEN 1 ELSE 0 END AS is_new
          FROM $evRel
          WINDOW w AS (PARTITION BY $userCol ORDER BY $tsCol, $tieCol)),
        sessed AS (
          SELECT *, CAST(sum(is_new) OVER (PARTITION BY $userCol
              ORDER BY $tsCol, $tieCol
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS session_seq
          FROM marked)"""
}
