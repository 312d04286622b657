package graft.ops

import graft.engine.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gap sessionization: batch boundaries/numbering are right, the whole
  * batch plan runs on ONE shuffle (both windows + the session agg reuse
  * the user_id partitioning), and the streaming flatMapGroupsWithState
  * form emits exactly the batch-closed sessions as watermark advances. */
class SessionizeSpec extends AnyFunSuite {
  import TestSpark._

  private val GapUs = 10L * 1000000L // 10 s

  test("batch: gaps split sessions, numbering is 1-based per user") {
    import spark.implicits._
    val ev = Seq(
      (1L, 0L, 10L), (1L, 5L, 11L), (1L, 100L, 12L), // u1: [0,5] then [100]
      (2L, 3L, 13L)                                  // u2: [3]
    ).map { case (u, sec, id) => (u, new java.sql.Timestamp(sec * 1000L), id) }
      .toDF("user_id", "ts", "event_id")
    val got = Sessionize.sessions(ev, "user_id", "ts", "event_id", GapUs)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime / 1000L, r.getTimestamp(3).getTime / 1000L,
        r.getLong(4))).toSet
    assert(got == Set(
      (1L, 1L, 0L, 5L, 2L),
      (1L, 2L, 100L, 100L, 1L),
      (2L, 1L, 3L, 3L, 1L)))
  }

  test("batch plan: one shuffle serves both windows and the session agg") {
    import spark.implicits._
    val ev = (1 to 100).map(i =>
        ((i % 5).toLong, new java.sql.Timestamp(i * 1000L), i.toLong))
      .toDF("user_id", "ts", "event_id")
    val agg = Sessionize.assign(ev, "user_id", "ts", "event_id", GapUs)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    val shuffles = "ShuffleExchange|Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly one shuffle, plan:\n$plan")
  }

  test("hot key: tsBuckets spreads the window over (user, __bkt) and is B-invariant") {
    import spark.implicits._
    // one user holds every row — the exact skew the keyed window
    // serializes; a >gap jump every 500 events opens a new session, so
    // session boundaries land both inside and across ts-buckets
    val ev = (0 until 3000).map { i =>
      val sec = i * 3L + (i / 500) * 100L
      (1L, new java.sql.Timestamp(sec * 1000L), i.toLong)
    }.toDF("user_id", "ts", "event_id")
    val base = Sessionize.assign(ev, "user_id", "ts", "event_id", GapUs)
      .select(col("event_id"), col("session_seq")).as[(Long, Long)].collect().toMap
    for (bq <- Seq(4, 16)) {
      val got = Sessionize.assign(ev, "user_id", "ts", "event_id", GapUs, tsBuckets = bq)
      if (bq == 4) {
        // the big window must shuffle on (user_id, __bkt), not user_id
        // alone — that is what spreads the hot key over up to B tasks
        val plan = got.queryExecution.executedPlan.toString
        assert("hashpartitioning\\([^)]*__bkt".r.findFirstIn(plan).isDefined,
          s"expected a hashpartitioning on (user, __bkt) in:\n$plan")
      }
      val m = got.select(col("event_id"), col("session_seq"))
        .as[(Long, Long)].collect().toMap
      assert(m == base, s"tsBuckets=$bq numbering differs from the B=1 plan")
    }
  }

  test("tsBuckets: empty middle buckets carry state across correctly") {
    import spark.implicits._
    // two event clusters far apart: with B=16 most buckets are EMPTY and
    // the second cluster's opening flag must reach across all of them
    val ev = ((0 until 40).map(i => (1L, i.toLong)) ++
        (0 until 40).map(i => (1L, 100000L + i)) ++
        (0 until 10).map(i => (2L, 50000L + i * 3)))
      .zipWithIndex.map { case ((u, sec), id) =>
        (u, new java.sql.Timestamp(sec * 1000L), id.toLong) }
      .toDF("user_id", "ts", "event_id")
    val base = Sessionize.sessions(ev, "user_id", "ts", "event_id", GapUs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    val got = Sessionize.sessions(ev, "user_id", "ts", "event_id", GapUs, tsBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(got == base)
    // sanity on the fixture itself: u1 really is two sessions
    assert(base.count(_._1 == 1L) == 2)
  }

  test("tsBuckets: NULL user keys sessionize identically to the B=1 plan") {
    import spark.implicits._
    // the B=1 window groups NULL keys into one partition; the bucketed
    // plan joins back through (user <=> __sk) so those rows must survive
    val ev = (Seq((None, 0L, 1L), (None, 5L, 2L), (None, 100L, 3L)) ++
        (0 until 50).map(i => (Some(1L), i * 2L, 10L + i)))
      .map { case (u, sec, id) => (u, new java.sql.Timestamp(sec * 1000L), id) }
      .toDF("user_id", "ts", "event_id")
    val base = Sessionize.assign(ev, "user_id", "ts", "event_id", GapUs)
      .select(col("event_id"), col("session_seq")).as[(Long, Long)].collect().toMap
    assert(base.size == 53, "fixture rows with NULL keys must be assigned")
    for (bq <- Seq(4, 16)) {
      val m = Sessionize.assign(ev, "user_id", "ts", "event_id", GapUs, tsBuckets = bq)
        .select(col("event_id"), col("session_seq")).as[(Long, Long)].collect().toMap
      assert(m == base, s"tsBuckets=$bq drops or renumbers NULL-key rows")
    }
  }

  test("streaming: sessions emit once closed, matching batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.Ev]
    // watermark rides a real event-time column derived from ts_us
    val withWm = input.toDS()
      .withColumn("ets", timestamp_micros(col("ts_us")))
      .withWatermark("ets", "0 seconds")
      .as[Sessionize.Ev]
    val out = Sessionize.streamingSessions(withWm, GapUs)
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // +1h base: an event at exactly epoch 0 sits ON the initial
      // watermark and is discarded as late — a fixture artifact
      def s(sec: Long): Long = (3600L + sec) * 1000000L
      // b1: u1 two-event session closed IN batch by the t=100 event
      input.addData(Sessionize.Ev(1L, s(0), 1.0), Sessionize.Ev(1L, s(5), 2.0),
        Sessionize.Ev(1L, s(100), 4.0), Sessionize.Ev(2L, s(3), 8.0))
      q.processAllAvailable()
      // b2: far-future event pushes the watermark -> u2 times out
      input.addData(Sessionize.Ev(9L, s(1000), 16.0))
      q.processAllAvailable()
      // b3: u9's next event closes its first session in-batch; watermark
      // from b2 also fires u1's [100] timeout
      input.addData(Sessionize.Ev(9L, s(2000), 32.0))
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .collect().map(r => (r.getLong(0), r.getLong(1) / 1000000L - 3600L,
          r.getLong(2) / 1000000L - 3600L, r.getLong(3), r.getDouble(4))).toSet
      assert(got == Set(
        (1L, 0L, 5L, 2L, 3.0),      // closed in b1 by in-batch gap
        (2L, 3L, 3L, 1L, 8.0),      // timeout in b2
        (1L, 100L, 100L, 1L, 4.0),  // timeout in b3
        (9L, 1000L, 1000L, 1L, 16.0))) // closed in b3 by in-batch gap
      // u9's [2000] session is still open: correctly NOT emitted
    } finally q.stop()
  }
}
