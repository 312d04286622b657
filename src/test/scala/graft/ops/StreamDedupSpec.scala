package graft.ops

import graft.engine.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact dedup: first arrival of each content fingerprint
  * survives, in-window re-arrivals are dropped, and state is expired by
  * the watermark — a duplicate arriving after the dedup window is kept
  * (state for its fingerprint is gone), which is the documented
  * bounded-state contract, not a bug. */
class StreamDedupSpec extends AnyFunSuite {
  import TestSpark._

  private case class Doc(doc_id: Long, text: String, sec: Long)

  private def run(docs: Seq[(Long, String, Long)]): Seq[(Long, String)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val stream = input.toDS()
      .toDF("doc_id", "text", "sec")
      .withColumn("ets", timestamp_seconds(col("sec")))
    val out = Dedup.streamingExactDedup(stream, "text", "ets", "30 seconds")
    val name = s"sdedup_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // one batch per event so arrival ORDER is deterministic and the
      // watermark advances between arrivals
      docs.foreach { d => input.addData(d); q.processAllAvailable() }
      spark.table(name).select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    } finally q.stop()
  }

  test("first arrival wins; in-window duplicates drop; post-window dup re-admits") {
    // Times start well above 0 (event-time == the initial epoch-0
    // watermark is dropped as late), and the watermark only advances
    // AFTER a batch — so a fresh event (5) must move it past the dedup
    // window before the re-admitted duplicate (6) arrives.
    val got = run(Seq(
      (1L, "alpha beta", 1000L),
      (2L, "ALPHA BETA  ", 1005L), // same fingerprint after normalize → dropped
      (3L, "gamma", 1010L),
      (5L, "advance", 1150L),      // pushes watermark to 1120 > 1000+30
      (6L, "alpha beta", 1200L)))  // fingerprint state expired → kept
    assert(got.map(_._1).sorted == Seq(1L, 3L, 5L, 6L))
  }

  test("rejects a batch frame loudly") {
    import spark.implicits._
    val batch = Seq((1L, "x", 0L)).toDF("doc_id", "text", "sec")
      .withColumn("ets", timestamp_seconds(col("sec")))
    val e = intercept[IllegalArgumentException] {
      Dedup.streamingExactDedup(batch, "text", "ets", "30 seconds")
    }
    assert(e.getMessage.contains("streaming"))
  }
}
