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

  test("per-row minhash signature equals the batch explode+groupBy signature") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over a lazy dog"),
      (3L, "entirely different words here now"),
      (4L, "short one")) // too short to shingle at n=3... actually 2 tokens
      .toDF("id", "text")
      .select(col("id"), Dedup.normTokens(col("text")).as("toks"))
    val batch = Dedup.minhashSignatures(docs, shingleN = 3, numHashes = 6)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val perRow = docs
      .select(col("id"), Dedup.rowMinhashSig(col("toks"), 3, 6).as("sig"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1)))
      .toMap
    // batch drops unshingleable docs at the explode; the per-row form
    // yields null minhashes for them — both mean "no signature"
    assert(batch.keySet == Set(1L, 2L, 3L))
    batch.foreach { case (id, sig) => assert(perRow(id).contains(sig)) }
  }

  test("streaming near-dup flags in-window LSH+tau matches, expires state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val a = "the quick brown fox jumps over the lazy dog today"
    val a2 = "the quick brown fox jumps over the lazy dog tonight" // near-dup of a
    val z = "completely unrelated content about databases and storage engines"
    val input = MemoryStream[(Long, String, Long)]
    val stream = input.toDS().toDF("doc_id", "text", "sec")
      .withColumn("toks", Dedup.normTokens(col("text")))
      .withColumn("ets", timestamp_seconds(col("sec")))
    val out = Dedup.streamingNearDup(stream, "doc_id", "toks", "ets",
      windowUs = 30L * 1000000L, shingleN = 3, numHashes = 6, bands = 3,
      tau = 0.5)
    val name = s"sneardup_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      def hits(): Set[(Long, Long)] = spark.table(name)
        .select("id", "dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      input.addData((1L, a, 1000L)); q.processAllAvailable()
      assert(hits().isEmpty)
      // in-batch pair: 2 (exact re-text of 1) + unrelated 3
      input.addData((2L, a, 1005L), (3L, z, 1006L)); q.processAllAvailable()
      assert(hits() == Set((2L, 1L)))
      // cross-batch near-dup flags BOTH held copies
      input.addData((4L, a2, 1010L)); q.processAllAvailable()
      val h = hits()
      assert(h.contains((4L, 1L)) && h.contains((4L, 2L)) && !h.exists(_._1 == 3L))
      // advance the watermark past every bucket's window...
      input.addData((5L, z + " padding beyond", 1150L)); q.processAllAvailable()
      // ...then the same text again: state expired, nothing to flag
      input.addData((6L, a, 1200L)); q.processAllAvailable()
      assert(!hits().exists(_._1 == 6L),
        "expired buckets must not flag post-window re-arrivals")
    } finally q.stop()
  }
}
