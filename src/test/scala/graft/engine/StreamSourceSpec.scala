package graft.engine

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming SOURCE over a carbonish table: committed segments become
  * micro-batches behind a contiguous segment-id watermark; compaction
  * and IUD rewrites are NOT re-emitted (append-only contract); deltas
  * apply at batch-planning time. */
class StreamSourceSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft_ss_").toString

  private def mkRows(a: Long, b: Long) =
    spark.range(a, b).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")

  /** Drain all available batches into a memory-backed sum via
    * foreachBatch + Trigger.Once semantics (processAllAvailable). */
  private def drain(path: String, ckpt: String): Seq[Long] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("carbonish").load(path)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        acc ++= batch.select("k").collect().map(_.getLong(0))
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()
    acc.toSeq
  }

  test("committed segments stream as micro-batches; rewrites are not re-emitted") {
    val root = tmp()
    val path = s"$root/t"
    val ckpt = s"$root/ckpt"
    val t = GraftTable.create(spark, path, mkRows(0, 1).schema, Seq("k"))
    t.insert(mkRows(0, 100))
    t.insert(mkRows(100, 200))

    // first drain: both existing segments emit
    assert(drain(path, ckpt).sorted == (0L until 200L))

    // new insert → exactly the new rows on the next drain
    t.insert(mkRows(200, 250))
    assert(drain(path, ckpt).sorted == (200L until 250L))

    // compaction re-houses rows the stream already saw → emits nothing
    assert(t.compact("MAJOR").nonEmpty)
    assert(drain(path, ckpt).isEmpty)

    // copy-on-write update rewrites → emits nothing either
    t.update(col("k") === 10L, Map("v" -> lit(0.0)))
    assert(drain(path, ckpt).isEmpty)

    // but a fresh load after the rewrite still emits
    t.insert(mkRows(250, 260))
    assert(drain(path, ckpt).sorted == (250L until 260L))
  }

  test("merge-on-read deltas apply when the batch is planned") {
    val root = tmp()
    val path = s"$root/t"
    val t = GraftTable.create(spark, path, mkRows(0, 1).schema, Seq("k"),
      properties = Map("iud_mode" -> "mor", "global_sort_partitions" -> "2"))
    t.insert(mkRows(0, 100))
    t.delete(col("k") < 10L) // deltas BEFORE the stream ever reads
    assert(drain(path, s"$root/ckpt").sorted == (10L until 100L))
  }

  test("admission control paces a backfill: one segment per batch") {
    val root = tmp()
    val path = s"$root/t"
    val t = GraftTable.create(spark, path, mkRows(0, 1).schema, Seq("k"))
    t.insert(mkRows(0, 10)); t.insert(mkRows(10, 20)); t.insert(mkRows(20, 30))
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("carbonish")
      .option("max_segments_per_batch", "1")
      .load(path)
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count()
        if (n > 0) batches += n
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(batches.toSeq == Seq(10L, 10L, 10L),
      s"expected 3 paced batches, got $batches")
  }

  test("watermark waits for the contiguous committed prefix") {
    val root = tmp()
    val path = s"$root/t"
    val t = GraftTable.create(spark, path, mkRows(0, 1).schema, Seq("k"))
    t.insert(mkRows(0, 50))
    // simulate an in-flight load: reserve id 1 as IN_PROGRESS, then
    // commit id 2; the stream must NOT advance past the gap
    var reserved = -1L
    t.layout.commit { st =>
      reserved = st.nextSegmentId
      st.copy(segments = st.segments :+ graft.engine.format.SegmentMeta(
        reserved, graft.engine.format.SegmentStatus.InProgress, "parquet",
        Nil, -1L, 0L, Map.empty, Seq("k"), System.currentTimeMillis()))
    }
    t.insert(mkRows(100, 150)) // id 2 commits while id 1 is pending
    assert(drain(path, s"$root/ckpt").sorted == (0L until 50L),
      "stream must stop at the contiguous prefix")
    // the pending load lands → both it and the later segment emit
    val seg = graft.engine.format.SegmentWriter.write(
      t.layout, t.meta, mkRows(50, 100), reserved)
    t.layout.commit(st => st.copy(segments =
      st.segments.map(s => if (s.id == reserved) seg else s)))
    assert(drain(path, s"$root/ckpt").sorted == (50L until 150L))
  }
}
