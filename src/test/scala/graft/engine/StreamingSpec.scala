package graft.engine

import graft.engine.streaming.{GraftStreaming, StreamManager}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming segment append + handoff + stream management. Uses a file
  * source fed incrementally (deterministic, no timing races). */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType),
    StructField("tag", StringType)))

  private def writeBatchFile(dir: String, ids: Range): Unit = {
    import spark.implicits._
    ids.map(i => (i.toLong, i * 1.5, s"t${i % 3}")).toDF("id", "v", "tag")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  test("stream appends land in a STREAMING segment; handoff makes it columnar") {
    val root = Files.createTempDirectory("graft_stream_").toString
    val srcDir = s"$root/src"; val tblPath = s"$root/t"
    val t = GraftTable.create(spark, tblPath, schema, Seq("id"))
    writeBatchFile(srcDir, 0 until 100)

    val source = spark.readStream.schema(schema).parquet(srcDir)
    val q = StreamManager.createStream("s1", t, source,
      Trigger.ProcessingTime(0), checkpoint = Some(s"$root/ckpt"))
    try {
      q.processAllAvailable()
      assert(t.read.count() == 100)
      assert(t.status.segments.count(_.status == "STREAMING") == 1)

      // second batch appends to the SAME streaming segment
      writeBatchFile(srcDir, 100 until 150)
      q.processAllAvailable()
      assert(t.read.count() == 150)
      val open = t.status.segments.filter(_.status == "STREAMING")
      assert(open.size == 1 && open.head.rowCount == 150)
      // streaming segment carries merged min/max stats
      val st = open.head.stats("id")
      assert(st.min.contains("0") && st.max.contains("149"))

      // queries union streaming + columnar state correctly
      assert(t.read.filter(col("id") >= 100).count() == 50)

      // FINISH STREAMING: stop + handoff to sorted columnar
      val newId = StreamManager.finishStreaming(t)
      assert(newId.isDefined)
      assert(t.status.segments.count(_.status == "STREAMING") == 0)
      assert(t.read.count() == 150)
      assert(t.status.visible.head.sortColumns == Seq("id"))
      assert(StreamManager.showStreams.isEmpty)
    } finally if (q.isActive) q.stop()
  }

  test("batch replay is idempotent (lastBatchId guard)") {
    val root = Files.createTempDirectory("graft_stream2_").toString
    val t = GraftTable.create(spark, s"$root/t", schema)
    import spark.implicits._
    val batch = Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("id", "v", "tag")
    GraftStreaming.appendBatch(t, batch, 0L)
    GraftStreaming.appendBatch(t, batch, 0L) // replay of the same batch
    GraftStreaming.appendBatch(t, batch, 1L)
    assert(t.read.count() == 4)
  }

  test("watermarked window aggregate streams finalized windows into the sink") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_streamw_").toString
    val srcDir = s"$root/src"; new java.io.File(srcDir).mkdirs()
    val sinkSchema = StructType(Seq(
      StructField("win_start", TimestampType), StructField("cnt", LongType)))
    val sink = GraftTable.create(spark, s"$root/t", sinkSchema)

    val evSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", LongType)))
    val source = spark.readStream.schema(evSchema).parquet(srcDir)
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "5 minutes")).agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("cnt"))
    val q = StreamManager.createStream("win_stream", sink, source,
      checkpoint = Some(s"$root/ckpt"))
    try {
      def ev(times: String*) = times.map(t =>
        (java.sql.Timestamp.valueOf(t), 1L)).toDF("ts", "v")
      // window [10:00,10:05) fills; nothing emits until the watermark
      // passes its end
      // one file per feed batch: a multi-file write can straddle
      // micro-batches in arbitrary order, and a batch seeing only the
      // latest event would advance the watermark past the earlier ones
      ev("2024-01-01 10:00:30", "2024-01-01 10:02:00", "2024-01-01 10:04:59")
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      assert(sink.read.count() == 0, "open window must not emit in append mode")
      // an event at 10:10 advances the watermark; the first window closes
      ev("2024-01-01 10:10:00").write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      val rows = sink.read.collect().map(r => (r.getTimestamp(0).toString, r.getLong(1)))
      assert(rows.toSeq == Seq(("2024-01-01 10:00:00.0", 3L)), rows.mkString(","))
    } finally StreamManager.dropStream("win_stream")
  }

  test("auto-handoff when the streaming segment exceeds the size cap") {
    val root = Files.createTempDirectory("graft_stream3_").toString
    val t = GraftTable.create(spark, s"$root/t", schema, Seq("id"))
    import spark.implicits._
    val batch = (0 until 1000).map(i => (i.toLong, i * 1.0, "x")).toDF("id", "v", "tag")
    GraftStreaming.appendBatch(t, batch, 0L)
    assert(GraftStreaming.maybeHandoff(t, maxBytes = 1L).isDefined)
    assert(t.status.segments.count(_.status == "STREAMING") == 0)
    assert(t.read.count() == 1000)
    // next append opens a fresh streaming segment
    GraftStreaming.appendBatch(t, batch.limit(10), 1L)
    assert(t.status.segments.count(_.status == "STREAMING") == 1)
    assert(t.read.count() == 1010)
  }
}
