package graft.engine

import graft.engine.streaming.{CdcConfig, CdcStreamer, StreamManager}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Continuous CDC merge: a change stream (key, value, op, version) is
  * applied batch-by-batch to a carbonish target — latest-per-key within
  * a batch wins, delete ops drop rows, others upsert. */
class CdcSpec extends AnyFunSuite {
  import TestSpark._

  test("CDC streamer applies upserts and deletes from a change feed") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cdc_").toString
    val srcDir = s"$root/changes"
    new java.io.File(srcDir).mkdirs()

    val target = GraftTable.createAsSelect(spark, s"$root/t",
      Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "v"), Seq("k"))

    val changeSchema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("_op", StringType), StructField("_ver", LongType)))
    val changes = spark.readStream.schema(changeSchema).parquet(srcDir)
    val q = CdcStreamer.start("cdc_t", target, changes,
      CdcConfig("k", orderColumn = Some("_ver")),
      checkpoint = Some(s"$root/ckpt"))
    try {
      // batch 1: update k=2, insert k=4, and an insert+delete churn on
      // k=5 (latest event per key wins → k=5 never lands)
      // ONE file per feed batch: a multi-file write can straddle two
      // micro-batches in arbitrary file order, and cross-batch ordering
      // is the FEED's contract in CDC (kafka preserves per-key order) —
      // a split here once applied the k=5 delete before its insert
      Seq((2L, "TWO", "u", 1L), (4L, "four", "i", 1L),
        (5L, "five", "i", 1L), (5L, "five", "d", 2L))
        .toDF("k", "v", "_op", "_ver")
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      assert(target.read.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
        .toSeq == Seq((1L, "one"), (2L, "TWO"), (3L, "three"), (4L, "four")))

      // batch 2: delete k=1, update k=4; SHOW STREAMS sees the job
      Seq((1L, "one", "d", 3L), (4L, "FOUR", "u", 3L))
        .toDF("k", "v", "_op", "_ver")
        .coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      assert(target.read.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
        .toSeq == Seq((2L, "TWO"), (3L, "three"), (4L, "FOUR")))
      assert(StreamManager.showStreams.exists(s => s._1 == "cdc_t" && s._3 == "RUNNING"))
    } finally StreamManager.dropStream("cdc_t")
  }

  test("kafka-wire Debezium-JSON envelope decodes and applies in order") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cdcenv_").toString
    val target = GraftTable.createAsSelect(spark, s"$root/t",
      Seq((1L, "one"), (2L, "two")).toDF("k", "v"), Seq("k"))
    val rowSchema = target.schema
    val cfg = CdcConfig("k", orderColumn = Some("ts_ms"))

    def frames(msgs: Seq[String]) = msgs.zipWithIndex.map { case (m, i) =>
      (s"key$i".getBytes("UTF-8"), m.getBytes("UTF-8"), "cdc", 0, i.toLong)
    }.toDF("key", "value", "topic", "partition", "offset")

    // batch 1: snapshot read (r→insert) k=3, update k=1, plus
    // insert+delete churn on k=4 within the batch — latest ts wins
    val b1 = frames(Seq(
      """{"after":{"k":3,"v":"three"},"op":"r","ts_ms":10}""",
      """{"before":{"k":1,"v":"one"},"after":{"k":1,"v":"ONE"},"op":"u","ts_ms":11}""",
      """{"after":{"k":4,"v":"four"},"op":"c","ts_ms":12}""",
      """{"before":{"k":4,"v":"four"},"op":"d","ts_ms":13}"""))
    val d1 = CdcStreamer.decodeJsonEnvelope(b1, rowSchema, cfg)
    // decode emits exactly the applyBatch shape
    assert(d1.schema.fieldNames.toSeq == Seq("k", "v", "_op", "ts_ms"))
    CdcStreamer.applyBatch(target, d1, cfg)
    assert(target.read.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq == Seq((1L, "ONE"), (2L, "two"), (3L, "three")))

    // batch 2: delete k=2 (row image rides `before`), update k=3
    val b2 = frames(Seq(
      """{"before":{"k":2,"v":"two"},"op":"d","ts_ms":20}""",
      """{"before":{"k":3,"v":"three"},"after":{"k":3,"v":"THREE"},"op":"u","ts_ms":21}"""))
    CdcStreamer.applyBatch(target, CdcStreamer.decodeJsonEnvelope(b2, rowSchema, cfg), cfg)
    assert(target.read.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq == Seq((1L, "ONE"), (3L, "THREE")))

    // an unknown op code passes through raw and is named by validation
    val bBad = frames(Seq("""{"after":{"k":9,"v":"x"},"op":"zz","ts_ms":30}"""))
    val e = intercept[IllegalArgumentException] {
      CdcStreamer.applyBatch(target,
        CdcStreamer.decodeJsonEnvelope(bBad, rowSchema, cfg), cfg)
    }
    assert(e.getMessage.contains("zz"))

    // the kafka transport branch is wired: in this connector-less
    // sandbox startKafka dies in data-source lookup NAMING kafka
    val e2 = intercept[Exception] {
      CdcStreamer.startKafka("cdc_kafka", target,
        Map("kafka.bootstrap.servers" -> "localhost:9092", "topic" -> "cdc"), cfg)
    }
    assert(e2.getMessage.toLowerCase.contains("kafka"), e2.getMessage)
  }

  test("unknown op values are rejected, batch not applied") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cdc_").toString
    val target = GraftTable.createAsSelect(spark, s"$root/t",
      Seq((1L, "one")).toDF("k", "v"), Seq("k"))
    val bad = Seq((2L, "x", "OOPS", 1L)).toDF("k", "v", "_op", "_ver")
    val e = intercept[IllegalArgumentException] {
      CdcStreamer.applyBatch(target, bad, CdcConfig("k", orderColumn = Some("_ver")))
    }
    assert(e.getMessage.contains("OOPS"))
    assert(target.read.count() == 1)
  }

  test("multi-event key without orderColumn is rejected, not applied arbitrarily") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cdc_").toString
    val target = GraftTable.createAsSelect(spark, s"$root/t",
      Seq((1L, "one")).toDF("k", "v"), Seq("k"))
    // insert+delete churn on the same key: with no ordering column the
    // final state is undefined — must fail loudly instead of keeping an
    // arbitrary row (the delete could silently win or lose, run to run)
    val churn = Seq((5L, "five", "i", 1L), (5L, "five", "d", 2L))
      .toDF("k", "v", "_op", "_ver")
    val e = intercept[IllegalArgumentException] {
      CdcStreamer.applyBatch(target, churn, CdcConfig("k"))
    }
    assert(e.getMessage.contains("orderColumn"))
    assert(target.read.count() == 1)
    // single-event-per-key batches still apply fine without an order column
    CdcStreamer.applyBatch(target,
      Seq((6L, "six", "i", 1L)).toDF("k", "v", "_op", "_ver"), CdcConfig("k"))
    assert(target.read.count() == 2)
  }
}
