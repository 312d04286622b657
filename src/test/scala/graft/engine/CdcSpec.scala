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
      Seq((2L, "TWO", "u", 1L), (4L, "four", "i", 1L),
        (5L, "five", "i", 1L), (5L, "five", "d", 2L))
        .toDF("k", "v", "_op", "_ver")
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      assert(target.read.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
        .toSeq == Seq((1L, "one"), (2L, "TWO"), (3L, "three"), (4L, "four")))

      // batch 2: delete k=1, update k=4; SHOW STREAMS sees the job
      Seq((1L, "one", "d", 3L), (4L, "FOUR", "u", 3L))
        .toDF("k", "v", "_op", "_ver")
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      assert(target.read.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
        .toSeq == Seq((2L, "TWO"), (3L, "three"), (4L, "FOUR")))
      assert(StreamManager.showStreams.exists(s => s._1 == "cdc_t" && s._3 == "RUNNING"))
    } finally StreamManager.dropStream("cdc_t")
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
