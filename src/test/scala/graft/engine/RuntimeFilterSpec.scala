package graft.engine

import graft.engine.source.CarbonishScan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Runtime (DPP-style) segment pruning: a join-key filter arriving at
  * execution time must shrink the planned fact scan to the segments
  * whose stats can match — before any fact IO. */
class RuntimeFilterSpec extends AnyFunSuite {
  import TestSpark._

  private def fact3(): GraftTable = {
    val path = Files.createTempDirectory("graft_rf_").toString + "/t"
    val src = spark.range(0, 3000).selectExpr("id AS k", "id % 100 AS m")
    val t = GraftTable.create(spark, path, src.schema, Seq("k"))
    t.insert(src.filter(col("k") < 1000))
    t.insert(src.filter(col("k") >= 1000 && col("k") < 2000))
    t.insert(src.filter(col("k") >= 2000))
    t
  }

  test("scan exposes stats columns for runtime filtering and prunes on filter()") {
    val t = fact3()
    val df = t.read
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head.asInstanceOf[CarbonishScan]
    assert(scan.filterAttributes().map(_.fieldNames.head).toSet == Set("k", "m"))
    assert(scan.currentInner.fileIndex.inputFiles.length > 0)
    val all = scan.currentInner.fileIndex.inputFiles.length
    // runtime filter k IN (2100, 2500): only segment 2 can match
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k", Array(2100L, 2500L))))
    val files = scan.currentInner.fileIndex.inputFiles
    assert(files.length < all && files.forall(_.contains("/segments/2/")),
      s"expected only segment 2 after runtime filter:\n${files.mkString("\n")}")
    // batch planning reflects the reduced index (toBatch reads live state)
    assert(scan.toBatch.planInputPartitions().nonEmpty)
  }

  test("runtime filter refines at FILE grain inside a kept segment") {
    val path = Files.createTempDirectory("graft_rf_").toString + "/t"
    val src = spark.range(0, 4000).selectExpr("id AS k", "id % 100 AS m")
    // ONE segment of 4 globally-sorted files with disjoint k ranges:
    // segment grain can never prune, only per-file footer stats can
    val t = GraftTable.create(spark, path, src.schema, Seq("k"),
      properties = Map("global_sort_partitions" -> "4"))
    t.insert(src)
    assert(t.status.visible.size == 1 && t.status.visible.head.files.size == 4)
    val df = t.read
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head.asInstanceOf[CarbonishScan]
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k", Array(42L, 43L))))
    // the rebuilt index carries the runtime filters: listFiles must
    // keep only the one file whose footer range covers the keys
    val kept = scan.currentInner.fileIndex.listFiles(Nil, Nil).flatMap(_.files)
    assert(kept.length == 1,
      s"expected 1 file after file-grain runtime refinement, got ${kept.length}")

    // end-to-end: an un-hinted DPP-shaped broadcast join stays exact
    import spark.implicits._
    val dim = Seq(40L, 41L, 42L, 43L, 44L).toDF("dk")
    val joined = t.read.join(broadcast(dim), col("k") === col("dk"))
    assert(joined.count() == 5)
  }

  test("runtime filter on a bucket column pins files to the matching buckets") {
    val path = Files.createTempDirectory("graft_rf_").toString + "/t"
    val src = spark.range(0, 4000).selectExpr("id AS k", "id % 100 AS m")
    // hash-bucketed on k: footer stats on k span the full range in every
    // bucket file (hashing doesn't cluster), so only bucket-grain
    // pruning can serve a point runtime filter
    val t = GraftTable.create(spark, path, src.schema, Seq("m"),
      properties = Map("bucket_columns" -> "k", "bucket_count" -> "8"))
    t.insert(src)
    val all = t.status.visible.head.files.size
    assert(all == 8, s"expected 8 bucket files, got $all")
    val df = t.read
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head.asInstanceOf[CarbonishScan]
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k", Array(42L, 43L))))
    val kept = scan.currentInner.fileIndex.listFiles(Nil, Nil).flatMap(_.files)
    assert(kept.length <= 2 && kept.nonEmpty,
      s"expected ≤2 bucket files after runtime bucket pin, got ${kept.length}")
  }

  test("small carbonish table auto-broadcasts (scan reports statistics)") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_rf_").toString + "/dim"
    val dim = GraftTable.createAsSelect(spark,
      path, Seq((1L, "a"), (2L, "b")).toDF("k", "name"))
    val fact = fact3()
    // no broadcast() hint: the size estimate alone must trigger it
    val joined = fact.read.join(dim.read, "k")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected auto-broadcast of the 2-row carbonish dim:\n$plan")
  }

  test("broadcast join against a filtered dim stays correct with runtime filtering on") {
    import spark.implicits._
    val t = fact3()
    val dim = Seq((2100L, "x"), (2500L, "y")).toDF("k", "name")
    val joined = t.read.join(broadcast(dim), "k")
    assert(joined.count() == 2)
    assert(joined.select("k").collect().map(_.getLong(0)).toSet == Set(2100L, 2500L))
  }
}
