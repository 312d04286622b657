package graft.engine

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SupportsPushDownTopN: ORDER BY <sort column> LIMIT k over a segmented
  * table must plan a scan over only the k-covering segment subset
  * (reference head-read, CarbonTakeOrderedAndProjectExec.scala:35). */
class TopNSpec extends AnyFunSuite {
  import TestSpark._

  private def build3(): GraftTable = {
    val path = Files.createTempDirectory("graft_topn_").toString + "/t"
    val src = spark.range(0, 3000).selectExpr("id AS k", "CAST(id % 7 AS INT) AS v")
    val t = GraftTable.create(spark, path, src.schema, Seq("k"))
    t.insert(src.filter(col("k") < 1000))
    t.insert(src.filter(col("k") >= 1000 && col("k") < 2000))
    t.insert(src.filter(col("k") >= 2000))
    t
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[ParquetScan] = p.collect {
      case b: BatchScanExec => Seq(TestSpark.parquetScanOf(b.scan))
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    }.flatten
    scans(df.queryExecution.executedPlan).flatMap(_.fileIndex.inputFiles)
  }

  test("ASC topN scans only the head segment; DESC only the tail") {
    val t = build3()
    assert(t.status.visible.size == 3)

    val asc = t.read.orderBy("k").limit(10)
    val ascFiles = scannedFiles(asc)
    assert(ascFiles.nonEmpty && ascFiles.forall(_.contains("/segments/0/")),
      s"ASC top-10 should read only segment 0, got:\n${ascFiles.mkString("\n")}")
    assert(asc.collect().map(_.getLong(0)).toSeq == (0L until 10L))

    val desc = t.read.orderBy(col("k").desc).limit(10)
    val descFiles = scannedFiles(desc)
    assert(descFiles.nonEmpty && descFiles.forall(_.contains("/segments/2/")),
      s"DESC top-10 should read only segment 2, got:\n${descFiles.mkString("\n")}")
    assert(desc.collect().map(_.getLong(0)).toSeq == (2999L to 2990L by -1L))
  }

  test("topN under an aggregate still prunes and stays exact") {
    val t = build3()
    val q = t.read.orderBy("k").limit(1500)
      .agg(count(lit(1)).as("cnt"), max(col("k")).as("max_k"))
    // 1500 rows need segments 0+1; segment 2 (min 2000 > bound) is skipped
    val files = scannedFiles(q)
    assert(files.nonEmpty && !files.exists(_.contains("/segments/2/")),
      s"segment 2 not pruned:\n${files.mkString("\n")}")
    val r = q.collect().head
    assert(r.getLong(0) == 1500 && r.getLong(1) == 1499L)
  }

  test("filters or a non-stats column disable the pushdown") {
    val t = build3()
    // filter present → no topN segment pruning (counts no longer cover k)
    val filtered = t.read.filter(col("v") === 3).orderBy("k").limit(5)
    assert(filtered.collect().map(_.getLong(0)).toSeq ==
      Seq(3L, 10L, 17L, 24L, 31L))
    // expression order key → scan unchanged, result exact
    val expr = t.read.orderBy((col("k") % 13).asc, col("k").asc).limit(3)
    assert(expr.collect().map(_.getLong(0)).toSeq == Seq(0L, 13L, 26L))
  }
}
