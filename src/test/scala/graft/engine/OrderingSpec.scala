package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SupportsReportOrdering: the write-time sort becomes scan output
  * ordering whenever the planned file chains provably concatenate
  * sorted (footer min/max, non-overlapping ranges) — and stays
  * UNREPORTED when segments overlap (soundness). The payoff: a
  * sort-merge join of two co-bucketed sorted tables runs with neither
  * shuffles NOR sorts (reference analog: sorted-column reads,
  * CarbonTakeOrderedAndProjectExec.scala readFromHead). */
class OrderingSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft_ord_").toString + "/t"

  private def scanOrdering(df: org.apache.spark.sql.DataFrame): Seq[_] =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.ordering.getOrElse(Nil)
    }.getOrElse(Nil)

  private def withSQLConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("single sorted segment reports its sort order; overlapping segments do not") {
    val src = spark.range(0, 2000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    val t = GraftTable.create(spark, tmp(), src.schema, sortColumns = Seq("k"))
    t.insert(src)
    assert(scanOrdering(t.read.select("k", "v")).nonEmpty,
      "global-sorted single segment must report ordering")
    // a second insert overlapping the first k-range makes chains overlap
    t.insert(src)
    assert(scanOrdering(t.read.select("k", "v")).isEmpty,
      "overlapping segment ranges must suppress the ordering claim")
  }

  test("ordering claim is dropped when the sort column is pruned away") {
    val src = spark.range(0, 500).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    val t = GraftTable.create(spark, tmp(), src.schema, sortColumns = Seq("k"))
    t.insert(src)
    assert(scanOrdering(t.read.select("v")).isEmpty)
  }

  test("split planning runs once per executed scan (ordering consult is memoized)") {
    val src = spark.range(0, 2000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    val t = GraftTable.create(spark, tmp(), src.schema, sortColumns = Seq("k"))
    t.insert(src)
    val df = t.read.select("k", "v")
    // force the full pipeline: pushdown finalization consults
    // outputOrdering (which needs the planned chains), then execution
    // plans the batch — both must hit the same memoized planning pass
    assert(scanOrdering(df).nonEmpty)
    assert(df.collect().length == 2000)
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan
    }.collect { case cs: graft.engine.source.CarbonishScan => cs }
    assert(scans.nonEmpty, "expected a carbonish scan in the executed plan")
    scans.foreach(cs => assert(cs.planInvocations.get == 1,
      s"expected exactly one split-planning pass, got ${cs.planInvocations.get}"))
  }

  test("co-bucketed sorted tables: merge join with no shuffle and no sort") {
    val wh = Files.createTempDirectory("graft_owh_").toString
    spark.conf.set("spark.sql.catalog.go", "graft.engine.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.go.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS go.ns")
    spark.sql("CREATE TABLE go.ns.a (k BIGINT, v DOUBLE) USING carbonish " +
      "PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('sort_columns'='k')")
    spark.sql("CREATE TABLE go.ns.b (k BIGINT, w DOUBLE) USING carbonish " +
      "PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('sort_columns'='k')")
    spark.sql("INSERT INTO go.ns.a SELECT id, CAST(id AS DOUBLE) FROM range(0, 1000)")
    spark.sql("INSERT INTO go.ns.b SELECT id * 3, CAST(id AS DOUBLE) FROM range(0, 300)")

    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = spark.sql(
        "SELECT a.k, a.v, b.w FROM go.ns.a a JOIN go.ns.b b ON a.k = b.k")
      assert(joined.collect().length == 300)
      val plan = joined.queryExecution.executedPlan
      val smj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, s"expected a sort-merge join; plan:\n$plan")
      val shuffles = plan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      val sorts = plan.collect { case s: org.apache.spark.sql.execution.SortExec => s }
      assert(shuffles.isEmpty, s"no shuffle expected; plan:\n$plan")
      assert(sorts.isEmpty, s"no sort expected (scan reports ordering); plan:\n$plan")
    }
  }
}
