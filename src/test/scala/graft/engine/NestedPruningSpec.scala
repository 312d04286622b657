package graft.engine

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Nested-column projection pushdown through the carbonish scan
  * (reference PushDownHelper.pushDownProjection incl. nested children,
  * SURVEY §2.2 — delegated to Spark's nestedSchemaPruning here; this
  * spec proves the delegation actually reaches the reader). */
class NestedPruningSpec extends AnyFunSuite {
  import TestSpark._

  test("selecting one struct field prunes the read schema to that leaf") {
    val src = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"),
        struct(
          col("o_totalprice").as("price"),
          col("o_orderstatus").as("status"),
          col("o_orderpriority").as("prio")).as("info"))
    val path = Files.createTempDirectory("graft_nested_").toString + "/t"
    val t = GraftTable.createAsSelect(spark, path, src)

    val q = t.read.select(col("o_orderkey"), col("info.price"))
    val scan = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head match {
      case s => TestSpark.parquetScanOf(s).readDataSchema
    }
    val info = scan("info").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(info.fieldNames.toSeq == Seq("price"),
      s"nested pruning should keep only info.price, got ${info.fieldNames.mkString(",")}")
    // values correct end-to-end
    assert(q.agg(sum(col("price").cast("decimal(18,4)"))).collect().head ==
      src.agg(sum(col("info.price").cast("decimal(18,4)"))).collect().head)
    // nested field filters still answer correctly
    assert(t.read.filter(col("info.status") === "O").count() ==
      src.filter(col("info.status") === "O").count())
  }
}
