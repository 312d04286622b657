package graft.engine

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SchemaEvolutionSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpTable(): String =
    Files.createTempDirectory("graft_evo_").toString + "/t"

  test("add column: old segments read null, new segments carry values") {
    val src = spark.read.parquet(s"$sf/region.parquet")
    val t = GraftTable.createAsSelect(spark, tmpTable(), src)
    t.addColumns(Seq(StructField("score", LongType, nullable = true)))
    assert(t.read.schema.fieldNames.contains("score"))
    assert(t.read.filter(col("score").isNull).count() == 5)
    t.insert(src.withColumn("score", col("r_regionkey") * 10L))
    assert(t.read.count() == 10)
    assert(t.read.filter(col("score").isNotNull).count() == 5)
    assert(t.read.agg(sum("score")).collect().head.getLong(0) == 100)
  }

  test("drop column: values gone from reads, sort columns protected") {
    val src = spark.read.parquet(s"$sf/nation.parquet")
    val t = GraftTable.createAsSelect(spark, tmpTable(), src, Seq("n_nationkey"))
    t.dropColumns(Seq("n_regionkey"))
    assert(!t.read.schema.fieldNames.contains("n_regionkey"))
    assert(t.read.count() == 25)
    intercept[IllegalArgumentException](t.dropColumns(Seq("n_nationkey")))
  }

  test("rename column rewrites data once and keeps answers") {
    val src = spark.read.parquet(s"$sf/region.parquet")
    val t = GraftTable.createAsSelect(spark, tmpTable(), src, Seq("r_regionkey"))
    t.insert(src) // two segments
    t.renameColumn("r_name", "region_name")
    assert(t.read.schema.fieldNames.toSeq == Seq("r_regionkey", "region_name"))
    assert(t.read.count() == 10)
    assert(t.read.filter(col("region_name").isNotNull).count() == 10)
    assert(t.status.visible.size == 1) // consolidated by the rewrite
  }

  test("change column type rewrites and casts") {
    val src = spark.read.parquet(s"$sf/region.parquet")
    val t = GraftTable.createAsSelect(spark, tmpTable(), src)
    t.changeColumnType("r_regionkey", DoubleType)
    assert(t.read.schema("r_regionkey").dataType == DoubleType)
    assert(t.read.agg(sum("r_regionkey")).collect().head.getDouble(0) == 10.0)
  }
}
