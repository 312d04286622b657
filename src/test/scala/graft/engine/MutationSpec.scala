package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Copy-on-write IUD: every mutation must equal the same mutation
  * expressed relationally over the source data (differential oracle). */
class MutationSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpTable(): String =
    Files.createTempDirectory("graft_iud_").toString + "/t"

  private def checkSame(a: DataFrame, b: DataFrame): Unit = {
    val ac = a.collect().map(_.toString).sorted
    val bc = b.collect().map(_.toString).sorted
    assert(ac.length == bc.length, s"row count ${ac.length} vs ${bc.length}")
    assert(ac.sameElements(bc),
      s"first diff: ${ac.zip(bc).find { case (x, y) => x != y }}")
  }

  private def ordersTable(segments: Int = 3): (GraftTable, DataFrame) = {
    val src = spark.read.parquet(s"$sf/orders.parquet")
    val t = GraftTable.create(spark, tmpTable(), src.schema, Seq("o_orderkey"))
    val n = 1500 / segments
    (0 until segments).foreach(i =>
      t.insert(src.filter(col("o_orderkey") >= i * n &&
        (if (i == segments - 1) lit(true) else col("o_orderkey") < (i + 1) * n))))
    (t, src)
  }

  test("delete rewrites only affected segments (file grain where possible)") {
    val (t, src) = ordersTable()
    val beforeSegs = t.status.visible
    // predicate confined to segment 0's key range
    val n = t.delete(col("o_orderkey") < 100)
    assert(n == src.filter(col("o_orderkey") < 100).count())
    checkSame(t.read, src.filter(col("o_orderkey") >= 100))
    val after = t.status.visible
    // segments 1,2 untouched BYTE-FOR-BYTE; segment 0 either fully
    // retired or (file-grain) surviving with fewer rows
    Seq(1L, 2L).foreach { id =>
      assert(after.find(_.id == id) == beforeSegs.find(_.id == id),
        s"segment $id must be untouched")
    }
    val seg0 = after.find(_.id == 0L)
    assert(seg0.forall(_.rowCount < beforeSegs.find(_.id == 0L).get.rowCount),
      s"segment 0 must shrink or retire, got $seg0")
  }

  test("mutation candidate pruning: point predicate scans one segment's files") {
    import org.apache.spark.sql.functions._
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("graft_mut_prune_").toString + "/t",
      spark.range(0, 1).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v").schema,
      Seq("k"), properties = Map("global_sort_partitions" -> "2"))
    // 3 segments with disjoint k ranges, 2 files each
    t.insert(spark.range(0, 1000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"))
    t.insert(spark.range(1000, 2000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"))
    t.insert(spark.range(2000, 3000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"))
    val segs = Mutation.visibleFiles(t)
    assert(segs.map(_._2.size).sum == 6)
    // segment grain: one segment survives; file grain: one file of it
    val cand = Mutation.pruneCandidates(t, segs, col("k") === 1500L)
    assert(cand.size == 1 && cand.head._1.id == 1L, s"kept ${cand.map(_._1.id)}")
    assert(cand.head._2.size == 1, s"file-grain prune kept ${cand.head._2}")
    // untranslatable predicate keeps everything (conservative)
    val all = Mutation.pruneCandidates(t, segs,
      udf((k: Long) => k == 3L).apply(col("k")))
    assert(all.map(_._2.size).sum == 6)
    // and the end-to-end delete stays exact
    assert(t.delete(col("k") === 1500L) == 1L)
    assert(t.read.count() == 2999)
  }

  test("delete with no matches is a no-op") {
    val (t, _) = ordersTable()
    val v = t.status.version
    assert(t.delete(col("o_orderkey") < 0) == 0)
    assert(t.status.version == v)
  }

  test("update applies set-expressions to matching rows only") {
    val (t, src) = ordersTable()
    val n = t.update(col("o_totalprice") > 400000.0,
      Map("o_orderpriority" -> lit("X-UPDATED"),
        "o_totalprice" -> (col("o_totalprice") * 0)))
    assert(n == src.filter(col("o_totalprice") > 400000.0).count())
    val expected = src.select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      when(col("o_totalprice") > 400000.0, lit(0.0)).otherwise(col("o_totalprice")).as("o_totalprice"),
      col("o_orderdate"),
      when(col("o_totalprice") > 400000.0, "X-UPDATED").otherwise(col("o_orderpriority")).as("o_orderpriority"))
    checkSame(t.read.select(expected.columns.map(col).toSeq: _*), expected)
  }

  test("insertOverwriteWhere replaces matching rows, touches only their segments") {
    val (t, src) = ordersTable()
    val before = t.status.visible.map(_.id).toSet
    // overwrite scope confined to segment 0's key range
    val repl = src.filter(col("o_orderkey") < 100)
      .withColumn("o_orderpriority", lit("OW"))
    val n = t.insertOverwriteWhere(col("o_orderkey") < 100, repl)
    assert(n == src.filter(col("o_orderkey") < 100).count())
    val expected = src.filter(col("o_orderkey") >= 100).unionByName(repl)
    checkSame(t.read, expected)
    // segments 1,2 must survive untouched (segment 0 may also survive
    // shrunk — file-grain copy-on-write)
    assert((before & t.status.visible.map(_.id).toSet).size >= 2,
      "unmatched segments must not be rewritten")
    // no matching rows: degenerates to a plain append
    val extra = src.filter(col("o_orderkey") < 5)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000)
    assert(t.insertOverwriteWhere(col("o_orderkey") >= 2000000, extra) == 0)
    checkSame(t.read, expected.unionByName(extra))
  }

  test("merge: updateAll + insertAll (upsert) matches relational oracle") {
    val src = spark.read.parquet(s"$sf/customer.parquet")
    val t = GraftTable.createAsSelect(spark, tmpTable(), src, Seq("c_custkey"))
    // source: halve acctbal of customers 0..49, add 10 new customers
    val updates = src.filter(col("c_custkey") < 50)
      .withColumn("c_acctbal", col("c_acctbal") * 0.5)
    val inserts = src.filter(col("c_custkey") < 10)
      .withColumn("c_custkey", col("c_custkey") + 100000)
    val source = updates.union(inserts)
    t.upsert(source, "c_custkey")
    val expected = src.filter(col("c_custkey") >= 50)
      .union(updates).union(inserts)
    checkSame(t.read, expected)
  }

  test("merge: conditional update + delete + insert actions") {
    val src = spark.read.parquet(s"$sf/customer.parquet")
    val t = GraftTable.createAsSelect(spark, tmpTable(), src, Seq("c_custkey"))
    val source = src.filter(col("c_custkey") < 100)
      .select(col("c_custkey").as("k"), lit("MERGED").as("seg"))
    t.merge(source, col("t.c_custkey") === col("s.k"))
      .whenMatched(col("t.c_acctbal") < 0).delete()
      .whenMatched().updateExpr(Map("c_mktsegment" -> col("s.seg")))
      .execute()
    val expected = src.filter(col("c_custkey") >= 100 || col("c_acctbal") >= 0)
      .withColumn("c_mktsegment",
        when(col("c_custkey") < 100, "MERGED").otherwise(col("c_mktsegment")))
    checkSame(t.read, expected)
  }

  test("merge: whenNotMatchedAndExistsOnlyOnTarget delete (full sync)") {
    val src = spark.read.parquet(s"$sf/region.parquet")
    val t = GraftTable.createAsSelect(spark, tmpTable(), src)
    val source = src.filter(col("r_regionkey") < 3)
      .select(col("r_regionkey").as("rk"))
    t.merge(source, col("t.r_regionkey") === col("s.rk"))
      .whenNotMatchedAndExistsOnlyOnTarget().delete()
      .execute()
    checkSame(t.read, src.filter(col("r_regionkey") < 3))
  }
}
