package graft.ops

import graft.engine.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketized range join vs the direct BETWEEN join: exact results at
  * several bucket widths (including widths smaller and larger than the
  * interval spans), empty-interval semantics, and the equi-join plan
  * shape (no nested loop). */
class RangeJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketized join equals direct BETWEEN at any bucket width; no nested loop") {
    import spark.implicits._
    val pts = (0L until 2000L).map(i => (i, (i * 13) % 500)).toDF("pid", "x")
    val iv = (0L until 120L)
      .map(i => (i, (i * 29) % 500, (i * 29) % 500 + (i % 40)))
      .toDF("iid", "lo", "hi")
    val expect = pts.as("p").join(iv.as("i"),
        col("p.x") >= col("i.lo") && col("p.x") <= col("i.hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expect.nonEmpty)
    for (w <- Seq(1L, 16L, 64L, 1000L)) {
      val joined = RangeJoin.rangeJoin(pts, iv, "x", "lo", "hi", w)
      val got = joined.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expect, s"bucketWidth=$w")
    }
    // plan shape: hash/merge equi-join, never a nested loop or cartesian
    val plan = RangeJoin.rangeJoin(pts, iv, "x", "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }

  test("empty and negative-domain intervals behave like SQL BETWEEN") {
    import spark.implicits._
    val pts = Seq((1L, -10L), (2L, 0L), (3L, 7L)).toDF("pid", "x")
    val iv = Seq(
      (10L, -15L, -5L), // negative domain
      (20L, 5L, 3L),    // empty (hi < lo): matches nothing
      (30L, 0L, 7L))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.rangeJoin(pts, iv, "x", "lo", "hi", 4L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 30L), (3L, 30L)))
  }
}
