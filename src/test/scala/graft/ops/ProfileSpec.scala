package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.TestSpark

/** One-pass profiling: values match per-column ground truth (including
  * null accounting) and the whole profile is a single Spark job. */
class ProfileSpec extends AnyFunSuite {
  import TestSpark._

  test("profile matches ground truth incl. nulls (both distinct modes)") {
    val df = spark.createDataFrame(Seq(
      (Some(3L), Some("b")), (Some(1L), None), (None, Some("a")),
      (Some(3L), Some("c")), (None, None)))
      .toDF("x", "s")
    // at single-digit cardinalities HLL++ is exact too, so both modes
    // must produce identical rows here
    for (exact <- Seq(true, false)) {
      val out = Profile.profile(df, Seq("x", "s"), exact = exact).collect()
        .map(r => r.getString(0) -> r).toMap
      val x = out("x")
      assert(x.getLong(1) == 5L && x.getLong(2) == 2L && x.getLong(3) == 2L)
      assert(x.getString(4) == "1" && x.getString(5) == "3")
      val s = out("s")
      assert(s.getLong(1) == 5L && s.getLong(2) == 2L && s.getLong(3) == 3L)
      assert(s.getString(4) == "a" && s.getString(5) == "c")
    }
  }

  test("default (approx) plan has no Expand; exact plan does") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val approxPlan = Profile.profile(docs, cols)
      .queryExecution.executedPlan.toString
    val exactPlan = Profile.profile(docs, cols, exact = true)
      .queryExecution.executedPlan.toString
    // multi-column exact COUNT(DISTINCT) replicates input |cols|x via
    // Expand; the HLL default must NOT pay that
    assert(!approxPlan.contains("Expand"),
      s"approx profile should not plan an Expand:\n$approxPlan")
    assert(exactPlan.contains("Expand"))
  }

  test("profile of N columns runs as one job") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sc = spark.sparkContext
    var jobs0 = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs0 += 1
    }
    sc.addSparkListener(listener)
    try {
      Profile.profile(docs, Seq("doc_id", "lang", "source", "n_chars"))
        .collect()
      org.apache.spark.sql.graft.Shims.waitListenerBus(spark)
      // one logical pass; AQE materializes it as a couple of stage-jobs
      // — the point is it's NOT one scan per column (4 cols → ≥ 4 jobs)
      assert(jobs0 <= 3, s"profile should be one pass, saw $jobs0 jobs")
    } finally sc.removeSparkListener(listener)
  }
}
