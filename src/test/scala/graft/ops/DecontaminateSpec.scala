package graft.ops

import graft.engine.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Decontamination: planted n-gram overlap is flagged, clean docs
  * survive, the threshold gates, and the plan broadcasts the benchmark
  * side (no corpus shuffle). */
class DecontaminateSpec extends AnyFunSuite {
  import TestSpark._

  private val benchText = "the quick brown fox jumps over the lazy dog tonight"

  test("planted overlaps are flagged at the right threshold; clean docs survive") {
    import spark.implicits._
    val docs = Seq(
      // full copy: many shared 8-grams
      (1L, s"prefix words $benchText suffix words"),
      // exactly one shared 8-gram window
      (2L, "the quick brown fox jumps over the lazy cat sat on mats"),
      // same words, different order: no shared 8-gram
      (3L, "dog lazy the over jumps fox brown quick the tonight extra"),
      (4L, "completely unrelated text about spark query engines and joins")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("bench_id", "text")

    val atOne = Decontaminate.flagContaminated(
      docs, "doc_id", "text", bench, "bench_id", "text", n = 8, minOverlap = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(atOne.keySet == Set(1L, 2L))
    assert(atOne(1L) > atOne(2L) && atOne(2L) == 1L)

    // raising the threshold drops the single-gram collision
    val atTwo = Decontaminate.flagContaminated(
      docs, "doc_id", "text", bench, "bench_id", "text", n = 8, minOverlap = 2)
      .collect().map(_.getLong(0)).toSet
    assert(atTwo == Set(1L))

    // decontaminate removes exactly the flagged docs
    val clean = Decontaminate.decontaminate(
      docs, "doc_id", "text", bench, "bench_id", "text", n = 8, minOverlap = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(3L, 4L))
  }

  test("the benchmark side broadcasts — the corpus never shuffles for the join") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"alpha$i beta$i gamma$i delta$i epsilon$i"))
      .toDF("doc_id", "text")
    val bench = Seq((0L, "alpha7 beta7 gamma7 other words")).toDF("bench_id", "text")
    val flagged = Decontaminate.flagContaminated(
      docs, "doc_id", "text", bench, "bench_id", "text", n = 3, minOverlap = 1)
    val plan = flagged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast join on the gram:\n$plan")
    assert(flagged.collect().map(_.getLong(0)).toSet == Set(7L))
  }

  test("overlap counts distinct grams once (repeated gram in a doc is one hit)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c x a b c y a b c")).toDF("doc_id", "text")
    val bench = Seq((9L, "a b c")).toDF("bench_id", "text")
    val got = Decontaminate.flagContaminated(
      docs, "doc_id", "text", bench, "bench_id", "text", n = 3, minOverlap = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L))
  }
}
