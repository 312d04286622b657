package graft.ops

import graft.engine.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Connected components over near-dup pairs: transitive chains collapse
  * to one cluster labelled by the minimum id, canonical filtering keeps
  * one survivor per cluster, and the iteration cap fails loudly instead
  * of silently truncating. */
class ClusterSpec extends AnyFunSuite {
  import TestSpark._

  private def components(pairs: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(pairs.toDF("a", "b"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("transitive pairs merge into one cluster labelled by the min id") {
    // (1,2)+(2,3) chain one cluster; (10,11) another; 99 never appears
    val got = components(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a long path converges (diameter > 1 round) and directions don't matter") {
    // path 9-8-7-...-1 written with the larger id first: min label must
    // still flow the whole way down to every node
    val path = (1L until 9L).map(i => (i + 1, i))
    val got = components(path)
    assert(got.keySet == (1L to 9L).toSet && got.values.forall(_ == 1L))
  }

  test("iteration cap fails loudly, never silently truncates") {
    val path = (1L until 30L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException](components(path, maxIter = 2))
    assert(e.getMessage.contains("did not converge"))
  }

  test("empty pair set yields an empty, converged result") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(empty).count() == 0L)
  }

  test("keepCanonical keeps one survivor per cluster plus all singletons") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id")
    val comps = Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b"))
    val kept = Dedup.keepCanonical(docs, "doc_id", comps)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 99L))
  }
}
