package graft.ops

import graft.engine.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join vs a brute-force point-in-time lookup: inclusive
  * boundary, no-match nulls, whole-row payload coherence, and
  * partition invariance. */
class AsOfSpec extends AnyFunSuite {
  import TestSpark._

  test("asofJoin equals brute-force latest-at-or-before, any partitioning") {
    import spark.implicits._
    val right = (0L until 300L).map(i => (i % 7, i * 5, i.toDouble))
    val left = (0L until 500L).map(i => (i, i % 7, (i * 3 + 1)))
    val rDf = right.toDF("k", "ts", "price")
    val lDf = left.toDF("id", "k", "ts")
    val expect = left.map { case (id, k, ts) =>
      val cands = right.filter(r => r._1 == k && r._2 <= ts)
      id -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
    }.toMap
    for (parts <- Seq(1, 8)) {
      val got = AsOf.asofJoin(lDf.repartition(parts), rDf.repartition(parts),
          "k", "ts", Seq("price"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .toMap
      assert(got == expect, s"parts=$parts")
    }
  }

  test("inclusive boundary: a right row AT the probe timestamp matches") {
    import spark.implicits._
    val r = Seq((1L, 10L, "early"), (1L, 20L, "exact")).toDF("k", "ts", "v")
    val l = Seq((100L, 1L, 20L), (101L, 1L, 19L), (102L, 1L, 5L)).toDF("id", "k", "ts")
    val got = AsOf.asofJoin(l, r, "k", "ts", Seq("v")).collect()
      .map(x => x.getLong(0) -> Option(x.getString(3))).toMap
    assert(got == Map(100L -> Some("exact"), 101L -> Some("early"), 102L -> None))
  }

  test("multi-column payload stays coherent (fields from ONE right row, nulls kept)") {
    import spark.implicits._
    val r = Seq(
      (1L, 10L, Some("a"), Some(1.0)),
      (1L, 20L, None: Option[String], Some(2.0))) // later row has a NULL field
      .toDF("k", "ts", "tag", "x")
    val l = Seq((9L, 1L, 30L)).toDF("id", "k", "ts")
    val row = AsOf.asofJoin(l, r, "k", "ts", Seq("tag", "x")).collect().head
    // the ts=20 row is the as-of match: its null tag must NOT be
    // backfilled from the ts=10 row
    assert(row.isNullAt(3) && row.getDouble(4) == 2.0)
  }
}
