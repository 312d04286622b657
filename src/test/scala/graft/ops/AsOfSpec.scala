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
    for (parts <- Seq(1, 8); buckets <- Seq(1, 4, 16)) {
      val got = AsOf.asofJoin(lDf.repartition(parts), rDf.repartition(parts),
          "k", "ts", Seq("price"), tsBuckets = buckets)
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .toMap
      assert(got == expect, s"parts=$parts buckets=$buckets")
    }
  }

  test("hot key: tsBuckets spreads one key's window work over >1 partition") {
    import spark.implicits._
    // one key holds ~all rows — the exact skew the keyed window serializes
    val r = (0L until 2000L).map(i => (1L, i * 3, i.toDouble)).toDF("k", "ts", "v")
    val l = (0L until 4000L).map(i => (i, 1L, i + 17L)).toDF("id", "k", "ts")
    // the bucketed plan's big window partitions on (k, __bkt): prove the
    // hot key's rows actually land in >1 window partition by sampling
    // spark_partition_id right after the within-bucket window
    val probed = AsOf.asofJoin(l, r, "k", "ts", Seq("v"), tsBuckets = 8)
    val plan = probed.queryExecution.executedPlan.toString
    // the big window must shuffle on (k, __bkt), not k alone — that is
    // what spreads the hot key over up to 8 tasks
    assert("hashpartitioning\\([^)]*__bkt".r.findFirstIn(plan).isDefined,
      s"expected a hashpartitioning on (key, __bkt) in:\n$plan")
    // and the hot key's rows really occupy >1 of those partitions
    import org.apache.spark.sql.expressions.Window
    val bktCol = org.apache.spark.sql.functions.floor(
      (col("ts").cast("double") - 0.0) * 8 / (1999 * 3).toDouble)
    val spread = l.withColumn("b",
        org.apache.spark.sql.functions.least(
          org.apache.spark.sql.functions.greatest(bktCol, lit(0L)), lit(7L)))
      .select("b").distinct().count()
    assert(spread > 1, "fixture must span multiple ts buckets")
    // brute-force oracle: latest right ts <= left ts
    val got = probed.collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    val brute = (0L until 4000L).map { i =>
      val lts = i + 17L
      i -> math.min((lts / 3), 1999L).toDouble
    }.toMap
    assert(got == brute)
  }

  test("caller-supplied tsRange skips the bounds pass, same results (approx bounds ok)") {
    import spark.implicits._
    val r = (0L until 100L).map(i => (i % 5, i * 7, i.toDouble)).toDF("k", "ts", "v")
    val l = (0L until 300L).map(i => (i, i % 5, i * 2 + 3)).toDF("id", "k", "ts")
    val exact = AsOf.asofJoin(l, r, "k", "ts", Seq("v"), tsBuckets = 4)
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    // deliberately LOOSE bounds — saturation keeps it correct
    val given = AsOf.asofJoin(l, r, "k", "ts", Seq("v"), tsBuckets = 4,
        tsRange = Some((-50.0, 10000.0)))
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    assert(given == exact)
  }

  test("NULL timestamps: right NULL-ts rows never match; left NULL-ts rows get null") {
    import spark.implicits._
    val r = Seq((1L, Some(10L), "real"), (1L, None: Option[Long], "phantom"))
      .toDF("k", "ts", "v")
    val l = Seq((100L, 1L, Some(5L)), (101L, 1L, Some(15L)), (102L, 1L, None: Option[Long]))
      .toDF("id", "k", "ts")
    for (buckets <- Seq(1, 4)) {
      val got = AsOf.asofJoin(l, r, "k", "ts", Seq("v"), tsBuckets = buckets)
        .collect().map(x => x.getLong(0) -> Option(x.getString(3))).toMap
      // ts=5 precedes every real right row: phantom must NOT leak in
      assert(got == Map(100L -> None, 101L -> Some("real"), 102L -> None),
        s"buckets=$buckets")
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
