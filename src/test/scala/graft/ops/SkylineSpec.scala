package graft.ops

import graft.engine.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-phase distributed skyline vs a brute-force dominance check, plus
  * the min/max direction handling, tie semantics, and the
  * candidate-pool guard. */
class SkylineSpec extends AnyFunSuite {
  import TestSpark._

  private def brute(
      rows: Seq[(Long, Double, Double)], minA: Boolean, minB: Boolean): Set[Long] = {
    def better(x: Double, y: Double, min: Boolean) = if (min) x < y else x > y
    def notWorse(x: Double, y: Double, min: Boolean) = if (min) x <= y else x >= y
    rows.filterNot { case (_, a, b) =>
      rows.exists { case (_, a2, b2) =>
        notWorse(a2, a, minA) && notWorse(b2, b, minB) &&
          (better(a2, a, minA) || better(b2, b, minB))
      }
    }.map(_._1).toSet
  }

  test("skyline equals brute-force dominance on pseudo-random data, any partitioning") {
    import spark.implicits._
    val rows = (0L until 2000L).map(i =>
      (i, ((i * 37) % 211).toDouble, ((i * 53) % 197).toDouble))
    val df = rows.toDF("id", "price", "quality")
    val expect = brute(rows, minA = true, minB = false)
    for (parts <- Seq(1, 7, 32)) {
      val got = Skyline.skyline(df.repartition(parts),
          Seq("price" -> true, "quality" -> false))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == expect, s"parts=$parts")
    }
  }

  test("ties on every criterion all survive; nulls never enter") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(1.0), Some(5.0)), (2L, Some(1.0), Some(5.0)), // tied optimum
      (3L, Some(2.0), Some(4.0)),                             // dominated
      (4L, None, Some(9.0)))                                  // null criterion
      .toDF("id", "a", "b")
    val got = Skyline.skyline(df, Seq("a" -> true, "b" -> false))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("candidate-pool guard fails loudly on weakly-selective criteria") {
    import spark.implicits._
    // an anti-chain: every row is on the skyline, pool = all rows
    val df = (0L until 100L).map(i => (i, i.toDouble, -i.toDouble)).toDF("id", "a", "b")
    val e = intercept[Exception] {
      Skyline.skyline(df, Seq("a" -> true, "b" -> true), candidateLimit = 10L)
        .collect()
    }
    assert(e.getMessage != null)
  }
}
