package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.TestSpark
import graft.functions.GraftFunctions.approxTopK

/** Misra-Gries heavy-hitters aggregate: exact when k exceeds the
  * vocabulary, and in the pruned regime every true heavy item
  * (freq > N/(k+1)) survives with an undercount of at most N/(k+1) —
  * across partition merges. */
class HeavyHittersSpec extends AnyFunSuite {
  import TestSpark._

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.agg(approxTopK(col("token"), k).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.token").as("token"), col("e.count").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))

  private def exact(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("token").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  // zipf-ish stream: token t_i appears ~N/i times, i = 1..40
  private def zipf = {
    import spark.implicits._
    (1 to 40).flatMap(i => Seq.fill(4000 / i)(f"t$i%02d"))
      .toDF("token").repartition(8) // force multi-partition merges
  }

  test("k >= vocabulary: sketch counts are exact") {
    val truth = exact(zipf)
    val got = sketch(zipf, 64).toMap
    assert(got == truth)
  }

  test("pruned k: heavy items survive merges with bounded undercount") {
    val df = zipf
    val truth = exact(df)
    val n = truth.values.sum
    val k = 12
    val got = sketch(df, k).toMap
    assert(got.size <= k)
    val bound = n / (k + 1)
    truth.foreach { case (t, c) =>
      if (c > bound)
        assert(got.contains(t), s"heavy item $t (true $c > $bound) evicted")
    }
    got.foreach { case (t, est) =>
      val c = truth(t)
      assert(est <= c, s"$t overcounted: est $est > true $c")
      assert(c - est <= bound, s"$t undercount ${c - est} exceeds $bound")
    }
  }

  test("nulls are skipped; output sorted count desc then token asc") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("b"), Some("a"), None)
      .toDF("token")
    val got = sketch(df, 8)
    assert(got.toSeq == Seq("a" -> 2L, "b" -> 1L))
  }
}
