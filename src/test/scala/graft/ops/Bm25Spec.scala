package graft.ops

import graft.engine.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranking: the ln variant matches a hand-computed score, the
  * rational-micro variant matches an exact scalar replica, ranking
  * behaviour (tf up, df down, dl down) holds, and the scoring join is
  * broadcast (never cartesian). */
class Bm25Spec extends AnyFunSuite {
  import TestSpark._

  private def corpus: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, Seq("a", "b", "a", "c")),
      (2L, Seq("a", "d")),
      (3L, Seq("e", "f", "g"))
    ).toDF("id", "toks")
  }

  test("ln-idf BM25 matches the textbook formula") {
    val got = Bm25.topK(corpus, "id", "toks", Seq("a", "b"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = 3.0; val avgdl = 9.0 / 3.0
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Double, dl: Double, df: Double) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val exp1 = term(2, 4, 2) + term(1, 4, 1) // doc1: a twice, b once
    val exp2 = term(1, 2, 2)                 // doc2: a once
    assert(got.keySet == Set(1L, 2L))
    assert(math.abs(got(1L) - exp1) < 1e-12 && math.abs(got(2L) - exp2) < 1e-12)
  }

  test("rational-micro scores equal an exact scalar replica") {
    val got = Bm25.topKRationalMicro(corpus, "id", "toks", Seq("a", "b"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = 3L; val sumdl = 9L
    def micro(tf: Long, dl: Long, df: Long): Long =
      math.floor(
        (2 * (n - df) + 1).toDouble / (2 * df + 1)
          * (22 * tf)
          / ((10 * tf + 3) + (9 * dl * n).toDouble / sumdl)
          * 1000000).toLong
    assert(got == Map(
      1L -> (micro(2, 4, 2) + micro(1, 4, 1)),
      2L -> micro(1, 2, 2)))
  }

  test("ranking behaviour: higher tf wins, rarer term outweighs, longer doc penalized") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("x", "x", "y", "z")), // tf(x)=2
      (2L, Seq("x", "w", "y", "z")), // tf(x)=1, same dl
      (3L, Seq("x", "w", "y", "z", "p", "q", "r", "s")) // tf(x)=1, longer
    ).toDF("id", "toks")
    val ranked = Bm25.topK(docs, "id", "toks", Seq("x"), 10)
      .collect().map(_.getLong(0)).toSeq
    assert(ranked == Seq(1L, 2L, 3L))
  }

  test("scoring join broadcasts the df side; no cartesian anywhere") {
    val q = Bm25.topKRationalMicro(corpus, "id", "toks", Seq("a", "b"), 10)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }
}
