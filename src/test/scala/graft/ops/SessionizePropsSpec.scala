package graft.ops

import graft.engine.TestSpark
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for gap sessionization: on ARBITRARY generated event
  * sets — duplicate timestamps, single-event users, all-one-session and
  * all-new-session gaps, users clustered or spread over the ts range —
  * the sub-bucketed plan must produce the numbering of (a) the B=1
  * window plan and (b) an independent single-threaded Scala fold, for
  * every bucket count. (Plain scalacheck generators driven from a loop,
  * as in SqlTextPropsSpec.) */
class SessionizePropsSpec extends AnyFunSuite {
  import TestSpark._

  private val GapUs = 10L * 1000000L // 10 s

  // (user, tsSec, tie): ts collisions are likely (small sec domain) so
  // the tie-break path is exercised; users 1-4 make hot keys common
  private val event: Gen[(Long, Long, Long)] = for {
    u <- Gen.choose(1L, 4L)
    s <- Gen.frequency(
      4 -> Gen.choose(0L, 40L),          // dense cluster: few sessions
      2 -> Gen.choose(0L, 2000L),        // spread: many sessions
      1 -> Gen.choose(100000L, 100040L)) // far cluster: empty mid-buckets
  } yield (u, s, 0L)

  private def dataset(n: Int, seed: Long): Seq[(Long, Long, Long)] = {
    val g = Gen.listOfN(n, event)
    val evs = (0 until 10).iterator
      .flatMap(i => g.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed + i)))
      .next()
    // tie id makes (ts, tie) unique per user, as assign requires
    evs.zipWithIndex.map { case ((u, s, _), i) => (u, s, i.toLong) }
  }

  /** Independent single-threaded oracle: per user, sort by (ts, tie),
    * number sessions by the gap rule. */
  private def oracle(evs: Seq[(Long, Long, Long)]): Map[Long, Long] =
    evs.groupBy(_._1).flatMap { case (_, es) =>
      var last = Long.MinValue
      var seq = 0L
      es.sortBy(e => (e._2, e._3)).map { case (_, s, tie) =>
        if (last == Long.MinValue || s * 1000000L - last > GapUs) seq += 1
        last = s * 1000000L
        tie -> seq
      }
    }

  test("any B: bucketed numbering equals B=1 and the Scala fold oracle") {
    import spark.implicits._
    for (round <- 0 until 4) {
      val evs = dataset(120 + round * 60, seed = 1000L + round)
      val df = evs.map { case (u, s, tie) =>
        (u, new java.sql.Timestamp(s * 1000L), tie) }
        .toDF("user_id", "ts", "event_id")
      val truth = oracle(evs)
      for (b <- Seq(1, 3, 8)) {
        val got = Sessionize.assign(df, "user_id", "ts", "event_id", GapUs,
            tsBuckets = b)
          .select(col("event_id"), col("session_seq"))
          .as[(Long, Long)].collect().toMap
        assert(got == truth, s"round=$round tsBuckets=$b differs from oracle")
      }
    }
  }
}
