package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Regression: MV rewrite rule must not break unrelated queries that run
  * while MVs are registered (the merge full-outer-join plan broke once). */
class MvInteractionSpec extends AnyFunSuite {
  import TestSpark._

  test("IUD merge works with an active MV catalog") {
    val d = sf
    graft.queries.EngineQueries.queries("q_mv_rollup")(spark, d).collect()
    val out = graft.queries.IudQueries.queries("q_iud_merge")(spark, d)
    assert(out.collect().length > 0)
  }
}
