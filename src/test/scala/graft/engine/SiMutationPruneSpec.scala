package graft.engine

import graft.engine.index.Si
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SI rung of the MUTATION candidate ladder: the find-the-matches scan
  * of UPDATE/DELETE must shrink to the posting-named files on a
  * non-sort column (where stats can't prune), stay conservative on
  * uncovered segments, and never change results. */
class SiMutationPruneSpec extends AnyFunSuite {
  import TestSpark._

  private def fixture(): (GraftTable, org.apache.spark.sql.DataFrame) = {
    val src = spark.read.parquet(s"$sf/orders.parquet")
    val root = Files.createTempDirectory("graft_simut_").toString
    val t = GraftTable.create(spark, s"$root/t", src.schema, Seq("o_orderkey"))
    Seq("O", "F", "P").foreach(s0 =>
      t.insert(src.filter(col("o_orderstatus") === s0)))
    Si.create(t, "o_orderstatus", s"$root/si")
    (t, src)
  }

  test("candidate files shrink to the SI hits on a non-sort column") {
    val (t, _) = fixture()
    val segs = Mutation.visibleFiles(t)
    assert(segs.map(_._2.size).sum > 1)
    val pruned = Mutation.pruneCandidates(t, segs, col("o_orderstatus") === "P")
    assert(pruned.map(_._1.id) == Seq(2L),
      s"expected only segment 2, got ${pruned.map(_._1.id)}")
    // a value in no segment prunes everything
    assert(Mutation.pruneCandidates(t, segs, col("o_orderstatus") === "ZZ").isEmpty)
    // uncovered (post-build) segments keep all their files
    val src2 = t.read.filter(col("o_orderstatus") === "P").limit(5)
    t.insert(src2)
    val segs2 = Mutation.visibleFiles(t)
    val pruned2 = Mutation.pruneCandidates(t, segs2, col("o_orderstatus") === "P")
    assert(pruned2.map(_._1.id).toSet == Set(2L, 3L),
      s"uncovered segment 3 must stay, got ${pruned2.map(_._1.id)}")
  }

  test("DELETE/UPDATE through the SI-pruned scan stay value-correct") {
    val (t, src) = fixture()
    val pBefore = src.filter(col("o_orderstatus") === "P").count()
    assert(t.delete(col("o_orderstatus") === "P") == pBefore)
    assert(t.read.count() == src.count() - pBefore)
    assert(t.read.filter(col("o_orderstatus") === "P").count() == 0)
    // the delete rewrote segment 2 into a NEW (uncovered) segment and
    // retired the old id — a follow-up mutation through the stale SI
    // must still see everything
    val fBefore = src.filter(col("o_orderstatus") === "F").count()
    assert(t.update(col("o_orderstatus") === "F",
      Map("o_orderpriority" -> lit("X-SI"))) == fBefore)
    assert(t.read.filter(col("o_orderpriority") === "X-SI").count() == fBefore)
  }
}
