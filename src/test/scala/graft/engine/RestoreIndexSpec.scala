package graft.engine

import graft.engine.index.{Si, TextIndex, VectorIndex}
import graft.ops.Ann
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** RESTORE × index families (r18, VERDICT r17 #4).
  *
  * RESTORE resurrects segments with one metadata commit — but the
  * segment-keyed indexes (SI, text, vector) may have dropped those
  * segments' entries in the meantime: a REFRESH after the mis-step
  * rebuilds coverage from the then-visible set, and index GC vacuums
  * reclaimed ids. The deferred-index coverage model must make an
  * uncovered RESTORED segment SCAN-not-skip — indexed queries stay
  * correct, just unaccelerated over that segment — and REINDEX/REFRESH
  * then restores pruning. One test per family, each driving the full
  * sequence: build index → retire segment → REFRESH (coverage entry
  * dropped) → RESTORE → indexed query returns the restored rows via
  * the fallback → repair → pruning back. */
class RestoreIndexSpec extends AnyFunSuite {
  import TestSpark._

  test("SI: a restored segment with dropped coverage scans-not-skips; REINDEX restores pruning") {
    val root = Files.createTempDirectory("graft_ri_si_").toString
    val src = spark.range(0, 3000).select(col("id").as("k"),
      (col("id") % 7).cast("string").as("grp"))
    val t = GraftTable.create(spark, s"$root/t", src.schema, sortColumns = Seq("k"),
      properties = Map("timetravel" -> "true", "index.autorefresh" -> "false"))
    t.insert(src.filter(col("k") < 1000))
    t.insert(src.filter(col("k") >= 1000 && col("k") < 2000))
    t.insert(src.filter(col("k") >= 2000))
    val si = Si.create(t, "k", s"$root/si")
    val segC = t.status.visible.map(_.id).max
    val vGood = t.status.version
    assert(Si.indexedSegments(si).contains(segC))

    // the mis-step, then a REFRESH that drops segment C's coverage
    // (full rebuild against the current — C-less — visible set)
    t.deleteSegmentsById(Seq(segC))
    Si.refresh(t, "k")
    assert(!Si.indexedSegments(GraftTable.at(spark, s"$root/si")).contains(segC),
      "fixture: REFRESH after the mis-step must drop the segment's coverage")
    assert(Si.readWhereIn(t, "k", Seq(2500L)).count() == 0)

    // rollback: C visible again with ZERO index coverage — the lookup
    // must serve its rows through the unindexed-scan fallback
    t.restoreTo(vGood)
    assert(Si.readWhereIn(t, "k", Seq(2500L)).count() == 1,
      "restored rows must come back via the scan fallback, never be index-skipped")
    assert(Si.readWhereIn(t, "k", Seq(500L)).count() == 1,
      "covered segments keep serving")

    // REINDEX = incremental repair: folds exactly the uncovered
    // restored segment back in, and pruning resumes
    Si.repair(t, "k")
    assert(Si.indexedSegments(GraftTable.at(spark, s"$root/si")).contains(segC))
    val q = Si.readWhereIn(t, "k", Seq(2500L))
    assert(q.count() == 1)
    val scanned = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }.head match { case s => TestSpark.parquetScanOf(s).fileIndex.inputFiles.toSeq }
    assert(scanned.nonEmpty && scanned.forall(_.contains(s"/segments/$segC/")),
      s"post-REINDEX lookup must prune to segment $segC, scanned: $scanned")
    GraftTable.drop(spark, s"$root/t")
  }

  test("text index: a restored segment's rows match again via the fallback; repair restores coverage") {
    val root = Files.createTempDirectory("graft_ri_ti_").toString
    val src = spark.range(0, 900).select(col("id").as("k"),
      concat(
        when(col("id") < 300, lit("alpha")).when(col("id") < 600, lit("bravo"))
          .otherwise(lit("charlie")),
        lit(" common filler")).as("body"))
    val t = GraftTable.create(spark, s"$root/t", src.schema, sortColumns = Seq("k"),
      properties = Map("timetravel" -> "true", "index.autorefresh" -> "false"))
    t.insert(src.filter(col("k") < 300))
    t.insert(src.filter(col("k") >= 300 && col("k") < 600))
    t.insert(src.filter(col("k") >= 600))
    TextIndex.create(t, "body", s"$root/ti")
    val segC = t.status.visible.map(_.id).max
    val vGood = t.status.version
    assert(TextIndex.readMatching(t, "body", "charlie").count() == 300L)

    t.deleteSegmentsById(Seq(segC))
    TextIndex.refresh(t, "body")
    assert(!Si.indexedSegments(GraftTable.at(spark, s"$root/ti")).contains(segC),
      "fixture: REFRESH after the mis-step must drop the segment's coverage")
    assert(TextIndex.readMatching(t, "body", "charlie").count() == 0L)

    t.restoreTo(vGood)
    assert(TextIndex.readMatching(t, "body", "charlie").count() == 300L,
      "restored rows must match via the uncovered-segment scan fallback")
    assert(TextIndex.readMatching(t, "body", "alpha OR charlie").count() == 600L)

    TextIndex.repair(t, "body")
    assert(Si.indexedSegments(GraftTable.at(spark, s"$root/ti")).contains(segC))
    assert(TextIndex.readMatching(t, "body", "charlie").count() == 300L)
    GraftTable.drop(spark, s"$root/t")
  }

  test("vector index: restored segment served EXACT via fallback; REFRESH restores index serving") {
    val root = Files.createTempDirectory("graft_ri_vi_").toString
    def quant(df: DataFrame): DataFrame = df
      .select(col("vec_id").cast("long").as("id"),
        Ann.quantize(col("embedding")).as("qv"))
      .withColumn("nq", Ann.normQ(col("qv")))
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = quant(emb.filter(col("vec_id") % 50 === 0))
    def exactTop(t: GraftTable, k: Int): Set[(Long, Long, Int)] =
      Ann.bruteForceTopK(queries,
          quant(t.read.select(col("vec_id"), col("embedding"))), k)
        .select("query_id", "neighbor_id", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def idxTop(t: GraftTable, k: Int): Set[(Long, Long, Int)] =
      VectorIndex.search(t, "embedding", queries, k, nprobe = 8, rerank = 100000)
        .select("query_id", "neighbor_id", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val t = GraftTable.createAsSelect(spark, s"$root/t",
      emb.filter(col("vec_id") % 3 =!= 0),
      properties = Map("timetravel" -> "true", "index.autorefresh" -> "false"))
    t.insert(emb.filter(col("vec_id") % 3 === 0))
    VectorIndex.create(t, "vec_id", "embedding", s"$root/vi",
      VectorIndex.Params(dim = 64))
    val segB = t.status.visible.map(_.id).max
    val vGood = t.status.version
    assert(idxTop(t, 5) == exactTop(t, 5), "fixture: fully covered index must equal brute force")

    // mis-step + REFRESH: segment B's codes and fingerprint rebuilt away
    t.deleteSegmentsById(Seq(segB))
    VectorIndex.refresh(t, "embedding")
    val shrunk = exactTop(t, 5)
    assert(idxTop(t, 5) == shrunk)

    // rollback: B visible again, absent from the index — the ANN probe
    // must scan it exact (stale-segment fallback), restoring the full
    // brute-force contract over the restored corpus
    t.restoreTo(vGood)
    val (afterRestore, lines) = ExplainCollector.collect(idxTop(t, 5))
    assert(afterRestore == exactTop(t, 5),
      "restored segment must be served exact via the fallback scan")
    assert(afterRestore != shrunk, "the restored rows must actually re-enter the top-k")
    assert(lines.exists(_.contains("1 scanned exact")),
      s"expected the restored segment in the exact-scan partition, got: $lines")

    VectorIndex.refresh(t, "embedding")
    val (afterRefresh, lines2) = ExplainCollector.collect(idxTop(t, 5))
    assert(afterRefresh == exactTop(t, 5))
    assert(lines2.exists(_.contains("2/2 segments served")),
      s"REFRESH must restore full index serving, got: $lines2")
    GraftTable.drop(spark, s"$root/t")
  }
}
