package graft.engine

import graft.engine.format.{ColumnStats, FileMeta, SegmentMeta, SegmentStatus}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Driver-metadata bounds at 100k segments (VERDICT r14 Next #2). The
  * reference grew an entire Index Server because driver-side pruning
  * state stopped fitting (docs/index-server.md, IndexServer.scala);
  * SURVEY §4.2 argues this engine doesn't need one because per-segment
  * stats stay small and memoized — this spec is that claim, measured.
  *
  * Fixture: a real table (2 real segments, 3k rows) plus 100k synthetic
  * metadata-only segment entries whose sort-column ranges are DISJOINT
  * from the real data, committed through the normal atomic tablestatus
  * write. Their fake files are never opened — a point query must prune
  * every one of them from metadata alone, which is exactly the at-scale
  * claim. Bounds asserted (generous vs the <2s planning budget so the
  * spec isn't machine-noise flaky; real numbers land in STATUS):
  *
  *  - tablestatus commit log: parse < 5s cold, < 50ms memoized re-read,
  *    on-disk size < 80 MB (compact form past 4 MB);
  *  - point query (plan + execute, every synthetic segment pruned by
  *    driver-side stats): < 2s warm;
  *  - metadata count(*): < 2s (sums 100k row counts, zero file IO);
  *  - SHOW SEGMENTS-shape scan and CLEAN FILES dry-run decision pass
  *    over all 100k entries: < 2s each.
  */
class MetadataScaleSpec extends AnyFunSuite {
  import TestSpark._

  private val SegN = 100000

  test(s"$SegN-segment table: parse, prune, plan and clean-decision stay driver-bounded") {
    val dir = Files.createTempDirectory("graft_meta100k_").toString + "/t"
    // real data lives at k in [10_000_000, 10_003_000) — far above every
    // synthetic range, so stats pruning must kill all 100k fakes
    val src = spark.range(10000000L, 10003000L)
      .selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    val t = GraftTable.create(spark, dir, src.schema, sortColumns = Seq("k"),
      properties = Map("global_sort_partitions" -> "2"))
    t.insert(src.filter(col("id") < 10001500L))
    t.insert(src.filter(col("id") >= 10001500L))

    // inject the synthetic entries through the normal locked commit
    val t0commit = System.nanoTime()
    t.layout.commit { st =>
      val base = st.nextSegmentId
      val fakes = (0 until SegN).map { i =>
        val lo = i.toLong * 10
        val stats = Map("k" -> ColumnStats(Some(lo.toString), Some((lo + 9).toString), 0))
        SegmentMeta(
          id = base + i,
          status = SegmentStatus.Success,
          format = "parquet",
          files = Seq(s"part-$i.parquet"),
          rowCount = 10,
          sizeBytes = 4096,
          stats = stats,
          sortColumns = Seq("k"),
          createdAt = 1700000000000L + i,
          fileMeta = Map(s"part-$i.parquet" -> FileMeta(10, 4096, stats)))
      }
      st.copy(segments = st.segments ++ fakes)
    }
    val commitS = (System.nanoTime() - t0commit) / 1e9
    info(f"100k-entry commit (build+serialize+atomic rename): $commitS%.2f s")

    val statusFile = new java.io.File(s"$dir/_meta/tablestatus.json")
    val sizeMb = statusFile.length / 1e6
    info(f"tablestatus.json on disk: $sizeMb%.1f MB for ${SegN + 2} segments")
    assert(sizeMb < 80, f"commit log blew the compact-form budget: $sizeMb%.1f MB")

    // cold parse (uncached read of the full log)
    val t1 = System.nanoTime()
    val st = t.layout.readStatusUncached()
    val parseS = (System.nanoTime() - t1) / 1e9
    info(f"cold tablestatus parse: $parseS%.2f s (${st.segments.size} segments)")
    assert(st.segments.size == SegN + 2)
    assert(parseS < 5.0, f"cold parse took $parseS%.2f s")

    // memoized re-read (MetaCache validates by (mtime, length) only)
    val t2 = System.nanoTime()
    val st2 = t.layout.readStatus()
    val cachedS = (System.nanoTime() - t2) / 1e9
    info(f"memoized re-read: ${cachedS * 1000}%.1f ms")
    assert(st2.segments.size == SegN + 2)
    assert(cachedS < 0.05, f"memoized read took ${cachedS * 1000}%.0f ms")

    // metadata count(*): sums 100k row counts, opens zero files
    val t3 = System.nanoTime()
    val n = t.countStar
    val countS = (System.nanoTime() - t3) / 1e9
    info(f"metadata count(*): ${countS * 1000}%.0f ms")
    assert(n == 3000L + 10L * SegN)
    assert(countS < 2.0)

    // the at-scale read: a point query must prune every synthetic
    // segment from driver-side stats and open only the real files —
    // a single opened fake file would throw (they don't exist)
    def pointQuery(): Long = t.read.filter(col("k") === 10000042L).count()
    assert(pointQuery() == 1L) // warm-up (plan + codegen + footer reads)
    val t4 = System.nanoTime()
    assert(pointQuery() == 1L)
    val planS = (System.nanoTime() - t4) / 1e9
    info(f"warm point query over 100k pruned segments: ${planS * 1000}%.0f ms")
    assert(planS < 2.0, f"point query took $planS%.2f s — planning is not metadata-bounded")

    // range query across the real segments only — same pruning path
    val t5 = System.nanoTime()
    assert(t.read.filter(col("k") >= 10002990L).count() == 10L)
    val rangeS = (System.nanoTime() - t5) / 1e9
    assert(rangeS < 2.0, f"range query took $rangeS%.2f s")

    // SHOW SEGMENTS-shape pass: project id/status/rows/bytes over all
    val t6 = System.nanoTime()
    val shown = t.status.segments.map(s => (s.id, s.status, s.rowCount, s.sizeBytes))
    val showS = (System.nanoTime() - t6) / 1e9
    info(f"SHOW SEGMENTS pass: ${showS * 1000}%.0f ms")
    assert(shown.size == SegN + 2 && showS < 2.0)

    // CLEAN FILES decision pass (dry run — predicate over every entry,
    // no disk mutation beyond the tmp-dir listing)
    val t7 = System.nanoTime()
    val doomed = t.cleanFilesDryRun()
    val cleanS = (System.nanoTime() - t7) / 1e9
    info(f"CLEAN FILES dry-run decision pass: ${cleanS * 1000}%.0f ms")
    assert(doomed.isEmpty && cleanS < 2.0)

    // commit latency under the table lock: the RMW read is the
    // stat-validated snapshot (this JVM wrote the last publish, so no
    // re-parse) — the remaining cost is serializing + renaming the
    // ~45 MB log (~2.5 s isolated). That is the honest writer-
    // serialization bound at this segment count; past it the design
    // answer is coarser segments (compaction), not a faster commit.
    val t8 = System.nanoTime()
    t.layout.commit(identity)
    val commit2S = (System.nanoTime() - t8) / 1e9
    info(f"no-op commit at 100k segments (lock+read+serialize+rename): ${commit2S * 1000}%.0f ms")
    assert(commit2S < 4.0, f"commit took $commit2S%.2f s under the table lock")

    // retained-heap sanity: the parsed status is the dominant driver
    // object; measure it approximately via serialized-JSON size already
    // asserted above, plus entry count — no per-query duplication: the
    // MetaCache holds ONE snapshot per table keyed by (mtime,length)
    GraftTable.drop(spark, dir)
  }
}
