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

    // r16: past the inline threshold the log is CHECKPOINTED — the
    // manifest stays KB-sized and the bulk lives in _meta/log
    val statusFile = new java.io.File(s"$dir/_meta/tablestatus.json")
    val logBytes = Option(new java.io.File(s"$dir/_meta/log").listFiles())
      .map(_.map(_.length).sum).getOrElse(0L)
    val sizeMb = (statusFile.length + logBytes) / 1e6
    info(f"commit log on disk: $sizeMb%.1f MB total for ${SegN + 2} segments " +
      f"(manifest ${statusFile.length / 1e3}%.1f KB)")
    assert(sizeMb < 80, f"commit log blew the compact-form budget: $sizeMb%.1f MB")
    assert(statusFile.length < 64 * 1024,
      "manifest must stay small in the checkpointed form")

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

    // commit latency under the table lock: in the checkpointed form a
    // regular commit serializes ONE delta (O(changed segments)) plus a
    // KB-sized manifest rename — r15's honest bound here was ~2.5 s
    // (full 45 MB rewrite per commit); now it must be ms-class.
    val t8 = System.nanoTime()
    t.layout.commit { st =>
      val lastId = st.segments.last.id
      st.copy(segments = st.segments.map(s =>
        if (s.id == lastId) s.copy(rowCount = s.rowCount) else s))
    }
    // (identical-content commits skip the publish — measure a REAL one)
    val t8b = System.nanoTime()
    t.layout.commit { st =>
      val last = st.segments.last
      st.copy(segments = st.segments.init :+ last.copy(createdAt = last.createdAt + 1))
    }
    val commit2S = (System.nanoTime() - t8b) / 1e9
    info(f"single-segment commit at 100k segments (lock+delta+manifest): ${commit2S * 1000}%.0f ms")
    assert(commit2S < 1.0, f"commit took $commit2S%.2f s under the table lock")
    val noopS = (t8b - t8) / 1e9
    info(f"no-change commit (skipped publish): ${noopS * 1000}%.0f ms")

    // retained-heap sanity: the parsed status is the dominant driver
    // object; measure it approximately via serialized-JSON size already
    // asserted above, plus entry count — no per-query duplication: the
    // MetaCache holds ONE snapshot per table keyed by (mtime,length)
    GraftTable.drop(spark, dir)
  }

  test("1M-segment commit log: O(delta) commits, snapshot+tail cold read (VERDICT r15 #5)") {
    // the 1M-segment horizon r15 documented as "tens-of-seconds commits,
    // compact more" — the checkpointed log must turn that into ms-class
    // commits and a bounded cold read. Metadata-only: segments are
    // synthetic (their files are never opened), committed through the
    // normal locked publish in batches like a real ingest would arrive.
    val SegM = 1000000
    val dir = Files.createTempDirectory("graft_meta1m_").toString + "/t"
    val src = spark.range(0, 100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    val t = GraftTable.create(spark, dir, src.schema, sortColumns = Seq("k"),
      properties = Map("global_sort_partitions" -> "1"))
    t.insert(src)
    def fakes(from: Int, until: Int, base: Long) = (from until until).map { i =>
      val lo = 1000000L + i.toLong * 10
      val stats = Map("k" -> ColumnStats(Some(lo.toString), Some((lo + 9).toString), 0))
      SegmentMeta(base + i, SegmentStatus.Success, "parquet",
        Seq(s"part-$i.parquet"), 10, 4096, stats, Seq("k"),
        createdAt = 1700000000000L + i,
        fileMeta = Map(s"part-$i.parquet" -> FileMeta(10, 4096, stats)))
    }
    // grow to 1M in 4 injection commits (each is a checkpoint-or-delta
    // decision like any commit; the first crosses the inline threshold)
    val tGrow = System.nanoTime()
    (0 until 4).foreach { b =>
      t.layout.commit { st =>
        st.copy(segments = st.segments ++ fakes(b * (SegM / 4), (b + 1) * (SegM / 4),
          st.nextSegmentId))
      }
    }
    info(f"grow to 1M entries (4 bulk commits incl. checkpoints): ${(System.nanoTime() - tGrow) / 1e9}%.1f s")

    // steady-state commit: one changed segment → one small delta + a
    // KB manifest rename, REGARDLESS of the 1M entries behind it
    val t1 = System.nanoTime()
    t.layout.commit { st =>
      val last = st.segments.last
      st.copy(segments = st.segments.init :+ last.copy(createdAt = last.createdAt + 1))
    }
    val commitS = (System.nanoTime() - t1) / 1e9
    info(f"single-segment commit at 1M segments: ${commitS * 1000}%.0f ms")
    assert(commitS < 1.0, f"commit took $commitS%.2f s — not O(delta)")

    // warm read: stat-validated, no parse
    val t2 = System.nanoTime()
    assert(t.layout.readStatus().segments.size == SegM + 1)
    assert((System.nanoTime() - t2) / 1e9 < 0.05)

    // cold read: checkpoint snapshot + bounded delta tail — O(table)
    // parse once, NOT once per query (MetaCache holds the assembly)
    graft.engine.format.MetaCache.drop(Some(t.layout.root.toString))
    val t3 = System.nanoTime()
    val st = t.layout.readStatus()
    val coldS = (System.nanoTime() - t3) / 1e9
    info(f"cold read at 1M segments (snapshot + tail): $coldS%.1f s")
    assert(st.segments.size == SegM + 1)
    assert(coldS < 30.0, f"cold read took $coldS%.1f s")

    // incremental warm-miss: a foreign-looking commit moved the
    // manifest one delta forward; the re-read must apply ONE delta,
    // not re-parse the snapshot
    t.layout.commit { st0 =>
      val last = st0.segments.last
      st0.copy(segments = st0.segments.init :+ last.copy(createdAt = last.createdAt + 1))
    }
    val t4 = System.nanoTime()
    assert(t.layout.readStatus().segments.size == SegM + 1)
    val incrS = (System.nanoTime() - t4) / 1e9
    info(f"warm-miss incremental re-read (1 delta applied): ${incrS * 1000}%.0f ms")
    assert(incrS < 1.0, f"incremental re-read took $incrS%.2f s — re-parsed the snapshot?")

    // CLEAN FILES decision pass stays bounded at 1M
    val t5 = System.nanoTime()
    assert(t.cleanFilesDryRun().isEmpty)
    assert((System.nanoTime() - t5) / 1e9 < 5.0)

    // metadata count(*) and the at-scale read: a point query must prune
    // ALL 1M synthetic segments from driver-side stats (their files
    // don't exist — one opened fake would throw)
    val t6 = System.nanoTime()
    assert(t.countStar == 100L + 10L * SegM)
    info(f"metadata count(*) at 1M segments: ${(System.nanoTime() - t6) / 1e6}%.0f ms")
    def pointQuery(): Long = t.read.filter(col("k") === 42L).count()
    assert(pointQuery() == 1L) // warm-up (plan + codegen + footer reads)
    val t7 = System.nanoTime()
    assert(pointQuery() == 1L)
    val planS = (System.nanoTime() - t7) / 1e9
    info(f"warm point query over 1M pruned segments: ${planS * 1000}%.0f ms")
    assert(planS < 5.0, f"point query took $planS%.2f s at 1M segments")

    // checkpoint rollover holds the lock for ms, not O(table) (r17,
    // VERDICT r16 #2): force a rollover on the next commit and assert
    // (a) the manifest flipped to a fresh checkpoint at the new version
    // and (b) no critical section in the whole commit+rollover held the
    // table lock for the multi-second 1M-entry serialize — that write
    // happens OUTSIDE the lock now.
    System.setProperty("graft.status.checkpoint.every", "1")
    try {
      graft.engine.format.TableLayout.resetLockHold()
      val tr = System.nanoTime()
      t.layout.commit { st0 =>
        val last = st0.segments.last
        st0.copy(segments = st0.segments.init :+ last.copy(createdAt = last.createdAt + 1))
      }
      val rollS = (System.nanoTime() - tr) / 1e9
      val holdMs = graft.engine.format.TableLayout.lockHoldMaxNanos / 1e6
      val stR = t.layout.readStatus()
      info(f"rollover commit at 1M segments: wall $rollS%.1f s, max lock hold $holdMs%.0f ms")
      assert(stR.ckptV == stR.version,
        s"rollover must flip the manifest to a fresh checkpoint (ckptV=${stR.ckptV}, v=${stR.version})")
      assert(holdMs < 1500,
        f"rollover held the table lock $holdMs%.0f ms — the O(table) serialize is back under the lock")
      // the flipped log still assembles exactly from cold
      graft.engine.format.MetaCache.drop(Some(t.layout.root.toString))
      assert(t.layout.readStatus().segments.size == SegM + 1)
    } finally System.clearProperty("graft.status.checkpoint.every")
    GraftTable.drop(spark, dir)
  }

  test("history ledger: bounded read and disk at 100k retired entries (VERDICT r15 #7)") {
    System.setProperty("graft.history.max.bytes", (256 * 1024).toString)
    try {
      val dir = Files.createTempDirectory("graft_hist_").toString + "/t"
      val src = spark.range(0, 10).selectExpr("id AS k")
      val t = GraftTable.create(spark, dir, src.schema)
      t.insert(src)
      // 100k retired entries arrive via the same appendHistory CLEAN
      // FILES uses, in clean-sized batches
      val entry = (i: Int) => SegmentMeta(i.toLong, SegmentStatus.MarkedForDelete,
        "parquet", Seq(s"p$i.parquet"), 1, 10, Map.empty, Nil,
        createdAt = 1700000000000L + i)
      (0 until 100).foreach { b =>
        t.layout.appendHistory((0 until 1000).map(i => entry(b * 1000 + i)))
      }
      val hot = new java.io.File(s"$dir/_meta/history.jsonl")
      val prev = new java.io.File(s"$dir/_meta/history.1.jsonl")
      val disk = hot.length + prev.length
      info(f"history on disk after 100k retirements: ${disk / 1e6}%.2f MB " +
        f"(threshold 0.26 MB x 2 generations)")
      assert(disk < 3L * 256 * 1024,
        s"ledger disk ${disk} exceeded ~2x the rotation threshold")
      val t0 = System.nanoTime()
      val hist = t.layout.readHistory()
      val readS = (System.nanoTime() - t0) / 1e9
      info(f"SHOW HISTORY read: ${readS * 1000}%.0f ms, ${hist.size} entries retained")
      assert(readS < 2.0)
      assert(hist.nonEmpty && hist.size < 100000,
        "rotation must age out the oldest generations")
      // the newest entries always survive (retention drops the OLDEST)
      assert(hist.map(_.id).max == 99999L)
      GraftTable.drop(spark, dir)
    } finally System.clearProperty("graft.history.max.bytes")
  }
}
