package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** FILE-grain copy-on-write: a selective mutation rewrites only the
  * files holding matches — the victim segment survives minus those
  * files — and the metadata stays exact: footer-based row decrements,
  * and segment stats REFRESHED from the remaining files (stale bounds
  * would poison metadata-only MIN/MAX and IsNotNull pruning). */
class FileGrainSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft_fg_").toString + "/t"

  /** one segment, 4 globally-sorted files with disjoint k ranges */
  private def mk(): GraftTable = {
    val src = spark.range(0, 4000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    val t = GraftTable.create(spark, tmp(), src.schema, sortColumns = Seq("k"),
      properties = Map("global_sort_partitions" -> "4"))
    t.insert(src)
    t
  }

  test("point delete rewrites one file, the segment survives") {
    val t = mk()
    val seg0 = t.status.visible.head
    assert(seg0.files.size == 4)
    val deleted = t.delete(col("k") === 42L)
    assert(deleted == 1L)

    val vis = t.status.visible
    assert(vis.map(_.id).contains(seg0.id), "victim segment must survive file-grain delete")
    val surv = vis.find(_.id == seg0.id).get
    assert(surv.files.size == 3, s"exactly one file retired, got ${surv.files}")
    assert(surv.removedFiles.size == 1)
    // range-partitioned file boundaries are sampling-dependent: assert
    // against the retired file's own footer count, not a fixed split
    val retiredRows = seg0.fileMeta(surv.removedFiles.head).rows
    assert(surv.rowCount == 4000 - retiredRows,
      s"rowCount must drop by the retired FILE's rows ($retiredRows)")
    // the rewritten survivors live in the new segment
    val repl = vis.find(_.id != seg0.id).get
    assert(repl.rowCount == retiredRows - 1)
    assert(t.read.count() == 3999)
    assert(t.read.filter(col("k") === 42L).count() == 0)
    // untouched files are physically the same (no rewrite)
    assert(surv.files.forall(seg0.files.contains))
  }

  test("surviving segment stats are refreshed, not stale") {
    val t = mk()
    // delete the whole first file's range [0, ~1000): the survivor
    // segment's min(k) must move up, or metadata MIN would answer 0
    val seg0 = t.status.visible.head
    val firstFileMax = seg0.fileMeta(seg0.files.head).stats("k").max.get.toLong
    t.delete(col("k") <= firstFileMax)
    val surv = t.status.visible.find(_.id == seg0.id).get
    surv.stats.get("k").foreach { cs =>
      assert(cs.min.exists(_.toLong > firstFileMax),
        s"stale min ${cs.min} after retiring file with max $firstFileMax")
    }
    // metadata-only MIN/MAX agrees with a real scan
    val (mn, mx) = (t.read.agg(min("k"), max("k")).collect().head.getLong(0),
      t.read.agg(min("k"), max("k")).collect().head.getLong(1))
    assert(mn == firstFileMax + 1 && mx == 3999)
  }

  test("update touching one file keeps other files unread and unwritten") {
    val t = mk()
    val seg0 = t.status.visible.head
    val n = t.update(col("k") === 3999L, Map("v" -> lit(-1.0)))
    assert(n == 1L)
    val surv = t.status.visible.find(_.id == seg0.id).get
    assert(surv.files.size == 3)
    assert(t.read.filter(col("v") === -1.0).collect().map(_.getLong(0)).toSeq == Seq(3999L))
    assert(t.read.count() == 4000)
  }

  test("mutation spanning all files falls back to whole-segment rewrite") {
    val t = mk()
    val seg0 = t.status.visible.head
    val n = t.update(col("k") % 1000 === 0, Map("v" -> lit(0.5))) // hits every file
    assert(n == 4L)
    assert(!t.status.visible.map(_.id).contains(seg0.id),
      "all-file mutation retires the whole segment")
    assert(t.read.count() == 4000)
  }

  test("partial swap aborts when the files were rewritten concurrently") {
    val t = mk()
    val seg0 = t.status.visible.head
    val someFile = seg0.files.head
    // simulate a racing file-grain mutation: retire someFile first
    t.layout.commit { st =>
      st.copy(segments = st.segments.map(s =>
        if (s.id == seg0.id)
          graft.engine.format.Partitions.retireFiles(s, Seq(someFile), t.schema)
        else s))
    }
    // a swap still claiming someFile as partial victim must abort
    val id = Mutation.reserve(t)
    intercept[ConcurrentMutationException] {
      Mutation.swap(t, Set.empty,
        Some(t.status.segments.find(_.id == id).get),
        Map(seg0.id -> Seq(someFile)))
    }
    // the orphan replacement was retired for CLEAN FILES
    assert(t.status.segments.find(_.id == id)
      .exists(_.status == graft.engine.format.SegmentStatus.MarkedForDelete))
  }

  test("CLEAN FILES reclaims file-grain tombstones") {
    val t = mk()
    t.delete(col("k") === 7L)
    val surv = t.status.visible.minBy(_.id)
    assert(surv.removedFiles.nonEmpty)
    val fs = t.layout.fs
    val phys = surv.removedFiles.map(f =>
      new org.apache.hadoop.fs.Path(t.layout.segmentDir(surv.id), f))
    assert(phys.forall(fs.exists))
    t.cleanFiles()
    assert(phys.forall(p => !fs.exists(p)))
    assert(t.read.count() == 3999)
  }
}
