package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** page(offset, limit) — PaginationCarbonReader analog: rows come back
  * in committed order, only the covering files are planned, and
  * merge-on-read delete deltas shift the coordinate system exactly. */
class PaginationSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft_page_").toString + "/t"

  /** 3 loads of contiguous key ranges, 4 sorted files each: committed
    * order == ORDER BY k (k unique). */
  private def mk(props: Map[String, String] = Map.empty): GraftTable = {
    val t = GraftTable.create(spark,
      tmp(),
      spark.range(0, 1).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v").schema,
      sortColumns = Seq("k"),
      properties = Map("global_sort_partitions" -> "4") ++ props)
    Seq((0, 1000), (1000, 2000), (2000, 3000)).foreach { case (lo, hi) =>
      t.insert(spark.range(lo, hi).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"))
    }
    t
  }

  test("pages return exact committed-order slices") {
    val t = mk()
    def keys(off: Long, lim: Int): Seq[Long] =
      t.page(off, lim).collect().map(_.getLong(0)).toSeq
    assert(keys(0, 5) == (0L until 5L))
    // spans a file boundary (files hold ~250 rows each)
    assert(keys(240, 20) == (240L until 260L))
    // spans a segment boundary
    assert(keys(990, 20) == (990L until 1010L))
    // tail: short page
    assert(keys(2995, 100) == (2995L until 3000L))
    // off the end / empty
    assert(keys(3000, 10).isEmpty)
    assert(keys(0, 0).isEmpty)
  }

  test("only covering files are planned") {
    val t = mk()
    val all = Pagination.orderedFiles(t)
    assert(all.size == 12, "3 segments x 4 files")
    // a small page strictly inside one file plans exactly that file
    // (offset derived from the actual chain so range-sampling variance
    // in file sizes can't put it on a boundary)
    val mid = all.find(_.liveRows > 40).get
    assert(Pagination.coveringFiles(t, mid.startPos + 10, 10).size == 1)
    // a page straddling a file end plans exactly the two neighbors
    assert(Pagination.coveringFiles(t, mid.startPos + mid.liveRows - 5, 10).size == 2)
    // cumulative positions are consistent
    assert(all.map(_.liveRows).sum == 3000)
    assert(all.last.startPos + all.last.liveRows == 3000)
  }

  test("delete deltas shift the page coordinates to live rows") {
    val t = mk(Map("iud_mode" -> "mor"))
    val gone = t.delete(col("k") >= 100L && col("k") < 110L)
    assert(gone == 10)
    assert(t.status.visible.exists(_.deltas.nonEmpty), "expect MoR deltas")
    val keys = t.page(95, 10).collect().map(_.getLong(0)).toSeq
    // live order: ...98, 99, 110, 111... — deleted rows occupy no slots
    assert(keys == Seq(95L, 96L, 97L, 98L, 99L, 110L, 111L, 112L, 113L, 114L))
    // total live coordinate space shrank
    assert(Pagination.orderedFiles(t).map(_.liveRows).sum == 2990)
    // a page past the live end is empty
    assert(t.page(2990, 5).collect().isEmpty)
  }

  test("copy-on-write delete keeps pagination exact too") {
    val t = mk()
    t.delete(col("k") < 50L) // file-grain CoW rewrite of the first file
    val keys = t.page(0, 5).collect().map(_.getLong(0)).toSeq
    assert(keys.size == 5 && keys.head >= 50L,
      s"first live page must start at the first surviving row, got $keys")
    assert(Pagination.orderedFiles(t).map(_.liveRows).sum == 2950)
  }
}
