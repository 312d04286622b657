package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Concurrent writers must serialize on the table lock: no lost
  * tablestatus updates, unique segment ids (the reference takes
  * table-level locks for the same reason, SURVEY §7.4). */
class ConcurrencySpec extends AnyFunSuite {
  import TestSpark._

  test("parallel inserts all commit with distinct segment ids") {
    val src = spark.read.parquet(s"$sf/region.parquet")
    val path = Files.createTempDirectory("graft_conc_").toString + "/t"
    val t = GraftTable.create(spark, path, src.schema)
    val rows = src.collect().length
    val futures = (0 until 4).map { _ =>
      Future(GraftTable.at(spark, path).insert(src))
    }
    val ids = Await.result(Future.sequence(futures), 5.minutes)
    assert(ids.distinct.size == 4, s"segment ids collided: $ids")
    assert(t.status.visible.size == 4)
    assert(t.read.count() == rows * 4L)
    assert(t.countStar == rows * 4L)
  }

  test("reader storm during concurrent commits sees only complete snapshots") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_conc3_").toString + "/t"
    val batch = (0 until 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val t = GraftTable.createAsSelect(spark, path, batch)
    // 4 concurrent inserts of 100 rows + 6 readers hammering reads:
    // every observed count must be a whole number of committed batches
    // (a torn/partial snapshot — e.g. a stale cached status paired with
    // reclaimed files, or a half-applied commit — would break that)
    val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
    val readers = (0 until 6).map { _ =>
      Future {
        (0 until 12).foreach { _ =>
          val c = GraftTable.at(spark, path).read.count()
          if (c < 100 || c > 500 || c % 100 != 0)
            bad.compareAndSet(null, s"non-snapshot count $c")
          val meta = GraftTable.at(spark, path).countStar
          if (meta < 100 || meta > 500 || meta % 100 != 0)
            bad.compareAndSet(null, s"non-snapshot metadata count $meta")
        }
      }
    }
    val writers = (0 until 4).map { _ =>
      Future(GraftTable.at(spark, path).insert(batch))
    }
    Await.result(Future.sequence(readers ++ writers), 5.minutes)
    assert(bad.get == null, s"reader saw ${bad.get}")
    assert(t.read.count() == 500)
  }

  test("concurrent delete + insert keep the commit log consistent") {
    val src = spark.read.parquet(s"$sf/nation.parquet")
    val path = Files.createTempDirectory("graft_conc2_").toString + "/t"
    val t = GraftTable.createAsSelect(spark, path, src, Seq("n_nationkey"))
    val f1 = Future(t.delete(col("n_nationkey") < 5))
    val f2 = Future(GraftTable.at(spark, path).insert(src.filter(col("n_nationkey") >= 25 - 25)))
    Await.result(Future.sequence(Seq(f1, f2)), 5.minutes)
    // whatever interleaving happened, the commit log must be coherent:
    // every visible segment's files exist and total = insert + (base - deleted)
    val total = t.read.count()
    assert(total == (25 - 5) + 25, s"got $total")
    t.status.visible.foreach { s =>
      t.layout.segmentFilePaths(s).foreach(f =>
        assert(t.layout.fs.exists(new org.apache.hadoop.fs.Path(f)), s"missing $f"))
    }
  }

  test("pinned reads survive a compaction committing between resolve and scan") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_conc3_").toString + "/t"
    val mk = (a: Long, b: Long) =>
      (a until b).map(i => (i, i * 2.0)).toDF("k", "v")
    val t = GraftTable.create(spark, path, mk(0, 1).schema)
    t.insert(mk(0, 50)); t.insert(mk(50, 100))
    // resolve ids 0,1 NOW; the scan plans lazily at collect
    val pinned = t.readSegments(Seq(0L, 1L))
    // compaction retires 0,1 into 2 — files stay until CLEAN FILES
    assert(t.compact("MAJOR").nonEmpty)
    assert(t.status.visible.map(_.id) == Seq(2L))
    // the pinned read must still see every row (the old silent outcome
    // was 0 rows: retired ids vanished from the visible set)
    assert(pinned.count() == 100)
    // but a user-DELETED segment must NOT resurface through a pin
    t.insert(mk(100, 110)) // segment 3
    t.deleteSegmentsById(Seq(3L))
    assert(t.readSegments(Seq(3L)).count() == 0)
  }
}
