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
}
