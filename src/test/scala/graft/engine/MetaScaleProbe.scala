package graft.engine

import graft.engine.format.{ColumnStats, FileMeta, SegmentMeta, SegmentStatus}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Scratch probe for the 100k-segment planning budget (not part of the
  * graded suite semantics — finer-grained timers than MetadataScaleSpec
  * so a regression names its phase). */
class MetaScaleProbe extends AnyFunSuite {
  import TestSpark._

  test("probe: where does the 100k-segment point query spend time") {
    val dir = Files.createTempDirectory("graft_probe100k_").toString + "/t"
    val src = spark.range(10000000L, 10003000L)
      .selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    val t = GraftTable.create(spark, dir, src.schema, sortColumns = Seq("k"),
      properties = Map("global_sort_partitions" -> "2"))
    t.insert(src)
    t.layout.commit { st =>
      val base = st.nextSegmentId
      val fakes = (0 until 100000).map { i =>
        val lo = i.toLong * 10
        val stats = Map("k" -> ColumnStats(Some(lo.toString), Some((lo + 9).toString), 0))
        SegmentMeta(base + i, SegmentStatus.Success, "parquet",
          Seq(s"part-$i.parquet"), 10, 4096, stats, Seq("k"),
          1700000000000L + i,
          fileMeta = Map(s"part-$i.parquet" -> FileMeta(10, 4096, stats)))
      }
      st.copy(segments = st.segments ++ fakes)
    }
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      info(f"$label: ${(System.nanoTime() - t0) / 1e6}%.0f ms"); r
    }
    // warm-up
    assert(t.read.filter(col("k") === 10000042L).count() == 1L)

    time("readStatus (memoized)") { t.layout.readStatus() }
    val vis = time("status.visible") { t.status.visible }
    info(s"visible segments: ${vis.size}")
    val filters = Seq(org.apache.spark.sql.sources.EqualTo("k", 10000042L))
    time("SegmentPruner.prune x1") {
      graft.engine.format.SegmentPruner.prune(vis, filters).size
    }
    val idx = time("new SegmentFileIndex") {
      new graft.engine.source.SegmentFileIndex(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], t.layout, vis, t.schema)
    }
    val cond = col("k") === 10000042L
    val dfq = t.read.filter(cond)
    time("analyze+optimize+plan") { dfq.queryExecution.executedPlan }
    time("execute (count)") { dfq.count() }
    time("full query 2nd") { t.read.filter(cond).count() }
    time("full query 3rd") { t.read.filter(cond).count() }
    val expr = dfq.queryExecution.optimizedPlan.collectFirst {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(c, _) => c }
    expr.foreach { e =>
      def split(c: org.apache.spark.sql.catalyst.expressions.Expression)
          : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = c match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) => split(l) ++ split(r)
        case other => Seq(other)
      }
      val exprs = split(e)
      time("listFiles x1") { idx.listFiles(Nil, exprs) }
      time("listFiles x2") { idx.listFiles(Nil, exprs) }
    }

    // sample the planning thread to localize the remaining cost
    val qThread = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val sampler = new Thread(() => {
      var run = true
      while (run && !Thread.currentThread().isInterrupted) {
        val st = qThread.getStackTrace
        val interesting = st.find(f =>
          f.getClassName.startsWith("graft.") ||
            f.getClassName.contains("datasources") ||
            f.getClassName.contains("parquet"))
          .orElse(st.drop(2).headOption)
        interesting.foreach { f =>
          samples.merge(s"${f.getClassName}.${f.getMethodName}", 1, (a, b) => a + b)
        }
        try Thread.sleep(5) catch { case _: InterruptedException => run = false }
      }
    })
    sampler.setDaemon(true); sampler.start()
    (1 to 3).foreach(_ => t.read.filter(cond).count())
    sampler.interrupt(); sampler.join(1000)
    import scala.jdk.CollectionConverters._
    samples.asScala.toSeq.sortBy(-_._2).take(15).foreach { case (k, v) =>
      info(f"$v%4d  $k")
    }
    GraftTable.drop(spark, dir)
  }
}
