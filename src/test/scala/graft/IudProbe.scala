package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: where does a CoW UPDATE row's time go —
  * fixture clone, affected-file scan, rewrite+write, commits,
  * read-back aggregation. */
object IudProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.engine.GraftTable
    val src = spark.read.parquet(s"$d/orders.parquet")
    val base = new java.io.File(d).getName
    val pristine = s"${graft.queries.Fixtures.root}/$base/iud_upd_pristine"
    val pl = new graft.engine.format.TableLayout(pristine,
      spark.sessionState.newHadoopConf())
    if (!(pl.exists && pl.readStatus().visible.nonEmpty)) {
      GraftTable.drop(spark, pristine)
      GraftTable.createAsSelect(spark, pristine, src, Seq("o_orderkey"))
    }
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("") +
            " stages=" + j.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString("|")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, desc) = jobStart.getOrDefault(j.jobId, (0L, "?"))
        println(f"[job] ${(System.nanoTime() - t0) / 1e6}%7.1f ms  $desc")
      }
    })
    def t(n: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[iudprobe] $n%-18s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    }
    (1 to 3).foreach { i =>
      println(s"--- rep $i")
      val p = s"${graft.queries.Fixtures.root}/$base/iud_probe"
      t("drop")(GraftTable.drop(spark, p))
      t("clone")(graft.queries.Q.cloneTable(pristine, p))
      var tbl: GraftTable = null
      t("at")({ tbl = GraftTable.at(spark, p) })
      t("update")(tbl.update(col("o_totalprice") > 400000.0,
        Map("o_orderpriority" -> lit("X-UPD"))))
      t("readback")(tbl.read.groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
