package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: per-call cost of Q.t / Q.views DataFrame
  * construction (parquet footer schema inference + file listing). */
object TProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(n: String, reps: Int)(body: => Unit): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      println(f"[tprobe] $n%-16s min=${times.min}%7.1f ms all=${times.map(x => f"$x%.0f").mkString(",")}")
    }
    t("t_lineitem", 6)(graft.queries.Q.t(spark, d, "lineitem"))
    t("t_orders", 6)(graft.queries.Q.t(spark, d, "orders"))
    t("t_nation", 6)(graft.queries.Q.t(spark, d, "nation"))
    t("t_events", 6)(graft.queries.Q.t(spark, d, "events"))
    t("views_all", 6)(graft.queries.Q.views(spark, d))
    spark.stop()
  }
}
