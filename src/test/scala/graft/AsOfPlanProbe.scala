package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: AQE final plan of the bucketed as-of join. */
object AsOfPlanProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.AsOf
    val e = graft.queries.Q.t(spark, d, "events").select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("tsu"), col("value"))
    val state = e.filter(col("event_id") % 20 === 0)
      .groupBy("user_id", "tsu").agg(max(col("value")).as("state"))
    val probes = e.filter(col("event_id") % 7 === 0)
      .select("event_id", "user_id", "tsu")
    val df = AsOf.asofJoin(probes, state, "user_id", "tsu", Seq("state"), tsBuckets = 4)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString
    println("[asofplan] scans=" + "Scan parquet".r.findAllIn(p).length +
      " reused=" + "ReusedExchange".r.findAllIn(p).length +
      " exchanges=" + "Exchange hashpartitioning".r.findAllIn(p).length +
      " tablecache=" + "TableCacheQueryStage".r.findAllIn(p).length)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/asof_final_plan.txt"), p)
    spark.stop()
  }
}
