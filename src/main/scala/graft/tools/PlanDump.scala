package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for every declared query (or the
  * comma-separated subset in arg 2) into a directory of
  * `<name>.txt` files — the optimization rounds' plan evidence
  * (plans/r<N>/<query>_before.txt / _after.txt).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> [names] [suffix]
  *
  * The session mirrors graft.Bench exactly (same master/conf vocabulary)
  * so the captured plans are the plans the bench times.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only = args.lift(2).filter(_.nonEmpty).filter(_ != "-")
      .map(_.split(",").map(_.trim).toSet)
    val suffix = args.lift(3).getOrElse("")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    try graft.queries.Q.views(spark, sfDir) catch { case _: Throwable => }
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(outDir, s"$name$suffix.txt"), plan)
          println(s"[plandump] $name ok")
        } catch { case e: Throwable =>
          println(s"[plandump] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
