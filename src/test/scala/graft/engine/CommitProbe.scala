package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: driver-side cost of the commit path and the
  * segment writer's post-job footer/stat work. */
object CommitProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = spark.read.parquet(s"$d/orders.parquet")
    val p = java.nio.file.Files.createTempDirectory("commitprobe_").toString
    val tbl = GraftTable.createAsSelect(spark, p, src, Seq("o_orderkey"))
    def t(n: String, reps: Int)(body: => Unit): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      println(f"[commitprobe] $n%-22s min=${times.min}%8.1f ms all=${times.map(x => f"$x%.0f").mkString(",")}")
    }
    t("noop_commit", 5)(tbl.layout.commit(identity))
    t("readStatus", 5)(tbl.layout.readStatus())
    val rows = tbl.read
    t("writer_write", 3) {
      val id = Mutation.reserve(tbl)
      val seg = graft.engine.format.SegmentWriter.write(
        tbl.layout, tbl.meta, rows, id)
      Mutation.retire(tbl, id)
      println(s"   (seg rows=${seg.rowCount} files=${seg.files.size})")
    }
    spark.stop()
  }
}
