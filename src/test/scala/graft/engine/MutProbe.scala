package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: step-level cost of the CoW update path. */
object MutProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = spark.read.parquet(s"$d/orders.parquet")
    val base = new java.io.File(d).getName
    val pristine = s"${graft.queries.Fixtures.root}/$base/iud_upd_pristine"
    val pl = new graft.engine.format.TableLayout(pristine,
      spark.sessionState.newHadoopConf())
    if (!(pl.exists && pl.readStatus().visible.nonEmpty)) {
      GraftTable.drop(spark, pristine)
      GraftTable.createAsSelect(spark, pristine, src, Seq("o_orderkey"))
    }
    def t[A](n: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[mutprobe] $n%-22s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }
    val cond = col("o_totalprice") > 400000.0
    (1 to 3).foreach { i =>
      println(s"--- rep $i")
      val p = s"${graft.queries.Fixtures.root}/$base/iud_probe2"
      GraftTable.drop(spark, p)
      graft.queries.Q.cloneTable(pristine, p)
      val tbl = GraftTable.at(spark, p)
      // step-by-step clone of rewriteAffectedOnce
      val segs = t("visibleFiles")(Mutation.visibleFiles(tbl))
      val files = segs.flatMap(_._2)
      val affectedDf = t("affected_plan") {
        val b = spark.read.schema(tbl.schema).parquet(files: _*)
        val live = Mutation.deltaFilter(tbl, segs).map(b.filter).getOrElse(b)
        live.filter(cond).groupBy(col("_metadata.file_path").as("fp")).count()
      }
      val hits = t("affected_collect")(affectedDf.collect())
      println(s"    (affected files: ${hits.length})")
      val raw = t("read_plan")(spark.read.schema(tbl.schema).parquet(files: _*))
      val id = t("reserve")(Mutation.reserve(tbl))
      val rewritten = raw.withColumn("o_orderpriority",
        when(cond, lit("X-UPD")).otherwise(col("o_orderpriority")))
      val seg = t("writer_write")(graft.engine.format.SegmentWriter.write(
        tbl.layout, tbl.meta, rewritten, id, preservesOrder = true))
      t("swap")(Mutation.swap(tbl, segs.map(_._1.id).toSet,
        Some(seg.copy(origin = "rewrite")),
        selected = segs.map(x => x._1.id -> x._1).toMap))
    }
    spark.stop()
  }
}
