package graft.tools

import graft.engine.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-file scan micro-benchmark — the reference CarbonCli's benchmark
  * half (tools/cli/src/main/java/org/apache/carbondata/tool/
  * ScanBenchmark.java times footer decode, a full-file scan, and
  * per-column scans of one file; SHOW SUMMARY already covers the
  * DataSummary half). Spark-first: every timing drives the engine's
  * REAL reader path over exactly one file via the position-grain read,
  * so the numbers reflect what a query actually pays (footer decode,
  * column materialization, predicate-free scan), not a bespoke
  * benchmark-only reader.
  *
  * Driver-side timing of per-file jobs is the right scale here: the
  * tool inspects a handful of files (the reference CLI takes exactly
  * one) — it is an inspection utility, not a distributed operator. */
object ScanBench {

  /** Timings for up to `maxFiles` parquet files of `t`'s visible
    * segments: rows (seg_id, file, op, millis) with op ∈ footer |
    * scan_all | scan:&lt;column&gt;. */
  def run(t: GraftTable, maxFiles: Int = 1,
      columns: Option[Seq[String]] = None): DataFrame = {
    require(maxFiles > 0, s"maxFiles must be positive: $maxFiles")
    val spark = t.spark
    val targets = t.status.visible.filter(_.format == "parquet")
      .flatMap(s => s.files.map(f => (s, f))).take(maxFiles)
    val cols = columns.getOrElse(t.schema.fieldNames.toSeq)
    def ms(body: => Unit): Long = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1000000L
    }
    val rows = targets.flatMap { case (s, f) =>
      val full = t.layout.segmentFilePaths(s)(s.files.indexOf(f))
      val conf = spark.sessionState.newHadoopConf()
      val footerMs = ms {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(full), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter finally r.close()
      }
      val one = Map(s.id -> Seq(f))
      val scanMs = ms(
        t.readFiles(one).write.format("noop").mode("overwrite").save())
      // count(col) forces the column to materialize (plain count(*)
      // would prune it away and time an empty projection)
      val colMs = cols.map { c =>
        c -> ms(t.readFiles(one).agg(count(col(c))).collect())
      }
      Seq((s.id, f, "footer", footerMs), (s.id, f, "scan_all", scanMs)) ++
        colMs.map { case (c, m) => (s.id, f, s"scan:$c", m) }
    }
    import spark.implicits._
    rows.toDF("seg_id", "file", "op", "millis")
  }
}
