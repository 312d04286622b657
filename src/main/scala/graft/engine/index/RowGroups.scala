package graft.engine.index

import graft.engine.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared row-group geometry for FINE-grain index builds (text index +
  * SI): the reference's lucene FG postings name the blocklet inside the
  * block (LuceneFineGrainIndex.java:63,137-142); parquet row groups are
  * our blocklets, and their byte spans are what the scan's split clip
  * ([[graft.engine.GraftTable.readFilesRanges]]) consumes. */
private[index] object RowGroups {

  /** Per-file row-group geometry lifted from the parquet footer at
    * INDEX BUILD time (one driver-side footer read per indexed file —
    * the same cost class as the write-time
    * [[graft.engine.format.FileFooters]] pass): (rg ordinal, first row
    * index, end row index, byte start, byte length). The byte span is
    * startingPos + compressedSize — the exact quantity parquet's
    * midpoint row-group filter tests, so a query-time split clipped to
    * it selects precisely this row group. None = footer unreadable
    * (build degrades to file grain). */
  def geometry(t: GraftTable, absPath: String)
      : Option[Seq[(Int, Long, Long, Long, Long)]] =
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(absPath),
        t.spark.sessionState.newHadoopConf())
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        var rowStart = 0L
        Some(reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.map {
          case (b, i) =>
            val r = (i, rowStart, rowStart + b.getRowCount,
              b.getStartingPos, b.getCompressedSize)
            rowStart += b.getRowCount
            r
        })
      } finally reader.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Geometry rows for every file of `segs` as a broadcastable
    * DataFrame (g_seg, g_file, rg, row_start, row_end, rg_start,
    * rg_len) — a handful of row groups per file, KBs on the driver
    * even for a large build, because only the segments being indexed
    * are listed. None if any footer is unreadable (degrade to file
    * grain). */
  def geometryDf(t: GraftTable,
      segs: Seq[graft.engine.format.SegmentMeta]): Option[DataFrame] = {
    val perFile: Seq[Option[Seq[(Long, String, Int, Long, Long, Long, Long)]]] =
      segs.flatMap { s =>
        s.files.zip(t.layout.segmentFilePaths(s)).map { case (rel, abs) =>
          geometry(t, abs).map(_.map { case (rg, rs, re, bs, bl) =>
            (s.id, rel, rg, rs, re, bs, bl)
          })
        }
      }
    if (perFile.exists(_.isEmpty)) None
    else {
      import t.spark.implicits._
      Some(perFile.flatMap(_.get).toDF(
        "g_seg", "g_file", "rg", "row_start", "row_end", "rg_start", "rg_len"))
    }
  }

  /** Tag `base` rows (carrying seg_id, file, and a row-index column
    * `ri`) with their row group via a BROADCAST range join against the
    * footer geometry — no UDF, no second scan; each row matches exactly
    * one geometry row. The `ri` column is consumed. */
  def tag(base: DataFrame, geo: DataFrame): DataFrame =
    base.join(broadcast(geo),
        base("seg_id") === col("g_seg") && base("file") === col("g_file") &&
          col("ri") >= col("row_start") && col("ri") < col("row_end"))
      .drop("ri", "g_seg", "g_file", "row_start", "row_end")

  /** File-grain degrade: null rg columns keep the index schema stable
    * so later REFRESH/REINDEX appends always line up; lookups treat any
    * null-rg row as "scan the whole file". */
  def nullTagged(base: DataFrame): DataFrame =
    base.drop("ri").distinct()
      .withColumn("rg", lit(null).cast("int"))
      .withColumn("rg_start", lit(null).cast("long"))
      .withColumn("rg_len", lit(null).cast("long"))

  /** The three rg columns appended to a deferred-created index schema. */
  def schemaFields: Seq[org.apache.spark.sql.types.StructField] = Seq(
    org.apache.spark.sql.types.StructField("rg",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("rg_start",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("rg_len",
      org.apache.spark.sql.types.LongType))
}
