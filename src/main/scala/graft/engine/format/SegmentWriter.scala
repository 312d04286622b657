package graft.engine.format

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.hadoop.fs.{Options, Path}

/** Sorted segment write with inline statistics collection.
  *
  * Reference semantics: one load = one new segment, written sorted by
  * SORT_COLUMNS with per-segment min/max recorded for the pruning ladder
  * (processing/.../DataLoadProcessBuilder.java:65-81, sort scopes
  * core/.../CarbonCommonConstants.java:971-986). Spark-first mapping:
  *   - GLOBAL_SORT  → repartitionByRange(sortCols).sortWithinPartitions
  *     (cluster-wide clustering; range exchange is the only shuffle)
  *   - LOCAL_SORT   → sortWithinPartitions only (no shuffle)
  *   - NO_SORT      → write as-is
  * Stats ride the same job via Dataset.observe — no second pass over the
  * data, which matters when one load is terabytes.
  */
object SegmentWriter {

  private[engine] def statsSupported(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | DateType | TimestampType |
         TimestampNTZType | BooleanType => true
    case _ => false
  }

  /** Write `df` as segment `id` under `layout`, returning its metadata
    * (not yet committed to tablestatus). */
  def write(layout: TableLayout, meta: TableMeta, df: DataFrame, id: Long): SegmentMeta = {
    val spark = df.sparkSession
    val sortCols = meta.sortColumns.filter(df.columns.contains)
    val sorted = (meta.sortScope, sortCols) match {
      case (_, Nil) | ("NO_SORT", _) => df
      case ("LOCAL_SORT", cs) => df.sortWithinPartitions(cs.map(col): _*)
      case _ => // GLOBAL_SORT default
        val parts = meta.properties.get("global_sort_partitions").map(_.toInt)
          .getOrElse(spark.sessionState.conf.numShufflePartitions)
        df.repartitionByRange(parts, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
    }

    // inline stats: count + per-column min/max/nullCount in the write job
    val statCols = df.schema.fields.filter(f => statsSupported(f.dataType))
    val obs = Observation(s"graft_seg_$id")
    val aggs = count(lit(1)).as("__n") +:
      statCols.flatMap { f =>
        Seq(min(col(f.name)).as(s"min:${f.name}"),
          max(col(f.name)).as(s"max:${f.name}"),
          sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"nulls:${f.name}"))
      }.toSeq
    val observed = sorted.observe(obs, aggs.head, aggs.tail: _*)

    val tmp = layout.tmpSegmentDir(id)
    // CREATE INDEX … AS 'bloomfilter' analog: table property
    // bloom_columns=c1,c2 turns on parquet bloom filters for those
    // columns (the reference's bloom CG index collapses onto parquet's)
    val bloomCols = meta.properties.get("bloom_columns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    bloomCols.foldLeft(observed.write.mode("overwrite")) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }.parquet(tmp.toString)

    val m = obs.get
    val rowCount = m("__n").asInstanceOf[Long]
    val stats = statCols.map { f =>
      f.name -> ColumnStats(
        min = Option(m(s"min:${f.name}")).flatMap(StatValue.encode),
        max = Option(m(s"max:${f.name}")).flatMap(StatValue.encode),
        nullCount = Option(m(s"nulls:${f.name}")).map(_.asInstanceOf[Long]).getOrElse(0L))
    }.toMap

    // atomic publish: rename tmp dir into place, then the caller commits
    val dest = layout.segmentDir(id)
    val fs = layout.fs
    if (fs.exists(dest)) fs.delete(dest, true)
    if (!fs.rename(tmp, dest))
      throw new IllegalStateException(s"failed to rename $tmp to $dest")
    val files = fs.listStatus(dest).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    SegmentMeta(
      id = id,
      status = SegmentStatus.Success,
      format = "parquet",
      files = files.map(_.getPath.getName).toSeq.sorted,
      rowCount = rowCount,
      sizeBytes = files.map(_.getLen).sum,
      stats = stats,
      sortColumns = sortCols,
      createdAt = System.currentTimeMillis())
  }
}
