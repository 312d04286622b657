package graft.engine.index

import graft.engine.GraftTable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Secondary index (reference index/secondary-index + the SI filter→join
  * rewrite, CarbonSITransformationRule / BroadCastSIFilterPushJoin,
  * SURVEY §2.3 #15).
  *
  * Spark-first shape: the SI is itself a carbonish table mapping indexed
  * value → (segment id, file), sorted by value (so SI lookups prune via
  * segment stats). A query filtering on the indexed column first
  * consults the SI (a tiny scan), then reads only the main-table FILES
  * that contain the value — position-grain, like the reference's
  * BroadCastSIFilterPushJoin shipping matched block/blocklet positions
  * into the main scan (joins/BroadCastSIFilterPushJoin.scala:60); row
  * groups within a matched file then self-prune via parquet footer
  * stats. At 100 TB the SI is ~|distinct values × files| rows —
  * still negligible next to the fact table, and a selective lookup over
  * a few huge segments now opens a few files, not the segments.
  */
object Si {

  private def siPathsKey(column: String) = s"si.$column"

  private val segIdFromPath: Column =
    regexp_extract(col("_metadata.file_path"), "/segments/([0-9]+)/", 1).cast("long")

  /** Relative path within the segment dir — the same form as
    * `SegmentMeta.files` entries (incl. partition subdirs). */
  private val fileFromPath: Column =
    regexp_extract(col("_metadata.file_path"), "/segments/[0-9]+/(.*)$", 1)

  /** Which base segments an index table has folded in (its coverage
    * ledger) — segments outside this set must be scanned unindexed or
    * the index would silently drop their rows. */
  private[engine] def indexedSegments(idx: GraftTable): Set[Long] =
    idx.meta.properties.get("indexed_segments").toSet[String]
      .flatMap(_.split(",")).filter(_.nonEmpty).map(_.toLong)

  private[index] def recordIndexedSegments(idx: GraftTable, ids: Set[Long]): Unit =
    idx.setProperties(Map("indexed_segments" -> ids.toSeq.sorted.mkString(",")))

  /** CREATE INDEX … AS 'carbondata' (SI) on `column`, stored at `siPath`.
    * `deferred` (WITH DEFERRED REFRESH, reference
    * index-management.md:87): the SI table is created EMPTY with zero
    * coverage — every lookup falls back to unindexed scans (the
    * coverage model's natural "disabled") until REFRESH INDEX builds
    * it. */
  def create(t: GraftTable, column: String, siPath: String,
      deferred: Boolean = false): GraftTable = {
    require(t.schema.fieldNames.contains(column), s"no such column $column")
    val snapshot =
      if (deferred) Set.empty[Long] else t.status.visible.map(_.id).toSet
    GraftTable.drop(t.spark, siPath)
    val si =
      if (deferred)
        GraftTable.create(t.spark, siPath,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("v",
              t.schema(column).dataType),
            org.apache.spark.sql.types.StructField("seg_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("file",
              org.apache.spark.sql.types.StringType))),
          sortColumns = Seq("v"))
      else
        GraftTable.createAsSelect(t.spark, siPath, buildRows(t, column),
          sortColumns = Seq("v"))
    recordIndexedSegments(si, snapshot)
    t.layout.updateTableMeta(m => m.copy(
      properties = m.properties + (siPathsKey(column) -> siPath)))
    si
  }

  private def buildRows(t: GraftTable, column: String): DataFrame = {
    val vis = t.status.visible
    val files = vis.flatMap(t.layout.segmentFilePaths)
    t.spark.read.schema(t.schema).parquet(files: _*)
      .select(col(column).as("v"), segIdFromPath.as("seg_id"),
        fileFromPath.as("file"))
      .distinct()
  }

  /** REFRESH INDEX: full rebuild against the current segment set. */
  def refresh(t: GraftTable, column: String): Unit = {
    val siPath = t.meta.properties.getOrElse(siPathsKey(column),
      throw new IllegalArgumentException(s"no SI on $column"))
    val snapshot = t.status.visible.map(_.id).toSet
    val si = GraftTable.at(t.spark, siPath)
    si.insert(buildRows(t, column), overwrite = true)
    recordIndexedSegments(si, snapshot)
  }

  /** REINDEX (reference IndexRepairCommand, parser :750-760):
    * INCREMENTAL repair — only segments missing from the coverage
    * ledger (optionally restricted to `segIds`) are scanned and their
    * rows appended, so repairing a 100 TB table after a few loads reads
    * the new segments, not the table. REFRESH remains the full
    * rebuild. */
  def repair(t: GraftTable, column: String, segIds: Option[Seq[Long]] = None): Unit = {
    val siPath = t.meta.properties.getOrElse(siPathsKey(column),
      throw new IllegalArgumentException(s"no SI on $column"))
    val si = GraftTable.at(t.spark, siPath)
    val covered = indexedSegments(si)
    val visible = t.status.visible
    val want = segIds.map(_.toSet).getOrElse(visible.map(_.id).toSet)
    val missing = visible.filter(s => want.contains(s.id) && !covered.contains(s.id))
    if (missing.nonEmpty) {
      val files = missing.flatMap(t.layout.segmentFilePaths)
      val rows = t.spark.read.schema(t.schema).parquet(files: _*)
        .select(col(column).as("v"), segIdFromPath.as("seg_id"),
          fileFromPath.as("file"))
        .distinct()
      si.insert(rows)
      recordIndexedSegments(si, covered ++ missing.map(_.id))
    }
  }

  /** SHOW INDEXES. */
  def show(t: GraftTable): Seq[(String, String)] =
    t.meta.properties.collect {
      case (k, v) if k.startsWith("si.") => (k.stripPrefix("si."), v)
    }.toSeq

  /** DROP INDEX. */
  def drop(t: GraftTable, column: String): Unit = {
    t.meta.properties.get(siPathsKey(column)).foreach(p => GraftTable.drop(t.spark, p))
    t.layout.writeTableMeta(t.meta.copy(
      properties = t.meta.properties - siPathsKey(column)))
  }

  /** A selective lookup names few (segment, file) hits; past this many
    * the per-file option encoding stops paying for itself and the read
    * degrades to segment grain (loud in the plan, not in results). */
  private val FileGrainMaxHits = 10000

  /** SI-accelerated equality/IN read: consult the index for the FILES
    * containing any of `values`, then scan only those files with the
    * exact predicate applied (residual) — position-grain, like the
    * reference's BroadCastSIFilterPushJoin. SIs built before the file
    * column, and lookups matching more than [[FileGrainMaxHits]] files,
    * use segment-grain pruning. Falls back to a plain filtered read when
    * no SI exists on the column. */
  def readWhereIn(t: GraftTable, column: String, values: Seq[Any],
      maxFileHits: Int = FileGrainMaxHits): DataFrame = {
    val pred = col(column).isin(values: _*)
    t.meta.properties.get(siPathsKey(column)) match {
      case None => t.read.filter(pred)
      case Some(siPath) =>
        val si = GraftTable.at(t.spark, siPath)
        val visSegs = t.status.visible
        val visible = visSegs.map(_.id).toSet
        // segments the index has never seen (inserted/compacted since the
        // last refresh) must be scanned unindexed — the index can only
        // prune within its coverage; retired seg_ids drop out via the
        // visibility intersection (their rows live in uncovered
        // successors, which are scanned)
        val uncovered = visible -- indexedSegments(si)
        def segmentGrain(): DataFrame = {
          val hits = si.read
            .filter(col("v").isin(values: _*))
            .select("seg_id").distinct()
            .collect().map(_.getLong(0)).toSet
          val target = ((hits & visible) ++ uncovered).toSeq.sorted
          graft.engine.ExplainCollector.record(
            s"SI($column) segment-grain: pinned ${target.size}/${visible.size} " +
              s"segments (${uncovered.size} uncovered scanned unindexed)")
          if (target.isEmpty)
            t.read.filter(pred).limit(0) // provably empty
          else t.readSegments(target).filter(pred)
        }
        if (!si.schema.fieldNames.contains("file")) segmentGrain()
        else {
          // the hit list is metadata-sized for a selective lookup
          // (bounded by matched files, and hard-capped below); the
          // overflow check runs on the RAW collected count — a stale SI
          // full of retired seg_ids could otherwise consume limit slots,
          // pass the cap after the visibility filter, and proceed with a
          // silently truncated file list
          val raw = si.read
            .filter(col("v").isin(values: _*))
            .select("seg_id", "file").distinct()
            .limit(maxFileHits + 1)
            .collect().map(r => (r.getLong(0), r.getString(1)))
          if (raw.length > maxFileHits) segmentGrain()
          else {
            val hits = raw.filter { case (sId, _) => visible.contains(sId) }
            // uncovered segments contribute ALL their files; a file the
            // index knew that a partition-drop removed from `files`
            // simply no longer resolves (its rows are gone)
            val uncov = visSegs.filter(s => uncovered.contains(s.id))
              .flatMap(s => s.files.map(f => (s.id, f)))
            val wanted = (hits ++ uncov).groupBy(_._1)
              .view.mapValues(_.map(_._2).distinct.toSeq).toMap
            graft.engine.ExplainCollector.record(
              s"SI($column) file-grain: pinned ${wanted.values.map(_.size).sum} " +
                s"file(s) across ${wanted.size} segment(s) " +
                s"of ${visSegs.map(_.files.size).sum} total files")
            if (wanted.isEmpty) t.read.filter(pred).limit(0)
            else t.readFiles(wanted).filter(pred)
          }
        }
    }
  }
}
