package graft.engine.source

import graft.engine.format._

import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.hadoop.fs.Path

/** Structured-streaming SOURCE over a carbonish table: each micro-batch
  * is the set of segments committed since the last watermark —
  * `spark.readStream.format("carbonish").load(path)` turns an ingest
  * table into an incremental feed (the natural shape for a
  * training-data pipeline: load → incrementally dedup/score/transform
  * downstream without rescanning 100 TB).
  *
  * Offset = a SEGMENT-ID watermark that only advances through the
  * CONTIGUOUS committed prefix: segment ids are reserved under the
  * table lock in order, but commits can finish out of order — a
  * watermark that jumped past a still-IN_PROGRESS id would skip that
  * load forever once it lands. (A crashed load stalls the stream until
  * CLEAN FILES reclaims its stale record — same stale-load handling as
  * the batch side.)
  *
  * Only `origin` load/handoff segments are emitted: compaction and IUD
  * rewrites re-house rows a stream already saw (the append-only
  * contract — like other lakehouse streaming sources, deletes/updates
  * to already-emitted rows do not retract them downstream; merge-on-
  * read deltas ARE applied when a batch is planned, so late-planned
  * batches never resurrect deleted rows).
  */
case class SegOffset(max: Long) extends Offset {
  override def json(): String = max.toString
}

class SegmentMicroBatchStream(
    spark: SparkSession,
    layout: TableLayout,
    tableSchema: StructType,
    options: CaseInsensitiveStringMap)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.internal.Logging {

  // admission control: cap how far the watermark advances per batch, so
  // a backfill over years of segments streams as paced batches instead
  // of one giant first batch (options on readStream)
  private val maxSegmentsPerBatch: Option[Int] =
    Option(options.get("max_segments_per_batch")).map(_.toInt)
  private val maxRowsPerBatch: Option[Long] =
    Option(options.get("max_rows_per_batch")).map(_.toLong)

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    maxRowsPerBatch.map(ReadLimit.maxRows)
      .orElse(maxSegmentsPerBatch.map(n => ReadLimit.maxFiles(n)))
      .getOrElse(ReadLimit.allAvailable())
  }

  /** Advance the watermark at most `max_segments_per_batch` emittable
    * segments / `max_rows_per_batch` live rows past `start` (always at
    * least one segment, or the stream would stall). Skipped-origin
    * segments ride along for free — they never emit. */
  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val cap = contiguousMax(layout.readStatus())
    val s = start.asInstanceOf[SegOffset].max
    if (cap <= s || (maxSegmentsPerBatch.isEmpty && maxRowsPerBatch.isEmpty))
      return SegOffset(cap)
    val candidates = batchSegments(s, cap)
    var segsTaken = 0
    var rowsTaken = 0L
    var end = s
    var i = 0
    while (i < candidates.size && end < cap) {
      val seg = candidates(i)
      val wouldSegs = segsTaken + 1
      val wouldRows = rowsTaken + math.max(0L, seg.rowCount)
      if (segsTaken > 0 &&
          (maxSegmentsPerBatch.exists(wouldSegs > _) ||
            maxRowsPerBatch.exists(wouldRows > _))) {
        return SegOffset(end)
      }
      segsTaken = wouldSegs; rowsTaken = wouldRows; end = seg.id
      i += 1
    }
    SegOffset(cap) // every emittable segment fits: sweep to the cap
  }

  override def reportLatestOffset(): Offset =
    SegOffset(contiguousMax(layout.readStatus()))

  private val readSchemaWithTmp =
    tableSchema.add(org.apache.spark.sql.graft.Shims.rowIndexTempField)

  /** Largest id E with no IN_PROGRESS/STREAMING record at or below it. */
  private def contiguousMax(st: TableStatus): Long = {
    val pending = st.segments.filter(s =>
      s.status == SegmentStatus.InProgress || s.status == SegmentStatus.Streaming)
    val cap = if (pending.isEmpty) Long.MaxValue else pending.map(_.id).min - 1
    val done = st.segments.map(_.id).filter(_ <= cap)
    if (done.isEmpty) -1L else done.max
  }

  /** Emittable records in (start, end]: committed data with load/handoff
    * provenance. Replay must work after a segment was retired
    * (compacted/deleted) — status only excludes never-committed records,
    * which are recognizable by their empty file list. */
  private def batchSegments(start: Long, end: Long): Seq[SegmentMeta] = {
    val segs = layout.readStatus().segments
      .filter(s => s.id > start && s.id <= end)
      .filter(s => s.status != SegmentStatus.InProgress &&
        s.status != SegmentStatus.Streaming && s.files.nonEmpty)
      .filter(s => s.origin == "load" || s.origin == "handoff")
      .sortBy(_.id)
    val foreign = segs.filter(_.format != "parquet")
    if (foreign.nonEmpty) throw new IllegalStateException(
      s"streaming read supports parquet segments only; found " +
        foreign.map(s => s"${s.id}(${s.format})").mkString(","))
    segs
  }

  private def scanFor(segs: Seq[SegmentMeta]): ParquetScan = {
    val b = ParquetScanBuilder(
      spark, new SegmentFileIndex(spark, layout, segs, tableSchema),
      tableSchema, tableSchema, options)
    b.pruneColumns(readSchemaWithTmp)
    b.build()
  }

  override def initialOffset(): Offset =
    if (Option(options.get("stream_starting")).exists(_.equalsIgnoreCase("latest")))
      SegOffset(contiguousMax(layout.readStatus()))
    else SegOffset(-1L)

  override def latestOffset(): Offset = SegOffset(contiguousMax(layout.readStatus()))

  override def deserializeOffset(json: String): Offset = SegOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SegOffset].max
    val e = end.asInstanceOf[SegOffset].max
    if (e <= s) return Array.empty
    val segs = batchSegments(s, e)
    if (segs.isEmpty) return Array.empty
    logInfo(s"[graft] stream batch: segments (${s}, ${e}] -> " +
      s"${segs.map(_.id).mkString(",")}")
    // merge-on-read deltas as of PLANNING time (qualified path -> abs deltas)
    val deltaOfFile: Map[String, Seq[String]] =
      segs.filter(_.deltas.nonEmpty).flatMap { sm =>
        val dir = layout.segmentDir(sm.id)
        sm.deltas.map { case (rel, dRels) =>
          layout.fs.makeQualified(new Path(dir, rel)).toString ->
            dRels.map(dr => new Path(dir, dr).toString)
        }
      }.toMap
    val planned = scanFor(segs).toBatch.planInputPartitions()
    var i = 0
    planned.flatMap {
      case fp: FilePartition =>
        val (hit, clean) = fp.files.partition(f =>
          deltaOfFile.contains(new Path(f.filePath.toString).toString))
        val cleanPart: Seq[InputPartition] =
          if (clean.isEmpty) Nil else { i += 1; Seq(FilePartition(i, clean)) }
        val deltaParts = hit.groupBy(f => new Path(f.filePath.toString).toString)
          .toSeq.map { case (qp, slices) =>
            i += 1
            DeltaFilePartition(FilePartition(i, slices), deltaOfFile(qp)): InputPartition
          }
        cleanPart ++ deltaParts
      case other => Seq(other)
    }
  }

  /** One factory for the stream's lifetime: the parquet reader factory
    * is file-agnostic (partitions are self-contained), so a template
    * scan over zero segments provides it; the delta wrapper strips the
    * always-injected row-index column and anti-filters delta
    * partitions. */
  override def createReaderFactory(): PartitionReaderFactory =
    DeltaAwareReaderFactory(
      scanFor(Nil).toBatch.createReaderFactory(),
      readSchemaWithTmp,
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
