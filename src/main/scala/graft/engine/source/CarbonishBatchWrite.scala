package graft.engine.source

import graft.engine.{GraftTable, Mutation}
import graft.engine.format._

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

import scala.collection.mutable

/** True DSv2 BatchWrite for `INSERT OVERWRITE` in dynamic partition
  * mode — Spark's `OverwritePartitionsDynamic` plan hard-requires
  * BATCH_WRITE (the V1 fallback only covers append/filter-overwrite),
  * so this is the one write shape that runs through DataWriters instead
  * of the V1 segment writer.
  *
  * Mechanics: the required distribution clusters rows by the partition
  * columns and the required ordering sorts them by (partition, sort)
  * columns, so each task streams one partition dir at a time through a
  * single parquet OutputWriter, rolling at tuple boundaries — Spark's
  * own dynamic-partition writer shape. Tasks write straight into the
  * reserved segment's tmp dir under `__p_<col>=<value>/` names; commit
  * renames the dir into place, lifts footer metadata, and swaps: the
  * new segment becomes visible while every visible file of an
  * overwritten partition tuple retires — file-grain, via the same
  * optimistic [[Mutation.swap]] used by IUD. */
class DynamicOverwriteWrite(
    tablePath: String,
    info: LogicalWriteInfo) extends Write with RequiresDistributionAndOrdering {

  private val spark = org.apache.spark.sql.classic.SparkSession.active
  private val table = GraftTable.at(spark, tablePath)
  private val meta = table.meta
  require(meta.partitionColumns.nonEmpty,
    "dynamic partition overwrite on an unpartitioned carbonish table")
  require(Buckets.specOf(meta).isEmpty,
    "dynamic partition overwrite on a bucketed carbonish table is not supported; " +
      "use GraftTable.insertOverwriteDynamic")
  private val schema = table.schema

  override def requiredDistribution(): Distribution =
    Distributions.clustered(
      meta.partitionColumns.map(c =>
        Expressions.identity(c): org.apache.spark.sql.connector.expressions.Expression).toArray)

  override def requiredOrdering(): Array[SortOrder] = {
    val cols = meta.partitionColumns ++
      meta.sortColumns.filterNot(meta.partitionColumns.contains)
    cols.map(c => Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray
  }

  override def toBatch: BatchWrite = {
    val layout = table.layout
    val segId = Mutation.reserve(table)
    val tmp = layout.tmpSegmentDir(segId)
    layout.fs.mkdirs(tmp)
    new DynamicOverwriteBatchWrite(tablePath, segId, tmp.toString, schema, meta)
  }
}

private case class DynFileResult(relPath: String, rows: Long)
private case class DynCommitMessage(files: Seq[DynFileResult]) extends WriterCommitMessage

private class DynamicOverwriteBatchWrite(
    tablePath: String,
    segId: Long,
    tmpDir: String,
    schema: StructType,
    meta: TableMeta) extends BatchWrite {

  private val spark = org.apache.spark.sql.classic.SparkSession.active

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, schema)
    val pFields = meta.partitionColumns.map(c =>
      schema.fieldIndex(c) -> schema(schema.fieldIndex(c)))
    DynWriterFactory(
      new SerializableConfiguration(job.getConfiguration),
      owf, tmpDir, schema, pFields)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val table = GraftTable.at(spark, tablePath)
    val layout = table.layout
    val fs = layout.fs
    val tmp = new Path(tmpDir)
    val registered = messages.flatMap { case DynCommitMessage(fs0) => fs0 }.toSeq
    if (registered.isEmpty) { // empty source: hive dynamic overwrite is a no-op
      Mutation.retire(table, segId)
      fs.delete(tmp, true)
      return
    }
    // drop stray files from failed/speculative attempts before publish
    val keep = registered.map(_.relPath).toSet
    SegmentWriter.listParquetFiles(fs, tmp, tmp).foreach { case (rel, _) =>
      if (!keep(rel)) fs.delete(new Path(tmp, rel), false)
    }
    val dest = layout.segmentDir(segId)
    if (fs.exists(dest)) fs.delete(dest, true)
    if (!fs.rename(tmp, dest))
      throw new IllegalStateException(s"failed to rename $tmp to $dest")

    // footer lift + segment-level stats folded from the per-file stats
    val conf = spark.sessionState.newHadoopConf()
    val footerCols = meta.sortColumns.filter(schema.fieldNames.contains)
      .map(c => c -> schema(schema.fieldIndex(c)).dataType).toMap
    val files = SegmentWriter.listParquetFiles(fs, dest, dest)
    val fileMeta = files.flatMap { case (rel, len) =>
      FileFooters.read(conf, new Path(dest, rel), len, footerCols).map(rel -> _)
    }.toMap
    val segStats = footerCols.flatMap { case (c, dt) =>
      val perFile = files.map(f => fileMeta.get(f._1).flatMap(_.stats.get(c)))
      if (perFile.exists(_.isEmpty)) None
      else {
        val cs = perFile.flatten
        StatValue.foldStored(dt, cs.flatMap(_.min), wantMin = true).flatMap(mn =>
          StatValue.foldStored(dt, cs.flatMap(_.max), wantMin = false).map(mx =>
            c -> ColumnStats(Some(mn), Some(mx), cs.map(_.nullCount).sum)))
      }
    }
    val seg = SegmentMeta(
      id = segId,
      status = SegmentStatus.Success,
      origin = "rewrite", // dynamic overwrite re-houses + replaces rows
      format = "parquet",
      files = files.map(_._1),
      rowCount = registered.map(_.rows).sum,
      sizeBytes = files.map(_._2).sum,
      stats = segStats,
      sortColumns = meta.sortColumns,
      createdAt = System.currentTimeMillis(),
      fileMeta = fileMeta)

    // overwritten scope = the partition tuples present in the new data.
    // Retirement here is METADATA-ONLY (nothing re-reads the victims'
    // surviving rows — there are none: files are partition-exclusive),
    // so every affected file MUST be file-grain eligible. A whole-segment
    // fallback would silently drop the segment's OTHER partitions; fail
    // loudly instead of losing data.
    val pSchema = graft.engine.PartitionOps.partitionSchema(meta, schema)
    val tuples = files.map(_._1).flatMap(
      graft.engine.PartitionOps.fileTuple(pSchema, _)).distinct
    val segs = Mutation.visibleFiles(table).filterNot(_._1.id == segId)
    val affected = segs.flatMap { case (s, _) =>
      val rels = s.files.filter(f =>
        graft.engine.PartitionOps.fileTuple(pSchema, f).exists(t0 =>
          tuples.exists(graft.engine.PartitionOps.tupleMatches(pSchema, t0, _))))
      if (rels.isEmpty) None else Some(s.id -> rels.toSet)
    }.toMap
    val ineligible = affected.flatMap { case (id, rels) =>
      val s = segs.find(_._1.id == id).get._1
      val bad = s.externalPath.nonEmpty || !rels.forall(s.fileMeta.contains)
      if (bad) Some(id) else None
    }
    if (ineligible.nonEmpty) {
      try { fs.delete(dest, true); Mutation.retire(table, segId) }
      catch { case _: Throwable => }
      throw new IllegalStateException(
        s"dynamic overwrite needs per-file footer metadata on every affected file; " +
          s"segment(s) ${ineligible.mkString(",")} lack it (external or pre-footer-era) — " +
          "compact the table first, or use insertOverwriteWhere")
    }
    // every affected segment retires exactly its overwritten files;
    // a segment whose files are ALL affected empties out via retireFiles
    Mutation.swap(table, Set.empty, Some(seg),
      affected.map { case (id, rels) => id -> rels.toSeq.sorted })
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val table = GraftTable.at(spark, tablePath)
    try table.layout.fs.delete(new Path(tmpDir), true)
    finally Mutation.retire(table, segId)
  }
}

private case class DynWriterFactory(
    conf: SerializableConfiguration,
    owf: OutputWriterFactory,
    tmpDir: String,
    schema: StructType,
    pFields: Seq[(Int, StructField)]) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DynWriter(conf, owf, tmpDir, schema, pFields, partitionId, taskId)
}

/** One task's writer: rows arrive clustered+sorted by the partition
  * columns, so a single open file suffices — rolled at tuple
  * boundaries. File names carry (partitionId, taskId) so speculative
  * attempts never collide; only files in the commit message register. */
private class DynWriter(
    conf: SerializableConfiguration,
    owf: OutputWriterFactory,
    tmpDir: String,
    schema: StructType,
    pFields: Seq[(Int, StructField)],
    partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {

  private val ctx = new TaskAttemptContextImpl(conf.value,
    new TaskAttemptID("graft", segHash, TaskType.MAP, partitionId, (taskId & 0x7fffffff).toInt))
  private def segHash: Int = tmpDir.hashCode & 0x7fffffff
  private val ext = owf.getFileExtension(ctx)

  private var current: org.apache.spark.sql.execution.datasources.OutputWriter = _
  private var currentDirs: Seq[String] = null
  private var currentRel: String = _
  private var rowsInFile = 0L
  private var fileSeq = 0
  private val done = mutable.Buffer.empty[DynFileResult]

  /** Same dir-value strings the V1 path's dynamic writer prints (and
    * [[Partitions.castRaw]] parses back): Cast-to-string forms. */
  private def dirOf(row: InternalRow): Seq[String] = pFields.map { case (i, f) =>
    val raw =
      if (row.isNullAt(i)) Partitions.DefaultPartitionName
      else f.dataType match {
        // hive convention (matches the V1 writer): the empty string
        // shares the default partition dir with null
        case StringType if row.getUTF8String(i).numChars() == 0 =>
          Partitions.DefaultPartitionName
        case StringType => row.getUTF8String(i).toString
        case ByteType => row.getByte(i).toString
        case ShortType => row.getShort(i).toString
        case IntegerType => row.getInt(i).toString
        case LongType => row.getLong(i).toString
        case BooleanType => row.getBoolean(i).toString
        case DateType => java.time.LocalDate.ofEpochDay(row.getInt(i).toLong).toString
        case other => throw new IllegalStateException(s"partition type $other")
      }
    Partitions.mirror(f.name) + "=" + ExternalCatalogUtils.escapePathName(raw)
  }

  private def roll(dirs: Seq[String]): Unit = {
    closeCurrent()
    currentDirs = dirs
    currentRel = (dirs :+ f"part-$partitionId%05d-$taskId-$fileSeq$ext").mkString("/")
    fileSeq += 1
    current = owf.newInstance(new Path(tmpDir, currentRel).toString, schema, ctx)
    rowsInFile = 0L
  }

  private def closeCurrent(): Unit = if (current != null) {
    current.close()
    done += DynFileResult(currentRel, rowsInFile)
    current = null
  }

  override def write(row: InternalRow): Unit = {
    val dirs = dirOf(row)
    if (currentDirs == null || dirs != currentDirs) roll(dirs)
    current.write(row)
    rowsInFile += 1
  }

  override def commit(): WriterCommitMessage = {
    closeCurrent()
    DynCommitMessage(done.toSeq)
  }

  override def abort(): Unit = {
    if (current != null) { try current.close() catch { case _: Throwable => } }
    val fs = new Path(tmpDir).getFileSystem(conf.value)
    (done.map(_.relPath) ++ Option(currentRel)).foreach { rel =>
      try fs.delete(new Path(tmpDir, rel), false) catch { case _: Throwable => }
    }
  }

  override def close(): Unit = ()
}
