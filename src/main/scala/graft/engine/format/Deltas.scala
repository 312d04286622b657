package graft.engine.format

import org.apache.hadoop.fs.{FileSystem, Path}

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}

/** Merge-on-read DELETE deltas: per-data-file bitmaps of deleted row
  * positions.
  *
  * Reference semantics: UPDATE/DELETE keep data files immutable and
  * write "Delete Delta: Store RowId of rows that are deleted (Bitmap
  * file format)" next to them (docs/dml-of-carbondata.md:406-409);
  * delta files accumulate per block and are folded by *horizontal
  * compaction* when they exceed a threshold
  * (docs/configuration-parameters.md:120-121).
  *
  * Spark-first shape: a delta file holds the sorted parquet ROW INDEXES
  * (the `_metadata.row_index` coordinate) deleted from one data file.
  * Scans apply deltas by asking the vectorized parquet reader to emit
  * the row index as a column and anti-filtering against the per-file
  * position set — data files are never rewritten, so a scattered
  * 0.001% delete on a 100 TB table writes kilobytes of deltas instead
  * of rewriting terabytes of parquet. The cost is the documented one:
  * scans of delta-bearing files run row-based until compaction folds
  * the deltas away.
  *
  * Delta files live under `segments/<id>/_delta/` and are referenced
  * from [[SegmentMeta.deltas]]; an unreferenced delta file is garbage
  * (a crashed or lost-race delete) and is reclaimed by CLEAN FILES.
  */
object Deltas {

  val Dir = "_delta"
  private val Magic = 0x47444C54 // "GDLT"
  private val Version = 1

  /** Fresh delta-file path (relative to the segment dir) for a delete
    * against data file `dataRel`. Partition subdirs flatten into the
    * name so every delta lives directly under `_delta/`. */
  def newRelPath(dataRel: String): String = {
    val flat = dataRel.replace('/', '%')
    s"$Dir/$flat.${java.util.UUID.randomUUID().toString.take(8)}.delta"
  }

  /** Header for incremental (executor-side) writers. */
  def writeHeader(out: DataOutputStream): Unit = {
    out.writeInt(Magic); out.writeInt(Version)
  }

  /** Write sorted positions; returns the count written. The file is
    * invisible until a tablestatus commit references it. */
  def write(fs: FileSystem, abs: Path, positions: Iterator[Long]): Long = {
    fs.mkdirs(abs.getParent)
    val out = new DataOutputStream(new BufferedOutputStream(fs.create(abs, true)))
    var n = 0L
    try {
      writeHeader(out)
      positions.foreach { p => out.writeLong(p); n += 1 }
    } finally out.close()
    n
  }

  /** Test probe: when enabled, every delta READ records the thread it
    * ran on — the MoR-at-scale spec asserts maintenance reads load
    * positions only inside executor task threads, never on the driver
    * (local mode shares the JVM, so the thread name is the boundary). */
  private[graft] object ReadProbe {
    @volatile var enabled = false
    val threads = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def reset(): Unit = { threads.clear(); enabled = true }
    def stop(): Unit = enabled = false
  }

  /** Union of delta files addressed by absolute path (executor-side:
    * sorted, deduped — the maintenance-path mask loads through this). */
  def readAll(conf: org.apache.hadoop.conf.Configuration, absPaths: Seq[String]): Array[Long] = {
    val all = absPaths.toArray.flatMap { ap =>
      val p = new Path(ap)
      read(p.getFileSystem(conf), p)
    }
    java.util.Arrays.sort(all)
    dedupSorted(all)
  }

  def read(fs: FileSystem, abs: Path): Array[Long] = {
    if (ReadProbe.enabled) ReadProbe.threads.add(Thread.currentThread().getName)
    val len = fs.getFileStatus(abs).getLen
    val in = new DataInputStream(new BufferedInputStream(fs.open(abs)))
    try {
      require(in.readInt() == Magic && in.readInt() == Version, s"bad delta file $abs")
      val n = ((len - 8) / 8).toInt
      val a = new Array[Long](n)
      var i = 0
      while (i < n) { a(i) = in.readLong(); i += 1 }
      a
    } finally in.close()
  }

  /** Union of one data file's delta files: sorted distinct positions
    * (commits write disjoint deltas, but a merged read stays safe
    * against overlap). */
  def positionsOf(fs: FileSystem, segDir: Path, deltaRels: Seq[String]): Array[Long] = {
    val all = deltaRels.toArray.flatMap(r => read(fs, new Path(segDir, r)))
    java.util.Arrays.sort(all)
    dedupSorted(all)
  }

  /** In-place dedup of a sorted array. */
  private def dedupSorted(all: Array[Long]): Array[Long] =
    if (all.length < 2) all
    else {
      var w = 1
      var i = 1
      while (i < all.length) {
        if (all(i) != all(w - 1)) { all(w) = all(i); w += 1 }
        i += 1
      }
      if (w == all.length) all else java.util.Arrays.copyOf(all, w)
    }

  /** Conservative per-column stats for a holder that had `oldRows` rows
    * and now has `newRows` (rows removed by delta, nulls-per-column
    * unknown): min/max keep (the live values are a subset of the old
    * range — sound for range pruning, which is why metadata MIN/MAX
    * answers are separately disabled under deltas), and nullCount is
    * re-expressed so both IsNull (`nullCount > 0` keeps) and IsNotNull
    * (`nullCount < rowCount` keeps) pruning stay sound:
    *   - 0 stays 0 (no nulls before ⇒ none after)
    *   - all-null stays all-null (deleting from all-null can't add a
    *     non-null)
    *   - anything else becomes 1 when ≥2 rows remain ("some unknown
    *     mix" — keeps both prunes), or drops the entry entirely. */
  def clampStats(
      stats: Map[String, ColumnStats], oldRows: Long, newRows: Long): Map[String, ColumnStats] =
    stats.flatMap { case (c, cs) =>
      if (cs.nullCount == 0) Some(c -> cs)
      else if (oldRows >= 0 && cs.nullCount >= oldRows) Some(c -> cs.copy(nullCount = newRows))
      else if (newRows >= 2) Some(c -> cs.copy(nullCount = 1))
      else None
    }

  /** Segment meta after committing a delete delta removing `removed`
    * rows from `dataRel`: the delta is appended to the file's list,
    * live row/byte-free counts decrement exactly, and stats clamp per
    * [[clampStats]]. Caller must have verified `dataRel` has a
    * fileMeta entry; a file whose live count reaches zero should then
    * be retired via [[Partitions.retireFiles]]. */
  def applyToSegment(
      s: SegmentMeta, dataRel: String, deltaRel: String, removed: Long): SegmentMeta = {
    val fm = s.fileMeta(dataRel)
    val newFm = fm.copy(
      rows = fm.rows - removed,
      stats = clampStats(fm.stats, fm.rows, fm.rows - removed))
    s.copy(
      deltas = s.deltas.updated(dataRel, s.deltas.getOrElse(dataRel, Nil) :+ deltaRel),
      fileMeta = s.fileMeta.updated(dataRel, newFm),
      rowCount = if (s.rowCount >= 0) s.rowCount - removed else s.rowCount,
      stats = clampStats(s.stats, s.rowCount, s.rowCount - removed))
  }
}
