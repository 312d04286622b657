package graft.engine

import graft.engine.format.{SegmentMeta, SegmentStatus, SegmentWriter}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Thrown when a concurrent writer retired a copy-on-write victim between
  * selection and commit; update/delete retry transparently, merge and
  * compaction surface it (their re-run is not side-effect-free). */
class ConcurrentMutationException(msg: String) extends RuntimeException(msg)

/** Copy-on-write mutation (IUD) for carbonish tables.
  *
  * Reference semantics: UPDATE/DELETE address rows by tupleId and write
  * delete-deltas (CarbonProjectForUpdateCommand.scala:48,
  * DeleteExecution.scala:60,94); MERGE joins source⋈target and
  * dispatches per-row actions (CarbonMergeDataSetCommand.scala:66,
  * builder MergeDataSetBuilder.scala:39-96). Spark-first redesign:
  * copy-on-write at *segment granularity* — one job finds the affected
  * files via `_metadata.file_path` (the CDC block-pruning trick,
  * CDCBlockImplicitExpression), only those segments are rewritten, and
  * the commit is a single atomic tablestatus swap. Untouched segments
  * are never read or written, so a point-update of one segment on a
  * 100 TB table rewrites ~1 segment, not the table. Merge-on-read delta
  * masks on the maintenance read paths apply via the [[org.apache.spark.sql.graft.DeltaKeep]]
  * codegen predicate (executor-lazy position loads over a broadcast
  * path map — see [[deltaFilter]]).
  */
object Mutation extends org.apache.spark.internal.Logging {

  /** Visible parquet segments and their file lists. Mutations are
    * rejected while a STREAMING segment is open (its files are still
    * being appended — the reference likewise requires handoff first)
    * and on mixed-format tables (foreign segments can't be rewritten
    * through the parquet path). */
  private[engine] def visibleFiles(t: GraftTable): Seq[(SegmentMeta, Seq[String])] = {
    val vis = t.status.visible
    val streaming = vis.filter(_.status == SegmentStatus.Streaming)
    require(streaming.isEmpty,
      s"cannot mutate ${t.path}: open streaming segment(s) " +
        s"${streaming.map(_.id).mkString(",")} — FINISH STREAMING first")
    val foreign = vis.filter(_.format != "parquet")
    require(foreign.isEmpty,
      s"cannot mutate ${t.path}: non-parquet segment(s) " +
        s"${foreign.map(s => s"${s.id}(${s.format})").mkString(",")}")
    vis.map(s => s -> t.layout.segmentFilePaths(s))
  }

  /** Anti-filter masking rows deleted by merge-on-read deltas, for the
    * v1/maintenance read paths (mutation scans, tupleId reads,
    * pagination, compaction). Only the data-file → delta-file PATH map
    * ships (driver-bounded metadata, same class as the file lists the
    * caller already holds); each task loads the position sets of the
    * files it actually reads, lazily, with a per-task cache — positions
    * never touch the driver, so a 10⁹-scattered-delete table masks at
    * executor parallelism exactly like the main scan path
    * ([[graft.engine.source.DeltaAwareReaderFactory]]). None = no
    * deltas anywhere (caller skips the filter, keeping codegen clean). */
  private[engine] def deltaFilter(
      t: GraftTable, segs: Seq[(SegmentMeta, Seq[String])]): Option[Column] = {
    val withDeltas = segs.map(_._1).filter(_.deltas.nonEmpty)
    if (withDeltas.isEmpty) return None
    val fs = t.layout.fs
    val pathMap: Map[String, Seq[String]] = withDeltas.flatMap { s =>
      val dir = t.layout.segmentDir(s.id)
      s.deltas.map { case (rel, dRels) =>
        fs.makeQualified(new org.apache.hadoop.fs.Path(dir, rel)).toString ->
          dRels.map(dr => new org.apache.hadoop.fs.Path(dir, dr).toString)
      }
    }.toMap
    val bc = t.spark.sparkContext.broadcast(pathMap)
    val lookup = new org.apache.spark.sql.graft.DeltaLookup(bc,
      new graft.engine.source.SerializableHadoopConf(
        t.spark.sessionState.newHadoopConf()))
    Some(org.apache.spark.sql.graft.Shims.column(
      org.apache.spark.sql.graft.DeltaKeep(
        org.apache.spark.sql.graft.Shims.expression(col("_metadata.file_path")),
        org.apache.spark.sql.graft.Shims.expression(col("_metadata.row_index")),
        lookup)))
  }

  /** Prune the candidate file set for a mutation predicate with the
    * SAME stats ladder the read path uses (segment min/max → file-grain
    * footer/partition/bucket stats): a point DELETE on a 100 TB sorted
    * table then scans ~one segment's files to find its matches instead
    * of every footer. The condition is resolved against an empty frame
    * to translate it to source filters; anything untranslatable keeps
    * everything (conservative — correctness never depends on this). */
  private[engine] def pruneCandidates(
      t: GraftTable, segs: Seq[(SegmentMeta, Seq[String])], cond: Column)
      : Seq[(SegmentMeta, Seq[String])] = {
    import graft.engine.format.{Partitions, SegmentPruner}
    val filters: Seq[org.apache.spark.sql.sources.Filter] =
      try {
        val resolved = t.spark.createDataFrame(
            t.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], t.schema)
          .filter(cond).queryExecution.analyzed
        resolved match {
          case org.apache.spark.sql.catalyst.plans.logical.Filter(c, _) =>
            // each translatable conjunct prunes independently; the
            // untranslatable rest simply doesn't prune
            splitConjuncts(c).flatMap(e =>
              org.apache.spark.sql.graft.Shims.translateFilter(e))
          case _ => Nil
        }
      } catch { case scala.util.control.NonFatal(_) => Nil }
    if (filters.isEmpty) return segs
    val schema = t.schema
    val kept = segs.flatMap { case (s, abs) =>
      if (SegmentPruner.prune(Seq(s), filters).isEmpty) None
      else {
        val keptAbs = s.files.zip(abs).collect {
          case (rel, a) if !(s.fileMeta.contains(rel) || rel.contains("=")) ||
              filters.forall(SegmentPruner.mayMatch(
                Partitions.fileAsSegment(s, rel, schema), _)) => a
        }
        if (keptAbs.isEmpty) None else Some((s, keptAbs))
      }
    }
    val siKept = siPrune(t, kept, filters)
    val (fTot, fKept) = (segs.map(_._2.size).sum, siKept.map(_._2.size).sum)
    if (fKept < fTot)
      logInfo(s"[graft] mutation candidate prune: $fKept/$fTot files")
    siKept
  }

  /** SI rung of the mutation candidate ladder (r13): where segment/file
    * stats can't prune an equality/IN predicate (non-sort column), the
    * SI's value → (segment, file) postings can — a point DELETE on an
    * indexed 100 TB column scans the posting-named files, not every
    * stats-surviving footer. Purely subtractive over the stats-kept
    * set; segments the index hasn't covered keep all their files
    * ([[graft.engine.index.Si.mutationHits]] contract), so a stale SI
    * can never hide a row from a mutation. */
  private def siPrune(
      t: GraftTable,
      kept: Seq[(SegmentMeta, Seq[String])],
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : Seq[(SegmentMeta, Seq[String])] = {
    import org.apache.spark.sql.sources.{EqualTo, In}
    val siCols = t.meta.properties.keys
      .filter(_.startsWith("si.")).map(_.stripPrefix("si.")).toSet
    if (siCols.isEmpty) return kept
    val lookups = filters.collect {
      case EqualTo(a, v) if v != null && siCols.exists(_.equalsIgnoreCase(a)) =>
        (siCols.find(_.equalsIgnoreCase(a)).get, Seq(v))
      case In(a, vs) if vs.nonEmpty && vs.length <= 256 && vs.forall(_ != null) &&
          siCols.exists(_.equalsIgnoreCase(a)) =>
        (siCols.find(_.equalsIgnoreCase(a)).get, vs.toSeq)
    }
    lookups.foldLeft(kept) { case (acc, (colName, values)) =>
      graft.engine.index.Si.mutationHits(t, colName, values) match {
        case None => acc
        case Some((covered, hits)) => acc.flatMap { case (s, abs) =>
          if (!covered.contains(s.id)) Some((s, abs))
          else hits.get(s.id) match {
            case None => None // covered and provably value-free
            case Some(None) => Some((s, abs)) // segment-grain hit
            case Some(Some(files)) =>
              val keptAbs = abs.filter { a =>
                val i = a.indexOf(s"/segments/${s.id}/")
                i >= 0 && files.contains(
                  a.substring(i + s"/segments/${s.id}/".length))
              }
              if (keptAbs.isEmpty) None else Some((s, keptAbs))
          }
        }
      }
    }
  }

  private def splitConjuncts(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Which FILES of which visible segments contain rows matching `cond`,
    * and how many matching rows each holds? One Spark job over (pruned)
    * candidate files — the per-file count rides the same scan that finds
    * the affected files, so callers that need the matched-row count
    * (UPDATE's return value) pay no second pass. An `observe()` on the
    * rewrite job is NOT equivalent: GLOBAL_SORT's range-partition
    * sampling executes the plan twice and double-counts the metric.
    * Returns segId -> (relPath -> matchCount). */
  private def affectedFiles(
      t: GraftTable, segs0: Seq[(SegmentMeta, Seq[String])], cond: Column)
      : Map[Long, Map[String, Long]] = {
    val segs = pruneCandidates(t, segs0, cond)
    if (segs.isEmpty) return Map.empty
    val spark = t.spark
    val files = segs.flatMap(_._2)
    // explicit schema: after a metadata-only ADD COLUMNS, footer
    // inference would miss (or nondeterministically resolve) the new
    // column and break conditions referencing it
    val base = spark.read.schema(t.schema).parquet(files: _*)
    val live = deltaFilter(t, segs).map(base.filter).getOrElse(base)
    val hit = live
      .filter(cond)
      .groupBy(col("_metadata.file_path").as("fp"))
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // resolve against the UNPRUNED index: normIndex zips each segment's
    // full rel list with its abs list, and a pruned abs subset would
    // silently mis-map hits to the wrong file
    val byNorm = normIndex(t, segs0)
    hit.toSeq.map { case (h, c) =>
      val (id, rel) = resolveHit(byNorm, h)
      (id, rel, c)
    }.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map(x => x._2 -> x._3).toMap
    }
  }

  /** Qualified-path index over the visible file set (for mapping
    * `_metadata.file_path` hits back to (segmentId, relPath)). */
  private[engine] def normIndex(
      t: GraftTable, segs: Seq[(SegmentMeta, Seq[String])]): Map[String, (Long, String)] = {
    val fs = t.layout.fs
    segs.flatMap { case (m, abs) =>
      // the zip is positional — a pruned abs subset would mis-map every
      // file after the first gap
      require(m.files.size == abs.size,
        s"normIndex needs the segment's FULL path list (segment ${m.id}: " +
          s"${m.files.size} files vs ${abs.size} paths)")
      m.files.zip(abs).map { case (rel, a) =>
        fs.makeQualified(new org.apache.hadoop.fs.Path(a)).toString -> (m.id, rel)
      }
    }.toMap
  }

  /** hadoop-Path-normalized exact lookup. A failed lookup means the
    * normalization broke — silently dropping it would leave matching
    * rows un-rewritten, so it throws. */
  private[engine] def resolveHit(
      byNorm: Map[String, (Long, String)], hitPath: String): (Long, String) =
    byNorm.getOrElse(new org.apache.hadoop.fs.Path(hitPath).toString,
      throw new IllegalStateException(
        s"affected file $hitPath not found in the scanned file set"))

  /** Atomic swap: retire `victims` (whole segments) and the
    * `partialVictims` FILES (file-grain copy-on-write — the segment
    * survives minus those files, with footer-exact count decrements and
    * refreshed stats), publish `replacement`. Optimistic concurrency:
    * inside the commit (under the table lock) every victim must still be
    * visible — and every partial victim must still LIST the files being
    * retired (a concurrent file-grain mutation may have already swapped
    * them) — else publishing our replacement would resurrect pre-image
    * rows, so the swap aborts with [[ConcurrentMutationException]]. */
  private[engine] def swap(
      t: GraftTable, victims: Set[Long], replacement: Option[SegmentMeta],
      partialVictims: Map[Long, Seq[String]] = Map.empty,
      selected: Map[Long, SegmentMeta] = Map.empty): Unit =
    try t.layout.commit { st =>
      val vis = st.segments.filter(_.isVisible).map(_.id).toSet
      val lost = (victims ++ partialVictims.keys) -- vis
      if (lost.nonEmpty) throw new ConcurrentMutationException(
        s"segments ${lost.toSeq.sorted.mkString(",")} were retired concurrently")
      // FULL victims must be byte-identical to what we read: a
      // concurrent file-grain rewrite or merge-on-read delta inside a
      // still-visible victim would otherwise be silently resurrected
      // (its pre-image rides into our replacement) or lost
      victims.foreach { id =>
        selected.get(id).foreach { sel =>
          val cur = st.segments.find(_.id == id).get
          if (cur.files != sel.files || cur.rowCount != sel.rowCount ||
              cur.deltas != sel.deltas)
            throw new ConcurrentMutationException(
              s"segment $id was mutated concurrently (files/deltas changed)")
        }
      }
      partialVictims.foreach { case (id, rels) =>
        val s = st.segments.find(_.id == id).get
        val gone = rels.filterNot(s.files.contains)
        if (gone.nonEmpty) throw new ConcurrentMutationException(
          s"files ${gone.mkString(",")} of segment $id were rewritten concurrently")
        if (!rels.forall(s.fileMeta.contains)) throw new ConcurrentMutationException(
          s"segment $id lost footer metadata mid-rewrite")
        // a delta added to a file we rewrote would be erased by the swap
        selected.get(id).foreach { sel =>
          val changed = rels.filter(r =>
            s.deltas.getOrElse(r, Nil) != sel.deltas.getOrElse(r, Nil))
          if (changed.nonEmpty) throw new ConcurrentMutationException(
            s"delete deltas of ${changed.mkString(",")} (segment $id) changed mid-rewrite")
        }
      }
      // the reserved replacement record must still exist, or the swap
      // would silently retire victims while publishing nothing
      replacement.foreach(r => require(st.segments.exists(_.id == r.id),
        s"segment ${r.id} record vanished during rewrite (reclaimed as stale?)"))
      val schema = t.schema
      st.copy(segments = st.segments.map { s =>
        if (replacement.exists(_.id == s.id)) replacement.get
        else if (victims.contains(s.id) && s.isVisible)
          s.retire(SegmentStatus.MarkedForDelete)
        else if (partialVictims.contains(s.id) && s.isVisible)
          graft.engine.format.Partitions.retireFiles(s, partialVictims(s.id), schema)
        else s
      })
    } catch {
      case e: ConcurrentMutationException =>
        // the orphan replacement is unreachable; retire it for CLEAN FILES.
        // The cleanup commit itself may fail (e.g. lock timeout) — never
        // let that replace the ConcurrentMutationException, or the caller's
        // retry loop can no longer engage (the orphan stays IN_PROGRESS
        // and is reclaimed by CLEAN FILES' staleness sweep).
        try replacement.foreach(r => t.layout.commit(st => st.copy(
          segments = st.segments.map(s =>
            if (s.id == r.id) s.retire(SegmentStatus.MarkedForDelete) else s))))
        catch { case cleanup: Throwable => e.addSuppressed(cleanup) }
        throw e
    }

  /** Reserve a segment id as IN_PROGRESS (two-phase commit, like load). */
  private[engine] def reserve(t: GraftTable): Long = {
    var id = -1L
    t.layout.commit { st =>
      id = st.nextSegmentId
      st.copy(segments = st.segments :+ SegmentMeta(
        id, SegmentStatus.InProgress, "parquet", Nil, -1L, 0L, Map.empty,
        t.meta.sortColumns, System.currentTimeMillis()))
    }
    id
  }

  /** Retire a reserved/orphaned segment record (no visibility check). */
  private[engine] def retire(t: GraftTable, id: Long): Unit =
    t.layout.commit(st => st.copy(segments = st.segments.map(s =>
      if (s.id == id) s.retire(SegmentStatus.MarkedForDelete) else s)))

  /** Rewrite the affected segments with `rewrite(rows)` and swap. Returns
    * (#rows before, #rows after, #rows matching cond) over the affected
    * set. On a concurrency conflict the whole select→rewrite→swap retries
    * against the fresh tablestatus (the rewrite is deterministic, so a
    * retry is safe). */
  private def rewriteAffected(
      t: GraftTable, cond: Column, rewrite: DataFrame => DataFrame,
      preservesOrder: Boolean = false): (Long, Long, Long) = {
    var attempts = 0
    while (true) {
      try return rewriteAffectedOnce(t, cond, rewrite, preservesOrder)
      catch {
        case e: Throwable if isRetryableConflict(e) =>
          attempts += 1
          if (attempts >= 3) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** A conflict worth retrying: the optimistic-swap abort, or a victim
    * file physically removed mid-job (a concurrent retire + CLEAN FILES
    * between our selection and the rewrite's parquet read — surfaces as
    * FileNotFoundException buried in a SparkException cause chain). */
  private def isRetryableConflict(e: Throwable): Boolean = {
    var cur = e
    while (cur != null) {
      cur match {
        case _: ConcurrentMutationException => return true
        case _: java.io.FileNotFoundException => return true
        case _ => cur = cur.getCause
      }
    }
    false
  }

  /** FILE-grain copy-on-write where footer metadata allows it: only the
    * files holding matches are read, rewritten into the new segment and
    * retired from their segment's file list — a point update on a 1 GB
    * segment rewrites one file, not thirty. Segments without per-file
    * metadata (legacy/external), or with every file affected, fall back
    * to whole-segment rewrite. Returns (full victims, partial victims,
    * files to read, pre-image row count). */
  private[engine] def splitVictims(
      segs: Seq[(SegmentMeta, Seq[String])],
      affected: Map[Long, Set[String]])
      : (Set[Long], Map[Long, Seq[String]], Seq[String], Long) = {
    val byId = segs.map(p => p._1.id -> p).toMap
    var fullVictims = Set.empty[Long]
    var partialVictims = Map.empty[Long, Seq[String]]
    var readFiles = Vector.empty[String]
    var before = 0L
    affected.foreach { case (id, hitRels) =>
      val (s, abs) = byId(id)
      val rels = hitRels.toSeq.sorted
      val partialOk = s.externalPath.isEmpty &&
        rels.size < s.files.size && rels.forall(s.fileMeta.contains)
      val absOf = s.files.zip(abs).toMap
      if (partialOk) {
        partialVictims += id -> rels
        readFiles ++= rels.map(absOf)
        before += rels.map(s.fileMeta(_).rows).sum
      } else {
        fullVictims += id
        readFiles ++= abs
        before += s.rowCount
      }
    }
    (fullVictims, partialVictims, readFiles, before)
  }

  private def rewriteAffectedOnce(
      t: GraftTable, cond: Column, rewrite: DataFrame => DataFrame,
      preservesOrder: Boolean): (Long, Long, Long) = {
    val segs = visibleFiles(t)
    val affected = affectedFiles(t, segs, cond)
    if (affected.isEmpty) return (0L, 0L, 0L)

    val (fullVictims, partialVictims, readFiles, before) =
      splitVictims(segs, affected.map { case (id, m) => id -> m.keySet })
    val raw = t.spark.read.schema(t.schema).parquet(readFiles: _*)
    val rows = deltaFilter(t, segs).map(raw.filter).getOrElse(raw)
    val id = reserve(t)
    val seg =
      try SegmentWriter.write(t.layout, t.meta, rewrite(rows), id,
        preservesOrder = preservesOrder)
      catch { case e: Throwable => retire(t, id); throw e }
    Failpoints.hit("mutation.rewritten", t.path)
    swap(t, fullVictims, Some(seg.copy(origin = "rewrite")), partialVictims,
      selected = segs.map(p => p._1.id -> p._1).toMap)
    // `before` counted live rows (fileMeta/rowCount are delta-adjusted),
    // and the read above masked delta'd rows, so before-after stays the
    // matched-row delta even on delta-bearing victims
    (before, seg.rowCount, affected.values.map(_.values.sum).sum)
  }

  /** DELETE FROM t WHERE cond. Returns #rows deleted. */
  def delete(t: GraftTable, cond: Column): Long = {
    val (before, after, _) =
      rewriteAffected(t, cond, rows => rows.filter(!coalesce(cond, lit(false))),
        preservesOrder = true)
    before - after
  }

  /** INSERT OVERWRITE ... WHERE cond — the partition-overwrite
    * equivalent (reference INSERT OVERWRITE PARTITION,
    * docs/ddl-of-carbondata.md:62-67; segments subsume hive partitions
    * here, so the overwrite scope is a predicate, not a directory):
    * atomically replace every row matching `cond` with `df`. Only
    * segments containing matching rows are rewritten — survivors and the
    * new data land in one new segment, untouched segments stay as-is —
    * so overwriting one day of a 100 TB table rewrites ~that day's
    * segments. Returns #rows replaced. */
  def insertOverwriteWhere(t: GraftTable, cond: Column, df: DataFrame): Long = {
    val aligned = df.select(t.schema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    val (before, after, matched) = rewriteAffected(t, cond,
      rows => rows.filter(!coalesce(cond, lit(false))).unionByName(aligned))
    if (before == 0L && after == 0L && matched == 0L) {
      // no segment holds a matching row: the overwrite degenerates to a
      // plain append of the new data
      t.insert(aligned)
      0L
    } else matched
  }

  /** UPDATE t SET (k→expr…) WHERE cond. Returns #rows updated. The count
    * comes from the affected-segment scan (which already filters on
    * `cond`) — no separate counting pass. */
  def update(t: GraftTable, cond: Column, set: Map[String, Column]): Long = {
    val schema = t.schema
    val bad = set.keySet.filterNot(schema.fieldNames.contains)
    require(bad.isEmpty, s"unknown columns in SET: ${bad.mkString(",")}")
    val (_, _, matched) = rewriteAffected(t, cond, { rows =>
      val c = coalesce(cond, lit(false))
      rows.select(schema.fields.map { f =>
        set.get(f.name) match {
          case Some(e) => when(c, e.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }.toSeq: _*)
    }, preservesOrder = true)
    matched
  }

  // ------------------------------------------------- merge-on-read IUD
  // (reference model: immutable data files + delete-delta bitmaps,
  // docs/dml-of-carbondata.md:406-409; enabled per table via
  // `iud_mode=mor`, folded away by horizontal + segment compaction)

  /** One delta file written per affected data file, DISTRIBUTED: the
    * matched (file, row-index) pairs cluster by file, each task streams
    * its runs straight into delta files — positions never touch the
    * driver, so a delete matching a billion scattered rows writes its
    * deltas at executor parallelism. Returns (segId, dataRel) →
    * (deltaRel, count). */
  private def writeDeltaFiles(
      t: GraftTable, segs: Seq[(SegmentMeta, Seq[String])],
      positions: DataFrame): Map[(Long, String), (String, Long)] = {
    val spark = t.spark
    val byNorm = normIndex(t, segs)
    val segDirs = segs.map { case (s, _) =>
      s.id -> t.layout.segmentDir(s.id).toString
    }.toMap
    val bcIndex = spark.sparkContext.broadcast(byNorm)
    val bcDirs = spark.sparkContext.broadcast(segDirs)
    val conf = new graft.engine.source.SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    import spark.implicits._
    positions
      .repartition(col("__fp"))
      .sortWithinPartitions(col("__fp"), col("__pos"))
      .select(col("__fp").cast("string"), col("__pos").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        import org.apache.hadoop.fs.Path
        val out = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
        var curFp: String = null
        var stream: java.io.DataOutputStream = null
        var cnt = 0L
        var cur: (Long, String, String) = null // segId, dataRel, deltaRel
        def closeRun(): Unit = if (stream != null) {
          stream.close(); stream = null
          out += ((cur._1, cur._2, cur._3, cnt))
        }
        it.foreach { case (fp, pos) =>
          if (fp != curFp) {
            closeRun()
            curFp = fp
            val (segId, rel) = bcIndex.value(new Path(fp).toString)
            val deltaRel = graft.engine.format.Deltas.newRelPath(rel)
            cur = (segId, rel, deltaRel)
            cnt = 0L
            val abs = new Path(bcDirs.value(segId), deltaRel)
            val fs = abs.getFileSystem(conf.value)
            fs.mkdirs(abs.getParent)
            stream = new java.io.DataOutputStream(
              new java.io.BufferedOutputStream(fs.create(abs, true)))
            graft.engine.format.Deltas.writeHeader(stream)
          }
          stream.writeLong(pos); cnt += 1
        }
        closeRun()
        out.iterator
      }
      .collect()
      .map { case (id, rel, deltaRel, cnt) => (id, rel) -> (deltaRel, cnt) }
      .toMap
  }

  /** Best-effort removal of delta files that lost their commit race. */
  private def dropOrphanDeltas(
      t: GraftTable, written: Map[(Long, String), (String, Long)]): Unit =
    written.foreach { case ((id, _), (deltaRel, _)) =>
      try t.layout.fs.delete(
        new org.apache.hadoop.fs.Path(t.layout.segmentDir(id), deltaRel), false)
      catch { case scala.util.control.NonFatal(_) => }
    }

  /** Atomic delta publish (+ optional replacement segment, for MoR
    * UPDATE): applies every delta with exact live-count decrements,
    * retires files whose live count reaches zero, and aborts with
    * [[ConcurrentMutationException]] if any touched file changed since
    * selection (its delta list or membership) — positions were computed
    * against the selected state, so committing over a changed file
    * would double-count or resurrect rows. */
  private def commitDeltas(
      t: GraftTable, selected: Map[Long, SegmentMeta],
      written: Map[(Long, String), (String, Long)],
      replacement: Option[SegmentMeta] = None): Unit = {
    val bySeg = written.groupBy(_._1._1)
    val schema = t.schema
    // 8-byte header + 8 bytes per masked position (Deltas format)
    OpMetrics.addDeltaWrite(written.valuesIterator.map(8L + 8L * _._2).sum)
    Failpoints.hit("mor.deltaWritten", t.path)
    try t.layout.commit { st =>
      replacement.foreach(r => require(st.segments.exists(_.id == r.id),
        s"segment ${r.id} record vanished during MoR update"))
      st.copy(segments = st.segments.map { s =>
        if (replacement.exists(_.id == s.id)) replacement.get
        else bySeg.get(s.id) match {
          case None => s
          case Some(group) =>
            if (!s.isVisible) throw new ConcurrentMutationException(
              s"segment ${s.id} was retired concurrently")
            val sel = selected(s.id)
            var cur = s
            group.foreach { case ((_, rel), (deltaRel, cnt)) =>
              if (!cur.files.contains(rel) || !cur.fileMeta.contains(rel) ||
                  cur.deltas.getOrElse(rel, Nil) != sel.deltas.getOrElse(rel, Nil))
                throw new ConcurrentMutationException(
                  s"file $rel of segment ${s.id} changed during MoR commit")
              cur = graft.engine.format.Deltas.applyToSegment(cur, rel, deltaRel, cnt)
            }
            // files with no live rows left retire outright
            val empty = group.keys.map(_._2)
              .filter(r => cur.fileMeta.get(r).exists(_.rows <= 0)).toSeq
            if (empty.nonEmpty)
              cur = graft.engine.format.Partitions.retireFiles(cur, empty, schema)
            cur
        }
      })
    } catch {
      case e: ConcurrentMutationException =>
        dropOrphanDeltas(t, written)
        try replacement.foreach(r => retire(t, r.id))
        catch { case cleanup: Throwable => e.addSuppressed(cleanup) }
        throw e
    }
  }

  /** Merge-on-read DELETE: writes per-file position deltas instead of
    * rewriting data files. Falls back to copy-on-write when a hit file
    * can't carry deltas (external segment / missing footer metadata).
    * Returns #rows deleted. */
  def deleteMor(t: GraftTable, cond: Column): Long =
    retryingMor(t) { deleteMorOnce(t, cond) }

  /** Merge-on-read UPDATE: position deltas mask the pre-images, updated
    * rows land in one new sorted segment — both published in a single
    * atomic commit. Returns #rows updated. */
  def updateMor(t: GraftTable, cond: Column, set: Map[String, Column]): Long = {
    val bad = set.keySet.filterNot(t.schema.fieldNames.contains)
    require(bad.isEmpty, s"unknown columns in SET: ${bad.mkString(",")}")
    retryingMor(t) { updateMorOnce(t, cond, set) }
  }

  private def retryingMor(t: GraftTable)(body: => Long): Long = {
    var attempts = 0
    while (true) {
      try return body
      catch {
        case e: Throwable if isRetryableConflict(e) =>
          attempts += 1
          if (attempts >= 3) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Live matched positions as (__fp, __pos), existing deltas applied
    * (already-deleted rows never re-match, so new deltas stay disjoint).
    * The match scan runs over the stats-pruned candidate files only. */
  private def matchedPositions(
      t: GraftTable, segs0: Seq[(SegmentMeta, Seq[String])], cond: Column): DataFrame = {
    val segs = pruneCandidates(t, segs0, cond)
    if (segs.isEmpty || segs.flatMap(_._2).isEmpty)
      return t.spark.emptyDataFrame
        .select(lit("").as("__fp"), lit(0L).as("__pos")).limit(0)
    val raw = t.spark.read.schema(t.schema).parquet(segs.flatMap(_._2): _*)
    deltaFilter(t, segs).map(raw.filter).getOrElse(raw)
      .filter(cond)
      .select(col("_metadata.file_path").as("__fp"),
        col("_metadata.row_index").as("__pos"))
  }

  /** Hit files that cannot carry deltas → the whole op falls back to
    * copy-on-write (external segments' files live outside the managed
    * layout; files without footer metadata can't keep live counts). */
  private def morIneligible(
      byId: Map[Long, SegmentMeta],
      written: Map[(Long, String), (String, Long)]): Boolean =
    written.exists { case ((id, rel), _) =>
      val s = byId(id)
      s.externalPath.nonEmpty || !s.fileMeta.contains(rel)
    }

  private def deleteMorOnce(t: GraftTable, cond: Column): Long = {
    val segs = visibleFiles(t)
    if (segs.isEmpty || segs.flatMap(_._2).isEmpty) return 0L
    val written = writeDeltaFiles(t, segs, matchedPositions(t, segs, cond))
    if (written.isEmpty) return 0L
    val byId = segs.map(p => p._1.id -> p._1).toMap
    if (morIneligible(byId, written)) {
      dropOrphanDeltas(t, written)
      return delete(t, cond) // copy-on-write fallback
    }
    commitDeltas(t, byId, written)
    t.maybeHorizontalCompact()
    written.values.map(_._2).sum
  }

  private def updateMorOnce(
      t: GraftTable, cond: Column, set: Map[String, Column]): Long = {
    val schema = t.schema
    val segs = visibleFiles(t)
    if (segs.isEmpty || segs.flatMap(_._2).isEmpty) return 0L
    val spark = t.spark
    val cands = pruneCandidates(t, segs, cond)
    if (cands.isEmpty || cands.flatMap(_._2).isEmpty) return 0L
    val raw = spark.read.schema(schema).parquet(cands.flatMap(_._2): _*)
    val matched = deltaFilter(t, cands).map(raw.filter).getOrElse(raw)
      .filter(cond)
      .select((schema.fieldNames.map(col).toSeq :+
        col("_metadata.file_path").as("__fp") :+
        col("_metadata.row_index").as("__pos")): _*)
      .persist()
    try {
      val written = writeDeltaFiles(t, segs, matched.select(col("__fp"), col("__pos")))
      if (written.isEmpty) return 0L
      val byId = segs.map(p => p._1.id -> p._1).toMap
      if (morIneligible(byId, written)) {
        dropOrphanDeltas(t, written)
        return update(t, cond, set) // copy-on-write fallback
      }
      val updated = matched.select(schema.fields.map { f =>
        set.get(f.name).map(_.cast(f.dataType).as(f.name)).getOrElse(col(f.name))
      }.toSeq: _*)
      val id = reserve(t)
      val seg =
        // `updated` is narrow over the persisted victim scan — each
        // cached partition is a sorted run, so the rewrite segment can
        // skip the range re-shuffle
        try SegmentWriter.write(t.layout, t.meta, updated, id,
          preservesOrder = true)
        catch { case e: Throwable =>
          retire(t, id); dropOrphanDeltas(t, written); throw e }
      commitDeltas(t, byId, written, replacement = Some(seg.copy(origin = "rewrite")))
      t.maybeHorizontalCompact()
      written.values.map(_._2).sum
    } finally matched.unpersist()
  }
}

// ---------------------------------------------------------------- MERGE

sealed private[engine] trait MergeAction
private[engine] case class UpdateAction(cond: Option[Column], set: Map[String, Column], all: Boolean) extends MergeAction
private[engine] case class DeleteAction(cond: Option[Column]) extends MergeAction
private[engine] case class InsertAction(cond: Option[Column], values: Map[String, Column], all: Boolean) extends MergeAction

/** `target.merge(source, cond).whenMatched(...).whenNotMatched(...)
  * .whenNotMatchedAndExistsOnlyOnTarget(...).execute()` — the reference's
  * Dataset merge builder (MergeDataSetBuilder.scala:39-96, actions
  * interfaces.scala:62-87) on copy-on-write segments.
  *
  * In action expressions, reference target columns as `t.<col>` and
  * source columns as `s.<col>`.
  */
class MergeBuilder private[engine] (
    target: GraftTable, source: DataFrame, condition: Column) {

  private var matched = Vector.empty[MergeAction]
  private var notMatched = Vector.empty[InsertAction]
  private var onlyTarget = Vector.empty[MergeAction]
  private var pendingKind = 0 // 1=matched 2=notMatched 3=onlyTarget
  private var pendingCond: Option[Column] = None
  private var history: Option[(GraftTable, Long)] = None

  /** SCD2: before rows are updated/deleted, their previous versions are
    * appended to `historyTable` with `__op` and `__merge_ts` columns
    * (reference InsertInHistoryTableAction / HistoryTableLoadHelper).
    * `historyTable` schema = target schema + __op string + __merge_ts
    * long. `ts` is caller-supplied for determinism. */
  def withHistory(historyTable: GraftTable, ts: Long): MergeBuilder = {
    history = Some((historyTable, ts)); this
  }

  def whenMatched(cond: Column = null): MergeBuilder = {
    pendingKind = 1; pendingCond = Option(cond); this
  }
  def whenNotMatched(cond: Column = null): MergeBuilder = {
    pendingKind = 2; pendingCond = Option(cond); this
  }
  def whenNotMatchedAndExistsOnlyOnTarget(cond: Column = null): MergeBuilder = {
    pendingKind = 3; pendingCond = Option(cond); this
  }

  def updateExpr(set: Map[String, Column]): MergeBuilder = add(UpdateAction(pendingCond, set, all = false))
  def updateAll(): MergeBuilder = add(UpdateAction(pendingCond, Map.empty, all = true))
  def delete(): MergeBuilder = add(DeleteAction(pendingCond))
  def insertExpr(values: Map[String, Column]): MergeBuilder = add(InsertAction(pendingCond, values, all = false))
  def insertAll(): MergeBuilder = add(InsertAction(pendingCond, Map.empty, all = true))

  private def add(a: MergeAction): MergeBuilder = {
    pendingKind match {
      case 1 => matched :+= a
      case 2 => a match {
        case i: InsertAction => notMatched :+= i
        case _ => throw new IllegalArgumentException("whenNotMatched supports INSERT only")
      }
      case 3 => onlyTarget :+= a
      case _ => throw new IllegalStateException("call whenMatched/whenNotMatched first")
    }
    pendingKind = 0; pendingCond = None
    this
  }

  /** Run the merge. Returns the new segment id (None = no-op). Surfaces
    * [[ConcurrentMutationException]] if a concurrent writer retired an
    * affected segment mid-merge (re-running a merge is not guaranteed
    * side-effect-free, so no automatic retry here). */
  def execute(): Option[Long] = {
    val spark = target.spark
    val schema = target.schema
    // visibleFiles applies the open-streaming-segment and non-parquet
    // guards — merge must not retire a segment a stream is appending to
    val segs = Mutation.visibleFiles(target)
    if (segs.isEmpty && notMatched.isEmpty) return None

    // Scope of rewrite: the FILES with matched rows (file-grain, like
    // update/delete) — unless an exists-only-on-target action must see
    // every target row, which forces whole-table scope.
    val allFiles = segs.flatMap(_._2)
    val affected: Map[Long, Set[String]] =
      if (onlyTarget.nonEmpty) segs.map(p => p._1.id -> p._1.files.toSet).toMap
      else if (allFiles.isEmpty) Map.empty
      else {
        val raw0 = spark.read.schema(schema).parquet(allFiles: _*)
        val live0 = Mutation.deltaFilter(target, segs).map(raw0.filter).getOrElse(raw0)
        val tgt = live0
          .select((schema.fieldNames.map(col).toSeq :+ col("_metadata.file_path").as("__fp")): _*)
          .as("t")
        val hit = tgt.join(source.as("s"), condition)
          .select(col("__fp")).distinct().collect().map(_.getString(0)).toSet
        val byNorm = Mutation.normIndex(target, segs)
        hit.toSeq.map(Mutation.resolveHit(byNorm, _))
          .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
      }

    val (fullVictims, partialVictims, readFiles, _) = Mutation.splitVictims(segs, affected)
    val tgtRows =
      if (readFiles.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else {
        val raw = spark.read.schema(schema).parquet(readFiles: _*)
        Mutation.deltaFilter(target, segs).map(raw.filter).getOrElse(raw)
      }

    // full-outer join with presence markers (reference plans the same
    // shape, CarbonMergeDataSetCommand.scala:66)
    val t0 = tgtRows.withColumn("__t", lit(1)).as("t")
    val s0 = source.withColumn("__s", lit(1)).as("s")
    val joined = t0.join(s0, condition, "full_outer")
    val isMatched = col("__t").isNotNull && col("__s").isNotNull
    val srcOnly = col("__t").isNull && col("__s").isNotNull
    val tgtOnly = col("__t").isNotNull && col("__s").isNull

    def caseNo(base: Column, actions: Seq[(MergeAction, Int)]): Column =
      actions.foldRight(lit(0)) { case ((a, i), els) =>
        val c = a match {
          case UpdateAction(cnd, _, _) => cnd
          case DeleteAction(cnd) => cnd
          case InsertAction(cnd, _, _) => cnd
        }
        when(base && c.map(coalesce(_, lit(false))).getOrElse(lit(true)), lit(i)).otherwise(els)
      }

    val mAct = caseNo(isMatched, matched.zipWithIndex.map { case (a, i) => (a, i + 1) })
    val nAct = caseNo(srcOnly, notMatched.zipWithIndex.map { case (a, i) => (a, i + 101) })
    val oAct = caseNo(tgtOnly, onlyTarget.zipWithIndex.map { case (a, i) => (a, i + 201) })
    val act = mAct + nAct + oAct // regions are mutually exclusive

    // per-(action, field) output expression for the single-projection plan
    def fieldExpr(a: MergeAction, f: org.apache.spark.sql.types.StructField): Column = a match {
      case UpdateAction(_, set, all) =>
        if (all) col(s"s.${f.name}").cast(f.dataType)
        else set.get(f.name).map(_.cast(f.dataType)).getOrElse(col(s"t.${f.name}"))
      case InsertAction(_, values, all) =>
        if (all) col(s"s.${f.name}").cast(f.dataType)
        else values.get(f.name).map(_.cast(f.dataType)).getOrElse(lit(null).cast(f.dataType))
      case DeleteAction(_) => lit(null).cast(f.dataType) // never emitted
    }

    val withAct = joined.withColumn("__act", act)
    // history needs a second pass over the join — cache it for that case
    // so the target-scan + source-scan + join run once, not twice. The
    // try/finally spans the history insert too: a failure there must
    // not leak the cached join
    if (history.nonEmpty) withAct.persist()
    try {

    // SCD2 history: archive the pre-image of updated/deleted target rows
    history.foreach { case (h, ts) =>
      val ops = matched.zipWithIndex.collect {
        case (_: UpdateAction, i) => (i + 1, "UPDATE")
        case (DeleteAction(_), i) => (i + 1, "DELETE")
      } ++ onlyTarget.zipWithIndex.collect {
        case (_: UpdateAction, i) => (i + 201, "UPDATE")
        case (DeleteAction(_), i) => (i + 201, "DELETE")
      }
      if (ops.nonEmpty) {
        val opCol = ops.foldLeft(lit(null).cast("string")) {
          case (acc, (i, op)) => when(col("__act") === i, op).otherwise(acc)
        }
        h.insert(withAct
          .filter(col("__act").isin(ops.map(_._1): _*))
          .select((schema.fields.map(f => col(s"t.${f.name}").as(f.name)).toSeq :+
            opCol.as("__op") :+ lit(ts).as("__merge_ts")): _*))
      }
    }
    // Single-projection plan: every input row emits at most one output
    // row, so one filter + one per-column `when` chain replaces the old
    // one-union-branch-per-action shape (which re-executed the join once
    // per action). Non-emitting rows: delete-action hits, and act-0
    // source-only rows (unmatched source with no insert clause).
    val emitting: Seq[(Int, MergeAction)] =
      matched.zipWithIndex.collect { case (a: UpdateAction, i) => (i + 1, a: MergeAction) } ++
      notMatched.zipWithIndex.map { case (a, i) => (i + 101, a: MergeAction) } ++
      onlyTarget.zipWithIndex.collect { case (a: UpdateAction, i) => (i + 201, a: MergeAction) }
    val keep = emitting.foldLeft(col("__act") === 0 && col("__t").isNotNull) {
      case (acc, (i, _)) => acc || col("__act") === i
    }
    val outCols = schema.fields.map { f =>
      emitting.foldRight(col(s"t.${f.name}")) { case ((i, a), els) =>
        when(col("__act") === i, fieldExpr(a, f)).otherwise(els)
      }.as(f.name)
    }
    val merged = withAct.filter(keep).select(outCols.toSeq: _*)

    val id = Mutation.reserve(target)
    val seg =
      try SegmentWriter.write(target.layout, target.meta, merged, id)
      catch { case e: Throwable => Mutation.retire(target, id); throw e }
    // swap enforces victim visibility under the lock: a concurrent
    // update/delete/compaction that retired an affected segment (or
    // rewrote an affected FILE) mid-merge aborts the publish (and
    // retires this orphan) instead of silently resurrecting the
    // victim's pre-image rows
    Mutation.swap(target, fullVictims, Some(seg.copy(origin = "rewrite")), partialVictims,
      selected = segs.map(p => p._1.id -> p._1).toMap)
    Some(id)

    } finally if (history.nonEmpty) withAct.unpersist()
  }
}
