package graft.engine

import graft.engine.format.{SegmentMeta, SegmentStatus, SegmentWriter}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * 100 TB table rewrites ~1 segment, not the table.
  */
/** Thrown when a concurrent writer retired a copy-on-write victim between
  * selection and commit; update/delete retry transparently, merge and
  * compaction surface it (their re-run is not side-effect-free). */
class ConcurrentMutationException(msg: String) extends RuntimeException(msg)

object Mutation {

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

  /** Which visible segments contain rows matching `cond`? One Spark job
    * over (pruned) candidate files; returns matched segment ids. */
  private def affectedSegments(
      t: GraftTable, segs: Seq[(SegmentMeta, Seq[String])], cond: Column): Set[Long] = {
    if (segs.isEmpty) return Set.empty
    val spark = t.spark
    val files = segs.flatMap(_._2)
    val hit = spark.read.parquet(files: _*)
      .filter(cond)
      .select(col("_metadata.file_path").as("fp"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    // _metadata.file_path is file:///-qualified; match on suffix
    segs.filter { case (_, fs) =>
      fs.exists(f => hit.exists(h => h.endsWith(f) || f.endsWith(h)))
    }.map(_._1.id).toSet
  }

  /** Atomic swap: retire `victims`, publish `replacement`. Optimistic
    * concurrency: inside the commit (under the table lock) every victim
    * must still be visible — if a concurrent mutation/compaction retired
    * one, publishing our replacement would resurrect its pre-image rows,
    * so the swap aborts with [[ConcurrentMutationException]] instead. */
  private[engine] def swap(
      t: GraftTable, victims: Set[Long], replacement: Option[SegmentMeta]): Unit =
    try t.layout.commit { st =>
      val vis = st.segments.filter(_.isVisible).map(_.id).toSet
      val lost = victims -- vis
      if (lost.nonEmpty) throw new ConcurrentMutationException(
        s"segments ${lost.toSeq.sorted.mkString(",")} were retired concurrently")
      st.copy(segments = st.segments.map { s =>
        if (replacement.exists(_.id == s.id)) replacement.get
        else if (victims.contains(s.id) && s.isVisible)
          s.copy(status = SegmentStatus.MarkedForDelete)
        else s
      })
    } catch {
      case e: ConcurrentMutationException =>
        // the orphan replacement is unreachable; retire it for CLEAN FILES
        replacement.foreach(r => t.layout.commit(st => st.copy(
          segments = st.segments.map(s =>
            if (s.id == r.id) s.copy(status = SegmentStatus.MarkedForDelete) else s))))
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
  private def retire(t: GraftTable, id: Long): Unit =
    t.layout.commit(st => st.copy(segments = st.segments.map(s =>
      if (s.id == id) s.copy(status = SegmentStatus.MarkedForDelete) else s)))

  /** Rewrite the affected segments with `rewrite(rows)` and swap. Returns
    * (#rows before, #rows after) over the affected set. On a concurrency
    * conflict the whole select→rewrite→swap retries against the fresh
    * tablestatus (the rewrite is deterministic, so a retry is safe). */
  private def rewriteAffected(
      t: GraftTable, cond: Column, rewrite: DataFrame => DataFrame): (Long, Long) = {
    var attempts = 0
    while (true) {
      try return rewriteAffectedOnce(t, cond, rewrite)
      catch {
        case e: ConcurrentMutationException =>
          attempts += 1
          if (attempts >= 3) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def rewriteAffectedOnce(
      t: GraftTable, cond: Column, rewrite: DataFrame => DataFrame): (Long, Long) = {
    val segs = visibleFiles(t)
    val affected = affectedSegments(t, segs, cond)
    if (affected.isEmpty) return (0L, 0L)
    val victimFiles = segs.filter(p => affected.contains(p._1.id)).flatMap(_._2)
    val before = segs.filter(p => affected.contains(p._1.id)).map(_._1.rowCount).sum
    val rows = t.spark.read.schema(t.schema).parquet(victimFiles: _*)
    val id = reserve(t)
    val seg =
      try SegmentWriter.write(t.layout, t.meta, rewrite(rows), id)
      catch { case e: Throwable => retire(t, id); throw e }
    swap(t, affected, Some(seg))
    (before, seg.rowCount)
  }

  /** DELETE FROM t WHERE cond. Returns #rows deleted. */
  def delete(t: GraftTable, cond: Column): Long = {
    val (before, after) =
      rewriteAffected(t, cond, rows => rows.filter(!coalesce(cond, lit(false))))
    before - after
  }

  /** UPDATE t SET (k→expr…) WHERE cond. Returns #rows updated. The count
    * rides the rewrite job via observe() — no separate counting scan
    * (same trick as the write-path stats, SegmentWriter.scala:44-53). */
  def update(t: GraftTable, cond: Column, set: Map[String, Column]): Long = {
    val schema = t.schema
    val bad = set.keySet.filterNot(schema.fieldNames.contains)
    require(bad.isEmpty, s"unknown columns in SET: ${bad.mkString(",")}")
    // fresh Observation per attempt: one Observation binds to one Dataset
    var obs: org.apache.spark.sql.Observation = null
    val (before, _) = rewriteAffected(t, cond, { rows =>
      val c = coalesce(cond, lit(false))
      obs = org.apache.spark.sql.Observation()
      rows.observe(obs, sum(when(c, 1L).otherwise(0L)).as("updated"))
        .select(schema.fields.map { f =>
          set.get(f.name) match {
            case Some(e) => when(c, e.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
            case None => col(f.name)
          }
        }.toSeq: _*)
    })
    if (before == 0L) 0L
    else Option(obs.get("updated")).map(_.asInstanceOf[Long]).getOrElse(0L)
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

  /** Run the merge. Returns the new segment id (None = no-op). */
  def execute(): Option[Long] = {
    val spark = target.spark
    val schema = target.schema
    val segs = target.status.visible.map(s => s -> target.layout.segmentFilePaths(s))
    if (segs.isEmpty && notMatched.isEmpty) return None

    // Scope of rewrite: segments with matched rows — unless an
    // exists-only-on-target action must see every target row.
    val allFiles = segs.flatMap(_._2)
    val affectedIds: Set[Long] =
      if (onlyTarget.nonEmpty) segs.map(_._1.id).toSet
      else if (allFiles.isEmpty) Set.empty
      else {
        val tgt = spark.read.parquet(allFiles: _*)
          .select((schema.fieldNames.map(col).toSeq :+ col("_metadata.file_path").as("__fp")): _*)
          .as("t")
        val hit = tgt.join(source.as("s"), condition)
          .select(col("__fp")).distinct().collect().map(_.getString(0)).toSet
        segs.filter { case (_, fs) =>
          fs.exists(f => hit.exists(h => h.endsWith(f) || f.endsWith(h)))
        }.map(_._1.id).toSet
      }

    val victimFiles = segs.filter(p => affectedIds.contains(p._1.id)).flatMap(_._2)
    val tgtRows =
      if (victimFiles.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(victimFiles: _*)

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

    def project(a: MergeAction): Seq[Column] = a match {
      case UpdateAction(_, set, all) => schema.fields.map { f =>
        if (all) col(s"s.${f.name}").cast(f.dataType).as(f.name)
        else set.get(f.name).map(_.cast(f.dataType).as(f.name))
          .getOrElse(col(s"t.${f.name}").as(f.name))
      }.toSeq
      case InsertAction(_, values, all) => schema.fields.map { f =>
        if (all) col(s"s.${f.name}").cast(f.dataType).as(f.name)
        else values.get(f.name).map(_.cast(f.dataType).as(f.name))
          .getOrElse(lit(null).cast(f.dataType).as(f.name))
      }.toSeq
      case DeleteAction(_) => Seq.empty
    }
    val keepTarget: Seq[Column] = schema.fields.map(f => col(s"t.${f.name}").as(f.name)).toSeq

    val withAct = joined.withColumn("__act", act)

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
    val pieces: Seq[DataFrame] =
      // untouched target rows of affected segments (act 0, target present)
      Seq(withAct.filter(col("__act") === 0 && col("__t").isNotNull).select(keepTarget: _*)) ++
      (matched.zipWithIndex.collect { case (a: UpdateAction, i) =>
        withAct.filter(col("__act") === (i + 1)).select(project(a): _*)
      }) ++
      (notMatched.zipWithIndex.map { case (a, i) =>
        withAct.filter(col("__act") === (i + 101)).select(project(a): _*)
      }) ++
      (onlyTarget.zipWithIndex.collect { case (a: UpdateAction, i) =>
        withAct.filter(col("__act") === (i + 201)).select(project(a): _*)
      })
    // DeleteAction rows are simply not emitted.
    val merged = pieces.reduce(_ union _)

    var id = -1L
    target.layout.commit { st =>
      id = st.nextSegmentId
      st.copy(segments = st.segments :+ SegmentMeta(
        id, SegmentStatus.InProgress, "parquet", Nil, -1L, 0L, Map.empty,
        target.meta.sortColumns, System.currentTimeMillis()))
    }
    val seg = SegmentWriter.write(target.layout, target.meta, merged, id)
    target.layout.commit { st =>
      st.copy(segments = st.segments.map { s =>
        if (s.id == id) seg
        else if (affectedIds.contains(s.id) && s.isVisible)
          s.copy(status = SegmentStatus.MarkedForDelete)
        else s
      })
    }
    Some(id)
  }
}
