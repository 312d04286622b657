package graft.engine.index

import graft.engine.GraftTable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Term-posting text index (the reference's lucene fine-grain index,
  * LuceneFineGrainIndex.java:63, collapsed to segment grain like the
  * rest of the pruning ladder).
  *
  * The index is a carbonish table (term, seg_id) holding the distinct
  * whole tokens per segment, sorted by term so lookups prune via
  * segment stats. `readMatching` evaluates a text query of
  * OR-separated clauses of AND-terms: each clause's candidate segments
  * are the intersection of its terms' posting sets; the union over
  * clauses bounds the scan, and an exact token-membership residual
  * filter runs on the survivors.
  *
  * Semantics note: like lucene, this matches whole TOKENS —
  * `GraftFunctions.textMatch` (substring contains) is the unindexed
  * row-level variant.
  */
object TextIndex {

  private def key(column: String) = s"textindex.$column"

  private def tokensOf(c: Column): Column =
    array_distinct(split(lower(trim(c)), " "))

  private def postings(t: GraftTable, column: String,
      segments: Option[Seq[graft.engine.format.SegmentMeta]] = None): DataFrame = {
    val files = segments.getOrElse(t.status.visible).flatMap(t.layout.segmentFilePaths)
    val segId = regexp_extract(col("_metadata.file_path"), "/segments/([0-9]+)/", 1)
      .cast("long")
    t.spark.read.schema(t.schema).parquet(files.toSeq: _*)
      .select(explode(tokensOf(col(column))).as("term"), segId.as("seg_id"))
      .distinct()
  }

  /** CREATE INDEX … AS 'lucene'-analog on a text column. */
  def create(t: GraftTable, column: String, path: String): GraftTable = {
    require(t.schema.fieldNames.contains(column), s"no such column $column")
    val snapshot = t.status.visible.map(_.id).toSet
    GraftTable.drop(t.spark, path)
    val idx = GraftTable.createAsSelect(t.spark, path, postings(t, column),
      sortColumns = Seq("term"))
    Si.recordIndexedSegments(idx, snapshot)
    t.layout.updateTableMeta(m => m.copy(
      properties = m.properties + (key(column) -> path)))
    idx
  }

  def refresh(t: GraftTable, column: String): Unit = {
    val p = t.meta.properties.getOrElse(key(column),
      throw new IllegalArgumentException(s"no text index on $column"))
    val snapshot = t.status.visible.map(_.id).toSet
    val idx = GraftTable.at(t.spark, p)
    idx.insert(postings(t, column), overwrite = true)
    Si.recordIndexedSegments(idx, snapshot)
  }

  /** REINDEX analog of [[Si.repair]]: append postings for segments the
    * coverage ledger is missing (optionally restricted to `segIds`) —
    * incremental, reads only the new segments. */
  def repair(t: GraftTable, column: String, segIds: Option[Seq[Long]] = None): Unit = {
    val p = t.meta.properties.getOrElse(key(column),
      throw new IllegalArgumentException(s"no text index on $column"))
    val idx = GraftTable.at(t.spark, p)
    val covered = Si.indexedSegments(idx)
    val visible = t.status.visible
    val want = segIds.map(_.toSet).getOrElse(visible.map(_.id).toSet)
    val missing = visible.filter(s => want.contains(s.id) && !covered.contains(s.id))
    if (missing.nonEmpty) {
      idx.insert(postings(t, column, Some(missing)))
      Si.recordIndexedSegments(idx, covered ++ missing.map(_.id))
    }
  }

  def drop(t: GraftTable, column: String): Unit = {
    t.meta.properties.get(key(column)).foreach(p => GraftTable.drop(t.spark, p))
    t.layout.writeTableMeta(t.meta.copy(properties = t.meta.properties - key(column)))
  }

  /** Token-membership residual predicate matching the index semantics:
    * whole tokens for bare terms, token-prefix for `p*` wildcards,
    * whole-token sequence (space-padded containment over the
    * single-space corpus) for `"quoted phrases"`, `NOT` negation. */
  def tokenMatch(c: Column, query: String): Column = {
    import graft.functions.GraftFunctions.{TextTerm, parseLucene}
    val toks = tokensOf(c)
    def one(t: TextTerm): Column = t match {
      case TextTerm.Tok(s) => array_contains(toks, s)
      case TextTerm.Prefix(p) => exists(toks, _.startsWith(p))
      case TextTerm.Phrase(ws) =>
        concat(lit(" "), lower(trim(c)), lit(" "))
          .contains(" " + ws.mkString(" ") + " ")
    }
    parseLucene(query)
      .map(_.map(l => if (l.negated) !one(l.term) else one(l.term)).reduce(_ && _))
      .reduce(_ || _)
  }

  /** Candidate segment ids for a text query, from the posting index.
    * None = no index on the column (caller falls back to a full scan).
    * Segments outside the index's coverage ledger (inserted/compacted
    * since the last refresh) are ALWAYS candidates — the index can only
    * prune within the segments it has seen; retired seg_ids drop out
    * via the visibility intersection. */
  /** SQL-rule entry: candidate segments, None = no index on column. */
  private[index] def candidates(
      t: GraftTable, column: String, query: String): Option[Set[Long]] =
    candidateSegments(t, column, query)

  private def candidateSegments(
      t: GraftTable, column: String, query: String): Option[Set[Long]] = {
    import graft.functions.GraftFunctions.{TextTerm, parseLucene}
    val clauses = parseLucene(query)
    t.meta.properties.get(key(column)).map { p =>
      val idx = GraftTable.at(t.spark, p)
      val visible = t.status.visible.map(_.id).toSet
      val uncovered = visible -- Si.indexedSegments(idx)
      // one index read serves every positive literal: exact terms by
      // IN-list, wildcards by prefix predicate — the index is sorted by
      // term, so both prune via segment min/max stats
      val positives = clauses.flatten.filterNot(_.negated).map(_.term)
      val exact = positives.flatMap {
        case TextTerm.Tok(s) => Seq(s)
        case TextTerm.Phrase(ws) => ws
        case _ => Nil
      }.distinct
      val prefixes = positives.collect { case TextTerm.Prefix(p) => p }.distinct
      val preds = (if (exact.nonEmpty) Seq(col("term").isin(exact: _*)) else Nil) ++
        prefixes.map(p => col("term").startsWith(p))
      val rows: Seq[(String, Long)] =
        if (preds.isEmpty) Nil
        else idx.read.filter(preds.reduce(_ || _))
          .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
      val byTerm: Map[String, Set[Long]] =
        rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      def postings(term: TextTerm): Set[Long] = term match {
        case TextTerm.Tok(s) => byTerm.getOrElse(s, Set.empty)
        // phrase: every word must appear in the segment (necessary
        // condition; word order is the residual's job)
        case TextTerm.Phrase(ws) =>
          ws.map(w => byTerm.getOrElse(w, Set.empty[Long])).reduce(_ intersect _)
        case TextTerm.Prefix(p) =>
          rows.collect { case (tm, sid) if tm.startsWith(p) => sid }.toSet
      }
      val hits = clauses.map { lits =>
        // negated literals can never EXCLUDE a segment (other rows in it
        // may lack the term) — only positive literals prune
        val pos = lits.filterNot(_.negated)
        if (pos.isEmpty) visible
        else pos.map(l => postings(l.term)).reduce(_ intersect _)
      }.reduce(_ union _)
      (hits & visible) ++ uncovered
    }
  }

  /** text_match-accelerated read: consult the posting index for the
    * candidate segment set, scan only those, apply the exact residual.
    * Falls back to a full filtered read without an index. */
  def readMatching(t: GraftTable, column: String, query: String): DataFrame =
    candidateSegments(t, column, query) match {
      case None => t.read.filter(tokenMatch(col(column), query))
      case Some(candidates) =>
        if (candidates.isEmpty)
          t.read.filter(tokenMatch(col(column), query)).limit(0)
        else t.readSegments(candidates.toSeq.sorted)
          .filter(tokenMatch(col(column), query))
    }

  /** text_match_with_limit (reference MatchExpression limit,
    * TEXT_MATCH('term', N)): the cap is applied at the INDEX layer —
    * candidate segments are consumed in id order, small groups at a
    * time, and scanning STOPS once `limit` matches are in hand, so a
    * selective query over a 100 TB table reads the first candidate
    * segment group, not every candidate. The collected rows are bounded
    * by `limit` (the reference's search-cap contract — results are
    * driver-sized by definition). */
  def readMatchingWithLimit(
      t: GraftTable, column: String, query: String, limit: Int,
      segmentsPerProbe: Int = 4): DataFrame = {
    require(limit > 0, "limit must be positive")
    val residual = tokenMatch(col(column), query)
    candidateSegments(t, column, query) match {
      case None => t.read.filter(residual).limit(limit)
      case Some(candidates) if candidates.isEmpty =>
        t.read.filter(residual).limit(0)
      case Some(candidates) =>
        val sorted = candidates.toSeq.sorted
        val rows = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        var i = 0
        while (i < sorted.size && rows.size < limit) {
          val probe = sorted.slice(i, i + segmentsPerProbe)
          rows ++= t.readSegments(probe).filter(residual)
            .limit(limit - rows.size).collect()
          i += segmentsPerProbe
        }
        t.spark.createDataFrame(
          t.spark.sparkContext.parallelize(rows.toIndexedSeq, 1), t.schema)
    }
  }
}
