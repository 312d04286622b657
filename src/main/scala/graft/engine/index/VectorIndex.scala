package graft.engine.index

import graft.engine.{ExplainCollector, GraftTable}
import graft.ops.Ann
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-integrated vector (similarity-search) index: IVF-PQ artifacts
  * stored and maintained like the engine's other indexes.
  *
  * The reference has no vector index — this extends its index DDL
  * family (CREATE INDEX … AS 'carbondata'/'lucene'/'bloomfilter',
  * CarbonCreateIndexCommand.scala:49) with the similarity-search
  * machinery a training-data pipeline needs as a FIRST-CLASS index
  * kind: `CREATE INDEX v ON TABLE t (id_col, vec_col) AS 'vector'`.
  *
  * Spark-first shape, mirroring [[Si]]:
  *   - the index is itself a carbonish table at the index path holding
  *     `(seg_id, id, qv, nq, cell, codes)` — the [[Ann.pqEncodeCorpus]]
  *     stored-at-ingest form plus the base segment id — sorted by
  *     `cell`, so a pruned probe's `cell` equi-join scans only the
  *     probed cells' segments/row-groups (min-max skip does the rest);
  *   - the coarse quantizer + PQ codebooks are trained ONCE at CREATE
  *     (standard IVF practice) and frozen in a small text model file —
  *     loads/compactions ENCODE with the frozen model, never retrain;
  *   - coverage is a per-segment `(id → live rowCount)` fingerprint
  *     ledger (the MV staleness gate, not the SI id-only ledger): the
  *     index stores ROWS, so a segment whose live count drifted
  *     (merge-on-read delete) must not be served from the index — its
  *     rows fall back to an exact scan, and results stay correct while
  *     REINDEX catches the ledger up;
  *   - search = IVF-PQ ADC probe + bounded exact rerank over covered
  *     segments, UNION an exact brute-force over uncovered/stale
  *     segments (delta-aware reads), deduped per (query, neighbor) and
  *     re-ranked — so freshly-loaded rows are searchable immediately
  *     and a full probe + full rerank is EXACTLY brute force (the
  *     oracle row's check).
  *
  * 100 TB notes: the index adds ~(vector + M bytes) per row — the
  * IVFFlat trade (self-contained rerank, no random-access fetch into
  * the base table; the rerank pool joins against the index by id).
  * Stale-covered segments degrade to exact scans of THOSE segments
  * only. Dead rows of retired segments stay in the index until REFRESH
  * rewrites it (they are excluded by the visibility filter at search).
  */
object VectorIndex {

  /** IVF-PQ geometry. `dim` must match the vector column; `nlist`
    * cells, `m` PQ blocks of `ksub` codewords each. */
  case class Params(dim: Int, nlist: Int = 8, m: Int = 8, ksub: Int = 16,
      iters: Int = 2)

  private[engine] def regKey(column: String) = s"vector.$column"
  private val FingerprintsKey = "vector_fingerprints"
  private val ModelFile = "_vector_model.txt"

  private[index] case class Model(idCol: String, params: Params,
      centroids: Seq[Seq[Double]], books: Seq[Seq[Seq[Double]]]) {
    /** WITH DEFERRED REFRESH and never built: params are frozen but no
      * quantizer exists yet — search falls back to exact everywhere,
      * maintenance skips, REFRESH INDEX trains and builds. */
    def pending: Boolean = centroids.isEmpty
  }

  // ---- model persistence: line-based text, Double.toString round-trips
  // exactly through parseDouble, so the frozen model is bit-stable ----
  private def writeModel(spark: org.apache.spark.sql.SparkSession,
      path: String, m: Model): Unit = {
    val sb = new StringBuilder
    sb.append("v1\n")
    sb.append(s"idcol=${m.idCol}\n")
    sb.append(s"params=${m.params.dim},${m.params.nlist},${m.params.m},${m.params.ksub},${m.params.iters}\n")
    m.centroids.foreach(c => sb.append("cent=" + c.mkString(" ") + "\n"))
    m.books.foreach(b =>
      b.foreach(cw => sb.append("book=" + cw.mkString(" ") + "\n")))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new org.apache.hadoop.fs.Path(path, ModelFile), true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
  }

  private def readModel(spark: org.apache.spark.sql.SparkSession,
      path: String): Model = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(new org.apache.hadoop.fs.Path(path, ModelFile))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.linesIterator.toSeq
    require(lines.headOption.contains("v1"), s"bad vector model at $path")
    val kv = lines.tail.collect { case l if l.contains("=") =>
      val i = l.indexOf('='); (l.substring(0, i), l.substring(i + 1)) }
    val idCol = kv.collectFirst { case ("idcol", v) => v }.get
    val Array(dim, nlist, m, ksub, iters) =
      kv.collectFirst { case ("params", v) => v }.get.split(",").map(_.toInt)
    val cents = kv.collect { case ("cent", v) =>
      v.split(" ").toSeq.map(_.toDouble) }
    val flat = kv.collect { case ("book", v) =>
      v.split(" ").toSeq.map(_.toDouble) }
    require((cents.size == nlist && flat.size == m * ksub) ||
      (cents.isEmpty && flat.isEmpty),
      s"corrupt vector model at $path")
    Model(idCol, Params(dim, nlist, m, ksub, iters),
      cents, flat.grouped(ksub).toSeq)
  }

  /** Is the index registered but not yet built (deferred, pre-REFRESH)? */
  private[engine] def isPending(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean =
    try readModel(spark, path).pending
    catch { case scala.util.control.NonFatal(_) => false }

  // ---- coverage ledger on the index table: "segId:liveRows,…" ----
  private[engine] def fingerprints(idx: GraftTable): Map[Long, Long] =
    idx.meta.properties.get(FingerprintsKey).toSeq
      .flatMap(_.split(",")).filter(_.nonEmpty)
      .map { e => val Array(a, b) = e.split(":"); a.toLong -> b.toLong }
      .toMap

  private def recordFingerprints(idx: GraftTable, fp: Map[Long, Long]): Unit =
    idx.setProperties(Map(FingerprintsKey ->
      fp.toSeq.sorted.map { case (k, v) => s"$k:$v" }.mkString(",")))

  /** Index GC riding the base table's CLEAN FILES (r13, the
    * [[Si.vacuumIndexTable]] analog for the rows+fingerprint ledger):
    * stored codes of physically-reclaimed segments can never serve
    * (search filters to fresh seg_ids), so drop them and their
    * fingerprint entries. */
  private[engine] def vacuum(idx: GraftTable, removed: Set[Long]): Unit =
    if (removed.nonEmpty) {
      idx.delete(col("seg_id").isin(removed.toSeq: _*))
      recordFingerprints(idx, fingerprints(idx) -- removed)
    }

  /** Live (delta-aware) rows of the named segments as the quantized
    * search form `(seg_id, id, qv, nq)` — one pinned-snapshot read per
    * segment so every row carries its segment id. */
  private def rowsOf(t: GraftTable, idCol: String, vecCol: String,
      segIds: Seq[Long]): DataFrame =
    segIds.map(id => t.readSegments(Seq(id)).select(
        lit(id).as("seg_id"), col(idCol).cast("long").as("id"),
        Ann.quantize(col(vecCol)).as("qv")))
      .reduce(_ unionByName _)
      .withColumn("nq", Ann.normQ(col("qv")))

  /** CREATE INDEX … AS 'vector': train the quantizer/codebooks on the
    * current rows, encode everything, store sorted by cell. */
  def create(t: GraftTable, idCol: String, vecCol: String, path: String,
      params: Params, deferred: Boolean = false): Unit = {
    require(t.schema.fieldNames.contains(vecCol), s"no such column $vecCol")
    require(t.schema.fieldNames.contains(idCol), s"no such column $idCol")
    if (deferred) {
      // WITH DEFERRED REFRESH (reference index-management.md:87): the
      // index is registered DISABLED — params + id column freeze in a
      // pending model, no training/encoding happens, search falls back
      // to exact scans, and the first REFRESH INDEX builds it
      GraftTable.drop(t.spark, path)
      writeModel(t.spark, path, Model(idCol, params, Nil, Nil))
    } else buildFull(t, idCol, vecCol, path, params)
    t.layout.updateTableMeta(m => m.copy(
      properties = m.properties + (regKey(vecCol) -> path)))
  }

  /** Train on the CURRENT rows, encode everything, store sorted by
    * cell — the non-deferred CREATE and the first REFRESH of a
    * deferred index. */
  private def buildFull(t: GraftTable, idCol: String, vecCol: String,
      path: String, params: Params): Unit = {
    val vis = t.status.visible
    require(vis.nonEmpty,
      "vector index needs data to train on — load the table first")
    val rows = rowsOf(t, idCol, vecCol, vis.map(_.id))
    val cents = Ann.trainCentroids(rows.select("id", "qv"),
      params.nlist, params.iters)
    val books = Ann.pqTrain(rows.select("id", "qv"), params.m, params.ksub,
      params.iters, params.dim)
    val encoded = Ann.pqEncodeCorpus(rows, cents, books)
    GraftTable.drop(t.spark, path)
    val idx = GraftTable.createAsSelect(t.spark, path, encoded,
      sortColumns = Seq("cell"))
    writeModel(t.spark, path, Model(idCol, params, cents, books))
    recordFingerprints(idx, vis.map(s => s.id -> s.rowCount).toMap)
  }

  private def indexPath(t: GraftTable, vecCol: String): String =
    t.meta.properties.getOrElse(regKey(vecCol),
      throw new IllegalArgumentException(s"no vector index on $vecCol"))

  /** Incremental repair (REINDEX / load-time maintenance): encode — with
    * the FROZEN model — every visible segment whose fingerprint is
    * missing or stale, replacing any stale index rows for those
    * segments. Reads only the repaired segments. */
  def repair(t: GraftTable, vecCol: String,
      segIds: Option[Seq[Long]] = None): Unit = {
    val path = indexPath(t, vecCol)
    val model = readModel(t.spark, path)
    // a deferred index has no quantizer yet — nothing to fold into; it
    // stays DISABLED (exact fallback) until REFRESH INDEX builds it
    if (model.pending) return
    val idx = GraftTable.at(t.spark, path)
    val fp = fingerprints(idx)
    val vis = t.status.visible
    val want = segIds.map(_.toSet).getOrElse(vis.map(_.id).toSet)
    val target = vis.filter(s =>
      want.contains(s.id) && !fp.get(s.id).contains(s.rowCount))
    if (target.nonEmpty) {
      // replace-then-append so a stale segment's old rows never coexist
      // with its re-encoded rows
      val staleIds = target.map(_.id).filter(fp.contains)
      if (staleIds.nonEmpty)
        idx.delete(col("seg_id").isin(staleIds: _*))
      val rows = rowsOf(t, model.idCol, vecCol, target.map(_.id))
      idx.insert(Ann.pqEncodeCorpus(rows, model.centroids, model.books))
      recordFingerprints(idx,
        fp ++ target.map(s => s.id -> s.rowCount))
    }
  }

  /** REFRESH INDEX: full rewrite against the current segment set with
    * the frozen model (dead rows of retired segments are dropped here;
    * retraining is a new CREATE — changing the quantizer changes
    * approximate results, which a refresh must not). The FIRST refresh
    * of a deferred index trains and builds it (the one place the
    * reference's enable transition happens, index-management.md:87). */
  def refresh(t: GraftTable, vecCol: String): Unit = {
    val path = indexPath(t, vecCol)
    val model = readModel(t.spark, path)
    if (model.pending) {
      buildFull(t, model.idCol, vecCol, path, model.params)
      return
    }
    val idx = GraftTable.at(t.spark, path)
    val vis = t.status.visible
    if (vis.isEmpty) { idx.truncate(); recordFingerprints(idx, Map.empty) }
    else {
      val rows = rowsOf(t, model.idCol, vecCol, vis.map(_.id))
      idx.insert(Ann.pqEncodeCorpus(rows, model.centroids, model.books),
        overwrite = true)
      recordFingerprints(idx, vis.map(s => s.id -> s.rowCount).toMap)
    }
  }

  /** DROP INDEX. */
  def drop(t: GraftTable, vecCol: String): Unit = {
    t.meta.properties.get(regKey(vecCol))
      .foreach(p => GraftTable.drop(t.spark, p))
    t.layout.updateTableMeta(m => m.copy(
      properties = m.properties - regKey(vecCol)))
  }

  /** Top-k cosine search against the indexed column.
    *
    * `queries`: `(id: long, qv: array<long>, nq: long)` (the
    * [[Ann.quantize]] form). Covered-fresh segments serve from the
    * stored IVF-PQ codes (ADC probe over `nprobe` cells + exact rerank
    * of `rerank` candidates); uncovered or stale segments are scanned
    * exactly; the union re-ranks per query. With `nprobe = nlist` and
    * `rerank ≥` corpus size the result is EXACTLY brute force.
    *
    * `where`: FILTERED ANN — top-k among base rows satisfying the
    * predicate (the "search near-dups within one language" shape).
    * The predicate evaluates ONCE on a pruned base scan (the full
    * pushdown ladder applies), producing an allowed-id set that
    * left-semi-joins every candidate corpus BEFORE the probe/rerank —
    * i.e. the ANN search runs over exactly the filtered corpus, so
    * recall is the index's normal recall on that corpus (no post-hoc
    * top-k starvation, the classic post-filter failure mode), and the
    * full-probe contract stays exactly brute force over the filtered
    * rows. */
  def search(t: GraftTable, vecCol: String, queries: DataFrame, k: Int,
      nprobe: Int, rerank: Int,
      where: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val path = indexPath(t, vecCol)
    val model = readModel(t.spark, path)
    val allowed = where.map(p => t.read.filter(p)
      .select(col(model.idCol).cast("long").as("id")))
    def restrict(corpus: DataFrame): DataFrame =
      allowed.map(a => corpus.join(a, Seq("id"), "left_semi")).getOrElse(corpus)
    if (model.pending) {
      // deferred, never built: exact everywhere (results stay correct,
      // just unaccelerated — the reference's "disabled until REFRESH")
      val vis0 = t.status.visible
      ExplainCollector.record(
        s"VectorIndex($vecCol): DEFERRED and unbuilt — 0/${vis0.size} " +
          "segments served from the index, all scanned exact")
      return Ann.bruteForceTopK(queries,
          restrict(rowsOf(t, model.idCol, vecCol, vis0.map(_.id)).drop("seg_id")), k)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rnk"))
    }
    val idx = GraftTable.at(t.spark, path)
    val fp = fingerprints(idx)
    val vis = t.status.visible
    val (fresh, stale) =
      vis.partition(s => fp.get(s.id).contains(s.rowCount))
    ExplainCollector.record(
      s"VectorIndex($vecCol): ${fresh.size}/${vis.size} segments served " +
        s"from the index (nprobe=$nprobe/${model.params.nlist}), " +
        s"${stale.size} scanned exact" +
        (if (where.isDefined) ", candidate corpus pre-filtered" else ""))
    // visibility ∩ freshness filter: retired/stale segments' stored rows
    // must not serve (a seg-id InSet, metadata-sized like the SI's)
    val covered = restrict(
      idx.read.filter(col("seg_id").isin(fresh.map(_.id): _*)))
    val fromIdx = Ann.ivfPqTopK(queries, covered, k, model.centroids,
        nprobe, model.books, rerank)
      .select("query_id", "neighbor_id", "cos")
    val pool =
      if (stale.isEmpty) fromIdx
      else {
        val extra = restrict(
          rowsOf(t, model.idCol, vecCol, stale.map(_.id)).drop("seg_id"))
        fromIdx.unionByName(
          Ann.bruteForceTopK(queries, extra, k)
            .select("query_id", "neighbor_id", "cos"))
      }
    // dedup (a neighbor can reach the pool via both branches only if a
    // row moved segments between reads — cos is identical either way),
    // then the final per-query rank
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    pool.groupBy("query_id", "neighbor_id").agg(max("cos").as("cos"))
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }
}
