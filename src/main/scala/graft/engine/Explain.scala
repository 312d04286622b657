package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-side pruning-event recorder for EXPLAIN (reference
  * CarbonExplainCommand + ExplainCollector,
  * integration/spark/.../table/CarbonExplainCommand.scala:29: EXPLAIN
  * on a carbon query appends index/MV-hit and pruning statistics).
  *
  * Recording is thread-local and OFF by default — the scan/index/MV
  * code calls [[record]] unconditionally, which is a no-op outside an
  * EXPLAIN; planning happens on the caller's thread, so the collector
  * sees exactly the decisions made for the explained query. */
object ExplainCollector {
  private val buf =
    new ThreadLocal[scala.collection.mutable.ListBuffer[String]]
  def enabled: Boolean = buf.get != null
  /** No-op unless collection is active (message is by-name — zero cost
    * on the hot path). */
  def record(line: => String): Unit = {
    val b = buf.get
    if (b != null) b += line
  }
  /** Run `body` with collection on; returns (result, recorded lines). */
  def collect[T](body: => T): (T, Seq[String]) = {
    val prev = buf.get
    val b = scala.collection.mutable.ListBuffer.empty[String]
    buf.set(b)
    try { val r = body; (r, b.toList) }
    finally { if (prev == null) buf.remove() else buf.set(prev) }
  }
}

/** EXPLAIN enrichment: Spark's plan plus a "== Graft ==" section with
  * segment/file pruning counts, index pins, and MV serving — one
  * command answering "did my query use the SI / the MV / how many files
  * were pruned?". */
object GraftExplain {

  /** Explain `df` (by-name: index-accelerated readers like
    * `Si.readWhereIn` record their grain decision while the frame is
    * CONSTRUCTED, so construction must happen inside the collection
    * scope). Forces split planning so segment/file pruning actually
    * runs, but executes nothing. */
  def explain(spark: SparkSession, df: => DataFrame,
      extended: Boolean = false): String = {
    import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, DataSourceV2ScanRelation}
    val ((qe, planned), lines) = ExplainCollector.collect {
      val d = df
      val q = d.queryExecution
      // force DSv2 split planning (this is where min-max segment skip
      // and file-grain pruning run); metadata-only scans plan zero
      // partitions, which is itself the interesting fact
      val counts = q.sparkPlan.collect {
        case b: BatchScanExec =>
          val n = try b.inputPartitions.size
            catch { case scala.util.control.NonFatal(_) => -1 }
          b.scan.getClass.getSimpleName -> n
      }
      (q, counts)
    }
    // plan-derived facts: every carbonish relation's pin options, MV hits
    val rels = qe.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.relation
    }
    val facts = scala.collection.mutable.ListBuffer.empty[String]
    rels.foreach { rel =>
      rel.table match {
        case ct: graft.engine.source.CarbonishTable =>
          val path = ct.tablePath
          val segs = Option(rel.options.get("segments")).filterNot(_.isEmpty)
          val files = Option(rel.options.get("files")).filterNot(_.isEmpty)
            .map(_.split(",").length)
          val mvHit = graft.engine.mv.MvCatalog.all.find(_.path == path)
          val what = mvHit match {
            case Some(mv) => s"MV '${mv.name}' served from $path"
            case None => s"table $path"
          }
          val ranges = Option(rel.options.get("ranges")).filterNot(_.isEmpty)
            .map(_.split(",").map(_.split(";").length).sum)
          val pins = Seq(
            segs.map(s => s"pinned segments [$s]"),
            files.map(n => s"pinned files $n (position grain)"),
            ranges.map(n => s"pinned row groups $n (fine grain)")).flatten
          facts += (if (pins.isEmpty) what else s"$what: ${pins.mkString(", ")}")
        case _ => ()
      }
    }
    planned.foreach { case (scan, n) =>
      if (n >= 0) facts += s"$scan planned $n input partition(s)"
    }
    val graftSection =
      (facts ++ lines).map("  " + _).mkString("== Graft ==\n", "\n", "")
    val planStr = qe.explainString(
      if (extended) org.apache.spark.sql.execution.ExtendedMode
      else org.apache.spark.sql.execution.FormattedMode)
    s"$graftSection\n\n$planStr"
  }
}
