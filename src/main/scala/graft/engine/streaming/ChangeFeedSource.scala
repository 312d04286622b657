package graft.engine.streaming

import graft.engine.GraftTable

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** STREAMING change data feed (r20, VERDICT r19 #4 — Delta's
  * `readStream.option("readChangeFeed", "true")` analog): a
  * micro-batch source over the commit log whose offset IS the table
  * VERSION. Each micro-batch serves
  * [[GraftTable.readChanges]] (lastSeenVersion, currentVersion) —
  * the same net-multiset feed as the batch form, with the same
  * metadata pruning and rewrite-only-commit skipping, so a batch that
  * spans only a compaction plans an EMPTY diff and reads zero files.
  *
  * Offsets are plain versions, so restart-from-checkpoint resumes at
  * the exact commit boundary the sink last finished; a trigger firing
  * with no new commits produces no batch (equal offsets). A single
  * batch may span several commits (trigger cadence vs commit cadence)
  * — the result is the NET feed across them, consistent with the
  * batch form's semantics; use `TABLE_CHANGES('<t>', v)` for strict
  * per-commit slices.
  *
  * v1 `Source` rather than DSv2 MicroBatchStream by necessity: a CDF
  * batch is a whole QUERY (two pruned scans + exceptAll), not a list
  * of input partitions — `getBatch` is the only streaming API that
  * accepts an arbitrary DataFrame per batch (the lazy batch plan is
  * re-wrapped with the isStreaming tag MicroBatchExecution asserts).
  *
  * Usage: `GraftStreaming.readChangesStream(spark, path,
  * startingVersion)` or `spark.readStream
  * .format("graft.engine.streaming.ChangeFeedSourceProvider")
  * .option("path", p).option("startingVersion", v).load()`.
  * Default start = the table's CURRENT version (future changes only);
  * `startingVersion` rewinds into the retained log. */
class ChangeFeedSource(
    spark: SparkSession,
    path: String,
    startingVersion: Option[Long])
  extends Source {

  private val table = GraftTable.at(spark, path)
  private val startV: Long =
    startingVersion.getOrElse(table.layout.readStatus().version)

  // exact result shape of readChanges (nullability included) so the
  // streaming relation's attributes bind to every batch plan verbatim;
  // the degenerate same-version call builds only the plan, no jobs
  override val schema: StructType = table.readChanges(startV, startV).schema

  override def getOffset: Option[Offset] = {
    val v = table.layout.readStatus().version
    if (v <= startV) None else Some(LongOffset(v))
  }

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startV)
    val to = versionOf(end)
    val batch = table.readChanges(from, to)
    org.apache.spark.sql.graft.Shims.internalCreateDataFrame(
      spark, batch.queryExecution.toRdd, batch.schema, isStreaming = true)
  }

  override def stop(): Unit = ()
}

/** `spark.readStream.format(...)` provider for [[ChangeFeedSource]];
  * registered by class name (no service-loader entry needed). */
class ChangeFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdf"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-cdf source requires .option(\"path\", <table path>)"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val t = GraftTable.at(sqlContext.sparkSession, pathOf(parameters))
    val v = t.layout.readStatus().version
    (shortName(), t.readChanges(v, v).schema)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new ChangeFeedSource(
      sqlContext.sparkSession,
      pathOf(parameters),
      parameters.collectFirst {
        case (k, v) if k.equalsIgnoreCase("startingVersion") => v.toLong
      })
}
