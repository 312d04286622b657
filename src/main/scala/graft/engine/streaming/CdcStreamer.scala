package graft.engine.streaming

import graft.engine.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** CDC apply configuration (reference CarbonStreamerConfig.scala:27 and
  * docs/scd-and-cdc-guide.md:136-211 — carbon.streamer.* properties).
  *
  * `opColumn` tags each change row with its operation; rows whose op is
  * none of insert/update/delete are rejected. `orderColumn` (the
  * source-ordering field, e.g. a commit version or timestamp) picks the
  * LATEST event per key inside a micro-batch, so a batch carrying
  * insert+update+delete for the same key applies only the final state. */
case class CdcConfig(
    keyColumn: String,
    opColumn: String = "_op",
    insertOp: String = "i",
    updateOp: String = "u",
    deleteOp: String = "d",
    orderColumn: Option[String] = None)

/** Continuous CDC merge: change stream → per-batch MERGE INTO a
  * carbonish table (the reference's CarbonDataStreamer tool,
  * streamer/CarbonDataStreamer; its avro/kafka decoding is source
  * plumbing Spark already provides via `readStream`).
  *
  * Scale shape: each micro-batch is one copy-on-write merge — the
  * target-side scan is pruned to segments containing matched keys, so a
  * steady CDC trickle against a 100 TB table rewrites the few segments
  * its keys land in, batch by batch, with each publish an atomic
  * tablestatus swap guarded against concurrent writers. */
object CdcStreamer {

  /** Deduplicate a batch to the latest event per key, then merge:
    * delete-ops drop target rows, everything else upserts. */
  def applyBatch(target: GraftTable, batch: DataFrame, cfg: CdcConfig): Unit = {
    if (batch.isEmpty) return
    val key = cfg.keyColumn
    val op = col(s"s.${cfg.opColumn}")
    val known = Seq(cfg.insertOp, cfg.updateOp, cfg.deleteOp)
    // coalesce: a NULL op must be rejected too (isin is null for null)
    val bad = batch.filter(!coalesce(col(cfg.opColumn).isin(known: _*), lit(false)))
      .limit(1).collect()
    require(bad.isEmpty,
      s"unknown ${cfg.opColumn} value '${bad.headOption.map(_.getAs[Any](cfg.opColumn)).orNull}' " +
        s"(expected one of ${known.mkString(",")})")
    val latest = cfg.orderColumn match {
      case Some(o) =>
        batch.withColumn("__rn", row_number().over(
            Window.partitionBy(col(key)).orderBy(col(o).desc)))
          .filter(col("__rn") === 1).drop("__rn")
      case None =>
        // without an ordering column, "latest per key" is undefined —
        // dropDuplicates would keep an ARBITRARY event (a delete could be
        // silently discarded in favor of an insert, differing run to run).
        // Only a batch with at most one event per key is safe to apply.
        val dup = batch.groupBy(col(key)).count()
          .filter(col("count") > 1).limit(1).collect()
        require(dup.isEmpty,
          s"micro-batch carries ${dup.headOption.map(_.getLong(1)).getOrElse(0L)} events for key " +
            s"'${dup.headOption.map(_.get(0)).orNull}' but CdcConfig.orderColumn is not set — " +
            "the final state per key would be nondeterministic; set orderColumn to the " +
            "source-ordering field (commit version / timestamp)")
        batch
    }
    target.merge(latest, expr(s"t.$key = s.$key"))
      .whenMatched(op === cfg.deleteOp).delete()
      .whenMatched().updateAll()
      .whenNotMatched(op =!= cfg.deleteOp).insertAll()
      .execute()
  }

  /** Start the continuous apply; registered under `name` in
    * [[StreamManager]] (SHOW STREAMS / DROP STREAM work on it). The
    * change stream must carry the target's columns plus the op (and
    * optional order) column. */
  def start(
      name: String,
      target: GraftTable,
      changes: DataFrame,
      cfg: CdcConfig,
      trigger: Trigger = Trigger.ProcessingTime(0),
      checkpoint: Option[String] = None): StreamingQuery =
    StreamManager.createForeachBatchStream(name, target, changes, trigger, checkpoint) {
      (batch, _) => applyBatch(target, batch, cfg)
    }
}
