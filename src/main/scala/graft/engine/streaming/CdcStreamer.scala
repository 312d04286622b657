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
    * delete-ops drop target rows, everything else upserts.
    *
    * Validation is ONE Spark action per batch: with `orderColumn` set,
    * a filter-scan for unknown ops; without it, a single per-key
    * aggregation that surfaces both unknown ops and duplicate keys
    * (duplicates are a hard error there — dropDuplicates would keep an
    * ARBITRARY event, so a delete could be silently discarded in favor
    * of an insert, differing run to run). */
  def applyBatch(target: GraftTable, batch: DataFrame, cfg: CdcConfig): Unit = {
    if (batch.isEmpty) return
    val key = cfg.keyColumn
    val op = col(s"s.${cfg.opColumn}")
    val known = Seq(cfg.insertOp, cfg.updateOp, cfg.deleteOp)
    // coalesce: a NULL op must be rejected too (isin is null for null)
    val invalid = !coalesce(col(cfg.opColumn).isin(known: _*), lit(false))
    def badOpMsg(v: Any): String =
      s"unknown ${cfg.opColumn} value '$v' (expected one of ${known.mkString(",")})"
    val latest = cfg.orderColumn match {
      case Some(o) =>
        val bad = batch.filter(invalid).limit(1).collect()
        require(bad.isEmpty, badOpMsg(bad.headOption.map(_.getAs[Any](cfg.opColumn)).orNull))
        batch.withColumn("__rn", row_number().over(
            Window.partitionBy(col(key)).orderBy(col(o).desc)))
          .filter(col("__rn") === 1).drop("__rn")
      case None =>
        // one aggregation, one action: per-key event count + any invalid
        // op value, instead of a filter pass AND a groupBy pass
        val viol = batch.groupBy(col(key)).agg(
            count(lit(1)).as("__cnt"),
            max(when(invalid,
              coalesce(col(cfg.opColumn).cast("string"), lit("<null>")))).as("__bad"))
          .filter(col("__cnt") > 1 || col("__bad").isNotNull)
          .limit(1).collect()
        viol.headOption.foreach { r =>
          require(r.isNullAt(2),  // __bad
            badOpMsg(r.get(2)))
          require(r.getLong(1) <= 1,
            s"micro-batch carries ${r.getLong(1)} events for key '${r.get(0)}' but " +
              "CdcConfig.orderColumn is not set — the final state per key would be " +
              "nondeterministic; set orderColumn to the source-ordering field " +
              "(commit version / timestamp)")
        }
        batch
    }
    target.merge(latest, expr(s"t.$key = s.$key"))
      .whenMatched(op === cfg.deleteOp).delete()
      .whenMatched().updateAll()
      .whenNotMatched(op =!= cfg.deleteOp).insertAll()
      .execute()
  }

  /** Wire-envelope decode — the reference streamer's Debezium-shaped
    * input (docs/scd-and-cdc-guide.md:136-211: an `op` field, a source
    * ordering field like `ts_ms`, and the row images; avro there, JSON
    * here — the payload format is transport plumbing, the envelope
    * semantics are what the tool owns). Each kafka frame's binary
    * `value` is one message:
    * `{"before":{…},"after":{…},"op":"c|r|u|d","ts_ms":N}` — deletes
    * carry the row image in `before`, everything else in `after`;
    * `c`(reate) and `r`(snapshot read) both mean insert. Output is
    * exactly the [[applyBatch]] input shape: the target's columns, the
    * op column normalized onto `cfg`'s op vocabulary (unknown codes
    * pass through raw so applyBatch's validation names them), and the
    * ordering column. All codegen'd `from_json`/`when` — no UDF in the
    * decode path. */
  def decodeJsonEnvelope(raw: DataFrame,
      rowSchema: org.apache.spark.sql.types.StructType, cfg: CdcConfig,
      tsField: String = "ts_ms"): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val env = StructType(Seq(
      StructField("before", rowSchema), StructField("after", rowSchema),
      StructField("op", StringType), StructField(tsField, LongType)))
    val e = from_json(col("value").cast("string"), env)
    val opRaw = e.getField("op")
    val op = when(opRaw.isin("c", "r"), lit(cfg.insertOp))
      .when(opRaw === "u", lit(cfg.updateOp))
      .when(opRaw === "d", lit(cfg.deleteOp))
      .otherwise(opRaw)
    val row = when(op === cfg.deleteOp, e.getField("before"))
      .otherwise(e.getField("after"))
    val ordName = cfg.orderColumn.getOrElse(tsField)
    raw.select(row.as("__r"), op.as(cfg.opColumn),
        e.getField(tsField).as(ordName))
      .select(col("__r.*") +: Seq(col(cfg.opColumn), col(ordName)): _*)
  }

  /** Continuous kafka CDC apply: transport options resolve from the
    * SAME property vocabulary as streaming-source tables
    * (`kafka.bootstrap.servers` + `topic`/`subscribe_pattern` +
    * `starting_offsets`, [[graft.engine.GraftSql.kafkaSourceOptions]]),
    * frames decode through [[decodeJsonEnvelope]], and each micro-batch
    * merges via [[applyBatch]]. The envelope's `ts_ms` becomes the
    * source ordering field when the config names none — a kafka batch
    * can always carry several events per key. */
  def startKafka(
      name: String,
      target: GraftTable,
      props: Map[String, String],
      cfg: CdcConfig,
      trigger: Trigger = Trigger.ProcessingTime(0),
      checkpoint: Option[String] = None,
      tsField: String = "ts_ms"): StreamingQuery = {
    val c = if (cfg.orderColumn.isDefined) cfg
      else cfg.copy(orderColumn = Some(tsField))
    val raw = target.spark.readStream.format("kafka")
      .options(graft.engine.GraftSql.kafkaSourceOptions(props, target.path))
      .load()
    start(name, target, decodeJsonEnvelope(raw, target.schema, c, tsField), c,
      trigger, checkpoint)
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
