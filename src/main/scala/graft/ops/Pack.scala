package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign each document
  * to a fixed token-budget bin ("which training sequence does this doc
  * feed"), deterministically and in parallel.
  *
  * Packing is SHARD-LOCAL: shard = id div shardSize (deterministic id
  * ranges), and within a shard docs pack in id order into consecutive
  * `budget`-token bins — a doc lands in the bin of the tokens
  * accumulated before it (the streaming next-fit split used when
  * chunking a corpus into training sequences). Shard-local windows are
  * the scale design: the cumulative sum is an independent window per
  * shard, so the whole op is one hash shuffle on `shard` — never a
  * total sort — and the assignment is byte-identical at any
  * parallelism. At 100 TB pick shardSize so a shard's rows fit one
  * task (the default 4096 docs ≈ MBs of ids+counts).
  */
object Pack {

  /** Per-doc bin assignment: (idCol, n_tokens, shard, bin). */
  def packBins(
      docs: DataFrame,
      idCol: String,
      tokens: Column,
      budget: Long,
      shardSize: Long = 4096L): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    val w = Window.partitionBy(col("__shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("__tokens", tokens.cast("long"))
      .withColumn("__shard", expr(s"$idCol div $shardSize"))
      .withColumn("__cum_before",
        coalesce(sum(col("__tokens")).over(w), lit(0L)))
      .select(
        col(idCol),
        col("__tokens").as("n_tokens"),
        col("__shard").as("shard"),
        expr(s"__cum_before div $budget").as("bin"))
  }

  /** Bin manifest: docs + token payload per (shard, bin) — the unit a
    * sequence-building job consumes. */
  def binManifest(
      docs: DataFrame,
      idCol: String,
      tokens: Column,
      budget: Long,
      shardSize: Long = 4096L): DataFrame =
    packBins(docs, idCol, tokens, budget, shardSize)
      .groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col(idCol)).as("first_id"),
        max(col(idCol)).as("last_id"))
}
