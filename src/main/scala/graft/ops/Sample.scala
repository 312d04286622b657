package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Train/val/test assignment and mixture down-sampling must be
  * REPRODUCIBLE (same doc → same split on every run, every engine,
  * any parallelism) and JOIN-FREE (a 100 TB corpus can't afford a
  * membership join). Both reduce to one pure projection: a
  * multiplicative hash of the id into [0, 10000) and threshold
  * comparisons. The hash is explicit int64 arithmetic — Knuth's
  * multiplicative constant modulo a prime — rather than an engine
  * hash function, so the assignment is portable across engines and
  * versions (Spark's xxhash64/murmur do not match other systems).
  * The id is reduced mod 1e9 first so the product stays far inside
  * int64 for any id — no overflow in engines that trap it.
  */
object Sample {

  private val M = 2654435761L // Knuth multiplicative (2^32 * phi)
  private val P = 1000000007L // prime modulus
  val Buckets = 10000L

  /** Stable bucket in [0, Buckets) for an integral id column. */
  def bucketOf(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(1000000000L)) * lit(M), lit(P)) % lit(Buckets)

  /** Deterministic fraction sample: keep ids whose bucket falls below
    * `fraction` of the bucket space (resolution 1/10000). */
  def sampleFraction(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    df.filter(bucketOf(col(idCol)) < lit((fraction * Buckets).round))
  }

  /** Split assignment by cumulative weight ranges over the bucket
    * space: weights (name, w) with Σw ≤ 1; ids past the last range get
    * null (dropped rows of a sub-1.0 split spec). Resolution 1/10000. */
  def assignSplit(
      df: DataFrame, idCol: String, weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty, "no splits given")
    require(weights.map(_._2).sum <= 1.0 + 1e-9,
      s"split weights exceed 1: ${weights.map(_._2).sum}")
    val bounds = weights.scanLeft(0L) { case (acc, (_, w)) =>
      acc + (w * Buckets).round
    }.tail
    val b = bucketOf(col(idCol))
    val split = weights.map(_._1).zip(bounds).foldRight(lit(null).cast("string")) {
      case ((name, hi), els) => when(b < lit(hi), name).otherwise(els)
    }
    df.withColumn("split", split)
  }

  /** Weighted mixture: per-source keep fractions, unioned — the
    * "sample 30% of crawl + 100% of books" pipeline stage. Sources must
    * share a schema; the result carries a `source` column. */
  def mixture(sources: Seq[(String, DataFrame, Double)], idCol: String): DataFrame =
    sources.map { case (name, df, frac) =>
      sampleFraction(df, idCol, frac).withColumn("source", lit(name))
    }.reduce(_ unionByName _)

  /** Exact-count stratified sample: up to `n` rows per stratum, chosen
    * by (bucketOf(id), id) rank — the eval-set / per-language-quota
    * stage where "10% of each" isn't enough and exactly-n is required.
    * Selection is a pure function of the ids, so it is identical on
    * every run, engine, and parallelism (fraction sampling can't
    * guarantee counts; engine-native `rand()` can't guarantee
    * reproducibility). Adds a `sel_rk` rank column (1-based within
    * stratum).
    *
    * Skew-safe two-phase plan (a corpus has FEW, HUGE strata — a
    * single window on the stratum would serialize each language into
    * one task): phase 1 ranks within (stratum, input partition) — the
    * hot stratum spreads over every input partition — and keeps each
    * partition's local top-n, which must contain the global top-n;
    * phase 2 ranks the ≤ n×partitions survivors per stratum exactly.
    * Only survivors shuffle to the per-stratum window, so the final
    * single-task-per-stratum sort sees at most n×partitions rows
    * regardless of stratum size. */
  def stratifiedExact(df: DataFrame, stratumCol: String, idCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"per-stratum count must be positive: $n")
    val local = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol), col("__part"))
      .orderBy(bucketOf(col(idCol)), col(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(bucketOf(col(idCol)), col(idCol))
    df.withColumn("__part", spark_partition_id())
      .withColumn("__lrk", row_number().over(local))
      .filter(col("__lrk") <= n)
      .withColumn("sel_rk", row_number().over(w).cast("long"))
      .filter(col("sel_rk") <= n)
      .drop("__part", "__lrk")
  }

  /** DuckDB oracle fragment mirroring [[bucketOf]] (non-negative ids). */
  def oBucketOf(id: String): String =
    s"(($id % 1000000000) * $M) % $P % $Buckets"

  /** Seeded permutation key for [[trainingOrder]]: the same portable
    * arithmetic as [[bucketOf]] with the seed mixed in before the
    * multiply, kept far inside int64 (idr + seedr ≤ 2e9; × M ≈ 5.3e18). */
  def shuffleKey(id: Column, seed: Long): Column =
    pmod((pmod(id.cast("long"), lit(1000000000L)) + lit(seed % 1000000000L))
      * lit(M), lit(P))

  /** Deterministic training order: every row gets its 0-based position
    * `pos` in a seeded global permutation — the "shuffle the corpus
    * before epoch k" export stage, reproducible on any engine and any
    * parallelism (engine `rand()` and `repartition` orders are not).
    *
    * The permutation is the total order (shuffleKey(id, seed), id), and
    * the global rank is computed the scale-correct way: ONE range
    * shuffle on the key (each task sorts only its slice — there is
    * never a single-task global sort), an eager local checkpoint to pin
    * the snapshot (an export staging write; it also makes the
    * partition-local row ids stable across the two downstream jobs),
    * one metadata-sized stat pass (count + min row-id per partition →
    * driver, #partitions rows), and a broadcast join that turns the
    * per-partition counts into cumulative offsets: pos = offset +
    * local index. Range partition p holds keys below partition p+1's,
    * so cumulative counts in partition-ordinal order ARE the global
    * rank offsets. No window over the full data, no driver collect of
    * rows, no 2^33 assumptions on the row-id layout (only that it is
    * increasing within a partition, which `monotonically_increasing_id`
    * guarantees). */
  def trainingOrder(df: DataFrame, idCol: String, seed: Long,
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .withColumn("__tk", shuffleKey(col(idCol), seed))
      .repartitionByRange(n, col("__tk"), col(idCol))
      .sortWithinPartitions(col("__tk"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint()
    val stats = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"), min(col("__mid")).as("__mmin"))
      .orderBy(col("__pid")).collect()
    var acc = 0L
    val bases = stats.map { r =>
      val base = acc - r.getLong(2); acc += r.getLong(1)
      (r.getInt(0), base)
    }.toSeq
    val offDf = spark.createDataFrame(bases).toDF("__pid", "__base")
    ranged.join(broadcast(offDf), "__pid")
      .withColumn("pos", col("__base") + col("__mid"))
      .drop("__tk", "__pid", "__mid", "__base")
  }

  /** DuckDB oracle fragment mirroring [[shuffleKey]] (non-negative ids). */
  def oShuffleKey(id: String, seed: Long): String =
    s"(($id % 1000000000 + ${seed % 1000000000L}) * $M) % $P"
}
