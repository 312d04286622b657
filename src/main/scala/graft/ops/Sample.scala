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
    * the global rank is computed the scale-correct way, CHECKPOINT- and
    * SAMPLING-FREE: the key is a ~uniform hash in [0, P), so
    * `bucket = (key × n) div P` is a pure, balanced, ORDER-PRESERVING
    * coarse partitioner — no RangePartitioner, whose sampled boundaries
    * are seeded by the RDD id and so disagree between jobs (that
    * nondeterminism is what previously forced an eager localCheckpoint
    * pinning a full corpus copy on executor storage). One count-only
    * aggregation (map-side partials → n rows on the driver) turns
    * bucket counts into cumulative offsets; the final pass ranks within
    * each bucket — buckets are hash-uniform, so the per-bucket window
    * never sees a hot-key skew — and adds the offset:
    * pos = offset(bucket) + rank_in_bucket. No window over one global
    * partition, no driver collect of rows, and both passes are pure
    * functions of the values, so they agree on ANY partitioning.
    *
    * DETERMINISM REQUIREMENT: the input is scanned twice (counts, then
    * rank), so `df` must evaluate to the same rows in both jobs — true
    * for any table/file-backed input, which is the export use case. For
    * a LIVE or otherwise non-deterministic input (an unpinned stream
    * sink, a query over a table being written) the two scans can
    * disagree, producing duplicate or gapped `pos` values; pass
    * `pinSnapshot = true` there — it localCheckpoints the keyed rows
    * first, one scan, at the price of a full corpus copy on executor
    * storage for the duration. */
  def trainingOrder(df: DataFrame, idCol: String, seed: Long,
      partitions: Int = 0, pinSnapshot: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val keyed0 = df
      .withColumn("__tk", shuffleKey(col(idCol), seed))
      .withColumn("__bk", expr(s"(__tk * ${n}L) div ${P}L"))
    val keyed = if (pinSnapshot) keyed0.localCheckpoint() else keyed0
    val counts = keyed.groupBy(col("__bk")).agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__bk")).collect()
    var acc = 0L
    val bases = counts.map { r =>
      val base = (r.getLong(0), acc); acc += r.getLong(1); base
    }.toSeq
    val offDf = spark.createDataFrame(bases).toDF("__bk", "__base")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bk")).orderBy(col("__tk"), col(idCol))
    keyed.join(broadcast(offDf), "__bk")
      .withColumn("pos", col("__base") + row_number().over(w) - lit(1L))
      .drop("__tk", "__bk", "__base")
  }

  /** DuckDB oracle fragment mirroring [[shuffleKey]] (non-negative ids). */
  def oShuffleKey(id: String, seed: Long): String =
    s"(($id % 1000000000 + ${seed % 1000000000L}) * $M) % $P"
}
