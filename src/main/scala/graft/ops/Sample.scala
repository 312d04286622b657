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
    * reproducibility). One shuffle on the stratum key; adds a `sel_rk`
    * rank column (1-based within stratum). A pathologically hot stratum
    * sorts in one task — if strata are few and huge, prefer
    * [[sampleFraction]] per stratum instead. */
  def stratifiedExact(df: DataFrame, stratumCol: String, idCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"per-stratum count must be positive: $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(bucketOf(col(idCol)), col(idCol))
    df.withColumn("sel_rk", row_number().over(w).cast("long"))
      .filter(col("sel_rk") <= n)
  }

  /** DuckDB oracle fragment mirroring [[bucketOf]] (non-negative ids). */
  def oBucketOf(id: String): String =
    s"(($id % 1000000000) * $M) % $P % $Buckets"
}
