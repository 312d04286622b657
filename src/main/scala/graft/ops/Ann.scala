package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor operators over an embedding column.
  *
  * Cross-engine determinism: embeddings are quantized to integers
  * (floor(x·10⁴)), dot products and norms are exact integer folds, and
  * cosine is one final double division — bit-identical in any engine.
  *
  * Scale design:
  *   - [[bruteForceTopK]]: queries×corpus join with the (small) query
  *     side broadcast — the exact baseline. Corpus streams; never
  *     collected. O(|Q|·|C|) compute but one pass over the corpus.
  *   - [[lshTopK]]: random-hyperplane signatures bucket both sides; the
  *     join is an equi-join on the bucket key, so at 100 TB the pair
  *     space collapses from |Q|·|C| to matching buckets only. Recall is
  *     tunable via (numPlanes, tables).
  */
object Ann {

  /** floor(x·10000) exact integer view of a float vector. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 10000).cast("long"))
  def oQuantize(vec: String): String =
    s"list_transform($vec, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))"

  /** Exact integer dot product of two equal-length long vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
  def oDotQ(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))"

  def normQ(a: Column): Column = dotQ(a, a)
  def oNormQ(a: String): String = s"list_sum(list_transform($a, x -> x * x))"

  /** cosine from exact integers; single IEEE division at the end. */
  def cosineQ(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / sqrt(na.cast("double") * nb.cast("double"))

  /** Exact top-k neighbors for each query vector (excluding self).
    * `queries`/`corpus`: (id: long, qv: array<long>, nq: long). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries).as("q")
    val c = corpus.as("c")
    val dot = dotQ(col("q.qv"), col("c.qv"))
    val scored = q.join(c, col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        cosineQ(dot, col("q.nq"), col("c.nq")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.select(col("query_id"), col("neighbor_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1):
    * derived from h32 so signatures are reproducible. */
  private def planeComponent(plane: Int, dim: Int): Double = {
    val h = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"plane|$plane|$dim").substring(0, 8), 16)
    (h.toDouble / math.pow(2, 31)) - 1.0
  }

  /** Sign-random-projection bucket signature of a quantized vector. */
  def srpSignature(qv: Column, dim: Int, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val comps = (0 until dim).map(i => planeComponent(p, i))
      val dot = (0 until dim).map(i =>
        element_at(qv, i + 1).cast("double") * lit(comps(i))).reduce(_ + _)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Bucketed ANN: equi-join on the SRP signature, then top-k within the
    * candidate set. Approximate — pairs in different buckets are missed;
    * the spec measures recall against [[bruteForceTopK]]. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int, numPlanes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qs = queries.withColumn("sig", srpSignature(col("qv"), dim, numPlanes)).as("q")
    val cs = corpus.withColumn("sig", srpSignature(col("qv"), dim, numPlanes)).as("c")
    val dot = dotQ(col("q.qv"), col("c.qv"))
    val scored = qs.join(cs, col("q.sig") === col("c.sig") && col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        cosineQ(dot, col("q.nq"), col("c.nq")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.select(col("query_id"), col("neighbor_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }
}
