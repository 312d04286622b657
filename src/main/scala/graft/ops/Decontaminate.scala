package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark DECONTAMINATION — the n-gram-collision rule used to strip
  * evaluation contamination from training corpora (the GPT-3/PaLM-style
  * "remove any training document sharing an n-gram with the test set"
  * pass): a document is contaminated when it shares at least
  * `minOverlap` DISTINCT word n-grams with some single benchmark
  * document.
  *
  * Spark-first plan, no pair explosion: both sides explode to distinct
  * (id, ngram) pairs — a pure projection — then an equi-join ON THE
  * N-GRAM collapses the candidate space to colliding grams only. The
  * benchmark side (an eval set) is broadcast by default, so the corpus
  * never shuffles: at 100 TB the cost is one scan + map-side join +
  * one partial-aggregated groupBy over the (tiny) collision set.
  * Set `broadcastBench = false` for benchmark sets too large to
  * broadcast — the join falls back to a shuffle on the gram.
  */
object Decontaminate {

  /** Distinct (id, gram) pairs: whitespace tokens → sliding word
    * n-grams, each HASHED to its 64-bit md5 prefix (r12) — the
    * collision join and its countDistinct then run over longs instead
    * of rebuilding/str-hashing n-gram strings on every probe, and the
    * broadcast map shrinks to 8 bytes per gram. The oracle hashes the
    * same way ([[oFlagContaminated]]), so overlap counts stay
    * bit-identical (a 64-bit collision is ~grams²/2⁶⁵ per document and
    * deterministic on both sides). Documents shorter than n words
    * yield no grams. */
  private def ngramPairs(df: DataFrame, id: String, text: String, n: Int): DataFrame = {
    def md5p64(c: Column): Column =
      org.apache.spark.sql.graft.Shims.column(
        org.apache.spark.sql.graft.Md5Prefix64(
          org.apache.spark.sql.graft.Shims.expression(c)))
    df.select(col(id), split(lower(trim(col(text))), " ").as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col(id), expr(
        s"transform(sequence(0, size(__toks) - $n), i -> array_join(slice(__toks, i + 1, $n), ' '))")
        .as("__gs"))
      .select(col(id), explode(array_distinct(
        transform(col("__gs"), g => md5p64(g)))).as("__g"))
  }

  /** Contaminated docs: (docId, overlap) where `overlap` is the largest
    * count of distinct shared n-grams with any one benchmark doc,
    * filtered to `overlap >= minOverlap`. */
  def flagContaminated(
      docs: DataFrame, docId: String, docText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int = 8, minOverlap: Int = 1,
      broadcastBench: Boolean = true): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    val dg = ngramPairs(docs, docId, docText, n)
    val bg0 = ngramPairs(bench, benchId, benchText, n)
      .withColumnRenamed(benchId, "__bench_id")
    val bg = if (broadcastBench) broadcast(bg0) else bg0
    dg.join(bg, "__g")
      .groupBy(col(docId), col("__bench_id"))
      .agg(countDistinct(col("__g")).as("__k"))
      .groupBy(col(docId))
      .agg(max(col("__k")).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /** The clean corpus: docs minus contaminated ids (left anti join). */
  def decontaminate(
      docs: DataFrame, docId: String, docText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int = 8, minOverlap: Int = 1,
      broadcastBench: Boolean = true): DataFrame = {
    val flagged = flagContaminated(docs, docId, docText,
      bench, benchId, benchText, n, minOverlap, broadcastBench)
      .select(col(docId).as("__cid"))
    docs.join(if (broadcastBench) broadcast(flagged) else flagged,
      col(docId) === col("__cid"), "left_anti")
  }

  /** DuckDB oracle fragment: same contamination flags. */
  def oFlagContaminated(
      docsSql: String, docId: String, docText: String,
      benchSql: String, benchId: String, benchText: String,
      n: Int, minOverlap: Int): String = {
    // grams hashed exactly like the Spark side: 64-bit md5 prefix
    def grams(src: String, id: String, text: String, alias: String) =
      s"""$alias AS (
            SELECT DISTINCT $id,
              CAST('0x' || substr(md5(array_to_string(toks[i:i+${n - 1}], ' ')), 1, 16) AS UBIGINT) AS g
            FROM (SELECT $id, string_split(lower(trim($text)), ' ') AS toks FROM $src),
                 unnest(range(1, len(toks) - ${n - 1} + 1)) AS u(i)
            WHERE len(toks) >= $n)"""
    s"""WITH ${grams(docsSql, docId, docText, "dg")},
         ${grams(benchSql, benchId, benchText, "bg")},
         hits AS (
           SELECT dg.$docId, bg.$benchId AS bench_id, count(DISTINCT dg.g) AS k
           FROM dg JOIN bg ON dg.g = bg.g GROUP BY 1, 2)
       SELECT $docId, CAST(max(k) AS BIGINT) AS overlap FROM hits
       GROUP BY 1 HAVING max(k) >= $minOverlap"""
  }
}
