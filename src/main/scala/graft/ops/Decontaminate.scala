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
    * n-grams. Documents shorter than n words yield no grams. */
  private def ngramPairs(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    df.select(col(id), split(lower(trim(col(text))), " ").as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col(id), explode(array_distinct(expr(
        s"transform(sequence(0, size(__toks) - $n), i -> array_join(slice(__toks, i + 1, $n), ' '))")))
        .as("__g"))

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
    def grams(src: String, id: String, text: String, alias: String) =
      s"""$alias AS (
            SELECT DISTINCT $id, array_to_string(toks[i:i+${n - 1}], ' ') AS g
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
