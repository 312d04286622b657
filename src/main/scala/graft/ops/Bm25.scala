package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance ranking over a tokenized corpus — the scoring half of
  * a text-retrieval pipeline (the reference pairs its text index with
  * Lucene's scored search; cf.
  * integration/spark/src/main/scala/org/apache/carbondata/index/TextMatchUDF.scala
  * — match selection there, relevance ranking here).
  *
  * Scale shape, by construction:
  *   - the query-term IN-list filter sits BEFORE the first shuffle, so
  *     postings for non-query terms never leave the scan stage;
  *   - document-frequency stats are a |query-terms|-row table,
  *     broadcast into the scoring join (no corpus-side shuffle);
  *   - corpus stats (N, Σdl) are one scan-reduce — compute once per
  *     corpus snapshot and reuse across queries;
  *   - top-k is orderBy+limit = TakeOrdered (per-partition heaps, no
  *     global sort).
  *
  * Two scoring variants share the plan:
  *   - [[topK]]: textbook Lucene BM25 (ln idf) for production use;
  *   - [[topKRationalMicro]]: the same ranking family with the ln
  *     dropped (rational idf = the log's argument) and k1=1.2 / b=0.75
  *     cleared to integer arithmetic, so every floating op is a
  *     correctly-rounded op on exact integers — bit-identical across
  *     IEEE-754 engines. Per-term scores are floor-scaled to integer
  *     micro-units and summed as BIGINT (order-independent), which is
  *     what the DuckDB-checked CORRECTNESS row uses (libm fns like ln
  *     are not cross-engine deterministic; see queries.Q's rules).
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  /** Postings (id, dl, term, tf) restricted to `terms`. */
  def postings(docs: DataFrame, idCol: String, toksCol: String,
      terms: Seq[String]): DataFrame =
    docs.select(col(idCol).as("id"),
        size(col(toksCol)).cast("long").as("dl"),
        explode(col(toksCol)).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("id", "dl", "term").agg(count(lit(1)).as("tf"))

  /** (N, Σdl) over the full corpus — one scan-reduce. */
  def corpusStats(docs: DataFrame, toksCol: String): (Long, Long) = {
    val r = docs.agg(count(lit(1)), sum(size(col(toksCol)).cast("long"))).head
    require(!r.isNullAt(1), "corpusStats on an empty corpus")
    (r.getLong(0), r.getLong(1))
  }

  private def scoredPostings(docs: DataFrame, idCol: String, toksCol: String,
      terms: Seq[String]): DataFrame = {
    val p = postings(docs, idCol, toksCol, terms)
    val dfc = p.groupBy("term").agg(count(lit(1)).as("df"))
    p.join(broadcast(dfc), "term")
  }

  /** Lucene-style BM25 top-k: idf = ln(1 + (N-df+0.5)/(df+0.5)). */
  def topK(docs: DataFrame, idCol: String, toksCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    val (n, sumdl) = corpusStats(docs, toksCol)
    val avgdl = sumdl.toDouble / n
    val idf = log(
      (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val contrib = idf * (col("tf") * lit(K1 + 1)) /
      (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / lit(avgdl)))
    scoredPostings(docs, idCol, toksCol, terms)
      .groupBy("id").agg(sum(contrib).as("score"))
      .orderBy(col("score").desc, col("id").asc).limit(k)
  }

  /** Cross-engine-exact ranking (see class doc):
    *
    *   contrib = ((2(N−df)+1) / (2df+1)) · (22·tf)
    *             / ((10·tf+3) + (9·dl·N)/Σdl)
    *
    * — which is rational-idf · tf(k1+1) / (tf + k1(1−b+b·dl/avgdl))
    * with numerator and denominator scaled by 10 and dl/avgdl expanded
    * to dl·N/Σdl. Every subterm left of a division is an exact integer;
    * the three divisions and the final multiply are single correctly-
    * rounded IEEE ops, so any engine computes the identical double.
    * Output: (id, score_u BIGINT micro-units) top-k by
    * (score_u DESC, id ASC). */
  def topKRationalMicro(docs: DataFrame, idCol: String, toksCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    val (n, sumdl) = corpusStats(docs, toksCol)
    val idfR = (lit(2L) * (lit(n) - col("df")) + lit(1L)) /
      (lit(2L) * col("df") + lit(1L))
    val den = (lit(10L) * col("tf") + lit(3L)) +
      (lit(9L) * col("dl") * lit(n)) / lit(sumdl)
    val micro = floor(idfR * (lit(22L) * col("tf")) / den * lit(1000000L))
    scoredPostings(docs, idCol, toksCol, terms)
      .groupBy("id").agg(sum(micro).as("score_u"))
      .orderBy(col("score_u").desc, col("id").asc).limit(k)
  }

  /** DuckDB oracle mirror of [[topKRationalMicro]] given a CTE
    * `toksRel(id, toks)` — the expression tree matches the Spark side
    * op for op (see determinism argument in the class doc). */
  def oTopKRationalMicro(toksRel: String, terms: Seq[String], k: Int): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"""stats AS (
          SELECT count(*) AS n, CAST(sum(len(toks)) AS BIGINT) AS sumdl
          FROM $toksRel),
        post AS (
          SELECT id, dl, term, count(*) AS tf FROM (
            SELECT id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
            FROM $toksRel)
          WHERE term IN ($inList)
          GROUP BY id, dl, term),
        dfs AS (SELECT term, count(*) AS df FROM post GROUP BY term),
        scored AS (
          SELECT p.id,
            floor(
              (2 * (s.n - d.df) + 1) / (2 * d.df + 1)
              * (22 * p.tf)
              / ((10 * p.tf + 3) + (9 * p.dl * s.n) / s.sumdl)
              * 1000000) AS micro
          FROM post p JOIN dfs d ON p.term = d.term CROSS JOIN stats s)
        SELECT id, CAST(sum(CAST(micro AS BIGINT)) AS BIGINT) AS score_u
        FROM scored GROUP BY id
        ORDER BY score_u DESC, id ASC LIMIT $k"""
  }
}
