package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's registered UDF surface (SURVEY §2.6 / CarbonEnv
  * .scala:83-113), Spark-first: wherever possible the "UDF" is expanded
  * into native codegen'd functions instead of a black-box lambda, so
  * predicates stay pushdown-eligible.
  */
object GraftFunctions {

  /** `text_match(column, query)` — lucene-lite full-text predicate
    * (reference TextMatchUDF.scala:23-30 backed by the lucene FG index;
    * here: native contains-conjunctions, SURVEY §4.2 "text_match-lite").
    *
    * Query grammar: `OR`-separated clauses; each clause is whitespace-
    * separated terms that must ALL occur (case-insensitive substring).
    * e.g. "big data OR carbon" = (contains big AND contains data) OR
    * contains carbon.
    */
  def textMatch(c: Column, query: String): Column = {
    val clauses = parseQuery(query)
    require(clauses.nonEmpty, "empty text_match query")
    val lc = lower(c)
    clauses.map(_.map(t => lc.contains(t)).reduce(_ && _)).reduce(_ || _)
  }

  private[graft] def parseQuery(query: String): Seq[Seq[String]] =
    query.split("(?i) OR ").toSeq
      .map(_.trim.split("\\s+").toSeq.map(_.toLowerCase).filter(_.nonEmpty))
      .filter(_.nonEmpty)

  /** DuckDB oracle fragment with identical semantics. */
  def oTextMatch(cSql: String, query: String): String =
    parseQuery(query)
      .map(_.map { t =>
        val esc = t.replace("'", "''") // SQL string-literal escaping
        s"contains(lower($cSql), '$esc')"
      }.mkString("(", " AND ", ")"))
      .mkString("(", " OR ", ")")

  /** `text_match_with_limit` — reference caps hits at the index layer;
    * without an FG index the limit composes as a plain limit. */
  def textMatchWithLimit(c: Column, query: String, limit: Int): (Column, Int) =
    (textMatch(c, query), limit)

  /** `getTupleId()` analog: stable row address = file + row ordinal
    * (reference addresses IUD rows the same way; CarbonEnv.scala:83).
    * Valid on v1 file-source reads (`_metadata` column); for carbonish
    * tables use `GraftTable.readWithTupleId`. */
  def tupleId: Column =
    concat_ws("/", col("_metadata.file_path"), col("_metadata.row_index"))

  /** `getPositionId()` — the row ordinal WITHIN its file; pair with
    * `_metadata.file_path` (or use [[tupleId]]) for a globally unique
    * row address. */
  def positionId: Column = col("_metadata.row_index")

  /** `timeseries(col, granularity)` (reference TimeSeriesUDF.java:79-142)
    * = date_trunc with the carbon granularity names. */
  def timeseries(c: Column, granularity: String): Column = {
    val g = granularity.trim.toLowerCase match {
      case "second" => "second"; case "minute" => "minute"
      case "hour" => "hour"; case "day" => "day"
      case "week" => "week"; case "month" => "month"; case "year" => "year"
      case other => throw new IllegalArgumentException(s"granularity: $other")
    }
    date_trunc(g, c)
  }

  /** SQL registration for the UDF-shaped surface (SQL queries can't call
    * the Column builders directly). Named `text_match_contains` — the
    * row-level substring variant — so it can't collide with the indexed
    * `text_match('col:query')` marker registered by
    * [[graft.engine.index.TextMatchSql.enable]]. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("text_match_contains", (text: String, query: String) => {
      if (text == null) false
      else {
        val lc = text.toLowerCase
        parseQuery(query).exists(_.forall(lc.contains))
      }
    })
  }

  // ---------------------------------------------------------- redaction

  /** PII redaction for training corpora: emails → `<EMAIL>`,
    * NNN-NNNN phone shapes → `<PHONE>`. Pure regexp_replace projection
    * (codegen'd, embarrassingly parallel); the patterns are restricted
    * to syntax Java regex and RE2 share, so the DuckDB oracle fragment
    * below is bit-identical. */
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** DuckDB oracle fragment with identical semantics. */
  def oRedactPii(cSql: String): String =
    s"regexp_replace(regexp_replace($cSql, '$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g')"

  /** Intra-document repetition (the Gopher-style duplicate-n-gram
    * quality rule): fraction of n-grams that are repeats of an earlier
    * n-gram in the same doc — 0.0 for docs too short to form one. Pure
    * per-row array work (no shuffle); heavily templated/boilerplate
    * text scores high and gets filtered before training. */
  def duplicateNgramRatio(c: Column, n: Int = 3): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toks = split(lower(trim(c)), " ")
    // BIND the token array as a lambda variable (single-element
    // transform): expressions captured from outside a higher-order
    // lambda are inlined and re-evaluated per element — referencing the
    // raw split inside the per-gram lambda re-tokenizes the whole text
    // for every element_at, turning a linear row op quadratic (8.7 s →
    // 0.4 s on the sf0.1 documents bench row)
    transform(array(toks), tk => {
      val count = size(tk) - (n - 1)
      val grams = transform(sequence(lit(1), count),
        i => concat_ws(" ", (0 until n).map(k => element_at(tk, i + lit(k))): _*))
      when(count >= 1,
        lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams).cast("double"))
        .otherwise(lit(0.0))
    }).getItem(0)
  }
}
