package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Text-analysis operators for a training-data pipeline over `documents`:
  * language-ID (stopword heuristic), quality scoring, token stats,
  * fingerprinting. All string ops only (no libm), so Spark and the DuckDB
  * oracle agree bit-for-bit. Everything is a narrow per-row map + cheap
  * agg — embarrassingly parallel at 100 TB (no shuffle except final agg).
  */
object TextQueries {

  /** #occurrences of literal `w` in `c` via the replace-length trick —
    * identical semantics in Spark and DuckDB (no regex dialect risk).
    * Literal `replace` (StringReplace), not a regex pass. */
  // native one-scan occurrence count (CountOccurrences) — value-
  // identical to the replace trick the oracle keeps (oOcc below), but
  // without a full string copy per counted word per row
  private def occ(c: Column, w: String): Column =
    org.apache.spark.sql.graft.Shims.column(
      org.apache.spark.sql.graft.CountOccurrences(
        org.apache.spark.sql.graft.Shims.expression(c),
        org.apache.spark.sql.graft.Shims.expression(lit(w))))
  private def oOcc(c: String, w: String): String =
    s"CAST((length($c) - length(replace($c, '$w', ''))) / ${w.length} AS BIGINT)"

  private def norm(c: Column): Column = lower(trim(c))
  private val oNorm = "lower(trim(text))"

  // language marker words (padded with spaces to match whole words)
  private val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " a ", " row "),
    "fr" -> Seq(" le ", " la ", " et "),
    "de" -> Seq(" der ", " und ", " die "),
    "es" -> Seq(" el ", " los ", " y "),
    "zh" -> Seq(" shi ", " de2 ", " he "))
  private val langOrder = Seq("de", "en", "es", "fr", "zh") // tiebreak: asc

  // BM25 retrieval row: query terms present in the fixture vocabulary
  private val Bm25Terms = Seq("spark", "query", "merge")
  private val Bm25K = 20

  // span-dedup parameters: 8-token spans, drop spans that occur >= 5
  // times corpus-wide; the injected footer stands in for boilerplate
  // (the fixture text has none naturally)
  private val SpanW = 8
  private val SpanThr = 5
  private val SpanBoiler = " subscribe to our newsletter for free updates today"

  def queries: Map[String, QFn] = Map(
    "q_text_lang" -> ((s, d) => {
      val padded = concat(lit(" "), norm(col("text")), lit(" "))
      val scores = markers.map { case (l, ws) =>
        l -> ws.map(w => occ(padded, w)).reduce(_ + _)
      }
      // argmax with deterministic lang-asc tiebreak; all-zero → 'und'.
      // ONE array_max over (score, -langIdx, lang) structs: a when-fold
      // here duplicates the accumulated tree at every step (2^langs
      // copies of every score expression — blows codegen out of
      // whole-stage limits); struct-max keeps each score expression in
      // the plan exactly once.
      val entries = langOrder.zipWithIndex.map { case (l, i) =>
        struct(scores(l).as("s"), lit(-i).as("r"), lit(l).as("l"))
      }
      val top = array_max(array(entries: _*))
      val pred = when(top.getField("s") > 0, top.getField("l")).otherwise(lit("und"))
      t(s, d, "documents")
        .select(col("doc_id"), pred.as("pred_lang"), col("lang").as("tagged_lang"))
    }),
    "q_text_quality" -> ((s, d) => {
      // quality signals: length, word count, mean word length, punctuation
      // ratio, stopword ratio — all literal string ops (cross-engine safe)
      val n = norm(col("text"))
      val nWords = size(split(n, " ")).cast("long")
      val nSpaces = occ(n, " ")
      val punct = Seq(".", ",", "!", "?").map(w => occ(n, w)).reduce(_ + _)
      val stop = Seq(" the ", " and ", " of ").map(w =>
        occ(concat(lit(" "), n, lit(" ")), w)).reduce(_ + _)
      t(s, d, "documents").select(
        col("doc_id"),
        length(n).cast("long").as("len"),
        nWords.as("n_words"),
        ((length(n) - nSpaces).cast("double") / nWords.cast("double")).as("avg_word_len"),
        (punct.cast("double") / length(n).cast("double")).as("punct_ratio"),
        (stop.cast("double") / nWords.cast("double")).as("stop_ratio"),
        col("n_chars").cast("long").as("n_chars"))
    }),
    "q_text_tokens" -> ((s, d) => {
      val n = norm(col("text"))
      val toks = split(n, " ")
      // BPE-ish tokenizer: one token per alnum run + one per punct char
      // (runs collapsed to \u0001 then counted with the literal trick)
      val collapsed = regexp_replace(n, "[a-z0-9]+", "\u0001")
      val runs = (length(collapsed) -
        length(regexp_replace(collapsed, "\u0001", ""))).cast("long")
      val alnumChars = length(regexp_replace(n, "[^a-z0-9]", "")).cast("long")
      val punct = length(n).cast("long") - occ(n, " ") - alnumChars
      t(s, d, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        (runs + punct).as("n_subtok"),
        (size(array_distinct(toks)).cast("double") / size(toks).cast("double")).as("ttr"),
        (length(n).cast("double") / size(toks).cast("double")).as("avg_tok_len_incl_sep"))
    }),
    "q_text_fingerprint" -> ((s, d) => {
      val toks = split(norm(col("text")), " ")
      t(s, d, "documents").select(
        col("doc_id"),
        md5(norm(col("text"))).as("content_md5"),
        h32(concat_ws(" ", array_sort(array_distinct(toks)))).as("bow_fp"))
    }),
    // intra-doc repetition: duplicate-trigram fraction (Gopher-style
    // quality rule) — pure per-row array work, no shuffle
    "q_text_repetition" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        graft.functions.GraftFunctions.duplicateNgramRatio(col("text"), 3)
          .as("dup3_ratio"))),
    // BM25-family scored retrieval: postings filtered to the query
    // terms BEFORE any shuffle, df stats broadcast, TakeOrdered top-k.
    // The compared variant uses the rational idf + integer-cleared
    // constants (see ops.Bm25) so scores are cross-engine exact.
    "q_text_bm25" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id").as("id"), split(norm(col("text")), " ").as("toks"))
      graft.ops.Bm25.topKRationalMicro(toks, "id", "toks", Bm25Terms, Bm25K)
    }),
    // PII redaction over a deterministically-injected corpus (the
    // fixture text is clean, so both engines append the same synthetic
    // email + phone per doc, redact, and compare the full strings)
    "q_text_redact" -> ((s, d) => {
      val dirty = concat(norm(col("text")),
        lit(" contact user"), col("doc_id"), lit("@example-mail.com or 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      t(s, d, "documents").select(
        col("doc_id"),
        graft.functions.GraftFunctions.redactPii(dirty).as("clean"))
    }),
    // sliding-window chunking: fixed-size token windows with stride —
    // projection + one explode, no shuffle (ops.Chunk)
    "q_chunk" -> ((s, d) =>
      graft.ops.Chunk.chunkTokens(
        t(s, d, "documents").select(col("doc_id"), col("text")),
        "doc_id", split(norm(col("text")), " "), size = 32, stride = 24)),
    // ---- corpus-level span (line/paragraph) dedup, CCNet-style
    // (Wenzek et al. 2019): split each doc into fixed-width token
    // spans, count each span's occurrences ACROSS THE CORPUS, drop
    // spans repeated >= threshold (boilerplate), and reassemble the
    // cleaned text in original span order. The fixture text carries no
    // natural boilerplate, so both engines append the same synthetic
    // footer per doc; the span grid cuts it at 8 alignment offsets, so
    // the dropped spans are the pure-boilerplate windows (~62 docs
    // share each alignment class) while mixed head windows survive —
    // exactly the miss pattern line-dedup has in production.
    // Scale shape: explode -> ONE window count over span (single hash
    // shuffle; no freq-table self-join) -> reassembly groupBy doc_id.
    // Both shuffles are on high-cardinality keys; nothing is
    // collected, nothing is quadratic. ----
    "q_dedup_spans" -> ((s, d) => {
      val W = SpanW
      val toks = split(concat(norm(col("text")), lit(SpanBoiler)), " ")
      val nSpans = floor((size(toks) + lit(W - 1)) / lit(W)).cast("int")
      val spans = transform(sequence(lit(1), nSpans), i =>
        array_join(slice(toks, (i - lit(1)) * W + lit(1), lit(W)), " "))
      val ex = t(s, d, "documents")
        .select(col("doc_id"), posexplode(spans).as(Seq("pos", "span")))
      val counted = ex.withColumn("cnt",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("span")))
      counted.groupBy("doc_id").agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("cnt") >= SpanThr, 1L).otherwise(0L)).as("n_dropped"),
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("cnt") < SpanThr, struct(col("pos"), col("span"))))),
          st => st.getField("span"))).as("clean_text"))
    }),
    // ---- n-gram LM quality score (CCNet-style perplexity proxy) kept
    // in COUNT SPACE for cross-engine exactness: corpus unigram +
    // bigram tables, per-doc integer sums of corpus counts, and ONE
    // final IEEE division per probability column (no libm log — see Q
    // header rules). mean_p is the doc's average unigram likelihood
    // under the corpus unigram LM; mean_p2 the bigram analog — low
    // values flag out-of-distribution / junk docs. Scale shape (r13,
    // single-pass — the r12 form re-exploded each gram table for its
    // join-back): ONE explode per gram order, collapsed FIRST to
    // per-(doc, token) counts (map-side combine, and it bounds the
    // next stage's partitions to ≤ #docs even for stopwords), corpus
    // frequency as a window SUM over the collapsed table (no
    // freq-table self-join, no recompute), grand totals from a
    // token-COUNT side scan (sum of doc lengths — no explode) riding a
    // broadcast crossJoin. ----
    "q_text_lm_score" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val toks = split(norm(col("text")), " ")
      def gramScore(grams: Column, tot: Column): DataFrame = {
        val byDocTok = docs.select(col("doc_id"), explode(grams).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        val wTok = org.apache.spark.sql.expressions.Window.partitionBy("tok")
        byDocTok.withColumn("cnt", sum(col("c")).over(wTok))
          .crossJoin(broadcast(docs.agg(tot.cast("long").as("total"))))
          .groupBy("doc_id").agg(
            sum(col("c")).cast("long").as("n_grams"),
            sum(col("c") * col("cnt")).cast("long").as("sum_cnt"),
            min(col("cnt")).cast("long").as("min_cnt"),
            (sum(col("c") * col("cnt")).cast("double") /
              (sum(col("c")) * first(col("total"))).cast("double")).as("mean_p"))
      }
      val uDoc = gramScore(toks, sum(size(toks)))
      // bigram total = Σ(len-1): every doc has ≥ 1 token (split of ""
      // is [""]) so len-1 is exactly its zip_with bigram count
      val bDoc = gramScore(
        zip_with(slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => concat(a, lit(" "), b)),
        sum(size(toks) - 1))
      // left join: a 1-token doc has no bigrams (absent here, zeros kept exact)
      uDoc.join(
          bDoc.select(col("doc_id"), col("n_grams").as("n_bigrams"),
            col("sum_cnt").as("sum_cnt2"), col("mean_p").as("mean_p2")),
          Seq("doc_id"), "left")
        .select(
          col("doc_id"), col("n_grams").as("n_tokens"), col("sum_cnt"),
          col("min_cnt"), col("mean_p"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("sum_cnt2"), lit(0L)).as("sum_cnt2"),
          coalesce(col("mean_p2"), lit(0.0)).as("mean_p2"))
    }),
    // corpus heavy hitters THROUGH the Misra-Gries sketch aggregate:
    // k (1024) exceeds the fixture vocabulary, so no counter is ever
    // decremented and the sketch is provably exact — the oracle checks
    // the aggregate's full update/merge/serialize path against plain
    // GROUP BY counts; the pruned-k approximation regime (the 100 TB
    // path) is HeavyHittersSpec's job
    "q_token_topk" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(explode(split(norm(col("text")), " ")).as("token"))
      toks.agg(graft.functions.GraftFunctions.approxTopK(col("token"), 1024).as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.token").as("token"), col("e.count").as("cnt"))
        .orderBy(col("cnt").desc, col("token").asc)
        .limit(20)
    })
  )

  def oracle: Map[String, String] = {
    val oPadded = s"(' ' || $oNorm || ' ')"
    val oScores = markers.map { case (l, ws) =>
      l -> ws.map(w => oOcc(oPadded, w)).mkString("(", " + ", ")")
    }
    // same fold as the Spark side, expressed as nested CASEs via a
    // greatest-with-tiebreak: pick first lang (asc) reaching the max
    val oBest = {
      val mx = s"greatest(${langOrder.map(oScores).mkString(", ")})"
      val cases = langOrder.map(l => s"WHEN $mx > 0 AND ${oScores(l)} = $mx THEN '$l'")
      s"CASE ${cases.mkString(" ")} ELSE 'und' END"
    }
    val oWords = s"CAST(len(string_split($oNorm, ' ')) AS BIGINT)"
    val oPunct = Seq(".", ",", "!", "?").map(w => oOcc(oNorm, w)).mkString("(", " + ", ")")
    val oStop = Seq(" the ", " and ", " of ").map(w => oOcc(oPadded, w)).mkString("(", " + ", ")")
    Map(
      "q_text_lang" ->
        s"SELECT doc_id, $oBest AS pred_lang, lang AS tagged_lang FROM documents",
      "q_text_quality" ->
        s"""SELECT doc_id,
            CAST(length($oNorm) AS BIGINT) AS len,
            $oWords AS n_words,
            CAST(length($oNorm) - ${oOcc(oNorm, " ")} AS DOUBLE) / CAST($oWords AS DOUBLE) AS avg_word_len,
            CAST($oPunct AS DOUBLE) / CAST(length($oNorm) AS DOUBLE) AS punct_ratio,
            CAST($oStop AS DOUBLE) / CAST($oWords AS DOUBLE) AS stop_ratio,
            CAST(n_chars AS BIGINT) AS n_chars
            FROM documents""",
      "q_text_tokens" -> {
        val oCollapsed = s"regexp_replace($oNorm, '[a-z0-9]+', chr(1), 'g')"
        val oRuns = s"CAST(length($oCollapsed) - length(replace($oCollapsed, chr(1), '')) AS BIGINT)"
        val oAlnum = s"CAST(length(regexp_replace($oNorm, '[^a-z0-9]', '', 'g')) AS BIGINT)"
        val oPunct = s"(CAST(length($oNorm) AS BIGINT) - ${oOcc(oNorm, " ")} - $oAlnum)"
        s"""SELECT doc_id,
            CAST(len(string_split($oNorm, ' ')) AS BIGINT) AS n_tokens,
            CAST(len(list_distinct(string_split($oNorm, ' '))) AS BIGINT) AS n_distinct,
            ($oRuns + $oPunct) AS n_subtok,
            CAST(len(list_distinct(string_split($oNorm, ' '))) AS DOUBLE) / CAST(len(string_split($oNorm, ' ')) AS DOUBLE) AS ttr,
            CAST(length($oNorm) AS DOUBLE) / CAST(len(string_split($oNorm, ' ')) AS DOUBLE) AS avg_tok_len_incl_sep
            FROM documents"""
      },
      "q_text_fingerprint" ->
        s"""SELECT doc_id, md5($oNorm) AS content_md5,
            ${oH32(s"array_to_string(list_sort(list_distinct(string_split($oNorm, ' '))), ' ')")} AS bow_fp
            FROM documents""",
      "q_text_repetition" ->
        s"""SELECT doc_id,
            CASE WHEN len(grams) = 0 THEN 0.0
                 ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
            END AS dup3_ratio
            FROM (SELECT doc_id,
                    [array_to_string(toks[i:i+2], ' ')
                     for i in generate_series(1, greatest(len(toks)-2, 0))] AS grams
                  FROM (SELECT doc_id, string_split($oNorm, ' ') AS toks
                        FROM documents))""",
      "q_text_redact" -> {
        val oDirty = s"($oNorm || ' contact user' || doc_id || '@example-mail.com or 555-' || " +
          "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))"
        s"""SELECT doc_id, ${graft.functions.GraftFunctions.oRedactPii(oDirty)} AS clean
            FROM documents"""
      },
      "q_text_bm25" ->
        s"""WITH toks AS (
              SELECT doc_id AS id, string_split($oNorm, ' ') AS toks
              FROM documents),
            ${graft.ops.Bm25.oTopKRationalMicro("toks", Bm25Terms, Bm25K)}""",
      // chunk arithmetic is all-integer (see ops.Chunk); DuckDB list
      // slicing toks[a:b] is 1-based inclusive = Spark slice(toks,a,32)
      "q_chunk" ->
        s"""WITH n AS (SELECT doc_id, string_split($oNorm, ' ') AS toks,
                              CAST(len(string_split($oNorm, ' ')) AS BIGINT) AS n
                       FROM documents),
                 c AS (SELECT doc_id, toks, n,
                              CASE WHEN n <= 32 THEN CAST(1 AS BIGINT)
                                   ELSE 1 + (n - 32 + 23) // 24 END AS chunks
                       FROM n)
            SELECT doc_id, i AS chunk_id, i * 24 AS start_tok,
                   least(CAST(32 AS BIGINT), n - i * 24) AS n_tok,
                   array_to_string(toks[i*24+1 : i*24+32], ' ') AS chunk_text
            FROM (SELECT doc_id, toks, n,
                         unnest(generate_series(0, chunks - 1)) AS i
                  FROM c)""",
      "q_token_topk" ->
        s"""SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(string_split($oNorm, ' ')) AS token FROM documents)
            GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20""",
      // span grid identical to Spark: 1-based inclusive list slice =
      // slice(toks, start, 8); integer ceil via // on BIGINTs;
      // string_agg(ORDER BY pos) skips NULLs = concat_ws over
      // collect_list of null-when-dropped structs
      "q_dedup_spans" ->
        s"""WITH corpus AS (SELECT doc_id, $oNorm || '$SpanBoiler' AS norm FROM documents),
            tok AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM corpus),
            spans0 AS (SELECT doc_id,
              [array_to_string(toks[(i-1)*$SpanW+1:(i-1)*$SpanW+$SpanW], ' ')
               for i in generate_series(1, CAST((len(toks)+${SpanW - 1})//$SpanW AS INT))] AS spans
              FROM tok),
            spans AS (SELECT doc_id, unnest(spans) AS span,
                             unnest(generate_series(1, len(spans))) AS pos
                      FROM spans0),
            counted AS (SELECT doc_id, pos, span,
                               count(*) OVER (PARTITION BY span) AS cnt
                        FROM spans)
            SELECT doc_id,
              CAST(count(*) AS BIGINT) AS n_spans,
              CAST(sum(CASE WHEN cnt >= $SpanThr THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
              coalesce(string_agg(CASE WHEN cnt < $SpanThr THEN span END, ' ' ORDER BY pos),
                       '') AS clean_text
            FROM counted GROUP BY doc_id""",
      // count-space LM score: integer sums of corpus counts, one final
      // division per probability (IEEE-exact both engines)
      "q_text_lm_score" ->
        s"""WITH corpus AS (SELECT doc_id, $oNorm AS norm FROM documents),
            uni AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS tok FROM corpus),
            ufreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM uni GROUP BY tok),
            utot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM ufreq),
            udoc AS (SELECT doc_id,
                       CAST(count(*) AS BIGINT) AS n_tokens,
                       CAST(sum(cnt) AS BIGINT) AS sum_cnt,
                       CAST(min(cnt) AS BIGINT) AS min_cnt,
                       CAST(sum(cnt) AS DOUBLE)
                         / CAST(count(*) * any_value(total) AS DOUBLE) AS mean_p
                     FROM uni JOIN ufreq USING (tok) CROSS JOIN utot
                     GROUP BY doc_id),
            btoks AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM corpus),
            bi AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1]
                                          for i in generate_series(1, len(toks)-1)]) AS tok
                   FROM btoks),
            bfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM bi GROUP BY tok),
            btot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM bfreq),
            bdoc AS (SELECT doc_id,
                       CAST(count(*) AS BIGINT) AS n_bigrams,
                       CAST(sum(cnt) AS BIGINT) AS sum_cnt2,
                       CAST(sum(cnt) AS DOUBLE)
                         / CAST(count(*) * any_value(total) AS DOUBLE) AS mean_p2
                     FROM bi JOIN bfreq USING (tok) CROSS JOIN btot
                     GROUP BY doc_id)
            SELECT u.doc_id, u.n_tokens, u.sum_cnt, u.min_cnt, u.mean_p,
                   coalesce(b.n_bigrams, 0) AS n_bigrams,
                   coalesce(b.sum_cnt2, 0) AS sum_cnt2,
                   coalesce(b.mean_p2, 0.0) AS mean_p2
            FROM udoc u LEFT JOIN bdoc b ON u.doc_id = b.doc_id"""
    )
  }
}
