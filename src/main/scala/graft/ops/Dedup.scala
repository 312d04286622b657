package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Everything here is shuffle-minimal by construction:
  *   - exact dedup: one hash-groupBy on the content fingerprint;
  *   - MinHash+LSH near-dup: per-row signature (no shuffle) → explode to
  *     (band, key) buckets → equi-join *within* buckets. Never an
  *     all-pairs crossJoin; at 100 TB the bucket join shuffles only
  *     (numBands × rows), and bucket skew is bounded by the band width.
  *   - SimHash: pure per-row fold (aggregate HOF), zero shuffle.
  *
  * All hashing goes through md5-derived [[h32]] so a SQL oracle
  * (DuckDB) can reproduce signatures bit-for-bit.
  */
object Dedup {

  /** md5 prefix as a long via the native [[Md5Prefix64]] expression —
    * one digest, no hex-string round-trip. Halves recover the oracle's
    * CONV(SUBSTRING(md5(x), 1|9, 8), 16, 10) values exactly. */
  private def md5p64(c: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      org.apache.spark.sql.graft.Md5Prefix64(
        org.apache.spark.sql.graft.Shims.expression(c)))
  private val LoMask = 4294967295L // low 32 bits

  /** 32-bit-ish seeded hash, cross-engine reproducible:
    * first 8 md5 hex chars of "seed|x" as a BIGINT. */
  def h32(seed: Int, c: Column): Column =
    shiftrightunsigned(md5p64(concat(lit(s"$seed|"), c)), 32)
  def oH32(seed: Int, x: String): String =
    s"CAST('0x' || substr(md5('$seed|' || $x), 1, 8) AS BIGINT)"

  def normTokens(text: Column): Column = split(lower(trim(text)), " ")

  /** Word n-gram shingles of a token array (empty if fewer than n). */
  def shingles(tokens: Column, n: Int): Column =
    when(size(tokens) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(tokens, i + k)): _*)))
  def oShingles(toks: String, n: Int): String = {
    val gram = (0 until n).map(k => s"$toks[i+$k]").mkString(" || ' ' || ")
    s"""CASE WHEN len($toks) < $n THEN [] ELSE
        list_transform(range(1, len($toks) - ${n - 2}), i -> $gram) END"""
  }

  // One md5 per shingle; the per-seed hash family is derived by linear
  // transforms of two 32-bit halves (classic (a·p1 + b·p2 + j) mod M) —
  // 6× less hashing than an md5 per seed, same LSH guarantees.
  private val P1 = Seq(15485863L, 32452843L, 49979687L, 67867967L, 86028121L, 98765431L)
  private val P2 = Seq(11L, 101L, 1009L, 10007L, 100003L, 1000003L)
  private val M = 2147483647L
  require(P1.size >= 6 && P2.size >= 6)

  /** MinHash signatures via explode → partial-aggregated min per seed.
    * The explode/combine shape keeps the shuffle at (id × numHashes)
    * longs regardless of document size — the scalable form at 100 TB.
    * Input: (id, toks); output: (id, sig array<long>). */
  def minhashSignatures(toks: DataFrame, shingleN: Int, numHashes: Int): DataFrame = {
    require(numHashes <= P1.size, s"at most ${P1.size} hash functions")
    val ex = toks.select(col("id"),
      explode(shingles(col("toks"), shingleN)).as("s"))
    // one digest per shingle; the two projections stay separate
    // (CollapseProject keeps non-cheap exprs single-use), so the hash
    // runs once and the halves are long arithmetic
    val ab = ex.select(col("id"), md5p64(col("s")).as("h"))
      .select(col("id"),
        shiftrightunsigned(col("h"), 32).as("a"),
        col("h").bitwiseAND(lit(LoMask)).as("b"))
    ab.groupBy("id").agg(
      array((0 until numHashes).map(j =>
        min((col("a") * P1(j) + col("b") * P2(j) + j) % M)): _*).as("sig"))
  }

  /** DuckDB oracle mirror of [[minhashSignatures]]: emits (id, sig) SQL
    * given a CTE named `toksRel(id, toks)`. */
  def oMinhashSignatures(toksRel: String, shingleN: Int, numHashes: Int): String = {
    val sh = oShingles("toks", shingleN)
    val mins = (0 until numHashes).map(j =>
      s"min((a * ${P1(j)} + b * ${P2(j)} + $j) % $M)").mkString("[", ", ", "]")
    s"""SELECT id, $mins AS sig FROM (
          SELECT id,
            CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) AS a,
            CAST('0x' || substr(md5(s), 9, 8) AS BIGINT) AS b
          FROM (SELECT id, unnest($sh) AS s FROM $toksRel))
        GROUP BY id"""
  }

  /** Banded-LSH candidate pairs: ids sharing any band of the signature.
    * `rowsPerBand` consecutive minhashes form one band key. Returns
    * distinct (a, b) with a < b. */
  def lshCandidates(
      sigDf: DataFrame, // (id: long, sig: array<long>)
      numHashes: Int,
      bands: Int): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must divide evenly into bands ($bands) — " +
        "trailing hashes would be silently ignored")
    val rows = numHashes / bands
    val banded = sigDf
      // a short signature would NULL out element_at lookups, and
      // concat_ws silently DROPS nulls — colliding band keys across
      // unrelated rows; guard on the array length instead
      .filter(size(col("sig")) >= numHashes)
      .select(
        col("id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            concat_ws("_", (0 until rows).map(r =>
              element_at(col("sig"), b * rows + r + 1)): _*).as("key"))
        }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
      .filter(col("key") =!= "")
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()
  }

  /** Exact token-set Jaccard for verifying candidates: |A∩B| / |A∪B|
    * computed in exact integers, one final double division. */
  def jaccard(tokA: Column, tokB: Column): Column = {
    val da = array_distinct(tokA); val db = array_distinct(tokB)
    val inter = size(array_intersect(da, db)).cast("long")
    val uni = (size(da) + size(db)).cast("long") - inter
    (inter.cast("double") / uni.cast("double"))
  }

  /** Token set as SORTED distinct 64-bit md5 prefixes — hashed ONCE at
    * tokenization so the per-pair verify is a primitive merge scan, not
    * a string hash-set build per candidate (the verify join also ships
    * 8-byte longs instead of UTF8 tokens). 64-bit prefixes make a
    * collision (two distinct tokens of one document colliding)
    * ~n²/2⁶⁵ per document — deterministic and reproduced bit-for-bit
    * by the oracle, which hashes the same way ([[oTokenHashes]]). */
  def tokenHashes(toks: Column): Column =
    sort_array(array_distinct(transform(toks, t => md5p64(t))))
  def oTokenHashes(toks: String): String =
    s"list_sort(list_distinct(list_transform($toks, x -> CAST('0x' || substr(md5(x), 1, 16) AS UBIGINT))))"

  /** Jaccard over [[tokenHashes]] arrays: one native merge scan per
    * pair. Equal counts ⇒ bit-identical ratio to the oracle's. */
  def jaccardHashed(hashA: Column, hashB: Column): Column = {
    import org.apache.spark.sql.graft.{Shims, SortedLongIntersect}
    val inter = Shims.column(SortedLongIntersect(
      Shims.expression(hashA), Shims.expression(hashB)))
    val uni = (size(hashA) + size(hashB)).cast("long") - inter
    (inter.cast("double") / uni.cast("double"))
  }

  /** Per-doc gram tables for the exact n-gram Jaccard join: value-sorted
    * distinct hashed grams (`ghs`, the merge-scan verify input) plus the
    * PREFIX-FILTER candidate grams (`prefix`). Prefix filtering
    * (published literature: Chaudhuri et al. 2006 primitive operator;
    * Xiao et al. PPJoin Lemma 1: |A∩B| ≥ t implies the
    * (|A|−t+1)-prefix of A and the (|B|−t+1)-prefix of B intersect
    * under one global total order). Instantiation here, per pair with
    * J(A,B) ≥ τ: |A∩B| ≥ τ·|A∪B| ≥ τ·max(|A|,|B|), so the lemma holds
    * with t = max(⌈τ|A|⌉, ⌈τ|B|⌉) — and each side's stored
    * |g| − ⌈τ·|g|⌉ + 1 prefix is at least as long as that lemma
    * requires, so the candidate join is COMPLETE for threshold τ.
    * Ordering grams by ASCENDING document frequency makes the prefixes
    * the rarest grams, so the candidate equi-join stays near-linear
    * where a share-any-gram join explodes on stopword grams — the
    * at-scale shape of an EXACT similarity join (completeness does not
    * depend on the order; rarity only shrinks the candidate set). */
  def ngramDocTables(toks: DataFrame, shingleN: Int, tau: Double): DataFrame = {
    val grams = toks.select(col("id"),
        explode(shingles(col("toks"), shingleN)).as("s"))
      .select(col("id"), md5p64(col("s")).as("gh"))
      .distinct()
    // document frequency as a WINDOW count over the distinct gram table
    // (r20 optimization round): the previous groupBy(gh)+join-back shape
    // re-shuffled the gram table a second time to attach df; one
    // gh-partitioned window serves the same exact counts in a single
    // exchange (the q_text_lm_score shape). Skew-safe like the groupBy:
    // a hot gram's partition holds its (id, gh) rows either way.
    val freq = org.apache.spark.sql.expressions.Window.partitionBy("gh")
    grams.withColumn("df", count(lit(1)).over(freq))
      .groupBy("id").agg(
        sort_array(collect_list(col("gh"))).as("ghs"),
        transform(sort_array(collect_list(struct(col("df"), col("gh")))),
          x => x.getField("gh")).as("ordered"))
      // t = ceil(τ·|g|) − 1, one gram LOOSER than the exact rational
      // ceiling: double arithmetic can overshoot it (ceil(0.07 * 100) =
      // 8 in IEEE where the rational value is exactly 7), and an
      // overshot t shortens the prefix past completeness — a pair at
      // exactly τ would vanish from an "exact" join. One extra prefix
      // gram costs a few candidates and rigorously covers the ≤1-ulp
      // division slack in the verify compare too.
      .withColumn("plen",
        least(size(col("ordered")),
          size(col("ordered"))
            - greatest(ceil(lit(tau) * size(col("ordered"))).cast("int") - 1, lit(0))
            + 1))
      .select(col("id"), col("ghs"), size(col("ghs")).as("sz"),
        slice(col("ordered"), lit(1), col("plen")).as("prefix"))
  }

  /** Prefix-filter candidate pairs: ids sharing a prefix gram, a < b,
    * with PPJoin's two pair-level refinements applied inside the join
    * (both with one integer of slack so IEEE arithmetic can never cut a
    * qualifying pair):
    *  - SIZE filter: J ≥ τ forces τ·max(|A|,|B|) ≤ min(|A|,|B|).
    *  - POSITIONAL filter: let x be the globally-first common gram, at
    *    0-based df-order positions pA/pB. Every gram before x on either
    *    side is non-common (x is the order-minimum of A∩B), so
    *    |A∩B| ≤ min(|A|−pA, |B|−pB); J ≥ τ forces
    *    |A∩B| ≥ τ/(1+τ)·(|A|+|B|). Lemma 1's proof puts x inside BOTH
    *    prefixes, so the qualifying pair always survives through x's
    *    join row — rows for later shared grams may prune, which only
    *    drops duplicates the distinct would eat anyway. On copy-heavy
    *    corpora (near-identical docs sharing most prefix grams) this
    *    cuts the join output severalfold before the verify join ships
    *    any gram arrays. */
  def ngramCandidatePairs(docs: DataFrame, tau: Double): DataFrame = {
    val pre = docs.select(col("id"), col("sz"),
      posexplode(col("prefix")).as(Seq("pos", "gh")))
    val szA = col("l.sz").cast("double"); val szB = col("r.sz").cast("double")
    pre.as("l").join(pre.as("r"),
        col("l.gh") === col("r.gh") && col("l.id") < col("r.id") &&
          least(szA, szB) + lit(1.0) >= lit(tau) * greatest(szA, szB) &&
          least(col("l.sz") - col("l.pos"), col("r.sz") - col("r.pos"))
            .cast("double") + lit(1.0) >= lit(tau / (1.0 + tau)) * (szA + szB))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()
  }

  /** EXACT n-gram Jaccard near-dup join: prefix-filter candidates →
    * one native merge scan per pair → threshold. Unlike the MinHash
    * row (probabilistic recall by design), the result here is exactly
    * every pair with gram-Jaccard ≥ τ — the oracle recomputes it with
    * NO candidate stage, so a green row proves the prefix filter lost
    * nothing on real data. Input (id, toks); output (a, b, jacc). */
  def ngramJaccardPairs(toks: DataFrame, shingleN: Int, tau: Double): DataFrame = {
    // the doc tables feed three consumers (candidate join twice, verify
    // twice) — checkpoint so the shingle→hash→df→sort pipeline runs
    // once per call, not per consumer (blocks are GC'd with the frame)
    val docs = ngramDocTables(toks, shingleN, tau).localCheckpoint()
    val cands = ngramCandidatePairs(docs, tau)
    cands
      .join(docs.select(col("id"), col("ghs")).as("da"), col("a") === col("da.id"))
      .join(docs.select(col("id"), col("ghs")).as("db"), col("b") === col("db.id"))
      .select(col("a"), col("b"),
        jaccardHashed(col("da.ghs"), col("db.ghs")).as("jacc"))
      .filter(col("jacc") >= tau)
  }

  /** 16-bit SimHash fingerprints: bit j is set iff
    * Σ_distinct-tokens (±1 by bit j of h32(token)) ≥ 0.
    *
    * Shape: explode → one md5 per token → 16 partially-aggregated bit
    * votes → final bit-combine over the agg RESULT columns. Expression-
    * level folds re-evaluate the hash once per bit (HOF lambdas have no
    * let-binding), so the explode/combine form is both the cheap and the
    * 100 TB-safe one — the shuffle carries (id × 16) longs.
    * Input: (id, toks); output: (id, simhash16). */
  def simhashSignatures(toks: DataFrame): DataFrame = {
    val ex = toks.select(col("id"),
      explode(array_distinct(col("toks"))).as("tok"))
    val hashed = ex.select(col("id"), h32(0, col("tok")).as("h"))
    val votes = hashed.groupBy("id").agg(
      sum(when(shiftright(col("h"), 0).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as("v0"),
      (1 until 16).map(j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"v$j")): _*)
    votes.select(col("id"),
      (0 until 16).map(j =>
        when(col(s"v$j") >= 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _).as("simhash16"))
  }
  def oSimhash16(toks: String): String = {
    val dt = s"list_distinct($toks)"
    (0 until 16).map { j =>
      val vote = s"list_sum(list_transform($dt, x -> CASE WHEN (${oH32(0, "x")} >> $j) & 1 = 1 THEN 1 ELSE -1 END))"
      s"CASE WHEN $vote >= 0 THEN ${1L << j} ELSE 0 END"
    }.mkString("(", " + ", ")")
  }

  /** Duplicate-cluster assignment: connected components over the verified
    * candidate-pair graph, labelling every member with the minimum id in
    * its component (the canonical representative).
    *
    * Pair detection (LSH + exact-Jaccard verify) yields PAIRS; real dedup
    * needs CLUSTERS — (a,b) and (b,c) must collapse to one survivor, not
    * two independent drops. This is min-label propagation: each round a
    * node adopts the smallest label among itself and its neighbours
    * (one equi-join + one min-groupBy = two shuffles per round), so
    * convergence takes graph-diameter rounds. Near-dup graphs are
    * near-cliques (every pair of a duplicated doc collides in some band),
    * so the diameter is small — typically 2-3 rounds regardless of corpus
    * size; `maxIter` is a loud upper bound, never a silent truncation.
    * Convergence is detected by an exact decimal label-sum fixpoint
    * (labels only ever decrease, so equal sums ⇒ no label moved).
    * Each round's labels are persisted (materialized by the fixpoint
    * check — one job per round, not an eager-checkpoint job plus a sum
    * job) and the previous round's blocks are dropped immediately; a
    * localCheckpoint every few rounds truncates lineage so a
    * pathologically deep graph can't grow the plan unboundedly.
    *
    * `assumeDistinct = true` skips the defensive edge-dedup shuffle —
    * sound whenever the input is already distinct (a, b) pairs with
    * a < b, as [[lshCandidates]] produces; duplicate edges would only
    * cost join width, never change the result.
    *
    * Input: (a, b) pair rows (any extra columns ignored).
    * Output: (id, component) for every id appearing in a pair —
    * singletons are by definition not duplicates and are left out. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25,
      assumeDistinct: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val oriented = pairs.select(col("a"), col("b"))
    // Distinct (a,b) with a < b stays distinct after adding the
    // reversed copies, so the defensive dedup shuffle is skippable.
    val sym = oriented.union(pairs.select(col("b").as("a"), col("a").as("b")))
    val edgesWide = (if (assumeDistinct) sym else sym.distinct()).persist()
    // Size the loop to the pair graph, not the session: the candidate
    // graph is orders of magnitude smaller than the corpus (only
    // near-dup members appear), but its stages inherit the session's
    // shuffle width — dozens of tasks per round of pure scheduling
    // overhead on a few thousand edges. coalesce (narrow, reads the
    // cache, keeps map-side combine) to ~1M edges/task, capped at the
    // session width so a genuinely huge graph keeps its parallelism.
    val edgeCount = edgesWide.count()
    val w = math.max(1L, math.min(
      edgesWide.sparkSession.sessionState.conf.numShufflePartitions.toLong,
      (edgeCount + 999999L) / 1000000L)).toInt
    val edges = edgesWide.coalesce(w)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("component").cast(DecimalType(38, 0)))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO) // empty pair set: already converged
    // Seed with min(self ∪ neighbours) rather than min(self): over the
    // symmetric edge set that is just min(least(a, b)) per node — one
    // projection, one shuffle — and it IS the first propagation round:
    // on near-clique duplicate graphs every member sees the canonical
    // min immediately, so the loop below only runs the one confirming
    // round the fixpoint check needs.
    // Every round's labels are a LAZY localCheckpoint, materialized by
    // the fixpoint-sum action — one job per round (an eager checkpoint
    // would add a second). Checkpoint rather than persist() on purpose:
    // a persisted round KEEPS its lineage, so unpersisting the previous
    // round makes the CacheManager invalidate and lazily REBUILD the
    // dependent round's buffers from scratch — rounds then recompute
    // the whole chain and grow linearly (measured: 0.7 s → 1.1 s →
    // 2.5 s). A checkpointed round has no lineage, so freeing its
    // predecessor (Shims.freeLocalCheckpoint — block-level, invisible
    // to the CacheManager) cannot invalidate it.
    var labels = edges
      .select(col("a").as("id"), least(col("a"), col("b")).as("component"))
      .groupBy("id").agg(min("component").as("component"))
      .coalesce(w)
      .localCheckpoint(eager = false)
    var prev = labelSum(labels)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val prop = edges.join(labels, edges("b") === labels("id"))
        .select(edges("a").as("id"), col("component"))
      val next = labels.union(prop)
        .groupBy("id").agg(min("component").as("component"))
        .coalesce(w)
        .localCheckpoint(eager = false)
      val cur = labelSum(next)
      // next is fully materialized by the labelSum action; drop the
      // previous round's pinned blocks NOW — checkpointed blocks are
      // otherwise freed only by driver-GC-driven ContextCleaner, which
      // a large-heap driver may not run for hours.
      org.apache.spark.sql.graft.Shims.freeLocalCheckpoint(labels)
      converged = cur.compareTo(prev) == 0
      prev = cur
      labels = next
      it += 1
    }
    edgesWide.unpersist()
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — the pair " +
        "graph has a longer chain than near-dup clusters should produce; " +
        "raise maxIter explicitly if chained similarity is expected")
    labels
  }

  /** DuckDB oracle mirror of [[connectedComponents]] given a CTE named
    * `pairsRel(a, b)`: min reachable id per node via a recursive CTE.
    * Must be spliced into a `WITH RECURSIVE` clause. */
  def oConnectedComponents(pairsRel: String): String =
    s"""cc_e AS (SELECT a, b FROM $pairsRel UNION SELECT b, a FROM $pairsRel),
        cc_n AS (SELECT DISTINCT a AS id FROM cc_e),
        cc_reach(id, r) AS (
          SELECT id, id FROM cc_n
          UNION
          SELECT cc_e.b AS id, cc_reach.r FROM cc_reach
          JOIN cc_e ON cc_e.a = cc_reach.id)"""

  /** Keeps one survivor per duplicate cluster: docs whose id is either
    * not in any verified pair, or is its cluster's canonical (min) id.
    * `components` is [[connectedComponents]] output. A plain left-anti
    * join — the drop set can be a large fraction of the corpus at scale,
    * so the broadcast-vs-shuffle choice is left to AQE. */
  def keepCanonical(docs: DataFrame, idCol: String, components: DataFrame): DataFrame = {
    val drops = components.filter(col("id") =!= col("component")).select(col("id"))
    docs.join(drops, docs(idCol) === drops("id"), "left_anti")
  }

  /** Streaming exact dedup: keep the FIRST arrival of each content
    * fingerprint, with state bounded by the event-time watermark — the
    * continuous-ingest form of [[q_dedup_exact]]'s hash-groupBy.
    *
    * `dropDuplicatesWithinWatermark` is the scale-correct primitive: an
    * unbounded `dropDuplicates` would grow the dedup state forever on a
    * 100 TB feed, while the watermark form expires each fingerprint once
    * no duplicate can still arrive (duplicates in real pipelines are
    * re-crawls/re-sends clustered in time). Keys are the md5 of the
    * normalized text, so state rows are fingerprint-sized, never
    * document-sized, and the stateful exchange shuffles only
    * (fingerprint, ts) plus pass-through columns.
    *
    * `events` must be a STREAMING DataFrame with `tsCol` an event-time
    * timestamp column. Emits the input columns plus `content_md5`. */
  def streamingExactDedup(events: DataFrame, textCol: String, tsCol: String,
      dedupWindow: String): DataFrame = {
    require(events.isStreaming,
      "streamingExactDedup needs a streaming frame; use a hash-groupBy for batch")
    events
      .withColumn("content_md5", md5(lower(trim(col(textCol)))))
      .withWatermark(tsCol, dedupWindow)
      .dropDuplicatesWithinWatermark("content_md5")
  }

  /** Per-ROW MinHash signature — the same hash family, shingling, and
    * constants as [[minhashSignatures]], evaluated as one expression
    * instead of an explode+groupBy (spec-asserted equal). The HOF form
    * re-hashes each shingle once per seed (the batch doc explains why
    * explode+combine wins there); per arriving document on a stream
    * that trade reverses: no shuffle, no state, just a projection. */
  def rowMinhashSig(toks: Column, shingleN: Int, numHashes: Int): Column = {
    require(numHashes <= P1.size, s"at most ${P1.size} hash functions")
    val sh = shingles(toks, shingleN)
    array((0 until numHashes).map { j =>
      array_min(transform(sh, { s =>
        val h = md5p64(s)
        (shiftrightunsigned(h, 32) * P1(j) +
          h.bitwiseAND(lit(LoMask)) * P2(j) + lit(j.toLong)) % M
      }))
    }: _*)
  }

  /** A streaming near-dup hit: `id` arrived while `dup_of` (an earlier
    * arrival) was still in LSH-bucket state, with signature-estimated
    * jaccard `est`. The same pair can surface from up to `bands`
    * buckets — distinct() downstream (the emission is append-only). */
  case class NearDupHit(id: Long, dup_of: Long, est: Double)
  /** Internal wire/state rows of [[streamingNearDup]] — public only
    * because encoder codegen must construct them. */
  case class BandedDoc(bucket: String, id: Long, ts_us: Long,
      sig: Seq[Long], et: java.sql.Timestamp)
  case class BucketState(entries: List[(Long, Seq[Long])], lastUs: Long)

  /** Streaming MinHash near-dup: the continuous-ingest form of the
    * LSH pipeline — each arriving document's per-row signature routes
    * it to its band buckets ([[lshCandidates]]' exact keys), and a
    * `flatMapGroupsWithState` per bucket flags it against the
    * signatures still held there (estimated jaccard = matching minhash
    * fraction ≥ `tau`).
    *
    * State is doubly bounded, which is what makes this viable on an
    * unbounded feed: event-time timeout drops a bucket once the
    * watermark passes its last arrival + `windowUs` (near-dups in real
    * pipelines are re-crawls clustered in time — the exact-dedup
    * argument), and each bucket holds at most `maxBucket` recent
    * signatures (a bucket hotter than that is a degenerate band — keys
    * are minhash tuples, so natural buckets are tiny; the cap sheds the
    * OLDEST first and only ever costs recall against pathological
    * input, never correctness of what is emitted).
    *
    * `docs` must be a streaming frame carrying `idCol` (long),
    * `toksCol` (array&lt;string&gt;), and event-time `tsCol`. Emitted
    * hits orient later-arrival → earlier-arrival, append-only. */
  def streamingNearDup(docs: DataFrame, idCol: String, toksCol: String,
      tsCol: String, windowUs: Long, shingleN: Int = 3, numHashes: Int = 6,
      bands: Int = 3, tau: Double = 0.5,
      maxBucket: Int = 64): org.apache.spark.sql.Dataset[NearDupHit] = {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(docs.isStreaming,
      "streamingNearDup needs a streaming frame; use minhashSignatures + " +
        "lshCandidates for batch")
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must divide evenly into bands ($bands)")
    require(windowUs > 0 && tau > 0 && tau <= 1 && maxBucket > 0)
    val rows = numHashes / bands
    val sig = rowMinhashSig(col(toksCol), shingleN, numHashes)
    val banded = docs
      .select(col(idCol).cast("long").as("id"),
        unix_micros(col(tsCol)).as("ts_us"),
        col(tsCol).as("et"), sig.as("sig"))
      // docs too short to shingle have null minhashes — nothing to match
      .filter(size(col("sig")) === numHashes &&
        !exists(col("sig"), s => s.isNull))
      .withWatermark("et", s"$windowUs microseconds")
      .select(explode(array((0 until bands).map { b =>
          concat_ws("_", lit(b) +: (0 until rows).map(r =>
            element_at(col("sig"), b * rows + r + 1)): _*)
        }: _*)).as("bucket"),
        col("id"), col("ts_us"), col("sig"), col("et"))

    implicit val inEnc: Encoder[BandedDoc] = Encoders.product[BandedDoc]
    implicit val outEnc: Encoder[NearDupHit] = Encoders.product[NearDupHit]
    implicit val stEnc: Encoder[BucketState] = Encoders.product[BucketState]
    implicit val keyEnc: Encoder[String] = Encoders.STRING

    def est(a: Seq[Long], b: Seq[Long]): Double =
      a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / numHashes

    def fn(bucket: String, it: Iterator[BandedDoc],
        state: GroupState[BucketState]): Iterator[NearDupHit] = {
      if (it.isEmpty && state.hasTimedOut) { state.remove(); return Iterator.empty }
      var entries = state.getOption.map(_.entries).getOrElse(Nil)
      var lastUs = state.getOption.map(_.lastUs).getOrElse(Long.MinValue)
      val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
      // micro-batch arrivals are unordered; process in event order so
      // in-batch pairs orient later → earlier like cross-batch ones
      it.toArray.sortBy(d => (d.ts_us, d.id)).foreach { d =>
        entries.iterator
          .filter { case (eid, esig) => eid != d.id && est(esig, d.sig) >= tau }
          .foreach { case (eid, esig) => out += NearDupHit(d.id, eid, est(esig, d.sig)) }
        entries = ((d.id, d.sig) :: entries).take(maxBucket)
        lastUs = math.max(lastUs, d.ts_us)
      }
      state.update(BucketState(entries, lastUs))
      state.setTimeoutTimestamp(lastUs / 1000L + windowUs / 1000L + 1L)
      out.iterator
    }

    banded.as[BandedDoc]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
