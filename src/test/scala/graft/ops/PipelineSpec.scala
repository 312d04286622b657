package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.TestSpark

/** Scale-shape checks for the dedup/ANN operators: the LSH paths must be
  * bucket joins (never cartesian) and must actually recall the pairs the
  * exact methods find. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("md5_prefix64 halves equal the hex-string CONV formulation") {
    import spark.implicits._
    // covers empty, multi-byte UTF-8, and a spread of short strings —
    // the native digest must reproduce the oracle-parity hex path on
    // every input or signatures silently drift from the DuckDB oracle
    val df = (Seq("", "a", "hello world", "héllo ünïcode £€", "0|tok",
      "a b c", "\t x ") ++ (1 to 500).map(i => s"doc $i token ${i * 37}")).toDF("s")
    val h = org.apache.spark.sql.graft.Shims.column(
      org.apache.spark.sql.graft.Md5Prefix64(
        org.apache.spark.sql.graft.Shims.expression(col("s"))))
    val bad = df.select(
      shiftrightunsigned(h, 32).as("a1"),
      h.bitwiseAND(lit(4294967295L)).as("b1"),
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("a2"),
      conv(substring(md5(col("s")), 9, 8), 16, 10).cast("long").as("b2"))
      .filter(col("a1") =!= col("a2") || col("b1") =!= col("b2"))
    assert(bad.count() == 0, s"digest halves diverge: ${bad.take(3).mkString}")
    // null flows through as null, like every unary expression
    assert(Seq[String](null).toDF("s")
      .select(shiftrightunsigned(org.apache.spark.sql.graft.Shims.column(
        org.apache.spark.sql.graft.Md5Prefix64(
          org.apache.spark.sql.graft.Shims.expression(col("s")))), 32).as("h"))
      .collect().head.isNullAt(0))
  }

  test("minhash LSH recalls seeded near-duplicate pairs, no cartesian join") {
    val base = docs.select(col("doc_id").as("id"), lower(trim(col("text"))).as("norm"))
    val copies = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("id"),
        lower(trim(expr("substring(text, locate(' ', text) + 1)"))).as("norm"))
    val corpus = base.union(copies)
    val toks = corpus.select(col("id"), Dedup.normTokens(col("norm")).as("toks"))
      .filter(size(col("toks")) >= 3)
    val sig = Dedup.minhashSignatures(toks, 3, 6)
    val cand = Dedup.lshCandidates(sig, 6, 3)
    assert(!cand.queryExecution.executedPlan.toString.contains("Cartesian"),
      "LSH candidates must be an equi-join on bucket keys")
    val seeded = copies.count()
    val found = cand
      .filter(col("b") === col("a") + 1000000L).count()
    assert(found >= (seeded * 0.9).toLong,
      s"LSH recall too low: $found of $seeded seeded pairs")
  }

  test("simhash of identical docs is identical, near-dup differs little") {
    def fp = Dedup.simhashSignatures(docs.limit(50).select(
      col("doc_id").as("id"),
      Dedup.normTokens(lower(trim(col("text")))).as("toks")))
    assert(fp.collect().toSet == fp.collect().toSet) // deterministic
    assert(fp.count() == 50)
  }

  test("SRP-bucketed ANN is an equi-join and overlaps brute-force top-5") {
    val e = emb.select(col("vec_id").as("id"), Ann.quantize(col("embedding")).as("qv"))
      .withColumn("nq", Ann.normQ(col("qv")))
    val queries = e.filter(col("id") % 20 === 0)
    val exact = Ann.bruteForceTopK(queries, e, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(queries, e, 5, dim = 64, numPlanes = 4)
    assert(!approx.queryExecution.executedPlan.toString.contains("Cartesian"),
      "bucketed ANN must join on the SRP signature")
    val approxPairs = approx.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approxPairs).size.toDouble / exact.size
    assert(recall > 0.1, s"SRP recall unexpectedly low: $recall")
    assert(approxPairs.subsetOf(
      exact ++ approxPairs), "sanity") // approx pairs are real neighbors of real queries

    // OR-amplification: 4 independent tables must not lose recall, and
    // per-(query, k) output stays unique despite multi-table candidates
    val multi = Ann.lshTopK(queries, e, 5, dim = 64, numPlanes = 4, tables = 4)
    assert(!multi.queryExecution.executedPlan.toString.contains("Cartesian"))
    val multiRows = multi.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(multiRows.length == multiRows.distinct.length, "duplicate pairs in top-k")
    val multiRecall = (exact & multiRows.toSet).size.toDouble / exact.size
    assert(multiRecall >= recall,
      s"multi-table recall $multiRecall fell below single-table $recall")
  }

  test("IVF ANN: cell equi-join, pruned-probe recall, full probe = exact") {
    val e = emb.select(col("vec_id").as("id"), Ann.quantize(col("embedding")).as("qv"))
      .withColumn("nq", Ann.normQ(col("qv")))
    val cents = Ann.trainCentroids(e.select("id", "qv"), nlist = 8, iters = 3)
    assert(cents.size == 8 && cents.forall(_.size == 64))
    // training moved centroids off their seeds (Lloyd actually ran)
    val seeds = e.orderBy("id").limit(8).select("qv").collect()
      .map(_.getSeq[Long](0).map(_.toDouble).toSeq)
    assert(cents.count(seeds.contains) < 8, "no centroid update happened")

    val queries = e.filter(col("id") % 20 === 0)
    val exact = Ann.bruteForceTopK(queries, e, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // pruned probe: candidates from the cell equi-join only
    val pruned = Ann.ivfTopK(queries, e, 5, cents, nprobe = 3)
    assert(!pruned.queryExecution.executedPlan.toString.contains("Cartesian"),
      "IVF candidates must come from the cell equi-join")
    val prunedPairs = pruned.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & prunedPairs).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF nprobe=3/8 recall unexpectedly low: $recall")
    assert(prunedPairs.subsetOf(
      Ann.bruteForceTopK(queries, e, 500).select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet),
      "IVF must never invent neighbors")

    // full probe: the cell partition stops mattering — exact equality
    val full = Ann.ivfTopK(queries, e, 5, cents, nprobe = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, "nprobe = nlist must reproduce brute force exactly")
  }

  test("IVF-PQ ANN: ADC probe + exact rerank; full probe+pool = exact; pruned recalls") {
    val e = emb.select(col("vec_id").as("id"), Ann.quantize(col("embedding")).as("qv"))
      .withColumn("nq", Ann.normQ(col("qv")))
    val cents = Ann.trainCentroids(e.select("id", "qv"), nlist = 8, iters = 2)
    val books = Ann.pqTrain(e.select("id", "qv"), m = 8, ksub = 16, iters = 2, dim = 64)
    assert(books.size == 8 && books.forall(b => b.size == 16 && b.forall(_.size == 8)))

    val queries = e.filter(col("id") % 20 === 0)
    val exact = Ann.bruteForceTopK(queries, e, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // full probe + corpus-wide rerank pool: ADC ordering stops
    // mattering, the exact rescore must reproduce brute force
    val full = Ann.ivfPqTopK(queries, e, 5, cents, nprobe = 8, books, rerank = 500)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, "full probe + full pool must equal brute force")

    // pruned probe + small rerank pool: the production shape — an
    // equi-join probe (never cartesian) with useful recall
    val pruned = Ann.ivfPqTopK(queries, e, 5, cents, nprobe = 3, books, rerank = 25)
    assert(!pruned.queryExecution.executedPlan.toString.contains("Cartesian"))
    val prunedPairs = pruned.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & prunedPairs).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF-PQ nprobe=3/8 rerank=25 recall too low: $recall")
    assert(prunedPairs.subsetOf(exactTopPairs(queries, e, 500)),
      "IVF-PQ must never invent neighbors")

    // stored-at-ingest path: a pre-encoded corpus (pqEncodeCorpus) must
    // give byte-identical results to encode-at-query
    val preEncoded = Ann.pqEncodeCorpus(e, cents, books)
    val viaStored = Ann.ivfPqTopK(queries, preEncoded, 5, cents,
        nprobe = 8, books, rerank = 500)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaStored == exact, "pre-encoded corpus must match encode-at-query")
  }

  private def exactTopPairs(queries: org.apache.spark.sql.DataFrame,
      corpus: org.apache.spark.sql.DataFrame, k: Int): Set[(Long, Long)] =
    Ann.bruteForceTopK(queries, corpus, k).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("label-centroid audit: centroid members classify home; plan is join-free") {
    import spark.implicits._
    // two orthogonal clusters: label 0 lives on axis x, label 1 on axis y;
    // a mislabeled y-axis vector must be predicted 1 while labeled 0
    val rows = Seq(
      (1L, Seq(100L, 0L, 0L, 0L), 0),
      (2L, Seq(90L, 10L, 0L, 0L), 0),
      (3L, Seq(0L, 100L, 0L, 0L), 1),
      (4L, Seq(10L, 90L, 0L, 0L), 1),
      (5L, Seq(0L, 95L, 5L, 0L), 0)) // mislabeled
      .toDF("id", "qv", "label")
    val emb = rows.withColumn("nq", Ann.normQ(col("qv")))
    val cents = Ann.labelCentroidSums(emb)
    assert(cents.map(_._1) == Seq(0, 1))
    val pred = emb.select(col("id"),
        Ann.nearestLabelByCosine(col("qv"), col("nq"), cents).as("p"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(pred(1) == 0 && pred(2) == 0 && pred(3) == 1 && pred(4) == 1)
    assert(pred(5) == 1, "mislabeled vector must classify to its true cluster")
    // classification is a projection: no join anywhere in the plan
    val plan = emb.select(
        Ann.nearestLabelByCosine(col("qv"), col("nq"), cents))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free plan:\n$plan")
  }

  test("embedding near-dup pairs: LSH path recalls exact pairs, equi-join only") {
    val e = emb.select(col("vec_id").as("id"), Ann.quantize(col("embedding")).as("qv"))
      .withColumn("nq", Ann.normQ(col("qv")))
    val exact = Ann.cosinePairsExact(e, 0.35).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "threshold should yield some pairs")
    val lsh = Ann.cosinePairsLsh(e, dim = 64, numPlanes = 3, tables = 8, minCos = 0.35)
    assert(!lsh.queryExecution.executedPlan.toString.contains("Cartesian"),
      "LSH pairs must be an equi-join on (table, signature)")
    val got = lsh.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "duplicate pairs")
    assert(got.toSet.subsetOf(exact), "LSH must not invent pairs (exact residual)")
    val recall = (exact & got.toSet).size.toDouble / exact.size
    assert(recall >= 0.5, s"embedding near-dup recall too low: $recall")
  }

  test("embedding near-dup PRODUCTION regime: planted dups recalled, pair space actually pruned") {
    // the regime q_dedup_embedding_lsh benches: high threshold (true
    // near-dups), 10 planes x 8 tables. The corpus has no natural
    // >= 0.9 pairs (max natural cosine ~0.6), so near-dups are PLANTED:
    // one deterministic perturbed copy per vector, pair cosine ~0.94.
    val base = emb.select(col("vec_id").as("id"), col("embedding"))
    val pert = base.select(
      (col("id") + lit(10000000L)).as("id"),
      transform(col("embedding"), (x, i) =>
        x * (lit(1.0) + lit(0.35) *
          when(pmod(col("id") + i, lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0)))).as("embedding"))
    val corpus = base.unionByName(pert)
      .select(col("id"), Ann.quantize(col("embedding")).as("qv"))
      .withColumn("nq", Ann.normQ(col("qv")))
    val n = corpus.count()
    val exact = Ann.cosinePairsExact(corpus, 0.9).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the planted pairs ARE near-dups under the exact definition
    assert(exact.size >= (n / 2 * 9) / 10,
      s"planting failed: only ${exact.size} exact pairs for ${n / 2} plants")

    val lsh = Ann.cosinePairsLsh(corpus, dim = 64, numPlanes = 10,
      tables = 8, minCos = 0.9)
    assert(!lsh.queryExecution.executedPlan.toString.contains("Cartesian"))
    val got = lsh.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact), "LSH must not invent pairs (exact residual)")
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.85, s"production-regime recall too low: $recall")

    // THE pruning assertion: the banded join must emit a small fraction
    // of the n(n-1)/2 pair space. (An equi-join that passes everything
    // — e.g. too few planes — satisfies "no cartesian" while doing the
    // exact row's quadratic work; this is the number that catches it.)
    val candidates = Ann.lshCandidatePairs(corpus, dim = 64,
      numPlanes = 10, tables = 8).count()
    val allPairs = n * (n - 1) / 2
    assert(candidates < allPairs / 20,
      s"LSH pruned nothing: $candidates candidates of $allPairs pairs")
  }

  test("hashed jaccard equals the exact string-set jaccard on the real corpus") {
    import spark.implicits._
    // every candidate pair of the actual near-dup corpus must score
    // identically through the hashed merge-scan path and the
    // string-set reference formulation (64-bit token hashes: a
    // divergence means a collision or a merge-scan bug — both must
    // surface here, not as a silent oracle mismatch)
    val toks = docs.select(col("doc_id").as("id"),
        Dedup.normTokens(lower(trim(col("text")))).as("toks"))
      .filter(size(col("toks")) >= 3)
      .withColumn("th", Dedup.tokenHashes(col("toks")))
    val a = toks.as("a"); val b = toks.as("b")
    val scored = a.join(b, col("a.id") % 7 === col("b.id") % 7 &&
        col("a.id") < col("b.id"))
      .select(
        Dedup.jaccard(col("a.toks"), col("b.toks")).as("js"),
        Dedup.jaccardHashed(col("a.th"), col("b.th")).as("jh"))
    assert(scored.filter(col("js") =!= col("jh")).count() == 0)
    assert(scored.count() > 100, "equivalence checked on too few pairs")

    // merge-scan edge cases: empty, disjoint, identical, subset,
    // duplicate values (set semantics), negative hashes sort first
    def cnt(x: Seq[Long], y: Seq[Long]): Long =
      Seq((x.toArray, y.toArray)).toDF("x", "y")
        .select(org.apache.spark.sql.graft.Shims.column(
          org.apache.spark.sql.graft.SortedLongIntersect(
            org.apache.spark.sql.graft.Shims.expression(col("x")),
            org.apache.spark.sql.graft.Shims.expression(col("y")))))
        .collect().head.getLong(0)
    assert(cnt(Nil, Nil) == 0)
    assert(cnt(Seq(1L, 2L), Nil) == 0)
    assert(cnt(Seq(1L, 3L, 5L), Seq(2L, 4L)) == 0)
    assert(cnt(Seq(-5L, -1L, 3L), Seq(-5L, -1L, 3L)) == 3)
    assert(cnt(Seq(-5L, -1L, 3L), Seq(-1L)) == 1)
    assert(cnt(Seq(1L, 1L, 2L), Seq(1L, 2L, 2L)) == 2)
  }

  test("prefix-filtered n-gram jaccard equals brute force and prunes the pair space") {
    // corpus with planted near-dups: each %5 doc re-appears with its
    // first word dropped (high but not perfect gram overlap)
    val mut = when(locate(" ", col("text")) > 0,
      col("text").substr(locate(" ", col("text")) + 1, length(col("text"))))
      .otherwise(col("text"))
    val corpus = docs.select(col("doc_id").as("id"), lower(trim(col("text"))).as("norm"))
      .union(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("id"), lower(trim(mut)).as("norm")))
    val toks = corpus.select(col("id"), Dedup.normTokens(col("norm")).as("toks"))
      .filter(size(col("toks")) >= 3)
    val tau = 0.6
    val got = Dedup.ngramJaccardPairs(toks, 3, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // brute-force reference: every pair, no candidate stage
    val tables = Dedup.ngramDocTables(toks, 3, tau)
    val a = tables.select(col("id"), col("ghs")).as("a")
    val b = tables.select(col("id"), col("ghs")).as("b")
    val brute = a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        Dedup.jaccardHashed(col("a.ghs"), col("b.ghs")).as("j"))
      .filter(col("j") >= tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute,
      s"prefix filter lost/invented pairs: missing=${(brute -- got).take(3)} " +
        s"extra=${(got -- brute).take(3)}")
    assert(got.nonEmpty, "planted near-dups must qualify at tau")

    // the pruning claim itself: candidates well under the full pair
    // space (this is what makes the EXACT join viable at scale)
    val n = tables.count()
    val cands = Dedup.ngramCandidatePairs(tables, tau).count()
    assert(cands < 0.25 * n * (n - 1) / 2,
      s"prefix filter barely pruned: $cands of ${n * (n - 1) / 2} pairs")
  }

  test("prefix length survives IEEE ceil overshoot at the tau boundary") {
    import spark.implicits._
    // ceil(0.07 * 100) = 8 in doubles (rationally exactly 7): doc A has
    // 100 distinct 1-grams, doc B is exactly A's 7 globally
    // most-frequent ones — jacc = 7/100 = tau qualifies, and an
    // overshot prefix excludes precisely those 7 from A's prefix and
    // silently drops the pair from an "exact" join.
    val tau = 0.07
    val aToks = (1 to 100).map(i => s"t$i")
    val bToks = (94 to 100).map(i => s"t$i")
    val filler = (1 to 5).map(f => (1000L + f, bToks))
    val docs = (Seq((1L, aToks), (2L, bToks)) ++ filler).toDF("id", "toks")
    val pairs = Dedup.ngramJaccardPairs(docs, 1, tau)
      .filter(col("a") === 1L && col("b") === 2L).collect()
    assert(pairs.length == 1, "the boundary pair must survive the prefix filter")
    assert(math.abs(pairs.head.getDouble(2) - 0.07) < 1e-12)
  }

  test("dot product of mismatched-length vectors fails loudly, not truncated") {
    import spark.implicits._
    // a dim mismatch must never yield a plausible-looking truncated cosine
    val df = Seq((Array(1L, 2L, 3L), Array(1L, 2L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(Ann.dotQ(col("a"), col("b"))).collect()
    }
    def rootMsg(t: Throwable): String =
      (t.getMessage + Option(t.getCause).map(rootMsg).getOrElse(""))
    assert(rootMsg(e).contains("length mismatch"), s"got: ${rootMsg(e)}")
    // equal lengths still work through the same path
    val ok = Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b")
      .select(Ann.dotQ(col("a"), col("b"))).collect().head.getLong(0)
    assert(ok == 32L)
  }

  test("deterministic sampling: stable buckets, accurate fractions, disjoint splits") {
    import spark.implicits._
    import graft.ops.Sample
    val ids = (0L until 20000L).toDF("id")

    // reproducible under reshuffling
    val a = Sample.sampleFraction(ids, "id", 0.3).collect().map(_.getLong(0)).sorted
    val b = Sample.sampleFraction(ids.repartition(13), "id", 0.3)
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    // fraction lands near target (multiplicative hash spreads well)
    assert(math.abs(a.length / 20000.0 - 0.3) < 0.02, s"got ${a.length / 20000.0}")

    // splits are a disjoint cover with weights respected
    val splits = Sample.assignSplit(ids, "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits.values.sum == 20000L)
    assert(math.abs(splits("train") / 20000.0 - 0.8) < 0.02)

    // a sub-1.0 spec leaves the remainder unassigned (null split)
    val dropped = Sample.assignSplit(ids, "id", Seq("keep" -> 0.5))
      .filter(col("split").isNull).count()
    assert(math.abs(dropped / 20000.0 - 0.5) < 0.02)

    // mixture: per-source fractions + source tag
    val mix = Sample.mixture(Seq(
      ("web", ids, 0.25), ("books", ids, 1.0)), "id")
    val bySrc = mix.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("books") == 20000L)
    assert(math.abs(bySrc("web") / 20000.0 - 0.25) < 0.02)

    // exact-count stratified: exactly n per stratum (capped by stratum
    // size), same selection at any parallelism
    val strat = ids.withColumn("g", (col("id") % 4).cast("string"))
    val s1 = Sample.stratifiedExact(strat, "g", "id", 7)
      .collect().map(r => (r.getString(1), r.getLong(0))).sorted.toSeq
    val s2 = Sample.stratifiedExact(strat.repartition(17), "g", "id", 7)
      .collect().map(r => (r.getString(1), r.getLong(0))).sorted.toSeq
    assert(s1 == s2 && s1.groupBy(_._1).values.forall(_.size == 7))
    val tiny = Sample.stratifiedExact(
      strat.filter(col("id") < 10), "g", "id", 7)
    assert(tiny.count() == 10L) // strata smaller than n keep all rows

    // hot stratum: ONE stratum holding ~all rows must not serialize into
    // a single window task — phase 1 ranks within (stratum, input
    // partition), so the plan's first window shuffles on (g, __part) and
    // only local top-n survivors reach the per-stratum exact rank
    val hot = ids.repartition(16).withColumn("g", lit("all"))
    val hotSel = Sample.stratifiedExact(hot, "g", "id", 7)
    val hotPlan = hotSel.queryExecution.executedPlan.toString
    assert("hashpartitioning\\([^)]*__part".r.findFirstIn(hotPlan).isDefined,
      s"expected phase-1 hashpartitioning on (stratum, __part) in:\n$hotPlan")
    // still exactly the n globally-smallest (bucket, id) rows
    val expectHot = (0L until 20000L)
      .map(i => (((i % 1000000000L) * 2654435761L) % 1000000007L % 10000L, i))
      .sorted.take(7).map(_._2).toSet
    assert(hotSel.collect().map(_.getLong(0)).toSet == expectHot)
  }

  test("training order: seeded bijective permutation, parallelism-invariant") {
    import spark.implicits._
    import graft.ops.Sample
    val ids = (0L until 5000L).toDF("id")

    val ordered = Sample.trainingOrder(ids, "id", seed = 42L, partitions = 8)
    val got = ordered.collect().map(r =>
      r.getLong(r.fieldIndex("id")) -> r.getLong(r.fieldIndex("pos"))).toMap
    // bijection onto 0..n-1
    assert(got.values.toSeq.sorted == (0L until 5000L),
      "pos must be a permutation of 0..n-1")
    // matches the single-task ground truth: rank of (shuffleKey, id)
    val truth = ids.withColumn("k", Sample.shuffleKey(col("id"), 42L))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .sorted.zipWithIndex
      .map { case ((_, id), i) => id -> i.toLong }.toMap
    assert(got == truth, "pos must equal the global (key, id) rank")
    // identical at any parallelism and input layout
    val again = Sample.trainingOrder(ids.repartition(13), "id",
        seed = 42L, partitions = 3)
      .collect().map(r =>
        r.getLong(r.fieldIndex("id")) -> r.getLong(r.fieldIndex("pos"))).toMap
    assert(again == got, "permutation must not depend on partitioning")
    // a different seed is a different permutation
    val other = Sample.trainingOrder(ids, "id", seed = 7L, partitions = 8)
      .collect().map(r =>
        r.getLong(r.fieldIndex("id")) -> r.getLong(r.fieldIndex("pos"))).toMap
    assert(other != got, "seed must change the order")
    // scale shape: the rank is computed per hash-uniform bucket (the
    // window shuffles on __bk), never as one global sort — AQE is free
    // to coalesce the tiny test OUTPUT afterwards, so partition count
    // is not the signal; the partitioning key is
    val plan = ordered.queryExecution.executedPlan.toString
    assert("hashpartitioning\\([^)]*__bk".r.findFirstIn(plan).isDefined,
      s"expected per-bucket rank partitioning in:\n$plan")
    // and the fixture really spans several buckets
    val nBk = ids.withColumn("b",
        expr(s"((${42L % 1000000000L} + id % 1000000000) * 2654435761 % 1000000007 * 8) div 1000000007"))
      .select("b").distinct().count()
    assert(nBk > 1, "fixture must span multiple coarse buckets")
    // the checkpoint-free default and the pinned-snapshot variant are
    // the same permutation (the stat and final passes recompute the
    // ranged plan deterministically; pinning only changes the storage/
    // recompute trade, never the result)
    val pinned = Sample.trainingOrder(ids, "id", seed = 42L, partitions = 8,
        pinSnapshot = true)
      .collect().map(r =>
        r.getLong(r.fieldIndex("id")) -> r.getLong(r.fieldIndex("pos"))).toMap
    assert(pinned == got, "pinSnapshot must not change the permutation")
  }

  test("sequence packing: shard-local bins, budget-aligned, parallelism-invariant") {
    import spark.implicits._
    import graft.ops.Pack
    // deterministic pseudo-random token counts, ids with gaps
    val docs = (0L until 1000L).map(i => (i * 3, (i * 37 % 190) + 10))
      .toDF("id", "tok")
    val budget = 500L
    val packed = Pack.packBins(docs, "id", col("tok"), budget, shardSize = 300L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)

    // identical assignment regardless of input partitioning
    val repacked = Pack.packBins(docs.repartition(7), "id", col("tok"), budget, 300L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(packed.sameElements(repacked), "packing must not depend on parallelism")

    // per shard: bins contiguous from 0; each doc's bin = pre-tokens div budget
    packed.groupBy(_._3).foreach { case (_, rows) =>
      val bins = rows.map(_._4).distinct.sorted
      assert(bins.head == 0L && bins.sameElements(0L to bins.last))
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, tok, _, bin) =>
        assert(bin == cum / budget)
        cum += tok
      }
    }

    // manifest aggregates agree with the per-doc view
    val man = Pack.binManifest(docs, "id", col("tok"), budget, 300L).collect()
    assert(man.map(_.getLong(2)).sum == 1000L) // n_docs covers every doc
    assert(man.map(_.getLong(3)).sum == packed.map(_._2).sum) // token totals match
  }
}
