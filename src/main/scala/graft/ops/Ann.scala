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

  /** Exact integer dot product of two equal-length long vectors — a
    * native codegen expression (tight JIT'd loop), not an interpreted
    * HOF fold; the hot path of every ANN/near-dup candidate pair. */
  def dotQ(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.{LongVectorDot, Shims}
    Shims.column(LongVectorDot(Shims.expression(a), Shims.expression(b)))
  }
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

  /** Sign-random-projection bucket signature of a quantized vector —
    * a native codegen expression ([[org.apache.spark.sql.graft.SrpSignature]]):
    * the plane matrix rides as one flat constant and the dots run in a
    * tight JIT'd loop (r12 — the previous nested-`aggregate` HOF fold
    * was interpreted per plane per row and dominated the LSH signature
    * stage; this is bit-identical, same IEEE summation order).
    * `planeOffset` selects a band of `numPlanes` rows from `planes` —
    * the hook for multi-table amplification. Flat-cost in dim (no
    * expression-tree blowup at dim 768 and beyond). */
  private def srpSignatureWith(
      qv: Column, planes: Seq[Seq[Double]], numPlanes: Int,
      planeOffset: Column): Column = {
    import org.apache.spark.sql.graft.{Shims, SrpSignature}
    Shims.column(SrpSignature(
      Shims.expression(qv),
      Shims.expression(planeOffset.cast("int")),
      planes.flatten.toIndexedSeq, numPlanes))
  }

  private def planeMatrix(totalPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until totalPlanes).map(p => (0 until dim).map(i => planeComponent(p, i)))

  def srpSignature(qv: Column, dim: Int, numPlanes: Int): Column =
    srpSignatureWith(qv, planeMatrix(numPlanes, dim), numPlanes, lit(0))

  /** Embedding-cosine near-duplicate pairs, exact: every (a, b) with
    * id_a < id_b and cosine ≥ minCos. One side broadcasts — the brief's
    * brute-force baseline; use [[cosinePairsLsh]] as the scale path.
    * `vecs`: (id: long, qv: array<long>, nq: long). */
  def cosinePairsExact(vecs: DataFrame, minCos: Double): DataFrame = {
    val a = vecs.as("a")
    val b = broadcast(vecs).as("b")
    val dot = dotQ(col("a.qv"), col("b.qv"))
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineQ(dot, col("a.nq"), col("b.nq")).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Embedding-cosine near-dup pairs, LSH-bucketed (the 100 TB path):
    * multi-table SRP signatures generate candidates via equi-join, the
    * exact cosine filters residually, duplicates collapse per pair.
    * Approximate — recall vs [[cosinePairsExact]] is spec-measured and
    * rises with `tables`. */
  def cosinePairsLsh(vecs: DataFrame, dim: Int, numPlanes: Int,
      tables: Int, minCos: Double): DataFrame = {
    val j = lshJoined(vecs, dim, numPlanes, tables)
    val dot = dotQ(col("a.qv"), col("b.qv"))
    j.select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineQ(dot, col("a.nq"), col("b.nq")).as("cos"))
      .filter(col("cos") >= minCos)
      .groupBy("id_a", "id_b").agg(max("cos").as("cos"))
  }

  /** The banded self-join both LSH pair paths share: one row per
    * id-ordered pair AND colliding (table, signature) — the exact
    * residual evaluates per collision (recomputing a dot beats
    * re-shuffling both vectors through a pre-dedup). */
  private def lshJoined(vecs: DataFrame, dim: Int, numPlanes: Int,
      tables: Int): DataFrame = {
    require(tables >= 1 && numPlanes <= 62,
      "per-table signature must fit a long")
    val planes = planeMatrix(numPlanes * tables, dim)
    val tCol = explode(array((0 until tables).map(lit): _*))
    def withSig(df: DataFrame) = df
      .withColumn("t", tCol)
      .withColumn("sig",
        srpSignatureWith(col("qv"), planes, numPlanes, col("t") * numPlanes))
    val a = withSig(vecs).as("a")
    val b = withSig(vecs).as("b")
    a.join(b,
      col("a.t") === col("b.t") && col("a.sig") === col("b.sig") &&
        col("a.id") < col("b.id"))
  }

  /** Distinct candidate pairs the banded join emits BEFORE the exact
    * residual — the pruning measurement the spec gates. "No cartesian"
    * alone is satisfiable by a degenerate signature that passes every
    * pair through the equi-join; the LSH claim is candidates ≪ n(n-1)/2,
    * and this is the number that says so. */
  def lshCandidatePairs(vecs: DataFrame, dim: Int, numPlanes: Int,
      tables: Int): DataFrame =
    lshJoined(vecs, dim, numPlanes, tables)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path the brief
    * names next to LSH. `nlist` k-means centroids split the corpus into
    * cells; a query probes only its `nprobe` nearest cells, so the pair
    * space collapses from |Q|·|C| to |Q|·(nprobe/nlist)·|C| while the
    * candidate generation stays a plain equi-join on the cell id.
    *
    * No RNG anywhere: seeds are the `nlist` smallest-id vectors and
    * assignment ties break toward the lower cell id. The only run-to-run
    * wiggle is float-sum order inside `avg` (partition-order dependent),
    * which can nudge a centroid by an ulp — recall specs use thresholds,
    * and the full-probe correctness row (`q_ann_ivf`) is independent of
    * the assignment entirely.
    *
    * 100 TB shape:
    *   - training runs on a caller-chosen sample (standard IVF practice;
    *     centroid quality needs thousands of points, not the corpus) —
    *     the element-wise mean shuffles |sample|·dim (cell, pos, value)
    *     triples, never the corpus;
    *   - centroids (nlist·dim doubles — KBs) collect to the driver and
    *     ship back as ONE array literal, so cell assignment of the full
    *     corpus is a pure projection: zero shuffle, prunable, and the
    *     assignment can be persisted as a table column and bucketed on;
    *   - search explodes each query into nprobe cell keys and equi-joins
    *     corpus cells — never a cartesian.
    */
  def trainCentroids(sample: DataFrame, nlist: Int, iters: Int): Seq[Seq[Double]] = {
    require(nlist >= 1 && iters >= 1, s"need nlist >= 1, iters >= 1")
    // deterministic seeds: the nlist smallest ids
    var centroids: Seq[Seq[Double]] = sample.orderBy(col("id")).limit(nlist)
      .select(col("qv")).collect()
      .map(_.getSeq[Long](0).map(_.toDouble).toSeq).toSeq
    require(centroids.size == nlist, s"sample smaller than nlist=$nlist")
    val dim = centroids.head.size
    for (_ <- 0 until iters) {
      // element-wise mean per cell: explode to (cell, pos, x), two-level
      // aggregate, rebuild the vector sorted by position
      val assigned = sample.withColumn("cell", nearestCell(col("qv"), centroids))
      val next = assigned
        .select(col("cell"), posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg(col("x").cast("double")).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ps"))
        .select(col("cell"), transform(col("ps"), p => p.getField("m")).as("cv"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      // a cell that lost all members keeps its old centroid
      centroids = centroids.indices.map(i => next.getOrElse(i, centroids(i)))
    }
    require(centroids.forall(_.size == dim), "centroid dim drift")
    centroids
  }

  /** Cell ids of the `nprobe` nearest centroids (by exact L2 over the
    * quantized ints), nearest first; ONE fold over a centroid literal —
    * flat codegen cost, no expression blowup with nlist or dim. */
  private def nearestCells(qv: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column = {
    val cLit = typedLit(centroids)
    val dists = transform(sequence(lit(0), lit(centroids.size - 1)), c =>
      struct(
        aggregate(
          zip_with(qv, element_at(cLit, (c + 1).cast("int")),
            (x, m) => { val d = x.cast("double") - m; d * d }),
          lit(0.0), (a, x) => a + x).as("d"),
        c.cast("int").as("cell")))
    slice(array_sort(dists), 1, nprobe)
  }

  def nearestCell(qv: Column, centroids: Seq[Seq[Double]]): Column =
    nearestCells(qv, centroids, 1).getItem(0).getField("cell")

  /** IVF search: corpus cells from [[nearestCell]] (a projection — at
    * scale this column is precomputed and stored), queries explode into
    * nprobe probe cells, candidates come from the cell equi-join, exact
    * cosine ranks them. `queries`/`corpus`: (id, qv, nq). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      centroids: Seq[Seq[Double]], nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nprobe >= 1 && nprobe <= centroids.size, "1 <= nprobe <= nlist")
    val cs = corpus.withColumn("cell", nearestCell(col("qv"), centroids)).as("c")
    val qs = queries
      .withColumn("cell",
        explode(transform(nearestCells(col("qv"), centroids, nprobe),
          s => s.getField("cell"))))
      .as("q")
    val dot = dotQ(col("q.qv"), col("c.qv"))
    val scored = qs.join(cs,
        col("q.cell") === col("c.cell") && col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        cosineQ(dot, col("q.nq"), col("c.nq")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.select(col("query_id"), col("neighbor_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }

  // ---- Product quantization (IVF-PQ) ------------------------------
  //
  // The memory/compute path for ANN at 100 TB: corpus vectors are
  // stored as M small codes (one byte-ish each) instead of D floats —
  // a 64-dim float vector becomes 8 codes — and candidate scoring is
  // ADC (asymmetric distance computation): each QUERY precomputes an
  // M×ksub lookup table of subvector·centroid partial dots ONCE, and
  // every candidate pair costs M table lookups instead of D multiplies.
  // In plan terms the LUT is a query-side column (tiny array), codes
  // are a corpus-side column (precompute + store at scale), and the
  // probe join stays the IVF cell equi-join — never a cartesian.

  /** Per-block PQ codebooks: k-means (via [[trainCentroids]]) on each
    * dim/M slice of a corpus sample. `sample`: (id, qv). */
  def pqTrain(sample: DataFrame, m: Int, ksub: Int, iters: Int,
      dim: Int): Seq[Seq[Seq[Double]]] = {
    require(dim % m == 0, s"dim $dim must split evenly into $m blocks")
    val dsub = dim / m
    (0 until m).map { b =>
      trainCentroids(
        sample.select(col("id"), slice(col("qv"), b * dsub + 1, dsub).as("qv")),
        ksub, iters)
    }
  }

  /** PQ codes of a quantized vector: per block, the nearest codebook
    * centroid's index (array<int>, one entry per block). At scale this
    * column is computed once at ingest and stored with the table. */
  def pqEncode(qv: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val dsub = codebooks.head.head.size
    array(codebooks.zipWithIndex.map { case (cb, b) =>
      nearestCell(slice(qv, b * dsub + 1, dsub), cb)
    }: _*)
  }

  /** Corpus-side PQ materialization: the (cell, codes) columns an
    * ingest job computes ONCE and stores with the table — [[ivfPqTopK]]
    * skips re-encoding when they're present. At 100 TB the search then
    * reads only (id, cell, codes, nq): bytes per vector instead of the
    * full embedding. */
  def pqEncodeCorpus(corpus: DataFrame,
      centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame =
    corpus
      .withColumn("cell", nearestCell(col("qv"), centroids))
      .withColumn("codes", pqEncode(col("qv"), codebooks))

  /** Per-query ADC lookup table: lut[b][c] = query-subvector · centroid
    * partial dot — M×ksub doubles, computed once per query row. */
  def pqLut(qv: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val dsub = codebooks.head.head.size
    array(codebooks.zipWithIndex.map { case (cb, b) =>
      val cbLit = typedLit(cb)
      transform(sequence(lit(0), lit(cb.size - 1)), c =>
        aggregate(
          zip_with(slice(qv, b * dsub + 1, dsub),
            element_at(cbLit, (c + 1).cast("int")),
            (x, mm) => x.cast("double") * mm),
          lit(0.0), (a, x) => a + x))
    }: _*)
  }

  /** ADC approximate dot product: M lookups, no vector arithmetic —
    * a native codegen expression (the HOF double-element_at fold is
    * interpreted per block per candidate and dominated the probe). */
  private def adcDot(lut: Column, codes: Column, m: Int): Column = {
    import org.apache.spark.sql.graft.{AdcDot, Shims}
    val _ = m // block count carried by the arrays themselves
    Shims.column(AdcDot(Shims.expression(lut), Shims.expression(codes)))
  }

  /** IVF-PQ search with exact re-ranking: probe the `nprobe` nearest
    * cells, score candidates by ADC (M lookups/pair), keep the top
    * `rerank` per query, then re-score THOSE exactly and return the
    * exact-cosine top-k. With nprobe = nlist and rerank ≥ corpus size
    * this is exactly [[bruteForceTopK]] (the CORRECTNESS anchor);
    * shrinking nprobe/rerank trades recall for probe + rescore cost.
    * `queries`/`corpus`: (id, qv, nq). */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      centroids: Seq[Seq[Double]], nprobe: Int,
      codebooks: Seq[Seq[Seq[Double]]], rerank: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rerank >= k, s"rerank pool ($rerank) must cover k ($k)")
    val m = codebooks.size
    // a corpus that already carries (cell, codes) — the stored-at-ingest
    // shape ([[pqEncodeCorpus]]) — skips re-encoding
    val cs = (if (Seq("cell", "codes").forall(corpus.columns.contains)) corpus
      else pqEncodeCorpus(corpus, centroids, codebooks)).as("c")
    val qs = queries
      .withColumn("lut", pqLut(col("qv"), codebooks))
      .withColumn("cell",
        explode(transform(nearestCells(col("qv"), centroids, nprobe),
          s => s.getField("cell"))))
      .as("q")
    // stage 1: ADC score — M lookups per candidate, no vector math.
    // Only (ids, score) flow through the ranking shuffle; full vectors
    // stay OUT of the candidate stream (that's PQ's memory win — at
    // scale the corpus side of this join reads just cell+codes+nq).
    val adc = qs.join(cs,
        col("q.cell") === col("c.cell") && col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        (adcDot(col("q.lut"), col("c.codes"), m).cast("double") /
          sqrt(col("q.nq").cast("double") * col("c.nq").cast("double")))
          .as("adc_cos"))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc_cos").desc, col("neighbor_id").asc)
    val pool = adc
      .withColumn("adc_rnk", row_number().over(wAdc))
      .filter(col("adc_rnk") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    // stage 2: exact rescoring of the small pool only — fetch vectors
    // by id (queries broadcast; the corpus fetch is a rerank·|Q|-row
    // equi-join, not a corpus-wide rescore)
    val exact = pool
      .join(broadcast(queries.select(col("id"), col("qv"), col("nq")).as("q2")),
        col("query_id") === col("q2.id"))
      .join(corpus.select(col("id"), col("qv"), col("nq")).as("c2"),
        col("neighbor_id") === col("c2.id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineQ(dotQ(col("q2.qv"), col("c2.qv")),
          col("q2.nq"), col("c2.nq")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    exact.select(col("query_id"), col("neighbor_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }

  // ---- Label-centroid audit --------------------------------------
  //
  // The label-noise QA step of a training-data pipeline: classify every
  // embedding to its nearest LABEL CENTROID by cosine and cross-tabulate
  // against the stored label — off-diagonal mass is candidate mislabels.
  // Cosine is scale-invariant, so the un-divided integer SUM vector IS
  // the centroid for classification purposes: everything up to the final
  // sqrt/divide stays exact integers and the result is bit-identical
  // across engines (the Q.scala determinism rule).

  /** Per-label integer centroid sums: Σ qv over each label. One
    * posexplode + groupBy shuffle over (label, pos); the result is
    * labels × dim rows — metadata-sized, collected to the driver like
    * the IVF centroids. `emb`: (id, qv, label). */
  def labelCentroidSums(emb: DataFrame): Seq[(Int, Seq[Long])] =
    emb.select(col("label"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(sum("v").as("s"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("s")))).as("ps"))
      .select(col("label"), transform(col("ps"), p => p.getField("s")).as("sv"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1)))
      .sortBy(_._1)
      .toSeq

  /** Nearest-centroid label by cosine (ties → smaller label). A pure
    * broadcast projection — k cosines per row via the codegen'd dot,
    * no join, no shuffle; the corpus streams once. */
  def nearestLabelByCosine(qv: Column, nq: Column,
      cents: Seq[(Int, Seq[Long])]): Column = {
    require(cents.nonEmpty, "no label centroids")
    val scored = cents.map { case (lbl, sv) =>
      val ns = sv.map(x => x * x).sum // exact on the driver
      struct(
        cosineQ(dotQ(qv, typedLit(sv)), nq, lit(ns)).as("cos"),
        lit(-lbl).as("negLabel"))
    }
    // array_max orders structs lexicographically: highest cosine, then
    // highest negLabel = smallest label
    (array_max(array(scored: _*)).getField("negLabel") * -1).cast("int")
  }

  /** Bucketed ANN: equi-join on the SRP signature, then top-k within the
    * candidate set. Approximate — pairs in different buckets are missed.
    * `tables` > 1 turns on OR-amplification (the reference's multi-table
    * LSH): each side explodes into `tables` independently-planed
    * signatures, a pair is a candidate if ANY table buckets it together,
    * and duplicates collapse in the pair-level aggregate before top-k.
    * Recall rises with tables at linear cost in signature compute and
    * join fan-out — still an equi-join, never a cartesian. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int, numPlanes: Int, tables: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tables >= 1 && numPlanes <= 62,
      "per-table signature must fit a long")
    val planes = planeMatrix(numPlanes * tables, dim)
    val tCol = explode(array((0 until tables).map(lit): _*))
    def withSig(df: DataFrame) = df
      .withColumn("t", tCol)
      .withColumn("sig",
        srpSignatureWith(col("qv"), planes, numPlanes, col("t") * numPlanes))
    val qs = withSig(queries).as("q")
    val cs = withSig(corpus).as("c")
    val dot = dotQ(col("q.qv"), col("c.qv"))
    val scored = qs.join(cs,
        col("q.t") === col("c.t") && col("q.sig") === col("c.sig") &&
          col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        cosineQ(dot, col("q.nq"), col("c.nq")).as("cos"))
    // a pair found by several tables scores identically — collapse before
    // ranking so multi-table candidates don't duplicate in the top-k
    val uniquePairs =
      if (tables == 1) scored
      else scored.groupBy("query_id", "neighbor_id").agg(max("cos").as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    uniquePairs.select(col("query_id"), col("neighbor_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= k)
  }
}
