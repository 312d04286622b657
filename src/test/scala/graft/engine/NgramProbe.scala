package graft.engine

/** Throwaway diagnostic main: size the q_dedup_ngram stages at sf1. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import graft.ops.Dedup
    val d = args.headOption.getOrElse("/tmp/graft_sf1")
    val docs0 = spark.read.parquet(s"$d/documents.parquet")
    val mut = when(locate(" ", col("text")) > 0,
      col("text").substr(locate(" ", col("text")) + 1, length(col("text"))))
      .otherwise(col("text"))
    val corpus = docs0.select(col("doc_id").as("id"), lower(trim(col("text"))).as("norm"))
      .union(docs0.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("id"), lower(trim(mut)).as("norm")))
    val toks = corpus.select(col("id"), Dedup.normTokens(col("norm")).as("toks"))
      .filter(size(col("toks")) >= 3)
    var t0 = System.nanoTime()
    val tables = Dedup.ngramDocTables(toks, 3, 0.6).localCheckpoint()
    println(s"== docTables: ${tables.count()} docs in ${(System.nanoTime()-t0)/1e9}%.1f s")
    t0 = System.nanoTime()
    val nc = Dedup.ngramCandidatePairs(tables, 0.6).count()
    println(s"== candidates: $nc in ${(System.nanoTime()-t0)/1e9} s")
    t0 = System.nanoTime()
    val np = Dedup.ngramJaccardPairs(toks, 3, 0.6).count()
    println(s"== final pairs: $np in ${(System.nanoTime()-t0)/1e9} s (full pipeline)")
    val stats = tables.select(avg(size(col("ghs"))).as("avg_g"), avg(size(col("prefix"))).as("avg_p")).collect()(0)
    println(s"== avg grams/doc: ${stats.getDouble(0)} avg prefix: ${stats.getDouble(1)}")
  }
}
