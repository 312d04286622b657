package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: stage-level cost of the exact n-gram Jaccard row. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup
    val ShingleN = 3; val NgramTau = 0.6

    def norm(c: org.apache.spark.sql.Column) = lower(trim(c))
    def mutated(text: org.apache.spark.sql.Column) =
      when(locate(" ", text) > 0,
        text.substr(locate(" ", text) + 1, length(text))).otherwise(text)
    def nearCorpus(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id").as("id"), norm(col("text")).as("norm"))
        .union(df.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("id"), norm(mutated(col("text"))).as("norm")))

    def t[A](n: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[ngramprobe] $n%-22s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }
    sys.env.get("NGRAM_PLAN_OUT").foreach { out =>
      val toks0 = nearCorpus(graft.queries.Q.t(spark, d, "documents"))
        .select(col("id"), Dedup.normTokens(col("norm")).as("toks"))
        .filter(size(col("toks")) >= ShingleN)
      val plan = Dedup.ngramDocTables(toks0, ShingleN, NgramTau)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out), plan)
      println(s"[ngramprobe] doctables plan -> $out")
    }
    (1 to 3).foreach { i =>
      println(s"--- rep $i")
      val toks = nearCorpus(graft.queries.Q.t(spark, d, "documents"))
        .select(col("id"), Dedup.normTokens(col("norm")).as("toks"))
        .filter(size(col("toks")) >= ShingleN)
      val docs = t("docTables+ckpt")(
        Dedup.ngramDocTables(toks, ShingleN, NgramTau).localCheckpoint())
      val cands = Dedup.ngramCandidatePairs(docs, NgramTau)
      t("cands_count")(println(s"    cands=${cands.count()}"))
      val out = cands
        .join(docs.select(col("id"), col("ghs")).as("da"), col("a") === col("da.id"))
        .join(docs.select(col("id"), col("ghs")).as("db"), col("b") === col("db.id"))
        .select(col("a"), col("b"),
          Dedup.jaccardHashed(col("da.ghs"), col("db.ghs")).as("jacc"))
        .filter(col("jacc") >= NgramTau)
      t("verify_noop")(out.write.format("noop").mode("overwrite").save())
      org.apache.spark.sql.graft.Shims.freeLocalCheckpoint(docs)
    }
    // also: how many docs / grams
    val toks = nearCorpus(graft.queries.Q.t(spark, d, "documents"))
      .select(col("id"), Dedup.normTokens(col("norm")).as("toks"))
      .filter(size(col("toks")) >= ShingleN)
    println(s"[ngramprobe] docs=${toks.count()}")
    println(s"[ngramprobe] tokens=${toks.select(sum(size(col("toks")))).collect()(0)}")
    spark.stop()
  }
}
