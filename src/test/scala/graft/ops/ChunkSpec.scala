package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.TestSpark

/** Invariants of sliding-window chunking: full coverage, correct
  * overlap, clipped tail, one chunk for short docs, and the no-shuffle
  * plan shape. */
class ChunkSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), split(lower(trim(col("text"))), " ").as("toks"))

  test("every token is covered and interior chunks overlap by size-stride") {
    val size = 16; val stride = 12
    val out = Chunk.chunkTokens(docs, "doc_id", col("toks"), size, stride)
      .join(docs, "doc_id")
      .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("n_tok"),
        org.apache.spark.sql.functions.size(col("toks")).cast("long").as("n"))
      .collect()
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (id, rows) =>
      val n = rows.head.getLong(4)
      val sorted = rows.sortBy(_.getLong(1))
      // chunk 0 starts at 0; consecutive starts advance by stride
      assert(sorted.head.getLong(2) == 0L, s"doc $id first chunk start")
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(2) == i.toLong * stride, s"doc $id chunk $i start")
        assert(r.getLong(3) == math.min(size.toLong, n - r.getLong(2)),
          s"doc $id chunk $i length")
        assert(r.getLong(3) >= 1, s"doc $id chunk $i must be non-empty")
      }
      // coverage: last chunk reaches the end of the doc
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) == n, s"doc $id tail coverage")
      // no superfluous trailing chunk: the one before last (if any)
      // doesn't already reach the end at full size
      if (sorted.length > 1) {
        val prev = sorted(sorted.length - 2)
        assert(prev.getLong(2) + size < n || prev.getLong(3) < size || last.getLong(2) < n,
          s"doc $id emitted a chunk past the end")
      }
    }
  }

  test("docs shorter than size yield exactly one clipped chunk") {
    val tiny = spark.createDataFrame(Seq(
      (1L, Seq("a", "b", "c")), (2L, Seq("x")))).toDF("doc_id", "toks")
    val out = Chunk.chunkTokens(tiny, "doc_id", col("toks"), 8, 4).collect()
    assert(out.length == 2)
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getLong(1) == 0L && r1.getLong(3) == 3L &&
      r1.getString(4) == "a b c")
  }

  test("chunk text equals the token slice") {
    val out = Chunk.chunkTokens(docs, "doc_id", col("toks"), 32, 24)
      .join(docs, "doc_id")
      .withColumn("expect", concat_ws(" ",
        slice(col("toks"), (col("start_tok") + 1).cast("int"), lit(32))))
      .filter(col("chunk_text") =!= col("expect"))
    assert(out.count() == 0)
  }

  test("plan is a projection + explode: no shuffle") {
    val plan = Chunk.chunkTokens(docs, "doc_id", col("toks"), 32, 24)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}
