package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking: split each document's token
  * sequence into fixed-`size` chunks advancing by `stride` tokens —
  * the training-sequence op `Pack.packBins` doesn't cover (packing
  * concatenates whole docs into budget bins; chunking SPLITS a long
  * doc into overlapping windows for context-window training or
  * passage embedding).
  *
  * Scale design: the whole op is a projection + one explode — no
  * shuffle, no window, no driver state. Chunk count, offsets, and
  * lengths are pure integer arithmetic on the token count, so output
  * is byte-identical at any parallelism and across engines. At 100 TB
  * the explode fan-out is bounded by ~n_tokens/stride per doc; rows
  * stay inside whole-stage codegen.
  */
object Chunk {

  /** One row per chunk: (idCol, chunk_id, start_tok, n_tok,
    * chunk_text). `tokens` must be an array column; a doc shorter than
    * `size` yields exactly one (possibly short) chunk; the final
    * window is clipped, never padded. A trailing window is emitted
    * only if it starts before the end of the doc (next-start < n).
    */
  def chunkTokens(
      docs: DataFrame,
      idCol: String,
      tokens: Column,
      size: Int,
      stride: Int): DataFrame = {
    require(size > 0, s"size must be positive, got $size")
    require(stride > 0 && stride <= size,
      s"stride must be in [1, size], got $stride")
    docs
      .withColumn("__toks", tokens)
      .withColumn("__n", size_(col("__toks")))
      // chunks = 1 + ceil((n - size) / stride) for n > size, else 1 —
      // integer form: 1 + (n - size + stride - 1) div stride
      .withColumn("__chunks",
        when(col("__n") <= size, lit(1L)).otherwise(
          expr(s"1L + (__n - $size + $stride - 1) div $stride")))
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0L), col("__chunks") - 1L)).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        least(lit(size.toLong), col("__n") - col("chunk_id") * stride)
          .cast("long").as("n_tok"),
        array_join(
          slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"),
            lit(size)),
          " ").as("chunk_text"))
  }

  private def size_(c: Column): Column = size(c).cast("long")
}
