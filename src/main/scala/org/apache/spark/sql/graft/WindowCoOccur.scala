package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Lucene-style proximity residual `"w1 w2"~k` as one sliding-window
  * pass: true iff SOME window of `window` consecutive tokens contains
  * every word (any order — the documented window-co-occurrence
  * simplification of lucene's move-count slop).
  *
  * Replaces the HOF formulation
  * `exists(sequence(1, len), p -> AND_w array_contains(slice(toks, p, window), w))`,
  * which evaluated interpreted (higher-order functions don't codegen)
  * and ALLOCATED a slice copy per token position — O(len · window)
  * allocations per row on the residual path of every proximity query.
  * Here: one O(len) scan with a ring of per-word counts, zero
  * allocation beyond the count array, inside whole-stage codegen
  * (Janino calls the static forwarder directly — the
  * [[CountOccurrences]] pattern).
  *
  * `words` are the query literals (deduped; lowercased by the caller),
  * `window` is phraseLen + slop computed from the ORIGINAL phrase
  * length, matching the DuckDB oracle's `list_slice(toks, p, p+w-1)`
  * formulation exactly. */
case class WindowCoOccur(tokens: Expression, words: Seq[String], window: Int)
  extends UnaryExpression with Predicate with ExpectsInputTypes {

  override def child: Expression = tokens
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def prettyName: String = "window_cooccur"

  @transient private lazy val wordArr: Array[UTF8String] =
    words.distinct.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(arr: Any): Any =
    WindowCoOccur.anyWindow(arr.asInstanceOf[ArrayData], wordArr, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("words", wordArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev,
      arr => s"org.apache.spark.sql.graft.WindowCoOccur.anyWindow($arr, $w, $window)")
  }

  override protected def withNewChildInternal(newChild: Expression): WindowCoOccur =
    copy(tokens = newChild)
}

object WindowCoOccur {
  /** True iff some length-`w` window of `toks` contains every word of
    * `words` (callers pass a DEDUPED array). Sliding window with
    * per-word occurrence counts: token entering bumps its word's
    * count, token leaving the w-window decays it; `have` tracks how
    * many words are currently present. Exactly equivalent to
    * `∃p: words ⊆ toks[p, p+w)` — trailing short windows are subsets
    * of earlier full ones, so they can't add matches. */
  def anyWindow(toks: ArrayData, words: Array[UTF8String], w: Int): Boolean = {
    val k = words.length
    if (k == 0) return true
    val n = toks.numElements()
    if (n == 0 || w <= 0) return false
    val counts = new Array[Int](k)
    var have = 0
    var i = 0
    while (i < n) {
      val in = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      if (in != null) {
        var j = 0
        while (j < k) {
          if (words(j).equals(in)) {
            if (counts(j) == 0) have += 1
            counts(j) += 1
            j = k
          } else j += 1
        }
      }
      val outIdx = i - w
      if (outIdx >= 0) {
        val out = if (toks.isNullAt(outIdx)) null else toks.getUTF8String(outIdx)
        if (out != null) {
          var j = 0
          while (j < k) {
            if (words(j).equals(out)) {
              counts(j) -= 1
              if (counts(j) == 0) have -= 1
              j = k
            } else j += 1
          }
        }
      }
      if (have == k) return true
      i += 1
    }
    false
  }
}
