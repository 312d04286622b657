package graft.engine.format

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) write clustering over 2–4 SORT_COLUMNS —
  * `SORT_SCOPE = 'ZORDER_SORT'`.
  *
  * A lexicographic GLOBAL_SORT clusters perfectly on its LEADING column
  * and not at all on the others: at 100 TB a predicate on the second
  * sort column scans the whole table. Interleaving the columns' bits
  * makes every file a small hyper-rectangle in the value space, so
  * per-file min/max footer stats prune well on ANY of the z columns —
  * the lakehouse layout answer (Delta/Iceberg OPTIMIZE ZORDER) built
  * Spark-first: one quantile-sketch aggregate (rank normalization — see
  * [[zvalue]]), a pure-Column bit interleave (whole-stage codegen, no
  * UDF), and the existing repartitionByRange + sortWithinPartitions
  * write path. The engine's
  * pruning ladder needs NO changes — segment stats and per-file footer
  * stats already cover every stat-supported column.
  *
  * Ordering contract: a z-ordered file is NOT lexically sorted by any
  * single column, so z segments record `sortColumns = Nil` (like
  * NO_SORT) and the scan's footer-verified ordering claim never fires
  * on them. Their fileMeta stats are still lifted for pruning.
  *
  * `OPTIMIZE t ZORDER BY (a, b)` ≡
  * `ALTER TABLE t SET TBLPROPERTIES('sort_columns'='a,b',
  *  'sort_scope'='ZORDER_SORT')` + `ALTER TABLE t COMPACT 'MAJOR'` —
  * compaction rewrites through this same writer path.
  */
object ZOrderSort {

  /** Bits per column: 2 cols fill 62 bits; 3–4 keep the fold small. */
  def bitsFor(n: Int): Int = n match {
    case 2 => 31
    case 3 => 20
    case _ => 15
  }

  private def rangeComparable(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType |
         BooleanType => true
    case _ => false // strings/complex: no monotone double mapping
  }

  /** Quantile intervals per column for the rank normalization — 64
    * rank bands resolve far below per-file granularity at any write
    * size, and keep the per-column bucket Expression a few hundred
    * codegen nodes. */
  private val RankIntervals = 64

  /** The z-value Column for `df` over `cols`. Runs ONE extra
    * quantile-sketch aggregate over `df` (marginal next to the write's
    * own shuffle + sort); an empty input yields a constant.
    *
    * RANK-normalized (r17, VERDICT r16 #5): the r16 form normalized by
    * global min/max, so a single 6-sigma outlier stretched the range
    * and collapsed the real data into a handful of buckets — the
    * clustering (and its pruning win) degraded SILENTLY. Buckets now
    * come from a piecewise-linear map over ~64 approx-quantile
    * boundaries (the same rank-based idea as repartitionByRange's
    * sampler): equal POPULATION per band, so outliers own their tail
    * band and the bulk keeps its full bucket resolution. The sketch is
    * a driver-side KB (QuantileSummaries), never a table-sized
    * collect. */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.size >= 2 && cols.size <= 4,
      s"ZORDER_SORT interleaves 2-4 sort columns, got ${cols.size} " +
        s"(${cols.mkString(",")}) — one column wants GLOBAL_SORT instead")
    cols.foreach { c =>
      require(rangeComparable(df.schema(c).dataType),
        s"ZORDER_SORT column '$c': type ${df.schema(c).dataType.simpleString} " +
          "has no monotone numeric mapping (supported: numeric/date/timestamp/boolean)")
    }
    val bits = bitsFor(cols.size)
    val scale = (1L << bits) - 1
    val probs = (0 to RankIntervals).map(_.toDouble / RankIntervals).toArray
    val asDouble = df.select(cols.zipWithIndex.map { case (c, i) =>
      col(c).cast("double").as(s"c$i")
    }: _*)
    val quantiles = asDouble.stat.approxQuantile(
      cols.indices.map(i => s"c$i").toArray, probs, 0.001)
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      // collapse tied boundaries (heavy duplicates); the piecewise map
      // needs strictly increasing knots
      val d = quantiles(i).distinct.sorted
      val v = col(c).cast("double")
      if (d.length < 2) lit(0L) // empty input or a constant column
      else {
        val w = scale.toDouble / (d.length - 1)
        // rank band j covers [d(j), d(j+1)) → buckets [j*w, (j+1)*w);
        // linear within the band keeps the map monotone in the value
        val pieces = (0 until d.length - 1).foldRight(lit((d.length - 1) * w): Column) {
          (j, rest) =>
            when(v < lit(d(j + 1)),
              lit(j * w) + (v - lit(d(j))) / lit(d(j + 1) - d(j)) * lit(w))
              .otherwise(rest)
        }
        val b = floor(when(v <= lit(d.head), lit(0.0)).otherwise(pieces)).cast("long")
        // nulls sort to bucket 0 (nulls-first, same as the sorted
        // scopes); clamp covers rounding at the top edge and values
        // outside the sketch's (approximate) extremes
        when(v.isNull, lit(0L))
          .otherwise(least(greatest(b, lit(0L)), lit(scale)))
      }
    }
    interleave(buckets, bits)
  }

  /** Interleave pre-bucketed [0, 2^bits) longs. Pure Column arithmetic:
    * whole-stage codegen compiles it to straight-line bit ops. */
  private[graft] def interleave(buckets: Seq[Column], bits: Int): Column =
    if (buckets.size == 2) spread31(buckets(0)).bitwiseOR(shiftleft(spread31(buckets(1)), 1))
    else {
      // 3-4 columns: per-bit fold (bits <= 20, so the expression stays
      // a few hundred nodes — a one-time cost in the write job)
      val n = buckets.size
      (0 until bits).foldLeft(lit(0L): Column) { (acc, i) =>
        buckets.zipWithIndex.foldLeft(acc) { case (a, (b, k)) =>
          a.bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + k))
        }
      }
    }

  /** Classic Morton spread of a 31-bit value into the even bit
    * positions of 62 (the 5-step magic-mask ladder). */
  private def spread31(x0: Column): Column = {
    def step(x: Column, shift: Int, mask: Long): Column =
      x.bitwiseOR(shiftleft(x, shift)).bitwiseAND(lit(mask))
    val x = x0.bitwiseAND(lit(0x7FFFFFFFL))
    val a = step(x, 16, 0x0000FFFF0000FFFFL)
    val b = step(a, 8, 0x00FF00FF00FF00FFL)
    val c = step(b, 4, 0x0F0F0F0F0F0F0F0FL)
    val d = step(c, 2, 0x3333333333333333L)
    step(d, 1, 0x5555555555555555L)
  }
}
