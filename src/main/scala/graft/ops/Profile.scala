package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the first thing a pipeline runs on an
  * unfamiliar 100 TB corpus: per-column row count, null count, exact
  * distinct count, and min/max, computed in a SINGLE Spark job.
  *
  * Scale design: all measures for all columns are expressions of one
  * global aggregation. The DEFAULT distinct counter is
  * `approx_count_distinct` (HyperLogLog++, ~2% rsd): it keeps the plan
  * a plain partial/final agg — one sketch per column per partition, no
  * input replication — which is the only sane default when someone
  * profiles 40 columns of a 100 TB table. `exact = true` opts into
  * exact COUNT(DISTINCT), which plans through Catalyst's Expand (input
  * rows replicate once per distinct column — a linear, map-side-partial
  * factor of |cols|, the standard trade for exactness in one pass).
  * The long-format pivot at the end acts on the single aggregated row,
  * so it's free. min/max are cast to string so every column fits one
  * output schema — exact for integer and string columns (floating-point
  * formatting is engine-specific; profile integer/string/date columns,
  * or accept formatting drift).
  */
object Profile {

  /** Long-format profile: one row per column —
    * (col_name, n_rows, n_null, n_distinct, min_s, max_s).
    *
    * OUTPUT CONTRACT: `n_distinct` is an HLL ESTIMATE (~2% rsd) unless
    * `exact = true` — callers comparing profiles across runs, or feeding
    * n_distinct into equality-sensitive logic (e.g. a uniqueness check),
    * must opt into `exact`. The column name is the same in both modes so
    * downstream schemas don't fork on an accuracy knob. */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))
    }
    row.select(explode(array(entries: _*)).as("p")).select("p.*")
  }
}
