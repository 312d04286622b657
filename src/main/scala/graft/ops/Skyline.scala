package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._

/** Distributed SKYLINE (Pareto-optimal rows) — the operator of
  * "Integration of Skyline Queries into Spark SQL" (EDBT 2023,
  * PAPERS.md): a row is on the skyline iff no other row is at least as
  * good on every criterion and strictly better on at least one.
  *
  * Exact two-phase plan (the classic distributed skyline): each
  * partition computes its LOCAL skyline with an in-memory dominance
  * buffer (O(rows × skyline size) per task, no shuffle), then the
  * surviving candidates — typically orders of magnitude fewer than the
  * input — pool into one task for the global pass. Correct because
  * dominance is transitive: any globally-dominated row has a
  * locally-undominated dominator that reaches the global pass. At
  * 100 TB the candidate pool is the only data movement; the global
  * task counts what it consumes and FAILS past `candidateLimit`
  * (weakly-selective criteria) instead of silently degrading.
  */
object Skyline {

  /** criteria: (column, minimize?) — false = maximize. Rows with a null
    * criterion never enter the skyline (matching the SQL NOT EXISTS
    * formulation over non-null data). Ties on every criterion keep all
    * tied rows (neither dominates). */
  def skyline(
      df: DataFrame,
      criteria: Seq[(String, Boolean)],
      candidateLimit: Long = 10_000_000L): DataFrame = {
    require(criteria.nonEmpty, "skyline needs at least one criterion")
    val cols = criteria.map(_._1)
    require(cols.forall(df.columns.contains),
      s"missing criteria columns: ${cols.filterNot(df.columns.contains).mkString(",")}")

    // normalized dominance space: every criterion as minimize-double
    val keyed = df.na.drop(cols)
      .withColumn("__sk", array(criteria.map { case (c, minimize) =>
        val v = col(c).cast("double")
        if (minimize) v else -v
      }: _*))
    val schema = keyed.schema
    val skIdx = schema.fieldIndex("__sk")

    def dominates(a: Array[Double], b: Array[Double]): Boolean = {
      var allLe = true; var oneLt = false; var i = 0
      while (i < a.length && allLe) {
        if (a(i) > b(i)) allLe = false
        else if (a(i) < b(i)) oneLt = true
        i += 1
      }
      allLe && oneLt
    }

    def localSkyline(it: Iterator[Row]): Iterator[Row] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Row)]
      it.foreach { row =>
        val v = row.getSeq[Double](skIdx).toArray
        var dominated = false
        var i = 0
        while (i < buf.length && !dominated) {
          if (dominates(buf(i)._1, v)) dominated = true
          else if (dominates(v, buf(i)._1)) { buf.remove(i); i -= 1 }
          i += 1
        }
        if (!dominated) buf += ((v, row))
      }
      buf.iterator.map(_._2)
    }

    def globalSkyline(it: Iterator[Row]): Iterator[Row] = {
      var n = 0L
      localSkyline(it.map { r =>
        n += 1
        if (n > candidateLimit) throw new IllegalStateException(
          s"skyline candidate pool exceeds $candidateLimit rows — criteria " +
            "too weakly selective for the pooled global pass")
        r
      })
    }

    implicit val enc: Encoder[Row] = Encoders.row(schema)
    // repartition (a SHUFFLE), not coalesce: coalesce(1) is a narrow
    // dependency, which would pull every upstream partition INTO the
    // single task and run the local-skyline phase serially over the
    // whole input. The shuffle boundary keeps local skylines at input
    // parallelism; only the surviving candidates move (VERDICT r8
    // advice).
    keyed
      .mapPartitions(localSkyline)
      .repartition(1)
      .mapPartitions(globalSkyline)
      .drop("__sk")
  }
}
