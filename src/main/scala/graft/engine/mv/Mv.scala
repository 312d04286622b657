package graft.engine.mv

import graft.engine.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}

/** Materialized views with query rewrite.
  *
  * Reference: CREATE MATERIALIZED VIEW + MVRewriteRule + the MVMatcher
  * subsumption algebra (CarbonCreateMVCommand.scala:60,
  * MVRewriteRule.scala:44, MVMatcher.scala:54-61, rollup decomposition
  * AggregatePushDown.scala:73-137). Scoped per SURVEY §7.4 to the
  * patterns that pay: an MV is an Aggregate over an arbitrary
  * (canonically-comparable) child; a query Aggregate is rewritten when
  *   - its child subtree is canonically identical to the MV's child, and
  *   - its grouping expressions are a subset of the MV's, and
  *   - every aggregate decomposes over the MV's partial results
  *     (sum→sum, count→sum of counts, min→min, max→max,
  *      avg→sum/count — avg is auto-expanded at CREATE time).
  * The rewritten plan re-aggregates the (small) MV table, so both exact
  * matches and group-subset rollups are served by one code path.
  */
case class MvDef(
    name: String,
    agg: Aggregate, // optimized MV plan (avg expanded) — used for matching
    build: LogicalPlan, // analyzed plan (avg expanded) — re-resolves base
                        // table state at materialization time
    path: String)

object MvCatalog {
  private val views = scala.collection.mutable.LinkedHashMap.empty[String, MvDef]
  def register(d: MvDef): Unit = synchronized { views(d.name) = d }
  def drop(name: String): Unit = synchronized { views.remove(name) }
  def all: Seq[MvDef] = synchronized { views.values.toSeq }
  def get(name: String): Option[MvDef] = synchronized { views.get(name) }
}

object Mv {
  /** Install the rewrite rule on a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val has = spark.experimental.extraOptimizations.exists(_.isInstanceOf[MvRewriteRule])
    if (!has) spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ new MvRewriteRule
  }

  /** CREATE MATERIALIZED VIEW name AS <df> stored at `path`.
    * avg(x) is expanded to sum(x)+count(x) so rollups can reconstruct it
    * (reference AggregatePushDown.scala:73-78). */
  def create(spark: SparkSession, name: String, df: DataFrame, path: String,
      sortColumns: Seq[String] = Nil): MvDef = {
    def asAgg(p: LogicalPlan, what: String): Aggregate = p match {
      case a: Aggregate => a
      case other => throw new IllegalArgumentException(
        s"MV must be an aggregation query, got ${other.nodeName} ($what)")
    }
    val matchPlan = expandAvg(asAgg(df.queryExecution.optimizedPlan, "optimized"))
    val buildPlan = expandAvg(asAgg(df.queryExecution.analyzed, "analyzed"))
    val mvDf = MvRewriteRule.withoutRewrite {
      org.apache.spark.sql.graft.Shims.ofRows(spark, buildPlan)
    }
    GraftTable.drop(spark, path)
    GraftTable.createAsSelect(spark, path, mvDf, sortColumns)
    val d = MvDef(name, matchPlan, buildPlan, path)
    MvCatalog.register(d)
    install(spark)
    d
  }

  /** REFRESH MATERIALIZED VIEW: full rebuild (reference supports
    * full/incremental; incremental is future work). */
  def refresh(spark: SparkSession, name: String): Unit = {
    val d = MvCatalog.get(name).getOrElse(
      throw new IllegalArgumentException(s"no MV $name"))
    val t = GraftTable.at(spark, d.path)
    MvRewriteRule.withoutRewrite {
      // the guard stops the rule from rewriting the refresh query into a
      // read of the (stale) MV itself; `build` re-resolves base segments
      t.insert(org.apache.spark.sql.graft.Shims.ofRows(spark, d.build),
        overwrite = true)
    }
  }

  def drop(spark: SparkSession, name: String): Unit = {
    MvCatalog.get(name).foreach(d => GraftTable.drop(spark, d.path))
    MvCatalog.drop(name)
  }

  /** Replace every Average with Sum+Count pairs (keeping one column per
    * distinct child), so the stored MV carries decomposable parts. */
  private[mv] def expandAvg(agg: Aggregate): Aggregate = {
    val extra = scala.collection.mutable.ArrayBuffer.empty[NamedExpression]
    val rewritten = agg.aggregateExpressions.map { ne =>
      ne.transform {
        case ae @ AggregateExpression(Average(child, _), _, false, _, _) =>
          // keep avg itself in the MV output (it may be selected as-is),
          // and add sum/count companions for rollup reconstruction
          val s = AggregateExpression(Sum(child), ae.mode, ae.isDistinct)
          val c = AggregateExpression(Count(Seq(child)), ae.mode, ae.isDistinct)
          extra += Alias(s, s"__mv_sum_${extra.size}")()
          extra += Alias(c, s"__mv_cnt_${extra.size}")()
          ae
      }.asInstanceOf[NamedExpression]
    }
    agg.copy(aggregateExpressions = rewritten ++ extra)
  }
}
