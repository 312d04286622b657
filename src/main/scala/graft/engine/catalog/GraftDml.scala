package graft.engine.catalog

import graft.engine.GraftTable
import graft.engine.source.CarbonishTable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan, UpdateTable}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.functions.expr

/** SQL `UPDATE <table> SET ... WHERE ...` for carbonish catalog tables.
  *
  * Spark's own parser produces an analyzed [[UpdateTable]] command, but
  * only executes it for `SupportsRowLevelOperations` sources; for
  * everything else the built-in strategy throws. This strategy (injected
  * ahead of the built-ins via `spark.experimental.extraStrategies`, the
  * same session-local registration the MV rewrite rule uses) intercepts
  * the analyzed plan and routes it to the engine's copy-on-write
  * [[graft.engine.Mutation]] path — only segments containing matching
  * rows are rewritten, so a point UPDATE on a 100 TB table touches ~1
  * segment. `DELETE FROM` needs no strategy: the source implements DSv2
  * `SupportsDelete` and Spark plans it natively.
  *
  * Reference semantics: CarbonSpark2SqlParser.scala:239 (deleteRecords)
  * and :259 (updateTable) — there a bespoke parser; here Spark's parser +
  * a planner hook, so aliases/subqueries/ANSI quirks are all inherited.
  */
object GraftDml {
  /** Idempotently enable SQL UPDATE for carbonish tables on a session. */
  def enable(spark: SparkSession): Unit = synchronized {
    val has = spark.experimental.extraStrategies.exists(_.isInstanceOf[GraftDmlStrategy])
    if (!has) spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ new GraftDmlStrategy
  }
}

class GraftDmlStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case UpdateTable(rel, assignments, condition) =>
      carbonishPath(rel) match {
        case Some(path) =>
          val set = assignments.map {
            case Assignment(k: AttributeReference, v) => k.name -> unqualifiedSql(v)
            case Assignment(k, _) => throw new UnsupportedOperationException(
              s"UPDATE of nested field not supported: ${k.sql}")
          }.toMap
          GraftUpdateExec(path, set, condition.map(unqualifiedSql)) :: Nil
        case None => Nil
      }
    case _ => Nil
  }

  /** Resolved attributes render as `catalog.ns.table.col`, which doesn't
    * resolve against the mutation's own table read — strip qualifiers. */
  private def unqualifiedSql(e: Expression): String =
    e.transform {
      case a: AttributeReference => a.withQualifier(Nil)
    }.sql

  /** The planner sees the OPTIMIZED tree, where V2ScanRelationPushDown
    * has already turned the relation into a DataSourceV2ScanRelation —
    * match both shapes so the strategy fires regardless of phase. */
  private def carbonishPath(rel: LogicalPlan): Option[String] =
    rel.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[CarbonishTable] =>
        r.table.asInstanceOf[CarbonishTable].tablePath
      case r: DataSourceV2ScanRelation if r.relation.table.isInstanceOf[CarbonishTable] =>
        r.relation.table.asInstanceOf[CarbonishTable].tablePath
    }
}

/** Eagerly-executed command node: Spark's command execution calls
  * `executeCollect()` once on the analyzed command, which runs the
  * mutation. The expressions travel as SQL text (they were resolved
  * against the relation during analysis, so names are valid) and are
  * re-resolved against the table's own read — the mutation job plans its
  * scan from the tablestatus exactly like the API path. */
case class GraftUpdateExec(
    path: String,
    set: Map[String, String],
    condSql: Option[String]) extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  private def run(): Unit = {
    val t = GraftTable.at(SparkSession.active, path)
    t.update(expr(condSql.getOrElse("true")),
      set.map { case (k, v) => k -> expr(v) })
  }

  override def executeCollect(): Array[InternalRow] = { run(); Array.empty }

  protected override def doExecute(): RDD[InternalRow] = {
    run(); sparkContext.emptyRDD
  }
}
