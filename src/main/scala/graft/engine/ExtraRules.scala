package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Single gate for every mutation of a session's
  * `spark.experimental.extraOptimizations`. The field is a plain var
  * on ExperimentalMethods; three installers (MV rewrite, SI rewrite,
  * text_match) doing unsynchronized read-modify-writes could silently
  * drop one another's rule under concurrent install — lost
  * acceleration, results still correct, and maddening to debug. One
  * process-wide lock makes install idempotent and race-free (installs
  * are rare: once per rule class per session). */
object ExtraRules {
  private val lock = new Object

  /** Append `mk` unless a rule of the same class is already installed. */
  def install(spark: SparkSession, ruleClass: Class[_ <: Rule[LogicalPlan]])(
      mk: => Rule[LogicalPlan]): Unit = lock.synchronized {
    val has = spark.experimental.extraOptimizations.exists(r =>
      ruleClass.isAssignableFrom(r.getClass))
    if (!has) spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ mk
  }
}
