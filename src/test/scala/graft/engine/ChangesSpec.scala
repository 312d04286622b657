package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** CHANGE DATA FEED (r19, beyond the reference — Delta's
  * `table_changes` without stored change files): row-level NET
  * multiset changes between two retained versions, derived from the
  * commit log. The at-scale property under test: a METADATA segment
  * diff prunes the scan to CHURNED segments only — multiset
  * difference cancels identical contributions, (U+A) −ₘ (U+B) =
  * A −ₘ B, so unchanged segments are provably skippable and the
  * exceptAll pair shuffles only churned rows. */
class ChangesSpec extends AnyFunSuite {
  import TestSpark._

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.FilePartition
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scansExec(p: SparkPlan): Seq[BatchScanExec] = p.collect {
      case b: BatchScanExec => Seq(b)
      case a: AdaptiveSparkPlanExec => scansExec(a.executedPlan)
    }.flatten
    val fromExec = scansExec(df.queryExecution.executedPlan)
      .flatMap(_.scan.toBatch.planInputPartitions())
    // readSegmentSubset goes through a v1 parquet HadoopFsRelation —
    // collect its files from the optimized plan too
    val fromRelation = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.inputFiles.toSeq
          case _ => Nil
        }
    }.flatten
    fromExec.flatMap {
      case fp: FilePartition => fp.files.map(_.filePath.toString)
      case b: graft.engine.source.BucketedFilePartition =>
        b.filePartition.files.map(_.filePath.toString)
    } ++ fromRelation
  }

  test("net multiset changes across insert / CoW delete / MoR delete versions") {
    val dir = Files.createTempDirectory("graft_cdf_").toString + "/t"
    val t = GraftTable.create(spark, dir,
      spark.range(0, 1).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v").schema,
      sortColumns = Seq("k"), properties = Map("timetravel" -> "true"))
    t.insert(spark.range(0, 100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"))
    val v1 = t.status.version
    t.insert(spark.range(100, 150).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"))
    val v2 = t.status.version
    assert(Mutation.delete(t, col("k") < 20L) == 20L)
    val v3 = t.status.version

    def changes(a: Long, b: Long): (Set[Long], Set[Long]) = {
      val rows = t.readChanges(a, b).collect()
      (rows.filter(_.getAs[String]("_change_type") == "insert").map(_.getLong(0)).toSet,
        rows.filter(_.getAs[String]("_change_type") == "delete").map(_.getLong(0)).toSet)
    }
    // v1 → v2: one appended segment, nothing deleted
    assert(changes(v1, v2) == ((100L until 150L).toSet, Set.empty[Long]))
    // v2 → v3: the CoW delete — net deletes only; the rewritten
    // survivors cancel exactly (no phantom insert+delete churn)
    assert(changes(v2, v3) == (Set.empty[Long], (0L until 20L).toSet))
    // v1 → v3 composes: appended batch in, deleted keys out
    assert(changes(v1, v3) == ((100L until 150L).toSet, (0L until 20L).toSet))
    // version metadata rides along
    val r = t.readChanges(v1, v3).head
    assert(r.getAs[Long]("_from_version") == v1)
    assert(r.getAs[Long]("_to_version") == v3)
    // degenerate: same version → empty
    assert(t.readChanges(v3, v3).count() == 0)
    GraftTable.drop(spark, dir)
  }

  test("MoR delete deltas change a segment's identity: delta-deleted rows surface as deletes") {
    val dir = Files.createTempDirectory("graft_cdfmor_").toString + "/t"
    val src = spark.range(0, 200).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    val t = GraftTable.create(spark, dir, src.schema, sortColumns = Seq("k"),
      properties = Map("timetravel" -> "true", "iud_mode" -> "mor",
        "horizontal_compaction_enable" -> "false"))
    t.insert(src)
    val v1 = t.status.version
    // a predicate spread across every file, so the delete cannot take
    // the whole-file drop path and MUST write position deltas
    assert(Mutation.deleteMor(t, col("k") % 4 === 0L) == 50L)
    val v2 = t.status.version
    assert(t.status.visible.exists(_.deltas.nonEmpty), "fixture must be MoR")
    val rows = t.readChanges(v1, v2).collect()
    assert(rows.forall(_.getAs[String]("_change_type") == "delete"))
    assert(rows.map(_.getLong(0)).toSet == (0L until 200L by 4).toSet)
    GraftTable.drop(spark, dir)
  }

  test("metadata diff prunes the scan to CHURNED segments; a value duplicated in an unchanged segment still nets out correctly") {
    val dir = Files.createTempDirectory("graft_cdfprune_").toString + "/t"
    val t = GraftTable.create(spark, dir,
      spark.range(0, 1).selectExpr("id AS k").schema,
      sortColumns = Seq("k"), properties = Map("timetravel" -> "true"))
    // segment A: 0..99; segment B: 50..149 — values 50..99 exist in
    // BOTH segments (a distinct-set EXCEPT would lose their deletes)
    t.insert(spark.range(0, 100).selectExpr("id AS k"))
    val segA = t.status.visible.map(_.id).max
    t.insert(spark.range(50, 150).selectExpr("id AS k"))
    val segB = t.status.visible.map(_.id).max
    val v1 = t.status.version
    // CoW delete k < 50: only segment A contains matches → only A is
    // rewritten; B is untouched at both versions
    assert(Mutation.delete(t, col("k") < 50L) == 50L)
    val v2 = t.status.version
    val diff = t.readChanges(v1, v2)
    val rows = diff.collect()
    // NET semantics: 0..49 deleted once; 50..99 survive in A's
    // rewrite AND stay duplicated in B → no change reported for them
    assert(rows.forall(_.getAs[String]("_change_type") == "delete"))
    assert(rows.map(_.getLong(0)).toSet == (0L until 50L).toSet)
    // duplicates are still served twice at v2 (sanity that the table
    // really holds multiset duplicates)
    assert(t.read.filter(col("k") === 75L).count() == 2)
    // PRUNING: the diff's scans must touch only segment A's files
    // (original + rewrite) — segment B's identity is unchanged and
    // must not be read on either side
    val files = plannedFiles(diff)
    assert(files.nonEmpty, "expected the diff to scan the churned segments")
    assert(!files.exists(_.contains(s"/segments/$segB/")),
      s"unchanged segment $segB must be pruned from the diff, got:\n${files.mkString("\n")}")
    GraftTable.drop(spark, dir)
  }

  test("SQL surface: SELECT * FROM TABLE_CHANGES('<t>', v1, v2) and timestamp bounds") {
    val dir = Files.createTempDirectory("graft_cdfsql_").toString + "/t"
    val t = GraftTable.create(spark, dir,
      spark.range(0, 1).selectExpr("id AS k").schema,
      properties = Map("timetravel" -> "true"))
    t.insert(spark.range(0, 30).selectExpr("id AS k"))
    val v1 = t.status.version
    Thread.sleep(30)
    val mid = System.currentTimeMillis()
    Thread.sleep(30)
    t.insert(spark.range(30, 45).selectExpr("id AS k"))
    val v2 = t.status.version
    val byVersion = GraftSql.command(spark,
      s"SELECT * FROM TABLE_CHANGES('$dir', $v1, $v2)").get.collect()
    assert(byVersion.length == 15)
    assert(byVersion.forall(_.getAs[String]("_change_type") == "insert"))
    // timestamp bounds resolve session-TZ like every other surface
    val byTs = GraftSql.command(spark,
      s"SELECT * FROM TABLE_CHANGES('$dir', '${new java.sql.Timestamp(mid)}', $v2)").get.collect()
    assert(byTs.length == 15)
    GraftTable.drop(spark, dir)
  }
}
