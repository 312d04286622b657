package graft.engine

import graft.engine.index.Si
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SHALLOW CLONE (r18, beyond the reference — Delta's CLONE): a new
  * independent table whose segments REFERENCE the source's files in
  * place. One metadata commit, zero data movement at any size; the
  * external-segment machinery supplies isolation (clone DML is
  * copy-on-write into the clone's own managed segments, clone CLEAN
  * FILES never unlinks external files). Composes with time travel
  * (clone AS OF a retained version). */
class CloneSpec extends AnyFunSuite {
  import TestSpark._

  test("shallow clone: metadata-only, pruning works, DML independent both ways, clean never touches source") {
    val root = Files.createTempDirectory("graft_clone_").toString
    val src = spark.range(0, 2000).select(col("id").as("k"),
      (col("id") % 5).cast("string").as("grp"), (col("id") * 1.5).as("v"))
    val t = GraftTable.create(spark, s"$root/t", src.schema, sortColumns = Seq("k"))
    t.insert(src.filter(col("k") < 1000))
    t.insert(src.filter(col("k") >= 1000))
    // a foreign ADD SEGMENT rides along by its own external path
    val csvDir = s"$root/extra_csv"
    spark.range(5000, 5100).select(col("id").as("k"),
        (col("id") % 5).cast("string").as("grp"), (col("id") * 1.5).as("v"))
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(csvDir)
    t.addSegment(csvDir, "csv")
    val srcCount = t.read.count()
    assert(srcCount == 2100)

    val c = t.shallowCloneTo(s"$root/c")
    assert(c.read.count() == srcCount)
    assert(c.read.agg(sum("k")).head.getLong(0) ==
      t.read.agg(sum("k")).head.getLong(0))
    // METADATA-ONLY: the clone's own segments dir holds zero data files
    val cSegs = new java.io.File(s"$root/c/segments")
    def dataFiles(d: java.io.File): Seq[java.io.File] =
      if (!d.exists) Nil
      else d.listFiles.toSeq.flatMap(f =>
        if (f.isDirectory) dataFiles(f) else Seq(f))
    assert(dataFiles(cSegs).isEmpty, "shallow clone must move zero data bytes")
    // the pruning ladder runs on the clone (copied footer stats)
    assert(c.read.filter(col("k") === 1500L).count() == 1)

    // the clone's CLEAN FILES reclaims only CLONE-owned files: retire
    // the cloned csv foreign on the CLONE, clean, and the source still
    // reads everything (mutations refuse foreign formats, so this also
    // clears the way for the CoW check below)
    val csvId = c.status.visible.find(_.format == "csv").get.id
    c.deleteSegmentsById(Seq(csvId))
    c.cleanFiles()
    assert(c.read.count() == 2000)
    assert(t.read.count() == srcCount, "clone CLEAN FILES unlinked source data")

    // DML on the CLONE: copy-on-write into the clone's own segments —
    // the source's bytes and row set are untouched
    assert(Mutation.delete(c, col("k") < 100L) == 100L)
    assert(c.read.count() == 1900)
    assert(t.read.count() == srcCount, "clone DML leaked into the source")
    assert(dataFiles(cSegs).nonEmpty, "CoW must land in the clone's own layout")

    // writes to the SOURCE don't move the clone
    t.insert(spark.range(9000, 9010).select(col("id").as("k"),
      (col("id") % 5).cast("string").as("grp"), (col("id") * 1.5).as("v")))
    assert(t.read.count() == srcCount + 10)
    assert(c.read.count() == 1900, "source insert leaked into the clone")

    GraftTable.drop(spark, s"$root/c")
    assert(t.read.count() == srcCount + 10, "dropping the clone touched the source")
    GraftTable.drop(spark, s"$root/t")
  }

  test("clone AS OF composes with time travel; deltas refused; vacuumed source fails loudly; SQL surface") {
    val root = Files.createTempDirectory("graft_clone_asof_").toString
    val src = spark.range(0, 1500).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    val t = GraftTable.create(spark, s"$root/t", src.schema, sortColumns = Seq("k"),
      properties = Map("timetravel" -> "true", "global_sort_partitions" -> "2"))
    t.insert(src)
    val vGood = t.status.version
    assert(Mutation.delete(t, col("k") % 3 === 0L) == 500L)
    assert(t.read.count() == 1000L)

    // clone the PRE-mis-step state aside; the live table stays as-is
    val c = t.shallowCloneTo(s"$root/c_asof", Some(vGood))
    assert(c.read.count() == 1500L, "AS-OF clone must see the pre-delete rows")
    assert(c.read.agg(sum("k")).head.getLong(0) == 1499L * 1500L / 2)
    assert(t.read.count() == 1000L)

    // SQL surface, current version
    val res = GraftSql.command(spark,
      s"CREATE TABLE $root/c_sql SHALLOW CLONE $root/t")
    assert(res.isDefined)
    assert(GraftTable.at(spark, s"$root/c_sql").read.count() == 1000L)
    // SQL surface, AS OF
    val res2 = GraftSql.command(spark,
      s"CREATE TABLE $root/c_sql2 SHALLOW CLONE $root/t VERSION AS OF $vGood")
    assert(res2.isDefined)
    assert(GraftTable.at(spark, s"$root/c_sql2").read.count() == 1500L)

    // outstanding MoR deltas are refused (positions resolve against
    // the source layout — fold first)
    val tm = GraftTable.create(spark, s"$root/tm",
      src.schema, sortColumns = Seq("k"),
      properties = Map("iud_mode" -> "mor",
        "horizontal_compaction_enable" -> "false"))
    tm.insert(src.filter(col("k") < 500))
    assert(Mutation.deleteMor(tm, col("k") < 50L) == 50L)
    assert(tm.status.visible.exists(_.deltas.nonEmpty), "fixture must carry deltas")
    val e1 = intercept[IllegalArgumentException] { tm.shallowCloneTo(s"$root/cm") }
    assert(e1.getMessage.contains("merge-on-read"))

    // a vacuumed AS-OF target fails BEFORE any metadata is written
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * 3600 * 1000)
    java.nio.file.Files.walk(java.nio.file.Paths.get(s"$root/t")).forEach(p =>
      try java.nio.file.Files.setLastModifiedTime(p, old)
      catch { case scala.util.control.NonFatal(_) => () })
    t.cleanFiles()
    val e2 = intercept[IllegalArgumentException] {
      t.shallowCloneTo(s"$root/c_gone", Some(vGood))
    }
    assert(e2.getMessage.contains("physically reclaimed"))
    assert(!new java.io.File(s"$root/c_gone").exists() ||
      !new GraftTableProbe(s"$root/c_gone").hasLog,
      "failed clone must not leave a committed table behind")
    GraftTable.drop(spark, s"$root/t")
  }

  test("index registrations do NOT follow the clone (a clone REFRESH must never overwrite the source's index)") {
    val root = Files.createTempDirectory("graft_clone_idx_").toString
    val src = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") % 9).cast("string").as("grp"))
    val t = GraftTable.create(spark, s"$root/t", src.schema, sortColumns = Seq("k"))
    t.insert(src)
    Si.create(t, "grp", s"$root/si")
    assert(Si.show(t).nonEmpty)
    val c = t.shallowCloneTo(s"$root/c")
    assert(Si.show(c).isEmpty, "SI registration leaked into the clone")
    // the source's indexed lookup still works after the clone exists
    assert(Si.readWhereIn(t, "grp", Seq("3")).count() ==
      src.filter(col("grp") === "3").count())
    // and the clone serves the same rows through plain scans
    assert(c.read.filter(col("grp") === "3").count() ==
      src.filter(col("grp") === "3").count())
    GraftTable.drop(spark, s"$root/c"); GraftTable.drop(spark, s"$root/t")
  }
}

/** Minimal existence probe for a table dir that may not have a
  * committed log (CloneSpec's failed-clone assertion). */
private class GraftTableProbe(path: String) {
  def hasLog: Boolean =
    new java.io.File(s"$path/_meta/tablestatus.json").exists()
}
