package graft.engine

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** LOAD DATA with bad-record actions (reference
  * CarbonLoadDataCommand.scala:50; FAIL/IGNORE/REDIRECT per
  * docs/dml-of-carbondata.md:68-71). */
class LoadCsvSpec extends AnyFunSuite {
  import TestSpark._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("amount", DoubleType),
    StructField("tag", StringType)))

  private def writeCsv(rows: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_csv_")
    Files.writeString(dir.resolve("data.csv"),
      ("id,amount,tag" +: rows).mkString("\n"))
    dir.toString
  }

  test("clean load commits one segment") {
    val csv = writeCsv(Seq("1,10.5,a", "2,20.25,b", "3,30.0,c"))
    val t = GraftTable.create(spark,
      Files.createTempDirectory("graft_t_").toString + "/t", schema)
    t.loadCsv(csv)
    assert(t.read.count() == 3)
    assert(t.read.agg(sum("amount")).collect().head.getDouble(0) == 60.75)
  }

  test("FAIL action rejects malformed rows") {
    val csv = writeCsv(Seq("1,10.5,a", "2,not_a_number,b"))
    val t = GraftTable.create(spark,
      Files.createTempDirectory("graft_t_").toString + "/t", schema)
    intercept[Exception](t.loadCsv(csv, badRecordsAction = "FAIL"))
    assert(t.status.visible.isEmpty) // nothing committed
  }

  test("IGNORE action drops malformed rows") {
    val csv = writeCsv(Seq("1,10.5,a", "2,not_a_number,b", "3,30.0,c"))
    val t = GraftTable.create(spark,
      Files.createTempDirectory("graft_t_").toString + "/t", schema)
    t.loadCsv(csv, badRecordsAction = "IGNORE")
    assert(t.read.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("REDIRECT action quarantines malformed rows") {
    val csv = writeCsv(Seq("1,10.5,a", "oops,xx,b", "3,30.0,c"))
    val bad = Files.createTempDirectory("graft_bad_").toString + "/bad"
    val t = GraftTable.create(spark,
      Files.createTempDirectory("graft_t_").toString + "/t", schema)
    t.loadCsv(csv, badRecordsAction = "REDIRECT", badRecordsPath = Some(bad))
    assert(t.read.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    val quarantined = spark.read.text(bad).collect().map(_.getString(0))
    assert(quarantined.length == 1 && quarantined.head.startsWith("oops"))
  }

  test("REDIRECT without a path quarantines under the table's badrecords dir") {
    val csv = writeCsv(Seq("1,10.5,a", "oops,xx,b", "3,30.0,c"))
    val t = GraftTable.create(spark,
      Files.createTempDirectory("graft_t_").toString + "/t", schema)
    t.loadCsv(csv, badRecordsAction = "REDIRECT")
    assert(t.read.count() == 2)
    // a timestamped dir under <table>/badrecords holds the raw row
    val dirs = new java.io.File(s"${t.path}/badrecords").listFiles()
    assert(dirs != null && dirs.length == 1, "expected one per-load redirect dir")
    val quarantined = spark.read.text(dirs.head.toString)
      .collect().map(_.getString(0))
    assert(quarantined.toSeq == Seq("oops,xx,b"))
    // a clean load writes no redirect dir at all
    val csv2 = writeCsv(Seq("7,1.0,z"))
    t.loadCsv(csv2, badRecordsAction = "REDIRECT")
    assert(new java.io.File(s"${t.path}/badrecords").listFiles().length == 1)
  }
}
