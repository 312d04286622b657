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

  test("FORCE action nulls bad values and keeps the row") {
    val csv = writeCsv(Seq("1,10.5,a", "2,not_a_number,b", "3,30.0,c"))
    val t = GraftTable.create(spark,
      Files.createTempDirectory("graft_t_").toString + "/t", schema)
    t.loadCsv(csv, badRecordsAction = "FORCE")
    assert(t.read.count() == 3) // row kept
    val r2 = t.read.filter(col("id") === 2).collect().head
    assert(r2.isNullAt(r2.fieldIndex("amount"))) // bad value nulled
    assert(t.read.agg(sum("amount")).collect().head.getDouble(0) == 40.5)
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

  // ---- complex-type cells (COMPLEX_DELIMITER_LEVEL_1/2/3,
  // docs/dml-of-carbondata.md:161-184; reference suite
  // spark/testsuite/complexType/ over Array.csv / Struct.csv)

  private def mkComplex(s: StructType): GraftTable =
    GraftTable.create(spark,
      Files.createTempDirectory("graft_tc_").toString + "/t", s)

  test("complex load: ARRAY column splits on level-1 delimiter") {
    val s = StructType(Seq(StructField("id", LongType),
      StructField("phones", ArrayType(LongType))))
    val dir = Files.createTempDirectory("graft_csv_")
    Files.writeString(dir.resolve("d.csv"),
      Seq("id,phones", "1,1234$5678$9101", "2,42", "3,").mkString("\n"))
    val t = mkComplex(s)
    t.loadCsv(dir.toString,
      options = Map("COMPLEX_DELIMITER_LEVEL_1" -> "$"))
    val got = t.read.orderBy("id").collect()
    assert(got(0).getSeq[Long](1) == Seq(1234L, 5678L, 9101L))
    assert(got(1).getSeq[Long](1) == Seq(42L))
    assert(got(2).isNullAt(1), "empty cell is a NULL array")
  }

  test("complex load: STRUCT column splits fields positionally") {
    val s = StructType(Seq(StructField("id", LongType),
      StructField("info", StructType(Seq(
        StructField("age", IntegerType), StructField("name", StringType),
        StructField("score", DoubleType))))))
    val dir = Files.createTempDirectory("graft_csv_")
    // the reference's Struct.csv shape: 1,11$abc$10.00
    Files.writeString(dir.resolve("d.csv"),
      Seq("id,info", "1,11$abc$10.00", "2,12$abcd$10.01").mkString("\n"))
    val t = mkComplex(s)
    t.loadCsv(dir.toString, options = Map("COMPLEX_DELIMITER_LEVEL_1" -> "$"))
    val got = t.read.orderBy("id").selectExpr("info.age", "info.name", "info.score")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((11, "abc", 10.0), (12, "abcd", 10.01)))
  }

  test("complex load: 2-level nesting (array<struct>) and MAP kv split") {
    val s = StructType(Seq(StructField("id", LongType),
      StructField("addr", ArrayType(StructType(Seq(
        StructField("city", StringType), StructField("zip", IntegerType))))),
      StructField("attrs", MapType(StringType, IntegerType))))
    val dir = Files.createTempDirectory("graft_csv_")
    // level-1 '$' between array elements / map entries, level-2 ':'
    // inside each struct element / between map key and value
    Files.writeString(dir.resolve("d.csv"),
      Seq("id,addr,attrs",
        "1,basildon:10$parkville:22,a:1$b:2",
        "2,echuca:33,c:7").mkString("\n"))
    val t = mkComplex(s)
    t.loadCsv(dir.toString, options = Map(
      "COMPLEX_DELIMITER_LEVEL_1" -> "$", "COMPLEX_DELIMITER_LEVEL_2" -> ":"))
    val got = t.read.orderBy("id").collect()
    assert(got(0).getSeq[org.apache.spark.sql.Row](1).map(r =>
      (r.getString(0), r.getInt(1))) == Seq(("basildon", 10), ("parkville", 22)))
    assert(got(0).getMap[String, Int](2) == Map("a" -> 1, "b" -> 2))
    assert(got(1).getSeq[org.apache.spark.sql.Row](1).map(r =>
      (r.getString(0), r.getInt(1))) == Seq(("echuca", 33)))
    assert(got(1).getMap[String, Int](2) == Map("c" -> 7))
  }

  test("complex load: malformed complex cells route through the action matrix") {
    val s = StructType(Seq(StructField("id", LongType),
      StructField("info", StructType(Seq(
        StructField("age", IntegerType), StructField("name", StringType))))))
    def csvDir(): String = {
      val dir = Files.createTempDirectory("graft_csv_")
      // row 2: struct arity 3 != 2; row 3: age not a number
      Files.writeString(dir.resolve("d.csv"),
        Seq("id,info", "1,11$abc", "2,12$x$y", "3,zz$w").mkString("\n"))
      dir.toString
    }
    // FAIL: load aborts, nothing committed
    val tf = mkComplex(s)
    intercept[Exception](tf.loadCsv(csvDir(),
      options = Map("COMPLEX_DELIMITER_LEVEL_1" -> "$"),
      badRecordsAction = "FAIL"))
    assert(tf.status.visible.isEmpty)
    // IGNORE: malformed rows dropped
    val ti = mkComplex(s)
    ti.loadCsv(csvDir(), options = Map("COMPLEX_DELIMITER_LEVEL_1" -> "$"),
      badRecordsAction = "IGNORE")
    assert(ti.read.select("id").collect().map(_.getLong(0)).toSet == Set(1L))
    // REDIRECT: malformed rows quarantined, good rows land
    val bad = Files.createTempDirectory("graft_bad_").toString + "/bad"
    val tr = mkComplex(s)
    tr.loadCsv(csvDir(), options = Map("COMPLEX_DELIMITER_LEVEL_1" -> "$"),
      badRecordsAction = "REDIRECT", badRecordsPath = Some(bad))
    assert(tr.read.select("id").collect().map(_.getLong(0)).toSet == Set(1L))
    val q = spark.read.text(bad).collect().map(_.getString(0)).toSet
    assert(q.size == 2 && q.exists(_.startsWith("2,")) && q.exists(_.startsWith("3,")))
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

  test("complex load: nested projection prunes the STORED table's read schema") {
    val s = StructType(Seq(StructField("id", LongType),
      StructField("info", StructType(Seq(
        StructField("age", IntegerType), StructField("name", StringType),
        StructField("score", DoubleType))))))
    val dir = Files.createTempDirectory("graft_csv_")
    Files.writeString(dir.resolve("d.csv"),
      Seq("id,info", "1,11$abc$10.00", "2,12$abcd$10.01").mkString("\n"))
    val t = mkComplex(s)
    t.loadCsv(dir.toString, options = Map("COMPLEX_DELIMITER_LEVEL_1" -> "$"))
    // a single-leaf projection over the complex-loaded table must reach
    // the parquet reader pruned to that leaf (q_load_complex's read
    // shape) — not re-read the whole struct
    val q = t.read.select(col("id"), col("info.age"))
    val read = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        TestSpark.parquetScanOf(b.scan).readDataSchema
    }.head
    val info = read("info").dataType.asInstanceOf[StructType]
    assert(info.fieldNames.toSeq == Seq("age"),
      s"expected only info.age in the read schema, got ${info.fieldNames.mkString(",")}")
    assert(q.orderBy("id").collect().map(_.getInt(1)).toSeq == Seq(11, 12))
  }
}
