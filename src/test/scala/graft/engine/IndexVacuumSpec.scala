package graft.engine

import graft.engine.index.{Si, TextIndex, VectorIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Index GC riding CLEAN FILES (r13): posting/code rows for segments
  * CLEAN FILES physically reclaims can never serve again, so every
  * registered index (SI, text, vector) drops them and shrinks its
  * coverage ledger. Without this, years of loads+compactions leave an
  * index dominated by dead rows, and the file-grain over-cap check —
  * which must count RAW collected rows (the truncation-masking
  * invariant) — spuriously degrades selective lookups to segment
  * grain on a 100 TB table. */
class IndexVacuumSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft_vac_").toString

  test("CLEAN FILES after compaction vacuums SI and text index rows + ledgers") {
    val root = tmp()
    val src = spark.range(0, 2000).select(
      col("id").as("k"),
      concat(lit("tok"), (col("id") % 50).cast("string")).as("body"))
    val t = GraftTable.create(spark, s"$root/t", src.schema, sortColumns = Seq("k"))
    t.insert(src.filter(col("k") < 1000))
    t.insert(src.filter(col("k") >= 1000))
    val si = Si.create(t, "k", s"$root/si")
    val ti = TextIndex.create(t, "body", s"$root/ti")
    val oldSegs = t.status.visible.map(_.id).toSet
    assert(oldSegs.size == 2)

    assert(t.compact("CUSTOM", customIds = oldSegs.toSeq).isDefined)
    // victims retired but not yet reclaimed: index rows for them remain
    // (pinned reads of Compacted segments are still legal) — only their
    // coverage keeps lookups correct via the visibility filter
    val preVac = si.read.select("seg_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(oldSegs.subsetOf(preVac), s"pre-vacuum SI rows: $preVac")
    assert(Si.readWhereIn(t, "k", Seq(42L)).count() == 1)

    val removed = t.cleanFiles()
    assert(oldSegs.subsetOf(removed.toSet), s"cleanFiles removed $removed")
    // dead rows gone from BOTH index tables, ledgers shrunk to live ids
    val siSegs = si.read.select("seg_id").distinct().collect().map(_.getLong(0)).toSet
    val tiSegs = ti.read.select("seg_id").distinct().collect().map(_.getLong(0)).toSet
    assert((siSegs & oldSegs).isEmpty, s"SI still holds dead rows: $siSegs")
    assert((tiSegs & oldSegs).isEmpty, s"text index still holds dead rows: $tiSegs")
    val vis = t.status.visible.map(_.id).toSet
    // compaction auto-maintenance folded the merged segment in already
    assert(siSegs == vis && tiSegs == vis)
    // lookups still exact after the vacuum
    assert(Si.readWhereIn(t, "k", Seq(42L)).count() == 1)
    assert(TextIndex.readMatching(t, "body", "tok42").count() == 40)
  }

  test("CLEAN FILES vacuums vector index codes + fingerprints") {
    val root = tmp()
    val emb = spark.range(0, 400).select(
      col("id").cast("long").as("vec_id"),
      transform(sequence(lit(1), lit(8)),
        i => ((col("id") * 17 + i * 3) % 11).cast("double")).as("embedding"))
    val t = GraftTable.createAsSelect(spark, s"$root/t",
      emb.filter(col("vec_id") < 200))
    VectorIndex.create(t, "vec_id", "embedding", s"$root/v",
      VectorIndex.Params(dim = 8, nlist = 4, m = 4, ksub = 8))
    t.insert(emb.filter(col("vec_id") >= 200))
    val oldSegs = t.status.visible.map(_.id).toSet
    assert(t.compact("CUSTOM", customIds = oldSegs.toSeq).isDefined)
    t.cleanFiles()
    val idx = GraftTable.at(spark, s"$root/v")
    val codeSegs = idx.read.select("seg_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert((codeSegs & oldSegs).isEmpty, s"dead codes survive: $codeSegs")
    // search still exact (full probe + full rerank ≡ brute force)
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("id"), graft.ops.Ann.quantize(col("embedding")).as("qv"))
      .withColumn("nq", graft.ops.Ann.normQ(col("qv")))
    val got = VectorIndex.search(t, "embedding", queries, 3,
      nprobe = 4, rerank = 1000)
    assert(got.groupBy("query_id").count().collect().forall(_.getLong(1) == 3))
  }
}
