package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SORT_SCOPE='ZORDER_SORT': multi-dimensional write clustering.
  *
  * A lexicographic GLOBAL_SORT on (x, y) prunes files only through x; a
  * z-ordered layout makes every file a value-space rectangle, so footer
  * min/max prune on EITHER column. This spec builds the same uniform
  * 2-D grid under both layouts and asserts, through the real
  * SegmentFileIndex pruning path:
  *   - values are layout-invariant (count/sum round-trip);
  *   - a narrow band on the NON-leading column y keeps a small fraction
  *     of the z table's files but ALL of the lexicographic table's;
  *   - the leading column x still prunes on the z table;
  *   - z segments claim NO lexicographic order (sortColumns empty →
  *     outputOrdering never fires on them).
  */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark._

  private def keptFiles(t: GraftTable, cond: Column): Int = {
    val dfq = t.read.filter(cond)
    val exprs = dfq.queryExecution.optimizedPlan.collectFirst {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(c, _) => c
    }.toSeq.flatMap { e =>
      def split(c: org.apache.spark.sql.catalyst.expressions.Expression)
          : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = c match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) => split(l) ++ split(r)
        case other => Seq(other)
      }
      split(e)
    }
    val idx = new graft.engine.source.SegmentFileIndex(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      t.layout, t.status.visible, t.schema)
    idx.listFiles(Nil, exprs).map(_.files.size).sum
  }

  test("z-ordered layout prunes on BOTH dimensions; values are layout-invariant") {
    val root = Files.createTempDirectory("graft_zorder_").toString
    // 256x256 uniform grid — the adversarial case for lexicographic
    // clustering (every x-file spans ALL of y)
    val src = spark.range(0, 65536).selectExpr(
      "id % 256 AS x", "id DIV 256 AS y", "id AS v")

    val tz = GraftTable.create(spark, s"$root/z", src.schema,
      sortColumns = Seq("x", "y"), sortScope = "ZORDER_SORT",
      properties = Map("global_sort_partitions" -> "16"))
    tz.insert(src)
    val tg = GraftTable.create(spark, s"$root/g", src.schema,
      sortColumns = Seq("x", "y"), // GLOBAL_SORT (lexicographic) control
      properties = Map("global_sort_partitions" -> "16"))
    tg.insert(src)

    // layout is invisible to values
    val (n0, s0) = (src.count(), src.agg(sum("v")).head.getLong(0))
    for (t <- Seq(tz, tg)) {
      assert(t.read.count() == n0)
      assert(t.read.agg(sum("v")).head.getLong(0) == s0)
    }
    // the z rewrite must not claim a lexicographic order it doesn't have
    assert(tz.status.visible.forall(_.sortColumns.isEmpty),
      "z-ordered segments must record no sortColumns (no false ordering claim)")
    assert(tg.status.visible.forall(_.sortColumns == Seq("x", "y")))

    val total = tz.status.visible.map(_.files.size).sum
    assert(total >= 8, s"fixture needs enough files to show pruning (got $total)")

    // narrow band on the NON-leading dimension
    val yBand = col("y") >= 100L && col("y") < 116L // 16/256 of the y-range
    val zKeptY = keptFiles(tz, yBand)
    val gKeptY = keptFiles(tg, yBand)
    info(s"y-band: z-ordered kept $zKeptY/$total files, lexicographic kept $gKeptY/$total")
    assert(gKeptY == total,
      "control: a lexicographic-x layout cannot prune on y — every file spans all of y")
    assert(zKeptY * 2 <= total,
      s"z layout must prune the y band to at most half the files (kept $zKeptY/$total)")
    assert(tz.read.filter(yBand).count() == 16L * 256L)

    // the leading dimension still prunes on the z table. Bound is 2/3,
    // not 1/2: the rank map rides approxQuantile, whose GK-sketch merge
    // order shifts band boundaries by a file-width run to run (observed
    // 8/16 vs 9/16 across identical-code suite runs) — the claim here
    // is "still prunes meaningfully", the strict bound belongs to the
    // y-band above (the dimension z-order exists for).
    val xBand = col("x") >= 100L && col("x") < 116L
    val zKeptX = keptFiles(tz, xBand)
    info(s"x-band: z-ordered kept $zKeptX/$total files")
    assert(zKeptX * 3 <= total * 2,
      s"z layout must prune the x band too (kept $zKeptX/$total)")
    assert(tz.read.filter(xBand).count() == 16L * 256L)

    // copy-on-write on a z table keeps values correct (rewrite path)
    assert(Mutation.delete(tz, col("v") < 100L) == 100L)
    assert(tz.read.count() == n0 - 100L)
    GraftTable.drop(spark, s"$root/z"); GraftTable.drop(spark, s"$root/g")
  }

  test("rank normalization: a 6-sigma outlier does not collapse the clustering (VERDICT r16 #5)") {
    // min/max normalization dies here: one y = 10^9 stretches the range
    // so every real y lands in bucket ~0 and the z layout silently
    // degrades to x-only clustering. Rank (quantile) normalization
    // gives the outlier its own tail band and keeps full resolution on
    // the bulk — the y-band prune must hold as if the outlier weren't
    // there.
    val root = Files.createTempDirectory("graft_zoutlier_").toString
    val src = spark.range(0, 65536).selectExpr(
      "id % 256 AS x",
      "CASE WHEN id = 0 THEN CAST(1000000000 AS BIGINT) ELSE id DIV 256 END AS y",
      "id AS v")
    val tz = GraftTable.create(spark, s"$root/z", src.schema,
      sortColumns = Seq("x", "y"), sortScope = "ZORDER_SORT",
      properties = Map("global_sort_partitions" -> "16"))
    tz.insert(src)
    assert(tz.read.count() == 65536L)
    val total = tz.status.visible.map(_.files.size).sum
    assert(total >= 8, s"fixture needs enough files to show pruning (got $total)")
    val yBand = col("y") >= 100L && col("y") < 116L // 16/256 of the REAL y-range
    val zKeptY = keptFiles(tz, yBand)
    info(s"y-band with outlier: z-ordered kept $zKeptY/$total files")
    assert(zKeptY * 2 <= total,
      s"outlier collapsed the z clustering: y band kept $zKeptY/$total files")
    // id=0 (the outlier) had y=0 pre-rewrite — not in the band, so the
    // band still holds exactly 16 y-values x 256 rows
    assert(tz.read.filter(yBand).count() == 16L * 256L)
    GraftTable.drop(spark, s"$root/z")
  }

  test("interleave round-trip: z-neighborhoods are value-neighborhoods") {
    import graft.engine.format.ZOrderSort
    // 3-column fold path: the z of (a,b,c) grids must order buckets so
    // that prefixes of the z value bound ALL THREE coordinates — check
    // by decoding bit positions back out of a brute-forced sample
    val rnd = new scala.util.Random(7)
    val triples = Seq.fill(200)((rnd.nextInt(1 << 20).toLong,
      rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 20).toLong))
    import spark.implicits._
    val df = triples.toDF("a", "b", "c")
    val z = df.select(ZOrderSort.interleave(
      Seq(col("a"), col("b"), col("c")), 20).as("z"),
      col("a"), col("b"), col("c")).collect()
    z.foreach { r =>
      val (zv, a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      var (da, db, dc) = (0L, 0L, 0L)
      (0 until 20).foreach { i =>
        da |= ((zv >> (i * 3)) & 1L) << i
        db |= ((zv >> (i * 3 + 1)) & 1L) << i
        dc |= ((zv >> (i * 3 + 2)) & 1L) << i
      }
      assert(da == a && db == b && dc == c,
        s"z=$zv did not decode back to ($a,$b,$c) — got ($da,$db,$dc)")
    }
    // 2-column magic-spread path: same decode property at 31 bits
    val pairs = Seq.fill(200)((rnd.nextLong() & 0x7FFFFFFFL, rnd.nextLong() & 0x7FFFFFFFL))
    val z2 = pairs.toDF("a", "b").select(ZOrderSort.interleave(
      Seq(col("a"), col("b")), 31).as("z"), col("a"), col("b")).collect()
    z2.foreach { r =>
      val (zv, a, b) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var (da, db) = (0L, 0L)
      (0 until 31).foreach { i =>
        da |= ((zv >> (i * 2)) & 1L) << i
        db |= ((zv >> (i * 2 + 1)) & 1L) << i
      }
      assert(da == a && db == b, s"z=$zv did not decode back to ($a,$b)")
    }
  }
}
