package graft.engine

import graft.engine.mv.{Mv, MvCatalog, MvRewriteRule}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Soundness fuzz for the MV rewrite matcher: over seeded-random
  * (MV definition, query) pairs — single-table and join-child, every
  * grouping subset, every decomposable aggregate mix — whenever the
  * rewrite FIRES, the answer must equal the non-rewritten answer, and
  * for the known-subsumable shapes it MUST fire. This guards exactly
  * the surface the branch-wise matcher extended: differently-pruned
  * join branches, filter threading, rollup decomposition. */
class MvPropsSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String = Files.createTempDirectory("graft_mvprop_").toString

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map { r =>
      (0 until r.length).map { i =>
        r.get(i) match {
          case null => "NULL"
          case d: Double => f"$d%.9f"
          case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
          case x => x.toString
        }
      }.mkString("|")
    }.sorted.toSeq

  private def checkServed(name: String, q: => DataFrame,
      mustFire: Boolean, label: String): Unit = {
    val fired = q.queryExecution.optimizedPlan.toString.contains(name)
    if (mustFire)
      assert(fired, s"$label: rewrite should fire\n${q.queryExecution.optimizedPlan}")
    if (fired) {
      val got = canon(q.collect())
      val want = canon(MvRewriteRule.withoutRewrite { q.collect() })
      assert(got == want,
        s"$label: rewritten answer diverges\n got=${got.take(3)}\nwant=${want.take(3)}")
    }
  }

  // decomposable aggregate pool; each entry builds the SAME expression
  // for the MV and the query (alias fixed so schemas line up). avg is
  // deliberately absent: its rollup reconstruction re-orders double
  // addition (covered by MvSpec's dedicated avg case), while this fuzz
  // compares EXACT values — decimal sums, counts, min/max.
  private val aggPool: Seq[(String, () => Column)] = Seq(
    "sum_q" -> (() => sum(col("l_quantity").cast("decimal(18,4)")).as("sum_q")),
    "cnt" -> (() => count(lit(1)).as("cnt")),
    "min_p" -> (() => min(col("l_extendedprice")).as("min_p")),
    "max_p" -> (() => max(col("l_extendedprice")).as("max_p")))

  test("single-table rollup fuzz: every grouping subset of the MV serves exactly") {
    val rnd = new scala.util.Random(20260814L)
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_linestatus", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount")
    val groupCols = Seq("l_returnflag", "l_linestatus", "l_linenumber")
    (1 to 3).foreach { round =>
      // random MV: 2-3 grouping cols, 2-4 aggregates (always incl. cnt
      // so empty-group rollups stay answerable)
      val mvGroups = rnd.shuffle(groupCols).take(2 + rnd.nextInt(2))
      val mvAggs = ("cnt" +: rnd.shuffle(aggPool.map(_._1)).take(1 + rnd.nextInt(3))).distinct
      def aggsOf(names: Seq[String]) = {
        val m = aggPool.toMap
        names.map(n => m(n)())
      }
      val mvq = base.groupBy(mvGroups.map(col): _*)
        .agg(aggsOf(mvAggs).head, aggsOf(mvAggs).tail: _*)
      val name = s"mv_prop_$round"
      Mv.create(spark, name, mvq, s"${tmp()}/$name")
      try {
        // every grouping subset (incl. empty = global agg), random agg
        // subset of the MV's — all must serve and agree
        val subsets = (0 to mvGroups.size).flatMap(k => mvGroups.combinations(k))
        subsets.foreach { g =>
          val qa = rnd.shuffle(mvAggs).take(1 + rnd.nextInt(mvAggs.size))
          def q =
            if (g.isEmpty) base.agg(aggsOf(qa).head, aggsOf(qa).tail: _*)
            else base.groupBy(g.map(col): _*).agg(aggsOf(qa).head, aggsOf(qa).tail: _*)
          checkServed(name, q, mustFire = true, s"round $round groups=$g aggs=$qa")
        }
        // a grouping OUTSIDE the MV must not be served by it
        val extra = groupCols.filterNot(mvGroups.contains)
        extra.headOption.foreach { e =>
          val q = base.groupBy((mvGroups :+ e).map(col): _*)
            .agg(count(lit(1)).as("cnt"))
          assert(!q.queryExecution.optimizedPlan.toString.contains(name),
            s"round $round: grouping on non-MV column $e must block the rewrite")
        }
        // an aggregate OUTSIDE the MV's set must not be served either
        val missing = aggPool.map(_._1).filterNot(mvAggs.contains)
        missing.headOption.foreach { a =>
          val q = base.groupBy(mvGroups.map(col): _*).agg(aggsOf(Seq(a)).head)
          assert(!q.queryExecution.optimizedPlan.toString.contains(name),
            s"round $round: aggregate $a absent from the MV must block the rewrite")
        }
      } finally Mv.drop(spark, name)
    }
  }

  test("join-child rollup fuzz: branch-pruned subsets serve exactly") {
    val rnd = new scala.util.Random(42L)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    def joined = orders.join(customer, col("o_custkey") === col("c_custkey"))
    val groupCols = Seq("c_mktsegment", "o_orderstatus", "o_orderpriority")
    val jAggs: Seq[(String, () => Column)] = Seq(
      "cnt" -> (() => count(lit(1)).as("cnt")),
      "sum_p" -> (() => sum(col("o_totalprice").cast("decimal(18,4)")).as("sum_p")),
      "min_b" -> (() => min(col("c_acctbal")).as("min_b")))
    (1 to 2).foreach { round =>
      val mvGroups = rnd.shuffle(groupCols).take(2 + rnd.nextInt(2))
      val name = s"mv_jprop_$round"
      val m = jAggs.toMap
      val mvq = joined.groupBy(mvGroups.map(col): _*)
        .agg(m("cnt")(), m("sum_p")(), m("min_b")())
      Mv.create(spark, name, mvq, s"${tmp()}/$name")
      try {
        val subsets = (0 to mvGroups.size).flatMap(k => mvGroups.combinations(k))
        subsets.foreach { g =>
          val qa = rnd.shuffle(jAggs.map(_._1)).take(1 + rnd.nextInt(3))
          def q =
            if (g.isEmpty) joined.agg(m(qa.head)(), qa.tail.map(n => m(n)()): _*)
            else joined.groupBy(g.map(col): _*).agg(m(qa.head)(), qa.tail.map(n => m(n)()): _*)
          checkServed(name, q, mustFire = true, s"jround $round groups=$g aggs=$qa")
        }
        // the same aggregate over a DIFFERENT join condition: never served
        val other = orders.join(customer, col("o_custkey") === col("c_nationkey"))
          .groupBy(mvGroups.head).agg(count(lit(1)).as("cnt"))
        assert(!other.queryExecution.optimizedPlan.toString.contains(name),
          s"jround $round: different join condition must block the rewrite")
        // a semi-join over the same tables: never served
        val semi = orders.join(customer, col("o_custkey") === col("c_custkey"), "left_semi")
          .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
        assert(!semi.queryExecution.optimizedPlan.toString.contains(name),
          s"jround $round: different join type must block the rewrite")
      } finally Mv.drop(spark, name)
    }
  }

  test("select-only fuzz: projection subsets + conjunct supersets serve exactly") {
    val rnd = new scala.util.Random(20260815L)
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_linenumber")
    // conjunct pool over columns the MV will store
    val condPool: Seq[(String, () => Column)] = Seq(
      "qty" -> (() => col("l_quantity") > 25),
      "price" -> (() => col("l_extendedprice") > 10000),
      "line" -> (() => col("l_linenumber") <= 4))
    val m = condPool.toMap
    def andAll(names: Seq[String]): Column =
      names.map(n => m(n)()).reduce(_ && _)
    (1 to 3).foreach { round =>
      // random MV: 3-5 stored columns, 0-2 filter conjuncts
      val mvCols = rnd.shuffle(base.columns.toSeq).take(3 + rnd.nextInt(3))
      val mvConds = rnd.shuffle(condPool.map(_._1)).take(rnd.nextInt(3))
      // filter columns must be stored for the residual fuzz to work
      val stored = (mvCols ++ Seq("l_quantity", "l_extendedprice", "l_linenumber")).distinct
      val mvq0 = if (mvConds.isEmpty) base else base.filter(andAll(mvConds))
      val mvq = mvq0.select(stored.map(col): _*)
      val name = s"mv_selprop_$round"
      Mv.create(spark, name, mvq, s"${tmp()}/$name")
      try {
        // query: any stored-column subset, any conjunct SUPERSET of the
        // MV's — must serve and agree (rows compared with multiplicity)
        (1 to 4).foreach { i =>
          val qCols = rnd.shuffle(stored).take(1 + rnd.nextInt(stored.size))
          val extras = rnd.shuffle(condPool.map(_._1).filterNot(mvConds.contains))
            .take(rnd.nextInt(2))
          val qConds = mvConds ++ extras
          def q =
            if (qConds.isEmpty) base.select(qCols.map(col): _*)
            else base.filter(andAll(qConds)).select(qCols.map(col): _*)
          checkServed(name, q, mustFire = true,
            s"sel round $round case $i cols=$qCols conds=$qConds")
        }
        // a conjunct SUBSET (weaker filter) must never serve
        if (mvConds.nonEmpty) {
          val weaker = mvConds.drop(1)
          val q = (if (weaker.isEmpty) base else base.filter(andAll(weaker)))
            .select(stored.head)
          assert(!q.queryExecution.optimizedPlan.toString.contains(name),
            s"sel round $round: weaker filter $weaker must block the rewrite")
        }
        // a projection outside the stored set must never serve
        base.columns.find(!stored.contains(_)).foreach { outside =>
          val q = (if (mvConds.isEmpty) base else base.filter(andAll(mvConds)))
            .select(outside)
          assert(!q.queryExecution.optimizedPlan.toString.contains(name),
            s"sel round $round: projection of $outside must block the rewrite")
        }
      } finally Mv.drop(spark, name)
    }
  }
}
