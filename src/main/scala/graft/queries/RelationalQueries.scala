package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Spark-delegated relational operator coverage (SURVEY.md §2.2–§2.6).
  *
  * The reference delegates joins/aggs/windows/sorts/set-ops/scalar fns to
  * Spark (SURVEY §2.3–§2.6); these queries convert that "built-in" claim
  * into measured CORRECTNESS rows against the DuckDB oracle. Each entry's
  * oracle SQL is written for cross-engine determinism (see [[Q]]).
  */
object RelationalQueries {

  def queries: Map[String, QFn] = Map(
    // ---- flagship: TPC-H Q1 shape (filter + group-agg over lineitem) ----
    "q1_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dpsum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .as("sum_disc_price"),
          dpsum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
            * (one + dec(col("l_tax")))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
    }),

    // ---- filters: every §2.2 predicate family ----
    "q_filter_between_in" -> ((s, d) => {
      t(s, d, "orders")
        .filter(col("o_orderstatus").isin("O", "F") &&
          col("o_totalprice").between(1000.0, 50000.0) &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
    }),
    "q_filter_like" -> ((s, d) => {
      t(s, d, "part")
        .filter(col("p_name").like("%a%") && !col("p_brand").like("%#4%")
          && col("p_type").startsWith("t") === false)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"), sum(col("p_size").cast("long")).as("sum_size"))
    }),
    "q_filter_not_in_null" -> ((s, d) => {
      // NOT IN, <>, IS NULL / IS NOT NULL (nulls manufactured via nullif)
      t(s, d, "lineitem")
        .filter(!col("l_returnflag").isin("A") && col("l_linestatus") =!= "X")
        .select(col("l_orderkey"), nullif(col("l_discount"), lit(0.0)).as("d"))
        .groupBy()
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("d").isNull, 1L).otherwise(0L)).as("null_disc"),
          sum(when(col("d").isNotNull, 1L).otherwise(0L)).as("nonnull_disc"))
    }),
    "q_filter_complex_bool" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter((col("l_quantity") < 10 || col("l_quantity") > 45) &&
          !(col("l_returnflag") === "N" && col("l_linestatus") === "F"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
    }),

    // ---- joins (§2.3): inner / left / semi / anti / full / cross / broadcast ----
    "q_join_inner" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders"); val n = t(s, d, "nation")
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(o, o("o_custkey") === c("c_custkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("revenue"))
    }),
    "q_join_left" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_mktsegment")
        .agg(count(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows"),
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("custs_no_order"))
    }),
    "q_join_semi" -> ((s, d) => {
      val c = t(s, d, "customer")
      val bigOrders = t(s, d, "orders").filter(col("o_totalprice") > 150000.0)
      c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
    }),
    "q_join_anti" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 300000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
    }),
    "q_join_full" -> ((s, d) => {
      val cn = t(s, d, "customer").groupBy(col("c_nationkey").as("k"))
        .agg(count(lit(1)).as("n_cust"))
      val sn = t(s, d, "supplier").groupBy(col("s_nationkey").as("k"))
        .agg(count(lit(1)).as("n_supp"))
      cn.join(sn, cn("k") === sn("k"), "full")
        .select(coalesce(cn("k"), sn("k")).cast("long").as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    }),
    "q_join_cross" -> ((s, d) => {
      val r = t(s, d, "region"); val n = t(s, d, "nation")
      r.crossJoin(n)
        .select(col("r_regionkey").cast("long").as("rk"),
          col("n_nationkey").cast("long").as("nk"),
          concat(col("r_name"), lit("/"), col("n_name")).as("pair"))
    }),
    "q_join_broadcast" -> ((s, d) => {
      // explicit broadcast of the small dims — at 100 TB the fact side
      // streams while nation/region ship to every executor
      val l = t(s, d, "lineitem"); val su = t(s, d, "supplier")
      val n = t(s, d, "nation"); val r = t(s, d, "region")
      l.join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("cnt"),
          dpsum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .as("revenue"))
    }),

    // ---- aggregation (§2.4): distinct / grouping sets / rollup / cube ----
    "q_agg_distinct" -> ((s, d) => {
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          sum_distinct(dec(col("l_quantity"))).cast("double").as("sum_dist_qty"))
    }),
    "q_agg_groupingsets" -> ((s, d) => {
      views(s, d)
      s.sql("""SELECT o_orderstatus, o_orderpriority,
               count(*) AS cnt,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g1,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g2
               FROM orders
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
    }),
    "q_agg_rollup" -> ((s, d) => {
      t(s, d, "lineitem").rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
    }),
    "q_agg_cube" -> ((s, d) => {
      t(s, d, "orders").cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
    }),
    "q_agg_having_minmax" -> ((s, d) => {
      t(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"),
          min(col("o_orderdate")).as("first_order"),
          max(col("o_orderdate")).as("last_order"),
          min(col("o_orderpriority")).as("min_prio"),
          dsum(col("o_totalprice")).as("spend"))
        .filter(col("cnt") >= 20)
    }),
    "q_countstar" -> ((s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("cnt"))),

    // ---- windows (§2.5): rank family / frames / lag-lead ----
    "q_window_rank" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, d, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 5)
    }),
    "q_window_frame" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, d, "orders").filter(col("o_custkey") % 10 === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_spend"),
          count(lit(1))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("running_n"))
    }),
    "q_window_lag" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, d, "orders").filter(col("o_custkey") % 20 === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_key"),
          lead(col("o_orderkey"), 1).over(w).as("next_key"),
          (dec(col("o_totalprice")) - dec(lag(col("o_totalprice"), 1).over(w)))
            .cast("double").as("delta_price"))
    }),

    // ---- sort / limit / top-k (§2.6) ----
    "q_sort_limit" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    }),

    // ---- range (interval) join: points⋈containing-intervals as a
    // bucketized EQUI-join + exact residual (RangeJoin.scala — a raw
    // BETWEEN would plan a nested loop); per-interval aggregate keeps
    // the row's output compact while checking every containment ----
    "q_range_join" -> ((s, d) => {
      import graft.ops.RangeJoin
      val pts = t(s, d, "customer")
        .select(col("c_custkey").as("pid"), ((col("c_custkey") * 7) % 10000).as("x"))
      val iv = t(s, d, "orders").filter(col("o_orderkey") % 200 === 0)
        .select(col("o_orderkey").as("iid"),
          ((col("o_custkey") * 3) % 10000).as("lo"))
        .withColumn("hi", col("lo") + (col("iid") % 97))
      RangeJoin.rangeJoin(pts, iv, "x", "lo", "hi", bucketWidth = 64)
        .groupBy(col("iid"))
        .agg(count(lit(1)).as("cnt"), sum(col("pid")).as("pid_sum"))
    }),

    // ---- as-of (point-in-time) join: each sampled event picks up the
    // latest state checkpoint at or before its timestamp — union +
    // running last() per key, ONE shuffle, no range explosion (AsOf
    // .scala); DuckDB's native ASOF JOIN is the oracle. Timestamps
    // compare at micros on both sides (ns-truncated identically). ----
    "q_asof_join" -> ((s, d) => {
      import graft.ops.AsOf
      val e = t(s, d, "events").select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("tsu"), col("value"))
      val state = e.filter(col("event_id") % 20 === 0)
        .groupBy("user_id", "tsu").agg(max(col("value")).as("state"))
      val probes = e.filter(col("event_id") % 7 === 0)
        .select("event_id", "user_id", "tsu")
      // tsBuckets=4 exercises the skew-safe plan (window partitions on
      // (key, ts-bucket) + carry-forward join) against the DuckDB oracle
      AsOf.asofJoin(probes, state, "user_id", "tsu", Seq("state"), tsBuckets = 4)
    }),

    // ---- skyline: Pareto-optimal orders (cheapest-and-most-recent
    // front) via the exact two-phase distributed plan (local dominance
    // buffers, pooled global pass — Skyline.scala, EDBT 2023) ----
    "q_skyline" -> ((s, d) => {
      import graft.ops.Skyline
      val src = t(s, d, "orders").select(col("o_orderkey"),
        col("o_totalprice"), unix_timestamp(col("o_orderdate")).as("o_ts"))
      Skyline.skyline(src,
          Seq("o_totalprice" -> true, "o_ts" -> false))
        .select("o_orderkey", "o_totalprice", "o_ts")
    }),

    // ---- set ops (§2.6) ----
    "q_set_union" -> ((s, d) => {
      val o = t(s, d, "orders")
      val a = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k"))
      val b = o.filter(col("o_totalprice") > 100000.0).select(col("o_custkey").as("k"))
      a.union(b).distinct()
    }),
    "q_set_intersect" -> ((s, d) => {
      val o = t(s, d, "orders")
      val a = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
      val b = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("k"))
      a.intersect(b)
    }),
    "q_set_except" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_custkey").as("k"))
      val o = t(s, d, "orders").filter(col("o_totalprice") > 250000.0)
        .select(col("o_custkey").as("k"))
      c.except(o)
    }),
    "q_union_all" -> ((s, d) => {
      val o = t(s, d, "orders")
      val a = o.filter(col("o_orderstatus") === "P")
        .select(col("o_orderkey"), lit("p").as("tag"))
      val b = o.filter(col("o_orderpriority") === "5-LOW" && col("o_orderstatus") === "P")
        .select(col("o_orderkey"), lit("low").as("tag"))
      a.union(b).groupBy("tag").agg(count(lit(1)).as("cnt"))
    }),

    // ---- scalar function surface (§2.6) ----
    "q_fn_string" -> ((s, d) => {
      t(s, d, "nation").select(
        col("n_nationkey").cast("long").as("k"),
        upper(col("n_name")).as("up"),
        lower(col("n_name")).as("lo"),
        substring(col("n_name"), 1, 3).as("pre"),
        length(col("n_name")).cast("long").as("len"),
        concat(col("n_name"), lit("#"), col("n_regionkey").cast("string")).as("cc"),
        regexp_replace(col("n_name"), "A", "@").as("repl"),
        lpad(col("n_name"), 12, "_").as("pad"),
        reverse(col("n_name")).as("rev"),
        instr(col("n_name"), "AN").cast("long").as("pos"),
        trim(lit("  x  ")).as("trimmed"))
    }),
    "q_fn_date" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("cnt"),
          min(dayofmonth(col("o_orderdate")).cast("long")).as("min_dom"),
          max(quarter(col("o_orderdate")).cast("long")).as("max_q"))
    }),
    "q_fn_datetrunc" -> ((s, d) => {
      // timeseries(col,'granularity') analog: date_trunc bucketing (§2.4)
      t(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("bucket"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
    }),
    "q_fn_math" -> ((s, d) => {
      t(s, d, "part").select(
        col("p_partkey").cast("long").as("k"),
        abs(dec(col("p_retailprice")) - lit(1000).cast(D)).cast("double").as("absdiff"),
        ceil(col("p_retailprice")).cast("long").as("ceilv"),
        floor(col("p_retailprice")).cast("long").as("floorv"),
        round(dec(col("p_retailprice")), 1).cast("double").as("round1"),
        sqrt(col("p_retailprice")).as("sq"),
        (col("p_partkey") % 7).cast("long").as("m7"),
        greatest(col("p_size"), lit(25)).cast("long").as("gr"),
        least(col("p_size"), lit(25)).cast("long").as("le"))
    }),
    "q_fn_case" -> ((s, d) => {
      t(s, d, "customer").select(
        col("c_custkey").cast("long").as("k"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("bucket"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(b)")).as("seg"))
    }),
    "q_fn_array" -> ((s, d) => {
      // array fns over embeddings: size / element_at / slice + exact
      // quantized fold (aggregate) — see Q for the cross-engine contract
      t(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first"),
        aggregate(
          transform(slice(col("embedding"), 1, 8),
            x => floor(x.cast("double") * 10000).cast("long")),
          lit(0L), (acc, x) => acc + x).as("qsum8"))
    }),
    "q_fn_posexplode" -> ((s, d) => {
      // generator functions (explode/posexplode — Spark-delegated like
      // the reference, SURVEY §2.10)
      t(s, d, "embeddings")
        .select(posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy((col("pos") % 8).cast("long").as("bucket"))
        .agg(sum(floor(col("x").cast("double") * 10000).cast("long")).as("qsum"),
          count(lit(1)).as("cnt"))
    }),
    "q_fn_json" -> ((s, d) => {
      t(s, d, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("k").agg(count(lit(1)).as("cnt"))
    }),

    "q_agg_pivot" -> ((s, d) => {
      // pivot (orderstatus → columns); oracle = FILTERed aggregates
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(dec(col("o_totalprice"))).cast("double"))
        .withColumnsRenamed(Map("F" -> "f_sum", "O" -> "o_sum", "P" -> "p_sum"))
    }),

    // ---- subqueries ----
    "q_subquery_scalar" -> ((s, d) => {
      views(s, d)
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_totalprice > 1.8 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) / count(*) FROM orders)""")
    }),
    "q_subquery_in" -> ((s, d) => {
      views(s, d)
      s.sql("""SELECT c_mktsegment, count(*) AS cnt FROM customer
               WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
               GROUP BY c_mktsegment""")
    }),
    // correlated EXISTS / NOT EXISTS (planned as semi/anti joins)
    "q_subquery_exists" -> ((s, d) => {
      views(s, d)
      s.sql("""SELECT c_mktsegment, count(*) AS cnt FROM customer c
               WHERE EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
                 AND NOT EXISTS (SELECT 1 FROM orders o2
                                 WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
               GROUP BY c_mktsegment""")
    }),
    // null-safe equality join (IS NOT DISTINCT FROM) over derived
    // nullable keys
    "q_join_nullsafe" -> ((s, d) => {
      views(s, d)
      s.sql("""SELECT a.k AS k, count(*) AS cnt FROM
                 (SELECT nullif(c_nationkey % 5, 0) AS k FROM customer) a
               JOIN (SELECT nullif(n_nationkey % 5, 0) AS k FROM nation) b
                 ON a.k IS NOT DISTINCT FROM b.k
               GROUP BY a.k""")
    }),
    // ntile / percent_rank / cume_dist — rank-family beyond q_window_rank
    "q_window_ntile" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(dec(col("o_totalprice")), col("o_orderkey"))
      t(s, d, "orders").select(
        col("o_orderkey"),
        ntile(4).over(w).cast("long").as("nt"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
    }),
    // date arithmetic: date_add / add_months / datediff vs a fixed pin
    "q_fn_datearith" -> ((s, d) => {
      // fixture o_orderdate is a timestamp; date arithmetic is pinned
      // to DATE on both engines
      val od = col("o_orderdate").cast("date")
      t(s, d, "orders")
        .groupBy(year(od).cast("long").as("y"))
        .agg(count(lit(1)).as("cnt"),
          // dates travel as strings: a DATE column stringifies with a
          // midnight suffix in some readers, breaking the hash contract
          min(date_add(od, 30)).cast("string").as("min_plus30"),
          max(add_months(od, 2)).cast("string").as("max_plus2m"),
          sum(datediff(lit("1998-12-01").cast("date"), od)
            .cast("long")).as("sum_dd"))
    }),
    // NULLS LAST ordering drives the LIMIT selection (nulls must lose)
    "q_sort_nulls" -> ((s, d) => {
      t(s, d, "orders")
        .select(nullif(col("o_custkey") % 7, lit(3)).as("k"), col("o_orderkey"))
        .orderBy(col("k").asc_nulls_last, col("o_orderkey"))
        .limit(50)
    }),

    // ---- events / streaming-shaped batch query ----
    "q_events_hourly" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"),
          countDistinct(col("user_id")).as("users"))
    }),

    // gap-based sessionization: one shuffle on user_id reused by both
    // window passes AND the final per-session agg (subset clustering)
    "q_sessionize" -> ((s, d) =>
      graft.ops.Sessionize.assign(t(s, d, "events"),
          "user_id", "ts", "event_id", SessGapUs)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"))),

    // same rollup through the skew-safe (user, ts-bucket) plan — its own
    // oracle row so the B>1 path carries driver evidence, not just specs
    "q_sessionize_bucketed" -> ((s, d) =>
      graft.ops.Sessionize.assign(t(s, d, "events"),
          "user_id", "ts", "event_id", SessGapUs, tsBuckets = 4)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value")))
  )

  // 8h inactivity gap: ~4.7k sessions over sf0.01's 10k events
  private val SessGapUs = 480L * 60L * 1000000L

  def oracle: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
          ${oDsum("l_quantity")} AS sum_qty,
          ${oDsum("l_extendedprice")} AS sum_base_price,
          ${oDpsum(s"""${oDec("l_extendedprice")} * (CAST(1 AS DECIMAL(12,4)) - ${oDec("l_discount")})""")} AS sum_disc_price,
          ${oDpsum(s"""${oDec("l_extendedprice")} * (CAST(1 AS DECIMAL(12,4)) - ${oDec("l_discount")}) * (CAST(1 AS DECIMAL(12,4)) + ${oDec("l_tax")})""")} AS sum_charge,
          ${oDavg("l_quantity")} AS avg_qty,
          ${oDavg("l_extendedprice")} AS avg_price,
          count(*) AS count_order
          FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          GROUP BY l_returnflag, l_linestatus""",
    "q_filter_between_in" ->
      s"""SELECT o_orderpriority, count(*) AS cnt, ${oDsum("o_totalprice")} AS sum_price
          FROM orders
          WHERE o_orderstatus IN ('O','F') AND o_totalprice BETWEEN 1000.0 AND 50000.0
            AND o_orderdate >= TIMESTAMP '1996-01-01'
          GROUP BY o_orderpriority""",
    "q_filter_like" ->
      """SELECT p_brand, count(*) AS cnt, CAST(sum(p_size) AS BIGINT) AS sum_size
         FROM part
         WHERE p_name LIKE '%a%' AND p_brand NOT LIKE '%#4%' AND NOT (p_type LIKE 't%')
         GROUP BY p_brand""",
    "q_filter_not_in_null" ->
      """SELECT count(*) AS cnt,
         CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_disc,
         CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nonnull_disc
         FROM lineitem WHERE l_returnflag NOT IN ('A') AND l_linestatus <> 'X'""",
    "q_filter_complex_bool" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem
         WHERE (l_quantity < 10 OR l_quantity > 45)
           AND NOT (l_returnflag = 'N' AND l_linestatus = 'F')
         GROUP BY l_returnflag, l_linestatus""",
    "q_join_inner" ->
      s"""SELECT n_name, count(*) AS cnt, ${oDsum("o_totalprice")} AS revenue
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          JOIN orders ON o_custkey = c_custkey
          GROUP BY n_name""",
    "q_join_left" ->
      """SELECT c_mktsegment, count(o_orderkey) AS n_orders, count(*) AS n_rows,
         CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS custs_no_order
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_mktsegment""",
    "q_join_semi" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
         GROUP BY c_mktsegment""",
    "q_join_anti" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
         GROUP BY c_mktsegment""",
    "q_join_full" ->
      """SELECT CAST(coalesce(c.k, s.k) AS BIGINT) AS nationkey,
         coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
         FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
         FULL JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
         ON c.k = s.k""",
    "q_join_cross" ->
      """SELECT CAST(r_regionkey AS BIGINT) AS rk, CAST(n_nationkey AS BIGINT) AS nk,
         r_name || '/' || n_name AS pair
         FROM region CROSS JOIN nation""",
    "q_join_broadcast" ->
      s"""SELECT r_name, count(*) AS cnt,
          ${oDpsum(s"""${oDec("l_extendedprice")} * (CAST(1 AS DECIMAL(12,4)) - ${oDec("l_discount")})""")} AS revenue
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name""",
    "q_agg_distinct" ->
      s"""SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
          count(DISTINCT l_partkey) AS n_part,
          CAST(sum(DISTINCT ${oDec("l_quantity")}) AS DOUBLE) AS sum_dist_qty
          FROM lineitem GROUP BY l_returnflag""",
    "q_agg_groupingsets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
         CAST(grouping(o_orderstatus) AS BIGINT) AS g1,
         CAST(grouping(o_orderpriority) AS BIGINT) AS g2
         FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",
    "q_agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS cnt, ${oDsum("l_quantity")} AS sum_qty
          FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q_agg_having_minmax" ->
      s"""SELECT o_custkey, count(*) AS cnt, min(o_orderdate) AS first_order,
          max(o_orderdate) AS last_order, min(o_orderpriority) AS min_prio,
          ${oDsum("o_totalprice")} AS spend
          FROM orders GROUP BY o_custkey HAVING count(*) >= 20""",
    "q_countstar" -> "SELECT count(*) AS cnt FROM lineitem",
    "q_window_rank" ->
      """SELECT * FROM (
           SELECT c_mktsegment, c_custkey, c_acctbal,
             CAST(rank() OVER w AS BIGINT) AS rnk,
             CAST(dense_rank() OVER w AS BIGINT) AS drnk,
             CAST(row_number() OVER w AS BIGINT) AS rn
           FROM customer
           WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
         ) WHERE rn <= 5""",
    "q_window_frame" ->
      """SELECT o_custkey, o_orderkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(12,4))) OVER w AS DOUBLE) AS running_spend,
         count(*) OVER w AS running_n
         FROM orders WHERE o_custkey % 10 = 0
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey,
         lag(o_orderkey, 1) OVER w AS prev_key,
         lead(o_orderkey, 1) OVER w AS next_key,
         CAST(CAST(o_totalprice AS DECIMAL(12,4)) - CAST(lag(o_totalprice, 1) OVER w AS DECIMAL(12,4)) AS DOUBLE) AS delta_price
         FROM orders WHERE o_custkey % 20 = 0
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""",
    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "q_range_join" ->
      """WITH pts AS (
           SELECT c_custkey AS pid, (c_custkey * 7) % 10000 AS x FROM customer),
         iv AS (
           SELECT o_orderkey AS iid, (o_custkey * 3) % 10000 AS lo,
             (o_custkey * 3) % 10000 + (o_orderkey % 97) AS hi
           FROM orders WHERE o_orderkey % 200 = 0)
         SELECT iid, count(*) AS cnt, CAST(sum(pid) AS BIGINT) AS pid_sum
         FROM pts JOIN iv ON pts.x BETWEEN iv.lo AND iv.hi
         GROUP BY iid""",
    "q_asof_join" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(ts) AS tsu, "value" FROM events),
         state AS (
           SELECT user_id, tsu, max("value") AS state
           FROM e WHERE event_id % 20 = 0 GROUP BY 1, 2),
         probes AS (
           SELECT event_id, user_id, tsu FROM e WHERE event_id % 7 = 0)
         SELECT p.event_id, p.user_id, p.tsu, s.state
         FROM probes p ASOF LEFT JOIN state s
           ON p.user_id = s.user_id AND p.tsu >= s.tsu""",
    "q_skyline" ->
      """WITH o AS (
           SELECT o_orderkey, o_totalprice,
             CAST(epoch(o_orderdate) AS BIGINT) AS o_ts
           FROM orders)
         SELECT o_orderkey, o_totalprice, o_ts FROM o a
         WHERE NOT EXISTS (
           SELECT 1 FROM o b
           WHERE b.o_totalprice <= a.o_totalprice AND b.o_ts >= a.o_ts
             AND (b.o_totalprice < a.o_totalprice OR b.o_ts > a.o_ts))""",
    "q_set_union" ->
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
         UNION
         SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000.0""",
    "q_set_intersect" ->
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'""",
    "q_set_except" ->
      """SELECT c_custkey AS k FROM customer
         EXCEPT
         SELECT o_custkey AS k FROM orders WHERE o_totalprice > 250000.0""",
    "q_union_all" ->
      """SELECT tag, count(*) AS cnt FROM (
           SELECT o_orderkey, 'p' AS tag FROM orders WHERE o_orderstatus = 'P'
           UNION ALL
           SELECT o_orderkey, 'low' AS tag FROM orders
           WHERE o_orderpriority = '5-LOW' AND o_orderstatus = 'P'
         ) GROUP BY tag""",
    "q_fn_string" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS k, upper(n_name) AS up, lower(n_name) AS lo,
         substr(n_name, 1, 3) AS pre, CAST(length(n_name) AS BIGINT) AS len,
         n_name || '#' || CAST(n_regionkey AS VARCHAR) AS cc,
         regexp_replace(n_name, 'A', '@', 'g') AS repl,
         lpad(n_name, 12, '_') AS pad, reverse(n_name) AS rev,
         CAST(strpos(n_name, 'AN') AS BIGINT) AS pos,
         trim('  x  ') AS trimmed
         FROM nation""",
    "q_fn_date" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m,
         count(*) AS cnt,
         CAST(min(dayofmonth(o_orderdate)) AS BIGINT) AS min_dom,
         CAST(max(quarter(o_orderdate)) AS BIGINT) AS max_q
         FROM orders GROUP BY 1, 2""",
    "q_fn_datetrunc" ->
      s"""SELECT date_trunc('month', o_orderdate) AS bucket, count(*) AS cnt,
          ${oDsum("o_totalprice")} AS sum_price
          FROM orders GROUP BY 1""",
    "q_fn_math" ->
      """SELECT CAST(p_partkey AS BIGINT) AS k,
         CAST(abs(CAST(p_retailprice AS DECIMAL(12,4)) - CAST(1000 AS DECIMAL(12,4))) AS DOUBLE) AS absdiff,
         CAST(ceil(p_retailprice) AS BIGINT) AS ceilv,
         CAST(floor(p_retailprice) AS BIGINT) AS floorv,
         CAST(round(CAST(p_retailprice AS DECIMAL(12,4)), 1) AS DOUBLE) AS round1,
         sqrt(p_retailprice) AS sq,
         CAST(p_partkey % 7 AS BIGINT) AS m7,
         CAST(greatest(p_size, 25) AS BIGINT) AS gr,
         CAST(least(p_size, 25) AS BIGINT) AS le
         FROM part""",
    "q_fn_case" ->
      """SELECT CAST(c_custkey AS BIGINT) AS k,
         CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bucket,
         coalesce(nullif(c_mktsegment, 'BUILDING'), '(b)') AS seg
         FROM customer""",
    "q_fn_array" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
         CAST(embedding[1] AS DOUBLE) AS first,
         CAST(list_sum(list_transform(embedding[1:8],
           x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))) AS BIGINT) AS qsum8
         FROM embeddings""",
    "q_fn_posexplode" ->
      """SELECT CAST((i - 1) % 8 AS BIGINT) AS bucket,
         CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT) AS qsum,
         count(*) AS cnt
         FROM (SELECT embedding, unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)
         GROUP BY 1""",
    "q_fn_json" ->
      """SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k, count(*) AS cnt
         FROM events GROUP BY 1""",
    "q_agg_pivot" ->
      s"""SELECT o_orderpriority,
          CAST(sum(${oDec("o_totalprice")}) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS f_sum,
          CAST(sum(${oDec("o_totalprice")}) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS o_sum,
          CAST(sum(${oDec("o_totalprice")}) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS p_sum
          FROM orders GROUP BY o_orderpriority""",
    "q_subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice > 1.8 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) / count(*) FROM orders)""",
    "q_subquery_in" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM customer
         WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
         GROUP BY c_mktsegment""",
    "q_subquery_exists" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
           AND NOT EXISTS (SELECT 1 FROM orders o2
                           WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
         GROUP BY c_mktsegment""",
    "q_join_nullsafe" ->
      """SELECT a.k AS k, CAST(count(*) AS BIGINT) AS cnt FROM
           (SELECT nullif(c_nationkey % 5, 0) AS k FROM customer) a
         JOIN (SELECT nullif(n_nationkey % 5, 0) AS k FROM nation) b
           ON a.k IS NOT DISTINCT FROM b.k
         GROUP BY a.k""",
    "q_window_ntile" ->
      """SELECT o_orderkey,
           CAST(ntile(4) OVER w AS BIGINT) AS nt,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY CAST(o_totalprice AS DECIMAL(12,4)), o_orderkey)""",
    "q_fn_datearith" ->
      """SELECT CAST(EXTRACT(year FROM od) AS BIGINT) AS y,
           count(*) AS cnt,
           CAST(min(od + 30) AS VARCHAR) AS min_plus30,
           CAST(CAST(max(od + INTERVAL 2 MONTH) AS DATE) AS VARCHAR) AS max_plus2m,
           CAST(sum(datediff('day', od, DATE '1998-12-01')) AS BIGINT) AS sum_dd
         FROM (SELECT CAST(o_orderdate AS DATE) AS od FROM orders) GROUP BY 1""",
    "q_sort_nulls" ->
      """SELECT nullif(o_custkey % 7, 3) AS k, o_orderkey FROM orders
         ORDER BY k ASC NULLS LAST, o_orderkey LIMIT 50""",
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type, count(*) AS cnt,
         min("value") AS min_v, max("value") AS max_v,
         count(DISTINCT user_id) AS users
         FROM events GROUP BY 1, 2""",
    "q_sessionize" ->
      s"""WITH ev AS (SELECT user_id, ts, event_id, "value" FROM events),
          ${graft.ops.Sessionize.oSessions("ev", "user_id", "ts", "event_id", SessGapUs)}
          SELECT user_id, session_seq,
            min(ts) AS session_start, max(ts) AS session_end,
            count(*) AS n_events, ${oDsum("\"value\"")} AS sum_value
          FROM sessed GROUP BY user_id, session_seq""",
    "q_sessionize_bucketed" ->
      s"""WITH ev AS (SELECT user_id, ts, event_id, "value" FROM events),
          ${graft.ops.Sessionize.oSessions("ev", "user_id", "ts", "event_id", SessGapUs)}
          SELECT user_id, session_seq,
            min(ts) AS session_start, max(ts) AS session_end,
            count(*) AS n_events, ${oDsum("\"value\"")} AS sum_value
          FROM sessed GROUP BY user_id, session_seq"""
  )
}
