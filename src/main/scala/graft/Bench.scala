package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // deterministic session state: q_bucket_join needs v2 bucketing
      // and setting it up-front means every timed query plans under the
      // same confs regardless of which subset runs
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => " "
      case c if c < ' ' => " "; case c => c.toString
    }
    // Warm the JVM + parquet footers once so the first timed query isn't
    // charged for session/codegen init.
    try graft.queries.Q.views(spark, sfDir)
    catch { case _: Throwable => }
    try spark.sql("SELECT count(*) FROM lineitem").collect()
    catch { case _: Throwable => }
    // Untimed warm pass: builds the /tmp fixture tables and JITs the
    // generated code, so the timed pass below measures the steady-state
    // query cost instead of charging whichever query alphabetically
    // touches a fixture first with its one-time build (q_agg_rollup
    // absorbed 16 s of that in the r5 driver run).
    val onlyWarm = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => onlyWarm.forall(_.contains(n)) }
      .foreach { case (_, fn) =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => }
      }
    // Materialize every column via a noop-format write (count() would let
    // Spark prune the projection and bench an empty scan — VERDICT r2).
    // Sub-second queries re-run to a 3-sample MEDIAN: at that scale the
    // driver's single-shot numbers showed 2-4x scheduling noise on
    // fixture queries (VERDICT r7 Next #10).
    var errors = List.empty[(String, String)]
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                recordErr: Boolean): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save();
        (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        // Only the FIRST run decides success/failure; a flaky median
        // re-run must not mark an already-timed query as errored
        // (VERDICT r8 advice).
        // Bounded: class + first line, hard-capped at 60 chars BEFORE
        // escaping (a truncated escape sequence would break the JSON).
        // A Spark analysis message embeds the whole plan tree; unbounded
        // messages made BENCH_r9 unparseable.
        if (recordErr) {
          val firstLine = Option(e.getMessage).getOrElse("")
            .linesIterator.toSeq.headOption.getOrElse("")
          errors ::= (name -> esc(s"${e.getClass.getSimpleName}: $firstLine".take(60)))
        }
        -1.0
      }
    }
    // Iteration aid: SPARK_GRAFT_BENCH_ONLY=q_a,q_b times just those
    // queries (the warm pass is filtered the same way).
    // Median-of-3 for EVERY successful row, bounded by a global
    // extra-run time budget instead of the old ">= 5 s skips the
    // median" cutoff: in the r10 driver run the codegen-heavy families
    // (ann/geo) landed their cold first run ABOVE the cutoff (8.9 s vs
    // a 1.7 s steady state), so exactly the rows that most needed a
    // median never got one and the famsum overstated ~40%. The budget
    // keeps total bench time bounded at any SF; rows that exhaust it
    // fall back to their single shot. With only 1 extra sample the
    // steady-state estimate is the MIN (one cold + one warm — the
    // 2-sample "median" would re-publish the cold run).
    var extraBudget = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXTRA_SEC", "150").toDouble
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => onlyWarm.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val first = runOnce(name, fn, recordErr = true)
      def extraRun(): Double =
        if (extraBudget <= 0) -1.0
        else {
          val v = runOnce(name, fn, recordErr = false)
          if (v >= 0) extraBudget -= v
          v
        }
      val t =
        if (first < 0) first
        else {
          val samples = first +: Seq(extraRun(), extraRun()).filter(_ >= 0)
          samples.size match {
            case 1 => first
            case 2 => samples.min
            case _ => samples.sorted.apply(samples.size / 2)
          }
        }
      name -> t
    }
    // The driver keeps only the LAST 2000 chars of stdout and parses the
    // JSON line out of that window; sbt appends ~70 chars of its own
    // after us. ~95 full-name second-valued entries don't fit (r7+r8
    // both truncated), and at 100+ queries even "q_"-stripped flat keys
    // brush the cap, so the line is size-optimized, self-describingly:
    //  - "qunit":"ms"      — query values are INTEGER MILLISECONDS
    //                        (identical precision to 3-decimal seconds)
    //  - "qscheme":"fam"   — "queries" is nested one level by family:
    //                        {"agg":{"cube":190,...},...} means
    //                        q_agg_cube=190; the "@" family holds keys
    //                        emitted VERBATIM (q1_agg and other names
    //                        without a q_<fam>_ shape).
    // Top-level metric/value stay in seconds per the driver contract.
    // The full-name seconds-valued artifact is committed separately as
    // BENCH_r{N}_local.json.
    def fmtSec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    def ms(v: Double): String =
      if (v < 0) "-1" else Math.round(v * 1000).toString
    val byFam = results.groupBy { case (k, _) =>
      if (!k.startsWith("q_")) "@"
      else {
        val rest = k.substring(2)
        val i = rest.indexOf('_')
        if (i <= 0) "@" else rest.substring(0, i)
      }
    }
    val qs = byFam.toSeq.sortBy(_._1).map { case (fam, es) =>
      val inner = es.sortBy(_._1).map { case (k, v) =>
        val key = if (fam == "@") k else k.substring(2 + fam.length + 1)
        "\"" + key + "\":" + ms(v)
      }.mkString("{", ",", "}")
      "\"" + fam + "\":" + inner
    }.mkString("{", ",", "}")
    // At most 5 error entries ride the JSON line (plus a total count) so
    // the artifact stays inside the driver's 2000-char stdout tail and
    // degrades into something parseable instead of a null.
    val errJson =
      if (errors.isEmpty) ""
      else ",\"errors_n\":" + errors.size + ",\"errors\":" +
        errors.reverse.take(5).map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
          .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val sfName = new java.io.File(sfDir).getName
    // The complete full-name per-query map always lands in a FILE (the
    // committed BENCH_r{N}_local.json derives from it) — stdout only
    // carries what fits the driver's tail window.
    val fullJson = results.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString(
        s"""{"metric":"total","value":${fmtSec(total)},"unit":"sec","qunit":"ms","queries":{""",
        ",", s"""}$errJson,"sf":"$sfName"}""")
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      "/tmp/graft_bench_full.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath), fullJson)
    catch { case _: Throwable => }
    val famLine =
      s"""{"metric":"total","value":${fmtSec(total)},"unit":"sec","qunit":"ms","qscheme":"fam","queries":$qs$errJson,"sf":"$sfName"}"""
    // The driver parses the JSON line out of the LAST 2000 stdout chars,
    // and sbt appends ~70 chars of its own AFTER us — past ~1800 chars
    // the line's head would slide out of the window and parse as null
    // (r7-r9 all lost their driver bench this way). Degrade to
    // per-family subtotal SECONDS, self-describingly ("qscheme":
    // "famsum"); the full per-query map is in the file + committed
    // artifact.
    val line =
      if (famLine.length <= 1800) famLine
      else {
        val sums = byFam.toSeq.sortBy(_._1).map { case (fam, es) =>
          val famSec = es.collect { case (_, v) if v >= 0 => v }.sum
          "\"" + fam + "\":" + fmtSec(famSec)
        }.mkString("{", ",", "}")
        s"""{"metric":"total","value":${fmtSec(total)},"unit":"sec","qunit":"sec","qscheme":"famsum","queries_n":${results.size},"queries":$sums$errJson,"sf":"$sfName"}"""
      }
    println(line)
    spark.stop()
  }
}

/** The reference's concurrency anchor — "supports 20 concurrent queries
  * with response < 10 s" (reference docs/usecases.md:104) — has no
  * serial-bench proxy, so this main runs `threads` (default 20) driver
  * threads of mixed READ queries against one shared SparkSession, each
  * thread in its own FAIR scheduler pool (the multi-tenant serving
  * shape: no query monopolizes the cluster while 19 others queue), and
  * reports per-query latency p50/p95/max + aggregate throughput.
  * Mutating queries are excluded: concurrent IUD is ConcurrencySpec's
  * storm territory, not a latency anchor. Output is one JSON line;
  * committed as BENCH_r{N}_concurrent.json. */
object BenchConcurrent {
  // 20 distinct read shapes: scans+filters, aggs, joins, windows,
  // metadata-only, index/text, MV-rewritten, subqueries.
  private val mix = Seq(
    "q1_agg_carbonish", "q_filter_between_in", "q_filter_like",
    "q_filter_complex_bool", "q_filter_not_in_null", "q_agg_rollup",
    "q_agg_distinct", "q_join_inner", "q_join_broadcast",
    "q_window_rank", "q_sort_limit", "q_engine_prune", "q_engine_topn",
    "q_countstar_meta", "q_minmax_meta", "q_partition_prune",
    "q_text_match", "q_subquery_in", "q_fn_string", "q_mv_rollup")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val threads = sys.env.getOrElse("SPARK_GRAFT_THREADS", "20").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fns = mix.map(n => n -> SparkEntry.queries(n))
    // Serial warm pass: fixture builds + codegen happen once, untimed —
    // the concurrent pass measures steady-state serving latency.
    try graft.queries.Q.views(spark, sfDir) catch { case _: Throwable => }
    fns.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    val latencies = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]
    val wall0 = System.nanoTime()
    // Per-client shuffle sizing: with 20 tenants sharing the cores, a
    // query's fair share is cores/20 — giving each query `cpus`-wide
    // shuffle stages just multiplies task-scheduling contention. Size
    // shuffles to ~2x the fair share (floor 4), the standard
    // concurrent-serving conf. Overridable for A/B.
    val clientShufflePartitions = sys.env.getOrElse("SPARK_GRAFT_CLIENT_SHUFFLE",
      math.max(4, 2 * cpus.toInt / math.max(1, threads)).toString)
    val pool = (0 until threads).map { i =>
      new Thread(() => {
        // Each client gets its own cloned session (isolated SQLConf +
        // temp views over the same shared SparkContext — the
        // multi-tenant serving shape) and its own FAIR pool, so equal
        // shares across tenants and no query monopolizes the cluster.
        val sess = spark.newSession()
        sess.conf.set("spark.sql.shuffle.partitions", clientShufflePartitions)
        sess.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        try graft.queries.Q.views(sess, sfDir) catch { case _: Throwable => }
        sess.sparkContext.setLocalProperty("spark.scheduler.pool", s"client$i")
        // Each thread runs the full mix once, phase-shifted so all 20
        // shapes are in flight together rather than 20 copies of one.
        (0 until fns.size).foreach { j =>
          val (name, fn) = fns((i + j) % fns.size)
          val t0 = System.nanoTime()
          try {
            fn(sess, sfDir).write.format("noop").mode("overwrite").save()
            latencies.add(name -> (System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            failures.add(name -> s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        }
      }, s"bench-client-$i")
    }
    pool.foreach(_.start()); pool.foreach(_.join())
    val wall = (System.nanoTime() - wall0) / 1e9
    import scala.jdk.CollectionConverters._
    val lats = latencies.asScala.map(_._2).toSeq.sorted
    def pct(p: Double): Double =
      if (lats.isEmpty) -1.0 else lats(math.min(lats.size - 1, (p * lats.size).toInt))
    def f(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val perQ = latencies.asScala.toSeq.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (n, xs) =>
        val s = xs.map(_._2).toSeq.sorted
        "\"" + n + "\":" + f(s(s.size / 2))
      }.mkString("{", ",", "}")
    println(s"""{"metric":"concurrent_p95","value":${f(pct(0.95))},"unit":"sec","threads":$threads,"runs":${lats.size},"failed":${failures.size},"p50":${f(pct(0.50))},"p95":${f(pct(0.95))},"max":${f(if (lats.isEmpty) -1.0 else lats.last)},"wall":${f(wall)},"qps":${f(if (wall > 0) lats.size / wall else -1.0)},"median_by_query":$perQ,"sf":"${new java.io.File(sfDir).getName}"}""")
    failures.asScala.take(5).foreach { case (n, e) => System.err.println(s"FAIL $n: $e") }
    spark.stop()
  }
}
