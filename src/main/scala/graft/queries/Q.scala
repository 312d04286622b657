package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the operator query pack.
  *
  * Cross-engine determinism rules (Spark result must hash-identically to
  * the DuckDB oracle, see VERDICT r1 + ADVICE r1):
  *   - Money/double aggregates go through exact decimal arithmetic and a
  *     single final cast to double. `dec`/`dsum` wrap RAW columns only;
  *     derived money expressions cast each raw factor with `dec` first
  *     and multiply in decimal space on BOTH sides (ADVICE r1).
  *   - Integer aggregates are cast to BIGINT on both sides (DuckDB
  *     sum(BIGINT) is HUGEINT, Spark's is LONG).
  *   - No libm-dependent fns in compared values (exp/ln/pow); sqrt and
  *     +-*÷ are IEEE-exact and deterministic across engines.
  *   - Hashes: md5 hex (identical in both engines); numeric hash =
  *     first 8 hex chars of md5 as BIGINT.
  */
object Q {
  val D = DecimalType(12, 4)

  /** Exact decimal view of a raw 2-decimal money double column. */
  def dec(c: Column): Column = c.cast(D)
  val one: Column = lit(1).cast(D)

  /** Order-independent exact sum of a raw money column, as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Order-independent exact average of a raw money column. */
  def davg(c: Column): Column = (sum(dec(c)).cast("double") / count(c)).cast("double")

  /** Exact decimal PRODUCT sum (disc-price/charge/revenue shapes),
    * rounded to money scale BEFORE the final double cast. The product
    * carries scale 8–12; past ~15 significant digits DuckDB's
    * decimal→double cast double-rounds (int128→double, then ÷10^s)
    * while Spark's BigDecimal cast rounds once, so bit-equality breaks
    * at sf≥0.1 in the last ulp. Rounding the SUM to scale 4 keeps the
    * unscaled value below 2^53 at any realistic SF — both engines'
    * casts become exactly one rounding and agree bit-for-bit.
    * `round(x, 4)` rather than a narrowing decimal cast: both engines'
    * round() is half-away-from-zero, whereas DuckDB's decimal→decimal
    * cast TRUNCATES the dropped digits. */
  def dpsum(c: Column): Column = round(sum(c), 4).cast("double")
  def oDpsum(e: String): String = s"CAST(round(sum($e), 4) AS DOUBLE)"

  /** Oracle-side fragments mirroring the above. */
  def oDec(c: String): String = s"CAST($c AS DECIMAL(12,4))"
  def oDsum(c: String): String = s"CAST(sum(${oDec(c)}) AS DOUBLE)"
  def oDavg(c: String): String = s"(CAST(sum(${oDec(c)}) AS DOUBLE) / count($c))"

  /** Cross-engine 32-bit-ish hash: first 8 hex chars of md5 → BIGINT.
    * Spark: high half of the native md5-prefix expression
    * DuckDB: CAST('0x'||substr(md5(x),1,8) AS BIGINT)                  */
  def h32(c: Column): Column =
    shiftrightunsigned(org.apache.spark.sql.graft.Shims.column(
      org.apache.spark.sql.graft.Md5Prefix64(
        org.apache.spark.sql.graft.Shims.expression(c))), 32)
  def oH32(c: String): String = s"CAST('0x' || substr(md5($c), 1, 8) AS BIGINT)"

  type QFn = (SparkSession, String) => DataFrame

  /** Registers the testdata parquet tables as temp views named like the
    * oracle's tables, so Spark SQL and DuckDB SQL line up. */
  def views(spark: SparkSession, dir: String): Unit = {
    // registration memoized per session (r20 optimization round):
    // re-registering all ten views measured 52–90 ms warm, paid inside
    // every timed SQL-form query body. Nothing else in the tree binds
    // these names, so the views stay valid until the same session asks
    // for a DIFFERENT sf dir (then they are re-bound).
    if (viewsDir.get(spark) == dir) return
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.foreach { n => t(spark, dir, n).createOrReplaceTempView(n) }
    viewsDir.put(spark, dir)
  }
  private val viewsDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]

  /** DataFrame DEFINITIONS cached per (session, table path) — r20
    * optimization round. `spark.read.parquet` re-infers the schema on
    * every call (a footer-reading Spark job: measured 65–90 ms per
    * call WARM, and `views()` re-registered all ten tables at ~670 ms
    * per call *inside* timed query bodies). The fixture parquet under
    * the sf dirs is immutable for the life of a JVM, so the logical
    * plan is built once per session and reused — exactly what a real
    * catalog table does with its persisted schema. Only the PLAN is
    * cached: every execution still scans the parquet files. */
  private val tCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    tCache.computeIfAbsent((spark, s"$dir/$name"), _ => tBuild(spark, dir, name))

  private def tBuild(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped in two fixture layouts: parquet
      // TIMESTAMP(NANOS) — which Spark 4 rejects unless read as an
      // int64 — and plain timestamp[us]. Branch on the type the footer
      // actually carries instead of pinning either layout.
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType =>
          // DuckDB reads a naive timestamp[us] as TIMESTAMP; cast to the
          // session-TZ type (UTC everywhere here) so both engines hash
          // identical values.
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Clone a fixture table directory for a destructive run: immutable
    * segment data files (*.parquet) are HARDLINKED — the engine never
    * writes data files in place (mutations add new files and commit new
    * metadata via atomic rename), so sharing inodes with the pristine
    * copy is safe and turns the per-run clone into metadata ops — while
    * everything else (the small _meta JSONs, csv/json segments of
    * mixed-format fixtures) is byte-copied. Falls back to a byte copy
    * if the filesystem refuses the link. */
  def cloneTable(src: String, dst: String): Unit = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    val from = Paths.get(src)
    val to = Paths.get(dst)
    val st = Files.walk(from)
    try {
      st.forEach { (f: Path) =>
        val t = to.resolve(from.relativize(f))
        if (Files.isDirectory(f)) { val _ = Files.createDirectories(t) }
        else if (f.getFileName.toString.endsWith(".parquet")) {
          try { val _ = Files.createLink(t, f) }
          catch { case _: UnsupportedOperationException | _: java.io.IOException =>
            val _ = Files.copy(f, t, StandardCopyOption.REPLACE_EXISTING) }
        } else { val _ = Files.copy(f, t, StandardCopyOption.REPLACE_EXISTING) }
      }
    } finally st.close()
  }
}
