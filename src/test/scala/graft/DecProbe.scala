package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Throwaway probe: how much of the agg rows' cost is the
  * BigDecimal-backed precision-22 sum buffer vs the scan itself. */
object DecProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val D = DecimalType(12, 4)
    def dec(c: org.apache.spark.sql.Column) = c.cast(D)
    val one = lit(1).cast(D)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"[decprobe] $name%-22s min=${times.min}%8.1f ms  all=${times.map(t => f"$t%.0f").mkString(",")}")
    }

    time("scan_only")(li.select(col("l_returnflag"), col("l_linestatus"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")))
    time("count_only")(li.groupBy("l_returnflag", "l_linestatus").agg(count(lit(1))))
    time("double_sums")(li.groupBy("l_returnflag", "l_linestatus").agg(
      sum(col("l_quantity")), sum(col("l_extendedprice")),
      sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
      sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))),
      avg(col("l_quantity")), avg(col("l_extendedprice")), count(lit(1))))
    time("decimal_sums_q1")(li.groupBy("l_returnflag", "l_linestatus").agg(
      sum(dec(col("l_quantity"))).cast("double"),
      sum(dec(col("l_extendedprice"))).cast("double"),
      round(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))), 4).cast("double"),
      round(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) * (one + dec(col("l_tax")))), 4).cast("double"),
      (sum(dec(col("l_quantity"))).cast("double") / count(col("l_quantity"))),
      (sum(dec(col("l_extendedprice"))).cast("double") / count(col("l_extendedprice"))),
      count(lit(1))))
    time("dec_sum_1col")(li.groupBy("l_returnflag", "l_linestatus").agg(
      sum(dec(col("l_quantity"))).cast("double")))
    time("dec_cast_only")(li.select(dec(col("l_quantity")).as("q"),
      dec(col("l_extendedprice")).as("e")))

    // variant B: narrowed operand precisions — (10,4)x(6,4) -> (17,8)
    // stays long-backed; only the second multiply is BigDecimal
    val D10 = DecimalType(10, 4); val D5 = DecimalType(5, 4)
    def dec10(c: org.apache.spark.sql.Column) = c.cast(D10)
    def dec5(c: org.apache.spark.sql.Column) = c.cast(D5)
    val one5 = lit(1).cast(D5)
    time("narrow_decimal_q1")(li.groupBy("l_returnflag", "l_linestatus").agg(
      sum(dec(col("l_quantity"))).cast("double"),
      sum(dec(col("l_extendedprice"))).cast("double"),
      round(sum(dec10(col("l_extendedprice")) * (one5 - dec5(col("l_discount")))), 4).cast("double"),
      round(sum(dec10(col("l_extendedprice")) * (one5 - dec5(col("l_discount")))
        * (one5 + dec5(col("l_tax")))), 4).cast("double"),
      (sum(dec(col("l_quantity"))).cast("double") / count(col("l_quantity"))),
      (sum(dec(col("l_extendedprice"))).cast("double") / count(col("l_extendedprice"))),
      count(lit(1))))
    // variant C: unscaled-long products, decimal only at the sum
    import org.apache.spark.sql.graft.Shims
    def unscaled(c: org.apache.spark.sql.Column) = Shims.column(
      org.apache.spark.sql.catalyst.expressions.UnscaledValue(Shims.expression(c)))
    val ue = unscaled(dec(col("l_extendedprice")))
    val fd = lit(10000L) - unscaled(dec(col("l_discount")))
    val ft = lit(10000L) + unscaled(dec(col("l_tax")))
    val D380 = DecimalType(38, 0)
    time("long_unscaled_q1")(li.groupBy("l_returnflag", "l_linestatus").agg(
      sum(dec(col("l_quantity"))).cast("double"),
      sum(dec(col("l_extendedprice"))).cast("double"),
      round(sum((ue * fd).cast(D380)) / lit(100000000L), 4).cast("double"),
      round(sum(((ue * fd).cast(DecimalType(20, 0)) * ft.cast(DecimalType(5, 0)))) / lit(1000000000000L), 4).cast("double"),
      (sum(dec(col("l_quantity"))).cast("double") / count(col("l_quantity"))),
      (sum(dec(col("l_extendedprice"))).cast("double") / count(col("l_extendedprice"))),
      count(lit(1))))
    // isolate: one product sum only, each form
    time("prod1_wide")(li.groupBy("l_returnflag").agg(
      round(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))), 4).cast("double")))
    time("prod1_narrow")(li.groupBy("l_returnflag").agg(
      round(sum(dec10(col("l_extendedprice")) * (one5 - dec5(col("l_discount")))), 4).cast("double")))
    time("prod1_long")(li.groupBy("l_returnflag").agg(
      round(sum((ue * fd).cast(D380)) / lit(100000000L), 4).cast("double")))
    time("prod2_wide")(li.groupBy("l_returnflag").agg(
      round(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) * (one + dec(col("l_tax")))), 4).cast("double")))
    time("prod2_narrow")(li.groupBy("l_returnflag").agg(
      round(sum(dec10(col("l_extendedprice")) * (one5 - dec5(col("l_discount"))) * (one5 + dec5(col("l_tax")))), 4).cast("double")))
    time("prod2_longdec")(li.groupBy("l_returnflag").agg(
      round(sum(((ue * fd).cast(DecimalType(20, 0)) * ft.cast(DecimalType(5, 0)))) / lit(1000000000000L), 4).cast("double")))

    // VALUE equality: wide vs narrow on the full q1 shape
    def q1(wide: Boolean) = {
      val (de, dd, dt, o) =
        if (wide) ((c: org.apache.spark.sql.Column) => dec(c),
          (c: org.apache.spark.sql.Column) => dec(c),
          (c: org.apache.spark.sql.Column) => dec(c), one)
        else ((c: org.apache.spark.sql.Column) => dec10(c),
          (c: org.apache.spark.sql.Column) => dec5(c),
          (c: org.apache.spark.sql.Column) => dec5(c), one5)
      li.groupBy("l_returnflag", "l_linestatus").agg(
        round(sum(de(col("l_extendedprice")) * (o - dd(col("l_discount")))), 4).cast("double").as("dp"),
        round(sum(de(col("l_extendedprice")) * (o - dd(col("l_discount"))) * (o + dt(col("l_tax")))), 4).cast("double").as("ch"))
        .orderBy("l_returnflag", "l_linestatus").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3))).toSeq
    }
    val w = q1(true); val n = q1(false)
    println(s"[decprobe] values_equal=${w == n}")
    if (w != n) println(s"[decprobe] wide=$w\n[decprobe] narrow=$n")
    spark.stop()
  }
}
