package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.queries.Q._

/** Paired same-JVM interleaved A/B of the wide decimal product form vs
  * the unscaled-long product form (exact half-up reconstruction),
  * with value-equality checks. */
object DpAb {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import org.apache.spark.sql.graft.Shims
    def unscaled(c: Column): Column = Shims.column(
      org.apache.spark.sql.catalyst.expressions.UnscaledValue(Shims.expression(c)))
    val D380 = DecimalType(38, 0)
    // exact: round(sum_of_scaleS_unscaled / 10^S, 4) computed as
    // floor((S + half)/10^(S-4)) / 10^4, all-decimal, each step exact
    def dround4(sumUnscaled: Column, scale: Int): Column = {
      val down = math.pow(10, scale - 4).toLong
      (floor((sumUnscaled + lit(down / 2)) / lit(down)) / lit(10000L)).cast("double")
    }
    def q1(form: Int) = {
      val li = t(spark, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      val (dp, ch) =
        if (form == 0) (
          dpsum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))),
          dpsum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
            * (one + dec(col("l_tax")))))
        else {
          val ue = unscaled(dec(col("l_extendedprice")))
          val fd = lit(10000L) - unscaled(dec(col("l_discount")))
          val ft = lit(10000L) + unscaled(dec(col("l_tax")))
          (dround4(sum((ue * fd).cast(D380)), 8),
            dround4(sum(((ue * fd).cast(DecimalType(20, 0)) * ft.cast(DecimalType(5, 0)))), 12))
        }
      li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dp.as("sum_disc_price"), ch.as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
    }
    def time(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e6
    }
    // value equality first
    def vals(form: Int) = q1(form).orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toSeq).toSeq
    val eq = vals(0) == vals(1)
    println(s"[dpab] values_equal=$eq")
    if (!eq) { println(vals(0)); println(vals(1)) }
    // interleaved timing
    val reps = 8
    val w = scala.collection.mutable.ArrayBuffer[Double]()
    val n = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to reps).foreach { i =>
      if (i % 2 == 0) { w += time(q1(0)); n += time(q1(1)) }
      else { n += time(q1(1)); w += time(q1(0)) }
    }
    def s(xs: Seq[Double]) = f"min=${xs.min}%6.0f med=${xs.sorted.apply(xs.size / 2)}%6.0f all=${xs.map(x => f"$x%.0f").mkString(",")}"
    println(s"[dpab] q1 wide  ${s(w.toSeq)}")
    println(s"[dpab] q1 long  ${s(n.toSeq)}")
    spark.stop()
  }
}
