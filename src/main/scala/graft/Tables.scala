package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver's deterministic parquet testdata (TESTDATA.md)
  * plus cross-engine-deterministic aggregation helpers.
  *
  * The DuckDB oracle and Spark must produce bit-identical doubles for the
  * hash compare. Summing raw doubles is accumulation-order dependent, so
  * every money-ish aggregate goes through exact decimal arithmetic
  * (deterministic in both engines) and is cast to double once at the end.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String)    = t(s, d, "region")
  def nation(s: SparkSession, d: String)    = t(s, d, "nation")
  def customer(s: SparkSession, d: String)  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = t(s, d, "supplier")
  def part(s: SparkSession, d: String)      = t(s, d, "part")
  def orders(s: SparkSession, d: String)    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = t(s, d, "lineitem")
  def events(s: SparkSession, d: String)    = t(s, d, "events")
  def documents(s: SparkSession, d: String) = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = t(s, d, "embeddings")

  /** Exact decimal view of a double column (4 fractional digits is enough
    * for the synthetic data's 2-decimal money values). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Order-independent sum of a double column: decimal-exact, then one
    * deterministic cast back to double. Oracle side:
    * CAST(sum(CAST(x AS DECIMAL(18,4))) AS DOUBLE). */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Order-independent average: exact decimal sum divided (in double
    * space) by the count. Oracle: CAST(sum(..dec..) AS DOUBLE)/count(x). */
  def davg(c: Column): Column =
    (sum(dec(c)).cast("double") / count(c)).cast("double")
}
