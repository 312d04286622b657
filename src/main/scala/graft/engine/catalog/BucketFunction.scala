package graft.engine.catalog

import graft.engine.format.Buckets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The catalog-resolved `bucket` V2 function: Spark's storage-partitioned
  * join resolves a scan's reported `bucket(n, cols)` transform against
  * the table catalog's FunctionCatalog, and two sides are co-partitioned
  * only when they resolve to the same canonical function. The semantics
  * are exactly the write path's `pmod(hash(cols), n)` ([[Buckets]]). */
object BucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, cols...): pmod(murmur3_hash(cols), numBuckets) — " +
      "the carbonish write-time bucket id"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      s"bucket needs (numBuckets, col, ...), got ${inputType.simpleString}")
    require(inputType.fields.head.dataType == IntegerType,
      s"bucket numBuckets must be int, got ${inputType.fields.head.dataType.simpleString}")
    new BoundBucket(inputType.fields.map(_.dataType))
  }
}

class BoundBucket(types: Array[DataType]) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = types
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val values = (1 until types.length).map(i =>
      (input.get(i, types(i)), types(i)))
    Buckets.bucketIdInternal(n, values)
  }
}
