package graft.engine.format

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{EmptyRow, Literal, Murmur3Hash}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}
import org.apache.spark.sql.types.DataType

/** Hash bucketing for carbonish tables (reference:
  * format/src/main/thrift/schema.thrift:171,184 BucketingInfo).
  *
  * Declared with table properties `bucket_columns=c1,c2` +
  * `bucket_count=n`. Every segment splits its files by
  * `pmod(hash(c1,c2), n)` into `__b=<id>/` dirs — one bucket per file —
  * so a table's bucket `i` is the union of the `__b=i` files across
  * visible segments. The scan reports this as DSv2
  * KeyGroupedPartitioning(bucket(n, cols)), which lets Spark plan
  * storage-partitioned joins: two co-bucketed tables join with NO
  * shuffle on either side — the decisive layout for repeated large-scale
  * joins on a stable key.
  *
  * The hash is Spark's own `hash()` (Murmur3, seed 42), evaluated
  * identically at write time (codegen column), at function-resolution
  * time (the catalog's `bucket` V2 function) and at filter-prune time —
  * one definition, three call sites.
  */
object Buckets {

  val TagPrefix = "__b="

  case class BucketSpec(columns: Seq[String], count: Int)

  def specOf(meta: TableMeta): Option[BucketSpec] =
    meta.properties.get("bucket_columns").map { cs =>
      val cols = cs.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val n = meta.properties.getOrElse("bucket_count",
        throw new IllegalArgumentException(
          "bucket_columns requires bucket_count")).toInt
      require(cols.nonEmpty && n > 0, s"bad bucket spec: cols=$cols count=$n")
      BucketSpec(cols, n)
    }

  /** Write-side bucket id column. */
  def bucketExpr(spec: BucketSpec): Column =
    pmod(hash(spec.columns.map(col): _*), lit(spec.count))

  /** Bucket tag encoded in a segment-relative file path, if any. */
  def tagOf(relPath: String): Option[Int] =
    relPath.split('/').find(_.startsWith(TagPrefix))
      .flatMap(s => s.substring(TagPrefix.length).toIntOption)

  /** Bucket id of a tuple of INTERNAL values (must match bucketExpr). */
  def bucketIdInternal(n: Int, values: Seq[(Any, DataType)]): Int = {
    val h = Murmur3Hash(values.map { case (v, dt) => Literal(v, dt) }, 42)
      .eval(EmptyRow).asInstanceOf[Int]
    ((h % n) + n) % n
  }

  /** Bucket id of a tuple of EXTERNAL (source-filter) values. */
  def bucketIdExternal(n: Int, values: Seq[(Any, DataType)]): Int = {
    val h = Murmur3Hash(values.map { case (v, dt) => Literal.create(v, dt) }, 42)
      .eval(EmptyRow).asInstanceOf[Int]
    ((h % n) + n) % n
  }
}
