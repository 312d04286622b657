package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side merge-on-read position lookup backing [[DeltaKeep]]:
  * only the data-file → delta-file PATH map ships (broadcast, driver-
  * bounded metadata); each task loads the position arrays of the files
  * it actually reads, lazily, cached per executor — positions never
  * touch the driver (same contract as the DSv2 scan's
  * DeltaAwareReaderFactory).
  *
  * The cache is keyed by the RAW file-path UTF8String (cloned on
  * insert — scan rows can reuse buffers), so the steady state does one
  * hash probe per row with zero allocation; the `file:///` vs `file:/`
  * Path normalization runs once per distinct file, not per row. */
class DeltaLookup(
    bcPaths: org.apache.spark.broadcast.Broadcast[Map[String, Seq[String]]],
    conf: graft.engine.source.SerializableHadoopConf) extends Serializable {

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[UTF8String, Array[Long]]()

  def keep(fp: UTF8String, pos: Long): Boolean = {
    var ps = cache.get(fp)
    if (ps == null) {
      val key = new org.apache.hadoop.fs.Path(fp.toString).toString
      ps = bcPaths.value.get(key)
        .map(dps => graft.engine.format.Deltas.readAll(conf.value, dps))
        .getOrElse(DeltaLookup.NoDeltas)
      cache.put(fp.clone(), ps)
    }
    (ps.length == 0) || java.util.Arrays.binarySearch(ps, pos) < 0
  }
}

object DeltaLookup {
  /** Shared sentinel for delta-free files (keeps the cache dense). */
  private[graft] val NoDeltas: Array[Long] = Array.empty[Long]
}

/** keep-row predicate `NOT (rowIndex ∈ deletedPositions(filePath))` as
  * a native codegen expression — replaces the ScalaUDF variant on the
  * v1/tupleId/pagination/mutation-planning read paths, removing the
  * per-row catalyst↔scala converter round trip a UDF pays and keeping
  * the surrounding filter inside whole-stage codegen. */
case class DeltaKeep(filePath: Expression, rowIndex: Expression, lookup: DeltaLookup)
  extends BinaryExpression with Predicate with ExpectsInputTypes {

  override def left: Expression = filePath
  override def right: Expression = rowIndex
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def prettyName: String = "delta_keep"

  override protected def nullSafeEval(fp: Any, ri: Any): Any =
    lookup.keep(fp.asInstanceOf[UTF8String], ri.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deltaLookup", lookup, classOf[DeltaLookup].getName)
    defineCodeGen(ctx, ev, (fp, ri) => s"$ref.keep($fp, $ri)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DeltaKeep =
    copy(filePath = newLeft, rowIndex = newRight)
}
