package graft.engine.source

import graft.engine.format.Deltas

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Scan-side application of merge-on-read delete deltas (see
  * [[graft.engine.format.Deltas]]).
  *
  * When any visible segment carries deltas, the scan builder appends
  * the parquet row-index temp column to the delegated read schema, the
  * batch planner isolates each delta-bearing data file into its own
  * [[DeltaFilePartition]] (carrying that file's delta paths), and this
  * factory anti-filters rows by position and strips the temp column
  * before handing rows to Spark. Positions are loaded lazily ON THE
  * EXECUTOR from the partition's own delta files — nothing is
  * broadcast, so a 100 TB table with a billion scattered deletes ships
  * each task only its own file's positions.
  *
  * The whole scan runs row-based while deltas are outstanding (Spark
  * requires columnar uniformity across a scan) — the reference
  * documents the same penalty and prescribes horizontal compaction to
  * keep it bounded (configuration-parameters.md:120).
  */
case class DeltaFilePartition(
    filePartition: FilePartition,
    /** absolute delta-file paths for the ONE data file this partition reads */
    deltaPaths: Seq[String])
  extends InputPartition {
  override def preferredLocations(): Array[String] = filePartition.preferredLocations()
}

/** Hadoop Configuration is not Serializable; same trick as Spark's own
  * (private[spark]) SerializableConfiguration. */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

case class DeltaAwareReaderFactory(
    delegate: PartitionReaderFactory,
    /** delegate row layout = readSchema + trailing row-index temp column */
    schemaWithRowIndex: StructType,
    conf: SerializableHadoopConf)
  extends PartitionReaderFactory {

  // row-based everywhere: Spark requires all partitions of a scan to
  // agree, and the delta partitions must filter row-by-row
  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    throw new UnsupportedOperationException("delta-aware scans are row-based")

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val (inner, deltaPaths) = p match {
      case d: DeltaFilePartition => (d.filePartition, d.deltaPaths)
      case other => (other, Nil)
    }
    val underlying = delegate.createReader(inner)
    val n = schemaWithRowIndex.fields.length
    val rowIndexOrdinal = n - 1
    // project away the trailing temp column (executor-side codegen)
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils
      .toAttributes(schemaWithRowIndex)
    val strip = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(attrs.init, attrs)
    val deleted: Array[Long] =
      if (deltaPaths.isEmpty) Array.emptyLongArray
      else {
        val all = deltaPaths.toArray.flatMap { ap =>
          val path = new Path(ap)
          Deltas.read(path.getFileSystem(conf.value), path)
        }
        java.util.Arrays.sort(all)
        all
      }

    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (underlying.next()) {
          val row = underlying.get()
          if (deleted.length == 0 ||
              java.util.Arrays.binarySearch(deleted, row.getLong(rowIndexOrdinal)) < 0) {
            current = strip(row)
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = underlying.close()
    }
  }
}
