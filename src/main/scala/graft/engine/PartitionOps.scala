package graft.engine

import graft.engine.format._

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{Cast, GenericInternalRow, Literal}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{StringType, StructType}

/** Partition management over the path-encoded partition layout
  * (see [[graft.engine.format.Partitions]]): SHOW / ADD / DROP PARTITION
  * semantics (reference CarbonAlterTableAddHivePartitionCommand.scala:52,
  * CarbonAlterTableDropHivePartitionCommand.scala:57).
  *
  * The committed file names ARE the partition index, so listing reads
  * only tablestatus (driver metadata, O(files) name parses), and DROP
  * PARTITION is a pure metadata commit when per-file footer counts are
  * present: affected files leave the segment's file list (tombstoned for
  * CLEAN FILES) and the exact row/byte counts are decremented — no data
  * job at all. Explicitly-ADDed empty partitions live in a tablemeta
  * property registry until data arrives. */
object PartitionOps {

  /** tablemeta property holding explicitly-added empty partitions. */
  val RegistryKey = "added_partitions"

  def partitionSchema(meta: TableMeta, schema: StructType): StructType =
    StructType(meta.partitionColumns.map(c => schema(schema.fieldIndex(c))))

  // ------------------------------------------------------------ codecs

  /** Internal partition value → the exact dir-value string the dynamic
    * writer prints (Cast to string in session TZ); None = null. */
  private def internalToRaw(dt: org.apache.spark.sql.types.DataType, v: Any): Option[String] =
    Option(v).map { x =>
      Cast(Literal(x, dt), StringType,
        Some(java.util.TimeZone.getDefault.getID)).eval().toString
    }

  /** ident row → raw dir-value strings, in partition-schema order. */
  def identToRaw(pSchema: StructType, ident: InternalRow): Seq[Option[String]] =
    pSchema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      if (ident.isNullAt(i)) None
      else internalToRaw(f.dataType, ident.get(i, f.dataType))
    }

  /** Raw tuple (partition-schema order) → internal ident row; None when
    * some value doesn't parse as its column type. */
  def rawToIdent(pSchema: StructType, raw: Seq[Option[String]]): Option[InternalRow] = {
    val vals = pSchema.fields.toSeq.zip(raw).map {
      case (_, None) => Some(null)
      case (f, Some(r)) => Partitions.castRaw(r, f.dataType)
    }
    if (vals.exists(_.isEmpty)) None
    else Some(new GenericInternalRow(vals.map(_.orNull).toArray))
  }

  /** Partition tuple of a segment-relative file path, reordered to
    * partition-schema order (None if the path doesn't carry the full
    * tuple — e.g. a legacy unpartitioned file). */
  def fileTuple(pSchema: StructType, relPath: String): Option[Seq[Option[String]]] = {
    val byName = Partitions.tupleFromPath(relPath).toMap
    val t = pSchema.fieldNames.toSeq.map(byName.get)
    if (t.exists(_.isEmpty)) None else Some(t.map(_.get))
  }

  /** Raw tuples match when their typed values match (raw strings are
    * writer-printed so string equality would work too; typed comparison
    * is robust to e.g. `01` vs `1` integer spellings from SQL specs). */
  def tupleMatches(pSchema: StructType, a: Seq[Option[String]], b: Seq[Option[String]]): Boolean =
    pSchema.fields.toSeq.zip(a.zip(b)).forall { case (f, (x, y)) =>
      (x, y) match {
        case (None, None) => true
        case (Some(xr), Some(yr)) =>
          xr == yr || (((Partitions.castRaw(xr, f.dataType), Partitions.castRaw(yr, f.dataType))) match {
            case (Some(xv), Some(yv)) => xv == yv
            case _ => false
          })
        case _ => false
      }
    }

  /** Column predicate selecting exactly one partition tuple. */
  def tupleCond(pSchema: StructType, raw: Seq[Option[String]]): Column =
    pSchema.fields.toSeq.zip(raw).map {
      case (f, None) => col(f.name).isNull
      case (f, Some(r)) =>
        val v = Partitions.castRaw(r, f.dataType).getOrElse(
          throw new IllegalArgumentException(s"bad partition value '$r' for ${f.name}"))
        col(f.name) === Shims.column(Literal(v, f.dataType))
    }.reduce(_ && _)

  // ---------------------------------------------------------- registry

  private def encodeEntry(pSchema: StructType, raw: Seq[Option[String]]): String =
    pSchema.fieldNames.toSeq.zip(raw).map { case (n, r) =>
      ExternalCatalogUtils.escapePathName(n) + "=" +
        ExternalCatalogUtils.escapePathName(r.getOrElse(Partitions.DefaultPartitionName))
    }.mkString("/")

  private def decodeEntry(pSchema: StructType, s: String): Option[Seq[Option[String]]] = {
    val byName = s.split('/').toSeq.flatMap { part =>
      val i = part.indexOf('=')
      if (i <= 0) None
      else {
        val raw = ExternalCatalogUtils.unescapePathName(part.substring(i + 1))
        Some(ExternalCatalogUtils.unescapePathName(part.substring(0, i)) ->
          (if (raw == Partitions.DefaultPartitionName) None else Some(raw)))
      }
    }.toMap
    val t = pSchema.fieldNames.toSeq.map(byName.get)
    if (t.exists(_.isEmpty)) None else Some(t.map(_.get))
  }

  def registry(meta: TableMeta, pSchema: StructType): Seq[Seq[Option[String]]] =
    meta.properties.get(RegistryKey).toSeq
      .flatMap(_.split(";").toSeq.filter(_.nonEmpty))
      .flatMap(decodeEntry(pSchema, _))

  // -------------------------------------------------------- operations

  /** Distinct partition tuples present in committed data files. */
  def dataTuples(t: GraftTable, pSchema: StructType): Seq[Seq[Option[String]]] =
    t.status.visible.flatMap(_.files.flatMap(fileTuple(pSchema, _))).distinct

  def allTuples(t: GraftTable, pSchema: StructType): Seq[Seq[Option[String]]] = {
    val data = dataTuples(t, pSchema)
    val reg = registry(t.meta, pSchema)
      .filterNot(r => data.exists(d => tupleMatches(pSchema, r, d)))
    data ++ reg
  }

  /** SHOW PARTITIONS / partitionExists backing: tuples matching `ident`
    * on the given `names` (a prefix-or-subset of partition columns). */
  def listPartitions(
      t: GraftTable,
      pSchema: StructType,
      names: Array[String],
      ident: InternalRow): Array[InternalRow] = {
    val wantIdx = names.toSeq.map(pSchema.fieldIndex)
    val want = wantIdx.zipWithIndex.map { case (fi, i) =>
      fi -> (if (ident.isNullAt(i)) None
             else internalToRaw(pSchema.fields(fi).dataType, ident.get(i, pSchema.fields(fi).dataType)))
    }
    allTuples(t, pSchema)
      .filter(tuple => want.forall { case (fi, raw) =>
        tupleMatches(StructType(Seq(pSchema.fields(fi))), Seq(tuple(fi)), Seq(raw))
      })
      .flatMap(rawToIdent(pSchema, _))
      .toArray
  }

  /** ALTER TABLE ADD PARTITION: register an (empty) partition. The
    * duplicate check runs INSIDE the locked meta commit — two
    * concurrent ADDs of the same tuple must not both append. */
  def createPartition(t: GraftTable, pSchema: StructType, ident: InternalRow): Unit = {
    val raw = identToRaw(pSchema, ident)
    if (dataTuples(t, pSchema).exists(tupleMatches(pSchema, _, raw)))
      throw new org.apache.spark.sql.catalyst.analysis.PartitionsAlreadyExistException(
        t.path, ident, pSchema)
    t.layout.updateTableMeta { m =>
      val entries = m.properties.get(RegistryKey).toSeq
        .flatMap(_.split(";").toSeq.filter(_.nonEmpty))
      if (entries.flatMap(decodeEntry(pSchema, _)).exists(tupleMatches(pSchema, _, raw)))
        throw new org.apache.spark.sql.catalyst.analysis.PartitionsAlreadyExistException(
          t.path, ident, pSchema)
      val entry = encodeEntry(pSchema, raw)
      val joined = (entries :+ entry).mkString(";")
      m.copy(properties = m.properties + (RegistryKey -> joined))
    }
  }

  /** ALTER TABLE DROP PARTITION. Metadata-only when every affected file
    * carries footer counts; otherwise a copy-on-write delete. Returns
    * true iff anything was dropped. */
  def dropPartition(t: GraftTable, pSchema: StructType, ident: InternalRow): Boolean = {
    val raw = identToRaw(pSchema, ident)

    // registry: forget an explicitly-added empty partition
    var droppedFromRegistry = false
    t.layout.updateTableMeta { m =>
      val entries = m.properties.get(RegistryKey).toSeq
        .flatMap(_.split(";").toSeq.filter(_.nonEmpty))
      val (hit, keep) = entries.partition(e =>
        decodeEntry(pSchema, e).exists(tupleMatches(pSchema, _, raw)))
      droppedFromRegistry = hit.nonEmpty
      if (hit.isEmpty) m
      else if (keep.isEmpty) m.copy(properties = m.properties - RegistryKey)
      else m.copy(properties = m.properties + (RegistryKey -> keep.mkString(";")))
    }

    def affectedOf(s: SegmentMeta): Seq[String] =
      s.files.filter(f => fileTuple(pSchema, f).exists(tupleMatches(pSchema, _, raw)))

    // decide fast vs fallback from the CURRENT commit state
    val vis = t.status.visible
    val affected = vis.map(s => s -> affectedOf(s)).filter(_._2.nonEmpty)
    if (affected.isEmpty) return droppedFromRegistry

    val fastOk = affected.forall { case (s, fs) =>
      s.format == "parquet" && s.externalPath.isEmpty &&
        fs.forall(s.fileMeta.contains)
    }
    if (!fastOk) {
      val n = Mutation.delete(t, tupleCond(pSchema, raw))
      return n > 0 || droppedFromRegistry
    }

    val schema = t.schema
    var droppedFiles = false
    t.layout.commit { st =>
      st.copy(segments = st.segments.map { s =>
        if (!s.isVisible) s
        else {
          val fs = affectedOf(s)
          if (fs.isEmpty) s
          else {
            droppedFiles = true
            require(fs.forall(s.fileMeta.contains),
              s"segment ${s.id} lost footer metadata for ${fs.mkString(",")} mid-drop")
            // metadata retire incl. stats refresh — stale segment stats
            // would poison metadata MIN/MAX and IsNotNull pruning
            Partitions.retireFiles(s, fs, schema)
          }
        }
      })
    }
    droppedFiles || droppedFromRegistry
  }
}
