package graft.engine.mv

import graft.engine.format.TableLayout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.hadoop.fs.Path

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}
import scala.jdk.CollectionConverters._

/** Serializable placeholder for a scan leaf inside a persisted MV build
  * plan. Scan relations hold live, non-serializable state (file indexes,
  * Hadoop conf, a transient SparkSession), so the stub records only what
  * is needed to re-plan the scan in a fresh session: format, paths,
  * reader options, and the original output attributes (for exprId
  * remapping after the leaf is rebuilt). */
private[mv] case class MvLeafStub(
    format: String,
    paths: Seq[String],
    options: Map[String, String],
    stubOutput: Seq[Attribute]) extends LeafNode {
  override def output: Seq[Attribute] = stubOutput
}

/** On-disk MV definition: everything needed to re-register the MV in a
  * new JVM. `buildStubbed` is the avg-expanded ANALYZED plan with scan
  * leaves replaced by [[MvLeafStub]]s; the optimized match plan is
  * recomputed at load time (its scan leaves can't be persisted, and
  * re-optimizing reproduces exactly what a fresh query session plans
  * against). */
/** The watermark is a per-base-path (id → rowCount) fingerprint map
  * (a join MV has one entry per carbonish base): a segment that
  * shrank in place (file-grain mutation / metadata DROP PARTITION)
  * must invalidate incremental refresh and MV serving. Old defs
  * serialized with earlier watermark shapes fail deserialization
  * (serialVersionUID bump) and load as "no MV" with a warning —
  * recreate them. */
@SerialVersionUID(3L)
private[mv] case class MvPersisted(
    name: String,
    path: String,
    buildStubbed: LogicalPlan,
    refreshedSegments: Option[Map[String, Map[Long, Long]]],
    deferred: Boolean)

/** Persistence for [[MvDef]]s: one `_meta/mvdef.bin` per MV table, so
  * the MV (and its incremental-refresh watermark) survives the session
  * JVM. Reference keeps MV metadata in its metastore
  * (CarbonCreateMVCommand.scala:60, docs/mv-guide.md). */
object MvStore {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.engine.mv.MvStore")

  // Resource limits first (a graph built ONLY from allowed classes can
  // still drive deep recursion / memory exhaustion), then the class
  // allowlist — narrowed from org.apache.spark.** to the packages a
  // persisted plan graph actually contains: catalyst plan/expression
  // nodes, sql types, unsafe strings, and our own expressions
  // (org.apache.spark.sql.graft — the Shims package).
  private[mv] val deserializationFilter: java.io.ObjectInputFilter = {
    val base = java.io.ObjectInputFilter.Config.createFilter(
      // depth generous (catalyst trees nest several graph levels per
      // expression node — a legitimately deep plan must still load);
      // the array/refs/bytes caps are the memory backstop
      "maxdepth=2000;maxarray=1000000;maxrefs=1000000;maxbytes=67108864;" +
        "graft.**;org.apache.spark.QueryContext*;" +  // tree Origin's context enum
        "org.apache.spark.sql.catalyst.**;org.apache.spark.sql.types.**;" +
        "org.apache.spark.sql.graft.**;org.apache.spark.unsafe.types.**;" +
        "org.apache.spark.util.**;scala.**;" +
        "java.lang.**;java.util.**;java.time.**;java.math.**;!*")
    // name the offender: "filter status: REJECTED" alone is undebuggable
    new java.io.ObjectInputFilter {
      override def checkInput(info: java.io.ObjectInputFilter.FilterInfo)
          : java.io.ObjectInputFilter.Status = {
        val st = base.checkInput(info)
        if (st == java.io.ObjectInputFilter.Status.REJECTED)
          log.warn(s"mvdef deserialization rejected: class=" +
            s"${Option(info.serialClass).map(_.getName).getOrElse("<none>")} " +
            s"depth=${info.depth} refs=${info.references} bytes=${info.streamBytes}")
        st
      }
    }
  }

  private def defPath(layout: TableLayout): Path =
    new Path(layout.metaDir, "mvdef.bin")

  /** Replace every scan leaf with a serializable [[MvLeafStub]].
    * Throws if a leaf is not a recognized file/carbonish relation —
    * such an MV is memory-only (create still succeeds; persist is
    * best-effort at the caller). */
  private def stubLeaves(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case r: DataSourceV2Relation => r.table match {
      case t: graft.engine.source.CarbonishTable =>
        // options are kept VERBATIM (including "path"): relation equality
        // — and with it the rewrite's canonical child match against a
        // fresh user query — is sensitive to the exact option strings
        MvLeafStub("carbonish", Seq(t.tablePath), r.options.asScala.toMap, r.output)
      case other => throw new IllegalArgumentException(
        s"cannot persist MV over non-carbonish DSv2 table ${other.name()}")
    }
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          val fmt = fs.fileFormat match {
            case _: org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat => "parquet"
            case _: org.apache.spark.sql.execution.datasources.csv.CSVFileFormat => "csv"
            case _: org.apache.spark.sql.execution.datasources.json.JsonFileFormat => "json"
            case _: org.apache.spark.sql.execution.datasources.orc.OrcFileFormat => "orc"
            case other => throw new IllegalArgumentException(
              s"cannot persist MV over file format ${other.getClass.getName}")
          }
          MvLeafStub(fmt, fs.location.rootPaths.map(_.toString), fs.options, lr.output)
        case other => throw new IllegalArgumentException(
          s"cannot persist MV over relation ${other.getClass.getName}")
      }
  }

  /** Rebuild every stub as a live scan and remap attribute ids so the
    * plan above keeps resolving. Mapping is by column NAME — the fresh
    * scan allocates new exprIds. */
  private def reconstruct(spark: SparkSession, plan: LogicalPlan): LogicalPlan = {
    val amap = scala.collection.mutable.HashMap.empty[ExprId, Attribute]
    val replaced = plan.transformUp {
      case s: MvLeafStub =>
        // re-plan with the ORIGINAL option strings: a "path" option that
        // differs even by a file:/ prefix makes the rebuilt relation
        // unequal to a fresh user scan, and the rewrite's canonical
        // child match silently stops firing
        val reader = spark.read.format(s.format)
          .options(s.options -- Seq("path", "paths"))
        val fresh = (s.options.get("path") match {
          case Some(p) => reader.load(p)
          case None => reader.load(s.paths: _*)
        }).queryExecution.analyzed
        val byName = fresh.output.map(a => a.name -> a).toMap
        s.stubOutput.foreach { a =>
          amap += a.exprId -> byName.getOrElse(a.name, throw new IllegalStateException(
            s"MV base at ${s.paths.mkString(",")} no longer has column ${a.name}"))
        }
        fresh
    }
    replaced.transformAllExpressions {
      case a: AttributeReference => amap.getOrElse(a.exprId, a)
    }
  }

  /** Write the def beside the MV table's own metadata (atomic rename,
    * same pattern as tablestatus). */
  def save(spark: SparkSession, d: MvDef): Unit = {
    val persisted = MvPersisted(
      d.name, d.path, stubLeaves(d.build),
      Some(MvCatalog.refreshedSegments(d.name)).filter(_.nonEmpty),
      d.deferred)
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(persisted); oos.close()
    val layout = new TableLayout(d.path, spark.sessionState.newHadoopConf())
    val fs = layout.fs
    fs.mkdirs(layout.metaDir)
    val target = defPath(layout)
    val tmp = new Path(layout.metaDir, s".mvdef.bin.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(bos.toByteArray) finally out.close()
    // atomic overwrite-rename: delete-then-rename leaves a window with
    // no def file at all if the JVM dies in between
    org.apache.hadoop.fs.FileContext.getFileContext(target.toUri,
        spark.sessionState.newHadoopConf())
      .rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Load the def stored at `mvPath` (None if absent/unreadable) and
    * recompute the optimized match plan. Does NOT register it. */
  def load(spark: SparkSession, mvPath: String)
      : Option[(MvDef, Option[Map[String, Map[Long, Long]]])] = {
    val layout = new TableLayout(mvPath, spark.sessionState.newHadoopConf())
    val p = defPath(layout)
    if (!layout.fs.exists(p)) return None
    try {
      val in = layout.fs.open(p)
      val bytes = try {
        val b = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { b.write(buf, 0, n); n = in.read(buf) }
        b.toByteArray
      } finally in.close()
      val ois = new ObjectInputStream(new ByteArrayInputStream(bytes))
      // deserialization gate: anyone who can write to the MV path could
      // plant a gadget chain otherwise. The graph is graft stubs +
      // Catalyst plan/expression nodes + Scala/Java collections — allow
      // those packages, reject everything else (gadget classes live in
      // unrelated libraries).
      ois.setObjectInputFilter(MvStore.deserializationFilter)
      val persisted = ois.readObject().asInstanceOf[MvPersisted]
      val build = reconstruct(spark, persisted.buildStubbed)
      // the match plan is what the optimizer would plan for the same
      // query today — recompute rather than persist scan internals.
      // Aggregate (groupby MV) and SPJ (select-only MV) both load;
      // anything else means the stored def no longer corresponds to a
      // servable plan shape.
      val matchPlan = MvRewriteRule.withoutRewrite {
        org.apache.spark.sql.graft.Shims.ofRows(spark, build)
          .queryExecution.optimizedPlan
      }
      matchPlan match {
        case _: Aggregate => ()
        case p => p.foreach {
          case _: org.apache.spark.sql.catalyst.plans.logical.Project
             | _: org.apache.spark.sql.catalyst.plans.logical.Filter
             | _: org.apache.spark.sql.catalyst.plans.logical.Join
             | _: LeafNode => ()
          case other => throw new IllegalStateException(
            s"persisted MV ${persisted.name} no longer optimizes to a servable " +
              s"shape: ${other.nodeName}")
        }
      }
      Some((MvDef(persisted.name, matchPlan, build, persisted.path, persisted.deferred),
        persisted.refreshedSegments))
    } catch {
      case scala.util.control.NonFatal(e) =>
        // a corrupt / rejected / plan-incompatible def must be VISIBLE —
        // silently returning None masks corruption as "no MV here"
        log.warn(s"failed to load MV definition at $p — ignoring it " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage})")
        None
    }
  }
}
