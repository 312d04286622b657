package graft.engine

import graft.engine.format.{ColumnStats, FileMeta, SegmentMeta, SegmentStatus}
import java.nio.file.Files

/** Temporary profiling probe for the 1M-segment cold read (not a test).
  * Builds the MetadataScaleSpec 1M fixture and times each phase of
  * TableLayout.readStatus from cold, printing a breakdown. */
object ColdReadProbe {
  def main(args: Array[String]): Unit = {
    import TestSpark._
    val SegM = 1000000
    val dir = Files.createTempDirectory("graft_probe1m_").toString + "/t"
    val src = spark.range(0, 100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    val t = GraftTable.create(spark, dir, src.schema, sortColumns = Seq("k"),
      properties = Map("global_sort_partitions" -> "1"))
    t.insert(src)
    def fakes(from: Int, until: Int, base: Long) = (from until until).map { i =>
      val lo = 1000000L + i.toLong * 10
      val stats = Map("k" -> ColumnStats(Some(lo.toString), Some((lo + 9).toString), 0))
      SegmentMeta(base + i, SegmentStatus.Success, "parquet",
        Seq(s"part-$i.parquet"), 10, 4096, stats, Seq("k"),
        createdAt = 1700000000000L + i,
        fileMeta = Map(s"part-$i.parquet" -> FileMeta(10, 4096, stats)))
    }
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    def tm[T](label: String)(body: => T): T = {
      val g0 = gcMs; val t0 = System.nanoTime(); val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (gc ${gcMs - g0} ms)"); r
    }
    tm("grow to 1M (4 commits)") {
      (0 until 4).foreach { b =>
        tm(s"  commit $b") {
          t.layout.commit { st =>
            st.copy(segments = st.segments ++ fakes(b * (SegM / 4), (b + 1) * (SegM / 4),
              st.nextSegmentId))
          }
        }
      }
    }
    // list the log dir
    val logDir = new java.io.File(s"$dir/_meta/log")
    Option(logDir.listFiles()).getOrElse(Array.empty).sortBy(_.getName).foreach { f =>
      println(f"[probe] log file ${f.getName} ${f.length / 1e6}%.1f MB")
    }
    println(s"[probe] manifest ${new java.io.File(s"$dir/_meta/tablestatus.json").length} B")
    // raw-phase replication: file read + line split + parallel parse
    val ckpt = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("ckpt-")).maxBy(_.length)
    val delta = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("delta-")).maxBy(_.getName.stripPrefix("delta-").stripSuffix(".json").toLong)
    val bytes = tm(s"raw read ${ckpt.getName}") {
      java.nio.file.Files.readAllBytes(ckpt.toPath)
    }
    val nLines = tm("line scan") {
      var c = 0; var i = 0
      while (i < bytes.length) { if (bytes(i) == '\n') c += 1; i += 1 }; c
    }
    println(s"[probe] lines: $nLines")
    val dbytes = tm(s"raw read ${delta.getName}") {
      java.nio.file.Files.readAllBytes(delta.toPath)
    }
    println(s"[probe] delta bytes ${dbytes.length}")
    (1 to 3).foreach { i =>
      graft.engine.format.MetaCache.drop(Some(t.layout.root.toString))
      tm(s"cold readStatus #$i") { assert(t.layout.readStatus().segments.size == SegM + 1) }
    }
    GraftTable.drop(spark, dir)
    spark.stop()
  }
}
