package graft.engine.format

import org.apache.hadoop.fs.{FileStatus, Path}

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Driver-side metadata cache (reference CarbonMetadata / the cache the
  * SHOW METACACHE command reports, CarbonShowCacheCommand.scala).
  *
  * Every query plans from the tablestatus commit log; without a cache a
  * 100k-segment table re-reads and re-parses a multi-MB JSON on every
  * scan. Entries are validated with a single `getFileStatus` stat call
  * (modification time + length): unchanged file → reuse the parsed
  * snapshot; changed → re-read. Same-JVM commits write through under
  * the table lock, so a writer's own reads are always coherent; a
  * cross-process racer can at worst serve the immediately-previous
  * COMPLETE snapshot — indistinguishable from having read a moment
  * before the concurrent commit (commit-path reads bypass the cache
  * entirely and stay authoritative).
  */
object MetaCache {

  final class Entry[T](
      @volatile var modTime: Long,
      @volatile var len: Long,
      @volatile var value: T,
      @volatile var bytes: Long) {
    val hits = new AtomicLong(0)
    val misses = new AtomicLong(0)
  }

  private val status = new ConcurrentHashMap[String, Entry[TableStatus]]()
  private val meta = new ConcurrentHashMap[String, Entry[TableMeta]]()

  private def cached[T](
      map: ConcurrentHashMap[String, Entry[T]],
      key: String, file: Path, stat: => FileStatus, read: => T): T =
    cachedWith(map, key, file, stat, (_: Option[T]) => read)

  /** Like [[cached]], but a stamp-stale miss hands the PREVIOUS cached
    * value to `read` — the checkpointed commit log re-reads only the
    * delta tail beyond its last assembly instead of the whole log. */
  private def cachedWith[T](
      map: ConcurrentHashMap[String, Entry[T]],
      key: String, file: Path, stat: => FileStatus,
      read: Option[T] => T): T = {
    val st =
      try stat
      catch { case _: java.io.FileNotFoundException =>
        map.remove(key); return read(None) }
    val e = map.get(key)
    if (e != null && e.modTime == st.getModificationTime && e.len == st.getLen) {
      e.hits.incrementAndGet()
      e.value
    } else {
      val v = read(if (e == null) None else Some(e.value))
      map.compute(key, (_, old) => {
        val e2 = if (old == null) new Entry(st.getModificationTime, st.getLen, v, st.getLen)
          else { old.modTime = st.getModificationTime; old.len = st.getLen
            old.value = v; old.bytes = st.getLen; old }
        e2.misses.incrementAndGet()
        e2
      })
      v
    }
  }

  private[format] def statusFor(
      key: String, file: Path, stat: => FileStatus, read: => TableStatus): TableStatus =
    cached(status, key, file, stat, read)

  private[format] def statusForIncr(
      key: String, file: Path, stat: => FileStatus,
      read: Option[TableStatus] => TableStatus): TableStatus =
    cachedWith(status, key, file, stat, read)

  private[format] def metaFor(
      key: String, file: Path, stat: => FileStatus, read: => TableMeta): TableMeta =
    cached(meta, key, file, stat, read)

  /** Write-through after a same-JVM commit (called under the table lock). */
  private[format] def putStatus(key: String, st: FileStatus, value: TableStatus): Unit =
    status.put(key, new Entry(st.getModificationTime, st.getLen, value, st.getLen))
  private[format] def putMeta(key: String, st: FileStatus, value: TableMeta): Unit =
    meta.put(key, new Entry(st.getModificationTime, st.getLen, value, st.getLen))

  /** SHOW METACACHE rows: (table, kind, entries, bytes, hits, misses). */
  def entries(tablePath: Option[String] = None): Seq[(String, String, Long, Long, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    def rows[T](m: ConcurrentHashMap[String, Entry[T]], kind: String) =
      m.asScala.toSeq
        .filter { case (k, _) => tablePath.forall(k == _) }
        .map { case (k, e) =>
          val n = e.value match {
            case ts: TableStatus => ts.segments.size.toLong
            case _ => 1L
          }
          (k, kind, n, e.bytes, e.hits.get, e.misses.get)
        }
    (rows(status, "tablestatus") ++ rows(meta, "tablemeta")).sortBy(r => (r._1, r._2))
  }

  /** DROP METACACHE: evict one table's entries, or everything. */
  def drop(tablePath: Option[String] = None): Unit = tablePath match {
    case Some(p) => status.remove(p); meta.remove(p)
    case None => status.clear(); meta.clear()
  }
}
