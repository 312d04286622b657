package graft.engine.format

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Options, Path}

import java.io.{InputStreamReader, BufferedReader}
import java.nio.charset.StandardCharsets
import java.util.UUID

/** On-disk layout + atomic metadata IO for a carbonish table.
  *
  * Layout (reference semantics: Metadata/tablestatus + per-segment files;
  * here JSON + parquet):
  * {{{
  *   <table>/_meta/tablemeta.json      — schema, sort columns, properties
  *   <table>/_meta/tablestatus.json    — commit log (TableStatus)
  *   <table>/segments/<id>/part-N.parquet — data files of segment <id>
  * }}}
  *
  * Commits are atomic: metadata is written to a temp file then renamed
  * over the target (single-file rename is atomic on HDFS and local FS).
  * Concurrent writers serialize on a best-effort `.lock` file (the
  * reference uses table-level lock files too, SURVEY §7.4).
  */
class TableLayout(val tablePath: String, conf: Configuration) {
  val root = new Path(tablePath)
  val metaDir = new Path(root, "_meta")
  val segmentsDir = new Path(root, "segments")
  private val statusPath = new Path(metaDir, "tablestatus.json")
  private val tableMetaPath = new Path(metaDir, "tablemeta.json")
  private val lockPath = new Path(metaDir, ".lock")

  // cached: FileSystem.get walks the Hadoop FS cache (conf hash) on
  // every call — at 100k-file planning loops that lookup alone was a
  // top profile frame (r15 MetaScaleProbe). Hadoop shares/caches the
  // underlying FileSystem instance anyway, so holding it is safe; the
  // layout lives driver-side only (executor paths ship
  // SerializableHadoopConf, never a TableLayout).
  private lazy val cachedFs: FileSystem = root.getFileSystem(conf)
  def fs: FileSystem = cachedFs

  private val isLocal = root.toUri.getScheme match {
    case null | "file" => true
    case _ => false
  }

  /** Metadata IO runs on the RAW local fs when the table is local:
    * ChecksumFileSystem renames a file and its .crc sidecar separately
    * and implements overwrite-rename as delete-then-rename — both break
    * commit atomicity for racing readers. Raw fs + POSIX ATOMIC_MOVE
    * restore the single-syscall swap; on HDFS the namenode rename is
    * already atomic and checksums are server-side, so `fs` stays. */
  private def metaFs: FileSystem =
    if (isLocal) FileSystem.getLocal(conf).getRaw else fs

  def segmentDir(id: Long): Path = new Path(segmentsDir, id.toString)
  def tmpSegmentDir(id: Long): Path =
    new Path(segmentsDir, s".tmp-$id-${UUID.randomUUID().toString.take(8)}")

  def exists: Boolean = fs.exists(tableMetaPath)

  // ---- JSON (jackson-scala ships with Spark) ----
  private def mapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    // derived defs (isVisible, nextSegmentId, …) serialize as extra
    // properties; tolerate them (and future schema additions) on read
    m.configure(
      com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  private def readJson[T](p: Path, clazz: Class[T]): T = {
    var attempts = 0
    while (true) {
      try return readJsonOnce(p, clazz)
      catch {
        // ChecksumFileSystem renames a file and its .crc sidecar
        // SEPARATELY, so a reader racing the commit's atomic rename can
        // briefly see new data under the old checksum. The data file
        // itself is never torn — retry reads the settled pair. Persistent
        // mismatch (real corruption) still surfaces.
        case _: org.apache.hadoop.fs.ChecksumException if attempts < 8 =>
          attempts += 1
          Thread.sleep(10L * attempts)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def readJsonOnce[T](p: Path, clazz: Class[T]): T = {
    val in = metaFs.open(p)
    try {
      val r = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      val sb = new StringBuilder
      var line = r.readLine()
      while (line != null) { sb.append(line).append('\n'); line = r.readLine() }
      mapper.readValue(sb.toString, clazz)
    } finally in.close()
  }

  /** Readers validate their [[MetaCache]] snapshot by (mtime, length)
    * alone, and filesystem mtime granularity can make two back-to-back
    * commits stamp identically. `pad` trailing spaces (legal JSON
    * whitespace) force the LENGTH to differ between adjacent commits:
    * status commits pass `version % 37` (strictly increasing under the
    * table lock, so consecutive commits always differ); other writes
    * draw from a nanoTime-salted sequence. */
  private def writeJsonAtomic[T](p: Path, value: T, pad: Int = -1): Unit = {
    val tmp = new Path(p.getParent, s".${p.getName}.tmp-${UUID.randomUUID().toString.take(8)}")
    val padN =
      (if (pad >= 0) pad
       else ((TableLayout.padSeq.incrementAndGet() ^ (System.nanoTime() >>> 10)) & 0x7fffffff).toInt) % 37
    val out = metaFs.create(tmp, true)
    try {
      // pretty-print while the file is human-sized; past the threshold
      // the indentation is pure overhead — on a 100k-segment commit log
      // it roughly doubles both the bytes on disk and the parse time of
      // every cold read (r15 MetadataScaleSpec: 76 MB pretty). The
      // switch is invisible to readers (JSON is JSON). Compact-first so
      // the LARGE case serializes once; re-rendering a small file
      // pretty is cheap.
      val compact = mapper.writeValueAsBytes(value)
      if (compact.length > TableLayout.PrettyMaxBytes) out.write(compact)
      else out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(value))
      out.write(Array.fill[Byte](padN)(' '))
    }
    finally out.close()
    graft.engine.Failpoints.hit("meta.tmpWritten", tablePath)
    // Fencing (VERDICT r15 #2): re-verify lock ownership IMMEDIATELY
    // before the publish rename. A holder paused past LockStaleMs (GC,
    // NFS stall, cgroup freeze) loses its lock to the staleness
    // takeover; without this check it would wake and blindly rename its
    // RMW over the interleaved writer's commit — a silent lost update.
    // The residual window is the microseconds between this read and the
    // rename itself, the fundamental limit of fencing without a
    // filesystem CAS.
    try verifyFence()
    catch { case e: Throwable =>
      try metaFs.delete(tmp, false)
      catch { case scala.util.control.NonFatal(_) => }
      throw e
    }
    if (isLocal) {
      java.nio.file.Files.move(
        new java.io.File(tmp.toUri.getPath).toPath,
        new java.io.File(p.toUri.getPath).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      // reclaim a checksum sidecar left by writes that predate raw-fs
      // metadata IO — it would describe stale bytes forever
      try metaFs.delete(new Path(p.getParent, s".${p.getName}.crc"), false)
      catch { case scala.util.control.NonFatal(_) => }
    } else {
      // FileContext.rename supports atomic OVERWRITE (plain FileSystem doesn't)
      org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
        .rename(tmp, p, Options.Rename.OVERWRITE)
    }
  }

  // ---- table meta ----
  def writeTableMeta(meta: TableMeta): Unit = {
    fs.mkdirs(metaDir); fs.mkdirs(segmentsDir)
    writeJsonAtomic(tableMetaPath, meta)
    try MetaCache.putMeta(root.toString, fs.getFileStatus(tableMetaPath), meta)
    catch { case scala.util.control.NonFatal(_) => MetaCache.drop(Some(root.toString)) }
  }

  /** Stat-validated cached read (one getFileStatus call when the file is
    * unchanged — see [[MetaCache]]); commit paths use the uncached form. */
  def readTableMeta(): TableMeta =
    MetaCache.metaFor(root.toString, tableMetaPath,
      fs.getFileStatus(tableMetaPath), readTableMetaUncached())
  def readTableMetaUncached(): TableMeta = readJson(tableMetaPath, classOf[TableMeta])

  /** Locked read-modify-write of the table meta — ALTER-style metadata
    * changes go through here so concurrent writers can't lose updates
    * (same two-layer lock as the tablestatus commit). */
  def updateTableMeta(f: TableMeta => TableMeta): Unit = withLock {
    writeTableMeta(f(readTableMetaUncached()))
  }

  // ---- segment history ledger (SHOW HISTORY SEGMENTS) ----
  // Append-only JSONL beside the commit log: CLEAN FILES moves the
  // registry entries it garbage-collects here, so history survives GC
  // without growing the hot tablestatus file (reference keeps a
  // tablestatus.history the same way). Append-only lines sidestep the
  // atomic-rewrite format-compat question entirely.
  private def historyPath = new Path(metaDir, "history.jsonl")

  def appendHistory(entries: Seq[SegmentMeta]): Unit = if (entries.nonEmpty) {
    val out =
      if (metaFs.exists(historyPath)) metaFs.append(historyPath)
      else metaFs.create(historyPath, false)
    try entries.foreach { e =>
      out.write(mapper.writeValueAsBytes(e)); out.write('\n')
    } finally out.close()
  }

  def readHistory(): Seq[SegmentMeta] =
    if (!metaFs.exists(historyPath)) Nil
    else {
      val in = metaFs.open(historyPath)
      try {
        val r = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
        Iterator.continually(r.readLine()).takeWhile(_ != null)
          .filter(_.trim.nonEmpty)
          .map(l => mapper.readValue(l, classOf[SegmentMeta])).toList
          // a CLEAN FILES killed between its history append and its
          // status rename re-appends the same dead entries on the next
          // run (append-only ledger, at-least-once by design) — dedupe
          // on read by identity so the crash-retry is invisible
          .distinctBy(s => (s.id, s.createdAt, s.status))
      } finally in.close()
    }

  // ---- tablestatus commit log ----
  /** (mtime, length) of the commit log file — the same pair MetaCache
    * validates snapshots by. Callers that memoize derived state (e.g.
    * the SI probe cache) must key on THIS as well as the version:
    * dropping and recreating a table restarts version numbering, so
    * version alone can collide across incarnations. (0, 0) = no log. */
  def statusStamp(): (Long, Long) =
    if (fs.exists(statusPath)) {
      val st = fs.getFileStatus(statusPath)
      (st.getModificationTime, st.getLen)
    } else (0L, 0L)

  /** Stat-validated cached snapshot; a reader racing a commit may see
    * the immediately-previous COMPLETE snapshot (same as reading a
    * moment earlier). Commit paths use this under the table lock too
    * (see [[commit]]) — there the stamp match is exact, not racy. */
  def readStatus(): TableStatus =
    if (fs.exists(statusPath))
      MetaCache.statusFor(root.toString, statusPath,
        fs.getFileStatus(statusPath), readStatusUncached())
    else TableStatus(0L, Nil)

  def readStatusUncached(): TableStatus =
    if (fs.exists(statusPath)) readJson(statusPath, classOf[TableStatus])
    else TableStatus(0L, Nil)

  private def publishStatus(next: TableStatus): Unit = {
    writeJsonAtomic(statusPath, next, pad = (next.version % 37).toInt)
    // write-through: the committer's JVM serves its own commit
    // immediately, regardless of filesystem timestamp granularity
    try MetaCache.putStatus(root.toString, fs.getFileStatus(statusPath), next)
    catch { case scala.util.control.NonFatal(_) => MetaCache.drop(Some(root.toString)) }
  }

  /** Read-modify-write of the commit log under the table lock.
    *
    * The read is the STAT-VALIDATED cache (r15) cross-checked against a
    * cheap version-header probe (r16, see [[commitBaseStatus]]): under
    * the lock no writer can interleave, so a snapshot whose stamp AND
    * version both match the file IS the file. The practical difference
    * is commit latency at scale: the uncached form re-parsed the ENTIRE
    * log under the table lock (~1.2 s per commit on a 100k-segment
    * table, serializing every writer behind it); the validated read is
    * one getFileStatus + one 256-byte header read when this JVM
    * published the last commit (the write-through below), and a full
    * parse only after a foreign process committed. */
  def commit(update: TableStatus => TableStatus): TableStatus = withLock {
    val next0 = update(commitBaseStatus())
    val next = next0.copy(version = next0.version + 1)
    publishStatus(next)
    next
  }

  /** The RMW base snapshot under the table lock: the stat-validated
    * cache, CROSS-CHECKED against a cheap version-header read (advisor
    * r15: (mtime, length) alone can collide when a foreign commit's
    * content-length delta cancels the version pad delta inside one
    * mtime tick — the version field itself cannot). `version` is the
    * FIRST field TableStatus serializes, so the first bytes of the log
    * identify the snapshot without parsing it; any mismatch or
    * unreadable header falls back to the authoritative full parse. */
  private def commitBaseStatus(): TableStatus = {
    val cached = readStatus()
    readVersionHeader() match {
      case Some(v) if v == cached.version => cached
      case None if !fs.exists(statusPath) => cached // no log yet
      case _ => readStatusUncached()
    }
  }

  /** Version of the on-disk log from its first bytes (None = missing
    * or unreadable — e.g. a reader racing the rename). */
  private def readVersionHeader(): Option[Long] =
    try {
      val in = metaFs.open(statusPath)
      try {
        val buf = new Array[Byte](256)
        val n = in.read(buf)
        if (n <= 0) None
        else TableLayout.VersionHeaderRe
          .findFirstMatchIn(new String(buf, 0, n, StandardCharsets.UTF_8))
          .map(_.group(1).toLong)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Schema-change publish: status update + new table meta under ONE
    * table lock, so no other writer interleaves between the two files.
    * The two renames are individually atomic; the crash window between
    * them is the residual risk a two-file layout cannot close. */
  def commitWithMeta(newMeta: TableMeta)(update: TableStatus => TableStatus): TableStatus =
    withLock {
      val next0 = update(commitBaseStatus())
      val next = next0.copy(version = next0.version + 1)
      publishStatus(next)
      writeTableMeta(newMeta)
      next
    }

  /** Owner token of the lock THIS thread holds (null outside withLock)
    * — the fence [[verifyFence]] checks before every publish rename. */
  private val heldToken = new ThreadLocal[String]()

  private def writeLockToken(token: String): Unit = {
    val out = fs.create(lockPath, true)
    try out.write(token.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Current lock-file content; None = missing or (transiently)
    * unreadable. 64 bytes is plenty for a UUID token. */
  private def readLockToken(): Option[String] =
    try {
      val in = fs.open(lockPath)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        if (n <= 0) None
        else Some(new String(buf, 0, n, StandardCharsets.UTF_8))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Abort if this thread's lock was taken over while held (see the
    * call site in writeJsonAtomic). Surfaced as the same exception the
    * optimistic-swap paths use: the caller lost a race, loudly. */
  private def verifyFence(): Unit = {
    val tok = heldToken.get
    if (tok != null) {
      val cur = readLockToken()
      if (!cur.contains(tok))
        throw new graft.engine.ConcurrentMutationException(
          s"table lock $lockPath lost while held (stale-lock takeover " +
            s"after a pause?) — commit aborted to avoid erasing the " +
            s"interleaved writer's publish (current holder: " +
            s"${cur.getOrElse("<released>")})")
    }
  }

  private def withLock[T](body: => T): T = {
    // two layers: a JVM-wide monitor per table path (FileSystem
    // .createNewFile is check-then-create on the local FS, so it can't
    // arbitrate same-process writers), then the lock FILE for
    // cross-process writers (HDFS create(overwrite=false) is atomic at
    // the namenode — the reference's table-level lock, SURVEY §7.4).
    val monitor = TableLayout.jvmLocks.computeIfAbsent(
      root.toString, _ => new Object)
    monitor.synchronized {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var locked = false
      fs.mkdirs(metaDir)
      while (!locked) {
        try { locked = fs.createNewFile(lockPath) }
        catch { case _: java.io.IOException => }
        if (!locked) {
          tryReclaimStaleLock()
          if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"could not acquire table lock $lockPath within 60s")
          Thread.sleep(50)
        }
      }
      // fencing token: every publish re-verifies ownership right before
      // its atomic rename (verifyFence), so a holder that lost the lock
      // to the staleness takeover aborts instead of silently erasing
      // the interleaved commit
      val token = UUID.randomUUID().toString
      try writeLockToken(token)
      catch { case e: Throwable =>
        try fs.delete(lockPath, false)
        catch { case scala.util.control.NonFatal(_) => }
        throw e
      }
      heldToken.set(token)
      // heartbeat: a LIVE holder doing long physical work under the
      // lock (CLEAN FILES walking object storage, a multi-second
      // 100k-segment serialize) must never look stale — touch the lock
      // mtime at LockStaleMs/4 so only a truly wedged/paused JVM can be
      // reclaimed (advisor r15). A full-JVM pause stops this thread too
      // — that case is what the fence is for.
      val period = math.max(java.lang.Long.getLong(
        "graft.lock.heartbeat.ms", TableLayout.LockStaleMs / 4), 50L)
      val hb = TableLayout.heartbeats.scheduleWithFixedDelay(
        () => try fs.setTimes(lockPath, System.currentTimeMillis(), -1)
              catch { case scala.util.control.NonFatal(_) => },
        period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
      try body
      finally {
        hb.cancel(false)
        heldToken.remove()
        // release only what is still OURS (or already gone): after a
        // takeover the file is the new holder's live lock — deleting it
        // would unlock an active critical section. A leaked own lock
        // (transient read failure here) self-heals via the staleness
        // takeover.
        val cur = readLockToken()
        if (cur.isEmpty || cur.contains(token)) fs.delete(lockPath, false)
      }
    }
  }

  /** Crashed-holder takeover (found by the crash-point fuzz, r15): a
    * writer killed between acquiring `.lock` and its finally-delete
    * wedges every future writer forever — the lock file has no owner
    * process to release it. The lock is only ever held across the
    * metadata read-modify-write (milliseconds; data writes happen
    * OUTSIDE it), so a lock file untouched for [[TableLayout.LockStaleMs]]
    * is a crashed holder. Claim is by atomic RENAME to a unique name —
    * two waiters can't both reclaim one incarnation — and the claimed
    * file's mtime is re-checked after the rename: if a live writer
    * re-created the lock in the stat→rename window we claimed a FRESH
    * lock and put it back. The residual race (a second re-create inside
    * that same microsecond window making the put-back fail) is logged
    * loudly; its worst case is one early lock grant — and since r16 an
    * early grant can no longer lose a commit: a LIVE holder doing long
    * work heartbeats the lock mtime (so it never looks stale), and a
    * PAUSED holder that genuinely lost the lock fails [[verifyFence]]
    * before its publish rename and aborts instead of erasing the
    * interleaved commit. */
  private def tryReclaimStaleLock(): Unit = {
    val staleMs = TableLayout.LockStaleMs
    try {
      val st = fs.getFileStatus(lockPath)
      if (System.currentTimeMillis() - st.getModificationTime > staleMs) {
        val claim = new Path(metaDir, s".lock.reclaim-${UUID.randomUUID().toString.take(8)}")
        if (fs.rename(lockPath, claim)) {
          val claimed = fs.getFileStatus(claim)
          if (System.currentTimeMillis() - claimed.getModificationTime > staleMs) {
            fs.delete(claim, false)
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"[graft] reclaimed stale table lock $lockPath " +
                s"(holder silent for >${staleMs / 1000}s — crashed?)")
          } else if (!fs.rename(claim, lockPath)) {
            // a THIRD writer recreated the lock inside the window;
            // drop the claim so at most one early grant can occur
            fs.delete(claim, false)
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"[graft] lock takeover race on $lockPath — claimed a live " +
                "lock and could not restore it; one early grant possible")
          }
        }
      }
    } catch {
      case _: java.io.FileNotFoundException => // holder released — retry wins
      case scala.util.control.NonFatal(_) =>
    }
  }

  /** List absolute data-file paths of the given segment. */
  // (companion holds the JVM-wide lock registry — see withLock)
  def segmentFilePaths(seg: SegmentMeta): Seq[String] = {
    val base = seg.externalPath.map(new Path(_)).getOrElse(segmentDir(seg.id))
    seg.files.map(f => new Path(base, f).toString)
  }
}

object TableLayout {
  /** Metadata files up to this size pretty-print (debuggability); past
    * it they write compact — indentation on a 100k-segment commit log
    * doubles bytes and cold-parse time for zero information. */
  val PrettyMaxBytes: Int = 4 * 1024 * 1024

  /** Lock-file staleness horizon for crashed-holder takeover. Commits
    * hold the lock for milliseconds, so 5 minutes is ~10^4 margin;
    * overridable for tests via -Dgraft.lock.stale.ms. */
  val LockStaleMs: Long =
    java.lang.Long.getLong("graft.lock.stale.ms", 5L * 60 * 1000)
  /** JVM-wide per-table-path monitors backing withLock's first layer. */
  private[format] val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  /** Shared daemon scheduler behind the held-lock mtime heartbeat. */
  private[format] val heartbeats: java.util.concurrent.ScheduledThreadPoolExecutor = {
    val e = new java.util.concurrent.ScheduledThreadPoolExecutor(1, (r: Runnable) => {
      val t = new Thread(r, "graft-lock-heartbeat"); t.setDaemon(true); t
    })
    e.setRemoveOnCancelPolicy(true)
    e
  }
  /** Sequence behind writeJsonAtomic's length-uniquifying pad. */
  private[format] val padSeq =
    new java.util.concurrent.atomic.AtomicLong(System.nanoTime() & 0xff)
  /** First-bytes probe for the commit log's leading version field. */
  private[format] val VersionHeaderRe = """"version"\s*:\s*(\d+)""".r
}
