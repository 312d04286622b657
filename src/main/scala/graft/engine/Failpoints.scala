package graft.engine

/** Crash-point hooks for systematic commit-protocol fuzzing (the
  * reference hardens the same windows ad hoc — tablestatus lock +
  * stale-cleanup in SegmentStatusManager/CarbonCleanFilesCommand;
  * SURVEY §7.1/§7.4 — here every window is enumerable and testable).
  *
  * Each named point marks an instant where a process kill would leave
  * partial on-disk state: reserved-but-unwritten segments, staged
  * files, renamed-but-uncommitted outputs, half-swept cleans, torn
  * metadata tmp files. A test arms a handler; the point invokes it
  * synchronously on the thread executing the protocol step, so the
  * handler can SNAPSHOT the table directory exactly as a kill at that
  * instant would leave it (copy-based kill simulation: unlike an
  * injected exception, a snapshot is not masked by `finally` cleanup
  * the real kill would never run). Production cost: one volatile read
  * per protocol step, zero allocation when disarmed.
  */
object Failpoints {
  /** (point, tablePath) — the path filter keeps a concurrently-running
    * suite's table operations from firing a handler armed for another
    * table (sbt runs suites in one JVM). */
  @volatile private var handler: (String, String) => Unit = null

  def hit(point: String, tablePath: String): Unit = {
    val h = handler
    if (h != null) h(point, tablePath)
  }

  def withHandler[T](h: (String, String) => Unit)(body: => T): T = {
    handler = h
    try body finally handler = null
  }

  /** Every instrumented CRASH point, with the operation that owns it —
    * the fuzz spec enumerates this registry so an uncovered point is a
    * test failure, not a blind spot. (Non-crash scheduling hooks —
    * "lock.heartbeat", fired per heartbeat tick so a spec can inject a
    * slow metadata store — are deliberately NOT here: a kill inside
    * them leaves no on-disk state to fuzz.) */
  val registry: Map[String, String] = Map(
    // TableLayout.writeJsonAtomic: metadata tmp file written, rename
    // pending — EVERY commit's torn window (status, tablemeta)
    "meta.tmpWritten" -> "any-commit",
    // TableLayout.publishStatus (checkpointed form): delta file on
    // disk, manifest rename pending — readers must keep serving the
    // old manifest; the orphan delta is overwritten by the retry
    "meta.deltaWritten" -> "any-commit-checkpointed",
    // TableLayout.publishStatus (checkpointed form): full snapshot
    // written, manifest rename pending — same recovery contract
    "meta.checkpointWritten" -> "any-commit-checkpointed",
    // GraftTable.insert: IN_PROGRESS record committed, no data yet
    "insert.reserved" -> "insert",
    // GraftTable.insert: segment data files on disk, publish pending
    "insert.filesWritten" -> "insert",
    // GraftTable.compact: merged output written, swap commit pending
    "compact.outputWritten" -> "compact",
    // Mutation copy-on-write: rewritten files on disk, swap pending
    "mutation.rewritten" -> "update/delete/merge",
    // Merge-on-read: delete-delta file written, delta commit pending
    "mor.deltaWritten" -> "delete-mor",
    // foldOne: fold output under .fold-tmp-, rename pending
    "fold.tmpWritten" -> "fold",
    // foldOne: output renamed to its final -fold- name, commit pending
    "fold.renamed" -> "fold",
    // cleanFiles: physical deletes done, status commit pending
    "clean.midSweep" -> "clean-files",
    // streaming handoff: columnar files written, swap commit pending
    "handoff.written" -> "streaming-handoff",
    // streaming append: batch files moved into the open segment,
    // append commit pending (replay must overwrite, not brick)
    "stream.batchMoved" -> "streaming-append",
    // insert: segment published, SI/text index maintenance pending —
    // a kill here leaves the new segment OUTSIDE index coverage and
    // indexed lookups must stay correct via the uncovered-segment
    // fallback until the next maintenance pass
    "publish.beforeIndexMaintain" -> "insert")
}
