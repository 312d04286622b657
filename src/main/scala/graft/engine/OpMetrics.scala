package graft.engine

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** Armable write-amplification counters for the bench's slope
  * diagnosis (VERDICT r14 Next #5: every per-family slope claim needs
  * a measured metric, not a sentence). Driver-side only — the commit
  * paths that know what they rewrote report here; executors never
  * touch it. Disarmed cost: one volatile read per publish. */
object OpMetrics {
  private val armed = new AtomicBoolean(false)
  private val bytesWritten = new AtomicLong(0)
  private val rowsWritten = new AtomicLong(0)
  private val segmentsWritten = new AtomicLong(0)
  private val deltaBytes = new AtomicLong(0)

  /** A freshly-published segment (insert/load/compact/rewrite/handoff). */
  def addSegmentWrite(bytes: Long, rows: Long): Unit = if (armed.get()) {
    bytesWritten.addAndGet(math.max(0L, bytes))
    rowsWritten.addAndGet(math.max(0L, rows))
    segmentsWritten.incrementAndGet()
  }

  /** Committed merge-on-read delete-delta volume. */
  def addDeltaWrite(bytes: Long): Unit =
    if (armed.get()) deltaBytes.addAndGet(math.max(0L, bytes))

  def arm(): Unit = {
    bytesWritten.set(0); rowsWritten.set(0)
    segmentsWritten.set(0); deltaBytes.set(0)
    armed.set(true)
  }

  /** Stop counting and return (bytesWritten, rowsWritten,
    * segmentsWritten, deltaBytes) accumulated since arm(). */
  def drain(): (Long, Long, Long, Long) = {
    armed.set(false)
    (bytesWritten.get(), rowsWritten.get(), segmentsWritten.get(), deltaBytes.get())
  }
}
