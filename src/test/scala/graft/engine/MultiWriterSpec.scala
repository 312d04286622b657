package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** N-writer contention against ONE table (VERDICT r14 Next #3 — the
  * mixed read/write anchor has a single writer thread; this spec is the
  * adversarial version). Six writers — two inserters, an updater, a
  * deleter-free compactor, a delta folder, and a CLEAN FILES loop — run
  * concurrently with two snapshot readers. Contract:
  *
  *  - every commit serializes on the locked tablestatus RMW: no lost
  *    updates (each successful insert batch is visible EXACTLY once,
  *    each successful update's increment is counted exactly once);
  *  - optimistic-swap losers abort loudly ([[ConcurrentMutationException]]
  *    propagates to the caller as a failed op, never a silent partial)
  *    and bounded retries make progress — every writer finishes;
  *  - readers are torn-free: writers never change row count mod the
  *    batch size, so every sampled count must hold that invariant;
  *  - no deadlock: the whole mix joins within the timeout.
  *
  * Reference: table-level locking, SURVEY §7.4. */
class MultiWriterSpec extends AnyFunSuite {
  import TestSpark._

  private val Batch = 100

  test("6 concurrent writers + 2 readers: serialized commits, no lost updates, torn-free reads") {
    writerMix()
  }

  test("the same 6-writer mix on a CHECKPOINTED commit log (snapshot + delta tail)") {
    // shrink the inline threshold so every commit in the mix goes
    // through the delta/checkpoint machinery — the exactly-once and
    // torn-free contracts must hold identically in the r16 log form
    // (suites run sequentially in this JVM; see CrashFuzzSpec)
    System.setProperty("graft.status.inline.max", "2")
    System.setProperty("graft.status.checkpoint.every", "8")
    try writerMix()
    finally {
      System.clearProperty("graft.status.inline.max")
      System.clearProperty("graft.status.checkpoint.every")
    }
  }

  private def writerMix(): Unit = {
    val dir = Files.createTempDirectory("graft_mw_").toString + "/t"
    val seedN = 1000L
    val seed = spark.range(0, seedN)
      .selectExpr("id AS k", "CAST(0.0 AS DOUBLE) AS v", "'seed' AS tag")
    val t0 = GraftTable.create(spark, dir, seed.schema, sortColumns = Seq("k"),
      properties = Map(
        "global_sort_partitions" -> "2",
        "iud_mode" -> "mor",
        // retention keeps the concurrent CLEAN FILES from reclaiming a
        // just-retired segment under a reader mid-scan (the vacuum
        // contract this mix exists to prove)
        "clean_files_retention_ms" -> "3600000",
        "horizontal_compaction_threshold" -> "100"))
    t0.insert(seed)

    val iters = 6
    val okBatches = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int)]()
    val okUpdates = new AtomicInteger(0)
    val failedOps = new AtomicInteger(0)
    val tornCounts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val readerErrors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)

    // the update target: keys [0, 50) of the seed — a fixed subset so
    // the final sum(v) audits the exact number of successful increments
    val updKeys = 50L

    def table() = GraftTable.at(spark, dir)

    def inserter(name: String): Thread = new Thread(() => {
      val t = table()
      var i = 0
      while (i < iters) {
        val base = 10000L * (name.hashCode.toLong.abs % 97 + 1) + i * Batch
        val df = spark.range(base, base + Batch)
          .selectExpr("id AS k", "CAST(1.0 AS DOUBLE) AS v", s"'$name-$i' AS tag")
        try { t.insert(df); okBatches.add((name, i)) }
        catch { case _: Throwable => failedOps.incrementAndGet() }
        i += 1
      }
    }, name)

    val updater = new Thread(() => {
      val t = table()
      var i = 0
      while (i < iters) {
        // MoR update: count-preserving increment on the fixed subset;
        // bounded in-spec retry on optimistic-swap loss
        var attempts = 0
        var done = false
        while (!done && attempts < 8) {
          try { t.update(col("k") < updKeys && col("tag") === "seed",
            Map("v" -> (col("v") + lit(1.0)))); done = true }
          catch { case _: ConcurrentMutationException => attempts += 1 }
        }
        if (done) okUpdates.incrementAndGet() else failedOps.incrementAndGet()
        i += 1
      }
    }, "updater")

    val compactor = new Thread(() => {
      val t = table()
      var i = 0
      while (i < iters) {
        // MINOR over whatever small segments exist; losing the
        // optimistic publish is a legal outcome (returns None/aborts)
        try t.compact("MINOR", minorThreshold = 3)
        catch { case _: Throwable => () }
        Thread.sleep(50)
        i += 1
      }
    }, "compactor")

    val folder = new Thread(() => {
      val t = table()
      var i = 0
      while (i < iters) {
        try t.foldDeltas(minFraction = 0.05)
        catch { case _: Throwable => () }
        Thread.sleep(60)
        i += 1
      }
    }, "folder")

    val cleaner = new Thread(() => {
      val t = table()
      var i = 0
      while (i < iters) {
        try t.cleanFiles()
        catch { case _: Throwable => () }
        Thread.sleep(70)
        i += 1
      }
    }, "cleaner")

    def reader(name: String): Thread = new Thread(() => {
      val t = table()
      while (!stop.get()) {
        try {
          val n = t.read.count()
          tornCounts.add(n)
          // count-preserving updates/compactions/folds + Batch-sized
          // inserts: any legal snapshot is seedN + j*Batch
          if ((n - seedN) % Batch != 0 || n < seedN)
            readerErrors.add(s"$name saw torn count $n")
        } catch {
          case e: Throwable => readerErrors.add(s"$name: ${e.getClass.getSimpleName}")
        }
        Thread.sleep(20)
      }
    }, name)

    val writers = Seq(inserter("wa"), inserter("wb"), updater, compactor, folder, cleaner)
    val readers = Seq(reader("r1"), reader("r2"))
    (writers ++ readers).foreach(_.start())
    val deadline = System.currentTimeMillis() + 180 * 1000
    writers.foreach { w =>
      w.join(math.max(1, deadline - System.currentTimeMillis()))
      assert(!w.isAlive, s"writer ${w.getName} deadlocked (still alive at timeout)")
    }
    stop.set(true)
    readers.foreach(_.join(10000))

    val t = table()
    // no lost updates: every successful batch visible exactly once
    val tags = t.read.groupBy("tag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    okBatches.forEach { b =>
      val tag = s"${b._1}-${b._2}"
      assert(tags.get(tag).contains(Batch.toLong),
        s"insert batch $tag: expected $Batch rows visible, got ${tags.get(tag)}")
    }
    assert(tags("seed") == seedN)
    val expectedN = seedN + okBatches.size().toLong * Batch
    assert(t.read.count() == expectedN,
      s"final count ${t.read.count()} != seed + successful batches $expectedN")
    // update audit: each successful increment added exactly +1 to each
    // of the updKeys rows — compaction/fold must not double or drop any
    val vsum = t.read.filter(col("tag") === "seed" && col("k") < updKeys)
      .agg(sum(col("v"))).collect()(0).getDouble(0)
    assert(vsum == okUpdates.get().toDouble * updKeys,
      s"sum(v)=$vsum != successful-updates ${okUpdates.get()} x $updKeys keys " +
        "(a lost or doubled update)")
    assert(readerErrors.isEmpty, s"reader violations: $readerErrors")
    assert(tornCounts.size() > 10, "readers must have sampled during the mix")
    // starvation bound: with 8 in-spec retries per update the mix must
    // not systematically starve the updater
    assert(okUpdates.get() >= iters / 2,
      s"updater starved: ${okUpdates.get()}/$iters succeeded")
  }

  test("a crashed holder's stale lock is taken over under writer contention") {
    val dir = Files.createTempDirectory("graft_mwlock_").toString + "/t"
    val seed = spark.range(0, 100)
      .selectExpr("id AS k", "CAST(0.0 AS DOUBLE) AS v")
    val t = GraftTable.create(spark, dir, seed.schema)
    t.insert(seed)
    // simulate a writer killed while holding the table lock: the lock
    // file exists with an mtime past the staleness horizon
    val lock = java.nio.file.Paths.get(dir, "_meta", ".lock")
    java.nio.file.Files.createFile(lock)
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10 * 60 * 1000))
    // four writers racing the takeover: all must commit (no 60s
    // deadline trip), and the log must show every batch exactly once
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ws = (1 to 4).map { i =>
      new Thread(() => {
        try GraftTable.at(spark, dir).insert(
          spark.range(1000L * i, 1000L * i + 50)
            .selectExpr("id AS k", "CAST(1.0 AS DOUBLE) AS v"))
        catch { case e: Throwable => errs.add(e) }
      }, s"lw$i")
    }
    ws.foreach(_.start()); ws.foreach(_.join(90000))
    assert(ws.forall(!_.isAlive), "writer wedged on the stale lock")
    assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
    assert(t.read.count() == 100L + 4 * 50L)
    assert(!java.nio.file.Files.exists(lock), "lock must be released")
  }

  test("a PAUSED holder that lost its lock to takeover aborts its publish (fence, no lost update)") {
    val dir = Files.createTempDirectory("graft_fence_").toString + "/t"
    val seed = spark.range(0, 100)
      .selectExpr("id AS k", "CAST(0.0 AS DOUBLE) AS v")
    val t = GraftTable.create(spark, dir, seed.schema)
    t.insert(seed)
    val lock = java.nio.file.Paths.get(dir, "_meta", ".lock")
    val statusP = java.nio.file.Paths.get(dir, "_meta", "tablestatus.json")
    // Pause the committing writer inside its publish window (metadata
    // tmp written, rename pending — the meta.tmpWritten failpoint fires
    // on the committing thread) and simulate what a takeover does: the
    // stale horizon passes, a waiter reclaims the lock, acquires it with
    // its OWN token, and publishes an interleaved commit. A real foreign
    // writer can't run inside this JVM (the first lock layer is a
    // JVM-wide monitor), so the foreign commit is modeled as a direct
    // status rewrite under the foreign-owned lock — byte-for-byte what a
    // second PROCESS would leave on disk. The woken holder must FAIL its
    // fence check and abort, preserving the foreign commit.
    val fired = new AtomicInteger(0)
    var thrown: Throwable = null
    Failpoints.withHandler((point, path) => {
      if (point == "meta.tmpWritten" && path == dir && fired.incrementAndGet() == 1) {
        java.nio.file.Files.deleteIfExists(lock) // takeover reclaims...
        // (drop the checksum sidecar too — a real foreign hadoop writer
        // keeps it consistent; this simulation writes via raw nio)
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(dir, "_meta", "..lock.crc"))
        java.nio.file.Files.write(lock, "foreign-token".getBytes) // ...and re-acquires
        val st = new String(java.nio.file.Files.readAllBytes(statusP))
        java.nio.file.Files.write(statusP,
          st.replaceFirst(""""version"\s*:\s*(\d+)""", "\"version\" : 9999").getBytes)
      }
    }) {
      try GraftTable.at(spark, dir).insert(
        spark.range(5000, 5050).selectExpr("id AS k", "CAST(1.0 AS DOUBLE) AS v"))
      catch { case e: Throwable => thrown = e }
    }
    assert(fired.get() >= 1, "failpoint never fired")
    assert(thrown != null, "paused holder PUBLISHED after losing its lock — lost update")
    assert(thrown.isInstanceOf[ConcurrentMutationException],
      s"expected a loud fence abort, got $thrown")
    // the interleaved (foreign) commit survived untouched
    val after = new String(java.nio.file.Files.readAllBytes(statusP))
    assert(after.contains("\"version\" : 9999"),
      "the takeover writer's commit was erased by the paused holder")
    // and the aborted holder must NOT have released the foreign lock
    assert(new String(java.nio.file.Files.readAllBytes(lock)) == "foreign-token",
      "aborted holder deleted the new holder's live lock")
    java.nio.file.Files.deleteIfExists(lock)
  }

  test("a paused holder's aborted CLEAN FILES appends ZERO history entries (fenced ledger)") {
    // VERDICT r16 #1: pre-r17 the history append ran BEFORE the status
    // publish, so a holder that lost its lock to takeover recorded
    // retirements its aborted commit never made. Now the append is
    // fenced and ordered after the publish — the same takeover scenario
    // must leave the ledger untouched.
    val dir = Files.createTempDirectory("graft_histfence_").toString + "/t"
    val seed = spark.range(0, 100)
      .selectExpr("id AS k", "CAST(0.0 AS DOUBLE) AS v")
    val t = GraftTable.create(spark, dir, seed.schema,
      properties = Map("stale_inprogress_timeout_ms" -> "1"))
    t.insert(seed)
    // a crashed load's stale IN_PROGRESS reservation — CLEAN FILES will
    // decide to reclaim it (and would have appended it to history)
    t.layout.commit { st =>
      st.copy(segments = st.segments :+ graft.engine.format.SegmentMeta(
        st.nextSegmentId, graft.engine.format.SegmentStatus.InProgress,
        "parquet", Nil, 0, 0, Map.empty, Nil,
        createdAt = System.currentTimeMillis() - 60000))
    }
    val lock = java.nio.file.Paths.get(dir, "_meta", ".lock")
    val statusP = java.nio.file.Paths.get(dir, "_meta", "tablestatus.json")
    val fired = new AtomicInteger(0)
    var thrown: Throwable = null
    Failpoints.withHandler((point, path) => {
      if (point == "meta.tmpWritten" && path == dir && fired.incrementAndGet() == 1) {
        java.nio.file.Files.deleteIfExists(lock)
        java.nio.file.Files.write(lock, "foreign-token".getBytes)
        val st = new String(java.nio.file.Files.readAllBytes(statusP))
        java.nio.file.Files.write(statusP,
          st.replaceFirst(""""version"\s*:\s*(\d+)""", "\"version\" : 9999").getBytes)
      }
    }) {
      try t.cleanFiles()
      catch { case e: Throwable => thrown = e }
    }
    assert(fired.get() >= 1, "failpoint never fired")
    assert(thrown.isInstanceOf[ConcurrentMutationException],
      s"paused clean must abort loudly on the fence, got $thrown")
    assert(t.layout.readHistory().isEmpty,
      "the ABORTED clean appended history entries it never committed")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_meta", "history.jsonl")),
      "no ledger file may exist after an aborted clean")
    java.nio.file.Files.deleteIfExists(lock)
  }

  test("readHistory skips a torn line instead of breaking SHOW HISTORY") {
    val dir = Files.createTempDirectory("graft_histtorn_").toString + "/t"
    val seed = spark.range(0, 10).selectExpr("id AS k")
    val t = GraftTable.create(spark, dir, seed.schema)
    t.insert(seed)
    val entry = (i: Long) => graft.engine.format.SegmentMeta(
      i, graft.engine.format.SegmentStatus.MarkedForDelete,
      "parquet", Seq(s"p$i.parquet"), 1, 10, Map.empty, Nil,
      createdAt = 1700000000000L + i)
    t.layout.appendHistory(Seq(entry(1), entry(2)))
    // a writer killed mid-append leaves a torn trailing line; an older
    // interleaved append can also tear a MIDDLE line — inject both
    val hist = java.nio.file.Paths.get(dir, "_meta", "history.jsonl")
    java.nio.file.Files.write(hist,
      "{\"id\":77,\"status\":\"MARKED_FOR ".getBytes,
      java.nio.file.StandardOpenOption.APPEND)
    java.nio.file.Files.write(hist, "\n".getBytes,
      java.nio.file.StandardOpenOption.APPEND)
    t.layout.appendHistory(Seq(entry(3)))
    val got = t.layout.readHistory()
    assert(got.map(_.id).sorted == Seq(1L, 2L, 3L),
      s"torn line must be skipped, intact entries kept — got ids ${got.map(_.id)}")
  }

  test("heartbeat lease: a wedged holder stops renewing and its late publish aborts") {
    // advisor r16: an unbounded heartbeat kept a wedged-but-alive
    // holder's lock fresh forever — no takeover could ever fire. The
    // lease bounds renewals; past it the lock ages like a crashed
    // holder's and the fence turns the eventual late publish into a
    // loud abort instead of a lost update.
    System.setProperty("graft.lock.heartbeat.ms", "50")
    System.setProperty("graft.lock.lease.max.ms", "200")
    try {
      val dir = Files.createTempDirectory("graft_lease_").toString + "/t"
      val seed = spark.range(0, 10)
        .selectExpr("id AS k", "CAST(0.0 AS DOUBLE) AS v")
      val t = GraftTable.create(spark, dir, seed.schema)
      t.insert(seed)
      val lock = java.nio.file.Paths.get(dir, "_meta", ".lock")
      @volatile var thrown: Throwable = null
      val holder = new Thread(() => {
        try t.layout.commit { st =>
          Thread.sleep(1600) // "wedged" long past the 200ms lease
          st.copy(segments = st.segments.map(s => s.copy(createdAt = s.createdAt + 1)))
        } catch { case e: Throwable => thrown = e }
      })
      holder.start()
      // the lock must go stale-looking once the lease is spent
      var maxAge = 0L
      val t0 = System.currentTimeMillis()
      while (holder.isAlive && maxAge < 600 &&
          System.currentTimeMillis() - t0 < 1400) {
        if (java.nio.file.Files.exists(lock)) {
          try maxAge = math.max(maxAge, System.currentTimeMillis() -
            java.nio.file.Files.getLastModifiedTime(lock).toMillis)
          catch { case _: java.io.IOException => }
        }
        Thread.sleep(25)
      }
      assert(maxAge >= 600,
        s"lock never aged past the lease (max age $maxAge ms) — renewals unbounded?")
      // ...so a foreign waiter's takeover can now fire; simulate it
      java.nio.file.Files.write(lock, "foreign-token".getBytes)
      holder.join(10000)
      assert(!holder.isAlive)
      assert(thrown.isInstanceOf[ConcurrentMutationException],
        s"the lease-expired holder must abort its publish, got $thrown")
      java.nio.file.Files.deleteIfExists(lock)
    } finally {
      System.clearProperty("graft.lock.heartbeat.ms")
      System.clearProperty("graft.lock.lease.max.ms")
    }
  }

  test("a slow heartbeat target on one table cannot starve another table's heartbeat") {
    // VERDICT r16 #6: the heartbeat scheduler is shared — a single
    // setTimes stalling on a slow metadata store must not delay every
    // other table's renewals past the stale horizon. The pool is sized
    // 4; this pins the independence with an injected 400ms stall.
    System.setProperty("graft.lock.heartbeat.ms", "100")
    try {
      val root = Files.createTempDirectory("graft_hbpool_")
      val seed = spark.range(0, 10).selectExpr("id AS k")
      val ta = GraftTable.create(spark, s"$root/a", seed.schema)
      val tb = GraftTable.create(spark, s"$root/b", seed.schema)
      ta.insert(seed); tb.insert(seed)
      val lockB = java.nio.file.Paths.get(s"$root/b", "_meta", ".lock")
      var maxAgeB = 0L
      var samples = 0
      Failpoints.withHandler((point, path) => {
        if (point == "lock.heartbeat" && path == s"$root/a")
          Thread.sleep(400) // table A's metadata store is molasses
      }) {
        val holderA = new Thread(() =>
          ta.layout.commit { st => Thread.sleep(2000); st })
        val holderB = new Thread(() =>
          tb.layout.commit { st => Thread.sleep(2000); st })
        holderA.start(); holderB.start()
        while (holderB.isAlive) {
          if (java.nio.file.Files.exists(lockB)) {
            try {
              maxAgeB = math.max(maxAgeB, System.currentTimeMillis() -
                java.nio.file.Files.getLastModifiedTime(lockB).toMillis)
              samples += 1
            } catch { case _: java.io.IOException => }
          }
          Thread.sleep(40)
        }
        holderA.join(10000); holderB.join(10000)
      }
      assert(samples > 10, "never observed table B's held lock")
      assert(maxAgeB < 1000,
        s"table B's lock went ${maxAgeB}ms unrenewed while table A's " +
          "heartbeat target stalled — shared-scheduler starvation")
    } finally System.clearProperty("graft.lock.heartbeat.ms")
  }

  test("heartbeat keeps a slow LIVE holder's lock fresh (never reclaimable)") {
    System.setProperty("graft.lock.heartbeat.ms", "100")
    try {
      val dir = Files.createTempDirectory("graft_hb_").toString + "/t"
      val seed = spark.range(0, 10)
        .selectExpr("id AS k", "CAST(0.0 AS DOUBLE) AS v")
      val t = GraftTable.create(spark, dir, seed.schema)
      t.insert(seed)
      val lock = java.nio.file.Paths.get(dir, "_meta", ".lock")
      // a commit whose critical section takes 2s (a clean walking slow
      // storage): sample the lock-file age throughout — the heartbeat
      // must keep it far below any plausible stale horizon, so a
      // foreign reclaimer can never see a live holder as crashed
      val holder = new Thread(() =>
        t.layout.commit { st => Thread.sleep(2000); st })
      holder.start()
      var maxAge = 0L
      var samples = 0
      while (holder.isAlive) {
        if (java.nio.file.Files.exists(lock)) {
          try {
            val age = System.currentTimeMillis() -
              java.nio.file.Files.getLastModifiedTime(lock).toMillis
            maxAge = math.max(maxAge, age); samples += 1
          } catch { case _: java.io.IOException => } // racing release
        }
        Thread.sleep(40)
      }
      holder.join(5000)
      assert(samples > 10, "never observed the held lock")
      assert(maxAge < 1000,
        s"lock went ${maxAge}ms without a heartbeat touch — a live holder " +
          "doing long work would be reclaimed as crashed")
    } finally System.clearProperty("graft.lock.heartbeat.ms")
  }
}
