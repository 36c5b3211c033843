package graft.ingest

import graft.ingest.PushTableSink.{CellPut, TableSpec}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ATOMIC ROW VERBS ([[FileStore.checkAndPut]] / [[FileStore.increment]]
  * over [[FileStore.getLatest]]): CAS semantics against the masked
  * latest, counter init/format rules, thread-level atomicity, and the
  * serving-read composition (masks, retention, precedence). */
class AtomicMutationSpec extends AnyFunSuite {

  private def fresh(): (String, FileStore) = {
    val root = Files.createTempDirectory("atomic-spec").toString
    val store = FileStore(root)
    store.ensureTable("t", TableSpec(compactionThreshold = 0))
    (root, store)
  }

  test("getLatest: masked serving read across store-file kinds and precedence") {
    val (root, store) = fresh()
    val k = "key".getBytes
    assert(store.getLatest("t", k).isEmpty)
    store.putBatch("t", Seq(CellPut("t", k, 1L, "v1".getBytes)))
    store.putBatch("t", Seq(CellPut("t", k, 2L, "v2".getBytes)))
    assert(store.getLatest("t", k).map { case (v, b) => (v, new String(b)) }
      .contains((2L, "v2")))
    // a bound marker masks v2: the serving read falls back to... both
    // masked (<= 2 masks v1 too) — absent
    store.deleteCells("t", Seq((k, 2L)))
    assert(store.getLatest("t", k).isEmpty)
    // a fresh put above the mask serves again
    store.putBatch("t", Seq(CellPut("t", k, 3L, "v3".getBytes)))
    assert(store.getLatest("t", k).map(p => new String(p._2)).contains("v3"))
    // segment copies participate: flush the shard, same answer
    Compaction.minorShard(java.nio.file.Paths.get(root, "t",
      FileStore.shardOf(k)), Long.MaxValue)
    assert(store.getLatest("t", k).map(p => new String(p._2)).contains("v3"))
  }

  test("checkAndPut: expect-absent, expect-value, and mismatch") {
    val (_, store) = fresh()
    val k = "cas".getBytes
    assert(store.checkAndPut("t", k, None, 1L, "a".getBytes))
    assert(!store.checkAndPut("t", k, None, 2L, "b".getBytes), "key now exists")
    assert(!store.checkAndPut("t", k, Some("wrong".getBytes), 2L, "b".getBytes))
    assert(store.checkAndPut("t", k, Some("a".getBytes), 2L, "b".getBytes))
    assert(store.getLatest("t", k).map(p => new String(p._2)).contains("b"))
    // a delete mask makes the key read as absent — expect-absent wins
    store.deleteCells("t", Seq((k, 2L)))
    assert(store.checkAndPut("t", k, None, 3L, "reborn".getBytes))
  }

  test("increment: init-at-zero, format guard, strictly increasing versions") {
    val (_, store) = fresh()
    val k = "ctr".getBytes
    assert(store.increment("t", k, 5L) == 5L)
    assert(store.increment("t", k, -2L) == 3L)
    val (v1, b) = store.getLatest("t", k).get
    assert(java.nio.ByteBuffer.wrap(b).getLong == 3L)
    assert(store.increment("t", k, 0L) == 3L)
    val (v2, _) = store.getLatest("t", k).get
    assert(v2 > v1, "each increment lands a strictly newer version")
    // a non-counter body refuses arithmetic loudly
    val tk = "text".getBytes
    store.putBatch("t", Seq(CellPut("t", tk, 1L, "hello".getBytes)))
    intercept[IllegalArgumentException](store.increment("t", tk, 1L))
  }

  test("64 racing increments across threads lose no update") {
    val (root, _) = fresh()
    val k = "hot".getBytes
    val threads = (1 to 64).map { i =>
      new Thread(() => { FileStore(root).increment("t", k, i.toLong); () })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val got = java.nio.ByteBuffer.wrap(FileStore(root).getLatest("t", k).get._2).getLong
    assert(got == (1 to 64).map(_.toLong).sum, s"lost updates: $got")
  }

  test("32 racing CAS from one expected value admit exactly one winner") {
    val (root, _) = fresh()
    val k = "one".getBytes
    assert(FileStore(root).checkAndPut("t", k, None, 1L, "init".getBytes))
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 32).map { i =>
      new Thread(() => {
        if (FileStore(root).checkAndPut("t", k, Some("init".getBytes),
          100L + i, s"w$i".getBytes)) wins.incrementAndGet()
        ()
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(wins.get() == 1, s"${wins.get()} CAS winners")
  }

  test("version-defaulted checkAndPut always becomes the serving latest — future-dated tables included (ADVICE r16)") {
    val (_, store) = fresh()
    val k = "fut".getBytes
    val future = System.currentTimeMillis() + 1000L * 86400 * 365
    store.putBatch("t", Seq(CellPut("t", k, future, "old".getBytes)))
    // the defaulted version must outrank the future-dated serving cell
    assert(store.checkAndPut("t", k, Some("old".getBytes), "new".getBytes))
    assert(store.getLatest("t", k).map(p => new String(p._2)).contains("new"),
      "applied=true must mean the CAS result SERVES")
    // the closed loophole: a second CAS against the old body must fail
    assert(!store.checkAndPut("t", k, Some("old".getBytes), "stale".getBytes))
    assert(store.checkAndPut("t", k, Some("new".getBytes), "newer".getBytes))
    // the EXPLICIT-version face keeps the HBase put-with-timestamp
    // contract: applies at that coordinate, serving unchanged
    assert(store.checkAndPut("t", k, Some("newer".getBytes), 1L, "ancient".getBytes))
    assert(store.getLatest("t", k).map(p => new String(p._2)).contains("newer"))
  }

  test("checkAndDelete: expect-value match deletes the row; mismatch leaves it; future-dated serving masked") {
    val (_, store) = fresh()
    val k = "cad".getBytes
    // expect-absent on an absent key: vacuous true, nothing written
    assert(store.checkAndDelete("t", k, None))
    assert(store.getLatest("t", k).isEmpty)
    store.putBatch("t", Seq(CellPut("t", k, 1L, "a".getBytes)))
    store.putBatch("t", Seq(CellPut("t", k, 2L, "b".getBytes)))
    assert(!store.checkAndDelete("t", k, Some("wrong".getBytes)))
    assert(store.getLatest("t", k).map(p => new String(p._2)).contains("b"))
    assert(!store.checkAndDelete("t", k, None), "key exists — expect-absent fails")
    assert(store.checkAndDelete("t", k, Some("b".getBytes)))
    assert(store.getLatest("t", k).isEmpty, "the row delete masks every version")
    // future-dated serving cell: the tombstone must still mask it
    val future = System.currentTimeMillis() + 1000L * 86400 * 365
    val k2 = "cad2".getBytes
    store.putBatch("t", Seq(CellPut("t", k2, future, "f".getBytes)))
    assert(store.checkAndDelete("t", k2, Some("f".getBytes)))
    assert(store.getLatest("t", k2).isEmpty)
  }

  test("32 racing checkAndDelete admit exactly one winner") {
    val (root, _) = fresh()
    val k = "cad-race".getBytes
    assert(FileStore(root).checkAndPut("t", k, None, "init".getBytes))
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 32).map { _ =>
      new Thread(() => {
        if (FileStore(root).checkAndDelete("t", k, Some("init".getBytes)))
          wins.incrementAndGet()
        ()
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(wins.get() == 1, s"${wins.get()} delete winners")
    assert(FileStore(root).getLatest("t", k).isEmpty)
  }

  test("append: init-from-empty, byte concatenation, racing appends lose no token") {
    val (root, store) = fresh()
    val k = "app".getBytes
    assert(new String(store.append("t", k, "ab".getBytes)) == "ab")
    assert(new String(store.append("t", k, "cd".getBytes)) == "abcd")
    assert(store.getLatest("t", k).map(p => new String(p._2)).contains("abcd"))
    // future-dated base: the append must still become serving
    val k2 = "app2".getBytes
    val future = System.currentTimeMillis() + 1000L * 86400 * 365
    store.putBatch("t", Seq(CellPut("t", k2, future, "X".getBytes)))
    assert(new String(store.append("t", k2, "Y".getBytes)) == "XY")
    assert(store.getLatest("t", k2).map(p => new String(p._2)).contains("XY"))
    // 16 racing appends of distinct tokens: all present, none lost
    val k3 = "app3".getBytes
    val threads = (0 until 16).map { i =>
      new Thread(() => { FileStore(root).append("t", k3, f"<$i%02d>".getBytes); () })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val body = new String(FileStore(root).getLatest("t", k3).get._2)
    assert(body.length == 16 * 4, s"lost appends: '$body'")
    (0 until 16).foreach(i => assert(body.contains(f"<$i%02d>"), s"missing token $i"))
  }

  test("retention composes: a capped key's hidden history never serves the comparison") {
    val root = Files.createTempDirectory("atomic-ret").toString
    val store = FileStore(root)
    store.ensureTable("r", TableSpec(maxVersions = 1, compactionThreshold = 0))
    val k = "capk".getBytes
    store.putBatch("r", Seq(CellPut("r", k, 1L, "old".getBytes)))
    store.putBatch("r", Seq(CellPut("r", k, 2L, "new".getBytes)))
    // cap 1: only 'new' is the servable latest
    assert(store.getLatest("r", k).map(p => new String(p._2)).contains("new"))
    assert(!store.checkAndPut("r", k, Some("old".getBytes), 3L, "x".getBytes))
    assert(store.checkAndPut("r", k, Some("new".getBytes), 3L, "x".getBytes))
  }

  test("serving-read lock scope is the REGION, not the table (r16 verdict note): " +
    "another region's maintenance never blocks getLatest; its own does") {
    val (root, store) = fresh()
    val kA = "A-key".getBytes; val kB = "B-key".getBytes
    store.putBatch("t", Seq(CellPut("t", kA, 1L, "va".getBytes)))
    store.putBatch("t", Seq(CellPut("t", kB, 1L, "vb".getBytes)))
    val shardA = java.nio.file.Paths.get(root, "t", FileStore.shardOf(kA))
    val shardB = java.nio.file.Paths.get(root, "t", FileStore.shardOf(kB))
    assert(shardA != shardB, "fixture keys must land in different regions")
    val release = new java.util.concurrent.CountDownLatch(1)
    val held = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => FileStore.shardLockFor(shardA).synchronized {
      held.countDown(); release.await()
    })
    holder.start(); held.await()
    try {
      // cross-region independence: region A's maintenance monitor is
      // held, yet a point read in region B completes — under the old
      // table-WIDE write lock discipline this scope distinction did
      // not exist (any churn exclusion was global)
      val bDone = new java.util.concurrent.CountDownLatch(1)
      new Thread(() => {
        assert(store.getLatest("t", kB).map(p => new String(p._2)).contains("vb"))
        bDone.countDown()
      }).start()
      assert(bDone.await(10, java.util.concurrent.TimeUnit.SECONDS),
        "a point read must not wait on another region's maintenance")
      // own-region exclusion: the same read in region A blocks until
      // the monitor releases (the flush-churn exclusion that makes the
      // CAS comparison sound)
      val aResult = new java.util.concurrent.atomic.AtomicReference[String]()
      val aDone = new java.util.concurrent.CountDownLatch(1)
      val aReader = new Thread(() => {
        aResult.set(store.getLatest("t", kA).map(p => new String(p._2)).orNull)
        aDone.countDown()
      })
      aReader.start()
      assert(!aDone.await(300, java.util.concurrent.TimeUnit.MILLISECONDS),
        "a point read must wait out its OWN region's maintenance")
      release.countDown()
      assert(aDone.await(10, java.util.concurrent.TimeUnit.SECONDS))
      assert(aResult.get() == "va")
    } finally { release.countDown(); holder.join() }
  }

  test("atomic verbs stay exact under SAME-region flush churn (the narrowed lock's safety pin: " +
    "counter keys and churn keys share first byte 'c', so every churn flush contends the counters' monitor)") {
    val root = Files.createTempDirectory("atomic-churn").toString
    val store = FileStore(root)
    // threshold 1: EVERY putBatch flushes its shard — maximum churn
    store.ensureTable("c", TableSpec(compactionThreshold = 1))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    // churn thread: hammer puts (and hence flushes + tier merges) into
    // OTHER regions while counters run
    val churn = new Thread(() => {
      var i = 0L
      while (!stop.get()) {
        store.putBatch("c", (0 until 4).map(j =>
          CellPut("c", s"churn-$j-${i % 7}".getBytes, i + 2, s"b$i".getBytes)))
        i += 1
      }
    })
    churn.start()
    try {
      val keys = (0 until 8).map(i => s"ctr-$i".getBytes)
      val threads = (0 until 32).map { t =>
        new Thread(() => {
          (0 until 25).foreach { i =>
            store.increment("c", keys((t + i) % 8), 1L); ()
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val total = keys.map { k =>
        val b = store.getLatest("c", k).get._2
        java.nio.ByteBuffer.wrap(b).getLong
      }.sum
      assert(total == 32L * 25, s"lost updates under churn: $total")
    } finally { stop.set(true); churn.join() }
  }
}
