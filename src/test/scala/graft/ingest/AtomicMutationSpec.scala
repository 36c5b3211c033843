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
}
