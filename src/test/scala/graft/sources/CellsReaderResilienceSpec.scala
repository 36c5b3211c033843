package graft.sources

import graft.ingest.{CellSegment, FileStore}
import graft.ingest.PushTableSink.{CellPut, TableSpec}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Vanish-resilient shard reader (r15): automatic maintenance deletes
  * absorbed inputs only AFTER their merge output renamed in, and a
  * reader that listed the OLD file set recovers by rebuilding from a
  * fresh listing with its emitted-identity set preserved — every cell
  * exactly once, no task abort. (On a cluster this is what a task
  * retry gives; the in-place rebuild makes local mode and half-drained
  * streams converge identically.) */
class CellsReaderResilienceSpec extends AnyFunSuite {

  test("a segment vanishing mid-scan (merged away) neither loses nor duplicates cells") {
    val root = Files.createTempDirectory("reader-resilience").toString
    try {
      val store = FileStore(root)
      store.ensureTable("t", TableSpec(compactionThreshold = 0))
      // shard 'Q'/'R'/'Z' all start at different bytes — put keys and
      // segment keys must share ONE shard, so prefix everything 'K'
      store.putBatch("t", (0 until 5).map(i =>
        CellPut("t", s"KQ-$i".getBytes("UTF-8"), 1L, s"q-$i".getBytes("UTF-8"))))
      val shard = Paths.get(root, "t", "4b") // 'K' = 0x4b
      val segCells = (0 until 10).map(i =>
        (s"KR-$i".getBytes("UTF-8"), 1L, s"r-$i".getBytes("UTF-8")))
      val s1 = CellSegment.write(shard, segCells.iterator, seqNo = 1L)

      val r = CellsReaders.reader(shard.toString, Long.MinValue, Long.MaxValue,
        CellsKeyPred.All, Array("rowkey", "version", "body"))
      def pull(): (String, String) = {
        assert(r.next())
        val row = r.get()
        (new String(row.getBinary(0), "UTF-8"), new String(row.getBinary(2), "UTF-8"))
      }
      // the put phase drains first — 5 rows out, identities recorded
      val putRows = (0 until 5).map(_ => pull()).toSet
      assert(putRows == (0 until 5).map(i => (s"KQ-$i", s"q-$i")).toSet)

      // MAINTENANCE RACES IN: a merge absorbs the segment plus one new
      // cell into a fresh higher-seq output, then deletes the input —
      // exactly the tier merge's publish-then-sweep order
      val merged = CellSegment.write(shard,
        (segCells :+ (("KZ-new".getBytes("UTF-8"), 1L, "z".getBytes("UTF-8")))).iterator,
        seqNo = 2L)
      assert(merged.fileName != s1.fileName)
      Files.delete(shard.resolve(s1.fileName))

      // the reader's snapshot still names the vanished segment: the
      // wrapper rebuilds off the fresh listing and finishes the scan
      val rest = Iterator.continually(if (r.next()) Some(r.get()) else None)
        .takeWhile(_.isDefined).flatten
        .map(row => (new String(row.getBinary(0), "UTF-8"),
          new String(row.getBinary(2), "UTF-8")))
        .toVector
      assert(rest.size == 11, s"10 segment cells + the merge's new one, got ${rest.size}")
      assert(rest.toSet ==
        ((0 until 10).map(i => (s"KR-$i", s"r-$i")).toSet + (("KZ-new", "z"))))
      // exactly-once overall: no put identity re-emitted after rebuild
      assert((putRows.map(_._1) intersect rest.map(_._1).toSet).isEmpty)
      r.close()
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("$latest across a rebuild stays per-key at-most-once even when winners advance") {
    val root = Files.createTempDirectory("reader-latest-resilience").toString
    try {
      val store = FileStore(root)
      store.ensureTable("t", TableSpec(compactionThreshold = 0))
      val shard = Paths.get(root, "t", "4b") // every key starts 'K'
      def cells(ids: Range, v: Long) = ids.map(i =>
        (s"K-$i".getBytes("UTF-8"), v, s"b$v-$i".getBytes("UTF-8")))
      // S1 (seq 2) processed first by the newest-first order; S2 (seq 1)
      // is the one maintenance will merge away mid-scan
      CellSegment.write(shard, cells(0 until 5, 1L).iterator, seqNo = 2L)
      val s2 = CellSegment.write(shard, cells(5 until 10, 1L).iterator, seqNo = 1L)

      val r = CellsReaders.reader(shard.toString, Long.MinValue, Long.MaxValue,
        CellsKeyPred.All, Array("rowkey", "version", "body"), latestOnly = true)
      val first = (0 until 3).map { _ =>
        assert(r.next()); new String(r.get().getBinary(0), "UTF-8")
      }.toSet
      // maintenance: a merge output carries S2's cells PLUS every key
      // at a NEWER version (winners advance under the reader), then
      // the input vanishes
      val mergedCells = (cells(5 until 10, 1L) ++ cells(0 until 10, 2L))
        .sortWith { (a, b) =>
          val c = java.util.Arrays.compareUnsigned(a._1, b._1)
          if (c != 0) c < 0 else a._2 < b._2
        }
      CellSegment.write(shard, mergedCells.iterator, seqNo = 3L)
      Files.delete(shard.resolve(s2.fileName))

      val rest = Iterator.continually(if (r.next()) Some(r.get()) else None)
        .takeWhile(_.isDefined).flatten
        .map(row => new String(row.getBinary(0), "UTF-8")).toVector
      r.close()
      val all = first.toSeq ++ rest
      assert(all.size == 10 && all.distinct.size == 10,
        s"one row per key, never a stale+fresh pair: ${all.sorted}")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
