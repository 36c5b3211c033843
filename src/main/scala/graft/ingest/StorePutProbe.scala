package graft.ingest

import graft.ingest.PushTableSink.{CellPut, TableSpec}
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Micro-probe for the store WRITE path (no Spark): times putBatch of N
  * same-shard cells (the q221 seed shape — every 'u-…' rowkey shares
  * its first byte, so one region absorbs the whole wave) and the
  * region-local minor merge that follows. Pinpoints which store phase a
  * 1-task 6-second seed job actually spends its time in. */
object StorePutProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1500
    // optional capped-table shape: maxVersions cap + versions per key
    // (the q256 read-time-retention workload class) — 0/absent keeps
    // the original uncapped single-version wave
    val maxVersions = if (args.length > 1) args(1).toInt else 0
    val versionsPerKey = if (args.length > 2) args(2).toInt else 1
    val spec =
      if (maxVersions > 0) TableSpec(maxVersions = maxVersions) else TableSpec()
    val root = Files.createTempDirectory("graft-putprobe").toString
    val store = FileStore(root)
    store.ensureTable("t", spec)
    val cells = (1 to n).map { i =>
      val body = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i-S".getBytes("UTF-8"))
      CellPut("t", s"u-${i / versionsPerKey}".getBytes("UTF-8"), i.toLong, body)
    }
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what%-28s ${(System.nanoTime() - t0) / 1e6}%9.1f ms")
      r
    }
    time(s"putBatch x$n (cold)") { store.putBatch("t", cells) }
    val root2 = Files.createTempDirectory("graft-putprobe2").toString
    val store2 = FileStore(root2)
    store2.ensureTable("t", spec)
    time(s"putBatch x$n (2nd jvm-warm)") { store2.putBatch("t", cells) }
    // derive the wave's single shard from the layout instead of
    // hardcoding its name (ADVICE r17) — every 'u-…' key shares a first
    // byte, so each table root holds exactly one shard dir
    def soleShard(root: String): java.nio.file.Path = {
      val s = Files.list(java.nio.file.Paths.get(root, "t"))
      try s.iterator().asScala.filter(Files.isDirectory(_)).toSeq match {
        case Seq(one) => one
        case other => sys.error(s"expected one shard, saw $other")
      } finally s.close()
    }
    time("minorShard (1500 puts)") {
      Compaction.minorShard(soleShard(root2), Long.MaxValue)
    }
    // per-piece timing of one cell write, broken into syscalls
    val dir = soleShard(root)
    time("1000x keyDigest") { (1 to 1000).foreach(i => FileStore.keyDigest(cells(i % n).rowkey)) }
    time("1000x createTempFile+write+move") {
      (1 to 1000).foreach { i =>
        val tmp = Files.createTempFile(dir, "probe", ".tmp")
        Files.write(tmp, Array.fill(32)(i.toByte))
        Files.move(tmp, dir.resolve(s"probe.$i"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root2))
  }
}
