package graft.ingest

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.nio.file.{Files, Path, StandardCopyOption}
import java.security.MessageDigest

/** The sorted cell SEGMENT file — this store's HFile analog, produced
  * by [[BulkLoad]] and merged into every read face alongside the
  * per-cell put files.
  *
  * One segment holds the cells of ONE (table, shard) range, sorted by
  * (rowkey unsigned-lexicographic, version) — the same order Spark's
  * BinaryType comparisons and the connector's range re-check use, so a
  * range scan can stream a segment without re-sorting. Layout:
  *
  * {{{
  *   data  : entry*            entry  = [keyLen:4][key][version:8][bodyLen:4][body]
  *   index : ientry*           ientry = [sha256(key):32][version:8][entryOffset:8]
  *   bloom : [bitCount:8][word:8 × bitCount/64]
  *   trailer (52 bytes)        [indexOffset:8][bloomOffset:8][entryCount:4]
  *                             [distinctKeys:4][seqNo:8]
  *                             [minVersion:8][maxVersion:8][magic:4]
  * }}}
  *
  * All integers big-endian. The index carries the SAME key digest the
  * per-cell filenames use ([[FileStore.keyDigest]]), so existence
  * probes (F5) and the connector's point-lookup pruning resolve
  * against a segment WITHOUT touching its data region, exactly as they
  * resolve against per-cell filenames without opening the files; the
  * trailer's version bounds give the segment-level analog of the
  * filename version prune (a time-travel slice skips whole segments).
  * Segments are immutable once placed (rename-only lifecycle), so
  * loaded indexes are cacheable per JVM forever.
  *
  * The bloom block is a ROW bloom over the segment's DISTINCT key
  * digests (~10 bits/key, 7 probes ⇒ ≈1% false positives) — the HBase
  * ROW BloomFilter: a point GET or existence probe tests ~1.25 B/key
  * of bloom before paying the 48 B/entry index load, so at 100 TB —
  * where a shard accumulates many segments between majors and the
  * index cache can't hold them all — an absent-key probe (the common
  * ingest-F5 case) touches NO index at all on ~99% of segments. The
  * bloom hashes the sha256 digest itself (two of its words,
  * Kirsch-Mitzenmacher double hashing), so no extra hashing of keys
  * anywhere.
  *
  * Reference analog: the bulk-load posture of HbaseClient.kt:31-36
  * (SKIP_WAL heavy ingest) — HBase's real answer to that posture is
  * writing HFiles directly and handing them to the region server,
  * which is the shape this file implements for the sandbox store.
  */
object CellSegment {

  val Magic: Int = 0x47534533 // "GSE3" (v3: v2 + trailer stats and sequence number)
  private val MagicV2: Int = 0x47534532 // "GSE2" — recognized only to fail loudly
  val TrailerLen: Int = 52 // indexOffset:8 + bloomOffset:8 + entryCount:4 + distinctKeys:4 + seqNo:8 + minV:8 + maxV:8 + magic:4
  private val IndexEntryLen = 48
  private val BloomBitsPerKey = 10
  private val BloomProbes = 7

  final case class Meta(fileName: String, entryCount: Int, minVersion: Long,
                        maxVersion: Long, dataBytes: Long, distinctKeys: Int = 0,
                        seqNo: Long = 0L)

  final case class IndexEntry(digestHex: String, version: Long, offset: Long)

  /** GSE3 trailer: alongside the v2 prune bounds it carries the
    * STATISTICS the planner wants without an index walk —
    * `distinctKeys` (the segment's key cardinality, the $latest face's
    * row-count unit) and `indexOffset` (the data-region byte size) —
    * plus `seqNo`, the HBase max-sequence-id analog: segments of one
    * shard are totally ordered by (seqNo, name), and read faces give a
    * NEWER segment's body precedence at a colliding (rowkey, version)
    * identity (in-place SQL UPDATE is what makes collisions with
    * different bodies legal across store files). */
  final case class Trailer(indexOffset: Long, bloomOffset: Long, entryCount: Int,
                           minVersion: Long, maxVersion: Long,
                           distinctKeys: Int = 0, seqNo: Long = 0L)

  /** ROW bloom over key digests. `words` is the bit array; probes are
    * the Kirsch-Mitzenmacher composite h1 + i·h2 of the digest's own
    * first two big-endian words — sha256 output is uniform, so no
    * further mixing is needed. */
  final case class Bloom(words: Array[Long]) {
    private val bits = words.length.toLong * 64
    // h1/h2 parsed ONCE per probe call, not once per probe BIT: the
    // absent-key fast path this bloom exists for would otherwise spend
    // 14 hex parses per mightContain — string work on the path that is
    // supposed to cost ~1.25 B/key of bit tests
    def add(digestHex: String): Unit = {
      val h1 = java.lang.Long.parseUnsignedLong(digestHex.substring(0, 16), 16)
      val h2 = java.lang.Long.parseUnsignedLong(digestHex.substring(16, 32), 16)
      var i = 0
      while (i < BloomProbes) {
        val b = java.lang.Long.remainderUnsigned(h1 + i * h2, bits)
        words((b >>> 6).toInt) |= 1L << (b & 63)
        i += 1
      }
    }
    def mightContain(digestHex: String): Boolean = {
      val h1 = java.lang.Long.parseUnsignedLong(digestHex.substring(0, 16), 16)
      val h2 = java.lang.Long.parseUnsignedLong(digestHex.substring(16, 32), 16)
      var i = 0
      while (i < BloomProbes) {
        val b = java.lang.Long.remainderUnsigned(h1 + i * h2, bits)
        if ((words((b >>> 6).toInt) & (1L << (b & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  private def emptyBloom(distinctKeys: Int): Bloom =
    Bloom(new Array[Long](math.max(1, (distinctKeys.toLong * BloomBitsPerKey + 63) / 64).toInt))

  /** Write one segment from (key, version, body) triples ALREADY sorted
    * by (key, version). The file is staged under `dir` with a temp name,
    * then renamed to its content-deterministic final name
    * `bulk-<sha256(data)[0,16]>.seg` — identical input produces an
    * identical file AND identical name, which is what makes a replayed
    * bulk load (task retry, speculation, whole-job re-run) converge by
    * REPLACE_EXISTING rename instead of duplicating state.
    *
    * Exact (key, version) duplicates are collapsed (they are one cell —
    * the F5 identity); a duplicate with a DIFFERENT body is a corrupt
    * input and throws, because silently picking one would be a
    * nondeterministic store.
    */
  /** `seqNo` is the segment's shard-local sequence number (precedence
    * rank for colliding identities — see [[Trailer]]); it lives in the
    * TRAILER, outside the content hash that names the file, so a
    * replayed load regenerates the same NAME and data region and the
    * REPLACE_EXISTING flip still converges (a replay can only advance
    * the precedence of identical content). */
  def write(dir: Path, entries: Iterator[(Array[Byte], Long, Array[Byte])],
            seqNo: Long = 0L): Meta = {
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, "bulkstage", ".tmp")
    val digest = MessageDigest.getInstance("SHA-256")
    val index = Vector.newBuilder[IndexEntry]
    // distinct key digests for the ROW bloom — input is key-sorted, so
    // a key's digest repeats only consecutively (one entry per key)
    val bloomKeys = Vector.newBuilder[String]
    var bloomKeyCount = 0
    var count = 0
    var minV = Long.MaxValue
    var maxV = Long.MinValue
    var offset = 0L
    var prevKey: Array[Byte] = null
    var prevVersion = 0L
    var prevBody: Array[Byte] = null
    val out = new DataOutputStream(new BufferedOutputStream(Files.newOutputStream(tmp), 1 << 16))
    try {
      entries.foreach { case (key, version, body) =>
        val dup = prevKey != null && prevVersion == version && java.util.Arrays.equals(prevKey, key)
        if (dup) {
          require(java.util.Arrays.equals(prevBody, body),
            s"bulk segment: two bodies for one (rowkey, version) cell at version $version")
        } else {
          val entryLen = 4 + key.length + 8 + 4 + body.length
          out.writeInt(key.length); out.write(key)
          out.writeLong(version)
          out.writeInt(body.length); out.write(body)
          // the running content hash that names the file
          digest.update(java.nio.ByteBuffer.allocate(16).putInt(key.length).putLong(version).putInt(body.length).array())
          digest.update(key); digest.update(body)
          val keyHex = FileStore.keyDigest(key)
          if (prevKey == null || !java.util.Arrays.equals(prevKey, key)) {
            bloomKeys += keyHex; bloomKeyCount += 1
          }
          index += IndexEntry(keyHex, version, offset)
          offset += entryLen
          count += 1
          if (version < minV) minV = version
          if (version > maxV) maxV = version
          prevKey = key; prevVersion = version; prevBody = body
        }
      }
      val indexOffset = offset
      index.result().foreach { e =>
        out.write(hexToBytes(e.digestHex))
        out.writeLong(e.version)
        out.writeLong(e.offset)
      }
      val bloomOffset = indexOffset + count.toLong * IndexEntryLen
      val bloom = emptyBloom(bloomKeyCount)
      bloomKeys.result().foreach(bloom.add)
      out.writeLong(bloom.words.length.toLong * 64)
      bloom.words.foreach(out.writeLong)
      out.writeLong(indexOffset)
      out.writeLong(bloomOffset)
      out.writeInt(count)
      out.writeInt(bloomKeyCount)
      out.writeLong(seqNo)
      out.writeLong(if (count == 0) 0L else minV)
      out.writeLong(if (count == 0) 0L else maxV)
      out.writeInt(Magic)
    } finally out.close()
    val name = "bulk-" + digest.digest().take(8).map(b => f"$b%02x").mkString + ".seg"
    Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    Meta(name, count, if (count == 0) 0L else minV, if (count == 0) 0L else maxV, offset,
      bloomKeyCount, seqNo)
  }

  def isSegment(fileName: String): Boolean =
    fileName.startsWith("bulk-") && fileName.endsWith(".seg")

  /** Positional read that LOOPS until the buffer fills — a bare
    * FileChannel.read may return short (interrupted reads, network
    * filesystems, multi-MB index buffers) and a short-read parse would
    * silently yield garbage index entries instead of failing loudly.
    * EOF before the buffer fills throws. */
  private def readFully(ch: java.nio.channels.FileChannel, buf: java.nio.ByteBuffer, pos: Long): Unit = {
    var p = pos
    while (buf.hasRemaining) {
      val n = ch.read(buf, p)
      require(n >= 0, s"cell segment truncated: EOF at offset $p with ${buf.remaining} bytes missing")
      p += n
    }
  }

  /** Trailer read: 52 bytes off the file tail — the only I/O a
    * version-disjoint segment ever costs a scan.
    *
    * Format upgrade note: earlier layouts (GSE1: 32-byte trailer, no
    * bloom; GSE2: 40-byte trailer, no stats/seqNo) are NOT readable by
    * this code — a persisted pre-GSE3 root must be rewritten via
    * [[Compaction.major]] on the old binary before upgrading (the
    * HBase HFile-version migration posture: majors rewrite every store
    * file into the current format). The magic check below fails
    * loudly — with the version named for GSE2 — and never misparses. */
  /** Trailer I/O counter — the spec seam proving projection pruning
    * on the `$versions` inventory face skips trailer reads when no
    * trailer-derived column is named. */
  private[graft] val trailerReads = new java.util.concurrent.atomic.AtomicLong(0)

  def readTrailer(path: Path): Trailer = {
    trailerReads.incrementAndGet()
    val ch = java.nio.channels.FileChannel.open(path)
    try {
      val buf = java.nio.ByteBuffer.allocate(TrailerLen)
      readFully(ch, buf, ch.size() - TrailerLen)
      buf.flip()
      val t = Trailer(buf.getLong, buf.getLong, buf.getInt,
        distinctKeys = buf.getInt, seqNo = buf.getLong,
        minVersion = buf.getLong, maxVersion = buf.getLong)
      val magic = buf.getInt
      // the 52-byte tail read ends at EOF, so `magic` IS the file's
      // last word whatever the format — a GSE2 file is named, not
      // misparsed
      require(magic != MagicV2,
        s"GSE2 cell segment (pre-stats format): rewrite via Compaction.major on the old binary before upgrading: $path")
      require(magic == Magic,
        s"not a GSE3 cell segment (bad magic 0x${magic.toHexString}): $path")
      t
    } finally ch.close()
  }

  /** Full index read (48 B/entry) — still no data-region I/O. Cached
    * per JVM in [[indexOf]]; segments are immutable so the cache never
    * invalidates. */
  /** Index I/O counter — the spec/gate seam proving the ROW bloom
    * short-circuits absent-key probes before any index load. */
  private[graft] val indexReads = new java.util.concurrent.atomic.AtomicLong(0)

  def readIndex(path: Path): Vector[IndexEntry] = {
    indexReads.incrementAndGet()
    val t = readTrailer(path)
    val ch = java.nio.channels.FileChannel.open(path)
    try {
      val buf = java.nio.ByteBuffer.allocate(t.entryCount * IndexEntryLen)
      readFully(ch, buf, t.indexOffset)
      buf.flip()
      Vector.tabulate(t.entryCount) { _ =>
        val d = new Array[Byte](32); buf.get(d)
        IndexEntry(d.map(b => f"$b%02x").mkString, buf.getLong, buf.getLong)
      }
    } finally ch.close()
  }

  // Per-JVM segment-index cache — the HBase BlockCache analog for
  // index blocks. Segments are rename-only immutable (content-hash
  // names; a REPLACE_EXISTING flip only lands identical content), so
  // cached entries never go STALE — but residency must be BOUNDED: an
  // unbounded memo would pin ~48 B/cell of every segment a long-lived
  // executor ever probes (F5 existence checks, connector point/range
  // reads), heap-fatal against a 100 TB table. LRU by estimated index
  // weight, default 64 MB (`graft.segment.index.cache.bytes`); an
  // evicted index reloads from its segment file on the next touch
  // (trailer + index readFully), identical answers either way.
  private val IndexEntryWeight = 144L // 48 B payload + digest String + Vector boxing
  private val EntryOverhead = 256L
  private def configuredMaxBytes: Long =
    // deploy knob: spark.graft.segment.index.cache.bytes reaches every
    // executor through SparkConf (no extraJavaOptions needed); the
    // system property remains the non-Spark/test override
    sys.props.get("graft.segment.index.cache.bytes").flatMap(_.toLongOption)
      .orElse(
        try Option(org.apache.spark.SparkEnv.get)
          .map(_.conf.getLong("spark.graft.segment.index.cache.bytes", 64L << 20))
        catch { case _: Throwable => None })
      .getOrElse(64L << 20)
  @volatile private var cacheMaxBytes: Long = configuredMaxBytes
  // accessOrder=true: iteration order is least-recently-USED first,
  // which is exactly the eviction order; all access synchronized (get
  // mutates the order links)
  private val indexCache = new java.util.LinkedHashMap[String, Vector[IndexEntry]](64, 0.75f, true)
  private var cacheBytes = 0L

  private def weightOf(v: Vector[IndexEntry]): Long = EntryOverhead + IndexEntryWeight * v.length

  private def evictToCap(): Unit = {
    val it = indexCache.entrySet().iterator()
    while (cacheBytes > cacheMaxBytes && it.hasNext) {
      cacheBytes -= weightOf(it.next().getValue)
      it.remove()
    }
  }

  /** Test seam: resize the cache cap (evicting down to it) and return
    * the previous cap, so specs can prove bounded residency under a
    * deliberately tiny limit with unchanged query answers. */
  private[graft] def setIndexCacheMaxBytes(bytes: Long): Long = indexCache.synchronized {
    val prev = cacheMaxBytes
    cacheMaxBytes = bytes
    evictToCap()
    prev
  }

  /** (resident entries, estimated resident bytes) — inspection only. */
  private[graft] def indexCacheStats: (Int, Long) =
    indexCache.synchronized((indexCache.size, cacheBytes))

  def indexOf(path: Path): Vector[IndexEntry] = {
    val key = path.toAbsolutePath.toString
    val hit = indexCache.synchronized(indexCache.get(key))
    if (hit != null) hit
    else {
      // load OUTSIDE the lock: two racing loads of one segment waste a
      // read but never serialize unrelated loads behind segment I/O
      val v = readIndex(path)
      indexCache.synchronized {
        if (!indexCache.containsKey(key)) {
          indexCache.put(key, v)
          cacheBytes += weightOf(v)
          evictToCap()
        }
      }
      v
    }
  }

  // Per-JVM bloom cache — same lifecycle argument as the index cache
  // (immutable segments ⇒ never stale; bounded ⇒ never heap-fatal),
  // but ~40× smaller entries (1.25 B/key vs 48 B/cell), so its default
  // cap holds the blooms of far more segments than the index cache
  // holds indexes — which is the point: the bloom answers "definitely
  // absent" for segments whose index was long evicted.
  private val BloomOverhead = 128L
  private def bloomCacheMax: Long =
    sys.props.get("graft.segment.bloom.cache.bytes").flatMap(_.toLongOption)
      .orElse(
        try Option(org.apache.spark.SparkEnv.get)
          .map(_.conf.getLong("spark.graft.segment.bloom.cache.bytes", 8L << 20))
        catch { case _: Throwable => None })
      .getOrElse(8L << 20)
  private val bloomCache = new java.util.LinkedHashMap[String, Bloom](64, 0.75f, true)
  private var bloomCacheBytes = 0L

  /** Bloom read: [bitCount:8][words] at trailer.bloomOffset — a few
    * hundred bytes for a typical segment, cached per JVM. */
  def bloomOf(path: Path): Bloom = {
    val key = path.toAbsolutePath.toString
    val hit = bloomCache.synchronized(bloomCache.get(key))
    if (hit != null) hit
    else {
      val t = readTrailer(path)
      val ch = java.nio.channels.FileChannel.open(path)
      val b =
        try {
          val head = java.nio.ByteBuffer.allocate(8)
          readFully(ch, head, t.bloomOffset); head.flip()
          val bits = head.getLong
          val words = java.nio.ByteBuffer.allocate((bits / 8).toInt)
          readFully(ch, words, t.bloomOffset + 8); words.flip()
          Bloom(Array.fill((bits / 64).toInt)(words.getLong))
        } finally ch.close()
      bloomCache.synchronized {
        if (!bloomCache.containsKey(key)) {
          bloomCache.put(key, b)
          bloomCacheBytes += BloomOverhead + b.words.length * 8L
          val it = bloomCache.entrySet().iterator()
          while (bloomCacheBytes > bloomCacheMax && it.hasNext) {
            bloomCacheBytes -= BloomOverhead + it.next().getValue.words.length * 8L
            it.remove()
          }
        }
      }
      b
    }
  }

  // A/B seam (IngestBench + diagnostics): disabling the bloom makes
  // every probe fall through to the index — the pre-bloom read path.
  @volatile private var bloomDisabled: Boolean =
    sys.props.get("graft.segment.bloom.disable").contains("true")
  private[graft] def setBloomDisabled(v: Boolean): Boolean = {
    val prev = bloomDisabled; bloomDisabled = v; prev
  }

  /** ROW-bloom membership probe: false ⇒ the segment DEFINITELY holds
    * no cell of this key, with no index I/O spent to learn it. */
  def mightContain(path: Path, digestHex: String): Boolean =
    bloomDisabled || bloomOf(path).mightContain(digestHex)

  /** Data-region iterator whose underlying stream can be released
    * EARLY: exhaustion closes it (the common scan), and `close()` lets
    * an abandoning consumer (a mid-merge failure in [[Compaction]], a
    * short-circuited read) release the stream without draining — both
    * idempotent. */
  trait EntryIterator extends Iterator[(Array[Byte], Long, Array[Byte])] with AutoCloseable

  /** Stream the data region in (key, version) order. `needBody = false`
    * skips every body's bytes (the column-pruned key-only scan). */
  def entries(path: Path, needBody: Boolean): EntryIterator = {
    val t = readTrailer(path)
    val in = new DataInputStream(new BufferedInputStream(Files.newInputStream(path), 1 << 16))
    var read = 0L
    new EntryIterator {
      private var closed = false
      override def close(): Unit = if (!closed) { closed = true; in.close() }
      override def hasNext: Boolean = {
        val h = !closed && read < t.indexOffset
        if (!h) close()
        h
      }
      override def next(): (Array[Byte], Long, Array[Byte]) = {
        val keyLen = in.readInt()
        val key = new Array[Byte](keyLen); in.readFully(key)
        val version = in.readLong()
        val bodyLen = in.readInt()
        val body =
          if (needBody) { val b = new Array[Byte](bodyLen); in.readFully(b); b }
          else { in.skipNBytes(bodyLen.toLong); null }
        read += 4 + keyLen + 8 + 4 + bodyLen
        (key, version, body)
      }
    }
  }

  /** Point read of one entry by its index offset — the segment-side
    * get-by-key path (open, one seek, one entry). */
  def entryAt(path: Path, offset: Long, needBody: Boolean): (Array[Byte], Long, Array[Byte]) = {
    val ch = java.nio.channels.FileChannel.open(path)
    try {
      val lenBuf = java.nio.ByteBuffer.allocate(4)
      readFully(ch, lenBuf, offset); lenBuf.flip()
      val keyLen = lenBuf.getInt
      val head = java.nio.ByteBuffer.allocate(keyLen + 12)
      readFully(ch, head, offset + 4); head.flip()
      val key = new Array[Byte](keyLen); head.get(key)
      val version = head.getLong
      val bodyLen = head.getInt
      val body =
        if (!needBody) null
        else {
          val b = java.nio.ByteBuffer.allocate(bodyLen)
          readFully(ch, b, offset + 4 + keyLen + 12)
          b.array()
        }
      (key, version, body)
    } finally ch.close()
  }

  private def hexToBytes(hex: String): Array[Byte] =
    Array.tabulate(hex.length / 2)(i => Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte)
}
