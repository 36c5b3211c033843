package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (document, LSH band) row flowing into the incremental dedup. */
case class BandRow(doc_id: Long, band_idx: Int, band_key: String)

/** Per-document bucket verdict: the smallest doc_id this bucket has
  * seen up to and including the batch the document arrived in. */
case class BucketHit(doc_id: Long, bmin: Long)

/** Incremental (streaming) near-duplicate detection over MinHash LSH
  * band buckets — the online face of the q15/q102 batch dedup: as
  * documents arrive, each of their band buckets remembers the smallest
  * doc_id it has ever contained, and a document whose every-bucket
  * minimum is smaller than itself is a near-duplicate of an earlier
  * document. This is the shape an always-on crawl-ingest dedup takes at
  * scale: state is one long per OCCUPIED band bucket (≤ bands × corpus,
  * uniformly hash-distributed by construction of the band key), never a
  * pair list and never the corpus itself.
  *
  * Determinism contract: the per-bucket minimum is order-insensitive
  * WITHIN a batch (min over the whole group before any emission), so
  * the only arrival-order requirement for batch≡stream equality is
  * that batches partition the doc_id space in ascending ranges — then
  * every document's verdict only depends on smaller ids, all of which
  * have already arrived (see q124's staging). Replayed batches
  * recompute the same min, so the operator is idempotent under task
  * retry and micro-batch replay.
  */
object BandDedup {

  /** bands (streaming) → one BucketHit per input row, where bmin is the
    * bucket's all-time minimum doc_id including the current batch. */
  def bucketMins(bands: Dataset[BandRow]): Dataset[BucketHit] = {
    val spark = bands.sparkSession
    import spark.implicits._
    bands
      .groupByKey(b => (b.band_idx, b.band_key))
      .flatMapGroupsWithState[Long, BucketHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, String), it: Iterator[BandRow], state: GroupState[Long]) =>
          val docs = it.map(_.doc_id).toList
          val bmin = math.min(state.getOption.getOrElse(Long.MaxValue), docs.min)
          state.update(bmin)
          docs.iterator.map(d => BucketHit(d, bmin))
      }
  }
}
