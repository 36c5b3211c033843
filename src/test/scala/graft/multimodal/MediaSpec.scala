package graft.multimodal

import graft.multimodal.Media._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Multimodal plumbing: binary payload schema, batched decode,
  * deterministic stub features, frame sampling shape. */
class MediaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .appName("media-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("payloads ride as binary columns with typed metadata") {
    val media = syntheticMedia(spark, 30)
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(media.count() == 30)
  }

  test("feature extraction is deterministic and emits compact features only") {
    val media = syntheticMedia(spark, 30)
    val f1 = extractFeatures(media, new StubDecoder(8), partitions = 4).collect().sortBy(_.media_id)
    val f2 = extractFeatures(media, new StubDecoder(8), partitions = 2).collect().sortBy(_.media_id)
    assert(f1.length == 30)
    // deterministic across partitioning
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.media_id == b.media_id && a.checksum == b.checksum && a.feature.sameElements(b.feature))
    }
    // features are bytes-derived, not constant
    assert(f1.map(_.checksum).distinct.length > 1)
    assert(f1.forall(_.feature.length == 8))
    // schema has no payload column — shuffles move features, not blobs
    val cols = extractFeatures(media, new StubDecoder(8), 4).schema.fieldNames.toSet
    assert(!cols.contains("payload"))
  }

  test("frame sampling emits every k-th block for video rows only") {
    val media = syntheticMedia(spark, 30)
    val frames = sampleFrames(media, everyK = 2).collect()
    assert(frames.nonEmpty)
    val ids = frames.map(_.getLong(0)).distinct.toSet
    // ids 2, 5, 8, ... are "video" in the synthetic table
    assert(ids.forall(_ % 3 == 2))
    assert(frames.forall(_.getInt(1) % 2 == 0))
  }
}
