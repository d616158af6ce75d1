package graft

import graft.media.MediaCodec
import graft.queries.Multimodal

/** F2: the stubbed codec is deterministic and the batched mapPartitions
  * plumbing preserves every record exactly once. */
class MediaSpec extends SparkSpec {

  private val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 1, 2, 3)
  private val junk = Array[Byte](0, 1, 2, 3, 4)

  test("sniff reads magic bytes, not labels") {
    assert(MediaCodec.sniff(png) == "png")
    assert(MediaCodec.sniff(junk) == "unknown")
  }

  test("decode is deterministic and in-range") {
    val a = MediaCodec.decode(1L, png)
    val b = MediaCodec.decode(1L, png)
    assert(a == b.copy(feature = a.feature)) // case-class equality modulo array identity
    assert(a.feature.toSeq == b.feature.toSeq)
    assert(a.width >= 64 && a.width < 1920 && a.height >= 64 && a.height < 1080)
    assert(a.n_bytes == png.length)
  }

  test("q_media_features emits one row per doc through the batch path") {
    val docs = Tables.documents(spark, sfDir).count()
    val feats = SparkEntry.queries("q_media_features")(spark, sfDir)
    assert(feats.count() == docs)
    // every media type present, all rows have 8-dim features
    val types = feats.select("media_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("png", "jpeg", "mp3", "riff"))
    assert(feats.filter("size(feature) != 8").count() == 0)
  }

  test("batching preserves order-independent content vs per-record decode") {
    val batch = (1L to 100L).map(i => (i, (png ++ Array(i.toByte)).clone()))
    val viaBatch = MediaCodec.decodeBatch(batch)
    val viaOne = batch.map { case (id, b) => MediaCodec.decode(id, b) }
    assert(viaBatch.map(_.doc_id) == viaOne.map(_.doc_id))
    assert(viaBatch.map(_.width) == viaOne.map(_.width))
  }
}
