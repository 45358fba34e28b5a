package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    val docs = Seq(
      (0L, "x" * 1000),
      (1L, "hello world"),
      (2L, "y" * 600)
    ).toDF("doc_id", "text")
    Multimodal.synthesizeMedia(docs)
  }

  test("synthesizeMedia: typed schema with binary content + metadata") {
    val m = media
    assert(m.schema.fieldNames.toSeq ==
      Seq("media_id", "media_type", "width", "height", "content"))
    assert(m.schema("content").dataType.typeName == "binary")
    val r = m.collect().map(r => r.media_id -> r).toMap
    assert(r(0L).media_type == "image" && r(1L).media_type == "audio" && r(2L).media_type == "video")
    assert(r(1L).content.length == 11)
  }

  test("decodeFeatures: stub decode runs distributed, deterministic values") {
    val f = Multimodal.decodeFeatures(media).collect().map(x => x.media_id -> x).toMap
    assert(f(0L).n_bytes == 1000)
    assert(f(1L).mean_byte ==
      "hello world".getBytes.map(b => (b & 0xff).toDouble).sum / 11)
    assert(f(2L).n_frames == 600 / 256)  // video: 256-byte frames
    assert(f(1L).n_frames == 1)          // audio shorter than 1024 bytes
  }

  test("sampleFrames: every Nth 256-byte block, bounded last frame") {
    val frames = Multimodal.sampleFrames(media, everyN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Array[Byte]](2))
      .toMap
    // media 0: 1000 bytes -> 4 frames (ceil, tail kept), sampled idx 0 and 2
    assert(frames.keySet.filter(_._1 == 0L).map(_._2) == Set(0L, 2L))
    assert(frames((0L, 0L)).length == 256)
    assert(frames((0L, 2L)).length == 256)
    // media 2: 600 bytes -> 3 frames, sampled 0 and 2; tail frame truncated
    assert(frames((2L, 2L)).length == 600 - 512)
    // media 1: 11 bytes -> single frame 0
    assert(frames((1L, 0L)).length == 11)
  }

  test("resize: metadata-only narrow transform") {
    val r = Multimodal.resize(media, 64, 64).collect()
    assert(r.forall(m => m.width == 64 && m.height == 64))
    assert(r.map(_.content.length).sorted.toSeq == Seq(11, 600, 1000))
  }
}
