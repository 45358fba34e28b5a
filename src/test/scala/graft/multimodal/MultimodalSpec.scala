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

  // independent in-JVM reference of the dHash-over-stub-decode (md5 gray
  // values over bits+1 equal slices, bit = left slice darker than right)
  private def refPhash(text: String, bits: Int): String = {
    val nCells = bits + 1
    val w = math.max(math.ceil(text.length / nCells.toDouble).toInt, 1)
    def gray(i: Int): Int = {
      val from = math.min((i - 1) * w, text.length)
      val slice = text.substring(from, math.min(from + w, text.length))
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(slice.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      Integer.parseInt(hex.take(2), 16)
    }
    (1 to bits).map(i => if (gray(i) < gray(i + 1)) '1' else '0').mkString
  }

  test("perceptualHash equals the in-JVM reference") {
    import spark.implicits._
    val texts = Seq(
      (0L, "a" * 330), (3L, "the quick brown fox jumps over the lazy dog"),
      (6L, ""), (9L, "z"))
    val m = Multimodal.synthesizeMedia(texts.toDF("doc_id", "text"))
    val got = Multimodal.perceptualHash(m.toDF(), bits = 32)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    texts.foreach { case (id, t) =>
      val want = refPhash(t, 32)
      assert(got(id)._1 == want, s"media $id")
      assert(got(id)._2 == java.lang.Long.parseLong(want, 2), s"ph_long $id")
    }
  }

  // aperiodic deterministic 330-char string (period-10 strings would make
  // every 10-char slice identical and the hash degenerate to all zeros)
  private def synthText(seed: Int): String =
    (0 until 330).map(i => ('a' + ((i * 31 + seed * 17 + i / 7) % 26)).toChar)
      .mkString

  test("perceptual locality: a one-slice edit flips at most 2 of 32 bits") {
    import spark.implicits._
    val base = synthText(1)                            // 330 chars, w = 10
    val edited = base.substring(0, 100) + "XXXXX" + base.substring(105)
    val m = Multimodal.synthesizeMedia(
      Seq((0L, base), (3L, edited)).toDF("doc_id", "text"))
    val fp = Multimodal.perceptualHash(m.toDF(), bits = 32)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val hamming = fp(0L).zip(fp(3L)).count { case (a, b) => a != b }
    // the edit sits inside slice 11 (chars 100..109): only bits 10 and 11
    // (the two differences touching that slice) can change
    assert(hamming <= 2, s"local edit flipped $hamming bits: ${fp(0L)} vs ${fp(3L)}")
  }

  test("perceptualNearDupPairs: banded pairs find the hamming-close pair only") {
    import spark.implicits._
    val base = synthText(1)
    val near = base.substring(0, 200) + "QQQQQ" + base.substring(205)
    val far = synthText(2)
    val m = Multimodal.synthesizeMedia(
      Seq((0L, base), (3L, near), (6L, far)).toDF("doc_id", "text"))
    val pairs = Multimodal.perceptualNearDupPairs(m.toDF(), bits = 32,
        prefixBits = 8, maxHamming = 3, nTables = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 3L)),
      s"expected exactly the near pair, got ${pairs.toSeq}")
    assert(pairs.head._3 <= 3)
  }
}
