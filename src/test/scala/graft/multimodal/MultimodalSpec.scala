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

  test("audioSegmentHashes: segment counts, tail guard, key packing, shared content matches") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 300 chars → segments of 128: idx 0 (128), 1 (128), 2 (44 < 32? no —
    // 44 >= 128/4=32 keeps); 150 chars → idx 0 (128), 1 (22 < 32 drops);
    // 10 chars → idx 0 only (short but first window always survives)
    val m = Multimodal.synthesizeMedia(Seq(
        (1L, "a" * 300), (4L, "b" * 150), (7L, "c" * 10))
      .toDF("doc_id", "text")).toDF()
    val fps = Multimodal.audioSegmentHashes(m, segBytes = 128, bits = 32,
      keyMod = 1L << 20)
    val segCounts = fps.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(segCounts == Map(1L -> 3L, 4L -> 1L, 7L -> 1L), s"got $segCounts")
    // key packing round-trips
    val keys = fps.select(col("media_id"), col("seg_idx"), col("seg_key"))
      .collect()
    keys.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) * (1L << 20) + r.getLong(1))
    }
    // two media sharing identical 128-byte content at the same offset get
    // identical segment hashes (the time-shift-robust match unit); the
    // distinct tails carry VARIED content — a difference code over a
    // constant fill is degenerate (all adjacent cells equal for any char)
    val shared = (0 until 128).map(i => ('a' + i * 7 % 26).toChar).mkString
    val tail1 = (0 until 128).map(i => ('a' + (i * 11 + 3) % 26).toChar).mkString
    val tail2 = (0 until 128).map(i => ('a' + (i * 13 + 5) % 26).toChar).mkString
    val m2 = Multimodal.synthesizeMedia(Seq(
        (1L, shared + tail1), (4L, shared + tail2))
      .toDF("doc_id", "text")).toDF()
    val h2 = Multimodal.audioSegmentHashes(m2, 128, 32, 1L << 20)
      .select(col("media_id"), col("seg_idx"), col("phash")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(h2((1L, 0L)) == h2((4L, 0L)), "shared segment must hash equal")
    assert(h2((1L, 1L)) != h2((4L, 1L)), "distinct segments must differ")
  }

  test("videoFrameHashes: every-2nd sampling, frame-0 survival, same shape as audio") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 700 chars → frames 0..2 (256,256,188); sampled every 2nd → idx 0, 2;
    // 100 chars → frame 0 only (short, survives via the head rule)
    val m = Multimodal.synthesizeMedia(Seq(
        (2L, "v" * 700), (5L, "w" * 100)).toDF("doc_id", "text"))
    val fps = Multimodal.videoFrameHashes(m, everyN = 2, bits = 32,
      keyMod = 1L << 20)
    assert(fps.columns.toSeq ==
      Seq("media_id", "seg_idx", "seg_key", "phash", "ph_long"))
    val idx = fps.select(col("media_id"), col("seg_idx")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(idx == Set((2L, 0L), (2L, 2L), (5L, 0L)), s"got $idx")
  }
}
