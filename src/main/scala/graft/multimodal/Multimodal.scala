package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The container has no media codecs, so the decode step is a STUB — a
  * deterministic fake that derives "pixels" from the content bytes — but the
  * Spark-side plumbing is real and is what matters at scale: binary columns
  * ride Parquet as-is, metadata travels in a typed struct, and per-record
  * decoding runs via `mapPartitions` over a typed Dataset so a real codec
  * (JNI or subprocess) could be swapped in without touching the plan shape.
  * Batches inside a partition are processed in fixed-size chunks to mirror
  * the arrow-batch shape a vectorized (e.g. pandas-based) UDF would see.
  */
object Multimodal {

  /** A media record: opaque content + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      media_type: String,   // "image" | "audio" | "video"
      width: Int,
      height: Int,
      content: Array[Byte])

  /** Deterministic fake "decoded" features for one record. */
  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      mean_byte: Double,   // stand-in for mean pixel/sample value
      n_frames: Int)       // stand-in for frame count

  /** Batch size mirroring a vectorized-UDF arrow batch. */
  val DecodeBatchSize = 64

  /** Wrap a text table as a media table (test fixture path: utf-8 bytes play
    * the role of image bytes; media_type/width/height synthesized). */
  def synthesizeMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        (col("doc_id") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height"),
        encode(col("text"), "utf-8").as("content"))
      .as[MediaRecord]
  }

  /** STUB decode: a real implementation would hand `content` to a codec.
    * This deterministic fake treats bytes as samples. */
  private def decodeOne(r: MediaRecord): MediaFeatures = {
    val bytes = r.content
    val mean =
      if (bytes.isEmpty) 0.0
      else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
    val frames = r.media_type match {
      case "video" => math.max(bytes.length / 256, 1)
      case "audio" => math.max(bytes.length / 1024, 1)
      case _       => 1
    }
    MediaFeatures(r.media_id, r.media_type, bytes.length.toLong, mean, frames)
  }

  /** Decode/feature-extract over fixed-size in-partition batches. The
    * `grouped(DecodeBatchSize)` shape is where a vectorized decoder would
    * receive its batch; per-record map inside is the stub. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(batch => batch.map(decodeOne))
    }
  }

  /** Frame sampling: every `everyN`-th 256-byte block as a "frame" payload.
    * Returns (media_id, frame_idx, frame_bytes). Pure column ops — the
    * slicing happens distributed, nothing decodes on the driver. */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int): DataFrame =
    media.toDF()
      .withColumn("n_frames", greatest(ceil(length(col("content")) / lit(256.0)), lit(1)).cast("int"))
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"),
        col("content"))
      .filter(col("frame_idx") % everyN === 0)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("content").substr(col("frame_idx") * 256 + 1, lit(256)).as("frame_bytes"))

  /** Resize stub: metadata-only transform (a real resize would re-encode
    * content; the plan shape — narrow map, no shuffle — is identical). */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(r => r.copy(width = w, height = h))
  }

  /** dHash-style perceptual fingerprint over the stub-decoded signal — the
    * image analogue of SimHash, and the missing dedup modality for a
    * multimodal corpus: near-identical media get near-identical bit strings
    * (small Hamming distance), so the Hamming-banded candidate machinery of
    * the text stack applies unchanged.
    *
    * Real dHash: downscale to a (bits+1)-pixel gray strip, bit i = "pixel i
    * is darker than pixel i+1" — a LOCAL difference code, so a local edit
    * touches ≤2 bits. Here the "decoded pixels" come from the deterministic
    * stub decode (the container has no codecs): the content bytes decode to
    * their utf-8 signal, the signal splits into bits+1 equal slices, and a
    * slice's "gray value" is the first byte of its md5 (0..255). Everything
    * downstream of the decode — the difference code, the bit string, the
    * banded pair join — is exactly what a real decoder would feed, and
    * because the stub is md5-over-slices the whole hash is reproducible in
    * the DuckDB oracle. A real codec swaps in at `signal` without touching
    * the plan: one narrow projection per record, no shuffle.
    *
    * Returns `(media_id, phash, ph_long)` — bit string plus its parsed
    * long, the same fingerprint shape `Dedup.fingerprints` emits, so the
    * SimHash banding entry points consume it directly. */
  def perceptualHash(media: DataFrame, bits: Int = 32): DataFrame = {
    require(bits >= 1 && bits <= 62, "phash bits must fit a signed long")
    val nCells = bits + 1
    // STAGED projections, one alias per stage: inlining `signal`/`w` into
    // every one of the ~2·bits cell references would bloat the generated
    // code past the whole-stage-codegen method limit (measured: the flat
    // form fell back to interpreted eval and cost seconds at sf0.1).
    // CollapseProject keeps multi-use non-cheap aliases staged, so each
    // row decodes once, sizes once, hashes nCells slices once.
    val signal = decode(col("content"), "UTF-8")
    val w = greatest(
      ceil(length(col("__sig")).cast("double") / lit(nCells)).cast("int"),
      lit(1))
    // gray value of slice i (1-based): first md5 byte of the slice
    def cell(i: Int) =
      conv(substring(md5(col("__sig").substr(
        lit(i - 1) * col("__w") + lit(1), col("__w"))), 1, 2), 16, 10)
        .cast("int")
    val bitChars = (1 to bits).map(i =>
      when(element_at(col("__cells"), i) < element_at(col("__cells"), i + 1),
        lit("1")).otherwise(lit("0")))
    media.select(col("media_id"), signal.as("__sig"))
      .select(col("media_id"), col("__sig"), w.as("__w"))
      .select(col("media_id"), array((1 to nCells).map(cell): _*).as("__cells"))
      .select(col("media_id"), concat(bitChars: _*).as("phash"))
      .withColumn("ph_long", conv(col("phash"), 2, 10).cast("long"))
  }

  /** Perceptual near-dup pairs: multi-table Hamming-banded candidates over
    * [[perceptualHash]] fingerprints, exact Hamming re-score — the image
    * SimHash. Work is ∝ Σ bucket² per rotation table, never n². Returns
    * `(media_a, media_b, hamming)`. */
  def perceptualNearDupPairs(media: DataFrame, bits: Int = 32,
                             prefixBits: Int = 8, maxHamming: Int = 3,
                             nTables: Int = 2): DataFrame =
    perceptualNearDupPairsFromHashes(perceptualHash(media, bits),
      bits, prefixBits, maxHamming, nTables)

  /** Audio segment fingerprints — the audio member of the near-dup family.
    * Where [[perceptualHash]] fingerprints a WHOLE image, audio near-dup
    * must survive time shifts and partial overlap (a clip embedded in a
    * longer recording), so the unit of matching is the fixed-duration
    * SEGMENT: the stub-decoded stream splits into `segBytes` windows, and
    * each window gets its own difference-code fingerprint (the energy
    * envelope downsampled to bits+1 cells, bit i = "cell i quieter than
    * cell i+1" — same local difference code as dHash, over time instead
    * of space). Two recordings are near-dup if ANY segment pair lands
    * within a small Hamming distance — exactly the shape audio
    * fingerprinting systems (Shazam-style landmark hashing, Chromaprint)
    * reduce to.
    *
    * Trailing windows shorter than `segBytes / 4` drop (their
    * mostly-empty hashes would collide across unrelated media); a
    * record's FIRST window always survives so every audio row stays
    * fingerprintable — mirroring the truncated-shingle floor of the text
    * stack. The stub decode is the same md5-over-slices fake as
    * [[perceptualHash]] (no codecs in the container), so the whole hash
    * is DuckDB-reproducible; a real decoder swaps in at the signal
    * column without touching the plan: explode + substr are narrow
    * in-row ops, no shuffle anywhere before the banded join.
    *
    * Returns `(media_id, seg_idx, seg_key, phash, ph_long)`; `seg_key =
    * media_id * keyMod + seg_idx` is the composite identity the banded
    * pair join orders on (keyMod just needs to exceed the max segment
    * count; a production path on unbounded media would band on a
    * `struct(media_id, seg_idx)` key instead of arithmetic packing). */
  def audioSegmentHashes(media: DataFrame, segBytes: Int, bits: Int,
                         keyMod: Long): DataFrame = {
    require(segBytes >= 8, "segments must hold at least a few samples")
    val segs = media
      .withColumn("n_segs",
        greatest(ceil(length(col("content")) / lit(segBytes.toDouble)),
          lit(1)).cast("int"))
      .select(col("media_id").as("src_media"),
        explode(sequence(lit(0), col("n_segs") - 1)).as("seg_idx"),
        col("content"))
      .select(col("src_media"), col("seg_idx"),
        col("content").substr(col("seg_idx") * segBytes + 1, lit(segBytes))
          .as("seg_bytes"))
      .filter(length(col("seg_bytes")) >= segBytes / 4 || col("seg_idx") === 0)
    val keyed = segs.select(
      (col("src_media") * keyMod + col("seg_idx")).as("media_id"),
      col("seg_bytes").as("content"))
    perceptualHash(keyed, bits)
      .select(floor(col("media_id") / keyMod).cast("long").as("media_id"),
        (col("media_id") % keyMod).cast("long").as("seg_idx"),
        col("media_id").as("seg_key"), col("phash"), col("ph_long"))
  }

  /** Video near-dup fingerprints — the third modality member: a video's
    * matching unit is the SAMPLED FRAME ([[sampleFrames]]' every-Nth
    * 256-byte block), each frame hashed with the same difference code as
    * [[perceptualHash]]. Two videos are near-dup if ANY sampled frame
    * pair lands within a small Hamming distance — shot-level matching
    * that survives re-cuts and partial reuse, the same reduction
    * content-ID systems run per keyframe. Frames shorter than a quarter
    * block drop (their mostly-empty hashes collide across unrelated
    * media); frame 0 always survives so every video stays
    * fingerprintable.
    *
    * Returns the same `(media_id, seg_idx, seg_key, phash, ph_long)`
    * shape as [[audioSegmentHashes]] — one shared downstream (banding,
    * rollups, the streaming fingerprint index) serves all three
    * modalities. */
  def videoFrameHashes(media: Dataset[MediaRecord], everyN: Int, bits: Int,
                       keyMod: Long): DataFrame = {
    val frames = sampleFrames(media, everyN)
      .filter(length(col("frame_bytes")) >= 64 || col("frame_idx") === 0)
    val keyed = frames.select(
      (col("media_id") * keyMod + col("frame_idx")).as("media_id"),
      col("frame_bytes").as("content"))
    perceptualHash(keyed, bits)
      .select(floor(col("media_id") / keyMod).cast("long").as("media_id"),
        (col("media_id") % keyMod).cast("long").as("seg_idx"),
        col("media_id").as("seg_key"), col("phash"), col("ph_long"))
  }

  /** [[perceptualNearDupPairs]] over a prebuilt [[perceptualHash]] table —
    * the caller owns that table's lifecycle. */
  def perceptualNearDupPairsFromHashes(fp: DataFrame, bits: Int,
                                       prefixBits: Int, maxHamming: Int,
                                       nTables: Int): DataFrame = {
    val asFingerprints = fp.select(col("media_id").as("doc_id"),
      col("phash").as("simhash"), col("ph_long").as("sh_long"))
    graft.dedup.Dedup.simhashPairsMultiTableFromFingerprints(
        asFingerprints, bits, prefixBits, maxHamming, nTables)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))
  }
}
