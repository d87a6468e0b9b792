package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media record: opaque binary payload + typed metadata. The payload
  * travels as a `binary` column; nothing downstream assumes it is
  * decodable by Spark itself.
  */
final case class MediaRecord(
    doc_id: Long,
    media_type: String,
    payload: Array[Byte],
    n_bytes: Int)

/** Extracted per-record features (the output shape of the decode stage). */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Int,
    byte_mean: Double,
    byte_histogram: Array[Long])

/** Multimodal-column plumbing for the training-data pipeline: treat
  * image/audio/video as opaque `binary` columns with typed metadata, and
  * run decode / feature-extraction as partition-local batch functions.
  *
  * The Spark-side mechanics here are real and tested — schema, typed
  * Encoders, `mapPartitions` batch shape (the Scala analogue of
  * `mapInPandas`: one iterator per partition, amortized per-batch setup,
  * no per-row driver involvement, no shuffle). Container-header decode
  * is REAL since r7: [[withImageDims]] parses PNG/JPEG/GIF headers from
  * the binary column via the codegen'd
  * [[graft.functions.ImageDims]] expression — no codec library needed
  * for dimensions/format. Only pixel/sample decode remains a seam:
  * this container has no image/audio libraries, so [[decodeFeatures]]
  * computes deterministic byte statistics where a real deployment would
  * call the codec — swap [[stubDecode]] only.
  *
  * Scale notes: payloads stay columnar parquet binary; feature extraction
  * is a map-only stage that parallelizes per partition; partition sizing
  * for 100 TB of media is governed by
  * `spark.sql.files.maxPartitionBytes`, not row counts.
  */
object MediaColumns {

  /** Synthesize a deterministic media corpus from the documents table:
    * payload = UTF-8 bytes of the text (stands in for encoded media),
    * media_type round-robins image/audio/video.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")))

  /** The decoder seam. A real deployment decodes `payload` (JPEG/WAV/...)
    * here; this container has no codecs, so the stub derives
    * deterministic per-byte statistics instead. Signature and batch shape
    * are what a real decoder needs: whole payload in, features out.
    */
  private def stubDecode(payload: Array[Byte]): (Double, Array[Long]) = {
    val hist = new Array[Long](16)
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xFF
      hist(b >> 4) += 1
      sum += b
      i += 1
    }
    (if (payload.length == 0) 0.0 else sum.toDouble / payload.length, hist)
  }

  /** Feature extraction as a partition-local batch map — the plumbing a
    * real decode stage uses (mapInPandas-shaped: iterator in, iterator
    * out, one call per partition).
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // per-partition setup would init the codec once here
      records.map { r =>
        val (mean, hist) = stubDecode(r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.n_bytes, mean, hist)
      }
    }
  }

  /** Frame sampling: every `stride` bytes take a `frameLen`-byte window —
    * the binary-plumbing shape of video frame extraction (positions and
    * batch layout real; "frame" content is whatever the payload holds).
    * Pure built-in expressions, so it is oracle-checkable.
    */
  def frameSample(media: DataFrame, frames: Int = 4, stride: Int = 64,
      frameLen: Int = 16): DataFrame =
    media.select(col("doc_id"), col("media_type"),
      posexplode(transform(sequence(lit(0), lit(frames - 1)), j =>
        col("payload").substr(j * stride + 1, lit(frameLen)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumn("frame_md5", md5(col("col")))
      .filter(octet_length(col("col")) > 0)
      .select("doc_id", "media_type", "frame_idx", "frame_md5")

  /** "Resize" as byte-stride downsampling — the PLUMBING of a media
    * resize stage with the pixel math stubbed (this container has no
    * codecs): every `factor`-th byte of the payload is kept, the target
    * is tagged with the stride and the resulting size, and the whole
    * thing is relational (transform over a sequence + concat), so it
    * runs codegen'd, shuffles nothing, and is oracle-checkable. A real
    * deployment swaps the strided projection for a decoder+scaler in
    * [[decodeFeatures]]'s mapPartitions seam; everything around it —
    * schema, partition mapping, downstream size accounting — is what
    * production uses.
    */
  def resizeStride(media: DataFrame, factor: Int = 4,
      payloadCol: String = "payload"): DataFrame = {
    require(factor > 0, s"factor must be positive: $factor")
    // operates on a STRING payload (decode binary first; byte==char for
    // the ASCII corpus, the same convention the frame-sampling oracle
    // documents) — a true binary resize is pixel work and lives behind
    // the decodeFeatures codec seam
    val p = col(payloadCol)
    val lastIdx = greatest(ceil(length(p) / lit(factor)).cast("int") - 1, lit(0))
    media
      .withColumn("resized", concat_ws("",
        transform(sequence(lit(0), lastIdx),
          j => p.substr(j * factor + 1, lit(1)))))
      .withColumn("resized_bytes", octet_length(col("resized")).cast("long"))
      .withColumn("stride", lit(factor.toLong))
      .select("doc_id", "media_type", "resized", "resized_bytes", "stride")
  }

  /** Decoded container dimensions from the binary payload — REAL
    * PNG/JPEG/GIF header parsing ([[graft.functions.ImageDims]], one
    * codegen'd call per row), not a stub; non-image payloads yield null
    * format/width/height and survive (garbage tolerance is part of the
    * contract at 100 TB).
    */
  def withImageDims(media: DataFrame): DataFrame =
    media
      .withColumn("_dims",
        graft.functions.ImageDimsFunctions.imageDims(col("payload")))
      .withColumn("img_format", col("_dims.format"))
      .withColumn("img_width", col("_dims.width"))
      .withColumn("img_height", col("_dims.height"))
      .drop("_dims")

  /** Perceptual fingerprints from the binary payload — dHash-64 +
    * aHash-64 via the codegen'd [[graft.functions.PerceptualHash]]
    * expression (map-only: any shuffle here would move raw media
    * bytes). Payloads under 72 bytes fingerprint as null and are kept
    * (the header parsers' garbage-tolerance contract).
    */
  def withPerceptualHash(media: DataFrame): DataFrame =
    media
      .withColumn("_ph",
        graft.functions.PerceptualHashFunctions.perceptualHash(col("payload")))
      .withColumn("phash_d", col("_ph.dhash"))
      .withColumn("phash_a", col("_ph.ahash"))
      .drop("_ph")

  /** Content-level image near-dup pairs: hamming distance between
    * dHash fingerprints <= `maxHamming`, candidates mined by
    * [[graft.operators.Dedup.hammingPairs64]]'s byte-block pigeonhole
    * (equi-join on signature blocks — never all-pairs, and only
    * (id, 8-byte hash) rows ride the shuffle, never payloads).
    */
  def nearDupPairs(media: DataFrame, maxHamming: Int = 3,
      maxBlockFreq: Option[Long] = None): DataFrame =
    graft.operators.Dedup.hammingPairs64(
      withPerceptualHash(media).select(col("doc_id"), col("phash_d")),
      maxHamming, idCol = "doc_id", hashCol = "phash_d",
      maxBlockFreq = maxBlockFreq)

  /** Content-level audio fingerprint — the energy-envelope dHash twin
    * via the codegen'd [[graft.functions.AudioFingerprint]] expression
    * (map-only, like the image hashes: any shuffle here would move raw
    * audio bytes). Payloads under 65 bytes fingerprint as null and are
    * kept.
    */
  def withAudioFingerprint(media: DataFrame): DataFrame =
    media
      .withColumn("_afp",
        graft.functions.AudioFingerprintFunctions.audioFingerprint(
          col("payload")))
      .withColumn("audio_fp", col("_afp.audio_fp"))
      .drop("_afp")

  /** Audio near-dup pairs: hamming distance between energy-envelope
    * fingerprints <= `maxHamming`, mined by the same byte-block
    * pigeonhole as the image pairs — a one-sample re-encode moves one
    * frame's energy and flips at most the two adjacent gradient bits.
    */
  def audioNearDupPairs(media: DataFrame, maxHamming: Int = 2,
      maxBlockFreq: Option[Long] = None): DataFrame =
    graft.operators.Dedup.hammingPairs64(
      withAudioFingerprint(media).select(col("doc_id"), col("audio_fp")),
      maxHamming, idCol = "doc_id", hashCol = "audio_fp",
      maxBlockFreq = maxBlockFreq)

  /** Per-video frame-sample perceptual hashes: every `stride` bytes
    * take a `frameLen`-byte window (the [[frameSample]] plumbing) and
    * dHash it — the video near-dup signal is the SET of per-frame
    * hashes, not one whole-file hash (a re-encode perturbs every frame
    * a little; a different video shares no frames at all). Windows too
    * short to fingerprint (past EOF) are dropped; the hash stage is
    * map-only.
    */
  def frameHashes(media: DataFrame, frames: Int = 4, stride: Int = 64,
      frameLen: Int = 72): DataFrame = {
    require(frameLen >= graft.functions.PerceptualHashKernel.N,
      s"frameLen must be >= ${graft.functions.PerceptualHashKernel.N}")
    media.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(frames - 1)), j =>
          col("payload").substr(j * stride + 1, lit(frameLen)))))
      .withColumnRenamed("pos", "frame_idx")
      .filter(octet_length(col("col")) >= frameLen)
      .withColumn("_ph",
        graft.functions.PerceptualHashFunctions.perceptualHash(col("col")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("_ph.dhash").as("frame_dhash"))
  }

  /** Video near-dup pairs: two videos pair when >= `minSharedFrames` of
    * their TEMPORALLY ALIGNED frame samples hash within `maxHamming`
    * bits of each other. Candidates come from [[frameHashes]] keyed as
    * one synthetic id per (video, frame) through the same pigeonhole
    * block join as every other hamming family — never all-pairs, and
    * only (id, 8-byte hash) rows ride the shuffle. The frame-index
    * alignment means a shared STILL (logo card, black frame) in
    * different positions cannot pair two unrelated videos; the
    * `maxBlockFreq` cap guards the degenerate-frame mass underneath.
    */
  def videoNearDupPairs(media: DataFrame, frames: Int = 4,
      stride: Int = 64, frameLen: Int = 72, maxHamming: Int = 2,
      minSharedFrames: Int = 3,
      maxBlockFreq: Option[Long] = None): DataFrame = {
    // the synthetic fid = doc_id*frames + frame_idx requires an
    // integral, NON-NEGATIVE doc_id: a string id would null out
    // silently (no pairs, no error) and a negative one breaks the
    // pmod-alignment / div-reconstruction pair below — so reject the
    // type at plan time and the sign at run time
    locally {
      import org.apache.spark.sql.types._
      val dt = media.schema("doc_id").dataType
      require(dt == ByteType || dt == ShortType || dt == IntegerType ||
        dt == LongType,
        s"videoNearDupPairs keys frames by doc_id*frames+frame_idx and " +
          s"needs an integral doc_id; got $dt")
    }
    val guardedId = when(col("doc_id") >= 0, col("doc_id").cast("long"))
      .otherwise(raise_error(
        lit("videoNearDupPairs: doc_id must be non-negative")).cast("long"))
    val fh = frameHashes(media, frames, stride, frameLen)
      .select((guardedId * frames + col("frame_idx")).as("fid"),
        col("frame_dhash"))
    graft.operators.Dedup.hammingPairs64(fh, maxHamming, idCol = "fid",
        hashCol = "frame_dhash", maxBlockFreq = maxBlockFreq)
      // temporal alignment: same frame slot on both sides (this also
      // rules out a video pairing with itself)
      .filter(pmod(col("id_a"), lit(frames)) === pmod(col("id_b"), lit(frames)))
      .select(expr(s"id_a div $frames").as("id_a"),
        expr(s"id_b div $frames").as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_frames"))
      .filter(col("n_frames") >= minSharedFrames)
  }

  /** CROSS-MODAL paired near-dup edges — the LAION-style curation step
    * that neither modality catches alone: an (image, caption) pair is a
    * near-dup of another when its IMAGE matches (dHash within
    * `maxHamming`, the [[nearDupPairs]] pigeonhole join) OR its CAPTION
    * matches (exact word-n-gram Jaccard >= `threshold`, the
    * [[graft.operators.Dedup.jaccardPairs]] inverted index). A scraped
    * corpus duplicates both ways — the same photo re-captioned by every
    * mirror, and the same alt-text pasted under a re-encoded thumbnail
    * — so edges are the UNION of the two modality pair lists, tagged
    * with which modality produced them. Rows: `(id_a, id_b, modality)`
    * with modality in {image, caption}; a pair matching in both
    * modalities carries both rows.
    *
    * Input is the paired relation `(doc_id, payload, caption)`. Plan
    * shape: each modality's candidate generation is the same df/block-
    * capped equi-join it is alone (never all-pairs, payloads never ride
    * the caption join and vice versa); the union is edge-list-sized.
    */
  def pairedNearDupEdges(paired: DataFrame, maxHamming: Int = 3,
      n: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Option[Long] = None,
      maxBlockFreq: Option[Long] = None): DataFrame = {
    val img = nearDupPairs(paired, maxHamming, maxBlockFreq)
      .select(col("id_a"), col("id_b"), lit("image").as("modality"))
    val cap = graft.operators.Dedup.jaccardPairs(paired, n, threshold,
        idCol = "doc_id", textCol = "caption", maxDocFreq = maxDocFreq)
      .select(col("id_a"), col("id_b"), lit("caption").as("modality"))
    img.unionByName(cap)
  }

  /** The consumable end of cross-modal dedup: [[pairedNearDupEdges]]
    * union → one connected-components pass → one representative
    * (image, caption) pair kept per cluster. Transitivity ACROSS
    * modalities is the point of the single CC: if pair B shares A's
    * image and C shares B's caption, {A, B, C} collapse to one kept
    * pair even though A and C match in no modality directly.
    */
  def pairedNearDupKept(paired: DataFrame, maxHamming: Int = 3,
      n: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Option[Long] = None,
      maxBlockFreq: Option[Long] = None): DataFrame =
    graft.operators.Dedup.dropNearDups(paired,
      graft.operators.Dedup.nearDupClusters(
        pairedNearDupEdges(paired, maxHamming, n, threshold, maxDocFreq,
          maxBlockFreq).select("id_a", "id_b").distinct()))

  /** Typed seam for the decode path. */
  def asMediaRecords(media: DataFrame): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "media_type", "payload", "n_bytes").as[MediaRecord]
  }
}
