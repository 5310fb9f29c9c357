package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed per-partition in batches.
  *
  * The codec boundary is mime-dispatched: image-mime payloads go through a
  * REAL decoder (JDK `javax.imageio` — PNG/JPEG/BMP/GIF, no external
  * dependency) for features and resizing; other mimes (audio/video codecs
  * don't ship in the JDK or this container) fall back to a clearly-marked
  * deterministic STUB so the full pipeline shape stays exercised. Swapping
  * in a real audio/video decoder changes one function and nothing else.
  *
  * 100 TB notes: media bytes dominate row size, so the repartition knob
  * below targets a bytes-per-partition budget (not row count); features
  * detach from the raw bytes immediately so downstream stages never
  * re-shuffle the binary payload.
  */
object Multimodal {

  // image decode/encode works headless; force it so executors never probe
  // for a display
  sys.props.getOrElseUpdate("java.awt.headless", "true")

  final case class MediaRow(media_id: Long, mime: String, media: Array[Byte])
  final case class MediaFeatures(
      media_id: Long, mime: String, n_bytes: Long,
      features: Array[Double], feat_norm: Double)

  /** Wrap the documents table as a media table (text bytes as the payload —
    * stands in for image/audio blobs with identical plumbing).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("mime"),
      col("text").cast("binary").as("media"))

  /** Repartition so each task holds ~`targetBytes` of media (binary rows
    * are wide — row-count-based sizing underestimates wildly).
    */
  def repartitionByBytes(media: DataFrame, totalBytes: Long,
      targetBytes: Long = 128L << 20): DataFrame =
    media.repartition(math.max(1, (totalBytes / targetBytes).toInt))

  /** Real image decode via the JDK codec registry (PNG/JPEG/BMP/GIF);
    * None when the payload is not a decodable image.
    */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    // NonFatal, not just IOException: ImageIO codecs throw runtime
    // exceptions (AIOOBE, NegativeArraySize, ...) on malformed-but-
    // recognized bytes — routine in a crawled corpus, and one such payload
    // must degrade to the stub, not abort the whole job
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Real image features: a `dim`-bucket luminance histogram, normalized to
    * sum 1 — deterministic, resolution-independent, and exactly the shape a
    * learned embedding would occupy downstream.
    */
  def imageFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        // integer Rec.601 luma in [0, 255]
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        out(lum * dim / 256) += 1.0
        x += 1
      }
      y += 1
    }
    val n = w.toDouble * h.toDouble
    out.map(_ / n)
  }

  /** Mime-dispatched feature decode: real `javax.imageio` path for images
    * (stub fallback only if the bytes fail to decode), stub for mimes the
    * JDK has no codec for.
    */
  def decodeMedia(bytes: Array[Byte], mime: String, dim: Int): Array[Double] =
    if (mime.startsWith("image/"))
      decodeImage(bytes).map(imageFeatures(_, dim)).getOrElse(decodeStub(bytes, dim))
    else decodeStub(bytes, dim)

  /** ======= STUB (non-image mimes only) =======
    * Deterministic fake decoder for payloads the JDK cannot decode
    * (audio/video — those codecs are a JNI boundary this container lacks).
    * Derives `dim` pseudo-features by hashing byte chunks, so tests
    * exercise the full pipeline shape with stable values.
    */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    var i = 0
    while (i < bytes.length) {
      val d = i % dim
      out(d) = (out(d) * 31.0 + (bytes(i) & 0xff)) % 1000003.0
      i += 1
    }
    out.map(_ / 1000003.0)
  }

  /** Real image resize: decode, area-average resample to (w, h), re-encode
    * as PNG. None when the payload is not a decodable image.
    */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    decodeImage(bytes).map { img =>
      val dst = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try g.drawImage(
        img.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
      finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", bos)
      bos.toByteArray
    }

  /** ======= STUB (non-image mimes only) =======
    * "Resize" for payloads the JDK cannot decode: derives a deterministic
    * `targetBytes` payload by cycling the input. The plumbing contract —
    * binary in, binary out, bounded output size — is the real part.
    */
  def resizeStub(bytes: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (bytes.isEmpty) new Array[Byte](targetBytes)
    else Array.tabulate(targetBytes)(i => bytes(i % bytes.length))
  }

  /** ======= STUB =======
    * "Frame sampling": a real implementation pulls every k-th video frame /
    * audio window; the fake slices the payload into `frameSize`-byte chunks
    * and keeps every `stride`-th chunk. Output schema (media_id, frame_idx,
    * frame binary) is the real contract — one row per sampled frame, ready
    * to fan out to per-frame feature extraction.
    */
  def sampleFrames(media: DataFrame, frameSize: Int = 64, stride: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    Par.fanOut(media.select(col("media_id"), col("mime"), col("media"))).as[MediaRow]
      .flatMap { r =>
        r.media.grouped(frameSize).zipWithIndex
          .collect { case (chunk, idx) if idx % stride == 0 =>
            (r.media_id, idx.toLong, chunk) }
      }
      .toDF("media_id", "frame_idx", "frame")
  }

  /** Batched resize over the binary column: real thumbnail re-encode for
    * images, stub for other mimes.
    */
  def resizeAll(media: DataFrame, targetBytes: Int = 256,
      thumbW: Int = 32, thumbH: Int = 32): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    Par.fanOut(media.select(col("media_id"), col("mime"), col("media"))).as[MediaRow]
      .map { r =>
        val out =
          if (r.mime.startsWith("image/"))
            resizeImage(r.media, thumbW, thumbH).getOrElse(resizeStub(r.media, targetBytes))
          else resizeStub(r.media, targetBytes)
        (r.media_id, r.mime, out)
      }
      .toDF("media_id", "mime", "media")
  }

  /** Batched per-partition feature extraction over the binary column: rows
    * stream through the partition in fixed-size batches and the codec is
    * invoked once per BATCH (`decodeBatch`), not per row — the shape a
    * real GPU/native decoder needs (amortized model/codec setup per call).
    * Batches are iterator-chunked, so only `batchSize` payloads are
    * resident at once regardless of partition size.
    */
  def extractFeatures(media: DataFrame, dim: Int = 8,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    Par.fanOut(media.select(col("media_id"), col("mime"), col("media"))).as[MediaRow]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val feats = decodeBatch(batch, dim)
          batch.lazyZip(feats).map { (r, f) =>
            MediaFeatures(r.media_id, r.mime, r.media.length.toLong, f,
              math.sqrt(f.map(x => x * x).sum))
          }
        }
      }
  }

  /** Batch-decode entry point: a real accelerator hands the whole batch to
    * the codec in one call; here each element dispatches on mime — real
    * `javax.imageio` for images, stub otherwise.
    */
  def decodeBatch(batch: Seq[MediaRow], dim: Int): Seq[Array[Double]] =
    batch.map(r => decodeMedia(r.media, r.mime, dim))

  /** 64-bit average-hash (aHash) of a decoded image — the classic
    * perceptual near-dup signature: an 8×8 grid of integer luma block
    * sums; bit (row·8+col) is set iff the cell's mean luma exceeds the
    * global mean. The comparison is the exact cross-multiplied integer
    * form `cellSum·nTotal > totalSum·nCell` — no float division and no
    * resampling codec anywhere, so the hash is bit-identical on any
    * JVM/platform (a SCALE_AREA_AVERAGING resize would not be).
    * Robust to re-encode/resize/brightness-preserving noise; the usual
    * dup bar is Hamming ≤ 3 of 64.
    */
  def aHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val gy = math.min(y * 8 / h, 7)
      var x = 0
      while (x < w) {
        val gx = math.min(x * 8 / w, 7)
        val rgb = img.getRGB(x, y)
        // integer Rec.601 luma in [0, 255] (imageFeatures' formula)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        val c = gy * 8 + gx
        sums(c) += lum
        cnts(c) += 1
        x += 1
      }
      y += 1
    }
    val total = sums.sum
    val n = w.toLong * h
    var bits = 0L
    var c = 0
    while (c < 64) {
      // luma ≤ 255 and cells hold ≤ n pixels, so both products stay well
      // inside int64 up to ~100 MP images
      if (cnts(c) > 0 && sums(c) * n > total * cnts(c)) bits |= 1L << c
      c += 1
    }
    bits
  }

  /** ======= STUB (non-image mimes only) =======
    * Deterministic 64-bit hash for payloads the JDK cannot decode: bit k
    * is the parity of the byte-sum over positions ≡ k (mod 64), XORed
    * with a length-derived mask (splitmix64 of the byte count), so a
    * small SAME-LENGTH byte edit perturbs only the touched residue
    * classes — mirroring how a small pixel edit perturbs few aHash cells
    * — while payloads of different lengths land ~32 apart even when
    * shorter than 64 bytes (without the mask, untouched residue classes
    * of short payloads all sat at parity 0 and distinct short payloads
    * collided at tiny Hamming distance). Exact duplicates still collide
    * at Hamming 0. Remaining caveat, inherent to the class-per-position
    * design: two DISTINCT same-length payloads shorter than 64 bytes can
    * differ only in the classes they touch (≤ length bits), so
    * sub-64-byte non-duplicates may still band together — filter tiny
    * payloads before near-dup banding if that matters for the corpus.
    */
  def stubHash64(bytes: Array[Byte]): Long = {
    val sums = new Array[Long](64)
    var i = 0
    while (i < bytes.length) {
      sums(i % 64) += bytes(i) & 0xff
      i += 1
    }
    var bits = 0L
    var k = 0
    while (k < 64) {
      if ((sums(k) & 1L) == 1L) bits |= 1L << k
      k += 1
    }
    // splitmix64 finalizer of the length (public-domain constants)
    var z = bytes.length.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    bits ^ (z ^ (z >>> 31))
  }

  /** Block-mean pooling of a `srcDim`-wide array<double> down to `dim`
    * values (mean of each srcDim/dim-wide slice) — the STUB stand-in for
    * a learned projection head mapping the text-embedding space into the
    * image-feature space. Pure expression work, zero shuffles.
    */
  private def poolTo(v: org.apache.spark.sql.Column, dim: Int,
      srcDim: Int = 64): org.apache.spark.sql.Column = {
    val block = srcDim / dim
    transform(sequence(lit(0), lit(dim - 1)), b =>
      aggregate(slice(v, b * lit(block) + 1, lit(block)),
        lit(0.0), (a, x) => a + x) / lit(block.toDouble))
  }

  /** CLIP-score-style cross-modal gate (r10 verdict #7): for each ALIGNED
    * (image, caption) pair — media_id = vec_id, the web-scraped
    * image/alt-text alignment — the cosine between the image feature
    * vector and the caption embedding projected into the same space,
    * plus the keep decision at `minCos` (the LAION-style CLIP-score
    * filter that drops mismatched pairs before multimodal training).
    *
    * STUB boundary, real dataflow: the "image encoder" is
    * [[extractFeatures]] (real luma histogram for images, deterministic
    * stub otherwise) and the "projection head" is block-mean pooling —
    * swapping in real CLIP towers changes those two functions and
    * nothing else. SCALE: one media scan for features (bytes detach
    * immediately), one embedding scan, one media_id-keyed equi-join —
    * linear end to end, no candidate blowup anywhere. Rows-only (the
    * encoders are JVM code, not SQL); MultimodalSpec recomputes every
    * score driver-side from the same encoders and pins the keep split.
    */
  def clipScorePairs(media: DataFrame, emb: DataFrame, dim: Int = 8,
      minCos: Double = 0.2): DataFrame = {
    import graft.functions.VectorFunctions._
    val feats = extractFeatures(media, dim).toDF()
      .select(col("media_id"), col("features").as("iv"))
      .withColumn("i_norm", l2Norm(col("iv")))
    val pooled = emb.select(col("vec_id").as("media_id"),
        poolTo(asDouble(col("embedding")), dim).as("tv"))
      .withColumn("t_norm", l2Norm(col("tv")))
    // zero-norm guard: an all-zero feature vector (empty payload through
    // decodeStub) or a zero-pooled caption has no defined cosine — NULL
    // clip_cos, but a DETERMINISTIC keep=0 (a gate must never emit a NULL
    // verdict that silently drops the pair from the decision set)
    feats.join(pooled, "media_id")
      .withColumn("clip_cos",
        when(col("i_norm") > 0 && col("t_norm") > 0,
          dot(col("iv"), col("tv")) / (col("i_norm") * col("t_norm"))))
      .select(col("media_id"), round(col("clip_cos"), 6).as("clip_cos"),
        coalesce((col("clip_cos") >= minCos).cast("long"), lit(0L)).as("keep"))
  }

  /** Mime-dispatched perceptual hash: real aHash for decodable images,
    * [[stubHash64]] for everything else (including undecodable image
    * bytes — the crawled-corpus degrade rule of [[decodeMedia]]).
    */
  def perceptualHash(bytes: Array[Byte], mime: String): Long =
    if (mime.startsWith("image/"))
      decodeImage(bytes).map(aHash64).getOrElse(stubHash64(bytes))
    else stubHash64(bytes)

  /** (media_id, mime, phash): the slim perceptual-hash index — features
    * detach from the raw bytes here, so everything downstream (banding,
    * pair joins) never shuffles the binary payload.
    */
  def withPerceptualHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    Par.fanOut(media.select(col("media_id"), col("mime"), col("media"))).as[MediaRow]
      .map(r => (r.media_id, r.mime, perceptualHash(r.media, r.mime)))
      .toDF("media_id", "mime", "phash")
  }

  /** Image near-dup pairs: decode → 64-bit perceptual hash →
    * [[Dedup.bandedHammingPairs]] (4×16-bit pigeonhole banding — recall
    * is EXACT for Hamming ≤ 3, not probabilistic). The decode scan is
    * the only pass over media bytes; the band join shuffles slim
    * (id, hash) rows only.
    */
  def phashNearDupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.bandedHammingPairs(
      withPerceptualHash(media).select(col("media_id").as("id"), col("phash").as("h")),
      maxHamming)
      .toDF("media_a", "media_b", "hamming")
}
