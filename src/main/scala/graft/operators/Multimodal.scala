package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed per-partition in batches. The Spark-side contract —
  * schema, partitioning, batch iteration, output shape — is real and
  * tested; the codec call itself is a clearly-marked deterministic STUB
  * (`decodeStub`) because no image/audio library ships in this container.
  * Swapping in a real decoder changes one function and nothing else.
  *
  * 100 TB notes: media bytes dominate row size, so the repartition knob
  * below targets a bytes-per-partition budget (not row count); features
  * detach from the raw bytes immediately so downstream stages never
  * re-shuffle the binary payload.
  */
object Multimodal {

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

  /** ======= STUB =======
    * Deterministic fake decoder: a real implementation would decode the
    * image/audio payload here (JNI/codec call — per-partition imperative
    * work, hence mapPartitions, the documented last-resort tier for native
    * boundaries). The fake derives `dim` pseudo-features by hashing byte
    * chunks, so tests exercise the full pipeline shape with stable values.
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

  /** ======= STUB =======
    * "Resize": a real implementation decodes, resamples, and re-encodes the
    * image/audio payload; the fake derives a deterministic `targetBytes`
    * payload by cycling the input. The plumbing contract — binary in,
    * binary out, bounded output size — is the real part.
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

  /** Batched "resize" over the binary column (stub codec, real dataflow). */
  def resizeAll(media: DataFrame, targetBytes: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    Par.fanOut(media.select(col("media_id"), col("mime"), col("media"))).as[MediaRow]
      .map(r => (r.media_id, r.mime, resizeStub(r.media, targetBytes)))
      .toDF("media_id", "mime", "media")
  }

  /** Batched per-partition feature extraction over the binary column: rows
    * stream through the partition in fixed-size batches and the codec is
    * invoked once per BATCH (`decodeBatchStub`), not per row — the shape a
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
          val feats = decodeBatchStub(batch.map(_.media), dim)
          batch.lazyZip(feats).map { (r, f) =>
            MediaFeatures(r.media_id, r.mime, r.media.length.toLong, f,
              math.sqrt(f.map(x => x * x).sum))
          }
        }
      }
  }

  /** ======= STUB =======
    * Batch-decode entry point: a real implementation hands the whole batch
    * to the codec/accelerator in one call. The fake decodes element-wise.
    */
  def decodeBatchStub(batch: Seq[Array[Byte]], dim: Int): Seq[Array[Double]] =
    batch.map(decodeStub(_, dim))
}
