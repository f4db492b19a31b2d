package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * The decode step is STUBBED with a deterministic fake (this environment
  * ships no image/audio codecs) — a real deployment swaps `fakeDecode` for a
  * codec call. Everything around it is the real Spark shape: binary column,
  * typed Dataset, mapPartitions batch iteration (one decoder instance per
  * partition, not per row — the pattern that matters at 100 TB where decoder
  * init is expensive), and explode-based frame sampling.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int, n_frames: Int)

  /** Attach an opaque binary payload column (stand-in for image/audio bytes). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("content", encode(col("text"), "utf-8"))

  /** STUB decoder: deterministic metadata from the payload. A real decoder
    * would parse the container header here; the integer arithmetic below is
    * the contract the oracle reproduces.
    */
  private def fakeDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    MediaMeta(id, n, (1 + n % 64).toInt, (1 + (n * 7) % 48).toInt, (1 + n % 24).toInt)
  }

  /** Per-partition "decode": typed Dataset path, one decoder per partition. */
  def decodeMeta(spark: SparkSession, docsWithPayload: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    docsWithPayload.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder init would go here, once per partition
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }

  /** Frame sampling: every `step`-th frame index per media row. */
  def sampleFrames(meta: DataFrame, step: Int): DataFrame =
    meta.select(col("doc_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_id"))

  final case class Resized(doc_id: Long, width: Int, height: Int,
      out_w: Int, out_h: Int, out_bytes: Long)

  /** "Resize" to fit a bounding box preserving aspect ratio — the real
    * geometry math every image pipeline runs (integer scale-fit, floor,
    * min 1px), with the pixel re-encode stubbed to a size formula (out
    * bytes = 3·w·h, an RGB buffer). Same per-partition shape as decode.
    */
  def resizeFit(spark: SparkSession, meta: DataFrame, maxW: Int, maxH: Int): Dataset[Resized] = {
    import spark.implicits._
    meta.select(col("doc_id"), col("width"), col("height"))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, w, h) =>
          // scale = min(maxW/w, maxH/h) capped at 1 (never upscale),
          // computed in integer arithmetic: out = max(1, (dim*num)/den)
          val (num, den) =
            if (w.toLong * maxH <= h.toLong * maxW) (maxH.toLong, h.toLong)
            else (maxW.toLong, w.toLong)
          val (ow, oh) =
            if (den <= num) (w, h) // already fits
            else (math.max(1L, w * num / den).toInt, math.max(1L, h * num / den).toInt)
          Resized(id, w, h, ow, oh, 3L * ow * oh)
        }
      }
  }

  /** Feature extraction: a deterministic 8-dim signature over the decoded
    * content's code points (per-bucket sums mod a prime) — the stub for an
    * embedding model, with the real distributed shape: binary in,
    * fixed-width vector out, one "model instance" per partition.
    */
  def extractFeatures(spark: SparkSession, docsWithPayload: DataFrame): DataFrame = {
    import spark.implicits._
    docsWithPayload.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // model load would go here, once per partition
        it.map { case (id, bytes) =>
          val cps = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
            .codePoints().toArray
          val f = new Array[Long](8)
          var i = 0
          while (i < cps.length) {
            f(i % 8) = (f(i % 8) + cps(i)) % 2147483647L
            i += 1
          }
          (id, f.toSeq)
        }
      }
      .toDF("doc_id", "feature")
  }
}
