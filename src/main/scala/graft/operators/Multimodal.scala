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
}
