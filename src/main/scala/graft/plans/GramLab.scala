package graft.plans

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gram-exchange A/B for the ExactSubstr core — the measurement behind
  * the round-9 hashed-gram switch. The round-8 verdict ranked "the gram
  * shuffles carry L-char strings (~L× the corpus bytes)" as the repo's
  * one remaining constant-factor scale hazard; the fix exchanges the
  * 63-bit gram key (8 bytes) instead. This lab times
  * `exactSubstringSpans` under BOTH keyings on the x10 documents replica
  * (BenchScale's, built here if absent) and prints wall seconds plus the
  * per-arm shuffle read/write bytes from a stage listener — the direct
  * evidence for the shuffle-byte reduction, recorded in PROFILE.md.
  *
  * Run: `sbt "runMain graft.plans.GramLab [baseSfDir]"`.
  */
object GramLab {

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = 10
    val scalePath = s"/tmp/graft-scale-x$reps/documents.parquet"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "320")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("gram-lab").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // THE x10 replica recipe — BenchScale's own builder (one
    // implementation; this lab's premise "same replica as the probe"
    // holds by construction, and a stale replica can't be half-matched)
    if (!new java.io.File(scalePath).exists())
      graft.BenchScale.replicateDocuments(spark, baseDir, scalePath, reps)
    val docs = spark.read.parquet(scalePath)
    docs.write.format("noop").mode("overwrite").save() // page into OS cache

    val metrics = new graft.BenchScale.StageMetrics
    spark.sparkContext.addSparkListener(metrics)
    def run(name: String, df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warmup/JIT
      spark.catalog.clearCache()
      System.gc()
      metrics.reset()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[gram-lab] $name%-14s wall=$dt%6.2fs " +
        f"shufW=${metrics.shuffleWrite / 1e6}%8.1fMB " +
        f"shufR=${metrics.shuffleRead / 1e6}%8.1fMB " +
        f"execCPU=${metrics.stageTimeMs / 1e3}%7.1fs")
    }
    run("string-gram", Dedup.exactSubstringSpans(docs, 40, 0))
    run("hashed-63", Dedup.exactSubstringSpans(docs, 40, 63))
    spark.stop()
  }
}
