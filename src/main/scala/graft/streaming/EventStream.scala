package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Structured Streaming path over the events table: the same hourly
  * aggregation the batch side exposes (SparkEntry q24), expressed as a
  * watermarked streaming query — late events beyond the watermark are
  * dropped, state is bounded per (window, event_type).
  *
  * The reference has no streaming surface (SURVEY.md §2.8) — "real-time" is
  * rebuild + pointer swap; this module is the forward-looking stream variant
  * of that rebuild for the training-data pipeline use case.
  */
object EventStream {

  /** File-source stream of an events directory (parquet, TIMESTAMP(NANOS)
    * read as long when nanosAsLong is set — normalized like
    * OccurrenceView.events).
    */
  def readEvents(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val raw = spark.readStream.schema(schema).parquet(dir)
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("tstamp", timestamp_seconds(expr("ts div 1000000000")))
      case _ => raw.withColumn("tstamp", col("ts"))
    }
  }

  /** Watermarked hourly tumbling-window counts per event type. */
  def hourlyCounts(stream: DataFrame): DataFrame =
    stream
      .withWatermark("tstamp", "1 hour")
      .groupBy(window(col("tstamp"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
}
