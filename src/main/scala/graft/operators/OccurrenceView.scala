package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._

/** Synthetic "occurrence" fact table derived deterministically from the
  * driver-provided TPC-H `lineitem`, mirroring the reference's input schema
  * (MapBuilder.java:53-79): lat/lng, year (nullable), a basisOfRecord-like
  * enum, and the multi-tenant map-view dimensions that G1 explodes.
  *
  * Every derived column is integer arithmetic (exact in IEEE/ANSI SQL), so the
  * DuckDB oracle can reproduce it bit-for-bit — see [[OccurrenceView.OccSql]].
  *
  *  - lat10/lng10 are tenth-of-degree ints (lat = lat10/10.0), keeping all
  *    geo values exactly representable and string-formattable.
  *  - map keys: "0:0" = ALL (in every record — the deliberate skew key,
  *    MapKeysUDF.java:201-245), "1:" taxon-ish, "2:" dataset-ish,
  *    "3:" publisher-ish, "4:" country-ish.
  */
object OccurrenceView {
  val TileSize = 512
  val MaxZoom = 16
  /** pyramid threshold analog of MapBuilder.java:93 */
  val Threshold = 1000L

  /** The testdata tables are single-row-group parquet files, so the scan
    * yields ONE input partition regardless of maxPartitionBytes (parquet
    * splits at row-group granularity) — and everything up to the first
    * exchange (decode, projection math, explode, partial aggregation) would
    * run on one core. Fan out to the session default parallelism right
    * after the scan; at production scale inputs arrive in many row groups
    * and this is a no-op.
    */
  private def fanOut(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    fanOut(spark, spark.read.parquet(s"$dir/lineitem.parquet"))

  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")

  /** Normalize an `events` frame's `ts` to `tsec` (floor seconds), `tmicro`
    * (epoch micros) and `tstamp` (TIMESTAMP). The column arrives as one of:
    *  - long nanos — parquet TIMESTAMP(NANOS) under
    *    `spark.sql.legacy.parquet.nanosAsLong`;
    *  - TIMESTAMP — tz-adjusted parquet micros/millis;
    *  - TIMESTAMP_NTZ — tz-less parquet micros under Spark 4's default
    *    `spark.sql.parquet.inferTimestampNTZ.enabled`.
    * `unix_micros` only accepts TIMESTAMP, so the NTZ case must cast first;
    * the session TZ is pinned to UTC, making that cast value-preserving.
    */
  def normalizeTs(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      raw.withColumn("tsec", expr("ts div 1000000000"))
        .withColumn("tmicro", expr("ts div 1000"))
        .withColumn("tstamp", timestamp_seconds(expr("ts div 1000000000")))
    case _ =>
      val t = col("ts").cast(org.apache.spark.sql.types.TimestampType)
      raw.withColumn("tsec", unix_timestamp(t))
        .withColumn("tmicro", unix_micros(t))
        .withColumn("tstamp", t)
  }

  /** `events` with `ts` normalized via [[normalizeTs]]. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(fanOut(spark, spark.read.parquet(s"$dir/events.parquet")))

  def documents(spark: SparkSession, dir: String): DataFrame =
    fanOut(spark, spark.read.parquet(s"$dir/documents.parquet"))

  def embeddings(spark: SparkSession, dir: String): DataFrame =
    fanOut(spark, spark.read.parquet(s"$dir/embeddings.parquet"))

  /** The occurrence view. Columns:
    * lat10, lng10 (long), lat, lng (double), year (int, nullable),
    * bor_id (int 0..2 from l_returnflag), bor_year (long), map_keys
    * (array<string>), plus passthrough lineitem columns.
    */
  def occ(spark: SparkSession, dir: String): DataFrame =
    occFrom(lineitem(spark, dir))

  /** [[occ]] over a caller-supplied lineitem frame — the streaming ingest
    * path derives the view from each micro-batch of raw appends
    * (EventStream.continuousIncrementalIngest) with the SAME derivation
    * the batch side uses, so stream and batch stores compare equal.
    */
  def occFrom(li: DataFrame): DataFrame = {
    li.select(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_returnflag"), col("l_linestatus"),
        ((col("l_orderkey") * 7 + col("l_linenumber") * 13) % 1700 - 850).as("lat10"),
        ((col("l_partkey") * 17 + col("l_suppkey") * 23) % 3600 - 1800).as("lng10"),
        when(col("l_orderkey") % 20 === 0, lit(null))
          .otherwise((col("l_orderkey") % 25 + 1992)).cast("int").as("year"),
        when(col("l_returnflag") === "A", 0)
          .when(col("l_returnflag") === "N", 1)
          .otherwise(2).cast("int").as("bor_id")
      )
      .withColumn("lat", col("lat10") / 10.0)
      .withColumn("lng", col("lng10") / 10.0)
      .withColumn("bor_year",
        graft.functions.GeoFunctions.encodeBorYear(col("year"), col("bor_id")))
      .withColumn("map_keys", mapKeysArray)
  }

  /** The non-ALL view key dimensions — single source of truth shared by the
    * exploded array (G1) and the grouping-sets formulation (q63).
    */
  def viewKeyDims: Seq[Column] = Seq(
    concat(lit("1:"), col("l_partkey") % 50),
    concat(lit("2:"), col("l_suppkey")),
    concat(lit("3:"), col("l_returnflag")),
    concat(lit("4:"), col("l_orderkey") % 7))

  /** G1: the per-record array of map-view keys (MapKeysUDF.java:99-147). */
  def mapKeysArray: Column = array(lit("0:0") +: viewKeyDims: _*)

  /** The same view as a DuckDB CTE, textually shared by every oracle query. */
  val OccSql: String =
    """WITH occ AS (
      |  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
      |         l_extendedprice, l_discount, l_returnflag, l_linestatus,
      |         ((l_orderkey*7 + l_linenumber*13) % 1700) - 850 AS lat10,
      |         ((l_partkey*17 + l_suppkey*23) % 3600) - 1800 AS lng10,
      |         CAST(CASE WHEN l_orderkey % 20 = 0 THEN NULL
      |              ELSE l_orderkey % 25 + 1992 END AS INT) AS year,
      |         CAST(CASE l_returnflag WHEN 'A' THEN 0 WHEN 'N' THEN 1
      |              ELSE 2 END AS INT) AS bor_id
      |  FROM lineitem
      |), occ2 AS (
      |  SELECT *,
      |         lat10/10.0 AS lat, lng10/10.0 AS lng,
      |         CAST(COALESCE(year,0) AS BIGINT)*100 + bor_id AS bor_year,
      |         ['0:0', '1:'||(l_partkey%50), '2:'||l_suppkey,
      |          '3:'||l_returnflag, '4:'||(l_orderkey%7)] AS map_keys
      |  FROM occ
      |)""".stripMargin

  /** Events with synthetic coordinates — the ad-hoc (ES-replacement) source
    * (AdHocEventMapsResource.java:55-67 uses the event index the same way).
    */
  def eventsGeo(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("lat10", col("event_id") * 11 % 1700 - 850)
      .withColumn("lng10", (col("user_id") * 31 + col("event_id") * 3) % 3600 - 1800)
      .withColumn("lat", col("lat10") / 10.0)
      .withColumn("lng", col("lng10") / 10.0)

  val EventsGeoSql: String =
    """WITH ev AS (
      |  SELECT *,
      |         (event_id*11 % 1700) - 850 AS lat10,
      |         ((user_id*31 + event_id*3) % 3600) - 1800 AS lng10
      |  FROM events
      |), ev2 AS (
      |  SELECT *, lat10/10.0 AS lat, lng10/10.0 AS lng FROM ev
      |)""".stripMargin
}
