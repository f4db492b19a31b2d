package graft.operators

import graft.functions.PointBlob
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A3 binary form: per-view `PointFeatures` blobs, the points-store payload
  * for SMALL views (the reference serves small views from one protobuf blob
  * and large views from the tile pyramid — MapBuilder.java:92-104,
  * PointMapBuilder.java:73-92, ProtobufTiles.java:31-51).
  *
  * Spark-first shape mirrors TileEncode: one shuffle on map_key, the blob
  * built inside a typed mapGroups. Memory per group is bounded because the
  * input MUST be pre-filtered to small views (< threshold features) —
  * encoding the ALL view would materialize it in one task, which is exactly
  * why the reference bifurcates large/small.
  */
object PointEncode {

  /** pointAgg rows (map_key, lat10, lng10, bor_year, occ_count) →
    * (map_key, blob). Deterministic bytes: features sorted inside encode.
    */
  def pointBlobs(spark: SparkSession, pointAgg: DataFrame): DataFrame = {
    import spark.implicits._
    pointAgg
      .select(col("map_key"), col("lat10").cast("long"), col("lng10").cast("long"),
        col("bor_year").cast("long"), col("occ_count").cast("long"))
      .as[(String, Long, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (key: String, it: Iterator[(String, Long, Long, Long, Long)]) =>
        val rows = it.map { case (_, la, ln, by, n) => PointBlob.PointRow(la, ln, by, n) }.toSeq
        (key, PointBlob.encode(rows))
      }
      .toDF("map_key", "blob")
  }

  /** Inverse: blobs back to point rows — the serving-side decode
    * (PointResource → PointFeatureFilters in the reference).
    */
  def decodeBlobs(spark: SparkSession, blobs: DataFrame): DataFrame = {
    import spark.implicits._
    blobs.select(col("map_key"), col("blob"))
      .as[(String, Array[Byte])]
      .flatMap { case (k, b) =>
        PointBlob.decode(b).map(r => (k, r.lat10, r.lng10, r.borYear, r.count))
      }
      .toDF("map_key", "lat10", "lng10", "bor_year", "occ_count")
  }
}
