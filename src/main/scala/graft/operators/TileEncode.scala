package graft.operators

import graft.functions.Mvt
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A5 final stage: encode each tile's pixels into an MVT binary blob.
  *
  * Spark-first shape: the per-tile payload is built inside a typed
  * `groupByKey.mapGroups` — exactly one shuffle on the tile key (the same
  * data movement as the reference's collect_list + RDD mapToPair,
  * TileMapBuilder.java:184-229, without materializing the row array in a
  * generic aggregation buffer first). Memory per group is bounded by a
  * tile's feature count (≤ tileSize² × #bors), independent of input scale.
  */
object TileEncode {
  import OccurrenceView.TileSize

  /** pixelsAtZ: (map_key, px, py, bor_year, occ_count) at zoom z →
    * (map_key, z, tx, ty, mvt bytes). One shuffle on the tile key, blob
    * built inside a typed mapGroups with memory bounded by a tile's feature
    * count. (A collect_list(struct)+UDF variant was measured ~20% slower —
    * struct-array materialization in the aggregation buffer outweighs
    * staying in Tungsten rows; the reference reached the same conclusion
    * and dropped to RDDs for its encode, TileMapBuilder.java:216-229.)
    */
  def mvtTiles(spark: SparkSession, pixelsAtZ: DataFrame, z: Int): DataFrame = {
    import spark.implicits._
    pixelsAtZ
      .select(
        col("map_key"),
        (col("px") / TileSize).cast("long").as("tx"),
        (col("py") / TileSize).cast("long").as("ty"),
        pmod(col("px"), lit(TileSize)).cast("int").as("lpx"),
        pmod(col("py"), lit(TileSize)).cast("int").as("lpy"),
        col("bor_year").cast("long").as("bor_year"),
        col("occ_count").cast("long").as("occ_count"))
      .as[(String, Long, Long, Int, Int, Long, Long)]
      .groupByKey { case (k, tx, ty, _, _, _, _) => (k, tx, ty) }
      .mapGroups { (key: (String, Long, Long), it: Iterator[(String, Long, Long, Int, Int, Long, Long)]) =>
        val (k, tx, ty) = key
        val fs = it.map { case (_, _, _, lpx, lpy, borYear, n) =>
          Mvt.PixelFeature(lpx, lpy, (borYear % 100).toInt, (borYear / 100).toInt, n)
        }.toArray
        (k, z, tx, ty, Mvt.encodeTile(fs, TileSize))
      }
      .toDF("map_key", "z", "tx", "ty", "mvt")
  }
}
