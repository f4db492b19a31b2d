package graft.sources

import graft.core.Salt
import graft.functions.GeoFunctions.saltOf
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S4/O8/O9: the salted, sorted, partition-aligned keyed store — the
  * parquet stand-in for the reference's HFile→HBase pipeline
  * (TileMapBuilder.java:236-252, SaltPrefixPartitioner.java:21-37).
  *
  * Layout: one directory partition per salt (`salt=NN/`), rows sorted by the
  * full salted key within each partition (HFiles require sorted keys; sorted
  * parquet gives row-group min/max skipping on point lookups). The salt is
  * `Java String.hashCode(key) & 0x0fffffff % modulus`, byte-compatible with
  * the reference's rowkeys. At scale: modulus == number of output
  * partitions == pre-split regions; lookups prune to 1 directory + the
  * row groups covering the key.
  */
object KeyedSink {

  /** Write `df` keyed by `keyCol`, salted into `modulus` sorted partitions. */
  def writeSalted(df: DataFrame, keyCol: Column, modulus: Int, path: String): Unit = {
    // the salt expression resolves on THIS frame's session, whatever thread
    // or session is active
    graft.functions.JavaHashExpr.register(df.sparkSession)
    val digits = Salt(modulus).digitCount
    df.withColumn("key", keyCol)
      .withColumn("salt", saltOf(col("key"), modulus))
      .withColumn("salted_key",
        concat_ws(":", lpad(col("salt"), digits, "0"), col("key")))
      .repartition(modulus, col("salt"))
      // leading with `salt` satisfies the dynamic-partition writer's required
      // ordering, so it does NOT inject its own (unstable, salt-only) sort —
      // which would destroy the key order inside each file
      .sortWithinPartitions("salt", "salted_key")
      .write.mode("overwrite").partitionBy("salt").parquet(path)
  }

  /** Point lookup — the HBase-GET analog: salt-directory pruning + key
    * predicate pushdown into sorted row groups.
    */
  def lookup(spark: SparkSession, path: String, modulus: Int, key: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("salt") === Salt(modulus).saltOf(key) && col("key") === key)
}
