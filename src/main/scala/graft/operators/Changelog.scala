package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture merge: the merge-on-read resolution every lakehouse
  * table format performs — a base snapshot plus an ordered changelog of
  * upserts/deletes collapses to latest-wins per key. The engine-side
  * complement of sources.Workflow's whole-table version swap (S5): the
  * manifest swap replaces a TABLE atomically, this merges ROW deltas.
  */
object Changelog {

  /** Resolve a snapshot against a changelog. Both sides carry
    * (doc_id, text); the changelog adds (seq, op) with `op ∈ {u, d}` and
    * seq strictly greater than the snapshot's implicit 0. Latest seq wins
    * per key; a winning delete removes the row. Emits the live rows'
    * content fingerprint + winning seq (fingerprint, not text, so the
    * gate output stays scalar).
    *
    * Scale shape: one union (no shuffle), one window PARTITIONED BY KEY
    * (hash-parallel — the merge never sorts globally), evaluated in a
    * single pass. At table scale this is exactly the merge-on-read
    * read-path; compaction = writing the output back as the new base.
    */
  def cdcMerge(snapshot: DataFrame, changes: DataFrame): DataFrame = {
    val base = snapshot.select(col("doc_id"), col("text"),
      lit(0).as("seq"), lit("u").as("op"))
    val log = base.unionByName(
      changes.select(col("doc_id"), col("text"), col("seq"), col("op")))
    val w = Window.partitionBy("doc_id").orderBy(col("seq").desc)
    log.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "d")
      .select(col("doc_id"), md5(col("text")).as("fp"),
        col("seq").cast("int").as("last_seq"))
  }
}
