package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left-side event, the most recent right-side event
  * with `rightTime <= leftTime` under the same key. Spark has no native
  * ASOF JOIN; the composed-operator formulation is a UNION + single
  * sort-window carry-forward:
  *
  *   union both sides, tag right rows 0 / left rows 1, sort each key's
  *   partition by (time, tag, id), and carry the latest right-side values
  *   forward with last(..., ignoreNulls) over an unbounded-preceding row
  *   frame. Left rows then read their match directly.
  *
  * Scale shape: ONE shuffle on the key (vs two for a join-based plan), no
  * range join, no per-row binary search; the window is a running
  * accumulator (rows frame), so Spark streams each partition in sort order
  * without buffering it. Ties at identical timestamps resolve to "right row
  * wins" (tag 0 sorts first), matching ASOF's `>=` semantics; among
  * same-timestamp right rows the largest id wins deterministically.
  * Skewed keys: salt by coarse time bucket and stitch bucket boundaries
  * (carry each bucket's final state into the next) — the standard
  * sessionize-at-scale refinement; unnecessary for bounded per-key volumes.
  */
object AsOfJoin {

  /** Events formulation: each `leftType` row joined as-of to the latest
    * preceding `rightType` row of the same user. `events` must carry
    * `event_id, user_id, event_type, value, tmicro`. Emits
    * (event_id, user_id, err_event_id, lag_micros, err_value), inner
    * semantics (left rows with no preceding right row are dropped).
    */
  def eventAsOf(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin(leftType, rightType))
      .withColumn("tag", when(col("event_type") === rightType, 0).otherwise(1))
    val w = Window.partitionBy("user_id")
      .orderBy(col("tmicro").asc, col("tag").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the matched right row as ONE struct: per-column carries with
    // last(ignoreNulls) would tear the row when a carried FIELD is null
    // (err_value read from an older event than err_event_id); the struct is
    // null exactly on left rows, so ignoreNulls skips those while null
    // fields INSIDE the matched row survive intact. Still a single Window
    // expression — one in-partition pass over one sort.
    val rightRow = last(
      when(col("tag") === 0, struct(col("event_id"), col("tmicro"), col("value"))),
      ignoreNulls = true).over(w)
    tagged
      .select(col("*"), rightRow.as("m"))
      .filter(col("tag") === 1 && col("m").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("m.event_id").as("err_event_id"),
        (col("tmicro") - col("m.tmicro")).as("lag_micros"),
        col("m.value").as("err_value"))
  }
}
