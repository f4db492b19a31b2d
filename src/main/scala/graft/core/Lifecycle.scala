package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Structural persist lifecycle — the replacement for the round-8
  * caller-owned convention ("sweep consumers clearCache per query").
  *
  * The problem it solves: an operator persists an intermediate because the
  * RESULT plan reads it from several branches, but the returned lazy plan
  * still references the cache entry, so the operator can't unpersist
  * before returning and the entry outlives the call (pinned until some
  * caller remembers to clear it).
  *
  * [[withPersisted]] makes the lifecycle structural: persist the inputs,
  * build the result plan, force it ONCE via eager `localCheckpoint` (the
  * branches read the cached inputs exactly as intended), then drop the
  * input cache entries before returning. The returned frame is backed by
  * block-manager storage with truncated lineage; its blocks are released
  * by the ContextCleaner when the frame becomes unreachable — no SQL-cache
  * entry survives the call (`spark.sharedState.cacheManager` stays empty,
  * OperatorSpec-asserted).
  *
  * Scale notes, explicit because this trades laziness for hygiene:
  *  - the materialized frame is the operator's OUTPUT (audit rows, pair
  *    lists, per-source profiles) — bounded by result size, never by the
  *    corpus; the big intermediates live only for the checkpoint job.
  *  - `localCheckpoint` truncates lineage without a reliable store, so a
  *    lost executor after the call can't recompute those blocks. In
  *    local[n] (this harness) that's moot; on a 1000-executor cluster the
  *    same shape writes the result to a table/checkpoint dir instead —
  *    the structural point (inputs unpinned on exit) is identical.
  */
object Lifecycle {

  /** Persist `inputs` for the scope of building + materializing `body`,
    * then unpersist them. Returns the eagerly-materialized result.
    */
  def withPersisted(inputs: DataFrame*)(body: => DataFrame): DataFrame = {
    inputs.foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
    try body.localCheckpoint(eager = true)
    finally inputs.foreach(_.unpersist(blocking = false))
  }
}
