package graft.operators

import graft.functions.GeoFunctions._
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** The batch map-build dataflow, re-expressed as declarative DataFrame
  * pipelines (reference: MapBuilder.java:118-177, PointMapBuilder.java:48-116,
  * TileMapBuilder.java:52-204).
  *
  * Scale notes (designed for ~100 TB input on a real cluster):
  *  - G1 `explode` multiplies rows ~5×; the very next operator is always a
  *    partial-aggregating `groupBy`, so map-side combine collapses the blowup
  *    before the shuffle.
  *  - The "0:0" ALL view is in every record's key array — the deliberate skew
  *    key. Aggregation keys always include pixel/borYear (millions of groups
  *    per view), so no single reducer sees a whole view; the final per-key
  *    rollups are tiny (one row per view).
  *  - The pyramid derives each zoom from the previous zoom's output
  *    (input halves each level) instead of re-reading the z-max table per
  *    zoom as the reference does (TileMapBuilder.java:162-170) — strictly
  *    less shuffle I/O at identical results.
  */
object MapBuild {
  import OccurrenceView.{TileSize, MaxZoom}

  /** G1: one row per (record, mapKey). */
  def explodeMapKeys(occ: DataFrame): DataFrame =
    occ.withColumn("map_key", explode(col("map_keys"))).drop("map_keys")

  /** A1: per-view counts — the large/small bifurcation stat
    * (MapBuilder.java:205-229).
    */
  def viewCounts(occ: DataFrame): DataFrame =
    explodeMapKeys(occ).groupBy("map_key").agg(count(lit(1)).as("occ_count"))

  /** A1 HAVING: views at/above the pyramid threshold. Small enough to
    * broadcast (bounded by #views, not #records).
    */
  def largeViews(occ: DataFrame, threshold: Long): DataFrame =
    viewCounts(occ).filter(col("occ_count") >= threshold)

  /** F4/J3: keep only records of large (or small) views via broadcast
    * semi-/anti-join — never a driver collect at scale.
    */
  def filterToViews(exploded: DataFrame, views: DataFrame, keep: Boolean): DataFrame = {
    val joinType = if (keep) "left_semi" else "left_anti"
    exploded.join(broadcast(views.select("map_key")), Seq("map_key"), joinType)
  }

  /** A14/O5: dictionary-encode view keys to dense ints (key_id = rank of the
    * key in ascending order, 0-based). The key set is bounded by #views — not
    * #records — so the reference collects it to the driver and broadcasts
    * dense ints (TileMapBuilder.java:55-57,255-267); we do the same. The
    * obvious `row_number().over(Window.orderBy(...))` alternative moves ALL
    * rows to a single partition (Spark warns exactly that) and serializes
    * the build through one task at scale — never use it here.
    */
  def dictionaryEncode(spark: org.apache.spark.sql.SparkSession, viewCounts: DataFrame): DataFrame = {
    // persist before the driver collect: the key collect AND the returned
    // lineage both consume the counts, which would otherwise re-run the
    // full upstream aggregation twice. Structural lifecycle (round 9):
    // the dictionary table is view-domain-sized, so withPersisted
    // checkpoints it and drops the cache entry on exit. The persisted
    // frame is an INTERIOR projection, not the caller's argument —
    // withPersisted unpersists what it wraps, and a callee must never
    // drop a cache entry the caller may own on a frame it was handed.
    val vc = viewCounts.select(col("map_key"), col("occ_count"))
    graft.core.Lifecycle.withPersisted(vc) {
      val keys = vc.select("map_key").collect().map(_.getString(0)).sorted
      val dict = spark.sparkContext.broadcast(keys.zipWithIndex.toMap)
      val keyId = udf { (k: String) => dict.value(k) }
      vc.select(col("map_key"), keyId(col("map_key")).as("key_id"),
        col("occ_count"))
    }
  }

  /** A2: point-map aggregate — distinct locations per (view, borYear). */
  def pointAgg(exploded: DataFrame): DataFrame =
    exploded
      .groupBy("map_key", "lat10", "lng10", "bor_year")
      .agg(count(lit(1)).as("occ_count"))

  // JIT while-loop fold over CODE POINTS (Dedup.cpFold — the repo's text
  // hash convention; matches the oracle's per-character UTF-8 fold)
  private val hash32 = udf { (s: String) => Dedup.cpFold(s, 4294967296L) }

  /** A3: per-view feature rollup with an order-insensitive content
    * fingerprint (sum of per-feature 32-bit hashes). The reference collects
    * structs then proto-encodes (PointMapBuilder.java:73-92); a commutative
    * checksum instead of collect_list+sort keeps the aggregation fully
    * partial (map-side combine) and immune to the `0:0` ALL-view skew — no
    * single reducer ever materializes a whole view's feature list.
    */
  def featureRollup(pointAgg: DataFrame): DataFrame =
    pointAgg
      .groupBy("map_key")
      .agg(
        count(lit(1)).as("n_features"),
        sum("occ_count").as("total"),
        (sum(hash32(
          concat_ws(",", col("lat10"), col("lng10"), col("bor_year"), col("occ_count"))
        )) % 4294967296L).as("blob_fp")
      )

  /** Global pixel columns at max zoom for the given projection (C2+F3):
    * unplottable rows are dropped, matching `WHERE xy.x IS NOT NULL`
    * (TileMapBuilder.java:158-159).
    */
  def withPixels(df: DataFrame, epsg: String): DataFrame = {
    val (px, py) = pixelAtMaxZoom(epsg, col("lat"), col("lng"), MaxZoom, TileSize)
    df.filter(isPlottable(epsg, col("lat"), col("lng")))
      .withColumn("px", px)
      .withColumn("py", py)
  }

  /** A4: max-zoom pixel aggregate, computed once per projection
    * (TileMapBuilder.java:140-160). Takes the UN-exploded occurrence view:
    * the projection (transcendental math for 3857/polar) runs once per
    * record, BEFORE the ~5× mapKeys explode — the explode only replicates
    * the finished integer pixel columns.
    */
  def pixelAgg(occ: DataFrame, epsg: String): DataFrame =
    explodeMapKeys(withPixels(occ, epsg))
      .groupBy("map_key", "px", "py", "bor_year")
      .agg(count(lit(1)).as("occ_count"))

  /** A4 at an arbitrary zoom: aggregate DIRECTLY at zoom `z` — shift the
    * max-zoom pixel address BEFORE the first shuffle. When a consumer's top
    * zoom is below MaxZoom there is no reason to materialize the z16
    * grouping first: at z16 nearly every row is its own group (no map-side
    * combine), so the two-step pixelAgg→rollup runs two full shuffles where
    * one aggregation at the target zoom — with real combine — suffices.
    * Totals are identical (count grouped coarser ≡ summed fine counts);
    * the z16 q05/q06/q26/q27 gates still exercise [[pixelAgg]] itself.
    */
  def pixelAggAt(occ: DataFrame, epsg: String, z: Int): DataFrame =
    pixelAggAt(occ, epsg, z, withBor = true)

  /** As [[pixelAggAt]]; `withBor = false` collapses the bor_year dimension
    * in the SAME (only) shuffle for consumers that never read it (the
    * buffer-replica tile stats) — a trailing collapse re-aggregation would
    * be a second full shuffle of the pixel table.
    */
  def pixelAggAt(occ: DataFrame, epsg: String, z: Int, withBor: Boolean): DataFrame = {
    val base = Seq(
      col("map_key"),
      shiftright(col("px"), MaxZoom - z).as("px"),
      shiftright(col("py"), MaxZoom - z).as("py"))
    val keys = if (withBor) base :+ col("bor_year") else base
    explodeMapKeys(withPixels(occ, epsg))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("occ_count"))
  }

  /** A5 level 1: re-aggregate a finer-zoom pixel table to zoom `z`.
    * `fromZoom` is the zoom of `pixels`' px/py addressing. Keeps the
    * bor_year dimension iff the input carries it.
    */
  def rollupToZoom(pixels: DataFrame, fromZoom: Int, z: Int): DataFrame = {
    require(z <= fromZoom)
    val base = Seq(
      col("map_key"),
      shiftright(col("px"), fromZoom - z).as("px"),
      shiftright(col("py"), fromZoom - z).as("py"))
    val keys =
      if (pixels.columns.contains("bor_year")) base :+ col("bor_year") else base
    pixels
      .groupBy(keys: _*)
      .agg(sum("occ_count").as("occ_count"))
  }

  /** A5 levels 2–3: group pixels of one zoom into tiles, one row per
    * (map_key, z, tx, ty) with the tile's distinct-pixel count and total.
    * The distinct aggregate makes this ONE exchange: Catalyst's
    * distinct-agg planning partial-aggregates on (tile, px, py) map-side —
    * collapsing any per-record or per-bor duplication before the wire —
    * then shuffles once on the tile key, where the old per-pixel-groupBy →
    * per-tile-groupBy formulation paid two keyed exchanges for the same
    * values.
    */
  def tileAssembly(pixelsAtZ: DataFrame, z: Int): DataFrame =
    pixelsAtZ
      .groupBy(
        col("map_key"),
        tileAddr(col("px"), TileSize).as("tx"),
        tileAddr(col("py"), TileSize).as("ty"))
      .agg(
        countDistinct(col("px"), col("py")).as("n_pixels"),
        sum("occ_count").as("total"))
      .withColumn("z", lit(z))

  /** Raw (unaggregated) per-record pixels at zoom `z` with occ_count = 1:
    * feeds aggregations that re-group on their own key anyway (tile
    * assembly, binning), where a prior pixel-level groupBy would only add a
    * shuffle that partial aggregation makes redundant.
    */
  def rawPixelsAt(occ: DataFrame, epsg: String, z: Int): DataFrame =
    explodeMapKeys(withPixels(occ, epsg))
      .select(col("map_key"),
        shiftright(col("px"), MaxZoom - z).as("px"),
        shiftright(col("py"), MaxZoom - z).as("py"),
        lit(1L).as("occ_count"))

  /** Replica tiles of one zoom-z global pixel, packed (tx<<32)|ty: a
    * primitive long array explodes without the per-element tuple row the
    * (tx, ty) struct formulation pays.
    */
  private def replicaUdf(epsg: String, z: Int, buffer: Int) = {
    val schema = graft.core.TileSchema.fromSrs(epsg)
    udf { (px: Long, py: Long) =>
      graft.core.Tiles.collectToTiles(px.toDouble, py.toDouble, schema, z, TileSize, buffer)
        .map { case (tx, ty, _, _) => (tx << 32) | ty }.toArray
    }
  }

  /** G2: buffer-replica tile explode — each zoom-z global pixel lands on its
    * containing tile plus any neighbour (incl. dateline-wrapped) whose 64 px
    * buffer it falls into, then tiles aggregate counts over their pixels
    * *including buffer replicas* (TileXYUDF.java:70-181). The replica
    * generator is the core library's `Tiles.collectToTiles` (unit/property
    * tested); explode multiplies rows ≤4× and the immediately following
    * partial aggregation collapses it before the shuffle.
    */
  def tileReplicaAssembly(pixelsAtZ: DataFrame, epsg: String, z: Int): DataFrame = {
    val replicas = replicaUdf(epsg, z, buffer = 64)
    // input already collapsed to one row per (map_key, px, py)? then the
    // bor-collapse re-aggregation (a full shuffle) is unnecessary
    val collapsed =
      if (pixelsAtZ.columns.contains("bor_year"))
        pixelsAtZ.groupBy("map_key", "px", "py").agg(sum("occ_count").as("occ_count"))
      else pixelsAtZ.select("map_key", "px", "py", "occ_count")
    collapsed
      .withColumn("t", explode(replicas(col("px"), col("py"))))
      .groupBy(col("map_key"),
        shiftright(col("t"), 32).as("tx"),
        col("t").bitwiseAND(lit(0xffffffffL)).as("ty"))
      .agg(count(lit(1)).as("n_pixels"), sum("occ_count").as("total"))
      .withColumn("z", lit(z))
  }

  // NOTE (measured): a one-exchange variant feeding RAW records through the
  // replica explode into a distinct aggregate was tried and LOST (sf0.1
  // 4.0 s vs 3.4 s): the ≤4× replica explode multiplies the rows the
  // distinct partial-agg must carry at (tile, px, py) grain, outweighing
  // the saved pixel-collapse exchange. Collapse-then-explode stands.

  /** Full pyramid for one projection: iterative halving from max zoom.
    * Returns one DataFrame unioned over the requested zooms with column z —
    * at scale each level is a separate job writing its own partition, but the
    * lineage shape (each zoom consumes the previous) is what matters.
    */
  /** Tile stats for every zoom in [lowZ, highZ] from a zoom-`highZ`
    * per-pixel table (map_key, px, py, total), in one explode + two keyed
    * aggregations — the one-pass core shared by [[pyramidOnePass]] and each
    * chunk of [[pyramidIterative]], so the two strategies agree by
    * construction.
    */
  /** Plain keyed long-sum aggregation (partial + final, map-side combine
    * intact), for callers that route through [[noCoalesceSession]].
    *
    * History of the AQE interaction, so the two rejected fixes aren't
    * re-tried: the 10× probe showed AQE's byte-sized partition coalescer
    * merging the pyramid's aggregation exchanges until the in-memory agg
    * state (10–20× the compressed shuffle bytes) sort-spilled 50 GB
    * (q45 63–100 s vs 24 s with coalescing off). Fix #1 —
    * repartition-by-keys BEFORE the groupBy (REPARTITION_BY_NUM, which the
    * coalescer never touches) — pinned the exchange but moved it BELOW the
    * partial aggregate: the raw explode-amplified stream crossed the wire
    * uncombined and the BASE-scale pyramid regressed ~2.4× (probe-measured
    * 5.8→14.2 s). Fix #2 — a mapPartitions hash pre-combiner feeding the
    * pinned exchange — restored combine but paid boxed-row overhead for
    * every exploded row and OOM'd the 32-thread base run outright. The
    * shipped fix scopes the COALESCER off per pyramid QUERY via a forked
    * session ([[noCoalesceSession]]): partial aggregation, exchange
    * placement, and codegen all stay exactly as Catalyst plans them, and
    * the iterative graph queries (whose shrinking per-round shuffles NEED
    * coalescing — q47/q66 measured 2× slower without it) keep it on.
    */
  private def sumAgg(df: DataFrame, keyN: Seq[String],
      valN: Seq[String]): DataFrame = {
    val sums = valN.map(c => sum(col(c)).as(c))
    df.groupBy(keyN.map(col): _*).agg(sums.head, sums.tail: _*)
  }

  /** A session forked off `s` (shared SparkContext, cache and catalog
    * state; independent SQLConf) with AQE partition coalescing DISABLED —
    * the per-query scope for the pyramid family's explode-amplified
    * aggregations (see [[sumAgg]]'s history note). Callers build the WHOLE
    * query on the returned session so every exchange in the pyramid plan
    * keeps its full partition count.
    */
  def noCoalesceSession(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.SparkSession = {
    val s2 = s.newSession()
    // newSession() seeds its SQLConf from the BUILDER-time configs, not the
    // parent's runtime state — without this copy a harness that re-sizes
    // spark.sql.shuffle.partitions at runtime (BenchScale does, to hold
    // per-partition volume constant across the scale-up) would silently run
    // the pyramid at the stale width (probe-measured: 10x data in the
    // builder-time 32 partitions spilled 49 GB)
    s.conf.getAll.foreach { case (k, v) =>
      try s2.conf.set(k, v)
      catch { case scala.util.control.NonFatal(_) => () } // static confs
    }
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2
  }

  /** ALGEBRAIC long encoding of the 5 map-view keys — the q37/A14
    * dictionary-encoding idea (VERDICT r11 #3, guide §2.3 "narrower
    * types") with NO dictionary and NO driver collect: every key type's
    * value is already a bounded integer of the record (ALL = 0,
    * l_partkey%50, l_suppkey, bor_id, l_orderkey%7), so the dense key
    * derives row-locally as type·2⁴⁰ + value and decodes row-locally at
    * the pyramid's edge ([[decodeMapKey]] ∘ encode ≡ the string key, so
    * results are bit-identical — oracle-gated by the whole pyramid
    * family). Through the pyramid's keyed exchanges the key is then ONE
    * 8-byte long instead of a 16-byte UnsafeRow string slot, hashes and
    * compares as a long, and — at the source — skips building 5 concat'd
    * strings per record entirely. Value bound 2⁴⁰ (the house id bound):
    * l_suppkey reaches 2⁴⁰ only past SF 10¹⁰ (~10 EB), far beyond any
    * deployment; types are single digits 0–4 by [[OccurrenceView]]
    * construction.
    */
  private val KeyShift = 1L << 40

  private[graft] def mapKeyIdsArray: Column = array(
    lit(0L), // "0:0" — the ALL view
    lit(1L * KeyShift) + col("l_partkey") % 50,
    lit(2L * KeyShift) + col("l_suppkey"),
    lit(3L * KeyShift) + col("bor_id"), // A→0, N→1, R→2 (bor_id's map)
    lit(4L * KeyShift) + col("l_orderkey") % 7)

  /** Inverse of the algebraic encoding: long key → the exact view-key
    * string [[OccurrenceView.mapKeysArray]] builds. Row-local, applied
    * once at the pyramid's OUTPUT (after the last keyed exchange).
    */
  private[graft] def decodeMapKey(k: Column): Column = {
    val t = shiftright(k, 40)
    val v = k.bitwiseAND(lit(KeyShift - 1))
    concat(t.cast("string"), lit(":"),
      when(t === 3, when(v === 0, lit("A")).when(v === 1, lit("N"))
        .otherwise(lit("R")))
        .otherwise(v.cast("string")))
  }

  /** Encode an EXISTING string map_key (a stored state's) to the long
    * form — one row-local parse, paid once per state row so the
    * incremental recompute's three keyed exchanges run long-keyed.
    * Only valid on the house key strings ("t:v", t a single digit,
    * v an integer or the bor letter) — everything [[pyramidState]] /
    * [[writePrunedState]] ever write, by construction.
    */
  private[graft] def encodeMapKey(k: Column): Column = {
    val t = substring(k, 1, 1).cast("long")
    val vs = substring(k, 3, 24)
    val v = when(t === 3, when(vs === "A", lit(0L)).when(vs === "N", lit(1L))
      .otherwise(lit(2L)))
      .otherwise(vs.cast("long"))
    shiftleft(t, 40) + v
  }

  private[graft] def levelStats(top: DataFrame, lowZ: Int, highZ: Int): DataFrame = {
    require(lowZ >= 0 && highZ <= MaxZoom,
      s"levelStats zooms must sit in [0, $MaxZoom], got [$lowZ, $highZ]")
    val zs = array((lowZ to highZ).map(lit): _*)
    // NOTE (measured): fusing the pair below into one distinct aggregate
    // (countDistinct(px, py) + sum at the tile key) ran 1.6× SLOWER at
    // sf0.1 — mixing distinct and plain aggregates plans an Expand that
    // doubles every input row before the exchange. Two lean keyed
    // aggregations beat one Expand-doubled one; the q08 tileAssembly case
    // wins with countDistinct only because it starts from raw records and
    // drops TWO exchanges, not one.
    //
    // Round 12 (§2.3): (z, px, py) PACK into ONE long through both keyed
    // exchanges — z ≤ MaxZoom = 16 < 2⁶ and px, py < TileSize·2^z ≤ 2²⁵
    // are PIXEL-ADDRESSING bounds (data-independent, so the packing is
    // exact at any corpus scale; the require above pins it). Key slots
    // per row drop 4 → 2 in both exchanges; unpack is row-local after
    // the last aggregation. Same-session A/B at the q182 shape (OptLab
    // pieces pyr_enc vs pyr_enc_nopack): numbers in OPTIMIZATION_r12.md.
    val perPixel = sumAgg(
      top
        .withColumn("z", explode(zs))
        .select(col("map_key"),
          (col("z").cast("long") * lit(1L << 50)
            + expr(s"shiftright(px, $highZ - z)") * lit(1L << 25)
            + expr(s"shiftright(py, $highZ - z)")).as("zxy"),
          col("total")),
      Seq("map_key", "zxy"), Seq("total"))
    // tile key: the same pack with the TileShift low bits of px and py
    // dropped — ztxy = z·2³² + tx·2¹⁶ + ty (tx, ty < 2¹⁶)
    val tx = shiftright(col("zxy"), 25 + TileShift)
      .bitwiseAND(lit((1L << (25 - TileShift)) - 1))
    val ty = shiftright(col("zxy").bitwiseAND(lit((1L << 25) - 1)), TileShift)
    sumAgg(
      perPixel.select(col("map_key"),
        (shiftright(col("zxy"), 50) * lit(1L << 32)
          + tx * lit(1L << 16) + ty).as("ztxy"),
        lit(1L).as("n_pixels"),
        col("total")),
      Seq("map_key", "ztxy"), Seq("n_pixels", "total"))
      .select(col("map_key"),
        shiftright(col("ztxy"), 16).bitwiseAND(lit(0xffffL)).as("tx"),
        col("ztxy").bitwiseAND(lit(0xffffL)).as("ty"),
        col("n_pixels"), col("total"),
        shiftright(col("ztxy"), 32).cast("int").as("z"))
  }

  /** Aggregate raw records ONCE, directly at (maxZoom, no-bor) granularity:
    * the pyramid's tile stats never use bor_year and the top level sits
    * below MaxZoom, so the shift runs before the only shuffle and map-side
    * combine collapses the explode output straight to ~4^maxZoom groups
    * (the old pixelAgg→collapse→rollup chain shuffled three times, the
    * first at z16 where almost nothing combines).
    */
  private def topLevel(occ: DataFrame, epsg: String, maxZoom: Int): DataFrame =
    sumAgg(
      explodeMapKeys(withPixels(occ, epsg))
        .select(
          col("map_key"),
          shiftright(col("px"), MaxZoom - maxZoom).as("px"),
          shiftright(col("py"), MaxZoom - maxZoom).as("py"),
          lit(1L).as("total")),
      Seq("map_key", "px", "py"), Seq("total"))

  /** [[topLevel]] with the map_key LONG-ENCODED at the source (round 12,
    * guide §2.3): the explode emits [[mapKeyIdsArray]] longs straight from
    * the record's integer columns — no per-record string building, and
    * every downstream keyed exchange carries an 8-byte long. Used by the
    * pyramid BUILDERS (q45/q109/q182), which decode at the edge;
    * [[pyramidState]] keeps the string form — it is the stored-state
    * schema the incremental/store paths contract on.
    */
  private def topLevelEnc(occ: DataFrame, epsg: String, maxZoom: Int): DataFrame =
    sumAgg(
      withPixels(occ, epsg)
        .select(
          explode(mapKeyIdsArray).as("map_key"),
          shiftright(col("px"), MaxZoom - maxZoom).as("px"),
          shiftright(col("py"), MaxZoom - maxZoom).as("py"))
        .withColumn("total", lit(1L)),
      Seq("map_key", "px", "py"), Seq("total"))

  /** Decode a long-keyed tile-stats frame to the output contract (string
    * map_key, same column order) — one row-local projection AFTER the
    * last keyed exchange.
    */
  private def decodeStats(stats: DataFrame): DataFrame =
    stats.withColumn("map_key", decodeMapKey(col("map_key")))

  /** Full pyramid in ONE aggregation pass: each top-level pixel row is
    * exploded to every requested zoom (z, px >> (maxZoom-z), py >> ...) and
    * a single groupBy produces all levels at once. The ×nLevels row
    * amplification happens AFTER the top-level aggregate (input is already
    * ~4^maxZoom groups, not raw records) and collapses by map-side combine,
    * so the cost is one shuffle of ~1.33× the top table vs the iterative
    * chain's per-level shuffle + persist + materialization-barrier jobs.
    * The crossover: amplification grows linearly with nLevels while the
    * iterative chain's total shuffle volume is bounded by ~1.33× regardless
    * of depth — one-pass wins for shallow pyramids (≤8 levels, the serving
    * z0–z6 case), iterative for deep ones (z16 builds). [[pyramid]]
    * dispatches on that. Levels are identical either way: sum grouped
    * coarser ≡ summed fine sums. The crossover is SOFT in data volume:
    * measured at 10× sf0.1 (z0–z6, warm cache, 320 partitions), one-pass
    * 41.0 s vs iterative 37.7 s — within run noise, so depth stays the
    * only dispatch input.
    */
  def pyramidOnePass(occ: DataFrame, epsg: String, minZoom: Int, maxZoom: Int): DataFrame =
    decodeStats(levelStats(topLevelEnc(occ, epsg, maxZoom), minZoom, maxZoom))

  /** Pyramid strategy dispatch: one-pass for shallow pyramids, chunked
    * iterative halving (with per-chunk materialization barriers) for deep
    * ones — see [[pyramidOnePass]] for the crossover argument.
    */
  def pyramid(occ: DataFrame, epsg: String, minZoom: Int, maxZoom: Int): DataFrame =
    if (maxZoom - minZoom <= 8) pyramidOnePass(occ, epsg, minZoom, maxZoom)
    else pyramidIterative(occ, epsg, minZoom, maxZoom)

  /** Deep-pyramid builder (the reference's z16 production shape,
    * TileMapBuilder.java:52-70): processes the zoom range in CHUNKS of up
    * to [[PyramidChunk]] levels. Each chunk is one [[levelStats]] pass over
    * a persisted per-pixel top table; between chunks the top rolls up
    * `chunk` levels in a single keyed aggregation. Compared to the previous
    * one-barrier-per-level chain (z0–z10 = 11 sequential persist+count
    * jobs; measured 13.2 s at sf0.1), this runs ⌈depth/7⌉ barriers (z0–z10
    * = 2, z0–z16 = 3) while keeping the property that makes iterative win
    * at depth: no explode span ever exceeds 7 levels, so per-chunk shuffle
    * volume stays ~1.33× the chunk's top regardless of total depth. The
    * persist is the materialization barrier each chunk AND the next rollup
    * both consume (the reference writes each level to a table for the same
    * reason — O4, MapBuilder.java:179-199); at production scale it becomes
    * a parquet write per chunk, and the top shrinks ~4^7 per chunk.
    */
  def pyramidIterative(occ: DataFrame, epsg: String, minZoom: Int, maxZoom: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    var top = topLevelEnc(occ, epsg, maxZoom)
    top.persist(StorageLevel.MEMORY_AND_DISK).count() // materialize barrier
    var highZ = maxZoom
    var out: DataFrame = null
    while (highZ >= minZoom) {
      val lowZ = math.max(minZoom, highZ - PyramidChunk + 1)
      val chunk = levelStats(top, lowZ, highZ)
      out = if (out == null) chunk else out.unionByName(chunk)
      if (lowZ > minZoom) {
        // every chunk top stays persisted until the result is consumed —
        // the union output references all of them; sizes shrink ~4^7/chunk
        top = sumAgg(
          top.select(
            col("map_key"),
            shiftright(col("px"), highZ - lowZ + 1).as("px"),
            shiftright(col("py"), highZ - lowZ + 1).as("py"),
            col("total")),
          Seq("map_key", "px", "py"), Seq("total"))
        top.persist(StorageLevel.MEMORY_AND_DISK).count()
      }
      highZ = lowZ - 1
    }
    decodeStats(out)
  }

  private val PyramidChunk = 7

  /** log2(TileSize): global pixel → tile index is a right shift, so the
    * zoom shift and the tile shift compose into ONE shiftright below. */
  private val TileShift = Integer.numberOfTrailingZeros(TileSize)

  /** Per-pixel top-level table for `epsg` at `maxZoom` — the SUM-MERGEABLE
    * state representation of a pyramid: every level's tile stats are a
    * deterministic function of it ([[levelStats]] / [[pyramidFromState]]),
    * and a new ingest batch merges into it by keyed addition (counts only
    * grow). This is the handle a long-lived tile store keeps between
    * ingests for [[incrementalPyramid]]; the reference instead rebuilds the
    * full pyramid per snapshot (TileMapBuilder.java:52-70) — incremental
    * maintenance is the beyond-reference scale path.
    */
  def pyramidState(occ: DataFrame, epsg: String, maxZoom: Int): DataFrame =
    topLevel(occ, epsg, maxZoom)

  /** All-level tile stats from a [[pyramidState]] table (the second half of
    * [[pyramidOnePass]], exposed so a stored state can be re-served without
    * re-aggregating raw records).
    */
  def pyramidFromState(state: DataFrame, minZoom: Int, maxZoom: Int): DataFrame =
    levelStats(state, minZoom, maxZoom)

  /** Incremental pyramid maintenance: given the stored `state`
    * ([[pyramidState]] over everything ingested so far), the `pyramid`
    * built from it, and a new `deltaOcc` batch, produce the updated
    * pyramid WITHOUT rebuilding clean tiles.
    *
    * Mechanics — all delta-proportional:
    *  1. the delta's own top-level pixel table (one aggregation of the
    *     batch);
    *  2. dirty tile keys = the z-ancestor tiles of delta pixels, per zoom —
    *     ≤ |delta pixels| × nLevels rows, collapsed by distinct and
    *     broadcast;
    *  3. state merge = keyed addition (union + sum at pixel grain);
    *  4. recompute tile stats ONLY under dirty tiles: the broadcast
    *     semi-join sits BEFORE the first exchange of the recompute, so the
    *     shuffled volume is the pixels inside dirty tiles (the delta's
    *     spatial footprint), not the corpus. A dirty z0 tile bounds the
    *     recompute at TileSize² pixels per (view, tile) — tile grain, never
    *     corpus grain.
    *  5. clean tiles stream through from the stored pyramid via a
    *     broadcast anti-join (no shuffle).
    *
    * n_pixels (count of live zoom-z pixels per tile) is NOT mergeable from
    * tile stats alone — a delta can light up a pixel that already existed —
    * which is exactly why the recompute works from the merged pixel-grain
    * state rather than patching tile rows.
    *
    * The dirty set must stay broadcastable: an ingest batch whose distinct
    * pixel footprint × nLevels exceeds the broadcast budget should fall
    * back to [[pyramid]] (a rebuild is then cheaper anyway — the delta
    * touches most tiles).
    */
  /** Distinct-cardinality pyramid (ALL view): for every (z, tx, ty) tile,
    * the HLL estimate of DISTINCT part keys in it, with the exact count as
    * ground truth. The analytics the count pyramid can't answer ("how many
    * distinct species in this tile?") — and the sketch mergeability story
    * composed with the pyramid: registers are built ONCE at the max zoom
    * (one corpus pass, ≤ m rows per occupied tile after map-side partial
    * max), and every coarser level derives by register-wise MAX up the
    * tile tree — a parent's sketch is exactly the merge of its children's,
    * so the rollup input shrinks 4× per level and the corpus is never
    * re-read. Exact distinct at every zoom would re-shuffle corpus-grain
    * (tile, key) pairs per level — the sketch path ships 16 ints per tile.
    */
  def pyramidDistinct(occ: DataFrame, epsg: String, minZoom: Int, maxZoom: Int): DataFrame = {
    val shiftTop = MaxZoom - maxZoom + TileShift
    val base = withPixels(occ, epsg).select(
      shiftright(col("px"), shiftTop).as("tx"),
      shiftright(col("py"), shiftTop).as("ty"),
      Sketch.tokenHash(col("l_partkey").cast("string")).as("h"),
      col("l_partkey"))
    val zs = array((minZoom to maxZoom).map(lit): _*)
    val topRegs = Sketch.hllRegisterRows(base, Seq("tx", "ty"), col("h"))
    val regsAll = topRegs
      .withColumn("z", explode(zs))
      .groupBy(col("z"),
        expr(s"shiftright(tx, $maxZoom - z)").as("tx"),
        expr(s"shiftright(ty, $maxZoom - z)").as("ty"),
        col("reg"))
      .agg(max("m_reg").as("m_reg"))
    val est = Sketch.hllEstimateRows(regsAll, Seq("z", "tx", "ty"), "est")
    // exact ground truth, collapse-before-amplify: distinct at top grain
    // first, then the ×levels explode over the collapsed set only
    val tru = base.select("tx", "ty", "l_partkey").distinct()
      .withColumn("z", explode(zs))
      .select(col("z"),
        expr(s"shiftright(tx, $maxZoom - z)").as("tx"),
        expr(s"shiftright(ty, $maxZoom - z)").as("ty"),
        col("l_partkey"))
      .distinct()
      .groupBy("z", "tx", "ty").agg(count(lit(1)).as("true_distinct"))
    tru.join(est, Seq("z", "tx", "ty"))
      .select("z", "tx", "ty", "true_distinct", "est")
  }

  def incrementalPyramid(state: DataFrame, pyramid: DataFrame, deltaOcc: DataFrame,
      epsg: String, minZoom: Int, maxZoom: Int): DataFrame =
    // deltaTop materialized once (round 11): the dirty-key chain and the
    // state merge both consume it — uncheckpointed, the delta aggregation
    // re-ran per consumer. Delta-footprint-bounded, the same justification
    // as [[incrementalPyramidAuto]]'s existing checkpoint.
    incrementalPyramidFromTop(state, pyramid,
      topLevel(deltaOcc, epsg, maxZoom).localCheckpoint(), minZoom, maxZoom)

  /** [[incrementalPyramid]] over a caller-prepared delta TOP-LEVEL pixel
    * table — so [[incrementalPyramidAuto]] can size the dirty set from the
    * same (persisted) deltaTop it then passes through, running the delta
    * aggregation once per ingest instead of twice.
    */
  def incrementalPyramidFromTop(state: DataFrame, pyramid: DataFrame,
      deltaTop: DataFrame, minZoom: Int, maxZoom: Int): DataFrame = {
    require(minZoom >= 0 && maxZoom <= MaxZoom, // the key pack's bound
      s"zooms must sit in [0, $MaxZoom], got [$minZoom, $maxZoom]")
    val zs = array((minZoom to maxZoom).map(lit): _*)
    // the recompute runs LONG-KEYED (round 12, guide §2.3): state and
    // deltaTop keep their stored string schema (the contract), but one
    // row-local [[encodeMapKey]] at entry puts an 8-byte long through the
    // merge aggregation, the dirty semi-join and both recompute
    // aggregations; [[decodeStats]] restores the string after the last
    // exchange. The clean passthrough stays string-keyed — its anti-join
    // probes the stored pyramid, so dirty is decoded on the (tiny)
    // broadcast side instead of encoding the pyramid side.
    val stateE = state.withColumn("map_key", encodeMapKey(col("map_key")))
    val deltaE = deltaTop.withColumn("map_key", encodeMapKey(col("map_key")))
    // dirty feeds TWO broadcast builds (the semi-join prune and the
    // clean-tile anti-join), and each broadcast build is its own job —
    // materialized once (round 11) so the delta aggregation + explode +
    // distinct chain doesn't re-run per build. Bounded by the documented
    // broadcast budget (≤ |delta pixels| × nLevels), so the checkpoint is
    // delta-footprint-sized. (z, tx, ty) ride as ONE packed long
    // (ztxy = z·2³² + tx·2¹⁶ + ty — the levelStats pack; stage-drilled:
    // the recompute's per-pixel exchange wrote 17.7 M rows / 183 MB at
    // sf0.1 with 6-column keys).
    val dirty = deltaE
      .withColumn("z", explode(zs))
      .select(col("map_key"),
        (col("z").cast("long") * lit(1L << 32)
          + expr(s"shiftright(px, $maxZoom - z + $TileShift)") * lit(1L << 16)
          + expr(s"shiftright(py, $maxZoom - z + $TileShift)")).as("ztxy"))
      .distinct()
      .localCheckpoint()
    val merged = sumAgg(stateE.unionByName(deltaE),
      Seq("map_key", "px", "py"), Seq("total"))
    // recompute keys packed as in levelStats: the semi-join probes
    // (map_key, ztxy) BEFORE the first exchange (the pruning point is
    // unchanged); the per-pixel aggregation keys (map_key, zxy); tile key
    // and output columns derive row-locally after.
    val zxyCol = (col("z").cast("long") * lit(1L << 50)
      + expr(s"shiftright(px, $maxZoom - z)") * lit(1L << 25)
      + expr(s"shiftright(py, $maxZoom - z)"))
    val ztxyOfZxy = shiftright(col("zxy"), 50) * lit(1L << 32) +
      shiftright(col("zxy"), 25 + TileShift)
        .bitwiseAND(lit((1L << (25 - TileShift)) - 1)) * lit(1L << 16) +
      shiftright(col("zxy").bitwiseAND(lit((1L << 25) - 1)), TileShift)
    val recomputed = merged
      .withColumn("z", explode(zs))
      .select(col("map_key"), zxyCol.as("zxy"), col("total"))
      .withColumn("ztxy", ztxyOfZxy)
      .join(broadcast(dirty), Seq("map_key", "ztxy"), "left_semi")
      .groupBy("map_key", "zxy")
      .agg(sum("total").as("total"))
      .select(col("map_key"), ztxyOfZxy.as("ztxy"), col("total"))
      .groupBy("map_key", "ztxy")
      .agg(count(lit(1)).as("n_pixels"), sum("total").as("total"))
      .select(decodeMapKey(col("map_key")).as("map_key"),
        shiftright(col("ztxy"), 16).bitwiseAND(lit(0xffffL)).as("tx"),
        col("ztxy").bitwiseAND(lit(0xffffL)).as("ty"),
        col("n_pixels"), col("total"),
        shiftright(col("ztxy"), 32).cast("int").as("z"))
    val dirtyStr = dirty.select(decodeMapKey(col("map_key")).as("map_key"),
      shiftright(col("ztxy"), 32).cast("int").as("z"),
      shiftright(col("ztxy"), 16).bitwiseAND(lit(0xffffL)).as("tx"),
      col("ztxy").bitwiseAND(lit(0xffffL)).as("ty"))
    pyramid.join(broadcast(dirtyStr), Seq("map_key", "z", "tx", "ty"), "left_anti")
      .select("map_key", "tx", "ty", "n_pixels", "total", "z")
      .unionByName(recomputed)
  }

  /** [[incrementalPyramid]] with its documented broadcast-budget caveat
    * OPERATIONALIZED: the dirty-tile set must stay broadcastable, and an
    * ingest whose per-zoom ancestor footprint exceeds `maxDirtyKeys`
    * dirties most of the pyramid anyway — so past the bound this falls
    * back to a rebuild from the merged state ([[pyramidFromState]]): same
    * result (the incremental path's oracle IS the rebuild), no oversized
    * broadcast, and the rebuild is the cheaper plan exactly when the
    * fallback fires. Costs one count() of the (collapsed, ≤ footprint ×
    * nLevels) dirty set before choosing.
    */
  def incrementalPyramidAuto(state: DataFrame, pyramid: DataFrame,
      deltaOcc: DataFrame, epsg: String, minZoom: Int, maxZoom: Int,
      maxDirtyKeys: Long = 8000000L): DataFrame = {
    // eagerly checkpointed so the sizing count AND the chosen plan read
    // ONE delta aggregation (previously the count discarded its deltaTop
    // and the incremental path recomputed it — the whole delta pipeline
    // twice per ingest). localCheckpoint, not persist (structural round-9
    // lifecycle): deltaTop is the SMALL side (the delta footprint), its
    // blocks are freed by the ContextCleaner with the returned plan, and
    // no SQL-cache entry exists to leak — the result itself stays lazy
    // because it is pyramid-sized (checkpointing the OUTPUT would
    // double-materialize the store write).
    val deltaTop = topLevel(deltaOcc, epsg, maxZoom).localCheckpoint()
    val zs = array((minZoom to maxZoom).map(lit): _*)
    val nDirty = deltaTop
      .withColumn("z", explode(zs))
      .select(col("map_key"), col("z"),
        expr(s"shiftright(px, $maxZoom - z + $TileShift)").as("tx"),
        expr(s"shiftright(py, $maxZoom - z + $TileShift)").as("ty"))
      .distinct().count()
    if (nDirty > maxDirtyKeys)
      pyramidFromState(
        sumAgg(state.unionByName(deltaTop), Seq("map_key", "px", "py"), Seq("total")),
        minZoom, maxZoom)
    else incrementalPyramidFromTop(state, pyramid, deltaTop, minZoom, maxZoom)
  }

  /** Coarse-cell partition value of a maxZoom-grain pixel: the zoom-`zc`
    * tile cell containing it, encoded `(cx << zc) | cy`. Spatial only (no
    * map_key) so the layout stays ≤ 4^zc directories.
    */
  private def coarseCell(px: Column, py: Column, maxZoom: Int, zc: Int): Column = {
    val shiftC = TileShift + (maxZoom - zc)
    (shiftright(px, shiftC) * lit(1L << zc) + shiftright(py, shiftC)).cast("int")
  }

  /** Persist a [[pyramidState]] table in the layout [[incrementalPyramidPruned]]
    * prunes against: the full-resolution state partitioned by coarse cell
    * `pt` (zoom-`zc` tile of each pixel — directory-level partition
    * pruning skips every clean cell's files on the next ingest), plus the
    * zc-grain rollup as a side table (4^(maxZoom−zc)× smaller; at zc=2,
    * maxZoom=6 that is a 256× reduction) from which the few coarse levels
    * (z < zc) recompute without touching the full state.
    */
  def writePrunedState(state: DataFrame, path: String, maxZoom: Int, zc: Int): Unit =
    writePrunedStateAs(state, path, maxZoom, zc, Nil, Seq("total"))

  /** Within-cell salt buckets for pruned-state fine writes. The write
    * repartitions on (pt, salt) instead of pt alone: `partitionBy("pt")`
    * still yields one DIRECTORY per coarse cell (the pruned reader's
    * layout), but a cell's rows spread across up to this many write tasks
    * instead of serializing through one — write parallelism scales with
    * cells × salt, independent of how hot any one cell is, and
    * files-per-cell stays bounded at the salt count.
    */
  val StateSaltBuckets = 8

  /** Write one fine-state table in the prunable layout (partitioned by
    * coarse cell, salted within cell). Shared by [[writePrunedStateAs]]
    * and the store lifecycle's dirty-cell rewrite
    * (Workflow.incrementalUpdate), so the layout exists once.
    *
    * AQE interplay (intended): the salt bounds the MAXIMUM tasks per cell;
    * partition coalescing may still merge below-advisory-size (pt, salt)
    * partitions — so tiny cells collapse toward one file (fewer small
    * files), while a genuinely hot cell's salt splits sit above the
    * advisory size and keep their parallelism. The SinkSpec salt test
    * disables coalescing to observe the full split at sandbox scale.
    */
  private[graft] def writeFineCells(cells: DataFrame, finePath: String,
      maxZoom: Int, zc: Int): Unit = {
    require(zc <= maxZoom && zc >= 0,
      s"need 0 <= zc <= maxZoom, got zc=$zc maxZoom=$maxZoom")
    cells
      .withColumn("pt", coarseCell(col("px"), col("py"), maxZoom, zc))
      .repartition(col("pt"),
        pmod(hash(col("px"), col("py")), lit(StateSaltBuckets)))
      .write.mode("overwrite").partitionBy("pt").parquet(finePath)
  }

  /** Parameterized pruned-state writer — ONE implementation of the
    * fine/coarse layout for every state schema: `extraKeys` are key columns
    * beyond (map_key, px, py) (the store lifecycle threads bor_year
    * through), `valueCols` the sum-mergeable values ("total" here,
    * "occ_count" there). [[writePrunedState]] and Workflow.writeState both
    * delegate here, so a layout change happens in one place.
    */
  private[graft] def writePrunedStateAs(state: DataFrame, path: String,
      maxZoom: Int, zc: Int, extraKeys: Seq[String],
      valueCols: Seq[String]): Unit = {
    writeFineCells(state, s"$path/fine", maxZoom, zc)
    sumAgg(
      state.select((Seq(col("map_key"),
          shiftright(col("px"), maxZoom - zc).as("px"),
          shiftright(col("py"), maxZoom - zc).as("py")) ++
        (extraKeys ++ valueCols).map(col)): _*),
      Seq("map_key", "px", "py") ++ extraKeys, valueCols)
      .write.mode("overwrite").parquet(s"$path/coarse")
  }

  /** The delta's coarse-cell footprint — the value list for the partition
    * filter. Bounded driver collect (≤ 4^zc values, the documented
    * watch-list class).
    */
  private[graft] def dirtyCells(deltaTop: DataFrame, maxZoom: Int, zc: Int): Seq[Int] =
    deltaTop.select(coarseCell(col("px"), col("py"), maxZoom, zc).as("pt"))
      .distinct().collect().map(_.getInt(0)).toSeq

  /** Pruned fine-state merge: dirty cells' files (partition filter — clean
    * cells' files never open) ∪ delta top, collapsed by keyed addition.
    */
  private[graft] def mergedFineState(spark: org.apache.spark.sql.SparkSession,
      statePath: String, deltaTop: DataFrame, dirtyPts: Seq[Int],
      extraKeys: Seq[String], valueCols: Seq[String]): DataFrame = {
    val cols = Seq("map_key", "px", "py") ++ extraKeys ++ valueCols
    val fine = spark.read.parquet(s"$statePath/fine")
      .filter(col("pt").isin(dirtyPts: _*))
      .select(cols.map(col): _*)
    sumAgg(fine.unionByName(deltaTop.select(cols.map(col): _*)),
      Seq("map_key", "px", "py") ++ extraKeys, valueCols)
  }

  /** Coarse side-table merge: the delta collapsed to zc grain, added into
    * the stored rollup by keyed addition (full rewrite of the
    * 4^(maxZoom−zc)×-smaller table).
    */
  private[graft] def mergedCoarseState(spark: org.apache.spark.sql.SparkSession,
      statePath: String, deltaTop: DataFrame, maxZoom: Int, zc: Int,
      extraKeys: Seq[String], valueCols: Seq[String]): DataFrame = {
    val deltaCoarse = sumAgg(
      deltaTop.select((Seq(col("map_key"),
          shiftright(col("px"), maxZoom - zc).as("px"),
          shiftright(col("py"), maxZoom - zc).as("py")) ++
        (extraKeys ++ valueCols).map(col)): _*),
      Seq("map_key", "px", "py") ++ extraKeys, valueCols)
    sumAgg(
      spark.read.parquet(s"$statePath/coarse").unionByName(deltaCoarse),
      Seq("map_key", "px", "py") ++ extraKeys, valueCols)
  }

  /** [[incrementalPyramid]] with a DELTA-PROPORTIONAL STATE SCAN: the
    * stored state is read through partition pruning instead of scanned
    * whole per ingest (the round-6 audit's one scale caveat on q111 — the
    * shuffle volume was already delta-proportional, the scan was
    * state-proportional).
    *
    * Mechanics on top of [[incrementalPyramid]]'s:
    *  - the full-resolution state (written by [[writePrunedState]],
    *    partitioned by zoom-`zc` coarse cell) is read with
    *    `pt IN (delta's coarse footprint)` — a partition filter, so clean
    *    cells' files are never opened. Correct for every level z ≥ zc: a
    *    dirty z-tile lies inside one zc-cell, and that cell contains the
    *    delta pixel that dirtied it, so all pixels a dirty-tile recompute
    *    needs live in dirty cells.
    *  - levels z < zc (dirty tiles there span clean cells too — a dirty
    *    z0 tile is the world) recompute from the stored zc-grain rollup
    *    instead: 4^(maxZoom−zc)× smaller than the state, maintained by the
    *    same keyed addition, and pixel occupancy is monotone under
    *    coarsening so n_pixels/total at z < zc derive from zc grain
    *    exactly.
    *  - the delta's coarse footprint is a bounded driver collect (≤ 4^zc
    *    values — it parameterizes the partition filter, same watch-list
    *    class as the dictionary/codebook collects).
    *
    * Total read per ingest: dirty-cell files + the coarse side table —
    * O(delta footprint + state/4^(maxZoom−zc)) instead of O(state). At
    * 100 TB you size zc so the coarse table is a rounding error (or chain
    * a second coarse level).
    */
  def incrementalPyramidPruned(spark: org.apache.spark.sql.SparkSession,
      statePath: String, pyramid: DataFrame, deltaOcc: DataFrame,
      epsg: String, minZoom: Int, maxZoom: Int, zc: Int): DataFrame = {
    require(zc <= maxZoom && minZoom <= maxZoom,
      s"need zc <= maxZoom and minZoom <= maxZoom, got $minZoom/$zc/$maxZoom")
    require(minZoom >= 0 && maxZoom <= MaxZoom, // the key pack's bound
      s"zooms must sit in [0, $MaxZoom], got [$minZoom, $maxZoom]")
    val deltaTop = topLevel(deltaOcc, epsg, maxZoom)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val zs = array((minZoom to maxZoom).map(lit): _*)
    // the recompute runs LONG-KEYED past the (schema-contracted) state
    // read, exactly as in [[incrementalPyramidFromTop]] (round 12):
    // encode row-locally at entry, decode after the last exchange; the
    // merge aggregations inside mergedFine/CoarseState keep the string
    // schema Workflow's state writer contracts on.
    // three broadcast builds read this (fine semi, coarse semi, clean
    // anti) — materialized once, same rationale and bound as
    // [[incrementalPyramidFromTop]]'s dirty checkpoint (round 11)
    val dirty = deltaTop
      .withColumn("map_key", encodeMapKey(col("map_key")))
      .withColumn("z", explode(zs))
      .select(col("map_key"),
        (col("z").cast("long") * lit(1L << 32)
          + expr(s"shiftright(px, $maxZoom - z + $TileShift)") * lit(1L << 16)
          + expr(s"shiftright(py, $maxZoom - z + $TileShift)")).as("ztxy"))
      .distinct()
      .localCheckpoint()
    val dirtyPts = dirtyCells(deltaTop, maxZoom, zc) // bounded: ≤ 4^zc values

    // packed keys exactly as incrementalPyramidFromTop's recompute
    def tileStats(pixels: DataFrame, grainZoom: Int, zLo: Int, zHi: Int): DataFrame = {
      val ztxyOfZxy = shiftright(col("zxy"), 50) * lit(1L << 32) +
        shiftright(col("zxy"), 25 + TileShift)
          .bitwiseAND(lit((1L << (25 - TileShift)) - 1)) * lit(1L << 16) +
        shiftright(col("zxy").bitwiseAND(lit((1L << 25) - 1)), TileShift)
      pixels
        .withColumn("map_key", encodeMapKey(col("map_key")))
        .withColumn("z", explode(array((zLo to zHi).map(lit): _*)))
        .select(col("map_key"),
          (col("z").cast("long") * lit(1L << 50)
            + expr(s"shiftright(px, $grainZoom - z)") * lit(1L << 25)
            + expr(s"shiftright(py, $grainZoom - z)")).as("zxy"),
          col("total"))
        .withColumn("ztxy", ztxyOfZxy)
        .join(broadcast(dirty), Seq("map_key", "ztxy"), "left_semi")
        .groupBy("map_key", "zxy")
        .agg(sum("total").as("total"))
        .select(col("map_key"), ztxyOfZxy.as("ztxy"), col("total"))
        .groupBy("map_key", "ztxy")
        .agg(count(lit(1)).as("n_pixels"), sum("total").as("total"))
        .select(decodeMapKey(col("map_key")).as("map_key"),
          shiftright(col("ztxy"), 16).bitwiseAND(lit(0xffffL)).as("tx"),
          col("ztxy").bitwiseAND(lit(0xffffL)).as("ty"),
          col("n_pixels"), col("total"),
          shiftright(col("ztxy"), 32).cast("int").as("z"))
    }

    // fine levels (z >= zc): pruned state read — the partition filter is
    // the whole point ([[mergedFineState]] keeps it a direct filter on the
    // partition column)
    val mergedFine =
      mergedFineState(spark, statePath, deltaTop, dirtyPts, Nil, Seq("total"))
    // fine levels start at zc — or at minZoom when the request begins
    // above the coarse cut (then the coarse table never enters)
    val recomputedFine = tileStats(mergedFine, maxZoom, math.max(zc, minZoom), maxZoom)

    // coarse levels (z < zc): from the small zc-grain side table
    val recomputed =
      if (minZoom >= zc) recomputedFine
      else {
        val mergedCoarse = mergedCoarseState(
          spark, statePath, deltaTop, maxZoom, zc, Nil, Seq("total"))
        recomputedFine.unionByName(tileStats(mergedCoarse, zc, minZoom, zc - 1))
      }
    val dirtyStr = dirty.select(decodeMapKey(col("map_key")).as("map_key"),
      shiftright(col("ztxy"), 32).cast("int").as("z"),
      shiftright(col("ztxy"), 16).bitwiseAND(lit(0xffffL)).as("tx"),
      col("ztxy").bitwiseAND(lit(0xffffL)).as("ty"))
    pyramid.join(broadcast(dirtyStr), Seq("map_key", "z", "tx", "ty"), "left_anti")
      .select("map_key", "tx", "ty", "n_pixels", "total", "z")
      .unionByName(recomputed)
  }
}
