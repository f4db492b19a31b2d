package graft.operators

import graft.core.YearRange
import graft.functions.GeoFunctions._
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Query-time (serving) semantics over the built point/tile tables,
  * re-expressed as DataFrame re-aggregations (reference:
  * VectorTileFilters.java:102-242, PointFeatureFilters.java:65-114,
  * HexBin.java:85-199, SquareBin.java:60-141, Capabilities.java:194-334,
  * RegressionResource.java:226-355, AdHocMapsResource.java:153-262).
  *
  * All of these operate on point aggregates (map_key, lat10, lng10, bor_year,
  * occ_count) or pixel aggregates, so at 100 TB they run over the *prebuilt*
  * salted index, not the raw fact table — each is a single partial-aggregated
  * shuffle over one view's slice.
  */
object TileServe {
  import OccurrenceView.{TileSize, MaxZoom}

  /** F6: inclusive year-range filter; unknown year (encoded 0) only passes an
    * unbounded range (Range.java:21-62 null semantics).
    */
  def yearRangeFilter(df: DataFrame, range: YearRange): DataFrame = {
    if (range.isUnbounded) df
    else {
      val year = borYearYear(col("bor_year"))
      val known = col("bor_year") >= lit(100) // encoded null-year is 0..99
      val lo = range.lo.map(y => year >= y).getOrElse(lit(true))
      val hi = range.hi.map(y => year <= y).getOrElse(lit(true))
      df.filter(known && lo && hi)
    }
  }

  /** F7: basisOfRecord filter (dictionary ids). */
  def borFilter(df: DataFrame, borIds: Seq[Int]): DataFrame =
    if (borIds.isEmpty) df else df.filter(borYearBor(col("bor_year")).isin(borIds: _*))

  /** A6/A7: per-pixel re-aggregation of a view's points into one zoom's pixel
    * space with per-year verbose counts flattened away (the "simple" tile).
    */
  def renderPixels(points: DataFrame, epsg: String, z: Int): DataFrame = {
    val shift = MaxZoom - z
    MapBuild.withPixels(points, epsg)
      .groupBy(
        col("map_key"),
        shiftright(col("px"), shift).as("px"),
        shiftright(col("py"), shift).as("py"))
      .agg(sum("occ_count").as("total"))
  }

  /** §3.2 full serving path over the BUILT store: resolve the manifest,
    * fetch one tile blob by salted key (S8), decode the MVT, apply year/bor
    * filters to its per-feature attributes (F6/F7), and re-aggregate to
    * per-pixel totals (A6) — the reference's
    * TileResource.getTile → HBaseMaps.getTile → VectorTileFilters chain.
    */
  def serveTile(spark: org.apache.spark.sql.SparkSession, workDir: String,
      epsg: String, mapKey: String, z: Int, x: Long, y: Long,
      years: YearRange, borIds: Seq[Int]): Seq[(Int, Int, Long)] = {
    val m = graft.sources.Workflow.readManifest(workDir)
      .getOrElse(throw new IllegalStateException(s"no manifest in $workDir"))
    val key = s"$epsg:$mapKey:$z:$x:$y"
    val blobs = graft.sources.KeyedSink
      .lookup(spark, s"${m.tiles}/srs=${epsg.replace(':', '_')}", 100, key)
      .select("mvt").collect()
    blobs.toSeq.flatMap { r =>
      graft.functions.Mvt.decodeTile(r.getAs[Array[Byte]](0))
        .filter(f => borIds.isEmpty || borIds.contains(f.layer.stripPrefix("bor").toInt))
        .flatMap { f =>
          val kept = f.yearCounts.collect {
            case (yr, n) if years.contains(if (yr == 0) None else Some(yr)) => n
          }.sum
          if (kept > 0) Some((f.x, f.y, kept)) else None
        }
    }.groupBy(t => (t._1, t._2))
      .map { case ((px, py), ts) => (px, py, ts.map(_._3).sum) }
      .toSeq.sortBy(t => (t._1, t._2))
  }

  /** J1: country-mask semi-join — density pixels kept only where the mask
    * view also has a pixel (VectorTileFilters.java:83-99). A broadcast-able
    * semi-join on the pixel key at any scale (the mask is one view's tile).
    */
  def maskSemiJoin(density: DataFrame, mask: DataFrame): DataFrame =
    density.join(mask.select("px", "py").distinct(), Seq("px", "py"), "left_semi")

  /** A9: square binning — `(x/cell, y/cell)` cells with summed totals
    * (SquareBin.java:60-120).
    */
  def squareBin(pixels: DataFrame, cellSize: Int): DataFrame =
    pixels
      .groupBy(
        col("map_key"),
        (col("px") / cellSize).cast("long").as("cell_x"),
        (col("py") / cellSize).cast("long").as("cell_y"))
      .agg(sum("total").as("total"))

  /** A8: hex binning on the world-wide flat-top grid (graft.core.HexGrid). */
  def hexBin(pixels: DataFrame, radius: Double): DataFrame = {
    val (q, r) = hexCell(col("px"), col("py"), radius)
    pixels
      .groupBy(col("map_key"), q.as("hex_q"), r.as("hex_r"))
      .agg(sum("total").as("total"))
  }

  /** A11: capabilities — global extent + year span + total for one view
    * (Capabilities.java:194-248). Simple min/max variant; the
    * antimeridian-aware longitude spread is CircularExtentAgg below.
    */
  def capabilities(points: DataFrame): DataFrame = {
    val year = borYearYear(col("bor_year"))
    points
      .groupBy("map_key")
      .agg(
        min(col("lat10")).as("min_lat10"),
        max(col("lat10")).as("max_lat10"),
        min(col("lng10")).as("min_lng10"),
        max(col("lng10")).as("max_lng10"),
        min(when(col("bor_year") >= 100, year)).as("min_year"),
        max(when(col("bor_year") >= 100, year)).as("max_year"),
        sum("occ_count").as("total"))
  }

  /** F8/A7: point-features-in-tile filter — keeps the pixels of one tile ±
    * buffer, honouring dateline wrap at the x-edges, and emits tile-local
    * coordinates (negative / ≥tileSize inside the buffer)
    * (Tiles.java:58-127, PointFeatureFilters.java:145-156). tx/ty are
    * columns so the tile address may come from a data-dependent join.
    */
  def pointsInTile(pixels: DataFrame, tx: Column, ty: Column, z: Int,
      tileSize: Int, buffer: Int, tilesHorizontal: Long): DataFrame = {
    val maxG = tilesHorizontal * tileSize
    val px = col("px"); val py = col("py")
    val inY = py >= ty * tileSize - buffer && py <= ty * tileSize + tileSize + buffer
    val inX = px >= tx * tileSize - buffer && px <= tx * tileSize + tileSize + buffer
    val wrapWest = tx === 0 && px >= maxG - buffer
    val wrapEast = tx === tilesHorizontal - 1 && px < buffer
    val lpx = when(wrapWest, px - maxG)
      .when(wrapEast, px + maxG - tx * tileSize)
      .otherwise(px - tx * tileSize)
    pixels
      .filter(inY && (inX || wrapWest || wrapEast))
      .select(tx.as("tx"), ty.as("ty"),
        lpx.as("lpx"), (py - ty * tileSize).as("lpy"), col("total"))
  }

  /** A11 full: antimeridian-aware longitude extent per view — find the
    * largest circular gap between occupied longitudes; the extent is the
    * complement of that gap (Capabilities.java:288-334). west10 is the
    * longitude after the gap, east10 the one before it (west > east ⟺ the
    * extent crosses the antimeridian). Deterministic tiebreak: smaller gap
    * end wins among equal gaps.
    */
  def circularExtent(points: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = points.select("map_key", "lng10").distinct()
    val w = Window.partitionBy("map_key").orderBy("lng10")
    val whole = Window.partitionBy("map_key")
    val g = d
      .withColumn("prev", lag("lng10", 1).over(w))
      .withColumn("mx", max("lng10").over(whole))
      .withColumn("gap",
        when(col("prev").isNull, col("lng10") + 3600 - col("mx"))
          .otherwise(col("lng10") - col("prev")))
      .withColumn("east_cand", coalesce(col("prev"), col("mx")))
    g.withColumn("rn",
        row_number().over(Window.partitionBy("map_key")
          .orderBy(col("gap").desc, col("lng10"))))
      .filter(col("rn") === 1)
      .select(col("map_key"), col("lng10").as("west10"), col("east_cand").as("east10"))
  }

  /** A12/A13: per-cell OLS regression of normalized yearly counts
    * (species/group per year → slope/intercept/r2/count), built on Spark's
    * codegen'd `regr_*` aggregates rather than driver-side SimpleRegression
    * (RegressionResource.java:258-314).
    *
    * speciesYearly/groupYearly: (cell, year, n) rows.
    */
  def regression(speciesYearly: DataFrame, groupYearly: DataFrame): DataFrame = {
    val s = speciesYearly.as("s")
    val g = groupYearly.as("g")
    val joined = s.join(g, Seq("cell", "year"), "inner")
      .select(col("cell"), col("year"),
        (col("s.n").cast("double") / col("g.n")).as("ratio"))
    joined
      .groupBy("cell")
      .agg(
        regr_slope(col("ratio"), col("year")).as("slope"),
        regr_intercept(col("ratio"), col("year")).as("intercept"),
        regr_count(col("ratio"), col("year")).as("n_years"))
  }

  /** S9/A10: ad-hoc geo-grid aggregation — the ES geotile replacement.
    * mode GEO_BOUNDS: per-cell bounding box + count; GEO_CENTROID: weighted
    * centroid + count (AdHocMapsResource.java:186-262).
    */
  def geotile(dfGeo: DataFrame, z: Int, bounds: Boolean): DataFrame = {
    val (px, py) = wgs84XY(col("lat"), col("lng"), z, 1) // 1px tiles ≙ geotile cells
    val cells = dfGeo
      .withColumn("cell_x", floor(px).cast("long"))
      .withColumn("cell_y", floor(py).cast("long"))
    if (bounds)
      cells.groupBy("cell_x", "cell_y").agg(
        count(lit(1)).as("doc_count"),
        min("lat10").as("min_lat10"), max("lat10").as("max_lat10"),
        min("lng10").as("min_lng10"), max("lng10").as("max_lng10"))
    else
      cells.groupBy("cell_x", "cell_y").agg(
        count(lit(1)).as("doc_count"),
        avg(col("lat10")).as("centroid_lat10"),
        avg(col("lng10")).as("centroid_lng10"))
  }
}
