package graft.core

/** Global-pixel ↔ tile addressing, including dateline wrap and buffer rules.
  * Semantics match gbif/maps common/.../projection/Tiles.java:55-127.
  */
object Tiles {

  /** Tile address containing the given global pixel at zoom z (clamped to the
    * tile grid; Tiles.java:86-90).
    */
  def toTileXY(gx: Double, gy: Double, schema: TileSchema, z: Int, tileSize: Int): (Long, Long) = {
    val maxX = schema.tilesHorizontal(z) - 1
    val maxY = schema.tilesVertical(z) - 1
    val x = math.min(math.max(gx / tileSize, 0), maxX.toDouble).toLong
    val y = math.min(math.max(gy / tileSize, 0), maxY.toDouble).toLong
    (x, y)
  }

  /** Pixel address local to tile (x,y), with dateline wrap into the buffer of
    * edge tiles (Tiles.java:58-81). Floored to snap onto the cell raster.
    */
  def toTileLocalXY(
      gx: Double,
      gy: Double,
      schema: TileSchema,
      z: Int,
      x: Long,
      y: Long,
      tileSize: Int,
      bufferSize: Int
  ): (Long, Long) = {
    val numTilesAtZoom = schema.tilesHorizontal(z)
    val maxGlobalPixelAddress = numTilesAtZoom * tileSize

    var localX = gx - x * tileSize
    val localY = gy - y * tileSize

    if (schema.wrapX && (schema.zzTilesHorizontal > 1 || z > 0)) {
      if (x == 0 && gx >= maxGlobalPixelAddress - bufferSize)
        localX = gx - maxGlobalPixelAddress
      else if (x == numTilesAtZoom - 1 && gx < bufferSize)
        localX = gx + maxGlobalPixelAddress - x * tileSize
    }
    (math.floor(localX).toLong, math.floor(localY).toLong)
  }

  /** True if the global pixel falls on tile (x,y) ± buffer, honouring dateline
    * wrap for edge tiles (Tiles.java:104-127).
    *
    * Deliberate divergences from the reference: the wrap branch only applies
    * when the schema wraps horizontally (the reference also "wraps" the polar
    * square, producing replicas its serving filters later discard), and the
    * x==0 wrap tests against the world edge (`maxGlobalPixel - buffer`) rather
    * than `tileSize - buffer`, which at z≥1 would spuriously claim pixels of
    * interior tiles.
    */
  def tileContains(
      z: Int,
      x: Long,
      y: Long,
      tileSize: Int,
      schema: TileSchema,
      gx: Double,
      gy: Double,
      bufferPixels: Int
  ): Boolean = {
    val verticallyContained =
      gy >= y * tileSize - bufferPixels && gy <= y * tileSize + bufferPixels + tileSize
    var contained =
      gx >= x * tileSize - bufferPixels && gx <= x * tileSize + bufferPixels + tileSize &&
        verticallyContained
    if (!contained && verticallyContained && schema.wrapX) {
      val maxTileAddress = schema.tilesHorizontal(z) - 1
      val maxGlobalPixel = schema.tilesHorizontal(z) * tileSize
      if (x == 0) contained = gx >= maxGlobalPixel - bufferPixels
      else if (x == maxTileAddress) contained = gx < bufferPixels
    }
    contained
  }

  /** All tile addresses (primary + buffer-overlap replicas) a global pixel at
    * zoom z must be written to, each with its tile-local pixel. Mirrors the
    * reference generator (spark-generate-maps/.../udf/TileXYUDF.java:70-181):
    * the pixel lands on its containing tile, plus any of the 8 neighbours whose
    * buffer region it falls into, wrapping horizontally (dateline) and
    * vertically per schema.
    */
  def collectToTiles(
      gx: Double,
      gy: Double,
      schema: TileSchema,
      z: Int,
      tileSize: Int,
      bufferSize: Int
  ): Seq[(Long, Long, Long, Long)] = {
    val (tx, ty) = toTileXY(gx, gy, schema, z, tileSize)
    val (lx, ly) = toTileLocalXY(gx, gy, schema, z, tx, ty, tileSize, bufferSize)

    val out = scala.collection.mutable.LinkedHashSet[(Long, Long, Long, Long)]()
    out += ((tx, ty, lx, ly))

    val numX = schema.tilesHorizontal(z)
    val numY = schema.tilesVertical(z)
    def addOn(dx: Int, dy: Int): Unit = {
      // Horizontal wrap only for wrapping schemas (dateline adjacency); the
      // tile grid is never adjacent across the top/bottom edge. The reference
      // wraps both unconditionally (TileXYUDF.java:202-223) and relies on
      // query-time containment filters to drop the junk replicas.
      var nx = tx + dx
      val ny = ty + dy
      if (ny < 0 || ny >= numY) return
      if (nx < 0 || nx >= numX) {
        if (!schema.wrapX) return
        nx = if (nx < 0) numX - 1 else 0
      }
      if (tileContains(z, nx, ny, tileSize, schema, gx, gy, bufferSize)) {
        val (nlx, nly) = toTileLocalXY(gx, gy, schema, z, nx, ny, tileSize, bufferSize)
        out += ((nx, ny, nlx, nly))
      }
    }

    val north = ly < bufferSize
    val south = ly >= tileSize - bufferSize
    val west = lx < bufferSize
    val east = lx >= tileSize - bufferSize
    if (north) { addOn(0, -1); if (west) addOn(-1, -1); if (east) addOn(1, -1) }
    if (east) addOn(1, 0)
    if (south) { addOn(0, 1); if (west) addOn(-1, 1); if (east) addOn(1, 1) }
    if (west) addOn(-1, 0)
    out.toSeq
  }
}
