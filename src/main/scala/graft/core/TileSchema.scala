package graft.core

/** How tiles are arranged over the extent of a projection.
  *
  * Semantics match the reference tile schemes
  * (gbif/maps common/.../projection/TileSchema.java:22-46): Web Mercator is a
  * single square tile at zoom 0 that wraps horizontally, WGS84 Plate Carrée is
  * two tiles wide at zoom 0, and the polar projections are single non-wrapping
  * squares.
  */
sealed abstract class TileSchema(
    val zzTilesHorizontal: Int,
    val zzTilesVertical: Int,
    val wrapX: Boolean
) {
  def tilesHorizontal(zoom: Int): Long = zzTilesHorizontal.toLong << zoom
  def tilesVertical(zoom: Int): Long = zzTilesVertical.toLong << zoom
}

object TileSchema {
  case object WebMercator extends TileSchema(1, 1, true)
  case object Wgs84PlateCarree extends TileSchema(2, 1, true)
  case object Polar extends TileSchema(1, 1, false)

  def fromSrs(srs: String): TileSchema = srs.toUpperCase match {
    case "EPSG:3857"              => WebMercator
    case "EPSG:4326"              => Wgs84PlateCarree
    case "EPSG:3575" | "EPSG:3031" => Polar
    case other => throw new IllegalArgumentException(s"Unsupported SRS: $other")
  }
}
