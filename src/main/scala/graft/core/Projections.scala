package graft.core

import java.lang.Math._

/** A lat/lng → global-pixel projection at a given tile size.
  *
  * Re-expressed from the reference projections
  * (gbif/maps common/.../projection/SphericalMercator.java:43-53,
  * WGS84.java:37-52, WGS84Azimuthal.java:44-96) with the two polar
  * projections hand-rolled as closed-form spherical formulas instead of
  * GeoTools transforms.
  */
sealed trait TileProjection extends Serializable {
  def tileSize: Int
  def srs: String
  def schema: TileSchema

  /** Global pixel coordinates at the given zoom; (0,0) is top-left. */
  def toGlobalPixelXY(lat: Double, lng: Double, zoom: Int): (Double, Double)

  /** Inverse: (lat, lng) of a global pixel — C6 tileBoundary support
    * (SphericalMercator.java:56-77, WGS84.java:60-74).
    */
  def fromGlobalPixelXY(gx: Double, gy: Double, zoom: Int): (Double, Double)

  /** Whether the coordinate is plottable under this projection's clip rules. */
  def isPlottable(lat: Double, lng: Double): Boolean

  /** Total pixels across the globe horizontally at this zoom. */
  def globalPixelsX(zoom: Int): Long = schema.tilesHorizontal(zoom) * tileSize
  def globalPixelsY(zoom: Int): Long = schema.tilesVertical(zoom) * tileSize

  /** C6: WGS84 bounding box (minLat, maxLat, minLng, maxLng) of tile
    * (z, x, y) expanded by `bufferFraction` of a tile on each side.
    * Computed by sampling the tile edge in pixel space and inverting —
    * handles the curved edges of the polar projections; a tile containing
    * a pole degenerates to the full longitude range (the reference's
    * quadrant fan-out, NorthPoleLAEAEurope.java:67-201 /
    * AdHocMapsResource.java:156-170).
    */
  def tileBoundary(z: Int, x: Long, y: Long, bufferFraction: Double)
      : (Double, Double, Double, Double) = {
    val b = bufferFraction * tileSize
    val x0 = x * tileSize - b
    val y0 = y * tileSize - b
    val x1 = (x + 1) * tileSize + b
    val y1 = (y + 1) * tileSize + b
    val maxPx = globalPixelsX(z).toDouble
    val maxPy = globalPixelsY(z).toDouble
    val steps = 8
    val samples = for {
      i <- 0 to steps; j <- 0 to steps
      if i == 0 || i == steps || j == 0 || j == steps // edge ring only
    } yield {
      val gx = math.min(math.max(x0 + (x1 - x0) * i / steps, 0.0), maxPx)
      val gy = math.min(math.max(y0 + (y1 - y0) * j / steps, 0.0), maxPy)
      fromGlobalPixelXY(gx, gy, z)
    }
    val lats = samples.map(_._1)
    val lngs = samples.map(_._2)
    // pole inside the tile (polar projections): lat extent reaches the pole
    // and longitude wraps fully
    val cx = maxPx / 2.0
    val poleInside = !schema.wrapX &&
      x0 <= cx && cx <= x1 && y0 <= maxPy / 2.0 && maxPy / 2.0 <= y1
    if (poleInside) {
      val poleLat = fromGlobalPixelXY(cx, maxPy / 2.0, z)._1
      (math.min(lats.min, poleLat), math.max(lats.max, poleLat), -180.0, 180.0)
    } else if (lngs.max - lngs.min > 180.0 && !schema.wrapX) {
      // antimeridian seam crosses the tile (polar schemes)
      (lats.min, lats.max, -180.0, 180.0)
    } else (lats.min, lats.max, lngs.min, lngs.max)
  }
}

object Projections {
  val EarthRadius: Double = 6378137.0

  /** Web-Mercator square clip latitude, ~85.05113° (SphericalMercator.java:36). */
  val MercatorMaxLatitude: Double = 180 / PI * (2 * atan(exp(PI)) - PI / 2)

  /** LAEA EPSG:3575 world extent in metres from the pole: sqrt(2)·R
    * (WGS84LambertAzimuthalEqualArea.java:35-36).
    */
  val LaeaExtent: Double = sqrt(2.0) * EarthRadius

  /** EPSG:3031 chosen extent in metres (WGS84AntarcticPolarStereographic.java:49). */
  val StereographicExtent: Double = 12367396.21845986

  def fromEpsg(epsg: String, tileSize: Int): TileProjection = epsg.toUpperCase match {
    case "EPSG:3857" => SphericalMercator(tileSize)
    case "EPSG:4326" => Wgs84(tileSize)
    case "EPSG:3575" => NorthPoleLaea(tileSize)
    case "EPSG:3031" => AntarcticStereographic(tileSize)
    case other       => throw new IllegalArgumentException(s"Unsupported EPSG: $other")
  }

  /** Normalize a 0..360 longitude into -180..180 (WGS84.java:80-87). */
  def to180Degrees(lng: Double): Double =
    if (lng > 180) lng - 360 else if (lng < -180) lng + 360 else lng
}

/** EPSG:3857. y formula matches SphericalMercator.java:43-48. */
final case class SphericalMercator(tileSize: Int) extends TileProjection {
  val srs = "EPSG:3857"
  val schema: TileSchema = TileSchema.WebMercator

  def toGlobalPixelXY(lat: Double, lng: Double, zoom: Int): (Double, Double) = {
    val sinLat = sin(lat * (PI / 180))
    val pixels = (tileSize.toLong << zoom).toDouble
    val y = (0.5 - log((1 + sinLat) / (1 - sinLat)) / (4 * PI)) * pixels
    val x = (lng + 180) / 360 * pixels
    (x, y)
  }

  def isPlottable(lat: Double, lng: Double): Boolean =
    lat >= -Projections.MercatorMaxLatitude && lat <= Projections.MercatorMaxLatitude &&
      lng >= -180 && lng <= 180

  def fromGlobalPixelXY(gx: Double, gy: Double, zoom: Int): (Double, Double) = {
    val pixels = (tileSize.toLong << zoom).toDouble
    val lng = gx / pixels * 360 - 180
    val u = (0.5 - gy / pixels) * 4 * PI
    val lat = toDegrees(atan(sinh(u / 2)))
    (lat, lng)
  }
}

/** EPSG:4326 Plate Carrée, two tiles wide at zoom 0 (WGS84.java:37-52). */
final case class Wgs84(tileSize: Int) extends TileProjection {
  val srs = "EPSG:4326"
  val schema: TileSchema = TileSchema.Wgs84PlateCarree

  def toGlobalPixelXY(lat: Double, lng: Double, zoom: Int): (Double, Double) = {
    val pixels = (tileSize.toLong << zoom).toDouble // pixels of ONE zoom-0 tile (hemisphere)
    val pixelsPerDegree = pixels / 180
    val x = (lng + 180) * pixelsPerDegree
    val y = (-lat + 90) * pixelsPerDegree
    (x, y)
  }

  def isPlottable(lat: Double, lng: Double): Boolean =
    lat >= -90 && lat <= 90 && lng >= -180 && lng <= 180

  def fromGlobalPixelXY(gx: Double, gy: Double, zoom: Int): (Double, Double) = {
    val pixels = (tileSize.toLong << zoom).toDouble
    (90 - gy * 180 / pixels, gx * 180 / pixels - 180)
  }
}

/** Shared world→pixel affine for azimuthal projections (WGS84Azimuthal.java:63-96):
  * offset world metres into positive space, scale to pixels, mirror y.
  */
sealed trait Azimuthal extends TileProjection {
  def extent: Double

  /** Forward projection to metres (x east, y north), centered on the pole. */
  def toMetres(lat: Double, lng: Double): (Double, Double)

  /** Inverse of [[toMetres]]. */
  def fromMetres(mx: Double, my: Double): (Double, Double)

  /** true → north polar (EPSG:3575, antimeridian seam along the map top);
    * false → south polar (EPSG:3031, seam along the bottom).
    */
  protected def northPolar: Boolean

  /** The four tiles touching the pole at the grid centre (zoom > 0)
    * (NorthPoleLAEAEurope.java:213-219).
    */
  def isPoleTile(z: Int, x: Long, y: Long): Boolean = {
    val seam = (1L << z) / 2
    z > 0 && (x == seam || x + 1 == seam) && (y == seam || y + 1 == seam)
  }

  /** C6 for azimuthal schemes — quadrant-based boundary re-expressed from
    * NorthPoleLAEAEurope.java:67-211 / WGS84AntarcticPolarStereographic.java:87-224,
    * validated against the reference's own test vectors (ProjectionSpec).
    *
    * Returns (minLat, maxLat, westLng, eastLng); westLng > eastLng means the
    * range crosses the antimeridian (circular longitude semantics — the
    * serving layer splits such a range into two scans). A pole tile spans
    * one full quadrant of longitudes from its unbuffered edge corners and
    * reaches the pole latitude.
    */
  override def tileBoundary(z: Int, x: Long, y: Long, bufferFraction: Double)
      : (Double, Double, Double, Double) = {
    if (z == 0) return (if (northPolar) (0.0, 90.0, -180.0, 180.0)
      else (-90.0, 0.0, -180.0, 180.0))
    val ts = tileSize.toDouble
    val seam = (1L << z) / 2
    val pole = isPoleTile(z, x, y)
    def inv(gx: Double, gy: Double): (Double, Double) = fromGlobalPixelXY(gx, gy, z)
    // corner naming: A(x1,y1) B(x2,y1) / C(x1,y2) D(x2,y2)
    val x1b = (x - bufferFraction) * ts; val x2b = (x + 1 + bufferFraction) * ts
    val y1b = (y - bufferFraction) * ts; val y2b = (y + 1 + bufferFraction) * ts
    val pA = inv(x1b, y1b); val pB = inv(x2b, y1b)
    val pC = inv(x1b, y2b); val pD = inv(x2b, y2b)
    val nwse = (x < seam && y < seam) || (x >= seam && y >= seam)
    // the radial corner pair spans the latitudes, the circumferential pair
    // the longitudes
    val (lat1, lat2) = if (nwse) (pA._1, pD._1) else (pB._1, pC._1)
    var (lng1, lng2) =
      if (pole) {
        // pole tiles: the ad-hoc scan fans out per quadrant, so longitudes
        // come from the unbuffered quadrant-edge corners
        if (nwse) (inv(x * ts, (y + 1) * ts)._2, inv((x + 1) * ts, y * ts)._2)
        else (inv(x * ts, y * ts)._2, inv((x + 1) * ts, (y + 1) * ts)._2)
      } else if (nwse) (pC._2, pB._2)
      else (pA._2, pD._2)
    if (!pole && bufferFraction > 0) {
      // a seam-adjacent tile buffers from the corner nearest the pole — it
      // subtends the widest longitude range; crossing the antimeridian seam
      // shifts a full turn so plain min/max orders the circular range
      if (nwse) {
        if (y + 1 == seam) lng1 = pD._2 else if (y == seam) lng2 = pA._2
        if (x + 1 == seam) lng2 = if (northPolar) pD._2 - 360 else pD._2
        else if (x == seam) lng1 = if (northPolar) pA._2 else pA._2 + 360
      } else {
        if (y + 1 == seam) lng2 = pC._2 else if (y == seam) lng1 = pB._2
        if (x + 1 == seam) lng2 = if (northPolar) pB._2 else pB._2 - 360
        else if (x == seam) lng1 = pC._2
      }
    }
    // north: the antimeridian runs along the top seam, so east-of-seam tiles
    // (NE quadrant) shift their first longitude a full turn — pole tiles and
    // unbuffered tiles included (NorthPoleLAEAEurope.java:173-177)
    if (northPolar && !nwse && x == seam) lng1 += 360
    // on the left half of the map an exact +180° edge is the west side
    if (x < seam) {
      if (lng1 == 180) lng1 = -180
      if (lng2 == 180) lng2 = -180
    }
    val (minLat, maxLat) =
      if (northPolar)
        (math.max(math.min(lat1, lat2), 0.0),
          if (pole) 90.0 else math.max(math.max(lat1, lat2), 0.0))
      else
        (if (pole) -90.0 else math.min(lat1, lat2),
          math.min(math.max(lat1, lat2), 0.0))
    val west = Projections.to180Degrees(math.min(lng1, lng2))
    val east = Projections.to180Degrees(math.max(lng1, lng2))
    // A non-pole tile at z≥1 subtends under 180° of longitude, so a wider
    // normalized span means the range really crosses the antimeridian
    // mid-tile (3575's lon0=10° rotates the antimeridian off the tile-edge
    // seam) — flip to the circular complement. Deliberate correctness fix
    // over the reference, which returns the inside-out range for such tiles
    // (NorthPoleLAEAEurope.java:199-202).
    if (!pole && east - west > 180) (minLat, maxLat, east, west)
    else (minLat, maxLat, west, east)
  }

  def toGlobalPixelXY(lat: Double, lng: Double, zoom: Int): (Double, Double) = {
    val (mx, my) = toMetres(lat, lng)
    val globalPixelExtent = (tileSize.toLong << zoom).toDouble
    val pixelsPerMetre = globalPixelExtent / extent / 2.0
    val x = (mx + extent) * pixelsPerMetre
    val y = globalPixelExtent - (my + extent) * pixelsPerMetre // mirror y
    (x, y)
  }

  def fromGlobalPixelXY(gx: Double, gy: Double, zoom: Int): (Double, Double) = {
    val globalPixelExtent = (tileSize.toLong << zoom).toDouble
    val pixelsPerMetre = globalPixelExtent / extent / 2.0
    val mx = gx / pixelsPerMetre - extent
    val my = (globalPixelExtent - gy) / pixelsPerMetre - extent
    fromMetres(mx, my)
  }
}

/** EPSG:3575 North-pole LAEA with lon0 = 10°E, spherical formula.
  *
  * The reference delegates to GeoTools (NorthPoleLAEAEurope.java:35-42); this is
  * the closed-form spherical LAEA (Snyder, "Map Projections — A Working
  * Manual", eq. 24-2..24-4 with φ1 = 90°): ρ = 2R·sin(π/4 − φ/2),
  * x = ρ·sin(λ−λ0), y = −ρ·cos(λ−λ0). Clipped to the northern hemisphere by
  * choice (NorthPoleLAEAEurope.java:54-57).
  */
final case class NorthPoleLaea(tileSize: Int) extends Azimuthal {
  val srs = "EPSG:3575"
  val schema: TileSchema = TileSchema.Polar
  val extent: Double = Projections.LaeaExtent
  protected val northPolar = true
  private val lon0 = toRadians(10.0)

  def toMetres(lat: Double, lng: Double): (Double, Double) = {
    val phi = toRadians(lat)
    val dl = toRadians(lng) - lon0
    val rho = 2.0 * Projections.EarthRadius * sin(PI / 4 - phi / 2)
    (rho * sin(dl), -rho * cos(dl))
  }

  def isPlottable(lat: Double, lng: Double): Boolean =
    lat >= 0 && lng >= -180 && lng <= 180

  def fromMetres(mx: Double, my: Double): (Double, Double) = {
    val rho = math.hypot(mx, my)
    if (rho < 1e-9) (90.0, toDegrees(lon0))
    else {
      val phi = PI / 2 - 2 * asin(math.min(1.0, rho / (2.0 * Projections.EarthRadius)))
      val lam = atan2(mx, -my) + lon0
      (toDegrees(phi), Projections.to180Degrees(toDegrees(lam)))
    }
  }
}

/** EPSG:3031 Antarctic polar stereographic (lon0 = 0, true scale at 71°S),
  * spherical-datum approximation of the reference's GeoTools transform
  * (WGS84AntarcticPolarStereographic.java:36-52). Snyder eq. 21-33/21-34 for
  * the south polar aspect: ρ = 2R·k0·tan(π/4 + φ/2), x = ρ·sin λ, y = ρ·cos λ,
  * with k0 chosen so that the projected extent of the equator matches the
  * reference's STEREOGRAPHIC_EXTENT.
  */
final case class AntarcticStereographic(tileSize: Int) extends Azimuthal {
  val srs = "EPSG:3031"
  val schema: TileSchema = TileSchema.Polar
  val extent: Double = Projections.StereographicExtent
  protected val northPolar = false
  // At the equator (φ=0) ρ = 2R·k0; the reference extent is the x of (0°,?) →
  // 2R·k0 == extent ⇒ k0 = extent / (2R).
  private val k0 = extent / (2.0 * Projections.EarthRadius)

  def toMetres(lat: Double, lng: Double): (Double, Double) = {
    val phi = toRadians(lat)
    val lam = toRadians(lng)
    val rho = 2.0 * Projections.EarthRadius * k0 * tan(PI / 4 + phi / 2)
    (rho * sin(lam), rho * cos(lam))
  }

  def isPlottable(lat: Double, lng: Double): Boolean =
    lat <= 0 && lng >= -180 && lng <= 180

  def fromMetres(mx: Double, my: Double): (Double, Double) = {
    val rho = math.hypot(mx, my)
    if (rho < 1e-9) (-90.0, 0.0)
    else {
      val phi = 2 * (atan(rho / (2.0 * Projections.EarthRadius * k0)) - PI / 4)
      val lam = atan2(mx, my)
      (toDegrees(phi), toDegrees(lam))
    }
  }
}
