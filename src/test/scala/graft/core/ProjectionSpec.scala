package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Projection vectors ported from the reference tests
  * (SphericalMercatorTest.java:43-63, WGS84Test.java:23-40).
  */
class ProjectionSpec extends AnyFunSuite with Matchers {
  val eps = 1e-5
  val L85 = 85.0511287798066

  def assertXY(actual: (Double, Double), ex: Double, ey: Double): Unit = {
    actual._1 shouldBe ex +- eps
    actual._2 shouldBe ey +- eps
  }

  test("mercator plottable clip at ±85.05113") {
    val sm = SphericalMercator(512)
    sm.isPlottable(L85, 0) shouldBe true
    sm.isPlottable(-L85, 0) shouldBe true
    sm.isPlottable(L85 + eps, 0) shouldBe false
    sm.isPlottable(-L85 - eps, 0) shouldBe false
  }

  test("mercator global pixel XY (incl. Helsinki vectors)") {
    val sm = SphericalMercator(512)
    assertXY(sm.toGlobalPixelXY(0, 0, 0), 256, 256)
    assertXY(sm.toGlobalPixelXY(0, -180, 0), 0, 256)
    assertXY(sm.toGlobalPixelXY(0, 180, 0), 512, 256)
    assertXY(sm.toGlobalPixelXY(L85, 0, 0), 256, 0)
    assertXY(sm.toGlobalPixelXY(-L85, 0, 0), 256, 512)
    assertXY(sm.toGlobalPixelXY(0, 0, 2), 1024, 1024)
    assertXY(sm.toGlobalPixelXY(60.170833, 24.9375, 0), 291.46666, 148.19743)
    assertXY(sm.toGlobalPixelXY(60.170833, 24.9375, 1), 582.93333, 296.39486)
    assertXY(sm.toGlobalPixelXY(60.170833, 24.9375, 2), 1165.86666, 592.78972)
  }

  test("wgs84 global pixel XY, 2x1 tiles at z0") {
    val p = Wgs84(512)
    assertXY(p.toGlobalPixelXY(0, 0, 0), 512, 256)
    assertXY(p.toGlobalPixelXY(90, -180, 0), 0, 0)
    assertXY(p.toGlobalPixelXY(90, 180, 0), 1024, 0)
    assertXY(p.toGlobalPixelXY(-90, 180, 0), 1024, 512)
    assertXY(p.toGlobalPixelXY(0, 0, 2), 2048, 1024)
    assertXY(p.toGlobalPixelXY(90, 180, 2), 4096, 0)
  }

  test("polar clip rules: 3575 northern hemisphere, 3031 southern") {
    val n = NorthPoleLaea(512)
    n.isPlottable(0, 0) shouldBe true
    n.isPlottable(-0.1, 0) shouldBe false
    val s = AntarcticStereographic(512)
    s.isPlottable(0, 0) shouldBe true
    s.isPlottable(0.1, 0) shouldBe false
  }

  test("LAEA 3575: pole maps to centre; equator to extent circle") {
    val p = NorthPoleLaea(512)
    // North pole → exact centre of the pixel grid at any zoom
    assertXY(p.toGlobalPixelXY(90, 0, 0), 256, 256)
    assertXY(p.toGlobalPixelXY(90, 123, 3), 2048, 2048)
    // Equator at lon0=10E projects straight "down" in projected space:
    // x=0, y=-2R·sin(45°)=-extent → pixel (256+0, 512) at z0... i.e. bottom centre
    val (x, y) = p.toGlobalPixelXY(0, 10, 0)
    x shouldBe 256.0 +- eps
    y shouldBe 512.0 +- eps
  }

  test("stereographic 3031: south pole centre, equator on extent circle") {
    val p = AntarcticStereographic(512)
    assertXY(p.toGlobalPixelXY(-90, 0, 0), 256, 256)
    // Equator at lng=0: x=0, y=+extent → top centre at z0
    val (x, y) = p.toGlobalPixelXY(0, 0, 0)
    x shouldBe 256.0 +- eps
    y shouldBe 0.0 +- eps
    // lng=90E → right centre
    val (x2, y2) = p.toGlobalPixelXY(0, 90, 0)
    x2 shouldBe 512.0 +- eps
    y2 shouldBe 256.0 +- eps
  }

  test("azimuthal projections stay within pixel bounds for plottable coords") {
    val rnd = new scala.util.Random(42)
    val projs = Seq(NorthPoleLaea(512), AntarcticStereographic(512))
    (1 to 500).foreach { _ =>
      val lat = rnd.nextDouble() * 180 - 90
      val lng = rnd.nextDouble() * 360 - 180
      projs.foreach { p =>
        if (p.isPlottable(lat, lng)) {
          val (x, y) = p.toGlobalPixelXY(lat, lng, 4)
          val max = (512L << 4).toDouble
          x should be >= -1e-6
          x should be <= max + 1e-6
          y should be >= -1e-6
          y should be <= max + 1e-6
        }
      }
    }
  }

  test("mercator zoom scaling is a factor of 2 per level") {
    val rnd = new scala.util.Random(7)
    val sm = SphericalMercator(512)
    (1 to 500).foreach { _ =>
      val lat = rnd.nextDouble() * 2 * L85 - L85
      val lng = rnd.nextDouble() * 360 - 180
      val z = rnd.nextInt(15)
      val (x0, y0) = sm.toGlobalPixelXY(lat, lng, z)
      val (x1, y1) = sm.toGlobalPixelXY(lat, lng, z + 1)
      x1 shouldBe (2 * x0) +- 1e-6 * math.max(1, math.abs(x0))
      y1 shouldBe (2 * y0) +- 1e-6 * math.max(1, math.abs(y0))
    }
  }

  test("inverse projection round-trips the forward for all 4 SRS (C6)") {
    val rnd = new scala.util.Random(11)
    val projs = Seq(SphericalMercator(512), Wgs84(512),
      NorthPoleLaea(512), AntarcticStereographic(512))
    (1 to 500).foreach { _ =>
      val lat = rnd.nextDouble() * 168 - 84 // inside mercator clip
      val lng = rnd.nextDouble() * 358 - 179
      projs.foreach { p =>
        if (p.isPlottable(lat, lng)) {
          val z = rnd.nextInt(10)
          val (gx, gy) = p.toGlobalPixelXY(lat, lng, z)
          val (lat2, lng2) = p.fromGlobalPixelXY(gx, gy, z)
          lat2 shouldBe lat +- 1e-6
          lng2 shouldBe lng +- 1e-6
        }
      }
    }
  }

  test("tileBoundary contains every point projected into the tile (C6)") {
    val rnd = new scala.util.Random(13)
    val projs = Seq(SphericalMercator(512), Wgs84(512),
      NorthPoleLaea(512), AntarcticStereographic(512))
    (1 to 300).foreach { _ =>
      val lat = rnd.nextDouble() * 168 - 84
      val lng = rnd.nextDouble() * 358 - 179
      projs.foreach { p =>
        if (p.isPlottable(lat, lng)) {
          val z = 1 + rnd.nextInt(6)
          val (gx, gy) = p.toGlobalPixelXY(lat, lng, z)
          val (tx, ty) = Tiles.toTileXY(gx, gy, p.schema, z, 512)
          val (la0, la1, lo0, lo1) = p.tileBoundary(z, tx, ty, 0.05)
          // spherical-vs-boundary rounding slack on lats; west>east is a
          // circular (antimeridian-crossing) longitude range
          assert(lat >= la0 - 1e-6 && lat <= la1 + 1e-6,
            s"${p.srs} lat $lat outside [$la0,$la1] tile($z,$tx,$ty)")
          val lngIn =
            if (lo0 <= lo1) lng >= lo0 - 1e-6 && lng <= lo1 + 1e-6
            else lng >= lo0 - 1e-6 || lng <= lo1 + 1e-6
          assert(lngIn, s"${p.srs} lng $lng outside [$lo0,$lo1] tile($z,$tx,$ty)")
        }
      }
    }
  }

  /** Boundary vectors lifted from the reference tests
    * (NorthPoleLAEAEuropeTest.java:61-196, AntarcticPolarStereographicTest.java:55-200).
    * Expected values are GeoTools ELLIPSOIDAL transforms; this library uses
    * documented spherical closed forms, so latitudes agree to ~0.15° while
    * longitudes — purely angular in an azimuthal scheme — match to 1e-5.
    * Vector order mirrors the reference's ((minLng,minLat),(maxLng,maxLat)).
    */
  private val latEps = 0.2
  private def assertBoundary(p: TileProjection, z: Int, x: Long, y: Long,
      buf: Double, minLng: Double, minLat: Double, maxLng: Double, maxLat: Double): Unit = {
    val (la0, la1, lo0, lo1) = p.tileBoundary(z, x, y, buf)
    withClue(s"${p.srs} $z/$x/$y buf=$buf: ") {
      la0 shouldBe minLat +- latEps
      la1 shouldBe maxLat +- latEps
      lo0 shouldBe minLng +- eps
      lo1 shouldBe maxLng +- eps
    }
  }

  test("LAEA 3575 tileBoundary matches the reference vectors (C6 polar)") {
    val p = NorthPoleLaea(512)
    assertBoundary(p, 0, 0, 0, 0, -180, 0, 180, 90)
    // z1: all four tiles are pole tiles, each spanning one quadrant
    assertBoundary(p, 1, 0, 0, 0, -170, 0, -80, 90)
    assertBoundary(p, 1, 1, 0, 0, 100, 0, -170, 90) // crosses the antimeridian
    assertBoundary(p, 1, 0, 1, 0, -80, 0, 10, 90)
    assertBoundary(p, 1, 1, 1, 0, 10, 0, 100, 90)
    // z2 unbuffered
    assertBoundary(p, 2, 1, 1, 0, -170, 30.111252, -80, 90)
    assertBoundary(p, 2, 3, 1, 0, 100, 0, 145, 48.717627)
    assertBoundary(p, 2, 1, 3, 0, -35, 0, 10, 48.717627)
    assertBoundary(p, 2, 3, 3, 0, 36.565051, 0, 73.434949, 30.111252)
    assertBoundary(p, 3, 5, 3, 0, 100, 43.560659, 145, 69.719412)
    // buffered by a quarter tile
    val b = 0.25
    assertBoundary(p, 0, 0, 0, b, -180, 0, 180, 90)
    assertBoundary(p, 1, 1, 1, b, 10, 0, 100, 90)
    assertBoundary(p, 2, 0, 1, b, -139.036243, 0, -61.565051, 57.654332)
    assertBoundary(p, 2, 1, 2, b, -80, 12.690523, 10, 90)
    assertBoundary(p, 2, 1, 3, b, -49.036243, 0, 28.434949, 57.654332)
    assertBoundary(p, 2, 2, 3, b, -8.434949, 0, 69.036243, 57.654332)
    // outside the projected area: clamps to the equator edge
    assertBoundary(p, 3, 0, 0, b, -137.094757, 0, -112.905243, 3.148974)
    assertBoundary(p, 18, 0, 0, b, -125.000328, 0, -124.999672, 0)
  }

  test("stereographic 3031 tileBoundary matches the reference vectors (C6 polar)") {
    val p = AntarcticStereographic(1024) // the reference vectors use 1024px tiles
    assertBoundary(p, 0, 0, 0, 0, -180, -90, 180, 0)
    assertBoundary(p, 1, 0, 0, 0, -90, -90, 0, 0)
    assertBoundary(p, 1, 1, 0, 0, 0, -90, 90, 0)
    assertBoundary(p, 1, 0, 1, 0, -180, -90, -90, 0)
    assertBoundary(p, 1, 1, 1, 0, 90, -90, 180, 0)
    assertBoundary(p, 2, 1, 1, 0, -90, -90, 0, -19.592468)
    assertBoundary(p, 2, 3, 1, 0, 45, -37.054722, 90, 0)
    assertBoundary(p, 2, 1, 3, 0, -180, -37.054722, -135, 0)
    assertBoundary(p, 2, 3, 3, 0, 116.565051, -19.592468, 153.4349488, 0)
    assertBoundary(p, 3, 5, 3, 0, 45, -62.08687, 90, -31.76006)
    val b = 0.25
    assertBoundary(p, 0, 0, 0, b, -180, -90, 180, 0)
    assertBoundary(p, 1, 1, 1, b, 90, -90, 180, 0)
    assertBoundary(p, 2, 0, 1, b, -108.4349488229220, -47.0556006, -30.96375653207352, 0)
    assertBoundary(p, 2, 1, 2, b, -180, -90, -90, -7.101188115321475)
    // seam tiles: circular (west > east) ranges over the antimeridian
    assertBoundary(p, 2, 1, 3, b, 161.56505117707798, -47.0556006, -120.96375653207352, 0)
    assertBoundary(p, 2, 2, 3, b, 120.96375653207352, -47.0556006, -161.56505117707798, 0)
  }

  test("to180Degrees normalization") {
    Projections.to180Degrees(190) shouldBe -170.0
    Projections.to180Degrees(-190) shouldBe 170.0
    Projections.to180Degrees(180) shouldBe 180.0
  }
}
