package graft.core

import java.lang.Math._

/** Flat-top hexagon binning in GLOBAL pixel space.
  *
  * The reference bins per tile with a per-tile grid offset so hexagons
  * tessellate across tile borders (gbif/maps common/.../bin/HexBin.java:85-155).
  * Re-designed Spark-first: we assign each *global* pixel to a hexagon of a
  * single world-wide flat-top grid — tessellation across tiles is then
  * automatic and the hex id (q,r axial coordinates) is stable without any
  * per-tile offset bookkeeping, which also makes it a pure, shuffle-friendly
  * group-by key.
  *
  * Sizing matches the reference: `hexWidth = tileSize / (1.5 * (hexPerTile+1)/2)`
  * (HexBin.java:33-46), i.e. ≥ hexPerTile hexagons across one tile.
  */
final case class HexGrid(tileSize: Int, hexPerTile: Int) extends Serializable {
  /** circumradius in pixels */
  val hexWidth: Double = tileSize / (1.5 * ((hexPerTile + 1).toDouble / 2))
  val radius: Double = hexWidth / 2
  val hexHeight: Double = (sqrt(3) / 2) * hexWidth

  /** Axial (q, r) coordinates of the hexagon containing global pixel (x, y).
    * Standard flat-top axial transform + cube rounding
    * (redblobgames.com/grids/hexagons — public domain algorithm).
    */
  def cellOf(x: Double, y: Double): (Long, Long) = {
    val q = (2.0 / 3.0 * x) / radius
    val r = (-1.0 / 3.0 * x + sqrt(3) / 3.0 * y) / radius
    cubeRound(q, r)
  }

  private def cubeRound(q: Double, r: Double): (Long, Long) = {
    val s = -q - r
    var rq = round(q).toDouble
    var rr = round(r).toDouble
    val rs = round(s).toDouble
    val dq = abs(rq - q); val dr = abs(rr - r); val ds = abs(rs - s)
    if (dq > dr && dq > ds) rq = -rr - rs
    else if (dr > ds) rr = -rq - rs
    (rq.toLong, rr.toLong)
  }

  /** Centre of hexagon (q, r) in global pixels. */
  def centreOf(q: Long, r: Long): (Double, Double) = {
    val x = radius * (3.0 / 2.0 * q)
    val y = radius * (sqrt(3) / 2.0 * q + sqrt(3) * r)
    (x, y)
  }

  /** The 6 vertices of hexagon (q, r) in global pixels, closed (7 points). */
  def polygonOf(q: Long, r: Long): Seq[(Double, Double)] = {
    val (cx, cy) = centreOf(q, r)
    val pts = (0 until 6).map { i =>
      val a = toRadians(60.0 * i)
      (cx + radius * cos(a), cy + radius * sin(a))
    }
    pts :+ pts.head
  }
}
