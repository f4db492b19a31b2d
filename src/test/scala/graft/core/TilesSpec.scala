package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TilesSpec extends AnyFunSuite with Matchers {
  val TS = 512
  val BUF = 64

  test("toTileXY basic + clamping") {
    Tiles.toTileXY(0, 0, TileSchema.WebMercator, 0, TS) shouldBe (0L, 0L)
    Tiles.toTileXY(511.9, 511.9, TileSchema.WebMercator, 0, TS) shouldBe (0L, 0L)
    Tiles.toTileXY(513, 100, TileSchema.WebMercator, 1, TS) shouldBe (1L, 0L)
    // clamp: the extreme right edge pixel belongs to the last tile
    Tiles.toTileXY(1024, 100, TileSchema.WebMercator, 1, TS) shouldBe (1L, 0L)
    // wgs84 is 2 tiles wide at z0
    Tiles.toTileXY(1000, 100, TileSchema.Wgs84PlateCarree, 0, TS) shouldBe (1L, 0L)
  }

  test("toTileLocalXY with dateline wrap") {
    // pixel near right edge of the world appears in tile 0's left buffer
    val (lx, _) = Tiles.toTileLocalXY(1020, 10, TileSchema.WebMercator, 1, 0, 0, TS, BUF)
    lx shouldBe (1020 - 1024).toLong
    // pixel near left edge of world appears in last tile's right buffer
    val (lx2, _) = Tiles.toTileLocalXY(4, 10, TileSchema.WebMercator, 1, 1, 0, TS, BUF)
    lx2 shouldBe (4 + 1024 - 512).toLong
    // no wrap at z0 for a 1-wide schema
    val (lx3, _) = Tiles.toTileLocalXY(510, 10, TileSchema.WebMercator, 0, 0, 0, TS, BUF)
    lx3 shouldBe 510L
  }

  test("collectToTiles: Mercator z0 wrap self-dedupes; z1 wraps into the opposite tile") {
    // z0: one world tile — the dateline "neighbour" is the tile itself, so
    // an edge pixel must yield exactly ONE replica (the q59 z0 case)
    val z0 = Tiles.collectToTiles(500, 100, TileSchema.WebMercator, 0, TS, BUF)
    z0.map(t => (t._1, t._2)) shouldBe Seq((0L, 0L))
    val z0w = Tiles.collectToTiles(10, 100, TileSchema.WebMercator, 0, TS, BUF)
    z0w.map(t => (t._1, t._2)) shouldBe Seq((0L, 0L))
    // z1: a world-east pixel lands on tile 1 and replicates into tile 0's
    // buffer with a negative local x (the real dateline copy)
    val z1 = Tiles.collectToTiles(1000, 100, TileSchema.WebMercator, 1, TS, BUF)
    z1.map(t => (t._1, t._2)).toSet shouldBe Set((1L, 0L), (0L, 0L))
    val wrapped = z1.find(_._1 == 0L).get
    wrapped._3 shouldBe (1000 - 1024).toLong
    // and symmetric: a world-west pixel replicates into tile 1's east buffer
    val z1w = Tiles.collectToTiles(20, 100, TileSchema.WebMercator, 1, TS, BUF)
    z1w.map(t => (t._1, t._2)).toSet shouldBe Set((0L, 0L), (1L, 0L))
    z1w.find(_._1 == 1L).get._3 shouldBe (20 + 1024 - 512).toLong
  }

  test("tileContains with buffer and dateline") {
    // inside tile
    Tiles.tileContains(1, 0, 0, TS, TileSchema.WebMercator, 100, 100, BUF) shouldBe true
    // inside east buffer of tile 0
    Tiles.tileContains(1, 0, 0, TS, TileSchema.WebMercator, 520, 100, BUF) shouldBe true
    // beyond buffer
    Tiles.tileContains(1, 0, 0, TS, TileSchema.WebMercator, 600, 100, BUF) shouldBe false
    // dateline: world-right pixel contained in tile 0 via wrap
    Tiles.tileContains(1, 0, 0, TS, TileSchema.WebMercator, 1020, 100, BUF) shouldBe true
    // dateline: world-left pixel contained in last tile via wrap
    Tiles.tileContains(1, 1, 0, TS, TileSchema.WebMercator, 3, 100, BUF) shouldBe true
  }

  test("collectToTiles: interior pixel lands on exactly 1 tile") {
    val reps = Tiles.collectToTiles(256, 256, TileSchema.WebMercator, 1, TS, BUF)
    reps shouldBe Seq((0L, 0L, 256L, 256L))
  }

  test("collectToTiles: edge pixel replicated to neighbour buffer") {
    val reps = Tiles.collectToTiles(510, 256, TileSchema.WebMercator, 1, TS, BUF)
    reps should contain((0L, 0L, 510L, 256L))
    reps should contain((1L, 0L, -2L, 256L))
    reps.size shouldBe 2
  }

  test("collectToTiles: corner pixel replicated to up to 4 tiles") {
    val reps = Tiles.collectToTiles(510, 510, TileSchema.WebMercator, 1, TS, BUF)
    reps.map(t => (t._1, t._2)).toSet shouldBe Set((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L))
  }

  test("collectToTiles: dateline wrap replicates across the antimeridian") {
    val reps = Tiles.collectToTiles(1020, 256, TileSchema.WebMercator, 1, TS, BUF)
    reps should contain((1L, 0L, 508L, 256L))
    // wraps onto tile 0's left buffer
    reps should contain((0L, 0L, -4L, 256L))
  }

  test("collectToTiles property: every replica contains the pixel; primary always first") {
    val rnd = new scala.util.Random(42)
    val schemas =
      Seq[TileSchema](TileSchema.WebMercator, TileSchema.Wgs84PlateCarree, TileSchema.Polar)
    (1 to 2000).foreach { _ =>
      val z = rnd.nextInt(7)
      val schema = schemas(rnd.nextInt(3))
      val x = rnd.nextDouble() * (schema.tilesHorizontal(z) * TS - 0.001)
      val y = rnd.nextDouble() * (schema.tilesVertical(z) * TS - 0.001)
      val reps = Tiles.collectToTiles(x, y, schema, z, TS, BUF)
      reps should not be empty
      reps.foreach { case (tx, ty, _, _) =>
        Tiles.tileContains(z, tx, ty, TS, schema, x, y, BUF) shouldBe true
      }
      val (ptx, pty) = Tiles.toTileXY(x, y, schema, z, TS)
      reps.head._1 shouldBe ptx
      reps.head._2 shouldBe pty
      // local pixels within tile+buffer bounds
      reps.foreach { case (_, _, lx, ly) =>
        lx should be >= (-BUF).toLong
        lx should be <= (TS + BUF).toLong
        ly should be >= (-BUF).toLong
        ly should be <= (TS + BUF).toLong
      }
    }
  }
}
