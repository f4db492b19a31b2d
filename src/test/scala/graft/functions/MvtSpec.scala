package graft.functions

import graft.functions.Mvt.PixelFeature
import org.scalatest.funsuite.AnyFunSuite

class MvtSpec extends AnyFunSuite {

  private val sample = Seq(
    PixelFeature(10, 20, 0, 2001, 5),
    PixelFeature(10, 20, 0, 2002, 3),
    PixelFeature(10, 20, 1, 2001, 7),
    PixelFeature(511, 0, 0, 0, 2),
    PixelFeature(0, 511, 2, 1995, 11))

  test("encode/decode roundtrip preserves pixels, years, counts, totals") {
    val bytes = Mvt.encodeTile(sample, 512)
    val decoded = Mvt.decodeTile(bytes)
    // layer per borId
    assert(decoded.map(_.layer).distinct.sorted === Seq("bor0", "bor1", "bor2"))
    // per-pixel totals
    val d0 = decoded.find(f => f.layer == "bor0" && f.x == 10 && f.y == 20).get
    assert(d0.yearCounts === Map(2001 -> 5L, 2002 -> 3L))
    assert(d0.total === 8L)
    val d2 = decoded.find(_.layer == "bor2").get
    assert(d2.x === 0 && d2.y === 511 && d2.total === 11L)
    // global conservation
    assert(decoded.map(_.total).sum === sample.map(_.count).sum)
  }

  test("encoding is deterministic regardless of input order") {
    val a = Mvt.encodeTile(sample, 512)
    val b = Mvt.encodeTile(scala.util.Random.shuffle(sample), 512)
    assert(a.toSeq === b.toSeq)
  }

  test("property: roundtrip conserves totals and feature counts (100 random tiles)") {
    val rnd = new scala.util.Random(42)
    val years = Seq(0, 1990, 2000, 2020)
    (1 to 100).foreach { _ =>
      val fs0 = Seq.fill(rnd.nextInt(200))(PixelFeature(
        rnd.nextInt(512), rnd.nextInt(512), rnd.nextInt(4),
        years(rnd.nextInt(years.size)), 1L + rnd.nextInt(1000)))
      // one (pixel,bor,year) appears once — dedup like the upstream groupBy
      val fs = fs0.groupBy(f => (f.x, f.y, f.borId, f.year))
        .map { case (_, g) => g.head.copy(count = g.map(_.count).sum) }.toSeq
      val decoded = Mvt.decodeTile(Mvt.encodeTile(fs, 512))
      assert(decoded.map(_.total).sum === fs.map(_.count).sum)
      assert(decoded.size === fs.map(f => (f.x, f.y, f.borId)).distinct.size)
    }
  }
}
