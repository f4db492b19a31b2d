package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class CoreSpec extends AnyFunSuite with Matchers {

  test("BorYear pack/unpack roundtrip (EncodeBorYearUDF semantics)") {
    BorYear.encode("HUMAN_OBSERVATION", Some(2021)) shouldBe 202103
    BorYear.encode("PRESERVED_SPECIMEN", None) shouldBe 0
    BorYear.year(202103) shouldBe 2021
    BorYear.bor(202103) shouldBe "HUMAN_OBSERVATION"
    BorYear.year(8) shouldBe 0 // null year
    BorYear.bor(8) shouldBe "FOSSIL_SPECIMEN"
    val rnd = new scala.util.Random(1)
    val bors = BorYear.BorIds.keys.toSeq
    (1 to 200).foreach { _ =>
      val bor = bors(rnd.nextInt(bors.size))
      val yr = if (rnd.nextBoolean()) Some(1600 + rnd.nextInt(430)) else None
      val e = BorYear.encode(bor, yr)
      BorYear.bor(e) shouldBe bor
      BorYear.year(e) shouldBe yr.getOrElse(0)
    }
  }

  test("Salt: padding, digit count, parity with Java String.hashCode") {
    val s100 = Salt(100)
    s100.digitCount shouldBe 2
    Salt(10).digitCount shouldBe 1
    // "foo".hashCode is the JVM definition — parity is inherent
    val key = "1:someChecklist|1234"
    s100.saltToString(key) shouldBe f"${(key.hashCode & 0xfffffff) % 100}%02d:$key"
    Salt.saltFrom("07:0:0:3:2:1") shouldBe 7
  }

  test("Salt distributes roughly uniformly") {
    val s = Salt(100)
    val counts = (0 until 20000)
      .map(i => s.saltOf(s"2:dataset-$i"))
      .groupBy(identity).view.mapValues(_.size)
    counts.values.max.toDouble / counts.values.min should be < 3.0
  }

  test("YearRange parse and contains (Range.java semantics)") {
    YearRange.parse("2001") shouldBe YearRange(Some(2001), Some(2001))
    YearRange.parse("2001,2010") shouldBe YearRange(Some(2001), Some(2010))
    YearRange.parse(",2010") shouldBe YearRange(None, Some(2010))
    YearRange.parse("2001,") shouldBe YearRange(Some(2001), None)
    YearRange.parse("") shouldBe YearRange.Unbounded
    YearRange(Some(2000), Some(2010)).contains(Some(2005)) shouldBe true
    YearRange(Some(2000), Some(2010)).contains(Some(1999)) shouldBe false
    YearRange(Some(2000), Some(2010)).contains(None) shouldBe false
    YearRange.Unbounded.contains(None) shouldBe true
    an[IllegalArgumentException] should be thrownBy YearRange(Some(2010), Some(2000))
  }

  test("HexGrid: cell assignment is stable and polygons tessellate") {
    val grid = HexGrid(512, 9)
    // the centre of a cell maps back to that cell
    val rnd = new scala.util.Random(2)
    (1 to 500).foreach { _ =>
      val q = rnd.nextLong() % 50
      val r = rnd.nextLong() % 50
      val (cx, cy) = grid.centreOf(q, r)
      grid.cellOf(cx, cy) shouldBe (q, r)
    }
  }

  test("HexGrid: neighbouring cells share vertices (tessellation)") {
    val grid = HexGrid(512, 9)
    def rnd(p: (Double, Double)) = (math.rint(p._1 * 1e6) / 1e6, math.rint(p._2 * 1e6) / 1e6)
    val a = grid.polygonOf(0, 0).map(rnd).toSet
    val b = grid.polygonOf(1, 0).map(rnd).toSet
    a.intersect(b).size shouldBe 2 // adjacent flat-top hexes share an edge
  }

  test("HexGrid sizing matches reference hexPerTile maths (HexBin.java:33-46)") {
    val g = HexGrid(512, 9)
    g.hexWidth shouldBe (512 / (1.5 * 5.0)) +- 1e-9
    g.hexHeight shouldBe (math.sqrt(3) / 2 * g.hexWidth) +- 1e-9
  }
}
