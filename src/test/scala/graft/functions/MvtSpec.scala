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

  test("decoder survives foreign spec-valid fields (Feature.id varint, " +
    "float Value fields) by skipping on wire type") {
    // hand-built minimal tile from a hypothetical foreign encoder:
    //   layer{ name="L", keys=["total"], values=[Value{float(2)=1.5f},
    //   Value{uint(4)=7}], extent=512,
    //   feature{ id(1,varint)=5, tags=[0,1], geom=MoveTo(3,4) } }
    class B {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
      def vint(v: Long): B = { var x = v
        while ((x & ~0x7fL) != 0) { buf += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
        buf += x.toByte; this }
      def raw(bs: Array[Byte]): B = { buf ++= bs; this }
      def field(f: Int, body: B): B =
        { vint((f << 3) | 2); vint(body.buf.length.toLong); buf ++= body.buf; this }
    }
    val tags = new B().vint(0L).vint(1L)
    val geom = new B().vint(9L).vint(6L).vint(8L) // MoveTo zig(3), zig(4)
    val feature = new B()
      .vint((1 << 3) | 0).vint(5L)                // id = 5 (wire type 0!)
      .field(2, tags)
      .vint((3 << 3) | 0).vint(1L)                // type = POINT
      .field(4, geom)
    val vFloat = new B()
      .vint((2 << 3) | 5).raw(Array[Byte](0, 0, -64, 63)) // float 1.5 LE
    val vUint = new B().vint((4 << 3) | 0).vint(7L)
    val layer = new B()
      .field(1, new B().raw("L".getBytes("UTF-8")))
      .field(2, feature)
      .field(3, new B().raw("total".getBytes("UTF-8")))
      .field(4, vFloat)
      .field(4, vUint)
      .vint((5 << 3) | 0).vint(512L)
    val tile = new B().field(3, layer)
    val decoded = Mvt.decodeTile(tile.buf.toArray)
    assert(decoded.length === 1)
    val f = decoded.head
    assert(f.layer === "L" && f.x === 3 && f.y === 4)
    assert(f.total === 7L) // tag pair (key 0 = "total", value 1 = uint 7)
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
