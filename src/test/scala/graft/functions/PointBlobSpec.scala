package graft.functions

import graft.functions.PointBlob.PointRow
import org.scalatest.funsuite.AnyFunSuite

class PointBlobSpec extends AnyFunSuite {

  private val sample = Seq(
    PointRow(105, -1780, 200100, 3),
    PointRow(-850, 1799, 0, 1),
    PointRow(0, 0, 199502, 12345678L),
    PointRow(850, -1800, 201099, 1))

  test("encode/decode roundtrip preserves every field") {
    assert(PointBlob.decode(PointBlob.encode(sample)).toSet === sample.toSet)
  }

  test("encoding is deterministic regardless of input order") {
    val a = PointBlob.encode(sample)
    val b = PointBlob.encode(scala.util.Random.shuffle(sample))
    assert(a.toSeq === b.toSeq)
  }

  test("property: roundtrip over random feature sets (200 blobs)") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val rows = Seq.fill(rnd.nextInt(100)) {
        val year = if (rnd.nextBoolean()) 0 else 1900 + rnd.nextInt(200)
        PointRow(rnd.nextInt(1700) - 850, rnd.nextInt(3600) - 1800,
          year * 100L + rnd.nextInt(3), 1L + rnd.nextInt(1000000))
      }.distinct
      val decoded = PointBlob.decode(PointBlob.encode(rows))
      assert(decoded.toSet === rows.toSet)
      // sorted output: decode order is the canonical feature order
      assert(decoded === decoded.sortBy(r => (r.lat10, r.lng10, r.borYear)))
    }
  }

  test("empty blob decodes to no features") {
    assert(PointBlob.decode(PointBlob.encode(Nil)) === Nil)
  }
}
