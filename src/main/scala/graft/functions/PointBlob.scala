package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Deterministic protobuf-style codec for a view's point features — the
  * binary blob the points store holds for small views, analogous to the
  * reference's `PointFeatures` payloads (point_feature.proto,
  * ProtobufTiles.java:31-51, PointMapBuilder.java:73-92).
  *
  * Wire format (hand-rolled, standard protobuf encoding):
  *   PointFeatures { repeated Feature features = 1; }
  *   Feature { double latitude = 1; double longitude = 2;
  *             int32 bor = 3; uint32 year = 4; uint32 count = 5; }
  *
  * Features are sorted by (lat10, lng10, borYear) before encoding, so
  * identical input sets always produce identical bytes (stable store
  * fingerprints, like the MVT encoder).
  */
object PointBlob {

  final case class PointRow(lat10: Long, lng10: Long, borYear: Long, count: Long)

  private val rowOrder = new java.util.Comparator[PointRow] {
    def compare(a: PointRow, b: PointRow): Int = {
      if (a.lat10 != b.lat10) return java.lang.Long.compare(a.lat10, b.lat10)
      if (a.lng10 != b.lng10) return java.lang.Long.compare(a.lng10, b.lng10)
      java.lang.Long.compare(a.borYear, b.borYear)
    }
  }

  /** Primitive byte building (a boxed ArrayBuffer[Byte] costs an object per
    * byte — same lesson as the MVT encoder); bytes are unchanged.
    */
  def encode(rows: Seq[PointRow]): Array[Byte] = {
    val sorted = rows.toArray
    java.util.Arrays.sort(sorted, rowOrder)
    var arr = new Array[Byte](math.max(64, sorted.length * 30))
    var len = 0
    def ensure(n: Int): Unit =
      if (len + n > arr.length) {
        var cap = arr.length << 1
        while (cap < len + n) cap <<= 1
        arr = java.util.Arrays.copyOf(arr, cap)
      }
    def varint(v0: Long): Unit = {
      var v = v0
      ensure(10)
      while ((v & ~0x7fL) != 0) { arr(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7 }
      arr(len) = v.toByte; len += 1
    }
    def fixed64(bits: Long): Unit = {
      ensure(8)
      var i = 0
      while (i < 8) { arr(len) = ((bits >>> (8 * i)) & 0xff).toByte; len += 1; i += 1 }
    }
    def varintLen(v: Long): Int = {
      var n = 1; var x = v >>> 7
      while (x != 0) { n += 1; x >>>= 7 }
      n
    }
    sorted.foreach { r =>
      // feature body length is computable up front: 2×(tag + fixed64) +
      // 3×(tag + varint)
      val bodyLen = 18 + 3 +
        varintLen(r.borYear % 100) + varintLen(r.borYear / 100) + varintLen(r.count)
      varint((1 << 3) | 2) // features, length-delimited
      varint(bodyLen.toLong)
      varint((1 << 3) | 1) // latitude, 64-bit
      fixed64(java.lang.Double.doubleToLongBits(r.lat10 / 10.0))
      varint((2 << 3) | 1) // longitude, 64-bit
      fixed64(java.lang.Double.doubleToLongBits(r.lng10 / 10.0))
      varint((3 << 3) | 0); varint(r.borYear % 100) // bor
      varint((4 << 3) | 0); varint(r.borYear / 100) // year
      varint((5 << 3) | 0); varint(r.count)
    }
    java.util.Arrays.copyOf(arr, len)
  }

  def decode(bytes: Array[Byte]): Seq[PointRow] = {
    var pos = 0
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({ val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift; shift += 7; (b & 0x80) != 0 }) ()
      v
    }
    def fixed64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (bytes(pos) & 0xffL) << (8 * i); pos += 1; i += 1 }
      v
    }
    val out = ArrayBuffer.empty[PointRow]
    while (pos < bytes.length) {
      val tag = varint()
      if ((tag >> 3).toInt == 1 && (tag & 7) == 2) {
        val end = { val len = varint().toInt; pos + len }
        var lat = 0.0; var lng = 0.0; var bor = 0L; var year = 0L; var count = 1L
        while (pos < end) {
          val t = varint()
          ((t >> 3).toInt, (t & 7).toInt) match {
            case (1, 1) => lat = java.lang.Double.longBitsToDouble(fixed64())
            case (2, 1) => lng = java.lang.Double.longBitsToDouble(fixed64())
            case (3, 0) => bor = varint()
            case (4, 0) => year = varint()
            case (5, 0) => count = varint()
            case (_, 0) => varint()
            case (_, 1) => fixed64()
            case (_, 2) => pos += varint().toInt
            case other  => throw new IllegalStateException(s"wire $other")
          }
        }
        // lat10/10.0 has < 1e-12 representation error; rounding recovers the
        // exact tenth-of-degree integer
        out += PointRow(math.round(lat * 10.0), math.round(lng * 10.0),
          year * 100 + bor, count)
      } else if ((tag & 7) == 0) varint()
      else if ((tag & 7) == 1) fixed64()
      else pos += varint().toInt
    }
    out.toSeq
  }
}
