package graft.functions

import scala.collection.mutable

/** Minimal Mapbox Vector Tile 2.1 encoder (hand-rolled protobuf wire format,
  * per the public MVT spec). Layout matches the reference's tile payloads
  * structurally (VectorTiles.java:38-82): one layer per basisOfRecord, one
  * POINT feature per pixel, attributes = per-year counts plus "total".
  *
  * Encoding is deterministic: features sorted by (x, y), layers by bor id,
  * keys sorted, values in first-use order — identical input always yields
  * identical bytes, so downstream fingerprints are stable.
  */
object Mvt {

  final case class PixelFeature(x: Int, y: Int, borId: Int, year: Int, count: Long)

  private final class Buf {
    val bytes = new mutable.ArrayBuffer[Byte](256)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { bytes += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      bytes += v.toByte
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytesField(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length.toLong); bytes ++= b
    }
    def stringField(field: Int, s: String): Unit = bytesField(field, s.getBytes("UTF-8"))
    def varintField(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def toArray: Array[Byte] = bytes.toArray
  }

  private def zigzag(n: Int): Long = ((n << 1) ^ (n >> 31)).toLong & 0xffffffffL

  /** protobuf `Value` message with int_value (field 4). */
  private def intValue(v: Long): Array[Byte] = {
    val b = new Buf; b.varintField(4, v); b.toArray
  }

  /** Encode one tile: layer per borId, feature per pixel with year→count
    * attrs and a "total" attr, extent = tileSize.
    */
  def encodeTile(features: Seq[PixelFeature], extent: Int): Array[Byte] = {
    val tile = new Buf
    features.groupBy(_.borId).toSeq.sortBy(_._1).foreach { case (borId, fs) =>
      val layer = new Buf
      layer.varintField(15, 2L) // version
      layer.stringField(1, s"bor$borId")

      // keys: sorted year keys then "total"; values: first-use order
      val byPixel = fs.groupBy(f => (f.x, f.y)).toSeq.sortBy(_._1)
      val yearKeys = fs.map(f => f.year.toString).distinct.sorted
      val keys = yearKeys :+ "total"
      val keyIdx = keys.zipWithIndex.toMap
      val valIdx = mutable.LinkedHashMap.empty[Long, Int]
      def vi(v: Long): Int = valIdx.getOrElseUpdate(v, valIdx.size)

      val featureBufs = byPixel.map { case ((x, y), pfs) =>
        val f = new Buf
        val tags = new Buf
        pfs.sortBy(_.year).foreach { pf =>
          tags.varint(keyIdx(pf.year.toString).toLong); tags.varint(vi(pf.count).toLong)
        }
        tags.varint(keyIdx("total").toLong); tags.varint(vi(pfs.map(_.count).sum).toLong)
        f.bytesField(2, tags.toArray) // packed tags
        f.varintField(3, 1L) // GeomType POINT
        val geom = new Buf
        geom.varint(9L) // MoveTo, count 1
        geom.varint(zigzag(x)); geom.varint(zigzag(y))
        f.bytesField(4, geom.toArray)
        f.toArray
      }
      featureBufs.foreach(layer.bytesField(2, _))
      keys.foreach(layer.stringField(3, _))
      valIdx.keys.foreach(v => layer.bytesField(4, intValue(v)))
      layer.varintField(5, extent.toLong)
      tile.bytesField(3, layer.toArray)
    }
    tile.toArray
  }

  // ------------------------------------------------------------- decoder
  // Minimal reader used by tests and the serving-side re-aggregation path
  // (A6 decode → filter → merge): walks the wire format back into
  // (layerName, x, y, year→count, total) tuples.

  final case class DecodedFeature(layer: String, x: Int, y: Int,
      yearCounts: Map[Int, Long], total: Long)

  private final class Reader(b: Array[Byte], var pos: Int, val end: Int) {
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({ val x = b(pos); pos += 1; v |= (x & 0x7fL) << shift; shift += 7; (x & 0x80) != 0 }) ()
      v
    }
    def sub(): Reader = { val len = varint().toInt; val r = new Reader(b, pos, pos + len); pos += len; r }
    def hasMore: Boolean = pos < end
  }

  def decodeTile(bytes: Array[Byte]): Seq[DecodedFeature] = {
    val out = mutable.ArrayBuffer.empty[DecodedFeature]
    val top = new Reader(bytes, 0, bytes.length)
    while (top.hasMore) {
      val t = top.varint(); val field = (t >> 3).toInt
      if (field == 3) {
        val layer = top.sub()
        var name = ""
        val keys = mutable.ArrayBuffer.empty[String]
        val values = mutable.ArrayBuffer.empty[Long]
        val feats = mutable.ArrayBuffer.empty[(Seq[Long], Int, Int)]
        while (layer.hasMore) {
          val lt = layer.varint(); val lf = (lt >> 3).toInt
          lf match {
            case 1 => val r = layer.sub()
              name = new String(bytes.slice(r.pos, r.end), "UTF-8")
            case 2 =>
              val fr = layer.sub()
              var tags = Seq.empty[Long]; var x = 0; var y = 0
              while (fr.hasMore) {
                val ft = fr.varint(); val ff = (ft >> 3).toInt
                ff match {
                  case 2 => val tr = fr.sub()
                    val tb = mutable.ArrayBuffer.empty[Long]
                    while (tr.hasMore) tb += tr.varint()
                    tags = tb.toSeq
                  case 3 => fr.varint()
                  case 4 => val gr = fr.sub()
                    gr.varint() // MoveTo
                    val zx = gr.varint(); val zy = gr.varint()
                    x = ((zx >>> 1) ^ -(zx & 1)).toInt; y = ((zy >>> 1) ^ -(zy & 1)).toInt
                  case _ => fr.sub()
                }
              }
              feats += ((tags, x, y))
            case 3 => val r = layer.sub()
              keys += new String(bytes.slice(r.pos, r.end), "UTF-8")
            case 4 => val vr = layer.sub()
              var v = 0L
              while (vr.hasMore) { val vt = vr.varint(); if ((vt >> 3).toInt == 4) v = vr.varint() else vr.sub() }
              values += v
            case _ => if ((lt & 7) == 2) layer.sub() else layer.varint()
          }
        }
        feats.foreach { case (tags, x, y) =>
          val attrs = tags.grouped(2).map { p => keys(p(0).toInt) -> values(p(1).toInt) }.toMap
          val years = attrs.collect { case (k, v) if k != "total" => k.toInt -> v }
          out += DecodedFeature(name, x, y, years, attrs("total"))
        }
      } else if ((t & 7) == 2) top.sub() else top.varint()
    }
    out.toSeq
  }
}
