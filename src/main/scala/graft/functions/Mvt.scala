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

  /** Growable primitive byte builder — a boxed ArrayBuffer[Byte] costs an
    * object per byte, and the encode runs once per TILE (hundreds of
    * thousands of tiny tiles per build), so per-tile constant overhead is
    * the whole cost model here.
    */
  private final class Buf(initial: Int) {
    private var arr = new Array[Byte](initial)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > arr.length) {
        var cap = arr.length << 1
        while (cap < len + n) cap <<= 1
        arr = java.util.Arrays.copyOf(arr, cap)
      }
    def size: Int = len
    def clear(): Unit = len = 0
    def varint(v0: Long): Unit = {
      var v = v0
      ensure(10)
      while ((v & ~0x7fL) != 0) { arr(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7 }
      arr(len) = v.toByte; len += 1
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytesField(field: Int, b: Array[Byte], n: Int): Unit = {
      tag(field, 2); varint(n.toLong); ensure(n)
      System.arraycopy(b, 0, arr, len, n); len += n
    }
    def bytesField(field: Int, other: Buf): Unit = bytesField(field, other.arr, other.len)
    def stringField(field: Int, s: String): Unit = {
      val b = s.getBytes("UTF-8"); bytesField(field, b, b.length)
    }
    def varintField(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  private def zigzag(n: Int): Long = ((n << 1) ^ (n >> 31)).toLong & 0xffffffffL

  /** (borId, x, y, year) feature order — the canonical encode order. */
  private val featureOrder = new java.util.Comparator[PixelFeature] {
    def compare(a: PixelFeature, b: PixelFeature): Int = {
      if (a.borId != b.borId) return Integer.compare(a.borId, b.borId)
      if (a.x != b.x) return Integer.compare(a.x, b.x)
      if (a.y != b.y) return Integer.compare(a.y, b.y)
      Integer.compare(a.year, b.year)
    }
  }

  /** Encode one tile: layer per borId, feature per pixel with year→count
    * attrs and a "total" attr, extent = tileSize. Single pass over the
    * features sorted (borId, x, y, year): layers and per-pixel features are
    * contiguous runs, year keys are binary-searched in the layer's sorted
    * distinct-year table, and attribute values get first-use indices via a
    * linear probe of the (small — distinct counts, not features) value
    * list. Byte-for-byte the same output as the original nested
    * groupBy/sortBy formulation, at a fraction of the allocation.
    */
  def encodeTile(features: Seq[PixelFeature], extent: Int): Array[Byte] =
    encodeTile(features.toArray, extent)

  /** Array variant — sorts `fs` in place (callers pass a fresh array). */
  def encodeTile(fs: Array[PixelFeature], extent: Int): Array[Byte] = {
    java.util.Arrays.sort(fs, featureOrder)
    val tile = new Buf(1024)
    val layer = new Buf(1024)
    val feat = new Buf(64)
    val tags = new Buf(64)
    val geom = new Buf(16)
    val value = new Buf(16)
    var i = 0
    while (i < fs.length) {
      val borId = fs(i).borId
      var j = i
      while (j < fs.length && fs(j).borId == borId) j += 1

      // distinct sorted years of this layer (year keys sort identically as
      // strings and ints here: always "0" or 4-digit)
      var years = new Array[Int](math.min(j - i, 16))
      var ny = 0
      var k = i
      while (k < j) {
        val y = fs(k).year
        // the int year-key sort below coincides with the historical string
        // sort ONLY on this domain — self-enforce it (a 5-digit or negative
        // year would silently reorder the key table vs stored tiles)
        require(y == 0 || (y >= 1000 && y <= 9999),
          s"year $y outside the string-sort-stable domain (0 or 1000..9999)")
        var seen = false; var t = 0
        while (t < ny && !seen) { if (years(t) == y) seen = true; t += 1 }
        if (!seen) {
          if (ny == years.length) years = java.util.Arrays.copyOf(years, ny << 1)
          years(ny) = y; ny += 1
        }
        k += 1
      }
      java.util.Arrays.sort(years, 0, ny)

      // attribute values, first-use order (distinct count values — few)
      var vals = new Array[Long](16)
      var nv = 0
      def vi(v: Long): Int = {
        var t = 0
        while (t < nv) { if (vals(t) == v) return t; t += 1 }
        if (nv == vals.length) vals = java.util.Arrays.copyOf(vals, nv << 1)
        vals(nv) = v; nv += 1
        nv - 1
      }

      layer.clear()
      layer.varintField(15, 2L) // version
      layer.stringField(1, "bor" + borId)

      k = i
      while (k < j) { // one feature per (x, y) run
        val x = fs(k).x; val y = fs(k).y
        tags.clear()
        var sum = 0L
        while (k < j && fs(k).x == x && fs(k).y == y) {
          tags.varint(java.util.Arrays.binarySearch(years, 0, ny, fs(k).year).toLong)
          tags.varint(vi(fs(k).count).toLong)
          sum += fs(k).count
          k += 1
        }
        tags.varint(ny.toLong) // "total" key index
        tags.varint(vi(sum).toLong)
        feat.clear()
        feat.bytesField(2, tags) // packed tags
        feat.varintField(3, 1L) // GeomType POINT
        geom.clear()
        geom.varint(9L) // MoveTo, count 1
        geom.varint(zigzag(x)); geom.varint(zigzag(y))
        feat.bytesField(4, geom)
        layer.bytesField(2, feat)
      }
      var t = 0
      while (t < ny) { layer.stringField(3, years(t).toString); t += 1 }
      layer.stringField(3, "total")
      t = 0
      while (t < nv) { // protobuf `Value` message with int_value (field 4)
        value.clear(); value.varintField(4, vals(t))
        layer.bytesField(4, value); t += 1
      }
      layer.varintField(5, extent.toLong)
      tile.bytesField(3, layer)
      i = j
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
    /** Skip one unknown field by its WIRE TYPE — assuming length-delimited
      * misreads a varint value as a byte length (e.g. a spec-valid
      * Feature.id, field 1 wire 0, from a foreign encoder).
      */
    def skip(tag: Long): Unit = (tag & 7) match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 5 => pos += 4
      case _ => sub(); ()
    }
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
        // features as (packed tag array, tag count, x, y) — a primitive
        // Long array per feature instead of a boxed Seq: the decode runs
        // once per tile across whole pyramids, like the encoder
        val feats = mutable.ArrayBuffer.empty[(Array[Long], Int, Int, Int)]
        while (layer.hasMore) {
          val lt = layer.varint(); val lf = (lt >> 3).toInt
          lf match {
            case 1 => val r = layer.sub()
              name = new String(bytes, r.pos, r.end - r.pos, "UTF-8")
            case 2 =>
              val fr = layer.sub()
              var tags: Array[Long] = null; var ntags = 0
              var x = 0; var y = 0
              while (fr.hasMore) {
                val ft = fr.varint(); val ff = (ft >> 3).toInt
                ff match {
                  case 2 => val tr = fr.sub()
                    var tb = new Array[Long](8)
                    while (tr.hasMore) {
                      if (ntags == tb.length) tb = java.util.Arrays.copyOf(tb, ntags << 1)
                      tb(ntags) = tr.varint(); ntags += 1
                    }
                    tags = tb
                  case 3 => fr.varint()
                  case 4 => val gr = fr.sub()
                    gr.varint() // MoveTo
                    val zx = gr.varint(); val zy = gr.varint()
                    x = ((zx >>> 1) ^ -(zx & 1)).toInt; y = ((zy >>> 1) ^ -(zy & 1)).toInt
                  case _ => fr.skip(ft)
                }
              }
              feats += ((tags, ntags, x, y))
            case 3 => val r = layer.sub()
              keys += new String(bytes, r.pos, r.end - r.pos, "UTF-8")
            case 4 => val vr = layer.sub()
              // Accept every integer encoding of the MVT `Value` message, not
              // just our own encoder's int_value: no.ecc.vectortile (the
              // ecosystem encoder the reference uses, and what produced the
              // golden tiles under common/src/test/resources/tiles/) writes
              // Integer/Long attributes as sint_value (field 6, zigzag).
              var v = 0L
              while (vr.hasMore) {
                val vt = vr.varint()
                (vt >> 3).toInt match {
                  case 4 => v = vr.varint()          // int_value
                  case 5 => v = vr.varint()          // uint_value
                  case 6 => val z = vr.varint()      // sint_value (zigzag64)
                    v = (z >>> 1) ^ -(z & 1)
                  case _ => vr.skip(vt)
                }
              }
              values += v
            case _ => layer.skip(lt)
          }
        }
        // per-layer key table parsed once: year int, or -1 for "total"
        // -1 = "total", -2 = foreign non-year attribute key (dropped; real
        // tiles from other producers may carry attrs beyond the year table)
        val keyYear = new Array[Int](keys.length)
        var ki = 0
        while (ki < keys.length) {
          keyYear(ki) =
            if (keys(ki) == "total") -1
            else try keys(ki).toInt catch { case _: NumberFormatException => -2 }
          ki += 1
        }
        feats.foreach { case (tags, ntags, x, y) =>
          var total = 0L
          val years = Map.newBuilder[Int, Long]
          var p = 0
          while (p + 1 < ntags) {
            val yk = keyYear(tags(p).toInt); val v = values(tags(p + 1).toInt)
            if (yk == -1) total = v else if (yk >= 0) years += (yk -> v)
            p += 2
          }
          out += DecodedFeature(name, x, y, years.result(), total)
        }
      } else top.skip(t)
    }
    out.toSeq
  }
}
