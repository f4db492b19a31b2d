package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the audio/image media operators (Media): VAD segment
  * statistics against a direct Scala re-computation, dHash determinism, the
  * Hamming-ball pigeonhole recall guarantee, and the posting-prefix/delta
  * contract of the inverted index.
  */
class MediaSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("media-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docsDf(rows: (Long, Long)*) = {
    val ss = spark; import ss.implicits._
    rows.toDF("doc_id", "n_chars")
  }

  /** Direct Scala model of the stubbed PCM decode + VAD. */
  private def vadModel(d: Long, n: Long): (Int, Int, Int, Long) = {
    val nf = (4 + n % 8).toInt
    val energies = (0 until nf).map { f =>
      (f * 64 until f * 64 + 64).map { i =>
        val s = ((2 * (d % 97) + 1) * (13L * i * i + 29L * i) + 31 * d) % 256 - 128
        s * s
      }.sum
    }
    val voiced = energies.map(_ > Media.EnergyThreshold)
    var cur = 0; var best = 0
    voiced.foreach { v => cur = if (v) cur + 1 else 0; best = math.max(best, cur) }
    (nf, voiced.count(identity), best, energies.max)
  }

  test("audioVad matches a direct per-row recomputation") {
    val rows = Seq((1L, 47L), (2L, 200L), (17L, 555L), (100000007L, 83L), (0L, 0L))
    val got = Media.audioVad(docsDf(rows: _*))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    rows.foreach { case (d, n) =>
      assert(got(d) === vadModel(d, n), s"doc $d n_chars $n")
    }
  }

  test("dhash is deterministic and word-packed in [0, 65536)") {
    val df = docsDf((1L, 100L), (2L, 101L), (3L, 800L))
    val a = Media.dhash(df).collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    val b = Media.dhash(df).collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(a.toSeq === b.toSeq)
    a.foreach { case (_, w0, w1, w2, w3) =>
      Seq(w0, w1, w2, w3).foreach(w => assert(w >= 0 && w < 65536)) }
  }

  test("dhashNearDup finds every pair within Hamming 3 (pigeonhole recall)") {
    // brute-force ground truth over a doc set small enough to enumerate
    val rows = (0L until 60L).map(i => (i, 40L + i * 7 % 120))
    val df = docsDf(rows: _*)
    val hashes = Media.dhash(df).collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val expect = (for {
      a <- rows.map(_._1); b <- rows.map(_._1) if a < b
      h = hashes(a).zip(hashes(b)).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      if h <= 3
    } yield (a, b, h)).toSet
    assert(expect.nonEmpty, "test corpus must contain near pairs")
    val got = Media.dhashNearDup(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expect)
  }

  test("real PNG roundtrip is lossless: encode a gray grid to actual PNG " +
    "bytes, decode through javax.imageio, get the exact grid back") {
    // stub grids of several docs + the full 0..255 dynamic range
    val grids = Seq(
      Media.stubGrid(1L, 100L), Media.stubGrid(2L, 101L),
      Media.stubGrid(999999937L, 4096L),
      Array.tabulate(72)(i => (i * 255) / 71),       // 0..255 ramp
      Array.fill(72)(0), Array.fill(72)(255))        // extremes
    grids.foreach { g =>
      val back = Media.pngGray9x8(Media.pngEncodeGray(g))
      assert(back.toSeq === g.toSeq, "decode(encode(grid)) must be identity")
    }
  }

  test("pngGray9x8 on an RGB image: raster-sample luma + integer " +
    "box-average downsample, no colorspace surprises") {
    // 36×32 RGB image of 4×4 constant blocks — each 9×8 grid cell covers
    // exactly one block, so the box average equals that block's luma
    val img = new java.awt.image.BufferedImage(
      36, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val colors = Array.tabulate(8, 9) { (gy, gx) =>
      ((gx * 31 + 7) % 256, (gy * 53 + 11) % 256, ((gx + gy) * 17) % 256)
    }
    for (y <- 0 until 32; x <- 0 until 36) {
      val (r, g, b) = colors(y / 4)(x / 4)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val got = Media.pngGray9x8(bos.toByteArray)
    val want = Array.tabulate(72) { i =>
      val (r, g, b) = colors(i / 9)(i % 9)
      (299 * r + 587 * g + 114 * b) / 1000
    }
    assert(got.toSeq === want.toSeq)
  }

  test("pngGray9x8 resolves paletted PNGs through the palette (indices " +
    "are not lumas) and reads gray+alpha from band 0") {
    // paletted: index 0 -> white, index 1 -> black; an index-as-luma bug
    // would read 0 (black) for the white pixels
    val pal = new java.awt.image.IndexColorModel(8, 2,
      Array[Byte](255.toByte, 0), Array[Byte](255.toByte, 0),
      Array[Byte](255.toByte, 0))
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, pal)
    for (y <- 0 until 8; x <- 0 until 9)
      img.getRaster.setSample(x, y, 0, if ((x + y) % 2 == 0) 0 else 1)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val got = Media.pngGray9x8(bos.toByteArray)
    val want = Array.tabulate(72)(i => if ((i % 9 + i / 9) % 2 == 0) 255 else 0)
    assert(got.toSeq === want.toSeq)
    // gray+alpha: a genuine 2-band CS_GRAY image (PNG color type 4 on
    // disk; reads back as a 2-band raster) — luma = band 0, alpha ignored;
    // the pre-fix code indexed band 2 here and threw
    val cs = java.awt.color.ColorSpace.getInstance(java.awt.color.ColorSpace.CS_GRAY)
    val cm = new java.awt.image.ComponentColorModel(cs, true, false,
      java.awt.Transparency.TRANSLUCENT, java.awt.image.DataBuffer.TYPE_BYTE)
    val wr = cm.createCompatibleWritableRaster(9, 8)
    for (y <- 0 until 8; x <- 0 until 9) {
      wr.setSample(x, y, 0, (x * 20 + y * 3) % 256)
      wr.setSample(x, y, 1, 128) // translucent everywhere
    }
    val ga = new java.awt.image.BufferedImage(cm, wr, false, null)
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(ga, "png", bos2)
    val got2 = Media.pngGray9x8(bos2.toByteArray)
    val want2 = Array.tabulate(72)(i => ((i % 9) * 20 + (i / 9) * 3) % 256)
    assert(got2.toSeq === want2.toSeq)
  }

  test("pngRoundtripDhash: words from the DECODED grid equal the stub " +
    "dhash, checksums pin all 72 pixels") {
    val df = docsDf((1L, 100L), (2L, 101L), (3L, 800L), (17L, 4095L))
    val stub = Media.dhash(df).collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val got = Media.pngRoundtripDhash(df).collect()
      .map(r => r.getLong(0) ->
        ((Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)),
          r.getLong(5), r.getLong(6)))).toMap
    got.foreach { case (d, (words, gsum, gwsum)) =>
      assert(words === stub(d), s"doc $d: decoded-grid dhash != stub dhash")
      val n = df.filter(col("doc_id") === d).head.getLong(1)
      val grid = Media.stubGrid(d, n)
      assert(gsum === grid.map(_.toLong).sum)
      assert(gwsum === grid.zipWithIndex.map { case (g, i) => g.toLong * (i + 1) }.sum)
    }
  }

  test("invertedIndex: df is the full count while postings is the bottom-k prefix, delta-encoded") {
    val ss = spark; import ss.implicits._
    // term "alpha" in 20 docs (df 20 > k=16); ids descending on purpose —
    // the prefix must be the SMALLEST ids regardless of arrival order
    val docs = (1L to 20L).reverse.map(i => (i * 10, "alpha beta")) :+ (999L, "beta")
    val df = docs.toDF("doc_id", "text")
    val got = Corpus.invertedIndex(df, minLen = 4, minDf = 2, k = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got("alpha")._1 === 20L)
    // bottom-16 of {10,20,...,200} delta-encoded: 10 then fifteen 10s
    assert(got("alpha")._2 === (Seq("10") ++ Seq.fill(15)("10")).mkString(","))
    assert(got("beta")._1 === 21L)
  }
}
