package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit gates for the raster-neighborhood / storage-layout operators —
  * hand-checkable neighborhoods (incl. the dateline wrap) and the Morton
  * interleave against an independent bit-twiddling reference.
  */
class SpatialSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("spatial-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("focalDensity: isolated cell sees only itself; adjacent cells sum") {
    val ss = spark; import ss.implicits._
    // two adjacent cells (3 + 2 records) and one far-away cell (1 record)
    val occ = Seq(
      (10L, 100L), (10L, 100L), (10L, 100L),
      (10L, 101L), (10L, 101L),
      (500L, -900L)
    ).toDF("lat10", "lng10")
    val out = Spatial.focalDensity(occ)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out((10L, 100L)) === ((3L, 5L)))  // itself + neighbor
    assert(out((10L, 101L)) === ((2L, 5L)))
    assert(out((500L, -900L)) === ((1L, 1L)))
    assert(out.size === 3) // pure-halo cells are not emitted
  }

  test("focalDensity: longitude wraps across the dateline, latitude does not") {
    val ss = spark; import ss.implicits._
    // lng10 = -1800 and 1799 are circular neighbors; lat edge has no wrap
    val occ = Seq((0L, -1800L), (0L, 1799L)).toDF("lat10", "lng10")
    val out = Spatial.focalDensity(occ)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out((0L, -1800L)) === 2L)
    assert(out((0L, 1799L)) === 2L)
  }

  test("mortonExpr matches an independent bit-interleave reference") {
    def mortonRef(x: Long, y: Long, xBits: Int, yBits: Int): Long = {
      var z = 0L
      for (i <- 0 until xBits) z |= ((x >> i) & 1L) << (2 * i)
      for (i <- 0 until yBits) z |= ((y >> i) & 1L) << (2 * i + 1)
      z
    }
    val ss = spark; import ss.implicits._
    val pts = for (x <- 0L until 128L by 7L; y <- 0L until 64L by 5L) yield (x, y)
    val got = pts.toDF("tx", "ty")
      .withColumn("zk", expr(Spatial.mortonExpr("tx", "ty", 7, 6, "div")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y, 7, 6), s"($x,$y)")
    }
  }

  test("zorderLayout: 64-key blocks span at most an 8×8 tile square") {
    val ss = spark; import ss.implicits._
    // a full 128×64 grid — every block is complete, so every span is exact
    val tiles = (for (x <- 0L until 128L; y <- 0L until 64L)
      yield ("0:0", x, y, 1L)).toDF("map_key", "tx", "ty", "total")
    val out = Spatial.zorderLayout(tiles, 7, 6).collect()
    assert(out.length === 128 * 64 / 64)
    out.foreach { r =>
      assert(r.getAs[Long]("span_x") === 8L && r.getAs[Long]("span_y") === 8L)
      assert(r.getAs[Long]("n_rows") === 64L && r.getAs[Long]("n_tiles") === 64L)
    }
  }
}
