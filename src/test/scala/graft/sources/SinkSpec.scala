package graft.sources

import graft.core.Salt
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Salted keyed sink + workflow manifest lifecycle on sf0.001. */
class SinkSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val Dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _
  private var work: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("sink-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    work = java.nio.file.Files.createTempDirectory("graft-work")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("workflow build writes salted stores and swaps the manifest") {
    val m1 = Workflow.build(spark, Dir, work.toString)
    assert(m1.version === 1L)
    val m2 = Workflow.build(spark, Dir, work.toString)
    assert(m2.version === 2L)
    assert(Workflow.readManifest(work.toString).get === m2)
    // previous version retained for rollback
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(m1.points)))

    // points store: every row's salt matches its key's salt; lookup works
    val pts = spark.read.parquet(m2.points)
    val salt10 = Salt(10)
    val bad = pts.select("key", "salt")
      .collect().count(r => salt10.saltOf(r.getString(0)) != r.getInt(1))
    assert(bad === 0)
    val one = KeyedSink.lookup(spark, m2.points, 10, "0:0")
    assert(one.count() > 0)
    assert(one.select("map_key").distinct().collect().map(_.getString(0)).toSeq === Seq("0:0"))

    // tiles store: 4326 MVT blobs decode and conserve the points total
    // (other projections clip to their hemispheres)
    val tiles = spark.read.parquet(s"${m2.tiles}/srs=EPSG_4326")
      .select("map_key", "mvt").collect()
    val totalFromTiles = tiles.filter(_.getString(0) == "0:0")
      .map(r => graft.functions.Mvt.decodeTile(r.getAs[Array[Byte]](1)).map(_.total).sum).sum
    val expected = spark.read.parquet(m2.points)
      .filter(col("map_key") === "0:0").agg(sum("occ_count")).head.getLong(0)
    assert(totalFromTiles === expected)
  }

  test("rows within each salt partition are sorted by salted key") {
    val m = Workflow.readManifest(work.toString).get
    import scala.jdk.CollectionConverters._
    val saltDirs = java.nio.file.Files.list(java.nio.file.Paths.get(m.points))
      .iterator().asScala.filter(_.getFileName.toString.startsWith("salt=")).toSeq
    assert(saltDirs.nonEmpty)
    saltDirs.foreach { d =>
      val files = java.nio.file.Files.list(d).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
      files.foreach { f =>
        val keys = spark.read.parquet(f.toString)
          .select("salted_key").collect().map(_.getString(0)).toSeq
        assert(keys === keys.sorted, s"unsorted parquet in $d")
      }
    }
  }
}
