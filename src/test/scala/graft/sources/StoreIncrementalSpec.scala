package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-vs-rebuild store equality gates (batch and streaming),
  * split out of SinkSpec (round 12) for the same suite-wall reason as
  * [[StoreDeepSpec]]: the two tests are self-contained (own temp stores),
  * ~4.5 min together on the build box, and now run in their own forked
  * JVM concurrently with the other suites.
  */
class StoreIncrementalSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val Dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "4096")
      .appName("store-incremental-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("incremental store update equals a fresh rebuild over base+delta " +
    "(points, blobs, every zoom's tiles, manifest bump), including a " +
    "spatially-bounded ingest that file-copies clean state cells") {
    val occ = graft.operators.OccurrenceView.occ(spark, Dir)
    val base = occ.filter(col("l_orderkey") % 5 =!= 0)
    val delta = occ.filter(col("l_orderkey") % 5 === 0)
    val projs = Seq("EPSG:4326")
    val incDir = java.nio.file.Files.createTempDirectory("graft-inc").toString
    val freshDir = java.nio.file.Files.createTempDirectory("graft-fresh").toString
    val m1 = Workflow.buildFrom(spark, base, incDir, projs)
    // two chained ingest waves: a spatially CONCENTRATED one (dirties few
    // coarse cells — clean cells must carry over by file copy) then the
    // world-wide remainder; composing to the same store as one rebuild
    // proves both the pruned merge and the copied-partition passthrough
    val inBox = col("lng") >= 0 && col("lng") < 40 &&
      col("lat") >= 0 && col("lat") < 40
    val mInc1 = Workflow.incrementalUpdate(spark, delta.filter(inBox), incDir, projs)
    val mInc = Workflow.incrementalUpdate(spark, delta.filter(!inBox), incDir, projs)
    val mFresh = Workflow.buildFrom(spark, occ, freshDir, projs)
    assert(m1.version === 1L && mInc1.version === 2L && mInc.version === 3L)
    assert(Workflow.readManifest(incDir).get === mInc)
    // the bounded wave really exercised the copy path: v2's fine state
    // contains clean-cell directories whose parquet FILE NAMES are v1's
    // (a rewrite would have generated fresh part-file UUIDs)
    def partNames(dir: String): Map[String, Set[String]] = {
      val d = new java.io.File(dir)
      d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("pt="))
        .map(p => p.getName ->
          p.listFiles().map(_.getName).filter(_.startsWith("part-")).toSet)
        .toMap
    }
    val v1parts = partNames(s"$incDir/v1/state/srs=EPSG_4326/fine")
    val v2parts = partNames(s"$incDir/v2/state/srs=EPSG_4326/fine")
    val copied = v2parts.filter { case (pt, names) =>
      v1parts.get(pt).contains(names) && names.nonEmpty
    }
    assert(copied.nonEmpty,
      "bounded ingest rewrote every state cell — no clean cell was file-copied")
    assert(copied.size < v2parts.size,
      "bounded ingest copied every cell — the dirty cells were not rewritten")

    def rows(path: String, cols: String*) = {
      val df = spark.read.parquet(path).select(cols.map(col): _*)
      df.collect().map(_.toSeq).toSet
    }
    // points store rows identical (including salted keys)
    assert(rows(mInc.points, "salted_key", "lat10", "lng10", "bor_year", "occ_count")
      === rows(mFresh.points, "salted_key", "lat10", "lng10", "bor_year", "occ_count"))
    // small-view blob store identical (bifurcation re-derived from merged totals)
    assert(rows(s"${mInc.points}_blobs", "salted_key", "blob")
        .map { s => Seq(s.head, s(1).asInstanceOf[Array[Byte]].toSeq) }
      === rows(s"${mFresh.points}_blobs", "salted_key", "blob")
        .map { s => Seq(s.head, s(1).asInstanceOf[Array[Byte]].toSeq) })
    // every zoom's tile store identical — clean passthrough + dirty
    // re-encode must compose to exactly the rebuild's blobs
    (0 to 6).foreach { z =>
      val a = rows(s"${mInc.tiles}/srs=EPSG_4326/zoom=$z", "salted_key", "mvt")
        .map { s => (s.head, s(1).asInstanceOf[Array[Byte]].toSeq) }
      val b = rows(s"${mFresh.tiles}/srs=EPSG_4326/zoom=$z", "salted_key", "mvt")
        .map { s => (s.head, s(1).asInstanceOf[Array[Byte]].toSeq) }
      assert(a === b, s"zoom $z diverged")
    }
    // the new state equals the fresh build's state (next ingest starts
    // right) — BOTH halves of the prunable layout: the coarse-cell-
    // partitioned fine table (dirty cells rewritten + clean cells
    // file-copied must compose to the rebuild's state) and the zc-grain
    // coarse side table
    val stateCols = Seq("map_key", "px", "py", "bor_year", "occ_count")
    assert(rows(s"$incDir/v3/state/srs=EPSG_4326/fine", stateCols: _*)
      === rows(s"$freshDir/v1/state/srs=EPSG_4326/fine", stateCols: _*))
    assert(rows(s"$incDir/v3/state/srs=EPSG_4326/coarse", stateCols: _*)
      === rows(s"$freshDir/v1/state/srs=EPSG_4326/coarse", stateCols: _*))
  }

  test("STREAMING ingest maintains the versioned prunable store: two " +
    "micro-batches each run the pruned incremental lifecycle (manifest " +
    "v2 then v3; the spatially-bounded batch file-copies clean state " +
    "cells), and the final store equals a fresh rebuild over base + both " +
    "batches") {
    val occ = graft.operators.OccurrenceView.occ(spark, Dir)
    val base = occ.filter(col("l_orderkey") % 5 =!= 0)
    val delta = occ.filter(col("l_orderkey") % 5 === 0)
    val projs = Seq("EPSG:4326")
    // the stream carries RAW lineitem appends; the ingest derives the occ
    // view per micro-batch (occFrom) exactly as the batch side does
    val rawCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_returnflag",
      "l_linestatus")
    val inBox = col("lng") >= 0 && col("lng") < 40 &&
      col("lat") >= 0 && col("lat") < 40
    val streamDir = java.nio.file.Files.createTempDirectory("graft-sihttp").toString
    val inDir = s"$streamDir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    val storeDir = s"$streamDir/store"
    val freshDir = s"$streamDir/fresh"
    val m1 = Workflow.buildFrom(spark, base, storeDir, projs)
    assert(m1.version === 1L)

    def addWave(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$streamDir/tmp-$name"
      df.select(rawCols.map(col): _*).coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(inDir, s"$name.parquet"))
    }
    // wave 1 spatially bounded (the clean-cell copy case), wave 2 the rest
    addWave(delta.filter(inBox), "wave1")
    val schema = spark.read.parquet(inDir).schema
    val q = graft.streaming.EventStream.continuousIncrementalIngest(
      spark, inDir, schema, storeDir, projs)
    try {
      q.processAllAvailable()
      assert(Workflow.readManifest(storeDir).get.version === 2L,
        "first micro-batch should have produced store version 2")
      addWave(delta.filter(!inBox), "wave2")
      q.processAllAvailable()
    } finally q.stop()
    val mFinal = Workflow.readManifest(storeDir).get
    assert(mFinal.version === 3L,
      "second micro-batch should have produced store version 3")
    assert(mFinal.streamBatch === 1L,
      "manifest should carry the last committed micro-batch id")

    // replay safety: a NEW query (fresh checkpoint) over the same input
    // re-delivers both batches as ids 0/1; the manifest's stream-batch
    // watermark makes the non-idempotent keyed addition SKIP them — the
    // store must not advance a version or double-count (the downstream
    // fresh-rebuild equality then proves the content stayed intact)
    val q2 = graft.streaming.EventStream.continuousIncrementalIngest(
      spark, inDir, schema, storeDir, projs)
    try q2.processAllAvailable() finally q2.stop()
    assert(Workflow.readManifest(storeDir).get === mFinal,
      "replayed micro-batches re-applied — exactly-once watermark failed")

    // the bounded micro-batch exercised the copy path: v2 clean-cell
    // directories keep v1's parquet file names (a rewrite would have
    // fresh part-file UUIDs)
    def partNames(dir: String): Map[String, Set[String]] = {
      val d = new java.io.File(dir)
      d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("pt="))
        .map(p => p.getName ->
          p.listFiles().map(_.getName).filter(_.startsWith("part-")).toSet)
        .toMap
    }
    val v1parts = partNames(s"$storeDir/v1/state/srs=EPSG_4326/fine")
    val v2parts = partNames(s"$storeDir/v2/state/srs=EPSG_4326/fine")
    val copied = v2parts.filter { case (pt, names) =>
      v1parts.get(pt).contains(names) && names.nonEmpty
    }
    assert(copied.nonEmpty,
      "bounded micro-batch rewrote every state cell — no clean-cell copy")
    assert(copied.size < v2parts.size,
      "bounded micro-batch copied every cell — dirty cells not rewritten")

    // stream-maintained store ≡ one fresh rebuild over base + both waves
    val mFresh = Workflow.buildFrom(spark, occ, freshDir, projs)
    def rows(path: String, cols: String*) =
      spark.read.parquet(path).select(cols.map(col): _*)
        .collect().map(_.toSeq).toSet
    assert(rows(mFinal.points, "salted_key", "lat10", "lng10", "bor_year", "occ_count")
      === rows(mFresh.points, "salted_key", "lat10", "lng10", "bor_year", "occ_count"))
    (0 to 6).foreach { z =>
      val a = rows(s"${mFinal.tiles}/srs=EPSG_4326/zoom=$z", "salted_key", "mvt")
        .map { s => (s.head, s(1).asInstanceOf[Array[Byte]].toSeq) }
      val b = rows(s"${mFresh.tiles}/srs=EPSG_4326/zoom=$z", "salted_key", "mvt")
        .map { s => (s.head, s(1).asInstanceOf[Array[Byte]].toSeq) }
      assert(a === b, s"zoom $z diverged from the fresh rebuild")
    }
    val stateCols = Seq("map_key", "px", "py", "bor_year", "occ_count")
    assert(rows(s"$storeDir/v3/state/srs=EPSG_4326/fine", stateCols: _*)
      === rows(s"$freshDir/v1/state/srs=EPSG_4326/fine", stateCols: _*))
    assert(rows(s"$storeDir/v3/state/srs=EPSG_4326/coarse", stateCols: _*)
      === rows(s"$freshDir/v1/state/srs=EPSG_4326/coarse", stateCols: _*))
  }
}
