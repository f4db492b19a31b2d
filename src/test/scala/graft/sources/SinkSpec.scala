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
      // The full-depth z0-z16 build's AQE re-plan builds an explain string per
      // plan update; uncapped, that single string allocation OOM'd an 8g JVM
      // (AdaptiveSparkPlanExec.onUpdatePlan -> explainString). This suite never
      // asserts on explain text, so truncate aggressively.
      .config("spark.sql.maxPlanStringLength", "4096")
      .appName("sink-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    work = java.nio.file.Files.createTempDirectory("graft-work")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("manifest roundtrips paths containing JSON delimiter characters") {
    val dir = java.nio.file.Files.createTempDirectory("man,if{est").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "manifest.json"),
      s"""{"version": 7, "points": "$dir/v7/points", "tiles": "$dir/v7/tiles"}"""
        .getBytes("UTF-8"))
    val m = Workflow.readManifest(dir).get
    assert(m.version === 7L)
    assert(m.points === s"$dir/v7/points") // comma/brace in dir must survive
    assert(m.tiles === s"$dir/v7/tiles")
    // escaped quote/backslash in a JSON-compliant manifest unescapes on read
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "manifest.json"),
      """{"version": 8, "points": "/a\"b\\c/points", "tiles": "/t/tiles"}"""
        .getBytes("UTF-8"))
    val m2 = Workflow.readManifest(dir).get
    assert(m2.points === "/a\"b\\c/points")
  }

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

    // the job-free GET arm returns the exact same rows AND schema as the
    // scheduled-scan arm (order-insensitive; the store sorts within salt)
    val direct = KeyedSink.lookupDirect(m2.points, 10, "0:0")
    val viaSpark = one.collect()
    assert(direct.nonEmpty)
    assert(direct.head.schema.map(f => (f.name, f.dataType)) ===
      viaSpark.head.schema.map(f => (f.name, f.dataType)),
      s"direct=${direct.head.schema} spark=${viaSpark.head.schema}")
    assert(direct.map(_.toSeq).toSet === viaSpark.map(_.toSeq).toSet)
    // a key that salts to an existing directory but matches no row reads
    // empty through the record filter, and a missing salt dir reads empty
    assert(KeyedSink.lookupDirect(m2.points, 10, "no:such:key").isEmpty)
    assert(KeyedSink.lookupDirect(m2.points + "/does-not-exist", 10, "0:0").isEmpty)

    // tiles store: 4326 z6 MVT blobs decode and conserve the points total
    // (other projections clip to their hemispheres; lower zooms re-count it)
    val tiles = spark.read.parquet(s"${m2.tiles}/srs=EPSG_4326/zoom=6")
      .select("map_key", "mvt").collect()
    val totalFromTiles = tiles.filter(_.getString(0) == "0:0")
      .map(r => graft.functions.Mvt.decodeTile(r.getAs[Array[Byte]](1)).map(_.total).sum).sum
    val expected = spark.read.parquet(m2.points)
      .filter(col("map_key") === "0:0").agg(sum("occ_count")).head.getLong(0)
    assert(totalFromTiles === expected)
  }

  // "incremental store update ..." and "full-depth build ..." moved to
  // StoreIncrementalSpec / StoreDeepSpec (round 12): self-contained, ~7 min
  // combined, now run in their own forked JVMs concurrently (build.sbt
  // concurrency 3) — the sbt-test wall fix for the driver sandbox timeout.

  test("build derives everything from one materialized snapshot (S2/O4): " +
    "plans over the persisted occ read the cache, not the source") {
    import graft.operators.{MapBuild, OccurrenceView}
    val occ = OccurrenceView.occ(spark, Dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    occ.count() // the single source scan, as in Workflow.build
    // every downstream consumer (points + each projection pyramid) must plan
    // an InMemoryTableScan — no second FileScan of the fact table
    Seq(MapBuild.pointAgg(MapBuild.explodeMapKeys(occ)),
      MapBuild.pixelAgg(occ, "EPSG:3857"),
      MapBuild.pixelAgg(occ, "EPSG:3575")).foreach { df =>
      // the executing plan (everything above the InMemoryRelation, whose
      // printout includes the original cached lineage) must read the cache,
      // never the fact table
      val plan = df.queryExecution.executedPlan.toString.split("InMemoryRelation")(0)
      assert(plan.contains("InMemoryTableScan"), s"cache not used:\n$plan")
      assert(!plan.contains("lineitem"), s"source rescan found:\n$plan")
    }
    occ.unpersist()
  }

  test("serving a tile from the store equals computing it from the raw table") {
    import graft.operators.{MapBuild, OccurrenceView, TileServe}
    import graft.core.YearRange
    val m = Workflow.readManifest(work.toString).get
    val first = spark.read.parquet(s"${m.tiles}/srs=EPSG_4326/zoom=6")
      .filter(col("map_key") === "0:0")
      .select("tx", "ty").orderBy("tx", "ty").head
    val (tx, ty) = (first.getLong(0), first.getLong(1))

    val served = TileServe.serveTile(spark, work.toString, "EPSG:4326", "0:0",
      6, tx, ty, YearRange.Unbounded, Nil).toSet

    val z6 = MapBuild.rollupToZoom(
      MapBuild.pixelAgg(OccurrenceView.occ(spark, Dir), "EPSG:4326"), 16, 6)
    val fresh = z6.filter(col("map_key") === "0:0" &&
        (col("px") / 512).cast("long") === tx && (col("py") / 512).cast("long") === ty)
      .groupBy(pmod(col("px"), lit(512)).as("lpx"), pmod(col("py"), lit(512)).as("lpy"))
      .agg(sum("occ_count").as("n"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2))).toSet
    assert(served === fresh)
    assert(served.nonEmpty)

    // year-filtered serve is a subset with smaller totals
    val filtered = TileServe.serveTile(spark, work.toString, "EPSG:4326", "0:0",
      6, tx, ty, YearRange(Some(1995), Some(2005)), Nil)
    assert(filtered.map(_._3).sum < served.toSeq.map(_._3).sum)

    // the pyramid store serves lower zooms too: both z0 tiles of the 2x1
    // scheme together carry the view's full total
    val z0total = (0L to 1L).flatMap(x =>
      TileServe.serveTile(spark, work.toString, "EPSG:4326", "0:0",
        0, x, 0, YearRange.Unbounded, Nil)).map(_._3).sum
    val expected0 = spark.read.parquet(m.points)
      .filter(col("map_key") === "0:0").agg(sum("occ_count")).head.getLong(0)
    assert(z0total === expected0)

    // a zoom the store doesn't carry is an EMPTY response, not a read
    // error (the zoom-targeted GET must keep the old tree-scan's semantics
    // for an unmatched key)
    assert(TileServe.serveTile(spark, work.toString, "EPSG:4326", "0:0",
      9, 0, 0, YearRange.Unbounded, Nil).isEmpty)
  }

  test("point blobs roundtrip: served small view equals the fresh point aggregate") {
    import graft.operators.{MapBuild, OccurrenceView, TileServe}
    import graft.core.YearRange
    val occ = OccurrenceView.occ(spark, Dir)
    val ex = MapBuild.explodeMapKeys(occ)
    val small = MapBuild.filterToViews(ex,
      MapBuild.largeViews(occ, OccurrenceView.Threshold), keep = false)
    val pts = MapBuild.pointAgg(small).cache()
    val key = pts.select("map_key").orderBy("map_key").head.getString(0)

    val served = TileServe.servePoints(spark, work.toString, key,
      YearRange.Unbounded, Nil).toSet
    val fresh = pts.filter(col("map_key") === key)
      .select("lat10", "lng10", "bor_year", "occ_count")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(served === fresh)
    assert(served.nonEmpty)

    // bor-filtered serve is the exact bor slice
    val borOnly = TileServe.servePoints(spark, work.toString, key,
      YearRange.Unbounded, Seq(0)).toSet
    assert(borOnly === fresh.filter(_._3 % 100 == 0))
    pts.unpersist()
  }

  test("bucketed pixel tables co-locate: groupBy and self-join run with " +
    "ZERO keyed shuffle (S6 at cluster scale — bucket layout replaces the " +
    "exchange)") {
    import graft.operators.{MapBuild, OccurrenceView}
    val pix = MapBuild.pixelAggAt(OccurrenceView.occ(spark, Dir), "EPSG:4326", 6)
    val loc = java.nio.file.Files.createTempDirectory("graft-bucketed")
    pix.write.mode("overwrite")
      .bucketBy(8, "map_key").sortBy("map_key")
      .option("path", s"$loc/pix").saveAsTable("pix_bucketed")
    val t = spark.table("pix_bucketed")

    // aggregation on the bucket key: the scan's hash layout satisfies the
    // required distribution — no Exchange before the final aggregate
    val agg = t.groupBy("map_key").agg(sum("occ_count").as("total"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange hashpartitioning"), aggPlan)
    // and the result equals the unbucketed computation
    val direct = pix.groupBy("map_key").agg(sum("occ_count").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap === direct)

    // bucket-key equi-join of two co-bucketed tables: shuffle-free on BOTH
    // sides (sort-merge over the bucket layout)
    val viewTotals = agg.filter(col("total") > 100)
    val j = t.join(t.groupBy("map_key").agg(count(lit(1)).as("n")), Seq("map_key"))
    val jPlan = j.queryExecution.executedPlan.toString
    assert(!jPlan.contains("Exchange hashpartitioning"), jPlan)
    assert(j.count() === t.count())
    assert(viewTotals.count() > 0)
    spark.sql("DROP TABLE IF EXISTS pix_bucketed")
  }

  test("streaming continuous rebuild: each micro-batch of appends rebuilds " +
    "the store and swaps the manifest atomically") {
    val inDir = java.nio.file.Files.createTempDirectory("graft-stream-in")
    val accum = java.nio.file.Files.createTempDirectory("graft-stream-accum")
    val work2 = java.nio.file.Files.createTempDirectory("graft-stream-work")
    val li = spark.read.parquet(s"$Dir/lineitem.parquet")
    li.repartition(2).write.mode("overwrite").parquet(inDir.toString)
    val q = graft.streaming.EventStream.continuousRebuild(
      spark, inDir.toString, li.schema, accum.toString, work2.toString)
    try q.processAllAvailable()
    finally q.stop()
    // two part files, maxFilesPerTrigger=1 → two batches → two swaps
    val m = Workflow.readManifest(work2.toString).get
    assert(m.version === 2L)
    // the final store covers ALL appended rows: the points store's total
    // equals the exploded count of the full input (5 view keys per record)
    val total = spark.read.parquet(m.points)
      .agg(sum("occ_count")).head.getLong(0)
    assert(total === li.count() * 5)
    // rollback version still on disk
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(work2.toString, "v1", "points")))
  }

  test("lookupDirect is safe under concurrent GETs (serving-grade): 8 " +
    "threads hammering mixed keys all read exactly the single-threaded " +
    "answer, through the shared footer cache") {
    val m = Workflow.readManifest(work.toString).get
    val keys = spark.read.parquet(m.points).select("key").distinct()
      .limit(12).collect().map(_.getString(0)).toSeq
    assert(keys.nonEmpty)
    val expected = keys.map(k =>
      k -> KeyedSink.lookupDirect(m.points, 10, k).map(_.toSeq).toSet).toMap
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 8).map { t =>
      new Thread(() =>
        try (0 until 20).foreach { i =>
          val k = keys((t + i) % keys.length)
          val got = KeyedSink.lookupDirect(m.points, 10, k).map(_.toSeq).toSet
          if (got != expected(k)) errs.add(s"thread $t key $k mismatch")
        } catch { case e: Throwable => errs.add(s"thread $t: $e") })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(errs.isEmpty, errs.toString)
  }

  test("Lifecycle table-backed checkpoint arm: with the conf set, " +
    "withPersisted materializes to a parquet table (executor-loss-safe), " +
    "rows equal the localCheckpoint arm, inputs unpinned either way") {
    import graft.core.Lifecycle
    val src = spark.read.parquet(s"$Dir/documents.parquet")
      .select(col("doc_id"), col("source"))
    def body(in: org.apache.spark.sql.DataFrame) =
      in.groupBy("source").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val local = Lifecycle.withPersisted(src)(body(src))
      .collect().map(_.toSeq).toSet
    val ckpt = java.nio.file.Files.createTempDirectory("wp-table").toString
    spark.conf.set(Lifecycle.CheckpointDirKey, ckpt)
    try {
      val viaTable = Lifecycle.withPersisted(src)(body(src))
      assert(viaTable.collect().map(_.toSeq).toSet === local)
      // the result really is table-backed: a wp-* parquet dir exists and
      // re-collecting reads it (no lineage back to the source persist)
      val wpDirs = java.nio.file.Files.list(java.nio.file.Paths.get(ckpt))
        .iterator()
      assert(wpDirs.hasNext, "expected a wp-<uuid> table under the dir")
      assert(viaTable.queryExecution.analyzed.toString.contains("parquet"),
        viaTable.queryExecution.analyzed.toString)
      // no cache entry survives either arm
      assert(spark.sharedState.cacheManager.isEmpty,
        "withPersisted must leave the SQL cache empty")
    } finally spark.conf.unset(Lifecycle.CheckpointDirKey)
  }

  test("footer cache is a true LRU: overflow evicts only the coldest " +
    "entry, a hot served footer survives 2× the bound of churn, and " +
    "lookupDirect refuses non-local URIs loudly") {
    // a REAL footer from the current store (whatever file the build wrote)
    val m = Workflow.readManifest(work.toString).get
    val aFile = java.nio.file.Files.walk(java.nio.file.Paths.get(m.points))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    val meta = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      new org.apache.hadoop.conf.Configuration(),
      new org.apache.hadoop.fs.Path(aFile.toString),
      org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
    val hot = "/churn-test/hot.parquet"
    KeyedSink.footerCachePut(hot, meta)
    try {
    // version churn: 2× the bound of distinct cold entries, the hot one
    // touched every 1024 insertions as a live serving key would be
    (0 until KeyedSink.FooterCacheMax * 2).foreach { i =>
      KeyedSink.footerCachePut(s"/churn-test/v$i.parquet", meta)
      if (i % 1024 == 0) assert(KeyedSink.footerCacheTouch(hot),
        s"hot entry evicted after $i churn insertions")
    }
    val (size, hotAlive) = KeyedSink.footerCacheProbe(hot)
    assert(size <= KeyedSink.FooterCacheMax, s"cache exceeded bound: $size")
    assert(hotAlive, "hot entry must survive churn past the bound")
    // the clear-all failure mode this guards against: a cold entry from
    // the early churn is gone, evicted one-by-one, never en masse
    assert(!KeyedSink.footerCacheProbe("/churn-test/v0.parquet")._2)
    // non-local store URIs fail loudly instead of reading Seq.empty
    // through a java.nio miss (round-9 ADVICE)
    val e = intercept[IllegalArgumentException] {
      KeyedSink.lookupDirect("hdfs://namenode/store/points", 10, "0:0")
    }
    assert(e.getMessage.contains("lookup"), e.getMessage)
    // the cache is process-global: leave it empty, not saturated with 8k
    // synthetic paths every later same-JVM test would inherit
    } finally KeyedSink.footerCacheClear()
  }

  test("version churn mid-serve: after a manifest bump the OLD version's " +
    "store keeps answering job-free GETs (rollback window) and a " +
    "re-resolve serves the new version") {
    val mOld = Workflow.readManifest(work.toString).get
    val key = "0:0"
    val before = KeyedSink.lookupDirect(mOld.points, 10, key).map(_.toSeq).toSet
    assert(before.nonEmpty)
    // a new build = new version directory + atomic manifest swap
    val mNew = Workflow.build(spark, Dir, work.toString)
    assert(mNew.version === mOld.version + 1)
    assert(mNew.points !== mOld.points, "a version bump must be a new path")
    // an in-flight server still holding the old manifest keeps answering
    // byte-identically — immutable store, retained for rollback
    assert(KeyedSink.lookupDirect(mOld.points, 10, key).map(_.toSeq).toSet
      === before)
    // and a re-resolve picks up the new version (same query, new store)
    val after = KeyedSink.lookupDirect(mNew.points, 10, key).map(_.toSeq).toSet
    assert(after.nonEmpty)
    // the two builds read the same source rows, so content agrees even
    // though the paths differ
    assert(after === before)
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

  test("schema evolution: a store appended across versions with an added " +
    "column reads whole under mergeSchema, old rows null-filled") {
    val ss = spark; import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    // v1 writer has no quality column; a later ingest job adds one — the
    // 100 TB reality where the store outlives any one writer's schema
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .write.parquet(s"$dir/part=v1")
    Seq((3L, "c", 0.9)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$dir/part=v2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("doc_id", "text", "quality", "part"))
    val rows = merged.select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty, "pre-evolution rows null-fill")
    assert(rows(3L).contains(0.9))
    // the default reader (no mergeSchema) picks ONE file's schema — the
    // silent column-loss failure mode this option exists to prevent; pin
    // the behavior so readers of the versioned store always pass the flag
    val plain = spark.read.parquet(dir)
    assert(plain.count() === 3)
  }

  test("pruned incremental pyramid: the state SCAN touches only dirty " +
    "coarse-cell partitions (file-level pruning), output equals the " +
    "unpruned incremental path") {
    import graft.operators.MapBuild
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val o = graft.operators.OccurrenceView.occ(spark, Dir)
    val base = o.filter(col("l_orderkey") % 10 =!= 0)
    // a spatially CONCENTRATED ingest batch — the case partition pruning
    // exists for (a world-wide delta legitimately dirties every cell)
    val delta = o.filter(col("l_orderkey") % 10 === 0)
      .filter(col("lng") >= 0 && col("lng") < 40 && col("lat") >= 0 && col("lat") < 40)
    val store = java.nio.file.Files.createTempDirectory("pruned-state").toString
    val state = MapBuild.pyramidState(base, "EPSG:4326", 6)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    MapBuild.writePrunedState(state, store, 6, 2)
    val stored = MapBuild.pyramidFromState(state, 0, 6)

    val out = MapBuild.incrementalPyramidPruned(spark, store, stored, delta,
      "EPSG:4326", 0, 6, 2)
    def keyed(r: org.apache.spark.sql.Row) = {
      def l(i: Int) = r.getAs[Number](i).longValue
      (r.getString(0), l(5), l(1), l(2)) -> ((l(3), l(4)))
    }
    val got = out.collect().map(keyed).toMap

    // correctness: identical to the unpruned incremental path
    val want = MapBuild.incrementalPyramid(state, stored, delta, "EPSG:4326", 0, 6)
      .collect().map(keyed).toMap
    assert(got === want, "pruned path diverged from the unpruned incremental path")

    // pruning: walk the EXECUTED plan (post-collect, so scan metrics are
    // final) to the fine-state file scan and assert it opened strictly
    // fewer partitions/files than the store holds
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match { case f: FileSourceScanExec => Seq(f); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(scans) ++ p.subqueries.flatMap(scans)
    }
    val fineScans = scans(out.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("fine")))
    assert(fineScans.nonEmpty, "no file scan over the fine state found")
    val ptDirs = new java.io.File(s"$store/fine").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("pt="))
    assert(ptDirs > 4, s"store layout collapsed to $ptDirs partitions")
    fineScans.foreach { sc =>
      val readParts = sc.metrics("numPartitions").value
      assert(readParts > 0 && readParts < ptDirs,
        s"state scan read $readParts of $ptDirs coarse cells — not pruned")
    }

    // the minZoom >= zc edge (no coarse side table in play: every
    // requested level recomputes from the pruned fine state alone) must
    // also match the unpruned path
    val outFineOnly = MapBuild.incrementalPyramidPruned(spark, store,
      MapBuild.pyramidFromState(state, 3, 6), delta, "EPSG:4326", 3, 6, 2)
      .collect().map(keyed).toMap
    val wantFineOnly = MapBuild.incrementalPyramid(state,
      MapBuild.pyramidFromState(state, 3, 6), delta, "EPSG:4326", 3, 6)
      .collect().map(keyed).toMap
    assert(outFineOnly === wantFineOnly, "fine-only branch diverged")

    // the broadcast-budget dispatch: forced into fallback (threshold 1)
    // it must produce the identical pyramid via rebuild-from-state — and
    // its plan must carry NO broadcast dirty-set joins
    val stored06 = MapBuild.pyramidFromState(state, 0, 6)
    val auto = MapBuild.incrementalPyramidAuto(state, stored06, delta,
      "EPSG:4326", 0, 6, maxDirtyKeys = 1L)
    assert(auto.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "fallback should be a joinless rebuild from state")
    assert(auto.collect().map(keyed).toMap === got,
      "fallback rebuild diverged from the incremental result")
    state.unpersist()
  }

  test("pruned-state fine write salts WITHIN each coarse cell: a hot cell's " +
    "rows spread across multiple write tasks/files (parallelism scales with " +
    "cells x salt, not cells), layout keeps one directory per cell and the " +
    "rows round-trip unchanged; zc > maxZoom is rejected") {
    import graft.operators.MapBuild
    val o = graft.operators.OccurrenceView.occ(spark, Dir)
    // spatially CONCENTRATED state — the skewed fixture: nearly all pixels
    // land in very few zoom-2 cells, the case where repartition(pt) alone
    // serialized each hot cell through ONE write task
    val hot = o.filter(col("lng") >= 0 && col("lng") < 30 &&
      col("lat") >= -30 && col("lat") < 0)
    val state = MapBuild.pyramidState(hot, "EPSG:4326", 6)
    val store = java.nio.file.Files.createTempDirectory("salted-state").toString
    // at sandbox scale every (pt, salt) split is below the AQE advisory
    // size and coalescing would (correctly) re-merge them — disable it for
    // the write so the salt's task split is observable; at 100 TB a hot
    // cell's splits exceed the advisory size and keep their parallelism
    // with coalescing ON (see writeFineCells' Scaladoc)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try MapBuild.writePrunedState(state, store, 6, 2)
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val dirs = new java.io.File(s"$store/fine").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("pt="))
    assert(dirs.nonEmpty, "no coarse-cell directories written")
    val filesPerCell = dirs.map(d => d.getName ->
      d.listFiles().count(_.getName.startsWith("part-"))).toMap
    // the hot cell must have been written by >1 task (pre-salt: exactly 1
    // file per cell) and stay bounded by the salt count
    assert(filesPerCell.values.max > 1,
      s"hot cell serialized through one write task: $filesPerCell")
    assert(filesPerCell.values.max <= MapBuild.StateSaltBuckets,
      s"files per cell exceeded the salt bound: $filesPerCell")
    // total write tasks across the store exceed the cell count — the
    // directive's parallelism assertion, phrased on the artifact
    assert(filesPerCell.values.sum > dirs.length,
      s"write used no more tasks than cells: $filesPerCell")
    // rows unchanged by the salted layout
    val back = spark.read.parquet(s"$store/fine")
      .select("map_key", "px", "py", "total")
      .collect().map(_.toSeq).toSet
    assert(back === state.select("map_key", "px", "py", "total")
      .collect().map(_.toSeq).toSet)
    // layout validation now guards the WRITER too (previously only the
    // reader): a zc beyond maxZoom corrupted the partition value silently
    intercept[IllegalArgumentException] {
      MapBuild.writePrunedState(state, store + "-bad", 6, 7)
    }
  }
}
