package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving-latency microbench for the single-request store paths — the
  * repo-side number to sit beside the reference's published "sub 5 ms"
  * for project+filter+collect of a point blob
  * (PointFeatureFilters.java:71-74, BASELINE.md "Serving point-filter
  * latency").
  *
  * Two measurements per path (points blob, tile blob), warm and
  * single-threaded:
  *  - `decode+filter` — the in-process half AFTER the blob bytes are in
  *    hand: decode, year/bor filter, aggregate to the response rows. This
  *    is the region the reference's 5 ms covers (its GET is an HBase
  *    region-server read; at production our store is the same kind of
  *    key-value service — Spark only BUILDS it).
  *  - `e2e` — the full TileServe.servePoints/serveTile call including the
  *    salted-parquet GET, which on Spark costs a scheduled job per
  *    request; reported for transparency, not comparability (a serving
  *    deployment fronts the store with a KV service, not a Spark job per
  *    GET).
  *
  * Run: `sbt "runMain graft.plans.ServeLab [sfDir]"`. Numbers recorded in
  * BASELINE.md.
  */
object ServeLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("serve-lab").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val workDir = java.nio.file.Files.createTempDirectory("serve-lab").toString
    val m = graft.sources.Workflow.build(spark, sfDir, workDir,
      projections = Seq("EPSG:4326"))
    val years = graft.core.YearRange(Some(1995), Some(2005))
    val bors = Seq(0, 1)

    // the LARGEST blobs in the store — the worst-case single request
    val pKey = spark.read.parquet(s"${m.points}_blobs")
      .orderBy(length(col("blob")).desc).select("map_key").head.getString(0)
    val t = spark.read.parquet(s"${m.tiles}/srs=EPSG_4326/zoom=0")
      .filter(col("map_key") === "0:0")
      .select("z", "tx", "ty").head
    val (tz, tx, ty) = (t.getAs[Number](0).intValue,
      t.getAs[Number](1).longValue, t.getAs[Number](2).longValue)

    // pre-fetched blob bytes for the in-process half
    val pBlob = graft.sources.KeyedSink.lookup(spark, s"${m.points}_blobs",
      graft.sources.Workflow.PointSaltModulus, pKey)
      .select("blob").head.getAs[Array[Byte]](0)
    val tBlob = graft.sources.KeyedSink.lookup(spark,
      s"${m.tiles}/srs=EPSG_4326/zoom=$tz",
      graft.sources.Workflow.TileSaltModulus, s"EPSG:4326:0:0:$tz:$tx:$ty")
      .select("mvt").head.getAs[Array[Byte]](0)

    def stats(name: String, reps: Int, warm: Int)(body: => Any): Unit = {
      var sink = 0L
      (0 until warm).foreach(_ => body)
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        val r = body
        sink += r.hashCode() // defeat dead-code elimination
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"$name%-28s min=${times.head}%8.3f ms  " +
        f"median=${times(reps / 2)}%8.3f ms  p99=${times((reps * 99) / 100)}%8.3f ms" +
        f"  (n=$reps, sink=${sink % 10})")
    }

    println(s"store=$workDir pointsView=$pKey tile=0:0/$tz/$tx/$ty " +
      s"pBlob=${pBlob.length}B tBlob=${tBlob.length}B")
    // in-process halves on pre-fetched bytes — EXACTLY the production
    // serve kernels (TileServe.pointsFilterDecode / tileFilterAggregate),
    // so the published latency measures the real path by construction
    stats("points decode+filter", 500, 100) {
      graft.operators.TileServe.pointsFilterDecode(Seq(pBlob), years, bors)
    }
    stats("tile decode+filter+agg", 500, 100) {
      graft.operators.TileServe.tileFilterAggregate(Seq(tBlob), years, bors)
    }
    // the GET arms, isolated: scheduled Spark scan vs the job-free direct
    // parquet read (salt dir + footer prune, KeyedSink.lookupDirect)
    stats("points GET (Spark job)", 50, 10) {
      graft.sources.KeyedSink.lookup(spark, s"${m.points}_blobs",
        graft.sources.Workflow.PointSaltModulus, pKey)
        .select("blob").collect()
    }
    stats("points GET (direct)", 500, 100) {
      graft.sources.KeyedSink.lookupDirect(s"${m.points}_blobs",
        graft.sources.Workflow.PointSaltModulus, pKey)
    }
    stats("tile GET (direct)", 500, 100) {
      graft.sources.KeyedSink.lookupDirect(s"${m.tiles}/srs=EPSG_4326/zoom=$tz",
        graft.sources.Workflow.TileSaltModulus, s"EPSG:4326:0:0:$tz:$tx:$ty")
    }
    // full production calls — now GET(direct) + decode, NO Spark job
    stats("points e2e (direct GET)", 500, 100) {
      graft.operators.TileServe.servePoints(spark, workDir, pKey, years, bors)
    }
    stats("tile e2e (direct GET)", 500, 100) {
      graft.operators.TileServe.serveTile(spark, workDir, "EPSG:4326", "0:0",
        tz, tx, ty, years, bors)
    }
    // concurrent serving throughput — the region-server story is
    // many-threaded; 8 request threads hammering the job-free GET through
    // the shared footer cache (SinkSpec proves the answers stay exact;
    // this measures the aggregate rate)
    val threadsN = 8; val perThread = 500
    (0 until 100).foreach(_ => graft.sources.KeyedSink.lookupDirect(
      s"${m.points}_blobs", graft.sources.Workflow.PointSaltModulus, pKey))
    val t0 = System.nanoTime()
    val ths = (0 until threadsN).map(_ => new Thread(() =>
      (0 until perThread).foreach(_ => graft.sources.KeyedSink.lookupDirect(
        s"${m.points}_blobs", graft.sources.Workflow.PointSaltModulus, pKey))))
    ths.foreach(_.start()); ths.foreach(_.join())
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"points GET concurrent      $threadsN threads x $perThread: " +
      f"${threadsN * perThread / secs}%8.0f GETs/s  (${secs}%.2f s total)")
    spark.stop()
  }
}
