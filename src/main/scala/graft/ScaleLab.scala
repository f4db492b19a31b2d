package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{MapBuild, OccurrenceView}

/** One-off experiment harness for the scale probe's findings: runs pyramid
  * plan variants against the already-materialized x10 replica dir and
  * prints the same stage totals as BenchScale's debug listener. The
  * round-5 probe showed the pyramid trio spilling 50–70 GB at x10 while
  * shuffle volume grew sub-linearly — this isolates WHERE (partial-agg
  * maps after the explode vs AQE partition coalescing vs final-agg state).
  */
object ScaleLab {

  private final class M extends org.apache.spark.scheduler.SparkListener {
    @volatile var shufW = 0L; @volatile var spillM = 0L; @volatile var spillD = 0L
    @volatile var exec = 0L
    def reset(): Unit = { shufW = 0; spillM = 0; spillD = 0; exec = 0 }
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        shufW += m.shuffleWriteMetrics.bytesWritten
        spillM += m.memoryBytesSpilled; spillD += m.diskBytesSpilled
        exec += m.executorRunTime
      }
    }
    def line = f"shufW=${shufW / 1e6}%.0fMB spillMem=${spillM / 1e6}%.0fMB " +
      f"spillDisk=${spillD / 1e6}%.0fMB exec=${exec / 1e3}%.1fs"
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_LAB_DIR", "/tmp/graft-scale-x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_LAB_PARTS", "320").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = new M
    spark.sparkContext.addSparkListener(m)

    def run(name: String)(mk: => DataFrame): Unit = {
      // warm once, then two timed runs
      (1 to 2).foreach { i =>
        m.reset(); System.gc()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[lab] $name run$i ${dt}%.1fs ${m.line}")
      }
    }

    val occ = OccurrenceView.occ(spark, dir)

    args.foreach {
      case "current" =>
        run("current")(MapBuild.pyramid(occ, "EPSG:4326", 0, 6))
      case "noCoalesce" =>
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        run("noCoalesce")(MapBuild.pyramid(occ, "EPSG:4326", 0, 6))
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      case "noAqe" =>
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        run("noAqe")(MapBuild.pyramid(occ, "EPSG:4326", 0, 6))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      case s if s.startsWith("adv") =>
        // keep coalescing but size it for agg-state memory, not shuffle IO
        val mb = s.drop(3).toInt
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", s"${mb}m")
        run(s)(MapBuild.pyramid(occ, "EPSG:4326", 0, 6))
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      case "repartAgg" =>
        // repartition the exploded rows by the exact group key BEFORE the
        // aggregation: the exchange then carries raw exploded rows (which
        // the current partial agg barely reduces anyway) and both halves
        // of the aggregate run post-exchange on ~1/parts of the keys each
        run("repartAgg") {
          val top = MapBuild.explodeMapKeys(MapBuild.withPixels(occ, "EPSG:4326"))
            .select(col("map_key"),
              shiftright(col("px"), OccurrenceView.MaxZoom - 6).as("px"),
              shiftright(col("py"), OccurrenceView.MaxZoom - 6).as("py"))
            .repartition(col("map_key"), col("px"), col("py"))
            .groupBy("map_key", "px", "py")
            .agg(count(lit(1)).as("total"))
          MapBuild.levelStats(top, 0, 6)
        }
      // q:<name>:<on|off> — run a SparkEntry query against SPARK_GRAFT_LAB_DIR
      // with AQE partition coalescing toggled, tight-succession comparable
      case s if s.startsWith("q:") =>
        val Array(_, name, flag) = s.split(":")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
          (flag == "on").toString)
        run(s)(SparkEntry.queries(name)(spark, dir))
      case other => System.err.println(s"unknown variant $other")
    }
    spark.stop()
  }
}
