package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on $SPARK_GRAFT_SF_DIR and
  * prints one JSON line. A full warmup pass at sf0.001 first so JIT/codegen
  * compilation is not charged to the first timed query; timed runs force full
  * materialization through the noop sink (count() could skip projections).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE coalescing stays ON (the iterative graph queries need it —
      // q47/q66 measured 2× slower without); the pyramid family instead
      // pins its aggregation exchanges explicitly (MapBuild.pinByKeys),
      // which is where byte-sized coalescing mis-sized agg state 10–20×
      // and spilled 50 GB at 10× sf0.1. ScaleLab reproduces both A/Bs.
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(dir: String, name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // builders may persist intermediates (pyramid levels); drop them so
      // one query's cache never skews the next query's timing
      spark.catalog.clearCache()
      dt
    }

    // optional args = subset of query names (targeted timing during tuning)
    val names0 = SparkEntry.queries.keys.toSeq.sorted
    val names = if (args.nonEmpty) names0.filter(args.contains) else names0
    names.foreach(run(warmDir, _)) // warmup: compile/JIT every plan shape
    // two timed runs, keep the min — single runs swing ±40% from GC debt
    // accumulated by earlier queries; System.gc() flattens the baseline
    val results = names.map { n =>
      System.gc()
      val a = run(sfDir, n)
      System.gc()
      val b = run(sfDir, n)
      n -> (if (a < 0 || b < 0) math.max(a, b) else math.min(a, b))
    }
    // 2-decimal seconds + short `qNN` keys keep the whole JSON line well
    // under the ~2 KiB tail-truncating log capture downstream; full query
    // names (with the same qNN prefix) live in the correctness report
    def f(v: Double) = "%.2f".format(v)
    val qs = results.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // failed queries are both listed by name AND reflected in the exit code,
    // so automation gating on rc (or parsing the line) catches a broken round
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val failedJson = failed.mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
