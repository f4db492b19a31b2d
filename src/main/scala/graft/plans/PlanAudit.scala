package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: dump formatted physical plans for representative queries so
  * shuffle counts, pushdown (`PushedFilters`/`ReadSchema`), and join
  * strategies can be reviewed per round. `runMain graft.plans.PlanAudit
  * [queryName...]`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q06_pixel_agg_4326", "q15_year_filter", "q34_country_mask",
        "q35_small_views", "q29_lsh_neardup", "q42_mvt_tiles")
    names.foreach { q =>
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, dir)
        .queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
