package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the triangle-orientation dispatch (Dedup.triangles):
  * measures id- vs degree-ordered enumeration on a hub-skewed graph (star
  * + bounded cliques — the shape the round-5 negative result said to
  * re-measure on). The corpus-graph numbers in the `triangles` Scaladoc
  * came from the q117 bench; the hub numbers come from this.
  *
  * Run: `sbt "runMain graft.plans.TriangleLab [spokes] [cliques]"`.
  */
object TriangleLab {
  def main(args: Array[String]): Unit = {
    val spokes = args.headOption.map(_.toInt).getOrElse(6000)
    val nCliques = args.drop(1).headOption.map(_.toInt).getOrElse(400)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("triangle-lab").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // hub id in the MIDDLE of its spokes' ids: id-ordered wedge work at a
    // node is (#smaller-id neighbors × #larger-id neighbors), so a low- or
    // high-id hub degenerates to zero wedges and hides the blowup
    val hub = 50000L
    val star = (1L to spokes.toLong / 2).map(i => (i, hub)) ++
      (1L to spokes.toLong / 2).map(i => (hub, hub + i))
    val cliques = (0 until nCliques).flatMap { k =>
      val ids = (0 until 5).map(v => 100000L + 5L * k + v)
      for (i <- 0 until 5; j <- i + 1 until 5) yield (ids(i), ids(j))
    }
    val e = (star ++ cliques).toDF("doc_a", "doc_b")
      .repartition(32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"edges=${e.count()} spokes=$spokes cliques=$nCliques " +
      s"auto=${graft.operators.Dedup.triangleOrientation(e)}")
    def time(mode: String): Double = {
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.triangles(e, mode).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"mode=$mode triangles=$n time=$dt%.2fs")
      dt
    }
    time("id"); time("degree") // warm both paths
    val ids = Seq(time("id"), time("id"))
    val degs = Seq(time("degree"), time("degree"))
    println(f"ID mean=${ids.sum / 2}%.2fs DEGREE mean=${degs.sum / 2}%.2fs")
    spark.stop()
  }
}
