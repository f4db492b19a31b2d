package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raster-neighborhood and storage-layout spatial operators over the
  * occurrence grid — beyond the reference's own surface, but directly in its
  * domain (density surfaces and tile-store key design; the reference's
  * salted HBase keys are the same problem [[graft.core.Salt]] solves, and
  * `mortonExpr` is the locality-preserving alternative the layout audit
  * quantifies).
  *
  * Everything here is integer arithmetic end-to-end, so the DuckDB oracle
  * reproduces results bit-for-bit at any partition count.
  */
object Spatial {

  /** 3×3 box-kernel focal sum (hotspot / kernel-density surface) over the
    * tenth-of-a-degree integer cell grid: each occupied cell's `focal9` is
    * the occurrence count of its 3×3 neighborhood, with longitude wrapping
    * across the dateline (lng10 ∈ [-1800, 1800) is circular; latitude is
    * not).
    *
    * Scale shape: counts aggregate FIRST (one shuffle over raw records with
    * partial aggregation), then the bounded 9-arm offset explode runs over
    * the *aggregated* cells — the same collapse-before-amplify discipline as
    * the G2 replica assembly (`MapBuild.tileReplicaAssembly`). The focal
    * re-aggregation and the cells⋈focal join share the cell key, so AQE
    * co-partitions them; nothing here is ever quadratic and no kernel window
    * scans raw rows. At 100 TB the cell table is ≤ 6.1 M rows (1700×3600
    * grid) regardless of input size — the explode amplifies a *bounded*
    * table, which is why kernel radius changes (5×5, 7×7) stay cheap.
    *
    * Output: (lat10, lng10, n, focal9) for every OCCUPIED cell — empty
    * cells receiving spill from neighbors are not emitted (they carry no
    * center mass; emitting them would 9× the output for pure-halo rows).
    */
  def focalDensity(occ: DataFrame): DataFrame = {
    val cells = occ.groupBy("lat10", "lng10").agg(count(lit(1)).as("n"))
    val offsets = array((for (dy <- -1 to 1; dx <- -1 to 1)
      yield struct(lit(dy).as("dy"), lit(dx).as("dx"))): _*)
    val contrib = cells
      .select(col("lat10"), col("lng10"), col("n"), explode(offsets).as("o"))
      .select(
        (col("lat10") + col("o.dy")).as("lat10"),
        // circular longitude: +1800 shifts into [0,3600), +3600 keeps the
        // dividend non-negative so % agrees across engines, -1800 shifts back
        (((col("lng10") + col("o.dx") + 1800 + 3600) % 3600) - 1800).as("lng10"),
        col("n"))
    val focal = contrib.groupBy("lat10", "lng10")
      .agg(sum("n").as("focal9"))
    cells.join(focal, Seq("lat10", "lng10"))
      .select(col("lat10"), col("lng10"), col("n"), col("focal9"))
  }

  /** The 3×3 focal-sum oracle over the same `occ2` CTE (9-row offset cross
    * join mirrors the bounded explode).
    */
  val FocalSql: String =
    """cells AS (SELECT lat10, lng10, count(*) AS n FROM occ2 GROUP BY 1, 2),
      |offs AS (SELECT dy.x AS dy, dx.x AS dx
      |  FROM (SELECT unnest(range(-1, 2)) AS x) dy,
      |       (SELECT unnest(range(-1, 2)) AS x) dx),
      |contrib AS (SELECT c.lat10 + o.dy AS lat10,
      |  ((c.lng10 + o.dx + 1800 + 3600) % 3600) - 1800 AS lng10, c.n
      |  FROM cells c, offs o),
      |focal AS (SELECT lat10, lng10, CAST(sum(n) AS BIGINT) AS focal9
      |  FROM contrib GROUP BY 1, 2)""".stripMargin

  /** Morton (Z-order) interleave of tile coordinates as pure integer
    * arithmetic — bit i of x lands at position 2i, bit i of y at 2i+1, so
    * consecutive key ranges are spatially compact squares. `xBits` may
    * exceed `yBits` by one for the EPSG:4326 2×1 tile scheme (x has a spare
    * top bit).
    *
    * Generated as an arithmetic STRING (div/mod/multiply only) so the exact
    * same formula text runs as a Spark expression (`div`) and a DuckDB
    * oracle expression (`//`) — one Scala source of truth, zero bitwise
    * builtins whose negative/overflow semantics could diverge.
    */
  def mortonExpr(x: String, y: String, xBits: Int, yBits: Int,
      intDiv: String): String = {
    require(xBits >= yBits && xBits <= yBits + 1, "interleave wants |xBits - yBits| <= 1")
    val terms =
      (0 until xBits).map(i => s"(($x $intDiv ${1L << i}) % 2) * ${1L << (2 * i)}") ++
      (0 until yBits).map(i => s"(($y $intDiv ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    terms.mkString("(", " + ", ")")
  }

  /** Z-order storage-layout audit of the z6 tile store: every store row
    * (map_key, tx, ty, …) gets its Morton key, and each 64-key Z-block
    * (`zkey div 64` — the pre-split unit an S6-style layout would use)
    * reports how many rows and distinct tiles it holds and the bounding box
    * it spans. Because a 64-key block fixes all but 3 x-bits and 3 y-bits,
    * `span_x` and `span_y` are ≤ 8 BY CONSTRUCTION — the locality guarantee
    * that makes Z-ranges good region pre-splits (a range scan of one block
    * touches an 8×8 tile square, never a row-major stripe across the world;
    * contrast with the hash salt of [[graft.core.Salt]], which trades ALL
    * locality for uniform write load — the audit quantifies what that trade
    * gives up).
    *
    * Input contract: `tiles` has (map_key, tx, ty, total) with
    * tx ∈ [0, 2^xBits), ty ∈ [0, 2^yBits) — q08's z6 assembly (4326 2×1:
    * xBits=7, yBits=6).
    *
    * Scale shape: the Morton key is row-local arithmetic inside codegen; the
    * audit is ONE aggregation over the (already small) tile table. At build
    * time the same `zorder` column feeds `repartitionByRange` + in-partition
    * sort to lay parquet files out along the curve.
    */
  def zorderLayout(tiles: DataFrame, xBits: Int, yBits: Int): DataFrame =
    tiles
      .withColumn("zb", expr(s"${mortonExpr("tx", "ty", xBits, yBits, "div")} div 64"))
      .groupBy("zb")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("tx"), col("ty")).as("n_tiles"),
        sum("total").as("block_total"),
        (max("tx") - min("tx") + 1).as("span_x"),
        (max("ty") - min("ty") + 1).as("span_y"))
}
