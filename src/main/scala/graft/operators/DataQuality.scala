package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality audit over the star schema — the dbt-style test suite an
  * ingest pipeline runs before promoting a snapshot: referential-integrity
  * orphan counts, primary-key duplicate counts, and null-rate checks, all
  * emitted as one (check, n_bad) report.
  *
  * Scale shape: every orphan check is a LEFT ANTI join keyed on the
  * foreign key — the dimension side is broadcast by AQE (customer/part/
  * supplier are dimension-sized), so the fact table never shuffles; the
  * duplicate checks are count-vs-distinct aggregates with map-side
  * partials. Each check reduces to ONE scalar, so the union of reports
  * is driver-trivial regardless of input size.
  */
object DataQuality {

  private def scalarRow(spark: SparkSession, name: String, value: DataFrame): DataFrame =
    value.select(lit(name).as("check_name"), col("n_bad"))

  /** The audit report: one row per check, n_bad = violation count. */
  def audit(spark: SparkSession, dir: String): DataFrame = {
    def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    val orders = t("orders"); val lineitem = t("lineitem")
    val customer = t("customer"); val part = t("part"); val supplier = t("supplier")

    def orphans(name: String, fact: DataFrame, fk: String,
        dim: DataFrame, pk: String): DataFrame =
      scalarRow(spark, name,
        fact.join(dim.select(col(pk).as(fk)), Seq(fk), "left_anti")
          .agg(count(lit(1)).as("n_bad")))

    def dupPk(name: String, df: DataFrame, keys: Seq[String]): DataFrame =
      scalarRow(spark, name,
        df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1)
          .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_bad")))

    def nulls(name: String, df: DataFrame, c: String): DataFrame =
      scalarRow(spark, name,
        df.agg(count(when(col(c).isNull, 1)).as("n_bad")))

    Seq(
      orphans("orders_orphan_custkey", orders, "o_custkey", customer, "c_custkey"),
      orphans("lineitem_orphan_orderkey", lineitem, "l_orderkey", orders, "o_orderkey"),
      orphans("lineitem_orphan_partkey", lineitem, "l_partkey", part, "p_partkey"),
      orphans("lineitem_orphan_suppkey", lineitem, "l_suppkey", supplier, "s_suppkey"),
      dupPk("orders_dup_orderkey", orders, Seq("o_orderkey")),
      dupPk("lineitem_dup_pk", lineitem, Seq("l_orderkey", "l_linenumber")),
      nulls("orders_null_custkey", orders, "o_custkey"),
      nulls("lineitem_null_shipdate", lineitem, "l_shipdate"))
      .reduce(_ unionByName _)
  }

  /** Key-skew profile — the diagnostic that decides whether a key needs
    * salting BEFORE a 100 TB job hits the skewed shuffle: per group, the
    * key count, total rows, hottest key's count and its share (integer
    * micro-units), and exact p50/p99 of the per-key count distribution.
    *
    * Scale shape: the percentiles come from a COUNT-OF-COUNTS histogram
    * (cnt → how many keys have that cnt) — value-domain-sized, not
    * key-domain-sized — so the only windows run over histogram rows (the
    * q86 pattern); both corpus-sized stages are keyed aggregations with
    * map-side partials. Nothing ever sorts the key set.
    */
  def skewProfile(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kc = events.groupBy("event_type", "user_id").agg(count(lit(1)).as("cnt"))
    val tot = kc.groupBy("event_type").agg(
      count(lit(1)).as("n_keys"), sum("cnt").as("total"), max("cnt").as("max_cnt"))
    val hist = kc.groupBy("event_type", "cnt").agg(count(lit(1)).as("nk"))
    val cum = Window.partitionBy("event_type").orderBy("cnt")
    val whole = Window.partitionBy("event_type")
    val ps = hist
      .withColumn("hi", sum("nk").over(cum))
      .withColumn("nks", sum("nk").over(whole))
      .groupBy("event_type").agg(
        min(when(col("hi") >= ceil(lit(0.5) * col("nks")), col("cnt")))
          .cast("long").as("p50_cnt"),
        min(when(col("hi") >= ceil(lit(0.99) * col("nks")), col("cnt")))
          .cast("long").as("p99_cnt"))
    tot.join(ps, Seq("event_type"))
      .select(col("event_type"), col("n_keys"), col("total"), col("max_cnt"),
        expr("max_cnt * 1000000 div total").as("top_share_micro"),
        col("p50_cnt"), col("p99_cnt"))
  }

  /** Skew-safe salted shuffle equi-join: each dim row is replicated for
    * all `s` salt values and the fact side scatters uniformly across them
    * (`factSalt` — any deterministic per-row expression), so a hot key's
    * probe work spreads over `s` tasks instead of serializing through
    * one. This is the remedy [[skewProfile]] (q125) prescribes for the
    * case AQE's skew-join split and a broadcast can't cover: the dim side
    * too large to broadcast, the join pinned to shuffle-hash. Each fact
    * row meets exactly ONE replica of its dim row (the replica carrying
    * its salt), so the output is row-identical to the plain join; the
    * `shuffle_hash` hints keep the planner from silently broadcasting the
    * toy-scale dim and vacating the pattern under test.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, s: Int,
      factSalt: Column): DataFrame = {
    // null-safe: a null factSalt expression must not silently drop the
    // fact row through the inner join (the row-identical contract); null
    // salts land deterministically on replica 0
    val sf = fact.withColumn("__salt",
      coalesce(pmod(factSalt, lit(s)), lit(0)).cast("int"))
    val sd = dim.withColumn("__salt",
      explode(array((0 until s).map(lit): _*)))
    sf.hint("shuffle_hash")
      .join(sd.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }
}
