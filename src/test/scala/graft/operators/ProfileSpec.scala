package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checkable invariants for the profiling/curation operators added
  * with q124–q126: key-skew percentiles, half-life decay weights, and the
  * cross-modal pair gates.
  */
class ProfileSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("profile-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("skewProfile: one hot key dominating is reported exactly") {
    val ss = spark; import ss.implicits._
    // type A: user 1 has 6 events, users 2..5 have 1 each → 5 keys,
    // total 10, max 6, top share 600000, p50 = 1, p99 = 6
    val rows = Seq.fill(6)(("A", 1L)) ++ (2L to 5L).map(u => ("A", u))
    val df = rows.toDF("event_type", "user_id")
    val got = DataQuality.skewProfile(df).collect().head
    assert(got.getAs[Long]("n_keys") === 5L)
    assert(got.getAs[Long]("total") === 10L)
    assert(got.getAs[Long]("max_cnt") === 6L)
    assert(got.getAs[Long]("top_share_micro") === 600000L)
    assert(got.getAs[Long]("p50_cnt") === 1L)
    assert(got.getAs[Long]("p99_cnt") === 6L)
  }

  test("decayedActivity: weights halve per half-life and floor at >>20") {
    val ss = spark; import ss.implicits._
    val h = 3600L
    // newest event at t0; others exactly 1, 2 and 30 half-lives (48 h) back
    val t0 = 1000000000L
    val df = Seq(
      (1L, t0), (1L, t0 - 48 * h), (1L, t0 - 96 * h), (2L, t0 - 30 * 48 * h)
    ).toDF("user_id", "tsec")
    val got = EventAnalytics.decayedActivity(df)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === ((3L, 1000000L + 500000L + 250000L, 1000000L)))
    // 30 half-lives clamps at k=20: 1000000 >> 20 = 0
    assert(got(2L) === ((1L, 0L, 0L)))
  }

  test("groupedTopK equals the rank-window formulation and is partition-invariant") {
    val ss = spark; import ss.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = (1L to 40L).map(i => (i, s"src${i % 3}", (i * 37) % 900 + 10))
      .toDF("doc_id", "source", "n_chars")
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val expect = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("source"), col("rn"), col("doc_id"), col("n_chars").cast("long"))
      .collect().map(_.toSeq).toSet
    val a = Sketch.groupedTopK(docs, 5).collect().map(_.toSeq).toSet
    val b = Sketch.groupedTopK(docs.repartition(7), 5).collect().map(_.toSeq).toSet
    assert(a === expect)
    assert(b === expect) // bottom-k state merges associatively across any split
  }

  test("pairCuration keeps exactly the rows passing all three gates") {
    val ss = spark; import ss.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu", "s"),
      (2L, "a b!!!! 1234 ...", "s"), // fails words + alpha
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu", "s")
    ).toDF("doc_id", "text", "source")
    val emb = Seq(
      (1L, Array.fill(64)(0.125f), 7),            // flat — passes
      (3L, Array.fill(63)(0.01f) :+ 0.99f, 8)      // spiky — fails
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.pairCuration(docs, emb).select("doc_id").as[Long].collect()
    assert(got.toSeq === Seq(1L))
  }

  test("queryAnnJoin equals the rank-window formulation and is " +
    "partition-invariant") {
    val ss = spark; import ss.implicits._
    val rnd = new scala.util.Random(19)
    val emb = (0L until 250L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() - 0.5f), i.toInt % 4))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.queryAnnJoin(emb, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // reference: same sims through a rank window (fine at test size)
    import org.apache.spark.sql.expressions.Window
    val base = emb.select(col("vec_id"), col("embedding"),
      sqrt(Similarity.sqNorm(col("embedding"))).as("nrm"))
    val q = base.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"))
    val sim = round(Similarity.dotCols(col("embedding"), col("qv"))
      / (col("nrm") * col("qn")), 6)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    val want = base.filter(col("vec_id") % 100 =!= 0).crossJoin(q)
      .select(col("query_id"), col("vec_id"), sim.as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got === want)
    val got2 = Similarity.queryAnnJoin(emb.repartition(7), 5).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === got2)
  }

  test("labelStats: integer centroid/variance math on a hand-checkable " +
    "fixture; a constant dimension scores zero variance") {
    val ss = spark; import ss.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.5f), 1),
      (1L, Array(3.0f, 0.5f), 1),
      (2L, Array(10.0f, 2.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.labelStats(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // label 1 dim 0: xm = 1e6, 3e6 → centroid 2e6, var = E[x²]−E[x]²
    //   = (1e12+9e12)/2 − (2e6)² = 5e12 − 4e12 = 1e12
    assert(got((1, 0)) === ((2L, 2000000L, 1000000000000L)))
    assert(got((1, 1)) === ((2L, 500000L, 0L))) // constant dim → 0 variance
    assert(got((2, 0)) === ((1L, 10000000L, 0L)))
  }

  test("saltedJoin is row-identical to the plain join for any salt count, " +
    "including a hot key carrying most of the fact side") {
    val ss = spark; import ss.implicits._
    // key "hot" carries 90% of the fact rows; dim has one row per key
    val fact = ((0L until 180L).map(i => ("hot", i)) ++
      (0L until 20L).map(i => (s"k${i % 5}", 1000L + i)))
      .toDF("k", "payload")
    val dim = Seq(("hot", 1), ("k0", 2), ("k1", 3), ("k2", 4), ("k3", 5), ("k4", 6))
      .toDF("k", "attr")
    val want = fact.join(dim, Seq("k"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    Seq(1, 4, 16).foreach { s =>
      val got = DataQuality.saltedJoin(fact, dim, "k", s, col("payload"))
        .select("k", "payload", "attr")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(got === want, s"salt count $s changed the join result")
    }
  }

  test("saltedJoin: a null salt expression keeps the row (replica 0), " +
    "honoring the row-identical contract") {
    val ss = spark; import ss.implicits._
    val fact = Seq(("k0", Some(7L)), ("k0", None), ("k1", None))
      .toDF("k", "payload")
    val dim = Seq(("k0", 1), ("k1", 2)).toDF("k", "attr")
    val want = fact.join(dim, Seq("k"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val got = DataQuality.saltedJoin(fact, dim, "k", 8, col("payload"))
      .select("k", "payload", "attr")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(got === want, "null-salt fact rows were dropped")
  }
}
