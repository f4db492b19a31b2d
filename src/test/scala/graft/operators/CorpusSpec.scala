package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit invariants for the corpus-hygiene operators (Corpus) and the as-of
  * join (AsOfJoin) on tiny hand-checkable inputs.
  */
class CorpusSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("corpus-spec").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docsDf(rows: (Long, String, String)*) = {
    val ss = spark; import ss.implicits._
    rows.toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")))
  }

  test("tokens: empty and whitespace-only text yield an empty array") {
    val ss = spark; import ss.implicits._
    val out = Seq("", "   ", "a b").toDF("text")
      .select(size(Corpus.tokens(col("text"))).as("n")).as[Int].collect()
    assert(out.toSeq === Seq(0, 0, 2))
  }

  test("distinctNgrams: fewer than n tokens yields empty, not a countdown") {
    val ss = spark; import ss.implicits._
    val out = Seq("a b c", "a b c d e f", "a a a a a a").toDF("text")
      .withColumn("toks", Corpus.tokens(col("text")))
      .select(Corpus.distinctNgrams("toks", 5).as("g"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq.empty)
    assert(out(1) === Seq("a b c d e", "b c d e f"))
    assert(out(2) === Seq("a a a a a")) // distinct collapses repeats
  }

  test("decontaminate: overlap counts distinct shared 5-grams") {
    val docs = docsDf(
      (0L, "w1 w2 w3 w4 w5 w6", "eval"), // eval grams: {w1..w5, w2..w6}
      (1L, "w1 w2 w3 w4 w5 x", "web"),   // shares exactly {w1..w5}
      (2L, "z1 z2 z3 z4 z5 z6", "web"),  // shares none
      (3L, "w1 w2", "web"))              // too short: 0 grams
    val out = Corpus.decontaminate(docs, "eval", 5, 0.5)
      .select("doc_id", "n_grams", "n_shared", "contaminated")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._1)
    assert(out.toSeq === Seq((1L, 2, 1L, 1), (2L, 2, 0L, 0), (3L, 0, 0L, 0)))
  }

  test("repetitionStats: known fractions, empty docs dropped") {
    val docs = docsDf(
      (0L, "", "s"),
      (1L, "a a a b", "s"),  // 4 words, 2 distinct, top word a=3, top bigram "a a"=2
      (2L, "x", "s"))        // 1 word, no bigrams
    val out = Corpus.repetitionStats(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 2L)) // doc 0 dropped
    val d1 = out(0)
    assert(d1._2 === 4L && d1._3 === 0.5 && d1._4 === 0.75)
    assert(d1._5 === 2.0 / 3.0) // 2 of 3 bigrams are "a a"
    val d2 = out(1)
    assert(d2._2 === 1L && d2._3 === 0.0 && d2._5 === 0.0)
  }

  test("temperatureMix: keeps min(count, ceil(sqrt(count)*boost)) per source") {
    val docs = docsDf((0L until 16L).map(i => (i, "t", "big")) ++
      Seq((100L, "t", "small"), (101L, "t", "small")): _*)
    val out = Corpus.temperatureMix(docs, 1.0).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out("big") === 4L)   // ceil(sqrt(16)*1) = 4
    assert(out("small") === 2L) // min(2, ceil(sqrt(2)*1)=2)
    // empty corpus → empty mixture, not an NPE in the sketch sizing (the
    // max-over-zero-rows null, coalesced inside Sketch.quotaPick)
    assert(Corpus.temperatureMix(docsDf(), 1.0).collect().isEmpty)
  }

  test("eventAsOf matches a brute-force as-of on random events (incl. null values)") {
    val ss = spark; import ss.implicits._
    val rnd = new scala.util.Random(7)
    // ~25% null values: a matched row with a null field must NOT tear —
    // err_value has to come from the SAME row as err_event_id
    val rows = (0 until 400).map { i =>
      (i.toLong, rnd.nextInt(5).toLong,
        if (rnd.nextBoolean()) "click" else "error",
        if (rnd.nextInt(4) == 0) null
        else java.lang.Double.valueOf(rnd.nextInt(100).toDouble),
        rnd.nextInt(1000).toLong)
    }
    val ev = rows.toDF("event_id", "user_id", "event_type", "value", "tmicro")
    val got = AsOfJoin.eventAsOf(ev, "click", "error").collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap
    // brute force: for each click, the max-(tmicro, event_id) error with
    // tmicro <= click.tmicro for the same user
    val errors = rows.filter(_._3 == "error")
    val expected = rows.filter(_._3 == "click").flatMap { c =>
      val cands = errors.filter(e => e._2 == c._2 && e._5 <= c._5)
      if (cands.isEmpty) None
      else {
        val e = cands.maxBy(x => (x._5, x._1))
        Some(c._1 -> ((e._1, c._5 - e._5, Option(e._4).map(_.doubleValue))))
      }
    }.toMap
    assert(got === expected)
  }

  test("chunkSpans: overlapping spans cover every token, last chunk short") {
    val docs = docsDf(
      (0L, (1 to 10).map(i => s"t$i").mkString(" "), "s"), // 10 tokens
      (1L, "", "s"), // empty: no chunks
      (2L, "a b", "s")) // shorter than one window
    val out = Corpus.chunkSpans(docs, window = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(x => (x._1, x._2))
    assert(out.toSeq === Seq(
      (0L, 0L, 0L, 4L, 4L), (0L, 1L, 3L, 7L, 4L),
      (0L, 2L, 6L, 10L, 4L), (0L, 3L, 9L, 10L, 1L),
      (2L, 0L, 0L, 2L, 2L)))
  }

  test("regexScrub counts all matches and lengths reflect the mask") {
    val docs = docsDf((0L, "customer x customer", "s"), (1L, "nothing here", "s"))
    val out = Corpus.regexScrub(docs, "\\bcustomer\\b", "<E>")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // "customer"(8) -> "<E>"(3): 19 - 2*8 + 2*3 = 9
    assert(out.toSeq === Seq((0L, 2L, 9L), (1L, 0L, 12L)))
  }

  test("bm25TopK matches a brute-force BM25 and keeps only matching docs") {
    val docs = docsDf(
      (0L, "cat dog", "s"),
      (1L, "cat cat cat fish", "s"),
      (2L, "fish bird", "s"),
      (3L, "bird bird", "s")) // no query term: must be absent
    val terms = Seq("cat", "fish")
    val out = Corpus.bm25TopK(docs, terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(!out.contains(3L))
    // brute force with the same double arithmetic
    val texts = Map(0L -> Seq("cat", "dog"), 1L -> Seq("cat", "cat", "cat", "fish"),
      2L -> Seq("fish", "bird"), 3L -> Seq("bird", "bird"))
    val n = texts.size; val avgdl = texts.values.map(_.size).sum.toDouble / n
    def df(t: String) = texts.values.count(_.contains(t))
    def score(id: Long): Double = {
      val dl = texts(id).size
      val s = terms.map { t =>
        val tf = texts(id).count(_ == t)
        if (tf == 0) 0.0
        else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
      }
      BigDecimal(s.head + s(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    Seq(0L, 1L, 2L).foreach(id => assert(out(id) === score(id), s"doc $id"))
    assert(out(1L) > out(0L)) // 3×cat + fish beats 1×cat despite longer doc
  }

  test("vocabCoverage: OOV rate and mean in-vocab frequency vs top-K vocab") {
    val docs = docsDf((0L, "a a b", "s"), (1L, "c c c d", "s"))
    // counts: c=3, a=2, b=1, d=1 -> top-1 vocab = {c}
    val out = Corpus.vocabCoverage(docs, 1).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out(0L) === ((3L, 3L, 1.0, 0.0)))
    assert(out(1L) === ((4L, 1L, 0.25, 9.0 / 4)))
  }

  test("globalOrderIndex: exact permutation matching the global hash sort") {
    val docs = docsDf((0L until 100L).map(i => (i * 7 + 3, "t", "s")): _*)
    val out = Corpus.globalOrderIndex(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    def lcg(id: Long) = (id * 1103515245L + 12345L) % 2147483648L
    val expected = (0L until 100L).map(_ * 7 + 3)
      .sortBy(id => (lcg(id), id)).zipWithIndex
      .map { case (id, p) => id -> p.toLong }.toMap
    assert(out === expected)
    assert(out.values.toSeq.sorted === (0L until 100L))
  }

  test("cmsHeavyHitters: estimates never under-count, ground truth exact") {
    val docs = docsDf(
      (0L, "x x x x x y y y z", "s"),
      (1L, "x y z w v u t", "s"))
    val out = Sketch.cmsHeavyHitters(docs, 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.map(x => (x._1, x._2)).toSeq ===
      Seq(("x", 6L), ("y", 4L), ("z", 2L), ("t", 1L))) // count desc, token asc
    out.foreach { case (w, t, e) => assert(e >= t, s"CMS under-counted $w") }
  }

  test("text hashing folds code points, not UTF-16 units (oracle parity " +
    "for supplementary characters)") {
    val s = "a😀b" // "a😀b": 3 code points, 4 UTF-16 units
    val cps = s.codePoints().toArray
    assert(cps.length === 3)
    val expected = cps.foldLeft(0L)((a, c) => (a * 31 + c) % 2147483647L)
    assert(Dedup.cpFold(s, 2147483647L) === expected)
    val unitFold = s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 2147483647L)
    assert(Dedup.cpFold(s, 2147483647L) !== unitFold,
      "code-point and code-unit folds must differ on non-BMP input")
  }

  test("linearCount: occupancy and estimate match the closed form") {
    val docs = docsDf((0L, "a b c d a b", "s"))
    val out = Sketch.linearCount(docs, 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def h(w: String) = w.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 2147483647L)
    val occ = Seq("a", "b", "c", "d").map(h(_) % 64).distinct.size
    val est = BigDecimal(-64.0 * math.log((64 - occ).toDouble / 64.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq === Seq(("s", 4L, occ.toLong, est)))
  }

  test("hllCount matches a bit-exact reference implementation") {
    val docs = docsDf((0L, "a b c d e f g h a b", "s"))
    val out = Sketch.hllCount(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def h(w: String) = w.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 2147483647L)
    val regs = scala.collection.mutable.Map.empty[Long, Int]
    "abcdefgh".map(_.toString).foreach { w =>
      val hv = h(w); val suffix = hv >>> 4
      val rho = if (suffix == 0L) 28
        else 27 - (63 - java.lang.Long.numberOfLeadingZeros(suffix))
      regs(hv % 16) = math.max(regs.getOrElse(hv % 16, 0), rho)
    }
    val sum = regs.values.map(m => math.pow(2.0, -m)).sum + (16 - regs.size).toDouble
    val est = BigDecimal(0.673 * 16 * 16 / sum)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq === Seq(("s", 8L, est)))
  }

  test("linearCount: a saturated sketch estimates null, not -Infinity") {
    // 4 distinct tokens into m=2 slots must occupy both -> the ln(0) branch
    val docs = docsDf((0L, "a b c d", "s"))
    val out = Sketch.linearCount(docs, 2).collect()
    assert(out.length === 1)
    assert(out(0).getLong(2) === 2L, "expected both slots occupied")
    assert(out(0).isNullAt(3), "saturated estimate must be null")
  }

  test("tokenQuantilesDisc picks the value at rank ceil(p*n)") {
    val docs = docsDf(
      (0L, "a", "s"), (1L, "a b", "s"), (2L, "a b c", "s"), (3L, "a b c d", "s"))
    val out = Corpus.tokenQuantilesDisc(docs, Seq(0.5, 0.9, 0.99))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // n=4: p50 rank ceil(2)=2 -> 2 tokens; p90 rank ceil(3.6)=4 -> 4; p99 -> 4
    assert(out.toSeq === Seq(("s", 2L, 4L, 4L)))
  }

  test("chunkDedup keeps first occurrences and rebuilds docs in chunk order") {
    val docs = docsDf(
      (0L, "a b c d", "s"),  // chunks (w=2): "a b", "c d"
      (1L, "a b x y", "s"),  // "a b" dup of doc 0's -> dropped; "x y" kept
      (2L, "a b", "s"))      // all chunks dup -> doc disappears
    val out = Corpus.chunkDedup(docs, 2).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0L) === ((2L, 2L, 4L, m("a b c d"))))
    assert(out(1L) === ((2L, 1L, 2L, m("x y"))))
    assert(!out.contains(2L))
  }

  test("tokenBudgetSelect fills greedily by quality and stops at the budget") {
    val docs = docsDf(
      (0L, "aaaa bbbb", "s"),     // quality 8/9, 2 tokens
      (1L, "cc dd 11", "s"),      // quality 4/8, 3 tokens
      (2L, "ee ff", "s"),         // quality 4/5, 2 tokens
      (3L, "x1 y2 z3 w4", "s"))   // quality 4/11, 4 tokens
    // order: d0 (.889), d2 (.8), d1 (.5), d3 (.36); cum 2, 4, 7, 11
    val out = Corpus.tokenBudgetSelect(docs, 7L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(("s", 3L, 7L, 4.0 / 8)))
  }

  test("corpusProfile: exact totals, language mix, duplicate rate") {
    val ss = spark; import ss.implicits._
    val docs = Seq(
      (0L, "a b", "en", "s", 3L), (1L, "a b", "en", "s", 3L),
      (2L, "c d e", "fr", "s", 5L), (3L, "f", "en", "t", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Corpus.corpusProfile(docs).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(out("s") === ((3L, 7L, 11L, 7.0 / 3, 2L, 1.0 / 3))) // one dup pair
    assert(out("t") === ((1L, 1L, 1L, 1.0, 1L, 0.0)))
  }

  test("tokenQuantilesHist equals the row-sorted rank statistic on a random corpus") {
    val rnd = new scala.util.Random(11)
    val docs = docsDf((0L until 300L).map { i =>
      (i, Seq.fill(rnd.nextInt(40))("w").mkString(" "), s"s${i % 3}")
    }: _*)
    val ps = Seq(0.5, 0.9, 0.99)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // tokenQuantilesRowSort is the row-sorted audit REFERENCE (test-only
    // since round 9 — the production q75/q130 arms run the histogram
    // decomposition, and this equality is what licenses that)
    assert(rows(Corpus.tokenQuantilesHist(docs, ps)) ===
      rows(Corpus.tokenQuantilesRowSort(docs, ps)))
  }

  test("bigramLmScore: hand-computed add-one-smoothed nll in exact micro-nats") {
    // corpus: doc0 = a b a b (bigrams: "a b"×2, "b a"), doc1 = a b, doc2 too
    // short (dropped). LM: c2("a b")=3, c2("b a")=1; c1(a)=3, c1(b)=1; V=2.
    val docs = docsDf((0L, "a b a b", "s"), (1L, "a b", "s"), (2L, "solo", "s"))
    val out = Corpus.bigramLmScore(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val ab = math.round(BigDecimal(math.log(5.0 / 4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6) // 223144
    val ba = math.round(BigDecimal(math.log(3.0 / 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6) // 405465
    assert(!out.contains(2L))
    assert(out(0L) === ((3L, 2 * ab + ba,
      BigDecimal((2 * ab + ba).toDouble / 3 / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out(1L) === ((1L, ab, ab.toDouble / 1e6)))
  }

  test("bloomIngest: no false negatives — every exact duplicate is a bloom hit") {
    val rnd = new scala.util.Random(7)
    val corpus = docsDf((0L until 150L).map { i =>
      (i, s"corpus text ${rnd.nextInt(1000)} ${i % 40}", "s")
    }: _*)
    val newDocs = docsDf(
      // exact copies of two corpus docs, plus novel texts
      (1000L, corpus.collect()(3).getString(1), "s"),
      (1001L, corpus.collect()(77).getString(1), "s"),
      (1002L, "certainly novel text never seen before", "s"),
      (1003L, "another unseen document body", "s"))
    val out = Sketch.bloomIngest(corpus, newDocs).collect()
      .map(r => (r.getLong(0), (r.getInt(2), r.getInt(3)))).toMap
    assert(out.size === 4)
    out.values.foreach { case (hit, exact) =>
      if (exact == 1) assert(hit === 1, "Bloom false negative")
    }
    assert(out(1000L)._2 === 1 && out(1001L)._2 === 1)
    assert(out(1002L)._2 === 0 && out(1003L)._2 === 0)
  }

  test("editVerifiedPairs: zero distance for identical docs, exact prefix DP " +
    "for a one-char edit") {
    val body = (1 to 20).map(i => s"tok$i").mkString(" ") // 125 chars
    val docs = docsDf(
      (0L, body, "s"), (1L, body, "s"),
      (2L, body.replaceFirst("tok4", "toq4"), "s"))
    val out = Dedup.editVerifiedPairs(docs, 0.5, 96, 24).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getInt(3)))).toMap
    assert(out((0L, 1L)) === ((0, 1)))
    // the single substitution happens inside the 96-char prefix → distance 1
    assert(out((0L, 2L)) === ((1, 1)))
    assert(out((1L, 2L)) === ((1, 1)))
  }

  test("pmiPairs: ln(3) for uniform singleton pairs on 'a b c', window 2") {
    // pairs: "a b","a c","b c" (P=3); words a,b,c once each (n=3) →
    // pmi = ln(1·3·3 / (3·1·1)) = ln 3 for every pair
    val docs = docsDf((0L, "a b c", "s"))
    val out = Corpus.pmiPairs(docs, 2, 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
    val ln3 = BigDecimal(math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq === Seq(("a b", 1L, ln3), ("a c", 1L, ln3), ("b c", 1L, ln3)))
  }

  test("containmentPairs: a doc fully quoted inside a longer one has " +
    "containment 1.0 despite Jaccard < 1") {
    val body = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = docsDf(
      (0L, body, "s"),
      (1L, body + " extra trailing words", "s"))
    val out = Dedup.containmentPairs(docs, 0.5, 0.8).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    val (nc, na, nb, ca, cb) = out((0L, 1L))
    assert(ca === 1.0 && nc === na && nb > na && cb < 1.0)
  }

  test("hllUnion: merged registers equal the sketch of the physically " +
    "unioned corpus (associative merge)") {
    val rnd = new scala.util.Random(13)
    val docs = docsDf((0L until 90L).map { i =>
      (i, Seq.fill(8)(s"w${rnd.nextInt(120)}").mkString(" "), s"s${i % 3}")
    }: _*)
    val un = Sketch.hllUnion(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(un.keySet === Set(("s0", "s1"), ("s0", "s2"), ("s1", "s2")))
    val phys = Sketch.hllCount(
      docs.filter(col("source").isin("s0", "s1"))
        .withColumn("source", lit("u")))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    assert(un(("s0", "s1")) === phys)
  }

  test("KmvAgg: bounded buffer, order-insensitive, bottom-k of distinct") {
    val agg = new Sketch.KmvAgg(8)
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(500)(rnd.nextLong(100000L))
    val fwd = vals.foldLeft(agg.zero)(agg.reduce)
    val rev = vals.reverse.foldLeft(agg.zero)(agg.reduce)
    // split-and-merge must equal the sequential fold (partition-shape
    // independence — what makes the result deterministic under AQE)
    val (l, r) = vals.splitAt(137)
    val mrg = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    val expect = vals.distinct.sorted.take(8).toArray
    assert(fwd.toSeq === expect.toSeq)
    assert(rev.toSeq === expect.toSeq)
    assert(mrg.toSeq === expect.toSeq)
    assert(fwd.length <= 8)
  }

  test("kmvOverlap: below-k sketches are exact sets — estimates equal true " +
    "distinct/union/intersection counts") {
    // s0 = t0..t39, s1 = t20..t59 (overlap 20, union 60), s2 disjoint;
    // all < KmvK=64 distinct, so every estimate must be EXACT
    val rows =
      (0L until 40L).map(i => (i, s"text num $i", "s0")) ++
      (0L until 40L).map(i => (100L + i, s"text num ${i + 20}", "s1")) ++
      (0L until 10L).map(i => (200L + i, s"other $i", "s2"))
    val out = Sketch.kmvOverlap(docsDf(rows: _*)).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(out(("s0", "s1")) === ((40L, 40L, 60L, 333333L, 20L)))
    assert(out(("s0", "s2")) === ((40L, 10L, 50L, 0L, 0L)))
    assert(out(("s1", "s2")) === ((40L, 10L, 50L, 0L, 0L)))
  }

  test("seeded property: KMV merge law — sketch(A ∪ B) equals " +
    "merge(sketch(A), sketch(B)) on random value sets") {
    val agg = new Sketch.KmvAgg(32)
    val rnd = new scala.util.Random(23)
    (0 until 20).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(300))(rnd.nextLong(1000000L))
      val b = Seq.fill(rnd.nextInt(300))(rnd.nextLong(1000000L))
      val skUnion = (a ++ b).foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      assert(skUnion.toSeq === merged.toSeq)
    }
  }

  test("seeded property: full-sketch KMV estimate lands near the true " +
    "distinct count (k=64 → ~13% expected error)") {
    val agg = new Sketch.KmvAgg(64)
    val rnd = new scala.util.Random(31)
    val vals = Seq.fill(8000)(rnd.nextLong(Sketch.KmvM)).distinct
    val sk = vals.foldLeft(agg.zero)(agg.reduce)
    val est = 63L * Sketch.KmvM / sk(63)
    assert(est > vals.size / 2 && est < vals.size * 2,
      s"KMV estimate $est far from true ${vals.size}")
  }

  test("bottomKSample: exactly min(k, n) docs per stratum, invariant under " +
    "repartitioning") {
    val rows = (0L until 5L).map(i => (i, s"a $i", "s0")) ++
      (100L until 120L).map(i => (i, s"b $i", "s1")) ++
      (200L until 240L).map(i => (i, s"c $i", "s2"))
    val docs = docsDf(rows: _*)
    val s1 = Sketch.bottomKSample(docs, 12)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val sizes = s1.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes === Map("s0" -> 5, "s1" -> 12, "s2" -> 12))
    val s2 = Sketch.bottomKSample(docs.repartition(7), 12)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(s1 === s2)
  }

  test("seeded property: winnowing guarantee — EVERY pair embedding a " +
    "shared ≥11-char substring at random offsets shares a fingerprint") {
    val rnd = new scala.util.Random(41)
    def randStr(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val rows = (0 until 12).flatMap { i =>
      val shared = randStr(11 + rnd.nextInt(30))
      Seq(
        (i * 2L, randStr(rnd.nextInt(60)) + shared + randStr(rnd.nextInt(60)), s"p$i"),
        (i * 2L + 1, randStr(rnd.nextInt(60)) + shared + randStr(rnd.nextInt(60)), s"p$i"))
    }
    val fp = Dedup.winnowFingerprints(docsDf(rows: _*))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    (0 until 12).foreach { i =>
      val common = fp(i * 2L) & fp(i * 2L + 1)
      assert(common.nonEmpty, s"pair $i lost its guaranteed fingerprint")
    }
  }

  test("booleanRetrieve: AND/NOT membership with exact phrase counts") {
    val docs = docsDf(
      (0L, "spark window spark window agg", "s"), // match, phrase twice
      (1L, "spark table window", "s"),            // excluded by NOT table
      (2L, "spark agg", "s"),                     // missing window
      (3L, "window spark", "s"))                  // match, phrase absent
    val out = Corpus.booleanRetrieve(docs, Seq("spark", "window"),
      Seq("table"), "spark window").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out === Map(0L -> 2L, 3L -> 0L))
  }

  test("property: Bloom has no false negatives on random overlapping corpora") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      // a small text pool forces real old/new overlap AND real novelty
      val pool = (0 until 60).map(i => s"text body $i ${rnd.nextInt(50)}")
      val all = (0L until 120L).map(i => (i, pool(rnd.nextInt(pool.size)), "s"))
      val docs = docsDf(all: _*)
      val out = Sketch.bloomIngest(
        docs.filter(col("doc_id") < 80), docs.filter(col("doc_id") >= 80))
        .collect().map(r => (r.getInt(2), r.getInt(3)))
      assert(out.length === 40)
      assert(out.forall { case (hit, exact) => exact == 0 || hit == 1 },
        s"false negative at seed $seed")
      assert(out.exists(_._2 == 1), s"seed $seed produced no real duplicates")
    }
  }

  test("property: funnel timestamps strictly increase and stage counts them") {
    val rnd = new scala.util.Random(5)
    val ss = spark; import ss.implicits._
    val types = Seq("view", "click", "purchase", "signup", "error")
    val ev = (0 until 600).map { i =>
      (rnd.nextInt(30).toLong, types(rnd.nextInt(types.size)), rnd.nextInt(10000).toLong)
    }.toDF("user_id", "event_type", "tmicro")
    EventAnalytics.funnel(ev, Seq("view", "click", "purchase")).collect()
      .foreach { r =>
        val ts = Seq(1, 2, 3).map(i =>
          if (r.isNullAt(i)) None else Some(r.getLong(i)))
        // a stage time exists only with its predecessor, strictly after it
        ts.sliding(2).foreach {
          case Seq(a, b) =>
            if (b.isDefined) { assert(a.isDefined && b.get > a.get) }
          case _ =>
        }
        assert(r.getInt(4) === ts.count(_.isDefined))
      }
  }

  test("property: HLL union estimate dominates both single-source estimates " +
    "(register-wise max can only grow)") {
    val rnd = new scala.util.Random(23)
    val docs = docsDf((0L until 120L).map { i =>
      (i, Seq.fill(10)(s"w${rnd.nextInt(400)}").mkString(" "), s"s${i % 4}")
    }: _*)
    val single = Sketch.hllCount(docs).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toMap
    Sketch.hllUnion(docs).collect().foreach { r =>
      val (a, b, est) = (r.getString(0), r.getString(1), r.getDouble(3))
      assert(est >= math.max(single(a), single(b)) - 1e-9,
        s"union($a,$b)=$est below max(${single(a)}, ${single(b)})")
    }
  }

  test("property: containment values bounded by the intersection arithmetic") {
    val rnd = new scala.util.Random(31)
    // dup-heavy pool so LSH candidates actually exist
    val pool = (0 until 8).map(_ =>
      Seq.fill(25)(s"t${rnd.nextInt(40)}").mkString(" "))
    val docs = docsDf((0L until 60L).map { i =>
      val base = pool(rnd.nextInt(pool.size))
      (i, if (rnd.nextBoolean()) base else base + s" tail${rnd.nextInt(4)}", "s")
    }: _*)
    val rows = Dedup.containmentPairs(docs, 0.5, 0.0).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nc, na, nb) = (r.getInt(2), r.getInt(3), r.getInt(4))
      val (ca, cb) = (r.getDouble(5), r.getDouble(6))
      assert(nc <= math.min(na, nb) && nc >= 0)
      assert(ca >= 0.0 && ca <= 1.0 && cb >= 0.0 && cb <= 1.0)
      assert(ca === nc.toDouble / na && cb === nc.toDouble / nb)
    }
  }

  test("pagerankMicro: exact integer fixed point on a 2-cycle, damping " +
    "floor for isolated docs") {
    val body = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = docsDf(
      (0L, body, "s"), (1L, body, "s"),
      (2L, "completely different words here entirely unrelated", "s"))
    // 0↔1 form a 2-cycle with deg 1: r' = 150000 + 850·(10⁶ div 1) div 1000
    // = 10⁶ exactly, every iteration; isolated 2 settles at the 150000 floor
    val out = Dedup.pagerankMicro(docs, 0.5, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(0L -> 1000000L, 1L -> 1000000L, 2L -> 150000L))
  }

  test("bpePairCounts: pair counts weight by word frequency, deterministic " +
    "top-k order") {
    val docs = docsDf((0L, "ab ab abc", "s"), (1L, "abc", "s"))
    // word freqs: ab=2, abc=2; pairs: ab ← 2+2=4, bc ← 2
    val out = Corpus.bpePairCounts(docs, 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("ab", 4L), ("bc", 2L)))
  }

  test("gazetteerMentions: dictionary bounded at k, df/mention counts exact") {
    val docs = docsDf(
      (0L, "big data big data big", "s0"), // "big data"×2, "data big"×2
      (1L, "big data rules", "s1"),
      (2L, "small data", "s1"))
    val out = Corpus.gazetteerMentions(docs, 2).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // top-2 by (df desc, entity asc): "big data" df=2, "data big" df=1,
    // "data rules" df=1, "small data" df=1 → ties broken ascending
    assert(out.keySet.map(_._1) === Set("big data", "data big"))
    assert(out(("big data", "s0")) === ((2L, 2L, 1L)))
    assert(out(("big data", "s1")) === ((2L, 1L, 1L)))
    assert(out(("data big", "s0")) === ((1L, 2L, 1L)))
  }

  test("leakageFreeSplit: no near-dup candidate pair straddles a split " +
    "boundary; totals conserve the corpus") {
    // 40 exact-dup pairs (guaranteed LSH candidates) + 20 singletons
    val rows = (0 until 40).flatMap { i =>
      val t = s"shared text body number $i repeated words ${"x " * 12}"
      Seq((i * 2L, t, "s0"), (i * 2L + 1, t, "s1"))
    } ++ (200L until 220L).map(i => (i, s"unique solo document $i", "s2"))
    val docs = docsDf(rows: _*)
    val out = Dedup.leakageFreeSplit(docs, 0.5).collect()
    assert(out.map(_.getLong(1)).sum === rows.size.toLong) // every doc split
    // reconstruct the per-doc split through the labels and assert every
    // candidate pair is co-split — the property the operator exists for
    val lbl = Dedup.duplicateClusters(docs, 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def split(d: Long) = ((lbl(d) * 1103515245L + 12345L) % 2147483648L) % 100
    val straddled = Dedup.lshCandidatePairs(docs, 0.5).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) =>
        val (sa, sb) = (split(a), split(b))
        def bucket(x: Long) = if (x < 80) 0 else if (x < 90) 1 else 2
        bucket(sa) != bucket(sb)
      }
    assert(straddled.isEmpty, s"pairs straddle splits: ${straddled.take(5).toSeq}")
  }

  test("sampleQuantiles: exact when a source fits in the sketch; estimate " +
    "within sample range otherwise; partition-invariant") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 10L).map(i => (i, ("w " * (i.toInt + 1)).trim, "small")) ++
      (100L until 400L).map(i => (i, ("w " * (1 + rnd.nextInt(200))).trim, "big"))
    val docs = docsDf(rows: _*)
    val out = Sketch.sampleQuantiles(docs, 16).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (nS, estS, exS, errS) = out("small")
    assert(nS === 10L && estS === exS && errS === 0L,
      "source below k must be sampled whole → exact")
    val (nB, _, _, _) = out("big")
    assert(nB === 16L)
    val out2 = Sketch.sampleQuantiles(docs.repartition(7), 16).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out === out2, "estimator must not depend on partitioning")
  }

  test("spanPositions: overlapping and repeated matches, 0-based offsets, " +
    "non-matching docs drop out") {
    val docs = docsDf(
      (0L, "key value key value", "s"),   // positions 0 and 2
      (1L, "a key value b", "s"),         // position 1
      (2L, "value key", "s"),             // reversed — no match
      (3L, "", "s"))
    val got = Corpus.spanPositions(docs, "key", "value").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got === Set((0L, 0L), (0L, 2L), (1L, 1L)))
  }

  test("spanPositions: phrase words containing quotes are literals, not " +
    "expression text") {
    // a single quote (and other expr metacharacters) in a phrase word must
    // neither throw a parse error nor match anything it shouldn't
    val docs = docsDf(
      (0L, "it's a test", "s"),          // match at 0 for ("it's", "a")
      (1L, "its a test", "s"))           // no quote — must NOT match
    val got = Corpus.spanPositions(docs, "it's", "a").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got === Set((0L, 0L)))
    // pure injection attempt: would have been a syntax error (or worse) when
    // interpolated raw into a SQL string
    val inj = Corpus.spanPositions(docs, "' OR 1=1 --", "a").collect()
    assert(inj.isEmpty)
  }

  test("negativeSampling: 0.75-smoothing damps the head — weight ratios " +
    "compress relative to count ratios; probs are a normalized partition") {
    val docs = docsDf(
      (0L, ("hot " * 16).trim + " a b", "s"),
      (1L, "a b c", "s"))
    val out = Corpus.negativeSampling(docs, 10).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(out.head._1 === "hot") // count order, not weight order
    val m = out.toMap
    val (cHot, wHot, _) = m("hot")
    val (cA, wA, _) = m("a")
    assert(cHot === 16L && cA === 2L)
    // pow(16,.75)/pow(2,.75) = 8^0.75... ratio 4.75..; < 16/2
    assert(wHot.toDouble / wA < cHot.toDouble / cA,
      "smoothing must compress the head's advantage")
    val probSum = out.map(_._2._3).sum
    assert(probSum <= 1000000L && probSum > 990000L,
      s"integer probabilities must partition ~1e6, got $probSum")
  }

  test("weightedSample: selection probability follows the weight — heavy " +
    "docs crowd out a 9x majority of light ones; partition-invariant") {
    // 10 heavy docs (w=1200 tokens) vs 90 light (w=2): u^(1/1200) ≈ 1 ≫
    // u^(1/2), so the top-8 should be (near-)all heavy
    val rows = (0L until 10L).map(i => (i * 17 + 3, ("w " * 1200).trim, "s")) ++
      (1000L until 1090L).map(i => (i, "w w", "s"))
    val docs = docsDf(rows: _*)
    val heavy = rows.take(10).map(_._1).toSet
    val got = Sketch.weightedSample(docs, 8).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(got.size === 8)
    val nHeavy = got.values.count(heavy)
    assert(nHeavy >= 7, s"expected the heavy docs to dominate, got $nHeavy/8")
    val got2 = Sketch.weightedSample(docs.repartition(5), 8).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(got === got2)
  }

  test("psiDrift: identical distribution scores 0; a shifted source scores " +
    "strictly positive and larger than a mildly-perturbed one") {
    // src0 baseline and s_same have the same length histogram; s_mild
    // moves one doc a bucket over; s_far moves everything far away
    val rows =
      (0L until 20L).map(i => (i, ("w " * 8).trim, "src0")) ++      // bucket 0
      (100L until 120L).map(i => (i, ("w " * 8).trim, "s_same")) ++
      (200L until 219L).map(i => (i, ("w " * 8).trim, "s_mild")) ++
      Seq((219L, ("w " * 40).trim, "s_mild")) ++                    // 1 doc out
      (300L until 320L).map(i => (i, ("w " * 100).trim, "s_far"))
    val out = Corpus.psiDrift(docsDf(rows: _*), "src0").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("s_same") === 0L)
    assert(out("s_mild") > 0L)
    assert(out("s_far") > out("s_mild"))
    assert(!out.contains("src0"), "baseline must not score itself")
  }

  test("exportShards: manifest conserves the corpus and is partition- and " +
    "order-invariant") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 200L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(30))("w").mkString(" "), s"s${i % 3}"))
    val docs = docsDf(rows: _*)
    val m1 = Corpus.exportShards(docs, 16).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(5))))
      .toMap
    assert(m1.values.map(_._1).sum === 200L, "every doc lands in a shard")
    val m2 = Corpus.exportShards(
      docs.repartition(7).sortWithinPartitions(col("text")), 16).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(5))))
      .toMap
    assert(m1 === m2, "checksums must be order-insensitive")
  }

  test("tfidfTopTerms: bounded-state top-k equals the rank-window " +
    "formulation and is partition-invariant") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val rows = (0L until 120L).map { i =>
      val words = Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      (i, words.mkString(" "), s"s${i % 4}")
    }
    val docs = docsDf(rows: _*)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getInt(5))).sortBy(t => (t._1, t._6)).toSeq
    val got = canon(Corpus.tfidfTopTerms(docs, 3))
    // the window formulation the aggregator replaced (kept here as the spec)
    val base = docs.withColumn("toks", Corpus.tokens(col("text")))
      .filter(size(col("toks")) > 0)
    val words = base.select(col("doc_id"), col("source"), explode(col("toks")).as("w"))
    val df_ = words.select("doc_id", "w").distinct().groupBy("w").agg(count(lit(1)).as("df"))
    val n = base.select(countDistinct(col("doc_id")).as("n_docs"))
    val tf = words.groupBy("source", "w").agg(count(lit(1)).as("tf"))
    val want = canon(tf.join(df_, Seq("w")).crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("score").desc, col("w").asc)))
      .filter(col("rn") <= 3)
      .select("source", "w", "tf", "df", "score", "rn"))
    assert(got === want)
    assert(canon(Corpus.tfidfTopTerms(docs.repartition(13), 3)) === want,
      "top-k must not depend on partitioning")
  }

  test("exportShards: null text neither NPEs nor drops the doc") {
    val ss = spark; import ss.implicits._
    val docs = Seq[(Long, Option[String], String)](
      (0L, Some("a b c"), "s"), (1L, None, "s"))
      .toDF("doc_id", "text", "source")
    val m = Corpus.exportShards(docs, 4).collect()
    assert(m.map(_.getLong(1)).sum === 2L, "the null-text doc must still land")
  }
}
