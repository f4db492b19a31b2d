package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication & similarity operators for large-scale training-data
  * pipelines — beyond the reference's own surface (SURVEY.md §7.2 step 9).
  *
  * Scale design: every operator here is shuffle-minimal —
  *  - signatures/fingerprints are computed row-local (higher-order functions
  *    inside WholeStageCodegen-adjacent columnar eval, no shuffle);
  *  - candidate generation joins only on compact band/bucket keys (LSH), so
  *    the quadratic blow-up is confined to hash-bucket-local pairs;
  *  - the only full shuffles are groupBy(hash) for exact dedup and the
  *    band-key self-join, both over small projected columns.
  * At 100 TB the pairwise verifiers (Jaccard, cosine) must only ever run on
  * LSH candidates, never on the cross product; the blocked/cross variants
  * here exist for oracle-checkable correctness at test scale.
  */
object Dedup {

  /** Modulus for all text hashing: 2^31-1 (Mersenne prime), keeping every
    * intermediate product below 2^63 so the same integer arithmetic is exact
    * in any engine.
    */
  val M: Long = 2147483647L

  // the (a, b) affine hash family — Sketch reuses its prefix and
  // SparkEntry's oracle SQL generator reads it too, so the repo has ONE
  // Scala source of truth for these parameters
  private[graft] val As = Seq(1299721L, 15485863L, 32452843L, 49979687L,
    67867967L, 86028121L, 104395301L, 122949823L)
  private[graft] val Bs = Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)
  val NumHashes: Int = As.size
  val NumBands: Int = 4 // 4 bands x 2 rows

  /** 31-polynomial fold over a string's UNICODE CODE POINTS mod `m`. All
    * repo text hashing iterates code points, NOT UTF-16 code units: the
    * DuckDB oracle mirrors fold per character of a UTF-8 string (one code
    * point each), so a charAt fold would diverge on any supplementary
    * character (emoji etc.) by hashing its two surrogates. Identical for
    * BMP text. (Exception: the salted-key path — Java String.hashCode
    * parity is code-unit by DEFINITION; map keys are ASCII identifiers.)
    */
  private[graft] def cpFold(s: String, m: Long): Long = {
    var a = 0L; var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      a = (a * 31 + cp) % m
      i += Character.charCount(cp)
    }
    a
  }

  /** Full MinHash signature in one JIT-compiled pass over the text (the
    * HOF-expression formulation evaluates interpreted per element — ~10×
    * slower; the arithmetic here is identical and engine-portable).
    * Shingles are 5-CODE-POINT windows — see [[cpFold]] for why.
    */
  private val minhashSigUdf = udf { (t: String) =>
    val cps = if (t == null) Array.empty[Int] else t.codePoints().toArray
    val n = cps.length - 4
    if (n <= 0) null
    else {
      val hs = new Array[Long](n)
      var i = 0
      while (i < n) {
        var a = 0L; var j = i; val e = i + 5
        while (j < e) { a = (a * 31 + cps(j)) % M; j += 1 }
        hs(i) = a; i += 1
      }
      As.zip(Bs).map { case (a, b) =>
        var m = Long.MaxValue; var k = 0
        while (k < hs.length) { val v = (a * hs(k) + b) % M; if (v < m) m = v; k += 1 }
        m
      }.toArray
    }
  }

  /** MinHash signature columns mh0..mh7 from a `text` column. */
  def withMinhashSignature(docs: DataFrame): DataFrame = {
    val withSig = docs.withColumn("sig", minhashSigUdf(col("text")))
    As.indices.foldLeft(withSig) { (df, k) =>
      df.withColumn(s"mh$k", element_at(col("sig"), k + 1))
    }.drop("sig")
  }

  /** Skew guard, ON BY DEFAULT: buckets above this size are dropped from
    * candidate generation. The candidate join's work is Σ bucket² — one hot
    * (band, bh) bucket (boilerplate hashing identically across millions of
    * docs) otherwise turns the whole pass quadratic; measured on this repo's
    * own scale probe, a 51%-of-corpus degenerate bucket made a 10× corpus
    * cost 80× before the cap. A bucket this size is a degenerate collision
    * class, not near-dup evidence (the q29/q47 oracles mirror the same
    * HAVING filter).
    */
  val DefaultBucketCap = 1024

  /** (doc_id, band, bh) band-bucket keys of each document — the LSH index
    * rows. Row-local (signature UDF + arithmetic), so the same projection
    * serves the batch candidate join AND streaming index maintenance.
    */
  def bandKeys(docs: DataFrame): DataFrame = {
    val sig = withMinhashSignature(docs)
    val bandStructs = (0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        ((col(s"mh${2 * b}") * 31 + col(s"mh${2 * b + 1}")) % M).as("bh"))
    }
    sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** Drop band buckets larger than `cap` (the hot-bucket skew guard) —
    * shared by the self-join (q29) and ingest (q85) candidate generators so
    * the cap semantics can never drift between them.
    */
  private def capHotBuckets(bands: DataFrame, cap: Int): DataFrame =
    if (cap == Int.MaxValue) bands
    else {
      val hot = bands.groupBy("band", "bh")
        .agg(count(lit(1)).as("bsz")).filter(col("bsz") > cap)
      bands.join(broadcast(hot.select("band", "bh")), Seq("band", "bh"), "left_anti")
    }

  /** Fraction of agreeing minhashes between signature aliases `a` and `b` —
    * the one place the /NumHashes denominator lives.
    */
  private def estSim(a: String, b: String): Column =
    As.indices
      .map(k => when(col(s"$a.mh$k") === col(s"$b.mh$k"), 1).otherwise(0))
      .reduce(_ + _) / lit(NumHashes.toDouble)

  /** LSH banding: candidate pairs sharing any (band, bandHash) bucket, with
    * the estimated similarity (fraction of agreeing minhashes) ≥ minEst.
    * The self-join key is the band hash — bucket-local pairs only.
    *
    * `maxBucketSize` (default [[DefaultBucketCap]]) is the skew guard for
    * real corpora — see the cap doc above. Members of a dropped bucket
    * still meet through their other NumBands-1 bands unless those are
    * equally degenerate. The overflow list is tiny, so the anti-join
    * broadcasts.
    */
  def lshCandidatePairs(docs: DataFrame, minEst: Double,
      maxBucketSize: Int = DefaultBucketCap): DataFrame = {
    // the signature table feeds three plan branches (band explode + both
    // sides of the estimate join), so the minhash UDF runs ~3× per action.
    // A persist here measured SLOWER at bench scale (materialization
    // barrier + cached-stats join replanning outweigh the recompute); at
    // true corpus scale, persist/write the signature table ONCE upstream
    // (as Workflow.build does for the occurrence snapshot) rather than
    // caching inside this operator.
    val sig = withMinhashSignature(docs).select("doc_id", As.indices.map(k => s"mh$k"): _*)
    val bands = capHotBuckets(bandKeys(docs), maxBucketSize)
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sig.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sig.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), estSim("sa", "sb").as("est_sim"))
      .filter(col("est_sim") >= minEst)
  }

  /** Ingest-time dedup of a NEW batch against an EXISTING corpus: candidate
    * generation joins the new batch's band keys against the corpus band
    * index (the table EventStream.lshBandIndex maintains incrementally —
    * recomputed here from `corpus` so the operator is self-contained), then
    * verifies candidates by minhash agreement. Emits every new doc with the
    * smallest corpus doc it duplicates (`dup_of`, null = novel).
    *
    * Scale shape: the production ingest path — verification signatures are
    * computed only for candidate-matched corpus docs (the semi-join prunes
    * first), so verify cost scales with the candidate set; the new batch
    * (orders of magnitude smaller) drives every join. The hot-bucket cap
    * guards the index side exactly as in [[lshCandidatePairs]]. Because
    * this self-contained form RECOMPUTES the band index from `corpus`, the
    * candidate subtree appears in two plan branches and executes twice per
    * action — deliberately NOT checkpointed here (a lineage cut hides the
    * join from plan inspection and, under AQE, runs its stages at mere
    * DataFrame construction); in production the band index and signature
    * table are precomputed stored tables (EventStream.lshBandIndex is the
    * index's streaming maintainer) and the double-compute vanishes.
    */
  def ingestDedup(corpus: DataFrame, newDocs: DataFrame, minEst: Double,
      maxBucketSize: Int = DefaultBucketCap): DataFrame = {
    val idx = capHotBuckets(bandKeys(corpus), maxBucketSize)
      .withColumnRenamed("doc_id", "old_id")
    val nb = bandKeys(newDocs).withColumnRenamed("doc_id", "new_id")
    val cand = nb.join(idx, Seq("band", "bh"))
      .select(col("new_id"), col("old_id")).distinct()
    val mhs = As.indices.map(k => s"mh$k")
    val sigN = withMinhashSignature(newDocs).select("doc_id", mhs: _*)
    // no broadcast hint: the matched-id set is bounded only by batch size ×
    // bucket occupancy — AQE broadcasts it when it is actually small, and a
    // shuffled semi-join survives the batches a forced broadcast would OOM
    val sigO = withMinhashSignature(
      corpus.join(cand.select(col("old_id")).distinct(),
        col("doc_id") === col("old_id"), "left_semi"))
      .select("doc_id", mhs: _*)
    val dups = cand
      .join(sigN.as("sa"), col("new_id") === col("sa.doc_id"))
      .join(sigO.as("sb"), col("old_id") === col("sb.doc_id"))
      .select(col("new_id"), col("old_id"), estSim("sa", "sb").as("est_sim"))
      .filter(col("est_sim") >= minEst)
      .groupBy("new_id").agg(min("old_id").as("dup_of"))
    newDocs.select(col("doc_id"))
      .join(dups, col("doc_id") === col("new_id"), "left")
      .select(col("doc_id"), col("dup_of"))
  }

  /** Edit-distance verification of LSH candidates: every
    * [[lshCandidatePairs]] pair gets an exact Levenshtein distance over the
    * two documents' first `prefixLen` characters and a `near_dup` verdict
    * (`dist ≤ maxDist`) — the precise-but-quadratic-per-pair verifier that
    * at scale must ONLY ever run on LSH-blocked candidates (cost is
    * |candidates|·prefixLen², never corpus²). The prefix cap bounds the DP
    * per pair; near-dup docs agree in their prefix with the same edit
    * density as anywhere else, which is why prefix-Levenshtein is the
    * standard cheap verifier.
    *
    * Uses Spark's builtin codegen'd `levenshtein` WITH the threshold
    * argument — the banded DP that only fills cells within `maxDist` of
    * the diagonal (O(maxDist·prefixLen) per pair, not prefixLen²) and
    * returns −1 past the band. `edit_dist = −1` therefore means "further
    * than maxDist", exactly the information the dedup decision needs
    * (measured ~2.5× faster than the full DP on this suite's candidate
    * set, where most pairs are far). Distance semantics are the classic
    * character DP — identical in DuckDB for BMP text.
    *
    * Scale shape: inherits the bucketed candidate join; the two text
    * lookups are doc_id-keyed joins projecting ONLY the prefix (the scan
    * never carries full text into the shuffle); the distance expression
    * is evaluated ONCE per pair (the verdict derives from the column, so
    * no double DP hides in the projection).
    */
  def editVerifiedPairs(docs: DataFrame, minEst: Double, prefixLen: Int,
      maxDist: Int): DataFrame = {
    val pre = docs.select(col("doc_id"),
      substring(col("text"), 1, prefixLen).as("pre"))
    val cand = lshCandidatePairs(docs, minEst).select("doc_a", "doc_b")
    cand
      .join(pre.select(col("doc_id").as("doc_a"), col("pre").as("pa")), Seq("doc_a"))
      .join(pre.select(col("doc_id").as("doc_b"), col("pre").as("pb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("pa"), col("pb"), maxDist).as("edit_dist"))
      .withColumn("near_dup", (col("edit_dist") =!= -1).cast("int"))
  }

  /** Connected components over near-dup edges → duplicate clusters, labeled
    * by the minimum doc_id reachable. Iterative min-label propagation with a
    * bounded driver loop and per-round persist — the standard large-scale
    * pattern (rounds ≤ graph diameter; at 100 TB each round is one shuffle
    * over the edge list, with checkpoints to cut lineage).
    */
  def duplicateClusters(docs: DataFrame, minEst: Double): DataFrame =
    clustersFromEdges(docs.select("doc_id"),
      lshCandidatePairs(docs, minEst).select("doc_a", "doc_b"))

  /** Min-label connected components over an ARBITRARY (doc_a, doc_b) edge
    * list — [[duplicateClusters]] factored free of the LSH edge source so
    * other verified-pair generators compose with it (q148 runs it over the
    * dHash Hamming-ball image edges; any modality's near-dup pairs work).
    * `ids` is one row per node (doc_id); isolated nodes label themselves.
    */
  def clustersFromEdges(ids: DataFrame, edgesIn: DataFrame): DataFrame = {
    val edges = edgesIn.select("doc_a", "doc_b")
    // localCheckpoint (eager) truncates the logical plan each round — the
    // propagation plan references `labels` twice, so without lineage cuts the
    // plan tree doubles per round and the driver dies on plan blow-up long
    // before the data is big. At cluster scale use checkpoint() on
    // reliable storage instead.
    val sym = edges
      .union(edges.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .localCheckpoint()
    var labels = ids.select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint()
    // labels only ever DECREASE (least of self and neighbours), so the
    // label sum is strictly monotone until the fixpoint — an aggregate on
    // the new labels detects convergence without the join-back-and-count
    // the naive check needs (one shuffle per round saved)
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val s = df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head.getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s // empty input: fixpoint
    }
    var prevSum = labelSum(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 20) {
      // measured negative result: folding the self-carry into the edge join
      // via self-loops (sym ∪ (id,id), one join+min instead of join+min+left
      // join) ran ~12% SLOWER at bench scale — labels broadcast into the sym
      // join, so the "saved" left join was already shuffle-free, and the
      // self-loop rows only added aggregation work. Don't re-fuse.
      val nbMin = sym
        .join(labels.withColumnRenamed("doc_id", "dst_id"), col("dst") === col("dst_id"))
        .groupBy(col("src").as("doc_id"))
        .agg(min("cluster_id").as("nb_min"))
      val stepped = labels.join(nbMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nb_min"), col("cluster_id"))).as("cluster_id"))
      // pointer jumping: label[x] ← label[label[x]] — every label is a real
      // doc_id, so the self-join composes the pointer chain and convergence
      // needs O(log diameter) rounds instead of O(diameter)
      val next = stepped.as("a")
        .join(stepped.select(col("doc_id").as("pj_id"), col("cluster_id").as("pj_cl")).as("b"),
          col("a.cluster_id") === col("pj_id"), "left")
        .select(col("a.doc_id"), coalesce(col("pj_cl"), col("a.cluster_id")).as("cluster_id"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      rounds += 1
    }
    labels
  }

  /** k-CORE of an arbitrary (doc_a, doc_b) edge list — iterative peeling
    * (Matula–Beck 1983; distributed round shape à la Montresor et al.,
    * "Distributed k-Core Decomposition", 2011): each round recounts every
    * survivor's degree AMONG survivors and drops nodes under `k`; what
    * remains at the fixpoint is the maximal subgraph where every member
    * keeps ≥ k neighbours inside it. The driver loop runs EXACTLY
    * `rounds` rounds — peeling is idempotent at the fixpoint, so extra
    * rounds are no-ops and a fixed round count is engine-mirrorable —
    * then asserts the fixpoint WAS reached (one more recount must drop
    * nobody): a too-small `rounds` fails loudly instead of shipping a
    * half-peeled core. Worst-case rounds-to-fixpoint is the peel depth (a
    * k=2 path peels from the ends, O(n) rounds); real duplicate graphs
    * are shallow — monitor the per-round survivor delta and raise
    * `rounds` if the assert ever fires. Emits (doc_id, core_deg) for the
    * survivors.
    *
    * Scale shape: the edge list is checkpointed once; each round is two
    * semi-joins of it against the (only-shrinking) survivor set plus one
    * keyed count — the CC round shape ([[clustersFromEdges]]) without the
    * pointer jumping; the convergence check is one bounded count.
    */
  def kCoreFromEdges(edgesIn: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1 and rounds >= 1, got k=$k rounds=$rounds")
    val edges = edgesIn.select("doc_a", "doc_b")
    val sym = edges
      .union(edges.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .localCheckpoint()
    def degAmong(active: DataFrame): DataFrame = sym
      .join(active.withColumnRenamed("doc_id", "src"), Seq("src"), "left_semi")
      .join(active.withColumnRenamed("doc_id", "dst"), Seq("dst"), "left_semi")
      .groupBy(col("src").as("doc_id")).agg(count(lit(1)).as("core_deg"))
    var active = sym.select(col("src").as("doc_id")).distinct().localCheckpoint()
    for (_ <- 1 to rounds)
      active = degAmong(active).filter(col("core_deg") >= k)
        .select("doc_id").localCheckpoint()
    val core = degAmong(active).filter(col("core_deg") >= k).localCheckpoint()
    require(core.count() == active.count(),
      s"k-core peel did not reach its fixpoint within $rounds rounds — raise rounds")
    core
  }

  /** [[kCoreFromEdges]] over the verified near-dup graph — the FIFTH
    * graph-analytic on the same edge list (components q47, PageRank q106,
    * triangles q117, walks q144): connectivity alone (CC) merges anything
    * touching a chain, and degree alone crowns hubs that die in one peel
    * round; the k-core isolates the densely CROSS-LINKED duplication
    * communities (template farms, mirror rings) whose every member stays
    * k-connected inside the community — the strongest of the graph-shaped
    * curation signals.
    */
  def kCore(docs: DataFrame, minEst: Double, k: Int, rounds: Int): DataFrame =
    kCoreFromEdges(lshCandidatePairs(docs, minEst).select("doc_a", "doc_b"),
      k, rounds)

  /** Fixed-iteration PageRank over the symmetrized near-dup graph, in
    * EXACT INTEGER MICRO-UNITS: ranks live as micro-longs (1.0 = 10⁶),
    * each node passes `r div deg` to every neighbour (truncating integer
    * division), and the damped update is
    * `r' = 150000 + (850·Σcontrib) div 1000` — every operation is long
    * arithmetic, so the distributed sum is order-independent and any
    * engine reproduces it bit-for-bit, which a float PageRank cannot do
    * (its per-node Σ depends on reduction order). The centrality weights
    * duplicate-cluster hubs — the corpus-quality signal link analysis
    * gives a training pipeline. Dangling mass is dropped (standard
    * simplified form); isolated docs settle at the 150000 floor.
    *
    * Scale shape: the edge list is LSH-candidate-bounded (never n²) and
    * checkpointed once; each iteration is one join + one keyed sum, the
    * classic Pregel-style round. Micro-scaling keeps every product below
    * 2^63 up to ~10¹² accumulated contribution — far past any real
    * in-degree after the hot-bucket cap.
    */
  def pagerankMicro(docs: DataFrame, minEst: Double, iters: Int): DataFrame = {
    val edges = lshCandidatePairs(docs, minEst).select("doc_a", "doc_b")
    // materialized once: three iterations would otherwise re-run the
    // candidate join per action (same rationale as duplicateClusters)
    val sym = edges
      .union(edges.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .localCheckpoint()
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    val base = docs.select(col("doc_id"))
    var r = base.withColumn("r", lit(1000000L))
    for (_ <- 1 to iters) {
      val contrib = sym.join(deg, Seq("src"))
        .join(r.select(col("doc_id").as("src"), col("r")), Seq("src"))
        .select(col("dst").as("doc_id"), expr("r div deg").as("give"))
        .groupBy("doc_id").agg(sum("give").as("c"))
      r = base.join(contrib, Seq("doc_id"), "left")
        .select(col("doc_id"),
          expr("150000 + (850 * coalesce(c, 0)) div 1000").as("r"))
    }
    r.select(col("doc_id"), col("r").as("rank_micro"))
  }

  /** 32-bit SimHash over shingle hashes (integer-only, engine-portable;
    * 5-code-point shingles per [[cpFold]]'s convention).
    */
  val simhash32 = udf { (t: String) =>
    if (t == null) null
    else {
      val cps = t.codePoints().toArray
      val hs = (1 to cps.length - 4).map { i =>
        var a = 0L; var j = i - 1
        while (j < i + 4) { a = (a * 31 + cps(j)) % M; j += 1 }
        a
      }
      java.lang.Long.valueOf((0 until 32).foldLeft(0L) { (acc, j) =>
        val w = hs.map(h => if (((h >> j) & 1L) == 1L) 1 else -1).sum
        if (w > 0) acc + (1L << j) else acc
      })
    }
  }

  /** Hot-band cap for [[simhashNearDup]] — same rationale as the MinHash
    * bucket cap and Media.BandCap: an 8-bit band value shared by a huge
    * corpus fraction (boilerplate-dominated simhashes collapse toward a
    * few fingerprints) makes the blocked join quadratic in that bucket;
    * members of a dropped band still pair through their other 3 bands.
    */
  val SimhashBandCap = 64

  /** SimHash near-duplicate pairs — the text-side HAMMING complement to
    * the q28/q29 Jaccard estimators (Charikar's random-projection
    * fingerprint, STOC'02; the blocked-join shape is Manku/Jain/Sarma's
    * web-scale dedup, WWW'07): the 32-bit [[simhash32]] splits into
    * 4×8-bit bands, and by pigeonhole any pair within Hamming distance
    * ≤ 3 agrees EXACTLY on at least one band — perfect recall inside the
    * ball, unlike probabilistic MinHash banding. Candidates verify with
    * exact bit_count(xor).
    *
    * Scale shape: 4 band rows per doc, one band equi-join (never
    * all-pairs), hot bands capped ([[SimhashBandCap]]), verification
    * row-local on the pair. The same machinery as the image dHash path
    * (Media.dhashNearDup) applied to the text fingerprint — cross-modal
    * reuse in the other direction.
    */
  def simhashNearDup(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    // shingle-less docs (< 5 code points) all hash to the degenerate 0
    // fingerprint — without this guard every pair of tiny docs reports as
    // a Hamming-0 "near-dup" (same reason ppjoin filters size(s) > 0)
    val h = docs.filter(length(col("text")) > 4)
      .select(col("doc_id"), simhash32(col("text")).as("sh"))
      .filter(col("sh").isNotNull)
    val bands = h.select(col("doc_id"), col("sh"),
        explode(array((0 until 4).map(j =>
          struct(lit(j).as("band"),
            shiftright(col("sh"), 8 * j).bitwiseAND(lit(255L)).as("bw"))): _*))
          .as("bk"))
      .select(col("doc_id"), col("sh"),
        col("bk.band").as("band"), col("bk.bw").as("bw"))
    val hot = bands.groupBy("band", "bw").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > SimhashBandCap).select("band", "bw")
    val capped = bands.join(broadcast(hot), Seq("band", "bw"), "left_anti")
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bw") === col("b.bw") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Distinct word-trigram set of `text`, as 31-polynomial hashes mod M —
    * long set-intersection is ~10× cheaper than string sets, and word
    * n-grams keep the sets ~5× smaller than char shingles.
    */
  private val trigramHashSetUdf = udf { (t: String) =>
    val toks = if (t == null) Array.empty[String] else t.trim.split("\\s+")
    if (toks.length < 3) Array.empty[Long]
    else {
      val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
      var i = 0
      while (i < toks.length - 2) {
        val s = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
        seen += cpFold(s, M)
        i += 1
      }
      seen.toArray
    }
  }

  /** Asymmetric containment over distinct hashed word-trigram sets on LSH
    * candidates: `contain_a = |A∩B|/|A|` (how much of A lies inside B) and
    * the mirror — the quote/boilerplate-inclusion detector exact Jaccard
    * misses (a small doc fully quoted inside a large one has low Jaccard
    * but containment 1.0). Pairs are kept when EITHER direction reaches
    * `minContain`.
    *
    * Scale shape: inherits the bucketed candidate join (never all-pairs);
    * set intersection is per-pair row-local. Caveat the doc carries: LSH
    * on minhash-Jaccard under-recalls extreme-size-ratio containment
    * pairs — at scale the blocking for a dedicated containment pass keys
    * on the SMALLER doc's bottom-k shingle hashes instead; this operator
    * is the verify stage either way.
    */
  def containmentPairs(docs: DataFrame, minEst: Double,
      minContain: Double): DataFrame = {
    val sh = docs.withColumn("s", trigramHashSetUdf(col("text")))
      .select(col("doc_id"), col("s"))
    val cand = lshCandidatePairs(docs, minEst).select("doc_a", "doc_b")
    val inter = size(array_intersect(col("a.s"), col("b.s")))
    cand
      .join(sh.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sh.as("b"), col("doc_b") === col("b.doc_id"))
      // guard the divisions: a doc under 3 tokens has an empty trigram set
      .filter(size(col("a.s")) > 0 && size(col("b.s")) > 0)
      .select(col("doc_a"), col("doc_b"),
        inter.as("n_common"),
        size(col("a.s")).as("n_a"), size(col("b.s")).as("n_b"),
        (inter / size(col("a.s"))).as("contain_a"),
        (inter / size(col("b.s"))).as("contain_b"))
      .filter(greatest(col("contain_a"), col("contain_b")) >= minContain)
  }

  /** Containment-DEDICATED blocking: exact prefix filtering on the
    * contained side's sorted trigram hashes, verified directionally. LSH
    * on minhash-Jaccard under-recalls extreme-size-ratio containment
    * pairs (a 20-token doc quoted inside a 2000-token doc has Jaccard
    * ~1%, so no band collides even at containment 1.0); this pass blocks
    * on the SMALLER doc's own hashes instead, so recall is independent of
    * the size ratio:
    *
    *  - posting index: every doc's every trigram hash, minus hashes
    *    hotter than `postingCap` docs (boilerplate trigrams — the same
    *    degenerate-key guard as the LSH bucket cap);
    *  - probe: doc A exposes only the PREFIX of its ascending-sorted
    *    hash set — the first |A| − ⌈|A|·t⌉ + 1 hashes. If
    *    |A∩B| ≥ t·|A| then A has at most |A| − ⌈t·|A|⌉ hashes outside
    *    B, so at least one prefix hash hits B's postings: the filter is
    *    EXACT (zero recall loss below the cap), not probabilistic;
    *  - verify: one row-local set intersection per candidate, keep
    *    directional pairs with contain_a ≥ t.
    *
    * Scale shape: postings are linear in corpus trigrams (the same
    * magnitude as the signature build), the probe side is a ~(1−t)
    * fraction of that, and the join is hash-keyed — never all-pairs. The
    * driver corpus's containment pairs all happen to be near-dups too, so
    * the size-ratio recall win is exercised by the constructed
    * quoted-snippet pair in OperatorSpec.
    */
  def containmentBlockedPairs(docs: DataFrame, minContain: Double,
      postingCap: Int): DataFrame = {
    val sh = docs.withColumn("s", sort_array(trigramHashSetUdf(col("text"))))
      .filter(size(col("s")) > 0)
      .select(col("doc_id"), col("s"))
    val post = sh.select(col("doc_id").as("doc_b"), explode(col("s")).as("h"))
    val ok = post.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= postingCap).select("h")
    val n = size(col("s"))
    val probe = sh.select(col("doc_id").as("doc_a"),
      explode(slice(col("s"), lit(1),
        n - ceil(n.cast("double") * lit(minContain)).cast("int") + lit(1))).as("h"))
    val cand = probe.join(post.join(ok, "h"), "h")
      .filter(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val inter = size(array_intersect(col("a.s"), col("b.s")))
    cand
      .join(sh.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sh.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        inter.as("n_common"), size(col("a.s")).as("n_a"),
        size(col("b.s")).as("n_b"),
        (inter / size(col("a.s"))).as("contain_a"))
      .filter(col("contain_a") >= minContain)
  }

  /** EXACT-threshold Jaccard self-join over the whole corpus — the
    * deterministic complement to [[lshCandidatePairs]] (probabilistic,
    * recall < 1) and [[ngramJaccardPairs]] (exact but blocked by a
    * metadata key, all-pairs within a block): every pair with trigram-set
    * Jaccard ≥ t, ZERO recall loss, never an all-pairs compare. The
    * AllPairs/PPJoin prefix-filtering scheme (Bayardo et al. WWW'07,
    * Xiao et al. WWW'08):
    *
    *  - every doc's trigram hashes sort by a GLOBAL total order —
    *    ascending (document frequency, hash). Frequency-ascending is the
    *    load-bearing choice at scale: boilerplate trigrams (the corpus
    *    puts its hottest in half the docs) have maximal df, sort LAST,
    *    and therefore never enter any prefix — the degenerate-key blowup
    *    the LSH path needs a bucket cap for simply cannot occur here,
    *    with no cap and no recall loss (candidate generation order
    *    affects cost only; the exact verify fixes the output).
    *  - prefix: a doc exposes its first n − ⌈t·n⌉ + 1 ordered hashes
    *    (integer-exact: ⌈t·n⌉ = (tMicro·n + 999999) div 10⁶). If
    *    J(A,B) ≥ t then |A∩B| ≥ ⌈t·max(nA,nB)⌉, and under a common
    *    total order two sets with overlap ≥ α must share an element
    *    inside both (n − α + 1)-prefixes — so the prefix join misses
    *    nothing.
    *  - length filter in the join: min·10⁶ ≥ max·tMicro (J ≥ t forces
    *    t·nA ≤ nB ≤ nA/t) prunes cross-size candidates before the
    *    distinct.
    *  - verify: one row-local intersection per candidate; integer
    *    micro-Jaccard, exact in any engine.
    *
    * Scale shape: postings are linear in corpus trigrams, prefixes a
    * ~(1−t) fraction of that, the join hash-keyed on rare-leaning
    * tokens, verification candidate-bounded. All exchanges keyed; no
    * window, no cap, no estimator.
    */
  def ppjoinPairs(docs: DataFrame, tMicro: Long): DataFrame = {
    // `sh` is read on three sides of the plan (prefix probe + both verify
    // joins) — persisted for the scope of ONE materialization of the pair
    // list via Lifecycle.withPersisted (structural round-9 lifecycle: the
    // checkpointed output is the candidate-bounded pair list, the small
    // side; no cache entry survives the call)
    val sh = docs.withColumn("s", trigramHashSetUdf(col("text")))
      .filter(size(col("s")) > 0)
      .select(col("doc_id"), col("s"))
    graft.core.Lifecycle.withPersisted(sh) {
    val tok = sh.select(col("doc_id"), explode(col("s")).as("h"))
    val dfreq = tok.groupBy("h").agg(count(lit(1)).as("df"))
    // pk packs (df, h) into one ascending-sortable long: h < 2^31 and
    // df < 2^31, so df·2^31 + h is exact and ordered by (df, h)
    val ordered = tok.join(dfreq, "h")
      .select(col("doc_id"), (col("df") * 2147483648L + col("h")).as("pk"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("pk"))).as("os"), count(lit(1)).as("n"))
    val probe = ordered
      .select(col("doc_id"), col("n"),
        explode(expr(
          s"slice(os, 1, int(n - (($tMicro * n + 999999) div 1000000) + 1))"))
          .as("pk"))
      .select(col("doc_id"), col("n"), pmod(col("pk"), lit(2147483648L)).as("h"))
    val cand = probe.as("a")
      .join(probe.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.n"), col("b.n")) * lit(1000000L) >=
            greatest(col("a.n"), col("b.n")) * lit(tMicro))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val inter = size(array_intersect(col("x.s"), col("y.s")))
    cand
      .join(sh.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sh.as("y"), col("doc_b") === col("y.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        inter.cast("long").as("n_common"),
        size(col("x.s")).cast("long").as("n_a"),
        size(col("y.s")).cast("long").as("n_b"))
      .withColumn("jacc_micro",
        expr("n_common * 1000000 div (n_a + n_b - n_common)"))
      .filter(col("jacc_micro") >= tMicro)
    }
  }

  /** Distinct 5-code-point shingle hashes of `text` — the EXACT set whose
    * Jaccard the minhash signature estimates; [[lshCalibration]]'s ground
    * truth. Same fold, same window as [[minhashSigUdf]].
    */
  private val shingleSetUdf = udf { (t: String) =>
    val cps = if (t == null) Array.empty[Int] else t.codePoints().toArray
    val n = cps.length - 4
    if (n <= 0) Array.empty[Long]
    else {
      val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
      var i = 0
      while (i < n) {
        var a = 0L; var j = i; val e = i + 5
        while (j < e) { a = (a * 31 + cps(j)) % M; j += 1 }
        seen += a; i += 1
      }
      seen.toArray
    }
  }

  /** LSH estimator calibration matrix: for every candidate pair, the
    * signature-agreement count (0–8, the estimator) against the EXACT
    * shingle-Jaccard decile (the estimand), with pair counts and exact
    * micro-Jaccard sums per cell — the precision/threshold-tuning evidence
    * a dedup pipeline publishes before committing to an `est ≥ t` cut
    * (how many pairs does each estimator band contain, and what is their
    * true similarity spread?).
    *
    * Scale shape: candidates come from the capped LSH join (never
    * all-pairs); the exact sets ride the same two id-keyed joins the
    * verifiers use; the matrix is a ≤ 9×11-cell aggregate. Integer
    * discipline: exact Jaccard is `inter·10⁶ div union` (empty-vs-empty
    * → 10⁶ by convention), so cells are exact long sums.
    */
  def lshCalibration(docs: DataFrame, minEst: Double): DataFrame = {
    val pairs = lshCandidatePairs(docs, minEst)
    val sh = docs.withColumn("s", shingleSetUdf(col("text")))
      .select(col("doc_id"), col("s"))
    val inter = size(array_intersect(col("a.s"), col("b.s"))).cast("long")
    val uni = size(col("a.s")).cast("long") + size(col("b.s")).cast("long") - inter
    pairs
      .join(sh.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sh.as("b"), col("doc_b") === col("b.doc_id"))
      .select(round(col("est_sim") * 8, 0).cast("int").as("est_agree"),
        inter.as("i"), uni.as("u"))
      .select(col("est_agree"),
        when(col("u") === 0, lit(1000000L))
          .otherwise(expr("i * 1000000 div u")).as("ex_micro"))
      .groupBy(col("est_agree"), expr("ex_micro div 100000").as("ex_decile"))
      .agg(count(lit(1)).as("n_pairs"), sum("ex_micro").as("sum_ex_micro"))
  }

  /** SimHash calibration matrix — [[lshCalibration]]'s estimator audit for
    * the HAMMING estimator: over the SAME capped-LSH candidate population,
    * each pair's simhash Hamming distance (the signal the q154 `hamming ≤ r`
    * cut reads) against its EXACT distinct-shingle-Jaccard decile, with
    * pair counts and exact micro-Jaccard sums per cell — the evidence
    * justifying a near-dup radius (how much true similarity does each
    * Hamming shell actually hold?). Published alongside q139 so both text
    * estimators are audited against the same estimand on the same
    * population, making their operating points directly comparable.
    *
    * Scale shape: candidates come from the capped LSH join (never
    * all-pairs); fingerprints and exact sets ride id-keyed joins exactly
    * like the verifiers; the matrix is a ≤ 33×11-cell aggregate. Same
    * integer discipline as q139 (`inter·10⁶ div union`, empty-vs-empty
    * → 10⁶).
    */
  def simhashCalibration(docs: DataFrame, minEst: Double): DataFrame = {
    val pairs = lshCandidatePairs(docs, minEst).select("doc_a", "doc_b")
    // same shingle-less guard as simhashNearDup: tiny docs collapse to the
    // degenerate 0 fingerprint; dropping them here drops those pairs from
    // the matrix rather than polluting the hamming-0 cell
    val fp = docs.filter(length(col("text")) > 4)
      .select(col("doc_id"), simhash32(col("text")).as("sh"))
      .filter(col("sh").isNotNull)
    val sets = docs.withColumn("s", shingleSetUdf(col("text")))
      .select(col("doc_id"), col("s"))
    val inter = size(array_intersect(col("a.s"), col("b.s"))).cast("long")
    val uni = size(col("a.s")).cast("long") + size(col("b.s")).cast("long") - inter
    pairs
      .join(fp.select(col("doc_id").as("doc_a"), col("sh").as("sha")), Seq("doc_a"))
      .join(fp.select(col("doc_id").as("doc_b"), col("sh").as("shb")), Seq("doc_b"))
      .join(sets.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sets.as("b"), col("doc_b") === col("b.doc_id"))
      .select(
        bit_count(col("sha").bitwiseXOR(col("shb"))).cast("int").as("hamming"),
        inter.as("i"), uni.as("u"))
      .select(col("hamming"),
        when(col("u") === 0, lit(1000000L))
          .otherwise(expr("i * 1000000 div u")).as("ex_micro"))
      .groupBy(col("hamming"), expr("ex_micro div 100000").as("ex_decile"))
      .agg(count(lit(1)).as("n_pairs"), sum("ex_micro").as("sum_ex_micro"))
  }

  /** Deterministic node2vec-style walks over the near-dup graph: one walk
    * per node, `steps` hops, each hop moving to the neighbor that
    * minimizes the hash ((dst·1299721 + step·7) mod M) — a reproducible
    * stand-in for the uniform neighbor draw, with the packed
    * (hash·2³² + dst) argmin making ties exact in any engine. Emits the
    * comma-joined node sequences — the "sentences" skip-gram graph
    * embeddings (DeepWalk/node2vec) train on; downstream they feed q97's
    * PMI/skip-gram machinery unchanged.
    *
    * Scale shape: each hop is ONE keyed join against the per-step argmin
    * table (itself a keyed aggregate of the arc list); `steps` is a small
    * constant, so the lineage is a fixed chain of equi-joins — no
    * iteration-to-convergence, no window, walks never collected.
    */
  def randomWalks(docs: DataFrame, minEst: Double, steps: Int): DataFrame = {
    val e = lshCandidatePairs(docs, minEst).select("doc_a", "doc_b")
    val sym = e.union(e.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .localCheckpoint() // the arc list feeds every hop's argmin
    var walks = sym.select(col("src")).distinct()
      .select(col("src").as("start"), col("src").as("cur"),
        col("src").cast("string").as("seq"))
    for (step <- 1 to steps) {
      val nx = sym
        .groupBy("src")
        .agg(min(((col("dst") * 1299721L + lit(step) * 7L) % M)
          * 4294967296L + col("dst")).as("pk"))
        .select(col("src").as("nsrc"), (col("pk") % 4294967296L).as("nx"))
      walks = walks.join(nx, walks("cur") === nx("nsrc"), "left")
        .select(col("start"),
          coalesce(col("nx"), col("cur")).as("cur"),
          concat(col("seq"), lit(","),
            coalesce(col("nx"), col("cur")).cast("string")).as("seq"))
    }
    walks.select(col("start"), col("cur").as("end"), col("seq"))
  }

  /** Cross-source duplicate-flow matrix: near-dup pair counts per
    * unordered (source_a, source_b) cell with the exact sum of signature
    * agreements — the provenance report showing which sources copy from
    * which (mirrors within one source, syndication across two), the
    * aggregate view a curation team reads before deciding per-source
    * dedup policy. Scale shape: the capped candidate pairs ride two
    * id-keyed joins to pick up sources; the matrix is #sources²-bounded.
    */
  def dupFlow(docs: DataFrame, minEst: Double): DataFrame = {
    val meta = docs.select(col("doc_id"), col("source"))
    lshCandidatePairs(docs, minEst)
      .join(meta.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        Seq("doc_a"))
      .join(meta.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"),
        round(col("est_sim") * 8, 0).cast("long").as("agree"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"), sum("agree").as("sum_agree"))
  }

  /** Exact n-gram Jaccard over distinct hashed word-trigram sets, blocked by
    * a grouping column (at scale: always pre-blocked — by LSH bucket or
    * metadata key — never the raw cross product).
    */
  def ngramJaccardPairs(docs: DataFrame, blockCol: String, minJaccard: Double): DataFrame = {
    val sh = docs.withColumn("s", trigramHashSetUdf(col("text")))
      .select(col("doc_id"), col(blockCol).as("blk"), col("s"))
    val inter = size(array_intersect(col("a.s"), col("b.s")))
    sh.as("a")
      .join(sh.as("b"), col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (inter / (size(col("a.s")) + size(col("b.s")) - inter)).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Triangle counts and local clustering coefficient over the verified
    * near-dup graph — with connected components (q47) and PageRank (q106)
    * this completes the graph-analytics trio; the coefficient separates
    * tight duplicate cliques (≈1, safe to collapse to one canonical doc)
    * from hub-shaped false-positive stars (≈0, a template shared by many
    * otherwise-unrelated docs — collapsing those loses real data).
    *
    * Scale shape: edges come from the capped LSH candidate join (never
    * all-pairs), so the 3-way triangle join is bounded by the candidate
    * edge list; the a<b<c canonical orientation counts each triangle once
    * with plain equi-joins. Coefficient in exact integer micro-units.
    */
  def triangleStats(docs: DataFrame, minEst: Double): DataFrame =
    triangleStats(docs, minEst, "auto")

  /** As [[triangleStats]]; `orientation` forces the [[triangles]] plan —
    * q146 gates the degree-ordered path against the same oracle as q117's
    * auto-dispatched (id, on this corpus) path, so BOTH enumeration plans
    * stay oracle-verified, not just the one the dispatch happens to pick.
    */
  def triangleStats(docs: DataFrame, minEst: Double, orientation: String): DataFrame = {
    // the verified edge list feeds five plan branches (3 triangle arms + 2
    // degree arms) — persist it, unlike the signature table (see the
    // lshCandidatePairs note), because edges are candidate-sized, not
    // corpus-sized, and the 5× recompute would repeat the band join.
    // Structural lifecycle (round 9): per-node stats are node-bounded, so
    // withPersisted checkpoints them and drops the edge cache on exit.
    val e = lshCandidatePairs(docs, minEst).select("doc_a", "doc_b")
    graft.core.Lifecycle.withPersisted(e) {
      val tri = triangles(e, orientation)
      val perNode = tri
        .select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_tri"))
      val deg = e.select(col("doc_a").as("doc_id"))
        .unionByName(e.select(col("doc_b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("deg"))
      perNode.join(deg, Seq("doc_id"))
        .withColumn("clust_micro",
          expr("CASE WHEN deg >= 2 THEN n_tri * 2000000 div (deg * (deg - 1)) ELSE CAST(0 AS BIGINT) END"))
        .select("doc_id", "n_tri", "deg", "clust_micro")
    }
  }

  /** Triangle list (one row per triangle, columns a/b/c) over a canonical
    * `doc_a < doc_b` edge list, with the enumeration ORIENTATION
    * SKEW-DISPATCHED — the q125 diagnostic applied to the graph's own
    * degree distribution instead of a fixed choice:
    *
    *  - `"id"`: orient by doc id — two self-joins, no degree pass. Wedge
    *    work is Σ outdeg(v)², fine when degrees are near-uniform: on the
    *    LSH near-dup graph (628k edges / 5k docs, degrees near-equal)
    *    this MEASURED 13.8 s vs 19.4 s for degree-ordering at sf0.1
    *    (round 5) — the orientation's two extra joins bought nothing.
    *  - `"degree"`: Chiba–Nishizeki — orient each edge lower→higher
    *    (deg, id), capping every out-degree at O(√m) and total wedge work
    *    at O(m^1.5). Wins exactly where "id" collapses: id-ordered wedge
    *    work at a node is (#smaller-id neighbors × #larger-id neighbors),
    *    so a mid-id hub of degree h costs ~(h/2)² wedges through one
    *    node. MEASURED (plans.TriangleLab, star hub + 400 disjoint
    *    5-cliques, local[32]): 6000 spokes → id 1.23 s vs degree 0.54 s;
    *    20000 spokes → id 9.72 s vs degree 0.79 s — the 12× gap is the
    *    (h/2)² hub-wedge count and keeps growing quadratically.
    *  - `"auto"` (default): degree-ordered iff max_deg > 4·√m. Rationale:
    *    out-degrees are ≤ the graph degeneracy ≤ √(2m) under
    *    degree-ordering, so a node whose degree is far past √m RISKS
    *    quadratic fan-out under id order (it pays only if the hub's id
    *    lands mid-range among its neighbors — an extreme-id hub costs
    *    nothing, but the dispatch can't see id layout, so it buys the
    *    guaranteed O(m^1.5) bound); 4× keeps uniform-degree graphs
    *    (max ≈ mean) on the cheaper plan. One bounded driver collect (a
    *    single 2-long row).
    *
    * Each triangle appears exactly once under either orientation (both
    * are strict total orders on the vertices of the triangle).
    */
  /** The `"auto"` dispatch decision of [[triangles]], exposed so the
    * fixture tests pin the rule itself. */
  def triangleOrientation(e: DataFrame): String = {
    // coalesce: max/sum over ZERO rows are null — an empty edge list must
    // dispatch (to "id", where the self-joins are trivially empty), not NPE
    val r = e.select(col("doc_a").as("doc_id"))
      .unionByName(e.select(col("doc_b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("deg"))
      .agg(coalesce(max("deg"), lit(0L)).as("max_deg"),
        coalesce((sum("deg") / 2).cast("long"), lit(0L)).as("m"))
      .collect()(0)
    val (maxDeg, m) = (r.getLong(0), r.getLong(1))
    if (m > 0 && maxDeg > 4 * math.sqrt(m.toDouble)) "degree" else "id"
  }

  def triangles(e: DataFrame, orientation: String = "auto"): DataFrame = {
    val mode =
      if (orientation == "auto") triangleOrientation(e) else orientation
    if (mode == "id") {
      e.as("e1")
        .join(e.as("e2"), col("e1.doc_b") === col("e2.doc_a"))
        .join(e.as("e3"),
          col("e1.doc_a") === col("e3.doc_a") && col("e2.doc_b") === col("e3.doc_b"))
        .select(col("e1.doc_a").as("a"), col("e1.doc_b").as("b"),
          col("e2.doc_b").as("c"))
    } else {
      // orient lower→higher (deg, id); `dk` (the head's key) rides along so
      // the wedge join can order its two legs without re-joining degrees
      val deg = e.select(col("doc_a").as("doc_id"))
        .unionByName(e.select(col("doc_b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("deg"))
      val ed = e
        .join(deg.select(col("doc_id").as("doc_a"), col("deg").as("da")), "doc_a")
        .join(deg.select(col("doc_id").as("doc_b"), col("deg").as("db")), "doc_b")
      // uniform field names: the two CASE branches must be the same struct type
      val ka = struct(col("da").as("d"), col("doc_a").as("v"))
      val kb = struct(col("db").as("d"), col("doc_b").as("v"))
      val o = ed.select(
          when(ka < kb, col("doc_a")).otherwise(col("doc_b")).as("src"),
          when(ka < kb, col("doc_b")).otherwise(col("doc_a")).as("dst"),
          when(ka < kb, kb).otherwise(ka).as("dk"))
      // read 3× by the plan (two wedge legs + closure probe); structural
      // lifecycle (round 9): the triangle list is output-bounded, so
      // withPersisted checkpoints it and drops the oriented-edge cache
      graft.core.Lifecycle.withPersisted(o) {
        o.as("w1")
          .join(o.as("w2"),
            col("w1.src") === col("w2.src") && col("w1.dk") < col("w2.dk"))
          .join(o.as("cl"),
            col("w1.dst") === col("cl.src") && col("w2.dst") === col("cl.dst"),
            "left_semi")
          .select(col("w1.src").as("a"), col("w1.dst").as("b"),
            col("w2.dst").as("c"))
      }
    }
  }

  // ------------------------------------------------------------ winnowing

  /** Winnowing k-gram length (characters) and window size (consecutive
    * k-gram positions). Guarantee: any substring shared by two documents of
    * length ≥ K+W−1 = 11 characters produces a shared fingerprint
    * (Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
    * Fingerprinting", SIGMOD'03 — the MOSS algorithm). Unlike the q23 whole-
    * doc fingerprint or q87's disjoint chunks, winnowing is ALIGNMENT-FREE:
    * an insertion early in a copy shifts every later chunk boundary but
    * leaves winnowed fingerprints of untouched regions identical.
    */
  val WinnowK = 8
  val WinnowW = 4
  /** Positions pack into the low 20 bits of the window-min encoding —
    * h·2^20 + (2^20−1−pos) < 2^51 stays long-exact in any engine. Documents
    * are bounded at 2^20 characters (a corpus pipeline chunks anything
    * bigger — q73 — long before fingerprinting).
    */
  private val PosBits = 20

  /** All k-gram hashes of `text` in position order: h_p = 31-polynomial
    * code-point fold mod [[M]] of text[p, p+K). One JIT pass per document
    * (same rationale as the MinHash UDF above).
    */
  private val kgramHashesUdf = udf { (t: String) =>
    if (t == null) Array.empty[Long]
    else {
      val cps = t.codePoints.toArray
      val n = cps.length - WinnowK + 1
      if (n <= 0) Array.empty[Long]
      else Array.tabulate(n) { p =>
        var a = 0L; var i = 0
        while (i < WinnowK) { a = (a * 31 + cps(p + i)) % M; i += 1 }
        a
      }
    }
  }

  /** Distinct winnowed fingerprints per document: every full window of W
    * consecutive k-gram positions selects its minimal hash (ties → the
    * RIGHTMOST position, the paper's robust-winnowing rule), encoded so one
    * integer `min` does both jobs: min over h·2^20 + (2^20−1−pos) orders by
    * hash first, then by DESCENDING position. The per-doc window sort
    * partitions by doc_id — document-bounded, never corpus-bounded.
    */
  def winnowFingerprints(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shift = 1L << PosBits
    val pos = docs
      .filter(length(col("text")) >= WinnowK + WinnowW - 1)
      .select(col("doc_id"), length(col("text")).as("len"),
        posexplode(kgramHashesUdf(col("text"))).as(Seq("pos", "h")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(0, WinnowW - 1)
    pos
      .withColumn("cmin",
        min(col("h") * shift + (lit(shift - 1) - col("pos"))).over(w))
      // only FULL windows select (wstart ≤ len−K−W+1) — the tail's partial
      // frames would otherwise add selections the guarantee doesn't need
      .filter(col("pos") <= col("len") - (WinnowK + WinnowW - 1))
      .select(col("doc_id"), shiftright(col("cmin"), PosBits).as("fph"))
      .distinct()
  }

  /** Substring-overlap candidate pairs from shared winnowed fingerprints:
    * docs sharing ≥ `minShared` fingerprints, with per-doc fingerprint
    * counts and the containment-style overlap ratio in integer micro-units.
    * Fingerprints on more than `hotCap` docs are dropped first (boilerplate
    * substrings — the same hot-key cap as the LSH bucket cap q29 ships on
    * by default, and the reason the self-join below can never go
    * quadratic in the corpus).
    *
    * Scale shape: fingerprint postings are linear in corpus characters /
    * W; the cap bounds every join group at hotCap; pair aggregation is one
    * keyed shuffle of candidate-local rows.
    */
  def winnowOverlapPairs(docs: DataFrame, minShared: Int, hotCap: Int): DataFrame = {
    val fp = winnowFingerprints(docs)
    val ok = fp.groupBy("fph").agg(count(lit(1)).as("nd"))
      .filter(col("nd") <= hotCap).select("fph")
    val fpo = fp.join(ok, Seq("fph"), "left_semi")
    val cnt = fpo.groupBy("doc_id").agg(count(lit(1)).as("nfp"))
    val pairs = fpo.as("a")
      .join(fpo.as("b"),
        col("a.fph") === col("b.fph") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(cnt.select(col("doc_id").as("doc_a"), col("nfp").as("n_a")), Seq("doc_a"))
      .join(cnt.select(col("doc_id").as("doc_b"), col("nfp").as("n_b")), Seq("doc_b"))
      .withColumn("overlap_micro", expr("n_shared * 1000000 div least(n_a, n_b)"))
      .select("doc_a", "doc_b", "n_shared", "n_a", "n_b", "overlap_micro")
  }

  /** Cluster-integral train/val/test split: the 80/10/10 assignment hashes
    * the near-dup CLUSTER id ([[duplicateClusters]]'s label), not the doc
    * id — so no near-duplicate pair can straddle a split boundary. The
    * naive per-doc split (q51) leaks eval content into training whenever a
    * near-dup pair lands on both sides; splitting by connected-component
    * label is the leakage-free formulation a benchmark-grade corpus needs.
    * Emits per-split doc/cluster/char totals as the audit evidence.
    *
    * Scale shape: labeling is the q47 pointer-jumping iteration; the split
    * itself is a row-local hash of the label, and both aggregates are
    * keyed with map-side combine. The doc_id equi-join back to the corpus
    * is hash-partitioned on the key — no window, no driver state.
    */
  def leakageFreeSplit(docs: DataFrame, minEst: Double): DataFrame = {
    val b = Corpus.lcg(col("cluster_id")) % 100
    duplicateClusters(docs, minEst)
      .withColumn("split",
        when(b < 80, "train").when(b < 90, "val").otherwise("test"))
      .join(docs.select("doc_id", "n_chars"), Seq("doc_id"))
      .groupBy("split", "cluster_id")
      .agg(count(lit(1)).as("nd"), sum("n_chars").as("sc"))
      .groupBy("split")
      .agg(sum("nd").as("n_docs"), count(lit(1)).as("n_clusters"),
        sum("sc").as("sum_chars"))
  }

  /** Exact substring duplication spans (Lee et al., ACL 2022,
    * "Deduplicating Training Data Makes Language Models Better" —
    * ExactSubstr): every fixed-length character window (length `L`; the
    * paper uses 50 BPE tokens over a suffix array) occurring at MORE THAN
    * ONE (doc, position) in the corpus marks its span duplicated. Per doc
    * this emits the duplicated-position count and the characters covered
    * by the UNION of the duplicated [pos, pos+L) intervals — the exact
    * span ExactSubstr would cut, and the duplicated-text fraction curation
    * pipelines threshold on. Complements winnowing (q113): winnowing is a
    * SAMPLED fingerprint with pair-level overlap evidence; this is the
    * position-complete exact signal — zero false positives/negatives on
    * ≥ L-char verbatim repeats, intra- AND inter-document.
    *
    * Scale shape: window generation is row-local (sequence → explode →
    * substring, inside codegen; one row per position, the same fan-out
    * class as shingling). The only wide exchanges are keyed on the gram —
    * a partially-aggregated count (map-side combine absorbs hot
    * boilerplate grams before the shuffle) and a semi-join marking
    * duplicated positions — then one groupBy(doc_id) whose collected state
    * is bounded by the document's own length (the chunking/packing bound).
    * The interval union is a fold over adjacent gaps of the SORTED
    * position list (`Σ min(L, pₖ₊₁ − pₖ) + L`), row-local HOF arithmetic.
    * The gram key exchanged is the 63-bit hash (see [[gramKeyExpr]]), not
    * the L-char string — 8 bytes instead of ~40 through every gram
    * shuffle; [[substringHashAudit]] (q177) measures the collision cost
    * (zero on the shipped corpus) against the string arm.
    */
  /** (doc_id, pos) of every duplicated L-gram — the shared core of
    * [[exactSubstringSpans]] (measure) and [[exactSubstringCut]] (act).
    */
  /** Every character-position L-gram as (`key`, pos, gram) — the single
    * window-extraction convention the whole ExactSubstr family shares
    * (spans/cut, span spectrum, source flow, source profile). One change
    * here reaches them all.
    *
    * `hashBits` picks the gram KEY representation. The production default
    * (63) exchanges an 8-byte hash instead of the L-char substring: the
    * substring is still built (row-local, pre-shuffle, collapsed by
    * whole-stage codegen), but every gram-keyed exchange downstream —
    * the dup-count shuffle, the semi-join, the per-source collapse —
    * carries 8 bytes where the string arm carried ~L (≈5× fewer shuffle
    * bytes at L=40, measured in PROFILE.md), removing the one
    * constant-factor scale hazard the round-8 verdict ranked first.
    * `hashBits = 0` keeps the raw string (the exact arm the collision
    * audit [[substringHashAudit]] compares against); 1..32 are the
    * deliberately-narrow audit arms that MUST show collisions (the
    * positive control proving the audit isn't vacuous).
    */
  private def windowGrams(docs: DataFrame, L: Int, key: String,
      hashBits: Int = GramHashBits): DataFrame = {
    require(L >= 2, s"window length must be >= 2, got $L")
    val entering = docs.filter(length(col("text")) >= L)
    // ASCII guard on the HASHED path only: the 63-bit key's collision
    // license (q177: extra_pos = 0) and its DuckDB oracle pairing were both
    // measured on an ASCII corpus; non-ASCII text is un-audited territory
    // (the oracle's unicode()-per-grapheme fold diverges from Java's
    // UTF-16-unit fold on combining sequences and astral chars). The hash
    // itself is self-consistent on ANY input, so a non-ASCII deployment
    // needs only a re-run of the q177 audit on its corpus — this guard is
    // the loud reminder, not a semantic limit. `octet_length == length` is
    // exact for all-ASCII (UTF-8 multi-byte iff non-ASCII) and costs one
    // vectorized scan per DOCUMENT, pre-explode — invisible next to the
    // per-position gram fan-out. The string arm (hashBits = 0) stays
    // unguarded: it is the ground-truth audit arm and hash-free.
    val src =
      if (hashBits == 0) entering
      else entering.withColumn("text",
        when(octet_length(col("text")) === length(col("text")), col("text"))
          .otherwise(raise_error(concat(
            lit("non-ASCII text in the hashed-gram path (un-audited for the " +
              "63-bit gram key; re-run the q177 collision audit on this " +
              s"corpus or use hashBits = 0). $key="), col(key).cast("string")))))
    val base = src
      .select(col(key), col("text"),
        explode(expr(s"sequence(1, length(text) - ${L - 1})")).as("pos"))
      .select(col(key), col("pos"), expr(s"substring(text, pos, $L)").as("gram"))
    if (hashBits == 0) base
    else {
      graft.functions.JavaHashExpr.register(docs.sparkSession)
      graft.functions.GramKeyExpr.register(docs.sparkSession)
      base.select(col(key), col("pos"), gramKeyExpr(hashBits).as("gram"))
    }
  }

  /** Production gram-key width: 63 bits (two independent base-31 folds).
    * Collision odds over W distinct windows ≈ W²/2⁶⁴ — ~5·10⁻⁹ at 10⁷
    * windows; [[substringHashAudit]] measures the actual count (0) on the
    * shipped corpus, and a collision only ever ADDS duplicated positions
    * (hashing merges gram classes), so the failure mode is over-cutting,
    * never missed duplication.
    */
  val GramHashBits = 63

  /** The gram key as a Column over the string `gram` column. 63-bit keys
    * pack two 32-bit polynomial folds — `javaHash(gram)` (unsigned via
    * pmod) in the high 32 bits, `javaHash(reverse(gram)) mod 2³¹` in the
    * low 31 — so the max value is exactly Long.MaxValue (no ANSI
    * overflow) and the pair survives the classic base-31 collisions
    * ("Aa"/"BB" collide in one fold, never in both). Narrow widths
    * truncate the first fold: `2^bits | 2^32` keeps them a quotient of
    * the same hash, so narrowing is provably collision-monotone. Both
    * folds are `graft_java_hash` (codegen Expression, q17/q112's proven
    * mechanism) — DuckDB-expressible via the same `javaHashSql` fold, so
    * every hashed-arm query stays byte-exact oracle-paired even if a
    * collision ever fires (the oracle merges the identical classes).
    */
  private[operators] def gramKeyExpr(bits: Int): org.apache.spark.sql.Column = {
    require((bits >= 1 && bits <= 32) || bits == 63,
      s"gram hash width must be 1..32 or 63, got $bits")
    if (bits == 63)
      // one-pass codegen form of pmod(javaHash(gram), 2³²)·2³¹ +
      // pmod(javaHash(reverse(gram)), 2³¹) — FunctionsSpec asserts the
      // equivalence; the composed form costs 3 string allocations per
      // window (GramLab measured it slower than the string arm it
      // replaces)
      expr("graft_gram_key63(gram)")
    else
      expr(s"pmod(CAST(graft_java_hash(gram) AS BIGINT), ${1L << bits})")
  }

  private def dupGramPositions(docs: DataFrame, L: Int,
      hashBits: Int = GramHashBits): DataFrame = {
    val grams = windowGrams(docs, L, "doc_id", hashBits)
    val dup = grams.groupBy("gram").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1).select("gram")
    grams.join(dup, Seq("gram"), "left_semi").select("doc_id", "pos")
  }

  def exactSubstringSpans(docs: DataFrame, L: Int,
      hashBits: Int = GramHashBits): DataFrame = {
    dupGramPositions(docs, L, hashBits)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_pos"),
        sort_array(collect_list(col("pos"))).as("ps"))
      .withColumn("covered_chars",
        expr(s"""$L + aggregate(
          zip_with(slice(ps, 1, size(ps) - 1), slice(ps, 2, size(ps) - 1),
            (a, b) -> least(CAST($L AS BIGINT), CAST(b - a AS BIGINT))),
          CAST(0 AS BIGINT), (acc, x) -> acc + x)"""))
      .join(docs.select(col("doc_id"), length(col("text")).cast("long").as("len")),
        Seq("doc_id"))
      .select(col("doc_id"), col("n_dup_pos"), col("covered_chars"),
        expr("covered_chars * 1000000 div len").as("dup_frac_micro"))
  }

  /** Duplicated-SPAN LENGTH SPECTRUM — the distribution ExactSubstr's own
    * paper reports (Lee et al. ACL'22 §4: how long are the verbatim
    * repeats?): per merged duplicated span length (the [pos, pos+L)
    * interval-union islands [[exactSubstringCut]] removes), the number of
    * such spans corpus-wide. Long tails here mean whole sections/documents
    * are copied; mass at exactly L means isolated phrase reuse.
    *
    * Scale shape: q159's exchanges, then ONE fold per doc building the
    * island lengths row-local (start/prev/lengths accumulator over the
    * sorted positions), an explode bounded by spans-per-doc, and a keyed
    * count over ≤ max-doc-length distinct keys.
    */
  def spanLengthSpectrum(docs: DataFrame, L: Int,
      hashBits: Int = GramHashBits): DataFrame =
    dupGramPositions(docs, L, hashBits)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
      .select(explode(expr(s"""aggregate(ps,
        named_struct('start', 0, 'prev', 0,
          'lens', CAST(array() AS ARRAY<BIGINT>)),
        (st, p) -> CASE
          WHEN st.start = 0 THEN
            named_struct('start', p, 'prev', p, 'lens', st.lens)
          WHEN p - st.prev > $L THEN
            named_struct('start', p, 'prev', p, 'lens',
              concat(st.lens, array(CAST(st.prev + $L - st.start AS BIGINT))))
          ELSE named_struct('start', st.start, 'prev', p, 'lens', st.lens)
          END,
        st -> CASE WHEN st.start = 0 THEN st.lens
          ELSE concat(st.lens,
            array(CAST(st.prev + $L - st.start AS BIGINT))) END)"""))
        .as("span_len"))
      .groupBy("span_len").agg(count(lit(1)).as("n_spans"))

  /** Per-source duplication PROFILE: every duplicated L-gram position
    * split INTERNAL (the gram repeats, but only within this source) vs
    * EXTERNAL (the gram also appears in another source) — "template-heavy"
    * and "copying/copied" are different curation problems with different
    * fixes (cut boilerplate vs deduplicate against the other source), and
    * this is the per-source evidence separating them. Emits both counts,
    * the source's total window count, and the duplicated-position share.
    *
    * Scale shape: the char-position explode collapses in ONE pass to the
    * persisted (source, gram, cnt) table (state per gram bounded by the
    * source-domain cardinality); gram classification and the per-source
    * rollup are keyed aggregates over that table, joined gram-keyed like
    * q159's semi-join. No window, no collect.
    */
  def sourceDupProfile(docs: DataFrame, L: Int,
      hashBits: Int = GramHashBits): DataFrame = {
    // ONE window explode, collapsed immediately to (source, gram, cnt);
    // persisted because both the per-gram classification and the
    // per-source rollup read it (without the persist the char-position
    // explode — the dominant cost — would execute once per branch).
    // Structural lifecycle (round 9): the per-source profile is tiny, so
    // withPersisted checkpoints it and drops the gram-table cache entry.
    val sg = gramCounts(docs, L, hashBits)
    graft.core.Lifecycle.withPersisted(sg) {
      sourceDupProfileFromCounts(sg)
    }
  }

  /** The (source, gram, cnt) window-count table — [[sourceDupProfile]]'s
    * collapsed core, exposed because the STREAMING monitor maintains
    * exactly this as add-only keyed state (EventStream.gramCountStream)
    * and serves the profile off its snapshots.
    */
  def gramCounts(docs: DataFrame, L: Int,
      hashBits: Int = GramHashBits): DataFrame =
    windowGrams(docs, L, "source", hashBits)
      .groupBy("source", "gram").agg(count(lit(1)).as("cnt"))

  /** The profile half of [[sourceDupProfile]] over an already-built
    * (source, gram, cnt) table — shared verbatim by the batch operator
    * and the streaming monitor's serve side, so prefix equality between
    * them is equality of the COUNT STATE, which add-only counters give by
    * construction.
    */
  def sourceDupProfileFromCounts(sg: DataFrame): DataFrame = {
    // the classification side renames its gram key: this is a SELF-join of
    // `sg` (which may be a memory-sink view whose attribute ids repeat on
    // both sides — Spark's auto-dedup doesn't reach views), so one side
    // must carry fresh ids
    val cls = sg.groupBy("gram")
      .agg(sum("cnt").as("n_occ"), count(lit(1)).as("n_src"))
      .filter(col("n_occ") > 1)
      .select(col("gram").as("cls_gram"), (col("n_src") >= 2).as("ext"))
    sg.join(cls, sg("gram") === cls("cls_gram"), "left")
      .drop("cls_gram")
      .groupBy("source")
      .agg(sum(when(col("ext") === false, col("cnt")).otherwise(0L))
          .as("n_int_pos"),
        sum(when(col("ext") === true, col("cnt")).otherwise(0L))
          .as("n_ext_pos"),
        sum("cnt").as("total_pos"))
      .withColumn("dup_share_micro",
        expr("(n_int_pos + n_ext_pos) * 1000000 div total_pos"))
  }

  /** Cross-source SUBSTRING provenance matrix — [[dupFlow]] (q141) at
    * ExactSubstr granularity: per unordered source pair, the number of
    * DISTINCT duplicated L-grams both sources contain verbatim — which
    * sources copy from which, measured in shared text rather than
    * near-dup pair counts (a source that quotes another shares grams long
    * before whole documents become near-duplicates).
    *
    * Scale shape: one distinct over (source, gram) — partial-aggregated,
    * the gram exchange q159 already pays — then per gram a
    * collect_set(source) whose state is bounded by the SOURCE-DOMAIN
    * cardinality (a config-scale dimension, not corpus-scale), pair
    * expansion row-local over the sorted source array (the q160 HOF), and
    * one keyed count over ≤ C(#sources, 2) keys. No window, no collect.
    */
  def substringFlow(docs: DataFrame, L: Int,
      hashBits: Int = GramHashBits): DataFrame = {
    val gs = windowGrams(docs, L, "source", hashBits)
      .select("source", "gram").distinct()
    gs.groupBy("gram")
      .agg(expr("array_sort(collect_set(source))").as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(explode(expr(
        """flatten(transform(ss, (a, i) ->
             transform(slice(ss, i + 2, size(ss)), b ->
               named_struct('source_a', a, 'source_b', b))))""")).as("p"))
      .groupBy(col("p.source_a").as("source_a"),
        col("p.source_b").as("source_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Duplicate-cluster SIZE SPECTRUM — the one-table summary a dedup
    * report publishes (how much of the corpus sits in clusters of size
    * 1, 2, … k): per cluster size, the number of clusters and the docs
    * they hold. Singleton docs count as size-1 clusters, so the spectrum
    * PARTITIONS the corpus exactly — Σ n_docs == corpus size
    * (test-asserted) — and the size-1 row is the honest "untouched by
    * dedup" denominator most reports omit.
    *
    * Scale shape: two keyed counts over the q47 labels (the CC iteration
    * is the only real work); output is bounded by the number of DISTINCT
    * cluster sizes — at most √(2n) rows by the partition-number bound.
    */
  def clusterSpectrum(docs: DataFrame, minEst: Double): DataFrame =
    duplicateClusters(docs, minEst)
      .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))

  /** The ACTION half of ExactSubstr dedup: CUT every duplicated span
    * ([[exactSubstringSpans]] measures them) and emit the cleaned corpus —
    * per doc, the text with the union of duplicated [pos, pos+L) intervals
    * removed (remaining segments concatenated in order), plus the merged
    * span count and kept length. Docs with no duplicated window pass
    * through verbatim; invariant (test-asserted): kept_chars +
    * covered_chars == n_chars against the q159 measurement.
    *
    * Scale shape: identical to [[exactSubstringSpans]] through the
    * gram exchanges; the reconstruction is ONE fold over the sorted
    * position list carrying a (cursor, builder) accumulator — row-local,
    * state bounded by the document's own length. The corpus rewrite
    * never shuffles text: the only exchanged columns are (doc_id, pos)
    * and the gram keys.
    */
  /** Merged-span count over a sorted position array `ps` (null-safe 0). */
  private def cutSpanCount(L: Int): org.apache.spark.sql.Column =
    coalesce(expr(s"""1 + aggregate(
        zip_with(slice(ps, 1, size(ps) - 1), slice(ps, 2, size(ps) - 1),
          (a, b) -> CASE WHEN b - a > $L THEN 1 ELSE 0 END),
        CAST(0 AS BIGINT), (acc, x) -> acc + x)"""), lit(0L))

  /** `text` with the union of [p, p+L) intervals of `ps` removed — one
    * row-local (cursor, builder) fold; docs with null `ps` pass verbatim.
    * Shared by [[exactSubstringCut]] and [[substringDecontamCut]]: the
    * reconstruction is identical, only WHICH positions get cut differs.
    */
  private def cutText(L: Int): org.apache.spark.sql.Column =
    when(col("ps").isNull, col("text"))
      .otherwise(expr(s"""aggregate(ps,
        named_struct('cur', 1, 'txt', ''),
        (st, p) -> named_struct(
          'cur', greatest(st.cur, p + $L),
          'txt', CASE WHEN p > st.cur
            THEN concat(st.txt, substring(text, st.cur, p - st.cur))
            ELSE st.txt END),
        st -> concat(st.txt,
          substring(text, st.cur, length(text) - st.cur + 1)))"""))

  def exactSubstringCut(docs: DataFrame, L: Int,
      hashBits: Int = GramHashBits): DataFrame = {
    val perDoc = dupGramPositions(docs, L, hashBits)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
    docs.select(col("doc_id"), col("text"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        cutSpanCount(L).as("n_cut_spans"),
        cutText(L).as("cleaned_text"))
      .withColumn("kept_chars", length(col("cleaned_text")).cast("long"))
      .select("doc_id", "n_cut_spans", "kept_chars", "cleaned_text")
  }

  /** The ACTION half of [[substringDecontaminate]] — DECONTAMINATE BY
    * CUTTING: every train position whose L-char window appears verbatim
    * in the eval source is removed (union of [pos, pos+L) intervals, the
    * same row-local reconstruction fold as [[exactSubstringCut]]), and
    * the cleaned corpus is emitted — clean docs verbatim, the benchmark's
    * own rows excluded. This is the splice-don't-drop remedy the q178
    * report prices out: cutting loses only `covered_chars` per doc
    * (q178's column, invariant-tested kept + covered == n_chars) where
    * dropping loses the whole document.
    *
    * Scale shape: q178's exchanges (benchmark-sized broadcast of hashed
    * eval keys, row-local semi-join, one doc-keyed position rollup
    * bounded by the doc's own length); the rewrite never shuffles text.
    */
  def substringDecontamCut(docs: DataFrame, evalSource: String, L: Int,
      hashBits: Int = GramHashBits): DataFrame = {
    val train = docs.filter(col("source") =!= evalSource)
    val perDoc = evalHitPositions(docs, evalSource, L, hashBits)
      .select("doc_id", "ps")
    train.select(col("doc_id"), col("source"), col("text"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        cutSpanCount(L).as("n_cut_spans"),
        cutText(L).as("cleaned_text"))
      .withColumn("kept_chars", length(col("cleaned_text")).cast("long"))
      .select("doc_id", "source", "n_cut_spans", "kept_chars", "cleaned_text")
  }

  /** SUBSTRING-level DECONTAMINATION — ExactSubstr turned on the
    * train-vs-benchmark boundary (the Lee et al. ACL'22 §6.2 use: eval
    * examples leak into crawls VERBATIM far more often than as whole-doc
    * near-dups). For every train doc (outside `evalSource`), every
    * position whose L-char window also appears verbatim anywhere in the
    * eval source is contaminated; per doc this emits the position count,
    * the UNION-covered characters (the q159 interval fold — exactly the
    * span a q161-style cut would splice out, so this REPORT has a
    * matching ACTION), and the contaminated fraction. Complements q67:
    * word-5-gram overlap scores dilution-prone whole-doc similarity;
    * this is position-exact verbatim containment with a cut boundary.
    *
    * Scale shape: the eval side is benchmark-sized, so its distinct
    * 63-bit gram keys broadcast (8 bytes per gram — the hashed core is
    * what makes a multi-million-gram benchmark broadcastable) and the
    * 100 TB train side never shuffles text: window extraction and the
    * semi-join are row-local against the broadcast, and the only wide op
    * is the per-doc position rollup, q159's shape.
    */
  /** Sorted eval-contaminated positions per train doc — the ONE
    * eval-hit-position pipeline (eval keys → train windows → broadcast
    * semi-join → doc-keyed rollup) behind the decontamination REPORT
    * (q178) and CUT (q179), the dupGramPositions analogue for the
    * cross-corpus boundary. One change here (exclusion semantics, hash
    * width) reaches both.
    */
  private def evalHitPositions(docs: DataFrame, evalSource: String, L: Int,
      hashBits: Int): DataFrame =
    windowGrams(docs.filter(col("source") =!= evalSource), L, "doc_id",
        hashBits)
      .join(broadcast(evalGramKeys(docs, evalSource, L, hashBits)),
        Seq("gram"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_pos"),
        sort_array(collect_list(col("pos"))).as("ps"))

  def substringDecontaminate(docs: DataFrame, evalSource: String, L: Int,
      hashBits: Int = GramHashBits): DataFrame = {
    val train = docs.filter(col("source") =!= evalSource)
    evalHitPositions(docs, evalSource, L, hashBits)
      .withColumn("covered_chars",
        expr(s"""$L + aggregate(
          zip_with(slice(ps, 1, size(ps) - 1), slice(ps, 2, size(ps) - 1),
            (a, b) -> least(CAST($L AS BIGINT), CAST(b - a AS BIGINT))),
          CAST(0 AS BIGINT), (acc, x) -> acc + x)"""))
      .join(train.select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("len")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("n_eval_pos"),
        col("covered_chars"),
        expr("covered_chars * 1000000 div len").as("contam_micro"))
  }

  /** The DISTINCT hashed gram keys of one source — [[substringDecontaminate]]'s
    * broadcastable eval set, exposed because the STREAMING contamination
    * monitor joins ingest batches against exactly this table.
    */
  def evalGramKeys(docs: DataFrame, evalSource: String, L: Int,
      hashBits: Int = GramHashBits): DataFrame =
    windowGrams(docs.filter(col("source") === evalSource), L, "source",
      hashBits).select("gram").distinct()

  /** Per-source contaminated-position counts of `docs` against a
    * (benchmark-sized, broadcast) eval gram-key set — the rollup half of
    * [[substringDecontaminate]], shared verbatim with the streaming
    * monitor (EventStream.decontamMonitorStream): window extraction and
    * the semi-join are row-local against the broadcast, the count is one
    * source-keyed add-only aggregate — so streaming prefix equality is
    * equality of counters, free by construction. `evalSource` rows are
    * EXCLUDED here, exactly as [[substringDecontaminate]] excludes them —
    * the benchmark trivially contains its own grams, and an ingest stream
    * that happens to carry the benchmark's shard must not trip a
    * permanent false alarm on it.
    */
  def evalHitCounts(docs: DataFrame, evalGrams: DataFrame,
      evalSource: String, L: Int,
      hashBits: Int = GramHashBits): DataFrame =
    windowGrams(docs.filter(col("source") =!= evalSource), L, "source",
        hashBits)
      .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .groupBy("source").agg(count(lit(1)).as("n_eval_pos"))

  /** Gram-hash COLLISION AUDIT — the q176 pattern applied to the
    * ExactSubstr core: the production arms (q159/q161/q163–q165) exchange
    * the 63-bit gram key instead of the L-char string, and this measures
    * what that costs on the actual corpus. Per hash width in `bitsList`,
    * the per-doc duplicated-position counts under the hashed key are
    * compared against the STRING-gram ground truth (same corpus, same L):
    * `dup_pos` (hashed-arm total), `exact_pos` (string-arm total),
    * `extra_pos` (collision-created false positions — hashing only ever
    * MERGES gram classes, so hashed ≥ exact pointwise per doc,
    * OperatorSpec-asserted), and `n_docs_inflated` (docs whose count
    * moved). The narrow widths (16/24 bits) are the positive control —
    * they MUST show collisions on a real corpus, proving the audit can
    * see them — and the 63-bit row reading `extra_pos = 0` is the
    * measured license for the hashed production core.
    *
    * Scale shape: ONE window explode carrying the string gram, persisted
    * ([[graft.core.Lifecycle.withPersisted]] — structural lifecycle, no
    * cache entry survives the call) and re-keyed per arm by a row-local
    * mod; each arm is the q159 exchange pair (keyed count + semi-join)
    * followed by a per-doc count; the cross-arm compare is a doc-keyed
    * full join and the output is |bitsList| rows. The string-gram
    * exchange here is the run-once audit cost (the q149-brute framing) —
    * production paths never pay it.
    */
  def substringHashAudit(docs: DataFrame, L: Int,
      bitsList: Seq[Int]): DataFrame = {
    require(bitsList.nonEmpty, "need at least one hash width to audit")
    // the arms hash the string grams themselves, so register here — the
    // string-arm windowGrams call (hashBits = 0) doesn't
    graft.functions.JavaHashExpr.register(docs.sparkSession)
    graft.functions.GramKeyExpr.register(docs.sparkSession)
    val g = windowGrams(docs, L, "doc_id", 0)
    // per-doc duplicated-position count under whatever `gram` keying the
    // input carries — the q159 core, reused identically for every arm
    def perDoc(keyed: DataFrame, outName: String): DataFrame = {
      val dup = keyed.groupBy("gram").agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") > 1).select("gram")
      keyed.join(dup, Seq("gram"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as(outName))
    }
    val exact = perDoc(g, "n_exact")
    graft.core.Lifecycle.withPersisted(g, exact) {
      bitsList.map { b =>
        perDoc(g.select(col("doc_id"), gramKeyExpr(b).as("gram")), "n")
          .join(exact, Seq("doc_id"), "full")
          .select(coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("n_exact"), lit(0L)).as("n_exact"))
          .agg(coalesce(sum("n"), lit(0L)).as("dup_pos"),
            coalesce(sum("n_exact"), lit(0L)).as("exact_pos"),
            coalesce(sum(col("n") - col("n_exact")), lit(0L)).as("extra_pos"),
            coalesce(sum(when(col("n") > col("n_exact"), 1L).otherwise(0L)),
              lit(0L)).as("n_docs_inflated"))
          .select(lit(b).as("hash_bits"), col("dup_pos"), col("exact_pos"),
            col("extra_pos"), col("n_docs_inflated"))
      }.reduce(_.unionByName(_))
    }
  }

  /** LSH false-negative recovery by common-neighbor triangulation — the
    * EDGE-level recall audit completing the round-8 audit set (q139/q156
    * audit the estimators, q149/q151/q155/q157 the ANN indexes; this
    * audits the candidate GRAPH itself). LSH misses true near-dup pairs
    * whose bands never collide (or that the hot-bucket cap dropped); but a
    * missed pair inside a duplicate cluster usually shares surviving
    * neighbors. Every non-edge (a, b) with ≥ `minSupport` common neighbors
    * in the symmetrized candidate graph is predicted as a missed near-dup
    * and VERIFIED with the exact distinct-shingle Jaccard (the q139
    * estimand) — emitting (pair, support, exact micro-Jaccard): the
    * measured false-negative evidence behind "one LSH pass + transitive
    * closure is enough" (or not) for a given corpus.
    *
    * Scale shape: common neighbors are counted over a bounded per-node
    * sketch (see [[missedPairsFromEdges]] — the naive Σ deg² wedge join is
    * c³ on a near-clique cluster of size c; the sketch caps both the wedge
    * fan-out and the predicted output at n·C(B,2), linear in the corpus).
    * Prediction is one keyed count over row-local sketch pairs + an
    * anti-join against the edge list; verification rides the same
    * id-keyed set joins as [[lshCalibration]]. No window, no collect.
    */
  /** [[lshMissAudit]]'s prediction core over an explicit (doc_a, doc_b)
    * edge list: non-edges whose common-neighbor support in the symmetrized
    * graph — counted over a BOUNDED per-node neighbor sketch — reaches
    * `minSupport`, with that support count. Separated so the wedge
    * arithmetic is unit-testable on hand graphs.
    *
    * The sketch is the `maxNeighbors` neighbors with the smallest
    * injective-LCG hash (Corpus.lcg is a bijection mod 2³¹, so the pick is
    * deterministic and engine-portable with no tiebreak column). The naive
    * formulation joins the full adjacency with itself — Σ deg² wedge rows,
    * which on a near-clique duplicate cluster of size c is c³ (measured:
    * 629 k edges at sf0.1 → 312 M wedges, 34 s, 5.6 M predicted pairs —
    * output BIGGER than the corpus). Sketching bounds wedges at
    * n·C(B,2) row-local pairs and predicted output at the same, linear in
    * the corpus, while dense clusters still surface with support ≈ the
    * number of shared sketch slots — exactly the link-prediction sketch
    * trade (sampled common-neighbor evidence, not the exhaustive count).
    */
  def missedPairsFromEdges(edgesIn: DataFrame, minSupport: Int,
      maxNeighbors: Int): DataFrame = {
    require(minSupport >= 1, s"need minSupport >= 1, got $minSupport")
    require(maxNeighbors >= 2, s"need maxNeighbors >= 2, got $maxNeighbors")
    val e = edgesIn.select("doc_a", "doc_b")
    val sym = e.union(e.select(col("doc_b"), col("doc_a"))).toDF("src", "dst")
    // per-middle sketch: collect_list state is bounded by the candidate
    // graph's constructive degree cap (≤ NumBands·DefaultBucketCap), the
    // same bound that makes the LSH join itself safe
    val sk = sym
      .select(col("src"),
        struct(Corpus.lcg(col("dst")).as("h"), col("dst").as("dst")).as("hd"))
      .groupBy("src")
      .agg(expr(s"slice(array_sort(collect_list(hd)), 1, $maxNeighbors)")
        .as("ns"))
    // all C(B,2) in-sketch pairs, generated row-local — no self-join
    val wedges = sk.select(explode(expr(
      """flatten(transform(ns, (x, i) ->
           transform(slice(ns, i + 2, size(ns)), y ->
             named_struct('doc_a', least(x.dst, y.dst),
                          'doc_b', greatest(x.dst, y.dst)))))""")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
    wedges.groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common_neighbors"))
      .filter(col("common_neighbors") >= minSupport)
      .join(e, Seq("doc_a", "doc_b"), "left_anti")
  }

  def lshMissAudit(docs: DataFrame, minEst: Double, minSupport: Int,
      maxNeighbors: Int = 8): DataFrame = {
    // read three times (sketch build via sym + the anti-join);
    // candidate-sized. Structural lifecycle (round 9): the verified
    // missed-pair list is sketch-bounded (n·C(B,2)), so withPersisted
    // checkpoints it and drops the edge cache on exit.
    val e = lshCandidatePairs(docs, minEst).select("doc_a", "doc_b")
    graft.core.Lifecycle.withPersisted(e) {
      val predicted = missedPairsFromEdges(e, minSupport, maxNeighbors)
      val sh = docs.withColumn("s", shingleSetUdf(col("text")))
        .select(col("doc_id"), col("s"))
      val inter = size(array_intersect(col("a.s"), col("b.s"))).cast("long")
      val uni = size(col("a.s")).cast("long") + size(col("b.s")).cast("long") - inter
      predicted
        .join(sh.as("a"), col("doc_a") === col("a.doc_id"))
        .join(sh.as("b"), col("doc_b") === col("b.doc_id"))
        .select(col("doc_a"), col("doc_b"), col("common_neighbors"),
          inter.as("i"), uni.as("u"))
        .select(col("doc_a"), col("doc_b"), col("common_neighbors"),
          when(col("u") === 0, lit(1000000L))
            .otherwise(expr("i * 1000000 div u")).as("jacc_micro"))
    }
  }

  /** Quality-aware CANONICAL SELECTION — the "keep the BEST copy" dedup
    * action (q66 keeps the min-id member; production pipelines usually
    * keep the LONGEST copy: truncated scrapes lose to the full article).
    * Per near-dup cluster, the kept member maximizes (n_chars, then min
    * doc_id) via one packed integer key (2²² − n_chars)·2⁴⁰ + doc_id (the
    * FIXED 2²² constant, NOT a corpus max — the SQL mirror hard-codes the
    * same literal) — argmax-length/min-id as a plain `min`, the q169
    * packing. Emits the
    * surviving corpus per source plus `n_policy_delta`: kept docs the
    * min-id policy would NOT have kept — the measured difference between
    * the two policies, not an assertion that they differ.
    *
    * Scale shape: labels ride the q47 CC machinery; selection is ONE
    * cluster-keyed min; the survivors come back via an id-keyed join. The
    * packed key's field bounds (n_chars < 2²², ids in [0, 2⁴⁰)) are
    * enforced by a one-row check — chunking (q73) bounds doc length far
    * below 4M chars upstream; anything else must fail loudly.
    */
  def keepLongestCanonical(docs: DataFrame, minEst: Double): DataFrame = {
    val b = docs.agg(coalesce(max("n_chars"), lit(0L)).as("maxc"),
      coalesce(max("doc_id"), lit(0L)).as("maxid"),
      coalesce(min("doc_id"), lit(0L)).as("minid")).collect()(0)
    require(b.getLong(0) < (1L << 22) &&
        b.getLong(1) < (1L << 40) && b.getLong(2) >= 0L,
      s"keepLongestCanonical packed key needs n_chars < 2^22 and ids in " +
        s"[0, 2^40); got max n_chars ${b.getLong(0)}, id range " +
        s"[${b.getLong(2)}, ${b.getLong(1)}]")
    val keep = duplicateClusters(docs, minEst)
      .join(docs.select("doc_id", "n_chars"), Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(expr("""CAST(min((4194304 - n_chars) * 1099511627776 + doc_id)
        % 1099511627776 AS BIGINT)""").as("keep_id"))
    docs.join(keep, docs("doc_id") === keep("keep_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        sum(when(col("keep_id") =!= col("cluster_id"), 1L).otherwise(0L))
          .as("n_policy_delta"))
  }

  /** SOFT dedup — DOWNWEIGHT duplicates instead of dropping them: every
    * doc keeps a training weight 1/cluster_size (micro-units), so each
    * near-dup cluster contributes one document's worth of gradient no
    * matter how many copies exist. The third dedup ACTION next to q66
    * (drop all but min-id) and q172 (drop all but longest) — preferred
    * when near-dups carry real variation (edits, translations of
    * boilerplate) that hard dropping would erase; the weight column feeds
    * the q140 weighted sampler directly.
    *
    * Scale shape: the q47 CC labels, one cluster-keyed count, one
    * id-keyed join back — nothing beyond what the labels already cost.
    */
  def softDedupWeights(docs: DataFrame, minEst: Double): DataFrame = {
    val lbl = duplicateClusters(docs, minEst)
    val sizes = lbl.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    lbl.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        expr("1000000 div cluster_size").as("weight_micro"))
  }

  /** Synchronous LABEL-PROPAGATION communities (Raghavan et al. 2007) over
    * an arbitrary edge list — the SIXTH graph-analytic on the near-dup
    * graph (CC q47, PageRank q106, triangles q117, walks q144, k-core
    * q158): where CC merges anything chain-connected and k-core keeps only
    * the dense core, LPA partitions the graph into locally-cohesive
    * communities — each node repeatedly adopts the most frequent label in
    * its closed neighbourhood. Deterministic engine-mirrorable form:
    * fixed `rounds` synchronous updates; the vote includes the node's OWN
    * current label (the self-loop variant — a bare two-node component
    * otherwise label-swaps forever under synchronous updates); ties break
    * to the SMALLEST label via one packed integer key
    * (maxc − c)·2⁴⁰ + label, so argmax-count/min-label is a plain `min`.
    *
    * Scale shape: per round, one dst-keyed join of the (checkpointed) edge
    * list against the label table, one (node, label) count (map-side
    * combined), one node-keyed min — the CC round shape without pointer
    * jumping; labels are node-keyed rows, never collected.
    *
    * Bounds and dispatch (round 9): the id bound (ids in [0, 2⁴⁰)) is
    * ENFORCED by a one-row up-front check — inherent to the packing, an
    * arbitrary edge list must fail loudly instead of truncating silently.
    * The DEGREE bound (degree+1 < 2²⁰) is a dispatch boundary, not a
    * failure: this auto arm runs every-neighbor voting below it (the q169
    * oracle plan — the near-dup graph sits here by construction) and the
    * BOUNDED-vote sample above it (deterministic, suite-gated, NOT
    * SQL-oracle-paired — sampled votes can differ from every-neighbor
    * LPA). A caller that must never silently switch to sampled votes
    * forces `arm = "exact"`, which still refuses loudly past the bound.
    */
  def lpaFromEdges(edgesIn: DataFrame, rounds: Int): DataFrame =
    lpaFromEdges(edgesIn, rounds, "auto")

  /** The bounded-vote sampling key: a two-round multiply-xor-shift over
    * the house string fold of "src:dst", in [0, 2³²). Each round
    * multiplies by an odd ~2²⁰ constant mod 2³² (bijective, and the
    * product of a < 2³² value by a < 2²⁰ multiplier stays < 2⁵² — no
    * 64-bit overflow in either engine's BIGINT) and xors in the high
    * halfword, so residue-class structure in the ids cannot survive into
    * the threshold compare. Keyed on the PAIR so each hub draws its own
    * sample (a dst-only key would hand every hub the same globally-low
    * neighbors). Every step is plain BIGINT arithmetic both engines
    * share, so the q181 DuckDB oracle mirrors it token-for-token via
    * `javaHashSql`.
    */
  private[operators] def voteSampleHash(src: Column, dst: Column): Column = {
    def mix(v: Column, mult: Long): Column = {
      val m = pmod(v * lit(mult), lit(4294967296L))
      m.bitwiseXOR(shiftright(m, 16))
    }
    val u = pmod(graft.functions.GeoFunctions.javaHash(
      concat_ws(":", src.cast("string"), dst.cast("string"))).cast("long"),
      lit(4294967296L))
    mix(mix(u, 1000003L), 999983L)
  }

  /** As [[lpaFromEdges]]; `arm` forces the vote plan (the q146
    * orientation pattern, so BOTH arms stay testable, not just the one
    * the dispatch picks):
    *  - `exact` — every neighbor votes (the q169 oracle plan). The packed
    *    vote key holds (count, label) in (24, 40) bits, so this arm
    *    REQUIRES max degree + 1 < 2²⁰ — loud, never silently truncated.
    *  - `bounded` — each node takes votes from a deterministic
    *    ≤ `maxVotes`-neighbor sample (min-`maxVotes` by the injective-LCG
    *    hash, the q160 sketch pick), so vote counts are bounded by
    *    maxVotes + 1 regardless of hub degree and ANY graph runs. The
    *    sample is drawn once (the vote topology is fixed across rounds)
    *    behind a degree-proportional hash threshold — `collect_list`
    *    state is ~4·maxVotes rows in expectation even on a 10⁹-degree
    *    hub, never the full adjacency — then sliced to exactly the
    *    maxVotes smallest. Below maxVotes degree the sample IS the full
    *    neighbor set, so bounded ≡ exact there (OperatorSpec-asserted).
    *  - `auto` — exact below the degree bound, bounded above it (one
    *    bounded 1-row collect, the q117 dispatch shape).
    * Both arms still require ids in [0, 2⁴⁰) — that bound is inherent to
    * the packing, not to the vote plan.
    */
  def lpaFromEdges(edgesIn: DataFrame, rounds: Int, arm: String,
      maxVotes: Int = 64): DataFrame = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    require(Set("auto", "exact", "bounded")(arm), s"unknown arm $arm")
    require(maxVotes >= 1 && maxVotes + 2 < (1L << 20),
      s"need 1 <= maxVotes and maxVotes + 2 < 2^20, got $maxVotes")
    val edges = edgesIn.select("doc_a", "doc_b")
    val sym = edges.union(edges.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst").localCheckpoint()
    // field-bound check up front (one bounded 1-row collect). Aggregates
    // over an empty edge list yield nulls — coalesce before comparing
    // (round-7 ADVICE).
    val b = sym.groupBy("src").agg(count(lit(1)).as("deg"))
      .agg(coalesce(max("deg"), lit(0L)).as("maxd"),
        coalesce(max("src"), lit(0L)).as("maxid"),
        coalesce(min("src"), lit(0L)).as("minid")).collect()(0)
    require(b.getLong(1) < (1L << 40) && b.getLong(2) >= 0L,
      s"lpaFromEdges packed key needs ids in [0, 2^40); got id range " +
        s"[${b.getLong(2)}, ${b.getLong(1)}]")
    val exactSafe = b.getLong(0) + 1 < (1L << 20)
    val useExact = arm match {
      case "exact" =>
        require(exactSafe, s"lpaFromEdges exact arm needs degree+1 < 2^20; " +
          s"got max degree ${b.getLong(0)} — use the bounded arm")
        true
      case "bounded" => false
      case _ => exactSafe
    }
    val adj =
      if (useExact) sym
      else {
        // degree-proportional hash threshold: expected ~4·maxVotes
        // survivors per src (P[fewer than maxVotes] ≤ e^(−9·maxVotes/8),
        // Chernoff), then exact min-maxVotes by (hash, dst) — bounded
        // state, deterministic. deg ≤ 4·maxVotes keeps every neighbor,
        // which is what makes bounded ≡ exact below the sample size.
        // The sampling key is [[voteSampleHash]] over (src, dst) — NOT
        // the affine LCG (constant on id classes mod 2³¹: a hub whose
        // neighbor ids share a residue would land entirely on one side
        // of the threshold — full-adjacency state or zero votes), and
        // NOT a dst-only hash (every hub would sample the same
        // globally-low-hash neighbors, correlating the vote topology
        // across all nodes and over-weighting those neighbors' labels —
        // round-9 ADVICE). Keying on the pair decorrelates per node and
        // stays SQL-expressible, so the bounded arm is DuckDB
        // oracle-paired (q181) like every other arm in the house.
        graft.functions.JavaHashExpr.register(edgesIn.sparkSession)
        val h = voteSampleHash(col("src"), col("dst"))
        val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
        sym.join(deg, Seq("src"))
          .filter(col("deg") <= 4L * maxVotes ||
            h < expr(s"${4L * maxVotes * 4294967296L} div deg"))
          .select(col("src"),
            struct(h.as("h"), col("dst").as("dst")).as("hd"))
          .groupBy("src")
          .agg(expr(s"transform(slice(array_sort(collect_list(hd)), 1, " +
            s"$maxVotes), x -> x.dst)").as("ns"))
          .select(col("src"), explode(col("ns")).as("dst"))
          .localCheckpoint()
      }
    var labels = sym.select(col("src").as("doc_id")).distinct()
      .withColumn("community", col("doc_id")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val votes = adj
        .join(labels.select(col("doc_id").as("dst"), col("community").as("nl")),
          Seq("dst"))
        .select(col("src"), col("nl"))
        .unionByName(labels.select(col("doc_id").as("src"),
          col("community").as("nl")))
      labels = votes.groupBy("src", "nl").agg(count(lit(1)).as("c"))
        .groupBy(col("src").as("doc_id"))
        .agg(expr("""CAST(min((1048576 - c) * 1099511627776 + nl)
          % 1099511627776 AS BIGINT)""").as("community"))
        .localCheckpoint()
    }
    labels
  }

  /** [[lpaFromEdges]] over the verified near-dup candidate graph. */
  def lpaCommunities(docs: DataFrame, minEst: Double, rounds: Int): DataFrame =
    lpaFromEdges(lshCandidatePairs(docs, minEst).select("doc_a", "doc_b"),
      rounds)

  /** LSH (bands × rows) PARAMETER TUNER, weighted by the corpus's OWN
    * positive-pair similarity distribution — the MMDS §3.4 S-curve
    * P(candidate) = 1 − (1 − J^r)^b evaluated not on a uniform similarity
    * prior but on the EXACT set of pairs the banding must recall: every
    * pair with shingle-Jaccard ≥ t, enumerated losslessly by
    * [[ppjoinPairs]] (zero recall loss by the prefix-filter theorem), so
    * the expected-recall column is an unbiased corpus-specific number, not
    * a curve sketch. Complements q139 (empirical agreement-vs-Jaccard on
    * the CAPPED candidate population) with the analytic recall each
    * (b, r) split of the NumHashes-minhash signature would achieve —
    * including the worst single pair (the one most likely missed) and the
    * split's analytic balance point s50 = (1/b)^(1/r).
    *
    * Scale shape: q147's exchanges produce the positive pairs; the grid
    * fan-out is a row-local explode of a 4-element literal (no join); the
    * result is one keyed aggregate over exactly 4 groups. Double math
    * (power/round) is mirrored token-for-token in the oracle.
    */
  def lshParamTuner(docs: DataFrame, tMicro: Long): DataFrame = {
    val splits = (0 to 3).map(i => (1 << i, NumHashes >> i)) // b·r = 8
    val grid = typedlit(splits.map { case (b, r) => (b, r) })
    ppjoinPairs(docs, tMicro)
      .select(col("jacc_micro"), explode(grid).as("g"))
      .select(col("g._1").as("bands"), col("g._2").as("rows_per_band"),
        col("jacc_micro"),
        expr("""CAST(round(round(
          1 - power(1 - power(jacc_micro / 1000000.0, CAST(g._2 AS DOUBLE)),
                    CAST(g._1 AS DOUBLE)), 6) * 1000000.0, 0) AS BIGINT)""")
          .as("p_micro"))
      .groupBy("bands", "rows_per_band")
      .agg(count(lit(1)).as("n_true_pairs"),
        expr("sum(p_micro) div count(1)").as("exp_recall_micro"),
        min(col("p_micro")).as("worst_pair_micro"))
      .withColumn("s50_micro",
        expr("""CAST(round(round(power(1.0 / bands, 1.0 / rows_per_band), 6)
          * 1000000.0, 0) AS BIGINT)"""))
  }
}
