package graft.operators.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplication and the PPJoin exact-threshold Jaccard join —
  * the similarity-join family of [[graft.operators.Dedup]] (round-11
  * split). Self-type: SimHash calibration scores its recall against
  * [[DedupMinHash.lshCandidatePairs]]'s estimates.
  */
private[graft] trait DedupJoins extends Serializable { this: DedupMinHash =>

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
    // fp and sets each feed BOTH sides of their verify joins — persisted
    // (round 12) so the simhash and shingle UDFs run once over the corpus,
    // not once per join side; output is the ≤ 33×11-cell matrix
    graft.core.Lifecycle.withPersisted(fp, sets) {
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
  }
}
