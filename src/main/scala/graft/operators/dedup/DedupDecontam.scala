package graft.operators.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination, substring arm — the verbatim-leakage report,
  * the span cut, and the eval-gram helpers the streaming tripwire shares.
  * Family of [[graft.operators.Dedup]] (round-11 split). Self-type: rides
  * [[DedupSubstr]]'s window-gram and splice cores.
  */
private[graft] trait DedupDecontam extends Serializable { this: DedupSubstr =>

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
}
