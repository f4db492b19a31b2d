package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus hygiene operators beyond the reference's map scope:
  * benchmark decontamination, repetition-based quality signals, and
  * temperature-scaled domain mixing. All are shuffle-lean formulations of
  * the standard LLM data-pipeline passes.
  *
  * Tokenization matches the repo-wide convention (whitespace split of the
  * trimmed text, q20/q52) so every operator shares one token definition.
  */
object Corpus {

  /** Whitespace tokens of `text`; empty text → empty array (not [""]). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Word n-grams as ONE JIT-compiled pass over the token array — the
    * `transform(sequence, i -> array_join(slice(...)))` HOF formulation
    * evaluates interpreted per element with an O(n) slice per gram
    * (measured ~3× slower on this path, the repo-wide HOF-vs-JIT pattern).
    * Output values are identical, so the DuckDB list-comprehension oracles
    * are unchanged. `distinct` = first-occurrence order, matching
    * array_distinct / list_distinct.
    */
  private def ngramUdf(n: Int, distinct: Boolean) = udf { (toks: Seq[String]) =>
    if (toks == null || toks.length < n) Array.empty[String]
    else {
      val out = new scala.collection.mutable.ArrayBuffer[String](toks.length - n + 1)
      val seen = if (distinct) scala.collection.mutable.HashSet.empty[String] else null
      val arr = toks.toArray
      var i = 0
      while (i <= arr.length - n) {
        val sb = new java.lang.StringBuilder(arr(i))
        var j = 1
        while (j < n) { sb.append(' ').append(arr(i + j)); j += 1 }
        val g = sb.toString
        if (seen == null || seen.add(g)) out += g
        i += 1
      }
      out.toArray
    }
  }

  /** Distinct word n-grams of `toksCol` (a token-array column), space-joined. */
  def distinctNgrams(toksCol: String, n: Int): Column =
    ngramUdf(n, distinct = true)(col(toksCol))

  /** All word n-grams (with repeats) of `toksCol`, space-joined. */
  def allNgrams(toksCol: String, n: Int): Column =
    ngramUdf(n, distinct = false)(col(toksCol))

  /** Benchmark decontamination: for every corpus doc (not in the eval
    * source), the count and fraction of its distinct word `n`-grams that
    * also appear in ANY eval-source doc.
    *
    * Scale shape: the eval set is tiny relative to the corpus (a benchmark,
    * not the crawl), so its distinct-gram set is collected into a broadcast
    * and the corpus side is a broadcast LEFT SEMI join — the 100 TB corpus
    * never shuffles; the only wide op is the per-doc count, which re-uses
    * the gram explode's partitioning via partial aggregation.
    */
  def decontaminate(docs: DataFrame, evalSource: String, n: Int,
      threshold: Double): DataFrame = {
    val withG = docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("grams", distinctNgrams("toks", n))
    val evalGrams = withG.filter(col("source") === evalSource)
      .select(explode(col("grams")).as("gram")).distinct()
    val corpus = withG.filter(col("source") =!= evalSource)
    val shared = corpus
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    corpus
      .select(col("doc_id"), col("source"), size(col("grams")).as("n_grams"))
      .join(shared, Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("overlap",
        col("n_shared").cast("double") / greatest(col("n_grams"), lit(1)))
      .withColumn("contaminated", (col("overlap") >= threshold).cast("int"))
  }

  /** Gopher-style repetition signals per document: duplicate-word fraction,
    * top-single-word fraction, top-bigram fraction. Empty docs are dropped
    * (no denominator).
    *
    * Scale shape: one explode + two keyed aggregations, all partitioned by
    * doc_id — partial aggregation collapses each doc's words map-side, so
    * the shuffle carries (doc, word) counts, not raw tokens.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val base = docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("bgs", allNgrams("toks", 2))
      .filter(size(col("toks")) > 0)
    val words = base.select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_words"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_word"))
    val bigrams = base.select(col("doc_id"), explode(col("bgs")).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_bigram"))
    words.join(bigrams, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_words"),
        ((col("n_words") - col("n_distinct")).cast("double") / col("n_words"))
          .as("dup_word_frac"),
        (col("top_word").cast("double") / col("n_words")).as("top_word_frac"),
        (coalesce(col("top_bigram"), lit(0L)).cast("double") /
          greatest(col("n_words") - 1, lit(1))).as("top_bigram_frac"))
  }

  /** The q50/q51 LCG id hash — deterministic, engine-portable sampling key. */
  def lcg(id: Column): Column = (id * 1103515245L + 12345L) % 2147483648L

  /** Temperature-scaled domain mixing: each source keeps
    * `min(count, ceil(sqrt(count) * boost))` docs — the alpha=0.5 sampling
    * temperature that up-weights small domains relative to proportional
    * sampling. Doc selection is the lowest LCG hashes (deterministic), via a
    * per-source window.
    *
    * Scale shape: per-source keep-counts come from a tiny aggregate (bounded
    * by #domains) broadcast back; the pick is a window partitioned BY SOURCE
    * — the natural parallel unit, never global. The formula is per-source
    * (no cross-source normalization), so no order-dependent double sum
    * exists anywhere.
    */
  def temperatureMix(docs: DataFrame, boost: Double): DataFrame = {
    val keep = docs.groupBy("source").agg(count(lit(1)).as("c"))
      .select(col("source"),
        least(col("c"), ceil(sqrt(col("c").cast("double")) * boost).cast("long"))
          .as("n_keep"))
    val w = Window.partitionBy("source")
      .orderBy(lcg(col("doc_id")).asc, col("doc_id").asc)
    docs.join(broadcast(keep), Seq("source"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n_keep"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
  }

  /** TF-IDF top-`k` terms per source: term frequency within the source,
    * inverse document frequency over the whole corpus,
    * `score = tf * ln(N / df)` rounded to 6 places (ln is the one
    * non-portable float op). Deterministic tiebreak (score desc, term asc).
    *
    * Scale shape: two aggregations over the exploded words (both keyed, both
    * partially aggregated map-side), a broadcast of the corpus size scalar,
    * and a top-k window partitioned by source. The df table is |vocab|-sized
    * — the join keeps (source, word) keyed so AQE can pick the join side.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    val base = docs.withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) > 0)
    val words = base.select(col("doc_id"), col("source"),
      explode(col("toks")).as("w"))
    val df_ = words.select("doc_id", "w").distinct()
      .groupBy("w").agg(count(lit(1)).as("df"))
    val n = base.select(countDistinct(col("doc_id")).as("n_docs"))
    val tf = words.groupBy("source", "w").agg(count(lit(1)).as("tf"))
    val scored = tf.join(df_, Seq("w")).crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w6 = Window.partitionBy("source")
      .orderBy(col("score").desc, col("w").asc)
    scored.withColumn("rn", row_number().over(w6))
      .filter(col("rn") <= k)
      .select("source", "w", "tf", "df", "score", "rn")
  }

  /** Context-window chunking: each document becomes overlapping token-span
    * chunks of `window` tokens advancing by `stride` (< window ⇒ overlap of
    * window−stride tokens, the standard LM packing prelude). Emits pure
    * span arithmetic (start/end token offsets) — deterministic in any
    * engine; materializing chunk text is a trailing `slice` on the token
    * array, row-local.
    *
    * Scale shape: one generator explode per doc with ≤ ⌈n/stride⌉ rows —
    * no shuffle at all; chunking is embarrassingly row-parallel.
    */
  def chunkSpans(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(0 < stride && stride <= window, "need 0 < stride <= window")
    docs
      .withColumn("n_tokens", size(tokens(col("text"))))
      .filter(col("n_tokens") > 0)
      .withColumn("tok_start",
        explode(sequence(lit(0), col("n_tokens") - 1, lit(stride))))
      .select(
        col("doc_id"),
        (col("tok_start") / stride).cast("long").as("chunk_idx"),
        col("tok_start").cast("long"),
        least(col("tok_start") + window, col("n_tokens")).cast("long")
          .as("tok_end"),
        (least(col("tok_start") + window, col("n_tokens")) - col("tok_start"))
          .cast("long").as("n_chunk_tokens"))
  }

  /** Regex redaction (the PII-scrub shape): every match of `pattern` is
    * replaced by `mask`; emits per-doc hit counts and the scrubbed length.
    * The pattern must stay in the Java∩RE2 common regex subset (no
    * backrefs/lookaround) so one pattern text runs identically in Spark and
    * any RE2-based engine.
    *
    * Scale shape: row-local regex, no shuffle — the cost model is regex
    * engine throughput, which is why the scrub runs ONCE per doc emitting
    * both count and replacement from the same pattern.
    */
  def regexScrub(docs: DataFrame, pattern: String, mask: String): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(pattern)).cast("long").as("n_hits"),
      length(regexp_replace(col("text"), pattern, mask)).cast("long")
        .as("scrubbed_len"))

  /** Exact discrete quantiles of the per-doc token count, per source: the
    * value at 1-based rank ⌈p·n⌉ of the counts sorted ascending — the
    * rank formula shared verbatim with the oracle (interpolating
    * `percentile_cont` definitions differ subtly between engines; the
    * discrete rank statistic is bit-exact everywhere).
    *
    * Scale shape: the window is partitioned by source (the natural parallel
    * unit). For sources too large to sort in one task, the same statistic
    * decomposes into a two-pass count-then-select over a token-count
    * histogram (token counts are small ints); this formulation keeps the
    * single-pass shape the test scale wants.
    */
  def tokenQuantilesDisc(docs: DataFrame, ps: Seq[Double]): DataFrame = {
    val tk = docs.select(col("doc_id"), col("source"),
      size(tokens(col("text"))).as("n_tokens"))
    val w = Window.partitionBy("source").orderBy(col("n_tokens"), col("doc_id"))
    val whole = Window.partitionBy("source")
    val ranked = tk
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(whole))
    val aggs = ps.map { p =>
      max(when(col("rn") === ceil(lit(p) * col("n")), col("n_tokens")))
        .cast("long").as(s"p${(p * 100).round}")
    }
    ranked.groupBy("source").agg(aggs.head, aggs.tail: _*)
  }
}
