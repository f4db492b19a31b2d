package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `embedding: array<float>` column.
  *
  * Scale design: brute-force cosine is the correctness baseline (a single
  * broadcast of the query vector, no shuffle, scan-bounded). The scale path
  * is random-hyperplane LSH: each vector is assigned a deterministic bucket
  * by the sign pattern of 8 fixed integer hyperplanes, so a top-k probe only
  * scans its bucket (1/256 of rows in expectation) — the bucket id is also a
  * natural partition/bucketing key for a 100 TB vector table. Cosine pair
  * search for near-dup detection joins bucket-local only at scale; the full
  * pairwise variant exists for oracle-checkable small-scale verification.
  *
  * All dot products fold left-sequentially over the array so results are
  * bit-reproducible across engines.
  */
object Similarity {

  /** Vector kernels as JIT-compiled UDFs, NOT `aggregate`/`zip_with` HOFs:
    * Catalyst evaluates higher-order lambdas interpreted per element
    * (measured ~10× slower for these loops). Every kernel accumulates in
    * ascending index order, exactly the left-fold the DuckDB oracles
    * mirror with list_reduce — results are bit-identical.
    */
  // Null/length semantics match the Catalyst HOF formulations these
  // replaced: a null array — or a length mismatch, which zip_with would
  // null-pad into a null sum — yields null, never an exception.
  def dotLit(emb: Column, v: Seq[Double]): Column = {
    val vv = v.toArray
    udf { (a: Seq[Float]) =>
      if (a == null || a.length != vv.length) null
      else {
        var d = 0.0; var i = 0
        while (i < vv.length) { d += a(i).toDouble * vv(i); i += 1 }
        d
      }: java.lang.Double
    }.apply(emb)
  }

  private val dotUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
    if (a == null || b == null || a.length != b.length) null
    else {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
      d
    }: java.lang.Double
  }

  /** Pairwise dot product — the native codegen Expression
    * ([[graft.functions.DotProductExpr]]) when a session is active (stays
    * inside WholeStageCodegen, no per-row Seq[Float] boxing), the JIT UDF
    * as the sessionless fallback; both accumulate ascending, bit-identical.
    */
  def dotCols(a: Column, b: Column): Column = {
    val ss = org.apache.spark.sql.SparkSession
    (ss.getActiveSession.toSeq ++ ss.getDefaultSession.toSeq)
      .distinct.foreach(graft.functions.DotProductExpr.register)
    if (ss.getActiveSession.isEmpty && ss.getDefaultSession.isEmpty) dotUdf(a, b)
    else call_function(graft.functions.DotProductExpr.name, a, b)
  }

  private val sqNormUdf = udf { (a: Seq[Float]) =>
    if (a == null) null
    else {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * a(i).toDouble; i += 1 }
      d
    }: java.lang.Double
  }

  def sqNorm(emb: Column): Column = sqNormUdf(emb)

  /** Brute-force cosine top-k against a literal query vector; the rounded
    * similarity is the sort key (with id tiebreak) for determinism.
    */
  def cosineTopK(emb: DataFrame, qv: Seq[Float], k: Int): DataFrame = {
    val sqQ = qv.foldLeft(0.0)((a, b) => a + b.toDouble * b.toDouble)
    val dot = dotLit(col("embedding"), qv.map(_.toDouble))
    val sim = round(dot / (sqrt(sqNorm(col("embedding"))) * lit(math.sqrt(sqQ))), 6)
    emb.select(col("vec_id"), col("label"), sim.as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(k)
  }

  /** Vector pairs with cosine ≥ minSim, restricted to equal LSH buckets —
    * the scale-honest near-dup search: the pair join is an equi-join on the
    * bucket key (1/2^NumPlanes of the cross product in expectation) and each
    * vector's norm is computed once before the join, so per-pair work is a
    * single dot product.
    */
  def cosinePairs(emb: DataFrame, minSim: Double): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"),
      bucketCol(col("embedding")).as("bucket"),
      sqrt(sqNorm(col("embedding"))).as("nrm"))
    val sim = round(
      dotCols(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")), 6)
    e.as("a")
      .join(e.as("b"), col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), sim.as("sim"))
      .filter(col("sim") >= minSim)
  }

  // ------------------------------------------------ random-hyperplane LSH

  val NumPlanes = 8
  val Dim = 64

  /** Deterministic integer hyperplanes: hp(d)(i) = ((d*67 + i*31) % 19) - 9. */
  def hyperplane(d: Int): Seq[Double] =
    (0 until Dim).map(i => (((d * 67 + i * 31) % 19) - 9).toDouble)

  /** Sign-pattern bucket id (0..2^NumPlanes-1) of an embedding column.
    *
    * A JIT-compiled UDF, not higher-order-function folds: Catalyst evaluates
    * `aggregate`/`zip_with` lambdas interpreted per element (measured ~10×
    * slower for hashing-style loops). The loop accumulates in the same
    * ascending-index order as the fold, so results are bit-identical to the
    * HOF formulation and to the oracle's list_reduce mirror.
    */
  private val bucketUdf = udf { (emb: Seq[Float]) =>
    if (emb == null || emb.length < Dim) null
    else {
      var bucket = 0L
      var d = 0
      while (d < NumPlanes) {
        var dot = 0.0
        var i = 0
        while (i < Dim) {
          dot += emb(i).toDouble * (((d * 67 + i * 31) % 19) - 9).toDouble
          i += 1
        }
        if (dot > 0.0) bucket |= 1L << d
        d += 1
      }
      bucket
    }: java.lang.Long
  }

  def bucketCol(emb: Column): Column = bucketUdf(emb)

  /** Same bucket function driver-side, for the query vector. */
  def bucketOf(v: Seq[Float]): Long =
    (0 until NumPlanes).foldLeft(0L) { (acc, d) =>
      val hp = hyperplane(d)
      val dot = v.zipWithIndex.foldLeft(0.0) { case (a, (x, i)) => a + x.toDouble * hp(i) }
      if (dot > 0.0) acc + (1L << d) else acc
    }

  /** Symmetric int8 quantization of an embedding: scale = 127/max|x|,
    * q_i = floor(x_i·scale + 0.5) — the storage/serving-side compression
    * every large ANN index applies before sharding. Emits the per-vector
    * scale and an index-weighted checksum of the quantized values (order-
    * sensitive, integer-exact) instead of 64 columns. All arithmetic is the
    * same IEEE sequence the oracle's list comprehension runs.
    */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val mx = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    val qsum = udf { (a: Seq[Float], m: java.lang.Double) =>
      if (a == null || m == null) null
      else if (m == 0.0) java.lang.Long.valueOf(0L)
      else {
        val scale = 127.0 / m
        var s = 0L; var i = 0
        while (i < a.length) {
          s += math.floor(a(i).toDouble * scale + 0.5).toLong * (i + 1); i += 1
        }
        java.lang.Long.valueOf(s)
      }
    }
    emb.select(col("vec_id"),
      round(when(mx === 0.0, 0.0).otherwise(lit(127.0) / mx), 6).as("scale"),
      qsum(col("embedding"), mx).as("qsum"))
  }

  // ------------------------------------------------------------- IVF ANN

  val IvfK = 16

  /** Deterministic coarse quantizer: the embeddings of vec_id 0..IvfK-1 act
    * as centroids (production IVF trains k-means offline and ships the
    * codebook; the engine mechanics — assign to nearest centroid, partition
    * by cell, probe few cells — are identical, and a fixed sampled codebook
    * keeps the oracle reproducible).
    */
  def ivfCentroids(emb: DataFrame): Array[Array[Double]] =
    emb.filter(col("vec_id") < IvfK).orderBy("vec_id").select("embedding")
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** Squared L2 to each centroid, accumulated in ascending index order so
    * the oracle's list_reduce fold is bit-identical; argmin with lowest-id
    * tiebreak.
    */
  private[graft] def nearestCells(v: IndexedSeq[Double], cents: Array[Array[Double]], n: Int): Seq[Int] =
    cents.indices.map { c =>
      var d = 0.0; var i = 0
      val ct = cents(c)
      while (i < ct.length) { val t = v(i) - ct(i); d += t * t; i += 1 }
      (d, c)
    }.sorted.take(n).map(_._2)

  /** Cell-id column via a JIT UDF over the broadcast codebook. */
  def ivfCellCol(spark: org.apache.spark.sql.SparkSession,
      cents: Array[Array[Double]]): Column =
    ivfCellOn(spark, cents, col("embedding"))

  /** [[ivfCellCol]] over an arbitrary embedding column (renamed sides —
    * e.g. the decontam family's `ev_emb`). Strict `<` keeps the FIRST
    * (lowest-id) centroid on a distance tie — the [[nearestCells]] order.
    */
  def ivfCellOn(spark: org.apache.spark.sql.SparkSession,
      cents: Array[Array[Double]], embCol: Column): Column =
    ivfCellUdf(spark.sparkContext.broadcast(cents)).apply(embCol)

  /** The cell-argmin UDF over an ALREADY-broadcast codebook — callers that
    * need the codebook in several UDFs (the decontam family's eval-cell +
    * train-probe pair) share one broadcast variable. */
  private def ivfCellUdf(
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]) =
    udf { (emb: Seq[Float]) =>
      if (emb == null) null
      else {
        val v = emb.map(_.toDouble).toIndexedSeq
        val cs = bc.value
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          var d = 0.0; var i = 0
          while (i < cs(c).length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }: Integer
    }

  /** IVF ANN: top-k by cosine scanning only the `nprobe` cells nearest the
    * query — the classic inverted-file scale path (cell is the natural
    * partition/bucketing key for a 100 TB vector table; nprobe trades recall
    * for scan fraction, here 2/16 of the data in expectation).
    */
  def ivfTopK(emb: DataFrame, qv: Seq[Float], k: Int, nprobe: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    val cents = ivfCentroids(emb)
    val probes = nearestCells(qv.map(_.toDouble).toIndexedSeq, cents, nprobe)
    val sqQ = qv.foldLeft(0.0)((a, b) => a + b.toDouble * b.toDouble)
    val dot = dotLit(col("embedding"), qv.map(_.toDouble))
    val sim = round(dot / (sqrt(sqNorm(col("embedding"))) * lit(math.sqrt(sqQ))), 6)
    emb.withColumn("cell", ivfCellCol(spark, cents))
      .filter(col("cell").isin(probes: _*))
      .select(col("vec_id"), col("label"), col("cell"), sim.as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(k)
  }

  /** Semantic dedup (the SemDeDup shape): assign every vector to its
    * k-means cell (the IVF codebook — broadcast, row-local), then drop any
    * vector whose cell contains an EARLIER-id vector with cosine ≥ `minSim`.
    * Emits per-cell evidence: totals, survivors, and an integer checksum of
    * the kept ids (all integer-exact; the only float op is the rounded
    * per-pair cosine, the q32-proven kernel).
    *
    * Scale shape: the pairwise comparison is confined to one cell — the
    * exact design of embedding-cluster dedup at corpus scale (cells are the
    * partition key; per-cell work is |cell|², bounded by clustering
    * granularity, never the corpus cross product). Norms are computed once
    * before the self-join, so per-pair work is a single codegen dot product.
    */
  def semanticDedup(emb: DataFrame, minSim: Double): DataFrame = {
    val spark = emb.sparkSession
    val cents = ivfCentroids(emb)
    val e = emb.select(col("vec_id"), col("embedding"),
      ivfCellCol(spark, cents).as("cell"),
      sqrt(sqNorm(col("embedding"))).as("nrm"))
    val sim = round(
      dotCols(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")), 6)
    val dropped = e.as("a")
      .join(e.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("b.cell").as("cell"), col("b.vec_id").as("vec_id"), sim.as("sim"))
      .filter(col("sim") >= minSim)
      .select("cell", "vec_id").distinct()
    e.select("cell", "vec_id")
      .join(dropped.withColumn("is_dup", lit(1)), Seq("cell", "vec_id"), "left")
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("is_dup").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("is_dup").isNull, col("vec_id"))).as("kept_sum"))
      .withColumn("n_dropped", col("n_vecs") - col("n_kept"))
  }

  /** Hard-negative mining for contrastive training: for every anchor
    * vector, the highest-cosine vector with a DIFFERENT label inside the
    * anchor's LSH bucket (the "hard" negative — semantically close, labeled
    * apart). Deterministic pick: sim desc, candidate id asc.
    *
    * Scale shape: the anchor↔candidate pairing is an equi-join on the
    * bucket key (never the cross product — anchors at training scale are
    * the whole corpus), norms precompute before the join, and the argmax
    * is a window PARTITIONED BY ANCHOR — embarrassingly parallel.
    */
  def hardNegatives(emb: DataFrame): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"), col("embedding"),
      bucketCol(col("embedding")).as("bucket"),
      sqrt(sqNorm(col("embedding"))).as("nrm"))
    val sim = round(
      dotCols(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")), 6)
    val pairs = e.as("a")
      .join(e.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id") &&
          col("a.label") =!= col("b.label"))
      .select(col("a.vec_id").as("anchor_id"), col("a.label").as("anchor_label"),
        col("b.vec_id").as("neg_id"), col("b.label").as("neg_label"),
        sim.as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("anchor_id").orderBy(col("sim").desc, col("neg_id").asc)
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** One Lloyd (k-means) iteration over the IVF codebook — the training step
    * production IVF runs offline to produce the coarse quantizer the serving
    * path (ivfTopK) probes. Assignment is the same JIT nearest-centroid
    * kernel as serving; the per-cell update is emitted as INTEGER evidence:
    * vector dims quantized to thousandths (floor(x·1000 + 0.5)), then
    * per-cell count + plain and index-weighted sums. Integer sums are
    * commutative-exact, so the output is independent of row order and
    * engine — the usual mean-of-doubles would be order-dependent across
    * partitions. The new centroid for a cell is (per-dim sum)/1000/n; the
    * emitted mean_w pins that arithmetic via one exact division.
    *
    * Scale shape: one broadcast codebook, one row-local kernel pass, one
    * groupBy over IvfK cells with map-side partial aggregation — the
    * canonical distributed-Lloyd round at any corpus size.
    */
  def kmeansStep(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    val cents = ivfCentroids(emb)
    val qsums = udf { (a: Seq[Float]) =>
      if (a == null) null
      else {
        var s1 = 0L; var sw = 0L; var i = 0
        while (i < a.length) {
          val q = math.floor(a(i).toDouble * 1000.0 + 0.5).toLong
          s1 += q; sw += q * (i + 1); i += 1
        }
        Array(s1, sw)
      }
    }
    emb.withColumn("cell", ivfCellCol(spark, cents))
      .withColumn("qs", qsums(col("embedding")))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"),
        sum(element_at(col("qs"), 1)).as("s1"),
        sum(element_at(col("qs"), 2)).as("sw"))
      .withColumn("mean_w", col("sw").cast("double") / (lit(1000.0) * col("n_vecs")))
  }

  /** LSH-bucketed ANN with multi-probe: top-k by cosine within the query's
    * bucket PLUS the NumPlanes buckets at Hamming distance 1 (one hyperplane
    * sign flipped). A query vector near a hyperplane otherwise loses its
    * true neighbours to the adjacent bucket — multi-probe restores that
    * recall for (NumPlanes+1)/2^NumPlanes of the scan (9/256 here), still
    * bucket-prunable at 100 TB since probes are an IN-list on the
    * bucket/partition key.
    */
  def lshTopK(emb: DataFrame, qv: Seq[Float], k: Int): DataFrame = {
    val sqQ = qv.foldLeft(0.0)((a, b) => a + b.toDouble * b.toDouble)
    val dot = dotLit(col("embedding"), qv.map(_.toDouble))
    val sim = round(dot / (sqrt(sqNorm(col("embedding"))) * lit(math.sqrt(sqQ))), 6)
    val qb = bucketOf(qv)
    val probes = qb +: (0 until NumPlanes).map(d => qb ^ (1L << d))
    emb.withColumn("bucket", bucketCol(col("embedding")))
      .filter(col("bucket").isin(probes: _*))
      .select(col("vec_id"), col("label"), col("bucket"), sim.as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(k)
  }

  // -------------------------------------------------- product quantization

  /** PQ geometry: PqM subspaces × PqK centroids each. A 64-dim float vector
    * compresses to PqM 4-bit-ish codes — the storage/scan side of the
    * IVF+PQ pairing (IVF routes the probe, PQ shrinks what a probe scans).
    */
  val PqM = 8
  val PqK = 16

  /** PQ codebook [m][k][dsub]: subspace m's centroids are the m-th slices
    * of the first PqK embeddings — deterministic, same sampled-codebook
    * convention (and rationale) as [[ivfCentroids]].
    */
  def pqCodebook(emb: DataFrame): Array[Array[Array[Double]]] = {
    val vs = emb.filter(col("vec_id") < PqK).orderBy("vec_id").select("embedding")
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(vs.length == PqK,
      s"PQ codebook needs embeddings with vec_id 0..${PqK - 1} present; got ${vs.length}")
    val dsub = vs(0).length / PqM
    Array.tabulate(PqM)(m => Array.tabulate(PqK)(k =>
      java.util.Arrays.copyOfRange(vs(k), m * dsub, (m + 1) * dsub)))
  }

  /** Squared L2 of `v`'s m-th slice to centroid `code`, ascending-index
    * accumulation (the oracle's list_reduce fold, bit-identical).
    */
  private def pqDist(v: Seq[Float], ct: Array[Double], m: Int): Double = {
    val dsub = ct.length
    var d = 0.0; var i = 0
    while (i < dsub) {
      val t = v(m * dsub + i).toDouble - ct(i); d += t * t; i += 1
    }
    d
  }

  /** PQ encode: per-vector code columns c0..c{PqM-1} (argmin squared-L2 per
    * subspace, strict < ⇒ lowest-code tiebreak).
    *
    * Scale shape: one broadcast codebook + one row-local JIT kernel — the
    * 100 TB vector table becomes a PqM-byte-per-row code table with no
    * shuffle at all; ADC queries then scan codes, never raw vectors.
    */
  def pqEncode(emb: DataFrame): DataFrame =
    pqEncodeWith(emb, pqCodebook(emb))

  /** [[pqEncode]] with a caller-supplied codebook — the IVF+PQ composition
    * encodes a cell-FILTERED corpus slice against the codebook trained on
    * the full table (at scale codes are pre-computed and stored; the
    * codebook never derives from a probe's slice).
    */
  def pqEncodeWith(emb: DataFrame, cb0: Array[Array[Array[Double]]]): DataFrame = {
    val spark = emb.sparkSession
    val bc = spark.sparkContext.broadcast(cb0)
    val codesUdf = udf { (a: Seq[Float]) =>
      if (a == null) null
      else {
        val cb = bc.value
        val out = new Array[Int](PqM)
        var m = 0
        while (m < PqM) {
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < PqK) {
            val d = pqDist(a, cb(m)(c), m)
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          out(m) = best; m += 1
        }
        out
      }
    }
    emb.withColumn("codes", codesUdf(col("embedding")))
      .select(col("vec_id") +: col("label") +:
        (0 until PqM).map(m => element_at(col("codes"), m + 1).as(s"c$m")): _*)
  }

  /** PQ ANN via asymmetric distance (ADC): the query's per-subspace
    * distance table is computed once driver-side; each encoded row's
    * approximate distance is PqM literal-array lookups summed left-to-right
    * — pure Column arithmetic inside codegen, no per-row kernel at query
    * time. Ascending-m summation matches the oracle's ordered-list fold.
    */
  def pqTopK(emb: DataFrame, qv: Seq[Float], k: Int): DataFrame = {
    val cb = pqCodebook(emb)
    val table = Array.tabulate(PqM)(m => Array.tabulate(PqK)(c => pqDist(qv, cb(m)(c), m)))
    val lookups = (0 until PqM).map(m =>
      element_at(array(table(m).map(lit): _*), col(s"c$m") + 1))
    pqEncode(emb)
      .select(col("vec_id"), col("label"),
        round(lookups.reduceLeft(_ + _), 6).as("adist"))
      .orderBy(col("adist").asc, col("vec_id")).limit(k)
  }

  /** IVF+PQ ANN — the COMPOSED index the two halves were built for (Jégou
    * et al., TPAMI 2011: coarse quantizer routes, product quantizer
    * scans): the query probes its `nprobe` nearest IVF cells, and within
    * the probed cells distance is the PQ ADC approximation over the stored
    * byte codes — raw vectors are touched by NEITHER the routing (cell ids
    * are precomputed) nor the scan (codes only).
    *
    * Scale shape: at 100 TB the code table is bucketed/partitioned by
    * cell, so the probe is partition pruning; the scanned bytes are
    * nprobe/K of the corpus × PqM bytes per row (here 8 bytes vs 256 — a
    * 32× scan-width cut on top of the 4/16 cell cut). The ADC lookups are
    * literal-array element_at's inside codegen — same kernel as [[pqTopK]]
    * (q77), same routing as [[ivfTopK]] (q60), composed.
    */
  def ivfPqTopK(emb: DataFrame, qv: Seq[Float], k: Int, nprobe: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    val cents = ivfCentroids(emb)
    val probes = nearestCells(qv.map(_.toDouble).toIndexedSeq, cents, nprobe)
    val cb = pqCodebook(emb)
    val table = Array.tabulate(PqM)(m =>
      Array.tabulate(PqK)(c => pqDist(qv, cb(m)(c), m)))
    val lookups = (0 until PqM).map(m =>
      element_at(array(table(m).map(lit): _*), col(s"c$m") + 1))
    pqEncodeWith(
        emb.withColumn("cell", ivfCellCol(spark, cents))
          .filter(col("cell").isin(probes: _*)),
        cb)
      .select(col("vec_id"), col("label"),
        round(lookups.reduceLeft(_ + _), 6).as("adist"))
      .orderBy(col("adist").asc, col("vec_id")).limit(k)
  }

  /** Cross-modal pair curation (the CLIP-style text↔embedding filter): a
    * pair survives when the TEXT side passes quality gates (word count,
    * alpha ratio — the q22 signals) AND the EMBEDDING side isn't
    * degenerate (max |component| bounded — the spikiness screen; norms are
    * unit here so a norm gate would be vacuous). Emits the surviving pairs
    * with both sides' scores.
    *
    * Scale shape: one equi-join on the shared id — at 100 TB both sides
    * are bucketed by id so the join is co-located; every gate is row-local
    * column math pushed below the join (each side filters BEFORE joining,
    * so the exchange carries survivors only). max over |components| is
    * order-independent, so float exactness needs no fold-order mirroring.
    */
  def pairCuration(docs: DataFrame, emb: DataFrame,
      minWords: Long = 12, minAlpha: Double = 0.82, maxComp: Double = 0.35): DataFrame = {
    val textSide = docs.select(
        col("doc_id"), col("source"),
        regexp_count(lower(col("text")), lit("[a-z]+")).as("n_words"),
        round(length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double")
          / length(col("text")), 6).as("alpha_ratio"))
      .filter(col("n_words") >= minWords && col("alpha_ratio") >= minAlpha)
    val embSide = emb.select(
        col("vec_id").as("doc_id"), col("label"),
        round(expr("array_max(transform(embedding, x -> abs(double(x))))"), 6)
          .as("max_comp"))
      .filter(col("max_comp") <= maxComp)
    textSide.join(embSide, Seq("doc_id"))
  }

  /** SEMANTIC decontamination — the embedding-space complement of the
    * verbatim q178 report: rephrased/translated benchmark leakage shares
    * no 40-char window but sits next to the eval point in embedding
    * space. Per train vector, the maximum cosine to ANY eval-source
    * vector and the eval id attaining it ((sim desc, eval_id asc) via the
    * q134 packed key — exact integer argmax, no rank window); consumers
    * threshold `max_sim_micro` to drop, or route hits through q178/q179
    * for span-level evidence. Eval membership = the documents table's
    * source label through the shared vec_id ↔ doc_id pairing (q134's
    * pairCuration convention).
    *
    * Scale shape: the eval side is benchmark-sized → broadcast; the
    * corpus-side fan-out is the q134 BroadcastNestedLoopJoin shape (the
    * optimal plan for all-pairs against a tiny broadcast side), each pair
    * one codegen dot product, and the per-vector argmax is one keyed min
    * with map-side combine — the corpus never shuffles more than its own
    * (vec_id, packed-key) rows.
    */
  def semanticDecontam(docs: DataFrame, emb: DataFrame,
      evalSource: String): DataFrame = {
    val (ev, train) = decontamSides(docs, emb, evalSource)
    bruteDecontamFrom(ev, train)
  }

  /** The brute arm over pre-built sides — shared with the q183 recall
    * sweep so sides (and their eager id-bound check job) build ONCE per
    * invocation. */
  private def bruteDecontamFrom(ev: DataFrame, train: DataFrame): DataFrame =
    train.crossJoin(broadcast(ev))
      .withColumn("dot", dotCols(col("embedding"), col("ev_emb")))
      // pk = (10⁶ − sim_micro)·2⁴⁰ + eval_id: ascending = (sim desc,
      // eval_id asc); sim ∈ [−1, 1] keeps the high field ≤ 2·10⁶ ≪ 2²³
      .select(col("vec_id"),
        ((lit(1000000L) - decontamSimMicro) * lit(1099511627776L)
          + col("eval_id")).as("pk"))
      .groupBy("vec_id").agg(min("pk").as("pk"))
      .select(col("vec_id"),
        expr("CAST(pk % 1099511627776 AS BIGINT)").as("nearest_eval_id"),
        expr("CAST(1000000 - pk div 1099511627776 AS BIGINT)")
          .as("max_sim_micro"))

  /** Shared eval/train sides of the semantic-decontam family: the eval
    * source's vectors (docs pairing) and the train remainder. Cosine is
    * undefined for zero vectors: both sides EXCLUDE them row-locally
    * (mirrored in the oracle) — unguarded, Spark's 0/0 NaN would CAST
    * silently to sim_micro 0 while DuckDB reads NULL, the
    * silent-divergence class this family's loud id-bound check exists to
    * prevent (a corpus-wide min-norm assert would cost a full eager pass;
    * the filter is free and the honest semantics). The packed-key field
    * bound (the keepLongest/q169 convention) is checked here: eval ids
    * must fit the low 40 bits — one bounded 1-row collect, loud on
    * violation rather than silently corrupting the argmax.
    */
  private def decontamSides(docs: DataFrame, emb: DataFrame,
      evalSource: String): (DataFrame, DataFrame) = {
    val evalIds = docs.filter(col("source") === evalSource)
      .select(col("doc_id").as("vec_id"))
    val ev = emb.join(evalIds, Seq("vec_id"))
      .select(col("vec_id").as("eval_id"), col("embedding").as("ev_emb"),
        sqrt(sqNorm(col("embedding"))).as("ev_nrm"))
      .filter(col("ev_nrm") > 0)
    val train = emb.join(evalIds, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("embedding"),
        sqrt(sqNorm(col("embedding"))).as("nrm"))
      .filter(col("nrm") > 0)
    val b = ev.agg(coalesce(max("eval_id"), lit(0L)).as("mx"),
      coalesce(min("eval_id"), lit(0L)).as("mn")).collect()(0)
    require(b.getLong(0) < (1L << 40) && b.getLong(1) >= 0L,
      s"semanticDecontam packed key needs eval ids in [0, 2^40); got " +
        s"[${b.getLong(1)}, ${b.getLong(0)}]")
    (ev, train)
  }

  /** The decontam family's shared pair score — identical tokens on the
    * brute and IVF-blocked arms so the full-probe identity holds
    * bit-for-bit.
    */
  private def decontamSimMicro: Column = expr("""CAST(round(
      round(dot / (nrm * ev_nrm), 6) * 1000000.0, 0) AS BIGINT)""")

  /** (vec_id, rnk, pk) pairs of the IVF-BLOCKED decontam family: each
    * train vector against exactly the eval vectors living in its ranked
    * probe cells. Eval vectors land in their nearest-centroid cell (the
    * deterministic q153 codebook — embeddings of vec_id < [[IvfK]]);
    * train probes rank 0..maxProbe−1 by ascending centroid distance with
    * lowest-id tiebreak ([[nearestCells]]' exact order). A pair appears
    * at most once: an eval vector has exactly ONE cell.
    *
    * Scale shape: cell is the join key — at benchmark scale the eval
    * side broadcasts (the brute op's convention); at multi-benchmark
    * scale both sides hash-partition by cell, so per-task work is
    * train-in-partition × eval-in-cell, never train × full-eval.
    */
  private def ivfDecontamPairs(spark: org.apache.spark.sql.SparkSession,
      cents: Array[Array[Double]], ev: DataFrame, train: DataFrame,
      maxProbe: Int): DataFrame = {
    // ONE broadcast of the codebook, shared by the eval-cell and
    // train-probe UDFs
    val bc = spark.sparkContext.broadcast(cents)
    val evc = ev.withColumn("cell", ivfCellUdf(bc)(col("ev_emb")))
    val probeUdf = udf { (e: Seq[Float]) =>
      nearestCells(e.map(_.toDouble).toIndexedSeq, bc.value, maxProbe)
    }
    train
      .select(col("vec_id"), col("embedding"), col("nrm"),
        posexplode(probeUdf(col("embedding"))).as(Seq("rnk", "cell")))
      .join(broadcast(evc), Seq("cell"))
      .withColumn("dot", dotCols(col("embedding"), col("ev_emb")))
      .select(col("vec_id"), col("rnk"),
        ((lit(1000000L) - decontamSimMicro) * lit(1099511627776L)
          + col("eval_id")).as("pk"))
  }

  /** IVF-blocked semantic decontamination — [[semanticDecontam]]'s scale
    * path for MULTI-benchmark eval sets. The brute op dots every train
    * vector against the FULL eval set: right when eval is one benchmark,
    * linear-degrading when eval unions many (10⁶+ rows). Here each train
    * vector probes only its `nprobe` nearest IVF cells and dots exactly
    * against the eval vectors inside them — expected eval-scan fraction
    * nprobe/[[IvfK]] per train vector. Same output contract as the brute
    * op; a vector whose probed cells hold no eval vector emits no row.
    * Recall is MEASURED, not assumed ([[ivfSemanticDecontamRecall]]);
    * nprobe = [[IvfK]] probes every cell and is the brute result exactly
    * (every (train, eval) pair present, identical score tokens —
    * OperatorSpec asserts it; the q155 full-probe-isolates-quantization
    * pattern, with no quantization axis here).
    */
  def ivfSemanticDecontam(docs: DataFrame, emb: DataFrame,
      evalSource: String, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= IvfK,
      s"nprobe must be in [1, $IvfK]; got $nprobe")
    val (ev, train) = decontamSides(docs, emb, evalSource)
    ivfDecontamPairs(emb.sparkSession, ivfCentroids(emb), ev, train, nprobe)
      .groupBy("vec_id").agg(min("pk").as("pk"))
      .select(col("vec_id"),
        expr("CAST(pk % 1099511627776 AS BIGINT)").as("nearest_eval_id"),
        expr("CAST(1000000 - pk div 1099511627776 AS BIGINT)")
          .as("max_sim_micro"))
  }

  /** Recall of the IVF-blocked decontam vs the brute ground truth, per
    * nprobe — the evidence row that licenses running [[ivfSemanticDecontam]]
    * at scale (the q155 recall-sweep pattern). Per nprobe: train count
    * (brute emits every usable train vector), vectors the IVF arm emitted
    * at all, vectors whose (argmax eval id, sim) EXACTLY match brute's
    * packed key, and recall in ppm. All-integer output — hash-stable.
    *
    * One pair scan serves every nprobe: a rank-`rnk` pair contributes to
    * all swept nprobes > rnk (row-local array filter + explode — no
    * non-equi join, so the suite-wide no-BNLJ plan guard holds), then one
    * keyed min per (nprobe, vec_id). The 1-row train count rides the
    * whitelisted scalar cross join.
    */
  def ivfSemanticDecontamRecall(docs: DataFrame, emb: DataFrame,
      evalSource: String, nprobes: Seq[Int]): DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(n => n >= 1 && n <= IvfK),
      s"nprobes must be in [1, $IvfK]; got $nprobes")
    // sides (and their eager id-bound check job) build ONCE and feed both
    // the IVF arm and the brute ground truth
    val (ev, train) = decontamSides(docs, emb, evalSource)
    val pairs = ivfDecontamPairs(emb.sparkSession, ivfCentroids(emb), ev,
      train, nprobes.max)
    val brute = bruteDecontamFrom(ev, train)
      .select(col("vec_id"),
        ((lit(1000000L) - col("max_sim_micro")) * lit(1099511627776L)
          + col("nearest_eval_id")).as("bpk"))
    val npArr = array(nprobes.sorted.map(lit): _*)
    val ivf = pairs
      .withColumn("nprobe", explode(filter(npArr, n => n > col("rnk"))))
      .groupBy("nprobe", "vec_id").agg(min("pk").as("pk"))
    graft.core.Lifecycle.withPersisted(brute) {
      val matched = ivf.join(brute, Seq("vec_id"))
        .groupBy("nprobe").agg(
          count(lit(1)).as("n_found"),
          sum(when(col("pk") === col("bpk"), 1L).otherwise(0L))
            .as("n_argmax_match"))
      val nTrain = brute.agg(count(lit(1)).as("n_train"))
      matched.crossJoin(broadcast(nTrain))
        .select(col("nprobe"), col("n_train"), col("n_found"),
          col("n_argmax_match"),
          expr("CAST(n_argmax_match * 1000000 div n_train AS BIGINT)")
            .as("recall_micro"))
    }
  }

  /** The [[semanticDecontam]] eval side, DRIVER-materialized for
    * stream-side row-local scoring: the usable eval vectors
    * (id, embedding, norm — zero-norm excluded, as in the batch op) plus
    * the FULL eval id set (zero-norm included: exclusion of the
    * benchmark's own shard is id-based in the batch op, so the stream
    * twin must exclude ids whose vector it cannot score). Bounded: the
    * eval side is benchmark-sized — the same collect class as the ANN
    * codebooks. The id packing bound is checked here, driver-side, loud.
    */
  def evalVectorSet(docs: DataFrame, emb: DataFrame, evalSource: String)
      : (Array[(Long, Array[Float], Double)], Set[Long]) = {
    val evalIds = docs.filter(col("source") === evalSource)
      .select(col("doc_id").as("vec_id"))
    // the batch op's left_anti is against the DOCS-table id list, so the
    // stream twin excludes the same set — including eval docs with no
    // vector row or a zero-norm vector
    val allIds = evalIds.collect().map(_.getLong(0)).toSet
    val ev = emb.join(evalIds, Seq("vec_id"))
      .select(col("vec_id"), col("embedding"),
        sqrt(sqNorm(col("embedding"))).as("ev_nrm"))
      .filter(col("ev_nrm") > 0).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    require(ev.nonEmpty,
      s"evalVectorSet: no usable (non-zero-norm) '$evalSource' vectors — " +
        "an empty eval set would silently monitor nothing")
    val mx = ev.map(_._1).max; val mn = ev.map(_._1).min
    require(mx < (1L << 40) && mn >= 0L,
      s"semantic packed key needs eval ids in [0, 2^40); got [$mn, $mx]")
    (ev, allIds)
  }

  /** Batch ANN serving: top-`k` cosine neighbours for EVERY query in a
    * bounded query set (the vec_id % 100 == 0 vectors) in ONE corpus scan
    * — the retrieval-curation shape where queries ≪ corpus. The query set
    * rides an explicit broadcast cross join (BroadcastNestedLoopJoin with
    * the BOUNDED side as build — for an all-pairs fan-out against a tiny
    * broadcast side this IS the optimal physical plan; a constant-key
    * "hash join" disguise constant-folds back to exactly this), each
    * (candidate, query) pair costs one codegen dot product, and the
    * per-query top-k is the q127 packed-key KMV bottom-k
    * — k longs of mergeable, map-side-combining state per query, never a
    * per-query sort of the corpus (a rank window partitioned by query
    * would pull the ENTIRE corpus through #queries tasks).
    *
    * Packing: pk = (10⁶ − sim_micro)·2⁴⁰ + vec_id, so ascending pk order
    * is (sim desc, vec_id asc) and bottom-k IS the top-k with
    * deterministic tiebreak; sim_micro ∈ [−10⁶, 10⁶] keeps pk < 2⁶².
    */
  def queryAnnJoin(emb: DataFrame, k: Int): DataFrame = {
    val kmv = udaf(new Sketch.KmvAgg(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val base = emb.select(col("vec_id"), col("embedding"),
      sqrt(sqNorm(col("embedding"))).as("nrm"))
    val queries = base.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"))
    val simMicro = round(
      round(dotCols(col("embedding"), col("qv")) / (col("nrm") * col("qn")), 6)
        * 1e6, 0).cast("long")
    base.filter(col("vec_id") % 100 =!= 0)
      .crossJoin(broadcast(queries))
      .select(col("query_id"),
        ((lit(1000000L) - simMicro) * lit(1099511627776L) + col("vec_id"))
          .as("pk"))
      .groupBy("query_id").agg(kmv(col("pk")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "pk")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rn"),
        expr("pk % 1099511627776").as("vec_id"),
        round((lit(1000000L) - expr("pk div 1099511627776")).cast("double")
          / 1e6, 6).as("sim"))
  }

  /** Per-query IVF cell ranking — the ONE probe-table implementation every
    * recall audit shares ([[ivfRecall]], [[ivfRecallSweep]],
    * [[ivfPqRecallSweep]]): squared-L2 of each query to each of the
    * [[IvfK]] centroids (canonical ascending fold, oracle-mirrored),
    * ranked per query with the lowest-cell tiebreak, kept to
    * `maxRank`. Broadcast-bounded: queries × IvfK rows.
    */
  private def probeRanked(queries: DataFrame,
      cents: Array[Array[Double]], maxRank: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ss = queries.sparkSession
    import ss.implicits._
    val centDf = cents.toIndexedSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "cemb")
    val l2 = expr("aggregate(zip_with(qv, cemb, " +
      "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), " +
      "CAST(0.0 AS DOUBLE), (a, b) -> a + b)")
    queries.select("query_id", "qv")
      .crossJoin(broadcast(centDf))
      .withColumn("dist", l2)
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("dist"), col("cell"))))
      .filter(col("crank") <= maxRank).select("query_id", "cell", "crank")
  }

  /** The recall tail every audit shares: mark `left`'s ids that appear in
    * `right` (both keyed (query_id, vec_id)), count hits per `groupCols`,
    * derive integer micro-recall. Which side is `left` decides row
    * presence for empty arms — [[ivfRecall]] groups from the brute side
    * (every query emits a row even when its probed arm is empty), the
    * sweeps group from the arm side (an empty arm emits no row) — so the
    * direction stays at each call site.
    */
  private def hitCount(left: DataFrame, right: DataFrame, k: Int,
      groupCols: Seq[String]): DataFrame =
    // the marked side is a bounded top-k set (≤ queries × k × arms rows),
    // so broadcast it: the hit join becomes a BroadcastHashJoin instead of
    // a sort-merge with an exchange+sort pair on both post-KMV sides
    left.join(broadcast(right.withColumn("hit", lit(1L))),
        Seq("query_id", "vec_id"), "left")
      .groupBy(groupCols.map(col): _*)
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall_micro", expr(s"n_hits * 1000000 div $k"))

  /** IVF RECALL AUDIT — the evaluation an ANN index ships with: for every
    * query of the broadcast query set (the q134 convention,
    * vec_id % 100 = 0), the brute-force cosine top-k is the ground truth
    * and the IVF-probed top-k (nprobe cells of [[ivfCellCol]]'s codebook)
    * is the candidate; output = per-query hit count and integer
    * micro-recall. The ANN analog of q114's est-vs-exact and q139's LSH
    * calibration: the recall/scan-fraction evidence you publish BEFORE
    * trusting the index at corpus scale.
    *
    * Scale shape: both arms are the q134 mechanism (corpus × broadcast
    * bounded query set, packed-key KMV top-k state — never a per-query
    * sort); the IVF arm additionally semi-joins the broadcast
    * (query, cell) probe table, so it scans the probed fraction only. The
    * probe table derives from the 16-row codebook (bounded collect,
    * watch-list class) crossed with the query set — both broadcast-bounded.
    */
  def ivfRecall(emb: DataFrame, k: Int, nprobe: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    val cents = ivfCentroids(emb)
    val base = emb.select(col("vec_id"), col("embedding"),
      sqrt(sqNorm(col("embedding"))).as("nrm"))
    val queries = base.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"))
    val corpus = base.filter(col("vec_id") % 100 =!= 0)
      .withColumn("cell", ivfCellCol(spark, cents))
    // nprobe nearest cells per query, from the 16-row codebook table
    val probes = probeRanked(queries, cents, nprobe).select("query_id", "cell")
    val kmv = udaf(new Sketch.KmvAgg(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val simMicro = round(
      round(dotCols(col("embedding"), col("qv")) / (col("nrm") * col("qn")), 6)
        * 1e6, 0).cast("long")
    def topIds(cand: DataFrame) = cand
      .select(col("query_id"),
        ((lit(1000000L) - simMicro) * lit(1099511627776L) + col("vec_id"))
          .as("pk"))
      .groupBy("query_id").agg(kmv(col("pk")).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("pk"))
      .select(col("query_id"), expr("pk % 1099511627776").as("vec_id"))
    val brute = topIds(corpus.crossJoin(broadcast(queries)))
    val ivf = topIds(corpus.crossJoin(broadcast(queries))
      .join(broadcast(probes), Seq("query_id", "cell"), "left_semi"))
    // grouped from the BRUTE side: every query emits a row even when its
    // probed arm found nothing (see hitCount)
    hitCount(brute, ivf, k, Seq("query_id"))
      .select(col("query_id"), col("n_hits"), col("recall_micro"))
  }

  /** The nprobe TUNING SWEEP over [[ivfRecall]]'s audit: recall@k per
    * (query, nprobe) for a whole nprobe grid in ONE pass — sims and the
    * per-query cell ranking compute once; each candidate row fans out only
    * to the grid entries whose probe radius includes its cell's rank, and
    * the per-(query, nprobe) top-k is KMV state as everywhere else. This
    * is the curve (recall vs scan fraction ∝ nprobe/K) an index operator
    * actually reads to pick nprobe; a grid containing K itself yields a
    * built-in sanity row (probing every cell ≡ brute force → recall 1.0,
    * asserted by the oracle since both engines must agree on it).
    */
  def ivfRecallSweep(emb: DataFrame, k: Int, nprobes: Seq[Int]): DataFrame = {
    val spark = emb.sparkSession
    val cents = ivfCentroids(emb)
    val base = emb.select(col("vec_id"), col("embedding"),
      sqrt(sqNorm(col("embedding"))).as("nrm"))
    val queries = base.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"))
    val corpus = base.filter(col("vec_id") % 100 =!= 0)
      .withColumn("cell", ivfCellCol(spark, cents))
    val ranked = probeRanked(queries, cents, nprobes.max)
    val kmv = udaf(new Sketch.KmvAgg(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val simMicro = round(
      round(dotCols(col("embedding"), col("qv")) / (col("nrm") * col("qn")), 6)
        * 1e6, 0).cast("long")
    val pk = ((lit(1000000L) - simMicro) * lit(1099511627776L) + col("vec_id")).as("pk")
    val sims = corpus.crossJoin(broadcast(queries))
    val brute = sims.select(col("query_id"), pk)
      .groupBy("query_id").agg(kmv(col("pk")).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("pk"))
      .select(col("query_id"), expr("pk % 1099511627776").as("vec_id"))
    val grid = array(nprobes.map(lit): _*)
    val ivf = sims
      .join(broadcast(ranked), Seq("query_id", "cell")) // cells beyond max(grid) drop here
      .select(col("query_id"), col("crank"), pk)
      .withColumn("nprobe", explode(grid))
      .filter(col("crank") <= col("nprobe"))
      .groupBy("query_id", "nprobe").agg(kmv(col("pk")).as("topk"))
      .select(col("query_id"), col("nprobe"), explode(col("topk")).as("pk"))
      .select(col("query_id"), col("nprobe"),
        expr("pk % 1099511627776").as("vec_id"))
    hitCount(ivf, brute, k, Seq("query_id", "nprobe"))
      .select(col("query_id"), col("nprobe").cast("int").as("nprobe"),
        col("n_hits"), col("recall_micro"))
  }

  /** PQ RECALL AUDIT + m-SWEEP — the q149/q150 evidence for the OTHER
    * approximate index: per (query, m_sub) recall@k of ADC-quantized
    * nearest neighbours against the exact ground truth, for a grid of
    * subvector counts `ms` plus the IDENTITY arm (m_sub = 0, no
    * quantization). PQ's error is structurally different from IVF's —
    * quantization BIAS in every distance (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011), not probe
    * truncation — so recall here measures how much the m-way compression
    * distorts the ranking, and the m grid is the compression-vs-recall
    * curve an operator reads to size the codes.
    *
    * Mechanism notes:
    *  - ADC distance over disjoint subspace slices telescopes:
    *    Σ_j ||q_j − c_{j,code}||² = ||q − recon||² where `recon` is the
    *    concatenation of the chosen centroids — so every arm (including
    *    identity, recon = the vector itself) computes ONE canonical
    *    64-dim ascending fold, bit-mirrorable in any engine. The
    *    m_sub = 0 arm's top-k IS the brute-force ground truth, so its
    *    recall row reads exactly 10⁶ — the built-in sanity the oracle
    *    must agree on.
    *  - codes per (row, arm) are row-local against the broadcast sampled
    *    codebook (the q76 convention: subspace slices of the first
    *    [[PqK]] embeddings; strict-< argmin ⇒ lowest-code tiebreak).
    *  - distances pack to micro-units and the per-(query, arm) top-k is
    *    the packed-key KMV bottom-k — never a per-query sort; multiplier
    *    2²¹ (not 2⁴⁰) because quantized L2² can exceed the cosine range.
    *
    * Scale shape: corpus × (arms × broadcast query set), one keyed KMV
    * aggregate; the codebook collect is bounded ([[PqK]] rows, watch-list
    * class). The brute arm is the audit's cost, run-once by design (same
    * verdict as q149).
    */
  /** The ONE PQ-reconstruction kernel ([[pqRecallSweep]],
    * [[ivfPqRecallSweep]]): collects the sampled codebook vectors (the
    * q76 convention — vec_id 0..PqK-1) and returns (dim, reconUdf) where
    * reconUdf(embedding, m) is the m-way quantized reconstruction — per
    * subspace, the argmin-L2 centroid's slice (ascending-index fold,
    * strict < ⇒ lowest code); m = 0 reconstructs the vector itself
    * (identity quantizer). One implementation so the composed audit's
    * full-probe ≡ [[pqRecall]] equality holds by construction, not by
    * parallel edits.
    */
  private def pqReconUdf(emb: DataFrame)
      : (Int, org.apache.spark.sql.expressions.UserDefinedFunction) = {
    val spark = emb.sparkSession
    val sample = emb.filter(col("vec_id") < PqK).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.length == PqK,
      s"PQ codebook needs embeddings with vec_id 0..${PqK - 1}; got ${sample.length}")
    val dim = sample(0).length
    val bc = spark.sparkContext.broadcast(sample)
    val reconUdf = udf { (a: Seq[Float], m: Int) =>
      if (a == null) null
      else if (m == 0) a.map(_.toDouble).toArray
      else {
        val cb = bc.value
        val dsub = dim / m
        val out = new Array[Double](dim)
        var j = 0
        while (j < m) {
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < PqK) {
            var d = 0.0; var i = 0
            while (i < dsub) {
              val t = a(j * dsub + i) - cb(c)(j * dsub + i); d += t * t; i += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < dsub) { out(j * dsub + i) = cb(best)(j * dsub + i); i += 1 }
          j += 1
        }
        out
      }
    }
    (dim, reconUdf)
  }

  /** 21-bit vec_id packing bound shared by the reconstruction-distance
    * audits (narrower than ivfRecall's 2⁴⁰ — quantized L2² needs the
    * wider distance field): assert the id range instead of silently
    * unpacking corrupt ids past 2M vectors; one column-pruned 1-row
    * aggregate on run-once audits.
    */
  private def requirePackableIds(emb: DataFrame, who: String): Unit = {
    val maxId = emb.agg(max("vec_id")).head.getLong(0)
    require(maxId < 2097152L,
      s"$who packs vec_id into 21 bits; max vec_id $maxId >= 2^21 " +
        "— widen the packing or shard the audit")
  }

  def pqRecallSweep(emb: DataFrame, k: Int, ms: Seq[Int]): DataFrame = {
    val (dim, reconUdf) = pqReconUdf(emb)
    require(ms.forall(m => m > 0 && dim % m == 0),
      s"every m_sub must divide dim=$dim, got $ms")
    requirePackableIds(emb, "pqRecallSweep")
    val base = emb.select(col("vec_id"), col("embedding"))
    val queries = base.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpusArms = base.filter(col("vec_id") % 100 =!= 0)
      .withColumn("m_sub", explode(array((0 +: ms.toList).map(lit): _*)))
      .select(col("vec_id"), col("m_sub"),
        reconUdf(col("embedding"), col("m_sub")).as("recon"))
    // ONE canonical distance fold for every arm (see Scaladoc) — the same
    // ascending aggregate(zip_with(...)) the oracle's list_reduce mirrors
    val dist = expr("aggregate(zip_with(qv, recon, " +
      "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), " +
      "CAST(0.0 AS DOUBLE), (a, b) -> a + b)")
    val dm = round(round(dist, 6) * 1e6, 0).cast("long")
    val kmv = udaf(new Sketch.KmvAgg(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val topk = corpusArms.crossJoin(broadcast(queries))
      .select(col("query_id"), col("m_sub"),
        (dm * lit(2097152L) + col("vec_id")).as("pk"))
      .groupBy("query_id", "m_sub").agg(kmv(col("pk")).as("topk"))
      .select(col("query_id"), col("m_sub"), explode(col("topk")).as("pk"))
      .select(col("query_id"), col("m_sub"), expr("pk % 2097152").as("vec_id"))
    // topk feeds BOTH hitCount sides (the arm rows and the m_sub=0 brute
    // slice) — persisted (round 12, §2.4) so the corpus × query × arm
    // distance fan-out and its KMV aggregation run ONCE, not once per
    // side; topk is bounded at queries × (|ms|+1) × k rows
    graft.core.Lifecycle.withPersisted(topk) {
      val brute = topk.filter(col("m_sub") === 0).select("query_id", "vec_id")
      hitCount(topk, brute, k, Seq("query_id", "m_sub"))
        .select(col("query_id"), col("m_sub").cast("int").as("m_sub"),
          col("n_hits"), col("recall_micro"))
    }
  }

  /** The production-geometry PQ recall audit: recall@k of the [[PqM]]-way
    * ADC index against brute-force ground truth — the q149 analog for the
    * PQ index (one arm of [[pqRecallSweep]], same output shape as
    * [[ivfRecall]]).
    */
  def pqRecall(emb: DataFrame, k: Int): DataFrame =
    pqRecallSweep(emb, k, Seq(PqM))
      .filter(col("m_sub") === PqM)
      .select("query_id", "n_hits", "recall_micro")

  /** IVF+PQ COMPOSED recall audit — the q149/q151 evidence for the index
    * the two halves compose into (q153, [[ivfPqTopK]]): recall@k per
    * (query, nprobe) of the ADC-quantized top-k scanned over the probed
    * cells only, against the EXACT brute-force ground truth (identity
    * distance, every cell). The composed index inherits BOTH error
    * sources — probe truncation (q149's axis) and quantization bias
    * (q151's axis) — and their interaction is not the product of the
    * marginals: a true neighbour survives only if its cell is probed AND
    * quantization keeps it inside the ADC top-k, while a quantization
    * error can also mask a probe miss by promoting a probed impostor. So
    * the composition needs its own published curve; the full-probe row
    * (nprobe = [[IvfK]]) probes every cell and therefore isolates pure
    * quantization error — it must equal [[pqRecall]] exactly (asserted in
    * OperatorSpec).
    *
    * Mechanism: reconstruction distance — ADC over disjoint subspaces
    * telescopes to ||q − recon||² (see [[pqRecallSweep]]) — so both arms
    * run ONE canonical 64-dim ascending fold; candidates fan to the
    * nprobe grid by cell rank exactly as in [[ivfRecallSweep]]; the
    * per-(query, arm) top-k is packed-key KMV bottom-k state, never a
    * per-query sort.
    *
    * Scale shape: corpus × broadcast query set once, recon computed
    * per-row BEFORE the query fan-out; the probed arm joins the broadcast
    * (query, cell, rank) table so each grid entry scans only its probe
    * fraction; codebook collects are bounded ([[IvfK]] + [[PqK]] rows,
    * watch-list class). The brute arm is the audit's cost, run-once by
    * design (same verdict as q149/q151).
    */
  def ivfPqRecallSweep(emb: DataFrame, k: Int, nprobes: Seq[Int]): DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(n => n >= 1 && n <= IvfK),
      s"nprobe grid must be within 1..$IvfK, got $nprobes")
    val spark = emb.sparkSession
    val cents = ivfCentroids(emb)
    // the SAME reconstruction kernel as pqRecallSweep, applied at the
    // production geometry (m = PqM) — the full-probe ≡ pqRecall equality
    // is structural
    val (dim, reconUdf) = pqReconUdf(emb)
    require(dim % PqM == 0, s"PqM=$PqM must divide dim=$dim")
    requirePackableIds(emb, "ivfPqRecallSweep")
    val base = emb.select(col("vec_id"), col("embedding"))
    val queries = base.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val corpus = base.filter(col("vec_id") % 100 =!= 0)
      .withColumn("cell", ivfCellCol(spark, cents))
      .withColumn("recon", reconUdf(col("embedding"), lit(PqM)))
      .withColumn("xd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    val ranked = probeRanked(queries, cents, nprobes.max)
    // ONE canonical distance fold for both arms (`xd` = identity doubles,
    // `recon` = quantized reconstruction) — the oracle's list_reduce mirror
    def dm(rc: String) = round(round(expr(
      s"aggregate(zip_with(qv, $rc, " +
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), " +
        "CAST(0.0 AS DOUBLE), (a, b) -> a + b)"), 6) * 1e6, 0).cast("long")
    val kmv = udaf(new Sketch.KmvAgg(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val sims = corpus.crossJoin(broadcast(queries))
    val brute = sims
      .select(col("query_id"), (dm("xd") * lit(2097152L) + col("vec_id")).as("pk"))
      .groupBy("query_id").agg(kmv(col("pk")).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("pk"))
      .select(col("query_id"), expr("pk % 2097152").as("vec_id"))
    val grid = array(nprobes.map(lit): _*)
    val composed = sims
      .join(broadcast(ranked), Seq("query_id", "cell")) // cells beyond max(grid) drop here
      .select(col("query_id"), col("crank"),
        (dm("recon") * lit(2097152L) + col("vec_id")).as("pk"))
      .withColumn("nprobe", explode(grid))
      .filter(col("crank") <= col("nprobe"))
      .groupBy("query_id", "nprobe").agg(kmv(col("pk")).as("topk"))
      .select(col("query_id"), col("nprobe"), explode(col("topk")).as("pk"))
      .select(col("query_id"), col("nprobe"), expr("pk % 2097152").as("vec_id"))
    hitCount(composed, brute, k, Seq("query_id", "nprobe"))
      .select(col("query_id"), col("nprobe").cast("int").as("nprobe"),
        col("n_hits"), col("recall_micro"))
  }

  /** Hyperplane-LSH ANN recall sweep — the q150 analog for the FOURTH
    * index family (q33's multiprobe random-hyperplane LSH), completing
    * the audit matrix: every ANN index this engine serves (IVF, PQ,
    * IVF+PQ, hyperplane LSH) now ships recall evidence. Recall@k per
    * (query, probe radius) of the exact-cosine top-k restricted to
    * candidates whose sign-pattern bucket lies within Hamming distance
    * `radius` of the query's bucket, against brute-force ground truth.
    * Radius 1 IS q33's probe set (own bucket + the [[NumPlanes]]
    * flip-one neighbours); radius [[NumPlanes]] admits every bucket ≡
    * brute, so that row must read exactly 10⁶ — the built-in sanity both
    * engines must agree on (asserted per query in OperatorSpec too).
    * Scan fraction at radius r is Σ_{i≤r} C(P,i)/2^P in expectation —
    * the recall-vs-scan curve an operator reads to size the probe set.
    *
    * Scale shape: the same corpus × broadcast-query fan-out + packed-key
    * KMV top-k as q149/q150/q155; the bucket Hamming test is one codegen
    * bit_count per pair (no probe table at all — the radius grid fans
    * bounded arms exactly like q150's nprobe grid). At 100 TB the
    * candidate arms would scan bucket-partitioned slices instead; the
    * recall numbers this audit publishes are identical either way.
    */
  def lshAnnRecallSweep(emb: DataFrame, k: Int, radii: Seq[Int]): DataFrame = {
    require(radii.nonEmpty && radii.forall(r => r >= 0 && r <= NumPlanes),
      s"radius grid must be within 0..$NumPlanes, got $radii")
    // bucketUdf yields null for null/short embeddings; an unfiltered null
    // bucket would silently drop the row from every ARM (null hd fails
    // every <=) while the brute arm still ranks it — breaking the
    // radius = NumPlanes ≡ brute invariant. Drop malformed rows from BOTH
    // sides instead, so the audit population is consistent.
    val base = emb.select(col("vec_id"), col("embedding"),
      sqrt(sqNorm(col("embedding"))).as("nrm"),
      bucketCol(col("embedding")).as("bucket"))
      .filter(col("bucket").isNotNull)
    val queries = base.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qb"))
    val corpus = base.filter(col("vec_id") % 100 =!= 0)
    val kmv = udaf(new Sketch.KmvAgg(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val simMicro = round(
      round(dotCols(col("embedding"), col("qv")) / (col("nrm") * col("qn")), 6)
        * 1e6, 0).cast("long")
    val sims = corpus.crossJoin(broadcast(queries))
      .select(col("query_id"),
        bit_count(col("bucket").bitwiseXOR(col("qb"))).cast("int").as("hd"),
        ((lit(1000000L) - simMicro) * lit(1099511627776L) + col("vec_id"))
          .as("pk"))
    // sims feeds the brute arm AND the radius grid — persisted (round 12,
    // §2.4) so the corpus × query cosine fold runs ONCE, not once per
    // consumer; sims is (query × corpus) rows of three scalars, the same
    // bounded class as the audit's own output domain
    graft.core.Lifecycle.withPersisted(sims) {
      val brute = sims
        .groupBy("query_id").agg(kmv(col("pk")).as("topk"))
        .select(col("query_id"), explode(col("topk")).as("pk"))
        .select(col("query_id"), expr("pk % 1099511627776").as("vec_id"))
      val grid = array(radii.map(lit): _*)
      val arms = sims.withColumn("radius", explode(grid))
        .filter(col("hd") <= col("radius"))
        .groupBy("query_id", "radius").agg(kmv(col("pk")).as("topk"))
        .select(col("query_id"), col("radius"), explode(col("topk")).as("pk"))
        .select(col("query_id"), col("radius"),
          expr("pk % 1099511627776").as("vec_id"))
      hitCount(arms, brute, k, Seq("query_id", "radius"))
        .select(col("query_id"), col("radius").cast("int").as("radius"),
          col("n_hits"), col("recall_micro"))
    }
  }

  /** Per-label embedding statistics — the class prototype (nearest-class-
    * mean classification, contrastive anchor means) and per-dimension
    * variance (feature-collapse / dead-dimension detection) a training
    * pipeline derives from a labeled embedding table.
    *
    * Integer discipline: each component quantizes to micro-units FIRST
    * (round(x·10⁶)), so the per-(label, dim) sums are exact long
    * arithmetic — a double mean over rows would be order-dependent and
    * hash-unstable. centroid = sum div n and var = E[x²] − E[x]² use
    * integer division, mirrored in the oracle.
    *
    * Scale shape: posexplode emits dim-many rows per vector and ONE keyed
    * aggregate with map-side combine collapses them; output is
    * #labels × dim rows. No window, no collect.
    */
  def labelStats(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .withColumn("xm", round(col("x").cast("double") * 1e6, 0).cast("long"))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"), sum("xm").as("s"),
        sum(col("xm") * col("xm")).as("ss"))
      .select(col("label"), col("pos"), col("n"),
        expr("s div n").as("centroid_micro"),
        expr("(ss div n) - (s div n) * (s div n)").as("var_micro2"))
}
