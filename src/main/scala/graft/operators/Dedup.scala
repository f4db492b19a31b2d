package graft.operators


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
object Dedup extends dedup.DedupMinHash with dedup.DedupJoins
  with dedup.DedupGraph with dedup.DedupSubstr with dedup.DedupDecontam
