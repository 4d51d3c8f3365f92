package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Late-fusion retrieval composition — the two patterns a production
  * search stack layers on top of the individual retrievers this
  * engine already ships (BM25 keyword top-k, dense ANN top-k):
  *
  *  - '''Hybrid fusion''' ([[rrfFuse]]): merge rankings from
  *    heterogeneous retrievers by RANK, not score. Reciprocal rank
  *    fusion (Cormack, Clarke & Büttcher 2009, "Reciprocal rank
  *    fusion outperforms Condorcet and individual rank learning
  *    methods") needs no score calibration between systems, which is
  *    exactly why it is the default hybrid combiner in production
  *    lexical+vector search.
  *  - '''Retrieve-then-rerank''' ([[rerankCosine]]): a cheap
  *    wide-recall shortlist (e.g. [[Similarity.hammingTopK]]'s 1
  *    bit/dim scan) followed by exact scoring of only the shortlist —
  *    the standard two-tower serving shape; the expensive metric
  *    touches |queries|·shortlist rows instead of the corpus.
  *
  * Scale shape: the inputs to both combiners are ALREADY bounded
  * (top-N per query by construction), so everything here is
  * small-data post-processing of big-data scans — the heavy lifting
  * (corpus scans, bounded-heap top-k) happened inside the retrievers,
  * which never shuffle the corpus. Fusion itself is one hash
  * aggregation over ≤ Σ|lists| rows.
  */
object Retrieval {

  /** Reciprocal rank fusion over id-keyed rankings:
    * `rrf(id) = Σ_lists 1 / (k0 + rank_id)`.
    *
    * Each input must carry `(id, rn)` with `rn` the 1-based rank
    * within that list. k0 = 60 is the paper's constant. Returns the
    * fused top-`k` as `(id, rrf_score, n_lists)`, ties by ascending
    * id.
    *
    * Determinism contract: each contribution `1/(k0+rn)` is one
    * correctly-rounded IEEE divide; with ≤ 2 lists the per-id sum is
    * a single commutative addition, so results are bit-identical on
    * any engine and partitioning (the DuckDB-oracle discipline).
    * With ≥ 3 lists the sum order can reassociate across engines —
    * still deterministic within Spark per the hash-agg merge order,
    * but only spec-checkable, not hash-oracle-checkable.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    rankings
      .map(_.select(col("id"),
        (lit(1.0) / (lit(k0) + col("rn")).cast("double")).as("contrib")))
      .reduce(_ unionAll _)
      .groupBy(col("id"))
      .agg(sum(col("contrib")).as("rrf_score"),
        count(lit(1)).cast("int").as("n_lists"))
      .orderBy(col("rrf_score").desc, col("id").asc)
      .limit(k)
  }

  /** Exact-cosine rerank of a per-query candidate shortlist:
    * `cands` is `(q_id, n_id)` (any bounded candidate generator —
    * Hamming shortlist, LSH buckets, IVF cells), scored against the
    * true vectors and cut to the top `k` per query with the bounded
    * heap (never a per-query window shuffle).
    *
    * Plan shape: candidates join the corpus on `n_id` (the corpus
    * side is pruned to shortlist members by the join itself), the
    * query vectors broadcast, and the exact kernel runs only on
    * |cands| rows — at 100 TB the full-precision math never touches
    * the corpus scan.
    */
  def rerankCosine(corpus: DataFrame, queries: DataFrame,
                   cands: DataFrame, k: Int,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      Similarity.norm(col(vecCol)).as("n_nrm"))
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), Similarity.norm(col(vecCol)).as("q_nrm")))
    val scored = cands.select(col("q_id"), col("n_id"))
      .join(c, Seq("n_id"))
      .join(q, Seq("q_id"))
      .select(col("q_id"), col("n_id"),
        Similarity.cosineFromNorms(col("q_vec"), col("n_vec"),
          col("q_nrm"), col("n_nrm")).as("cos"))
    Similarity.topKPerQuery(scored, "cos", scoreAsc = false, k)
  }

  /** Offline retrieval-quality report — per-query recall@k and MRR of
    * an approximate ranking against an exact reference ranking (how a
    * production ANN index is regression-tested before rollout, run at
    * corpus scale instead of a notebook sample). Both inputs carry
    * `(q_id, n_id, rn)`; MRR is the reciprocal of the approximate
    * rank of the TRUE nearest neighbor (reference rn = 1), 0 when the
    * approximate list misses it entirely.
    *
    * Inputs are bounded (|Q|·k rows each) by construction, so the
    * joins/aggregations here are post-processing — the corpus-scale
    * work happened inside the two retrievers being compared.
    */
  def retrievalMetrics(exact: DataFrame, approx: DataFrame,
                       k: Int): DataFrame = {
    val ex = exact.select(col("q_id"), col("n_id"), col("rn"))
    val ap = approx.select(col("q_id").as("a_qid"),
      col("n_id").as("a_id"), col("rn").as("a_rn"))
    val hits = ex.join(ap,
        col("q_id") === col("a_qid") && col("n_id") === col("a_id"))
      .select(col("q_id"), col("rn"), col("a_rn"))
    val recall = hits.groupBy(col("q_id"))
      .agg((count(lit(1)).cast("double") / lit(k).cast("double"))
        .as("recall_at_k"))
    val rr = hits.filter(col("rn") === 1)
      .select(col("q_id"), (lit(1.0) / col("a_rn").cast("double"))
        .as("mrr"))
    ex.select(col("q_id")).distinct()
      .join(recall, Seq("q_id"), "left")
      .join(rr, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("recall_at_k"), lit(0.0)).as("recall_at_k"),
        coalesce(col("mrr"), lit(0.0)).as("mrr"))
  }
}
