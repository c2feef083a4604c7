package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval / ranking quality evaluation — the metrics an eval harness
  * reports over a retriever's output (BM25 top-k, ANN top-k, a reranker):
  * hits@k, first-relevant rank (the MRR numerator), precision/recall@k and
  * nDCG@k, one row per benchmark query.
  *
  * Everything is engine-exact by construction: counts and ranks are
  * integers, the per-query ratios (reciprocal rank, precision, recall) are
  * a SINGLE IEEE division of integers, and the only order-dependent sums —
  * the DCG/iDCG gain folds — run as index-ordered array folds over the
  * rank-sorted gain list (the 0.0-seeded `aggregate` fold both engines
  * replay identically), with the final nDCG quotient round-4'd to absorb
  * libm `log2` ulp skew (the BM25 rank defense).
  */
object Eval {

  /** Per-query ranking metrics of `ranked` (queryIdCol, docIdCol, rankCol —
    * rank 1-based, rows with rank > k are ignored so callers can pass a
    * deeper list) against `relevant` ground-truth pairs (queryIdCol,
    * docIdCol). Emits ONE ROW PER QUERY PRESENT IN THE GROUND TRUTH — the
    * benchmark defines the query set; a query the retriever returned
    * nothing for still scores (zeros), while retrieved-but-unlabeled
    * queries are not scored at all.
    *
    * Output: (query, n_relevant, hits_at_k, first_rel_rank — NULL when no
    * relevant doc was retrieved, rr, precision_at_k, recall_at_k,
    * ndcg_at_k).
    *
    * Scale shape: the hit join is an equi-join on (query, doc) — broadcast
    * when the ground truth is benchmark-sized (the common case: thousands
    * of labeled queries vs a 100 TB corpus ranking), shuffled otherwise;
    * per-query state after it is ≤ k ranks, so the metric aggregation is
    * one map-side-combined exchange of k-bounded rows. Nothing touches the
    * corpus itself — evaluation cost is O(|ranked| + |relevant|). */
  def rankingMetrics(ranked: DataFrame, relevant: DataFrame, k: Int,
      queryIdCol: String = "query_id", docIdCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val r = ranked
      .select(col(queryIdCol), col(docIdCol), col(rankCol).cast("long").as("__rank"))
      .filter(col("__rank") <= k)
    val rel = relevant.select(col(queryIdCol), col(docIdCol)).distinct()
    val nrel = rel.groupBy(queryIdCol).agg(count(lit(1)).as("n_relevant"))
    val hits = r.join(rel, Seq(queryIdCol, docIdCol))
      .groupBy(queryIdCol)
      .agg(count(lit(1)).as("__hits"),
        min(col("__rank")).as("first_rel_rank"),
        sort_array(collect_list(col("__rank"))).as("__ranks"))
    // index-ordered 0.0-seeded folds: both engines sum the gain list in
    // ascending-rank order, so the ONLY cross-engine wiggle is log2 ulps —
    // absorbed by the round-4 on the final quotient
    val gain = (rk: org.apache.spark.sql.Column) =>
      lit(1.0) / log2(rk.cast("double") + lit(1.0))
    val dcg = aggregate(col("__ranks"), lit(0.0), (acc, rk) => acc + gain(rk))
    val idcg = aggregate(
      sequence(lit(1L), least(col("n_relevant"), lit(k.toLong))),
      lit(0.0), (acc, rk) => acc + gain(rk))
    nrel.join(hits, Seq(queryIdCol), "left")
      .select(col(queryIdCol),
        col("n_relevant"),
        coalesce(col("__hits"), lit(0L)).as("hits_at_k"),
        col("first_rel_rank"),
        when(col("first_rel_rank").isNotNull,
          lit(1.0) / col("first_rel_rank").cast("double"))
          .otherwise(lit(0.0)).as("rr"),
        (coalesce(col("__hits"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("precision_at_k"),
        (coalesce(col("__hits"), lit(0L)).cast("double") /
          col("n_relevant").cast("double")).as("recall_at_k"),
        when(col("__ranks").isNull, lit(0.0))
          .otherwise(graft.functions.StableRound.round4(dcg / idcg))
          .as("ndcg_at_k"))
  }
}
