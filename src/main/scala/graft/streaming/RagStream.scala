package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming RAG context assembly — q289
  * ([[graft.ops.Retrieval.ragContext]]) at SERVE time: the fused
  * sparse+dense ranking is a STATIC index (recomputed at release cadence),
  * and queries ARRIVE — each arrival must assemble its token-budget
  * context the moment it lands, not in the next batch pass.
  *
  * Shape — stream-static, fully STATELESS (the [[DecontaminateStream]]
  * discipline):
  *
  *  - the static side is the fused ranking pre-grouped per query into ONE
  *    row (query_id, entries[] sorted by fused_rank, each entry carrying
  *    its token count) — rank-bounded (fuseK entries), so the whole index
  *    is |queries|-sized and BROADCASTS;
  *  - an arriving query equi-joins that broadcast index (one row in, one
  *    row matched — no shuffle of the stream side);
  *  - the strict-prefix budget fill is computed ROW-LOCALLY with array
  *    higher-order functions: the running token sum over the ≤ fuseK
  *    entries is an O(k²) `aggregate(slice(...))` inside one projection —
  *    no window, no aggregation state, exactly q289's cum-sum semantics;
  *  - the filled entries explode back to one row per (query, doc).
  *
  * Zero stateful ops ⇒ append mode, no watermark, and the identical plan
  * runs on a batch query relation — the q297 twin query evaluates THIS
  * function over the batch query set and hash-matches q289's oracle,
  * and the stream≡batch spec drives it through a real micro-batched
  * stream.
  */
object RagStream {

  /** The static serve index: q281's fused ranking + per-doc token counts,
    * grouped to one row per query with entries sorted by fused_rank.
    * Rank-bounded by construction (fuseK rows per query pre-group). */
  def fusedIndex(docs: DataFrame, embeddings: DataFrame,
      queryStride: Long = 251, topK: Int = 5, k0: Int = 60,
      fuseK: Int = 5): DataFrame = {
    val fused = graft.ops.Retrieval.rrfFusion(
      docs, embeddings, queryStride, topK, k0, fuseK)
    val toks = docs.select(col("doc_id"),
      graft.ops.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    fused.join(toks, Seq("doc_id"))
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct(col("fused_rank"), col("doc_id"),
        col("n_tokens")))).as("entries"))
  }

  /** Assemble contexts for arriving queries against a static
    * [[fusedIndex]]. `queries` may be a streaming OR batch frame with a
    * `query_id` column — the plan is identical (that equivalence is the
    * stream≡batch spec's claim).
    *
    * @return (query_id, doc_id, fused_rank, n_tokens, cum_tokens,
    *         in_context) — q289's exact output contract
    */
  def ragContextStream(queries: DataFrame, index: DataFrame,
      budgetTokens: Long = 150): DataFrame =
    queries.select(col("query_id"))
      .join(broadcast(index), Seq("query_id"))
      // row-local strict-prefix fill: cum_tokens over the rank-sorted
      // entries via aggregate(slice(...)) — O(fuseK²) per query, stateless
      .withColumn("filled", expr(
        """transform(entries, (e, i) -> struct(
          |  e.doc_id AS doc_id, e.fused_rank AS fused_rank,
          |  e.n_tokens AS n_tokens,
          |  aggregate(slice(entries, 1, i + 1), 0L,
          |    (acc, x) -> acc + x.n_tokens) AS cum_tokens))""".stripMargin))
      .select(col("query_id"), explode(col("filled")).as("e"))
      .select(col("query_id"), col("e.doc_id").as("doc_id"),
        col("e.fused_rank").as("fused_rank"),
        col("e.n_tokens").as("n_tokens"),
        col("e.cum_tokens").as("cum_tokens"),
        (col("e.cum_tokens") <= budgetTokens).as("in_context"))
}
