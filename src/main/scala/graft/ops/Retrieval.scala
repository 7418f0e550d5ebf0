package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval composition and ranking-quality evaluation — the two
  * pieces that turn the repo's standalone rankers ([[TextAnalysis.bm25TopK]]
  * lexical, [[Similarity.cosineTopK]] dense) into the fused
  * sparse-plus-dense retrieval stack a RAG data pipeline actually serves.
  *
  * Reference scope note: the reference engine (panditya) has no retrieval
  * surface — these are training-data-pipeline extensions in the brief's
  * "similarity search" family, built on published method shapes
  * (reciprocal-rank fusion: Cormack, Clarke & Büttcher SIGIR'09; nDCG:
  * Järvelin & Kekäläinen TOIS'02).
  */
object Retrieval {

  /** Reciprocal-rank fusion of the BM25 lexical top-k and the exact dense
    * cosine top-k over the SAME query set (document ids and embedding ids
    * share the id space in the testdata; callers align them the same way).
    * This is the CROSS-MODALITY hybrid (sparse lexical × dense embedding)
    * — distinct from q135's within-modality fusion of two dense rankings
    * (cosine + L2) of one candidate set.
    *
    * RRF score (Cormack et al.): Σ_lists 1/(k₀ + rank). Kept integer-exact
    * as micro-units: rrf_u = Σ ⌊10⁶/(k₀+rank)⌋ via BIGINT `div` — both
    * engines agree bit-for-bit, no floating fusion arithmetic. A doc
    * missing from one list contributes 0 from that list (the standard RRF
    * convention), surfacing as a NULL rank column in the output.
    *
    * The lexical ranker scores the query doc itself at rank 1 (a document
    * trivially matches its own text) while the dense ranker excludes
    * self-pairs; fusion keeps each list's RAW ranks (RRF is rank-based, so
    * dropping a row from one list must not renumber it) and filters the
    * self-hit from the fused OUTPUT only.
    *
    * Scale shape: both input lists are rank-bounded (|queries|·topK rows);
    * the fusion join, window and filter all run on that bounded relation.
    * The corpus-sized work lives inside the two rankers, each with its own
    * documented scale contract (BM25 posting-list equi-join; cosine as the
    * exact brute-force baseline with [[Similarity.cellKnn]] as the
    * sub-corpus path).
    *
    * @return (query_id, doc_id, lex_rank?, dense_rank?, rrf_u, fused_rank),
    *         fused_rank ∈ 1..fuseK per query, ties to the smaller doc_id
    */
  def rrfFusion(docs: DataFrame, embeddings: DataFrame,
      queryStride: Long = 251, topK: Int = 5, k0: Int = 60,
      fuseK: Int = 5): DataFrame = {
    val lex = TextAnalysis.bm25TopK(docs, queryStride, topK)
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val q = embeddings.filter(col("vec_id") % queryStride === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val dense = Similarity.cosineTopK(embeddings, q, topK)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").cast("long").as("dense_rank"))
    val fused = lex.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("rrf_u",
        coalesce(expr(s"1000000 div ($k0 + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($k0 + dense_rank)"), lit(0L)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_u").desc, col("doc_id"))
    fused.withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= fuseK)
      .select(col("query_id"), col("doc_id"), col("lex_rank"),
        col("dense_rank"), col("rrf_u"), col("fused_rank"))
  }

  /** RAG context assembly — the serving step after [[rrfFusion]]: fill a
    * fixed token budget with fused-rank-ordered documents, strict-prefix
    * semantics (documents enter in fused order; the first overflow closes
    * the context — later smaller documents do NOT back-fill, matching how
    * a context window is actually assembled and keeping the cut
    * deterministic and engine-replayable).
    *
    * Scale shape: the fused relation is (|queries|·fuseK)-bounded, so the
    * running-sum window and the budget cut run on that; the only
    * corpus-sized touch is the token-count attach, an equi-join where the
    * bounded fused side broadcasts onto the corpus scan.
    *
    * @return (query_id, doc_id, fused_rank, n_tokens, cum_tokens,
    *         in_context)
    */
  def ragContext(docs: DataFrame, embeddings: DataFrame,
      queryStride: Long = 251, topK: Int = 5, k0: Int = 60,
      fuseK: Int = 5, budgetTokens: Long = 150): DataFrame = {
    val fused = rrfFusion(docs, embeddings, queryStride, topK, k0, fuseK)
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("fused_rank"))
      .rowsBetween(Window.unboundedPreceding, 0)
    fused.join(toks, Seq("doc_id"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("in_context", col("cum_tokens") <= budgetTokens)
      .select(col("query_id"), col("doc_id"), col("fused_rank"),
        col("n_tokens"), col("cum_tokens"), col("in_context"))
  }

  /** Discount weights w(r) = ⌊10⁶ / log₂(r+1)⌋ for ranks 1..k — computed
    * ONCE here in Scala and embedded as literals in BOTH the engine plan
    * and the oracle SQL (the q278 noise-chain pattern), so neither engine
    * evaluates a transcendental at query time. */
  private[graft] def ndcgWeights(k: Int): Seq[Long] =
    (1 to k).map(r => math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** nDCG@k of the LSH approximate ranking against the exact cosine
    * ground truth — the position-sensitive companion to
    * [[Similarity.annRecall]]'s recall/MRR: recall says how MANY of the
    * true top-k the index returns, nDCG says how well it ORDERS them
    * (binary relevance: a returned doc is relevant iff it is in the exact
    * top-k).
    *
    * Integer contract: DCG = Σ_{hits} w(approx_rank) and
    * IDCG = Σ_{r=1..n_exact} w(r) are BIGINT sums of the shared
    * [[ndcgWeights]] literals; ndcg_u = dcg_u·10⁶ div idcg_u. No floating
    * arithmetic anywhere, so the oracle replays exactly.
    *
    * Scale shape: identical to [[Similarity.annRecall]] — both rankers
    * broadcast the small query side; the evaluation adds only equi-joins
    * on (query_id, vec_id) and query-sized aggregates over the
    * rank-bounded lists.
    *
    * The output is anchored on the QUERY relation, not the exact list: a
    * degenerate query with zero exact candidates (e.g. a corpus of only
    * the query itself) still gets an audit row with n_exact = 0 and a
    * NULL ndcg_u (undefined — no ideal ranking to normalize by), instead
    * of silently vanishing (r11 advisory: the same
    * audit-disappears-in-the-degenerate-case class as basketLift).
    *
    * @return one row PER QUERY: (query_id, n_exact, n_hit, dcg_u, idcg_u,
    *         ndcg_u); ndcg_u NULL iff n_exact = 0
    */
  def ndcgAudit(embeddings: DataFrame, queries: DataFrame, k: Int = 10,
      nPlanes: Int = 6, dim: Int = 64): DataFrame = {
    val ws = ndcgWeights(k)
    val wOf: Column => Column = r => element_at(
      map(ws.zipWithIndex.flatMap { case (u, i) =>
        Seq(lit((i + 1).toLong), lit(u))
      }: _*), r)
    // IDCG prefix sums, one per possible n_exact ∈ 1..k
    val idcgOf: Column => Column = n => element_at(
      map(ws.scanLeft(0L)(_ + _).tail.zipWithIndex.flatMap { case (s, i) =>
        Seq(lit((i + 1).toLong), lit(s))
      }: _*), n)
    val exact = Similarity.cosineTopK(embeddings, queries, k)
      .select(col("query_id"), col("vec_id"),
        col("rank").cast("long").as("exact_rank"))
    val approx = Similarity.lshTopK(embeddings, queries, nPlanes, dim, k)
      .select(col("query_id"), col("vec_id"),
        col("rank").cast("long").as("approx_rank"))
    val hits = exact.join(approx, Seq("query_id", "vec_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hit"),
        sum(wOf(col("approx_rank"))).as("dcg_u"))
    queries.select(col("query_id"))
      .join(exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact")),
        Seq("query_id"), "left")
      .withColumn("n_exact", coalesce(col("n_exact"), lit(0L)))
      .join(hits, Seq("query_id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("dcg_u", coalesce(col("dcg_u"), lit(0L)))
      .withColumn("idcg_u", coalesce(idcgOf(col("n_exact")), lit(0L)))
      .withColumn("ndcg_u",
        when(col("idcg_u") > 0, expr("dcg_u * 1000000 div idcg_u")))
      .select(col("query_id"), col("n_exact"), col("n_hit"),
        col("dcg_u"), col("idcg_u"), col("ndcg_u"))
  }
}
