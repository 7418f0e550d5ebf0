package graft

import java.nio.file.{Files, Paths}

/** Heavy-family physical-plan lock at sf1 — the scale PAST the
  * broadcast→shuffle flip.
  *
  * Both round-7 scale bugs (the k-core full-edge reshuffle and the
  * triangle/clustering SMJ array-payload spill) were planner-flip failures
  * that the sf0.001/sf0.1 sweeps structurally could not catch: size-based
  * decisions (broadcast thresholds, CBO file-size stats) choose different —
  * and riskier — physical operators only once the inputs outgrow the
  * thresholds. This suite compiles the ~30 probed heavy queries against the
  * 10× ScaleUp dir and applies the same risky-pattern checks, turning the
  * sf1 probes' wall-clock evidence into a locked plan contract.
  *
  * tmp/sf1 is regenerated in-process when absent (deterministic ScaleUp,
  * ~35 s), so the suite is self-contained across sessions.
  */
class PlanSweepSf1 extends SparkTestBase {

  /** The probed heavy family: every query with an sf1 wall-clock probe in
    * rounds 6–8 (graph/co-purchase, dedup/similarity candidates, text
    * aggregation, decomposition) plus the round-8 additions. */
  private val heavy = Set(
    "q36_ngram_jaccard", "q90_triangle_count", "q92_tfidf_pairs",
    "q95_profile_columns", "q97_kcore", "q102_levenshtein_pairs",
    "q105_copurchase_pairs", "q109_clustering_coeff", "q133_modularity",
    "q134_assortativity", "q150_semantic_dedup", "q154_bm25_topk",
    "q167_cdc_chunk_dedup", "q174_containment", "q176_knn_classify",
    "q181_mutual_knn", "q185_density_clusters", "q186_embedding_outliers",
    "q187_hits", "q188_matryoshka_fidelity", "q189_corpus_diversity",
    "q190_densest_subgraph", "q191_record_linkage",
    "q192_cross_source_matrix", "q193_jl_projection",
    "q194_cluster_silhouette", "q195_ann_recall", "q196_threshold_sweep",
    "q197_pretrain_pipeline", "q199_perceptual_neardups",
    "q200_canonical_parts", "q202_calibrated_dedup",
    // round-8 batch 3-5 non-trivial additions (gram, LSH-pair, vocabulary
    // and hyperplane-cell families — the shapes that flip past broadcast)
    "q206_repetition_profile", "q207_semantic_cap", "q208_hard_negatives",
    "q209_dup_cluster_profile", "q210_split_leakage_audit",
    "q211_bpe_merges", "q213_tokenizer_fertility", "q215_gram_novelty",
    "q216_cell_drift", "q217_novelty_decay", "q218_rule_matrix",
    "q219_contrastive_triplets", "q220_dataset_card",
    // round-8 batch 8/9 non-trivial additions (cell, LM-join, LSH-pair and
    // window families; q221/q223/q224 are pure map+agg, structurally linear)
    "q222_index_balance", "q225_domain_shift", "q226_pair_evidence",
    "q227_packing_efficiency", "q228_weak_label_set",
    // round-8 batch 10-13 non-trivial additions (LM joins, manifest
    // windows, vocabulary pair join, cell family, signature pass;
    // q229/q235/q237/q238/q241-q243 are map+agg or bounded rollups)
    "q230_perplexity_prune", "q231_score_calibration",
    "q232_shard_manifest", "q233_moore_lewis", "q234_manifest_diff",
    "q236_naive_bayes_score", "q239_source_divergence",
    "q240_label_purity", "q244_dup_rate_estimate",
    // batch-14 compositions (cascade + banded sig + JSD; NB chain + dedup)
    "q245_mixture_advisor", "q246_classifier_pipeline",
    // round-9 non-trivial additions: LSH-pair boundary screen, NB-chain
    // rollup, and the two value-domain window audits (q252/q253/q254 are
    // map+agg or bounded-register rollups, structurally linear)
    "q249_fuzzy_decontaminate", "q250_cohens_kappa",
    "q251_robust_outliers", "q255_ks_drift", "q256_rfm_segments",
    "q257_fuzzy_pretrain_pipeline", "q258_rfm_transitions",
    "q259_basket_lift", "q261_source_vocab_overlap",
    // round-10 non-trivial additions: the BPE vocabulary chain + encode
    // join, packing on encoded lengths, the stream-twin band join, the
    // release composition, and the vocabulary/count-domain audits
    "q262_bpe_encode", "q263_bpe_packing",
    "q264_stream_decontaminate_twin", "q265_dataset_release",
    "q266_vocab_growth", "q267_zipf_classes", "q268_bursty_tokens",
    "q270_dup_by_quality", "q271_vocab_delta", "q272_mmr_retrieval", "q273_normalized_dedup",
    // round-11 non-trivial additions: the incremental-release sig/band
    // chain, the composed IVF-PQ / cell-pool ANN layouts, the banded
    // perceptual×MinHash pair audit, the strided span islands, the
    // BM25+cosine fusion pair (q281/q289), the double-ANN nDCG chain, the
    // LM-difficulty order, and the dual-signature staleness join
    // (q277/q278/q283–q287 are map+agg or bounded rollups — structurally
    // linear, covered by the sf0.1 sweep)
    "q274_incremental_release", "q275_ivfpq_ann", "q276_mmr_cell_pool",
    "q279_pair_integrity", "q280_duplicated_extents",
    "q281_rrf_fusion", "q282_ndcg_audit", "q288_curriculum_order",
    "q289_rag_context", "q290_index_staleness", "q291_curriculum_packing",
    // round-12: the recall sweep trains the q275 index once and adds four
    // probe blocks — same IVFADC shapes, plus the exact-L2 ground truth;
    // the changelog release composes q274's increment core; the
    // multimodal keeper closes CC over the q279 union pair relation; the
    // epoch manifest rides the q288 curriculum chain; the serve twin is
    // q289's fill through the broadcast-index plan (q296 is a
    // release-series rollup — structurally linear, sf0.1 sweep covers it)
    "q292_ivfpq_recall", "q293_changelog_release", "q294_multimodal_keepers",
    "q295_epoch_curriculum", "q297_rag_serve_twin",
    // batch 2: the vector-index staleness audit re-encodes the current
    // corpus under persisted codebooks; the append path encodes the delta;
    // the span manifest rides q291's chain, the loss mask q280's
    "q298_ivfpq_staleness", "q299_ivfpq_append",
    "q300_attention_spans", "q301_repetition_mask",
    // batch 3: the DSIR bigram explode + bucket-model join, the
    // three-rater coincidence rollup (one corpus text pass), the
    // multi-probe signature joins past the broadcast flip, and the
    // impact-index pruning windows + dual retrieval joins (q304/q307/
    // q308 are map+agg or bounded rollups — structurally linear)
    "q302_dsir_select", "q303_krippendorff_alpha",
    "q305_multiprobe_lsh", "q306_impact_index",
    // batch 4: the dual idf-chain staleness join, the two-snapshot
    // append encode, the dsir-chain KL/bias rollups, and the serve twin's
    // bucket-grouped index join past the broadcast flip
    "q309_impact_staleness", "q310_impact_append", "q311_dsir_kl",
    "q312_ann_serve_twin", "q313_selection_bias",
    // batch 5: the frozen-model gate rides the dsir feature chain
    // (q314 is one map+agg — structurally linear, sf0.1 sweep covers it)
    "q315_dsir_gate",
    // batch 6: the nDCG probe blocks and the gate sweep ride the q305 /
    // q315 chains past the broadcast flip
    "q316_multiprobe_ndcg", "q317_gate_calibration",
    // round-13: the hybrid serve composes the q306 pruning windows +
    // retrieval join with the q305 probe joins, both past the flip; the
    // drift series runs the q298 re-encode + q292 ground-truth shapes
    // once per step
    "q318_hybrid_serve", "q320_ivfpq_drift_recall",
    // the admission capstone rides the q315 gate chain (model fit) +
    // a corpus scoring pass through the broadcast λ map; the ordinal
    // alpha is q303's coincidence rollup + category-dim δ joins
    "q321_ingest_admission", "q322_krippendorff_ordinal",
    // the lexical drift series replays the q306 chain per step (frozen
    // prune window + dual retrieval joins past the flip); the gate drift
    // series replays the q315 feature chain per step
    "q323_impact_drift_recall", "q324_dsir_gate_drift",
    // the cache-invalidation pair of retrieval joins rides the q306
    // posting chain past the flip
    "q325_cache_invalidation")

  private val sf1Dir = "/root/repo/tmp/sf1"

  test("heavy family plans no cartesian, single-partition exchange, global sort, or unlisted nested loop at sf1") {
    if (!Files.exists(Paths.get(sf1Dir, "documents.parquet")))
      graft.tools.ScaleUp.run(spark, s"$testData/sf0.1", sf1Dir, 10)
    val qs = Queries.all.filter(q => heavy(q.name))
    assert(qs.size === heavy.size,
      s"stale heavy list: ${heavy -- qs.map(_.name).toSet}")
    val bad = PlanSweepSupport.sweep(spark, sf1Dir, qs)
    assert(bad.isEmpty, s"risky plan patterns at sf1:\n${bad.mkString("\n")}")
  }
}
