package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FreshCheckpoint

/** End-to-end training-corpus pipeline — the COMPOSED product the individual
  * operators exist for (the reference's own value is its composed chain,
  * `Makefile:1-13`: extract → build → link → serve; this is the
  * LLM-data-curation equivalent over `documents`):
  *
  *   1. [[TextAnalysis.filterCascade]] — quality gate (audited reject
  *      reasons), keep only clean docs;
  *   2. [[TextAnalysis.lineDedup]] — strip corpus-frequent boilerplate
  *      segments from the survivors' text;
  *   3. ONE banded MinHash pass at the LOOSE threshold, cut two ways:
  *      pairs ≥ 0.8 close into clusters and [[Dedup.clusterKeepers]] keeps
  *      the best copy (dedup), while the full ≥ 0.5 pair set is remembered
  *      for the split stage — the near-dups that SURVIVE dedup are exactly
  *      the 0.5–0.8 band, and they must not straddle train/test;
  *   4. [[TextAnalysis.decontaminate]] — benchmark docs (held-out slice)
  *      knock out every training doc sharing an 8-gram, then leave the
  *      corpus themselves;
  *   5. [[TrainingData.leakageSafeSplit]] — cluster-unit assignment over
  *      the surviving near-dup pairs;
  *   6. [[TrainingData.sequencePacking]] — the train split laid into
  *      fixed-token-budget bins.
  *
  * Per-stage row accounting rides every output row as scalar columns
  * (n_raw → n_cascade → n_dedup → n_clean → n_train), so the relation is
  * its own funnel audit — the first thing a pipeline owner asks for.
  *
  * Scale shape: every stage is the already-probed operator (banded LSH,
  * O(log n) CC, gram-keyed equi-joins, sharded packing windows); the
  * composition adds only semi-joins on doc_id between stages and five
  * 1-row scalar attaches. Stage boundaries are checkpointed so no stage's
  * subtree is re-derived by its consumers.
  */
object Pipeline {

  /** @param benchMod docs with doc_id % benchMod == 0 play the held-out
    *        benchmark slice for decontamination
    * @param fuzzyCut when set, stage 4 additionally drops train docs whose
    *        verified MinHash Jaccard against ANY bench doc reaches the cut
    *        (the near-dup reading of decontamination — paraphrased eval
    *        leakage survives the exact 8-gram screen but not a Jaccard
    *        one). REUSES the stage-3 banded pair relation: the screen is a
    *        filter + anti-join on already-materialized pairs, zero extra
    *        corpus passes; the funnel gains an n_fuzzy_clean column.
    *        MUST be ≥ 0.5 (the stage-3 LSH threshold) — a lower cut could
    *        not be honored off the stage-3 relation, which only holds
    *        pairs with estimated Jaccard ≥ 0.5, so the screen would
    *        silently under-drop; enforced with a `require`
    * @return one row per (lang, shard, bin) of the packed TRAIN split:
    *         (lang, shard, bin, n_docs, sum_tokens, first_doc, last_doc,
    *         n_raw, n_cascade, n_dedup, n_clean[, n_fuzzy_clean], n_train)
    */
  def pretrainCorpus(docs: DataFrame, budget: Int = 2048,
      shardDocs: Int = 128, benchMod: Int = 7,
      fuzzyCut: Option[Double] = None): DataFrame = {
    val st = runStages(docs, benchMod, fuzzyCut)
    val packed = TrainingData.sequencePacking(st.train, budget, "lang",
      shardDocs)
    // funnel accounting — five 1-row scalar attaches
    def cnt(df: DataFrame, name: String) =
      broadcast(df.agg(count(lit(1)).as(name)))
    val base = packed
      .crossJoin(cnt(st.raw, "n_raw"))
      .crossJoin(cnt(st.kept1, "n_cascade"))
      .crossJoin(cnt(st.docs3, "n_dedup"))
      .crossJoin(cnt(st.docs4x, "n_clean"))
    (if (fuzzyCut.isDefined) base.crossJoin(cnt(st.docs4, "n_fuzzy_clean"))
     else base)
      .crossJoin(cnt(st.train, "n_train"))
  }

  /** The checkpointed stage relations of ONE pipeline run, shared by
    * [[pretrainCorpus]] (which packs + attaches the funnel) and
    * [[datasetRelease]] (which composes the release record) so neither
    * re-derives a stage the other proved. */
  private case class Stages(raw: DataFrame, kept1: DataFrame,
      docs3: DataFrame, docs4x: DataFrame, docs4: DataFrame,
      pairsAll: DataFrame, pairs4: DataFrame, split: DataFrame,
      train: DataFrame)

  private def runStages(docs: DataFrame, benchMod: Int,
      fuzzyCut: Option[Double]): Stages = {
    require(fuzzyCut.forall(_ >= 0.5),
      s"fuzzyCut=$fuzzyCut is below the stage-3 LSH threshold (0.5): the " +
        "pair relation only holds pairs with jaccard >= 0.5, so a lower " +
        "cut would silently under-drop")
    val raw = docs.select(col("doc_id"), col("lang"), col("text"))
    // 1. quality cascade
    val kept1 = FreshCheckpoint(raw.join(
      TextAnalysis.filterCascade(docs).filter(col("keep"))
        .select(col("doc_id")),
      Seq("doc_id"), "leftsemi"))
    // 2. boilerplate line dedup (segment frequencies measured on the
    // POST-cascade corpus — junk docs must not inflate line counts)
    val docs2 = FreshCheckpoint(
      kept1.select(col("doc_id"), col("lang"))
        .join(TextAnalysis.lineDedup(kept1, sep = " line ", maxOcc = 2)
          .select(col("doc_id"), col("text_dedup").as("text")), Seq("doc_id")))
    // 3. one banded pass, two cuts
    val pairsAll = FreshCheckpoint(
      Dedup.minhashLsh(docs2, numHashes = 8, rowsPerBand = 2, threshold = 0.5))
    val pairs08 = pairsAll.filter(col("jaccard") >= 0.8)
      .select(col("a"), col("b"))
    val keepers = Dedup.clusterKeepers(docs2, pairs08)
    val docs3 = FreshCheckpoint(docs2.join(
      keepers.filter(col("keep")).select(col("doc_id")),
      Seq("doc_id"), "leftsemi"))
    // 4. benchmark decontamination (bench docs leave with the slice)
    val isBench = col("doc_id") % benchMod === 0
    val contaminated = TextAnalysis.decontaminate(docs3, isBench, n = 8)
      .select(col("train_doc").as("doc_id")).distinct()
    val docs4x = FreshCheckpoint(docs3.filter(!isBench)
      .join(contaminated, Seq("doc_id"), "left_anti"))
    // 4b. optional fuzzy screen — near-dup partners of bench docs, off the
    // ALREADY-materialized stage-3 pair relation (no new corpus pass)
    val docs4 = fuzzyCut match {
      case Some(cut) =>
        val fc = pairsAll.filter(col("jaccard") >= cut)
          .filter((col("a") % benchMod === 0) =!= (col("b") % benchMod === 0))
          .select(when(col("a") % benchMod === 0, col("b")).otherwise(col("a"))
            .as("doc_id"))
          .distinct()
        FreshCheckpoint(docs4x.join(fc, Seq("doc_id"), "left_anti"))
      case None => docs4x
    }
    // 5. leakage-safe split over the near-dup pairs that survived dedup
    val ids4 = docs4.select(col("doc_id"))
    val pairs4 = pairsAll.select(col("a"), col("b"))
      .join(ids4.select(col("doc_id").as("a")), Seq("a"), "leftsemi")
      .join(ids4.select(col("doc_id").as("b")), Seq("b"), "leftsemi")
    val split = FreshCheckpoint(TrainingData.leakageSafeSplit(docs4, pairs4))
    // 6. the train slice (what stage 7 packs / the release card describes)
    val train = docs4.join(split.filter(col("split") === "train")
      .select(col("doc_id")), Seq("doc_id"), "leftsemi")
    Stages(raw, kept1, docs3, docs4x, docs4, pairsAll, pairs4, split, train)
  }

  /** The shippable dataset-release record — ONE row composing what every
    * stage of [[pretrainCorpus]] proves separately: the funnel scalars,
    * the [[TrainingData.datasetCard]] datasheet over the RELEASED train
    * docs, the [[TrainingData.shardManifest]] totals (incl. the global
    * order-independent content digest), and the
    * [[TrainingData.splitLeakageAudit]] totals — all over the SAME run,
    * so the published numbers are the numbers the pipeline acted on, and
    * their internal consistency (card docs ≡ funnel n_train ≡ manifest
    * doc sum; card tokens ≡ manifest token sum; zero cascade-rejected
    * released docs; zero split-straddling near-dup pairs) is checkable in
    * the one relation.
    *
    * Scale shape: every component is a global aggregate of a checkpointed
    * stage relation (1-row or 3-row), crossed together as broadcast
    * attaches; the split is reused from the run (the audit does NOT
    * re-derive connected components).
    *
    * @return 1 row: (n_raw, n_cascade, n_dedup, n_clean, n_train,
    *         card_docs, card_tokens, card_chars, n_sources, n_langs,
    *         n_dup_pairs, n_dup_docs, card_rejected, n_manifest_bins,
    *         manifest_docs, manifest_tokens, manifest_digest,
    *         leak_doc_pairs, leak_shared_grams, leak_straddle)
    */
  def datasetRelease(docs: DataFrame, budget: Int = 2048,
      shardDocs: Int = 128, benchMod: Int = 7): DataFrame = {
    val st = runStages(docs, benchMod, None)
    // card over the RELEASED train docs, source re-attached from the input;
    // dup mass = surviving near-dup pairs INSIDE the release
    val trs = st.train.join(docs.select(col("doc_id"), col("source")),
      Seq("doc_id"))
    val trainIds = st.train.select(col("doc_id"))
    val pairsTrain = st.pairs4
      .join(trainIds.select(col("doc_id").as("a")), Seq("a"), "leftsemi")
      .join(trainIds.select(col("doc_id").as("b")), Seq("b"), "leftsemi")
    val card = TrainingData.datasetCard(trs, pairsTrain)
      .select(col("n_docs").as("card_docs"),
        col("n_tokens").as("card_tokens"), col("n_chars").as("card_chars"),
        col("n_sources"), col("n_langs"), col("n_dup_pairs"),
        col("n_dup_docs"), col("n_rejected").as("card_rejected"))
    val manifest = TrainingData.shardManifest(st.train, budget, "lang",
        shardDocs)
      .agg(count(lit(1)).as("n_manifest_bins"),
        coalesce(sum(col("n_docs")), lit(0L)).as("manifest_docs"),
        coalesce(sum(col("sum_tokens")), lit(0L)).as("manifest_tokens"),
        coalesce(expr("bit_xor(digest)"), lit(0L)).as("manifest_digest"))
    val audit = TrainingData
      .splitLeakageAuditWith(st.docs4, st.pairs4,
        st.split.select(col("doc_id"), col("split")))
      .agg(sum(col("n_doc_pairs")).as("leak_doc_pairs"),
        sum(col("n_shared_grams")).as("leak_shared_grams"),
        sum(col("n_straddle")).as("leak_straddle"))
    def cnt(df: DataFrame, name: String) =
      broadcast(df.agg(count(lit(1)).as(name)))
    cnt(st.raw, "n_raw")
      .crossJoin(cnt(st.kept1, "n_cascade"))
      .crossJoin(cnt(st.docs3, "n_dedup"))
      .crossJoin(cnt(st.docs4x, "n_clean"))
      .crossJoin(cnt(st.train, "n_train"))
      .crossJoin(broadcast(card))
      .crossJoin(broadcast(manifest))
      .crossJoin(broadcast(audit))
  }

  /** Classifier-in-the-loop curation — the learned twin of
    * [[pretrainCorpus]]'s rule cascade (the CCNet shape: a cheap model
    * fit on weak labels does the keeping, so the decision boundary
    * generalizes past the rules that bootstrapped it):
    * [[Classifier.naiveBayesScore]] keep → exact-hash dedup keepers →
    * [[TrainingData.hashSplit]], with the funnel counts riding every row
    * as 1-row scalar attaches (same accounting contract as q197).
    *
    * Scale shape: two per-row scoring passes + one md5 groupBy + a pure
    * projection split; three 1-row count attaches.
    *
    * @return (doc_id, lang, split, n_raw, n_kept, n_unique)
    */
  def classifierCurated(docs: DataFrame): DataFrame = {
    val raw = docs.select(col("doc_id"), col("lang"), col("text"))
    val kept = FreshCheckpoint(raw.join(
      Classifier.naiveBayesScore(docs).filter(col("pred_label") === 1)
        .select(col("doc_id")), Seq("doc_id"), "leftsemi"))
    val uniq = FreshCheckpoint(kept.join(
      Dedup.exact(kept).select(col("keep_id").as("doc_id")),
      Seq("doc_id"), "leftsemi"))
    def cnt(df: DataFrame, name: String) =
      broadcast(df.agg(count(lit(1)).as(name)))
    TrainingData.hashSplit(uniq)
      .crossJoin(cnt(raw, "n_raw"))
      .crossJoin(cnt(kept, "n_kept"))
      .crossJoin(cnt(uniq, "n_unique"))
  }
}
