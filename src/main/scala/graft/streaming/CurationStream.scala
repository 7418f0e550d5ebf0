package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Streaming curation — the per-row slice of the batch pretraining pipeline
  * ([[graft.ops.Pipeline.pretrainCorpus]] stages 1 and 4's hygiene rules plus
  * the PII audit) run ON INGEST, so a document is accepted or rejected the
  * moment it arrives instead of in the next batch rebuild.
  *
  * Composition (all stateless, codegen-friendly, one projection):
  *   1. quality cascade — the SAME four reject rules as
  *      [[TextAnalysis.filterCascade]] (too_short / low_stopword /
  *      high_repetition / long_words), with the repetition ratio computed as
  *      a pure array expression (`1 - |distinct tokens| / |tokens|`, floor
  *      micro-units) instead of the batch path's per-doc aggregate — same
  *      value, zero state, so the plan stays append-mode with no watermark;
  *   2. PII audit — [[TextAnalysis.piiScrub]]'s four pattern classes,
  *      per-row;
  *   3. known-duplicate drop — a stream-static LEFT ANTI join against
  *      `knownDups` (doc_id), e.g. the non-keeper side of a persisted
  *      [[graft.ops.Dedup.clusterKeepers]] election; the static side is
  *      re-read per micro-batch, so republishing the index updates the
  *      filter without restarting the stream. (Full *incremental* near-dup
  *      state lives in [[NearDupStream]]; composing it downstream of this
  *      operator is one `nearDupStream(curationStream(...))` call.)
  *
  * Stream ≡ batch: the same function accepts a batch DataFrame and returns
  * the identical relation (CurationStreamSpec drives multi-batch arrival
  * orders against the batch run).
  *
  * Scale shape: one stateless projection + one anti-join keyed on doc_id
  * whose static side is the (small) reject list — nothing corpus-sized is
  * held as state, and throughput is bounded by regex evaluation, not
  * shuffles.
  *
  * @return survivors only (rejected docs produce no row):
  *         (doc_id, lang, n_tokens, rep_ratio, n_redacted, masked_len)
  */
object CurationStream {

  def curationStream(docs: DataFrame, knownDups: DataFrame): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), x => x =!= "")
    val qcols = TextAnalysis.qualityColumns(col("text"))
    val q = docs.select(Seq(col("doc_id"), col("lang"), col("text")) ++
      qcols.map { case (n, c) => c.as(n) }: _*)
      // per-row twin of repetitionRatio(docs, 1): 1-grams are the token
      // array itself, so uniq/total needs no shuffle. Zero-token docs get
      // NULL via the explicit guard, matching the batch LEFT join's NULL
      // rep_ratio (ANSI mode makes a bare 0/0 THROW, not NULL).
      .withColumn("rep_ratio",
        when(size(toks) > 0,
          floor((lit(1.0) - size(array_distinct(toks)).cast("double")
            / size(toks).cast("double")) * 1000000d) / 1000000d))
    val rules: Seq[Column] = Seq(
      col("n_tokens") < 20,
      col("stopword_ratio") < 0.02,
      col("rep_ratio") > 0.65,
      col("mean_word_len") > 5.9)
    TextAnalysis.piiScrub(
      q.filter(!rules.map(r => coalesce(r, lit(false))).reduce(_ || _)),
      carry = Seq("lang", "n_tokens", "rep_ratio"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("rep_ratio"),
        col("n_redacted"), col("masked_len"))
      .join(knownDups.select(col("doc_id")), Seq("doc_id"), "left_anti")
  }
}
