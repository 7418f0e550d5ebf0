package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming fuzzy eval-set decontamination — q249
  * ([[graft.ops.Dedup.fuzzyDecontaminate]]) at INGEST: as documents
  * arrive, which of them near-duplicate a HELD-OUT benchmark document?
  * Contaminated docs are flagged (and can be dropped) before they ever
  * land in the training corpus, closing the hygiene loop q249 runs in
  * batch.
  *
  * Shape — stream-static, fully STATELESS (contrast
  * [[NearDupStream.nearDupStream]], whose corpus-vs-itself semantics force
  * per-bucket state):
  *
  *  - the benchmark side is STATIC and small (an eval suite is KB–MB
  *    against a 100 TB corpus), so its banded signature index
  *    ([[NearDupStream.bandedDocs]] — the same native shingle/MinHash
  *    codegen expressions as the batch path) BROADCASTS to every executor;
  *  - each arriving doc bands per-row (stateless projection) and hash-joins
  *    the broadcast index on (band, key) — the LSH bucket equi-join,
  *    per-micro-batch, no shuffle of the stream side;
  *  - candidates verify by native merge-intersect Jaccard (identical
  *    floor-µ arithmetic to the batch verify, so stream ≡ batch holds
  *    bitwise);
  *  - a pair colliding in several bands emits ONCE: both band-key vectors
  *    ride the joined row, so the "emit only from the first shared band"
  *    rule of NearDupStream applies as a row-local FILTER — exactly-once
  *    without any stateful operator.
  *
  * Zero stateful ops ⇒ no state store, no watermark, append mode, and the
  * plan runs identically on a batch DataFrame (the q264 twin query + the
  * stream≡batch spec drive both).
  *
  * The caller supplies disjoint sides (`docs` must not contain benchmark
  * rows); the per-doc rollup (q249's n_bench_hits/max_j_u/bench_id_min) is
  * a downstream `groupBy(drop_id)` — kept out of the stream so the
  * streaming plan needs no aggregation state.
  *
  * @return (drop_id, bench_id, j_u): one row per contaminated
  *         (arriving doc, benchmark doc) pair, j_u = floor-µ Jaccard
  */
object DecontaminateStream {

  def fuzzyDecontaminateStream(
      spark: SparkSession,
      docs: DataFrame,
      bench: DataFrame,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      threshold: Double = 0.8): DataFrame = {
    val benchIdx = NearDupStream.bandedDocs(spark, bench, numHashes, rowsPerBand)
      .toDF().select(col("band"), col("key"), col("doc_id").as("bench_id"),
        col("arr").as("bench_arr"), col("allKeys").as("bench_keys"))
    val s = NearDupStream.bandedDocs(spark, docs, numHashes, rowsPerBand).toDF()
    s.join(broadcast(benchIdx), Seq("band", "key"))
      // first-shared-band (row-local exactly-once): both key vectors are on
      // the row, so "is THIS band the earliest the two docs agree on?" is a
      // plain filter — array_position is 1-based, band is 0-based
      .filter(array_position(
        zip_with(col("allKeys"), col("bench_keys"), (x, y) => x === y),
        true) - 1 === col("band"))
      .select(col("doc_id").as("drop_id"), col("bench_id"),
        graft.expr.VectorOps.sortedArrayIntersect(col("arr"), col("bench_arr"))
          .as("inter"),
        size(col("arr")).cast("long").as("sz_a"),
        size(col("bench_arr")).cast("long").as("sz_b"))
      // identical floor-µ arithmetic to Dedup.verifyJaccardArrays
      .withColumn("jaccard",
        floor(col("inter").cast("double")
          / (col("sz_a") + col("sz_b") - col("inter")).cast("double")
          * 1000000d) / 1000000d)
      .filter(col("jaccard") >= threshold)
      .select(col("drop_id"), col("bench_id"),
        round(col("jaccard") * 1000000d).cast("long").as("j_u"))
  }
}
