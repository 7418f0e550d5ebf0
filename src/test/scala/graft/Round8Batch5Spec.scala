package graft

import org.apache.spark.sql.functions._

import graft.ops.{Similarity, TextAnalysis, TrainingData}

/** Planted-case specs for the round-8 monitoring batch: epoch weighting,
  * n-gram novelty, embedding cell drift. */
class Round8Batch5Spec extends SparkTestBase {
  import spark.implicits._

  test("epochMix replicates by quality tier with deterministic order keys") {
    // doc 1: all stopwords → ratio ≈ 1 → bin 9 → 3 epochs;
    // doc 2: one stopword in four tokens → ratio 0.25 → bin 2 → 3 epochs;
    // doc 3: no stopwords → bin 0 → 1 epoch
    val docs = Seq(
      (1L, "the a of to the"),
      (2L, "the xx yy zz"),
      (3L, "xx yy zz ww")).toDF("doc_id", "text")
    val out = TrainingData.epochMix(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.count(_._1 == 1L) == 3)
    assert(out.count(_._1 == 2L) == 3)
    assert(out.count(_._1 == 3L) == 1)
    // copies number 1..epochs
    assert(out.filter(_._1 == 1L).map(_._3).sorted.toSeq == Seq(1L, 2L, 3L))
    // order keys are distinct across copies (the interleave is real)
    val keys = TrainingData.epochMix(docs).select("order_key").collect()
      .map(_.getString(0))
    assert(keys.distinct.length == keys.length)
  }

  test("gramNovelty separates unique from corpus-shared grams") {
    // docs 1 and 2 share their whole text (all grams df = 2); doc 3 is
    // half-shared: "c1 c2 c3 c4" yields "c1 c2 c3", "c2 c3 c4" both unique
    val docs = Seq(
      (1L, "s1 s2 s3 s4"), (2L, "s1 s2 s3 s4"),
      (3L, "s1 s2 s3 u4 u5")).toDF("doc_id", "text")
    val out = TextAnalysis.gramNovelty(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // doc 1/2: grams "s1 s2 s3" (df 3 — doc 3 has it too) and "s2 s3 s4"
    // (df 2) → novelty 0
    assert(out(0) == ((1L, 2L, 0L, 0L)))
    assert(out(1) == ((2L, 2L, 0L, 0L)))
    // doc 3: "s1 s2 s3" shared; "s2 s3 u4", "s3 u4 u5" unique → 2/3
    assert(out(2) == ((3L, 3L, 2L, 666666L)))
  }

  test("cellDrift imbalance is zero for proportional cells, sharp for drifted") {
    // two antipodal cells; ref/cur split: cell A all ref, cell B all cur —
    // maximal drift in both cells
    val up = Array(1f, 0f, 0f, 0f)
    val dn = Array(-1f, 0f, 0f, 0f)
    val emb = ((0L until 8L).map(i => (i, up)) ++
      (8L until 16L).map(i => (i, dn))).toDF("vec_id", "embedding")
    val drifted = Similarity.cellDrift(emb, col("vec_id") < 8)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(drifted.length == 2)
    // totals 8/8: |8·8 − 0·8| = 64 on both cells
    assert(drifted.forall(t => t._3 == 64L))
    // parity split puts 4 ref + 4 cur in each cell → perfectly
    // proportional, imbalance 0 everywhere
    val even = Similarity.cellDrift(emb, col("vec_id") % 2 === 0)
      .collect().map(_.getLong(3))
    assert(even.forall(_ == 0L))
  }
}
