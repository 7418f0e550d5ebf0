package graft

import org.apache.spark.sql.functions._

import graft.ops.{Similarity, TrainingData}

/** Planted-case specs for the round-8 product batch: contrastive triplets
  * and the dataset card. */
class Round8Batch7Spec extends SparkTestBase {
  import spark.implicits._

  test("contrastiveTriplets pairs the top positive with band negatives only") {
    val a = Array(1f, 0f)      // anchor
    val p = Array(0.9f, 0.1f)  // cos ≈ 0.994 with a → positive
    val m = Array(0.6f, 0.8f)  // cos 0.6 with a → in [0.5, 0.9) band
    val f = Array(0f, 1f)      // cos 0 with a → below lo
    val emb = Seq((1L, a), (2L, p), (3L, m), (4L, f))
      .toDF("vec_id", "embedding")
    val out = Similarity.contrastiveTriplets(emb, posCut = 0.9, lo = 0.5,
        hi = 0.9, k = 2, cellK = 1)
      .select("anchor", "positive", "negative").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ofA = out.filter(_._1 == 1L)
    assert(ofA.nonEmpty && ofA.forall(t => t._2 == 2L && t._3 == 3L))
    // the far vector has no positive → emits nothing
    assert(!out.exists(_._1 == 4L))
    // the mid vector has no >= 0.9 positive → emits nothing
    assert(!out.exists(_._1 == 3L))
  }

  test("datasetCard composes exact corpus, dup, and reject scalars") {
    val clean = "the quick fox and the lazy dog of the north went to " +
      "the old town and the wise owl of the hill came to visit"
    val docs = Seq(
      (1L, clean, "en", "web"), (2L, clean, "en", "web"),
      (3L, "abcdefghij klmnopqrst", "de", "books"))
      .toDF("doc_id", "text", "lang", "source")
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val out = TrainingData.datasetCard(docs, pairs).head
    assert(out.getAs[Long]("n_docs") == 3L)
    assert(out.getAs[Long]("n_tokens") == 25L + 25L + 2L)
    assert(out.getAs[Long]("n_sources") == 2L &&
      out.getAs[Long]("n_langs") == 2L)
    assert(out.getAs[Long]("n_dup_pairs") == 1L &&
      out.getAs[Long]("n_dup_docs") == 2L)
    // doc 3 fires too_short/low_stopword/long_words → 1 rejected
    assert(out.getAs[Long]("n_rejected") == 1L)
    assert(out.getAs[Long]("dup_u") == 666666L &&
      out.getAs[Long]("reject_u") == 333333L)
  }
}
