package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

/** Planted-case specs for the round-8 audit batch: novelty decay by
  * ingestion batch and the cascade rule co-fire matrix. */
class Round8Batch6Spec extends SparkTestBase {
  import spark.implicits._

  test("noveltyDecay charges redundancy to the later arrival's batch") {
    val docs = ((1L to 99L) ++ (100L to 199L)).map(i => (i, s"doc $i"))
      .toDF("doc_id", "text")
    val pairs = Seq((50L, 150L), (10L, 20L)).toDF("a", "b")
    val out = Dedup.noveltyDecay(docs, pairs).orderBy("batch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // batch 0 (ids 1-99): doc 20 is the later side of (10, 20) → 1 of 99;
    // batch 1 (ids 100-199): doc 150 later side of (50, 150) → 1 of 100
    assert(out.length == 2)
    assert(out(0) == ((0L, 99L, 1L, 1000000L / 99L)))
    assert(out(1) == ((1L, 100L, 1L, 10000L)))
  }

  test("ruleMatrix counts diagonal kills and co-fires; clean docs absent") {
    // doc 1 fires too_short + low_stopword + long_words (2 long tokens,
    // no stopwords); doc 2 is clean (25 tokens incl. stopwords)
    val clean = ("the quick fox and the lazy dog of the north went to " +
      "the old town and the wise owl of the hill came to visit")
    val docs = Seq(
      (1L, "abcdefghij klmnopqrst"), (2L, clean)).toDF("doc_id", "text")
    val out = TextAnalysis.ruleMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val rs = Seq("long_words", "low_stopword", "too_short")
    val expect = (for {
      i <- rs.indices; j <- i until rs.size
    } yield (rs(i), rs(j), 1L)).toSet
    assert(out == expect)
  }
}
