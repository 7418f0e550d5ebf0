package graft

import org.apache.spark.sql.functions._

import graft.ops.{TextAnalysis, TrainingData}

/** Planted-case specs for the round-8 water-fill / vocab-spectrum batch. */
class Round8Batch15Spec extends SparkTestBase {
  import spark.implicits._

  test("waterFill funds small sources fully and levels the rest") {
    // avail a=2, b=4, c=100; B=10 → a,b funded (2,4), c gets (10−6)/1=4
    val c100 = (1 to 100).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, "x y", "a"), (2L, "p q r s", "b"), (3L, c100, "c"))
      .toDF("doc_id", "text", "source")
    val out = TrainingData.waterFill(docs, budgetTokens = 10L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("a", 1L, 2L, true, 2L, 1000000L),
      ("b", 1L, 4L, true, 4L, 1000000L),
      ("c", 1L, 100L, false, 4L, 40000L)))
  }

  test("waterFill with a surplus budget funds everything") {
    val docs = Seq((1L, "x y", "a"), (2L, "p q r", "b"))
      .toDF("doc_id", "text", "source")
    val out = TrainingData.waterFill(docs, budgetTokens = 100L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getBoolean(3), r.getLong(4)))
    assert(out.toSeq == Seq(("a", true, 2L), ("b", true, 3L)))
  }

  test("vocabSpectrum bins the count-of-counts with hapax share riding") {
    // counts: a×4 (bin 2), b×2 (bin 1), c×1, d×1 (bin 0) → hapax 2/4
    val docs = Seq((1L, "a a b c"), (2L, "a a b d"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabSpectrum(docs).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, 2L, 2L, 4L, 8L, 500000L),
      (1L, 1L, 2L, 4L, 8L, 500000L),
      (2L, 1L, 4L, 4L, 8L, 500000L)))
  }
}
