package graft

import org.apache.spark.sql.functions._

import graft.ops.{Classifier, TextAnalysis, TrainingData}

/** Planted-case specs for the round-8 selection / shipping / classifier
  * batch: Moore–Lewis scoring, manifest diff, Naive-Bayes fit + score. */
class Round8Batch11Spec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    BigInt(md5hex(s).substring(0, 15), 16).toLong

  private def flLn(num: Double, den: Double): Long =
    math.floor((math.log(num) - math.log(den)) * 1000000).toLong

  test("mooreLewisScore signs docs by in-domain vs general cross-entropy") {
    // tok x: gen 2 / in 1; tok y: gen 2 / in 0; N_gen=4, N_in=1, V=2
    val docs = Seq(
      (1L, "x", "t"), (2L, "x", "g"), (3L, "y y", "g"))
      .toDF("doc_id", "text", "source")
    val termX = flLn(1 + 2 + 1, 1 + 1) - flLn(4 + 2 + 1, 2 + 1)
    val termY = flLn(1 + 2 + 1, 0 + 1) - flLn(4 + 2 + 1, 2 + 1)
    val out = TextAnalysis.mooreLewisScore(docs, targetSource = "t")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, "t", 1L, termX, termX < 0),
      (2L, "g", 1L, termX, termX < 0),
      (3L, "g", 2L, 2 * termY, 2 * termY < 0)))
    assert(termX < 0 && termY > 0) // the planted corpus separates cleanly
  }

  test("manifestDiff reports the positional re-shipping cascade") {
    // old bins at budget 4: {1,2} {3} {4}; removing doc 2 shifts doc 3
    // into bin 0 and doc 4 into bin 1 → changed, changed, removed
    val old = Seq(
      (1L, "a b", "en"), (2L, "a b c", "en"),
      (3L, "a b c d e", "en"), (4L, "a", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TrainingData.manifestDiff(old, old.filter(col("doc_id") =!= 2),
        budget = 4).orderBy("bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
    assert(out.toSeq == Seq(
      ("en", 0L, 0L, 2L, 2L, 5L, 7L, "changed"),
      ("en", 0L, 1L, 1L, 1L, 5L, 1L, "changed"),
      ("en", 0L, 2L, 1L, 0L, 1L, 0L, "removed")))
  }

  // clean: 25 tokens, no punct, mwl 107/25 = 4.28 → no feature fires,
  // cascade keeps; junk: 2 tokens, mwl 10.5 → long_words fires, rejected
  private val clean = "the quick fox and the lazy dog of the north went to " +
    "the old town and the wise owl of the hill came to visit"
  private val nbDocs = Seq(
    (1L, clean), (2L, clean),
    (3L, "abcdefghij klmnopqrst"), (4L, "abcdefghij klmnopqrst"))

  test("naiveBayesFit emits smoothed per-(feature, label) fire rates") {
    val out = Classifier.naiveBayesFit(nbDocs.toDF("doc_id", "text"))
      .orderBy("feature", "label").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      ("long_words", 0L, 2L, 2L, 750000L),
      ("long_words", 1L, 2L, 0L, 250000L),
      ("longish", 0L, 2L, 0L, 250000L),
      ("longish", 1L, 2L, 0L, 250000L),
      ("punct_heavy", 0L, 2L, 0L, 250000L),
      ("punct_heavy", 1L, 2L, 0L, 250000L)))
  }

  test("naiveBayesScore separates the planted classes and agrees with weak labels") {
    // non-firing features contribute 0 (symmetric counts); long_words:
    // clean term = fl(3/4) − fl(1/4), junk term = fl(1/4) − fl(3/4);
    // prior = 0 (balanced classes)
    val cleanScore = flLn(3, 4) - flLn(1, 4)
    val junkScore = flLn(1, 4) - flLn(3, 4)
    val out = Classifier.naiveBayesScore(nbDocs.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, cleanScore, 1L, true),
      (2L, 1L, cleanScore, 1L, true),
      (3L, 0L, junkScore, 0L, true),
      (4L, 0L, junkScore, 0L, true)))
  }
}
