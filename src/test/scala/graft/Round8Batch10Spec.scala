package graft

import org.apache.spark.sql.functions._

import graft.ops.{Privacy, TextAnalysis, TrainingData}

/** Planted-case specs for the round-8 disclosure / pruning-plan /
  * calibration / manifest batch: l-diversity audit, perplexity prune plan,
  * score calibration, shard manifest. */
class Round8Batch10Spec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    BigInt(md5hex(s).substring(0, 15), 16).toLong

  test("lDiversityAudit counts low-diversity class and row mass per spine l") {
    // classes: A sz=3 dv=2, B sz=1 dv=1, C sz=3 dv=3 → 3 classes, 7 rows
    val rows = Seq(
      ("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "x"),
      ("C", "x"), ("C", "y"), ("C", "z")).zipWithIndex
      .map { case ((q, s), i) => (i.toLong, q, s) }.toDF("id", "q", "s")
    val out = Privacy.lDiversityAudit(rows, Seq(col("q")), col("s"),
        ls = Seq(2, 3)).orderBy("l").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // l=2: only B (dv 1) → 1 class, 1 row, 1e6/7 = 142857
    assert(out(0) == ((2L, 3L, 7L, 1L, 1L, 142857L)))
    // l=3: A and B → 2 classes, 4 rows, 4e6/7 = 571428
    assert(out(1) == ((3L, 3L, 7L, 2L, 4L, 571428L)))
  }

  test("perplexityPrune bins per-source NLL mass and cuts head/tail by start") {
    // 9 docs of the common token, 1 of the rare: N=10, nll(common) =
    // ln(10/9) → bin 1, nll(rare) = ln(10) → bin 23
    val docs = ((1L to 9L).map(i => (i, "common", "s")) :+
      ((10L, "rare", "s"))).toDF("doc_id", "text", "source")
    val binCommon = math.floor(
      (math.log(10d) - math.log(9d)) * 1000000).toLong / 100000
    val binRare = math.floor(math.log(10d) * 1000000).toLong / 100000
    val out = TextAnalysis.perplexityPrune(docs).orderBy("bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    // common bin starts at 0 of 10 → head; rare starts at 9/10 → tail
    assert(out.toSeq == Seq(
      ("s", binCommon, 9L, 0L, 10L, "head"),
      ("s", binRare, 1L, 9L, 10L, "tail")))
  }

  test("scoreCalibration reports per-bin accuracy, confidence, gap and ECE") {
    // clean text: 25 tokens, 12 stopword hits → ratio 0.48 exactly → score
    // 480000 → bin 4, cascade keeps; junk: 2 tokens, no stopwords → bin 0,
    // too_short rejects
    val clean = "the quick fox and the lazy dog of the north went to " +
      "the old town and the wise owl of the hill came to visit"
    val docs = Seq(
      (1L, clean), (2L, clean),
      (3L, "abcdefghij klmnopqrst"), (4L, "abcdefghij klmnopqrst"))
      .toDF("doc_id", "text")
    val out = TrainingData.scoreCalibration(docs).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (0L, 2L, 0L, 0L, 0L, 0L, 0L),
      // acc 1e6, conf 480000, gap 520000, ece term = 2·520000/4
      (4L, 2L, 2L, 1000000L, 480000L, 520000L, 260000L)))
  }

  test("shardManifest emits per-bin mass, fill and order-independent digest") {
    // token counts 2,3,5,1 → pre 0,2,5,10 → bins 0,0,1,2 at budget 4
    val docs = Seq(
      (1L, "a b", "en"), (2L, "a b c", "en"),
      (3L, "a b c d e", "en"), (4L, "a", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TrainingData.shardManifest(docs, budget = 4)
      .orderBy("bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
    assert(out.toSeq == Seq(
      ("en", 0L, 0L, 2L, 5L, 1250000L, h60("m:1") ^ h60("m:2"), 1L, 2L),
      ("en", 0L, 1L, 1L, 5L, 1250000L, h60("m:3"), 3L, 3L),
      ("en", 0L, 2L, 1L, 1L, 250000L, h60("m:4"), 4L, 4L)))
  }
}
