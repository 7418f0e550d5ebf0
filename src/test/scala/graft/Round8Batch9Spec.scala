package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis, TrainingData}

/** Planted-case specs for the round-8 chooser/explainability batch:
  * LM domain shift, LSH pair evidence, packing-efficiency sweep, and the
  * balanced weak-label training set. */
class Round8Batch9Spec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def h60mod100(s: String): Long =
    (BigInt(md5hex(s).substring(0, 15), 16) % 100).toLong

  test("domainShift replays the Laplace LM gap per source exactly") {
    // one source, each doc one distinct token ("w<i>"): the train side's
    // tokens have cnt=1, the val side's are OOV (cnt=0); a mini-oracle in
    // plain Scala (same JVM ln) predicts the relation exactly
    val docs = (1L to 40L).map(i => (i, s"w$i", "src"))
      .toDF("doc_id", "text", "source")
    val splits = (1L to 40L).map(i => i -> {
      val h = h60mod100(i.toString)
      if (h < 80) "train" else if (h < 90) "val" else "test"
    }).toMap
    val nTrain = splits.values.count(_ == "train").toLong
    val nVal = splits.values.count(_ == "val").toLong
    assert(nTrain > 0 && nVal > 0) // the planted ids cover both sides
    val n = nTrain // every train token is unique → N = #train docs = V
    val v = nTrain
    def termU(cnt: Long): Long =
      math.floor((math.log((n + v + 1).toDouble)
        - math.log((cnt + 1).toDouble)) * 1000000).toLong
    val ds = TextAnalysis.domainShift(docs).collect()
    assert(ds.length == 1)
    val r = ds.head
    assert(r.getAs[String]("source") == "src")
    assert(r.getAs[Long]("n_train_tokens") == nTrain)
    assert(r.getAs[Long]("n_val_tokens") == nVal)
    assert(r.getAs[Long]("train_nll_u") == termU(1))
    assert(r.getAs[Long]("val_nll_u") == termU(0))
    assert(r.getAs[Long]("shift_u") == termU(0) - termU(1))
  }

  test("pairEvidence gives identical docs full bands, full signature, jac 1") {
    val t = "alpha beta gamma delta epsilon zeta"
    val docs = Seq((1L, t), (2L, t),
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
    val rows = Dedup.pairEvidence(docs).collect()
    val dup = rows.filter(r => r.getAs[Long]("a") == 1L &&
      r.getAs[Long]("b") == 2L)
    assert(dup.length == 1)
    val d = dup.head
    assert(d.getAs[Long]("n_bands") == 4L && d.getAs[Long]("n_sig") == 8L)
    assert(d.getAs[Long]("est_u") == 1000000L &&
      d.getAs[Long]("jac_u") == 1000000L)
    assert(!d.getAs[Boolean]("is_fp"))
    // the unrelated doc shares no shingle → no band collision with 1/2
    assert(!rows.exists(r => r.getAs[Long]("b") == 3L))
  }

  test("packingEfficiency counts bins, padding and oversize per budget") {
    // one lang, one shard; token counts 2,3,5,1 in doc order → pre =
    // 0,2,5,10
    val docs = Seq(
      (1L, "a b", "en"), (2L, "a b c", "en"),
      (3L, "a b c d e", "en"), (4L, "a", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TrainingData.packingEfficiency(docs, budgets = Seq(4, 8))
      .orderBy("budget").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // budget 4: bins ⌊pre/4⌋ = 0,0,1,2 → 3 bins; util = 11e6 div 12;
    // doc 3 (5 tokens) overflows
    assert(out(0) == ((4L, 3L, 4L, 11L, 916666L, 1L)))
    // budget 8: bins 0,0,0,1 → 2 bins; util = 11e6 div 16; none overflow
    assert(out(1) == ((8L, 2L, 4L, 11L, 687500L, 0L)))
  }

  test("weakLabelSet emits an exactly balanced set in md5 order") {
    val clean = "the quick fox and the lazy dog of the north went to " +
      "the old town and the wise owl of the hill came to visit"
    val docs = Seq(
      (1L, clean), (2L, clean), (3L, clean),
      (4L, "abcdefghij klmnopqrst")) // fires cascade rules → label 0
      .toDF("doc_id", "text")
    val out = TrainingData.weakLabelSet(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // minority class (label 0) has 1 doc → one row per label, rk = 1
    assert(out.length == 2 && out.forall(_._3 == 1L))
    assert(out.exists(t => t._1 == 4L && t._2 == 0L))
    val keptClean = out.filter(_._2 == 1L).map(_._1)
    val expected = Seq(1L, 2L, 3L).minBy(i => md5hex(i.toString))
    assert(keptClean.toSeq == Seq(expected))
  }
}
