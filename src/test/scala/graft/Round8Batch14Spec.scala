package graft

import org.apache.spark.sql.functions._

import graft.ops.{Pipeline, TrainingData}

/** Planted-case specs for the round-8 mixture-advisor / classifier-pipeline
  * compositions. */
class Round8Batch14Spec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    BigInt(md5hex(s).substring(0, 15), 16).toLong

  // cascade-passing text (25 tokens, stopword-rich, mwl < 5.9)
  private val clean = "the quick fox and the lazy dog of the north went to " +
    "the old town and the wise owl of the hill came to visit"
  private val clean2 = "the brave cat and the calm elk of the south came to " +
    "the new farm and the kind owl of the vale went to rest"

  test("mixtureAdvisor zeroes fully-duplicated sources and audits factors") {
    // source s: two IDENTICAL clean docs → keep 1e6, dup 1e6 → weight 0;
    // source t: one distinct clean doc → keep 1e6, dup 0 → all weight
    val docs = Seq(
      (1L, clean, "s"), (2L, clean, "s"), (3L, clean2, "t"))
      .toDF("doc_id", "text", "source")
    val out = TrainingData.mixtureAdvisor(docs).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.length == 2)
    val (ss, st) = (out(0), out(1))
    assert(ss._1 == "s" && ss._2 == 2L && ss._3 == 1000000L &&
      ss._4 == 1000000L && ss._6 == 0L)
    assert(st._1 == "t" && st._2 == 1L && st._3 == 1000000L && st._4 == 0L &&
      st._6 == 1000000L)
    // both sources' single partner is each other → equal positive mean JSD
    assert(ss._5 == st._5 && ss._5 > 0L && ss._5 <= 1000000L)
  }

  test("classifierCurated chains NB keep, exact dedup, and the hash split") {
    // NB keeps the two identical clean docs, rejects the junk pair; exact
    // dedup keeps doc 1; funnel counts 4 -> 2 -> 1 ride the row
    val docs = Seq(
      (1L, clean, "en"), (2L, clean, "en"),
      (3L, "abcdefghij klmnopqrst", "en"),
      (4L, "abcdefghij klmnopqrst", "en"))
      .toDF("doc_id", "text", "lang")
    val split = {
      val h = h60("1") % 100
      if (h < 80) "train" else if (h < 90) "val" else "test"
    }
    val out = Pipeline.classifierCurated(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq((1L, "en", split, 4L, 2L, 1L)))
  }
}
