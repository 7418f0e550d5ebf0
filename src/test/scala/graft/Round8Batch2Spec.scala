package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.TrainingData
import graft.streaming.CurationStream

/** Planted-case specs for the round-8 mixture/budget/streaming-curation
  * batch: exact temperature-mixing takes, token-budget boundary fill, and
  * the streaming curation composition (batch twin ≡ stream). */
class Round8Batch2Spec extends SparkTestBase {
  import spark.implicits._

  private def mixDocs = {
    val rows =
      (1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 125).map(i => (i.toLong, "mid")) ++
      (126 to 129).map(i => (i.toLong, "small")) ++
      Seq((130L, "tiny"))
    rows.toDF("doc_id", "source")
  }

  test("mixtureSample takes exactly min(n_s, targetDocs*w_s div W) per source") {
    // α = 0.5: n = (100, 25, 4, 1) → w = (10, 5, 2, 1), W = 18; target 18
    // divides exactly, so take_s = w_s
    val half = TrainingData.mixtureSample(mixDocs, targetDocs = 18,
      temperature = 0.5)
      .groupBy(col("source")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(half === Map("big" -> 10L, "mid" -> 5L, "small" -> 2L, "tiny" -> 1L))

    // α = 0: uniform w = 1, W = 4; target 8 → take = min(n_s, 2)
    val uni = TrainingData.mixtureSample(mixDocs, targetDocs = 8,
      temperature = 0.0)
      .groupBy(col("source")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni === Map("big" -> 2L, "mid" -> 2L, "small" -> 2L, "tiny" -> 1L))

    // α = 1: proportional, W = 130; target 13 → take = n_s div 10 (small
    // sources round to zero — the plain-subsample behavior α < 1 fixes)
    val prop = TrainingData.mixtureSample(mixDocs, targetDocs = 13,
      temperature = 1.0)
      .groupBy(col("source")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prop === Map("big" -> 10L, "mid" -> 2L))
  }

  test("mixtureSample is deterministic and keeps the md5-rank prefix") {
    val a = TrainingData.mixtureSample(mixDocs, targetDocs = 18)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val b = TrainingData.mixtureSample(mixDocs, targetDocs = 18)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(a === b)
    // rank cut property: every kept rk ≤ take and ranks are 1..take dense
    val rks = TrainingData.mixtureSample(mixDocs, targetDocs = 18)
      .select(col("source"), col("rk"), col("take")).collect()
    rks.foreach(r => assert(r.getLong(1) <= r.getLong(2)))
    val bySrc = rks.groupBy(_.getString(0))
    bySrc.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === (1L to rows.length).toSeq)
    }
  }

  test("budgetSelect keeps full better bins and fills the boundary bin to the budget") {
    // A docs: 3 isolated ' the ' hits in 7 tokens → ratio 3/7 → bin 4
    // B docs: no stopwords → bin 0; 4 tokens each
    val a = (1 to 3).map(i => (i.toLong, "x the x the x the x"))
    val b = (11 to 20).map(i => (i.toLong, "alpha beta gamma delta"))
    val docs = (a ++ b).toDF("doc_id", "text")
    // budget 31: bin 4 fits whole (21), remaining 10 admits 2 B docs (8)
    val out = TrainingData.budgetSelect(docs, budgetTokens = 31, bins = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    val (binA, binB) = out.partition(_._2 == 4L)
    assert(binA.length === 3 && binA.forall(!_._4), s"bin-4 rows: ${binA.toSeq}")
    assert(binB.length === 2 && binB.forall(r => r._2 == 0L && r._4),
      s"boundary rows: ${binB.toSeq}")
    assert(out.map(_._3).sum === 29L) // 21 + 8 ≤ 31, next doc would breach
    // determinism of the boundary fill
    val again = TrainingData.budgetSelect(docs, budgetTokens = 31, bins = 10)
      .collect().map(r => r.getLong(0)).toSet
    assert(again === out.map(_._1).toSet)
  }

  test("budgetSelect keeps everything when the budget covers the corpus") {
    val docs = (1 to 5).map(i => (i.toLong, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val out = TrainingData.budgetSelect(docs, budgetTokens = 1000)
    assert(out.count() === 5)
    assert(out.filter(col("boundary")).count() === 0)
  }

  private val goodText = "the quick brown fox jumps over a lazy dog and " +
    "then ran to the hills of green where birds sing low contact " +
    "bob@example.com now"

  test("curationStream (batch): cascade rejects, PII audits, known dups drop") {
    val docs = Seq(
      (1L, "en", goodText),            // survives; one email
      (2L, "en", "tiny doc"),          // too_short
      (3L, "en", goodText),            // known dup → anti-joined away
      (4L, "en", ("the " * 30).trim))  // high repetition
      .toDF("doc_id", "lang", "text")
    val dups = Seq(3L).toDF("doc_id")
    val out = CurationStream.curationStream(docs, dups).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    val r = out.head
    assert(r.getLong(4) === 1L, s"n_redacted: $r") // the planted email
    val expectedMasked = goodText.toLowerCase
      .replace("bob@example.com", "[EMAIL]").length.toLong
    assert(r.getLong(5) === expectedMasked)
  }

  test("curationStream: multi-batch stream equals batch") {
    val docs = Seq(
      (1L, "en", goodText),
      (2L, "en", "tiny doc"),
      (3L, "en", goodText),
      (4L, "en", ("the " * 30).trim),
      (5L, "de", goodText + " extra tail words here"))
      .toDF("doc_id", "lang", "text")
    val dups = Seq(3L).toDF("doc_id")
    val batch = CurationStream.curationStream(docs, dups).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))).toSet

    // two files in the stream dir root → two micro-batches with
    // maxFilesPerTrigger=1 (FileStreamSource wants flat files, so each
    // half is written aside and its single part file staged in)
    val stage = java.nio.file.Files.createTempDirectory("curation_stream")
    val scratch = java.nio.file.Files.createTempDirectory("curation_scratch")
    Seq("a" -> docs.filter(col("doc_id") <= 2),
        "b" -> docs.filter(col("doc_id") > 2)).foreach { case (tag, df) =>
      val dir = scratch.resolve(tag)
      df.coalesce(1).write.parquet(dir.toString)
      val part = java.nio.file.Files.list(dir).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(part, stage.resolve(s"$tag.parquet"))
    }
    val raw = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
    val q = CurationStream.curationStream(raw, dups)
      .writeStream.format("memory").queryName("curation_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT * FROM curation_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(streamed === batch)
  }
}
