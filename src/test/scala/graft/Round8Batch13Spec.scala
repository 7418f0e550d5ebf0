package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.{Dedup, TextAnalysis, TrainingData}
import graft.streaming.ManifestStream

/** Planted-case specs for the round-8 language-confusion / epoch-plan /
  * streaming-digest / dedup-preview batch. */
class Round8Batch13Spec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    BigInt(md5hex(s).substring(0, 15), 16).toLong

  test("langConfusion rolls declared-vs-predicted cells with mean scores") {
    val docs = Seq(
      (1L, "the and of to is", "en"),   // en markers ×5 → diagonal
      (2L, "und der die", "en"))        // de markers ×3 → off-diagonal
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langConfusion(docs).orderBy("lang_pred").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      ("en", "de", 1L, 500000L, 3L, true),
      ("en", "en", 1L, 500000L, 5L, false)))
  }

  test("epochPlan prices repetition per source under a uniform budget split") {
    val docs = Seq(
      (1L, "a b c", "a"), (2L, "d e f", "a"), (3L, "g h", "b"))
      .toDF("doc_id", "text", "source")
    val out = TrainingData.epochPlan(docs, budgetTokens = 10L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("a", 2L, 6L, 5L, 1L, 1000000L),
      ("b", 1L, 2L, 5L, 3L, 400000L)))
  }

  test("shardDigestBatch folds order-independent digests per shard") {
    val docs = Seq((1L, "a b", "en"), (2L, "a b c", "en"))
      .toDF("doc_id", "text", "lang")
    val out = ManifestStream.shardDigestBatch(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      ("en", 0L, 2L, 5L, h60("m:1") ^ h60("m:2"), 1L, 2L)))
  }

  test("shard digest: streaming (availableNow, complete) equals batch") {
    val dir = s"$testData/sf0.001"
    val batch = ManifestStream.shardDigestBatch(
        spark.read.parquet(s"$dir/documents.parquet")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val stage = java.nio.file.Files.createTempDirectory("docs_digest")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      stage.resolve("documents.parquet"))
    val q = ManifestStream.shardDigestStream(spark, stage.toString)
      .writeStream.format("memory").queryName("shard_digest")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT * FROM shard_digest").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(streamed.nonEmpty && streamed.size == batch.size)
    streamed.foreach { case (k, v) => assert(batch(k) == v, s"shard $k") }
  }

  test("dupRateEstimate previews collision mass from one band") {
    val docs = Seq(
      (1L, "a b c d", "s"), (2L, "a b c d", "s"), (3L, "w x y z", "s"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.dupRateEstimate(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq((3L, 2L, 1L, 1L, 666666L)))
  }
}
