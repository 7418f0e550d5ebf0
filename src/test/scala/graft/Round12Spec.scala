package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Planted-case specs for the round-12 batch, opening with the four r11
  * advisory fixes: raw-id-anchored index staleness, the decimal conformal
  * ratio fit, the ForgetStream tombstone, and the query-anchored nDCG
  * audit.
  */
class Round12Spec extends SparkTestBase {
  import spark.implicits._

  test("indexStaleness counts sub-3-token docs: unindexed when absent, " +
      "changed when the index still answers for their old long text") {
    // previous snapshot (what the index was built from)
    val prev = Seq(
      (11L, "alpha beta gamma delta"),              // unchanged → fresh
      (12L, "old long text here for twelve"),       // doc 12 since shortened
      (13L, "different older text entirely here"),  // doc 13 since edited
      (14L, "departed doc text that left corpus")   // doc 14 left → orphaned
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "a b"),                                  // SHORT, new → unindexed
      (11L, "alpha beta gamma delta"),
      (12L, "x y"),                                  // SHORT now, but indexed
      (13L, "completely rewritten current text today")
    ).toDF("doc_id", "text")
    val m = graft.ops.Dedup.indexStaleness(
        corpus, graft.ops.Dedup.minhashSignatures(prev, 8))
      .first()
    // n_corpus counts ALL current docs, including the two unsignable ones
    assert(m.getAs[Long]("n_corpus") == 4L)
    assert(m.getAs[Long]("n_index") == 4L)
    assert(m.getAs[Long]("n_fresh") == 1L)      // 11
    assert(m.getAs[Long]("n_unindexed") == 1L)  // 10 (short, no entry)
    assert(m.getAs[Long]("n_orphaned") == 1L)   // 14
    assert(m.getAs[Long]("n_changed") == 2L)    // 12 (unsignable now), 13
    assert(m.getAs[Long]("coverage_u") == 250000L) // 1/4, not 1/2
  }

  test("conformalInterval ratio fit survives the BIGINT pre-multiply range " +
      "and matches BigInt arithmetic on a planted corpus") {
    // the fixed fit form: decimal pre-multiply at the scale where the old
    // BIGINT form wraps (9.3e12 · 10⁶ > Long.MaxValue)
    val probe = spark.sql(
      "SELECT cast(9300000000000 as decimal(38,0)) * 1000000 div 31 AS ok")
      .first().getLong(0)
    assert(BigInt(probe) == BigInt("9300000000000") * 1000000 / 31)
    assert(9300000000000L * 1000000L < 0L) // the old form really wraps here

    // functional: ratio_u/qhat/coverage match a direct BigInt replay
    val docs = (1L to 40L).map { i =>
      val words = (1L to (i % 7) + 2).map(j => s"w$j").mkString(" ")
      (i, words, words.length + (i % 3))
    }.toDF("doc_id", "text", "n_chars")
    val out = graft.ops.Classifier.conformalInterval(
      docs, col("doc_id") % 2 === 0, alphaPct = 10).first()
    val rows = (1L to 40L).map { i =>
      val words = (1L to (i % 7) + 2).map(j => s"w$j").mkString(" ")
      (i, words.split("\\s+").length.toLong, (words.length + (i % 3)).toLong)
    }
    val cal = rows.filter(_._1 % 2 == 0)
    val ratio = (BigInt(cal.map(_._2).sum) * 1000000 / cal.map(_._3).sum).toLong
    assert(out.getAs[Long]("ratio_u") == ratio)
    val calErr = cal.map { case (_, tok, nc) =>
      math.abs(tok - nc * ratio / 1000000L) }.sorted
    val rank = ((90L * (cal.size + 1)) + 99L) / 100L
    val qhat = calErr((rank - 1).toInt)
    assert(out.getAs[Long]("qhat") == qhat)
    val tst = rows.filter(_._1 % 2 != 0)
    val covered = tst.count { case (_, tok, nc) =>
      math.abs(tok - nc * ratio / 1000000L) <= qhat }
    assert(out.getAs[Long]("n_covered") == covered.toLong)
  }

  test("forget stream: an emptied class tombstones — duplicate deletions " +
      "in later micro-batches emit nothing") {
    import graft.streaming.ForgetStream
    val corpus = Seq(
      (1L, "dup class a"), (2L, "dup class a"),
      (5L, "untouched class c")).toDF("doc_id", "text")
    // b1 deletes 1 (1→2), b2 deletes 2 (2→−1, emptied), b3 re-deletes 1:
    // the tombstone must make b3 a no-op — state.remove() instead would
    // re-seed from the roster and emit a spurious 1→2
    val batches = Seq(Seq(1L), Seq(2L), Seq(1L, 2L))
    val stage = java.nio.file.Files.createTempDirectory("forget_tomb")
    batches.zipWithIndex.foreach { case (ids, n) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"forget_t$n")
      ids.toDF("doc_id").coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      java.nio.file.Files.copy(java.nio.file.Paths.get(part),
        stage.resolve(s"b$n.parquet"))
    }
    val raw = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val q = ForgetStream.keeperMonitorStream(spark, corpus, raw).toDF()
      .writeStream.format("memory").queryName("forget_tomb_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val got = spark.sql("SELECT * FROM forget_tomb_stream").collect()
      .map(r => (r.getAs[Long]("old_keeper"), r.getAs[Long]("new_keeper")))
      .toSeq.sorted
    assert(got == Seq((1L, 2L), (2L, -1L)))
  }

  test("ndcgAudit emits an n_exact = 0 row (NULL ndcg) for a query with " +
      "zero exact candidates instead of dropping it") {
    val emb = Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val queries = emb.select(col("vec_id").as("query_id"), col("embedding"))
    val rows = graft.ops.Retrieval.ndcgAudit(
      emb, queries, k = 3, nPlanes = 2, dim = 4).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("query_id") == 0L)
    assert(r.getAs[Long]("n_exact") == 0L)
    assert(r.getAs[Long]("n_hit") == 0L)
    assert(r.getAs[Long]("dcg_u") == 0L)
    assert(r.getAs[Long]("idcg_u") == 0L)
    assert(r.isNullAt(r.fieldIndex("ndcg_u")))
  }
}
