package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Store

/** The incremental-MinHash scale claim, machine-checked end to end: a
  * signature INDEX persisted bucketed on the band key joins a same-bucketed
  * batch with NO Exchange on either side — at 100 TB the corpus-sized index
  * never reshuffles to meet each arriving batch, which is the entire point
  * of persisting it pre-banded.
  */
class SigIndexSpec extends SparkTestBase {

  test("bucketed signature index joins batch candidates shuffle-free") {
    val dir = java.nio.file.Files.createTempDirectory("sigindex").toString
    val docs = spark.read.parquet(s"$testData/sf0.001/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    // production layout: ONE composite band-key column — v1 bucketing only
    // eliminates the shuffle when the join keys are exactly the bucket key
    def banded(d: org.apache.spark.sql.DataFrame) =
      Dedup.bandedKeys(Dedup.minhashSignatures(d, 8), 4, 2)
        .select(col("doc_id"),
          concat(col("band"), lit(":"), col("key")).as("bkey"))
    val corpusBands = banded(corpus)
    val batchBands = banded(batch)
    Store.writeBucketed(corpusBands, "sig_idx", s"$dir/idx", "bkey", 8)
    Store.writeBucketed(batchBands, "sig_batch", s"$dir/batch", "bkey", 8)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // disable broadcast so an unbucketed layout would need a full shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val cand = Store.table(spark, "sig_idx").as("x")
        .join(Store.table(spark, "sig_batch").as("y"),
          col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
      val plan = cand.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      // no Exchange below the join (the distinct's own shuffle is separate)
      assert(!plan.contains("Exchange hashpartitioning(bkey"),
        "index side reshuffled despite bucketing:\n" + plan.take(2000))
      // and the bucketed candidates equal the plain formulation
      val direct = corpusBands.as("x")
        .join(batchBands.as("y"),
          col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
      val got = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = direct.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS sig_idx")
      spark.sql("DROP TABLE IF EXISTS sig_batch")
    }
  }
}
