package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-13 hybrid-serve capstone specs: the q318 batch relation vs the
  * HybridStream serve twin — batch-evaluated AND micro-batched with a
  * cross-batch redelivery and an intra-batch duplicate.
  */
class Round13Batch2Spec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def key(r: org.apache.spark.sql.Row) =
    (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
      Option(r.get(r.fieldIndex("lex_rank"))).map(_.asInstanceOf[Long]),
      Option(r.get(r.fieldIndex("dense_rank"))).map(_.asInstanceOf[Long]),
      r.getAs[Long]("rrf_u"), r.getAs[Long]("fused_rank"),
      r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"),
      r.getAs[Boolean]("in_context"), r.getAs[Long]("n_lex"),
      r.getAs[Long]("n_dense"), r.getAs[Long]("n_fused"),
      r.getAs[Long]("n_filled"))

  test("hybridServe stream twin: batch-evaluated HybridStream matches the " +
      "q318 batch relation row-for-row over the full sf0.001 query set") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val batch = graft.ops.Retrieval.hybridServe(docs, emb)
      .collect().map(key)
    assert(batch.nonEmpty)
    // funnel sanity on the batch side: every row of a query carries the
    // same funnel, n_filled <= n_fused, and in_context rows == n_filled
    batch.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(t => (t._10, t._11, t._12, t._13)).distinct.size === 1)
      val (_, _, nf, nfill) = (rows.head._10, rows.head._11, rows.head._12,
        rows.head._13)
      assert(rows.head._13 <= rows.head._12)
      assert(rows.count(_._9) === rows.head._13)
      assert(rows.size === rows.head._12)
    }
    val queries = docs.filter(col("doc_id") % 251 === 0)
      .select(col("doc_id").as("query_id"), col("text"))
      .join(emb.filter(col("vec_id") % 251 === 0)
        .select(col("vec_id").as("query_id"), col("embedding")),
        Seq("query_id"))
      .select(col("query_id"), col("text"), col("embedding"))
    val lexIdx = graft.streaming.HybridStream.lexIndex(docs)
    val denseIdx = graft.streaming.HybridStream.denseIndex(emb, docs)
    val streamedBatch = graft.streaming.HybridStream.hybridServeStream(
        spark, queries, lexIdx, denseIdx)
      .toDF().collect().map(key)
    assert(streamedBatch.toSet === batch.toSet)
    assert(streamedBatch.length === batch.length)
  }

  test("hybridServeStream: micro-batched serving matches the batch run; " +
      "a cross-batch REDELIVERY re-emits nothing and an intra-batch " +
      "DUPLICATE does not double any score") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = docs.filter(col("doc_id") % 251 === 0)
      .select(col("doc_id").as("query_id"), col("text"))
      .join(emb.filter(col("vec_id") % 251 === 0)
        .select(col("vec_id").as("query_id"), col("embedding")),
        Seq("query_id"))
      .select(col("query_id"), col("text"), col("embedding"))
    val lexIdx = graft.streaming.HybridStream.lexIndex(docs)
      .localCheckpoint(true)
    val denseIdx = graft.streaming.HybridStream.denseIndex(emb, docs)
      .localCheckpoint(true)
    val batch = graft.streaming.HybridStream.hybridServeStream(
        spark, queries, lexIdx, denseIdx)
      .toDF().collect().map(key)
    assert(batch.nonEmpty)
    // file a: query 0 TWICE (intra-batch duplicate);
    // file b: query 251 + a REDELIVERY of query 0 (cross-batch)
    val stage = java.nio.file.Files.createTempDirectory("hybrid_stage")
    Seq(("a", queries.filter(col("query_id") === 0)
          .unionByName(queries.filter(col("query_id") === 0))),
        ("b", queries.filter(col("query_id") =!= 0)
          .unionByName(queries.filter(col("query_id") === 0))))
      .foreach { case (n, df) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"hybrid_$n")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(java.nio.file.Paths.get(part),
          stage.resolve(s"$n.parquet"))
      }
    val raw = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val q = graft.streaming.HybridStream.hybridServeStream(
        spark, raw, lexIdx, denseIdx)
      .toDF().writeStream.format("memory").queryName("hybrid_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    val streamed = spark.sql("SELECT * FROM hybrid_stream").collect()
      .map(key)
    assert(streamed.length === batch.length,
      "neither the duplicate nor the redelivery may add rows")
    assert(streamed.toSet === batch.toSet)
  }
}
