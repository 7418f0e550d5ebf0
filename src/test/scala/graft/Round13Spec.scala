package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Planted-case specs for the round-13 advisory fixes: the ANN serve
  * twin's INTRA-batch duplicate guard, temperature sampling's zero-token
  * guard, and the one-job bm25 corpus scalars (token-empty docs still
  * count toward N).
  */
class Round13Spec extends SparkTestBase {
  import spark.implicits._

  private def plantedVecs = (0 until 24).map { i =>
    (i.toLong, (0 until 4).map { d =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"v:$i:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex.take(15), 16) % 2001L) - 1000L)
        .toFloat / 1000f
    }.toArray)
  }.toDF("vec_id", "embedding")

  // ------------------------------------- r12 advisory: intra-batch dup

  test("annServeStream: a query event duplicated WITHIN one micro-batch " +
      "(at-least-once source) must not double its candidates — output " +
      "still equals the batch run, no duplicate (query_id, vec_id) ranks") {
    import graft.streaming.AnnStream
    val emb = plantedVecs
    val index = AnnStream.sigIndex(emb, nPlanes = 3, dim = 4)
    val queries = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("idist"), r.getAs[Long]("rank"))
    val batch = AnnStream.annServeStream(spark, queries, index,
      nPlanes = 3, nProbe = 2, dim = 4, k = 5).toDF().collect().map(key)
    assert(batch.nonEmpty)
    // ONE staged file holding queries {0, 1, 1-again}: the duplicate
    // travels in the SAME micro-batch, where the served flag cannot help
    val dup = queries.unionByName(queries.filter(col("query_id") === 1))
    val stage = java.nio.file.Files.createTempDirectory("anndup_stage")
    val tmp = java.nio.file.Files.createTempDirectory("anndup_one")
    dup.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    java.nio.file.Files.copy(java.nio.file.Paths.get(part),
      stage.resolve("a.parquet"))
    val raw = spark.readStream.schema(queries.schema)
      .parquet(stage.toString)
    val q = AnnStream.annServeStream(spark, raw, index,
        nPlanes = 3, nProbe = 2, dim = 4, k = 5).toDF()
      .writeStream.format("memory").queryName("anndup_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.sql("SELECT * FROM anndup_stream").collect()
      .map(key)
    assert(streamed.length === batch.length,
      "the intra-batch duplicate must not add or displace ranks")
    assert(streamed.toSet === batch.toSet)
  }

  // -------------------------------- r12 advisory: zero-token source guard

  test("temperatureSampling: a zero-token source neither nulls nor " +
      "crashes — its weight is the clamped exp(alpha*ln(1/total)) and " +
      "every share column stays defined") {
    val docs = (
      (1 to 4).map(i => (i.toLong, "real", ("w " * 50).trim)) ++
      Seq((5L, "empty", ""), (6L, "empty", "   "))
    ).toDF("doc_id", "source", "text")
    val rows = graft.ops.TrainingData.temperatureSampling(docs,
      alphaPct = 30).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows.keySet === Set("real", "empty"))
    val e = rows("empty")
    assert(e.getAs[Long]("tokens") === 0L)
    assert(e.getAs[Long]("share_u") === 0L)
    // weight = floor(exp(0.3*ln(1/200))*1e6), finite and non-negative
    val expW = math.floor(math.exp(0.3 * math.log(1.0 / 200)) * 1e6).toLong
    assert(e.getAs[Long]("weight_u") === expW)
    rows.values.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("temp_share_u")))
      assert(!r.isNullAt(r.fieldIndex("upsample_u")))
    }
  }

  // ------------------------------------ q319 (planes, nprobe) frontier

  test("multiprobeFrontier: cells agree with the per-query q305/q316 " +
      "relations micro-aggregated; candidates and hits are weakly " +
      "monotone in nprobe within a plane family") {
    val emb = plantedVecs
    val cells = graft.ops.Similarity.multiprobeFrontier(emb,
      planesCounts = Seq(2, 3), nProbes = Seq(1, 2), dim = 4, k = 5,
      nQueries = 3).collect()
      .map(r => (r.getAs[Long]("nplanes"), r.getAs[Long]("nprobe")) -> r)
      .toMap
    assert(cells.size === 4)
    // cross-check the 3-plane column against the per-query operators
    val recall = graft.ops.Similarity.multiprobeRecall(emb,
      nProbes = Seq(1, 2), nPlanes = 3, dim = 4, k = 5, nQueries = 3)
      .collect()
    val ndcg = graft.ops.Similarity.multiprobeNdcg(emb,
      nProbes = Seq(1, 2), nPlanes = 3, dim = 4, k = 5, nQueries = 3)
      .collect()
    Seq(1L, 2L).foreach { np =>
      val c = cells((3L, np))
      val rr = recall.filter(_.getAs[Long]("nprobe") == np)
      assert(c.getAs[Long]("n_hit") ===
        rr.map(_.getAs[Long]("n_hit")).sum)
      assert(c.getAs[Long]("n_cand") ===
        rr.map(_.getAs[Long]("n_cand")).sum)
      assert(c.getAs[Long]("n_exact") ===
        rr.map(_.getAs[Long]("n_exact")).sum)
      val nn = ndcg.filter(_.getAs[Long]("nprobe") == np)
      assert(c.getAs[Long]("dcg_u") === nn.map(_.getAs[Long]("dcg_u")).sum)
      assert(c.getAs[Long]("idcg_u") ===
        nn.map(_.getAs[Long]("idcg_u")).sum)
    }
    Seq(2L, 3L).foreach { p =>
      assert(cells((p, 2L)).getAs[Long]("n_cand") >=
        cells((p, 1L)).getAs[Long]("n_cand"))
      assert(cells((p, 2L)).getAs[Long]("n_hit") >=
        cells((p, 1L)).getAs[Long]("n_hit"))
    }
  }

  // --------------------------- r12 judge item: one-job bm25 scalars, N

  test("impactIndexBuild: a token-empty document still counts toward N " +
      "(the one-job scalar fold anchors on raw doc_ids, not the tf keys)") {
    // doc pairs share a trigram group so its df = 2 lands inside the
    // [dfMin, n/2] idf band (the all-doc prefix trigrams are banded out)
    val real = (1 to 10).map { i =>
      val g = (i + 1) / 2
      (i.toLong, s"shared common words plus t$g u$g v$g")
    }.toDF("doc_id", "text")
    // A: an empty-text doc; B: a 2-token doc (too short for any trigram);
    // C: no 11th doc at all. A and B contribute zero postings but must
    // both count toward N — so A ≡ B, and both differ from C via idf(N).
    val a = real.unionByName(Seq((99L, "")).toDF("doc_id", "text"))
    val b = real.unionByName(Seq((99L, "one two")).toDF("doc_id", "text"))
    def postings(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Retrieval.impactIndexBuild(df).postings.collect()
        .map(r => (r.getAs[String]("tok"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("impact_u"))).toSet
    val pa = postings(a); val pb = postings(b); val pc = postings(real)
    assert(pa.nonEmpty && pa === pb)
    assert(pa !== pc, "N = 11 vs 10 must move the idf weighting")
    assert(graft.ops.Retrieval.impactIndexBuild(a).n === 11L)
    assert(graft.ops.Retrieval.impactIndexBuild(real).n === 10L)
  }
}
