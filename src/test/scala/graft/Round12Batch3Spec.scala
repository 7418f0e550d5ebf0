package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Planted-case specs for the round-12 batch-4 operators: the lexical
  * index lifecycle (staleness + frozen-statistics append), DSIR's KL
  * reduction and selection-bias audits, and the streaming ANN serve path.
  */
class Round12Batch3Spec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------ q309 impact staleness

  test("impactStaleness: term vocabulary classifies fresh/drifted/new/gone " +
      "exactly; doc membership axes count arrivals and departures") {
    val P = "p q r p q r"; val S = "s t u s t u"
    val M = "m n o m n o"; val G = "g h i g h i"; val V = "v w x v w x"
    val old = Seq(
      (1L, P), (4L, P),                       // untouched → fresh terms
      (2L, G), (3L, G),                       // G departs entirely → gone
      (5L, S), (6L, S),                       // S gains a doc → drifted
      (7L, "only seven words here today friend"),
      (8L, "unique eight doc words completely different"),
      (9L, M), (10L, M)                       // untouched → fresh terms
    ).toDF("doc_id", "text")
    val cur = Seq(
      (1L, P), (4L, P),
      (2L, V), (7L, V),                       // V appears (df 2) → new
      (5L, S), (6L, S), (11L, S),             // arrival 11 lifts S's df
      (8L, "unique eight doc words completely different"),
      (9L, M), (10L, M)                       // doc 3 departed
    ).toDF("doc_id", "text")
    val r = graft.ops.Retrieval.impactStaleness(old, cur).first()
    // banded vocab (df ∈ [2, 5] at n = 10): P/M fresh (df 2 both sides,
    // n unchanged), S drifted (df 2 → 3), V new, G gone — 3 trigrams each
    assert(r.getAs[Long]("n_terms_fresh") === 6L)
    assert(r.getAs[Long]("n_terms_drifted") === 3L)
    assert(r.getAs[Long]("n_terms_new") === 3L)
    assert(r.getAs[Long]("n_terms_gone") === 3L)
    assert(r.getAs[Long]("n_terms_index") === 12L)
    assert(r.getAs[Long]("n_terms_current") === 12L)
    assert(r.getAs[Long]("idf_drift_total") > 0L)
    assert(r.getAs[Long]("n_docs_unindexed") === 1L) // doc 11 arrived
    assert(r.getAs[Long]("n_docs_orphaned") === 1L)  // doc 3 departed
  }

  // --------------------------------------------------- q310 impact append

  test("impactAppend: impacts are a pure function of (doc, frozen stats) — " +
      "an arrival with an indexed doc's exact text gets its exact postings; " +
      "out-of-vocabulary arrival terms get none") {
    val phrase = ("x y z " * 6).trim
    val old = (Seq((1L, phrase), (2L, phrase), (3L, phrase)) ++
      (4 to 12).map(i => (i.toLong, s"filler$i words nothing shared " +
        s"a$i b$i c$i d$i e$i"))).toDF("doc_id", "text")
    val arrivals = Seq(
      (100L, phrase),                          // text ≡ doc 1's
      (101L, "totally novel vocabulary only novel vocabulary only")
    ).toDF("doc_id", "text")
    val built = graft.ops.Retrieval.impactIndexBuild(old)
    val idx = graft.ops.Retrieval.impactAppend(built, arrivals).collect()
      .map(r => (r.getAs[String]("tok"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("impact_u")))
    val byDoc = idx.groupBy(_._2)
    // same text + same frozen stats ⇒ identical (tok, impact) postings
    val d1 = byDoc(1L).map(t => (t._1, t._3)).toSet
    val d100 = byDoc(100L).map(t => (t._1, t._3)).toSet
    assert(d1.nonEmpty && d100 === d1)
    // doc 101's trigrams are outside the frozen vocabulary → no postings
    assert(!byDoc.contains(101L))
    // kept postings are exactly the persisted index (the append never
    // rewrites — and, post r12 advisory, never re-derives the old corpus:
    // the API only receives the artifacts + the arrivals delta)
    val oldIdx = built.postings.collect()
      .map(r => (r.getAs[String]("tok"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("impact_u"))).toSet
    assert(idx.filter(_._2 <= 12L).toSet === oldIdx)
  }

  // ------------------------------------------------------- q311 DSIR KL

  test("dsirKl: resampling toward the target strictly reduces the " +
      "hashed-feature KL on a separable pool") {
    val ab = ("alpha beta " * 60).trim
    val gd = ("gamma delta " * 60).trim
    val docs = (Seq((1L, "tgt", ab), (2L, "tgt", ab)) ++
      (3 to 12).map(i => (i.toLong, "pool", gd)) ++
      Seq((13L, "pool", ab), (14L, "pool", ab)))
      .toDF("doc_id", "source", "text")
    val r = graft.ops.TrainingData.dsirKl(docs, "tgt", buckets = 64,
      k = 4).first()
    // the pool is gamma-dominated, the k = 4 selection is alpha-only →
    // the selected distribution sits far closer to the target
    assert(r.getAs[Long]("n_target_mass") === 2L * 119L)
    assert(r.getAs[Long]("kl_raw_u") > 0L)
    assert(r.getAs[Long]("kl_selected_u") < r.getAs[Long]("kl_raw_u"))
    assert(r.getAs[Long]("reduction_u") > 0L)
    assert(r.getAs[Long]("n_buckets_observed") <= 64L)
  }

  // ------------------------------------------------ q313 selection bias

  test("dsirSelectionBias: a lang-skewed target slice over-selects its " +
      "language; a fully de-selected language still emits its audit row") {
    val ab = ("alpha beta " * 60).trim
    val gd = ("gamma delta " * 60).trim
    val docs = (Seq((1L, "tgt", "en", ab), (2L, "tgt", "en", ab)) ++
      (3 to 10).map(i => (i.toLong, "pool", "de", gd)) ++
      Seq((11L, "pool", "en", ab), (12L, "pool", "en", ab)))
      .toDF("doc_id", "source", "lang", "text")
    val rows = graft.ops.TrainingData.dsirSelectionBias(docs, "tgt",
      buckets = 64, k = 4).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(rows.keySet === Set("en", "de"))
    val en = rows("en"); val de = rows("de")
    assert(en.getAs[Long]("n_selected") === 4L) // the 4 alpha docs
    assert(en.getAs[Long]("bias_u") > 1000000L) // over-selected
    assert(de.getAs[Long]("n_pool") === 8L)
    assert(de.getAs[Long]("n_selected") === 0L) // pool-anchored zero row
    assert(de.getAs[Long]("bias_u") === 0L)
    assert(de.getAs[Long]("sel_share_u") === 0L)
  }

  // ------------------------------------------------- q312 ANN serve twin

  private def plantedVecs = (0 until 24).map { i =>
    (i.toLong, (0 until 4).map { d =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"v:$i:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex.take(15), 16) % 2001L) - 1000L)
        .toFloat / 1000f
    }.toArray)
  }.toDF("vec_id", "embedding")

  test("annServeStream batch evaluation: every emitted hit is integer-L2 " +
      "exact and correctly ranked within the query's probed buckets " +
      "(independent signature replay)") {
    import graft.streaming.AnnStream
    val emb = plantedVecs
    val queries = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = AnnStream.annServeStream(spark, queries,
        AnnStream.sigIndex(emb, nPlanes = 3, dim = 4),
        nPlanes = 3, nProbe = 2, dim = 4, k = 5).toDF()
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("idist"), r.getAs[Long]("rank")))
    // independent replay: integer coords, plane projections, base sig,
    // the single lowest-|margin| flip, candidates, exact integer L2
    val vecs = plantedVecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val planes = (0 until 3).map(p => (0 until 4).map(d =>
      graft.ops.Similarity.planeComponent(p, d)))
    def icoords(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 1e6).toLong)
    def sigOf(v: Array[Float]): Long = {
      val ic = icoords(v)
      (0 until 3).map { p =>
        val pr = ic.zip(planes(p)).map { case (x, h) => x * h }.sum
        if (pr >= 0) 1L << p else 0L
      }.sum
    }
    val corpusSigs = vecs.map { case (id, v) => id -> sigOf(v) }
    val expected = (0L until 2L).flatMap { qid =>
      val qv = vecs(qid); val ic = icoords(qv)
      val margins = (0 until 3).map { p =>
        (math.abs(ic.zip(planes(p)).map { case (x, h) => x * h }.sum), p)
      }.sorted
      val base = sigOf(qv)
      val probeSigs = Set(base, base ^ (1L << margins.head._2))
      vecs.toSeq
        .filter { case (id, v) =>
          id != qid && probeSigs.contains(corpusSigs(id)) }
        .map { case (id, v) =>
          val e = icoords(v)
          (qid, id, e.zip(ic).map { case (a, b) =>
            (a - b) * (a - b) }.sum)
        }
        .sortBy { case (_, id, d) => (d, id) }.take(5)
        .zipWithIndex.map { case ((q, id, d), r) => (q, id, d, r + 1L) }
    }.toSet
    assert(got.toSet === expected)
  }

  test("annServeStream: micro-batched serving matches the batch run; a " +
      "redelivered query event does not re-emit its result set") {
    import graft.streaming.AnnStream
    val emb = plantedVecs
    val index = AnnStream.sigIndex(emb, nPlanes = 3, dim = 4)
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("idist"), r.getAs[Long]("rank"))
    val batch = AnnStream.annServeStream(spark, queries, index,
      nPlanes = 3, nProbe = 2, dim = 4, k = 5).toDF().collect().map(key)
    assert(batch.nonEmpty)
    // two files: queries {0,1} then {2,3} + a REDELIVERY of query 1
    val stage = java.nio.file.Files.createTempDirectory("ann_stage")
    Seq(("a", queries.filter(col("query_id") < 2)),
      ("b", queries.filter(col("query_id") >= 2)
        .unionByName(queries.filter(col("query_id") === 1))))
      .foreach { case (n, df) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"ann_$n")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
          .filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(java.nio.file.Paths.get(part),
          stage.resolve(s"$n.parquet"))
      }
    val raw = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val q = AnnStream.annServeStream(spark, raw, index,
        nPlanes = 3, nProbe = 2, dim = 4, k = 5).toDF()
      .writeStream.format("memory").queryName("ann_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.sql("SELECT * FROM ann_stream").collect().map(key)
    assert(streamed.length === batch.length,
      "the redelivered query must not re-emit")
    assert(streamed.toSet === batch.toSet)
  }

  // -------------------------------------------- q314 temperature sampling

  test("temperatureSampling: alpha < 1 up-samples the tail and " +
      "down-samples the head; alpha = 1 degenerates to proportional") {
    val docs = (
      (1 to 4).map(i => (i.toLong, "small", ("w " * 25).trim)) ++   // 100 tok
      (5 to 8).map(i => (i.toLong, "big", ("w " * 1600).trim))      // 6400 tok
    ).toDF("doc_id", "source", "text")
    val r = graft.ops.TrainingData.temperatureSampling(docs, alphaPct = 30)
      .collect().map(x => x.getAs[String]("source") -> x).toMap
    val small = r("small"); val big = r("big")
    assert(small.getAs[Long]("tokens") === 100L)
    assert(big.getAs[Long]("tokens") === 6400L)
    // raw shares 100/6500 vs 6400/6500; at alpha 0.3 the 64x mass ratio
    // compresses to 64^0.3 ≈ 3.5x
    assert(small.getAs[Long]("upsample_u") > 1000000L)
    assert(big.getAs[Long]("upsample_u") < 1000000L)
    assert(small.getAs[Long]("temp_share_u") >
      small.getAs[Long]("share_u"))
    assert(math.abs(small.getAs[Long]("temp_share_u") +
      big.getAs[Long]("temp_share_u") - 1000000L) <= 2L)
    val p = graft.ops.TrainingData.temperatureSampling(docs, alphaPct = 100)
      .collect().map(x => x.getAs[String]("source") -> x).toMap
    Seq("small", "big").foreach { s =>
      assert(math.abs(p(s).getAs[Long]("temp_share_u") -
        p(s).getAs[Long]("share_u")) <= 2L, s"alpha=1 must be proportional: $s")
    }
  }

  // ------------------------------------------------- q315 DSIR gate twin

  test("dsirGate == SelectStream row-for-row under a frozen model, " +
      "including unseen-vocabulary arrivals at the Laplace default; " +
      "micro-batched gating matches the batch run") {
    import graft.streaming.SelectStream
    val ab = ("alpha beta " * 30).trim
    val gd = ("gamma delta " * 30).trim
    val ref = Seq((1L, "tgt", ab), (2L, "tgt", ab), (3L, "pool", gd),
      (4L, "pool", gd)).toDF("doc_id", "source", "text")
    val arrivals = Seq((10L, "pool", ab), (11L, "pool", gd),
      (12L, "pool", "totally novel words never indexed before today"),
      (13L, "pool", "solo")).toDF("doc_id", "source", "text")
    val model = graft.ops.TrainingData.dsirModel(
      graft.ops.TrainingData.dsirFeatures(ref, 64), "tgt")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_feats"), r.getAs[Long]("w_u"),
        r.getAs[Boolean]("admitted"))
    val batch = graft.ops.TrainingData.dsirGate(arrivals, model,
      buckets = 64, thresholdU = 0L).collect().map(key).toSet
    val (lam, lamDefault) = SelectStream.lambdaTable(model, 64)
    val streamedBatch = SelectStream.gateStream(spark, arrivals, lam,
      lamDefault, 64, 0L).toDF().collect().map(key).toSet
    assert(streamedBatch === batch)
    // directional semantics: target-like admitted, divergent rejected,
    // featureless doc gated at exactly weight 0
    val byId = batch.map(t => t._1 -> t).toMap
    assert(byId(10L)._5 && !byId(11L)._5)
    assert(byId(13L)._3 === 0L && byId(13L)._4 === 0L && byId(13L)._5)
    // novel vocabulary scores the Laplace-only default, not a crash/drop
    assert(byId(12L)._3 > 0L)
    // micro-batched run across two files
    val stage = java.nio.file.Files.createTempDirectory("gate_stage")
    Seq(("a", arrivals.filter(col("doc_id") <= 11)),
      ("b", arrivals.filter(col("doc_id") > 11))).foreach { case (n, df) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"gate_$n")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      java.nio.file.Files.copy(java.nio.file.Paths.get(part),
        stage.resolve(s"$n.parquet"))
    }
    val raw = spark.readStream.schema(arrivals.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val q = SelectStream.gateStream(spark, raw, lam, lamDefault, 64, 0L)
      .toDF().writeStream.format("memory").queryName("gate_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    assert(spark.sql("SELECT * FROM gate_stream").collect()
      .map(key).toSet === batch)
  }

  // -------------------------------------------------- q316 multiprobe nDCG

  test("multiprobeNdcg: per-query nDCG is weakly monotone in nProbe (a " +
      "probed superset with binary relevance can only add hits above), " +
      "and n_hit agrees with multiprobeRecall") {
    val emb = plantedVecs
    val ndcg = graft.ops.Similarity.multiprobeNdcg(emb,
      nProbes = Seq(1, 2, 4), nPlanes = 3, dim = 4, k = 5, nQueries = 3)
      .collect()
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("query_id"),
        r.getAs[Long]("n_hit"), r.getAs[Long]("dcg_u"),
        r.getAs[Long]("idcg_u"),
        Option(r.get(r.fieldIndex("ndcg_u"))).map(_.asInstanceOf[Long])))
    assert(ndcg.length === 9)
    ndcg.groupBy(_._2).foreach { case (_, qs) =>
      val byNp = qs.sortBy(_._1)
      byNp.sliding(2).foreach { case Array(lo, hi) =>
        assert(hi._4 >= lo._4, s"dcg must be monotone in probes: $byNp")
      }
      assert(byNp.map(_._5).distinct.length === 1) // idcg fixed per query
    }
    val recall = graft.ops.Similarity.multiprobeRecall(emb,
      nProbes = Seq(1, 2, 4), nPlanes = 3, dim = 4, k = 5, nQueries = 3)
      .collect()
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("query_id")) ->
        r.getAs[Long]("n_hit")).toMap
    ndcg.foreach { case (np, q, nh, _, _, _) =>
      assert(recall((np, q)) === nh)
    }
  }

  // ------------------------------------------------ q317 gate calibration

  test("gateCalibration: the sweep brackets the operating points — " +
      "admit-everything, admit-positives, admit-nothing — with exact " +
      "counts on a separable pool") {
    val ab = ("alpha beta " * 30).trim
    val gd = ("gamma delta " * 30).trim
    val docs = Seq(
      (1L, "tgt", ab), (2L, "tgt", ab),
      (3L, "pool", ab), (4L, "pool", ab),
      (5L, "pool", gd), (6L, "pool", gd), (7L, "pool", gd),
      (8L, "pool", "solo")).toDF("doc_id", "source", "text")
    val model = graft.ops.TrainingData.dsirModel(
      graft.ops.TrainingData.dsirFeatures(docs, 64), "tgt")
    val rows = graft.ops.TrainingData.gateCalibration(docs, model, "tgt",
      buckets = 64,
      thresholds = Seq(-300000000L, 0L, 100000000L)).collect()
      .map(r => r.getAs[Long]("threshold_u") -> r).toMap
    val all = rows(-300000000L)
    assert(all.getAs[Long]("n_admitted") === 8L)
    assert(all.getAs[Long]("recall_u") === 1000000L)
    assert(all.getAs[Long]("admit_u") === 1000000L)
    val mid = rows(0L)
    // positives: the 4 alpha docs + the featureless doc at exactly w = 0
    assert(mid.getAs[Long]("n_admitted") === 5L)
    assert(mid.getAs[Long]("n_target") === 2L)
    assert(mid.getAs[Long]("n_target_admitted") === 2L)
    assert(mid.getAs[Long]("recall_u") === 1000000L)
    assert(mid.getAs[Long]("precision_u") === 400000L) // 2 of 5
    val none = rows(100000000L)
    assert(none.getAs[Long]("n_admitted") === 0L)
    assert(none.getAs[Long]("recall_u") === 0L)
    assert(none.getAs[Long]("precision_u") === 0L)
  }
}
