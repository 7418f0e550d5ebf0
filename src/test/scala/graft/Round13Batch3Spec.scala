package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-13 batch-3 specs: the q320 drift-vs-recall retrain trigger —
  * the operator connecting the q298 codebook-drift gauge to the q292
  * recall metric over a FROZEN index.
  */
class Round13Batch3Spec extends SparkTestBase {
  import spark.implicits._

  private def plantedVecs = (0 until 24).map { i =>
    (i.toLong, (0 until 4).map { d =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"v:$i:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex.take(15), 16) % 2001L) - 1000L)
        .toFloat / 1000f
    }.toArray)
  }.toDF("vec_id", "embedding")

  test("ivfPqDriftRecall: the step-0 row reproduces the fresh index's " +
      "own nprobe=2 recall exactly (zero translation => the pure-function " +
      "re-encode IS the frozen codes), and the cell-drift gauge rises " +
      "strictly with the translation series") {
    val emb = plantedVecs
    val out = graft.ops.Quantize.ivfPqDriftRecall(emb,
        steps = Seq(0, 1, 2, 3), driftPerStep = 0.5, nCells = 4, m = 2,
        k = 4, rounds = 2, nprobe = 2, nQueries = 3, topK = 5, dim = 4)
      .orderBy("step").collect()
    assert(out.length === 4)
    assert(out.map(_.getAs[Long]("offset_u")).toSeq ===
      Seq(0L, 500000L, 1000000L, 1500000L))
    // fresh-index cross-check: the same corpus through ivfPqRecall at
    // nprobe=2 must yield the identical (n_exact, n_hit) aggregate —
    // proving the drift harness adds nothing of its own at zero drift
    val fresh = graft.ops.Quantize.ivfPqRecall(emb, nprobes = Seq(2),
      nCells = 4, m = 2, k = 4, rounds = 2, nQueries = 3, topK = 5,
      dim = 4).collect()
    val nExact = fresh.map(_.getAs[Long]("n_exact")).sum
    val nHit = fresh.map(_.getAs[Long]("n_hit")).sum
    assert(nExact > 0)
    assert(out(0).getAs[Long]("n_exact") === nExact)
    assert(out(0).getAs[Long]("n_hit") === nHit)
    assert(out(0).getAs[Long]("recall_u") === nHit * 1000000L / nExact)
    // every step scores against a full ground-truth set (translation
    // never shrinks it) ...
    assert(out.forall(_.getAs[Long]("n_exact") === nExact))
    // ... and every drifted step reads STRICTLY above the step-0 gauge
    // baseline (the seeded-coarse floor) — the exceedance that makes
    // (total_drift, recall_u) readable as a retrain threshold. Strict
    // monotonicity across steps is NOT asserted: once the shifted cloud
    // reassigns wholesale to the few centroids in the shift direction,
    // the populated-cell count shrinks and the total can dip while the
    // recall damage persists (exactly why the trigger reads the PAIR).
    val drifts = out.map(_.getAs[Long]("total_drift")).toSeq
    assert(drifts.tail.forall(_ > drifts.head),
      s"drifted steps must exceed the step-0 baseline: $drifts")
  }

  // ------------------------- q321 streaming ingest admission capstone

  private def admissionDocs = {
    // varied vocab keeps rep_ratio under the 0.65 rule; the/a/and/of/to
    // keep stopword_ratio over 0.02; short words keep mean_word_len down
    def good(i: Int) = (0 until 6).map(j =>
      s"the w${i}x$j and a v${i}y$j of u${i}z$j to q${i}k$j").mkString(" ")
    (0 until 24).map { i =>
      val src = if (i % 3 == 0) "tgt" else "web"
      val text = i match {
        case 11 => "tiny doc"                       // quality: too_short
        case 17 => ""                               // zero tokens (NULL rep)
        case 19 => good(i) + " call 555-123-4567"   // PII audit, admitted
        case _ => good(i)
      }
      (i.toLong, src, text)
    }.toDF("doc_id", "source", "text")
  }

  test("admissionStream: shuffled multi-micro-batch arrival with planted " +
      "INTRA- and CROSS-batch redeliveries emits exactly the batch " +
      "admission relation — the gate→curation→dedup COMPOSITION is " +
      "arrival-order-safe, one decision per doc_id") {
    import graft.streaming.IngestStream
    val docs = admissionDocs
    val model = graft.ops.TrainingData.dsirModel(
      graft.ops.TrainingData.dsirFeatures(docs, 64), "tgt")
    val dups = Seq(3L, 7L).toDF("doc_id")
    // pick the threshold from the scored batch so the gate SPLITS the
    // corpus — a one-sided gate would leave the 'gate' reason untested
    val ws = IngestStream.admissionDecisions(docs, model, dups, 64, 0L)
      .select("w_u").collect().map(_.getLong(0)).sorted
    val thr = ws(ws.length / 2)
    val batchDf = IngestStream
      .admissionDecisions(docs, model, dups, 64, thr)
    def key(r: org.apache.spark.sql.Row) = r.toSeq.toList
    val batch = batchDf.collect().map(key)
    assert(batch.length === 24)
    val reasons = batchDf.collect()
      .map(r => Option(r.getAs[String]("reason")).getOrElse("admitted"))
      .toSet
    assert(reasons === Set("admitted", "gate", "quality", "known_dup"),
      s"the planted corpus must exercise every funnel stage: $reasons")
    // stage three files in shuffled doc order: doc 5 duplicated WITHIN
    // file a (intra-batch), docs 5 and 9 replayed in file c (cross-batch)
    val stage = java.nio.file.Files.createTempDirectory("adm_stage")
    def writeFile(name: String, cond: org.apache.spark.sql.Column,
        extra: Seq[Long]): Unit = {
      val part = docs.filter(cond)
        .unionByName(docs.filter(col("doc_id").isin(extra: _*)))
      val tmp = java.nio.file.Files.createTempDirectory(s"adm_$name")
      part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      java.nio.file.Files.copy(java.nio.file.Paths.get(f),
        stage.resolve(s"$name.parquet"))
    }
    writeFile("a", col("doc_id") % 3 === 2, Seq(5L))          // 5 twice here
    writeFile("b", col("doc_id") % 3 === 0, Seq.empty)
    writeFile("c", col("doc_id") % 3 === 1, Seq(5L, 9L))      // replays
    val raw = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val q = IngestStream.admissionStream(spark, raw, model, dups, 64, thr)
      .toDF()
      .writeStream.format("memory").queryName("adm_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.sql("SELECT * FROM adm_stream").collect().map(key)
    assert(streamed.length === batch.length,
      "every redelivery (intra- or cross-batch) must be silent")
    assert(streamed.toSet === batch.toSet)
  }

  // --------------------------- q322 ordinal vs nominal Krippendorff

  /** Planted doc with exact (token, char, distinct) counts: `nTok` tokens
    * of `wordLen` chars each, cycling a `pool`-word vocabulary — so every
    * rater's bin is chosen by construction. ids are 7i+1 (never ≡ 0 mod
    * 7: the distinct-token rater rates every planted doc). */
  private def plantedBinDocs(specs: Seq[(Int, Int, Int)]) =
    specs.zipWithIndex.map { case ((nTok, wordLen, pool), i) =>
      val text = (0 until nTok)
        .map(t => ("w" + (t % pool).toString).padTo(wordLen, 'x'))
        .mkString(" ")
      ((7 * i + 1).toLong, "s", text)
    }.toDF("doc_id", "source", "text")

  test("krippendorffOrdinal: adjacent-bin disagreement prices BELOW " +
      "far-bin — ordinal alpha strictly exceeds nominal on a corpus " +
      "whose only disagreements are 1-vs-2 with bin 4 in the margins") {
    // 8 docs rated (1,2,2): 30 tokens (bin 1) of 9 chars → 299 chars
    // (bin 2), 22-word pool (bin 2); 8 docs rated (4,4,4) unanimously
    val docs = plantedBinDocs(
      Seq.fill(8)((30, 9, 22)) ++ Seq.fill(8)((90, 6, 40)))
    val r = graft.ops.Classifier.krippendorffOrdinal(docs).collect().head
    assert(r.getAs[Long]("n_categories") === 3L)   // bins {1, 2, 4}
    assert(r.getAs[Long]("o_off_2x") > 0L)         // real disagreement
    val nom = r.getAs[Long]("alpha_nom_p1_u")
    val ord = r.getAs[Long]("alpha_ord_p1_u")
    assert(ord > nom + 100000L,
      s"ordinal must price adjacent disagreement below nominal: " +
        s"nom=$nom ord=$ord")
  }

  test("krippendorffOrdinal: on a BINARY scale the ordinal difference " +
      "function collapses to nominal — dis_ord_u equals dis_nom_u " +
      "exactly (the 2-category δ² is constant across the single pair)") {
    // bins {1, 4} only: 8 unanimous (1,1,1), 4 split (1,4,4), 4 unanimous
    // (4,4,4) — extreme-bin disagreement, two categories total
    val docs = plantedBinDocs(
      Seq.fill(8)((10, 4, 10)) ++ Seq.fill(4)((30, 20, 40)) ++
        Seq.fill(4)((90, 6, 40)))
    val r = graft.ops.Classifier.krippendorffOrdinal(docs).collect().head
    assert(r.getAs[Long]("n_categories") === 2L)
    assert(r.getAs[Long]("o_off_2x") > 0L)
    assert(r.getAs[Long]("dis_ord_u") === r.getAs[Long]("dis_nom_u"))
    assert(r.getAs[Long]("alpha_ord_p1_u") === r.getAs[Long]("alpha_nom_p1_u"))
  }

  // --------------------------- q323 impact-index drift-vs-recall

  test("impactDriftRecall: the step-0 row is PURE pruning loss — its " +
      "(n_exact, n_hit) aggregate equals impactIndexRecall's at the same " +
      "params and its idf gauge reads zero; edit steps move the gauge " +
      "strictly positive with a growing edited set") {
    val docs = (0 until 40).map { i =>
      // shared phrases give cross-doc trigrams (df >= 2); per-doc words
      // keep rankings non-degenerate
      (i.toLong, s"alpha beta gamma delta epsilon w$i x$i " +
        s"alpha beta gamma zeta eta theta y${i % 5} z${i % 3} " +
        "delta epsilon zeta")
    }.toDF("doc_id", "text")
    val out = graft.ops.Retrieval.impactDriftRecall(docs,
        steps = Seq(0, 1, 2, 3), modBase = 7, modRemove = 11, keepTop = 2,
        queryStride = 10, topK = 3, dfMin = 2)
      .orderBy("step").collect()
    assert(out.length === 4)
    val r0 = out(0)
    assert(r0.getAs[Long]("n_edited") === 0L)
    assert(r0.getAs[Long]("n_removed") === 0L)
    assert(r0.getAs[Long]("n_terms_drifted") === 0L)
    assert(r0.getAs[Long]("n_terms_new") === 0L)
    assert(r0.getAs[Long]("idf_drift_total") === 0L)
    val pruneOnly = graft.ops.Retrieval.impactIndexRecall(docs,
      keepTop = 2, queryStride = 10, topK = 3, dfMin = 2).collect()
    val nFull = pruneOnly.map(_.getAs[Long]("n_full")).sum
    val nHit = pruneOnly.map(_.getAs[Long]("n_hit")).sum
    assert(nFull > 0)
    assert(r0.getAs[Long]("n_exact") === nFull)
    assert(r0.getAs[Long]("n_hit") === nHit)
    // the drift series: strictly growing edited AND departed sets, the
    // idf gauge strictly > 0 (departures move N, so EXISTING terms drift)
    val edited = out.map(_.getAs[Long]("n_edited")).toSeq
    assert(edited === edited.sorted && edited.distinct.length === 4)
    val removed = out.map(_.getAs[Long]("n_removed")).toSeq
    assert(removed === removed.sorted && removed.distinct.length === 4)
    out.tail.foreach { r =>
      assert(r.getAs[Long]("idf_drift_total") > 0L,
        s"step ${r.getAs[Long]("step")} must move the idf gauge")
      assert(r.getAs[Long]("n_terms_drifted") > 0L,
        s"step ${r.getAs[Long]("step")} must drift surviving terms' idf")
    }
  }

  // --------------------------- q324 DSIR gate-model drift

  test("dsirGateDrift: step 0 is perfect agreement with a zero gauge; " +
      "drifted non-target docs become FALSE ADMITS (frozen gate scores " +
      "their new bigrams at the unseen default, the fresh model prices " +
      "them strongly negative) while the λ gauge moves strictly positive") {
    val docs = (0 until 21).map { i =>
      val src = if (i % 3 == 0) "src7" else "web"
      (i.toLong, src,
        "the alpha beta gamma delta epsilon zeta eta theta iota kappa")
    }.toDF("doc_id", "source", "text")
    // threshold between the bands: every un-drifted doc scores ~-0.68
    // nats/bigram (~-6.1e6 total: the 1/3 target share prices shared
    // vocabulary mildly negative), a drifted doc ~-16e6 under the fresh
    // model but only ~-4.4e6 under the frozen one (unseen-default λ)
    val out = graft.ops.TrainingData.dsirGateDrift(docs,
        steps = Seq(0, 1, 2, 3), modBase = 7, targetSource = "src7",
        buckets = 256, thresholdU = Some(-10000000L))
      .orderBy("step").collect()
    assert(out.length === 4)
    val r0 = out(0)
    assert(r0.getAs[Long]("n_edited") === 0L)
    assert(r0.getAs[Long]("n_buckets_drifted") === 0L)
    assert(r0.getAs[Long]("lambda_drift_total") === 0L)
    assert(r0.getAs[Long]("n_false_admit") === 0L)
    assert(r0.getAs[Long]("n_missed") === 0L)
    assert(r0.getAs[Long]("n_admit_fresh") > 0L)
    assert(r0.getAs[Long]("agree_u") === 1000000L)
    // the edit series: ids {0,7,14} ∖ targets, then +{1,8}, then +{2,9,16}∖…
    val edited = out.map(_.getAs[Long]("n_edited")).toSeq
    assert(edited.head === 0L)
    assert(edited === edited.sorted && edited.distinct.length === 4)
    out.tail.foreach { r =>
      assert(r.getAs[Long]("lambda_drift_total") > 0L,
        s"step ${r.getAs[Long]("step")} must move the λ gauge")
    }
    val last = out(3)
    assert(last.getAs[Long]("n_false_admit") > 0L,
      "drifted docs must be admitted by the frozen gate but rejected fresh")
    assert(last.getAs[Long]("agree_u") < 1000000L ||
      last.getAs[Long]("n_false_admit") > 0L)
  }

  // --------------------------- q325 selective cache invalidation

  test("impactCacheInvalidation: a query sharing no term with the delta " +
      "is provably untouched (cache copied verbatim), a query whose " +
      "vocabulary the arrival floods is touched AND changed, and " +
      "changed ⇒ touched holds row-for-row") {
    // two disjoint vocabulary families; queries at stride 10 → ids
    // 0/10/20 (family A) and 30 (family B); the arrival floods family A
    val docs = (0 until 40).map { i =>
      val text = if (i < 30)
        s"alpha beta gamma delta epsilon w$i x$i " +
          s"alpha beta gamma zeta eta theta y${i % 5} z${i % 3} " +
          "delta epsilon zeta"
      else
        s"omega psi chi phi upsilon o$i p$i " +
          s"omega psi chi tau sigma rho q${i % 5} r${i % 3} " +
          "phi upsilon tau"
      (i.toLong, text)
    }.toDF("doc_id", "text")
    // the arrival floods the MID-frequency trigrams the A-queries carry
    // ("theta y0 z0" df=2, "theta y0 z1" df=2, "theta y0 z2" df=2 — the
    // df*2 <= N vocabulary cut excludes the common "alpha beta gamma"
    // family, so flooding THOSE would produce an empty delta)
    val arrivals = Seq((100L,
      ("theta y0 z0 " * 4) + ("theta y0 z1 " * 4) +
        ("theta y0 z2 " * 4))).toDF("doc_id", "text")
    val out = graft.ops.Retrieval.impactCacheInvalidation(docs, arrivals,
        queryStride = 10, topK = 3, dfMin = 2)
      .collect().map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(out.keySet === Set(0L, 10L, 20L, 30L))
    val b = out(30L)
    assert(!b.getAs[Boolean]("touched"))
    assert(!b.getAs[Boolean]("changed"))
    assert(b.getAs[Long]("n_delta_cand") === 0L)
    assert(b.getAs[Long]("n_common") === b.getAs[Long]("n_cached"))
    Seq(0L, 10L, 20L).foreach { q =>
      assert(out(q).getAs[Boolean]("touched"), s"query $q shares terms")
      assert(out(q).getAs[Long]("n_delta_cand") === 1L)
    }
    assert(out.values.exists(_.getAs[Boolean]("changed")),
      "the flooding arrival must displace at least one cached ranking")
    out.values.foreach { r =>
      assert(!r.getAs[Boolean]("changed") || r.getAs[Boolean]("touched"),
        "changed ⇒ touched: the frozen-stats invariant")
    }
  }
}
