package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Planted-case specs for the round-12 batch-3 operators: DSIR selection,
  * Krippendorff's alpha, effective epochs (data-constrained scaling),
  * multi-probe LSH, BM25 impact-index pruning, span-corruption manifests,
  * and the DP budget-transition monitor (batch + stream).
  */
class Round12Batch2Spec extends SparkTestBase {
  import spark.implicits._

  private def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  // ------------------------------------------------------------ q302 DSIR

  test("dsirSelect: target-like pool docs outrank divergent ones, the " +
      "Gumbel draw never flips a decisive log-ratio gap, featureless docs " +
      "stay pool-anchored at weight 0") {
    val ab = ("alpha beta " * 60).trim
    val gd = ("gamma delta " * 60).trim
    val docs = Seq(
      (1L, "tgt", ab), (2L, "tgt", ab),          // the in-domain slice
      (3L, "pool", gd), (4L, "pool", gd), (5L, "pool", gd),
      (6L, "pool", ab),                          // target-like pool doc
      (7L, "pool", "solo")                       // 1 token → no bigram
    ).toDF("doc_id", "source", "text")
    val top3 = graft.ops.TrainingData.dsirSelect(docs, "tgt",
      buckets = 64, k = 3).collect()
    // the three alpha-beta docs dominate: their log ratio is ~+40e6 µ-nats
    // while gamma-delta docs sit at ~−400e6 — far outside Gumbel range
    assert(top3.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L, 6L))
    val all = graft.ops.TrainingData.dsirSelect(docs, "tgt",
      buckets = 64, k = 10).collect()
    assert(all.length === 7) // pool-anchored: every doc is a candidate
    val byId = all.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(7L).getAs[Long]("n_feats") === 0L)
    assert(byId(7L).getAs[Long]("w_u") === 0L)
    // out-of-domain weight is decisively negative
    assert(byId(3L).getAs[Long]("w_u") < -100000000L)
    assert(byId(1L).getAs[Long]("w_u") > 10000000L)
    // key = weight + hash-derived Gumbel, replayable from the md5 draw
    val g7 = {
      val u = (h60("dsir:7") % 1000000L + 0.5) / 1000000d
      math.floor(-math.log(-math.log(u)) * 1000000d).toLong
    }
    assert(byId(7L).getAs[Long]("key_u") === g7)
  }

  // ---------------------------------------------- q303 Krippendorff alpha

  test("krippendorffAlpha: hand-computed coincidence arithmetic on a " +
      "planted 5-unit corpus with one abstaining rater") {
    // raters: lang metadata / langId heuristic (abstains: no marker words)
    // / source-majority. Unit rating multisets by construction:
    //   d1, d2: {en, en, en}   d3: {de, —, en}
    //   d4: {fr, en, fr}       d5: {fr, —, fr}
    val enText = "the thing and stuff of it to them is here the end"
    val noMark = "alpha beta gamma delta"
    val docs = Seq(
      (1L, "en", "s1", enText), (2L, "en", "s1", enText),
      (3L, "de", "s1", noMark),
      (4L, "fr", "s2", enText), (5L, "fr", "s2", noMark)
    ).toDF("doc_id", "lang", "source", "text")
    val r = graft.ops.Classifier.krippendorffAlpha(docs).first()
    // o_off_2x: d3 contributes 2(4−2)/1 = 4, d4 2(9−5)/2 = 4, rest 0
    // n_c = {en: 8, de: 1, fr: 4}, n = 13, de_pairs = 169 − 81 = 88
    // dis = ⌊8·12·10⁶ / 176⌋ = 545454 → α+1 = 1.454546
    assert(r.getAs[Long]("n_units") === 5L)
    assert(r.getAs[Long]("n_pairable") === 5L)
    assert(r.getAs[Long]("n_ratings") === 13L)
    assert(r.getAs[Long]("n_categories") === 3L)
    assert(r.getAs[Long]("o_off_2x") === 8L)
    assert(r.getAs[Long]("de_pairs") === 88L)
    assert(r.getAs[Long]("dis_u") === 545454L)
    assert(r.getAs[Long]("alpha_p1_u") === 1454546L)
  }

  test("krippendorffAlpha: a single-category corpus has undefined alpha " +
      "(NULL), not a crash or a fake 1.0") {
    val enText = "the thing and stuff of it to them is here the end"
    val docs = Seq((1L, "en", "s1", enText), (2L, "en", "s1", enText),
      (3L, "en", "s1", enText)).toDF("doc_id", "lang", "source", "text")
    val r = graft.ops.Classifier.krippendorffAlpha(docs).first()
    assert(r.getAs[Long]("de_pairs") === 0L)
    assert(r.isNullAt(r.fieldIndex("dis_u")))
    assert(r.isNullAt(r.fieldIndex("alpha_p1_u")))
  }

  // ------------------------------------------------- q304 effective epochs

  test("effectiveTokensU: first epoch is free, marginals strictly " +
      "diminish (the Muennighoff decay law)") {
    val f = (r: Int) => graft.ops.TrainingData.effectiveTokensU(r)
    assert(f(0) === 1000000L)
    val marg = (0 until 15).map(r => f(r + 1) - f(r))
    assert(marg.head < 1000000L) // repetition is never worth fresh data
    marg.sliding(2).foreach { case Seq(a, b) => assert(b < a) }
  }

  test("effectiveEpochs: content-hash dedup feeds U, the per-mille quality " +
      "staging picks the epoch count, effective tokens follow the literal " +
      "decay table") {
    val stopHeavy = "the of and to a the of and to a" // ratio 1.0 → mil 1000
    val clean = "alpha beta gamma delta epsilon zeta"  // no stopwords → mil 0
    val docs = Seq(
      (1L, "hi", stopHeavy), (2L, "hi", stopHeavy),      // exact dup pair
      (3L, "hi", stopHeavy + " extra"), (4L, "hi", stopHeavy + " more"),
      (5L, "lo", clean), (6L, "lo", clean + " eta")
    ).toDF("doc_id", "source", "text")
    val rows = graft.ops.TrainingData.effectiveEpochs(docs)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val hi = rows("hi")
    val f = (r: Int) => graft.ops.TrainingData.effectiveTokensU(r)
    assert(hi.getAs[Long]("n_docs") === 4L)
    assert(hi.getAs[Long]("unique_docs") === 3L)   // the dup collapsed
    val u = hi.getAs[Long]("unique_tokens")
    assert(u === 10L + 11L + 11L)
    assert(hi.getAs[Long]("epochs") === 4L)
    assert(hi.getAs[Long]("raw_tokens") === u * 4)
    assert(hi.getAs[Long]("eff_u") === f(3))
    assert(hi.getAs[Long]("effective_tokens") === u * f(3) / 1000000L)
    assert(hi.getAs[Long]("marginal_next_u") === f(4) - f(3))
    assert(hi.getAs[Long]("utilization_u") ===
      (hi.getAs[Long]("effective_tokens") * 1000000L) / (u * 4))
    val lo = rows("lo")
    assert(lo.getAs[Long]("epochs") === 1L)
    assert(lo.getAs[Long]("eff_u") === 1000000L)
    assert(lo.getAs[Long]("effective_tokens") ===
      lo.getAs[Long]("unique_tokens")) // single pass: nothing decays
    assert(lo.getAs[Long]("utilization_u") === 1000000L)
  }

  // -------------------------------------------------- q305 multi-probe LSH

  private def plantedVecs = (0 until 24).map { i =>
    (i.toLong, (0 until 4).map(d =>
      ((h60(s"v:$i:$d") % 2001L) - 1000L).toFloat / 1000f).toArray)
  }.toDF("vec_id", "embedding")

  test("multiprobeTopK at nProbe = 1 IS lshTopK — the probe sequence " +
      "degenerates to the query's own bucket") {
    val emb = plantedVecs
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val a = graft.ops.Similarity.multiprobeTopK(emb, qs, nPlanes = 3,
      nProbe = 1, dim = 4, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = graft.ops.Similarity.lshTopK(emb, qs, nPlanes = 3, dim = 4,
      k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a === b)
  }

  test("multiprobeRecall: candidate volume and recall are per-query " +
      "monotone in nProbe (a probed superset re-ranked exactly can only " +
      "add true hits)") {
    val rows = graft.ops.Similarity.multiprobeRecall(plantedVecs,
      nProbes = Seq(1, 2, 4), nPlanes = 3, dim = 4, k = 5, nQueries = 3)
      .collect()
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("query_id"),
        r.getAs[Long]("n_cand"), r.getAs[Long]("n_hit"),
        r.getAs[Long]("n_exact")))
    assert(rows.length === 9) // 3 probe levels × 3 queries, query-anchored
    rows.groupBy(_._2).foreach { case (_, qs) =>
      val byNp = qs.sortBy(_._1)
      byNp.sliding(2).foreach { case Array(lo, hi) =>
        assert(hi._3 >= lo._3, s"n_cand must grow with probes: $byNp")
        assert(hi._4 >= lo._4, s"n_hit must grow with probes: $byNp")
      }
      assert(byNp.forall(_._5 === 5L))
      // 3 planes → 8 buckets; 4 probes cover half the space: candidates
      // stay a strict subset of the corpus (never brute force)
      assert(byNp.last._3 < 23L)
    }
  }

  // --------------------------------------------- q306 impact-index pruning

  test("impactIndexRecall: pruning a hot posting list below the query's " +
      "true top-k costs measurable recall; an unbinding cap keeps it at 1") {
    val phrase = ("x y z " * 8).trim
    // doc 0 is the query (0 % 251 = 0); 7 phrase docs share every hot trigram
    val phraseDocs = Seq((0L, phrase), (6L, phrase)) ++
      (1 to 5).map(i => (i.toLong, phrase + " tail" + i))
    val docs = phraseDocs.toDF("doc_id", "text")
      .unionByName((10 to 25).map(i =>
        (i.toLong + 100, s"filler$i only words here nothing shared $i " +
          s"p$i q$i r$i s$i t$i u$i v$i")).toDF("doc_id", "text"))
    val tight = graft.ops.Retrieval.impactIndexRecall(docs, keepTop = 2,
      queryStride = 251, topK = 5).collect()
    assert(tight.length === 1) // one query doc
    val t = tight.head
    assert(t.getAs[Long]("n_full") === 5L)
    assert(t.getAs[Long]("recall_u") < 1000000L,
      "keepTop=2 must prune some of the query's true top-5")
    assert(t.getAs[Long]("kept_postings") < t.getAs[Long]("full_postings"))
    val loose = graft.ops.Retrieval.impactIndexRecall(docs, keepTop = 1000,
      queryStride = 251, topK = 5).collect().head
    assert(loose.getAs[Long]("recall_u") === 1000000L)
    assert(loose.getAs[Long]("kept_postings") ===
      loose.getAs[Long]("full_postings"))
  }

  // ------------------------------------------------- q307 span corruption

  test("spanCorruption: the md5 coin and offset replay per block; " +
      "sentinel accounting matches T5; short docs emit zeros") {
    val toks = (1 to 35).map(i => s"w$i").mkString(" ") // 2 blocks + tail 3
    val docs = Seq((42L, toks), (43L, "a b c d e f g h i j"), (44L, ""))
      .toDF("doc_id", "text")
    val rows = graft.ops.TrainingData.spanCorruption(docs, block = 16,
      span = 3, noisePct = 45).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // independent replay of the blocked mask for doc 42
    val expected = (0 until 2).flatMap { blk =>
      if (h60(s"span:42:$blk") % 100 < 45)
        Some(blk * 16 + h60(s"spanpos:42:$blk") % 14)
      else None
    }
    val d = rows(42L)
    assert(d.getAs[Long]("n_tokens") === 35L)
    assert(d.getAs[Long]("n_blocks") === 2L)
    assert(d.getAs[Long]("n_spans") === expected.length.toLong)
    assert(d.getAs[Long]("masked_tokens") === 3L * expected.length)
    assert(d.getAs[Long]("input_len") ===
      35L - 3L * expected.length + expected.length)
    assert(d.getAs[Long]("target_len") ===
      (if (expected.nonEmpty) 3L * expected.length + expected.length + 1 else 0L))
    assert(d.getAs[Long]("corruption_u") ===
      3L * expected.length * 1000000L / 35L)
    if (expected.nonEmpty)
      assert(d.getAs[Long]("first_span") === expected.min)
    val short = rows(43L) // 10 tokens < block → zero blocks, zero spans
    assert(short.getAs[Long]("n_blocks") === 0L)
    assert(short.getAs[Long]("n_spans") === 0L)
    assert(short.getAs[Long]("input_len") === 10L)
    assert(short.getAs[Long]("target_len") === 0L)
    assert(short.getAs[Long]("corruption_u") === 0L)
    assert(rows(44L).getAs[Long]("corruption_u") === 0L)
  }

  // --------------------------------- q308 + LedgerStream budget monitoring

  private def plantedReleases = Seq(
    ("A", 1L, 693147L, 3L), ("A", 2L, 693147L, 3L), ("A", 3L, 693147L, 4L),
    ("A", 4L, 693147L, 4L), ("A", 5L, 693147L, 4L),
    ("B", 1L, 693147L, 2L), ("B", 2L, 693147L, 2L)
  ).toDF("domain", "seq", "epsilon_u", "n_classes")

  test("budgetTransitions: the 4th ln-2 release crosses the 4·ln-2 budget " +
      "exactly once; later releases are exhausted but not crossing") {
    val rows = graft.ops.Privacy.budgetTransitions(plantedReleases)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(rows(("A", 3L)).getAs[Long]("spent_u") === 2079441L)
    assert(!rows(("A", 3L)).getAs[Boolean]("exhausted"))
    assert(rows(("A", 4L)).getAs[Long]("spent_u") === 2772588L)
    assert(rows(("A", 4L)).getAs[Boolean]("crossed"))
    assert(rows(("A", 4L)).getAs[Long]("remaining_u") === 0L)
    assert(rows(("A", 5L)).getAs[Boolean]("exhausted"))
    assert(!rows(("A", 5L)).getAs[Boolean]("crossed"))
    assert(!rows(("B", 2L)).getAs[Boolean]("exhausted"))
    assert(rows(("B", 2L)).getAs[Long]("remaining_u") === 1386294L)
    assert(rows.values.count(_.getAs[Boolean]("crossed")) === 1)
  }

  test("LedgerStream: micro-batched spend telescopes to the batch ledger " +
      "across boundaries; a redelivered release is a no-op") {
    import graft.streaming.LedgerStream
    val releases = plantedReleases
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("domain"), r.getAs[Long]("seq"),
        r.getAs[Long]("spent_u"), r.getAs[Long]("remaining_u"),
        r.getAs[Boolean]("exhausted"), r.getAs[Boolean]("crossed"))
    val batch = graft.ops.Privacy.budgetTransitions(releases)
      .collect().map(key).toSet
    // batch twin evaluated through the SAME stateful operator
    val asBatch = LedgerStream.budgetMonitorStream(spark, releases).toDF()
      .collect().map(key).toSet
    assert(asBatch === batch)
    // stream in two files: A's series straddles the boundary, and file b
    // REDELIVERS (A, seq 3) after it was applied in file a
    val stage = java.nio.file.Files.createTempDirectory("ledger_stage")
    val fileA = releases.filter(col("domain") === "A" && col("seq") <= 3 ||
      col("domain") === "B" && col("seq") === 1)
    val fileB = releases.filter(col("domain") === "A" && col("seq") >= 4 ||
      col("domain") === "B" && col("seq") === 2)
      .unionByName(releases.filter(col("domain") === "A" && col("seq") === 3))
    Seq(("a", fileA), ("b", fileB)).foreach { case (n, df) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"ledger_$n")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      java.nio.file.Files.copy(java.nio.file.Paths.get(part),
        stage.resolve(s"$n.parquet"))
    }
    val raw = spark.readStream.schema(releases.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val q = LedgerStream.budgetMonitorStream(spark, raw).toDF()
      .writeStream.format("memory").queryName("ledger_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.sql("SELECT * FROM ledger_stream").collect()
    assert(streamed.length === 7, "the redelivered (A,3) must not re-emit")
    assert(streamed.map(key).toSet === batch)
  }
}
