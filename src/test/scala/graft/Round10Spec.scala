package graft

import org.apache.spark.sql.functions._

import graft.ops.QualityAudit

/** Planted-case specs for the round-10 hardening batch: the four r9
  * advisory fixes (ksDrift negative values, benford extreme magnitudes,
  * cohensKappa corner clamp, pretrainCorpus fuzzyCut guard).
  */
class Round10Spec extends SparkTestBase {
  import spark.implicits._

  test("ksDrift handles negative values: v_min bias keeps pack/decode exact") {
    // group a occupies the negative half, b the positive — the sup gap is 1
    // at the last a-breakpoint (v = −1); before the v_min bias, a raw
    // negative low word corrupted the max-key ordering and the % decode
    val df = Seq(("a", -5L), ("a", -1L), ("b", 3L), ("b", 7L))
      .toDF("grp", "v")
    val out = QualityAudit.ksDrift(df, col("v"), col("grp"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      ("a", 2L, 2L, 1000000L, -1L),
      ("b", 2L, 2L, 1000000L, -1L)))
  }

  test("ksDrift negative-domain ties break to the LARGEST breakpoint") {
    // one group vs itself-complement where two breakpoints share the sup:
    // a = {-10}, b = {-10, -2}; grid {-10, -2}. For a: CDF_a(-10)=1,
    // rest-CDF(-10)=1/2 → gap 1/2; at -2: 1 vs 1 → gap 0. For b at -10:
    // 1/2 vs 1 → 1/2; at -2: 1 vs 1 → 0. Unique sups here; now force a tie
    // with symmetric groups: {-3,-1} vs {-3,-1} → gap 0 everywhere, argmax
    // must be the largest breakpoint (-1), not the smallest
    val df = Seq(("x", -3L), ("x", -1L), ("y", -3L), ("y", -1L))
      .toDF("grp", "v")
    val out = QualityAudit.ksDrift(df, col("v"), col("grp"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("x", 0L, -1L), ("y", 0L, -1L)))
  }

  test("benford excludes values >= 2^63 instead of saturating the cast") {
    // 1e19 > Long.MaxValue: Spark would saturate to 9223372036854775807
    // (first digit '9') while an ANSI engine errors — the range filter
    // drops it on both, keeping the audited population engine-identical
    val df = Seq(1.0e19, 12.0, 15.0, 0.5).toDF("x")
    val out = QualityAudit.benford(df, col("x")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("1", 2L, 1000000L)))
  }

  test("basketLift maxBasket drops pathological containers and audits them") {
    // basket 9 is a 12-item "crawl session": quadratic fan-out territory.
    // With cap 8 it must vanish from pair counts, supports, AND the basket
    // total N — and be counted in the audit column.
    val big = (1 to 12).map(i => (9L, s"hub$i"))
    val items = (Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"), (3L, "B"),
      (4L, "A"), (4L, "C"), (5L, "B")) ++ big ++ Seq((9L, "A"), (9L, "B")))
      .toDF("ok", "p")
    val out = graft.ops.Association.basketLift(items, col("ok"), col("p"),
        maxBasket = Some(8L))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
    // identical to the uncapped q259-planted expectation (basket 9 gone),
    // plus the audit scalar = 1 dropped container
    assert(out.toSeq == Seq(
      ("A", "B", 3L, 4L, 4L, 750000L, 750000L, 937500L, 1L)))
    // uncapped: basket 9 participates (A,B co-occur 4×, supports 5/5, N 5)
    val un = graft.ops.Association.basketLift(items, col("ok"), col("p"))
      .filter(col("a") === "A" && col("b") === "B")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(un.toSeq == Seq((4L, 5L, 5L)))
  }

  test("rfmTransitions runs ONE events scan for both halves (r10 fix)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val events = Queries.normalizeEventsTs(
      spark.read.parquet(s"$testData/sf0.001/events.parquet"))
    @volatile var scanStages = 0
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (sc.stageInfo.rddInfos.exists(_.name.contains("FileScanRDD")))
          scanStages += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // construction materializes the mid broadcast + the single
      // (user, half) aggregate checkpoint; collect touches no file after
      val out = graft.ops.TimeSeries.rfmTransitions(events).collect()
      assert(out.nonEmpty)
      // drain the listener bus: poll until the count is stable
      var last = -1
      var spins = 0
      while (scanStages != last && spins < 50) {
        last = scanStages; Thread.sleep(100); spins += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // midpoint agg (1 file-scan stage) + per-(user,half) agg (1) — the r9
    // two-pass version ran 5 (mid + 2×(anchor + per-user agg))
    assert(scanStages <= 2, s"events scanned $scanStages times, expected <= 2")
  }

  test("Quantiles.lowQuantiles: ceil-rank, low-value ties, per-group") {
    // grp a: {1,2,3,4} → p50 ceil-rank ⌈2⌉ = 2nd value = 2 (LOW median,
    // not interpolated 2.5); p25 = 1, p75 = 3, p100 = 4.
    // grp b: {10,10,30} → p50 = 10 (tie resolves to actual value).
    val vals = (Seq(1L, 2L, 3L, 4L).map(("a", _)) ++
      Seq(10L, 10L, 30L).map(("b", _))).toDF("grp", "v")
    val out = graft.ops.Quantiles.lowQuantiles(vals,
        Seq(25 -> "p25", 50 -> "p50", 75 -> "p75", 100 -> "p100"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("a", 4L, 1L, 2L, 3L, 4L),
      ("b", 3L, 10L, 10L, 30L, 30L)))
  }

  test("bpeEncode: overlapping-run merges encode left-to-right (⌈k/2⌉)") {
    // round 1 elects "a a" (weight 4+3 = 7). "aaaaa" = [a,a,a,a,a] is a run
    // of 4 overlapping matches — exactly the odd ordinals merge, like a
    // sequential scan: aa|aa|a → 3 symbols (not 2 with greedy-all, not 4
    // with leftmost-only). "aa" → [aa] = 1 symbol.
    val docs = Seq((1L, "aaaaa aa b"), (2L, "aa aa"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.bpeEncode(docs, rounds = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 3L, 5L, 8L, 1666666L), // aaaaa→3 + aa→1 + b→1 = 5 BPE tokens
      (2L, 2L, 2L, 4L, 1000000L)))
  }

  test("sequencePackingBy packs on the provided length column") {
    val docs = Seq((0L, "en", 3L), (1L, "en", 3L), (2L, "en", 3L))
      .toDF("doc_id", "lang", "n_enc")
    val out = graft.ops.TrainingData.sequencePackingBy(docs, col("n_enc"),
        budget = 5, partCol = "lang", shardDocs = 100)
      .orderBy("bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // offsets 0,3,6 → doc0/doc1 start in bin 0, doc2 in bin 1
    assert(out.toSeq == Seq(
      ("en", 0L, 0L, 2L, 6L, 0L, 1L),
      ("en", 0L, 1L, 1L, 3L, 2L, 2L)))
  }

  test("datasetRelease: card ≡ funnel ≡ manifest consistency on one run") {
    val docs = spark.read.parquet(s"$testData/sf0.001/documents.parquet")
    val r = graft.ops.Pipeline.datasetRelease(docs).collect().head
    def L(n: String) = r.getAs[Long](n)
    // the one-relation consistency the separate stages only prove pairwise:
    // the card describes EXACTLY the released docs, the manifest ships
    // EXACTLY them, and both agree with the funnel's n_train scalar
    assert(L("card_docs") == L("n_train"))
    assert(L("manifest_docs") == L("n_train"))
    assert(L("card_tokens") == L("manifest_tokens"))
    // the funnel only narrows
    assert(L("n_raw") >= L("n_cascade") && L("n_cascade") >= L("n_dedup")
      && L("n_dedup") >= L("n_clean") && L("n_clean") >= L("n_train"))
    // leakage-safe split ⇒ zero straddling near-dup pairs BY CONSTRUCTION
    assert(L("leak_straddle") == 0L)
    // released docs passed dedup at 0.8, so any surviving pair is sub-cut
    assert(L("n_dup_docs") <= 2 * L("n_dup_pairs"))
    // and the funnel scalars equal pretrainCorpus's own on the same config
    val f = graft.ops.Pipeline.pretrainCorpus(docs).collect().head
    Seq("n_raw", "n_cascade", "n_dedup", "n_clean", "n_train").foreach { c =>
      assert(f.getAs[Long](c) == L(c), c)
    }
  }

  test("vocabGrowth: first-occurrence buckets, dense grid, cumulative TTR") {
    val docs = Seq((0L, "a b a"), (150L, "b c"), (250L, "c d"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.vocabGrowth(docs).orderBy("bucket")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (0L, 1L, 3L, 2L, 3L, 2L, 666666L), // a,b new; 3 occurrences
      (1L, 1L, 2L, 1L, 5L, 3L, 600000L), // only c is new (b re-occurs)
      (2L, 1L, 2L, 1L, 7L, 4L, 571428L)))
  }

  test("zipfClasses: rank intervals from the count-domain running sum") {
    val docs = Seq((1L, "a a a b b c d")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.zipfClasses(docs)
      .orderBy(col("cnt").desc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (3L, 1L, 1L, 1L), // a: rank 1
      (2L, 1L, 2L, 2L), // b: rank 2
      (1L, 2L, 3L, 4L))) // c,d share class ranks 3..4
  }

  test("burstyTokens: per-type source concentration, top-k by mass") {
    val docs = Seq((1L, "x x y", "sa"), (2L, "x z", "sb"))
      .toDF("doc_id", "text", "source")
    val out = graft.ops.TextAnalysis.burstyTokens(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      ("x", 3L, 2L, 2L, 666666L), // 2-of-3 in sa
      ("y", 1L, 1L, 1L, 1000000L),
      ("z", 1L, 1L, 1L, 1000000L)))
  }

  test("lengthQuantiles: exact ceil-rank report per group with extremes") {
    val df = (Seq(1L, 2L, 3L, 4L).map(("a", _)) ++ Seq(7L, 7L, 9L).map(("b", _)))
      .toDF("grp", "v")
    val out = QualityAudit.lengthQuantiles(df, col("v"), col("grp"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.toSeq == Seq(
      ("a", 4L, 1L, 4L, 1L, 2L, 3L, 4L), // ⌈.25·4⌉=1st,⌈.5⌉=2nd,⌈.75⌉=3rd,⌈.95·4⌉=4th
      ("b", 3L, 7L, 9L, 7L, 7L, 9L, 9L)))
  }

  test("dupByQuality: near-dup endpoints land in their quality bins") {
    // docs 1≡2 are near-dups (bin of their stopword ratio); 3 is unique.
    // "the ... of ... to" pushes 1/2 into a nonzero stopword bin; 3's text
    // has no stopwords → bin 0
    val t = "the quick fox of the glen runs to the old mill near the river " +
      "bank at dawn with a friend and a dog"
    val docs = Seq((1L, t), (2L, t), (3L, "qq ww ee rr tt yy uu ii oo pp " +
      "aa ss dd ff gg hh jj kk ll zz xx cc vv bb nn mm q1 w2 e3 r4"))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.dupByQuality(docs).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._2).sum == 3L) // every doc binned exactly once
    assert(out.map(_._3).sum == 2L) // exactly the near-dup pair's endpoints
    // the dup endpoints share one bin (identical text ⇒ identical ratio)
    assert(out.count(_._3 == 2L) == 1)
    val dupBin = out.find(_._3 == 2L).get
    assert(dupBin._4 == 2L * 1000000L / dupBin._2)
    // doc 3 is alone in bin 0 with zero dups
    assert(out.head == ((0L, 1L, 0L, 0L)))
  }

  test("vocabDelta: current-only types counted per source") {
    val base = Seq((1L, "x y z", "sa")).toDF("doc_id", "text", "source")
    val cur = Seq((1L, "x y z", "sa"), (2L, "x NEW", "sa"),
      (3L, "q r", "sb")).toDF("doc_id", "text", "source")
    val out = graft.ops.TextAnalysis.vocabDelta(base, cur)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("sa", 4L, 1L, 250000L), // {x,y,z,new}: only "new" is new
      ("sb", 2L, 2L, 1000000L))) // q,r both unseen
  }

  test("mmrTopK diversifies: an exact duplicate is deferred behind a diverse pick") {
    // query [1,0]; 10 and 11 are EXACT duplicates (both most relevant);
    // 12 is less relevant but diverse. Pure cosine ranks 10,11,12; at
    // λ=0.5 MMR must pick 10, then 12 (11's redundancy penalty = its
    // relevance), then 11. Round-1 ties break to the smallest vec_id.
    val emb = Seq(
      (0L, Array(1f, 0f)), (10L, Array(0.99f, 0.1f)),
      (11L, Array(0.99f, 0.1f)), (12L, Array(0.8f, -0.6f)))
      .toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val out = graft.ops.Similarity.mmrTopK(emb, queries, k = 3,
        lambdaU = 500000L)
      .orderBy("pick").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 10L), (2L, 12L), (3L, 11L)))
    // the plain cosine ranking would have been 10, 11, 12
    val cos = graft.ops.Similarity.cosineTopK(emb, queries, 3)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(cos.toSeq == Seq(10L, 11L, 12L))
  }

  test("normalizedDedup groups case/punct/space variants; exact dedup can't") {
    val docs = Seq(
      (1L, "Hello,  World!"), (2L, "hello world"), (3L, "HELLO WORLD."),
      (4L, "goodbye world"), (5L, "goodbye world"), (6L, "unrelated text"))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.normalizedDedup(docs)
      .orderBy("keep_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (3L, 1L, 3L), // hello group: 3 docs, 3 DISTINCT raw texts — pure
                    // normalization wins, invisible to exact dedup
      (2L, 4L, 1L))) // goodbye group: byte-identical pair (raw dups too)
  }

  test("pretrainCorpus rejects a fuzzyCut below the stage-3 LSH threshold") {
    val docs = Seq((1L, "en", "a b c")).toDF("doc_id", "lang", "text")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Pipeline.pretrainCorpus(docs, fuzzyCut = Some(0.3))
    }
    assert(e.getMessage.contains("0.5"))
  }
}
