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

  test("incrementalReleaseChangelog == ledger-diff increment == full " +
      "recompute, with noop upserts and unknown-id deletes ignored") {
    import graft.ops.Pipeline
    val oldDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"),
      (3L, "solo unique text about nothing in particular here now"),
      (4L, "match target text that doc three will copy exactly soon"),
      (5L, "source for the added duplicate doc twenty to copy"),
      (6L, "common boiler plate text shared by six and seven"),
      (7L, "common boiler plate text shared by six and seven"),
      (9L, "alpha beta gamma delta epsilon zeta eta theta"),
      (12L, "one two three four five six seven eight")).toDF("doc_id", "text")
    // changelog: delete 2 (resurrects 12); change 1 (resurrects 9) and 3
    // (onto 4's text — newly drops 4); add 20 (dup of 5) and 21 (novel);
    // NOOP upsert of 6 (same text — its sigs/pairs must survive so 7
    // stays dropped); delete of unknown id 999 (must be ignored)
    val changelog = Seq(
      ("delete", 2L, null.asInstanceOf[String]),
      ("upsert", 1L, "completely different replacement text with no overlap whatsoever anymore"),
      ("upsert", 3L, "match target text that doc three will copy exactly soon"),
      ("upsert", 20L, "source for the added duplicate doc twenty to copy"),
      ("upsert", 21L, "brand new novel document with fresh words only here"),
      ("upsert", 6L, "common boiler plate text shared by six and seven"),
      ("delete", 999L, null.asInstanceOf[String])
    ).toDF("op", "doc_id", "text")
    val newDocs = Seq(
      (1L, "completely different replacement text with no overlap whatsoever anymore"),
      (3L, "match target text that doc three will copy exactly soon"),
      (4L, "match target text that doc three will copy exactly soon"),
      (5L, "source for the added duplicate doc twenty to copy"),
      (6L, "common boiler plate text shared by six and seven"),
      (7L, "common boiler plate text shared by six and seven"),
      (9L, "alpha beta gamma delta epsilon zeta eta theta"),
      (12L, "one two three four five six seven eight"),
      (20L, "source for the added duplicate doc twenty to copy"),
      (21L, "brand new novel document with fresh words only here"))
      .toDF("doc_id", "text")
    val viaChangelog = Pipeline.incrementalReleaseChangelog(
      Pipeline.releaseState(oldDocs), newDocs, changelog)
    val viaDiff = Pipeline.incrementalRelease(
      Pipeline.releaseState(oldDocs), newDocs)
    val viaFull = Pipeline.fullRelease(oldDocs, newDocs)
    assert(viaChangelog.columns.toSeq == viaFull.columns.toSeq)
    val rows = Seq(viaChangelog, viaDiff, viaFull).map(_.collect().map(_.toSeq))
    assert(rows(0).length == 1)
    assert(rows(0).head == rows(2).head)
    assert(rows(1).head == rows(2).head)
    // planted expectation: the noop upsert of 6 left (6,7) intact
    val m = viaChangelog.first().getValuesMap[Long](viaChangelog.columns)
    assert(m("n_pairs") == 3L)   // (3,4), (5,20), (6,7)
    assert(m("n_dropped") == 3L) // 4, 20, 7
    assert(m("n_added") == 2L && m("n_changed") == 2L && m("n_removed") == 1L)
  }

  test("multimodalKeepers: either modality vouches for a cluster; " +
      "disagreeing pairs flag conflict; most-caption-tokens keeper wins") {
    import graft.ops.Multimodal
    def pay(s: String) = s.getBytes("UTF-8")
    val media = Seq(
      (1L, pay("identical image payload bytes one and the same")),
      (2L, pay("identical image payload bytes one and the same")),
      (3L, pay("another shared image payload for the img-only pair")),
      (4L, pay("another shared image payload for the img-only pair")),
      (5L, pay("zebra unrelated pixels aaaaaaaaaaaaaaaaaaaaaaa")),
      (6L, pay("qqqq totally different bytes zzzzzzz 0123456789")),
      (7L, pay("loner media payload unlike anything else here"))
    ).toDF("media_id", "payload")
    val captions = Seq(
      (1L, "a tabby cat sitting on a red couch in the sun"),
      (2L, "a tabby cat sitting on a red couch in the sun"), // both-match
      (3L, "short caption few words"),
      (4L, "an entirely different much longer caption with many many more words here"),
      (5L, "the same caption describes two different images exactly"),
      (6L, "the same caption describes two different images exactly"),
      (7L, "a unique caption for the singleton")
    ).toDF("media_id", "caption")
    val out = Multimodal.multimodalKeepers(media, captions)
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("cluster"), r.getAs[Boolean]("keep"),
          r.getAs[Boolean]("conflict"))).toMap
    assert(out.size == 7)
    // (1,2) agree in both modalities: one cluster, no conflict
    assert(out(1L)._1 == out(2L)._1 && !out(1L)._3 && !out(2L)._3)
    // (3,4) image-only: clustered AND conflict-flagged; keeper = 4
    // (more caption tokens beats the smaller id)
    assert(out(3L)._1 == out(4L)._1 && out(3L)._3 && out(4L)._3)
    assert(!out(3L)._2 && out(4L)._2)
    // (5,6) caption-only: clustered AND conflict-flagged
    assert(out(5L)._1 == out(6L)._1 && out(5L)._3 && out(6L)._3)
    // singleton keeps itself, unflagged
    assert(out(7L)._2 && !out(7L)._3)
    // keeper per cluster: exactly one keep = true
    assert(out.values.groupBy(_._1).forall(_._2.count(_._2) == 1))
  }

  test("epochCurriculumPacking: tier replication x stage order — every " +
      "copy positioned, offsets = global-sort prefix sums") {
    val docs = spark.read.parquet(s"$testData/sf0.001/documents.parquet")
    val out = graft.ops.TrainingData.epochCurriculumPacking(docs)
      .select("doc_id", "copy", "epochs", "stage", "n_tokens", "pos",
        "start_offset", "bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // tier replication: each doc appears exactly `epochs` times,
    // copies numbered 1..epochs
    val byDoc = out.groupBy(_._1)
    assert(byDoc.forall { case (_, rs) =>
      rs.length == rs.head._3 && rs.map(_._2).sorted.toSeq == (1L to rs.head._3)
    })
    // all copies of a doc share its corpus-level stage
    assert(byDoc.forall { case (_, rs) => rs.map(_._4).distinct.length == 1 })
    // pos is a permutation of 1..N over ALL copies
    val n = out.length
    assert(out.map(_._6).sorted.toSeq == (1L to n))
    // the sort-free arithmetic equals the literal global sort:
    // stage non-decreasing along pos, start_offset = running token sum
    val inOrder = out.sortBy(_._6)
    assert(inOrder.sliding(2).forall {
      case Array(a, b) => a._4 <= b._4; case _ => true })
    var cum = 0L
    inOrder.foreach { r =>
      assert(r._7 == cum, s"offset mismatch at pos ${r._6}")
      assert(r._8 == cum / 2048L)
      cum += r._5
    }
    // and pos order within a (stage, shard-key) respects the interleave
    // key: recompute md5(doc:copy) and assert global (stage, key) sort
    val keyed = inOrder.map(r => (r._4, {
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${r._1}:${r._2}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      m
    }, r._1, r._2))
    assert(keyed.sameElements(keyed.sortBy(k => (k._1, k._2, k._3, k._4))))
  }

  test("epsilonLedger: two same-domain releases compose sequentially; " +
      "budget exhaustion is per-domain") {
    import graft.ops.Privacy
    // planted two-release composition: 'age' emitted twice, 'zip' once
    val series = Seq(
      ("age", 5L, 693147L, 1L), ("age", 5L, 693147L, 1L),
      ("zip", 3L, 693147L, 1L))
      .toDF("domain", "n_classes", "epsilon_u", "sensitivity")
    val led = Privacy.epsilonLedger(series).collect()
      .map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("n_releases"), r.getAs[Long]("spent_u"),
          r.getAs[Long]("remaining_u"), r.getAs[Boolean]("exhausted"))).toMap
    assert(led("age") == ((2L, 1386294L, 1386294L, false)))
    assert(led("zip") == ((1L, 693147L, 2079441L, false)))
    // a tighter budget exhausts the double-spent domain ONLY
    val tight = Privacy.epsilonLedger(series, budgetEpsilonU = 1386294L)
      .collect().map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("remaining_u"), r.getAs[Boolean]("exhausted"))).toMap
    assert(tight("age") == ((0L, true)) && tight("zip") == ((693147L, false)))
    // wiring: two real dpHistogram emits roll up to exactly 2x epsilon
    val docs = Seq((1L, "en"), (2L, "en"), (3L, "fr")).toDF("doc_id", "lang")
    def emit() = Privacy.dpHistogram(docs, Seq(col("lang").as("lang")))
      .agg(count(lit(1)).as("n_classes"), max(col("epsilon_u")).as("epsilon_u"),
        max(col("sensitivity")).as("sensitivity"))
      .select(lit("lang").as("domain"), col("n_classes"), col("epsilon_u"),
        col("sensitivity"))
    val two = Privacy.epsilonLedger(emit().unionByName(emit())).first()
    assert(two.getAs[Long]("spent_u") == 2L * 693147L)
    assert(two.getAs[Long]("n_classes") == 4L) // 2 classes x 2 emits
  }

  test("RAG serve stream == batch: micro-batched query arrivals assemble " +
      "the same contexts as q289's batch fill") {
    import graft.streaming.RagStream
    val docs = spark.read.parquet(s"$testData/sf0.001/documents.parquet")
    val emb = spark.read.parquet(s"$testData/sf0.001/embeddings.parquet")
    val index = RagStream.fusedIndex(docs, emb)
      .localCheckpoint(true) // static serve index, computed once
    val qids = emb.filter(col("vec_id") % 251 === 0)
      .select(col("vec_id").as("query_id"))
      .collect().map(_.getLong(0)).sorted
    assert(qids.length >= 2, "need >= 2 queries for two micro-batches")
    // batch evaluation of the SAME plan == the q289 operator
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("fused_rank"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("cum_tokens"), r.getAs[Boolean]("in_context"))
    val batchTwin = RagStream.ragContextStream(
      qids.toSeq.toDF("query_id"), index).collect().map(key).toSet
    val q289 = graft.ops.Retrieval.ragContext(docs, emb)
      .collect().map(key).toSet
    assert(batchTwin === q289)
    // stream the queries in two micro-batches through the memory sink
    val stage = java.nio.file.Files.createTempDirectory("rag_stream")
    qids.zipWithIndex.foreach { case (q, n) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"rag_q$n")
      Seq(q).toDF("query_id").coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      java.nio.file.Files.copy(java.nio.file.Paths.get(part),
        stage.resolve(s"q$n.parquet"))
    }
    val raw = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val q = RagStream.ragContextStream(raw, index)
      .writeStream.format("memory").queryName("rag_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamed = spark.sql("SELECT * FROM rag_stream")
      .collect().map(key).toSet
    assert(streamed === q289)
  }

  test("ivfPqStaleness plants all four states: fresh, recoded (sign-" +
      "flipped vector), orphaned, unindexed") {
    import graft.ops.Quantize
    def v(a: Float, b: Float, c: Float, dd: Float) = Array(a, b, c, dd)
    val old = Seq(
      (1L, v(1f, 0f, 0f, 0f)), (2L, v(0f, 1f, 0f, 0f)),
      (3L, v(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val cur = Seq(
      (1L, v(1f, 0f, 0f, 0f)),      // untouched → fresh
      (2L, v(0f, -1f, 0f, 0f)),     // sign-flipped → recoded
      (4L, v(0.9f, 0.1f, 0f, 0f))   // new arrival → unindexed; 3 leaves
    ).toDF("vec_id", "embedding")
    val idx = Quantize.ivfPqIndex(old, nCells = 2, m = 2, k = 2,
      rounds = 1, dim = 4)
    val m = Quantize.ivfPqStaleness(idx, cur).first()
    assert(m.getAs[Long]("n_corpus") == 3L)
    assert(m.getAs[Long]("n_index") == 3L)
    assert(m.getAs[Long]("n_fresh") == 1L)
    assert(m.getAs[Long]("n_recoded") == 1L)
    assert(m.getAs[Long]("n_orphaned") == 1L)
    assert(m.getAs[Long]("n_unindexed") == 1L)
    assert(m.getAs[Long]("coverage_u") == 333333L)
    assert(m.getAs[Long]("total_drift") >= m.getAs[Long]("max_cell_drift"))
  }

  test("ivfPqEncode: appending the delta under frozen codebooks equals " +
      "re-encoding the whole corpus (sf0.001)") {
    import graft.ops.Quantize
    val emb = spark.read.parquet(s"$testData/sf0.001/embeddings.parquet")
    val idx = Quantize.ivfPqIndex(emb.filter(col("vec_id") % 3 =!= 0),
      nCells = 4, m = 4, k = 8, rounds = 1, dim = 64)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("cell", "vec_id", "sub", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val incremental = key(idx.codes.join(idx.vcell, Seq("vec_id"))
        .select(col("cell"), col("vec_id"), col("sub"), col("cid")))
      .union(key(Quantize.ivfPqEncode(emb.filter(col("vec_id") % 3 === 0),
        idx.coarse, idx.cents, idx.subDim)))
    val full = key(Quantize.ivfPqEncode(emb, idx.coarse, idx.cents,
      idx.subDim))
    assert(incremental === full)
  }

  test("packedAttentionSpans: segments tile every bin and reassemble " +
      "every document exactly once") {
    val docs = spark.read.parquet(s"$testData/sf0.001/documents.parquet")
    val spans = graft.ops.TrainingData.packedAttentionSpans(docs)
      .collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("seg_start"), r.getAs[Long]("seg_end"),
        r.getAs[Boolean]("starts_here"), r.getAs[Boolean]("ends_here")))
    val packed = graft.ops.TrainingData.curriculumPacking(docs)
      .select("doc_id", "n_tokens", "bin").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // per doc: segments sum to n_tokens, exactly one start and one end,
    // and the starting segment sits in the packing's start bin
    spans.groupBy(_._2).foreach { case (doc, segs) =>
      val (nTok, startBin) = packed(doc)
      assert(segs.map(x => x._4 - x._3).sum == nTok, s"doc $doc mass")
      assert(segs.count(_._5) == 1 && segs.count(_._6) == 1, s"doc $doc flags")
      assert(segs.filter(_._5).head._1 == startBin, s"doc $doc start bin")
    }
    // per bin: segments tile [0, fill) with no gaps or overlaps
    val total = packed.values.map(_._1).sum
    spans.groupBy(_._1).foreach { case (bin, segs) =>
      val sorted = segs.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"bin $bin start")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3, s"bin $bin gap")
        case _ =>
      }
      val fill = math.min(2048L, total - bin * 2048L)
      assert(sorted.last._4 == fill, s"bin $bin fill")
    }
  }

  test("repetitionMask: overlapping extents union (not sum); clean and " +
      "sub-window docs report zeros") {
    val t1 = "a1b2c3d4" * 6   // 48 chars
    val t2 = "SHAREDMIDDLE16ch" // 16 chars
    val t3 = "z9y8x7w6" * 6   // 48 chars
    val docs = Seq(
      (1L, t1 + t2 + t3),                 // 112 chars; [1,64] dups with 2,
                                          // [49,112] dups with 3 — OVERLAP
      (2L, t1 + t2 + "BBBBbbbbBBBBbbbbBBBBbbbbBBBBbbbb"),
      (3L, t2 + t3 + "CCCCccccCCCCccccCCCCccccCCCCcccc"),
      (4L, "totally clean unique text with no duplicated blocks")
    ).toDF("doc_id", "text")
    val out = graft.ops.Dedup.repetitionMask(docs, 64, 16)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chars"), r.getAs[Long]("n_extents"),
          r.getAs[Long]("masked_chars"), r.getAs[Long]("mask_u"))).toMap
    assert(out.size == 4)
    // doc 1: two 64-char extents [1,64] and [49,112] union to 112, NOT 128
    assert(out(1L) == ((112L, 2L, 112L, 1000000L)))
    assert(out(2L)._2 == 1L && out(2L)._3 == 64L)
    assert(out(3L)._2 == 1L && out(3L)._3 == 64L)
    // doc 4 is shorter than the window: zero extents, zero mask
    assert(out(4L) == ((51L, 0L, 0L, 0L)))
  }

  test("persisted IVF-PQ index: cell filter prunes partitions, probe join " +
      "has no fact-side Exchange, and results equal the in-memory path") {
    import graft.ops.Quantize
    val emb = spark.read.parquet(s"$testData/sf0.001/embeddings.parquet")
    val idx = Quantize.ivfPqIndex(emb, nCells = 4, m = 4, k = 8,
      rounds = 1, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    Quantize.writeIvfPqIndex(idx, "ivfpq_codes_t", s"$dir/codes")
    try {
      val fact = graft.sources.Store.table(spark, "ivfpq_codes_t")
      // (1) the layout prunes: a probed-cell filter becomes a
      // PartitionFilter (directory pruning — unprobed cells never open)
      val cells = fact.select(col("cell")).distinct()
        .orderBy(col("cell")).limit(1)
        .collect().map(_.getLong(0)) // 1-row driver artifact, spec-only
      val pruned = fact.filter(col("cell") === cells.head)
      val scan = pruned.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") && scan.contains("cell"),
        scan.take(2000))
      // (2) the probe over the PERSISTED fact equals the in-memory probe
      val mem = Quantize.ivfPqProbe(idx, nprobe = 2, nQueries = 3, topK = 5)
        .select("query_id", "vec_id", "adist", "rank")
        .collect().map(_.toSeq).toSet
      val srv = Quantize.ivfPqProbeFact(fact, idx.iv, idx.coarse, idx.cents,
          idx.subDim, nprobe = 2, nQueries = 3, topK = 5)
        .select("query_id", "vec_id", "adist", "rank")
      assert(srv.collect().map(_.toSeq).toSet === mem)
      // (3) no Exchange on the fact side under the probe join: the ADC
      // tables broadcast, so the corpus-sized relation is read once and
      // never reshuffled (the aggregate after it keys on (query, vec))
      val plan = srv.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
      assert(!plan.contains("Exchange hashpartitioning(cell"),
        "fact side reshuffled on cell despite broadcast ADC join:\n" +
          plan.take(2000))
    } finally spark.sql("DROP TABLE IF EXISTS ivfpq_codes_t")
  }
}
