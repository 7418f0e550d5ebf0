package graft

import org.apache.spark.sql.functions._

import graft.ops.Retrieval

/** Planted-case specs for the round-11 second batch: hybrid sparse+dense
  * RRF fusion and the nDCG ranking audit.
  */
class Round11Batch2Spec extends SparkTestBase {
  import spark.implicits._

  test("rrfFusion: a doc on BOTH lists outranks single-list docs; " +
      "the lexical self-hit never reaches the fused output") {
    // lexical side: n=4 docs; trigram "beta gamma delta" has df=2 (docs 0
    // and 1) and survives the df*2<=n band; "alpha beta gamma" has df=3 and
    // is banded out. Query = doc 0 (0 % 251 == 0). Lexical list: doc 0
    // (self, rank 1), doc 1 (rank 2) — docs 2 and 3 score on no term.
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma zeta"),
      (3L, "unrelated words entirely here")).toDF("doc_id", "text")
    // dense side: query [1,0]; cos(3)≈1 > cos(2)≈0.994 > cos(1)=0
    val emb = Seq(
      (0L, Seq(1f, 0f), 0),
      (1L, Seq(0f, 1f), 0),
      (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(1f, 0.01f), 0)).toDF("vec_id", "embedding", "label")
    val out = Retrieval.rrfFusion(docs, emb).orderBy(col("fused_rank"))
      .collect()
    assert(out.forall(_.getLong(0) == 0L)) // single query 0
    assert(!out.exists(_.getLong(1) == 0L)) // self-hit filtered
    // doc 1: lex rank 2 + dense rank 3 → 1e6/62 + 1e6/63 = 16129 + 15873
    // doc 3: dense rank 1 only → 1e6/61 = 16393
    // doc 2: dense rank 2 only → 1e6/62 = 16129
    val byDoc = out.map(r => r.getLong(1) ->
      (r.get(2), r.get(3), r.getLong(4), r.getLong(5))).toMap
    assert(byDoc(1L) == ((2L, 3L, 32002L, 1L)))
    assert(byDoc(3L) == ((null, 1L, 16393L, 2L)))
    assert(byDoc(2L) == ((null, 2L, 16129L, 3L)))
  }

  test("ragContext: strict-prefix budget fill — the first overflow closes " +
      "the context, later documents never back-fill") {
    // same planted corpus as the fusion test: fused order for query 0 is
    // doc 1 (4 tokens), doc 3 (4 tokens), doc 2 (4 tokens); budget 8 keeps
    // exactly the first two
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma zeta"),
      (3L, "unrelated words entirely here")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Seq(1f, 0f), 0),
      (1L, Seq(0f, 1f), 0),
      (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(1f, 0.01f), 0)).toDF("vec_id", "embedding", "label")
    val out = graft.ops.Retrieval.ragContext(docs, emb, budgetTokens = 8L)
      .orderBy(col("fused_rank")).collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_tokens"),
      r.getAs[Boolean]("in_context"))).toSeq ==
      Seq((1L, 4L, true), (3L, 8L, true), (2L, 12L, false)))
  }

  test("ndcgWeights: exact ⌊10⁶/log₂(r+1)⌋ table") {
    assert(Retrieval.ndcgWeights(3) == Seq(1000000L, 630929L, 500000L))
  }

  test("ndcgAudit: a perfect index scores ndcg_u = 10⁶ on every query") {
    // all vectors share one direction (positive scales), so every LSH
    // plane projects them to the same sign → one bucket → the approximate
    // list EQUALS the exact list (all cosines are 1.0, ties to vec_id)
    val emb = (0L to 7L).map(i =>
      (i, Seq(1f + i, 2f * (1 + i), 0.5f * (1 + i)), 0))
      .toDF("vec_id", "embedding", "label")
    val queries = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val out = Retrieval.ndcgAudit(emb, queries, k = 4, dim = 3).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_exact") == 4L)
      assert(r.getAs[Long]("n_hit") == 4L)
      assert(r.getAs[Long]("ndcg_u") == 1000000L)
      // dcg over ranks 1..4 = idcg by construction
      assert(r.getAs[Long]("dcg_u") == r.getAs[Long]("idcg_u"))
    }
  }

  test("ndcgAudit: a miss at the TOP costs more than the same miss lower " +
      "down (position sensitivity recall@k cannot see)") {
    // hand-computed from the shared weight table, k=3, n_exact=3:
    // idcg = 1000000+630929+500000 = 2130929
    // approx hits exact ranks but MISSES one: missing the rank-1 doc while
    // returning the others at approx ranks 1,2 → dcg = 1000000+630929;
    // missing the rank-3 doc with others at approx ranks 1,2 → same dcg —
    // but if the two hits land at approx ranks 2,3 (a junk doc took rank
    // 1), dcg = 630929+500000 = 1130929 < 1630929: position matters.
    val ws = Retrieval.ndcgWeights(3)
    val idcg = ws.sum
    assert(idcg == 2130929L)
    val topHits = ws(0) + ws(1)
    val shifted = ws(1) + ws(2)
    assert(topHits * 1000000L / idcg == 765360L)
    assert(shifted * 1000000L / idcg == 530721L)
    assert(shifted < topHits)
  }

  test("conformalInterval planted: q̂ is the ⌈(n+1)(1−α)⌉-th residual and " +
      "coverage counts |err| ≤ q̂ on the test split only") {
    // calibration (even ids): n_chars=10, tokens 10..19 →
    // ratio_u = 145·10⁶/100 = 1450000, pred = 14, residuals
    // {4,3,2,1,0,1,2,3,4,5}; rank = ⌈0.9·11⌉ = 10 → q̂ = 5 (the max).
    // test (odd ids): residuals {0,5,6} → covered {0,5} → 2/3.
    val cal = (0 until 10).map(k =>
      (2L * k, Seq.fill(10 + k)("w").mkString(" "), 10L))
    val tst = Seq(
      (1L, Seq.fill(14)("w").mkString(" "), 10L), // err 0
      (3L, Seq.fill(19)("w").mkString(" "), 10L), // err 5
      (5L, Seq.fill(20)("w").mkString(" "), 10L)) // err 6
    val docs = (cal ++ tst).toDF("doc_id", "text", "n_chars")
    val out = graft.ops.Classifier
      .conformalInterval(docs, col("doc_id") % 2 === 0).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_calib") == 10L)
    assert(r.getAs[Long]("n_test") == 3L)
    assert(r.getAs[Long]("ratio_u") == 1450000L)
    assert(r.getAs[Long]("rank_needed") == 10L)
    assert(r.getAs[Long]("qhat") == 5L)
    assert(r.getAs[Long]("n_covered") == 2L)
    assert(r.getAs[Long]("coverage_u") == 666666L)
    assert(r.getAs[Long]("met_target") == 0L)
  }

  test("conformalInterval tiny-calibration corner: rank > n_calib means an " +
      "infinite interval — everything covered, q̂ NULL") {
    // n_calib = 5 → rank = ⌈0.9·6⌉ = 6 > 5 → q̂ = ∞ (NULL)
    val cal = (0 until 5).map(k =>
      (2L * k, Seq.fill(10 + k)("w").mkString(" "), 10L))
    val tst = Seq((1L, Seq.fill(99)("w").mkString(" "), 10L))
    val docs = (cal ++ tst).toDF("doc_id", "text", "n_chars")
    val r = graft.ops.Classifier
      .conformalInterval(docs, col("doc_id") % 2 === 0).collect().head
    assert(r.isNullAt(r.fieldIndex("qhat")))
    assert(r.getAs[Long]("rank_needed") == 6L)
    assert(r.getAs[Long]("n_covered") == 1L)
    assert(r.getAs[Long]("coverage_u") == 1000000L)
    assert(r.getAs[Long]("met_target") == 1L)
  }

  private def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("forgetDocs planted: keeper re-election, emptied classes, and the " +
      "digest delta is exactly the XOR of the CHANGED keeper terms") {
    // class A (1,2,3): keeper 1 forgotten → re-elects 2
    // class B (4,5): untouched
    // class C (6): solo, forgotten → emptied
    // class D (7,8): non-keeper 8 forgotten → touched, NO re-election
    val docs = Seq(
      (1L, "dup class a text here"), (2L, "dup class a text here"),
      (3L, "dup class a text here"),
      (4L, "class b body"), (5L, "class b body"),
      (6L, "solo forgotten document"),
      (7L, "class d shared words"), (8L, "class d shared words"))
      .toDF("doc_id", "text")
    val r = graft.ops.Pipeline
      .forgetDocs(docs, col("doc_id").isin(1L, 6L, 8L)).collect().head
    assert(r.getAs[Long]("n_docs") == 8L)
    assert(r.getAs[Long]("n_forgotten") == 3L)
    assert(r.getAs[Long]("n_surviving") == 5L)
    assert(r.getAs[Long]("tokens_forgotten") == 5L + 3L + 4L)
    assert(r.getAs[Long]("n_groups") == 4L)
    assert(r.getAs[Long]("n_groups_touched") == 3L)
    assert(r.getAs[Long]("n_groups_emptied") == 1L)
    assert(r.getAs[Long]("n_keeper_reelected") == 1L)
    // unchanged classes cancel in the XOR: only A's old/new keepers and
    // C's vanished keeper contribute — the incremental manifest patch
    val expectedDelta = h60("m:1") ^ h60("m:2") ^ h60("m:6")
    assert(r.getAs[Long]("digest_delta") == expectedDelta)
    assert((r.getAs[Long]("digest_before") ^ r.getAs[Long]("digest_after"))
      == expectedDelta)
  }

  test("canaryAudit planted: class splits inflate the deduped corpus and " +
      "canaries on duplicated content count as escapes") {
    // canary ids (everyN=101): 0, 101, 202
    // class A {0,1,2}: canary on keeper → splits to 2 keepers, 1 escape
    // class B {101,3}: canary on non-keeper → splits to 2, 1 escape
    // class C {202}: solo canary → unique either way, no inflation
    // classes D {4,5}, E {6}: untouched
    val docs = Seq(
      (0L, "class a shared text"), (1L, "class a shared text"),
      (2L, "class a shared text"),
      (101L, "class b text"), (3L, "class b text"),
      (202L, "solo canary doc"),
      (4L, "class d text"), (5L, "class d text"),
      (6L, "solo plain doc")).toDF("doc_id", "text")
    val r = graft.ops.TrainingData.canaryAudit(docs).collect().head
    assert(r.getAs[Long]("n_docs") == 9L)
    assert(r.getAs[Long]("n_canaries") == 3L)
    assert(r.getAs[Long]("n_groups") == 5L)
    assert(r.getAs[Long]("n_keepers_after") == 7L)
    assert(r.getAs[Long]("corpus_inflation") == 2L)
    assert(r.getAs[Long]("n_dup_escapes") == 2L)
  }

  test("sourceContribution planted: exclusive classes count one keeper " +
      "copy, shared classes mark redundancy on BOTH sources") {
    val docs = Seq(
      (1L, "exclusive alpha content", "A"),
      (2L, "exclusive alpha content", "A"),
      (3L, "shared beta content here", "A"),
      (4L, "shared beta content here", "B"),
      (5L, "only b text", "B")).toDF("doc_id", "text", "source")
    val out = graft.ops.TrainingData.sourceContribution(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getAs[Long]("n_docs") == 3L)
    assert(a.getAs[Long]("n_tokens") == 10L)
    assert(a.getAs[Long]("n_groups_touching") == 2L)
    assert(a.getAs[Long]("n_exclusive_groups") == 1L)
    assert(a.getAs[Long]("n_shared_groups") == 1L)
    assert(a.getAs[Long]("exclusive_tokens") == 3L) // one keeper copy
    assert(a.getAs[Long]("redundancy_u") == 500000L)
    val b = out("B")
    assert(b.getAs[Long]("n_docs") == 2L)
    assert(b.getAs[Long]("n_tokens") == 7L)
    assert(b.getAs[Long]("n_exclusive_groups") == 1L)
    assert(b.getAs[Long]("exclusive_tokens") == 3L)
    assert(b.getAs[Long]("redundancy_u") == 500000L)
  }

  test("curriculumOrder: easy-first staging, and the sort-free position " +
      "arithmetic equals a literal global sort") {
    // 8 easy docs (all common tokens: nll = ln(72/48) ≈ 0.4 nats) and 8
    // hard docs (3 unique tokens each: nll = ln 72 ≈ 4.3 nats); stages=2
    // splits exactly at the halfway mass
    val easy = (0 until 8).map(i => (i.toLong, "a a a a a a"))
    val hard = (0 until 8).map(i =>
      (100L + i, s"uniq${i}x uniq${i}y uniq${i}z"))
    val docs = (easy ++ hard).toDF("doc_id", "text")
    val out = graft.ops.TrainingData.curriculumOrder(docs, stages = 2)
      .collect()
    assert(out.length == 16)
    // pos is a permutation of 1..16
    assert(out.map(_.getAs[Long]("pos")).sorted.toSeq == (1L to 16L))
    // easy docs land in stage 0, hard in stage 1
    out.foreach { r =>
      val expected = if (r.getAs[Long]("doc_id") < 100L) 0L else 1L
      assert(r.getAs[Long]("stage") == expected, r.toString)
    }
    // the two-phase prefix-sum position == row_number over a REAL global
    // sort by (stage, md5(doc_id), doc_id)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val sorted = out.sortBy(r => (r.getAs[Long]("stage"),
      md5hex(r.getAs[Long]("doc_id").toString), r.getAs[Long]("doc_id")))
    sorted.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("pos") == i + 1L, s"pos mismatch at $i: $r")
    }
  }

  test("curriculumPacking: concat-and-chunk bins follow the curriculum " +
      "order, offsets equal literal global-sort prefix sums") {
    val easy = (0 until 8).map(i => (i.toLong, "a a a a a a"))
    val hard = (0 until 8).map(i =>
      (100L + i, s"uniq${i}x uniq${i}y uniq${i}z"))
    val docs = (easy ++ hard).toDF("doc_id", "text")
    // 6-token easy docs then 3-token hard docs; budget 10 → bins advance
    // every ~2 docs in the easy stage
    val out = graft.ops.TrainingData
      .curriculumPacking(docs, stages = 2, budget = 10L).collect()
    assert(out.length == 16)
    val byPos = out.sortBy(_.getAs[Long]("pos"))
    // offsets are exact prefix sums in pos order; bins are start div 10
    var cum = 0L
    byPos.foreach { r =>
      assert(r.getAs[Long]("start_offset") == cum, r.toString)
      assert(r.getAs[Long]("bin") == cum / 10L, r.toString)
      cum += r.getAs[Long]("n_tokens")
    }
    // pos agrees with curriculumOrder's
    val ord = graft.ops.TrainingData.curriculumOrder(docs, stages = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos"))
      .toMap
    out.foreach(r =>
      assert(r.getAs[Long]("pos") == ord(r.getAs[Long]("doc_id"))))
  }

  test("indexStaleness planted: unindexed arrivals, orphaned departures, " +
      "and changed-content entries classify independently") {
    // previous snapshot indexed docs {1, 2(old text), 3, 99}; current
    // corpus is {1, 2(new text), 3, 5}: 5 unindexed, 99 orphaned,
    // 2 changed, 1 and 3 fresh
    val prev = Seq(
      (1L, "stable first document text here"),
      (2L, "original second document body words"),
      (3L, "third document also quite stable"),
      (99L, "departed document no longer present")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "stable first document text here"),
      (2L, "rewritten second document body words"),
      (3L, "third document also quite stable"),
      (5L, "newly arrived unindexed document text")).toDF("doc_id", "text")
    val r = graft.ops.Dedup.indexStaleness(corpus,
      graft.ops.Dedup.minhashSignatures(prev, 8)).collect().head
    assert(r.getAs[Long]("n_corpus") == 4L)
    assert(r.getAs[Long]("n_index") == 4L)
    assert(r.getAs[Long]("n_fresh") == 2L)
    assert(r.getAs[Long]("n_unindexed") == 1L)
    assert(r.getAs[Long]("n_orphaned") == 1L)
    assert(r.getAs[Long]("n_changed") == 1L)
    assert(r.getAs[Long]("coverage_u") == 500000L)
  }
}
