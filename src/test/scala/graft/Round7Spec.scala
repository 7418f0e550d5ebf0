package graft

import org.apache.spark.sql.functions._
import graft.graph.{Analytics, Centrality}
import graft.ops.{Quantize, TextAnalysis}

/** Planted-case specs for the round-7 operators: HITS hubs/authorities,
  * Matryoshka prefix-dim fidelity, corpus n-gram diversity, and
  * densest-subgraph peeling. */
class Round7Spec extends SparkTestBase {
  import spark.implicits._

  test("hits separates hubs from authorities on a planted bipartite graph") {
    // 1,2,3 are pure hubs; 10,11 pure authorities. 10 is cited by all
    // three hubs, 11 only by 3 — so auth(10) > auth(11), and 3 (citing
    // both) out-hubs 1 and 2 (citing one each).
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L)).toDF("src", "dst")
    val v = Seq(1L, 2L, 3L, 10L, 11L).toDF("id")
    val out = Centrality.hits(v, e, rounds = 3).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out(10L)._2 > out(11L)._2 && out(11L)._2 > 0)
    assert(out(1L)._2 === 0.0 && out(2L)._2 === 0.0) // nothing points at hubs
    assert(out(3L)._1 > out(1L)._1 && out(1L)._1 === out(2L)._1)
    // pure authorities keep only the shifted-iteration seed hub mass
    assert(out(10L)._1 < out(1L)._1 && out(10L)._1 === out(11L)._1)
  }

  test("matryoshkaFidelity reports zero error for prefix-identical pairs, exact error for a planted tail divergence") {
    // pair (0, 7): identical first 32 dims, vec 7 adds mass at dim 33 —
    // cos_8/16/32 = 1, cos_full = 1/sqrt(2) → err_u = 292893 at every budget
    val a = Array.tabulate(64)(i => if (i == 0) 1f else 0f)
    val b = Array.tabulate(64)(i => if (i == 0 || i == 33) 1f else 0f)
    // pair (1, 8): fully identical → err 0 at every budget
    val c = Array.tabulate(64)(i => if (i == 2) 2f else 0f)
    val emb = Seq((0L, a), (7L, b), (1L, c), (8L, c)).toDF("vec_id", "embedding")
    val out = Quantize.matryoshkaFidelity(emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // cos_full = round(1/sqrt(2), 6) = 0.707107 → round((1 − 0.707107)·1e6)
    val expected = 292893L
    for (d <- Seq(8L, 16L, 32L)) {
      assert(out(d)._1 === 2L) // two pairs
      assert(out(d)._2 === expected, s"dim $d sum")
      assert(out(d)._3 === expected, s"dim $d max")
    }
  }

  test("corpusDiversity: exact TTR and head share per n on a planted corpus") {
    val docs = Seq((1L, "a a a a"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.corpusDiversity(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // unigrams: a x5, b x1
    assert(out(1L) === ((6L, 2L, 5L, 333333L, 833333L)))
    // bigrams: "a a" x3, "a b" x1
    assert(out(2L) === ((4L, 2L, 3L, 500000L, 750000L)))
    // trigrams: "a a a" x2
    assert(out(3L) === ((2L, 1L, 2L, 500000L, 1000000L)))
  }

  test("linkParts fuses name distance with attribute agreement into FS bands") {
    val parts = Seq(
      (1L, "alpha beta gamma", "T1", "B1", 5L, 900.0),
      // dist 1 to #1, brand/size/price agree → 350k+200k+100k+50k = match
      (2L, "alpha beta gamma!", "T1", "B1", 5L, 900.5),
      // dist 1 to #1 but every attribute differs → 350k alone = dropped
      (3L, "alpha beta gamm", "T1", "B2", 20L, 450.0),
      // identical name but different type → blocked, never a candidate
      (4L, "alpha beta gamma", "T2", "B1", 5L, 900.0))
      .toDF("p_partkey", "p_name", "p_type", "p_brand", "p_size",
        "p_retailprice")
    val out = graft.ops.RecordLinkage.linkParts(parts).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out.keySet === Set((1L, 2L)))
    assert(out((1L, 2L)) === ((1L, 700000L, "match")))
  }

  test("crossSourceMatrix attributes a cross-feed duplicate to the right cell") {
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, dup, "web"), (2L, dup, "books"),
      (3L, "completely different text with nothing shared at all here now", "web"))
      .toDF("doc_id", "text", "source")
    val out = graft.ops.Dedup.crossSourceMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(("books", "web") -> ((1L, 1000000L, 1000000L))))
  }

  test("jlProjectionAudit: a single-axis displacement projects to the exact JL ratio") {
    // pair (1, 8): identical except dim 5 differs by 0.5 (exact in float) —
    // every ±1 row sees the same |delta|, so d2_proj = k·d2_orig exactly
    // and ratio_u = 10^6 (band 10). Pair (0, 7) is identical → d2_orig = 0
    // → excluded by the degenerate-pair guard.
    val base = Array.fill(64)(0.25f)
    val moved = base.clone(); moved(5) = 0.75f
    val emb = Seq((0L, base), (7L, base), (1L, base), (8L, moved))
      .toDF("vec_id", "embedding")
    val out = graft.ops.Decomposition.jlProjectionAudit(emb).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 10L) // band
    assert(out.head.getLong(1) === 1L) // n_pairs
    assert(out.head.getLong(2) === 1000000L && out.head.getLong(3) === 1000000L)
  }

  test("clusterSilhouette scores tight well-separated clusters near 10^6") {
    // seeds (first-2 ids) are planted one per true cluster
    val emb = (Seq(1L, 3L, 4L).map(i => (i, Array(1.0f + 0.001f * i, 0.0f))) ++
      Seq(2L, 5L, 6L).map(i => (i, Array(0.0f, 1.0f + 0.001f * i))))
      .toDF("vec_id", "embedding")
    val out = graft.ops.Quantize.clusterSilhouette(emb, k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.size === 2)
    out.values.foreach { case (n, mean, minv) =>
      assert(n === 3L)
      assert(mean > 700000L && minv > 500000L)
    }
  }

  test("annRecall: an all-duplicate corpus gives perfect recall and MRR") {
    // identical vectors share an LSH signature with certainty, so the
    // approx list equals the exact list → recall_u = mrr_u = 10^6
    val v = Array.tabulate(64)(i => 0.125f * ((i % 3) + 1))
    val emb = (0L to 11L).map(i => (i, v)).toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val out = graft.ops.Similarity.annRecall(emb, queries, k = 10).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 10L && r.getLong(2) === 10L) // n_exact, n_hit
    assert(r.getLong(3) === 1000000L && r.getLong(4) === 1000000L)
  }

  test("thresholdSweep: an exact duplicate lands in the top decile with doc coverage") {
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq((1L, dup), (2L, dup),
      (3L, "one two three four five six seven eight"),
      (4L, "nine ten eleven twelve thirteen fourteen fifteen sixteen"))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.thresholdSweep(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet.forall(b => b >= 0 && b <= 10))
    assert(out(10L)._1 >= 1L && out(10L)._2 >= 2L) // the planted dup pair
  }

  test("densestSubgraph peels the pendant tail and flags the clique round as best") {
    // K4 on {1,2,3,4} with a pendant path 4-100-101: round 0 = whole graph
    // (density 8/6), round 1 = the K4 after the tail peels (density 6/4 —
    // the best), later rounds empty
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val tail = Seq((4L, 100L), (100L, 101L))
    val out = Analytics.densestSubgraph((k4 ++ tail).toDF("a", "b"), rounds = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(0L) === ((6L, 8L, 1333333L, false)))
    assert(out(1L) === ((4L, 6L, 1500000L, true)))
    assert(out(2L)._4 === false && out(2L)._1 === 0L)
  }
}
