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
