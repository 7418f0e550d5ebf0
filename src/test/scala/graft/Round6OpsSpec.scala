package graft

import org.apache.spark.sql.functions._
import graft.ops.{QualityAudit, TrainingData}
import graft.graph.LinkPrediction

/** Planted-case specs for the round-6 operators: Adamic-Adar link
  * prediction, per-source caps, weighted deterministic sampling, and the
  * declarative quality audit. */
class Round6OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("adamicAdar scores non-adjacent pairs by inverse-log common-neighbor degree") {
    // square with one diagonal: 1-2, 1-3, 2-3, 2-4, 3-4.
    // Non-adjacent pair (1,4): common neighbors {2, 3}, both degree 3
    //   → score = 2 * floor(1e6 / ln 3) = 2 * 910239 = 1820478
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val out = LinkPrediction.adamicAdar(edges).collect()
    assert(out.length === 1) // every other pair is an existing edge
    assert(out.head.getLong(0) === 1L && out.head.getLong(1) === 4L)
    assert(out.head.getLong(2) === 2L * math.floor(1e6 / math.log(3)).toLong)
  }

  test("adamicAdar hub cap drops high-degree common neighbors from wedges") {
    // star: hub 99 connects 1..5; spokes are otherwise unconnected. All
    // candidate pairs' only common neighbor is the hub (degree 5).
    val edges = (1L to 5L).map(i => (i, 99L)).toDF("a", "b")
    assert(LinkPrediction.adamicAdar(edges, maxDeg = 4).isEmpty)
    val kept = LinkPrediction.adamicAdar(edges, maxDeg = 8).collect()
    assert(kept.length === 10) // C(5,2) spoke pairs scored via the hub
    assert(kept.forall(_.getLong(2) === math.floor(1e6 / math.log(5)).toLong))
  }

  test("sourceCap keeps at most 2x-mean docs per source, by content-hash order") {
    // sizes 10/1/1 → total 12, 3 sources → cap = floor(24/3) = 8
    val docs = ((1L to 10L).map(i => (i, "big")) ++
      Seq((11L, "s1"), (12L, "s2"))).toDF("doc_id", "source")
    val out = TrainingData.sourceCap(docs)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc === Map("big" -> 8L, "s1" -> 1L, "s2" -> 1L))
    assert(out.agg(max("rk")).head.getLong(0) === 8L)
    // deterministic: the same 8 docs survive on re-run
    val kept1 = out.filter($"source" === "big").select("doc_id").collect().toSet
    val kept2 = TrainingData.sourceCap(docs).filter($"source" === "big")
      .select("doc_id").collect().toSet
    assert(kept1 === kept2 && kept1.size === 8)
  }

  test("sourceCap two-phase rank equals the single-window per-source rank") {
    // the md5-prefix sharded rank must reconstruct the EXACT global
    // per-source rank a skew-prone single window would compute
    val docs = (1L to 600L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val twoPhase = TrainingData.sourceCap(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"source")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    val cap = 600L * 2 / 3
    val reference = docs
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= cap)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(twoPhase === reference)
  }

  test("weightedSample is a deterministic top-k favoring heavier docs") {
    val docs = (1L to 200L).map(i => (i, "x" * 10, i * 37 % 400 + 1))
      .toDF("doc_id", "text", "n_chars")
      .unionByName(Seq((999L, "", 0L)).toDF("doc_id", "text", "n_chars"))
    val out = TrainingData.weightedSample(docs, k = 50).collect()
    assert(out.length === 50)
    assert(!out.exists(_.getLong(0) === 999L)) // zero-length doc filtered
    // keys are ln(u)/w with u in (0,1] → all ≤ 0, sorted descending
    val keys = out.map(_.getDouble(2))
    assert(keys.forall(_ <= 0.0) && (keys sameElements keys.sortBy(-_)))
    // determinism across runs (no RNG state)
    val again = TrainingData.weightedSample(docs, k = 50).collect()
    assert(out.map(_.getLong(0)) sameElements again.map(_.getLong(0)))
    // inclusion is weight-biased: sampled docs skew longer than the corpus
    val sampledMean = out.map(r => math.exp(r.getDouble(1)) - 1).sum / 50
    assert(sampledMean > 200.0) // corpus mean n_chars ≈ 200
  }

  test("quality audit counts each planted violation class exactly once") {
    val fact = Seq(
      (Some(1L), 1, 10.0, "A", 100L),   // clean
      (Some(1L), 1, 10.0, "A", 100L),   // duplicate (1,1) key
      (None, 2, 10.0, "N", 100L),       // null key
      (Some(2L), 1, 99.0, "R", 100L),   // quantity out of range
      (Some(3L), 1, 10.0, "X", 100L),   // bad enum
      (Some(4L), 1, 10.0, "A", 555L))   // dangling FK
      .toDF("k", "ln", "qty", "flag", "fk")
    val dim = Seq(100L).toDF("dk")
    import QualityAudit._
    val out = audit(fact, Seq(
      NotNull("nn", "k"),
      Bounds("rng", "qty", 0, 50),
      InSet("dom", "flag", Seq("A", "N", "R")),
      Unique("uq", Seq("k", "ln")),
      RefIntegrity("ri", "fk", dim, "dk"))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out("nn") === ((1L, 6L, false)))
    assert(out("rng") === ((1L, 6L, false)))
    assert(out("dom") === ((1L, 6L, false)))
    assert(out("uq") === ((1L, 6L, false)))
    assert(out("ri") === ((1L, 6L, false)))
  }

  test("semanticDedup auto-k scales cells with the corpus and still finds planted dups") {
    // auto path = hyperplane signature cells (round 7: the corpus-scaled
    // k-means assignment was O(n²/256)); an exact duplicate pair projects
    // identically, so it always shares a cell and dedups at any corpus size
    val small = ((1L to 40L).map(i =>
      (i, Array(i.toFloat, (i * 3 % 7).toFloat, 1f, (i % 5).toFloat))) :+
      (41L, Array(100f, 3f, 1f, 1f)) :+ (42L, Array(100f, 3f, 1f, 1f)))
      .toDF("vec_id", "embedding")
    val byId = graft.ops.Similarity.semanticDedup(small, rounds = 2, threshold = 0.99999)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(byId(42L) === ((41L, false))) // dup collapses onto the min id
    assert(byId(41L) === ((41L, true)))
    assert(byId.size === 42)

    // at 3k vectors, cells = 2^p with 2^p·256 >= n — and an exact duplicate
    // pair still lands in one cell (identical vectors assign identically)
    val big = ((1L to 3000L).map(i =>
      (i, Array((i % 97).toFloat, (i % 89).toFloat, (i % 83).toFloat, 1f))) :+
      (9001L, Array(500f, -500f, 500f, -500f)) :+
      (9002L, Array(500f, -500f, 500f, -500f)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.semanticDedup(big, rounds = 2, threshold = 0.9999)
    val planted = out.filter($"vec_id" === 9002L).head()
    assert(planted.getLong(1) === 9001L && !planted.getBoolean(2))
  }

  test("unigramLogProb scores docs by corpus-LM cross-entropy, integer-exact") {
    val docs = Seq((1L, "a a a a"), (2L, "a b"), (3L, "z"))
      .toDF("doc_id", "text")
    // counts: a=5, b=1, z=1, N=7; term_u = floor((ln N - ln cnt) * 1e6)
    val tA = math.floor((math.log(7) - math.log(5)) * 1e6).toLong // 336472
    val t1 = math.floor(math.log(7) * 1e6).toLong                 // 1945910
    val out = graft.ops.TextAnalysis.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((4L, tA)))
    assert(out(2L) === ((2L, (tA + t1) / 2)))
    assert(out(3L) === ((1L, t1)))
  }

  test("CDC chunking self-synchronizes: a shared region chunks identically at different offsets") {
    // the shared region is long enough (~600 chars) to contain interior
    // content-defined boundaries whp (expected gap = 64); the differing
    // prefixes have different LENGTHS, so fixed-size chunking could never
    // align the copies — boundary self-synchronization is what's under test
    val shared = (1 to 120).map(i => (i * 7919 % 97).toString).mkString(".")
    val docs = Seq(
      (1L, "pfx-one " + shared),
      (2L, "a-much-longer-prefix-two " + shared))
      .toDF("doc_id", "text")
    val out = graft.ops.Chunking.chunkDedup(docs).collect()
    assert(out.nonEmpty, "no shared chunk found — boundary re-sync failed")
    assert(out.forall(r => r.getLong(2) === 2L && r.getLong(3) === 2L))
    // and an exact duplicate doc shares every chunk with its twin
    val dup = Seq((1L, shared), (2L, shared)).toDF("doc_id", "text")
    val dd = graft.ops.Chunking.chunkDedup(dup).collect()
    assert(dd.nonEmpty && dd.forall(_.getLong(2) === 2L))
    assert(dd.map(_.getLong(1)).sum === shared.length.toLong)
  }

  test("pmiPairs surfaces banded collocations and drops out-of-band tokens") {
    // xq/yq perfectly collocated in all 20 docs; junk tokens are hapaxes
    // (below the frequency band) and must never reach the pair stage
    val docs = (1 to 20).map { i =>
      val junk = (1 to 20).map(j => s"junk${i}_$j").mkString(" ")
      (i.toLong, s"xq yq aa ${if (i % 2 == 0) "bb " else ""}$junk")
    }.toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.pmiPairs(docs).collect()
    val asMap = out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(asMap(("xq", "yq")) === 20L)
    assert(asMap(("aa", "bb")) === 10L)
    assert(!out.exists(r => r.getString(0).startsWith("junk") ||
      r.getString(1).startsWith("junk")))
    // perfectly-dependent pairs have equal PMI regardless of frequency:
    // ln(c_ab·N²/(P·c_a·c_b)) is scale-free — both planted pairs tie
    val pmi = out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(pmi(("xq", "yq")) === pmi(("aa", "bb")))
  }

  test("harmonicSampled: exact inverse-distance sums from id-mod sources") {
    // path 0-1-2-3-4-5 plus spur 1-97; sources = {0, 97} (ids % 97 == 0)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 97L))
      .toDF("a", "b")
    val out = graft.graph.Centrality.harmonicSampled(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((2000000L, 2L)))      // d=1 from both sources
    assert(out(2L) === ((1000000L, 2L)))      // d=2 from both
    assert(out(3L) === ((666666L, 2L)))       // 2·⌊10⁶/3⌋
    assert(out(4L) === ((500000L, 2L)))       // d=4 from both (depth cap)
    assert(out(0L) === ((500000L, 1L)))       // seen only from 97 at d=2
    assert(out(97L) === ((500000L, 1L)))
    assert(!out.contains(5L))                 // d=5 > depth from both
  }

  test("keywords: per-doc top-k tf-idf terms, stopwords df-banded away") {
    // "common" appears in every doc (df=10 → stopword band drops it);
    // "rareword" df=2, tf=3 in doc 1 → w_u = 3·⌊1000·10/2⌋ = 15000
    val docs = (1L to 10L).map { i =>
      val extra = i match {
        case 1 => " rareword rareword rareword midword"
        case 2 => " rareword"
        case 3 => " midword midword"
        case _ => ""
      }
      (i, s"common common$extra")
    }.toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.keywords(docs).collect()
    assert(!out.exists(_.getString(1) === "common"))
    val d1 = out.filter(_.getLong(0) === 1L).sortBy(_.getLong(3))
    assert(d1.map(_.getString(1)).toSeq === Seq("rareword", "midword"))
    assert(d1.head.getLong(2) === 15000L)
    assert(out.forall(_.getLong(3) <= 3L))
  }

  test("quality audit passes a clean table") {
    val fact = Seq((1L, 1, 10.0), (1L, 2, 20.0)).toDF("k", "ln", "qty")
    import QualityAudit._
    val out = audit(fact, Seq(
      NotNull("nn", "k"), Bounds("rng", "qty", 0, 50),
      Unique("uq", Seq("k", "ln")))).collect()
    assert(out.length === 3 && out.forall(_.getBoolean(3)))
    assert(out.forall(_.getLong(2) === 2L))
  }
}
