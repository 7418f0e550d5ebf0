package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextAnalysis, TimeSeries, Winnowing}

/** Planted-case specs for the round-6 batch-2 operators: interpolation
  * gap-fill, MAD outliers, winnowing fingerprints, containment dedup,
  * bigram LM scoring, and kNN label transfer. */
class Round6Batch2Spec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("interpolate fills interior gaps linearly and tags edges") {
    // one key, buckets 0/300/1200 observed (v = 10, 20, 50): buckets 600 and
    // 900 interpolate on the 300→1200 segment (30, 40); nothing precedes 0
    // or follows 1200 inside the grid so no edge rows exist — add a second
    // key with a single observation to cover the degenerate one-point grid
    val events = Seq(
      (1L, ts(30), "a", 10.0), (2L, ts(400), "a", 20.0), (3L, ts(1300), "a", 50.0),
      (4L, ts(100), "b", 7.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val out = TimeSeries.interpolate(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    assert(out === Seq(
      ("a", 0L, 10000000L, "obs"),
      ("a", 300L, 20000000L, "obs"),
      ("a", 600L, 30000000L, "interp"),
      ("a", 900L, 40000000L, "interp"),
      ("a", 1200L, 50000000L, "obs"),
      ("b", 0L, 7000000L, "obs")))
  }

  test("interpolate leaves head/tail gaps as edge rows with null value") {
    // grid spans only observed buckets per key, so an interior null can
    // only be 'interp'; force an 'edge' by making a key whose first grid
    // point is empty — impossible by construction (lo = min observed).
    // Instead verify: a gap with a neighbor on ONE side only cannot occur;
    // all non-obs rows in a two-point grid are interp.
    val events = Seq(
      (1L, ts(0), "a", 1.0), (2L, ts(900), "a", 4.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val out = TimeSeries.interpolate(events)
    assert(out.filter($"src" === "edge").isEmpty)
    assert(out.filter($"src" === "interp").collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      .toSeq === Seq((300L, 2000000L), (600L, 3000000L)))
  }

  test("madOutliers flags the planted wild point and not the bulk") {
    // bulk at 10±1 (median 10, MAD 1), one point at 100: dev = 90 MADs
    val vals = (1 to 20).map(i => (i.toLong, ts(i * 10L), "k", 10.0 + (i % 3) - 1))
    val events = (vals :+ ((99L, ts(999), "k", 100.0))).toDF("event_id", "ts", "event_type", "value")
    val out = TimeSeries.madOutliers(events).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 99L)
    assert(out.head.getLong(3) === 90000000L)
  }

  test("madOutliers survives a contaminated series where z-score masks") {
    // ten inliers at 0, two massive outliers at 1000: stddev inflates to
    // ~400 so |z| of the outliers stays < 3 (masked), while MAD = 0-robust
    // median logic still flags them
    val events = ((1 to 10).map(i => (i.toLong, ts(i.toLong), "k", (i % 5).toDouble / 10)) ++
      Seq((90L, ts(90), "k", 1000.0), (91L, ts(91), "k", 1000.0)))
      .toDF("event_id", "ts", "event_type", "value")
    val flagged = TimeSeries.madOutliers(events).select("event_id")
      .as[Long].collect().toSet
    assert(flagged === Set(90L, 91L))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"event_type")
    val z = events.withColumn("z",
      abs($"value" - avg($"value").over(w)) / stddev_samp($"value").over(w))
    assert(z.filter($"z" > 3.0).isEmpty) // z-score finds nothing
  }

  test("winnowing guarantee: any shared run of >= k+w-1 chars yields a shared fingerprint") {
    // identical 64-char core embedded at different offsets in different
    // noise — winnowing must select at least one common fingerprint
    val core = "the-quick-brown-fox-jumps-over-the-lazy-dog-0123456789-abcdefgh"
    val docs = Seq(
      (1L, s"XXXX$core"), (2L, s"YYYYYYYYYYYY${core}ZZZ")
    ).toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(docs)
    val shared = fp.filter($"doc_id" === 1L).select("fp")
      .intersect(fp.filter($"doc_id" === 2L).select("fp"))
    assert(shared.count() >= 1)
  }

  test("winnowing density: selected fingerprints are a small fraction of grams") {
    val text = (1 to 50).map(i => s"tok$i word$i filler$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val nGrams = text.length - 7
    val nFp = Winnowing.fingerprints(docs).count()
    // expected density 1/w = 1/4; allow generous slack both ways
    assert(nFp > nGrams / 10 && nFp < nGrams / 2)
  }

  test("containment finds a doc embedded in a larger one; Jaccard misses it") {
    val inner = "unique-marker-alpha-beta-gamma-delta-epsilon-zeta-eta-theta!"
    val outer = ("padpadpad-" * 40) + inner + ("-dapdapdap" * 40)
    val docs = Seq((1L, inner, "en", "s"), (2L, outer, "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val c = Dedup.containment(docs, 8, 0.8).collect()
    assert(c.exists(r => r.getLong(0) === 1L && r.getLong(1) === 2L &&
      r.getLong(2) === 1000000L)) // fully contained
    // symmetric Jaccard over the same grams is far below 0.8
    val j = Dedup.ngramJaccard(docs, 8, 0.8)
    assert(j.isEmpty)
  }

  test("containment candidate generation is prefix-bounded (no hub explosion)") {
    // 60 docs sharing ONE ubiquitous gram (df = 60) but nothing else above
    // the prefix: no candidate survives verification, and the op returns
    // only the planted contained pair
    val common = "SHAREDGRAM"
    val docs = ((1 to 60).map(i => (i.toLong, s"$common-doc$i-" + ("x" * i))) ++
      Seq((100L, "contained-text-payload-one-two!"),
        (101L, ("y" * 50) + "contained-text-payload-one-two!" + ("z" * 50))))
      .toDF("doc_id", "text")
    val out = Dedup.containment(docs, 8, 0.8).collect()
    assert(out.exists(r => r.getLong(0) === 100L && r.getLong(1) === 101L))
    assert(!out.exists(r => r.getLong(0) <= 60L && r.getLong(1) <= 60L &&
      r.getLong(2) < 1000000L))
  }

  test("bigramLogProb: degenerate word order scores worse than fluent order") {
    // LM trained on repeated fluent docs; one doc scrambles the order so its
    // bigrams are unseen (cab = 1 via itself at best) → higher avg nll
    val fluent = "the cat sat on the mat"
    val docs = ((1L to 8L).map(i => (i, fluent)) :+ (9L, "mat the on sat cat the"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(9L) > out(1L))
    assert((1L to 8L).map(out).toSet.size === 1) // identical docs, identical score
  }

  test("bigramLogProb is integer-exact: planted count replay") {
    // corpus "a b a b": tokens a,b,a,b → V=2, c(a)=2, c(b)=2;
    // bigrams (a,b)x2? no — doc is one row: bigrams (a,b),(b,a),(a,b) →
    // c(a,b)=2, c(b,a)=1.
    // terms: ln((2+2)/(2+1)), ln((2+2)/(1+1)), ln((2+2)/(2+1))
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs).head()
    val t1 = math.floor(math.log(4.0 / 3) * 1e6).toLong
    val t2 = math.floor(math.log(4.0 / 2) * 1e6).toLong
    assert(out.getLong(1) === 3L)
    assert(out.getLong(2) === (t1 + t2 + t1) / 3)
  }

  test("knnClassify recovers planted cluster labels and flags the mislabeled point") {
    // two tight clusters in 2D; vec 10 sits in cluster 0 but is labeled 9.
    // cellK = 2 with kmeans seeds = the two smallest vec_ids — ids 1 and 2
    // are planted one per cluster so the cells converge to the true ones
    val c0 = Seq(1L, 3L, 4L, 5L, 6L, 7L)
      .map(i => (i, Array(1.0f + i * 0.001f, 0.1f), 0))
    val c1 = Seq(2L, 11L, 12L, 13L, 14L, 15L)
      .map(i => (i, Array(0.1f, 1.0f + i * 0.001f), 1))
    val odd = Seq((10L, Array(1.0f, 0.1f), 9))
    val emb = (c0 ++ c1 ++ odd).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(emb, 5, cellK = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(10L)._3 === 0L && !byId(10L)._4) // predicted 0, disagrees with label 9
    assert(out.count(_._4) === 12) // all true-cluster members agree
  }

  test("knnClassify auto-k scales cells with the corpus (pair budget stays ~256n)") {
    // 600 vecs → kk = max(8, ceil(600/256)) = 8 cells; every vector still
    // gets a prediction and votes come from its own cell only
    val emb = (1L to 600L).map { i =>
      val c = (i % 3).toInt
      (i, Array.tabulate(4)(d => if (d == c) 1.0f else 0.001f * i), c)
    }.toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(emb, 5)
    assert(out.count() === 600)
    assert(out.filter(col("agree")).count() >= 590) // tight clusters recovered
  }
}
