package graft

import org.apache.spark.sql.functions._

import graft.ops.TrainingData

/** Structural invariants of the training-corpus assembly operators (their
  * exact values are hash-checked against DuckDB via q111-q114). */
class TrainingDataSpec extends SparkTestBase {

  import spark.implicits._

  lazy val docs = spark.read.parquet(s"$testData/sf0.01/documents.parquet")

  test("hashSplit: exhaustive, disjoint, stable under corpus growth") {
    val split = TrainingData.hashSplit(docs)
    assert(split.count() === docs.count())
    assert(split.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val", "test")))
    // roughly 80/10/10 (hash uniformity; generous tolerance for 500 docs)
    val frac = split.filter($"split" === "train").count().toDouble / split.count()
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
    // growth stability: assignment of a doc never depends on the rest of
    // the corpus
    val half = TrainingData.hashSplit(docs.filter($"doc_id" % 2 === 0))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val full = split.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    half.foreach { case (id, s) => assert(full(id) === s) }
  }

  test("leakageSafeSplit: a near-dup cluster never straddles the split boundary") {
    // planted pair graph: {1,2,3} chained, {10,11} paired, rest singletons
    val ids = (1L to 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val split = TrainingData.leakageSafeSplit(ids, pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(split.size === 20) // exhaustive: every doc assigned
    // transitive closure: the whole chain shares one cluster AND one side
    assert(split(1L) === split(2L) && split(2L) === split(3L))
    assert(split(10L) === split(11L))
    assert(split(1L)._1 === 1L && split(10L)._1 === 10L) // label = min member
    // a singleton's split equals the plain cluster-hash bucket of its own id
    val bucketed = TrainingData.hashSplit(ids.withColumn("lang", lit("x")))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    (4L to 9L).foreach(id => assert(split(id)._2 === bucketed(id)))
  }

  test("scalarQuantize: exact codes on a planted vector; constant vectors code to 0") {
    val emb = Seq(
      (1L, Array(0.0f, 1.0f, 0.5f, 0.25f)), // range [0,1]: codes 0,255,128,64
      (2L, Array(3.0f, 3.0f, 3.0f, 3.0f))   // constant: mx==mn guard
    ).toDF("vec_id", "embedding")
    val out = graft.ops.Quantize.scalarQuantize(emb)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5))).toMap
    // replicate the op's pinned IEEE arithmetic for the expected error
    def code(v: Double) = math.min(math.floor(v * 255.0 / 1.0 + 0.5), 255.0).toLong
    def errT(v: Double) = {
      val r = 0.0 + (code(v) * 1.0) / 255.0
      math.floor((v - r) * (v - r) * 1000000000000.0).toLong
    }
    val expErr = Seq(0.0, 1.0, 0.5, 0.25).map(errT).sum
    assert(out(1L) === ((4L, 0L, 1000000L, "0,255,128,64", expErr)))
    val (nd, mn, mx, codes, err) = out(2L)
    assert(nd === 4L && mn === 3000000L && mx === 3000000L)
    assert(codes === "0,0,0,0")
    // reconstruction of a constant vector is mn exactly -> zero error
    assert(err === 0L)
  }

  test("bm25TopK: a doc containing the query's rare gram outranks one without it") {
    // corpus engineered so gram dfs are in-band: the query doc shares gram
    // "x y z" with doc 2 only; docs 3/4 share filler grams
    val docs = Seq(
      (0L, "x y z q r s"), // query doc (0 % 251 == 0)
      (2L, "x y z a b c"),
      (3L, "a b c d e f"),
      (4L, "a b c d e f"),
      (5L, "q r s t u v"),
      (6L, "t u v w a b")
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.bm25TopK(docs, queryStride = 251, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    assert(out.forall(_._1 == 0L))
    // doc 2 (shares "x y z" and "y z ..."-adjacent grams) must rank above
    // docs 3/4 which share no gram with the query beyond the df band
    val ranks = out.map(t => t._2 -> t._3).toMap
    assert(ranks.contains(2L), s"doc 2 missing from top-k: $out")
    ranks.get(3L).foreach(r3 => assert(r3 > ranks(2L)))
    // scores strictly ordered by rank within the query
    val byRank = out.sortBy(_._3).map(_._4)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("snapshotDiff: classifies added/removed/changed/unchanged exactly") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val out = TrainingData.snapshotDiff(oldSnap, newSnap).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("negativeSample: no self-pairs, <= k per anchor, deterministic") {
    val neg = TrainingData.negativeSample(docs, rounds = 4, buckets = 64, k = 2)
    assert(neg.filter($"anchor" === $"negative").count() === 0)
    assert(neg.groupBy($"anchor").count().agg(max("count")).head().getLong(0) <= 2)
    val again = TrainingData.negativeSample(docs, rounds = 4, buckets = 64, k = 2)
    assert(neg.exceptAll(again).count() === 0 && again.exceptAll(neg).count() === 0)
  }

  test("balancedSample: every class keeps exactly min-class-size rows") {
    val sizes = TrainingData.balancedSample(docs, "lang")
      .groupBy($"lang").count().select("count")
      .collect().map(_.getLong(0)).toSet
    val minClass = docs.groupBy($"lang").count()
      .agg(min("count")).head().getLong(0)
    assert(sizes === Set(minClass))
  }

  test("decontaminate: pairs are train×bench and share a real 8-gram") {
    val isBench = col("doc_id") % 7 === 0
    val pairs = graft.ops.TextAnalysis.decontaminate(docs, isBench, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "planted near-dups should leak at least one pair")
    pairs.foreach { case (t, b) =>
      assert(t % 7 != 0 && b % 7 == 0, s"pair ($t,$b) violates the split")
    }
    // spot-check: a reported pair really shares a token 8-gram
    val (t0, b0) = pairs.head
    val texts = docs.filter(col("doc_id").isin(t0, b0))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSet
    assert(grams(texts(t0)).intersect(grams(texts(b0))).nonEmpty)
  }

  test("redactTerms: counts match occurrences; masked length consistent") {
    import spark.implicits._
    val tiny = Seq((1L, "the customer met a supplier and a customer"),
      (2L, "no blocked words here")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.redactTerms(tiny, Seq("customer", "supplier"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L)._1 === 3L)
    // 3 terms (8+8+8 chars) -> 3 × "[REDACTED]" (10 chars): length grows by 6
    assert(out(1L)._2 === tiny.filter($"doc_id" === 1).head().getString(1).length + 6)
    assert(out(2L) === ((0L, 21L)))
  }

  test("sequencePacking: bins partition the corpus; loads respect the window") {
    val bins = TrainingData.sequencePacking(docs, budget = 8192, partCol = "lang")
    assert(bins.agg(sum("n_docs")).head().getLong(0) === docs.count())
    // offset-window semantics: a bin exceeds the budget by less than its
    // last (straddling) doc; with docs far smaller than the budget every
    // non-final bin lands within [budget/2, budget + max_doc)
    val maxDoc = docs.select(graft.ops.TextAnalysis.tokenCount($"text").as("t"))
      .agg(max("t")).head().getLong(0)
    val bad = bins.filter($"sum_tokens" >= lit(8192L) + lit(maxDoc)).count()
    assert(bad === 0)
  }
}
