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
