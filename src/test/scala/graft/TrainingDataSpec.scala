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
