package graft

import org.apache.spark.sql.functions._
import graft.ops.Decomposition

/** Planted-case specs for the round-6 batch-5 operators: PCA top component
  * and PSI drift. */
class Round6Batch5Spec extends SparkTestBase {
  import spark.implicits._

  test("pcaTopComponent recovers a planted dominant axis") {
    // variance 100x larger along dim 0 than dim 1 (dims 2..3 constant):
    // the top component must be ±e0 within rounding
    val emb = (1 to 40).map { i =>
      val a = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array(a, 0.1f * (i % 3 - 1), 0.5f, 0.5f))
    }.toDF("vec_id", "embedding")
    val out = Decomposition.pcaTopComponent(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.abs(out(0L)) > 990000L) // |v_0| ≈ 1
    assert(math.abs(out(1L)) < 150000L)
    assert(math.abs(out(2L)) < 50000L && math.abs(out(3L)) < 50000L)
  }

  test("pcaTopComponent is unit-norm in micro-units") {
    val emb = (1 to 30).map(i =>
      (i.toLong, Array.tabulate(4)(d => (i * (d + 1) % 7).toFloat)))
      .toDF("vec_id", "embedding")
    val out = Decomposition.pcaTopComponent(emb).collect().map(_.getLong(1))
    val norm2 = out.map(l => (l / 1e6) * (l / 1e6)).sum
    assert(math.abs(norm2 - 1.0) < 0.01)
  }

  test("psiDrift is near zero for identical slices, large for a planted shift") {
    // identical ref/cmp: consecutive id pairs share a value, so the even
    // (ref) and odd (cmp) slices carry the same distribution; PSI ~ 0
    val same = (1L to 2000L).map(i => (i, (i / 2) % 50)).toDF("doc_id", "n_chars")
    val psiSame = Decomposition.psiDrift(same, "n_chars", $"doc_id" % 2 === 0)
      .agg(sum($"term_u")).head().getLong(0)
    assert(math.abs(psiSame) < 10000000L) // < 0.01 in 1e9 units
    // shifted cmp: odd ids live 40 higher → mass moves to the top bin
    val shifted = (1L to 2000L).map(i =>
      (i, if (i % 2 == 0) i % 40 else 60 + i % 40)).toDF("doc_id", "n_chars")
    val psiShift = Decomposition.psiDrift(shifted, "n_chars", $"doc_id" % 2 === 0)
      .agg(sum($"term_u")).head().getLong(0)
    assert(psiShift > 1000000000L) // > 1.0: severe drift
  }

  test("psiDrift bins out-of-range comparison values into the edge bins") {
    val docs = ((1L to 100L).map(i => (i * 2, 100 + i)) ++ // ref: 101..200
      Seq((1L, 5L), (3L, 999L))) // cmp outliers below/above ref range
      .toDF("doc_id", "n_chars")
    val out = Decomposition.psiDrift(docs, "n_chars", $"doc_id" % 2 === 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(0L) >= 1L && out(9L) >= 1L) // clamped into bins 0 and 9
  }
}
