package graft

import org.apache.spark.sql.functions._

import graft.ops.QualityAudit

/** Planted-case specs for the round-10 hardening batch: the four r9
  * advisory fixes (ksDrift negative values, benford extreme magnitudes,
  * cohensKappa corner clamp, pretrainCorpus fuzzyCut guard).
  */
class Round10Spec extends SparkTestBase {
  import spark.implicits._

  test("ksDrift handles negative values: v_min bias keeps pack/decode exact") {
    // group a occupies the negative half, b the positive — the sup gap is 1
    // at the last a-breakpoint (v = −1); before the v_min bias, a raw
    // negative low word corrupted the max-key ordering and the % decode
    val df = Seq(("a", -5L), ("a", -1L), ("b", 3L), ("b", 7L))
      .toDF("grp", "v")
    val out = QualityAudit.ksDrift(df, col("v"), col("grp"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      ("a", 2L, 2L, 1000000L, -1L),
      ("b", 2L, 2L, 1000000L, -1L)))
  }

  test("ksDrift negative-domain ties break to the LARGEST breakpoint") {
    // one group vs itself-complement where two breakpoints share the sup:
    // a = {-10}, b = {-10, -2}; grid {-10, -2}. For a: CDF_a(-10)=1,
    // rest-CDF(-10)=1/2 → gap 1/2; at -2: 1 vs 1 → gap 0. For b at -10:
    // 1/2 vs 1 → 1/2; at -2: 1 vs 1 → 0. Unique sups here; now force a tie
    // with symmetric groups: {-3,-1} vs {-3,-1} → gap 0 everywhere, argmax
    // must be the largest breakpoint (-1), not the smallest
    val df = Seq(("x", -3L), ("x", -1L), ("y", -3L), ("y", -1L))
      .toDF("grp", "v")
    val out = QualityAudit.ksDrift(df, col("v"), col("grp"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("x", 0L, -1L), ("y", 0L, -1L)))
  }

  test("benford excludes values >= 2^63 instead of saturating the cast") {
    // 1e19 > Long.MaxValue: Spark would saturate to 9223372036854775807
    // (first digit '9') while an ANSI engine errors — the range filter
    // drops it on both, keeping the audited population engine-identical
    val df = Seq(1.0e19, 12.0, 15.0, 0.5).toDF("x")
    val out = QualityAudit.benford(df, col("x")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("1", 2L, 1000000L)))
  }

  test("pretrainCorpus rejects a fuzzyCut below the stage-3 LSH threshold") {
    val docs = Seq((1L, "en", "a b c")).toDF("doc_id", "lang", "text")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Pipeline.pretrainCorpus(docs, fuzzyCut = Some(0.3))
    }
    assert(e.getMessage.contains("0.5"))
  }
}
