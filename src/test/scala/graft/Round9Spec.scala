package graft

import org.apache.spark.sql.functions._

import graft.ops.{Classifier, Decomposition, Dedup, QualityAudit}

/** Planted-case specs for the round-9 batch: fuzzy eval-set
  * decontamination, Cohen's κ, robust median/MAD outliers, the Benford
  * first-digit audit, embedding isotropy, KS drift, and the HLL
  * intersection estimate (q252, audited on real sf0.001 data).
  */
class Round9Spec extends SparkTestBase {
  import spark.implicits._

  test("fuzzyDecontaminate drops only train docs near-dup to bench docs") {
    // doc 10 (bench: %10==0) ≡ doc 11 (train) → 11 must be dropped;
    // 1≡2 are train↔train dups and 20≡30 bench↔bench — both out of scope
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "one two three four five six seven eight nine ten eleven"
    val t3 = "red orange yellow green blue indigo violet umber ochre teal"
    val docs = Seq(
      (10L, t1), (11L, t1), (1L, t2), (2L, t2), (20L, t3), (30L, t3))
      .toDF("doc_id", "text")
    val out = Dedup.fuzzyDecontaminate(docs, col("doc_id") % 10 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((11L, 1L, 1000000L, 10L)))
  }

  test("cohensKappa is consistent with the naiveBayesScore confusion") {
    val docs = spark.read.parquet(s"$testData/sf0.001/documents.parquet")
    val row = Classifier.cohensKappa(docs).collect().head
    val (n, agree, po, pe, kp1) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4))
    val score = Classifier.naiveBayesScore(docs)
    assert(n == score.count())
    assert(agree == score.filter(col("agree")).count())
    assert(po == agree * 1000000L / n)
    assert(pe >= 0 && pe <= 1000000L)
    // κ ∈ [−1, 1] ⇒ shifted µ value in [0, 2·10⁶]; κ ≤ 1 means
    // kappa_p1_u ≤ 2e6, and chance-corrected ≤ raw agreement
    assert(kp1 >= 0 && kp1 <= 2000000L)
    // κ ≤ p_o whenever p_o ≤ 1 (chance correction only subtracts);
    // ±5 µ slack for the three floor truncations in the integer pipeline
    assert(kp1 - 1000000L <= po + 5)
  }

  test("robustOutliers: exact low medians, MAD, and the 4·MAD cut") {
    val df = Seq(
      ("a", 10L), ("a", 10L), ("a", 10L), ("a", 10L), ("a", 100L),
      ("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L), ("b", 5L))
      .toDF("grp", "v")
    val out = QualityAudit.robustOutliers(df, col("v"), col("grp"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      // a: med 10, deviations (0,0,0,0,90) → MAD 0; 90 > 4·0 → 1 outlier
      ("a", 5L, 10L, 0L, 1L, 200000L),
      // b: med 3, deviations (2,1,0,1,2) → MAD 1; none exceed 4
      ("b", 5L, 3L, 1L, 0L, 0L)))
  }

  test("benford counts first significant digits and excludes values < 1") {
    val df = Seq(1.5, 10.0, 199.0, 2.0, 25.0, 33.0, 0.5).toDF("x")
    val out = QualityAudit.benford(df, col("x")).orderBy("digit").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      ("1", 3L, 500000L, 301029L, 198971L),
      ("2", 2L, 333333L, 176091L, 157242L),
      ("3", 1L, 166666L, 124938L, 41728L)))
  }

  test("isotropyAudit: aligned cloud scores 10⁶ µ, centered cloud 0") {
    val emb = Seq(
      (0, Array(1f, 0f)), (0, Array(1f, 0f)),
      (1, Array(1f, 0f)), (1, Array(-1f, 0f)))
      .toDF("label", "embedding")
    val out = Decomposition.isotropyAudit(emb).orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      (0, 2L, 1000000000000L, 1000000L, 1000000L),
      (1, 2L, 0L, 1000000L, 0L)))
  }

  test("ksDrift finds the exact sup-gap and its breakpoint") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("grp", "v")
    val out = QualityAudit.ksDrift(df, col("v"), col("grp"))
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // both groups fully separate at v=2: |CDF_grp − CDF_rest| = 1
    assert(out.toSeq == Seq(
      ("a", 2L, 2L, 1000000L, 2L),
      ("b", 2L, 2L, 1000000L, 2L)))
  }

  test("rfmSegments: rank-exact quintile scores and segment labels") {
    def ts(day: Int, h: Int) = java.sql.Timestamp.valueOf(f"2026-01-$day%02d $h%02d:00:00")
    // five users with strictly ranked R (last-event day), F (events) and M
    // (10.00 per event) → distinct quintiles per dimension
    val rows = Seq(
      (1L, 10, 5), (5L, 9, 4), (4L, 8, 3), (3L, 7, 2), (2L, 6, 1))
      .flatMap { case (u, lastDay, f) =>
        (1 to f).map(i => (u, ts(lastDay - f + i, 12), 10.0)) }
    val events = rows.toDF("user_id", "ts", "value")
    val out = graft.ops.TimeSeries.rfmSegments(events)
      .orderBy("r_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, "dormant", 1L, 1000L),
      (2L, 2L, 2L, "dormant", 1L, 2000L),
      (3L, 3L, 3L, "core", 1L, 3000L),
      (4L, 4L, 4L, "champion", 1L, 4000L),
      (5L, 5L, 5L, "champion", 1L, 5000L)))
  }

  test("rfmTransitions: per-half scoring and the signed migration matrix") {
    def ts(mon: Int, day: Int) =
      java.sql.Timestamp.valueOf(f"2026-$mon%02d-$day%02d 12:00:00")
    // half A (January): users ranked 1<2<3<4<5... u1 top; half B
    // (February): u1 and u2 swap rhythms, everyone else repeats theirs —
    // the midpoint split (~Feb 1) separates the halves exactly
    def burst(u: Long, mon: Int, lastDay: Int, f: Int) =
      (1 to f).map(i => (u, ts(mon, lastDay - f + i), 10.0))
    val a = burst(1, 1, 10, 5) ++ burst(5, 1, 9, 4) ++ burst(4, 1, 8, 3) ++
      burst(3, 1, 7, 2) ++ burst(2, 1, 6, 1)
    val b = burst(2, 2, 28, 5) ++ burst(5, 2, 27, 4) ++ burst(4, 2, 26, 3) ++
      burst(3, 2, 25, 2) ++ burst(1, 2, 24, 1)
    val events = (a ++ b).toDF("user_id", "ts", "value")
    val out = graft.ops.TimeSeries.rfmTransitions(events)
      .orderBy("segment_from", "segment_to").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("champion", "champion", 1L, 0L), // u5 repeats
      ("champion", "dormant", 1L, -4000L), // u1 collapses (5,5,5)→(1,1,1)
      ("core", "core", 1L, 0L), // u4
      ("dormant", "champion", 1L, 4000L), // u2 surges
      ("dormant", "dormant", 1L, 0L))) // u3
  }

  test("fuzzy pipeline catches the deduped-bench-doc leak the exact screen misses") {
    // X is shared by bench doc 7 and train doc 1; keeper election removes 7
    // BEFORE the exact 8-gram screen runs, so doc 1 (an exact copy of a
    // benchmark doc!) survives q197's decontamination — the fuzzy screen
    // works off the stage-3 pair relation, which still holds (1, 7)
    val x = "the quick brown fox jumps over a lazy dog and then runs to " +
      "the old mill near a river bank at dawn"
    val y = "a small green bird sings in the tall tree and a cat waits " +
      "under the low branch for an easy meal today"
    val docs = Seq((1L, "en", x), (7L, "en", x), (2L, "en", y))
      .toDF("doc_id", "lang", "text")
    val fuzzy = graft.ops.Pipeline.pretrainCorpus(docs, fuzzyCut = Some(0.8))
      .collect()
    assert(fuzzy.length == 1)
    val r = fuzzy.head
    assert((r.getAs[Long]("n_raw"), r.getAs[Long]("n_cascade"),
      r.getAs[Long]("n_dedup"), r.getAs[Long]("n_clean"),
      r.getAs[Long]("n_fuzzy_clean"), r.getAs[Long]("n_train"))
      == ((3L, 3L, 2L, 2L, 1L, 1L)))
    assert(r.getAs[Long]("first_doc") == 2L && r.getAs[Long]("last_doc") == 2L)
    // without the fuzzy screen the leaked copy trains (n_train = 2)
    val exact = graft.ops.Pipeline.pretrainCorpus(docs).collect()
    assert(exact.map(_.getAs[Long]("n_train")).head == 2L)
  }

  test("basketLift: exact support, confidence, and truncated-lift metrics") {
    val items = Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"), (3L, "B"),
      (4L, "A"), (4L, "C"), (5L, "B"))
      .toDF("ok", "p")
    val out = graft.ops.Association.basketLift(items, col("ok"), col("p"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // (A,B): both 3, s_A 4, s_B 4, N 5 → conf 750000, lift 750000·5÷4
    assert(out.toSeq == Seq(("A", "B", 3L, 4L, 4L, 750000L, 750000L, 937500L)))
  }

  test("cusum: prefix-min closed form alarms on a planted rate spike") {
    // minute counts 1,1,1,1,16 → μ_u 4·10⁶, slack 10⁶, d = [−4,−4,−4,−4,+11]·10⁶,
    // P = [−4,−8,−12,−16,−5]·10⁶ → s = P − min(0, runmin P) = [0,0,0,0,11·10⁶];
    // h = 2μ_u = 8·10⁶ → exactly the spike bucket alarms
    val base = java.sql.Timestamp.valueOf("2026-03-01 10:00:30")
    def at(minute: Int, i: Int) =
      new java.sql.Timestamp(base.getTime + minute * 60000L + i * 100L)
    val rows = (0 to 3).map(m => ("click", at(m, 0))) ++
      (1 to 16).map(i => ("click", at(4, i)))
    val events = rows.toDF("event_type", "ts")
    val out = graft.ops.TimeSeries.cusum(events, bucketSec = 60, kDen = 4,
      hMul = 2).collect()
    assert(out.length == 1)
    val r = out.head
    val b4 = (base.getTime / 1000 + 240) / 60 * 60
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))
      == (("click", 5L, 4000000L, 11000000L, 1L, b4)))
  }

  test("sourceVocabOverlap: set Jaccard + containment; disjoint pairs absent") {
    val docs = Seq((1L, "x y z", "a"), (2L, "y z w", "b"), (3L, "q r", "c"))
      .toDF("doc_id", "text", "source")
    val out = graft.ops.TextAnalysis.sourceVocabOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // (a,b): shared {y,z}, union 4 → jac 500000; containment 2/3; c disjoint
    assert(out.toSeq == Seq(("a", "b", 2L, 3L, 3L, 500000L, 666666L)))
  }

  test("q252 HLL intersection estimate tracks the exact overlap (sf0.001)") {
    val row = Queries.queries("q252_hll_intersect")(spark, s"$testData/sf0.001")
      .collect().head
    val exact = row.getLong(0)
    val (ea, er, eu, ei) = (row.getDouble(1), row.getDouble(2),
      row.getDouble(3), row.getDouble(4))
    assert(ea > 0 && er > 0 && eu > 0)
    // per-estimate HLL σ at m=512 is ~4.6%; union must be ≤ sides' sum and
    // the inclusion–exclusion estimate within a generous envelope of exact
    assert(eu <= ea + er)
    assert(math.abs(ei - exact) <= 0.3 * exact + 50.0)
  }
}
