package graft

import org.apache.spark.sql.functions._

import graft.ops.{Privacy, Similarity, TextAnalysis}

/** Planted-case specs for the round-8 release-risk / index-health /
  * cleaning batch: k-anonymity audit, ANN index balance, char-class
  * profile, in-doc line scrub. */
class Round8Batch8Spec extends SparkTestBase {
  import spark.implicits._

  test("kAnonymityAudit counts sub-k class and row mass per spine k") {
    // classes by q: A×3, B×2, C×1 → 3 classes, 6 rows
    val rows = Seq("A", "A", "A", "B", "B", "C").zipWithIndex
      .map { case (q, i) => (i.toLong, q) }.toDF("id", "q")
    val out = Privacy.kAnonymityAudit(rows, Seq(col("q")), ks = Seq(2, 3))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // k=2: only C (sz 1) violates → 1 class, 1 row, 1e6/6 = 166666
    assert(out(0) == ((2L, 3L, 6L, 1L, 1L, 166666L)))
    // k=3: B and C violate → 2 classes, 3 rows, 3e6/6 = 500000
    assert(out(1) == ((3L, 3L, 6L, 2L, 3L, 500000L)))
  }

  test("indexBalance buckets cell occupancy by floor-log2 with pair mass") {
    // 3 copies of +v and 1 of −v: after mean-centering the two directions
    // project with opposite signs on every plane → exactly two cells of
    // sizes 3 and 1
    val v = Array(1f, 0f)
    val nv = Array(-1f, 0f)
    val emb = Seq((1L, v), (2L, v), (3L, v), (4L, nv))
      .toDF("vec_id", "embedding")
    val out = Similarity.indexBalance(emb).orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // bucket 0 = the singleton cell; bucket 1 = the size-3 cell (3 pairs);
    // skew_u = max·cells·1e6 div n = 3·2·1e6/4 = 1500000
    assert(out.toSeq == Seq(
      (0L, 1L, 1L, 0L, 3L, 1500000L),
      (1L, 1L, 3L, 3L, 3L, 1500000L)))
  }

  test("charClassProfile splits char mass by class, mass-weighted per source") {
    val docs = Seq(
      (1L, "ab1 c", "s1"),   // 5 chars: 3 letters, 1 digit, 1 space
      (2L, "99", "s2"),      // 2 chars: 2 digits
      (3L, "!!", "s2"))      // 2 chars: 2 other
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.charClassProfile(docs).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out(0) == (("s1", 1L, 5L, 600000L, 200000L, 200000L, 0L)))
    // s2 mass-weighted across both docs: 2 digits + 2 other of 4 chars
    assert(out(1) == (("s2", 2L, 4L, 0L, 500000L, 0L, 500000L)))
  }

  test("lineScrub keeps first occurrences in order and accounts removed mass") {
    val docs = Seq(
      (1L, "a line b line a line c"), // repeat of "a" (1 char) removed
      (2L, "x"))                      // single segment untouched
      .toDF("doc_id", "text")
    val out = TextAnalysis.lineScrub(docs, sep = " line ")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out(0) == ((1L, 4L, 3L, 1L, "a line b line c")))
    assert(out(1) == ((2L, 1L, 1L, 0L, "x")))
  }
}
