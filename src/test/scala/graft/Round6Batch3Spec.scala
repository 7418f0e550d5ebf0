package graft

import org.apache.spark.sql.functions._
import graft.ops.{Compaction, TextAnalysis, TrainingData}

/** Planted-case specs for the round-6 batch-3 operators: compaction
  * planning, BPE merge-pair statistics, CDC merge-apply. */
class Round6Batch3Spec extends SparkTestBase {
  import spark.implicits._

  test("compaction plan bins files per partition by sorted cumulative size") {
    // partition p: sizes 70, 40, 30, 10 with target 100 → desc order
    // cum-before = 0, 70, 110, 140 → bins 0, 0, 1, 1
    val inv = Seq(
      ("p", 1L, 40L), ("p", 2L, 70L), ("p", 3L, 10L), ("p", 4L, 30L),
      ("q", 9L, 500L) // lone oversized file: its own bin, no rewrite partner
    ).toDF("source", "file_id", "bytes")
    val out = Compaction.plan(inv, target = 100L).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(("p", 2L)) === ((0L, 110L, 2L))) // 70 with 40
    assert(out(("p", 1L)) === ((0L, 110L, 2L)))
    assert(out(("p", 4L)) === ((1L, 40L, 2L))) // 30 with 10
    assert(out(("p", 3L)) === ((1L, 40L, 2L)))
    assert(out(("q", 9L)) === ((0L, 500L, 1L))) // untouched singleton
  }

  test("compaction maxBinFiles splits byte bins and renumbers densely; files_saved = bin_files - 1") {
    // 6 equal tiny files under one byte bin (total 60 < target 1000);
    // maxBinFiles = 2 must split them into dense bins of exactly 2 files
    val inv = (1 to 6).map(i => ("p", i.toLong, 10L)).toDF("source", "file_id", "bytes")
    val out = Compaction.plan(inv, target = 1000L, maxBinFiles = 2).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(5), r.getLong(6)))
    assert(out.map(_._2).distinct.sorted.toSeq === Seq(0L, 1L, 2L)) // dense bins
    assert(out.forall(_._3 == 2L)) // every bin capped at 2 files
    assert(out.forall(_._4 == 1L)) // files_saved = bin_files - 1
    // unlimited default keeps the r6 numbering (bin = byte quotient)
    val deflt = Compaction.plan(inv, target = 1000L).collect()
    assert(deflt.forall(r => r.getLong(3) == 0L && r.getLong(5) == 6L
      && r.getLong(6) == 5L))
  }

  test("compaction never merges across partitions") {
    val inv = (1 to 50).map(i => (s"part${i % 5}", i.toLong, 10L))
      .toDF("source", "file_id", "bytes")
    val out = Compaction.plan(inv, target = 1000L)
    // one bin per partition (all sizes fit), never one global bin
    assert(out.select("source", "bin").distinct().count() === 5)
  }

  test("bpePairStats counts corpus-weighted adjacent pairs with multiplicity") {
    // "aba aba ab" → words: aba(freq 2), ab(freq 1)
    // pairs: aba → ab, ba (each ×2); ab → ab (×1) → ab: 3, ba: 2
    val docs = Seq((1L, "aba aba"), (2L, "ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairStats(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("ab" -> 3L, "ba" -> 2L))
  }

  test("bpePairStats top-k order is (weight desc, pair)") {
    val docs = Seq((1L, "xy xz xy")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairStats(docs, k = 1).collect()
    assert(out.length === 1 && out.head.getString(0) === "xy")
  }

  test("applyChangelog: delete drops, update replaces, insert adds, U beats D") {
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))
      .toDF("doc_id", "text")
    val changes = Seq(
      (2L, "D", "ignored"), (3L, "U", "THREE"), (9L, "I", "nine"),
      (4L, "D", "x"), (4L, "U", "FOUR") // same key D+U → survives as U
    ).toDF("doc_id", "op", "text")
    val out = TrainingData.applyChangelog(base, changes).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "one", 3L -> "THREE", 4L -> "FOUR", 9L -> "nine"))
  }

  test("applyChangelog is idempotent for an empty changelog") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "op", "text")
    assert(TrainingData.applyChangelog(base, empty).count() === 2)
  }
}
