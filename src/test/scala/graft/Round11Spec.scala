package graft

import org.apache.spark.sql.functions._

import graft.ops.Pipeline

/** Planted-case specs for the round-11 batch, led by the incremental
  * dataset release's increment-equals-full-recompute theorem on a
  * two-snapshot corpus exercising every delta shape at once.
  */
class Round11Spec extends SparkTestBase {
  import spark.implicits._

  // old snapshot: 9 docs; (1,9) and (2,12) and (6,7) are exact-dup pairs
  private val oldDocs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "one two three four five six seven eight"),
    (3L, "solo unique text about nothing in particular here now"),
    (4L, "match target text that doc three will copy exactly soon"),
    (5L, "source for the added duplicate doc twenty to copy"),
    (6L, "common boiler plate text shared by six and seven"),
    (7L, "common boiler plate text shared by six and seven"),
    (9L, "alpha beta gamma delta epsilon zeta eta theta"),
    (12L, "one two three four five six seven eight"))

  // new snapshot: doc 2 REMOVED (resurrects 12); doc 1 CHANGED away from 9
  // (resurrects 9); doc 3 CHANGED onto doc 4's text (newly drops 4, an
  // UNCHANGED old doc — the smaller-id side of the pair is the delta);
  // doc 20 ADDED as a dup of 5 (dropped on arrival); doc 21 ADDED novel
  private val newDocs = Seq(
    (1L, "completely different replacement text with no overlap whatsoever anymore"),
    (3L, "match target text that doc three will copy exactly soon"),
    (4L, "match target text that doc three will copy exactly soon"),
    (5L, "source for the added duplicate doc twenty to copy"),
    (6L, "common boiler plate text shared by six and seven"),
    (7L, "common boiler plate text shared by six and seven"),
    (9L, "alpha beta gamma delta epsilon zeta eta theta"),
    (12L, "one two three four five six seven eight"),
    (20L, "source for the added duplicate doc twenty to copy"),
    (21L, "brand new novel document with fresh words only here"))

  test("incrementalRelease == fullRelease across adds/changes/removals/" +
      "resurrections/new drops") {
    val oldDf = oldDocs.toDF("doc_id", "text")
    val newDf = newDocs.toDF("doc_id", "text")
    val inc = Pipeline.incrementalRelease(Pipeline.releaseState(oldDf), newDf)
    val full = Pipeline.fullRelease(oldDf, newDf)
    assert(inc.columns.toSeq == full.columns.toSeq)
    val incRow = inc.collect().map(_.toSeq)
    val fullRow = full.collect().map(_.toSeq)
    assert(incRow.length == 1 && fullRow.length == 1)
    assert(incRow.head == fullRow.head)
    // planted expectations: the record is right, not just self-consistent
    val m = inc.first().getValuesMap[Long](inc.columns)
    assert(m("n_docs") == 10L)
    assert(m("n_added") == 2L)     // 20, 21
    assert(m("n_changed") == 2L)   // 1, 3
    assert(m("n_removed") == 1L)   // 2
    assert(m("n_unchanged") == 6L) // 4, 5, 6, 7, 9, 12
    assert(m("n_pairs") == 3L)     // (3,4), (5,20), (6,7)
    assert(m("n_dropped") == 3L)   // 4, 20, 7 — while 9 and 12 RESURRECT
    assert(m("n_released") == 7L)
    // token mass over the released set, recomputed directly
    val relIds = Set(1L, 3L, 5L, 6L, 9L, 12L, 21L)
    val expTokens = newDocs.filter(d => relIds(d._1))
      .map(_._2.split("\\s+").length.toLong).sum
    assert(m("released_tokens") == expTokens)
  }

  test("incrementalRelease with an empty delta replays the old record") {
    val oldDf = oldDocs.toDF("doc_id", "text")
    val st = Pipeline.releaseState(oldDf)
    val inc = Pipeline.incrementalRelease(st, oldDf).collect().map(_.toSeq)
    val full = Pipeline.fullRelease(oldDf, oldDf).collect().map(_.toSeq)
    assert(inc.head == full.head)
    val m = Pipeline.incrementalRelease(st, oldDf).first()
      .getValuesMap[Long](Seq("n_added", "n_changed", "n_removed", "n_pairs"))
    assert(m == Map("n_added" -> 0L, "n_changed" -> 0L, "n_removed" -> 0L,
      "n_pairs" -> 3L))
  }
}
