package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Ed-Join edit-distance self-join: losslessness of the q-gram prefix
  * filter (including the vacuous-count short-string regime) and the
  * sub-quadratic candidate-growth contract that justifies it at scale.
  */
class EdJoinSpec extends SparkTestBase {

  test("planted pairs: prefix filter finds exactly the <=2 pairs, incl. the zero-shared-gram case") {
    import spark.implicits._
    val rows = Seq(
      (1L, "blk", "goldenrod lavender spring"),
      (2L, "blk", "goldenrod lavender sprint"), // dist 1 to #1
      (3L, "blk", "goldenrod lavander sprint"), // dist 1 to #2, 2 to #1
      (4L, "blk", "completely different name"), // no match
      // the count-filter-vacuous pair: ed("abcdefg","abXdeYg") = 2 with ZERO
      // shared 3-grams — only the short-string sentinel can catch it
      (5L, "blk", "abcdefg"),
      (6L, "blk", "abXdeYg"),
      (7L, "blk", "goldenrod lavender springXYZ"), // len diff 3 from #1: out of band
      (8L, "oth", "goldenrod lavender spring") // same text, other block
    ).toDF("id", "blk", "s")
    val got = Dedup.editDistancePairs(rows, "id", "s", Seq("blk"), maxDist = 2)
      .select(col("pa"), col("pb"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 2L), (5L, 6L, 2L)))
  }

  test("prefix filter is lossless vs brute force on the real part table (q=3 and q=5)") {
    val p = spark.read.parquet(s"$testData/sf0.001/part.parquet")
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
    val brute = p.as("a").join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .select(col("a.p_partkey").as("pa"), col("b.p_partkey").as("pb"),
        levenshtein(col("a.p_name"), col("b.p_name"), 2).cast("long").as("dist"))
      .filter(col("dist") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    Seq(3, 5).foreach { q =>
      val got =
        Dedup.editDistancePairs(p, "p_partkey", "p_name", Seq("p_brand"), 2, q)
          .select(col("pa"), col("pb"), col("dist"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === brute, s"q=$q diverged from brute force")
    }
  }

  test("candidate count grows sub-quadratically on a 10x planted block") {
    import spark.implicits._
    // One block of diverse random alnum strings with a planted 1-edit
    // near-dup every 20th row (true pairs scale linearly by construction).
    // q is chosen per the diversity condition |Σ|^q >> corpus grams
    // (q=5: 36^5 ~ 6e7 >> 3000*16 grams) — the operator's documented scale
    // knob; below it (q=3: 26^3 ~ 1.8e4) ANY gram filter saturates into
    // birthday collisions, which is exactly why the knob exists. A
    // brand-style nested loop enumerates 100x the pairs at 10x rows; the
    // prefix filter must stay well under 25x.
    def mkRows(n: Int): Seq[(Long, String, String)] = {
      val rnd = new scala.util.Random(42)
      val rows = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
      (0 until n).foreach { i =>
        val s =
          if (i % 20 == 19) { val p = rows(i - 1)._3; "X" + p.substring(1) }
          else (0 until 20).map { _ =>
            val c = rnd.nextInt(36)
            if (c < 26) ('a' + c).toChar else ('0' + c - 26).toChar
          }.mkString
        rows += ((i.toLong, "b", s))
      }
      rows.toSeq
    }
    def cand(n: Int): Long =
      Dedup.editDistanceCandidates(
        mkRows(n).toDF("id", "blk", "s"), "id", "s", Seq("blk"), 2, q = 5).count()
    val c1 = cand(300)
    val c10 = cand(3000)
    assert(c1 > 0, "planted block produced no candidates at all")
    assert(c10 < 25L * c1,
      s"candidates grew ${c10.toDouble / c1}x on 10x rows — quadratic enumeration")
    // absolute bound: nowhere near the nested loop's n(n-1)/2 ~ 4.5M pairs
    assert(c10 < 3000L * 20,
      s"$c10 candidates at n=3000 — filter not pruning")
  }
}
