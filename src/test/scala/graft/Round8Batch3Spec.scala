package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity, TextAnalysis, TrainingData}

/** Planted-case specs for the round-8 corpus-health batch: char-mass
  * repetition profile, semantic diversity cap, hard-negative mining,
  * dup-cluster histogram, and the post-split leakage audit. */
class Round8Batch3Spec extends SparkTestBase {
  import spark.implicits._

  test("repetitionProfile computes exact char-mass fractions per (doc, n)") {
    // doc 1 tokens: aa aa aa bb → 2-grams "aa aa"×2 (mass 10), "aa bb"×1
    // (mass 5): total 15, dup 10, top 10 → both fracs 666666.
    // 3-grams "aa aa aa"×1, "aa aa bb"×1 (mass 8 each): total 16, dup 0,
    // top ties resolve to the lexicographically smaller gram → 500000.
    val docs = Seq((1L, "aa aa aa bb")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionProfile(docs)
      .orderBy("n").collect()
    assert(out.length == 2)
    val r2 = out(0)
    assert(r2.getLong(2) == 15L && r2.getLong(3) == 666666L &&
      r2.getLong(4) == 666666L && r2.getBoolean(5))
    val r3 = out(1)
    assert(r3.getLong(2) == 16L && r3.getLong(3) == 0L &&
      r3.getLong(4) == 500000L && r3.getBoolean(5))
  }

  test("repetitionProfile drops docs with fewer than n tokens at that n") {
    val docs = Seq((1L, "solo"), (2L, "two words here")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionProfile(docs).collect()
    // doc 1 has no 2- or 3-grams; doc 2 has both
    assert(out.map(_.getLong(0)).distinct.sameElements(Array(2L)))
    assert(out.length == 2)
  }

  test("semanticCap separates antipodal groups and keeps m per cell") {
    val up = Array(1f, 0f, 0f, 0f)
    val dn = Array(-1f, 0f, 0f, 0f)
    val emb = ((0L until 10L).map(i => (i, up)) ++
      (10L until 20L).map(i => (i, dn))).toDF("vec_id", "embedding")
    val out = Similarity.semanticCap(emb, m = 8)
      .select("vec_id", "cell", "cell_size", "rk", "keep").collect()
    val byCell = out.groupBy(_.getLong(1))
    // mean-centering puts the two antipodal groups on opposite sides of
    // every plane with a nonzero first component → two distinct cells
    assert(byCell.size == 2)
    byCell.values.foreach { rows =>
      assert(rows.length == 10 && rows.forall(_.getLong(2) == 10L))
      assert(rows.count(_.getBoolean(4)) == 8)
      val keptRanks: Seq[Long] =
        rows.filter(_.getBoolean(4)).map(_.getLong(3)).toSeq.sorted
      assert(keptRanks == (1L to 8L).toSeq)
    }
    // deterministic: same input, same keepers
    val again = Similarity.semanticCap(emb, m = 8)
      .filter(col("keep")).select("vec_id").collect().map(_.getLong(0)).sorted
    assert(again.sameElements(
      out.filter(_.getBoolean(4)).map(_.getLong(0)).sorted))
  }

  test("hardNegatives keeps the band, drops near-dups and dissimilar") {
    val a = Array(1f, 0f)     // anchor
    val d = Array(1f, 0f)     // exact dup: cos 1.0 ≥ hi → never a negative
    val m = Array(0.8f, 0.6f) // cos 0.8 with a/d → in [0.3, 0.95)
    val f = Array(-1f, 0f)    // cos −1 with a → below lo
    val emb = Seq((1L, a), (2L, d), (3L, m), (4L, f))
      .toDF("vec_id", "embedding")
    // cellK = 1: one Lloyd's cell, so the band filter is the only gate
    val out = Similarity.hardNegatives(emb, lo = 0.3, hi = 0.95, k = 3,
        cellK = 1)
      .select("anchor", "negative", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ofAnchor = out.filter(_._1 == 1L)
    assert(ofAnchor.map(_._2).toSet == Set(3L))
    assert(math.abs(ofAnchor.head._3 - 0.8) < 1e-9)
    // the far vector gets no in-band negatives at all
    assert(!out.exists(_._1 == 4L))
    // exact dups never become each other's negatives (cos 1.0 ≥ hi) —
    // but the dup IS a valid negative for the mid vector (cos 0.8)
    assert(!out.exists(t => t._1 == 1L && t._2 == 2L))
    assert(!out.exists(t => t._1 == 2L && t._2 == 1L))
    assert(out.filter(_._1 == 3L).map(_._2).toSet == Set(1L, 2L))
  }

  test("dupClusterProfile: transitive chain plus singletons") {
    val docs = (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Dedup.dupClusterProfile(docs, pairs)
      .orderBy("cluster_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sameElements(Array((1L, 3L, 3L), (3L, 1L, 3L))))
  }

  test("splitLeakageAudit counts a planted cross-split rare-gram collision") {
    // discover two singleton doc ids landing on opposite sides of the
    // train/val boundary under the split's own h60(cluster) mod 100 rule
    val probe = (1L to 200L).map(i => (i, s"id $i")).toDF("doc_id", "text")
    val noPairs = Seq.empty[(Long, Long)].toDF("a", "b")
    val sp = TrainingData.leakageSafeSplit(probe, noPairs)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val trainId = sp.collectFirst { case (id, "train") => id }.get
    val valId = sp.collectFirst { case (id, "val") => id }.get
    val shared = "g1 g2 g3 g4 g5 g6 g7 g8"
    val docs = Seq(
      (trainId, s"alpha beta gamma delta $shared epsilon zeta"),
      (valId, s"one two three four five $shared six seven"))
      .toDF("doc_id", "text")
    val out = TrainingData.splitLeakageAudit(docs, noPairs)
      .orderBy("split_a", "split_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // three spine rows always; the planted collision sits on train/val
    assert(out.map(t => (t._1, t._2)).sameElements(
      Array(("test", "train"), ("test", "val"), ("train", "val"))))
    val tv = out.find(t => t._1 == "train" && t._2 == "val").get
    assert(tv._3 == 1L && tv._4 == 1L && tv._5 == 0L)
    assert(out.forall(_._5 == 0L))
    val tt = out.find(t => t._1 == "test" && t._2 == "train").get
    assert(tt._3 == 0L && tt._4 == 0L)
  }

  test("splitLeakageAudit straddle is zero on a real near-dup corpus") {
    val docs = spark.read.parquet(s"$testData/sf0.001/documents.parquet")
    val pairs = Dedup.minhashLsh(docs, 8, 2, 0.8).select(col("a"), col("b"))
    val out = TrainingData.splitLeakageAudit(docs, pairs).collect()
    assert(out.length == 3)
    assert(out.forall(_.getLong(4) == 0L))
  }
}
