package graft

import org.apache.spark.sql.functions._

import graft.ops.{Classifier, Privacy, Similarity, TextAnalysis}

/** Planted-case specs for the round-8 disclosure-distance / label-noise /
  * divergence / purity batch. */
class Round8Batch12Spec extends SparkTestBase {
  import spark.implicits._

  private def flLn(num: Double, den: Double): Long =
    math.floor((math.log(num) - math.log(den)) * 1000000).toLong

  test("tClosenessAudit measures per-class TV distance incl. absent values") {
    // classes: A = {x,x} (dist 500000 — pure, missing y), B = {y,y}
    // (mirror), C = {x,y} (matches global exactly, dist 0);
    // global: x 3/6, y 3/6
    val rows = Seq(
      ("A", "x"), ("A", "x"), ("B", "y"), ("B", "y"), ("C", "x"), ("C", "y"))
      .zipWithIndex.map { case ((q, s), i) => (i.toLong, q, s) }
      .toDF("id", "q", "s")
    val out = Privacy.tClosenessAudit(rows, Seq(col("q")), col("s"),
        ts = Seq(400000, 600000)).orderBy("t_u").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (400000L, 3L, 6L, 2L, 4L, 666666L),
      (600000L, 3L, 6L, 0L, 0L, 0L)))
  }

  // the batch-11 planted corpus: 2 kept docs, 2 rejected, NB agrees on all
  private val clean = "the quick fox and the lazy dog of the north went to " +
    "the old town and the wise owl of the hill came to visit"
  private val nbDocs = Seq(
    (1L, clean), (2L, clean),
    (3L, "abcdefghij klmnopqrst"), (4L, "abcdefghij klmnopqrst"))

  test("labelNoiseAudit rolls the scorer to confusion cells with margins") {
    val margin = flLn(3, 4) - flLn(1, 4) // |score| on both sides
    val out = Classifier.labelNoiseAudit(nbDocs.toDF("doc_id", "text"))
      .orderBy("weak_label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (0L, 0L, 2L, 500000L, margin, false),
      (1L, 1L, 2L, 500000L, margin, false)))
  }

  test("sourceDivergence floors per-token JSD terms plus residual ln2 mass") {
    // a: {x:2, y:1} n=3; b: {x:1, z:1} n=2 — shared token x only
    val docs = Seq((1L, "x x y", "a"), (2L, "x z", "b"))
      .toDF("doc_id", "text", "source")
    val px = 2d / 3d; val py = 1d / 2d
    val termU = math.floor((px * math.log(2d * px / (px + py))
      + py * math.log(2d * py / (px + py))) * 1000000d).toLong
    val rx = math.floor(1d / 3d * math.log(2d) * 1000000d).toLong
    val ry = math.floor(1d / 2d * math.log(2d) * 1000000d).toLong
    val out = TextAnalysis.sourceDivergence(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("a", "b", 1L, 666666L, 500000L, (termU + rx + ry) / 2)))
  }

  test("labelPurity reports majority share and floor'd entropy per cell") {
    // 4 identical vectors → one cell; labels 1,1,2,3 → majority (2, label
    // 1), entropy = 3·floor(0.25·ln4·1e6)-style terms
    val v = Array(0.5f, -0.25f, 0.125f, 1.0f)
    val emb = Seq((1L, v, 1), (2L, v, 1), (3L, v, 2), (4L, v, 3))
      .toDF("vec_id", "embedding", "label")
    val e1 = math.floor(0.5 * math.log(2d) * 1000000d).toLong
    val e2 = math.floor(0.25 * math.log(4d) * 1000000d).toLong
    val out = Similarity.labelPurity(emb).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(out.toSeq == Seq((4L, 3L, 1L, 500000L, e1 + 2 * e2)))
  }
}
