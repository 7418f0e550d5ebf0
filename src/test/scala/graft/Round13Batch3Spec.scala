package graft

import org.apache.spark.sql.functions._

/** Round-13 batch-3 specs: the q320 drift-vs-recall retrain trigger —
  * the operator connecting the q298 codebook-drift gauge to the q292
  * recall metric over a FROZEN index.
  */
class Round13Batch3Spec extends SparkTestBase {
  import spark.implicits._

  private def plantedVecs = (0 until 24).map { i =>
    (i.toLong, (0 until 4).map { d =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"v:$i:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
      ((java.lang.Long.parseLong(hex.take(15), 16) % 2001L) - 1000L)
        .toFloat / 1000f
    }.toArray)
  }.toDF("vec_id", "embedding")

  test("ivfPqDriftRecall: the step-0 row reproduces the fresh index's " +
      "own nprobe=2 recall exactly (zero translation => the pure-function " +
      "re-encode IS the frozen codes), and the cell-drift gauge rises " +
      "strictly with the translation series") {
    val emb = plantedVecs
    val out = graft.ops.Quantize.ivfPqDriftRecall(emb,
        steps = Seq(0, 1, 2, 3), driftPerStep = 0.5, nCells = 4, m = 2,
        k = 4, rounds = 2, nprobe = 2, nQueries = 3, topK = 5, dim = 4)
      .orderBy("step").collect()
    assert(out.length === 4)
    assert(out.map(_.getAs[Long]("offset_u")).toSeq ===
      Seq(0L, 500000L, 1000000L, 1500000L))
    // fresh-index cross-check: the same corpus through ivfPqRecall at
    // nprobe=2 must yield the identical (n_exact, n_hit) aggregate —
    // proving the drift harness adds nothing of its own at zero drift
    val fresh = graft.ops.Quantize.ivfPqRecall(emb, nprobes = Seq(2),
      nCells = 4, m = 2, k = 4, rounds = 2, nQueries = 3, topK = 5,
      dim = 4).collect()
    val nExact = fresh.map(_.getAs[Long]("n_exact")).sum
    val nHit = fresh.map(_.getAs[Long]("n_hit")).sum
    assert(nExact > 0)
    assert(out(0).getAs[Long]("n_exact") === nExact)
    assert(out(0).getAs[Long]("n_hit") === nHit)
    assert(out(0).getAs[Long]("recall_u") === nHit * 1000000L / nExact)
    // every step scores against a full ground-truth set (translation
    // never shrinks it) ...
    assert(out.forall(_.getAs[Long]("n_exact") === nExact))
    // ... and every drifted step reads STRICTLY above the step-0 gauge
    // baseline (the seeded-coarse floor) — the exceedance that makes
    // (total_drift, recall_u) readable as a retrain threshold. Strict
    // monotonicity across steps is NOT asserted: once the shifted cloud
    // reassigns wholesale to the few centroids in the shift direction,
    // the populated-cell count shrinks and the total can dip while the
    // recall damage persists (exactly why the trigger reads the PAIR).
    val drifts = out.map(_.getAs[Long]("total_drift")).toSeq
    assert(drifts.tail.forall(_ > drifts.head),
      s"drifted steps must exceed the step-0 baseline: $drifts")
  }
}
