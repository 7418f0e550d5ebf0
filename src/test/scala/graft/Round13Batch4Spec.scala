package graft

import org.apache.spark.sql.functions._

/** Round-13 batch-4 specs: the preference-data family (q326/q327) —
  * Bradley–Terry source strengths and the position-bias audit.
  */
class Round13Batch4Spec extends SparkTestBase {
  import spark.implicits._

  /** Planted 3-source corpus with a controlled stopword-quality signal:
    * isolated ' the ' occurrences (consecutive stopwords share spaces
    * and undercount), k per doc sets the ratio. A(k=4) ≻ B(k=3) ≻ C(k=2)
    * with planted upsets on both ends so the MM genuinely iterates. */
  private def prefDocs = (0 until 30).map { i =>
    val src = Seq("srcA", "srcB", "srcC")(i % 3)
    val k = (src, i) match {
      case ("srcA", 0) | ("srcA", 9) => 1   // A sometimes loses
      case ("srcC", 20) => 5                // C sometimes dominates
      case ("srcA", _) => 4
      case ("srcB", _) => 3
      case _ => 2
    }
    val text = (0 until 10)
      .map(t => if (t % 2 == 0 && t / 2 < k) "the" else s"w$i$t")
      .mkString(" ")
    (i.toLong, src, text)
  }.toDF("doc_id", "source", "text")

  test("bradleyTerry: the planted dominance order A > B > C comes out " +
      "in both rank and strict strength order, the MM iterates past the " +
      "round-1 win-ratio fixed point, and every comparison yields " +
      "exactly one win") {
    val out = graft.ops.Preference.bradleyTerry(prefDocs, rounds = 10)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out.keySet === Set("srcA", "srcB", "srcC"))
    assert(out("srcA").getAs[Long]("rank") === 1L)
    assert(out("srcB").getAs[Long]("rank") === 2L)
    assert(out("srcC").getAs[Long]("rank") === 3L)
    val sA = out("srcA").getAs[Long]("strength_u")
    val sB = out("srcB").getAs[Long]("strength_u")
    val sC = out("srcC").getAs[Long]("strength_u")
    assert(sA > sB && sB > sC, s"strengths must order: $sA $sB $sC")
    // the connected multi-offset tournament must NOT fix at round 1
    // (a disjoint head-to-head design degenerates to 2x the win rate —
    // the exact failure the offset set exists to prevent)
    assert(out.values.exists(r =>
      r.getAs[Long]("strength_u") !=
        2L * r.getAs[Long]("win_u")),
      "MM must move past the single-round value on a connected graph")
    val wins = out.values.map(_.getAs[Long]("n_wins")).sum
    val comps = out.values.map(_.getAs[Long]("n_comparisons")).sum
    assert(comps === 2 * wins, "each comparison: one winner, two seats")
    assert(wins > 0)
  }

  test("positionBias: the (all) row seats exactly one first and one " +
      "second per comparison, and per-source seat/win counts reconcile " +
      "with the Bradley-Terry relation row-for-row") {
    val docs = prefDocs
    val bias = graft.ops.Preference.positionBias(docs)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val bt = graft.ops.Preference.bradleyTerry(docs, rounds = 1)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val all = bias("(all)")
    val nComps = all.getAs[Long]("n_first")
    assert(nComps > 0)
    assert(all.getAs[Long]("n_second") === nComps)
    assert(all.getAs[Long]("n_wins_first") +
      all.getAs[Long]("n_wins_second") === nComps)
    bt.foreach { case (src, r) =>
      val b = bias(src)
      assert(b.getAs[Long]("n_first") + b.getAs[Long]("n_second") ===
        r.getAs[Long]("n_comparisons"), s"$src seat count")
      assert(b.getAs[Long]("n_wins_first") +
        b.getAs[Long]("n_wins_second") === r.getAs[Long]("n_wins"),
        s"$src win count")
    }
  }
}
