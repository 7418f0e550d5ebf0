package graft

import org.apache.spark.sql.functions._

import graft.graph.Layout

/** Force-directed layout (SURVEY §2 G10): determinism, geometric sanity, and
  * the plan contract that repulsion never degenerates to an all-pairs join. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  // two 6-cliques bridged by a single edge — layout must pull cliques tight
  // and push the two apart
  private def twoCliques() = {
    val a = (0 until 6).map(i => f"a$i%02d")
    val b = (0 until 6).map(i => f"b$i%02d")
    val edges = (for (Seq(x, y) <- a.combinations(2)) yield (x, y)).toSeq ++
      (for (Seq(x, y) <- b.combinations(2)) yield (x, y)).toSeq :+ (("a00", "b00"))
    val vs = (a ++ b).toDF("id")
    val es = edges.toDF("src", "dst")
    (vs, es, a.toSet, b.toSet)
  }

  test("layout is deterministic across runs") {
    val (vs, es, _, _) = twoCliques()
    val r1 = Layout.fruchtermanReingold(vs, es, iterations = 10).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val r2 = Layout.fruchtermanReingold(vs, es, iterations = 10).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(r1 === r2)
    assert(r1.forall { case (_, x, y) =>
      java.lang.Double.isFinite(x) && java.lang.Double.isFinite(y) })
  }

  test("initial positions are md5-uniform in [0,1)") {
    val (vs, _, _, _) = twoCliques()
    val init = Layout.initialPositions(vs).collect()
    assert(init.forall(r => r.getDouble(1) >= 0 && r.getDouble(1) < 1))
    assert(init.forall(r => r.getDouble(2) >= 0 && r.getDouble(2) < 1))
    // distinct ids land on distinct points
    assert(init.map(r => (r.getDouble(1), r.getDouble(2))).distinct.length
      === init.length)
  }

  test("bridged cliques: intra-clique distances contract below inter-clique") {
    val (vs, es, a, b) = twoCliques()
    val pos = Layout.fruchtermanReingold(vs, es, iterations = 40).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    def dist(u: String, v: String): Double = {
      val (x1, y1) = pos(u); val (x2, y2) = pos(v)
      math.hypot(x1 - x2, y1 - y2)
    }
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val intra = mean((for (Seq(x, y) <- a.toSeq.sorted.combinations(2).toSeq)
      yield dist(x, y)) ++
      (for (Seq(x, y) <- b.toSeq.sorted.combinations(2).toSeq) yield dist(x, y)))
    val inter = mean(for (x <- a.toSeq.sorted; y <- b.toSeq.sorted) yield dist(x, y))
    assert(intra < inter,
      s"clique members should sit closer together (intra=$intra inter=$inter)")
  }

  test("local path reproduces the distributed trajectory exactly") {
    val (vs, es, _, _) = twoCliques()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1).toSeq
    val local = rows(Layout.fruchtermanReingold(vs, es, iterations = 10))
    val dist = rows(Layout.fruchtermanReingold(vs, es, iterations = 10,
      localCutoff = 0))
    // per-round 9-dp rounding locks both paths to the same trajectory —
    // exact equality, not tolerance
    assert(local === dist)
  }

  test("repulsion pair-finding stays an equi-join on grid cells (no cross join)") {
    val (vs, _, _, _) = twoCliques()
    val rep = Layout.repulsionForces(Layout.initialPositions(vs), k = 0.2)
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // forces are produced (the join actually finds in-range pairs)
    assert(rep.count() > 0)
  }
}
