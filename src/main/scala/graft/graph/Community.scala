package graft.graph

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FreshCheckpoint

/** Community detection (`utils/analyze.py:122-140` uses python-louvain's
  * `best_partition` on the undirected graph).
  *
  * The reference's Louvain output is nondeterministic (random node order);
  * tests can only assert structural invariants (SURVEY §7.4.5). We provide:
  *
  *  - [[louvain]] — exact multi-level Louvain, sequential local-move over a
  *    collected edge list (deterministic node order). Same algorithm family
  *    as python-louvain, converges to a proper local optimum. Like exact
  *    Brandes betweenness (`Centrality.betweenness`), this presumes the EDGE
  *    LIST fits in driver memory — true for dimension-sized graphs like the
  *    reference's 17k nodes / 14k edges, and for any graph one would run an
  *    exact sequential-semantics Louvain on.
  *  - [[louvainDistributed]] — single-level synchronous local-move on
  *    DataFrames: one shuffle per pass, honest stats per pass via
  *    [[FreshCheckpoint]]. Synchronous moves can oscillate (two adjacent
  *    nodes swapping communities forever), so passes are bounded and the
  *    best-modularity labeling seen is returned. The 100 TB scale path,
  *    explicitly approximate.
  *  - [[labelPropagation]] — fully distributed synchronous LPA with
  *    deterministic tie-breaking; cheapest scale path.
  */
object Community {

  /** Exact multi-level Louvain (Blondel et al. 2008), deterministic.
    *
    * Matches the reference's semantics: undirected simple graph (reciprocal /
    * parallel edges collapse, like `nx.DiGraph.to_undirected()`), weight 1
    * per edge, modularity objective. Node sweep order = sorted id, so output
    * is deterministic (unlike python-louvain's randomized order).
    *
    * @return (id, community) — community = min member id (stable labeling).
    */
  def louvain(vertices: DataFrame, edges: DataFrame, maxLevels: Int = 16): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._

    val ids: Array[String] = vertices.select($"id").as[String].collect().sorted
    val idx: Map[String, Int] = ids.zipWithIndex.toMap
    val n0 = ids.length
    if (n0 == 0) return spark.emptyDataset[(String, String)].toDF("id", "community")

    // undirected simple edges as unordered index pairs (self-loops dropped —
    // none exist in the data model: a work cannot comment on itself)
    val pairs: Array[(Int, Int)] = edges.select($"src", $"dst").as[(String, String)]
      .collect().iterator
      .filter { case (a, b) => a != b && idx.contains(a) && idx.contains(b) }
      .map { case (a, b) =>
        val i = idx(a); val j = idx(b); if (i < j) (i, j) else (j, i)
      }.toArray.distinct

    // current coarse graph: weighted adjacency + per-node self-loop weight
    var n = n0
    var adjW: Array[mutable.LinkedHashMap[Int, Double]] =
      Array.fill(n)(mutable.LinkedHashMap.empty[Int, Double])
    pairs.foreach { case (i, j) =>
      adjW(i)(j) = adjW(i).getOrElse(j, 0.0) + 1.0
      adjW(j)(i) = adjW(j).getOrElse(i, 0.0) + 1.0
    }
    var selfW: Array[Double] = Array.fill(n)(0.0)
    // original node -> community of the current level's coarse graph
    var membership: Array[Int] = Array.tabulate(n0)(identity)

    val m2 = 2.0 * pairs.length // constant across levels (weights are conserved)
    if (m2 == 0) {
      return spark.createDataset(ids.map(id => (id, id)).toSeq).toDF("id", "community")
    }

    /** One level of sequential local-move; returns (assignment, improved?). */
    def localMove(): (Array[Int], Boolean) = {
      val k = Array.tabulate(n)(v => adjW(v).valuesIterator.sum + 2.0 * selfW(v))
      val comm = Array.tabulate(n)(identity)
      val sigmaTot = k.clone()
      var improvedAny = false
      var sweeping = true
      var sweeps = 0
      while (sweeping && sweeps < 100) {
        sweeping = false
        var v = 0
        while (v < n) {
          val cv = comm(v)
          // weights from v into each adjacent community
          val wTo = mutable.HashMap.empty[Int, Double]
          adjW(v).foreach { case (u, w) =>
            val c = comm(u); wTo(c) = wTo.getOrElse(c, 0.0) + w
          }
          sigmaTot(cv) -= k(v)
          var bestC = cv
          var bestGain = wTo.getOrElse(cv, 0.0) - k(v) * sigmaTot(cv) / m2
          // strict improvement only; stay on ties (deterministic)
          wTo.foreach { case (c, w) =>
            if (c != cv) {
              val gain = w - k(v) * sigmaTot(c) / m2
              if (gain > bestGain + 1e-12) { bestGain = gain; bestC = c }
            }
          }
          sigmaTot(bestC) += k(v)
          if (bestC != cv) { comm(v) = bestC; sweeping = true; improvedAny = true }
          v += 1
        }
        sweeps += 1
      }
      (comm, improvedAny)
    }

    var level = 0
    var improved = true
    while (improved && level < maxLevels) {
      val (comm, didImprove) = localMove()
      improved = didImprove
      if (improved) {
        // relabel communities densely
        val remap = mutable.HashMap.empty[Int, Int]
        comm.foreach(c => remap.getOrElseUpdate(c, remap.size))
        val dense = comm.map(remap)
        // push down to original nodes
        var i = 0
        while (i < n0) { membership(i) = dense(membership(i)); i += 1 }
        // coarsen
        val nNew = remap.size
        val newAdj = Array.fill(nNew)(mutable.LinkedHashMap.empty[Int, Double])
        val newSelf = Array.fill(nNew)(0.0)
        var v = 0
        while (v < n) {
          val cv = dense(v)
          newSelf(cv) += selfW(v)
          adjW(v).foreach { case (u, w) =>
            val cu = dense(u)
            if (cu == cv) { if (v < u) newSelf(cv) += w }
            else newAdj(cv)(cu) = newAdj(cv).getOrElse(cu, 0.0) + w
          }
          v += 1
        }
        n = nNew; adjW = newAdj; selfW = newSelf
      }
      level += 1
    }

    // stable labels: community id = min member id
    val label = Array.fill(n)(null: String)
    var i = 0
    while (i < n0) {
      val c = membership(i)
      if (label(c) == null || ids(i) < label(c)) label(c) = ids(i)
      i += 1
    }
    val rows = (0 until n0).map(v => (ids(v), label(membership(v))))
    spark.createDataset(rows).toDF("id", "community")
  }

  /** Synchronous label propagation, min-label tie-break, fixed rounds. */
  def labelPropagation(vertices: DataFrame, edges: DataFrame, rounds: Int = 10): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val und = FreshCheckpoint(edges.select($"src".as("a"), $"dst".as("b"))
      .unionByName(edges.select($"dst".as("a"), $"src".as("b")))
      .distinct())

    var labels = FreshCheckpoint(vertices.select($"id", $"id".as("community")))
    var i = 0
    while (i < rounds) {
      val next = und
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("community", "nbrC"), Seq("b"))
        .groupBy($"a", $"nbrC").agg(count(lit(1)).as("cnt"))
        .groupBy($"a".as("id"))
        .agg(min_by($"nbrC", struct((-$"cnt").as("neg"), $"nbrC")).as("community"))
      labels = FreshCheckpoint(labels.select($"id").join(next, Seq("id"), "left")
        .withColumn("community", coalesce($"community", $"id")))
      i += 1
    }
    labels
  }

  /** Distributed multi-level Louvain: synchronous local-move passes, then a
    * fully-distributed coarsening (communities become weighted super-nodes,
    * intra-community mass becomes self-loop weight), then local-move again on
    * the coarse graph — the same level structure as the exact sequential
    * path, with every step a shuffle-on-key DataFrame op. Coarsening is what
    * lets the approximation merge whole communities at once, which single
    * node moves cannot do once the first level converges; one coarse level
    * closes most of the modularity gap to the sequential algorithm.
    *
    * Within a level, synchronous updates may oscillate, so the pass count is
    * bounded, only half the nodes (hash ⊕ pass parity) may move per pass,
    * and the BEST labeling by modularity is returned. One shuffle per pass;
    * [[FreshCheckpoint]] keeps planning O(1) per pass. Modularity of a
    * coarse partition equals the fine modularity of the partition it
    * induces, so per-level best-tracking composes soundly.
    */
  def louvainDistributed(
      vertices: DataFrame,
      edges: DataFrame,
      maxPasses: Int = 32,
      levels: Int = 8,
      moveFraction: Int = 8,
      cycles: Int = 2): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    // level-0 graph: weight-1 both-direction rows, no self-loops
    val und0 = FreshCheckpoint(edges.select($"src".as("a"), $"dst".as("b"))
      .unionByName(edges.select($"dst".as("a"), $"src".as("b")))
      .withColumn("w", lit(1.0)))
    val self0 = FreshCheckpoint(vertices.select($"id", lit(0.0).as("s")))
    // Iterated V-cycles: a cycle's coarse levels move whole communities,
    // which strands individually-misplaced nodes inside the blobs they were
    // frozen into at level 0. The next cycle's level-0 pass is SEEDED with
    // the composed labels (Leiden-style refinement; best-tracking starts
    // from the seed's own modularity, so it can only improve) and the
    // hierarchy then re-coarsens over the refined partition, letting the
    // corrected communities merge as super-nodes. Q is monotone in cycles:
    // a coarse level's singleton start IS the incoming partition.
    var total: DataFrame = null
    for (_ <- 0 until cycles) {
      var und = und0
      var self = self0
      // composed fine-node -> current-level community mapping
      var cycTotal: DataFrame = null
      var lvl = 0
      var done = false
      while (lvl < levels && !done) {
        val init = if (lvl == 0 && total != null) Some(total) else None
        val passes = if (init.isDefined) math.max(1, maxPasses / 2) else maxPasses
        val labels = localMoveLevel(und, self, passes, moveFraction, init)
        cycTotal = if (cycTotal == null) labels
          else FreshCheckpoint(cycTotal.withColumnRenamed("community", "mid")
            .join(labels.withColumnRenamed("id", "mid"), Seq("mid"))
            .select($"id", $"community"))
        // no contraction → a further level would replay the same local-move
        if (labels.select($"community").distinct().count() == self.count())
          done = true
        if (!done && lvl < levels - 1) {
          val lab = labels
          val labA = lab.withColumnRenamed("id", "a").withColumnRenamed("community", "ca")
          val labB = lab.withColumnRenamed("id", "b").withColumnRenamed("community", "cb")
          val mapped = und.join(labA, Seq("a")).join(labB, Seq("b"))
          // inter-community mass keeps both directions (grouped per
          // direction); intra-community rows appear twice per edge → /2
          // into self-loops
          val nextUnd = FreshCheckpoint(mapped.filter($"ca" =!= $"cb")
            .groupBy($"ca".as("a"), $"cb".as("b")).agg(sum($"w").as("w")))
          val intraSelf = mapped.filter($"ca" === $"cb")
            .groupBy($"ca".as("id")).agg((sum($"w") / 2.0).as("s1"))
          val carried = self.join(lab, Seq("id"))
            .groupBy($"community".as("id")).agg(sum($"s").as("s2"))
          val nextSelf = FreshCheckpoint(carried
            .join(intraSelf, Seq("id"), "full")
            .select($"id", (coalesce($"s1", lit(0.0)) + coalesce($"s2", lit(0.0))).as("s")))
          und = nextUnd
          self = nextSelf
        }
        lvl += 1
      }
      total = cycTotal
    }
    total
  }

  /** Bounded synchronous local-move on a weighted graph with self-loops:
    * `und` holds both-direction (a, b, w) rows for a ≠ b; `self` holds each
    * node's internal weight s (counted once; k_i includes 2s). Starts from
    * `init` when given (refinement sweeps), else singletons. Returns the
    * best labeling seen by weighted modularity. */
  private def localMoveLevel(
      und: DataFrame, self: DataFrame, maxPasses: Int,
      moveFraction: Int = 2, init: Option[DataFrame] = None): DataFrame = {
    val spark = und.sparkSession
    import spark.implicits._
    val deg = FreshCheckpoint(
      und.groupBy($"a".as("id")).agg(sum($"w").as("kAdj"))
        .join(self, Seq("id"), "full")
        .select($"id",
          (coalesce($"kAdj", lit(0.0)) + coalesce($"s", lit(0.0)) * 2.0).as("k")))
    val m2 = deg.agg(coalesce(sum($"k"), lit(0.0))).as[Double].head() // = 2m
    var labels = FreshCheckpoint(
      init.getOrElse(deg.select($"id", $"id".as("community"))))
    if (m2 == 0.0) return labels
    var best = labels
    var bestQ = weightedModularity(und, self, deg, m2, labels)
    var pass = 0
    var anyMoved = true
    while (anyMoved && pass < maxPasses) {
      val withC = labels
      val sigmaTot = withC.join(deg, Seq("id"))
        .groupBy($"community").agg(sum($"k").as("sigma"))
      val kIn = und
        .join(withC.withColumnRenamed("id", "b").withColumnRenamed("community", "nbrC"), Seq("b"))
        .groupBy($"a", $"nbrC").agg(sum($"w").as("kin"))
      // explicit STAY candidate (kin=0 into the own community): a node whose
      // community has no other adjacent member gets no kIn row for it, and
      // without one the argmax would take the best MOVE even at negative
      // gain. When a real own-community row exists it dominates this one
      // (kin ≥ 0 on the same sigmaAdj), so the union is always safe.
      val stay = withC.select($"id".as("a"), $"community".as("nbrC"),
        lit(0.0).as("kin"))
      val cand = kIn.unionByName(stay)
        .join(deg.withColumnRenamed("id", "a"), Seq("a"))
        .join(sigmaTot.withColumnRenamed("community", "nbrC"), Seq("nbrC"))
        .join(withC.withColumnRenamed("id", "a").withColumnRenamed("community", "curC"), Seq("a"))
        // remove own contribution when evaluating the current community
        .withColumn("sigmaAdj",
          when($"nbrC" === $"curC", $"sigma" - $"k").otherwise($"sigma"))
        .withColumn("gain", $"kin" - $"k" * $"sigmaAdj" / m2)
      // prefer STAYING on ties (isMove sorts current community first); only
      // half the nodes (hash ⊕ pass parity) may move per pass — dampens the
      // adjacent-pair swap oscillation inherent to synchronous local-move
      val moved = cand.groupBy($"a".as("id"))
        .agg(min_by(struct($"nbrC", $"curC"),
          struct((-$"gain").as("ng"),
            ($"nbrC" =!= $"curC").cast("int").as("isMove"), $"nbrC")).as("b"))
        .select($"id", $"b.nbrC".as("newC"), $"b.curC".as("curC"))
        .filter(pmod(abs(hash($"id")) + lit(pass), lit(moveFraction)) === 0)
      val prev = labels
      labels = FreshCheckpoint(prev
        .join(moved.select($"id", $"newC"), Seq("id"), "left")
        .withColumn("community", coalesce($"newC", $"community"))
        .select($"id", $"community"))
      anyMoved = labels.join(prev.withColumnRenamed("community", "prevC"), Seq("id"))
        .filter($"community" =!= $"prevC").limit(1).count() > 0
      val q = weightedModularity(und, self, deg, m2, labels)
      if (q > bestQ) { bestQ = q; best = labels }
      pass += 1
    }
    best
  }

  /** Weighted modularity with self-loops (private, level-internal): self
    * weight is always intra-community mass; und rows carry both directions
    * so intra rows count each internal edge twice, matching m2. */
  private def weightedModularity(
      und: DataFrame, self: DataFrame, deg: DataFrame, m2: Double,
      labels: DataFrame): Double = {
    val spark = und.sparkSession
    import spark.implicits._
    val lab = labels.select($"id", $"community")
    val intraAdj = und
      .join(lab.withColumnRenamed("id", "a").withColumnRenamed("community", "ca"), Seq("a"))
      .join(lab.withColumnRenamed("id", "b").withColumnRenamed("community", "cb"), Seq("b"))
      .filter($"ca" === $"cb")
      .agg(coalesce(sum($"w"), lit(0.0))).as[Double].head()
    val intraSelf = self.agg(coalesce(sum($"s" * 2.0), lit(0.0))).as[Double].head()
    val sumSq = deg.join(lab, Seq("id"))
      .groupBy($"community").agg(sum($"k").as("sigma"))
      .agg(coalesce(sum($"sigma" * $"sigma"), lit(0.0))).as[Double].head()
    (intraAdj + intraSelf) / m2 - sumSq / (m2 * m2)
  }

  /** Modularity of a partition on the undirected view — the structural
    * invariant our tests assert (SURVEY §7.4.5). */
  def modularity(vertices: DataFrame, edges: DataFrame, labels: DataFrame): Double = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val und = edges.select($"src".as("a"), $"dst".as("b"))
      .unionByName(edges.select($"dst".as("a"), $"src".as("b")))
    val m2 = und.count().toDouble
    if (m2 == 0) return 0.0
    val lab = labels.select($"id", $"community")
    val intra = und
      .join(lab.withColumnRenamed("id", "a").withColumnRenamed("community", "ca"), Seq("a"))
      .join(lab.withColumnRenamed("id", "b").withColumnRenamed("community", "cb"), Seq("b"))
      .filter($"ca" === $"cb").count().toDouble
    val degByC = und.groupBy($"a").agg(count(lit(1)).cast("double").as("k"))
      .join(lab.withColumnRenamed("id", "a"), Seq("a"))
      .groupBy($"community").agg(sum($"k").as("sigma"))
    val sumSq = degByC.agg(sum($"sigma" * $"sigma")).as[Double].head()
    intra / m2 - sumSq / (m2 * m2)
  }
}
