package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection (`utils/analyze.py:122-140` uses python-louvain's
  * `best_partition` on the undirected graph).
  *
  * The reference's Louvain output is nondeterministic (random node order);
  * its tests can only assert structural invariants (SURVEY §7.4). We provide:
  *
  *  - [[labelPropagation]] — fully distributed, DataFrame-native synchronous
  *    LPA with deterministic tie-breaking (min label wins). One shuffle per
  *    round; the 100 TB scale path.
  *  - [[louvain]] — single-level Louvain modularity local-move, computed with
  *    the same aggregate-join pattern: each pass moves every node to the
  *    neighbor community with max modularity gain (deterministic order:
  *    gain desc, then community id). Captures the reference's objective
  *    (modularity) without its nondeterminism.
  */
object Community {

  /** Synchronous label propagation, min-label tie-break, fixed rounds. */
  def labelPropagation(vertices: DataFrame, edges: DataFrame, rounds: Int = 10): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val und = edges.select($"src".as("a"), $"dst".as("b"))
      .unionByName(edges.select($"dst".as("a"), $"src".as("b")))
      .distinct().localCheckpoint(true)

    var labels = vertices.select($"id", $"id".as("community")).localCheckpoint(true)
    var i = 0
    while (i < rounds) {
      val next = und
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("community", "nbrC"), Seq("b"))
        .groupBy($"a", $"nbrC").agg(count(lit(1)).as("cnt"))
        .groupBy($"a".as("id"))
        .agg(min_by($"nbrC", struct((-$"cnt").as("neg"), $"nbrC")).as("community"))
      labels = labels.select($"id").join(next, Seq("id"), "left")
        .withColumn("community", coalesce($"community", $"id"))
        .localCheckpoint(true)
      i += 1
    }
    labels
  }

  /** Single-level Louvain local-move: iterate "move each node to the adjacent
    * community with the highest modularity gain" until no node moves (or
    * maxPasses). Gain uses the standard formula ΔQ ∝ k_{i,in} - k_i*Σtot/2m
    * on the undirected multigraph view.
    */
  def louvain(vertices: DataFrame, edges: DataFrame, maxPasses: Int = 20): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    // undirected incidence (keep both directions; degree = undirected degree)
    val und = edges.select($"src".as("a"), $"dst".as("b"))
      .unionByName(edges.select($"dst".as("a"), $"src".as("b")))
      .localCheckpoint(true)
    val m2 = und.count().toDouble // = 2m
    val deg = und.groupBy($"a".as("id")).agg(count(lit(1)).cast("double").as("k"))
      .localCheckpoint(true)

    var labels = vertices.select($"id", $"id".as("community")).localCheckpoint(true)
    var moved = 1L
    var pass = 0
    while (moved > 0 && pass < maxPasses) {
      val withC = labels
      // community total degree Σtot
      val sigmaTot = withC.join(deg, Seq("id"))
        .groupBy($"community").agg(sum($"k").as("sigma"))
      // edges from node a into neighbor communities: k_{a,C}
      val kIn = und
        .join(withC.withColumnRenamed("id", "b").withColumnRenamed("community", "nbrC"), Seq("b"))
        .groupBy($"a", $"nbrC").agg(count(lit(1)).cast("double").as("kin"))
      val cand = kIn
        .join(deg.withColumnRenamed("id", "a"), Seq("a"))
        .join(sigmaTot.withColumnRenamed("community", "nbrC"), Seq("nbrC"))
        .join(withC.withColumnRenamed("id", "a").withColumnRenamed("community", "curC"), Seq("a"))
        // remove own contribution when evaluating the current community
        .withColumn("sigmaAdj",
          when($"nbrC" === $"curC", $"sigma" - $"k").otherwise($"sigma"))
        .withColumn("gain", $"kin" - $"k" * $"sigmaAdj" / m2)
      val best = cand.groupBy($"a".as("id"))
        .agg(min_by(struct($"nbrC", $"curC"), struct((-$"gain").as("ng"), $"nbrC")).as("b"))
        .select($"id", $"b.nbrC".as("newC"), $"b.curC".as("curC"))
      val updated = best
        .withColumn("community",
          when($"newC".isNotNull, $"newC").otherwise($"curC"))
      moved = updated.filter($"community" =!= $"curC").count()
      labels = labels.select($"id")
        .join(updated.select($"id", $"community"), Seq("id"), "left")
        .withColumn("community", coalesce($"community", $"id"))
        .localCheckpoint(true)
      pass += 1
    }
    labels
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
