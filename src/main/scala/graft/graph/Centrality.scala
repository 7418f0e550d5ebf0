package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FreshCheckpoint

import scala.collection.mutable

/** Centrality measures (`utils/analyze.py:156-209`).
  *
  * - degree centrality: pure DataFrame arithmetic (deg / (n-1)).
  * - eigenvector: distributed power iteration — one shuffle per round,
  *   L2-normalized, None-on-non-convergence contract like the reference
  *   (`utils/analyze.py:169-174`).
  * - betweenness: exact Brandes, parallelized over SOURCE vertices: the
  *   adjacency is broadcast once and each partition of sources runs
  *   independent single-source passes, partial scores summed by key. This is
  *   embarrassingly parallel and exact; it presumes the adjacency fits in
  *   executor memory (true for dimension-sized graphs like the reference's
  *   17k nodes; for larger graphs use the k-sample approximation via
  *   `sampleSources`).
  */
object Centrality {

  /** In/out/total degree centrality: degree / (n-1)
    * (`nx.in_degree_centrality`, `utils/analyze.py:161-164`). */
  def degreeCentrality(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val n = vertices.count()
    Analytics.degrees(vertices, edges)
      .withColumn("inCentrality", col("inDeg") / (n - 1).toDouble)
      .withColumn("outCentrality", col("outDeg") / (n - 1).toDouble)
      .withColumn("centrality", col("deg") / (n - 1).toDouble)
  }

  /** Eigenvector centrality by power iteration on the (directed) edge table:
    * x' = A^T x (mass flows src→dst, matching networkx's left-eigenvector
    * convention), L2-normalized each round.
    * Returns None if |x_t - x_{t-1}|_1 > n*tol after maxIter rounds
    * (the reference catches PowerIterationFailedConvergence → None).
    */
  def eigenvector(
      vertices: DataFrame,
      edges: DataFrame,
      maxIter: Int = 100,
      tol: Double = 1e-6): Option[DataFrame] = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val n = vertices.count()
    val e = FreshCheckpoint(edges.select($"src", $"dst"))
    var x = FreshCheckpoint(
      vertices.select($"id", lit(1.0 / math.sqrt(n.toDouble)).as("score")))
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val contrib = e.join(x.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy($"dst".as("id")).agg(sum($"score").as("inc"))
      // x' = x + A^T x (networkx adds the self term via A+I implicitly through
      // its hub-start; follow nx.eigenvector_centrality: x' = x*0 + A^T x + x)
      val raw = x.join(contrib, Seq("id"), "left")
        .select($"id", $"score".as("prev"),
          ($"score" + coalesce($"inc", lit(0.0))).as("raw"))
      // One aggregation yields both the L2 norm (A) and the cross term (C):
      // with ‖prev‖=1, ‖raw/√A − prev‖₂² = 2 − 2C/√A, and L1 ≤ √n·L2, so
      // L2² ≤ n·tol² ⟹ the reference's nx check Σ|Δ| < n·tol holds —
      // conservative (never declares convergence nx wouldn't), one job
      // instead of two per round.
      val (a, c) = raw.agg(sum($"raw" * $"raw"), sum($"raw" * $"prev"))
        .as[(Double, Double)].head()
      val norm = math.sqrt(a)
      // lineage cap 4: checkpointing every round costs a materialization job
      // each; every 4th keeps plans shallow at a quarter of the cost
      val next = raw.select($"id",
        ($"raw" / (if (norm == 0) 1.0 else norm)).as("score"))
      val deltaL2Sq = math.max(0.0, 2.0 - 2.0 * c / (if (norm == 0) 1.0 else norm))
      converged = deltaL2Sq <= n * tol * tol
      x = if (it % 4 == 3 || converged) FreshCheckpoint(next) else next
      it += 1
    }
    if (converged) Some(x) else None
  }

  /** Exact betweenness centrality (Brandes 2001), parallel over sources.
    *
    * @param normalized divide by (n-1)(n-2) like networkx's directed default.
    * @param sampleSources if set, run from a deterministic sample of k sources
    *        (scale path; estimator scales by n/k).
    */
  def betweenness(
      vertices: DataFrame,
      edges: DataFrame,
      normalized: Boolean = true,
      sampleSources: Option[Int] = None): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._

    val ids = vertices.select($"id").as[String].collect().sorted
    val idIndex = ids.zipWithIndex.toMap
    val nV = ids.length
    val adjPairs = edges.select($"src", $"dst").as[(String, String)].collect()
    val adjArr: Array[Array[Int]] = {
      val tmp = Array.fill(nV)(mutable.ArrayBuffer.empty[Int])
      adjPairs.foreach { case (s, d) =>
        (idIndex.get(s), idIndex.get(d)) match {
          case (Some(si), Some(di)) => tmp(si) += di
          case _ =>
        }
      }
      tmp.map(_.toArray.sorted)
    }
    val bcAdj = spark.sparkContext.broadcast(adjArr)
    val bcIds = spark.sparkContext.broadcast(ids)

    val sources: Seq[Int] = sampleSources match {
      case Some(k) if k < nV => (0 until nV by math.max(1, nV / k)).take(k)
      case _ => 0 until nV
    }
    val scale = if (sampleSources.exists(_ < nV)) nV.toDouble / sources.size else 1.0

    val partials = spark.sparkContext
      .parallelize(sources, math.min(sources.size, 256))
      .mapPartitions { srcIter =>
        val adj = bcAdj.value
        val n = adj.length
        val acc = new Array[Double](n)
        srcIter.foreach { s =>
          // single-source Brandes (BFS, unweighted)
          val sigma = new Array[Double](n); sigma(s) = 1.0
          val dist = Array.fill(n)(-1); dist(s) = 0
          val preds = Array.fill(n)(List.empty[Int])
          val stack = mutable.ArrayBuffer.empty[Int]
          val queue = mutable.Queue(s)
          while (queue.nonEmpty) {
            val v = queue.dequeue()
            stack += v
            adj(v).foreach { w =>
              if (dist(w) < 0) { dist(w) = dist(v) + 1; queue.enqueue(w) }
              if (dist(w) == dist(v) + 1) { sigma(w) += sigma(v); preds(w) ::= v }
            }
          }
          val deltaArr = new Array[Double](n)
          stack.reverseIterator.foreach { w =>
            preds(w).foreach { v =>
              deltaArr(v) += sigma(v) / sigma(w) * (1.0 + deltaArr(w))
            }
            if (w != s) acc(w) += deltaArr(w)
          }
        }
        Iterator.single(acc)
      }
      .treeReduce { (a, b) => var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a }

    val denom =
      if (normalized && nV > 2) (nV - 1).toDouble * (nV - 2) else 1.0
    val rows = bcIds.value.indices.map { i =>
      (bcIds.value(i), partials(i) * scale / denom)
    }
    spark.createDataFrame(rows).toDF("id", "betweenness")
  }

  /** Top-N per metric (`utils/analyze.py:178-209`) — plans as
    * TakeOrderedAndProject (no full sort). */
  def topN(scores: DataFrame, metricCol: String, n: Int = 10): DataFrame =
    scores.orderBy(col(metricCol).desc, col("id")).limit(n)
}
