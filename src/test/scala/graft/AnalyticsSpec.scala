package graft

import scala.io.Source

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.etl.EntityBuilder
import graft.graph.{Analytics, Centrality, Community, Subgraph}

/** Graph analytics parity vs networkx goldens computed on the reference's own
  * entities output (fixtures in resources/golden/analytics.json).
  */
class AnalyticsSpec extends SparkTestBase {

  implicit val fmts: Formats = DefaultFormats

  lazy val golden: JValue = JsonMethods.parse(Source.fromInputStream(
    getClass.getResource("/golden/analytics.json").openStream(), "UTF-8").mkString)

  lazy val built = Fixtures.built
  lazy val vertices = built.entities.select(col("id")).localCheckpoint(true)
  lazy val edges = built.edges

  test("connected components: count, largest, isolated match networkx") {
    val cc = Analytics.connectedComponents(vertices, edges).localCheckpoint(true)
    val sizes = cc.groupBy("component").count()
    assert(sizes.count() === (golden \ "n_components").extract[Long])
    assert(sizes.agg(max("count")).head().getLong(0) === (golden \ "largest").extract[Long])
    assert(sizes.filter(col("count") === 1).count() === (golden \ "isolated").extract[Long])
  }

  test("connected components: distributed label-propagation path equals local union-find") {
    val local = Analytics.connectedComponents(h3._1, h3._2).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val dist = Analytics.connectedComponents(h3._1, h3._2, localCutoff = 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dist === local)
  }

  test("degree stats match networkx") {
    val deg = Analytics.degrees(vertices, edges)
    assert(deg.agg(max("inDeg")).head().getLong(0) === (golden \ "max_in").extract[Long])
    assert(deg.agg(max("outDeg")).head().getLong(0) === (golden \ "max_out").extract[Long])
  }

  test("commentary chain depths: max depth and node count match") {
    val depths = Analytics.commentaryDepths(vertices, edges)
    assert(depths.agg(max("depth")).head().getLong(0) ===
      (golden \ "max_chain_depth").extract[Long])
    assert(depths.count() === (golden \ "n_chain_nodes").extract[Long])
  }

  lazy val h3 = {
    val r = Subgraph.extract(spark, edges, Seq("40377"), 3, Nil)
    (r.nodes.localCheckpoint(true), r.edges.localCheckpoint(true))
  }

  test("betweenness (exact parallel Brandes) matches networkx on h3 subgraph") {
    val ref = (golden \ "betweenness_h3").extract[Map[String, Double]]
    val bc = Centrality.betweenness(h3._1, h3._2).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(bc.keySet === ref.keySet)
    ref.foreach { case (id, v) =>
      assert(math.abs(bc(id) - v) < 1e-9, s"betweenness mismatch at $id: ${bc(id)} vs $v")
    }
  }

  test("betweenness sampling: complete output, exact when sample covers all sources") {
    val exact = Centrality.betweenness(h3._1, h3._2).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val sampled = Centrality.betweenness(h3._1, h3._2, sampleSources = Some(20))
    assert(sampled.count() === h3._1.count(), "estimator covers every vertex")
    val full = Centrality.betweenness(h3._1, h3._2,
      sampleSources = Some(Int.MaxValue)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(full === exact, "k >= n degenerates to the exact algorithm")
  }

  test("betweenness: distributed path (no driver adjacency) agrees with local") {
    // localCutoff = 0 forces the >threshold path; the deterministic source
    // sample rule is shared with the local path, so the two k-sampled
    // estimators must agree to float round-off
    val local = Centrality.betweenness(h3._1, h3._2, sampleSources = Some(20))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dist = Centrality.betweenness(h3._1, h3._2, sampleSources = Some(20),
      localCutoff = 0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(dist.keySet === local.keySet)
    local.foreach { case (id, v) =>
      assert(math.abs(dist(id) - v) < 1e-9, s"distributed mismatch at $id")
    }
  }

  test("eigenvector: non-convergence contract (None) like the reference") {
    assert(Centrality.eigenvector(h3._1, h3._2, maxIter = 25).isEmpty)
  }

  test("eigenvector converges on an undirected view and is L2-normalized") {
    val und = h3._2.select(col("src"), col("dst"))
      .unionByName(h3._2.select(col("dst").as("src"), col("src").as("dst")))
    val r = Centrality.eigenvector(h3._1, und, maxIter = 200)
    assert(r.isDefined)
    val norm = r.get.agg(sum(col("score") * col("score"))).head().getDouble(0)
    assert(math.abs(norm - 1.0) < 1e-6)
  }

  test("eigenvector: distributed join-loop path agrees with the local path") {
    val und = h3._2.select(col("src"), col("dst"))
      .unionByName(h3._2.select(col("dst").as("src"), col("src").as("dst")))
    val local = Centrality.eigenvector(h3._1, und, maxIter = 300).get
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dist = Centrality.eigenvector(h3._1, und, maxIter = 300, localCutoff = 0).get
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(dist.keySet === local.keySet)
    local.foreach { case (id, v) =>
      assert(math.abs(dist(id) - v) < 1e-4, s"score mismatch at $id: ${dist(id)} vs $v")
    }
  }

  test("powerIterationFixed: distributed path agrees with local; tracks eigenvector") {
    val und = h3._2.select(col("src"), col("dst"))
      .unionByName(h3._2.select(col("dst").as("src"), col("src").as("dst")))
    val local = Centrality.powerIterationFixed(h3._1, und, 40)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dist = Centrality.powerIterationFixed(h3._1, und, 40, localCutoff = 0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(dist.keySet === local.keySet)
    local.foreach { case (id, v) =>
      assert(math.abs(dist(id) - v) < 1e-9, s"score mismatch at $id: ${dist(id)} vs $v")
    }
    // fixed-round iterate approximates the converged eigenvector
    val eig = Centrality.eigenvector(h3._1, und, maxIter = 300).get
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    local.foreach { case (id, v) =>
      assert(math.abs(eig(id) - v) < 1e-3, s"drift vs eigenvector at $id")
    }
  }

  test("louvain + label propagation produce positive-modularity partitions") {
    val (nodes, es) = h3
    val lou = Community.louvain(nodes, es)
    val q = Community.modularity(nodes, es, lou)
    assert(q > 0.3, s"louvain modularity $q")
    val lpa = Community.labelPropagation(nodes, es, rounds = 5)
    assert(lpa.select("community").distinct().count() >= 1)
  }

  test("distributed louvain improves modularity over singletons and terminates") {
    val (nodes, es) = h3
    val lou = Community.louvainDistributed(nodes, es, maxPasses = 4)
    assert(lou.count() === nodes.count())
    val q = Community.modularity(nodes, es, lou)
    assert(q > 0.0, s"distributed louvain modularity $q")
  }

  test("component summary buckets are consistent") {
    val cc = Analytics.connectedComponents(vertices, edges)
    val summary = Analytics.componentSummary(cc).collect()
      .map(r => r.getAs[String]("bucket") -> (r.getAs[Long]("nodes"), r.getAs[Long]("components")))
      .toMap
    assert(summary("isolated")._1 === (golden \ "isolated").extract[Long])
    assert(summary.values.map(_._1).sum === vertices.count())
  }
}
