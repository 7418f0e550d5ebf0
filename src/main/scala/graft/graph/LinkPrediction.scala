package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction over an undirected pair relation —
  * the "related items / likely co-purchase" primitive the reference serves
  * from its association graph (cf. reference `views/occurrences.py`-style
  * neighborhood queries), generalized to scored candidate edges.
  */
object LinkPrediction {

  /** Adamic–Adar scores for NON-adjacent vertex pairs: for each pair (u, v)
    * with at least one common neighbor w, score = Σ_w 1/ln(deg(w)) — rare
    * shared neighbors count for more than hubs.
    *
    * Scale shape: candidate pairs are enumerated by the wedge self-join of
    * the neighbor relation on the SHARED vertex `w` (hash equi-join, one
    * shuffle on w), so the work is Σ_w deg(w)² — quadratic in HUB degree,
    * not corpus size. `maxDeg` drops hubs from the wedge enumeration, which
    * bounds enumeration at maxDeg·|E| wedges; that is also statistically
    * principled for Adamic–Adar (a 10⁶-degree hub contributes 1/ln(10⁶) ≈
    * 0.07 per pair — noise — while costing 10¹² wedges). The per-wedge term
    * is integerized (⌊10⁶/ln deg⌋) so the final sum is an order-independent
    * BIGINT — exact under any partitioning and exactly replayable by the
    * SQL oracle. Existing edges are removed by an anti-join on the pair key
    * BEFORE aggregation (smaller of the two orders: wedges of one pair
    * collapse only if kept).
    *
    * @param edges undirected edge relation with columns (a, b), a < b
    * @return (u, v, score_u) — top `topK` by (score desc, u, v)
    */
  def adamicAdar(edges: DataFrame, maxDeg: Int = 64, topK: Int = 100): DataFrame = {
    val pairs = edges.select(col("a"), col("b"))
    val nbrs = pairs.select(col("a").as("u"), col("b").as("w"))
      .unionByName(pairs.select(col("b").as("u"), col("a").as("w")))
    val deg = nbrs.groupBy(col("u").as("node")).agg(count(lit(1)).as("d"))
    // wedge term carried on the capped common neighbor; ln(d) ≥ ln(2) > 0
    val capped = nbrs.join(
        deg.filter(col("d").between(2, maxDeg)), col("w") === col("node"))
      .select(col("u"), col("w"),
        floor(lit(1000000.0) / log(col("d"))).cast("long").as("term_u"))
    val wedges = capped.as("x").join(capped.as("y"),
        col("x.w") === col("y.w") && col("x.u") < col("y.u"))
      .select(col("x.u").as("u"), col("y.u").as("v"), col("x.term_u").as("term_u"))
    wedges.join(pairs,
        wedges("u") === pairs("a") && wedges("v") === pairs("b"), "left_anti")
      .groupBy(col("u"), col("v"))
      .agg(sum(col("term_u")).as("score_u"))
      .orderBy(col("score_u").desc, col("u"), col("v"))
      .limit(topK)
  }
}
