package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-evidence record linkage (Fellegi–Sunter flavored): candidate pairs
  * from a similarity-join prefix filter, then a weighted field-agreement
  * score and a three-band match decision — the entity-resolution step
  * between "single-field similarity join" (q36/q102) and "these two records
  * ARE the same thing". The single-field joins find lexical twins; linkage
  * FUSES several weak evidences (name distance, categorical agreements,
  * numeric proximity) into one calibrated decision, which is what an actual
  * catalog-dedup / customer-360 pipeline ships.
  *
  * Scale shape: candidates come from [[Dedup.editDistanceCandidates]]'s
  * Pass-Join segment equi-join — never a per-block cross product — and
  * every evidence after that is a per-candidate-pair projection plus two
  * hash equi-joins to attach the attribute tuples. Weights are integer
  * micro-units; the decision is a pure integer compare, tie-free across
  * engines.
  */
object RecordLinkage {

  /** Link near-identical parts by name distance + attribute agreement.
    *
    * Evidence weights (micro-units, log-odds flavored — agreement on a
    * 25-value attribute is worth more than on a coarse one):
    * name edit distance d → 500000 − 150000·d; brand (25 values) +200000;
    * |size diff| ≤ 1 +100000; |retail price diff| ≤ $1 (integer cents)
    * +50000. Bands: ≥ 700000 match, ≥ 400000 possible, below → dropped
    * (the FS reject region).
    *
    * Default `maxDist = 1`: candidate volume (and the verify bill) grows
    * steeply with the radius — probe windows widen with d and segments
    * shrink, for pairs whose extra name distance the score then mostly
    * rejects anyway (a d=2 name-only pair scores 200k, deep in the reject
    * region). Callers wanting a wider radius pass it explicitly.
    *
    * @return (pa, pb, dist, score_u, band), pa < pb
    */
  def linkParts(part: DataFrame, maxDist: Int = 1): DataFrame = {
    val attrs = part.select(col("p_partkey").as("pk"), col("p_brand").as("brand"),
      col("p_size").cast("long").as("psize"),
      floor(col("p_retailprice").cast("double") * 100d).cast("long").as("cents"))
    // block on the COARSE attribute (p_type, a handful of values) so the
    // finer ones (brand/size/price) stay genuine evidence inside a block;
    // the rarity-prefix filter, not the block, bounds candidates
    val cand = Dedup.editDistanceCandidates(
      part, "p_partkey", "p_name", Seq("p_type"), maxDist)
      .withColumn("dist", levenshtein(col("sa"), col("sb"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("pa"), col("pb"), col("dist"))
    val a = attrs.toDF("pa", "brand_a", "size_a", "cents_a")
    val b = attrs.toDF("pb", "brand_b", "size_b", "cents_b")
    val scored = cand.join(a, Seq("pa")).join(b, Seq("pb"))
      .withColumn("score_u",
        (lit(500000L) - col("dist") * 150000L) +
          when(col("brand_a") === col("brand_b"), 200000L).otherwise(0L) +
          when(abs(col("size_a") - col("size_b")) <= 1, 100000L).otherwise(0L) +
          when(abs(col("cents_a") - col("cents_b")) <= 100, 50000L).otherwise(0L))
      .withColumn("band",
        when(col("score_u") >= 700000L, lit("match"))
          .when(col("score_u") >= 400000L, lit("possible")))
      .filter(col("band").isNotNull)
    scored.select(col("pa"), col("pb"), col("dist"), col("score_u"), col("band"))
  }

  /** Canonical entity resolution — the last step of the customer-360 story
    * [[linkParts]] starts: `match`-band pairs close transitively via the
    * distributed connected-components operator (transitivity is the point:
    * A≈B and B≈C put A and C in one entity even when the A–C evidence alone
    * is sub-threshold), and each entity elects its canonical record as the
    * min partkey (total, engine-exact). `possible`-band pairs are
    * deliberately NOT closed over — a review queue must not merge entities.
    *
    * Scale shape: match pairs ≪ records (the FS accept region), so CC is
    * the O(log n) large/small-star loop on a small pair graph; the member
    * rollup is one count per canonical id.
    *
    * @return one row per record: (p_partkey, canonical_id, n_members,
    *         is_canonical)
    */
  def canonicalParts(part: DataFrame, maxDist: Int = 1): DataFrame = {
    val pairs = linkParts(part, maxDist).filter(col("band") === "match")
      .select(col("pa").as("src"), col("pb").as("dst"))
    val cc = graft.graph.Analytics.connectedComponents(
      part.select(col("p_partkey").cast("long").as("id")), pairs)
      .select(col("id").as("p_partkey"), col("component").as("canonical_id"))
    val sizes = cc.groupBy(col("canonical_id"))
      .agg(count(lit(1)).as("n_members"))
    cc.join(sizes, Seq("canonical_id"))
      .select(col("p_partkey"), col("canonical_id"), col("n_members"),
        (col("p_partkey") === col("canonical_id")).as("is_canonical"))
  }
}
