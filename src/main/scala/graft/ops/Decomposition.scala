package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spectral decomposition primitives over the embedding table — the
  * whitening / drift-diagnostic step between raw embeddings and an index
  * build (dominant-direction removal is the standard post-processing for
  * anisotropic embedding spaces).
  *
  * Scale shape: the corpus-sized work is ONE pass — scatter-matrix
  * accumulation is a (dim², long-sum) partial aggregate (map-side combine;
  * 4096 cells for dim=64), and everything after runs on the dim×dim
  * matrix, which is O(1) in the corpus. The power iteration is the
  * fixed-round, stage-replayable discipline of q52: deterministic seed,
  * per-round 9-decimal normalization, so the DuckDB oracle replays every
  * stage.
  *
  * Integer-exactness envelope: coordinates are micro-unit ints (centered
  * |c| ≲ 2²²), so per-pair products reach ~2⁴⁴ and the worst-case BIGINT
  * scatter sum stays provably exact only up to 2⁶³⁻⁴⁴ = 2¹⁹ (~5×10⁵)
  * vectors per cell — and Spark's non-ANSI Long sum would wrap SILENTLY
  * while DuckDB widens to HUGEINT, so past the envelope the engines
  * diverge rather than both saturating. The scatter aggregate therefore
  * carries a count-based runtime guard (raise_error once any cell exceeds
  * 2¹⁹ rows) — no extra pass, the count rides the same partial aggregate.
  * For larger corpora, pre-scale the coordinates (drop the micro-unit
  * multiplier from 10⁶ to 10⁴ to buy 2¹³ more rows of headroom at 100×
  * coarser loadings); the plan shape is unchanged.
  */
object Decomposition {

  /** Top principal component of the embedding cloud by `rounds` power
    * iterations on the exact integer scatter matrix S = Σ (x−μ)(x−μ)ᵀ.
    *
    * @return (d, loading_u) — dim rows, loading_u = floor(v_d · 1e6) of the
    *         unit-norm dominant eigenvector (seed = uniform 0.125, so the
    *         sign convention is the seed's)
    */
  def pcaTopComponent(embeddings: DataFrame, rounds: Int = 8): DataFrame = {
    val coords = Dedup.fanOut(embeddings).select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("d", "v")))
      .select(col("vec_id"), col("d").cast("long").as("d"),
        floor(col("v").cast("double") * 1000000d).cast("long").as("x"))
    // floor-division via doubles (exact: |Σx| ≤ n·2²¹ ≪ 2⁵³), NOT integer
    // `div` — coordinate sums can be NEGATIVE and Spark's div truncates
    // toward zero while DuckDB's // floors
    val mu = coords.groupBy(col("d"))
      .agg(floor(sum(col("x")).cast("double") / count(lit(1))).cast("long").as("mu"))
    val centered = coords.join(broadcast(mu), Seq("d"))
      .select(col("vec_id"), col("d"), (col("x") - col("mu")).as("c"))
    // scatter matrix: one self-join on the vector key (64×64 products per
    // vector), partial-agg combined down to dim² cells
    // MATERIALIZE the scatter once and every round's vector: the rounds
    // form a recurrence, and without checkpoints round r's plan embeds the
    // corpus-sized scatter subtree ~2^r times (measured: 296 s at sf0.1 for
    // an op whose data-plane work is seconds) — the q52 "every stage
    // materialized" discipline
    val scatter = org.apache.spark.sql.graft.FreshCheckpoint(
      centered.select(col("vec_id"), col("d").as("i"), col("c").as("ci"))
        .join(centered.select(col("vec_id"), col("d").as("j"), col("c").as("cj")),
          Seq("vec_id"))
        .groupBy(col("i"), col("j"))
        .agg(sum(col("ci") * col("cj")).as("s"), count(lit(1)).as("cnt"))
        // exactness guard (see header): |ci·cj| ≲ 2⁴⁴, so a cell past 2¹⁹
        // rows can silently wrap the non-ANSI Long sum while DuckDB widens
        // — fail loudly instead of diverging; the count rides the same
        // partial aggregate, no extra pass
        .select(col("i"), col("j"),
          when(col("cnt") > (1L << 19), raise_error(concat(
            lit("pcaTopComponent: scatter cell exceeds the 2^19-row exact-"),
            lit("BIGINT envelope; pre-scale coordinates (see scaladoc)"))))
            .otherwise(col("s")).as("s")))
    // power iteration on the O(1) matrix: v ← round₉(S·v / ‖S·v‖)
    var v = mu.select(col("d"), lit(0.125d).as("v"))
    for (_ <- 1 to rounds) {
      val prod = scatter
        .join(v.select(col("d").as("j"), col("v")), Seq("j"))
        .groupBy(col("i"))
        .agg(sum(col("s").cast("double") * col("v")).as("sv"))
      val nrm = prod.agg(sqrt(sum(col("sv") * col("sv"))).as("nrm"))
      v = org.apache.spark.sql.graft.FreshCheckpoint(
        prod.crossJoin(broadcast(nrm))
          .select(col("i").as("d"), round(col("sv") / col("nrm"), 9).as("v")))
    }
    v.select(col("d"), floor(col("v") * 1000000d).cast("long").as("loading_u"))
  }

  /** Population-stability index between two corpus slices — the
    * distribution-drift alarm a serving pipeline runs against its training
    * snapshot. Ten fixed-width bins over the REFERENCE slice's [min, max]
    * (integer bin arithmetic — engine-exact), add-one smoothing, one
    * (p−q)·ln(p/q) term per bin.
    *
    * @param valueCol integer-valued column to compare
    * @param refFilter rows forming the reference distribution; the rest are
    *        the comparison slice
    * @return (bin, n_ref, n_cmp, term_u) — PSI = Σ term_u / 1e9
    */
  def psiDrift(df: DataFrame, valueCol: String,
      refFilter: org.apache.spark.sql.Column, bins: Int = 10): DataFrame = {
    val tagged = df.select(col(valueCol).cast("long").as("v"),
      when(refFilter, lit("ref")).otherwise(lit("cmp")).as("side"))
    val rng = tagged.filter(col("side") === "ref")
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    val binned = tagged.crossJoin(broadcast(rng))
      .select(col("side"),
        least(lit(bins - 1), greatest(lit(0),
          expr(s"((v - mn) * $bins) div (mx - mn + 1)"))).as("bin"))
      .groupBy(col("bin"))
      .agg(sum(when(col("side") === "ref", 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("side") === "cmp", 1L).otherwise(0L)).as("n_cmp"))
    val tot = binned.agg(sum(col("n_ref")).as("tr"), sum(col("n_cmp")).as("tc"))
    binned.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cmp"),
        floor(((col("n_ref") + 1).cast("double") / (col("tr") + bins).cast("double")
          - (col("n_cmp") + 1).cast("double") / (col("tc") + bins).cast("double"))
          * (log((col("n_ref") + 1).cast("double") / (col("tr") + bins).cast("double"))
            - log((col("n_cmp") + 1).cast("double") / (col("tc") + bins).cast("double")))
          * 1000000000d).cast("long").as("term_u"))
  }

  /** Johnson–Lindenstrauss ±1 random-projection distortion audit: project
    * every embedding to `k` dimensions through a deterministic md5-derived
    * sign matrix (Achlioptas'01 — a ±1 matrix satisfies JL with the same
    * guarantees as Gaussian), then measure how well pairwise squared
    * distances survive on a linear deterministic pair sample (vector i vs
    * i + `pairStep`, the [[Quantize.matryoshkaFidelity]] sampling shape).
    * E[‖P(a−b)‖²] = k·‖a−b‖², so ratio_u ≈ 10⁶ when the projection is
    * faithful; the banded histogram is the go/no-go artifact for serving
    * ANN from the compressed space.
    *
    * ENTIRELY integer arithmetic: micro-unit coords, ±1 signs, BIGINT
    * squared sums (|proj| ≤ dim·2²⁰ → squares < 2⁵⁶, sums < 2⁶⁰), and the
    * ratio computed with a div-first rescale so nothing overflows — both
    * engines agree bit-for-bit with no floating point anywhere. Pairs
    * closer than 10⁻³ L2 (d2_orig < 10⁶ µ²) are excluded: their ratio is
    * noise-dominated and the rescale would divide by zero.
    *
    * Scale shape: the projection is one equi-join of exploded coords
    * against a broadcast k·dim sign literal + a (vec, j) partial agg —
    * linear; pair stages are equi-joins on the shifted key.
    *
    * @return (band, n_pairs, min_ratio_u, max_ratio_u) — band =
    *         ratio_u div 100000 (0.1-wide ratio buckets)
    */
  def jlProjectionAudit(embeddings: DataFrame, k: Int = 16, dim: Int = 64,
      pairStep: Int = 7): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val signs = (0 until k).flatMap(j => (0 until dim).map(d =>
        (j.toLong, d.toLong,
          if (Similarity.planeComponent(j, d) >= 0) 1L else -1L)))
      .toDF("j", "d", "sgn")
    val coords = Quantize.coords(Dedup.fanOut(embeddings))
    val proj = coords.join(broadcast(signs), Seq("d"))
      .groupBy(col("vec_id"), col("j"))
      .agg(sum(col("sgn") * col("x")).as("p"))
    val d2proj = proj.select(col("vec_id"), col("j"), col("p").as("pa"))
      .join(proj.select((col("vec_id") - pairStep).as("vec_id"), col("j"),
        col("p").as("pb")), Seq("vec_id", "j"))
      .groupBy(col("vec_id"))
      .agg(sum((col("pa") - col("pb")) * (col("pa") - col("pb"))).as("d2_proj"))
    val d2orig = coords.select(col("vec_id"), col("d"), col("x").as("xa"))
      .join(coords.select((col("vec_id") - pairStep).as("vec_id"), col("d"),
        col("x").as("xb")), Seq("vec_id", "d"))
      .groupBy(col("vec_id"))
      .agg(sum((col("xa") - col("xb")) * (col("xa") - col("xb"))).as("d2_orig"))
    d2proj.join(d2orig, Seq("vec_id"))
      .filter(col("d2_orig") >= 1000000L)
      .withColumn("ratio_u",
        expr(s"d2_proj div greatest(1, ($k * d2_orig) div 1000000)"))
      .groupBy(expr("ratio_u div 100000").as("band"))
      .agg(count(lit(1)).as("n_pairs"), min(col("ratio_u")).as("min_ratio_u"),
        max(col("ratio_u")).as("max_ratio_u"))
  }

  /** Embedding-space isotropy audit per label — the "is this space usable
    * for cosine retrieval" gauge (Ethayarajh 2019's finding, reduced to its
    * first moment): isotropy ≈ ‖μ‖²/E‖x‖². Near 0 the cloud is centered
    * (directions carry signal); near 10⁶ µ every vector points the same way
    * and cosine similarity saturates — the symptom the mean-centering in
    * [[Similarity.hyperplaneCells]] exists to fix. Also reports the mean
    * norm in milli-µ² so collapsing or exploding norms (a training bug
    * upstream of the index) surface in the same relation.
    *
    * Integer contract: µ-unit coordinates; per-dim mean floor'd (exact:
    * |Σx| ≤ n·2²¹ ≪ 2⁵³, the pcaTopComponent note); per-ROW squared norms
    * pre-scaled to µ²/10⁶ units BEFORE the corpus sum so the running total
    * stays exact to ~10¹¹ rows (a raw µ² sum would leave the exact-BIGINT
    * envelope at ~10⁵ rows).
    *
    * Scale shape: one explode pass → (label, d) means (dim·|labels| rows)
    * → one dim-bounded rollup per label; one per-row norm projection →
    * (label) rollup. Nothing joins corpus-sized relations.
    *
    * @return one row per label: (label, n_vectors, m2_u2, mean_norm2_m,
    *         iso_u)
    */
  def isotropyAudit(embeddings: DataFrame): DataFrame = {
    val iv = Dedup.fanOut(embeddings).select(col("label"),
      transform(col("embedding"),
        v => floor(v.cast("double") * 1000000d).cast("long")).as("iemb"))
    val mu = iv.select(col("label"), posexplode(col("iemb")).as(Seq("d", "x")))
      .groupBy(col("label"), col("d"))
      .agg(floor(sum(col("x")).cast("double") / count(lit(1))).cast("long")
        .as("mu"))
    val m2 = mu.groupBy(col("label")).agg(sum(col("mu") * col("mu")).as("m2_u2"))
    val norms = iv.select(col("label"),
        expr("aggregate(iemb, 0L, (acc, x) -> acc + x * x) div 1000000")
          .as("rn_m"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("rn_m")).as("srn"))
    norms.join(m2, Seq("label"))
      .select(col("label"), col("n_vectors"), col("m2_u2"),
        expr("srn div n_vectors").as("mean_norm2_m"),
        expr("m2_u2 div greatest(srn div n_vectors, 1)").as("iso_u"))
  }
}
