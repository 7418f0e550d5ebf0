package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Association-rule mining over a (container, item) relation — the
  * support/confidence/lift completion of the co-purchase pair count the
  * graph family traverses (q105): the pair COUNT says two items co-occur,
  * lift says whether that co-occurrence beats what their individual
  * popularity already predicts (lift ≈ 1 ⇒ the pair is noise however
  * large its count).
  *
  * Scale shape: the q105 discipline — the pair self-join shuffles on the
  * container key with per-container fan-out bounded by basket size, so
  * pairs grow linearly in containers; item supports are one distinct-agg
  * over the same projection; the basket total is a 1-row broadcast attach;
  * metric attachment is two narrow item-keyed hash joins onto the
  * (already minSupport-bounded) pair relation.
  *
  * Integer contract: conf_u = cnt·10⁶ div s_a; lift_u composes the already-
  * truncated confidence, (cnt·10⁶ div s_a)·N div s_b, so no term ever
  * forms N² (BIGINT-safe to ~10¹² baskets); both truncations replay
  * exactly in the oracle.
  */
object Association {

  /** @param items (container, item) relation — duplicates tolerated
    *        (internally distinct'd)
    * @param minSupport minimum co-occurrence count for a pair to surface
    * @param maxBasket when set, containers holding MORE than this many
    *        distinct items are excluded BEFORE the pair self-join — the
    *        hub cap of `LinkPrediction.adamicAdar`, applied to baskets.
    *        Pair fan-out is quadratic in basket size, so one pathological
    *        container (a crawl session or user history with 10⁶ "items")
    *        turns the self-join into 10¹² rows; order-shaped baskets
    *        (lineitem ≤ 7) never hit a sane cap. When set, the output
    *        additionally carries `n_dropped_containers` (a 1-row broadcast
    *        attach) so the exclusion is audited, not silent — INCLUDING
    *        the degenerate case where no pair reaches minSupport (the
    *        audit then surfaces as one row with null pair columns rather
    *        than vanishing with the empty pair relation); item supports
    *        and the basket total N are computed over the KEPT containers,
    *        keeping every metric internally consistent
    * @return (a, b, n_both, s_a, s_b, conf_ab_u, conf_ba_u, lift_u)
    *         [, n_dropped_containers], a < b
    */
  def basketLift(items: DataFrame, container: Column, item: Column,
      minSupport: Long = 3, maxBasket: Option[Long] = None): DataFrame = {
    val li0 = items.select(container.as("ok"), item.as("p")).distinct()
    // container-cardinality-bounded size relation, shared by the keep
    // filter and the dropped-count audit
    lazy val sizes = li0.groupBy(col("ok")).agg(count(lit(1)).as("bsz"))
    val li = maxBasket match {
      case Some(cap) => li0.join(
        sizes.filter(col("bsz") <= cap).select(col("ok")), Seq("ok"), "leftsemi")
      case None => li0
    }
    val sup = li.groupBy(col("p")).agg(count(lit(1)).as("s"))
    val nb = li.agg(countDistinct(col("ok")).as("n"))
    val pairs = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
      .groupBy(col("x.p").as("a"), col("y.p").as("b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
    val out = pairs
      .join(sup.select(col("p").as("a"), col("s").as("s_a")), Seq("a"))
      .join(sup.select(col("p").as("b"), col("s").as("s_b")), Seq("b"))
      .crossJoin(broadcast(nb))
      .select(col("a"), col("b"), col("n_both"), col("s_a"), col("s_b"),
        expr("n_both * 1000000 div s_a").as("conf_ab_u"),
        expr("n_both * 1000000 div s_b").as("conf_ba_u"),
        expr("(n_both * 1000000 div s_a) * n div s_b").as("lift_u"))
    maxBasket match {
      case Some(cap) =>
        val audit = sizes.filter(col("bsz") > cap)
          .agg(count(lit(1)).as("n_dropped_containers"))
        val rows = out.crossJoin(broadcast(audit))
        // Degenerate-case guarantee ("audited, not silent" even when the
        // cap did ALL the work): if every pair fell below minSupport — or
        // every basket was dropped — the pair relation is empty, and a
        // bare crossJoin would make the dropped-container count vanish
        // exactly when it matters most. So the audit scalar additionally
        // rides out as ONE null-pair row whenever the pair relation is
        // empty: an anti-join of the 1-row audit against a first-row probe
        // of the pairs (limit(1) short-circuits, no second derivation),
        // union'd by name with null-filled pair columns.
        val lone = audit.join(
          out.select(lit(1).as("g")).limit(1), lit(true), "left_anti")
        rows.unionByName(lone, allowMissingColumns = true)
      case None => out
    }
  }
}
