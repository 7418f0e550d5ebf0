package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group LOW quantiles off a value-domain histogram — the shared
  * engine of [[QualityAudit.robustOutliers]]' median/MAD (q251) and
  * [[TimeSeries.rfmScores]]' quintile cuts (q256/q258), factored so the
  * engine-portability contract lives in ONE place:
  *
  *  - **ceil-rank**: the p% cut is the least v whose running count reaches
  *    ⌈p·n/100⌉, computed in integers as `cum ≥ (p·n + 99) div 100` — no
  *    floating rank, no interpolation, so Spark and any ANSI replay agree
  *    bit-for-bit.
  *  - **low quantile**: ties and even-n midpoints resolve DOWNWARD to an
  *    ACTUAL population value (p=50 on {1,2,3,4} is 2, not 2.5) — the
  *    choice that keeps every emitted statistic a member of the value
  *    domain and therefore exactly replayable.
  *  - **never a global sort**: the histogram is |domain| rows per group
  *    (document lengths, day counts, coarse money bins — orders of
  *    magnitude below corpus size); the running count windows over THAT,
  *    partitioned by group. At 100 TB the shuffle carries the histogram,
  *    not the rows.
  *
  * (Interpolated continuous quantiles — q121's equi-depth ANALYZE build —
  * are a different contract and stay on stock `percentile`.)
  */
object Quantiles {

  /** @param vals exactly (grp, v): group key + long-valued measure
    * @param cuts (percent, outputName) pairs, percents in 1..100
    * @param totals optional precomputed per-group row counts (grp, n) of
    *        `vals` — pass when the caller already owns them (or when
    *        `vals` is a derived relation whose row counts equal a CHEAPER
    *        relation's, e.g. robustOutliers' deviation pass, which has
    *        exactly one row per input row): skips re-deriving `vals` for
    *        the count. The caller guarantees the counts are exact.
    * @return one row per grp: (grp, n, <outputName>...) where each cut
    *         column holds the group's low p%-quantile of v
    */
  def lowQuantiles(vals: DataFrame, cuts: Seq[(Int, String)],
      totals: Option[DataFrame] = None): DataFrame = {
    require(cuts.nonEmpty && cuts.forall { case (p, _) => p >= 1 && p <= 100 },
      s"cut percents must be in 1..100: $cuts")
    val tot = totals.getOrElse(
      vals.groupBy(col("grp")).agg(count(lit(1)).as("n")))
    // no broadcast hint on `tot` (round-11 advisory): it is per-GROUP
    // counts — histogram-bounded for today's callers, but a future
    // high-cardinality group key would broadcast something large; AQE
    // picks the broadcast itself whenever the relation is actually small
    val cum = vals.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(col("grp")).orderBy(col("v"))))
      .join(tot, Seq("grp"))
    val aggs = cuts.map { case (p, name) =>
      min(when(col("cum") >= expr(s"($p * n + 99) div 100"), col("v"))).as(name)
    }
    cum.groupBy(col("grp"))
      .agg(max(col("n")).as("n"), aggs: _*)
  }
}
