package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair and robust anomaly primitives over the events table —
  * the gap-fill / outlier-screen steps a metrics or sensor pipeline runs
  * before any downstream model sees the series.
  *
  * Scale shape: both operators are per-key window passes over BUCKETED
  * aggregates, never over raw events. The grid cardinality is
  * (time-range / bucket) × |keys| — a function of wall-clock coverage, not
  * corpus size, so the gap-fill's generated grid stays dimension-sized at
  * 100 TB while the raw-event reduction underneath is a partial-agg
  * (map-side combine) groupBy.
  */
object TimeSeries {

  /** 5-minute-bucket mean series per event_type with LINEAR INTERPOLATION
    * over empty buckets — the resample+fill step (complement of q89's
    * forward-fill: interpolation needs BOTH neighbors, so head/tail gaps
    * stay null and are tagged 'edge').
    *
    * The bucket mean is rounded to 4 places BEFORE interpolating so the
    * arithmetic downstream of the double sum is reproducible across engines
    * (same convention as q94's z-score); the interpolated value is floored
    * to micro-units (exact small rationals can land on round-half
    * boundaries, see Queries' parity notes).
    *
    * @param bucketSec grid step in seconds
    * @return (event_type, bucket, v_u, src) — bucket = epoch-seconds grid
    *         point, v_u = floor(value·1e6) nullable, src ∈ obs|interp|edge
    */
  def interpolate(events: DataFrame, bucketSec: Int = 300): DataFrame = {
    val obs = events
      .groupBy(col("event_type"),
        (floor(col("ts").cast("double") / bucketSec).cast("long") * bucketSec)
          .as("bucket"))
      .agg(round(avg(col("value")), 4).as("v"))
    // dense grid: one sequence per key — range/bucketSec elements, bounded
    // by wall-clock coverage (the min/max agg reuses obs's exchange)
    val grid = obs.groupBy(col("event_type"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), lit(bucketSec.toLong)))
          .as("bucket"))
    val series = grid.join(obs, Seq("event_type", "bucket"), "left")
    // both neighbor lookups use GROWING frames ([unboundedPreceding, -1]
    // under asc/desc order): Spark evaluates growing frames incrementally
    // (O(n) per key) but recomputes [x, unboundedFollowing] frames from
    // scratch per row (O(n²) — measured 20 s vs 0.5 s on a 43k-row grid)
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNextRev = Window.partitionBy(col("event_type")).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withNbr = series
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pb", last(when(col("v").isNotNull, col("bucket")),
        ignoreNulls = true).over(wPrev))
      .withColumn("nv", last(col("v"), ignoreNulls = true).over(wNextRev))
      .withColumn("nb", last(when(col("v").isNotNull, col("bucket")),
        ignoreNulls = true).over(wNextRev))
    val interp = col("pv") + (col("nv") - col("pv")) *
      (col("bucket") - col("pb")).cast("double") /
      (col("nb") - col("pb")).cast("double")
    withNbr.select(col("event_type"), col("bucket"),
      floor(coalesce(col("v"), interp) * 1000000).cast("long").as("v_u"),
      when(col("v").isNotNull, "obs")
        .when(col("pv").isNotNull && col("nv").isNotNull, "interp")
        .otherwise("edge").as("src"))
  }

  /** Robust per-key outlier screen: flag events whose |value − median| >
    * `cut` × MAD (median absolute deviation) — the heavy-tail-safe
    * alternative to q94's z-score (one wild value shifts a mean/stddev but
    * not a median/MAD, so contaminated series don't mask their own
    * outliers).
    *
    * Exact medians here (two `percentile` passes) because the key space is
    * tiny and the oracle replays them bit-for-bit; at corpus scale the
    * drop-in is `approx_percentile` (t-digest sketch, mergeable, bounded
    * memory) on the same plan shape. Both passes are partial-aggregating;
    * events join the 5-row stats table by broadcast.
    *
    * @return (event_id, event_type, value, dev_u) for flagged rows;
    *         dev_u = floor(|v − med| / mad · 1e6)
    */
  def madOutliers(events: DataFrame, cut: Double = 3.5): DataFrame = {
    val med = events.groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val mad = events.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(percentile(abs(col("value") - col("med")), lit(0.5)).as("mad"))
    val stats = broadcast(med.join(mad, Seq("event_type")).filter(col("mad") > 0))
    events.join(stats, Seq("event_type"))
      .filter(abs(col("value") - col("med")) > lit(cut) * col("mad"))
      .select(col("event_id"), col("event_type"),
        round(col("value"), 4).as("value"),
        floor(abs(col("value") - col("med")) / col("mad") * 1000000)
          .cast("long").as("dev_u"))
  }

  /** RFM (recency / frequency / monetary) segmentation — the classic
    * customer-value partition, emitted as the ≤ 125-row (r, f, m) cell
    * rollup with behavioral segment labels rather than a per-user table
    * (the per-user scores are an intermediate; the cell relation is what a
    * campaign targets and what fits in a report).
    *
    * Quintile scores WITHOUT a global sort: each dimension's cuts come from
    * a value-domain histogram + running count (the robustOutliers/q139
    * discipline). Recency days and per-user event counts have naturally
    * bounded domains; monetary is coarse-binned to `mBinCents` before the
    * histogram so its domain is (range/bin)-bounded too — the score is
    * exact at bin granularity, the documented trade for never sorting a
    * per-user relation. Cut rows are three 1-row broadcast attaches.
    *
    * Integer contract: recency = µs-epoch day diff (integer div);
    * monetary = round(sum·100) cents (the q117 double-sum convention —
    * rounding absorbs FP association drift); scores 1–5 by boundary
    * comparisons; cut k = ⌈q·n/100⌉ via (q·n + 99) div 100. Monetary
    * totals are assumed non-negative (a charge stream) — a refund-heavy
    * stream with negative user totals would need floor-div binning (Spark
    * `div` truncates toward zero, DuckDB `//` floors).
    *
    * @return (r_score, f_score, m_score, segment, n_users, mean_m_cents)
    */
  def rfmSegments(events: DataFrame, mBinCents: Long = 1000): DataFrame =
    rfmScores(events, mBinCents)
      .groupBy(col("r_score"), col("f_score"), col("m_score"), col("segment"))
      .agg(count(lit(1)).as("n_users"),
        expr("sum(m_cents) div count(1)").as("mean_m_cents"))

  /** Per-user scored relation behind [[rfmSegments]] — also the input of
    * [[rfmTransitions]]' two-window migration join.
    * @return (user_id, m_cents, r_score, f_score, m_score, segment) */
  def rfmScores(events: DataFrame, mBinCents: Long = 1000): DataFrame =
    scoreFromPerUser(
      events.groupBy(col("user_id"))
        .agg(max(unix_micros(col("ts"))).as("last_us"),
          count(lit(1)).as("f"),
          expr("CAST(round(sum(value) * 100, 0) AS BIGINT)").as("m_cents")),
      mBinCents)

  /** Scoring stage shared by [[rfmScores]] and [[rfmTransitions]]: takes
    * the PER-USER aggregate relation (user_id, last_us, f, m_cents) and
    * attaches quintile scores + segment labels. The recency anchor is
    * max(last_us) over the input — identical to the population's max event
    * timestamp, so callers can hand in any pre-aggregated population
    * (e.g. one half of a split stream) without touching raw events. */
  private[ops] def scoreFromPerUser(per0: DataFrame,
      mBinCents: Long): DataFrame = {
    val anchor = per0.agg(max(col("last_us")).as("anchor_us"))
    val per = org.apache.spark.sql.graft.FreshCheckpoint(
      per0
        .crossJoin(broadcast(anchor))
        .select(col("user_id"),
          expr("(anchor_us - last_us) div 86400000000").as("r"),
          col("f"), col("m_cents"),
          expr(s"m_cents div $mBinCents").as("m_bin")))
    /** 1-row (p*_20..p*_80) quintile-cut relation for dimension `c` —
      * the shared value-domain-histogram quantile engine, grouped on a
      * constant key (the cuts are population-global). */
    def cutRow(c: String, p: String): DataFrame =
      Quantiles.lowQuantiles(
          per.select(lit(0).as("grp"), col(c).as("v")),
          Seq(20, 40, 60, 80).map(q => q -> s"$p$q"))
        .drop("grp", "n")
    def above(v: String, p: String): Column =
      Seq("20", "40", "60", "80")
        .map(q => when(col(v) > col(s"$p$q"), 1L).otherwise(0L))
        .reduce(_ + _)
    val scored = per
      .crossJoin(broadcast(cutRow("r", "rc")))
      .crossJoin(broadcast(cutRow("f", "fc")))
      .crossJoin(broadcast(cutRow("m_bin", "mc")))
      .select(col("user_id"), col("m_cents"),
        (lit(5L) - above("r", "rc")).as("r_score"),
        (lit(1L) + above("f", "fc")).as("f_score"),
        (lit(1L) + above("m_bin", "mc")).as("m_score"))
    scored
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4,
          "champion")
          .when(col("r_score") >= 4 && col("f_score") <= 2, "new")
          .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "dormant")
          .otherwise("core"))
  }

  /** CUSUM rate-shift monitor per event type (Page 1954) — the
    * change-point detector that catches a sustained small drift EWMA's
    * single-pole smoothing and the z-score's pointwise test both miss
    * (each bucket adds its excess over slack; only a RUN of high buckets
    * accumulates past h).
    *
    * The max(0, ·) reset recursion is NOT expressible as a window sum —
    * but its closed form is: sᵢ = Pᵢ − min(0, min_{j≤i} Pⱼ) where P is
    * the plain prefix sum of dᵢ = xᵢ·10⁶ − μ_u − k_u. Two stacked windows
    * per type (prefix sum, running min) over the DENSE bucket grid — the
    * [[interpolate]] grid discipline: cardinality is wall-clock/bucket ×
    * |types|, not corpus size, and empty buckets count as zero rate (a
    * traffic STOP is also a shift).
    *
    * Integer contract: x counts; μ_u = total·10⁶ div buckets; slack
    * k_u = μ_u div kDen; threshold h_u = hMul·μ_u. Sums are signed but
    * never divided.
    *
    * @return one row per event_type: (event_type, n_buckets, mu_u,
    *         max_s_u, n_alarms, first_alarm_bucket — null when clean)
    */
  def cusum(events: DataFrame, bucketSec: Int = 300, kDen: Long = 4,
      hMul: Long = 4): DataFrame = {
    val obs = events.groupBy(col("event_type"),
        (floor(col("ts").cast("double") / bucketSec).cast("long") * bucketSec)
          .as("bucket"))
      .agg(count(lit(1)).as("x"))
    val grid = obs.groupBy(col("event_type"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("event_type"),
        explode(expr(s"sequence(lo, hi, $bucketSec)")).as("bucket"))
    val dense = grid.join(obs, Seq("event_type", "bucket"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    val mu = dense.groupBy(col("event_type"))
      .agg(expr("sum(x) * 1000000 div count(1)").as("mu_u"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val s = dense.join(broadcast(mu), Seq("event_type"))
      .withColumn("d_u",
        col("x") * 1000000L - col("mu_u") - expr(s"mu_u div $kDen"))
      .withColumn("p", sum(col("d_u")).over(w))
      .withColumn("s_u", col("p") - least(min(col("p")).over(w), lit(0L)))
    s.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_buckets"), max(col("mu_u")).as("mu_u"),
        max(col("s_u")).as("max_s_u"),
        sum(when(col("s_u") > lit(hMul) * col("mu_u"), 1L).otherwise(0L))
          .as("n_alarms"),
        min(when(col("s_u") > lit(hMul) * col("mu_u"), col("bucket")))
          .as("first_alarm_bucket"))
  }

  /** Pinned-target CUSUM — the per-bucket relation of [[cusum]] with the
    * baseline rate `muU` supplied instead of estimated from the window.
    * This is the form a STREAMING monitor can maintain (a stream cannot
    * know its window mean), and the batch twin / oracle surface of
    * [[graft.streaming.CusumStream.rateMonitorStream]]: identical dense
    * grid, identical integer prefix-sum + running-min closed form, so the
    * stream's per-bucket state replays row-for-row.
    *
    * @param muU baseline rate in events·10⁻⁶ per bucket
    * @return one row per dense-grid bucket: (event_type, bucket, x, s_u,
    *         alarm) — alarm ⇔ s_u > hMul·muU
    */
  def cusumPinned(events: DataFrame, muU: Long = 10000L,
      bucketSec: Int = 300, kDen: Long = 4, hMul: Long = 4): DataFrame = {
    val obs = events.groupBy(col("event_type"),
        (floor(col("ts").cast("double") / bucketSec).cast("long") * bucketSec)
          .as("bucket"))
      .agg(count(lit(1)).as("x"))
    val grid = obs.groupBy(col("event_type"))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(col("event_type"),
        explode(expr(s"sequence(lo, hi, $bucketSec)")).as("bucket"))
    val dense = grid.join(obs, Seq("event_type", "bucket"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    dense
      .withColumn("p", sum(col("x") * 1000000L - lit(muU + muU / kDen)).over(w))
      .withColumn("s_u", col("p") - least(min(col("p")).over(w), lit(0L)))
      .select(col("event_type"), col("bucket"), col("x"), col("s_u"),
        (col("s_u") > lit(hMul * muU)).as("alarm"))
  }

  /** RFM segment-TRANSITION (migration) matrix — the change report behind
    * the snapshot [[rfmSegments]] gives: split the stream at its time-range
    * midpoint, score each half independently ([[rfmScores]], each half's
    * recency anchored to its OWN end so the two windows are comparable),
    * and count users per (segment_from, segment_to) cell. The monetary
    * movement rides as a SUM (not a mean — deltas are signed and the
    * engines disagree on negative integer division).
    *
    * Scale shape: one 1-row midpoint attach, then ONE events scan computing
    * BOTH halves' per-user aggregates (grouped by (user, half) — the r10
    * single-pass fix; the r9 version ran a half-filtered scan per side),
    * checkpointed once and cut by the shared [[scoreFromPerUser]] stage
    * (bounded-domain cut windows, no raw-event re-read), one user-keyed
    * inner join of the two |users|-row score relations, a ≤ 25-row
    * rollup. Users active in only one half drop out (they have no
    * transition; churn/arrival counts are rfmSegments diffs).
    *
    * @return (segment_from, segment_to, n_users, sum_m_delta_cents)
    */
  def rfmTransitions(events: DataFrame, mBinCents: Long = 1000): DataFrame = {
    val mid = events.agg(
      expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").as("m_us"))
    val perBoth = org.apache.spark.sql.graft.FreshCheckpoint(
      events.crossJoin(broadcast(mid))
        .groupBy(col("user_id"),
          (unix_micros(col("ts")) >= col("m_us")).as("late"))
        .agg(max(unix_micros(col("ts"))).as("last_us"),
          count(lit(1)).as("f"),
          expr("CAST(round(sum(value) * 100, 0) AS BIGINT)").as("m_cents")))
    def half(early: Boolean): DataFrame = scoreFromPerUser(
      perBoth.filter(col("late") === !early).drop("late"), mBinCents)
    half(early = true)
      .select(col("user_id"), col("segment").as("segment_from"),
        col("m_cents").as("m_from"))
      .join(half(early = false)
        .select(col("user_id"), col("segment").as("segment_to"),
          col("m_cents").as("m_to")), Seq("user_id"))
      .groupBy(col("segment_from"), col("segment_to"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("m_to") - col("m_from")).as("sum_m_delta_cents"))
  }
}
