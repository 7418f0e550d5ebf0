package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit (the Deequ/expectations
  * pattern): a rule set over a table compiles to a metrics relation
  * (rule, violations, total, pass) instead of N ad-hoc scan jobs.
  *
  * Execution shape — the part that matters at 100 TB:
  *  - ALL row-level rules (not-null, bounds, set membership, regex) fuse
  *    into ONE aggregate over ONE scan: each rule is a `sum(case)` column,
  *    so auditing 50 rules costs the same scan as auditing one.
  *  - each uniqueness rule is one groupBy on its key projection (narrow
  *    columns only — the payload never shuffles);
  *  - each referential-integrity rule is one anti-join against the
  *    dimension's key projection (hash join; dimension side broadcasts
  *    when small).
  * All metrics are integer counts — exactly reproducible on any engine and
  * partitioning, so the audit relation itself is oracle-checkable.
  */
object QualityAudit {

  sealed trait Rule { def name: String }
  /** `column` is never NULL. */
  case class NotNull(name: String, column: String) extends Rule
  /** `column` within [lo, hi] (NULLs count as violations). */
  case class Bounds(name: String, column: String, lo: Double, hi: Double) extends Rule
  /** `column` drawn from `values` (NULLs count as violations). */
  case class InSet(name: String, column: String, values: Seq[String]) extends Rule
  /** `cols` form a unique key. Violations = rows in excess of one per key. */
  case class Unique(name: String, cols: Seq[String]) extends Rule
  /** every `column` value exists in `dimKey` of `dim`. */
  case class RefIntegrity(name: String, column: String, dim: DataFrame,
      dimKey: String) extends Rule

  private def violates(r: Rule): Column = r match {
    case NotNull(_, c) => col(c).isNull
    case Bounds(_, c, lo, hi) => !col(c).between(lo, hi) || col(c).isNull
    case InSet(_, c, vs) => !col(c).isin(vs: _*) || col(c).isNull
    case _ => lit(false)
  }

  /** Audit `df` against `rules`; returns (rule, violations, total, pass)
    * with one row per rule, in rule order. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val rowRules = rules.collect {
      case r @ (_: NotNull | _: Bounds | _: InSet) => r
    }
    val rowMetrics: Option[DataFrame] = Option.when(rowRules.nonEmpty) {
      // one scan, one partial-agg pass for every row-level rule
      val aggs = count(lit(1)).as("total") +:
        rowRules.map(r => sum(violates(r).cast("long")).as(s"v_${r.name}"))
      val one = df.agg(aggs.head, aggs.tail: _*)
      rowRules.map { r =>
        one.select(lit(r.name).as("rule"), col(s"v_${r.name}").as("violations"),
          col("total"))
      }.reduce(_ unionByName _)
    }
    val uniqueMetrics = rules.collect { case Unique(n, cols) =>
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("cnt"))
        .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("violations"),
          coalesce(sum(col("cnt")), lit(0L)).as("total"))
        .select(lit(n).as("rule"), col("violations"), col("total"))
    }
    val riMetrics = rules.collect { case RefIntegrity(n, c, dim, dk) =>
      val missing = df.select(col(c))
        .join(dim.select(col(dk).as(c)), Seq(c), "left_anti")
        .agg(count(lit(1)).as("violations"))
      val total = df.agg(count(lit(1)).as("total"))
      missing.crossJoin(broadcast(total))
        .select(lit(n).as("rule"), col("violations"), col("total"))
    }
    (rowMetrics.toSeq ++ uniqueMetrics ++ riMetrics)
      .reduce(_ unionByName _)
      .select(col("rule"), col("violations"), col("total"),
        (col("violations") === 0).as("pass"))
  }

  /** Robust (median/MAD) outlier audit per group — the length-filter quality
    * pass that mean/stddev rules get wrong on heavy-tailed corpora (one
    * 10 MB document drags a mean-based cut far enough to pass every other
    * anomaly; the median and the median-absolute-deviation don't move).
    * Flags values with |v − median| > `k`·MAD (k=4 ≈ a 2.7σ cut under
    * normality via the 1.4826 consistency factor, kept INTEGER so both
    * engines agree bit-for-bit).
    *
    * Exact medians, relationally: per-group value HISTOGRAM (the value
    * domain — document lengths — is orders of magnitude smaller than the
    * corpus) → running count over the domain ordered by value, partitioned
    * by group (never a global sort) → low median = min v with
    * cum ≥ ⌈n/2⌉. The MAD repeats the same trick on |v − med|. Group
    * medians/MADs broadcast (|groups| rows) for the flag pass.
    *
    * @return one row per group: (grp, n, med, mad, n_outliers, outlier_share_u)
    */
  def robustOutliers(df: DataFrame, valueCol: Column, groupCol: Column,
      k: Int = 4): DataFrame = {
    // low medians via the shared value-domain-histogram quantile engine
    // ((n+1) div 2 ≡ Quantiles' ceil-rank (50n+99) div 100 for all n).
    // ONE per-group total serves both passes: the deviation relation has
    // exactly one row per input row, so its counts equal v's — recomputing
    // them there would re-derive the dev join (measured ~1.25× at sf0.1)
    val v = df.select(groupCol.as("grp"), valueCol.cast("long").as("v"))
    val tot = v.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    def lowMedian(vals: DataFrame, c: String): DataFrame =
      Quantiles.lowQuantiles(vals.select(col("grp"), col(c).as("v")),
          Seq(50 -> s"${c}_med"), totals = Some(tot))
        .select(col("grp"), col(s"${c}_med"))
    val med = lowMedian(v, "v")
    val dev = v.join(broadcast(med), Seq("grp"))
      .select(col("grp"), col("v"), abs(col("v") - col("v_med")).as("d"))
    val mad = lowMedian(dev, "d")
    dev.join(broadcast(mad), Seq("grp"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("d") > lit(k.toLong) * col("d_med"), 1L).otherwise(0L))
          .as("n_outliers"))
      .join(broadcast(med), Seq("grp")).join(broadcast(mad), Seq("grp"))
      .select(col("grp"), col("n"), col("v_med").as("med"),
        col("d_med").as("mad"), col("n_outliers"),
        expr("n_outliers * 1000000 div n").as("outlier_share_u"))
  }

  /** Per-group exact length-quantile report — the distribution datasheet a
    * corpus release publishes per source (p25/p50/p75/p95 + min/max of a
    * long-valued measure), built on [[Quantiles.lowQuantiles]]' shared
    * value-domain-histogram engine: exact ceil-rank LOW quantiles, never a
    * global sort, shuffles carry the per-group value histogram only.
    *
    * @return one row per group: (grp, n, v_min, v_max, p25, p50, p75, p95)
    */
  def lengthQuantiles(df: DataFrame, valueCol: Column,
      groupCol: Column): DataFrame = {
    val v = df.select(groupCol.as("grp"), valueCol.cast("long").as("v"))
    val ext = v.groupBy(col("grp"))
      .agg(min(col("v")).as("v_min"), max(col("v")).as("v_max"))
    Quantiles.lowQuantiles(v,
        Seq(25 -> "p25", 50 -> "p50", 75 -> "p75", 95 -> "p95"))
      .join(broadcast(ext), Seq("grp"))
      .select(col("grp"), col("n"), col("v_min"), col("v_max"),
        col("p25"), col("p50"), col("p75"), col("p95"))
  }

  /** Benford first-digit audit — the synthetic/fabricated-data forensic:
    * naturally occurring multiplicative quantities follow
    * P(d) = log₁₀(1 + 1/d), while generated or templated numerics cluster
    * uniformly. Per first significant digit of ⌊value⌋ (values < 1
    * excluded — they have no leading integer digit): observed count,
    * µ-share, the Benford expectation (log₁₀ constants pre-floored to µ so
    * no engine evaluates a logarithm), and the absolute deviation. One
    * fused scan → a ≤ 9-row aggregate; the total attaches as a 1-row
    * broadcast scalar.
    *
    * Supported range: 1 ≤ value < 9.2·10¹⁸ — deliberately a hair BELOW
    * 2⁶³ ≈ 9.223·10¹⁸. The cutoff guards the double→long cast, and a
    * double comparison against exactly 2⁶³ would admit values whose
    * double representation rounds up to 2⁶³ itself (doubles near 2⁶³ are
    * 2048 apart), where Spark (non-ANSI) saturates the cast at
    * Long.MaxValue while an ANSI engine raises a cast error. The conservative
    * constant keeps the op engine-portable; the sliver [9.2e18, 2⁶³) it
    * excludes is out of contract (the oracle applies the same constant).
    *
    * @return (digit, n, share_u, benford_u, dev_u), one row per observed digit
    */
  def benford(df: DataFrame, valueCol: Column): DataFrame = {
    val benfordU = Seq(301029L, 176091L, 124938L, 96910L, 79181L,
      66946L, 57991L, 51152L, 45757L)
    val expect = element_at(
      map(benfordU.zipWithIndex.flatMap { case (u, i) =>
        Seq(lit((i + 1).toString), lit(u))
      }: _*), col("digit"))
    val digits = df.select(valueCol.cast("double").as("x"))
      .filter(col("x") >= 1.0 && col("x") < 9.2e18)
      .select(substring(floor(col("x")).cast("long").cast("string"), 1, 1)
        .as("digit"))
    val counts = digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(count(lit(1)).as("tot"))
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("n * 1000000 div tot").as("share_u"), expect.as("benford_u"))
      .withColumn("dev_u", abs(col("share_u") - col("benford_u")))
  }

  /** Kolmogorov–Smirnov drift per group — max CDF gap between each group's
    * value distribution and the REST of the corpus (leave-one-out, so a
    * big group can't hide its own drift by dominating the reference), the
    * exact-statistic sibling of the binned PSI (q184) and token-level JSD
    * (q239) monitors. The KS sup runs over the union breakpoint grid =
    * the global distinct-value domain, built once and fanned to groups by
    * a |groups|-row broadcast; CDFs are running counts over the domain
    * partitioned by group (never a global sort); the sup and its argmax
    * pack into ONE integer key — gap_u·10⁸ + (v − v_min), where v_min is
    * the global minimum (a field of the same 1-row broadcast as n_tot) —
    * so one agg returns both deterministically (ties break to the largest
    * breakpoint). Biasing by v_min keeps the packed low word non-negative
    * for ANY value sign (a raw negative v would both corrupt the max-key
    * ordering and break the `% 10⁸` decode); the remaining requirement is
    * only on the SPAN: max(v) − min(v) < 10⁸.
    *
    * @return one row per group: (grp, n_grp, n_rest, ks_u, ks_at_v)
    */
  def ksDrift(df: DataFrame, valueCol: Column, groupCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.select(groupCol.as("grp"), valueCol.cast("long").as("v"))
    val gh = v.groupBy(col("v")).agg(count(lit(1)).as("gcnt"))
    val grps = v.select(col("grp")).distinct()
    val sh = v.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("scnt"))
    val grid = gh.crossJoin(broadcast(grps))
      .join(sh, Seq("grp", "v"), "left")
      .withColumn("scnt", coalesce(col("scnt"), lit(0L)))
    val w = Window.partitionBy(col("grp")).orderBy(col("v"))
    val cums = grid
      .withColumn("scum", sum(col("scnt")).over(w))
      .withColumn("gcum", sum(col("gcnt")).over(w))
    val tot = v.groupBy(col("grp")).agg(count(lit(1)).as("n_grp"))
    val gtot = v.agg(count(lit(1)).as("n_tot"), min(col("v")).as("v_min"))
    cums.join(broadcast(tot), Seq("grp")).crossJoin(broadcast(gtot))
      .select(col("grp"), col("n_grp"),
        (col("n_tot") - col("n_grp")).as("n_rest"), col("v_min"),
        (abs(expr("scum * 1000000 div n_grp")
          - expr("(gcum - scum) * 1000000 div greatest(n_tot - n_grp, 1)"))
          * 100000000L + (col("v") - col("v_min"))).as("key"))
      .groupBy(col("grp"), col("n_grp"), col("n_rest"), col("v_min"))
      .agg(max(col("key")).as("k"))
      .select(col("grp"), col("n_grp"), col("n_rest"),
        expr("k div 100000000").as("ks_u"),
        (expr("k % 100000000") + col("v_min")).as("ks_at_v"))
  }
}
