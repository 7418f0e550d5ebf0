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
}
