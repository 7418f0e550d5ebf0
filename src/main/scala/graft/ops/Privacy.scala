package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk measurement over structured (quasi-identifier) columns —
  * the re-identification complement to the free-text pass
  * ([[TextAnalysis.piiScrub]] masks PII *strings*; this measures what the
  * released *columns* still disclose).
  */
object Privacy {

  /** k-anonymity audit: group rows by their quasi-identifier tuple
    * (equivalence classes), then for each k on the audit spine report how
    * much of the table sits in classes smaller than k — the mass a
    * k-anonymous release would have to suppress or generalize away.
    * Published k-anonymity (Sweeney 2002) calls a release k-anonymous when
    * every equivalence class has ≥ k members; the audit reports the
    * violating class/row counts per candidate k so the release owner can
    * pick the k they can afford.
    *
    * Scale shape: ONE groupBy over the quasi tuple (map-side combine; the
    * class relation is ≤ distinct-tuple sized, typically corpus ≫ classes),
    * then a single conditional aggregation over the class sizes — one
    * column pair per spine k, k is a literal handful — unpivoted to rows by
    * exploding a k-row literal array on the 1-row aggregate. No per-k
    * re-scan, no join, nothing row-proportional leaves the first agg.
    *
    * Determinism: counts and integer micro-unit ratios only.
    *
    * @param rows  the release candidate
    * @param quasi quasi-identifier columns (already generalized as desired,
    *              e.g. bucketed numerics)
    * @param ks    audit spine, each k ≥ 2
    * @return (k, n_classes, n_rows, n_classes_below, n_rows_below,
    *         risk_u = n_rows_below·10⁶ div n_rows), one row per k
    */
  def kAnonymityAudit(rows: DataFrame, quasi: Seq[Column],
      ks: Seq[Int] = Seq(2, 5, 10, 25)): DataFrame = {
    val classes = rows.groupBy(quasi: _*).agg(count(lit(1)).as("sz"))
    val perK = ks.sorted.map { k =>
      struct(lit(k.toLong).as("k"),
        sum(when(col("sz") < k, lit(1L)).otherwise(lit(0L)))
          .as("n_classes_below"),
        sum(when(col("sz") < k, col("sz")).otherwise(lit(0L)))
          .as("n_rows_below"))
    }
    classes
      .agg(count(lit(1)).as("n_classes"), sum(col("sz")).as("n_rows"),
        array(perK: _*).as("spine"))
      .select(col("n_classes"), col("n_rows"), explode(col("spine")).as("s"))
      .select(col("s.k").as("k"), col("n_classes"), col("n_rows"),
        col("s.n_classes_below").as("n_classes_below"),
        col("s.n_rows_below").as("n_rows_below"),
        expr("s.n_rows_below * 1000000 div n_rows").as("risk_u"))
  }

  /** l-diversity audit ([[kAnonymityAudit]]'s sibling for attribute
    * disclosure): k-anonymity bounds re-IDENTIFICATION but a k-sized class
    * whose members all share one sensitive value still discloses that value
    * for everyone in it. Per spine l, report the class/row mass whose
    * equivalence class carries FEWER than l distinct sensitive values —
    * the mass a release would have to suppress for distinct l-diversity
    * (Machanavajjhala 2007).
    *
    * Scale shape: identical to [[kAnonymityAudit]] with a two-phase
    * distinct count riding the same class groupBy; everything after the
    * first agg is class-relation sized.
    *
    * @return (l, n_classes, n_rows, n_classes_below, n_rows_below,
    *         risk_u = n_rows_below·10⁶ div n_rows), one row per l
    */
  def lDiversityAudit(rows: DataFrame, quasi: Seq[Column], sensitive: Column,
      ls: Seq[Int] = Seq(2, 3, 5)): DataFrame = {
    val classes = rows.groupBy(quasi: _*)
      .agg(count(lit(1)).as("sz"), countDistinct(sensitive).as("dv"))
    val perL = ls.sorted.map { l =>
      struct(lit(l.toLong).as("l"),
        sum(when(col("dv") < l, lit(1L)).otherwise(lit(0L)))
          .as("n_classes_below"),
        sum(when(col("dv") < l, col("sz")).otherwise(lit(0L)))
          .as("n_rows_below"))
    }
    classes
      .agg(count(lit(1)).as("n_classes"), sum(col("sz")).as("n_rows"),
        array(perL: _*).as("spine"))
      .select(col("n_classes"), col("n_rows"), explode(col("spine")).as("s"))
      .select(col("s.l").as("l"), col("n_classes"), col("n_rows"),
        col("s.n_classes_below").as("n_classes_below"),
        col("s.n_rows_below").as("n_rows_below"),
        expr("s.n_rows_below * 1000000 div n_rows").as("risk_u"))
  }
}
