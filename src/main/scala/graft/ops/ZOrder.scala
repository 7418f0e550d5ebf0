package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaved sort keys — the data-layout primitive behind
  * multi-dimensional clustering (Delta/Iceberg OPTIMIZE ZORDER BY): writing a
  * table sorted by the interleaved key keeps EVERY participating column's
  * values locally dense, so per-file zone maps (min/max) prune scans on any
  * of the dimensions, not just the leading sort column.
  *
  * Pure integer column arithmetic (shift/mask/add over disjoint bit
  * positions — codegen'd, no UDF), bit-identical in any engine, so the
  * DuckDB oracle replays keys exactly. Keys interleave the LOW `bits` bits
  * of each column; callers bucketize wide-range columns first (the layout
  * needs locality, not injectivity).
  */
object ZOrder {

  /** Morton key of two non-negative integer columns, 2·bits result bits:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Interleaving
    * RAW values only helps when both columns use similar bit widths — a
    * 200-value column interleaved with a 10-value column is dominated by the
    * wide column's high bits and degenerates to a single-column sort. Use
    * [[withKey]] for the normalized production form. */
  def key(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Production form: each column is first scaled onto the full 2^bits
    * bucket range from its observed min/max (one tiny aggregate — the same
    * range computation a writer's OPTIMIZE pass already owns), THEN
    * interleaved, so both dimensions contribute equally at every bit
    * position. Bucketing arithmetic is floor over exact double products —
    * bit-identical cross-engine.
    *
    * NOTE: computing the ranges runs a Spark job EAGERLY at composition time
    * (one tiny min/max aggregate) — callers composing lazy pipelines should
    * invoke this where a job is acceptable, the same place a writer's
    * OPTIMIZE pass sits. On an empty input (or all-NULL key columns) there
    * is no range to normalize against, so the input is returned with a NULL
    * `out` column rather than throwing from a null aggregate row. */
  def withKey(df: org.apache.spark.sql.DataFrame, a: String, b: String,
      bits: Int = 16, out: String = "z"): org.apache.spark.sql.DataFrame = {
    val r = df.agg(min(col(a)).cast("long"), max(col(a)).cast("long"),
      min(col(b)).cast("long"), max(col(b)).cast("long")).head()
    if (r.isNullAt(0) || r.isNullAt(2))
      return df.withColumn(out, lit(null).cast("long"))
    val scale = (1L << bits).toDouble
    def bucket(c: Column, mn: Long, mx: Long): Column =
      floor((c - lit(mn)) * lit(scale) / lit((mx - mn + 1).toDouble)).cast("long")
    df.withColumn(out, key(
      bucket(col(a), r.getLong(0), r.getLong(1)),
      bucket(col(b), r.getLong(2), r.getLong(3)), bits))
  }
}
