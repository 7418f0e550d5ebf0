package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join, bucketized.
  *
  * Spark plans a bare `p.v BETWEEN i.lo AND i.hi` predicate as
  * BroadcastNestedLoopJoin — O(|P|·|I|) once the interval side outgrows the
  * broadcast threshold. Bucketizing turns it into an equi-join: every point
  * maps to bucket floor(v/w); every interval is replicated to each bucket it
  * overlaps (span/w + 1 copies); the bucket equi-join shuffles on the bucket
  * key and the exact BETWEEN predicate refines the candidates. Output is
  * identical to the naive join; cost is one shuffle of |P| + Σ spans/w rows.
  * Pick `bucketWidth` near the typical interval span so replication stays
  * O(1) per interval; hot buckets split via AQE skew handling.
  */
object RangeJoin {

  /** @param points    (pointCols..., v)  — v numeric
    * @param intervals (intervalCols..., lo, hi) — lo ≤ hi numeric
    * @return rows of points × matching intervals (all columns of both sides,
    *         minus the internal bucket key), for v ∈ [lo, hi].
    */
  def bucketed(
      points: DataFrame,
      intervals: DataFrame,
      v: String,
      lo: String,
      hi: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val pb = points.withColumn("__bucket",
      floor(col(v) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(floor(col(lo) / bucketWidth).cast("long"),
        floor(col(hi) / bucketWidth).cast("long"))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(v) >= col(lo) && col(v) <= col(hi))
      .drop("__bucket")
  }
}
