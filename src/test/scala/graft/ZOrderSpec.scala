package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.ZOrder

/** Z-order layout proof: interleaved-key ordering keeps BOTH dimensions
  * locally dense, so per-block zone maps (min/max) prune scans on either
  * column — the property single-column sorting cannot provide. */
class ZOrderSpec extends SparkTestBase {

  /** Sum over 32 equal row-blocks of each dimension's (max − min) span,
    * normalized by the column's full range — the aggregate zone-map width a
    * pruning scan would test against. (Driver-side window is test-only.) */
  private def layoutCost(sorted: DataFrame): Double = {
    val n = sorted.count()
    val blockSize = math.max(1L, (n + 31) / 32)
    val blocks = sorted
      .withColumn("rn", row_number().over(Window.orderBy(col("ord"))) - 1)
      .withColumn("blk", floor(col("rn") / blockSize)) // contiguous runs
    val spans = blocks.groupBy(col("blk"))
      .agg((max(col("a")) - min(col("a"))).as("sa"),
        (max(col("b")) - min(col("b"))).as("sb"))
      .agg(sum(col("sa")).as("ta"), sum(col("sb")).as("tb")).head()
    val range = sorted.agg(
      (max(col("a")) - min(col("a"))).cast("double"),
      (max(col("b")) - min(col("b"))).cast("double")).head()
    spans.getLong(0) / range.getDouble(0) + spans.getLong(1) / range.getDouble(1)
  }

  test("z-order blocks beat single-column sort on combined zone-map width") {
    val li = spark.read.parquet(s"$testData/sf0.001/lineitem.parquet")
      .select(col("l_partkey").as("a"), col("l_suppkey").as("b"))
    val byA = li.withColumn("ord", col("a") * 1000000L + col("b"))
    val byZ = ZOrder.withKey(li, "a", "b", 16, "ord")
    val costA = layoutCost(byA)
    val costZ = layoutCost(byZ)
    assert(costZ < 0.7 * costA,
      s"z-order layout cost $costZ not materially below single-column $costA")
  }

  test("withKey on empty / all-NULL input yields a NULL key, not a throw") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ZOrder.withKey(empty, "a", "b").count() === 0)
    val allNull = Seq((1L, 2L)).toDF("a", "b")
      .select(lit(null).cast("long").as("a"), lit(null).cast("long").as("b"))
    val out = ZOrder.withKey(allNull, "a", "b")
    assert(out.count() === 1 && out.select(col("z")).head().isNullAt(0))
  }

  test("morton key interleaves bits exactly") {
    import spark.implicits._
    // a=0b101 (bits at 0,2 -> positions 0,4), b=0b11 (bits at 0,1 -> 1,3)
    val r = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrder.key(col("a"), col("b"), 4).as("z")).head().getLong(0)
    assert(r === ((1L << 0) + (1L << 4) + (1L << 1) + (1L << 3)))
  }
}
