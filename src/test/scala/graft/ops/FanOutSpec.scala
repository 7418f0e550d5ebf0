package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.SparkTestBase

/** fanOut must raise parallelism for genuinely small inputs AND for plans
  * whose size statistics are the spark.sql.defaultSizeInBytes sentinel
  * (no-stats plans such as LogicalRDD report Long.MaxValue, which must not
  * read as "huge input, skip the fan-out"). */
class FanOutSpec extends SparkTestBase {

  test("small real-stats input is fanned out to session parallelism") {
    val p = spark.sparkContext.defaultParallelism
    val df = spark.range(100).toDF("id").coalesce(1)
    assert(Dedup.fanOut(df).rdd.getNumPartitions === p)
  }

  test("sentinel-stats single-partition plan is still fanned out") {
    val schema = StructType(Seq(StructField("id", LongType)))
    val rdd = spark.sparkContext.parallelize((1L to 50L).map(Row(_)), 1)
    val df = spark.createDataFrame(rdd, schema) // LogicalRDD: sentinel stats
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(bytes >= BigInt(Long.MaxValue), s"expected sentinel stats, got $bytes")
    val p = spark.sparkContext.defaultParallelism
    assert(Dedup.fanOut(df).rdd.getNumPartitions === p)
  }

  test("sentinel-stats wide plan is left alone (no extra shuffle)") {
    val schema = StructType(Seq(StructField("id", LongType)))
    val p = spark.sparkContext.defaultParallelism
    val rdd = spark.sparkContext.parallelize((1L to 50L).map(Row(_)), p + 3)
    val df = spark.createDataFrame(rdd, schema)
    assert(Dedup.fanOut(df) eq df)
  }
}
