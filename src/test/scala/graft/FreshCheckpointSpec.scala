package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FreshCheckpoint

/** Regression: iterative DataFrame fixpoints must not compound Catalyst size
  * estimates across checkpoints. Plain `localCheckpoint` copies origin stats
  * into the new leaf; after ~20 self-joining passes `sizeInBytes` reaches
  * millions of bits and planning hangs inside BigInteger multiplication.
  */
class FreshCheckpointSpec extends SparkTestBase {

  test("stats stay bounded across 25 join-loop iterations") {
    import spark.implicits._
    val edges = (1 to 50).map(i => (s"n${i % 10}", s"n${(i * 7) % 10}"))
      .toDF("a", "b")
    var labels = FreshCheckpoint(
      edges.select($"a".as("id"), $"a".as("lab")).distinct())
    val und = FreshCheckpoint(
      edges.unionByName(edges.select($"b".as("a"), $"a".as("b"))))
    for (_ <- 1 to 25) {
      val next = und
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("lab", "nl"), Seq("b"))
        .groupBy($"a".as("id")).agg(min($"nl").as("nl"))
      labels = FreshCheckpoint(labels.join(next, Seq("id"), "left")
        .select($"id", least(coalesce($"nl", $"lab"), $"lab").as("lab")))
      val bits = labels.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
      assert(bits < 64, s"stats sizeInBytes grew to $bits bits")
    }
    assert(labels.count() === 10)
  }

  test("checkpointed result preserves data and schema") {
    import spark.implicits._
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val ck = FreshCheckpoint(df.withColumn("w", $"v" * 2))
    assert(ck.schema.fieldNames.toSeq === Seq("k", "v", "w"))
    assert(ck.orderBy("k").collect().map(_.getInt(2)).toSeq === Seq(2, 4))
  }
}
