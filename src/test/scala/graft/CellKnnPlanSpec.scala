package graft

import org.apache.spark.sql.execution.ExplainMode
import graft.ops.Similarity

/** Physical-plan contract for the cell-blocked kNN candidate stage (the
  * subplan PlanSweep cannot see once mutualKnn checkpoints it): candidates
  * must come from an EQUI-join on the hyperplane cell id — never a
  * cartesian or nested-loop pairing of corpus-sized sides. */
class CellKnnPlanSpec extends SparkTestBase {
  test("cellKnn pairs vectors via an equi-join on the cell id") {
    val emb = spark.read.parquet(s"$testData/sf0.001/embeddings.parquet")
    val plan = Similarity.cellKnn(emb).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct"))
    // the only nested loop allowed is the 1-row mean-vector scalar attach
    // inside hyperplaneCells; the corpus-corpus pairing must key on cell
    assert(plan.contains("cell"))
    // formatted explain lists keys in the operator's detail block
    val cellKeyed =
      """(?s)\(\d+\) (SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)\s.{0,400}?Left keys \[\d+\]: \[cell""".r
    assert(cellKeyed.findFirstIn(plan).isDefined,
      s"no cell-keyed equi-join found:\n$plan")
  }

  test("embeddingOutliers auto path broadcasts nothing n-proportional") {
    // r6 verdict #3: the old path put an explicit broadcast HINT on the
    // per-cell median relation (k = n/256 rows — grows with the corpus,
    // and a hint overrides Spark's size check). The only forced broadcast
    // allowed in the auto path is the 1-ROW mean-vector scalar inside
    // hyperplaneCells; every other join (cells, centroids, medians) must
    // be left to size-checked planning — a planner-CHOSEN BroadcastExchange
    // on a relation it measured as small is fine and not counted here.
    val emb = spark.read.parquet(s"$testData/sf0.001/embeddings.parquet")
    val analyzed = Similarity.embeddingOutliers(emb).queryExecution.analyzed
    val hints = analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.size <= 1, s"expected at most the 1-row scalar broadcast " +
      s"hint, found ${hints.size}:\n${hints.mkString("\n")}")
  }
}
