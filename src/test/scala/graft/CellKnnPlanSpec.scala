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
}
