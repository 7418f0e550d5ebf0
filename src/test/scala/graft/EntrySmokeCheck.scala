package graft

/** Driver-contract smoke: `SparkEntry.entry` must return > 0 rows at
  * sf0.001 (the driver's liveness check each round). */
class EntrySmokeCheck extends SparkTestBase {
  test("SparkEntry.entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
