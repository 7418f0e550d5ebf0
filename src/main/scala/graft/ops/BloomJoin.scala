package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter-pruned semi join: the runtime-filter pattern for the regime
  * where the build side is too large to broadcast as a hash relation but its
  * key set fits a few-MB bloom filter.
  *
  * Shape: (1) aggregate the build side's keys into a bloom filter
  * (`DataFrameStatFunctions.bloomFilter` — a distributed `treeAggregate`, one
  * pass, no shuffle of the probe side); (2) broadcast it and filter the probe
  * side BEFORE its shuffle — at fpp=1% this removes ≥99% of non-matching
  * probe rows from the exchange; (3) finish with the exact shuffle semi join,
  * which removes bloom false positives. Result is therefore EXACTLY the plain
  * semi join (bloom filters have no false negatives) — the oracle checks
  * equivalence, the plan demonstrates the pruned shuffle.
  *
  * (Spark's own AQE runtime filters apply the same idea automatically in some
  * shapes; this operator makes it explicit and composable.)
  */
object BloomJoin {

  def prunedSemiJoin(
      probe: DataFrame,
      probeKey: String,
      build: DataFrame,
      buildKey: String,
      expectedNumItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bloom = build.stat.bloomFilter(buildKey, expectedNumItems, fpp)
    val bc = probe.sparkSession.sparkContext.broadcast(bloom)
    // primitive-Long UDF: null keys yield null → filtered out, matching the
    // semi join's null semantics (null joins nothing)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    // the UDF gates rows before the Exchange; the exact semi join after it
    // only sees survivors (bloom-FP rate of the shuffled volume)
    probe.filter(mightContain(col(probeKey).cast("long")))
      .join(build.select(col(buildKey).as(probeKey)).distinct(),
        Seq(probeKey), "left_semi")
  }
}
