package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{DataFrame, Dataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Checkpointing for driver-side fixpoint loops (BFS, connected components,
  * Louvain, power iteration).
  *
  * `Dataset.localCheckpoint` truncates the LOGICAL plan but copies the source
  * plan's estimated `Statistics` into the resulting [[LogicalRDD]] leaf
  * (`originStats`). Size estimation multiplies through joins, so in an
  * iterative loop each pass re-multiplies the previous pass's estimate:
  * `sizeInBytes` doubles in BIT LENGTH every pass (measured: 49 bits at pass
  * 0 → 36k bits at pass 9 → minutes of BigInteger multiplication inside
  * Catalyst's `SizeInBytesOnlyStatsPlanVisitor` by pass ~20). At 25+-hop
  * traversals (the reference's full-graph analysis span) planning hangs
  * outright.
  *
  * `FreshCheckpoint` checkpoints eagerly, then rebuilds the leaf with
  * statistics re-grounded in the REAL materialized block sizes from the block
  * manager. Every iteration hands Catalyst honest, constant-size stats — so
  * planning stays O(plan) per pass and broadcast-vs-shuffle join decisions at
  * cluster scale are made from true sizes, not compounded guesses.
  *
  * (This lives under `org.apache.spark.sql` because `Dataset.ofRows` and
  * `LogicalRDD`'s constructor are `private[sql]` — the standard seam for
  * library-level plan surgery against stock Spark.)
  */
object FreshCheckpoint {

  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.classic.ClassicConversions._
    val ck: DataFrame = castToImpl(df).localCheckpoint(true)
    ck.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val spark = ck.sparkSession
        val measured = spark.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id)
          .map(i => BigInt(i.memSize + i.diskSize).max(1))
        // Fallback (block not in storage info yet): keep the origin estimate
        // only if it is still sane; otherwise reset to the session default.
        val size = measured.getOrElse {
          val origin = lr.stats.sizeInBytes
          if (origin.bitLength < 64) origin
          else BigInt(spark.sessionState.conf.defaultSizeInBytes)
        }
        Dataset.ofRows(spark,
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
            lr.isStreaming, lr.stream)(spark, Some(Statistics(sizeInBytes = size)), None))
      case _ => ck
    }
  }
}
