package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One DP release as the budget monitor sees it. */
case class ReleaseEvent(domain: String, seq: Long, epsilon_u: Long,
    n_classes: Long)

/** Per-domain monitor state: accumulated spend and the last applied
  * release sequence (the replay guard). */
case class LedgerState(spent: Long, lastSeq: Long)

/** One emitted ledger row — schema-identical to
  * [[graft.ops.Privacy.budgetTransitions]]'s batch relation. */
case class LedgerRow(domain: String, seq: Long, epsilon_u: Long,
    n_classes: Long, spent_u: Long, remaining_u: Long, exhausted: Boolean,
    crossed: Boolean)

/** Streaming DP-budget monitor — the at-emit form of
  * [[graft.ops.Privacy.budgetTransitions]]: DP releases arrive as a
  * stream, a stateful per-domain `flatMapGroupsWithState` accumulates the
  * sequential-composition spend, and every release is emitted WITH its
  * running ledger row the moment it happens — including the `crossed`
  * alarm bit on the release that exhausts its domain's budget. This is
  * the enforcement point a release pipeline actually needs: the batch
  * twin discovers an over-spend after the fact; the monitor can gate the
  * NEXT release before it publishes.
  *
  * Exactness: spend is a plain BIGINT sum in arrival order within each
  * domain, and addition is the one operation with no order sensitivity —
  * every emitted row replays the batch window cum-sum row-for-row
  * (the StreamingSpec stream≡batch proof).
  *
  * Ordering/replay contract: releases are processed in `seq` order within
  * each micro-batch (sorted per group) and batches are assumed
  * seq-ordered per domain — the release-pipeline shape, where the ledger
  * sits behind the same sequencer that numbers the releases. A replayed
  * or duplicate seq (≤ the last applied) is a NO-OP: double-counting a
  * re-delivered release would overstate spend and fire spurious alarms,
  * so the monitor is idempotent on redelivery.
  *
  * Scale shape: state is ONE fixed-size (spend, lastSeq) pair per domain
  * — independent of series length; each micro-batch shuffles only on the
  * domain key, and the stream itself is release-sized, orders of
  * magnitude below corpus scale.
  */
object LedgerStream {

  def budgetMonitorStream(spark: SparkSession, releases: DataFrame,
      budgetEpsilonU: Long = 2772588L): Dataset[LedgerRow] = {
    import spark.implicits._
    releases.select(col("domain"), col("seq"), col("epsilon_u"),
        col("n_classes")).as[ReleaseEvent]
      .groupByKey(_.domain)
      .flatMapGroupsWithState[LedgerState, LedgerRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (domain: String, it: Iterator[ReleaseEvent],
            state: GroupState[LedgerState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[LedgerRow]
          var st = state.getOption.getOrElse(LedgerState(0L, Long.MinValue))
          it.toSeq.sortBy(_.seq).foreach { e =>
            if (e.seq > st.lastSeq) {
              val before = st.spent
              val after = before + e.epsilon_u
              out += LedgerRow(domain, e.seq, e.epsilon_u, e.n_classes,
                after, math.max(0L, budgetEpsilonU - after),
                after >= budgetEpsilonU,
                after >= budgetEpsilonU && before < budgetEpsilonU)
              st = LedgerState(after, e.seq)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
