package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One raw event as the monitor sees it. */
case class RateEvent(event_type: String, ts: Timestamp)

/** Per-event-type monitor state: the currently-open bucket and its count,
  * plus the closed-form CUSUM carry — the running prefix `p` and its
  * running minimum `minP` (exactly the two quantities
  * [[graft.ops.TimeSeries.cusumPinned]]'s window pair computes), and the
  * current alarm level for transition detection. */
case class CusumState(openBucket: Long, openCount: Long, p: Long,
    minP: Long, inAlarm: Boolean)

/** An emitted alarm TRANSITION: the monitor entered (`entered` = true) or
  * left the alarm region at `bucket`, with the CUSUM statistic at that
  * bucket. */
case class CusumAlarm(event_type: String, bucket: Long, s_u: Long,
    entered: Boolean)

/** Streaming CUSUM rate monitor (round-11 #4) — the at-ingest form of the
  * q260/q280 drift family: a stateful per-event-type
  * `flatMapGroupsWithState` carries (open bucket count, running prefix,
  * running min) and emits alarm TRANSITIONS the moment a bucket closes,
  * instead of a batch pass discovering them after the fact.
  *
  * Exactness: a bucket closes when a later bucket's first event arrives;
  * closing folds x·10⁶ − µ − µ div kDen into the prefix, updates the
  * running min, and computes s = p − min(minP, 0) — integer-for-integer
  * the [[graft.ops.TimeSeries.cusumPinned]] closed form, so every closed
  * bucket's state replays the batch relation row-for-row (the
  * StreamingSpec stream≡batch proof). Empty buckets between two observed
  * ones close in sequence with x = 0, draining the statistic exactly as
  * the batch dense grid does.
  *
  * Ordering contract: events are processed in event-time order within
  * each micro-batch (sorted per group) and batches are assumed
  * time-ordered per type — the ingest-pipeline shape, where the monitor
  * sits behind the same watermark that orders the bucket aggregation. An
  * event arriving for an already-closed bucket folds into the OPEN bucket
  * (the monitor never rewrites emitted history — late mass still raises
  * the statistic, one bucket late).
  *
  * Scale shape: state is ONE fixed-size tuple per event type (the group
  * key), independent of stream length; each micro-batch does one shuffle
  * on the type key. The trailing open bucket is pending by construction —
  * it closes when the next bucket's first event arrives.
  */
object CusumStream {

  def rateMonitorStream(spark: SparkSession, events: DataFrame,
      muU: Long = 10000L, bucketSec: Int = 300, kDen: Long = 4,
      hMul: Long = 4): Dataset[CusumAlarm] = {
    import spark.implicits._
    events.select(col("event_type"), col("ts")).as[RateEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumAlarm](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (etype: String, it: Iterator[RateEvent], state: GroupState[CusumState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[CusumAlarm]
          var st = state.getOption.orNull
          def close(s0: CusumState, x: Long, bucket: Long): CusumState = {
            val p2 = s0.p + x * 1000000L - muU - muU / kDen
            val mn2 = math.min(s0.minP, p2)
            val s = p2 - math.min(mn2, 0L)
            val alarm = s > hMul * muU
            if (alarm != s0.inAlarm) out += CusumAlarm(etype, bucket, s, alarm)
            s0.copy(p = p2, minP = mn2, inAlarm = alarm)
          }
          it.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val b = Math.floorDiv(e.ts.getTime, bucketSec * 1000L) * bucketSec
            if (st == null) st = CusumState(b, 1L, 0L, 0L, inAlarm = false)
            else if (b == st.openBucket)
              st = st.copy(openCount = st.openCount + 1)
            else if (b > st.openBucket) {
              st = close(st, st.openCount, st.openBucket)
              var nb = st.openBucket + bucketSec
              while (nb < b) { st = close(st, 0L, nb); nb += bucketSec }
              st = st.copy(openBucket = b, openCount = 1L)
            } else {
              // late event below the open bucket: fold into the open
              // bucket — emitted history is never rewritten
              st = st.copy(openCount = st.openCount + 1)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }
}
