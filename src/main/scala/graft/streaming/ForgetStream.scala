package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One deletion event, joined to its exact-duplicate class roster. */
case class ForgetEvent(gkey: String, doc_id: Long, members: Seq[Long])

/** Per-class monitor state: the class roster, deletions seen so far, and
  * the current keeper (−1 = class emptied). Bounded by the class size —
  * only TOUCHED classes ever hold state, and an emptied class collapses
  * to a 3-field tombstone (empty roster/deletions, keeper −1). */
case class ForgetClassState(members: Seq[Long], deleted: Seq[Long],
    keeper: Long)

/** An emitted keeper TRANSITION: deletions in this micro-batch moved the
  * class keeper from `old_keeper` to `new_keeper` (−1 = the class lost its
  * last member). `n_deleted` is the class's cumulative deletion count. */
case class KeeperTransition(class_key: String, old_keeper: Long,
    new_keeper: Long, n_deleted: Long)

/** Streaming right-to-be-forgotten monitor — the at-ingest form of
  * [[graft.ops.Pipeline.forgetDocs]]: deletion requests arrive as a
  * stream, and the monitor emits keeper TRANSITIONS for the released set
  * the moment a class's keeper is deleted, instead of a batch pass
  * discovering them at the next release.
  *
  * Digest algebra: each transition contributes h(old keeper) XOR
  * h(new keeper, when the class survives) to the manifest patch; because
  * XOR telescopes, the accumulated patch over any transition sequence
  * equals the single batch [[graft.ops.Pipeline.forgetDocs]] digest_delta
  * for the same total deletion set (intermediate keepers cancel) — the
  * planted StreamingSpec case proves it across micro-batch boundaries.
  *
  * Scale shape: the deletion stream stream-static-joins the doc→class
  * roster (an equi-join; the corpus side is scanned, never collected);
  * state exists only for touched classes and is bounded by the class
  * size; each micro-batch shuffles only the deletion rows on the class
  * key. Evaluated over a BATCH deletion frame the same plan emits the NET
  * transitions — the [[graft.ops.Pipeline.forgetTransitions]] relation.
  */
object ForgetStream {

  /** Static doc→class roster: (doc_id, gkey, members sorted asc). Class
    * member arrays are exact-dup-class-sized — bounded in any deduped
    * corpus and never corpus-sized. */
  def roster(corpus: DataFrame): DataFrame = {
    val classes = corpus.groupBy(md5(col("text")).as("gkey"))
      .agg(sort_array(collect_list(col("doc_id"))).as("members"))
    corpus.select(col("doc_id"), md5(col("text")).as("gkey"))
      .join(classes, Seq("gkey"))
  }

  /** @param deletions streaming (or batch) frame with a `doc_id` column
    * @return keeper transitions, one per (class, micro-batch with a
    *         keeper change) */
  def keeperMonitorStream(spark: SparkSession, corpus: DataFrame,
      deletions: DataFrame): Dataset[KeeperTransition] = {
    import spark.implicits._
    val ev = deletions.select(col("doc_id"))
      .join(roster(corpus), Seq("doc_id"))
      .select(col("gkey"), col("doc_id"), col("members"))
      .as[ForgetEvent]
    ev.groupByKey(_.gkey)
      .flatMapGroupsWithState[ForgetClassState, KeeperTransition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (gkey: String, it: Iterator[ForgetEvent],
            state: GroupState[ForgetClassState]) =>
          val evs = it.toSeq
          val st0 = state.getOption.getOrElse {
            val members = evs.head.members
            ForgetClassState(members, Nil, members.min)
          }
          val deleted = (st0.deleted ++ evs.map(_.doc_id)).distinct.sorted
          val surv = st0.members.filterNot(deleted.contains)
          val nk = if (surv.isEmpty) -1L else surv.min
          if (surv.isEmpty)
            // Emptied class: shrink to an O(1) tombstone instead of keeping
            // the roster + deletion list forever under NoTimeout (r11
            // advisory). state.remove() would be WRONG, not just untidy: a
            // later duplicate deletion would re-seed st0 from the event's
            // roster (keeper = members.min, a doc already deleted) and emit
            // a spurious transition, breaking stream≡batch. The tombstone's
            // keeper == −1 / empty members make every later event a no-op
            // while state stays constant-size per ever-emptied class.
            state.update(ForgetClassState(Nil, Nil, -1L))
          else
            state.update(ForgetClassState(st0.members, deleted, nk))
          if (nk != st0.keeper)
            Iterator.single(
              KeeperTransition(gkey, st0.keeper, nk, deleted.size.toLong))
          else Iterator.empty
      }
  }
}
