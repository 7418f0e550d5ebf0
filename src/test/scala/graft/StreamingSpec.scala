package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStreams

/** Structured Streaming behaviors: the streaming pipelines must agree with
  * their batch formulations on a static input (availableNow + memory sink).
  */
class StreamingSpec extends SparkTestBase {

  lazy val eventsDir = s"$testData/sf0.001"

  test("windowed agg: streaming (availableNow, watermark) equals batch") {
    val batchDf = graft.Queries.events(spark, eventsDir)
    val batch = EventStreams.windowedAgg(batchDf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    // stream the same parquet (nanos read as long, converted like batch);
    // FileStreamSource needs a DIRECTORY — stage the single file into one
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stage = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$eventsDir/events.parquet"),
      stage.resolve("events.parquet"))
    val raw = graft.Queries.normalizeEventsTs(spark.readStream
      .schema(spark.read.parquet(s"$eventsDir/events.parquet").schema)
      .parquet(stage.toString))
    val q = EventStreams.windowedAggStream(raw)
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode + watermark: only windows older than the watermark emit;
    // compare the emitted subset for equality
    val streamed = spark.sql("SELECT * FROM win_agg").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed.nonEmpty, "stream emitted no finalized windows")
    streamed.foreach { case (k, v) =>
      assert(batch(k) === v, s"window $k mismatch")
    }
  }

  test("streaming dedup (bounded state) equals batch distinct on ids") {
    val batchDf = graft.Queries.events(spark, eventsDir)
    val batchIds = EventStreams.dedupBatch(batchDf)
      .select(col("event_id")).collect().map(_.getLong(0)).toSet

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stage = java.nio.file.Files.createTempDirectory("events_dedup")
    // stage the file TWICE: the second copy is pure duplicates the dedup
    // operator must suppress
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$eventsDir/events.parquet"),
      stage.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$eventsDir/events.parquet"),
      stage.resolve("b.parquet"))
    val raw = graft.Queries.normalizeEventsTs(spark.readStream
      .schema(spark.read.parquet(s"$eventsDir/events.parquet").schema)
      .parquet(stage.toString))
    val q = EventStreams.dedupStream(raw)
      .select(col("event_id"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamedIds = spark.sql("SELECT event_id FROM dedup_stream")
      .collect().map(_.getLong(0))
    assert(streamedIds.length === streamedIds.distinct.length, "emitted duplicates")
    assert(streamedIds.toSet === batchIds)
  }

  test("stream-stream interval join (attribution) equals batch time-bounded join") {
    val batchDf = graft.Queries.events(spark, eventsDir)
    val clicksB = batchDf.filter(col("event_type") === "click")
    val purchB = batchDf.filter(col("event_type") === "purchase")
    val batch = EventStreams.attributionBatch(clicksB, purchB).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stage = java.nio.file.Files.createTempDirectory("events_attr")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$eventsDir/events.parquet"),
      stage.resolve("events.parquet"))
    def stream() = graft.Queries.normalizeEventsTs(spark.readStream
      .schema(spark.read.parquet(s"$eventsDir/events.parquet").schema)
      .parquet(stage.toString))
    val q = EventStreams.attributionStream(
        stream().filter(col("event_type") === "click"),
        stream().filter(col("event_type") === "purchase"))
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT * FROM attr_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("stream-static enrich (broadcast dim per micro-batch) equals batch join") {
    val batchDf = graft.Queries.events(spark, eventsDir)
    val dim = spark.read.parquet(s"$eventsDir/customer.parquet")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getString(1))
    val batch = EventStreams.enrichBatch(batchDf, dim, "c_custkey")
      .select(col("event_id"), col("c_mktsegment")).collect().map(key).toSet

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stage = java.nio.file.Files.createTempDirectory("events_enrich")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$eventsDir/events.parquet"),
      stage.resolve("events.parquet"))
    val raw = graft.Queries.normalizeEventsTs(spark.readStream
      .schema(spark.read.parquet(s"$eventsDir/events.parquet").schema)
      .parquet(stage.toString))
    val q = EventStreams.enrichStream(raw, dim, "c_custkey")
      .select(col("event_id"), col("c_mktsegment"))
      .writeStream.format("memory").queryName("enrich_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT * FROM enrich_stream").collect().map(key).toSet
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("sessionize: stream state (flatMapGroupsWithState) agrees with batch") {
    import spark.implicits._
    val batchDf = graft.Queries.events(spark, eventsDir)
    val batchSessions = EventStreams.sessionizeBatch(batchDf, 30).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start")) ->
        r.getAs[Long]("n_events")).toMap

    // single-batch stream: emitted sessions are the closed ones (each user's
    // last session stays in state) — every emitted session must match batch
    val streamed = EventStreams.sessionizeStream(spark, batchDf, 30)
    // run as a batch Dataset transformation on static input for determinism
    val emitted = streamed.collect()
    assert(emitted.nonEmpty)
    emitted.foreach { s =>
      val key = (s.user_id, s.session_start)
      assert(batchSessions.contains(key), s"session $key not in batch result")
      assert(batchSessions(key) === s.n_events)
    }
    // emitted = all batch sessions minus one open session per user
    val users = emitted.map(_.user_id).distinct
    val batchPerUser = batchSessions.keys.groupBy(_._1).view.mapValues(_.size).toMap
    users.foreach { u =>
      val emittedN = emitted.count(_.user_id == u)
      assert(emittedN === batchPerUser(u) - 1, s"user $u emitted $emittedN")
    }
  }

  test("streaming fuzzy decontamination equals q249's batch relation over multi-batch arrival") {
    import graft.streaming.DecontaminateStream
    val docs = spark.read.parquet(s"$eventsDir/documents.parquet")
    val isBench = col("doc_id") % 10 === 0
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("drop_id"), r.getAs[Long]("n_bench_hits"),
        r.getAs[Long]("max_j_u"), r.getAs[Long]("bench_id_min"))
    // batch oracle: the q249 operator itself (threshold 0.5 for coverage)
    val batch = graft.ops.Dedup.fuzzyDecontaminate(docs, isBench,
        threshold = 0.5).collect().map(key).toSet
    assert(batch.nonEmpty, "no contaminated docs at 0.5 — test vacuous")
    def rollup(pairs: org.apache.spark.sql.DataFrame) = pairs
      .groupBy(col("drop_id"))
      .agg(count(lit(1)).as("n_bench_hits"), max(col("j_u")).as("max_j_u"),
        min(col("bench_id")).as("bench_id_min"))
    // the SAME stream-static plan evaluated in batch mode must already agree
    val asBatch = rollup(DecontaminateStream.fuzzyDecontaminateStream(
        spark, docs.filter(!isBench), docs.filter(isBench), threshold = 0.5))
      .collect().map(key).toSet
    assert(asBatch === batch)
    // stream the train side in two id-parity micro-batches against the
    // static bench index; the plan is stateless, so batch boundaries must
    // not change the emitted pair set
    val stage = java.nio.file.Files.createTempDirectory("docs_decont")
    Seq(0, 1).foreach { p =>
      val tmp = java.nio.file.Files.createTempDirectory(s"dc_half$p")
      docs.filter(!isBench).filter(col("doc_id") % 2 === p).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      java.nio.file.Files.copy(java.nio.file.Paths.get(part),
        stage.resolve(s"half$p.parquet"))
    }
    val raw = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val q = DecontaminateStream.fuzzyDecontaminateStream(
        spark, raw, docs.filter(isBench), threshold = 0.5)
      .writeStream.format("memory").queryName("decont_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamed = rollup(spark.sql("SELECT * FROM decont_stream"))
      .collect().map(key).toSet
    assert(streamed === batch)
  }

  test("streaming near-dup (LSH bucket state) equals batch minhashLsh over multi-batch arrival") {
    import graft.streaming.NearDupStream
    val docs = spark.read.parquet(s"$eventsDir/documents.parquet")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Double]("jaccard"))
    val batch = graft.ops.Dedup.minhashLsh(docs, 8, 2, 0.5)
      .collect().map(key).toSet
    assert(batch.nonEmpty, "corpus has no near-dup pairs at 0.5 — test vacuous")

    // the SAME streaming plan evaluated in batch mode must already agree
    val asBatch = NearDupStream.nearDupStream(spark, docs, 8, 2, 0.5)
      .collect().map(key).toSet
    assert(asBatch === batch)

    // stream it: two files with interleaved doc_id parity → two availableNow
    // micro-batches whose arrival order differs from id order; bucket state
    // must carry pairs across the batch boundary
    val stage = java.nio.file.Files.createTempDirectory("docs_neardup")
    Seq(0, 1).foreach { p =>
      val tmp = java.nio.file.Files.createTempDirectory(s"docs_half$p")
      docs.filter(col("doc_id") % 2 === p).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      java.nio.file.Files.copy(java.nio.file.Paths.get(part),
        stage.resolve(s"half$p.parquet"))
    }
    val raw = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val q = NearDupStream.nearDupStream(spark, raw, 8, 2, 0.5)
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamed = spark.sql("SELECT * FROM neardup_stream").collect().map(key).toSet
    assert(streamed === batch)
  }

  test("streaming CUSUM rate monitor equals q277's pinned-mu batch transitions") {
    import graft.streaming.CusumStream
    val ev = graft.Queries.events(spark, eventsDir)
    // batch twin: per-bucket relation → alarm TRANSITIONS per type (a
    // transition is a bucket whose alarm differs from the previous
    // bucket's, the first bucket transitioning only if it alarms).
    // The trailing OPEN bucket per type can never close in the stream, so
    // transitions at the type's last bucket are excluded from the compare.
    val rel = graft.ops.TimeSeries.cusumPinned(ev)
      .orderBy("event_type", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
    val lastBucket = rel.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val batchTransitions = rel.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(_._2).foldLeft((List.empty[(String, Long, Long, Boolean)], false)) {
        case ((acc, prev), (t, b, s, a)) =>
          (if (a != prev) (t, b, s, a) :: acc else acc, a)
      }._1
    }.filter { case (t, b, _, _) => b < lastBucket(t) }.toSet
    assert(batchTransitions.nonEmpty, "no alarm transitions — test vacuous")

    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1),
      r.getLong(2), r.getBoolean(3))
    // the SAME stateful plan evaluated in batch mode must already agree
    val asBatch = CusumStream.rateMonitorStream(spark, ev).toDF()
      .collect().map(key).toSet
    assert(asBatch === batchTransitions)

    // stream in three TIME-ORDERED micro-batches (the monitor's ordering
    // contract): bucket state, the running prefix, and the alarm level
    // must carry across batch boundaries
    val cuts = ev.selectExpr(
      "percentile_approx(unix_micros(ts), 0.33) AS c1",
      "percentile_approx(unix_micros(ts), 0.66) AS c2").first()
    val (c1, c2) = (cuts.getLong(0), cuts.getLong(1))
    val stage = java.nio.file.Files.createTempDirectory("ev_cusum")
    Seq(("a", col("ts").isNotNull && unix_micros(col("ts")) < c1),
      ("b", unix_micros(col("ts")) >= c1 && unix_micros(col("ts")) < c2),
      ("c", unix_micros(col("ts")) >= c2)).foreach { case (n, pred) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"cusum_$n")
      ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      java.nio.file.Files.copy(java.nio.file.Paths.get(part),
        stage.resolve(s"$n.parquet"))
    }
    val raw = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val q = CusumStream.rateMonitorStream(spark, raw).toDF()
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamed = spark.sql("SELECT * FROM cusum_stream")
      .collect().map(key).toSet
    assert(streamed === batchTransitions)
  }

  test("forget stream: keeper transitions across micro-batches XOR-telescope " +
      "to the batch digest delta; batch evaluation emits the net relation") {
    import spark.implicits._
    import graft.streaming.ForgetStream
    // class A {1,2,3}: batch1 deletes 1 (keeper 1→2), batch2 deletes 2
    // (keeper 2→3); class B {4}: batch2 deletes 4 (4→−1, emptied);
    // class C {5,6}: batch1 deletes 6 (non-keeper, NO transition)
    val corpus = Seq(
      (1L, "class a text"), (2L, "class a text"), (3L, "class a text"),
      (4L, "solo class b"),
      (5L, "class c text"), (6L, "class c text")).toDF("doc_id", "text")
    val batch1 = Seq(1L, 6L)
    val batch2 = Seq(2L, 4L)

    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }

    // batch evaluation of the SAME stateful plan → net transitions only
    val allDel = (batch1 ++ batch2).toDF("doc_id")
    val asBatch = ForgetStream.keeperMonitorStream(spark, corpus, allDel)
      .collect().map(t => (t.old_keeper, t.new_keeper)).toSet
    assert(asBatch == Set((1L, 3L), (4L, -1L)))
    // ... and it equals the forgetTransitions batch-twin relation
    val twin = graft.ops.Pipeline.forgetTransitions(corpus,
        col("doc_id").isin((batch1 ++ batch2): _*))
      .collect().map(r => (r.getAs[Long]("keeper_before"),
        r.getAs[Long]("keeper_after"))).toSet
    assert(twin == asBatch)

    // stream in two micro-batches: intermediate keepers must surface
    val stage = java.nio.file.Files.createTempDirectory("forget_stream")
    Seq(("a", batch1), ("b", batch2)).foreach { case (n, ids) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"forget_$n")
      ids.toDF("doc_id").coalesce(1).write.mode("overwrite")
        .parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      java.nio.file.Files.copy(java.nio.file.Paths.get(part),
        stage.resolve(s"$n.parquet"))
    }
    val raw = spark.readStream
      .schema(allDel.schema)
      .option("maxFilesPerTrigger", 1).parquet(stage.toString)
    val q = ForgetStream.keeperMonitorStream(spark, corpus, raw).toDF()
      .writeStream.format("memory").queryName("forget_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val streamed = spark.sql("SELECT * FROM forget_stream").collect()
      .map(r => (r.getAs[String]("class_key"), r.getAs[Long]("old_keeper"),
        r.getAs[Long]("new_keeper"))).toSet
    // A transitions TWICE (1→2 then 2→3); B empties; C never transitions
    assert(streamed.map(t => (t._2, t._3)) ==
      Set((1L, 2L), (2L, 3L), (4L, -1L)))

    // XOR-telescoping: the accumulated stream patch equals the single
    // batch forgetDocs digest_delta for the same total deletion set
    val patch = streamed.toSeq.map { case (_, o, n) =>
      h60(s"m:$o") ^ (if (n >= 0) h60(s"m:$n") else 0L)
    }.reduce(_ ^ _)
    val delta = graft.ops.Pipeline.forgetDocs(corpus,
        col("doc_id").isin((batch1 ++ batch2): _*))
      .collect().head.getAs[Long]("digest_delta")
    assert(patch == delta)
  }
}
