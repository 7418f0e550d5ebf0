package graft

/** Machine-checked physical-plan properties — the scale contract, asserted
  * so a refactor can't silently regress it: filters/projections reach the
  * parquet scans, dimension joins broadcast, top-k never global-sorts, the
  * bucketed candidate joins stay equi (no nested-loop fallbacks).
  */
class PlanSpec extends SparkTestBase {

  val sfDir = s"$testData/sf0.001"

  private def plan(name: String): String = {
    val df = Queries.queries(name)(spark, sfDir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q01: filter and projection are pushed into the parquet scan") {
    val p = plan("q01_scan_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull(l_returnflag)") || p.contains("EqualTo(l_returnflag"), p)
    // pruned read schema: only the 5 referenced columns, not all 11
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_tax"), readSchema)
  }

  test("dimension joins broadcast; fact side is never broadcast") {
    val p = plan("q08_join_inner_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
    val p12 = plan("q12_join_multiway")
    assert(p12.contains("BroadcastHashJoin"), p12)
  }

  test("top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q15_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("GlobalSort"), p)
  }

  test("q35 minhash plans zero token-stream operators: no Generate, no shuffle before the band join") {
    // the whole signature pipeline must be per-row native expressions — a
    // Generate (explode) node anywhere in the plan means the shingle stream
    // got materialized as rows again and its shuffle is one refactor away
    val p = plan("q35_dedup_minhash_lsh")
    assert(!p.contains("Generate"), p)
  }

  test("q37 simhash: hamming cut runs inside the candidate join, before distinct") {
    // the hamming filter must be part of a join's condition, not a
    // post-distinct Filter node: only verified near-dups may reach the
    // distinct's shuffle. Signature build is per-row native (no Generate).
    val p = plan("q37_simhash_neardups")
    assert(!p.contains("Generate"), p)
    assert(p.linesIterator.exists(l =>
      l.toLowerCase.contains("condition") && l.contains("bit_count")), p)
  }

  test("candidate-pair joins stay equi-joins (no nested-loop fallback)") {
    for (q <- Seq("q35_dedup_minhash_lsh", "q36_ngram_jaccard",
        "q102_levenshtein_pairs", "q112_negative_sampling", "q137_scd2_lookup"))
      assert(!plan(q).contains("BroadcastNestedLoopJoin"), q)
  }

  test("walk steps join key-selectively on (a, idx), never fan out by degree") {
    // every walk-step join must be an equi-join whose keys include the
    // neighbor INDEX — a join on the vertex alone materializes deg(v) rows
    // per walker per step (10^6 rows for one walker on a hub) before any
    // filter; no nested-loop fallback may appear anywhere in the plan.
    // localCutoff=0 forces the distributed path (the adaptive gate would
    // otherwise solve this dimension-sized graph on the driver)
    import spark.implicits._
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 2L), (1L, 3L))
      .toDF("a", "b")
    val df = graft.graph.Analytics.deterministicWalks(es, 3, localCutoff = 0)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // formatted explain prints each hash/merge join's equi keys as
    // "Left keys [n]: [...]" / "Right keys [n]: [...]": whenever the
    // adjacency's a# is a join key, idx# must be one too
    val keyLines = p.linesIterator
      .filter(l => l.contains("keys [") && l.contains("a#")).toSeq
    assert(keyLines.nonEmpty, p)
    keyLines.foreach(l => assert(l.contains("idx#"),
      s"adjacency join not keyed on neighbor index: $l"))
  }

  test("betweenness source sample plans as a pure filter: no Window, no single-partition exchange") {
    // the distributed Brandes sampler must never funnel the vertex set
    // through one task (the Window.orderBy+row_number rule it replaced did)
    import spark.implicits._
    val v = spark.range(100000).select($"id".cast("string").as("id"))
    val df = graft.graph.Centrality.sampleSourceIds(v, 64, 100000L)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // bare "SinglePartition": formatted explain splits the Exchange tree
    // line from its "Arguments: SinglePartition" detail line
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Sort"), p)
  }

  test("q151 spans: only the 8-byte hash shuffles — span text stays inside its stage") {
    // the exploded span relation must be (doc_id, h:long) BEFORE any
    // Exchange: if a refactor shuffles the span strings the pass pays
    // spanLen/8 times the network it needs
    val p = plan("q151_substring_spans")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty, p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // every hashpartitioning key is an id or the long hash, never `text`
    // (`substring(...)` appearing in an Exchange line = span text on the wire)
    exchanges.foreach(l => assert(!l.contains("substring"), l))
  }

  test("q152 PQ: ADC scoring broadcasts the distance table; codes never nest-loop") {
    val p = plan("q152_pq_ann")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the qd-table join against the code relation must be a broadcast hash
    // join — the corpus-sized code side must not shuffle to meet m·k rows
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("temporal/events family: no nested-loop or cartesian fallback anywhere") {
    // as-of, interval, window, funnel and SCD2 shapes are the classic
    // nested-loop traps — every one must stay equi-join (bucketized where
    // the predicate is a range) or join-free (as-of via union + window)
    for (q <- Seq("q59_asof_join", "q60_range_join", "q68_attribution_join",
        "q86_hopping_window", "q100_funnel", "q104_max_concurrency",
        "q117_session_window", "q118_scd2_intervals")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
      assert(!p.contains("CartesianProduct"), q)
    }
  }

  test("q59 as-of join is join-free: one union, one keyed window, no join operator") {
    // the backward as-of composition must never degenerate into a range
    // join: no Join node of any kind may appear, and the only wide exchange
    // is the hash partitioning on the as-of key
    val p = plan("q59_asof_join")
    assert(!p.toLowerCase.contains("join"), p)
    // formatted explain puts partitioning in the detail "Arguments:" lines:
    // hash partitioning on the key only — never a single-partition funnel or
    // a global range sort
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("rangepartitioning"), p)
    assert(p.contains("hashpartitioning"), p)
  }

  test("q154 BM25: query terms broadcast onto the posting lists; no nested-loop anywhere") {
    // the corpus-sized tf relation must never shuffle to meet the (small)
    // query-term side: the scoring join is a BroadcastHashJoin with the
    // qterms side broadcast
    val p = plan("q154_bm25_topk")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q153 incremental minhash: the corpus is never re-shingled — index reuse is real") {
    // The operator's scale claim: signatures are computed for the BATCH only;
    // the corpus contributes its persisted signature index, and corpus TEXT
    // is touched only through the candidate semi-join. FreshCheckpoint makes
    // the final plan string blind to earlier stages, so capture EVERY SQL
    // execution the operator triggers and assert over all of them.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
    import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = java.nio.file.Files.createTempDirectory("q153contract")
    val corpusPath = s"$base/corpus_docs"
    val batchPath = s"$base/batch_docs"
    val sigsPath = s"$base/corpus_sigs"
    docs.filter(col("doc_id") % 5 =!= 0).write.parquet(corpusPath)
    docs.filter(col("doc_id") % 5 === 0).write.parquet(batchPath)
    // the simulated prior run: building the index MAY shingle the corpus —
    // that happens before the listener attaches
    graft.ops.Dedup.minhashSignatures(spark.read.parquet(corpusPath), 8)
      .write.parquet(sigsPath)

    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case e: SparkListenerSQLExecutionStart =>
          captured.add(e.physicalPlanDescription)
        case _ =>
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      graft.ops.Dedup.incrementalMinhash(
          spark.read.parquet(corpusPath), spark.read.parquet(sigsPath),
          spark.read.parquet(batchPath), 8, 2, 0.8)
        .write.format("noop").mode("overwrite").save()
      // listener bus is async: wait until the event stream goes quiet
      var last = -1
      var same = 0
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (same < 4 && System.nanoTime() < deadline) {
        Thread.sleep(250)
        if (captured.size == last) same += 1 else { same = 0; last = captured.size }
      }
    } finally spark.sparkContext.removeSparkListener(listener)

    import scala.jdk.CollectionConverters._
    val plans = captured.asScala.toSeq
    val sigPlans = plans.filter(_.contains("minhash_sigs"))
    assert(sigPlans.nonEmpty, "no captured execution computed signatures at all")
    sigPlans.foreach { p =>
      assert(p.contains(batchPath), s"signature build does not scan the batch:\n$p")
      assert(!p.contains(corpusPath),
        s"corpus docs reached a signature computation — index not reused:\n$p")
    }
    // shingling the BATCH once is the operator's job; shingling that reaches
    // CORPUS text (the verify stage) must be candidate-bounded — the same
    // execution carries the LeftSemi attach of candidate ids
    val corpusShingles = plans
      .filter(p => p.contains("sorted_word_shingles") && p.contains(corpusPath))
    corpusShingles.foreach { p =>
      assert(p.contains("LeftSemi"),
        s"corpus text shingled outside a candidate semi-join:\n$p")
    }
  }

  test("whole-stage codegen covers the scan-agg pipeline") {
    // AQE's pre-execution explain hides codegen stages; plan without it
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // formatted mode marks codegen'd operators with a "*" prefix
      val p = plan("q02_agg_sum_groupby")
      assert(p.contains("* HashAggregate"), p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
