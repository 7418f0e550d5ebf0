package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Pipeline

/** Delta-scaling probe for [[graft.ops.Pipeline.incrementalRelease]] —
  * the round-11 "cost scales with |delta|, not |corpus|" measurement.
  *
  * Design: the delta is an ABSOLUTE set of documents (moduli over the
  * first-replica id range, doc_id < 10M — present identically at every
  * scale factor of the ScaleUp family), so growing the corpus 10× holds
  * |delta| fixed. The claim under test: incremental time stays ~flat
  * across scale factors while full-recompute time grows with the corpus.
  *
  * Discipline (verify skill): runs are INTERLEAVED and ORDER-SWAPPED
  * (full, inc, inc, full) with per-variant minima, because the box drifts
  * monotonically within a session and JIT warms the first variant.
  * The old snapshot's state is built and fully materialized BEFORE the
  * timed region (FreshCheckpoint is eager) — the increment pays only what
  * a daily run pays.
  *
  * Usage: IncrementalProbe <sfDir>... — one JSON line per dir.
  */
object IncrementalProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    for (dir <- args) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      // fixed-absolute delta: first-replica ids only (< 10M), ~2 % of the
      // first replica — added (% 59) and changed (% 53) docs
      val firstRep = col("doc_id") < 10000000L
      val oldSnap = docs
        .filter(!(firstRep && col("doc_id") % 59 === 0))
        .select(col("doc_id"),
          when(firstRep && col("doc_id") % 53 === 0,
            concat(col("text"), lit(" v1")))
            .otherwise(col("text")).as("text"))
      val st = Pipeline.releaseState(oldSnap) // state materializes eagerly
      st.record.count()
      def inc() = Pipeline.incrementalRelease(st, docs).collect()
      def full() = Pipeline.fullRelease(oldSnap, docs).collect()
      val f1 = timeIt(full()); val i1 = timeIt(inc())
      val i2 = timeIt(inc()); val f2 = timeIt(full())
      val (fs, is) = (math.min(f1, f2), math.min(i1, i2))
      println(f"""{"probe":"incremental_release","sf":"$dir","axis":"corpus","inc_s":$is%.2f,"full_s":$fs%.2f,"full_over_inc":${fs / is}%.2f}""")
    }

    // axis 2: fixed corpus (the last dir), growing delta FRACTION — the
    // increment's cost should track the delta while full recompute is flat
    for ((label, am, cm) <- Seq(("2pct", 101L, 97L), ("17pct", 11L, 13L),
        ("45pct", 3L, 7L))) {
      val dir = args.last
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val oldSnap = docs.filter(col("doc_id") % am =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % cm === 0, concat(col("text"), lit(" v1")))
            .otherwise(col("text")).as("text"))
      val st = Pipeline.releaseState(oldSnap)
      st.record.count()
      def inc() = Pipeline.incrementalRelease(st, docs).collect()
      def full() = Pipeline.fullRelease(oldSnap, docs).collect()
      val f1 = timeIt(full()); val i1 = timeIt(inc())
      val i2 = timeIt(inc()); val f2 = timeIt(full())
      val (fs, is) = (math.min(f1, f2), math.min(i1, i2))
      println(f"""{"probe":"incremental_release","sf":"$dir","axis":"delta","shape":"$label","inc_s":$is%.2f,"full_s":$fs%.2f}""")
    }
    // axis 3: a TEXT-DOMINANT regime (the one the operator exists for —
    // 100 TB means shingle/verify CPU dwarfs orchestration, which at
    // sf0.1/sf1 it does not: both paths there sit on a Spark job-count
    // floor of a few seconds). Synthetic corpus: `n` docs × 300 unique
    // 6-char words (deterministic md5 words, no near-dups), delta = 1 %
    // changed. Full recompute re-shingles everything; the increment
    // shingles 1 %.
    for (n <- Seq(30000L, 120000L)) {
      val docs = spark.range(0L, n, 1L, 32).select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(1), lit(300)),
          i => substring(md5(concat(col("id"), lit(":"), i)), 1, 6)), " ")
          .as("text"))
      val oldSnap = docs.select(col("doc_id"),
        when(col("doc_id") % 101 === 0, concat(col("text"), lit(" v1")))
          .otherwise(col("text")).as("text"))
      val st = Pipeline.releaseState(oldSnap)
      st.record.count()
      def inc() = Pipeline.incrementalRelease(st, docs).collect()
      def full() = Pipeline.fullRelease(oldSnap, docs).collect()
      val f1 = timeIt(full()); val i1 = timeIt(inc())
      val i2 = timeIt(inc()); val f2 = timeIt(full())
      val (fs, is) = (math.min(f1, f2), math.min(i1, i2))
      println(f"""{"probe":"incremental_release","axis":"text_dominant","n_docs":$n,"inc_s":$is%.2f,"full_s":$fs%.2f,"full_over_inc":${fs / is}%.2f}""")
    }
    spark.stop()
  }
}
