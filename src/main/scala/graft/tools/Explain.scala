package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for representative queries — the feedback
  * loop for scale design: verify filter/projection pushdown reaches the
  * parquet scans, small dims broadcast, and codegen spans stay wide.
  *
  * Usage: Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_scan_filter_project", "q08_join_inner_broadcast",
        "q12_join_multiway", "q13_first_per_key", "q35_dedup_minhash_lsh",
        "q36_ngram_jaccard", "q38_ann_cosine_topk", "q46_window_events",
        "q49_ann_ivf", "q59_asof_join", "q60_range_join")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.Queries.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
