package graft.tools

import org.apache.spark.sql.SparkSession

/** Repro for the q36 first-run-in-session premium: run a query K times with
  * Bench-identical session resets between runs, optionally after a sf0.001
  * warm pass, and print each timing. Scratch tool. */
object ProfileWarm {
  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("q36_ngram_jaccard")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val warm = args.lift(2).forall(_ == "warm")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def reset(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def runOne(dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(qname)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      reset()
      sec
    }
    if (warm) {
      val w = runOne("/root/testdata/sf0.001")
      println(f"PROFILE warm-sf0.001: $w%.2f s")
    }
    (1 to reps).foreach { i =>
      println(f"PROFILE $qname run$i: ${runOne(sfDir)}%.2f s")
    }
    spark.stop()
  }
}
