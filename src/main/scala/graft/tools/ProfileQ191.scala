package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for the Ed-Join family (not a query path). */
object ProfileQ191 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    sink(part.select(col("p_partkey")))
    val cand = t("editDistanceCandidates") {
      val c = graft.ops.Dedup.editDistanceCandidates(
        part, "p_partkey", "p_name", Seq("p_type"), 1)
      sink(c); c
    }
    t("candidates count") { println("  n_cand=" + cand.count()) }
    t("verify (levenshtein over candidates)") {
      sink(cand.withColumn("dist",
        levenshtein(col("sa"), col("sb"), 1).cast("long"))
        .filter(col("dist") >= 0))
    }
    t("FULL q191 warm") {
      sink(graft.SparkEntry.queries("q191_record_linkage")(spark, sfDir))
    }
    t("FULL q200 warm") {
      sink(graft.SparkEntry.queries("q200_canonical_parts")(spark, sfDir))
    }
    spark.stop()
  }
}
