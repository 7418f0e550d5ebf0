package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CandCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    sink(docs.select(col("doc_id")))
    t("q264 warmup") { sink(graft.SparkEntry.queries("q264_stream_decontaminate_twin")(spark, sfDir)) }
    val isBench = col("doc_id") % 10 === 0
    val stream = docs.filter(!isBench); val bench = docs.filter(isBench)
    t("bandedDocs stream side only") {
      sink(graft.streaming.NearDupStream.bandedDocs(spark, stream, 8, 2).toDF()) }
    t("bandedDocs bench side only") {
      sink(graft.streaming.NearDupStream.bandedDocs(spark, bench, 8, 2).toDF()) }
    t("full stream twin warm") {
      sink(graft.streaming.DecontaminateStream.fuzzyDecontaminateStream(spark, stream, bench)
        .groupBy(col("drop_id")).agg(count(lit(1)).as("n"), max(col("j_u")), min(col("bench_id")))) }
    spark.stop()
  }
}
