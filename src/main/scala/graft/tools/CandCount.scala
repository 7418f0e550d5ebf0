package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CandCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.VectorOps.register(spark)
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
    import graft.expr.VectorOps._
    val d = 1
    val base = part.select(col("p_partkey").as("pk"), col("p_name").as("s"),
      length(col("p_name")).as("len"), charHist64(col("p_name")).as("hist"),
      col("p_type"))
    val segs = base.select(col("pk"), col("len"), col("hist"), col("p_type"),
      explode(passSegKeys(col("s"), d)).as("key"))
    val probes = base.select(col("pk"), col("len"), col("hist"), col("p_type"),
      explode(passProbeKeys(col("s"), d)).as("key"))
    val joinRows = t("join rows (key+block only)") {
      segs.as("x").join(probes.as("y"),
        col("x.key") === col("y.key") && col("x.p_type") === col("y.p_type") &&
        col("x.pk") < col("y.pk")).count() }
    println(s"join_rows=$joinRows")
    val postFilter = t("post len+hist filter") {
      segs.as("x").join(probes.as("y"),
        col("x.key") === col("y.key") && col("x.p_type") === col("y.p_type") &&
        col("x.pk") < col("y.pk") &&
        abs(col("x.len") - col("y.len")) <= d &&
        histL1(col("x.hist"), col("y.hist")) <= 2 * d).count() }
    println(s"post_filter_rows=$postFilter")
    spark.stop()
  }
}
