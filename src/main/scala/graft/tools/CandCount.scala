package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FreshCheckpoint
object CandCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.VectorOps.register(spark)
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    sink(docs.select(col("doc_id")))
    t("FULL q174 warmup") { sink(graft.SparkEntry.queries("q174_containment")(spark, sfDir)) }
    // phase replay of containment(docs, 3, 0.8) -- wait, q174 params?
    val n = 16; val threshold = 0.8
    val hashedGrams = graft.expr.VectorOps.hashedCharNgrams(col("text"), n)
    val p = spark.sparkContext.defaultParallelism
    val gramArrays = t("gramArrays ckpt") { FreshCheckpoint(
      docs.select(col("doc_id"), col("text"))
        .repartition(p, col("doc_id"))
        .select(col("doc_id"), hashedGrams.as("arr"))
        .filter(size(col("arr")) > 0)) }
    val exploded = gramArrays.select(col("doc_id"), explode(col("arr")).as("tok"))
    val dfTab = exploded.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    t("dfTab") { sink(dfTab) }
    val cExt = 8
    val prefix = exploded.join(dfTab, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("df"), col("tok"))).as("toks"))
      .select(col("doc_id").as("ia"), size(col("toks")).cast("long").as("szA"),
        explode(expr(s"slice(array_sort(toks), 1, " +
          s"int(floor((1.0d - $threshold) * size(toks)) + $cExt))")).as("t"))
      .select(col("ia"), col("szA"), col("t.tok"))
    t("prefix") { sink(prefix) }
    val postings = exploded.select(col("doc_id").as("ib"), col("tok"))
      .join(gramArrays.select(col("doc_id").as("ib"),
        size(col("arr")).cast("long").as("szB")), Seq("ib"))
    val slack = floor(lit(1.0d - threshold) * col("szA").cast("double"))
    val cReq = greatest(lit(1L), least(col("szA"), slack + cExt) - slack)
    val joined = prefix.join(postings,
        prefix("tok") === postings("tok") && col("ia") =!= col("ib") &&
          col("szB").cast("double") >= lit(threshold) * col("szA").cast("double"))
    t("join rows count") { println("join_rows=" + joined.count()) }
    val cand = joined.groupBy(col("ia"), col("ib"), col("szA"))
      .agg(count(lit(1)).as("nshared"))
      .filter(col("nshared") >= cReq)
      .select(col("ia"), col("ib"))
    t("cand count") { println("n_cand=" + cand.count()) }
    t("verify (attach+intersect)") { sink(cand
      .join(gramArrays.select(col("doc_id").as("ia"), col("arr").as("arrA")), Seq("ia"))
      .join(gramArrays.select(col("doc_id").as("ib"), col("arr").as("arrB")), Seq("ib"))
      .select(col("ia"), col("ib"),
        graft.expr.VectorOps.sortedLongIntersect(col("arrA"), col("arrB")).as("i"))) }
    spark.stop()
  }
}
