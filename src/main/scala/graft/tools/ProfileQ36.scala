package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for q36 (n-gram Jaccard): grams / df / prefix / candidates /
  * verify — identifies the dominant cost before optimizing. Scratch tool. */
object ProfileQ36 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = 3
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val grams = docs.select(col("doc_id"), col("lang"), col("source"),
      explode(array_distinct(expr(
        s"transform(sequence(1, greatest(length(text) - ${n - 1}, 0)), " +
          s"i -> substring(text, i, $n))"))).as("tok"))
    val gramArrays = grams.groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(sort_array(collect_list(col("tok"))).as("arr"))
    time("gramArrays count")(println(gramArrays.count()))
    val exploded = gramArrays.select(col("doc_id"), col("lang"), col("source"),
      explode(col("arr")).as("tok"))
    val df = exploded.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    time("df count")(println(df.count()))
    val prefix = exploded.join(broadcast(df), Seq("tok"))
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(collect_list(struct(col("df"), col("tok"))).as("toks"))
      .select(col("doc_id"), col("lang"), col("source"),
        explode(expr(s"slice(array_sort(toks), 1, " +
          s"int(floor((1.0d - 0.8) * size(toks)) + 1))")).as("t"))
      .select(col("doc_id"), col("lang"), col("source"), col("t.tok"))
    time("prefix count")(println(prefix.count()))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source") &&
          col("x.tok") === col("y.tok") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    time("candidates count")(println(cand.count()))
    val verified = graft.ops.Dedup.ngramJaccard(docs, 3, 0.8)
    time("verify-only (warm)")(println(verified.count()))
    (1 to 3).foreach { i =>
      time(s"full q36 run$i")(
        println(graft.ops.Dedup.ngramJaccard(docs, 3, 0.8).count()))
    }
    spark.stop()
  }
}
