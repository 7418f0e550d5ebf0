package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FreshCheckpoint

/** Scratch phase profiler for q320 internals (not part of any query path). */
object ProfileQ320 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expr.VectorOps.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def dotA(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.expr.VectorOps.vectorDot(a, b)
    // warm-up
    emb.select(col("vec_id")).write.format("noop").mode("overwrite").save()
    val (nCells, m, k, subDim) = (8, 16, 32, 4)
    val vecs = t("vecs ckpt") { FreshCheckpoint(
      emb.select(col("vec_id"),
          transform(col("embedding"),
            v => floor(v.cast("double") * 1000000d).cast("double")).as("xs"))
        .withColumn("xx", dotA(col("xs"), col("xs")))) }
    val firstC = vecs.select(col("vec_id")).orderBy(col("vec_id")).limit(nCells)
    val coarseArr = t("coarseArr ckpt") { FreshCheckpoint(
      vecs.join(broadcast(firstC), Seq("vec_id"))
        .select(col("vec_id").as("cell"), col("xs").as("cxs"), col("xx").as("cc"))) }
    val vcell = t("vcell ckpt") { FreshCheckpoint(
      vecs.crossJoin(broadcast(coarseArr))
        .select(col("vec_id"),
          (col("xx") + col("cc") - lit(2d) * dotA(col("xs"), col("cxs")))
            .cast("long").as("cdist"), col("cell"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("cdist"), col("cell"))).as("mn"))
        .select(col("vec_id"), col("mn.cell").as("cell"))) }
    val rivArr = t("rivArr ckpt") { FreshCheckpoint(
      vecs.join(vcell, Seq("vec_id"))
        .join(broadcast(coarseArr.select(col("cell"), col("cxs"))), Seq("cell"))
        .select(col("vec_id"), col("cell"),
          posexplode(transform(
            sequence(lit(0), (size(col("xs")) / subDim).cast("int") - 1),
            s => slice(zip_with(col("xs"), col("cxs"), (a, b) => a - b),
              s * subDim + 1, lit(subDim)))).as(Seq("sub", "rxs")))
        .select(col("vec_id"), col("sub").cast("long").as("sub"), col("rxs"))
        .withColumn("rr", dotA(col("rxs"), col("rxs")))) }
    def assignPq(centsArr: org.apache.spark.sql.DataFrame) =
      rivArr.join(broadcast(centsArr), Seq("sub"))
        .select(col("vec_id"), col("sub"), col("cid"),
          (col("rr") + col("cc") - lit(2d) * dotA(col("rxs"), col("cxs")))
            .cast("long").as("dist"))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min(struct(col("dist"), col("cid"))).as("mn"))
        .select(col("vec_id"), col("sub"), col("mn.cid").as("cid"))
    def update(assigned: org.apache.spark.sql.DataFrame) =
      assigned.join(rivArr, Seq("vec_id", "sub"))
        .select(col("cid"), col("sub"), posexplode(col("rxs")).as(Seq("dl", "x")))
        .groupBy(col("cid"), col("sub"), col("dl"))
        .agg(floor(sum(col("x")) / count(lit(1))).cast("long").as("cx"))
        .groupBy(col("cid"), col("sub"))
        .agg(array_sort(collect_list(struct(col("dl"), col("cx")))).as("p"))
        .select(col("cid"), col("sub"),
          expr("transform(p, q -> CAST(q.cx AS DOUBLE))").as("cxs"))
        .withColumn("cc", dotA(col("cxs"), col("cxs")))
    val initK = vecs.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(nCells + k).orderBy(col("vec_id").desc).limit(k)
    var centsArr = rivArr.join(broadcast(initK), Seq("vec_id"))
      .select(col("vec_id").as("cid"), col("sub"), col("rxs").as("cxs"),
        col("rr").as("cc"))
    centsArr = t("round1 ckpt") { FreshCheckpoint(update(assignPq(centsArr))) }
    centsArr = t("round2 ckpt") { FreshCheckpoint(update(assignPq(centsArr))) }
    val iv = t("iv perdim ckpt") { FreshCheckpoint(
      vecs.select(col("vec_id"), posexplode(col("xs")).as(Seq("d", "xd")))
        .select(col("vec_id"), col("d").cast("long").as("d"),
          col("xd").cast("long").as("x"))) }
    val codes = t("codes ckpt") { FreshCheckpoint(assignPq(centsArr)) }
    println("PHASE done 0.0 s")
    spark.stop()
  }
}
