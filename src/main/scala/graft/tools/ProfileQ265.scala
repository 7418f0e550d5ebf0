package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FreshCheckpoint

/** Scratch phase profiler for the release pipeline (not a query path). */
object ProfileQ265 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    sink(docs.select(col("doc_id")))
    // warm pass
    t("FULL q265 warm-up") {
      sink(graft.SparkEntry.queries("q265_dataset_release")(spark, sfDir))
    }
    // stage-by-stage replay of runStages + datasetRelease composition
    val benchMod = 7
    val raw = docs.select(col("doc_id"), col("lang"), col("text"))
    val kept1 = t("1 filterCascade") { FreshCheckpoint(raw.join(
      TextAnalysis.filterCascade(docs).filter(col("keep")).select(col("doc_id")),
      Seq("doc_id"), "leftsemi")) }
    val docs2 = t("2 lineDedup") { FreshCheckpoint(
      kept1.select(col("doc_id"), col("lang"))
        .join(TextAnalysis.lineDedup(kept1, sep = " line ", maxOcc = 2)
          .select(col("doc_id"), col("text_dedup").as("text")), Seq("doc_id"))) }
    val pairsAll = t("3 minhashLsh") { FreshCheckpoint(
      Dedup.minhashLsh(docs2, numHashes = 8, rowsPerBand = 2, threshold = 0.5)) }
    val pairs08 = pairsAll.filter(col("jaccard") >= 0.8).select(col("a"), col("b"))
    val docs3 = t("3b clusterKeepers") { FreshCheckpoint(docs2.join(
      Dedup.clusterKeepers(docs2, pairs08).filter(col("keep")).select(col("doc_id")),
      Seq("doc_id"), "leftsemi")) }
    val isBench = col("doc_id") % benchMod === 0
    val docs4 = t("4 decontaminate") { FreshCheckpoint(docs3.filter(!isBench)
      .join(TextAnalysis.decontaminate(docs3, isBench, n = 8)
        .select(col("train_doc").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")) }
    val ids4 = docs4.select(col("doc_id"))
    val pairs4 = pairsAll.select(col("a"), col("b"))
      .join(ids4.select(col("doc_id").as("a")), Seq("a"), "leftsemi")
      .join(ids4.select(col("doc_id").as("b")), Seq("b"), "leftsemi")
    val split = t("5 leakageSafeSplit") {
      FreshCheckpoint(TrainingData.leakageSafeSplit(docs4, pairs4)) }
    val train = docs4.join(split.filter(col("split") === "train")
      .select(col("doc_id")), Seq("doc_id"), "leftsemi")
    val trs = train.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    val trainIds = train.select(col("doc_id"))
    val pairsTrain = pairs4
      .join(trainIds.select(col("doc_id").as("a")), Seq("a"), "leftsemi")
      .join(trainIds.select(col("doc_id").as("b")), Seq("b"), "leftsemi")
    t("6 datasetCard") { sink(TrainingData.datasetCard(trs, pairsTrain)) }
    t("7 shardManifest agg") { sink(TrainingData.shardManifest(train, 2048, "lang", 128)
      .agg(count(lit(1)).as("n"), sum(col("n_docs")), sum(col("sum_tokens")))) }
    t("8 splitLeakageAudit") { sink(TrainingData
      .splitLeakageAuditWith(docs4, pairs4, split.select(col("doc_id"), col("split")))
      .agg(sum(col("n_doc_pairs")), sum(col("n_shared_grams")), sum(col("n_straddle")))) }
    t("9 funnel counts x5") {
      Seq(raw, kept1, docs3, docs4, train).foreach(df => sink(df.agg(count(lit(1))))) }
    t("FULL q265 warm") {
      sink(graft.SparkEntry.queries("q265_dataset_release")(spark, sfDir))
    }
    spark.stop()
  }
}
