package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FreshCheckpoint

/** Round-14 optimization equivalence specs: every rewrite this round must
  * keep the declared queries' results byte-identical, so each internal
  * restructure gets an identity test against the OLD (r13) formulation it
  * replaced, kept here verbatim as the semantic reference. */
class OptR14Spec extends graft.SparkTestBase {

  private def docs: DataFrame =
    spark.read.parquet(s"$testData/sf0.001/documents.parquet")

  /** The pre-r14 impactDriftRecall, verbatim (the r13 per-step sequential
    * chain: per-step FreshCheckpoints, per-step 1-row scalar actions, one
    * pair of scoring passes per step) — the semantic reference for the
    * step-keyed single-chain rewrite. */
  private def oldImpactDriftRecall(docs: DataFrame, steps: Seq[Int],
      modBase: Long, modRemove: Long, keepTop: Int, queryStride: Long,
      topK: Int, dfMin: Long, maxBroadcastQueryTerms: Long): DataFrame = {
    val o = Retrieval.bm25Stats(docs, dfMin)
    val oPost = FreshCheckpoint(
      Retrieval.encodeImpacts(o.tf, o.len, o.idf, o.n, o.sumLen))
    val wTok = Window.partitionBy(col("tok"))
      .orderBy(col("impact_u").desc, col("doc_id"))
    val pruned = FreshCheckpoint(oPost
      .withColumn("prank", row_number().over(wTok))
      .filter(col("prank") <= keepTop).drop("prank"))
    val estQueryTerms = o.sumLen / math.max(queryStride, 1L)
    def qHint(df: DataFrame): DataFrame =
      if (estQueryTerms <= maxBroadcastQueryTerms) broadcast(df)
      else df.hint("shuffle_hash")
    steps.map { u =>
      val survives = !(col("doc_id") % modRemove < u)
      val isEdited = col("doc_id") % modBase < u
      val c = if (u == 0) o else {
        val editedTf = TextAnalysis.tokenGrams(
            docs.filter(survives && isEdited).select(col("doc_id"),
              concat(col("text"), lit(" zzdrift zzdrift zzdrift"))
                .as("text")), 3)
          .select(col("doc_id"), col("gram").as("tok"))
          .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        val ctf = FreshCheckpoint(
          o.tf.filter(survives && !isEdited).unionByName(editedTf))
        val clen = ctf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len"))
        val row = docs.filter(survives).select(col("doc_id"))
          .join(clen, Seq("doc_id"), "left")
          .agg(count(lit(1)).as("n"),
            sum(coalesce(col("len"), lit(0L))).as("sl")).head()
        val cn = row.getLong(0)
        val cSumLen = row.getLong(1)
        val cidf = ctf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
          .filter(col("df") >= dfMin && col("df") * 2 <= lit(cn))
          .select(col("tok"),
            floor(log(lit(1.0) + (lit(cn) - col("df") + lit(0.5)) /
              (col("df") + lit(0.5))) * 1000000d).cast("long").as("idf_u"))
        Retrieval.Bm25Stats(ctf, clen, cidf, cn, cSumLen)
      }
      val qids = docs.filter(survives && col("doc_id") % queryStride === 0)
        .select(col("doc_id").as("query_id"))
      val qgrams = c.tf.join(qHint(qids), col("doc_id") === col("query_id"))
        .select(col("query_id"), col("tok"))
      def topkOf(index: DataFrame, vocab: DataFrame): DataFrame = {
        val qterms = vocab.join(qHint(qgrams), Seq("tok"))
          .select(col("query_id"), col("tok"))
        val scored = index.join(qHint(qterms), Seq("tok"))
          .groupBy(col("query_id"), col("doc_id"))
          .agg(sum(col("impact_u")).as("score_u"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score_u").desc, col("doc_id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= topK)
          .select(col("query_id"), col("doc_id"))
      }
      val cPost = if (u == 0) oPost else FreshCheckpoint(
        Retrieval.encodeImpacts(c.tf, c.len, c.idf, c.n, c.sumLen))
      val fresh = FreshCheckpoint(topkOf(cPost, c.idf))
      val froz = topkOf(pruned, o.idf)
      val en = fresh.agg(count(lit(1)).as("n_exact"))
      val eh = fresh.join(froz, Seq("query_id", "doc_id"))
        .agg(count(lit(1)).as("n_hit"))
      val gauge = o.idf.withColumnRenamed("idf_u", "old_idf")
        .join(c.idf.withColumnRenamed("idf_u", "cur_idf"), Seq("tok"),
          "full_outer")
        .agg(
          sum(when(col("old_idf").isNotNull && col("cur_idf").isNotNull &&
            col("old_idf") =!= col("cur_idf"), 1L).otherwise(0L))
            .as("n_terms_drifted"),
          sum(when(col("old_idf").isNull, 1L).otherwise(0L))
            .as("n_terms_new"),
          sum(abs(coalesce(col("cur_idf"), lit(0L)) -
            coalesce(col("old_idf"), lit(0L)))).as("idf_drift_total"))
      val edited = docs.agg(
        sum(when(col("doc_id") % modBase < u &&
          !(col("doc_id") % modRemove < u), 1L).otherwise(0L))
          .as("n_edited"),
        sum(when(col("doc_id") % modRemove < u, 1L).otherwise(0L))
          .as("n_removed"))
      en.crossJoin(broadcast(eh)).crossJoin(broadcast(gauge))
        .crossJoin(broadcast(edited))
        .select(lit(u.toLong).as("step"), col("n_removed"),
          col("n_edited"), col("n_terms_drifted"), col("n_terms_new"),
          col("idf_drift_total"), col("n_exact"), col("n_hit"),
          when(col("n_exact") > 0,
            expr("n_hit * 1000000 div n_exact")).as("recall_u"))
    }.reduce(_ unionByName _)
  }

  /** The pre-r14 dsirGateDrift, verbatim (r13 per-step sequential chain) —
    * the semantic reference for the step-keyed rewrite. */
  private def oldDsirGateDrift(docs: DataFrame, steps: Seq[Int],
      modBase: Long, targetSource: String, buckets: Int,
      thresholdU: Option[Long]): DataFrame = {
    def lamOf(model: DataFrame): (DataFrame, DataFrame) = {
      val totals = model.agg(sum(col("cnt_raw")).as("n_raw"),
        sum(col("cnt_tgt")).as("n_tgt"))
      val lamU = floor(log(col("cnt_tgt").cast("double") + 1d) * 1000000)
        .cast("long") -
        floor(log(col("n_tgt").cast("double") + buckets) * 1000000)
          .cast("long") -
        floor(log(col("cnt_raw").cast("double") + 1d) * 1000000)
          .cast("long") +
        floor(log(col("n_raw").cast("double") + buckets) * 1000000)
          .cast("long")
      (FreshCheckpoint(model.crossJoin(broadcast(totals))
        .select(col("b"), lamU.as("lam_u"))),
        totals.select(
          (floor(log(col("n_raw").cast("double") + buckets) * 1000000)
            .cast("long") -
            floor(log(col("n_tgt").cast("double") + buckets) * 1000000)
              .cast("long")).as("lam_default")))
    }
    val feats0 = FreshCheckpoint(TrainingData.dsirFeatures(docs, buckets))
    val (fLam, fDef) = lamOf(TrainingData.dsirModel(feats0, targetSource))
    val w0 = feats0.join(broadcast(fLam), Seq("b"), "left")
      .crossJoin(broadcast(fDef))
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * coalesce(col("lam_u"), col("lam_default")))
        .as("w"))
    val thr = thresholdU match {
      case Some(t) => fDef.select(lit(t).as("threshold_u"))
      case None => docs.select(col("doc_id"))
        .join(w0, Seq("doc_id"), "left")
        .agg(sum(coalesce(col("w"), lit(0L))).as("sw"),
          count(lit(1)).as("n"))
        .select(expr("(sw + 1000000000 * n) div n - 1000000000")
          .as("threshold_u"))
    }
    steps.map { u =>
      val isEdited = col("doc_id") % modBase < u &&
        col("source") =!= targetSource
      val feats = if (u == 0) feats0 else FreshCheckpoint(
        feats0.filter(!isEdited).unionByName(
          TrainingData.dsirFeatures(docs.filter(isEdited)
            .select(col("doc_id"), col("source"),
              concat(col("text"),
                lit(" zzdrift gate zzdrift gate zzdrift")).as("text")),
            buckets)))
      val (cLam, cDef) =
        if (u == 0) (fLam, fDef)
        else lamOf(TrainingData.dsirModel(feats, targetSource))
      def wOf(lam: DataFrame, dflt: DataFrame, name: String): DataFrame =
        feats.join(broadcast(lam), Seq("b"), "left")
          .crossJoin(broadcast(dflt))
          .groupBy(col("doc_id"))
          .agg(sum(col("c") *
            coalesce(col("lam_u"), col("lam_default"))).as(name))
      val scored =
        if (u == 0)
          docs.select(col("doc_id"))
            .join(wOf(fLam, fDef, "wf"), Seq("doc_id"), "left")
            .withColumn("wc", col("wf"))
        else
          docs.select(col("doc_id"))
            .join(wOf(fLam, fDef, "wf"), Seq("doc_id"), "left")
            .join(wOf(cLam, cDef, "wc"), Seq("doc_id"), "left")
      val decided = scored
        .crossJoin(broadcast(thr))
        .select(col("threshold_u"),
          (coalesce(col("wf"), lit(0L)) >= col("threshold_u")).as("adm_f"),
          (coalesce(col("wc"), lit(0L)) >= col("threshold_u")).as("adm_c"))
        .groupBy(col("threshold_u"))
        .agg(
          sum(when(col("adm_f"), 1L).otherwise(0L)).as("n_admit_frozen"),
          sum(when(col("adm_c"), 1L).otherwise(0L)).as("n_admit_fresh"),
          sum(when(col("adm_f") && col("adm_c"), 1L).otherwise(0L))
            .as("n_both"),
          sum(when(col("adm_f") && !col("adm_c"), 1L).otherwise(0L))
            .as("n_false_admit"),
          sum(when(!col("adm_f") && col("adm_c"), 1L).otherwise(0L))
            .as("n_missed"))
      val gauge = fLam.withColumnRenamed("lam_u", "fl")
        .join(cLam.withColumnRenamed("lam_u", "cl"), Seq("b"),
          "full_outer")
        .crossJoin(broadcast(fDef.withColumnRenamed("lam_default", "fd")))
        .crossJoin(broadcast(cDef.withColumnRenamed("lam_default", "cd")))
        .select((coalesce(col("fl"), col("fd")) -
          coalesce(col("cl"), col("cd"))).as("dl"))
        .agg(sum(when(col("dl") =!= 0L, 1L).otherwise(0L))
            .as("n_buckets_drifted"),
          coalesce(sum(abs(col("dl"))), lit(0L)).as("lambda_drift_total"))
      val edited = docs.agg(sum(when(col("doc_id") % modBase < u &&
          col("source") =!= targetSource, 1L).otherwise(0L))
        .as("n_edited"))
      decided.crossJoin(broadcast(gauge)).crossJoin(broadcast(edited))
        .select(lit(u.toLong).as("step"), col("threshold_u"),
          col("n_edited"),
          col("n_buckets_drifted"), col("lambda_drift_total"),
          col("n_admit_frozen"), col("n_admit_fresh"), col("n_both"),
          col("n_false_admit"), col("n_missed"),
          expr("n_both * 1000000 div greatest(n_admit_fresh, 1)")
            .as("agree_u"))
    }.reduce(_ unionByName _)
  }

  test("dsirGateDrift: the step-keyed single chain emits the OLD per-step " +
    "sequential chain's exact rows (q324 identity), default and " +
    "non-default step sets") {
    for (steps <- Seq(Seq(0, 1, 2, 3), Seq(3))) {
      val nu = TrainingData.dsirGateDrift(docs, steps = steps,
        modBase = 7, targetSource = "src7", buckets = 4096)
      val old = oldDsirGateDrift(docs, steps, 7L, "src7", 4096, None)
      assert(nu.exceptAll(old).isEmpty && old.exceptAll(nu).isEmpty,
        s"dsirGateDrift rows diverged at steps=$steps")
      assert(nu.count() === steps.size.toLong)
      assert(nu.columns.toSeq === old.columns.toSeq)
    }
  }

  test("impactDriftRecall: the step-keyed single chain emits the OLD " +
    "per-step sequential chain's exact rows (q323 identity), default and " +
    "non-default step sets") {
    for (steps <- Seq(Seq(0, 1, 2, 3), Seq(2))) {
      val nu = Retrieval.impactDriftRecall(docs, steps = steps,
        modBase = 7, keepTop = 4, queryStride = 251, topK = 5, dfMin = 2)
      val old = oldImpactDriftRecall(docs, steps, 7L, 11L, 4, 251L, 5, 2L,
        2000000L)
      assert(nu.exceptAll(old).isEmpty && old.exceptAll(nu).isEmpty,
        s"impactDriftRecall rows diverged at steps=$steps")
      assert(nu.count() === steps.size.toLong)
      assert(nu.columns.toSeq === old.columns.toSeq)
    }
  }

  test("tokenTfs / tokenGramsDistinct: per-row rollups emit the OLD " +
    "tokenGrams -> groupBy/distinct relations exactly (incl. edge docs)") {
    import spark.implicits._
    val edge = Seq(
      (900001L, "one"), (900002L, ""), (900003L, "   "),
      (900004L, "a b"), (900005L, "a b c a b c a b"),
      (900006L, "Tabs\tand  Spaces\nmix")).toDF("doc_id", "text")
    val both = docs.select(col("doc_id"), col("text")).unionByName(edge)
    for (n <- Seq(1, 3, 8)) {
      val oldTf = TextAnalysis.tokenGrams(both, n)
        .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("tf"))
      val newTf = TextAnalysis.tokenTfs(both, n)
        .select(col("doc_id"), col("gram"), col("tf"))
      assert(newTf.exceptAll(oldTf).isEmpty && oldTf.exceptAll(newTf).isEmpty,
        s"tokenTfs diverged at n=$n")
      val oldD = TextAnalysis.tokenGrams(both, n)
        .select(col("doc_id"), col("gram")).distinct()
      val newD = TextAnalysis.tokenGramsDistinct(both, n)
        .select(col("doc_id"), col("gram"))
      assert(newD.exceptAll(oldD).isEmpty && oldD.exceptAll(newD).isEmpty,
        s"tokenGramsDistinct diverged at n=$n")
    }
    // repetitionRatio's row-local form vs the old per-doc rollup
    val oldRep = TextAnalysis.tokenGrams(both, 2)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("total_grams"),
        countDistinct(col("gram")).as("uniq_grams"))
      .select(col("doc_id"), col("total_grams"), col("uniq_grams"),
        (floor((lit(1.0) - col("uniq_grams").cast("double")
          / col("total_grams").cast("double")) * 1000000d) / 1000000d)
          .as("rep_ratio"))
    val newRep = TextAnalysis.repetitionRatio(both, 2)
    assert(newRep.exceptAll(oldRep).isEmpty && oldRep.exceptAll(newRep).isEmpty,
      "repetitionRatio diverged from the old rollup form")
  }

  test("ivfPqDriftRecall: the driver-local drift replay agrees with the " +
    "distributed chain row-for-row (q320 identity, incl. step 0 and " +
    "non-default steps)") {
    val emb = spark.read.parquet(s"$testData/sf0.001/embeddings.parquet")
    for (steps <- Seq(Seq(0, 1, 2, 3), Seq(2))) {
      val loc = Quantize.ivfPqDriftRecall(emb, steps = steps, nQueries = 3,
        topK = 5, dim = 64)
      val dist = Quantize.ivfPqDriftRecall(emb, steps = steps, nQueries = 3,
        topK = 5, dim = 64, localCutoff = 0L)
      assert(loc.columns.toSeq === dist.columns.toSeq)
      val l = loc.collect().map(_.toSeq).sortBy(_.head.toString)
      val d = dist.collect().map(_.toSeq).sortBy(_.head.toString)
      assert(l.toSeq === d.toSeq, s"drift replay diverged at steps=$steps")
    }
  }
}
