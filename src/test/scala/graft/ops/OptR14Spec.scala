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
}
