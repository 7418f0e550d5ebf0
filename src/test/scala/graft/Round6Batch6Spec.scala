package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Planted-case specs for the round-6 batch-6 operators: density clusters
  * and embedding-space outliers. */
class Round6Batch6Spec extends SparkTestBase {
  import spark.implicits._

  test("densityClusters separates planted clusters; isolated vector is a singleton") {
    // two tight clusters (ids 1/3.. and 2/11..) seeded one per kmeans cell,
    // plus vec 99 pointing away from both
    val c0 = Seq(1L, 3L, 4L, 5L).map(i => (i, Array(1.0f, 0.001f * i)))
    val c1 = Seq(2L, 11L, 12L, 13L).map(i => (i, Array(0.001f * i, 1.0f)))
    val lone = Seq((99L, Array(-1.0f, -1.0f)))
    val emb = (c0 ++ c1 ++ lone).toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
    val out = Similarity.densityClusters(emb, k = 3, cellK = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(3L)._2 === 1L && byId(5L)._2 === 1L) // cluster of min id 1
    assert(byId(11L)._2 === 2L && byId(13L)._2 === 2L) // cluster of min id 2
    assert(byId(99L)._2 === 99L && byId(99L)._3 === 1L) // singleton
    assert(out.length === 9)
  }

  test("embeddingOutliers flags the planted far point and not the bulk") {
    // one cell (cellK = 1): bulk at radius ~1 around the centroid, one
    // point far out → its dist/median ratio is huge
    val bulk = (1 to 20).map(i => (i.toLong, Array(1.0f + 0.01f * (i % 5), 0.0f)))
    val far = Seq((99L, Array(30.0f, 30.0f)))
    val emb = (bulk ++ far).toDF("vec_id", "embedding").withColumn("label", lit(0))
    val out = Similarity.embeddingOutliers(emb, cut = 4.0, cellK = 1).collect()
    assert(out.map(_.getLong(0)).toSet === Set(99L))
    assert(out.head.getLong(3) > 4000000L)
  }
}
