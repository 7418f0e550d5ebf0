package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.graph.Centrality
import graft.ops.{Quantize, Similarity}
import graft.sources.Store

/** Planted-case specs for the round-8 hardening items: the HITS 2^53
  * exactness guard, collision-resistant co-purchase MV keying + file-level
  * staleness, the memoized corpus count behind the hyperplane-cell family,
  * and the magnitude-branched silhouette rescale. */
class Round8Spec extends SparkTestBase {
  import spark.implicits._

  test("hits raises on a 2^53 exactness-envelope breach instead of diverging") {
    // complete directed triangle: scores multiply ~6x per round, so 25
    // rounds pushes hub/auth past 2^53 — the guard must fail loudly
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 2L), (1L, 3L))
      .toDF("src", "dst")
    val v = Seq(1L, 2L, 3L).toDF("id")
    val ex = intercept[Exception] {
      Centrality.hits(v, e, rounds = 25).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("2^53 exact-integer envelope")),
      s"wrong error: $ex")
    // and the sane-parameter path still works on the same graph
    val ok = Centrality.hits(v, e, rounds = 3).collect()
    assert(ok.length === 3)
  }

  test("copurchase MV keys are collision-resistant and path-normalized") {
    // "Aa" and "BB" share a 32-bit String.hashCode (the round-7 keying) —
    // the SHA-256 digest must separate them
    assert("Aa".hashCode === "BB".hashCode)
    assert(Store.dirDigest("/x/Aa") !== Store.dirDigest("/x/BB"))
    // equivalent spellings of one dir collapse to one MV identity
    val abs = Paths.get(s"$testData/sf0.001").toAbsolutePath.normalize.toString
    assert(Store.dirDigest(abs) === Store.dirDigest(
      Paths.get(s"$testData/./sf0.001").toAbsolutePath.normalize.toString))
  }

  test("copurchase MV rebuilds when source files are regenerated in place") {
    val dir = Files.createTempDirectory("copurchase-regen").toString
    def writeLineitem(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("l_orderkey", "l_partkey")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // orders 1: parts {1,2} -> pair (1,2)
    writeLineitem(Seq((1L, 1L), (1L, 2L)))
    val first = Store.copurchase(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(first === Set((1L, 2L)))
    // regenerate the source with different content; bump mtimes well past
    // the marker (filesystem mtime resolution)
    writeLineitem(Seq((1L, 3L), (1L, 4L)))
    val now = System.currentTimeMillis() + 10000
    Files.walk(Paths.get(s"$dir/lineitem.parquet")).forEach { p =>
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(now))
    }
    // a fresh JVM has no memo — simulate by clearing it; the FS staleness
    // walk must then detect the newer part files and rebuild
    Store.resetCopurchaseMemoForTest()
    val second = Store.copurchase(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(second === Set((3L, 4L)), "stale MV served after source regen")
  }

  test("corpusCount memoizes the sizing scan across hyperplane-cell consumers") {
    // unique payload so earlier suites can't have pre-warmed this plan's
    // memo entry
    val salt = System.nanoTime()
    val emb = (0 until 40).map(i =>
        (salt + i, Array.tabulate(8)(d => (i * 8 + d) / 320.0f)))
      .toDF("vec_id", "embedding")
    val before = Similarity.countProbes.get()
    // three consumer compositions over the SAME corpus: one probe total
    Similarity.cellKnn(emb, k = 2)
    Similarity.cellKnn(emb, k = 3)
    Similarity.mutualKnn(emb, k = 2)
    assert(Similarity.countProbes.get() - before === 1,
      "each consumer paid its own corpus count")
    // a different corpus is a different memo entry
    val emb2 = (0 until 7).map(i =>
        (salt + 1000 + i, Array.tabulate(8)(d => (i + d) / 15.0f)))
      .toDF("vec_id", "embedding")
    Similarity.cellKnn(emb2, k = 2)
    assert(Similarity.countProbes.get() - before === 2)
  }

  test("clusterSilhouette keeps micro-unit resolution on small-distance cells") {
    // 1-D corpus, k=2, all distances < 9e12 u^2 -> the multiply-first
    // branch; values are exact binary fractions so float->micro-unit
    // integerization is drift-free
    val emb = Seq(
      (1L, Array(0.0f)), (2L, Array(2.0f)), (3L, Array(0.25f)), (4L, Array(1.75f)))
      .toDF("vec_id", "embedding")
    // final centroids: c1 = 125000 (ids 1,3), c2 = 1875000 (ids 2,4)
    def sU(da: Long, db: Long): Long =
      if (math.max(da, db) < 9000000000000L)
        (db - da) * 1000000L / math.max(1L, math.max(da, db))
      else (db - da) / math.max(1L, math.max(da, db) / 1000000L)
    val s1 = sU(125000L * 125000L, 1875000L * 1875000L)
    val s3 = sU(125000L * 125000L, 1625000L * 1625000L)
    val out = Quantize.clusterSilhouette(emb, k = 2, rounds = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val c1 = out(1L)
    assert(c1._1 === 2L)
    assert(c1._2 === (s1 + s3) / 2)
    assert(c1._3 === math.min(s1, s3))
    // the old div-first rescale collapsed these to db - da raw (clamped
    // divisor 1); the branch must instead land near 10^6 for well-separated
    // tight clusters
    assert(c1._3 > 990000L)
  }
}
