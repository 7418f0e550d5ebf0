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

  test("piiScrub counts and masks each class independently") {
    val docs = Seq(
      (1L, "mail Bob.Smith+x@corp-mail.example.org and call 415-555-0133 now"),
      (2L, "ssn 123-45-6789 next to account 9876543210 and 555.123.4567"),
      (3L, "nothing sensitive here at all"),
      // 8-digit run: too short for the digit class; 3-3-4 with mixed
      // separators still phone-shaped
      (4L, "ref 12345678 dial 800 555 0199"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out(1L)._1 === 1L && out(1L)._2 === 1L && out(1L)._3 === 0L &&
      out(1L)._4 === 0L && out(1L)._5 === 2L)
    assert(out(2L) === ((0L, 1L, 1L, 1L, 3L,
      ("ssn [SSN] next to account [ID] and [PHONE]").length.toLong)))
    assert(out(3L) === ((0L, 0L, 0L, 0L, 0L,
      "nothing sensitive here at all".length.toLong)))
    assert(out(4L)._2 === 1L && out(4L)._4 === 0L)
  }

  test("perceptualNearDups pairs a brightness-shifted payload with its original") {
    // payloads whose byte-fold GRADIENTS agree: doc 2 = doc 1 with every
    // byte +1 (uniform brightness shift -> identical dHash, hamming 0);
    // doc 3 is unrelated
    val base = (0 until 240).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val shifted = base.map(c => (c + 1).toChar)
    val media = Seq((1L, base), (2L, shifted),
      (3L, (0 until 240).map(i => ('a' + (i * i + 3) % 26).toChar).mkString))
      .toDF("doc_id", "text")
    val out = graft.ops.Multimodal.perceptualNearDups(
      graft.ops.Multimodal.ingest(media)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.contains((1L, 2L)) && out((1L, 2L)) === 0L)
    assert(!out.keySet.exists(p => p._1 === 3L || p._2 === 3L))
  }

  test("canonicalParts merges a transitive match chain to one canonical id") {
    // A~B and B~C are match-band; A~C alone is distance 2 (never a
    // candidate) — transitivity must still put all three in one entity
    val parts = Seq(
      (10L, "widget alpha nine", "T1", "B1", 5L, 100.0),
      (11L, "widget alpha nin", "T1", "B1", 5L, 100.2),
      (12L, "widget alpha ni", "T1", "B1", 5L, 100.4),
      (20L, "other thing entirely", "T1", "B2", 9L, 500.0))
      .toDF("p_partkey", "p_name", "p_type", "p_brand", "p_size",
        "p_retailprice")
    val out = graft.ops.RecordLinkage.canonicalParts(parts).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(10L) === ((10L, 3L, true)))
    assert(out(11L) === ((10L, 3L, false)))
    assert(out(12L) === ((10L, 3L, false)))
    assert(out(20L) === ((20L, 1L, true)))
  }

  test("thresholdChoice picks the most aggressive cut inside the budget and calibratedDedup commits it") {
    // two exact-dup groups (jaccard 1.0, band 10) + one unrelated doc:
    // docs touched at cut<=10 = 4 of 5 (800000 u). A 900000-u budget
    // admits every cut -> chosen = 0; a 100000-u budget admits none ->
    // fallback 10.
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "one two three four five six seven eight nine ten eleven"
    val docs = Seq((1L, t1), (2L, t1), (3L, t2), (4L, t2),
      (5L, "completely different words never repeat anywhere else at all"))
      .toDF("doc_id", "text")
    val loose = graft.ops.Dedup.thresholdChoice(docs, targetFracU = 900000)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(loose.size === 11)
    assert(loose(0L)._4 === true && loose(10L)._4 === false)
    assert(loose(10L)._1 === 2L && loose(10L)._2 === 4L && loose(10L)._3 === 800000L)
    val tight = graft.ops.Dedup.thresholdChoice(docs, targetFracU = 100000)
      .collect().filter(_.getBoolean(4)).map(_.getLong(0))
    assert(tight.toSeq === Seq(10L), "no-cut-fits must fall back to 10")
    // commit: at the 800000-u budget the chosen cut dedups both groups —
    // keepers are the min ids (equal token counts tie-break)
    val dd = graft.ops.Dedup.calibratedDedup(docs, targetFracU = 800000)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(3), r.getLong(4)))).toMap
    assert(dd(1L)._2 === true && dd(2L) === ((1L, false, dd(1L)._3)))
    assert(dd(3L)._2 === true && dd(4L)._1 === 3L && dd(4L)._2 === false)
    assert(dd(5L)._2 === true)
  }

  test("pretrainCorpus funnel: each stage drops exactly the planted casualties") {
    val good1 = "the quick brown fox jumps over a lazy dog and then runs far " +
      "away to find some food of great taste in the woods tonight"
    val good2 = "a calm river flows past the old stone mill and carries tiny " +
      "boats of leaves to the quiet valley below the northern hills"
    val bench = "every quiz item lists four answer choices and the correct " +
      "letter sits at the end of each line so all graders can mark it"
    // shares the 8-token span "lists four answer choices and the correct
    // letter" with the bench doc -> decontaminated
    val leaky = "my training doc lists four answer choices and the correct " +
      "letter too which is exactly the kind of leak a pipeline must catch"
    val docs = Seq(
      (1L, "en", "tiny"), // cascade reject (too_short)
      (2L, "en", good1), (3L, "en", good1), // exact dups -> keeper 2
      (4L, "en", leaky),
      (5L, "en", good2),
      (6L, "de", good2 + " and some extra german flavored words follow here"),
      (7L, "en", bench)) // bench slice (id % 7 == 0)
      .toDF("doc_id", "lang", "text")
    val out = graft.ops.Pipeline.pretrainCorpus(docs).collect()
    assert(out.nonEmpty, "no train docs survived — repick planted ids")
    val r0 = out.head
    def c(name: String) = r0.getLong(r0.fieldIndex(name))
    assert(c("n_raw") === 7L)
    assert(c("n_cascade") === 6L, "only the too_short doc should fall")
    assert(c("n_dedup") === 5L, "exactly one dup copy should fall")
    assert(c("n_clean") === 3L, "bench doc leaves, leaky doc decontaminated")
    val packedDocs = out.map(r => r.getLong(r.fieldIndex("n_docs"))).sum
    assert(c("n_train") === packedDocs, "packed bins must cover the train split")
    assert(c("n_train") >= 1L && c("n_train") <= 3L)
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
