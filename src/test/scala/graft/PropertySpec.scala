package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{AsOf, RangeJoin, TextAnalysis, TrainingData}

/** Property-based checks (SURVEY §5.3) for the composed join operators:
  * generated inputs, equality with the naive formulation. (Raw ScalaCheck
  * generators driven from fixed seeds — the scalatest bridge artifact is not
  * in the offline cache.) */
class PropertySpec extends SparkTestBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: bucketed range join equals naive for random intervals/widths") {
    import spark.implicits._
    val gen = for {
      seed <- Gen.choose(0L, 1000000L)
      width <- Gen.oneOf(1.0, 7.5, 40.0, 333.0)
      span <- Gen.choose(1, 60)
    } yield (seed, width, span)
    samples(gen, 5).foreach { case (seed, width, span) =>
      val points = spark.range(0, 300)
        .select($"id".as("pid"), (($"id" * 31 + seed) % 500).cast("double").as("v"))
      val intervals = spark.range(0, 80)
        .select($"id".as("iid"), (($"id" * 13 + seed) % 480).cast("double").as("lo"))
        .withColumn("hi", $"lo" + span)
      val got = RangeJoin.bucketed(points, intervals, "v", "lo", "hi", width)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = points.join(intervals, $"v" >= $"lo" && $"v" <= $"hi")
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"seed=$seed width=$width span=$span")
    }
  }

  test("property: as-of join equals per-row latest-at-or-before scan") {
    import java.sql.Timestamp
    import spark.implicits._
    samples(Gen.choose(0L, 100000L), 5).foreach { seed =>
      val lts = (0 until 60).map(i => (i.toLong, (i * 17 + seed) % 5L,
        new Timestamp(((i * 37 + seed) % 200) * 1000L)))
      val rts = (0 until 40).map(i => ((i * 23 + seed) % 5L,
        new Timestamp(((i * 11 + seed) % 200) * 1000L), 1000L + i))
      val left = lts.toDF("event_id", "user_id", "ts")
      val right = rts.toDF("user_id", "ts", "payload_id")
      val got = AsOf.joinBackward(left, right, "user_id", "ts").collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[java.lang.Long]("asof_payload_id")).map(_.toLong)).toMap
      // naive reference: per left row, max-(ts, payload_id) right row at/before
      val want = lts.map { case (eid, u, t) =>
        val cands = rts.filter(r => r._1 == u && !r._2.after(t))
        eid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(r => (r._2.getTime, r._3))._3))
      }.toMap
      assert(got === want, s"seed=$seed")
    }
  }

  test("property: line dedup reassembly is the identity below the threshold") {
    import spark.implicits._
    // random multi-line docs from a small segment alphabet (forces repeats)
    val segGen = Gen.nonEmptyListOf(Gen.oneOf("aa", "bb", "cc", "dd", "e f", ""))
    val docsGen = Gen.nonEmptyListOf(segGen).map(_.take(30))
    samples(docsGen, 3).foreach { segLists =>
      val docs = segLists.zipWithIndex
        .map { case (segs, i) => (i.toLong, segs.mkString("\n")) }
        .toDF("doc_id", "text")
      // maxOcc = ∞ → nothing dropped → text_dedup must equal the input text
      val out = TextAnalysis.lineDedup(docs, "\n", maxOcc = Long.MaxValue)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      docs.collect().foreach { r =>
        val (nl, nk, txt) = out(r.getLong(0))
        assert(nl === nk, "nothing may be dropped below the threshold")
        assert(txt === r.getString(1), "reassembly must preserve the document")
      }
      // at any threshold: kept-count totals equal total minus dropped copies,
      // and every surviving doc's text is a subsequence of the original lines
      val strict = TextAnalysis.lineDedup(docs, "\n", maxOcc = 1)
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      docs.collect().foreach { r =>
        val orig = r.getString(1).split("\n", -1).toSeq
        val kept = strict(r.getLong(0)) match {
          case "" => Seq.empty
          case s => s.split("\n", -1).toSeq
        }
        // subsequence check: kept lines appear in orig order
        val it = orig.iterator
        assert(kept.forall(k => it.contains(k)),
          s"kept lines not an ordered subsequence: $kept vs $orig")
      }
    }
  }

  test("property: packing bins cover every doc once; splits partition any corpus") {
    import spark.implicits._
    val gen = for {
      seed <- Gen.choose(0L, 100000L)
      nDocs <- Gen.choose(5, 400)
      budget <- Gen.oneOf(50, 500, 8192)
    } yield (seed, nDocs, budget)
    samples(gen, 5).foreach { case (seed, nDocs, budget) =>
      val docs = spark.range(0, nDocs)
        .select($"id".as("doc_id"),
          concat_ws(" ", (0 to 20).map(i =>
            when(($"id" * 7 + i + seed) % 3 === 0, lit(s"w$i")).otherwise(lit(""))): _*)
            .as("text"))
        .withColumn("lang", concat(lit("l"), ($"doc_id" % 3).cast("string")))
      // shardDocs = 64 so the skew-bounding shard dimension is exercised
      // (up to 400 docs → multiple shards per lang)
      val bins = TrainingData.sequencePacking(docs, budget, "lang", shardDocs = 64)
      assert(bins.agg(sum("n_docs")).head().getLong(0) === nDocs.toLong,
        s"seed=$seed: bins must cover every doc exactly once")
      // bin ids are dense from 0 within each (lang, shard) window partition
      bins.groupBy($"lang", $"shard").agg(min("bin").as("mn"), max("bin").as("mx"),
          count(lit(1)).as("k"))
        .collect().foreach { r =>
          assert(r.getLong(2) === 0L && r.getLong(3) === r.getLong(4) - 1,
            s"seed=$seed lang=${r.getString(0)} shard=${r.getLong(1)}: bins not dense")
        }
      // no window partition exceeds the shard bound, whatever the lang skew
      val biggest = bins.groupBy($"lang", $"shard").agg(sum("n_docs").as("nd"))
        .agg(max("nd")).head().getLong(0)
      assert(biggest <= 64L, s"seed=$seed: a window partition exceeds shardDocs")
      val split = TrainingData.hashSplit(docs)
      assert(split.count() === nDocs.toLong)
      assert(split.groupBy("doc_id").count().filter($"count" > 1).count() === 0L,
        s"seed=$seed: split must assign each doc exactly once")
    }
  }

  test("property: snapshotDiff statuses partition; diff(x,x)=unchanged; diff(0,x)=added") {
    import spark.implicits._
    samples(Gen.choose(0L, 100000L), 3).foreach { seed =>
      val a = (0 until 80).filter(i => (i * 7 + seed) % 3 != 0)
        .map(i => (i.toLong, s"text-${(i * 13 + seed) % 20}")).toDF("doc_id", "text")
      val b = (0 until 80).filter(i => (i * 11 + seed) % 4 != 0)
        .map(i => (i.toLong, s"text-${(i * 17 + seed) % 20}")).toDF("doc_id", "text")
      val d = TrainingData.snapshotDiff(a, b).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val aIds = a.select("doc_id").collect().map(_.getLong(0)).toSet
      val bIds = b.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(d.keySet === (aIds ++ bIds)) // exhaustive, no phantom rows
      d.foreach { case (id, st) =>
        val expected =
          if (!aIds(id)) "added" else if (!bIds(id)) "removed"
          else if (a.filter($"doc_id" === id).head().getString(1) ==
            b.filter($"doc_id" === id).head().getString(1)) "unchanged" else "changed"
        assert(st === expected, s"doc $id seed=$seed")
      }
      // identities
      assert(TrainingData.snapshotDiff(a, a).select("status").distinct()
        .collect().map(_.getString(0)).toSeq == Seq("unchanged"))
      val empty = a.filter(lit(false))
      assert(TrainingData.snapshotDiff(empty, a).select("status").distinct()
        .collect().map(_.getString(0)).toSeq == Seq("added"))
    }
  }

  test("property: scalarQuantize codes in [0,255]; error bounded by half-step") {
    import spark.implicits._
    samples(Gen.choose(0L, 100000L), 3).foreach { seed =>
      val emb = (0 until 40).map { i =>
        (i.toLong, Array.tabulate(16)(j =>
          (((i * 31 + j * 17 + seed) % 2000) - 1000) / 250.0f))
      }.toDF("vec_id", "embedding")
      graft.ops.Quantize.scalarQuantize(emb).collect().foreach { r =>
        val codes = r.getString(4).split(",").map(_.toLong)
        assert(codes.forall(c => c >= 0 && c <= 255))
        val (mnU, mxU, errU) = (r.getLong(2), r.getLong(3), r.getLong(5))
        assert(errU >= 0)
        // per-element |v - recon| <= half a quantization step (+1 for the
        // floor round-down per element, in pico-units)
        val range = (mxU - mnU) / 1e6
        val halfStep = range / 255.0 / 2.0
        val bound = (16 * (halfStep * halfStep * 1e12 + 1)).toLong
        assert(errU <= bound, s"err $errU > bound $bound (range $range)")
      }
    }
  }

  test("property: CDC chunks exactly tile every generated document") {
    import spark.implicits._
    val charGen = Gen.frequency(8 -> Gen.alphaNumChar, 2 -> Gen.const(' '))
    val textGen = for {
      n <- Gen.choose(0, 300)
      cs <- Gen.listOfN(n, charGen)
    } yield cs.mkString
    val texts = samples(textGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    val got = graft.ops.Chunking.chunks(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .groupBy(_._1)
    val md = java.security.MessageDigest.getInstance("MD5")
    texts.filter(_._2.nonEmpty).foreach { case (id, t) =>
      val cs = got.getOrElse(id, Array.empty).sortBy(_._2)
      assert(cs.nonEmpty, s"doc $id produced no chunks")
      assert(cs.head._3 === 0L && cs.last._4 === t.length.toLong)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(a._4 === b._3, s"gap in doc $id")
        case _ =>
      }
      cs.foreach { case (_, _, s, e, h) =>
        val hex = md.digest(t.substring(s.toInt, e.toInt).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(h === hex, s"hash mismatch for doc $id span [$s,$e)")
      }
    }
    assert(!got.contains(
      texts.collectFirst { case (id, t) if t.isEmpty => id }.getOrElse(-1L)))
  }

  test("property: EditDistanceBandRule never changes filter results") {
    import spark.implicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.EditDistanceBandRule
    try {
      val wordGen = for {
        n <- Gen.choose(0, 12)
        cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString
      val words = samples(wordGen, 120).distinct
      val df = spark.createDataset(
        spark.sparkContext.parallelize(words, 4)).toDF("w")
      for (k <- Seq(0, 1, 3)) {
        val got = df.filter(expr(s"levenshtein(w, 'abcab') <= $k"))
          .collect().map(_.getString(0)).toSet
        val want = words.filter(w =>
          org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
            .apply(w, "abcab") <= k).toSet
        assert(got === want, s"k=$k")
      }
    } finally {
      spark.experimental.extraOptimizations = spark.experimental
        .extraOptimizations.filterNot(_ == graft.plans.EditDistanceBandRule)
    }
  }
}
