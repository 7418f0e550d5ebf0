package graft

import org.apache.spark.sql.functions._

import graft.ops.{Chunking, TextAnalysis}

/** Planted-case specs for the round-8 tokenizer batch: BPE merge rounds
  * (left-to-right non-overlap semantics), sliding-window chunking, and
  * per-source fertility. */
class Round8Batch4Spec extends SparkTestBase {
  import spark.implicits._

  test("bpeMerges elects by weight with lexicographic ties and merges left-to-right") {
    // vocab: "abab"×3, "ab"×2 → round 1 pairs: (a b): 3·2+2 = 8,
    // (b a): 3 → merge "a b" (weight 8). Round 2 symbols: ab ab ×3, ab ×2 →
    // (ab ab): 3 → merge. Round 3: "abab"-level corpus has no pairs left
    // except none → but "abab" is now one symbol; remaining pairs: none in
    // "ab"; so round 3 elects from an empty pair set → guard via planted
    // third word "xy xy" keeping a pair alive
    val docs = Seq(
      (1L, "abab abab abab ab ab zq zq")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // round 1: "a b" appears 2× in each abab (overlap-free: positions 0,2)
    // and 1× in ab → weight 3·2 + 2·1... tokens: abab×3, ab×2, zq×2.
    // pairs r1: (a,b): abab has adjacent (a,b) at pos0,2 → 2 each ×3 = 6;
    // ab ×2 = 2 → 8. (b,a): abab pos1 ×3 = 3. (z,q): 2. max = "a b" @ 8.
    assert(out(0)._2 == "a b" && out(0)._3 == 8L)
    // after r1: abab → [ab, ab]; ab → [ab]; zq → [z, q]
    // n_symbols = 3·2 + 2·1 + 2·2 = 12
    assert(out(0)._4 == 12L)
    // round 2: (ab,ab): 3; (z,q): 2 → "ab ab" @ 3; n_symbols = 3+2+4 = 9...
    // abab → [abab] (1 sym ×3 = 3), ab stays 1×2 = 2, zq 2×2 = 4 → 9
    assert(out(1)._2 == "ab ab" && out(1)._3 == 3L && out(1)._4 == 9L)
    // round 3: only (z,q): 2 → merge; n_symbols = 3 + 2 + 2 = 7
    assert(out(2)._2 == "z q" && out(2)._3 == 2L && out(2)._4 == 7L)
  }

  test("bpeMerges overlapping run merges ceil(k/2) times (p0 = p1)") {
    // "aaaa"×1: r1 pairs (a,a) ×3 → merge left-to-right: [aa, aa]
    // (2 merges from a 3-match run, odd ordinals 1 and 3)
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs, rounds = 1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.head == ((1L, "a a", 3L, 2L)))
  }

  test("slidingChunks covers every token; overlap repeats context") {
    // 50 tokens, window 32, stride 24 → chunks at 0 (32), 24 (26), 48 (2)
    val text = (1 to 50).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = Chunking.slidingChunks(docs).orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.sameElements(Array((0L, 32L), (1L, 26L), (2L, 2L))))
    // hashes are over the actual token windows: chunk 1 starts at token 25
    val h = Chunking.slidingChunks(docs).filter(col("chunk_idx") === 1)
      .select(col("chunk_hash")).head.getString(0)
    val expect = spark.sql(
      s"SELECT md5('${(25 to 50).map(i => s"t$i").mkString(" ")}') AS h")
      .head.getString(0)
    assert(h == expect)
  }

  test("tokenizerFertility: merged sources compress, unmergeable stay at 1 sym/char") {
    // source A: "abab" everywhere → after 3 merges fertility 1 sym/word;
    // source B: distinct unmergeable 2-char words stay split unless elected
    val docs = Seq(
      (1L, "abab abab abab abab", "A"), (2L, "abab abab", "A"),
      (3L, "xy qr st uv", "B")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.tokenizerFertility(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val a = out.head
    // A: 6 words × 4 chars; merges: r1 "a b" (weight 12), r2 "ab ab" → 1
    // symbol per word; r3 elects among B's pairs, irrelevant to A
    assert(a._1 == "A" && a._2 == 6L && a._3 == 6L && a._4 == 1000000L)
    val b = out(1)
    // B: 4 words × 2 chars = 8 symbols initially; exactly one of B's pairs
    // is elected in round 3 (lexicographic min of weight-1 pairs: "q r") →
    // 7 symbols over 4 tokens
    assert(b._1 == "B" && b._2 == 4L && b._3 == 7L &&
      b._4 == 7000000L / 4L)
  }
}
