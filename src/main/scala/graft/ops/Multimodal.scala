package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode/feature-extraction as
  * partition-local batch functions.
  *
  * The decode step is a STUB (no image/audio codecs in this environment): the
  * default [[Decoder]] is a deterministic fake that derives "features" from
  * the payload bytes. Everything around it — schema, batching, partitioning,
  * null handling — is real and tested; swapping in a real codec is a one-line
  * change of `decoder`.
  *
  * (In PySpark this layer would be `mapInPandas`; the Scala-native equivalent
  * with identical batch shape is a typed `mapPartitions` over Row iterators,
  * which keeps the per-partition batching contract.)
  */
object Multimodal {

  /** Partition-local decoder: bytes → fixed-length feature vector. */
  trait Decoder extends Serializable {
    def featureDim: Int
    def decode(payload: Array[Byte]): Array[Float]
  }

  /** Deterministic fake decoder — stands in for the real codec (STUB). */
  class FakeDecoder(val featureDim: Int = 8) extends Decoder {
    def decode(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) {
        out(i % featureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))

  /** Wrap a text corpus as a binary media table (payload = utf8 bytes) —
    * the ingestion path a real pipeline would run on image/audio blobs:
    * metadata is computed relationally (codegen), payload stays opaque. */
  def ingest(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("checksum", md5(col("payload")))

  /** Frame/chunk inventory: fixed-size chunking of the payload — the Spark
    * side of frame-sampling (pure column expressions; one output row per
    * chunk via explode over a computed sequence). */
  def chunkInventory(media: DataFrame, chunkBytes: Int = 64): DataFrame =
    // n_bytes = 0 must yield ZERO chunks: without the guard,
    // sequence(0, ceil(0/chunk)-1) = sequence(0, -1) defaults to step -1 and
    // emits a phantom [0, -1] spine (chunk_idx 0 over an empty payload).
    media.filter(col("n_bytes") > 0)
      .select(col("media_id"), col("n_bytes"),
        explode(sequence(lit(0),
          (ceil(col("n_bytes").cast("double") / chunkBytes) - 1).cast("int")))
          .as("chunk_idx"))
      .withColumn("chunk_offset", col("chunk_idx").cast("long") * chunkBytes)
      .withColumn("chunk_len",
        least(lit(chunkBytes.toLong), col("n_bytes") - col("chunk_offset")))
      .select(col("media_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_offset"), col("chunk_len"))

  /** Frame sampling: keep every `stride`-th fixed-size frame of each
    * payload and slice + checksum the actual frame bytes (the video/audio
    * "sample every k-th frame" pass). The slice is a pure column expression
    * over the binary payload — no decode needed to subset frames, so the
    * sampled relation can be shuffled/stored before any codec runs; the
    * md5 frame checksum makes the byte slicing itself oracle-checkable. */
  def frameSample(media: DataFrame, frameBytes: Int = 256,
      stride: Int = 4): DataFrame =
    chunkInventory(media, frameBytes)
      .filter(col("chunk_idx") % stride === 0)
      .join(media.select(col("media_id"), col("payload")), Seq("media_id"))
      .select(col("media_id"), col("chunk_idx").as("frame_idx"),
        col("chunk_len").as("frame_len"),
        md5(expr("substring(payload, cast(chunk_offset + 1 as int), cast(chunk_len as int))"))
          .as("frame_md5"))

  /** Integer-exact partition-local decoder: bytes → fixed-length LONG vector.
    * Unlike [[Decoder]]'s float features, these are order-independent integer
    * sums — replayable by the SQL oracle, so the mapPartitions decode path
    * itself is hash-checkable end-to-end. */
  trait LongDecoder extends Serializable {
    def featureDim: Int
    def decode(payload: Array[Byte]): Array[Long]
  }

  /** Deterministic fake decode (STUB for the real codec): feature k = sum of
    * unsigned bytes at positions ≡ k (mod dim) — the byte-fold of a real
    * feature extractor, with exact integer arithmetic. */
  class ByteFoldDecoder(val featureDim: Int = 8) extends LongDecoder {
    def decode(payload: Array[Byte]): Array[Long] = {
      val out = new Array[Long](featureDim)
      var i = 0
      while (i < payload.length) {
        out(i % featureDim) += (payload(i) & 0xff).toLong
        i += 1
      }
      out
    }
  }

  /** [[extractFeatures]] with a [[LongDecoder]] — same mapPartitions batch
    * contract (decoder instantiated per partition), integer-exact output. */
  def extractFeaturesLong(media: DataFrame,
      decoder: LongDecoder = new ByteFoldDecoder()): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(LongType, containsNull = false))))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getLong(0), if (payload == null) null else decoder.decode(payload))
        }
      }(encoder)
  }

  /** 60-bit perceptual (difference-hash) signature per media row — the
    * image/audio cousin of [[graft.ops.Dedup.simhashNearDups]]'s text
    * signature: decode the payload to `dim` integer features (the
    * [[ByteFoldDecoder]] STUB stands in for a real downscale-to-grayscale;
    * the plumbing — decode, gradient bits, packing — is the real dHash
    * shape), then bit i = [feature i > feature (i+1) mod dim]. Gradient
    * comparisons make the signature robust to uniform payload shifts
    * (brightness in the image case), which is exactly what a checksum
    * can't give. dim = 60 keeps the packed signature non-negative in a
    * BIGINT for engine-portable chunking.
    *
    * Scale shape: decode is partition-local, the bit-pack is a pure
    * per-row expression — map-only end to end.
    *
    * @return (media_id, phash) — phash ∈ [0, 2⁶⁰)
    */
  def perceptualHash(media: DataFrame, dim: Int = 60): DataFrame = {
    require(dim > 1 && dim <= 60, s"perceptualHash needs 1 < dim <= 60, got $dim")
    extractFeaturesLong(media, new ByteFoldDecoder(dim))
      .select(col("media_id"), expr(
        s"""aggregate(transform(sequence(0, ${dim - 1}),
           |  i -> IF(features[i] > features[(i + 1) % $dim],
           |          shiftleft(1L, i), 0L)),
           |  0L, (acc, x) -> acc + x)""".stripMargin).as("phash"))
  }

  /** Perceptual near-duplicate pairs over binary payloads: [[perceptualHash]]
    * signatures, then the banded hamming join of the simhash family — the
    * 60-bit signature splits into 4 chunks of 15 bits, and a pair within
    * hamming distance ≤ 3 dirties at most 3 chunks, so it collides on at
    * least one clean chunk key (pigeonhole: the multi-index guarantee is
    * LOSSLESS for maxHamming ≤ 3; larger cuts trade recall like any LSH).
    * The hamming cut rides INSIDE the join condition, so only true
    * near-dups reach the distinct's shuffle.
    *
    * @return (a, b, hamming) with a < b over media_id
    */
  def perceptualNearDups(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = org.apache.spark.sql.graft.FreshCheckpoint(perceptualHash(media))
    val chunks = (0 until 4).map { c =>
      sigs.select(col("media_id"), lit(c).as("chunk"),
        shiftright(col("phash"), c * 15).bitwiseAND(0x7fff).as("key"),
        col("phash"))
    }.reduce(_ unionByName _)
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.key") === col("y.key") &&
          col("x.media_id") < col("y.media_id") &&
          bit_count(col("x.phash").bitwiseXOR(col("y.phash"))) <= maxHamming)
      .select(col("x.media_id").as("a"), col("y.media_id").as("b"),
        bit_count(col("x.phash").bitwiseXOR(col("y.phash"))).cast("long")
          .as("hamming"))
      .distinct()
  }

  /** Caption↔image pair-integrity audit (round-11 #6) — the contamination
    * check a paired multimodal dataset needs before training: rows whose
    * IMAGES are perceptual near-dups but whose CAPTIONS are not
    * (`img_only` — re-used/near-identical images carrying divergent text:
    * mislabeling or caption injection), rows whose captions near-dup while
    * the images differ (`cap_only` — boilerplate/copied captions on
    * different images: alt-text spam, template leakage), and `both`
    * (true near-duplicate pairs — dedup candidates, not integrity flags).
    *
    * Composes the two banded operators as-is: [[perceptualNearDups]]
    * (4×15-bit banded hamming join over the 60-bit dHash) ×
    * [[Dedup.minhashLsh]] (banded MinHash with exact-Jaccard verify) on
    * the caption text — both candidate-bounded, never all-pairs; the
    * disagreement sets are two narrow anti-joins on the (a, b) pair key.
    *
    * "Near-dup" on each side is that operator's standard sensitivity
    * (hamming ≤ `maxHamming`; verified Jaccard ≥ `threshold` over banded
    * candidates) — the audit flags disagreements BETWEEN the two
    * detectors, which is exactly the integrity signal: similarity in one
    * modality unmatched in the other.
    *
    * @param media    (media_id, payload) — the image side
    * @param captions (media_id, caption) — the paired text side
    * @return (a, b, kind ∈ img_only|cap_only|both, hamming, jac_u) with
    *         a < b; hamming null for cap_only, jac_u null for img_only
    */
  def pairIntegrityAudit(media: DataFrame, captions: DataFrame,
      maxHamming: Int = 3, threshold: Double = 0.8): DataFrame = {
    val img = org.apache.spark.sql.graft.FreshCheckpoint(
      perceptualNearDups(media, maxHamming))
    val cap = org.apache.spark.sql.graft.FreshCheckpoint(
      Dedup.minhashLsh(captions.select(col("media_id").as("doc_id"),
          col("caption").as("text")), 8, 2, threshold)
        .select(col("a"), col("b"),
          round(col("jaccard") * 1000000d).cast("long").as("jac_u")))
    val both = img.join(cap, Seq("a", "b"))
      .select(col("a"), col("b"), lit("both").as("kind"), col("hamming"),
        col("jac_u"))
    val imgOnly = img
      .join(cap.select(col("a"), col("b")), Seq("a", "b"), "left_anti")
      .select(col("a"), col("b"), lit("img_only").as("kind"), col("hamming"),
        lit(null).cast("long").as("jac_u"))
    val capOnly = cap
      .join(img.select(col("a"), col("b")), Seq("a", "b"), "left_anti")
      .select(col("a"), col("b"), lit("cap_only").as("kind"),
        lit(null).cast("long").as("hamming"), col("jac_u"))
    both.unionByName(imgOnly).unionByName(capOnly)
  }

  /** Multimodal dedup RESOLUTION — the release step after
    * [[pairIntegrityAudit]]'s flags: a paired (media, caption) corpus is
    * near-duplicated when EITHER modality says so (a re-encoded image
    * with a paraphrased caption must still collapse), so clusters close
    * transitively over the UNION of the perceptual-hash pair relation and
    * the caption-MinHash pair relation, and each cluster elects ONE
    * canonical pair with the [[Dedup.clusterKeepers]] policy (most
    * caption tokens, ties to the smallest id — the best-documented copy
    * survives). Docs riding at least one DISAGREEING pair (one modality
    * matched, the other did not — q279's img_only/cap_only kinds) are
    * flagged `conflict`: they are the casualties a release reviewer
    * audits, because for them the two modalities vouch for different
    * cluster structures.
    *
    * Scale shape: both pair generators are bucketed (banded phash chunks;
    * banded MinHash), the union/anti-joins run on the pair-bounded
    * relations, components close via the O(log n) large/small-star
    * operator, and the keeper election is a combiner-backed struct-max —
    * nothing all-pairs, nothing corpus-sized in a single partition.
    *
    * @return one row per paired doc: (media_id, cluster, n_tokens, keep,
    *         conflict)
    */
  def multimodalKeepers(media: DataFrame, captions: DataFrame,
      maxHamming: Int = 3, threshold: Double = 0.8): DataFrame = {
    val img = org.apache.spark.sql.graft.FreshCheckpoint(
      perceptualNearDups(media, maxHamming).select(col("a"), col("b")))
    val cap = org.apache.spark.sql.graft.FreshCheckpoint(
      Dedup.minhashLsh(captions.select(col("media_id").as("doc_id"),
        col("caption").as("text")), 8, 2, threshold)
        .select(col("a"), col("b")))
    val unioned = img.unionByName(cap).distinct()
    val docs = captions.select(col("media_id").as("doc_id"),
      col("caption").as("text"))
    val keepers = Dedup.clusterKeepers(docs, unioned)
    val disagree = img.join(cap, Seq("a", "b"), "left_anti")
      .unionByName(cap.join(img, Seq("a", "b"), "left_anti"))
    val conflictIds = disagree.select(col("a").as("doc_id"))
      .unionByName(disagree.select(col("b").as("doc_id")))
      .distinct().withColumn("conflict", lit(true))
    keepers.join(conflictIds, Seq("doc_id"), "left")
      .select(col("doc_id").as("media_id"), col("cluster"), col("n_tokens"),
        col("keep"), coalesce(col("conflict"), lit(false)).as("conflict"))
  }

  /** Feature extraction via partition-local decode (mapPartitions batch
    * contract — the decoder is instantiated once per partition, not per row).
    */
  def extractFeatures(media: DataFrame, decoder: Decoder = new FakeDecoder()): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val feat =
            if (payload == null) null
            else decoder.decode(payload)
          Row(r.getLong(0), feat)
        }
      }(encoder)
  }
}
