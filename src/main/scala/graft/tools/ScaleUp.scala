package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a larger scale factor from an existing testdata dir by unioning
  * `factor` perturbed replicas — the harness for the sf1 scale probe
  * (VERDICT r5 item 4: "the bench has only ever run at sf0.1").
  *
  * The replication must not change the *asymptotic shape* of the data, or
  * the probe measures the generator instead of the engine:
  *
  *  - **Entity keys get a per-replica offset** (`key + i * 10M`) applied
  *    consistently to every FK column, so each replica is a disjoint,
  *    join-consistent copy of the original star schema. Small dims
  *    (region/nation and their int32 keys) are shared, not replicated —
  *    exactly how a real corpus grows (facts grow, dims don't).
  *  - **Embeddings**: replica i multiplies each component by a deterministic
  *    ±1 sign pattern derived from (i, dim). A diagonal ±1 matrix is an
  *    isometry, so intra-replica norms/dot-products — and therefore every
  *    ANN / SemDeDup cluster — are preserved EXACTLY, while cross-replica
  *    cosine collapses to ~0 under independent sign patterns. Near-dup
  *    cluster sizes stay constant as data grows; output scales linearly.
  *  - **Text**: replica i suffixes every whitespace token with a replica
  *    tag. Token renaming is a bijection per replica, so intra-replica
  *    shingle Jaccard is preserved (near-exactly for char grams), while
  *    cross-replica shingle overlap collapses. Without this, every doc
  *    would have 9 exact clones and candidate pairs inside every MinHash /
  *    SimHash bucket would grow quadratically BY CONSTRUCTION — the probe
  *    would flag the generator, not the operator.
  *  - **Part names** (q102 edit-distance probe): a fixed-length per-replica
  *    suffix of repeated distinct chars. A shared suffix leaves intra-
  *    replica edit distance unchanged; cross-replica suffixes differ in
  *    all 4 chars, pushing every cross pair beyond the distance-2 cut.
  *
  * Usage: ScaleUp <srcDir> <dstDir> <factor>. Deterministic (no RNG — all
  * perturbations are hash-of-(replica,position) driven).
  */
object ScaleUp {
  private val Off = 10_000_000L

  /** Union of `factor` copies with `mut(replicaIdx)` column edits. */
  private def replicate(df: DataFrame, factor: Int)(
      mut: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(i => mut(df, i)).reduce(_ unionByName _)

  private def shift(df: DataFrame, i: Int, keys: String*): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * Off)))

  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args.take(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dst, factorS.toInt)
    spark.stop()
  }

  /** In-process entry (no session lifecycle) — lets the sf1 plan sweep
    * regenerate tmp/sf1 inside a test JVM when a prior session's output
    * was cleaned away. */
  def run(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    def in(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def out(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")

    // small dims: shared across replicas
    out(in("region"), "region")
    out(in("nation"), "nation")

    out(replicate(in("customer"), factor)((d, i) => shift(d, i, "c_custkey")),
      "customer")
    out(replicate(in("supplier"), factor)((d, i) => shift(d, i, "s_suppkey")),
      "supplier")
    out(replicate(in("orders"), factor)((d, i) =>
      shift(d, i, "o_orderkey", "o_custkey")), "orders")
    out(replicate(in("lineitem"), factor)((d, i) =>
      shift(d, i, "l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    out(replicate(in("events"), factor)((d, i) =>
      shift(d, i, "event_id", "user_id")), "events")

    // part: shared fixed-length suffix preserves intra-replica edit
    // distance; distinct-per-replica chars kill cross-replica matches
    out(replicate(in("part"), factor) { (d, i) =>
      val tagged = if (i == 0) d else d.withColumn(
        "p_name", concat(col("p_name"), lit(" " + ("" + ('a' + i % 26).toChar) * 4)))
      shift(tagged, i, "p_partkey")
    }, "part")

    // documents: bijective per-replica token renaming
    out(replicate(in("documents"), factor) { (d, i) =>
      val tagged = if (i == 0) d else d.withColumn(
        "text",
        array_join(
          transform(split(col("text"), " "), w => concat(w, lit(s"~$i"))), " "))
      shift(tagged, i, "doc_id")
    }, "documents")

    // embeddings: diagonal ±1 isometry per replica (exact intra-replica
    // geometry; ~0 cross-replica cosine). Sign from a Weyl-style integer
    // hash of (replica, dim) — pure codegen'd arithmetic, no UDF.
    out(replicate(in("embeddings"), factor) { (d, i) =>
      val flipped = if (i == 0) d else d.withColumn(
        "embedding",
        when(size(col("embedding")) > 0,
          zip_with(
            col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, k) => x * when(
              pmod(k * lit(2654435761L) + lit(i.toLong * 40503L), lit(97L)) < 48,
              lit(1.0f)).otherwise(lit(-1.0f))))
          .otherwise(col("embedding")))
      shift(flipped, i, "vec_id")
    }, "embeddings")

    println(s"ScaleUp: wrote ${factor}x of $src to $dst")
  }
}
