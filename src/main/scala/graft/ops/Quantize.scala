package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FreshCheckpoint

/** Vector quantization: fixed-round Lloyd's k-means over integerized
  * embeddings — the codebook-training step IVF-style ANN partitioning
  * consumes. Deterministic by construction (micro-unit integer coordinates,
  * first-k init, ties broken by centroid id, FIXED round count), so the
  * DuckDB oracle replays every round exactly — the same
  * approximate-operator-with-an-exact-test discipline as the HLL / CMS /
  * LSH family.
  *
  * Shape: coordinates live as (vec_id, dim, x) rows; each round is one
  * assignment join (centroids are k·dim rows — broadcast) + one
  * (cid, dim)-keyed mean aggregation. Work is O(n·k·dim) per round,
  * shuffled on the vector key — no driver-side math, no collected
  * matrices, so 1000 executors split the assignment evenly.
  */
object Quantize {

  /** Integerized coordinates: (vec_id, d, x) with x = floor(v·1e6). */
  def coords(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("d", "v")))
      .select(col("vec_id"), col("d").cast("long").as("d"),
        floor(col("v").cast("double") * 1000000d).cast("long").as("x"))

  /** `rounds` iterations of (assign, update) from first-`k` init, then a
    * final assignment against the last codebook.
    *
    * @return (vec_id, centroid, dist) — dist = squared L2 in micro-units².
    */
  def kmeansCodebook(embeddings: DataFrame, k: Int, rounds: Int): DataFrame = {
    val iv = FreshCheckpoint(coords(embeddings))
    def assign(cents: DataFrame): DataFrame = {
      val dists = iv.join(broadcast(cents), Seq("d"))
        .groupBy(col("vec_id"), col("cid"))
        .agg(sum((col("x") - col("cx")) * (col("x") - col("cx"))).as("dist"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
      dists.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("cid"), col("dist"))
    }
    def update(assigned: DataFrame): DataFrame =
      assigned.join(iv, Seq("vec_id"))
        .groupBy(col("cid"), col("d"))
        .agg(floor(sum(col("x")).cast("double") / count(lit(1))).cast("long").as("cx"))
    // deterministic init = the k SMALLEST vec_ids (not `vec_id < k`, which
    // silently yields an EMPTY codebook — and an all-pass dedup downstream —
    // whenever ids don't start at 0)
    val firstK = iv.select(col("vec_id")).distinct()
      .orderBy(col("vec_id")).limit(k)
    var cents = iv.join(firstK, Seq("vec_id"))
      .select(col("vec_id").as("cid"), col("d"), col("x").as("cx"))
    for (_ <- 1 to rounds)
      cents = FreshCheckpoint(update(assign(cents)))
    assign(cents)
      .select(col("vec_id"), col("cid").as("centroid"), col("dist"))
  }
}
