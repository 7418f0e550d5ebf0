package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deliberate key-salting for skewed equi-joins.
  *
  * AQE's skew-join handles most hot keys at runtime, but only for sort-merge
  * joins inside one stage; salting is still the tool when the skewed relation
  * feeds an aggregation, a streaming join (no AQE), or when the hot keys are
  * known and the extra shuffle of a re-plan is worth avoiding.
  *
  * `factor`-way salting: every probe-side row gets a deterministic salt in
  * [0, factor) derived from the full row content (xxhash64 — stable across
  * task retries, unlike rand()); the build side is replicated factor× with
  * one copy per salt value. The join key becomes (key, salt), splitting each
  * hot key's rows across `factor` reducers. Output equals the plain join
  * row-for-row.
  *
  * Limitation: byte-identical duplicate probe rows share a salt; the common
  * skew case — one hot key, varied payloads — spreads uniformly.
  */
object SkewJoin {

  def salted(left: DataFrame, right: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor > 0, s"salt factor must be positive: $factor")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(factor.toLong)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1L))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
