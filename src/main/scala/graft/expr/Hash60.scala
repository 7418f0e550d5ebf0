package graft.expr

/** The repo's portable 60-bit md5 hash — driver-side and Column-side forms
  * kept TOGETHER because every adaptive local path's bit-equality with its
  * distributed twin (and with the DuckDB oracle's digit-by-digit replay)
  * depends on the two staying identical: 60 bits = the first 15 hex chars of
  * the md5 digest, parsed base-16, always non-negative.
  */
object Hash60 {
  private val tl: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** ≡ `conv(substring(md5(s), 1, 15), 16, 10)` cast long. */
  def h60(s: String): Long = {
    val md = tl.get(); md.reset()
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** [[h60]] scaled to a uniform in [0,1) — the layout's init draw. */
  def h01(s: String): Double = h60(s).toDouble / math.pow(2, 60)

  /** Column-side twin of [[h60]]. The cast-to-string is an identity on the
    * string-id callers and makes numeric ids hash exactly like the driver
    * side's string form (md5 takes binary/string only — a bigint id column
    * would otherwise fail analysis). */
  def h60Col(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
  }
}
