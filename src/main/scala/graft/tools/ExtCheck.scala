package graft.tools
import org.apache.spark.sql.SparkSession
/** Smoke: the declarative extensions seam registers every custom expression. */
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r1 = spark.sql("SELECT iast_sort_key('kha')").head().getSeq[Int](0)
    val r2 = spark.sql("SELECT vector_dot(array(1.0D,2.0D), array(3.0D,4.0D))").head().getDouble(0)
    val r3 = spark.sql("SELECT sorted_long_intersect(array(1L,2L,3L), array(2L,3L,4L))").head().getLong(0)
    val r4 = spark.sql("SELECT sorted_array_intersect(array('a','b'), array('b','c'))").head().getLong(0)
    val r5 = spark.sql("SELECT sorted_char_ngrams('abab', 2)").head().getSeq[String](0)
    // the injected optimizer rule strengthens the naive edit-distance
    // predicate with its O(1) length band
    // the string must be genuinely non-constant: a VALUES relation or a
    // CASE over constants gets constant-folded and the predicate under
    // inspection is erased from the optimized plan before any rule runs
    val r6 = spark.sql(
        """SELECT w FROM (SELECT concat('kitten', id) AS w FROM range(2))
          |WHERE levenshtein(w, 'mitten') <= 2""".stripMargin)
      .queryExecution.optimizedPlan.toString.contains("abs((length(")
    println(s"EXTCHECK iast=${r1.nonEmpty} dot=$r2 longint=$r3 strint=$r4 ngrams=${r5.mkString(",")} band=$r6")
    spark.stop()
  }
}
