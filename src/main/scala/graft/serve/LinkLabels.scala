package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Server-side e-text link display labels — the presentation-layer
  * extractors the reference runs in the browser (`static/js/graph.js:
  * 254-338`, `LABEL_EXTRACTORS` + `basename` + `getDisplayLabel`),
  * re-expressed as one codegen-friendly column expression so link labels
  * can be computed next to the data (closes SURVEY §2 P16, previously a
  * partial analog).
  *
  * Rule-for-rule parity with the JS:
  *  - basename: last `[/=]`-split segment, final `.ext` stripped.
  *  - DCS: `IDTextDisplay=(\d+)` else basename.
  *  - Vātāyana and Pramāṇa NLP: `text_abbrv=([^&]+)` percent-DECODED else
  *    basename (decodeURIComponent leaves `+` alone — a plain url_decode
  *    would turn it into a space, hence the %2B pre-escape).
  *  - Muktabodha KSTS: `miri_catalog_number=([^&]+)` (NOT decoded — the JS
  *    doesn't) else basename.
  *  - UTA Dharmaśāstra: Google-Docs links label "Google Doc", enumerated
  *    "Google Doc <idx+1>" when the work has several links; else the
  *    decoded path after `/resources/` without a trailing slash; else
  *    basename.
  *  - DiPAL DCV: `tra_id=(\d+)` else `wor_id=(\d+)` else basename.
  *  - GRETIL / SARIT / Sanskrit Library and TITUS / unknown collections:
  *    basename.
  */
object LinkLabels {

  /** JS `basename(url)`: `url.split(/[\/=]/).pop().replace(/\.[^.]+$/, '')`. */
  def basename(url: Column): Column =
    regexp_replace(element_at(split(url, "[/=]"), -1), "\\.[^.]+$", "")

  /** JS `decodeURIComponent`: percent-decoding that PRESERVES literal `+`
    * (Java/Spark url_decode is form-decoding, which maps `+` → space). */
  private def decodeUriComponent(c: Column): Column =
    url_decode(regexp_replace(c, "\\+", "%2B"))

  private def firstGroup(link: Column, pattern: String): Column =
    nullif(regexp_extract(link, pattern, 1), lit(""))

  /** `getDisplayLabel(collection, link, idx, total)`. `idx` is 0-based like
    * the JS caller's enumeration. */
  def displayLabel(collection: Column, link: Column,
      idx: Column, total: Column): Column = {
    val base = basename(link)
    when(collection === "DCS",
        coalesce(firstGroup(link, "IDTextDisplay=(\\d+)"), base))
      .when(collection === "Vātāyana and Pramāṇa NLP",
        coalesce(decodeUriComponent(firstGroup(link, "text_abbrv=([^&]+)")), base))
      .when(collection === "Muktabodha KSTS",
        coalesce(firstGroup(link, "miri_catalog_number=([^&]+)"), base))
      .when(collection === "UTA Dharmaśāstra",
        when(link.contains("docs.google.com/document"),
            when(total > 1, concat(lit("Google Doc "), (idx + 1).cast("string")))
              .otherwise(lit("Google Doc")))
          .otherwise(coalesce(
            decodeUriComponent(firstGroup(link, "/resources/([^?#]+?)/?$")),
            base)))
      .when(collection === "DiPAL DCV",
        coalesce(firstGroup(link, "tra_id=(\\d+)"),
          firstGroup(link, "wor_id=(\\d+)"), base))
      .otherwise(base)
  }

  /** Label every link of an indexed link relation
    * ([[graft.etl.JsonLoad.etextLinksIndexed]] shape). */
  def labeled(links: DataFrame): DataFrame =
    links.withColumn("label",
      displayLabel(col("collection"), col("link"), col("idx"), col("total")))
}
