package graft.serve

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** App-level metadata scans (SURVEY §2 S11–S12): the reference's config.json
  * defaults (`utils/utils.py:9-13`) and its line-positional VERSION parse
  * (`utils/utils.py:32-50`). Driver-side file reads by design — these are
  * process bootstrap values, not data-plane relations.
  */
object AppMeta {

  /** `config.json` defaults (`utils/utils.py:9-13`, `config.json:1-9`):
    * default subgraph seeds, hop count, exclusion list, and render toggles. */
  case class Config(
      authors: Seq[String],
      works: Seq[String],
      hops: Int,
      excludeList: Seq[String],
      drawNetworkxGraph: Boolean,
      networkxFigureSize: Seq[Int],
      outputGephiFile: Boolean)

  def loadConfig(path: String): Config = {
    val json = JsonMethods.parse(Files.readString(Paths.get(path)))
    def strs(field: String): Seq[String] =
      (json \ field).asInstanceOf[JArray].arr.collect { case JString(s) => s }
    Config(
      authors = strs("authors"),
      works = strs("works"),
      hops = (json \ "hops").asInstanceOf[JInt].num.toInt,
      excludeList = strs("exclude_list"),
      drawNetworkxGraph = (json \ "draw_networkx_graph") == JBool(true),
      networkxFigureSize = (json \ "networkx_figure_size")
        .asInstanceOf[JArray].arr.collect { case JInt(i) => i.toInt },
      outputGephiFile = (json \ "output_gephi_file") == JBool(true))
  }

  /** The three version strings (`utils/utils.py:32-50`). The reference's
    * parse is purely LINE-POSITIONAL — line 1 = app, line 2 = pandit data,
    * line 3 = seti data; each line split on '=', value stripped of
    * whitespace and single/double quotes, key name never inspected —
    * reproduced faithfully. */
  case class Versions(app: String, panditData: String, setiData: String)

  def loadVersions(path: String): Versions = {
    val lines = new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8).split("\n", -1)
    def v(i: Int): String = lines(i).trim.split("=", 2)(1).trim
      .replace("'", "").replace("\"", "")
    Versions(v(0), v(1), v(2))
  }
}
