package graft.config

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.model._

/** Config pipeline (SURVEY.md §2.9 O7; reference: config_loader.py).
  *
  * JSON config with `$VAR` / `${VAR}` env expansion, grouped→flat
  * normalization (`source`, `destination`, `destination.mysql`, `run`,
  * `compat`), precedence CLI > file > env, and per-table mapping
  * selection (`default` mapping merged with a table-level override
  * matched case-insensitively on `source_table`,
  * reference: config_loader.py:251-289).
  */
object ConfigLoader {

  private val mapper = new ObjectMapper()
  private val EnvRe = """\$\{([A-Za-z_][A-Za-z0-9_]*)\}|\$([A-Za-z_][A-Za-z0-9_]*)""".r

  /** `$VAR` / `${VAR}` expansion against the environment
    * (reference: config_loader.py:63-69). Unknown vars expand to "".
    */
  def expandEnv(s: String, env: Map[String, String] = sys.env): String =
    EnvRe.replaceAllIn(s, m => {
      val name = Option(m.group(1)).getOrElse(m.group(2))
      java.util.regex.Matcher.quoteReplacement(env.getOrElse(name, ""))
    })

  /** Load a JSON config file → flat key map (grouped sections flattened
    * with the group prefix dropped, like the reference's normalization,
    * config_loader.py:72-168). Scalar leaves only; `mappings` is handled
    * separately by [[selectTableMapping]].
    */
  def loadFlat(path: String, env: Map[String, String] = sys.env): Map[String, String] = {
    val root = parse(path, env)
    val out = Map.newBuilder[String, String]
    // grouped → flat drops the group name EXCEPT for the reference's
    // explicit table-name normalization (config_loader.py:87-88,
    // 102-103): source.table_name and destination.table_name are
    // PREFIXED, never collapsed — collapsing made the two collide on
    // `table_name` and left the CLI's source_table/dest_table unfed
    // from grouped configs.
    def flatKey(group: String, key: String): String = (group, key) match {
      case ("source", "table_name")      => "source_table"
      case ("destination", "table_name") => "dest_table"
      case (_, k)                        => k
    }
    def walk(node: JsonNode, group: String): Unit =
      node.properties().asScala.foreach { e =>
        val key = e.getKey
        val v = e.getValue
        if (key == "mappings") () // structured; not flattened
        else if (v.isObject) walk(v, key) // grouped → flat
        else if (v.isArray) // scalar arrays flatten to CSV (string_null_tokens)
          out += flatKey(group, key) ->
            v.elements().asScala.map(_.asText()).mkString(",")
        else if (v.isValueNode) out += flatKey(group, key) -> v.asText()
      }
    walk(root, "")
    out.result()
  }

  private def parse(path: String, env: Map[String, String]): JsonNode = {
    val raw = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    mapper.readTree(expandEnv(raw, env))
  }

  /** Precedence merge: CLI > file > env (reference: config_loader.py:171-248). */
  def merge(cli: Map[String, String], file: Map[String, String],
      env: Map[String, String]): Map[String, String] =
    env ++ file ++ cli.filter(_._2 != null)

  /** Per-table mapping: `default` mapping ⊕ table-level override selected
    * case-insensitively by `source_table`
    * (reference: config_loader.py:251-289). Table-level keys win.
    */
  def selectTableMapping(path: String, table: String,
      env: Map[String, String] = sys.env): MappingPlan = {
    val root = parse(path, env)
    val mappings = root.path("mappings")
    if (mappings.isMissingNode) return MappingPlan()
    val default = mappings.path("default")
    val specific = mappings.path("tables").elements().asScala
      .find(t => t.path("source_table").asText("").equalsIgnoreCase(table))
    val merged = mapper.createObjectNode()
    if (default.isObject) {
      merged.setAll[JsonNode](default.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode])
      ()
    }
    specific.filter(_.isObject).foreach { s =>
      merged.setAll[JsonNode](s.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode])
      ()
    }
    parseMapping(merged)
  }

  /** JSON mapping node → MappingPlan. */
  def parseMapping(n: JsonNode): MappingPlan = {
    def strs(node: JsonNode): Seq[String] =
      if (node.isArray) node.elements().asScala.map(_.asText()).toSeq else Nil
    def strMap(node: JsonNode): Map[String, String] =
      if (node.isObject)
        node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      else Map.empty
    val computed = n.path("computed") match {
      case c if c.isObject =>
        c.properties().asScala.map { e =>
          // {"full_name": {"func":"concat","args":["a","b"]}}
          val func = e.getValue.path("func").asText("")
          val args = strs(e.getValue.path("args"))
          ComputedColumn(e.getKey, func, args)
        }.toSeq
      case c if c.isArray =>
        c.elements().asScala.map { v =>
          ComputedColumn(v.path("name").asText(""), v.path("func").asText(""),
            strs(v.path("args")))
        }.toSeq
      case _ => Nil
    }
    MappingPlan(
      include = if (n.has("include")) Some(strs(n.path("include"))) else None,
      exclude = strs(n.path("exclude")),
      rename = strMap(n.path("rename")),
      computed = computed,
      defaults = strMap(n.path("defaults")),
      // the reference spells it `type_override` (README.md:199); accept both
      typeOverrides = strMap(n.path("type_override")) ++ strMap(n.path("type_overrides")),
      order = strs(n.path("order")))
  }

  /** Compat policy from a flat config map (SURVEY.md §2.6 knobs + CLI
    * names, reference: config.py:49-56, cli.py:64-76).
    */
  def compatFrom(flat: Map[String, String]): CompatConfig = {
    def bool(k: String, dflt: Boolean) =
      flat.get(k).map(v => Set("true", "1", "yes").contains(v.toLowerCase)).getOrElse(dflt)
    CompatConfig(
      preserveStringNullTokens = bool("preserve_string_null_tokens", dflt = true),
      stringNullTokens = flat.get("string_null_tokens")
        .map(_.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq)
        .getOrElse(CompatConfig.DefaultNullTokens),
      treatEmptyStringAsNull = bool("treat_empty_string_as_null", dflt = false),
      nullOnNonNullable = NullPolicy.parse(flat.getOrElse("null_on_non_nullable", "fail")),
      nullFillSentinel = flat.getOrElse("null_fill_sentinel", ""))
  }
}
