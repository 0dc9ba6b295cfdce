package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.MappingValidationError

/** Column-expression building blocks for the cast/mapping pipeline.
  * All are pure `Column` compositions — whole-stage-codegen friendly,
  * no UDFs (SURVEY.md §4 "Vectorized exec / codegen").
  */
object MigrateFunctions {

  /** Lenient boolean parse (reference: migrator.py:431-446):
    * true/1/yes/y → true; false/0/no/n/'' → false; anything else → null;
    * null passes through.
    */
  def lenientBool(c: Column): Column = {
    val v = lower(trim(c.cast("string")))
    when(c.isNull, lit(null).cast("boolean"))
      .when(v.isin("true", "1", "yes", "y"), lit(true))
      .when(v.isin("false", "0", "no", "n", ""), lit(false))
      .otherwise(lit(null).cast("boolean"))
  }

  /** Map configured literal null tokens (case-insensitive) to NULL
    * (reference: migrator.py:465-470). Only used when
    * `preserveStringNullTokens=false` — the default PRESERVES them.
    */
  def stripNullTokens(c: Column, tokens: Seq[String]): Column = {
    val lc = tokens.map(_.toLowerCase)
    when(lower(c).isin(lc: _*), lit(null).cast("string")).otherwise(c)
  }

  /** Empty-string → NULL, opt-in (reference: maxcompute_client.py:366-378). */
  def emptyToNull(c: Column): Column =
    when(trim(c) === "", lit(null).cast("string")).otherwise(c)

  /** ±Infinity → NULL for floating columns (reference: migrator.py:486-507,
    * bigquery_client.py:227-252).
    */
  def cleanInfinities(c: Column): Column =
    when(c === Double.PositiveInfinity || c === Double.NegativeInfinity,
      lit(null).cast("double")).otherwise(c)

  // ---------------------------------------------------------------------
  // `format` computed column (reference: migrator.py:906-975;
  // README.md:224-263). Python str.format templates compiled at plan time
  // to a single codegen'd format_string() expression.
  //
  // Null-coercion contract (migrator.py:929-944): numeric (`d`/`f`) specs
  // coerce null/unparseable to 0; everything else coerces null to ''.
  // Template parse errors yield a column of '' (never abort the run).
  // ---------------------------------------------------------------------

  sealed trait Seg
  final case class Lit2(text: String) extends Seg
  final case class Ph(name: Option[String], spec: String) extends Seg

  /** Parse a python-style template into literal/placeholder segments.
    * Supports `{}`, `{name}`, `{:02d}`, `{name:02d}`, `{{`/`}}` escapes.
    */
  def parseTemplate(t: String): Seq[Seg] = {
    val out = Seq.newBuilder[Seg]
    val cur = new StringBuilder
    var i = 0
    def flush(): Unit = if (cur.nonEmpty) { out += Lit2(cur.result()); cur.clear() }
    while (i < t.length) {
      t.charAt(i) match {
        case '{' if i + 1 < t.length && t.charAt(i + 1) == '{' =>
          cur += '{'; i += 2
        case '}' if i + 1 < t.length && t.charAt(i + 1) == '}' =>
          cur += '}'; i += 2
        case '{' =>
          val close = t.indexOf('}', i)
          if (close < 0) throw new MappingValidationError(
            s"unbalanced '{' in format template: $t")
          flush()
          val body = t.substring(i + 1, close)
          val (name, spec) = body.split(":", 2) match {
            case Array(n, sp) => (if (n.isEmpty) None else Some(n), sp)
            case Array(n)     => (if (n.isEmpty) None else Some(n), "")
          }
          out += Ph(name, spec)
          i = close + 1
        case '}' => throw new MappingValidationError(
          s"unbalanced '}' in format template: $t")
        case c => cur += c; i += 1
      }
    }
    flush()
    out.result()
  }

  private val SpecRe = """(0?)(\d*)(?:\.(\d+))?([dfs]?)""".r

  /** python format spec → (java format directive, kind). */
  private[functions] def specToJava(spec: String): (String, Char) = spec match {
    case SpecRe(zero, width, prec, tpe) =>
      val t = if (tpe.isEmpty) 's' else tpe.head
      val w = (if (zero.nonEmpty && t != 's') "0" else "") + width
      val p = Option(prec).filter(_ != null).filter(_.nonEmpty).map("." + _).getOrElse("")
      t match {
        case 'd' => (s"%${w}d", 'd')
        case 'f' => (s"%$w${if (p.isEmpty) ".6" else p}f", 'f')
        case _   => (s"%${w}s", 's')
      }
    case _ => throw new MappingValidationError(s"unsupported format spec: $spec")
  }

  /** Compile a template + resolved arg columns into one Column.
    *
    * `resolve` maps a placeholder name (or positional index as "#i") to
    * either a Column (a real column) or a literal string. Numeric specs
    * wrap args in `coalesce(try_cast(long|double), 0)`; string specs in
    * `coalesce(cast string, '')` — exactly the reference's row-wise null
    * rules, but as expressions.
    */
  def compileFormat(template: String,
      resolve: (Option[String], Int) => Either[String, Column]): Column =
    try {
      val segs = parseTemplate(template)
      val sb = new StringBuilder
      val args = Seq.newBuilder[Column]
      var pos = 0
      segs.foreach {
        case Lit2(s) => sb ++= s.replace("%", "%%")
        case Ph(name, spec) =>
          val (fmt, kind) = specToJava(spec)
          val raw: Column = resolve(name, pos) match {
            case Left(litStr) => lit(litStr)
            case Right(c)     => c
          }
          pos += 1
          sb ++= fmt
          args += (kind match {
            case 'd' => coalesce(raw.cast("string").try_cast("decimal(38,10)")
                          .try_cast("long"), lit(0L))
            case 'f' => coalesce(raw.cast("string").try_cast("double"), lit(0.0))
            case _   => coalesce(raw.cast("string"), lit(""))
          })
      }
      format_string(sb.result(), args.result(): _*)
    } catch {
      // template errors → column of '' (reference: migrator.py:952-975
      // returns '' per row rather than aborting)
      case _: MappingValidationError => lit("")
    }
}
