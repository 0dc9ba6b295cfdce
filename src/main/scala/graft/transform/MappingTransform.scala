package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MigrateFunctions
import graft.model.{ComputedColumn, MappingPlan, MappingValidationError}

/** Declarative column-mapping layer (SURVEY.md §2.2 P3/P5/P6, §2.4, D1,
  * D5; reference: migrator.py:827-977, validation 752-825).
  *
  * Application order matches the reference exactly:
  * include/exclude → rename → computed (sequential; later computed columns
  * may reference earlier ones) → defaults → explicit output order.
  * All column matching is case-insensitive. Everything compiles to one
  * narrow projection chain — no shuffle, no UDFs.
  */
object MappingTransform {

  val FunctionWhitelist: Set[String] =
    Set("concat", "upper", "lower", "substr", "now", "format")

  /** Plan-time validation (D5, reference: migrator.py:752-825). Throws
    * [[MappingValidationError]] with the reference's rules:
    * include columns must exist; rename sources must exist and targets be
    * unique; computed functions must be whitelisted; format templates must
    * parse and named placeholders must resolve against
    * source ∪ renamed ∪ earlier-computed names (unknown positional args
    * are treated as literals — allowed).
    */
  def validate(plan: MappingPlan, sourceColumns: Seq[String]): Unit = {
    val src = sourceColumns.map(_.toLowerCase).toSet

    plan.include.getOrElse(Nil).foreach { c =>
      if (!src.contains(c.toLowerCase))
        throw new MappingValidationError(s"include column not found in source: $c")
    }
    plan.rename.keys.foreach { s =>
      if (!src.contains(s.toLowerCase))
        throw new MappingValidationError(s"rename source column not found: $s")
    }
    val targets = plan.rename.values.map(_.toLowerCase).toSeq
    if (targets.distinct.size != targets.size)
      throw new MappingValidationError(
        s"duplicate rename targets: ${targets.diff(targets.distinct).distinct.mkString(",")}")

    var known = src -- plan.rename.keys.map(_.toLowerCase) ++
      plan.rename.values.map(_.toLowerCase)
    plan.computed.foreach { cc =>
      if (!FunctionWhitelist.contains(cc.func.toLowerCase))
        throw new MappingValidationError(
          s"computed function not whitelisted: ${cc.func} (allowed: ${FunctionWhitelist.mkString(",")})")
      if (cc.func.equalsIgnoreCase("format")) {
        if (cc.args.isEmpty)
          throw new MappingValidationError(s"format requires a template arg: ${cc.name}")
        val segs = MigrateFunctions.parseTemplate(cc.args.head) // throws on bad template
        val named = segs.collect { case MigrateFunctions.Ph(Some(n), _) => n }
        if (named.nonEmpty && cc.args.size == 1) {
          named.foreach { n =>
            if (!known.contains(n.toLowerCase))
              throw new MappingValidationError(
                s"format placeholder '{$n}' does not resolve to a column (computed ${cc.name})")
          }
        }
      }
      known += cc.name.toLowerCase
    }
  }

  /** Apply the full mapping to a DataFrame. */
  def apply(df: DataFrame, plan: MappingPlan): DataFrame = {
    if (plan.isEmpty) return df
    val step1 = includeExclude(df, plan)
    val step2 = rename(step1, plan.rename)
    val step3 = plan.computed.foldLeft(step2)((d, cc) => d.withColumn(cc.name, computed(d, cc)))
    val step4 = defaults(step3, plan.defaults)
    reorder(step4, plan.order)
  }

  /** P3: include keeps listed, exclude drops listed (case-insensitive). */
  def includeExclude(df: DataFrame, plan: MappingPlan): DataFrame = {
    val kept = plan.include match {
      case Some(inc) =>
        val want = inc.map(_.toLowerCase).toSet
        df.columns.filter(c => want.contains(c.toLowerCase))
      case None => df.columns
    }
    val drop = plan.exclude.map(_.toLowerCase).toSet
    val fin = kept.filterNot(c => drop.contains(c.toLowerCase))
    df.select(fin.toIndexedSeq.map(col): _*)
  }

  /** P5: rename, case-insensitive on the source name. */
  def rename(df: DataFrame, renames: Map[String, String]): DataFrame = {
    if (renames.isEmpty) return df
    val byLower = renames.map { case (k, v) => k.toLowerCase -> v }
    df.select(df.columns.toIndexedSeq.map { c =>
      byLower.get(c.toLowerCase) match {
        case Some(nw) => col(c).as(nw)
        case None     => col(c)
      }
    }: _*)
  }

  /** §2.4: one computed-column expression. Args naming existing columns
    * use the column; otherwise they are string literals
    * (reference: migrator.py:879-893).
    *
    * Divergence from the reference, documented per SURVEY.md §7.4: pandas
    * `astype(str)` turned NULL into the literal "None" inside concat; we
    * rationalize to empty string via coalesce.
    */
  def computed(df: DataFrame, cc: ComputedColumn): Column = {
    val cols = df.columns.map(c => c.toLowerCase -> c).toMap
    def colOrLit(a: String): Column = cols.get(a.toLowerCase) match {
      case Some(real) => coalesce(col(real).cast("string"), lit(""))
      case None       => lit(a)
    }
    cc.func.toLowerCase match {
      case "concat" =>
        if (cc.args.isEmpty) lit("")
        else concat(cc.args.map(colOrLit): _*)
      case "upper" => upper(colOrLit(cc.args.head))
      case "lower" => lower(colOrLit(cc.args.head))
      case "substr" =>
        // reference is 0-based python slicing; Spark substring is 1-based
        val start = cc.args(1).trim.toInt
        val len = if (cc.args.size > 2) cc.args(2).trim.toInt else Int.MaxValue - start - 1
        substring(colOrLit(cc.args.head), start + 1, len)
      case "now" => current_timestamp()
      case "format" =>
        val template = cc.args.head
        val rest = cc.args.tail
        MigrateFunctions.compileFormat(template, (name, pos) => name match {
          case Some(n) if rest.isEmpty =>
            // named mode: placeholder resolves to a column
            cols.get(n.toLowerCase).map(r => Right(col(r))).getOrElse(Left(""))
          case Some(n) =>
            cols.get(n.toLowerCase).map(r => Right(col(r))).getOrElse(Left(n))
          case None =>
            // positional mode: consume args in order; column if it exists
            if (pos >= rest.size) Left("")
            else {
              val a = rest(pos)
              cols.get(a.toLowerCase).map(r => Right(col(r))).getOrElse(Left(a))
            }
        })
      case other => throw new MappingValidationError(s"unknown function: $other")
    }
  }

  /** D1: mapping-level defaults — fill NULLs on existing columns with a
    * typed literal (reference: migrator.py:863-865).
    */
  def defaults(df: DataFrame, dflts: Map[String, String]): DataFrame = {
    if (dflts.isEmpty) return df
    val byLower = dflts.map { case (k, v) => k.toLowerCase -> v }
    df.select(df.schema.fields.toIndexedSeq.map { f =>
      byLower.get(f.name.toLowerCase) match {
        case Some(v) =>
          coalesce(col(f.name), lit(v).try_cast(f.dataType.sql)).as(f.name)
        case None => col(f.name)
      }
    }: _*)
  }

  /** P6: explicit output ordering — listed columns first (missing names
    * ignored), the rest appended in current order
    * (reference: migrator.py:867-871).
    */
  def reorder(df: DataFrame, order: Seq[String]): DataFrame = {
    if (order.isEmpty) return df
    val cur = df.columns
    val byLower = cur.map(c => c.toLowerCase -> c).toMap
    val listed = order.flatMap(o => byLower.get(o.toLowerCase))
    val rest = cur.filterNot(c => listed.contains(c))
    df.select((listed ++ rest).toIndexedSeq.map(col): _*)
  }
}
