package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SQL surface for the engine's native expressions: register them as
  * functions so `spark.sql` users can call cosine/simhash/minhash/
  * jaccard/shingles directly. Two entry points:
  *
  *  - `GraftExtensions` for `SparkSession.builder.withExtensions` /
  *    `spark.sql.extensions=graft.GraftExtensions` (plan-time injection)
  *  - `GraftFunctions.register(spark)` for an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // whole-operator extension: as-of join logical node → merge exec
    e.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
  }
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine",
      info("graft_cosine", "cosine similarity of two float arrays"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))),
    ("graft_dot",
      info("graft_dot", "dot product of two float arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("graft_simhash",
      info("graft_simhash", "64-bit simhash of a token array"),
      (es: Seq[Expression]) => SimHash64(es(0))),
    ("graft_jaccard",
      info("graft_jaccard", "set jaccard of two string arrays"),
      (es: Seq[Expression]) => JaccardSim(es(0), es(1))),
    ("graft_shingles",
      info("graft_shingles", "word n-gram shingles of a string; arg2 = n"),
      (es: Seq[Expression]) => WordShinglesExpr(es(0),
        es(1).eval().asInstanceOf[Int])),
    ("graft_minhash",
      info("graft_minhash", "minhash signature of a string; arg2 = n, arg3 = k"),
      (es: Seq[Expression]) => MinHashOfText(es(0),
        es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int],
        0x7f4a7c15)),
    ("graft_langid",
      info("graft_langid", "heuristic language id of a string (en/de/fr/es/zh/und)"),
      (es: Seq[Expression]) => LangIdExpr(es(0), TextFunctions.StopwordsByLang)),
    ("graft_stopword_hits",
      info("graft_stopword_hits",
        "count of English stopword tokens in a string (quality signal)"),
      (es: Seq[Expression]) => StopwordHitsExpr(es(0),
        TextFunctions.StopwordsByLang.head._2)))

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit = all.foreach {
    case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
  }
}
