package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

import graft.functions.TopKByScore

/** Optimizer rule: rewrite the classic per-group top-k anti-pattern
  *
  * {{{
  *   Filter(rn <= k,
  *     Window(row_number() OVER (PARTITION BY g ORDER BY score DESC, id ASC) AS rn,
  *       child))
  * }}}
  *
  * into the bounded-heap [[graft.functions.TopKByScore]] aggregate +
  * explode. The window form sorts EVERY row of a group inside one task
  * (with few groups — ANN queries, per-key leaderboards — that task
  * sees the whole scored corpus); the aggregate form keeps a k-entry
  * heap per group per input partition, so the shuffle moves ≤ k rows ×
  * groups × partitions regardless of corpus size. This is the rewrite
  * the engine's own operators apply by hand (Similarity.topKRank);
  * the rule extends it to SQL-frontend users via GraftExtensions.
  *
  * Relation to Spark's own `InferWindowGroupLimit` (3.5+): that rule
  * inserts a WindowGroupLimit that pre-filters each MAP partition to
  * its local top-k, but the final Window still sorts and ranks every
  * surviving row of a group in ONE task — with few groups that task
  * still receives k × input-partitions rows and a full per-group sort.
  * This rewrite removes the Window entirely: the merge side is a heap
  * merge inside a hash aggregate, never a per-group sort task. (When
  * the rewrite fires the WindowGroupLimit becomes a harmless extra
  * prefilter below the aggregate.)
  *
  * Fires only where equivalence is EXACT:
  *  - single window expression, `row_number()` (rank ties impossible);
  *  - ordering is precisely (score: double DESC NULLS LAST,
  *    id: atomic ASC), both non-nullable attributes (the aggregate
  *    ignores nulls; with non-nullable inputs the window agrees);
  *  - grouping keys are attributes, and the window child outputs
  *    nothing beyond keys + score + id (column pruning has already run
  *    when user rules execute, so extra outputs mean extra consumers);
  *  - the filter is `rn <= k`, `rn < k+1`, or `rn = 1` (argmax).
  *
  * Output attributes keep the ORIGINAL exprIds (aliases pinned), so
  * parent operators are untouched.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
  }

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) && k >= 1 => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) && k >= 2 => Some(k - 1)
      case EqualTo(a: Attribute, Literal(1, IntegerType))
        if a.semanticEquals(rn) => Some(1)
      case _ => None
    }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] =
    w match {
      case Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(partitionSpec, Seq(
              SortOrder(score: AttributeReference, Descending, NullsLast, _),
              SortOrder(id: AttributeReference, Ascending, _, _)), _)),
            _)), _, _, child, _)
          if score.dataType == DoubleType && !score.nullable &&
            Seq(LongType, IntegerType, StringType).contains(id.dataType) &&
            !id.nullable &&
            partitionSpec.forall(_.isInstanceOf[AttributeReference]) =>
        val rnAttr = alias.toAttribute
        val groupAttrs = partitionSpec.map(_.asInstanceOf[AttributeReference])
        val needed = (groupAttrs :+ score :+ id).map(_.exprId).toSet
        val k = limitOf(cond, rnAttr)
        if (k.isEmpty || !child.output.forall(a => needed.contains(a.exprId)))
          None
        else {
          val topkAlias = Alias(
            AggregateExpression(TopKByScore(score, id, k.get),
              Complete, isDistinct = false), "__topk")()
          val agg = Aggregate(groupAttrs, groupAttrs :+ topkAlias, child)
          val elemType = TopKByScore(score, id, k.get).dataType
            .asInstanceOf[org.apache.spark.sql.types.ArrayType]
          val entry = AttributeReference("__topk_entry",
            elemType.elementType, nullable = false)()
          val gen = Generate(Explode(topkAlias.toAttribute),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(entry), agg)
          // reproduce the Window's output attribute list, pinning the
          // ORIGINAL exprIds so nothing upstream needs to change
          val outCols: Seq[NamedExpression] = w.output.map { a =>
            if (a.exprId == rnAttr.exprId)
              Alias(GetStructField(entry, 2, Some("rank")), a.name)(
                exprId = a.exprId)
            else if (a.exprId == score.exprId)
              Alias(GetStructField(entry, 1, Some("score")), a.name)(
                exprId = a.exprId)
            else if (a.exprId == id.exprId)
              Alias(GetStructField(entry, 0, Some("id")), a.name)(
                exprId = a.exprId)
            else a
          }
          Some(Project(outCols, gen))
        }
      case _ => None
    }
}
