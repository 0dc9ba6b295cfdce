package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, NamedExpression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}

/** Whole-operator as-of join as a first-class Catalyst citizen: a logical
  * node, a planner strategy, and a physical merge operator — the
  * preference-(c) extension path from the build plan, used because Spark
  * has no native point-in-time join.
  *
  * Semantics (same contract as [[graft.operators.AsOf.joinViaWindow]]):
  * for each left row, attach the payload of the LATEST right row with the
  * same key and rightTime <= leftTime; all payload fields come from that
  * single right row (nulls intact).
  *
  * Scale shape: EnsureRequirements co-partitions both sides by key (one
  * Exchange each, none if already partitioned) and sorts each side by
  * (key, time); the merge itself is a single forward pass per partition
  * holding ONE buffered right row — O(1) memory, no window state, no
  * union of the two sides, and the left side streams through untouched.
  * Compare the union+window formulation, which materializes left AND
  * right rows in one window buffer per key.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    payload: Seq[Expression],
    payloadOut: Seq[Attribute]) extends BinaryNode {
  // payloadOut is pre-generated at construction (asof_<col> attributes)
  // rather than derived from Aliases: the analyzer's CleanupAliases rule
  // strips Alias nodes inside foreign operators, and output exprIds must
  // be stable across plan copies.

  override def output: Seq[Attribute] = left.output ++ payloadOut

  // payloadOut originates HERE, not from a child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]. Injected via
  * `GraftExtensions` (injectPlannerStrategy) and auto-registered through
  * `spark.experimental.extraStrategies` by [[graft.operators.AsOf]].
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, payload, payloadOut) =>
      AsOfJoinExec(lk, rk, lt, rt, payload, payloadOut,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join.
  *
  * Child requirements declare the shape; EnsureRequirements supplies the
  * exchanges/sorts only where the existing partitioning doesn't already
  * satisfy them (e.g. a bucketed or pre-partitioned side needs none):
  *  - distribution: clustered by key on both sides (co-partitioned)
  *  - ordering: (key ASC, time ASC) within each partition
  *
  * The merge keeps exactly one candidate payload per key in flight; right
  * rows are consumed at most once (each partition is a single
  * forward scan of both sides).
  */
case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    payload: Seq[Expression], payloadOut: Seq[Attribute],
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    SortOrder(leftKey, Ascending) :: SortOrder(leftTime, Ascending) :: Nil,
    SortOrder(rightKey, Ascending) :: SortOrder(rightTime, Ascending) :: Nil)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // left rows stream through in order; downstream sorts on (key, time)
  // can be elided
  override def outputOrdering: Seq[SortOrder] =
    SortOrder(leftKey, Ascending) :: SortOrder(leftTime, Ascending) :: Nil

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** Types physically stored as a primitive long/int in UnsafeRow — the
    * common as-of shape (bigint key, timestamp time) takes the unboxed
    * merge loop.
    */
  private def longBacked(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.DateType => true
    case _ => false
  }

  private def longGetter(dt: org.apache.spark.sql.types.DataType, ord: Int): InternalRow => Long =
    dt match {
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.DateType => r => r.getInt(ord).toLong
      case _ => r => r.getLong(ord)
    }

  // ---------------- whole-stage codegen ----------------
  //
  // Like SortMergeJoinExec, this operator STARTS a codegen stage: it
  // reads both (co-partitioned, sorted) children as plain row iterators
  // (inputs[0]/inputs[1]) and generates the forward-merge loop inline,
  // so everything DOWNSTREAM (projections, filters, the final
  // rowWriter) fuses with the merge instead of iterator-boxing at the
  // operator's output boundary.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  override def needCopyResult: Boolean = true

  override def doProduce(ctx: CodegenContext): String = {
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator",
      "asofRightInput", v => s"$v = inputs[1];")

    val keyJava = CodeGenerator.javaType(keyType)
    val timeJava = CodeGenerator.javaType(timeType)
    // right-cursor + candidate state lives in fields: produce() returns
    // to the caller after every output row, the merge resumes where it
    // stopped
    val rLive = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofRLive")
    val rValid = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofRValid")
    val rStarted = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofRStarted")
    val rKey = ctx.addMutableState(keyJava, "asofRKey")
    val rTime = ctx.addMutableState(timeJava, "asofRTime")
    val rRow = ctx.addMutableState("InternalRow", "asofRRow")
    val hasLast = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofHasLast")
    val lastKey = ctx.addMutableState(keyJava, "asofLastKey")
    val lastRow = ctx.addMutableState("InternalRow", "asofLastRow")

    // advance-right helper: copy the row FIRST (iterator buffers are
    // reused), then evaluate key/time against the copy so non-primitive
    // keys (UTF8String, Decimal) stay valid while buffered
    val rRowLocal = ctx.freshName("asofR")
    ctx.currentVars = null
    ctx.INPUT_ROW = rRowLocal
    val rkEv = BindReferences.bindReference(rightKey, right.output).genCode(ctx)
    val rtEv = BindReferences.bindReference(rightTime, right.output).genCode(ctx)
    val advanceRight = ctx.addNewFunction("asofAdvanceRight",
      s"""
         |private void asofAdvanceRight() {
         |  if ($rightInput.hasNext()) {
         |    InternalRow $rRowLocal = ((InternalRow) $rightInput.next()).copy();
         |    ${rkEv.code}
         |    ${rtEv.code}
         |    $rValid = !(${rkEv.isNull}) && !(${rtEv.isNull});
         |    if ($rValid) {
         |      $rKey = ${rkEv.value};
         |      $rTime = ${rtEv.value};
         |      $rRow = $rRowLocal;
         |    }
         |    $rLive = true;
         |  } else {
         |    $rLive = false;
         |  }
         |}
       """.stripMargin)

    // per-left-row code: key/time, then every left output column
    val leftRow = ctx.freshName("asofLeftRow")
    ctx.currentVars = null
    ctx.INPUT_ROW = leftRow
    val lkEv = BindReferences.bindReference(leftKey, left.output).genCode(ctx)
    val ltEv = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }

    // payload columns come from the buffered matched row, null when the
    // left row found no as-of match (same contract as the interpreted
    // path's nullPayload row)
    val hasMatch = ctx.freshName("asofHasMatch")
    ctx.INPUT_ROW = lastRow
    val payloadVars = payload
      .map(BindReferences.bindReference(_, right.output))
      .map { e =>
        val ev = e.genCode(ctx)
        val isNull = ctx.freshName("asofIsNull")
        val value = ctx.freshName("asofValue")
        val jt = CodeGenerator.javaType(e.dataType)
        val assign =
          code"""
            boolean $isNull = true;
            $jt $value = ${CodeGenerator.defaultValue(e.dataType)};
            if ($hasMatch) {
              ${ev.code}
              $isNull = ${ev.isNull};
              $value = ${ev.value};
            }
          """
        ExprCode(assign, JavaCode.isNullVariable(isNull),
          JavaCode.variable(value, e.dataType))
      }

    val advancing = ctx.freshName("asofAdvancing")
    val kc = ctx.freshName("asofKc")
    // emit the output-column code exactly once and CLEAR it from the
    // ExprCodes before consume() — consume's row construction calls
    // evaluateVariables on the vars it receives, and un-cleared codes
    // get emitted a second time ("redefinition of local variable",
    // compile failure → silent interpreted fallback). Same discipline
    // as SortMergeJoinExec.createLeftVars.
    val allVars = leftVars ++ payloadVars
    val evalAll = evaluateVariables(allVars)
    s"""
       |if (!$rStarted) { $rStarted = true; $advanceRight(); }
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  ${lkEv.code}
       |  ${ltEv.code}
       |  boolean $hasMatch = false;
       |  if (!(${lkEv.isNull}) && !(${ltEv.isNull})) {
       |    boolean $advancing = true;
       |    while ($rLive && $advancing) {
       |      if (!$rValid) { $advanceRight(); }
       |      else {
       |        int $kc = ${ctx.genComp(keyType, rKey, lkEv.value.toString)};
       |        if ($kc < 0) { $advanceRight(); }
       |        else if ($kc == 0 &&
       |            ${ctx.genComp(timeType, rTime, ltEv.value.toString)} <= 0) {
       |          $hasLast = true; $lastKey = $rKey; $lastRow = $rRow;
       |          $advanceRight();
       |        } else { $advancing = false; }
       |      }
       |    }
       |    if ($hasLast &&
       |        ${ctx.genComp(keyType, lastKey, lkEv.value.toString)} == 0) {
       |      $hasMatch = true;
       |    }
       |  }
       |  $evalAll
       |  ${consume(ctx, allVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val payloadB = payload.map(BindReferences.bindReference(_, right.output))
    val outAttrs = output

    // unboxed path when key+time are primitive-backed attributes (the
    // interpreted path boxes 4+ values per row — measured 3x slower on
    // the 600k-row bench query)
    val fastOrds: Option[(Int, Int, Int, Int)] =
      (lKeyB, rKeyB, lTimeB, rTimeB) match {
        case (lk: org.apache.spark.sql.catalyst.expressions.BoundReference,
              rk: org.apache.spark.sql.catalyst.expressions.BoundReference,
              lt: org.apache.spark.sql.catalyst.expressions.BoundReference,
              rt: org.apache.spark.sql.catalyst.expressions.BoundReference)
            if longBacked(keyType) && longBacked(timeType) =>
          Some((lk.ordinal, rk.ordinal, lt.ordinal, rt.ordinal))
        case _ => None
      }

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadB)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(payload.size)

      fastOrds match {
        case Some((lki, rki, lti, rti)) =>
          val lKeyGet = longGetter(keyType, lki)
          val rKeyGet = longGetter(keyType, rki)
          val lTimeGet = longGetter(timeType, lti)
          val rTimeGet = longGetter(timeType, rti)
          var rLive = false
          var rKeyV = 0L
          var rTimeV = 0L
          var rValid = false // false = right row had null key/time, skip it
          var rPayload: InternalRow = null
          def advanceRight(): Unit =
            if (rIter.hasNext) {
              val r = rIter.next()
              rValid = !r.isNullAt(rki) && !r.isNullAt(rti)
              if (rValid) {
                rKeyV = rKeyGet(r)
                rTimeV = rTimeGet(r)
                rPayload = payloadProj(r).copy()
              }
              rLive = true
            } else rLive = false
          advanceRight()

          var hasLast = false
          var lastKey = 0L
          var lastPayload: InternalRow = null

          lIter.map { l =>
            var out: InternalRow = nullPayload
            if (!l.isNullAt(lki) && !l.isNullAt(lti)) {
              val lk = lKeyGet(l)
              val lt = lTimeGet(l)
              var advance = true
              while (rLive && advance) {
                if (!rValid) advanceRight()
                else if (rKeyV < lk) advanceRight()
                else if (rKeyV == lk && rTimeV <= lt) {
                  hasLast = true; lastKey = rKeyV; lastPayload = rPayload
                  advanceRight()
                } else advance = false
              }
              if (hasLast && lastKey == lk) out = lastPayload
            }
            resultProj(joined(l, out))
          }

        case None =>
          val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
          val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
          // one-row lookahead over the right side; rows from execute()
          // are reused buffers, so candidate key and payload are copied
          // once per right row
          var rLive = false
          var rKeyV: Any = null
          var rTimeV: Any = null
          var rPayload: InternalRow = null
          def advanceRight(): Unit =
            if (rIter.hasNext) {
              val r = rIter.next()
              rKeyV = InternalRow.copyValue(rKeyB.eval(r))
              rTimeV = InternalRow.copyValue(rTimeB.eval(r))
              rPayload = payloadProj(r).copy()
              rLive = true
            } else rLive = false
          advanceRight()

          var lastKey: Any = null
          var lastPayload: InternalRow = null

          lIter.map { l =>
            val lk = lKeyB.eval(l)
            val lt = lTimeB.eval(l)
            var out: InternalRow = nullPayload
            if (lk != null && lt != null) {
              // consume right rows that sort at-or-before (lk, lt); rows
              // with null key/time sort first in their group, skipped
              var advance = true
              while (rLive && advance) {
                if (rKeyV == null || rTimeV == null) advanceRight()
                else {
                  val kc = keyOrd.compare(rKeyV, lk)
                  if (kc < 0) advanceRight() // stale key, drop candidate
                  else if (kc == 0 && timeOrd.compare(rTimeV, lt) <= 0) {
                    lastKey = rKeyV
                    lastPayload = rPayload
                    advanceRight()
                  } else advance = false // right side past this left row
                }
              }
              if (lastKey != null && keyOrd.compare(lastKey, lk) == 0)
                out = lastPayload
            }
            resultProj(joined(l, out))
          }
      }
    }
  }
}
