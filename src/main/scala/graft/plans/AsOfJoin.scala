package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  And, Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, PredicateHelper, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Filter => LFilter}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Match direction of the as-of join — the three modes users of asof
  * APIs (pandas `merge_asof`, kdb `aj`, QuestDB/DuckDB `ASOF JOIN`)
  * reach for. */
sealed trait AsOfDirection
object AsOfDirection {
  /** Greatest right-ts <= left-ts (the classic trade/quote default). */
  case object Backward extends AsOfDirection
  /** Smallest right-ts >= left-ts. */
  case object Forward extends AsOfDirection
  /** Whichever of backward/forward is closer in absolute ts distance;
    * an exact tie chooses backward (pandas `merge_asof` convention). */
  case object Nearest extends AsOfDirection
}

/** A native as-of join — the build-rules preference-(c) extension point
  * (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`): whole-operator
  * semantics Spark's DataFrame algebra lacks, expressed as a first-class
  * plan node instead of the union-tag + window encoding
  * ([[graft.ops.Relational.qJoinAsof]] — both formulations are kept and
  * oracle-checked against DuckDB's `ASOF JOIN`).
  *
  * Semantics: for each left row, the single right row with the same key
  * and — per [[AsOfDirection]] — the greatest right-ts <= left-ts
  * (backward), the smallest right-ts >= left-ts (forward), or the
  * closest of the two (nearest; ties break backward). An optional
  * `tolerance` bounds the match gap: a candidate farther than
  * `tolerance` ts-units away (micros for timestamps) is no match at
  * all. `Inner` drops left rows with no match; `LeftOuter` keeps them
  * with a null-filled right side (the common trade/quote shape — every
  * trade survives, quoted or not).
  *
  * Scale shape: each side shuffles ONCE on its key (co-partitioned
  * `ClusteredDistribution`s, same machinery as sort-merge join) and is
  * sorted (key, ts) within partitions; the join itself is a streaming
  * two-pointer merge per partition — no window state over the unioned
  * stream, no per-row lookups, O(1) memory beyond one candidate row.
  * Forward/nearest peek at (never consume) the next right row, so the
  * merge stays single-pass.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Expression, rightKey: Expression,
                    leftTs: Expression, rightTs: Expression,
                    joinType: JoinType = Inner,
                    direction: AsOfDirection = AsOfDirection.Backward,
                    tolerance: Option[Double] = None)
    extends BinaryNode {
  require(joinType == Inner || joinType == LeftOuter,
          s"as-of join supports Inner and LeftOuter, got $joinType")
  require(tolerance.forall(_ >= 0), s"as-of tolerance must be >= 0, got $tolerance")
  override def output: Seq[Attribute] = joinType match {
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] to [[AsOfJoinExec]]. Registered either via
  * `spark.experimental.extraStrategies` (done lazily by
  * [[AsOfJoins.asof]]) or session-wide via [[GraftExtensions]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, jt, dir, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, jt, dir, tol,
                   planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned on the keys, children sorted by
  * (key, ts); per-partition streaming merge keeping only the latest
  * in-range right row per key (backward candidate) and peeking the
  * next right row (forward candidate). Key/ts must be orderable atomic
  * types whose values do not alias the row buffer (integral, floating,
  * date/timestamp — the as-of domain); nearest/tolerance additionally
  * require a NUMERIC ts (distances are differences). */
case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression,
                        joinType: JoinType,
                        direction: AsOfDirection,
                        tolerance: Option[Double],
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = joinType match {
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val emitUnmatched = joinType == LeftOuter
    val nRightCols = right.output.size
    val lRdd = left.execute()
    val rRdd = right.execute()
    // zipPartitions pairs partitions BY INDEX: it is only a join if both
    // children arrived with the same partitioning. EnsureRequirements
    // guarantees that for the ClusteredDistributions above, but a
    // mismatch (e.g. a future planner change satisfying one side with a
    // different layout) must fail loudly, never mis-join silently.
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      "AsOfJoinExec requires co-partitioned children, got " +
        s"${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions} partitions")
    val dir = direction
    val tol = tolerance
    lRdd.zipPartitions(rRdd) { (lIt, rIt) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      // ts distance for tolerance/nearest: exact Long arithmetic for
      // the integral internal types (timestamp micros / date days /
      // int / long), double otherwise. Only evaluated when tol or
      // nearest is in play — plain backward/forward joins never
      // require a numeric ts.
      def tsDiff(a: Any, b: Any): Double = (a, b) match {
        case (x: java.lang.Long, y: java.lang.Long)       => (x - y).toDouble
        case (x: java.lang.Integer, y: java.lang.Integer) => (x.toLong - y.toLong).toDouble
        case (x: java.lang.Number, y: java.lang.Number)   => x.doubleValue() - y.doubleValue()
        case _ => throw new UnsupportedOperationException(
          s"as-of nearest/tolerance requires a numeric ts, got $tsType")
      }
      def withinTol(gap: => Double): Boolean = tol.forall(gap <= _)
      // Forward mode must NOT consume an exactly-simultaneous right
      // row (rt == lt is its best match); backward/nearest fold it
      // into the backward candidate (distance 0 wins every nearest
      // comparison, so semantics agree).
      val consumeEq = dir != AsOfDirection.Forward
      val rBuf = rIt.buffered
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)
      val nullRight = new GenericInternalRow(nRightCols)
      // the latest right row consumed whose key matched the key it was
      // consumed under (checked against each left key before emitting)
      var cand: InternalRow = null
      var candKey: Any = null
      var candTs: Any = null
      lIt.flatMap { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTsB.eval(lRow)
        if (lk == null || lt == null) {
          // null key/ts matches nothing; LeftOuter still keeps the row
          if (emitUnmatched) Iterator.single(resultProj(joined(lRow, nullRight)))
          else Iterator.empty
        } else {
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rk = rKeyB.eval(rBuf.head)
            val rt = rTsB.eval(rBuf.head)
            if (rk == null || rt == null) { rBuf.next(); () } // unmatchable
            else {
              val c = keyOrd.compare(rk, lk)
              val tc = if (c == 0) tsOrd.compare(rt, lt) else 0
              if (c < 0 || (c == 0 && (if (consumeEq) tc <= 0 else tc < 0))) {
                val r = rBuf.next()
                if (c == 0) { cand = r.copy(); candKey = rk; candTs = rt }
              } else advancing = false
            }
          }
          // backward candidate: the latest consumed same-key row
          val bwOk = cand != null && keyOrd.compare(candKey, lk) == 0 &&
            (tol.isEmpty || withinTol(tsDiff(lt, candTs)))
          // forward candidate: peek (never consume — one right row can
          // be the forward match of many left rows)
          var fwRow: InternalRow = null
          var fwTs: Any = null
          if (dir != AsOfDirection.Backward && rBuf.hasNext) {
            val rk = rKeyB.eval(rBuf.head)
            val rt = rTsB.eval(rBuf.head)
            if (rk != null && rt != null && keyOrd.compare(rk, lk) == 0 &&
                withinTol(tsDiff(rt, lt))) {
              fwRow = rBuf.head; fwTs = rt
            }
          }
          val matched: InternalRow = dir match {
            case AsOfDirection.Backward => if (bwOk) cand else null
            case AsOfDirection.Forward  => fwRow
            case AsOfDirection.Nearest  =>
              if (bwOk && fwRow != null) {
                // tie → backward (pandas merge_asof convention)
                if (tsDiff(lt, candTs) <= tsDiff(fwTs, lt)) cand else fwRow
              } else if (bwOk) cand else fwRow
          }
          if (matched != null)
            Iterator.single(resultProj(joined(lRow, matched)))
          else if (emitUnmatched)
            Iterator.single(resultProj(joined(lRow, nullRight)))
          else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule completing the custom node's Catalyst integration:
  * the built-in `PushDownPredicates` cannot see through [[AsOfJoin]]
  * (an unknown node is a pushdown barrier), so a filter written above
  * the join would otherwise run AFTER the shuffle+merge and never
  * reach the parquet scan. LEFT-side-only deterministic conjuncts are
  * safe to push: each left row's match depends only on the right
  * stream, so dropping left rows early cannot change any surviving
  * row's result (this holds for Inner and LeftOuter alike). Right-side
  * predicates are NOT pushed — filtering the right stream changes
  * which row is "the latest prior" (e.g. a right-ts bound would
  * rewrite history), the classic as-of pushdown trap. */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ LFilter(cond, a: AsOfJoin) =>
      val (pushable, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = a.copy(left = LFilter(pushable.reduce(And), a.left))
        rest.reduceOption(And).map(LFilter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Public entry points. */
object AsOfJoins {

  /** Idempotently registers the planner strategy and the pushdown
    * rule on the session. */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(PushFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations = opts :+ PushFilterThroughAsOfJoin
  }

  /** `left ASOF [LEFT] JOIN right ON left.keyCol = right.keyCol AND
    * left.tsCol >= right.tsCol` (backward default; `Inner` or
    * `LeftOuter`), or forward (`<=`) / nearest per `direction`, with
    * an optional max-gap `tolerance` in the ts column's internal units
    * (MICROSECONDS for timestamps, days for dates). Column names are
    * resolved per side; rename overlapping right columns first. */
  def asof(left: DataFrame, right: DataFrame,
           leftKeyCol: String, rightKeyCol: String,
           leftTsCol: String, rightTsCol: String,
           joinType: JoinType = Inner,
           direction: AsOfDirection = AsOfDirection.Backward,
           tolerance: Option[Double] = None): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(",")}"))
    org.apache.spark.sql.graft.Shims.ofRows(spark,
      AsOfJoin(lPlan, rPlan,
               attr(lPlan, leftKeyCol), attr(rPlan, rightKeyCol),
               attr(lPlan, leftTsCol), attr(rPlan, rightTsCol), joinType,
               direction, tolerance))
  }
}

/** `spark.sql.extensions`-style session extension wiring the planner
  * strategy AND the whole graft SQL-function surface
  * ([[graft.functions.GraftFunctions]]) into every session built with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — a user gets the as-of plan
  * node and `SELECT graft_dot(a, b)` etc. with no imports. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughAsOfJoin)
    graft.functions.GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions", name),
        builder))
    }
  }
}
