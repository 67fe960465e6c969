package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a whole-operator extension — the one join shape the
  * reference's enrichment semantics need that Spark has no operator for
  * (each event row enriched with the MOST RECENT reference row at or
  * before its timestamp; reference analog: pairing each SCED interval
  * with the weather observation in effect, src/main.py:239-316 joining
  * ERCOT telemetry to hourly/daily weather frames).
  *
  * This is the (c) tier of the extension ladder (SURVEY §2.10): a custom
  * LogicalPlan node, planned by a SparkStrategy into a custom SparkPlan,
  * injected via SparkSessionExtensions.injectPlannerStrategy. Spark's
  * EnsureRequirements supplies the physical contract declared below —
  * both sides hash-clustered on the equi-keys and sorted within
  * partitions by (keys, ts) — so the operator itself is a single
  * forward-only merge per partition: zero extra passes, no window, no
  * state beyond one buffered right row per key.
  *
  * Scale shape: one exchange per side (same as any equi-join), then
  * O(|L| + |R|) per partition. A window/row_number formulation would
  * union both tables and rank — this never materializes the union.
  *
  * Semantics = DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`
  * (the oracle): for each left row, the single right row with equal keys
  * and the largest right-ts <= left-ts; right columns NULL when no such
  * row. Equi-keys compare by sort order (null keys match null keys —
  * callers with SQL-equality needs should filter nulls first).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]; a no-op on every other
  * node, so it composes with the built-in strategies. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides co-clustered on the equi-keys (EnsureRequirements
    * inserts the exchanges, like any shuffled join)... */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** ...and sorted by (keys, ts) within partitions, which is the whole
    * trick: the merge below is then a single forward scan of each side. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val nRight = right.output.size
    val leftOutput = left.output
    val rightOutput = right.output
    val allOutput = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, leftOutput)
      val rKeyProj = UnsafeProjection.create(rightKeys, rightOutput)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), leftOutput)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), rightOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // Bind against a right schema forced nullable: the unmatched case
      // feeds an all-null row, and a non-nullable binding would skip the
      // null check and read garbage zeros.
      val toUnsafe = UnsafeProjection.create(allOutput,
        leftOutput ++ rightOutput.map(_.withNullability(true)))

      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      // The candidate: the newest right row seen whose (key, ts) was
      // at-or-before some left position. One buffered row, total.
      var lastMatch: InternalRow = null
      var lastMatchKey: UnsafeRow = null

      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = lTsProj(l)
        var scanning = rRow != null
        while (scanning) {
          val rk = rKeyProj(rRow)
          val keyCmp = keyOrd.compare(rk, lk)
          if (keyCmp < 0) {
            // right side still on earlier keys: drop and advance
            rRow = if (rIter.hasNext) rIter.next() else null
            scanning = rRow != null
          } else if (keyCmp == 0 && tsOrd.compare(rTsProj(rRow), lt) <= 0) {
            lastMatch = rRow.copy() // newest at-or-before so far wins
            lastMatchKey = rk.copy()
            rRow = if (rIter.hasNext) rIter.next() else null
            scanning = rRow != null
          } else {
            scanning = false // right is ahead of this left row
          }
        }
        val matched = lastMatchKey != null && keyOrd.compare(lastMatchKey, lk) == 0
        toUnsafe(joined(l, if (matched) lastMatch else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsOf.join(left, right, on, leftTs, rightTs)`. */
object AsOf {
  /** Left-outer as-of join: every `left` row, enriched with the single
    * most recent `right` row having equal `on` keys and
    * `rightTsCol <= leftTsCol`. The right-side key columns are dropped
    * from the result (they duplicate the left's); name the right ts
    * column differently from the left's to keep both. */
  def join(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTsCol: String, rightTsCol: String): DataFrame = {
    val spark = left.sparkSession
    val resolver = spark.sessionState.conf.resolver
    val lPlan = GraftSql.analyzed(left)
    // Re-alias every right column under a FRESH exprId: when both sides
    // derive from the same base relation (self-as-of-join), the
    // analyzer's relation dedup regenerates the right subtree's ids, and
    // only expressions anchored to unique top-of-side ids survive that
    // rewrite unambiguously (the same contract a regular self-join has).
    val rPlan = GraftSql.analyzed(
      right.select(right.columns.map(c => org.apache.spark.sql.functions.col(c).as(c)): _*))
    def resolve(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String): Attribute =
      plan.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"asof join: column '$name' not in [${plan.output.map(_.name).mkString(", ")}]"))
    val rightKeyAttrs = on.map(resolve(rPlan, _))
    val node = AsOfJoinPlan(lPlan, rPlan,
      on.map(resolve(lPlan, _)), rightKeyAttrs,
      resolve(lPlan, leftTsCol), resolve(rPlan, rightTsCol))
    rightKeyAttrs.foldLeft(GraftSql.ofRows(spark, node)) { (df, a) =>
      df.drop(GraftSql.column(a))
    }
  }
}
