package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.Bridge

/** AS-OF JOIN — for every left row, the single right row with the same key
  * and the greatest right time <= the left time (inner: lefts with no
  * at-or-before match are dropped). The reference's "latest stored item for
  * this key" read (`/root/reference/storage/diskv.go:49-66` reads the
  * newest non-expired record) generalized to event time.
  *
  * This is the full custom-operator exercise (SURVEY §2.12 level (c)): a
  * custom LogicalPlan, planned by an injected SparkStrategy into a custom
  * SparkPlan whose distribution/ordering REQUIREMENTS let Catalyst place
  * the exchanges:
  *
  *  - requiredChildDistribution = ClusteredDistribution(key) on both sides
  *    => ONE hash shuffle per side (co-partitioned), same as a sort-merge
  *    join — never a per-row range join or a window over an exploded
  *    equi-join (the naive compositions are O(matches) in shuffle volume;
  *    this is O(rows)).
  *  - requiredChildOrdering = (key, time) ascending on both sides
  *    => EnsureRequirements inserts the sorts, and the operator itself is
  *    a single forward merge sweep per partition: O(|L| + |R|), no
  *    buffering beyond ONE candidate row per key.
  *
  * At 10^12 rows the plan is two shuffles + two sorts + a streaming sweep —
  * exactly the shape a hand-tuned kdb/QuestDB-style asof join has.
  *
  * Null keys or times never match (SQL join semantics): the API wrapper
  * filters them on both sides before the plan is built.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Option[Expression]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): LogicalPlan = copy(left = l, right = r)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Option[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** The sweep keeps the LAST matching right row in sort order, so ties on
    * (key, time) resolve to the greatest `rightTieBreak` when one is given
    * — deterministic regardless of scan/partition order. Without a
    * tiebreak, which tied row wins is partition-order dependent (callers
    * needing stable output must supply one, or guarantee unique
    * (key, time) on the right). */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
        rightTieBreak.map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): SparkPlan = copy(left = l, right = r)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExpr = leftKey; val rKeyExpr = rightKey
    val lTimeExpr = leftTime; val rTimeExpr = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lKeyExpr.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeExpr.dataType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = advanceR()
        private var rHeadKey: InternalRow = if (rHead == null) null else rKeyProj(rHead).copy()
        private var cand: InternalRow = null     // newest right row <= left time, key candKey
        private var candKey: InternalRow = null
        private var pending: InternalRow = null

        private def advanceR(): InternalRow = if (rIter.hasNext) rIter.next() else null

        /** Consume right rows up to (lKey, lTime); remember the newest
          * same-key row at-or-before lTime. Single forward pass — right
          * rows are never revisited. */
        private def sweep(lKey: InternalRow, lTime: InternalRow): Unit = {
          var going = true
          while (going && rHead != null) {
            val c = keyOrd.compare(rHeadKey, lKey)
            if (c > 0 || (c == 0 && timeOrd.compare(rTimeProj(rHead), lTime) > 0)) {
              going = false
            } else {
              if (c == 0) { cand = rHead.copy(); candKey = rHeadKey }
              rHead = advanceR()
              rHeadKey = if (rHead == null) null else rKeyProj(rHead).copy()
            }
          }
        }

        override def hasNext: Boolean = {
          while (pending == null && lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            sweep(lKey, lTimeProj(l))
            if (cand != null && keyOrd.compare(candKey, lKey) == 0)
              pending = resultProj(joined(l, cand))
          }
          pending != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val out = pending
          pending = null
          out
        }
      }
    }
  }
}

/** Plans AsOfJoinPlan into AsOfJoinExec (injected via GraftExtensions). */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {

  /** `left` as-of `right` on `keyCol` equality with the greatest
    * `rightTimeCol` <= `leftTimeCol` (inner). Column names of the two
    * frames should be disjoint apart from the key (rename the right side
    * first, like any self-join). `rightTieBreakCol`: among right rows tied
    * on (key, time), the one with the greatest tiebreak value wins —
    * supply a unique column for deterministic output under ties. */
  def apply(left: DataFrame, right: DataFrame,
            leftKeyCol: String, rightKeyCol: String,
            leftTimeCol: String, rightTimeCol: String,
            rightTieBreakCol: Option[String] = None): DataFrame = {
    val spark = left.sparkSession
    val l = left.filter(col(leftKeyCol).isNotNull && col(leftTimeCol).isNotNull)
    val r = right.filter(col(rightKeyCol).isNotNull && col(rightTimeCol).isNotNull)
    val lp = l.queryExecution.analyzed
    val rp0 = r.queryExecution.analyzed
    // self-join safety: re-alias the right side when expr ids collide
    val rp: LogicalPlan =
      if (lp.outputSet.intersect(rp0.outputSet).nonEmpty)
        Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
      else rp0
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    val (lk, rk) = (attr(lp, leftKeyCol), attr(rp, rightKeyCol))
    val (lt, rt) = (attr(lp, leftTimeCol), attr(rp, rightTimeCol))
    // AsOfJoinExec builds key/time orderings from the LEFT side's types and
    // applies them to right-side UnsafeRows — an int-vs-long mismatch would
    // silently misread bytes (wrong matches), so reject it at plan time.
    require(lk.dataType == rk.dataType,
      s"as-of join key types differ: $leftKeyCol ${lk.dataType} vs $rightKeyCol ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"as-of join time types differ: $leftTimeCol ${lt.dataType} vs $rightTimeCol ${rt.dataType}")
    Bridge.ofRows(spark, AsOfJoinPlan(lp, rp, lk, rk, lt, rt,
      rightTieBreakCol.map(attr(rp, _))))
  }

  def column(c: Column): Expression = Bridge.expression(c)
}
