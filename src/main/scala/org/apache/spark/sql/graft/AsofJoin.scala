package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator custom plan: AS-OF LEFT JOIN — each left row matched to
  * the right row with the greatest `rightTime <= leftTime` for the same
  * key. The one relational operator the reference's analytics surface
  * uses (DuckDB ships it natively as `ASOF JOIN`) that Spark's built-in
  * operator set cannot express without a union + window detour.
  *
  * Done the way the guide's preference order (c) prescribes: a logical
  * node, a `SparkStrategy`, and a physical `SparkPlan` whose distribution
  * and ordering REQUIREMENTS let Catalyst place the exchanges and sorts —
  * the operator itself is a streaming per-partition merge with O(1)
  * state (one retained right row), never a pair explosion:
  * both sides hash-cluster on the key and sort by (key, time); per
  * partition a single forward pass advances the right iterator and
  * retains only the latest matching row. 100 TB shape: identical to a
  * sort-merge join's shuffle cost, with no range-join blowup.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsofJoin logical → AsofJoinExec physical. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge. Requirements make Catalyst co-cluster both
  * children on the key and sort them by (key, time); execution is then a
  * zip of co-located partitions with a buffered one-pass merge.
  */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.length

    // Bind against `output` (right side forced nullable), NOT the raw
    // child attributes: an unmatched left row carries a null-padded right
    // side, and a projection bound to a non-nullable child attr would
    // read garbage (0.0/"") from those slots instead of null.
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Parents (exchanges, sorts, writes) require UnsafeRow: project the
      // merged JoinedRow through an UnsafeProjection per partition. This
      // also ends the shared-JoinedRow mutation hazard — each next() call
      // serializes into the projection's buffer before the row escapes.
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      val merged = new Iterator[InternalRow] {
        private val rBuf = rIter.buffered
        private val joined = new JoinedRow
        private val nullRight = new GenericInternalRow(rightWidth)
        // O(1) retained state: the latest right row at-or-before the
        // current left time, and its key
        private var matchRow: InternalRow = null
        private var matchKey: Any = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lk.eval(l)
          val t = lt.eval(l)
          if (k == null || t == null) return joined(l, nullRight)
          // consume right rows that can no longer match a later left row:
          // earlier keys, and same-key rows at-or-before this left time
          // (<= : an equal-time right row IS visible to this left row)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rkv = rk.eval(rBuf.head)
            val rtv = rt.eval(rBuf.head)
            if (rkv == null || rtv == null) rBuf.next()
            else {
              val c = keyOrd.asInstanceOf[Ordering[Any]].compare(rkv, k)
              if (c < 0 || (c == 0 &&
                  timeOrd.asInstanceOf[Ordering[Any]].compare(rtv, t) <= 0)) {
                val r = rBuf.next()
                if (c == 0) { matchRow = r.copy(); matchKey = rkv }
              } else advancing = false
            }
          }
          if (matchRow != null &&
              keyOrd.asInstanceOf[Ordering[Any]].compare(matchKey, k) == 0)
            joined(l, matchRow)
          else joined(l, nullRight)
        }
      }
      merged.map(toUnsafe)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing constructor: build the logical node on two DataFrames and
  * register the strategy on the session (idempotent). Column names must
  * be unambiguous across the two sides (rename before joining).
  */
object GraftAsof {
  def asofJoin(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val session = leftDf.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!session.experimental.extraStrategies.contains(AsofJoinStrategy))
      session.experimental.extraStrategies =
        session.experimental.extraStrategies :+ AsofJoinStrategy
    val lp = leftDf.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .queryExecution.analyzed
    val rp = rightDf.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asofJoin: no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    val (lkA, rkA) = (attr(lp, leftKey), attr(rp, rightKey))
    val (ltA, rtA) = (attr(lp, leftTime), attr(rp, rightTime))
    // Mismatched key types would hash equal values to different partitions
    // (silent non-matches) or blow up the interpreted ordering at runtime;
    // mismatched time types break the merge comparison the same way.
    require(lkA.dataType == rkA.dataType,
      s"asofJoin: key type mismatch — '$leftKey' is ${lkA.dataType.sql}, " +
        s"'$rightKey' is ${rkA.dataType.sql}; cast one side first")
    require(ltA.dataType == rtA.dataType,
      s"asofJoin: time type mismatch — '$leftTime' is ${ltA.dataType.sql}, " +
        s"'$rightTime' is ${rtA.dataType.sql}; cast one side first")
    org.apache.spark.sql.classic.Dataset.ofRows(session,
      AsofJoin(lp, rp, lkA, rkA, ltA, rtA))
  }
}
