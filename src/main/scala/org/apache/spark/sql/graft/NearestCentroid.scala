package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native fused nearest-centroid assignment: argmin of squared
  * euclidean distance over a (cid-ascending) broadcast centroid array,
  * returning `struct(dist, cid)` — bit-equal to the composed
  * DistsExpr + aggregate-argmin pipeline in AnnSuite.kmeansAssign
  * (per-centroid distance folds dims sequentially in double from the
  * float casts; strict `<` keeps the first = lowest cid on ties;
  * `(Infinity, -1)` when every centroid is skipped; a centroid whose
  * vector nulls the fold — length mismatch or a null element, the
  * zip_with-pads-null semantics — is skipped exactly like the
  * composed IF over a null dist).
  *
  * Why native: this is the ANN/k-means family's corpus-scale hot path —
  * every build/append/clustering pass evaluates it once per corpus row
  * × k centroids × dims, and the composed higher-order form runs
  * interpreted boxed lambdas with an intermediate dists array per row
  * (the sf10 bench showed the IVF serving entries topping the headline
  * tail on exactly this). One fused loop, no allocation until the
  * 2-field result row, inside whole-stage codegen.
  */
case class NearestCentroid(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false)))
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = left.dataType match {
      case ArrayType(FloatType, _) => right.dataType match {
        case ArrayType(st: StructType, _) =>
          st.getFieldIndex("cid").exists(i => st(i).dataType == LongType) &&
            st.getFieldIndex("ce").exists(i =>
              st(i).dataType match {
                case ArrayType(FloatType, _) => true
                case _ => false
              })
        case _ => false
      }
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_centroid expects (array<float>, array<struct<cid:bigint, ce:array<float>>>)" +
        s", got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  @transient private lazy val (cidIdx, ceIdx) = {
    val st = right.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    (st.fieldIndex("cid"), st.fieldIndex("ce"))
  }

  // Null algebra mirrors the composed form asymmetrically: a null
  // CENTROID ARRAY nulls the whole fold (aggregate over a null array),
  // but a null EMBEDDING only nulls each per-centroid distance — the
  // argmin then keeps its (Infinity, -1) init. So: right-null → null,
  // left-null → sentinel.
  override def nullable: Boolean = right.nullable

  override def eval(input: InternalRow): Any = {
    val cents = right.eval(input)
    if (cents == null) return null
    val emb = left.eval(input)
    if (emb == null) NearestCentroid.sentinel()
    else NearestCentroid.assign(
      emb.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData], cidIdx, ceIdx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val rowCls = classOf[InternalRow].getName
    ev.copy(code =
      code"""
        ${rightGen.code}
        boolean ${ev.isNull} = ${rightGen.isNull};
        $rowCls ${ev.value} = null;
        if (!${ev.isNull}) {
          ${leftGen.code}
          ${ev.value} = ${leftGen.isNull}
            ? org.apache.spark.sql.graft.NearestCentroid.sentinel()
            : org.apache.spark.sql.graft.NearestCentroid.assign(
                ${leftGen.value}, ${rightGen.value}, $cidIdx, $ceIdx);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  /** The all-skipped / null-embedding result, matching the composed
    * argmin's surviving init value. Fresh row per call — consumers may
    * hold references.
    */
  def sentinel(): InternalRow =
    new GenericInternalRow(Array[Any](Double.PositiveInfinity, -1L))

  /** The fused argmin loop — shared by eval and codegen. */
  def assign(emb: ArrayData, cents: ArrayData, cidIdx: Int, ceIdx: Int): InternalRow = {
    val dims = emb.numElements()
    var bestDist = Double.PositiveInfinity
    var bestCid = -1L
    val k = cents.numElements()
    var c = 0
    while (c < k) {
      if (!cents.isNullAt(c)) {
        val cent = cents.getStruct(c, 2)
        val ce = cent.getArray(ceIdx)
        // length mismatch or a null element nulls the composed fold —
        // skip this centroid, matching the IF-over-null-dist semantics
        if (ce.numElements() == dims) {
          var dist = 0.0
          var valid = true
          var i = 0
          while (valid && i < dims) {
            if (emb.isNullAt(i) || ce.isNullAt(i)) valid = false
            else {
              val d = emb.getFloat(i).toDouble - ce.getFloat(i).toDouble
              dist += d * d
            }
            i += 1
          }
          if (valid && dist < bestDist) {
            bestDist = dist
            bestCid = cent.getLong(cidIdx)
          }
        }
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestDist, bestCid))
  }
}
