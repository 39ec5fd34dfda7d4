package graft

import org.apache.spark.sql.functions._

import graft.operators.AnnSuite
import graft.sources.Tables

/** nearest_centroid must be bit-equal to the composed
  * DistsExpr + aggregate-argmin assignment it replaces in
  * kmeansAssign — the whole ANN/k-means family's correctness rides on
  * the assignment (and its oracle chains), so the native form is
  * pinned against the composed one on the fixture corpus and on the
  * edge cases the composed semantics define: strict-'<' ties keep the
  * lowest cid, a centroid whose vector nulls the distance fold
  * (length mismatch / null element) is skipped, an all-skipped row
  * yields (Infinity, -1), and a null embedding yields null.
  */
class NearestCentroidSpec extends SparkSpecBase {

  test("native assignment equals the composed form on the fixture corpus") {
    // CODEGEN_ONLY: a doGenCode bug would otherwise fall back to the
    // interpreted eval silently and this equality would pass vacuously
    withConfs("spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      val cents = AnnSuite.kmeansSeeds(e, 7)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("vec_id", "cid", "dist").collect().map(_.toString).sorted.toSeq
      assert(rows(AnnSuite.kmeansAssign(e, cents)) ===
        rows(AnnSuite.kmeansAssignComposed(e, cents)))
    }
  }

  test("tie-break, skip, and null semantics match the composed form") {
    val s = spark
    import s.implicits._
    org.apache.spark.sql.graft.Bridge.register(s)
    // two equidistant centroids (tie -> lowest cid), one length-
    // mismatched centroid (skipped), plus a null embedding row
    val points = Seq(
      (1L, Some(Seq(0.0f, 0.0f))),
      (2L, Some(Seq(1.0f, 1.0f))),
      (3L, None: Option[Seq[Float]])
    ).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cents = Seq(
      (10L, Seq(1.0f, 0.0f)),
      (11L, Seq(0.0f, 1.0f)),         // same distance from both points as 10
      (12L, Seq(0.5f))                 // wrong arity -> skipped
    ).toDF("cid", "ce").withColumn("ce", col("ce").cast("array<float>"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cid", "dist").collect().map(_.toString).sorted.toSeq
    val native = rows(AnnSuite.kmeansAssign(points, cents))
    val composed = rows(AnnSuite.kmeansAssignComposed(points, cents))
    assert(native === composed)
    // the tie really kept the lowest cid, and the null embedding got
    // the composed form's surviving (Infinity, -1) init — not null
    val byId = AnnSuite.kmeansAssign(points, cents).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) -999L else r.getLong(2))).toMap
    assert(byId(1L) == 10L && byId(2L) == 10L && byId(3L) == -1L)
  }

  test("all centroids skipped yields the composed (Infinity, -1) sentinel") {
    val s = spark
    import s.implicits._
    org.apache.spark.sql.graft.Bridge.register(s)
    val points = Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cents = Seq((10L, Seq(0.5f))).toDF("cid", "ce")
      .withColumn("ce", col("ce").cast("array<float>"))
    def one(df: org.apache.spark.sql.DataFrame) = {
      val r = df.select("cid", "dist").collect().head
      (r.getLong(0), r.getDouble(1))
    }
    assert(one(AnnSuite.kmeansAssign(points, cents)) ===
      one(AnnSuite.kmeansAssignComposed(points, cents)))
    assert(one(AnnSuite.kmeansAssign(points, cents)) ===
      ((-1L, Double.PositiveInfinity)))
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val emb = new GenericArrayData(Array[Any](1.0f, 2.0f))
    val cents = new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](5L, new GenericArrayData(Array[Any](0.0f, 0.0f)))),
      new GenericInternalRow(Array[Any](6L, new GenericArrayData(Array[Any](1.0f, 2.0f))))))
    val out = org.apache.spark.sql.graft.NearestCentroid.assign(emb, cents, 0, 1)
    assert(out.getDouble(0) == 0.0 && out.getLong(1) == 6L)
  }
}
