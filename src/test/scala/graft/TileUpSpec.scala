package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{Scratch, Tables}
import graft.tools.TileUp

/** Invariants of the sf1 tile-up generator (graft.tools.TileUp) at a
  * small factor over sf0.001 — the scale curve's top point is only
  * meaningful if the tiled lake preserves the source's relational and
  * content structure: valid FKs (joins don't silently shrink), linear
  * cardinality scaling (result sizes scale with data), and no
  * cross-replica near-dup collisions (candidate volumes stay linear
  * instead of squaring with the tile factor).
  */
class TileUpSpec extends SparkSpecBase {

  private val Factor = 3
  private lazy val dst: String = {
    val d = Scratch.dir("tileup_spec")
    TileUp.generate(spark, sf, d, Factor)
    d
  }
  private def t(name: String): DataFrame = Tables.table(spark, dst, name)

  test("fact tables scale by the factor; dims stay global") {
    assert(t("lineitem").count() === Tables.lineitem(spark, sf).count() * Factor)
    assert(t("orders").count() === Tables.orders(spark, sf).count() * Factor)
    assert(t("customer").count() === Tables.customer(spark, sf).count() * Factor)
    assert(t("events").count() === Tables.events(spark, sf).count() * Factor)
    assert(t("documents").count() === Tables.documents(spark, sf).count() * Factor)
    assert(t("nation").count() === Tables.nation(spark, sf).count())
    assert(t("region").count() === Tables.region(spark, sf).count())
  }

  test("foreign keys stay closed under tiling") {
    def dangling(fact: DataFrame, fk: String, dim: DataFrame, pk: String): Long =
      fact.select(col(fk).as("k")).distinct()
        .join(dim.select(col(pk).as("k")), Seq("k"), "left_anti").count()
    assert(dangling(t("orders"), "o_custkey", t("customer"), "c_custkey") === 0)
    assert(dangling(t("lineitem"), "l_orderkey", t("orders"), "o_orderkey") === 0)
    assert(dangling(t("lineitem"), "l_partkey", t("part"), "p_partkey") === 0)
    assert(dangling(t("lineitem"), "l_suppkey", t("supplier"), "s_suppkey") === 0)
    assert(dangling(t("customer"), "c_nationkey", t("nation"), "n_nationkey") === 0)
  }

  test("primary keys stay unique under tiling") {
    def dups(df: DataFrame, pk: String): Long =
      df.groupBy(pk).count().filter(col("count") > 1).count()
    assert(dups(t("orders"), "o_orderkey") === 0)
    assert(dups(t("customer"), "c_custkey") === 0)
    assert(dups(t("events"), "event_id") === 0)
    assert(dups(t("documents"), "doc_id") === 0)
    assert(dups(t("embeddings"), "vec_id") === 0)
  }

  test("replica text images are disjoint: distinct texts scale by the factor") {
    // the letter rotation is a bijection per replica, so each replica
    // keeps the source's distinct count and no two replicas collide —
    // cross-replica exact/near dups would square dedup candidate volume
    val srcDistinct = Tables.documents(spark, sf).select("text").distinct().count()
    assert(t("documents").select("text").distinct().count() === srcDistinct * Factor)
  }

  test("embedding perturbation flips signs only: norms preserved, replicas differ") {
    val src = Tables.embeddings(spark, sf)
    // same stride rule as the generator: doc_id and vec_id share
    // max(max doc_id, max vec_id) + 1, so decompose with THAT — the
    // domains differ in general (sf0.1: doc 4999 vs vec 1999)
    val stride = math.max(
      Tables.documents(spark, sf).agg(max("doc_id")).head.getLong(0),
      src.agg(max("vec_id")).head.getLong(0)) + 1
    val pair = t("embeddings")
      .withColumn("base", col("vec_id") % stride)
      .withColumn("replica", (col("vec_id") / stride).cast("int"))
      .groupBy("base").agg(
        collect_list(struct(col("replica"), col("embedding"))).as("copies"))
      .limit(16).collect()
    pair.foreach { row =>
      val copies = row.getSeq[org.apache.spark.sql.Row](1)
        .map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
      val base = copies(0)
      (1 until Factor).foreach { i =>
        val rep = copies(i)
        assert(rep.map(math.abs).toSeq === base.map(math.abs).toSeq,
          "sign flips must preserve magnitudes")
        assert(rep.toSeq !== base.toSeq, "replica must differ from base")
      }
    }
  }

  test("events time domain extends per replica") {
    val srcMax = Tables.events(spark, sf).agg(max("ts")).head.getTimestamp(0)
    val tiledMax = t("events").agg(max("ts")).head.getTimestamp(0)
    val shiftMs = 397L * 24 * 3600 * 1000 * (Factor - 1)
    assert(tiledMax.getTime === srcMax.getTime + shiftMs)
  }

  test("generation is content-deterministic and the marker gates reuse") {
    val d2 = Scratch.dir("tileup_spec2")
    TileUp.generate(spark, sf, d2, Factor)
    def fingerprint(dir: String, name: String, keyCols: Seq[String]): java.math.BigDecimal =
      Tables.table(spark, dir, name)
        .select(graft.functions.Portable.rowHash60(
          graft.functions.Portable.rowStr(keyCols.map(col): _*)).as("h"))
        .agg(sum(col("h").cast("decimal(38,0)"))).head.getDecimal(0)
    Seq("documents" -> Seq("doc_id", "text"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"))
      .foreach { case (name, keys) =>
        assert(fingerprint(dst, name, keys) === fingerprint(d2, name, keys))
      }
    // ensure() on an already-generated dir trusts the marker (no rewrite)
    val before = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(d2, "documents.parquet"))
    assert(TileUp.ensure(spark, sf, d2, Factor).isEmpty)
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(d2, "documents.parquet")) === before)
  }

  test("directory-parquet source: a mutated part-file set forces a re-tile") {
    // second-level tile: the first tile's tables are DIRECTORY parquet,
    // so this exercises the per-part-file descriptor (the directory's
    // own length/mtime never reflect content)
    val d3 = Scratch.dir("tileup_spec3")
    assert(TileUp.ensure(spark, dst, d3, 1).isEmpty)
    val marker = java.nio.file.Paths.get(d3, "_TILEUP_OK")
    val markerBytes = java.nio.file.Files.readAllBytes(marker).toSeq
    // unchanged source → marker trusted, byte-identical
    assert(TileUp.ensure(spark, dst, d3, 1).isEmpty)
    assert(java.nio.file.Files.readAllBytes(marker).toSeq === markerBytes)
    // mutate the source directory's file set (an underscore-prefixed
    // name so Spark's scan ignores it and regeneration still succeeds)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dst, "documents.parquet", "_mutation"),
      "x".getBytes("UTF-8"))
    try {
      assert(TileUp.ensure(spark, dst, d3, 1).isEmpty)
      assert(java.nio.file.Files.readAllBytes(marker).toSeq !== markerBytes,
        "descriptor must change when a source part file set changes")
    } finally java.nio.file.Files.delete(
      java.nio.file.Paths.get(dst, "documents.parquet", "_mutation"))
  }

  test("missing source table fails fast instead of fingerprinting 0/0") {
    val bogus = Scratch.dir("tileup_spec_missing")
    val err = TileUp.ensure(spark, bogus, Scratch.dir("tileup_spec_missing_dst"), 2)
    assert(err.isDefined && err.get.contains("source missing"))
  }

  test("textPerms at sf10's factor: permutations and sub-class restrictions distinct") {
    // pure-function check that the fixed hash yields 100 pairwise
    // distinct bijections INCLUDING their letters-only and digits-only
    // restrictions (textPerms REQUIREs this internally — this pins the
    // property at the factor the sf10 tile actually uses, plus iden-
    // tity at replica 0 and bijectivity of every permutation)
    val perms = TileUp.textPerms(100)
    assert(perms.length === 100)
    assert(perms.head === TileUp.TextAlpha)
    perms.foreach(p => assert(p.sorted === TileUp.TextAlpha.sorted, s"not a bijection: $p"))
    assert(perms.distinct.length === 100)
  }

  test("factor past the alpha-rotation width keeps replica images disjoint") {
    // factor 25 crosses the 21-wide alpha wrap (replicas 4 and 25 would
    // collide under a single rotation) and exceeds the 10-dim-class
    // embedding scheme this generator used before hash-signed flips —
    // the invariants sf10's factor=100 tile rests on, at spec cost
    val BigF = 25
    val d = Scratch.dir("tileup_spec_bigf")
    TileUp.generate(spark, sf, d, BigF)
    val srcDistinctTexts = Tables.documents(spark, sf).select("text").distinct().count()
    assert(Tables.table(spark, d, "documents").select("text").distinct().count()
      === srcDistinctTexts * BigF)
    // every replica's flip pattern is distinct, so |distinct embeddings|
    // scales by the factor too (magnitudes equal, signs differ)
    val srcDistinctEmb = Tables.embeddings(spark, sf).select("embedding").distinct().count()
    assert(Tables.table(spark, d, "embeddings").select("embedding").distinct().count()
      === srcDistinctEmb * BigF)
  }
}
