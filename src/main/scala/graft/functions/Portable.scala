package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Column helpers whose results are bit-identical between Spark and the
  * DuckDB oracle, independent of partitioning / reduction order.
  *
  * Everything here compiles to built-in Catalyst expressions (whole-stage
  * codegen'd); no UDFs.
  */
object Portable {

  /** Order-insensitive, engine-portable double sum at fixed-point scale 4.
    *
    * Per-row: `floor(x*10000 + 0.5)` — every op is a single IEEE-754
    * double op, so the per-row integer is bit-identical in any engine
    * (unlike a double→DECIMAL cast, whose rounding path differs between
    * Spark's exact-BigDecimal HALF_UP and DuckDB's fp-multiply round).
    * Accumulation: exact DECIMAL(38,0) sum of those integers — immune to
    * partial-aggregation order and to overflow at 100 TB row counts.
    * DuckDB analog: `CAST(SUM(CAST(FLOOR(x*10000+0.5) AS BIGINT)) AS
    * DOUBLE)/10000.0`.
    */
  def dsum(c: Column): Column =
    sum(floor(c * lit(10000.0)  + lit(0.5)).cast(DecimalType(38, 0)))
      .cast(DoubleType) / lit(10000.0)

  /** Deterministic average: portable fixed-point sum divided (in double)
    * by the count. DuckDB:
    * `CAST(SUM(CAST(FLOOR(x*10000+0.5) AS BIGINT)) AS DOUBLE)/10000.0/COUNT(*)`.
    */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** 60-bit per-row hash usable as a commutative checksum term.
    * Spark: `conv(substr(md5(s),1,15),16,10)::long`;
    * DuckDB: `('0x' || substr(md5(s),1,15))::BIGINT`.
    * 15 hex digits < 2^60 so the BIGINT is always positive and both
    * engines parse it identically.
    */
  def rowHash60(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast(LongType)

  /** Canonical row-string for checksums: '|'-joined values. Only use
    * integer / string columns (float and timestamp rendering is not
    * engine-portable). DuckDB analog: `concat_ws('|', ...)`.
    */
  def rowStr(cols: Column*): Column = concat_ws("|", cols.map(_.cast("string")): _*)

  /** 2^60 — checksum modulus keeping exposed checksums inside BIGINT. */
  val ChecksumMod = 1152921504606846976L

  /** Order-insensitive table/bucket checksum: exact sum of per-row 60-bit
    * hashes, accumulated in DECIMAL(38,0) so it cannot overflow at 100 TB
    * row counts, then reduced mod 2^60 so the exposed value fits BIGINT
    * (>64-bit decimals serialize differently across engines; collision
    * strength is unchanged — the checksum was 60-bit to begin with).
    * DuckDB: `CAST(SUM(h) % 1152921504606846976 AS BIGINT)` (DuckDB sums
    * BIGINT into HUGEINT, so the modulo also brings the type back down).
    */
  def checksumAgg(rowStrCol: Column): Column =
    pmod(sum(rowHash60(rowStrCol).cast(DecimalType(38, 0))), lit(ChecksumMod))
      .cast(LongType)
}
