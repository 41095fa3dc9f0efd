package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys — the data-layout half of scan pruning at
  * scale: writing a table sorted/range-partitioned by the interleaved
  * key clusters rows that are close in BOTH dimensions into the same
  * files, so parquet min/max stats prune 2-D range predicates that a
  * single-column sort can only prune in one dimension.
  *
  * Pure `Column` bit arithmetic (the classic shift-mask expansion), so
  * the key computation stays inside whole-stage codegen — no UDF, no
  * custom expression; the oracle runs the SAME cascade in SQL generated
  * from the same constants.
  */
object ZOrder {

  private val Masks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spreads the low 32 bits of `x` to the even bit positions. */
  def part1by1(x: Column): Column =
    Masks.foldLeft(x.bitwiseAND(lit(0xFFFFFFFFL))) { case (v, (s, m)) =>
      v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
    }

  /** The same expansion as DuckDB SQL over expression `x`. */
  def part1by1Sql(x: String): String =
    Masks.foldLeft(s"($x & ${0xFFFFFFFFL})") { case (v, (s, m)) =>
      s"(($v | ($v << $s)) & $m)"
    }

  /** Interleaves two non-negative values (< 2³¹ each so the key stays
    * non-negative and signed ordering == unsigned ordering): bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1. */
  def interleave2(a: Column, b: Column): Column =
    part1by1(a).bitwiseOR(shiftleft(part1by1(b), 1))

  /** The same interleave as DuckDB SQL over expressions `a`, `b`. */
  def interleave2Sql(a: String, b: String): String =
    s"(${part1by1Sql(a)} | (${part1by1Sql(b)} << 1))"
}
