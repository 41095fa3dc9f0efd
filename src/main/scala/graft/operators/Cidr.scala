package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P14: IP-subnet exclusion filter (`sigshark.py:447-456`) as pure
  * bit-arithmetic on the packed address — no UDF, codegen-friendly, and
  * pushable by Catalyst through the plan.
  */
object Cidr {

  /** Dotted-quad string column → packed u32 (as long). */
  def ipToLong(ip: Column): Column = {
    val o = (i: Int) => split(ip, "\\.").getItem(i).cast("long")
    shiftleft(o(0), 24) + shiftleft(o(1), 16) + shiftleft(o(2), 8) + o(3)
  }

  private def parseCidr(cidr: String): (Long, Long) = {
    val Array(net, bitsStr) = cidr.split("/")
    val bits = bitsStr.toInt
    val packed = net.split("\\.").map(_.toLong).reduce((a, b) => (a << 8) | b)
    val mask = if (bits == 0) 0L else (0xffffffffL << (32 - bits)) & 0xffffffffL
    (packed & mask, mask)
  }

  /** True when `ip` falls in any of the CIDR blocks. */
  def inAnySubnet(ip: Column, cidrs: Seq[String]): Column =
    cidrs.map { c =>
      val (net, mask) = parseCidr(c)
      ipToLong(ip).bitwiseAND(lit(mask)) === lit(net)
    }.reduceOption(_ || _).getOrElse(lit(false))

  /** The reference semantic: drop packets whose src OR dst is in the
    * exclusion list. */
  def excludeFilter(srcIp: Column, dstIp: Column, cidrs: Seq[String]): Column =
    !(inAnySubnet(srcIp, cidrs) || inAnySubnet(dstIp, cidrs))

  /** Scala-side twin of [[inAnySubnet]] for the typed pipelines (same
    * parse, same mask arithmetic). Malformed addresses never match. */
  def inAnySubnetValue(ip: String, cidrs: Seq[String]): Boolean = {
    val parts = ip.split("\\.")
    if (parts.length != 4) return false
    val packedOpt =
      try Some(parts.map(_.toLong).reduce((a, b) => (a << 8) | b))
      catch { case _: NumberFormatException => None }
    packedOpt.exists { packed =>
      cidrs.exists { c =>
        val (net, mask) = parseCidr(c)
        (packed & mask) == net
      }
    }
  }
}
