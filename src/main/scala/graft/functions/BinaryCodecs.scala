package graft.functions

/** Pure byte-level codecs used by the protocol decode layer and exposed to
  * SQL via the Catalyst expressions in [[CodecExpressions]].
  *
  * Semantics follow the reference behavior documented in SURVEY.md §2.8:
  *   - F1 TBCD decode: nibble-swap per byte, 0xF filler terminates
  *     (`gtp_ingestor.py:268-281`).
  *   - F2/F3 BCD IMSI/MSISDN decode: hexlify + per-byte nibble swap, strip
  *     trailing filler (`gsm_map.py:312-347`).
  *   - F5 24-bit masked ints (`diameter.py:123-144`).
  * All methods are static and allocation-light so the generated code from
  * `doGenCode` stays JIT-friendly.
  */
object BinaryCodecs {

  private final val HexDigits = "0123456789abcdef".toCharArray

  /** F1: TBCD (telephony BCD) decode. Low nibble first, then high nibble;
    * a 0xF nibble is filler and terminates the digit string. Non-decimal
    * nibbles (TON/NPI artifacts) render as hex chars. */
  def tbcdDecode(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val lo = b & 0xf
      val hi = (b >> 4) & 0xf
      if (lo == 0xf) return sb.toString
      sb.append(HexDigits(lo))
      if (hi == 0xf) return sb.toString
      sb.append(HexDigits(hi))
      i += 1
    }
    sb.toString
  }

  /** F2/F3: plain BCD nibble-swap decode keeping all nibbles, with any
    * trailing 'f' filler characters stripped (the reference hexlifies,
    * swaps pairs, then `replace("f", "")` on the tail). */
  def bcdSwapDecode(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sb.append(HexDigits(b & 0xf))
      sb.append(HexDigits((b >> 4) & 0xf))
      i += 1
    }
    var end = sb.length
    while (end > 0 && sb.charAt(end - 1) == 'f') end -= 1
    sb.substring(0, end)
  }

  /** F4: lowercase hex render of a byte array. */
  def hexString(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sb.append(HexDigits(b >> 4))
      sb.append(HexDigits(b & 0xf))
      i += 1
    }
    sb.toString
  }

  /** Big-endian unsigned int of up to 8 bytes from `off` (length `len`). */
  def beLong(bytes: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) {
      v = (v << 8) | (bytes(off + i) & 0xffL)
      i += 1
    }
    v
  }

  def beInt(bytes: Array[Byte], off: Int, len: Int): Int = beLong(bytes, off, len).toInt

  /** Little-endian unsigned int of up to 8 bytes. */
  def leLong(bytes: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = len - 1
    while (i >= 0) {
      v = (v << 8) | (bytes(off + i) & 0xffL)
      i -= 1
    }
    v
  }

  /** F5: 24-bit mask (Diameter length / command-code fields). */
  def mask24(v: Long): Long = v & 0xffffffL

  /** Dotted-quad string from 4 bytes at `off`. */
  def ipv4String(bytes: Array[Byte], off: Int): String =
    s"${bytes(off) & 0xff}.${bytes(off + 1) & 0xff}.${bytes(off + 2) & 0xff}.${bytes(off + 3) & 0xff}"
}
