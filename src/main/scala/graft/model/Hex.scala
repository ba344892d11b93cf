package graft.model

/** Hex/address helpers — parity with the reference's `address()` util
  * (reference: eth_event_stream/src/lib.rs:7-15 — strip optional "0x",
  * hex-decode to a 20-byte address).
  */
object Hex {
  private val digits = "0123456789abcdef".toCharArray

  def encode(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sb.append(digits(b >>> 4)).append(digits(b & 0xf))
      i += 1
    }
    sb.toString
  }

  def decode(s: String): Array[Byte] = {
    val clean = strip0x(s)
    require(clean.length % 2 == 0, s"odd-length hex string: $s")
    val out = new Array[Byte](clean.length / 2)
    var i = 0
    while (i < out.length) {
      // per-digit, not Integer.parseInt: parseInt accepts '+'/'-' signs,
      // so a typo'd "-1" pair would silently decode instead of failing
      val hi = Character.digit(clean.charAt(2 * i), 16)
      val lo = Character.digit(clean.charAt(2 * i + 1), 16)
      require(hi >= 0 && lo >= 0, s"invalid hex string: $s")
      out(i) = ((hi << 4) | lo).toByte
      i += 1
    }
    out
  }

  def strip0x(s: String): String =
    if (s.startsWith("0x") || s.startsWith("0X")) s.substring(2) else s

  /** Parse a 20-byte Ethereum address from hex ("0x"-prefix optional). */
  def address(s: String): Array[Byte] = {
    val b = decode(s)
    require(b.length == 20, s"address must be 20 bytes, got ${b.length}")
    b
  }

  def toHex0x(bytes: Array[Byte]): String = "0x" + encode(bytes)
}
