package graft.model

/** Pure-Scala Keccak-256 (pre-NIST padding 0x01, as used by Ethereum).
  *
  * Needed to derive an event's `topic0` — the keccak-256 of its canonical
  * signature string — mirroring the reference's use of
  * `ethabi::Event::signature()` (reference: eth_event_stream/src/stream.rs:113,
  * eth_event_macro/examples/erc20_transfer.rs:13). Implemented from the public
  * Keccak specification (FIPS 202 permutation, original Keccak padding).
  */
object Keccak256 {
  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // rotation offsets r[x][y]
  private val R: Array[Array[Int]] = Array(
    Array(0, 36, 3, 41, 18),
    Array(1, 44, 10, 45, 2),
    Array(62, 6, 43, 15, 61),
    Array(28, 55, 25, 21, 56),
    Array(27, 20, 39, 8, 14))

  private def keccakF(a: Array[Long]): Unit = {
    val b = new Array[Long](25)
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d(x); y += 1 }
        x += 1
      }
      // rho + pi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) =
            java.lang.Long.rotateLeft(a(x + 5 * y), R(x)(y))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // iota
      a(0) ^= RC(round)
      round += 1
    }
  }

  /** keccak-256 digest of `msg` (32 bytes). */
  def hash(msg: Array[Byte]): Array[Byte] = {
    val rate = 136 // 1088 bits for keccak-256
    val state = new Array[Long](25)
    // pad10*1 with Keccak domain byte 0x01
    val padLen = rate - (msg.length % rate)
    val padded = java.util.Arrays.copyOf(msg, msg.length + padLen)
    padded(msg.length) = 0x01.toByte
    padded(padded.length - 1) = (padded(padded.length - 1) | 0x80).toByte
    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < rate / 8) {
        var lane = 0L
        var j = 7
        while (j >= 0) {
          lane = (lane << 8) | (padded(off + i * 8 + j) & 0xffL)
          j -= 1
        }
        state(i) ^= lane
        i += 1
      }
      keccakF(state)
      off += rate
    }
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 8) {
        out(i * 8 + j) = ((state(i) >>> (8 * j)) & 0xff).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  def hash(msg: String): Array[Byte] = hash(msg.getBytes("UTF-8"))

  def hex(msg: String): String = Hex.encode(hash(msg))
}
