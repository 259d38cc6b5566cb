package graft.plans

/** Shared md5→lowercase-hex helper for the fingerprinting kernels
  * ([[WinnowSelect]], [[CdcChunks]]): one ThreadLocal digest per thread
  * (MessageDigest is stateful and not thread-safe), one hex table — so
  * a parity-relevant change (digest, casing) can never drift between
  * kernels.
  */
private[plans] object Md5Hex {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** The thread's digest, reset and ready. */
  def digest(): java.security.MessageDigest = {
    val d = md5.get()
    d.reset()
    d
  }

  /** Lowercase hex chars of a 16-byte digest. */
  def hexChars(d: Array[Byte]): Array[Char] = {
    val out = new Array[Char](32)
    var j = 0
    while (j < 16) {
      out(2 * j) = HexDigits((d(j) >> 4) & 0xf)
      out(2 * j + 1) = HexDigits(d(j) & 0xf)
      j += 1
    }
    out
  }

  def hex(d: Array[Byte]): String = new String(hexChars(d))
}
