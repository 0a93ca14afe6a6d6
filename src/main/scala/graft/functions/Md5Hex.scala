package graft.functions

/** Shared md5-to-lowercase-hex machinery for the native hash
  * expressions (one digest per executor thread; getInstance per row
  * costs more than the hash itself on short inputs).
  */
private[functions] object Md5Hex {

  private val HexChars = "0123456789abcdef".toCharArray

  private val LocalMd5 = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      override def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  /** md5 of `bytes` written into `hex` (32 lowercase hex chars). */
  def digestInto(bytes: Array[Byte], hex: Array[Char]): Unit = {
    val md = LocalMd5.get()
    md.reset()
    val digest = md.digest(bytes)
    var b = 0
    while (b < 16) {
      hex(2 * b) = HexChars((digest(b) >> 4) & 0xf)
      hex(2 * b + 1) = HexChars(digest(b) & 0xf)
      b += 1
    }
  }

  /** SQL-`trim` semantics: strip only SPACE (U+0020) from both ends —
    * Java's String.trim also strips tabs/newlines and silently diverges
    * from Spark's `trim`/the DuckDB oracle.
    */
  def sqlTrim(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }
}
