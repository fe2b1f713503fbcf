package graft.plans

/** The shared DISTINCT-token walk behind the native signature
  * expressions ([[Simhash16]], [[Simhash60]]): one codepoint pass packs
  * the `[a-z0-9]`-class tokens (per-codepoint `Character.toLowerCase` —
  * the TextStats/MinhashSigs 1:1-mapping stance) into a thread-local
  * byte buffer, and an open-addressing set over the packed bytes
  * (FNV-1a probe, byte-compare verify, rebuild at 50% load) admits only
  * FIRST occurrences to the callback. Distinctness matters to every
  * majority-vote signature — duplicate tokens would bias the votes —
  * and living here means the two signature families cannot drift.
  */
object TokenWalk {

  final class Scratch {
    val md: java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
    var buf: Array[Byte] = new Array[Byte](1 << 12)
    var tokOff: Array[Int] = new Array[Int](1 << 8)
    var tokLen: Array[Int] = new Array[Int](1 << 8)
    var table: Array[Int] = new Array[Int](1 << 9)
    val dig: Array[Byte] = new Array[Byte](16)
    val ones: Array[Int] = new Array[Int](64)
    val out: Array[Byte] = new Array[Byte](16)
  }
  val local: ThreadLocal[Scratch] =
    ThreadLocal.withInitial[Scratch](() => new Scratch)

  private def fnv1a(buf: Array[Byte], off: Int, len: Int): Int = {
    var h = 0x811c9dc5
    var i = off
    val end = off + len
    while (i < end) { h = (h ^ (buf(i) & 0xFF)) * 0x01000193; i += 1 }
    h
  }

  /** Walk `str`, invoking `admit(buf, off, len)` once per DISTINCT
    * token; returns the distinct-token count. */
  def distinctTokens(str: String, sc: Scratch)(
      admit: (Array[Byte], Int, Int) => Unit): Int = {
    val n = str.length
    if (sc.buf.length < n) sc.buf = new Array[Byte](Integer.highestOneBit(n) * 2)
    val buf = sc.buf
    java.util.Arrays.fill(sc.table, -1)
    var mask = sc.table.length - 1
    var nDistinct = 0

    def offer(off: Int, len: Int): Unit = {
      var idx = fnv1a(buf, off, len) & mask
      while (sc.table(idx) != -1) {
        val t = sc.table(idx)
        if (sc.tokLen(t) == len && {
          var k = 0
          val a = sc.tokOff(t)
          while (k < len && buf(a + k) == buf(off + k)) k += 1
          k == len
        }) return // duplicate
        idx = (idx + 1) & mask
      }
      if (nDistinct >= sc.tokOff.length) {
        sc.tokOff = java.util.Arrays.copyOf(sc.tokOff, nDistinct * 2)
        sc.tokLen = java.util.Arrays.copyOf(sc.tokLen, nDistinct * 2)
      }
      sc.tokOff(nDistinct) = off; sc.tokLen(nDistinct) = len
      sc.table(idx) = nDistinct; nDistinct += 1
      admit(buf, off, len)
      if (nDistinct * 2 >= sc.table.length) { // rebuild: probes stay short
        sc.table = new Array[Int](sc.table.length * 2)
        java.util.Arrays.fill(sc.table, -1)
        mask = sc.table.length - 1
        var t = 0
        while (t < nDistinct) {
          var i2 = fnv1a(buf, sc.tokOff(t), sc.tokLen(t)) & mask
          while (sc.table(i2) != -1) i2 = (i2 + 1) & mask
          sc.table(i2) = t
          t += 1
        }
      }
    }

    var w = 0
    var tokStart = -1
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val cl = Character.toLowerCase(cp)
      val isTok = (cl >= 'a' && cl <= 'z') || (cp >= '0' && cp <= '9')
      if (isTok) {
        if (tokStart < 0) tokStart = w
        buf(w) = cl.toByte; w += 1
      } else if (tokStart >= 0) {
        offer(tokStart, w - tokStart); tokStart = -1
      }
    }
    if (tokStart >= 0) offer(tokStart, w - tokStart)
    nDistinct
  }
}
