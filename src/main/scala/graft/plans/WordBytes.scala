package graft.plans

import org.apache.spark.unsafe.types.UTF8String

/** Byte-level word splitting shared by the native text-loop expressions
  * (r19 optimization, guide §1.2 "per-task work"): the String-based
  * kernels paid a full UTF-8 decode (`UTF8String.toString`), a regex
  * scan, per-word String allocations and a re-encode per emitted
  * shingle. Java's `\s` is ASCII-only (space, \t, \n, \x0B, \f, \r —
  * all single-byte in UTF-8, and UTF-8 continuation/lead bytes are
  * ≥ 0x80), so `Pattern.compile("\\s+").split(trimmed, -1)` is exactly
  * reproducible on the raw bytes: split at maximal ASCII-whitespace
  * runs, with a leading/trailing empty token when the (space-trimmed)
  * input starts/ends with a run, and the single empty token for empty
  * input. `WordSplitParitySpec` pins this against the regex form.
  */
private[plans] object WordBytes {

  @inline def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D

  /** Split result: the trimmed input's bytes plus word (offset, length)
    * pairs packed as offs(i)/lens(i), count words.
    */
  final class Words(val bytes: Array[Byte], val offs: Array[Int],
      val lens: Array[Int], val count: Int) {
    def word(i: Int): UTF8String =
      UTF8String.fromBytes(bytes, offs(i), lens(i))
    /** Copy of words [i, i+n) joined by single spaces. */
    def joined(i: Int, n: Int): UTF8String = {
      var len = n - 1
      var j = 0
      while (j < n) { len += lens(i + j); j += 1 }
      val out = new Array[Byte](len)
      var p = 0
      j = 0
      while (j < n) {
        if (j > 0) { out(p) = 0x20; p += 1 }
        System.arraycopy(bytes, offs(i + j), out, p, lens(i + j))
        p += lens(i + j)
        j += 1
      }
      UTF8String.fromBytes(out)
    }
  }

  /** Space-trim (U+0020 only, the `UTF8String.trim` contract) then
    * split on ASCII-`\s+` runs with Java `split(..., -1)` semantics:
    * tokens = the (possibly empty) spans between maximal runs —
    * leading/trailing empties included, `[""]` for empty input.
    */
  def split(s: UTF8String): Words = {
    val t = s.trim() // strips U+0020 only — the engine/oracle contract
    val bytes = t.getBytes
    val n = bytes.length
    // tokens = separator-run count + 1
    var count = 1
    var i = 0
    var inRun = false
    while (i < n) {
      val ws = isWs(bytes(i))
      if (ws && !inRun) { count += 1; inRun = true }
      else if (!ws) inRun = false
      i += 1
    }
    val offs = new Array[Int](count)
    val lens = new Array[Int](count)
    var w = 0
    var start = 0
    i = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        offs(w) = start; lens(w) = i - start; w += 1
        while (i < n && isWs(bytes(i))) i += 1
        start = i
      } else i += 1
    }
    offs(w) = start; lens(w) = n - start; w += 1
    new Words(bytes, offs, lens, w)
  }
}
