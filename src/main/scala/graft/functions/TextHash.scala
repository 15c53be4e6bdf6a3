package graft.functions

/** Row-level hashing primitives for dedup / fingerprinting operators.
  * Plain Scala (used inside UDFs or typed map functions); all seeds are
  * compile-time constants so results are stable across runs and JVMs.
  */
object TextHash {

  /** 64-bit FNV-1a over UTF-8 bytes — fast, allocation-free, stable. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** SplitMix64 finalizer — used to derive independent hash functions. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** SimHash over token hashes (unit weights): bit j of the result is 1 iff
    * more tokens have bit j set than clear. 64-bit, order-insensitive.
    */
  def simhash64(tokenHashes: Iterator[Long]): Long = {
    val counts = new Array[Int](64)
    var n = 0
    while (tokenHashes.hasNext) {
      val h = tokenHashes.next()
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      n += 1
    }
    if (n == 0) 0L
    else {
      var out = 0L
      var j = 0
      while (j < 64) {
        if (counts(j) > 0) out |= (1L << j)
        j += 1
      }
      out
    }
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Distinct word-3-gram shingles of a space-separated text. */
  def shingles3(text: String): Array[String] = {
    val w = text.split(" ").filter(_.nonEmpty)
    if (w.length < 3) Array.empty
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var j = 0
      while (j + 2 < w.length) {
        seen.add(w(j) + " " + w(j + 1) + " " + w(j + 2))
        j += 1
      }
      seen.toArray(new Array[String](seen.size))
    }
  }

  /** Distinct word-3-gram shingle hashes, sorted ascending — the compact
    * set representation for exact-Jaccard verification (64-bit FNV-1a;
    * collision probability over a few hundred shingles is ~1e-13). */
  def shingleHashesSorted(text: String): Array[Long] = {
    val w = text.split(" ").filter(_.nonEmpty)
    if (w.length < 3) Array.empty
    else {
      val seen = new java.util.TreeSet[java.lang.Long]()
      var j = 0
      while (j + 2 < w.length) {
        seen.add(fnv1a64(w(j) + " " + w(j + 1) + " " + w(j + 2)))
        j += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
  }

  /** MinHash signature over word-3-gram shingles: k permutations derived
    * from SplitMix64 applied to the FNV-1a shingle hash. One tight pass —
    * O(shingles × k) primitive ops, no per-element boxing (this replaced an
    * interpreted higher-order-function formulation that was ~1000× slower).
    * Returns null-free Array[Long]; all-MaxValue when < 3 tokens.
    */
  def minhashSig(text: String, k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val w = text.split(" ").filter(_.nonEmpty)
    val seen = new java.util.HashSet[Long]()
    var j = 0
    while (j + 2 < w.length) {
      val h0 = fnv1a64(w(j) + " " + w(j + 1) + " " + w(j + 2))
      if (seen.add(h0)) {
        var p = 0
        while (p < k) {
          val hp = mix64(h0 + p * 0x9e3779b97f4a7c15L)
          if (hp < sig(p)) sig(p) = hp
          p += 1
        }
      }
      j += 1
    }
    sig
  }

  /** Karp–Rabin polynomial rolling fingerprint over the whole string
    * (base 257, mod 2^61-1). Used for document fingerprinting.
    */
  def rollingFingerprint(s: String): Long = {
    val Mod = (1L << 61) - 1
    var h = 0L
    var i = 0
    while (i < s.length) {
      // (h * 257 + c) mod (2^61-1), using 128-bit-safe mulmod via Math.multiplyHigh-free path:
      h = mulMod(h, 257L, Mod)
      h = (h + s.charAt(i)) % Mod
      i += 1
    }
    h
  }

  private def mulMod(a: Long, b: Long, m: Long): Long = {
    // a < 2^61, b small (257): product < 2^70 — split to avoid overflow.
    val hi = a >>> 32
    val lo = a & 0xffffffffL
    // a*b = hi*2^32*b + lo*b
    val part1 = ((hi * b) % m)
    val shifted = {
      var x = part1
      var k = 0
      while (k < 32) { x = (x << 1) % m; k += 1 }
      x
    }
    (shifted + lo * b % m) % m
  }
}
