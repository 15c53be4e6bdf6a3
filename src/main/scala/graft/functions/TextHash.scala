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

  /** Per-word FNV-1a hashes from ONE pass over the chars — no substring
    * or byte-array allocation per word (words are maximal runs of
    * non-space chars, identical tokenization to split(" ")+nonEmpty; the
    * hash covers each char's low and high byte, so it's deterministic for
    * any input, not just ASCII). */
  private def wordHashes(text: String): Array[Long] = {
    var n = 0
    var i = 0
    var prevSpace = true
    while (i < text.length) { // count words first: exact-size array, no buffer growth
      val isSpace = text.charAt(i) == ' '
      if (prevSpace && !isSpace) n += 1
      prevSpace = isSpace
      i += 1
    }
    val out = new Array[Long](n)
    var w = 0
    var h = 0xcbf29ce484222325L
    var inWord = false
    i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == ' ') {
        if (inWord) { out(w) = h; w += 1; h = 0xcbf29ce484222325L; inWord = false }
      } else {
        inWord = true
        h ^= (c & 0xffL); h *= 0x100000001b3L
        h ^= ((c >> 8) & 0xffL); h *= 0x100000001b3L
      }
      i += 1
    }
    if (inWord) out(w) = h
    out
  }

  /** Word-3-gram shingle hashes, in text order, duplicates kept. The
    * shingle hash mixes the three word hashes order-sensitively (distinct
    * rotations); collision probability over a corpus of millions of
    * shingles is ~1e-7 per pair of distinct shingles. */
  private def shingleHashes3(text: String): Array[Long] = {
    val hw = wordHashes(text)
    if (hw.length < 3) Array.empty
    else {
      val out = new Array[Long](hw.length - 2)
      var j = 0
      while (j + 2 < hw.length) {
        out(j) = mix64(mix64(hw(j) ^ java.lang.Long.rotateLeft(hw(j + 1), 21)) ^
          java.lang.Long.rotateLeft(hw(j + 2), 42))
        j += 1
      }
      out
    }
  }

  /** Distinct word-3-gram shingle hashes, sorted ascending — the compact
    * set representation for exact-Jaccard verification. Built from the
    * allocation-free char pass; dedup is an in-place sort + sweep (no
    * boxed TreeSet). */
  def shingleHashesSorted(text: String): Array[Long] = {
    val hs = shingleHashes3(text)
    if (hs.isEmpty) hs
    else {
      java.util.Arrays.sort(hs)
      var n = 1
      var i = 1
      while (i < hs.length) {
        if (hs(i) != hs(n - 1)) { hs(n) = hs(i); n += 1 }
        i += 1
      }
      java.util.Arrays.copyOf(hs, n)
    }
  }

  /** Char q-gram FNV-1a hashes, sorted ascending, DUPLICATES KEPT — a bag,
    * not a set. The merge walk in
    * [[graft.plans.IntersectCardSortedLong]] advances both pointers on a
    * match, so on sorted-with-duplicates input it counts min multiplicity
    * per value — i.e. BAG intersection cardinality, exactly the quantity
    * the Gravano count filter bounds (set semantics would under-count
    * shared grams and break the filter's completeness proof). */
  def qgramHashesSortedBag(s: String, q: Int): Array[Long] = {
    val n = s.length - q + 1
    if (n <= 0) return Array.emptyLongArray
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < q) {
        h ^= s.charAt(i + j)
        h *= 0x100000001b3L
        j += 1
      }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    out
  }

  /** Per-document repetition counters in ONE char pass + two small local
    * hash maps: (word count, max 2-gram multiplicity, 3-gram instance
    * count, duplicated-3-gram instance count). Repetition is a PER-DOC
    * property, so nothing here ever needs a shuffle — this replaces an
    * explode + two (doc, gram) cluster-wide hash aggs with local counting
    * over ~doc-length entries. Grams are keyed by mixed word hashes (the
    * same order-sensitive rotations as [[shingleHashes3]]); a within-doc
    * 64-bit collision (~1e-15 for a 10k-word doc) is the only way this can
    * differ from counting the gram strings themselves. */
  def repCounts(text: String): (Long, Long, Long, Long) = {
    val hw = wordHashes(text)
    var mx2 = 0L
    if (hw.length >= 2) {
      val m = new java.util.HashMap[java.lang.Long, Int](hw.length * 2)
      var j = 0
      while (j + 1 < hw.length) {
        val k = mix64(hw(j) ^ java.lang.Long.rotateLeft(hw(j + 1), 21))
        val c = m.getOrDefault(k, 0) + 1
        m.put(k, c)
        if (c > mx2) mx2 = c
        j += 1
      }
    }
    var n3 = 0L
    var dup3 = 0L
    if (hw.length >= 3) {
      n3 = hw.length - 2L
      val m = new java.util.HashMap[java.lang.Long, Int](hw.length * 2)
      var j = 0
      while (j + 2 < hw.length) {
        val k = mix64(mix64(hw(j) ^ java.lang.Long.rotateLeft(hw(j + 1), 21)) ^
          java.lang.Long.rotateLeft(hw(j + 2), 42))
        m.put(k, m.getOrDefault(k, 0) + 1)
        j += 1
      }
      val it = m.values().iterator()
      while (it.hasNext) { val c = it.next(); if (c > 1) dup3 += c }
    }
    (hw.length.toLong, mx2, n3, dup3)
  }

  /** MinHash signature over word-3-gram shingles, hybrid by document size:
    *
    *  - shingles < 4k: classic k independent permutations via
    *    double-hashing composites `h1 + p·h2` (Kirsch & Mitzenmacher,
    *    "Less hashing, same performance", ESA 2006) — per-slot agreement
    *    is independently ~Jaccard, the textbook banding analysis holds
    *    exactly, and the k-loop is cheap when the shingle count is small.
    *  - shingles ≥ 4k: one-permutation hashing (Li, Owen & Zhang, "One
    *    permutation hashing", NIPS 2012): each shingle hash updates only
    *    the slot picked by `h mod k` — O(shingles) instead of
    *    O(shingles × k), the asymptotic fix for long documents. With ≥ 4k
    *    shingles, empty slots are rare (P < e^-4 per slot), so the simple
    *    deterministic forward-cyclic borrow that fills them (a simplified
    *    in-place, one-directional variant — NOT the UAI 2014 densification
    *    scheme) has negligible effect on agreement statistics; short
    *    documents, where chained borrowing WOULD correlate slots, never
    *    take this path.
    *
    * Returns null-free Array[Long]; all-MaxValue when < 3 tokens (the
    * caller filters those before banding).
    */
  def minhashSig(text: String, k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val hs = shingleHashes3(text)
    if (hs.isEmpty) return sig
    if (hs.length < 4 * k) {
      // classic path: k derived permutations per shingle (no dedup pass —
      // duplicate shingles cannot change any minimum)
      var j = 0
      while (j < hs.length) {
        val h0 = hs(j)
        val h1 = mix64(h0)
        val h2 = mix64(h0 ^ 0x9e3779b97f4a7c15L) | 1L
        var hp = h1
        var p = 0
        while (p < k) {
          if (hp < sig(p)) sig(p) = hp
          hp += h2
          p += 1
        }
        j += 1
      }
    } else {
      var j = 0
      while (j < hs.length) {
        val h = mix64(hs(j))
        val slot = java.lang.Long.remainderUnsigned(h, k).toInt
        if (h < sig(slot)) sig(slot) = h
        j += 1
      }
      // fill the (rare) empty slots deterministically so banding never
      // compares raw MaxValue sentinels (which would make sparse docs
      // spuriously collide)
      var p = 0
      while (p < k) {
        if (sig(p) == Long.MaxValue) {
          var off = 1
          while (sig((p + off) % k) == Long.MaxValue && off < k) off += 1
          sig(p) = mix64(sig((p + off) % k) + off)
        }
        p += 1
      }
    }
    sig
  }

  /** Lowercase, strip non-alphanumerics, collapse runs to single spaces,
    * and trim — one char pass, byte-identical to
    * `trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))` for
    * ASCII-lowercasing input (chars outside A-Z whose Unicode lowercase
    * lands in a-z, e.g. the Kelvin sign, would differ — the dedup corpus
    * is ASCII). Exists because the java.util.regex pass was the dd31
    * bench hotspot (same move that fixed tx36): the NFA walks every char
    * through alternation state; this loop is a table-free compare.
    */
  def normalizeText(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c0 = s.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      } else pendingSpace = true
      i += 1
    }
    sb.toString
  }

  /** [[normalizeText]] as a column function (null in, null out). */
  lazy val normalizeUdf: org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    val u = org.apache.spark.sql.functions.udf { s: String =>
      if (s == null) null else normalizeText(s)
    }
    c => u(c)
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
