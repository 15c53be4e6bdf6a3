package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TextHashSpec extends AnyFunSuite {

  test("fnv1a64 is stable and collision-distinct on a small vocab") {
    assert(TextHash.fnv1a64("hash") == TextHash.fnv1a64("hash"))
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table", "value", "part", "hash")
    assert(vocab.map(TextHash.fnv1a64).distinct.size == vocab.size)
  }

  test("simhash: identical token multisets hash identically; small edits stay close") {
    def sh(s: String) = TextHash.simhash64(s.split(" ").iterator.map(TextHash.fnv1a64))
    val base = "a b c d e f g h i j k l m n o p q r s t"
    assert(sh(base) == sh(base))
    val oneEdit = "a b c d e f g h i j k l m n o p q r s z"
    val ham = TextHash.hamming(sh(base), sh(oneEdit))
    assert(ham <= 16, s"one-token edit moved simhash by $ham bits")
    val unrelated = "u v w x y zz q1 q2 q3 q4 q5 q6 q7 q8 q9 qa qb qc qd qe"
    assert(TextHash.hamming(sh(base), sh(unrelated)) > ham)
  }

  test("minhashSig estimates Jaccard: identical texts -> identical sigs; disjoint texts -> mostly different") {
    val a = TextHash.minhashSig("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", 64)
    val a2 = TextHash.minhashSig("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", 64)
    assert(a.sameElements(a2))
    val b = TextHash.minhashSig("x1 x2 x3 x4 x5 x6 x7 x8 x9 x10", 64)
    val agree = a.zip(b).count { case (x, y) => x == y }
    assert(agree <= 3, s"disjoint shingle sets agreed on $agree/64 minhashes")
    // ~half-overlapping shingles should agree on a middling fraction
    val c = TextHash.minhashSig("w1 w2 w3 w4 w5 w6 x1 x2 x3 x4 x5 x6", 64)
    val agreeAC = a.zip(c).count { case (x, y) => x == y }
    assert(agreeAC > 3 && agreeAC < 61, s"partial overlap agreement was $agreeAC/64")
  }

  test("property: minhash band agreement tracks true Jaccard (seeded trials)") {
    // For pairs with known shingle overlap, the fraction of agreeing
    // minhashes is an unbiased Jaccard estimate (Broder 1997): check the
    // estimate lands within ±0.2 of truth across seeded random pairs.
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val common = (1 to 30 + rnd.nextInt(30)).map(i => s"c${rnd.nextInt(1000)}_$i")
      val aOnly = (1 to rnd.nextInt(40)).map(i => s"a${rnd.nextInt(1000)}_$i")
      val bOnly = (1 to rnd.nextInt(40)).map(i => s"b${rnd.nextInt(1000)}_$i")
      val ta = (common ++ aOnly).mkString(" ")
      val tb = (common ++ bOnly).mkString(" ")
      val sa = TextHash.shingleHashesSorted(ta).toSet
      val sb = TextHash.shingleHashesSorted(tb).toSet
      val trueJac = sa.intersect(sb).size.toDouble / sa.union(sb).size
      val siga = TextHash.minhashSig(ta, 64)
      val sigb = TextHash.minhashSig(tb, 64)
      val est = siga.zip(sigb).count { case (x, y) => x == y } / 64.0
      assert(math.abs(est - trueJac) <= 0.2,
        s"estimate $est vs true $trueJac (|common|=${common.size})")
    }
  }

  test("minhashSig on <3 tokens is the all-MaxValue sentinel") {
    assert(TextHash.minhashSig("one two", 8).forall(_ == Long.MaxValue))
  }

  test("shingles3 produces distinct, ordered 3-grams") {
    assert(TextHash.shingles3("a b c d").toSeq == Seq("a b c", "b c d"))
    assert(TextHash.shingles3("a b c a b c a b c d").toSeq.distinct.size ==
      TextHash.shingles3("a b c a b c a b c d").length)
    assert(TextHash.shingles3("a  b").isEmpty) // <3 non-empty tokens
  }

  test("rollingFingerprint: deterministic, order-sensitive, < 2^61") {
    val f1 = TextHash.rollingFingerprint("hello world")
    assert(f1 == TextHash.rollingFingerprint("hello world"))
    assert(f1 != TextHash.rollingFingerprint("world hello"))
    assert(f1 >= 0 && f1 < (1L << 61))
  }

  test("normalizeText matches the regex form char-for-char (unit cases)") {
    def regexForm(s: String): String =
      s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
    val cases = Seq(
      "Hello,  World!", "  lead/trail  ", "", "a", "...", "a1 B2!c3",
      "tabs\tand\nnewlines", "already clean text", "UPPER lower 123",
      "double  space", "!@#$%^&*()", "x", "mixed-Case_Words.here")
    cases.foreach(s => assert(TextHash.normalizeText(s) == regexForm(s), s"input: '$s'"))
  }

  test("hamming counts differing bits") {
    assert(TextHash.hamming(0L, -1L) == 64)
    assert(TextHash.hamming(5L, 4L) == 1)
    assert(TextHash.hamming(123L, 123L) == 0)
  }
}
