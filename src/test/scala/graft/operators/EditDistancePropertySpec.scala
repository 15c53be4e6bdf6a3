package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/** Property test for the edit-distance similarity join: for ANY corpus
  * (tiny alphabet to force gram collisions, lengths spanning the short/
  * long candidate paths and the empty string) and ANY threshold, the
  * filtered join equals the brute-force all-pairs answer — i.e. the
  * length-band bucketing, histogram L1 prefilter, and bag count filter
  * are all exactness-preserving, never just "usually right". */
class EditDistancePropertySpec extends SparkTestBase {

  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    var i = 1
    while (i <= a.length) {
      var prev = dp(0)
      dp(0) = i
      var j = 1
      while (j <= b.length) {
        val t = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
        j += 1
      }
      i += 1
    }
    dp(b.length)
  }

  test("any corpus × any threshold: join equals brute force") {
    val str = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    // bias toward near-dup structure: half the corpus derives from a base
    // string by local mutation, so thresholds actually select pairs
    val corpus = for {
      bases <- Gen.listOfN(5, str)
      mutated <- Gen.sequence[List[String], String](bases.map { b =>
        Gen.choose(0, 3).map { k =>
          (0 until k).foldLeft(b) { (s, _) =>
            if (s.isEmpty) "a" else s.updated(s.length / 2, 'b')
          }
        }
      })
    } yield (bases ++ mutated).zipWithIndex.map { case (s, i) => (i.toLong, s) }

    val prop = Prop.forAll(corpus, Gen.choose(0, 6)) { (docs, d) =>
      val df = docs.toDF("doc_id", "text")
      val got = graft.api.Ops.editDistanceDupPairs(df, "doc_id", "text", maxDist = d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (ia, sa) <- docs
        (ib, sb) <- docs
        if ia < ib
        dist = lev(sa, sb)
        if dist <= d
      } yield (ia, ib, dist)).toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
