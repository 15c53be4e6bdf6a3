package graft.core

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Golden + property tests for the MapReducer API (SURVEY.md §5 #2-4). */
class MapReduceSpec extends SparkTestBase {

  private def wcLocal(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("WordCount golden fixture: global counts match an independent computation") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the dog\tbarks  twice",
      "fox and dog and fox")
    val input = texts.zipWithIndex.map { case (t, i) => (i.toString, t) }.toDS()
    val got = MapReduce.runAssociative(input, WordCount).collect().toMap
    assert(got == wcLocal(texts))
    assert(got("the") == 3L && got("fox") == 3L && got("dog") == 3L)
  }

  test("run (mapGroups path) agrees with runAssociative (reduceGroups path)") {
    import spark.implicits._
    val texts = Seq("a b a", "b c", "c c c a")
    val input = texts.zipWithIndex.map { case (t, i) => (i.toString, t) }.toDS()
    val a = MapReduce.run(input, WordCount).collect().toMap
    val b = MapReduce.runAssociative(input, WordCount).collect().toMap
    assert(a == b)
  }

  test("property: WordCount(a ++ b) == merge(WordCount(a), WordCount(b))") {
    // The invariant the reference's per-chunk reduce scope violates
    // (SURVEY.md §2.1 #5): global counts must merge across chunks.
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta")
    val text = Gen.listOf(word).map(_.mkString(" "))
    val prop = Prop.forAll(Gen.listOfN(3, text), Gen.listOfN(3, text)) { (as: List[String], bs: List[String]) =>
      val both = MapReduce.runAssociative(
        (as ++ bs).zipWithIndex.map { case (t, i) => (i.toString, t) }.toDS(), WordCount)
        .collect().toMap
      val merged =
        (wcLocal(as).toSeq ++ wcLocal(bs).toSeq).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      both == merged
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
