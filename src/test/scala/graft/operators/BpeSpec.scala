package graft.operators

import graft.SparkTestBase

/** Hand-computed BPE merge learning (the Sennrich ACL'16 worked-example
  * style): word freqs low×5 lower×2 newest×6 widest×3.
  *
  * Round-1 pair counts include (e,s)=(s,t)=(t,</w>)=9 (newest 6 + widest
  * 3) — the lexicographic tie-break must pick (e,s), then (es,t), then
  * (est,</w>), and only then the (l,o)=7 merge.
  */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  private def corpus = Seq(
    Array.fill(5)("low").mkString(" "),
    Array.fill(2)("lower").mkString(" "),
    Array.fill(6)("newest").mkString(" "),
    Array.fill(3)("widest").mkString(" ")).toDF("text")

  test("bpeMerges learns the textbook merge sequence with lexicographic tie-breaks") {
    val got = TextOps.bpeMerges(corpus, "text", k = 4)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", "</w>", 9L),
      (4, "l", "o", 7L)), s"got $got")
  }

  test("bpeMerges counts overlapping pairs (reference get_stats semantics) and stops when exhausted") {
    val tiny = Seq("aaa").toDF("text")
    // symbols: a a a </w> → (a,a) counted at both positions = 2
    val got = TextOps.bpeMerges(tiny, "text", k = 10)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got.head == (1, "a", "a", 2L), s"got $got")
    // merge is left-to-right non-overlapping: "aa a </w>" → next merges
    // proceed until one symbol remains, then the table is exhausted early
    assert(got.length < 10, "merge table must stop when no pairs remain")
    assert(got.map(_._1) == (1 to got.length), "steps must be contiguous")
  }

  test("bpeMerges is invariant to input partitioning") {
    val a = TextOps.bpeMerges(corpus.repartition(7), "text", k = 4).orderBy("step").collect().toSeq
    val b = TextOps.bpeMerges(corpus.coalesce(1), "text", k = 4).orderBy("step").collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }
}
