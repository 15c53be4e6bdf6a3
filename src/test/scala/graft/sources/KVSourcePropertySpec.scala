package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test for the graft-kv split protocol: for ANY file content and
  * ANY chunk size, every parseable line is delivered exactly once — the
  * invariant the reference's read_exact splitter violates (tail loss,
  * mid-token cuts; src/utils.rs:30). */
class KVSourcePropertySpec extends SparkTestBase {

  private val token = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val line = for {
    k <- token
    nv <- Gen.choose(0, 3)
    vs <- Gen.listOfN(nv, token)
  } yield if (vs.isEmpty) k else s"$k ${vs.mkString(" ")}"

  test("any content × any chunk size: exactly-once line delivery") {
    val prop = Prop.forAll(Gen.listOfN(60, line), Gen.choose(1, 200)) {
      (lines: List[String], chunk: Int) =>
        val dir = Files.createTempDirectory("kvprop").toString
        Files.write(Paths.get(dir, "f.txt"), lines.mkString("\n").getBytes)
        val got = spark.read.format("graft-kv").option("chunkSize", chunk.toLong).load(dir)
          .collect().map(r => r.getString(0) -> r.getString(1)).toSeq
          .groupBy(identity).view.mapValues(_.size).toMap
        // expected: every line containing a space, with multiplicity
        val want = lines.filter(_.contains(' '))
          .map { l => val Array(k, v) = l.split(" ", 2); k -> v }
          .groupBy(identity).view.mapValues(_.size).toMap
        got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
