package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.TextFns
import graft.operators.InvertedIndex

/** Property tests (SURVEY §5.3): for random corpora the index must
  * (a) contain (word, doc) iff word ∈ normalize(tokenize(doc)),
  * (b) have strictly ascending duplicate-free posting lists,
  * (c) be invariant to input partitioning. */
class IndexPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def checkProp(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  /** Reference-semantics model implementation on plain Scala strings. */
  def modelIndex(docs: List[(Long, String)]): Map[String, List[Long]] =
    docs
      .flatMap { case (id, text) =>
        text.split("\\s+").toList
          .map(_.replaceAll("[^A-Za-z]", "").toLowerCase)
          .filter(_.nonEmpty)
          .distinct
          .map(w => (w, id))
      }
      .groupBy(_._1)
      .map { case (w, ps) => (w, ps.map(_._2).distinct.sorted) }

  val genDoc: Gen[String] = Gen.listOfN(12,
    Gen.oneOf("Fox", "fox!", "a", "B2b", "99", "zum-zum", "  ", "Query",
      "scan", "SCAN", "\tmerge", "λfoo")).map(_.mkString(" "))
  val genCorpus: Gen[List[(Long, String)]] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, genDoc).map(_.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }))

  def sparkIndex(docs: List[(Long, String)], parts: Int): Map[String, List[Long]] =
    InvertedIndex.postings(docs.toDF("doc_id", "text").repartition(parts))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](2).toList))
      .toMap

  test("index == reference-semantics model on random corpora") {
    checkProp(Prop.forAll(genCorpus) { docs =>
      sparkIndex(docs, 2) == modelIndex(docs)
    }, 15)
  }

  test("posting lists strictly ascending, no duplicates") {
    checkProp(Prop.forAll(genCorpus) { docs =>
      sparkIndex(docs, 3).values.forall(ps => ps == ps.distinct.sorted)
    }, 10)
  }

  test("index invariant to partition count (determinism, SURVEY §5.3c)") {
    checkProp(Prop.forAll(genCorpus) { docs =>
      sparkIndex(docs, 1) == sparkIndex(docs, 5)
    }, 10)
  }

  test("polyHash stays in [0, P) and folds ascii as specified") {
    val df = List("fox", "Fox", "zebra", "a").toDF("w")
      .select(TextFns.polyHash($"w").as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs.forall(h => h >= 0 && h < TextFns.HashP))
    assert(hs(3) === 97L) // single char folds to its ascii code
  }
}
