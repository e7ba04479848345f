package graft.sources

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.sources.{AlwaysTrue, EqualTo, Filter, In, IsNotNull, StringStartsWith}

/** Property tests for the DELETE/scan filter algebra of the
  * graft-index source. The data-loss risk in a file-rewriting DELETE
  * is the composition of FILE pruning (`lettersOf`) with ROW matching
  * (`wordMatches`): a word the conjunction matches whose letter was
  * pruned would survive a delete (under-delete) or, inverted, a scan
  * could skip rows a query needs. The model here is the 3VL
  * conjunction over the admitted (`deletable`) filter vocabulary, and
  * the pruning-soundness property quantifies over random artifacts and
  * random conjunctions — shapes example tests can't cover. */
class DeleteAlgebraPropertiesSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val genWord: Gen[String] = for {
    len <- Gen.chooseNum(1, 6)
    cs <- Gen.listOfN(len, Gen.chooseNum('a', 'f')) // few letters → collisions
  } yield cs.mkString

  private val genFilter: Gen[Filter] = Gen.frequency(
    (4, genWord.map(EqualTo("word", _))),
    (3, Gen.listOf(genWord).map(ws => In("word", ws.toArray[Any]))),
    (2, Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum('a', 'f')).map(cs =>
        StringStartsWith("word", cs.mkString)))),
    (1, Gen.const(IsNotNull("word"))),
    (1, Gen.const(new AlwaysTrue)))

  /** The 3VL model: does the conjunction evaluate TRUE on word w? */
  private def model(f: Filter, w: String): Boolean = f match {
    case EqualTo("word", v: String) => w == v
    case In("word", vs) => vs.exists { case s: String => s == w; case _ => false }
    case StringStartsWith("word", p) => w.startsWith(p)
    case IsNotNull("word") => true
    case _: AlwaysTrue => true
    case other => fail(s"generator produced an unadmitted filter $other")
  }

  test("wordMatches ≡ the 3VL model on every admitted filter") {
    checkProp(Prop.forAll(genFilter, genWord) { (f, w) =>
      assert(IndexTextSource.deletable(f), s"generator outside vocabulary: $f")
      IndexTextSource.wordMatches(f, w) == model(f, w)
    })
  }

  test("letter pruning is SOUND: a matched word's letter always survives pruning") {
    val genConj = Gen.chooseNum(1, 4).flatMap(Gen.listOfN(_, genFilter))
    checkProp(Prop.forAll(genConj, Gen.listOf(genWord)) { (filters, words) =>
      val allowed = IndexTextSource.lettersOf(filters.toArray)
      words.forall { w =>
        val matched = filters.forall(model(_, w))
        // pruning may only drop letters that cannot hold a matched word
        !matched || allowed.forall(_.contains(w.take(1)))
      }
    })
  }

  test("pruning never turns an unmatched word into a deleted one (vacuous by row filter)") {
    // the rewrite deletes rows where ALL filters match — pruning only
    // shrinks the candidate file set, so over-delete is impossible by
    // construction; pin the row predicate against the model over
    // conjunctions (the composition the end-to-end spec samples once)
    val genConj = Gen.chooseNum(1, 4).flatMap(Gen.listOfN(_, genFilter))
    checkProp(Prop.forAll(genConj, genWord) { (filters, w) =>
      filters.forall(IndexTextSource.wordMatches(_, w)) ==
        filters.forall(model(_, w))
    })
  }
}
