package graft

import org.apache.spark.sql.DataFrame

import graft.operators.InvertedIndex

/** Golden end-to-end test on the FIXTURES.md §A micro-corpus, plus the
  * tokenizer edge cases pinned from the reference's exact semantics
  * (/root/reference/main.c++:102-143 tokenize, :106-128 normalize,
  * :132 per-doc dedup, :240-252 posting order, :37-44 tie-breaks). */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  /** FIXTURES.md golden micro-corpus (1-based ids like the reference). */
  def corpus: DataFrame = Seq(
    (1L, "The quick brown fox. The FOX!"),
    (2L, "quick, quick fox 99 bottles"),
    (3L, "Zebra   fox\tjumps")
  ).toDF("doc_id", "text")

  test("postings matches the golden index") {
    val got = InvertedIndex.postings(corpus)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2).toList))
      .toList
    // df DESC, word ASC (main.c++:37-44); postings ascending (:240-252)
    assert(got === List(
      ("fox", 3L, List(1L, 2L, 3L)),
      ("quick", 2L, List(1L, 2L)),
      ("bottles", 1L, List(2L)),
      ("brown", 1L, List(1L)),
      ("jumps", 1L, List(3L)),
      ("the", 1L, List(1L)),
      ("zebra", 1L, List(3L))))
  }

  test("mixed case folds, digits/punctuation strip, empty tokens drop") {
    // "99" normalizes to empty and must vanish (README.md:18 semantics)
    val toks = InvertedIndex.tokens(corpus).collect().map(_.getString(1))
    assert(!toks.contains(""))
    assert(toks.count(_ == "fox") === 4) // fox. and FOX! fold; 2+1+1 docs
    assert(toks.count(_ == "quick") === 3) // per-doc dupes kept in q01
  }

  test("per-doc dedup: postings list one id per doc (R7)") {
    val quick = InvertedIndex.postings(corpus)
      .where($"word" === "quick").collect()(0).getSeq[Long](2)
    assert(quick === Seq(1L, 2L)) // doc 2 has 'quick' twice, appears once
  }

  test("index format grammar word:[id1 id2 ... idN] (main.c++:254-266)") {
    val lines = InvertedIndex.indexFormat(corpus)
      .collect().map(r => (r.getString(0), r.getString(3)))
    assert(lines.contains(("f", "fox:[1 2 3]")))
    assert(lines.contains(("q", "quick:[1 2]")))
  }

  test("doc-set algebra: AND and EXCEPT") {
    val and = InvertedIndex.docSetAnd(corpus, "quick", "fox")
      .collect().map(_.getLong(0)).toList
    assert(and === List(1L, 2L))
    val except = InvertedIndex.docSetExcept(corpus, "fox", "quick")
      .collect().map(_.getLong(0)).toList
    assert(except === List(3L))
  }

  test("letter-partitioned text sink reproduces the reference layout (R16)") {
    val out = java.nio.file.Files.createTempDirectory("graft_index").toString
    InvertedIndex.writeIndex(corpus, out)
    def read(letter: String): List[String] = {
      val dir = new java.io.File(s"$out/letter=$letter")
      assert(dir.isDirectory, s"missing partition for '$letter'")
      dir.listFiles().filter(_.getName.startsWith("part-"))
        .flatMap(f => scala.io.Source.fromFile(f).getLines()).toList
    }
    assert(read("f") === List("fox:[1 2 3]"))
    assert(read("q") === List("quick:[1 2]"))
    // R16 parity: the reference creates ALL 26 letter files even when
    // empty (`main.c++:231-233`) — letters absent from the corpus must
    // still have a partition, holding zero lines
    ('a' to 'z').foreach { l =>
      val lines = read(l.toString)
      if (l == 'x') assert(lines.isEmpty, s"letter '$l' should be empty")
    }
  }
}
