package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.InvertedIndex

/** The positional-index query family (q95–q97): hand-computed goldens
  * on a micro-corpus, plus the two formulation-equivalence properties
  * the oracle also pins (phrase window-form ≡ join-form is the driver's
  * hash match; here the blocked proximity join is pinned against the
  * naive theta form on a corpus slice). */
class PositionalIndexSpec extends SparkSpec {
  import spark.implicits._

  // raw-split offsets: doc 1 = the@0 quick@1 fox@2 the@3 quick@4
  // quick@5 fox@6; doc 2 = fox@0 [99→empty holds @1] fox@2
  def corpus: DataFrame = Seq(
    (1L, "the quick fox, the quick quick fox"),
    (2L, "fox 99 fox"),
    (3L, "quick")
  ).toDF("doc_id", "text")

  test("posTokens: raw-split offsets, empties dropped after numbering") {
    val got = TextFns.posTokens(corpus)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // doc 2: 'fox' at 0 and 2 — position 1 ('99'→empty) is dropped but
    // still occupied, so the second fox stays at offset 2
    assert(got.filter(_._1 == 2L) === Set((2L, "fox", 0L), (2L, "fox", 2L)))
    assert(got.filter(_._1 == 3L) === Set((3L, "quick", 0L)))
  }

  test("positionalPostings: ascending offsets per (word, doc)") {
    val got = InvertedIndex.positionalPostings(corpus, Seq("quick", "fox"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toList
    assert(got === List(
      ("fox", 1L, 2L, "2 6"),
      ("fox", 2L, 2L, "0 2"),
      ("quick", 1L, 3L, "1 4 5"),
      ("quick", 3L, 1L, "0")))
  }

  test("phraseSearch: consecutive raw positions, per-doc match counts") {
    // 'quick fox' occurs in doc 1 at (1,2) and (5,6) — not (4,5)
    val got = InvertedIndex.phraseSearch(corpus, Seq("quick", "fox"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got === List((1L, 2L)))
    // a stripped-to-empty token breaks adjacency: doc 2 'fox 99 fox'
    // has NO 'fox fox' match (offsets 0 and 2 are not consecutive)
    assert(InvertedIndex.phraseSearch(corpus, Seq("fox", "fox")).isEmpty)
    // single-word phrase degenerates to per-doc term frequency
    val tf = InvertedIndex.phraseSearch(corpus, Seq("fox"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(tf === List((1L, 2L), (2L, 2L)))
  }

  test("proximitySearch: golden counts and min distance") {
    // doc 1 quick@{1,4,5} fox@{2,6}: |Δ|<=1 pairs are (1,2) and (5,6)
    // → n_pairs=2, min_dist=1; docs 2/3 lack one of the words
    val got = InvertedIndex.proximitySearch(corpus, "quick", "fox", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got === List((1L, 2L, 1L)))
  }

  test("blocked proximity ≡ naive theta form (sf slice)") {
    val docs = graft.sources.Tables(spark, testdataDir, "documents")
      .where($"doc_id" < 200)
    val blocked = InvertedIndex.proximitySearch(docs, "spark", "join", 3)
    val pts = TextFns.posTokens(docs)
    val naive = pts.where($"word" === "spark")
      .select($"doc_id", $"pos".as("pa"))
      .join(pts.where($"word" === "join").select($"doc_id", $"pos".as("pb")), Seq("doc_id"))
      .where(abs($"pa" - $"pb") <= 3)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"), min(abs($"pa" - $"pb")).as("min_dist"))
    assert(blocked.count() > 0)
    assert(blocked.exceptAll(naive).isEmpty)
    assert(naive.exceptAll(blocked).isEmpty)
  }

  test("stored positional index serves the same phrase results") {
    val dir = java.nio.file.Files.createTempDirectory("posidx").toString
    val docs = graft.sources.Tables(spark, testdataDir, "documents")
      .where($"doc_id" < 300)
    graft.sources.IndexStore.savePositional(docs, dir)
    val idx = graft.sources.IndexStore.loadPositional(spark, dir)
    for (phrase <- Seq(Seq("small", "query", "line"), Seq("batch", "batch"))) {
      val stored = graft.sources.IndexStore.phraseSearchStored(idx, phrase)
      val direct = InvertedIndex.phraseSearch(docs, phrase)
      assert(stored.exceptAll(direct).isEmpty && direct.exceptAll(stored).isEmpty,
        s"phrase=$phrase")
    }
    // empty-string phrase word: empty result, same as the direct form
    assert(graft.sources.IndexStore.phraseSearchStored(idx, Seq("", "batch")).isEmpty)
    val proxStored = graft.sources.IndexStore.proximitySearchStored(idx, "spark", "join", 3)
    val proxDirect = InvertedIndex.proximitySearch(docs, "spark", "join", 3)
    assert(proxStored.exceptAll(proxDirect).isEmpty &&
      proxDirect.exceptAll(proxStored).isEmpty)
    // letter pruning reaches the file source: one-letter predicate
    val plan = graft.sources.IndexStore.phraseSearchStored(idx, Seq("batch"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("letter"))
  }

  test("degenerate inputs: empty corpus, absent terms") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(InvertedIndex.positionalPostings(empty, Seq("x")).isEmpty)
    assert(InvertedIndex.phraseSearch(empty, Seq("x", "y")).isEmpty)
    assert(InvertedIndex.proximitySearch(empty, "x", "y", 3).isEmpty)
    assert(InvertedIndex.positionalPostings(corpus, Seq("absent")).isEmpty)
    assert(InvertedIndex.phraseSearch(corpus, Seq("quick", "absent")).isEmpty)
    intercept[IllegalArgumentException] {
      InvertedIndex.phraseSearch(corpus, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      InvertedIndex.proximitySearch(corpus, "a", "b", 0)
    }
  }
}
