package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Unit invariants for the LLM-pipeline extension operators (q21–q30).
  * The DuckDB oracle is the value-level check; these pin the semantics
  * on hand-built corpora where the expected answer is obvious. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "alpha beta gamma delta"),
    (2L, "alpha beta gamma delta"), // exact dup of 1
    (3L, "alpha beta gamma epsilon"), // near dup of 1 (j = 3/5)
    (4L, "zeta eta theta iota kappa")
  ).toDF("doc_id", "text")

  test("q21 exact dedup maps duplicates to the minimal doc_id") {
    val rows = Dedup.exactDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(rows.toList === List((1L, 1L, false), (2L, 1L, true), (3L, 3L, false), (4L, 4L, false)))
  }

  test("q22 minhash finds exact duplicates with jaccard 1.0") {
    val rows = Dedup.minhashNearDup(docs, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toList === List((1L, 2L, 1.0)))
  }

  test("q23 simhash identical docs share a signature; disjoint docs differ") {
    val sig = Dedup.simhash(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(4L))
  }

  test("q24 ngram jaccard: identical docs similarity 1.0, pairs ordered") {
    val rows = Dedup.ngramJaccard(docs, 3, 1000L, 0.99).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toList === List((1L, 2L)))
    assert(rows(0).getDouble(2) === 1.0)
  }

  val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f) ++ Array.fill(61)(0.0f)),
    (1L, Array(1.0f, 0.0f, 0.0f) ++ Array.fill(61)(0.0f)), // identical to 0
    (2L, Array(0.0f, 1.0f, 0.0f) ++ Array.fill(61)(0.0f)), // orthogonal
    (3L, Array(-1.0f, 0.0f, 0.0f) ++ Array.fill(61)(0.0f)) // opposite
  ).toDF("vec_id", "embedding")

  test("q25 embed near-dup finds only the identical pair at high threshold") {
    val rows = Similarity.embedNearDup(vecs, 100L, 0.99).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toList === List((0L, 1L)))
    assert(rows(0).getDouble(2) === 1.0)
  }

  test("q26 lsh-ann: identical vectors share a bucket and rank first") {
    val rows = Similarity.lshAnn(vecs, 1, 3).collect()
    // query vec 0: its bucket contains at least vec 1 (identical ⇒ same bucket)
    val first = rows.find(r => r.getLong(0) == 0L && r.getLong(4) == 1L).get
    assert(first.getLong(1) === 1L)
    assert(first.getDouble(3) === 1.0)
  }

  test("q27/q28: stopword ratio and quality signals") {
    val d = Seq((1L, "the the the spark"), (2L, "spark scan merge")).toDF("doc_id", "text")
    val lang = TextAnalysis.langId(d).collect().map(r => (r.getLong(0), r.getString(4))).toMap
    assert(lang(1L) === "en")
    assert(lang(2L) === "und")
    val q = TextAnalysis.qualityScore(d).collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(q(1L) === 1L) // fails n_tok and stop_ratio signals, passes wlen
    assert(q(2L) === 2L) // passes stop_ratio + wlen, fails n_tok
  }

  test("q29 token count: ws tokens and bpe estimate") {
    val d = Seq((1L, "abcd abcdefgh xy")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCount(d).collect()(0)
    assert(r.getLong(1) === 3L) // ws tokens
    assert(r.getLong(2) === 1L + 2L + 1L) // ceil(4/4)+ceil(8/4)+ceil(2/4)
    assert(r.getLong(3) === 14L)
  }

  test("q30 fingerprint equal iff text equal (on this corpus)") {
    val fps = TextAnalysis.fingerprint(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }
}
