package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.Tables

/** q194 winnowing fingerprints and q195 print-inversion pairs — the
  * MOSS select→invert→pair path. The load-bearing claim is the
  * winnowing GUARANTEE: any shared substring of length ≥ k+w−1 shares
  * at least one SELECTED fingerprint — tested against the actual print
  * relation, not a summary. */
class WinnowSpec extends SparkSpec {

  private def t(n: String) = Tables(spark, testdataDir, n)

  private val K = 8
  private val W = 4

  test("q194 guarantee: a shared substring of length k+w-1 shares a print") {
    import spark.implicits._
    // shared block of exactly k+w-1 = 11 chars inside unrelated text
    val shared = "qwertzuiopl"
    val docs = Seq(
      (1L, "aaaabbbbcccc" + shared + "ddddeeee"),
      (2L, "mmmmnnnnoooo" + shared + "ppppssss")).toDF("doc_id", "text")
    val prints = TextAnalysis.winnowPrints(docs, K, W)
      .select("doc_id", "fp").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val a = prints.collect { case (1L, fp) => fp }.toSet
    val b = prints.collect { case (2L, fp) => fp }.toSet
    assert(a.intersect(b).nonEmpty,
      "the winnowing guarantee failed: an 11-char match selected no common print")
  }

  test("q194 frames: only full windows; short docs excluded; density below 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefghij"),                      // 10 chars < k+w-1 → no windows
      (2L, "abcdefghijklmnopqrstuvwxyz")).toDF("doc_id", "text")
    val prof = TextAnalysis.winnowFingerprints(docs, K, W).collect()
    assert(prof.map(_.getLong(0)).toList === List(2L))
    val r = prof.head
    // 26 chars → 19 grams → 16 full windows; distinct prints ≤ windows
    assert(r.getLong(2) === 16L)
    assert(r.getLong(1) <= r.getLong(2))
    // the window-min selection thins the full gram set (expected
    // density ~2/(w+1)); distinct prints must also be a SUBSET of the
    // doc's gram hashes
    val grams = docs.where(col("doc_id") === 2L)
      .select(explode(sequence(lit(1), length(col("text")) - (K - 1))).as("p"),
        col("text"))
      .select(graft.functions.TextFns.polyHash(
        expr(s"substring(text, p, $K)")).as("h"))
      .collect().map(_.getLong(0)).toSet
    val prints = TextAnalysis.winnowPrints(docs, K, W)
      .where(col("doc_id") === 2L).select("fp").collect()
      .map(_.getLong(0)).toSet
    assert(prints.subsetOf(grams))
    assert(prints.size < grams.size)
  }

  test("q194 guarantee holds over 30 random planted pairs (fixed seed)") {
    import spark.implicits._
    // randomized adversary, deterministic replay: random prefixes /
    // suffixes / shared blocks of random length ≥ k+w-1; every pair
    // (2i, 2i+1) must share a selected print REGARDLESS of where the
    // shared block lands or what surrounds it
    val rnd = new scala.util.Random(0x9147L)
    def s(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val cases = (0 until 30).map { i =>
      val shared = s(K + W - 1 + rnd.nextInt(20))
      val a = (2L * i, s(rnd.nextInt(40)) + shared + s(rnd.nextInt(40)))
      val b = (2L * i + 1, s(rnd.nextInt(40)) + shared + s(rnd.nextInt(40)))
      (a, b)
    }
    val docs = cases.flatMap(c => Seq(c._1, c._2)).toDF("doc_id", "text")
    val byDoc = TextAnalysis.winnowPrints(docs, K, W)
      .select("doc_id", "fp").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, fs) => (d, fs.map(_._2).toSet) }
    cases.foreach { case ((ida, _), (idb, _)) =>
      assert(byDoc(ida).intersect(byDoc(idb)).nonEmpty,
        s"pair ($ida, $idb) shared a block ≥ k+w-1 but no selected print")
    }
  }

  test("q195 inversion finds the planted pair with a bounded containment") {
    import spark.implicits._
    // a long shared block → several shared prints; unrelated third doc
    val shared = "thequickbrownfoxjumpsoverthelazydog"
    val docs = Seq(
      (1L, "xxxx" + shared + "yyyy"),
      (2L, "zzzz" + shared + "wwww"),
      (3L, "totallyunrelatedcontentwithnothingshared")).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowPairs(docs, K, W, maxDf = 10L, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(pairs.map(p => (p._1, p._2)).toList === List((1L, 2L)))
    val (_, _, nShared, containment) = pairs.head
    assert(nShared >= 1L)
    assert(containment > 0.0 && containment <= 1.0)
  }

  test("q195 boilerplate cap: a print in more than maxDf docs cannot vote") {
    import spark.implicits._
    // 12 identical docs: every print has df=12 > maxDf=10 → no pairs
    val docs = (1L to 12L)
      .map(i => (i, "identicalboilerplatecontenteverywhere"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.winnowPairs(docs, K, W, maxDf = 10L, minShared = 1L)
      .count() === 0L)
    // …but within the cap the same docs all pair up
    val small = (1L to 3L)
      .map(i => (i, "identicalboilerplatecontenteverywhere"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.winnowPairs(small, K, W, maxDf = 10L, minShared = 1L)
      .count() === 3L)
  }

  test("q195 plans as fp-keyed joins — no cartesian/BNLJ stage") {
    val plan = TextAnalysis.winnowPairs(t("documents"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair candidates must come from the fingerprint equi-join:\n$plan")
  }
}
