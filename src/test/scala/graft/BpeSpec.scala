package graft

import graft.operators.Bpe

/** q199 BPE merge training — hand-checkable corpora pin the weighted
  * argmax, the (cnt desc, pair asc) tie-break, the GREEDY-LEFTMOST
  * overlapping-run rule, and early termination when nothing merges. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def merges(texts: Seq[String], rounds: Int = 4) =
    Bpe.bpeMerges(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), rounds)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toList

  test("hand-computed merge sequence, then early stop when fully merged") {
    // vocab: aaab freq 2, ab freq 1
    // r1: (a,a) weighted 2·2=4 beats (a,b) 2+1=3 → aaab = [aa,a,b]
    // r2: (a,b) 2+1=3 beats (aa,a) 2 → [aa,ab], [ab]
    // r3: (aa,ab) 2 beats nothing else → [aaab]
    // r4: ab has no pair partner left with any other word? (aaab,?) no
    //     pairs remain in aaab (1 symbol); ab is 1 symbol — STOP at 3
    val got = merges(Seq("aaab aaab ab"))
    assert(got === List(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)))
  }

  test("greedy-leftmost: overlapping runs merge at odd offsets") {
    // "aaaa": (a,a) at positions 1,2,3 — one run; merges land at 1 and
    // 3 (never the overlapping 2) → [aa,aa]; round 2 merges those
    val got = merges(Seq("aaaa"), rounds = 2)
    assert(got === List(
      (1, "a", "a", "aa", 3L),
      (2, "aa", "aa", "aaaa", 1L)))
  }

  test("tie-break is (count desc, pair asc)") {
    // "xy" and "ab" each once: (a,b) and (x,y) both cnt 1 → (a,b) wins
    val got = merges(Seq("xy ab"), rounds = 1)
    assert(got === List((1, "a", "b", "ab", 1L)))
  }

  test("frequencies weight the argmax (vocabulary-level training)") {
    // "zq" appears 3×, "ab" once: (z,q) cnt 3 wins though both are
    // single vocabulary entries
    val got = merges(Seq("zq zq zq ab"), rounds = 1)
    assert(got === List((1, "z", "q", "zq", 3L)))
  }

  private def encoderRows(e: org.apache.spark.sql.DataFrame) =
    e.select(col("word"), col("freq"),
        org.apache.spark.sql.functions.array_join(col("syms"), " ").as("s"))
      .orderBy("word").collect().map(_.toString).toList
  private def col(n: String) = org.apache.spark.sql.functions.col(n)

  test("driver-local trainer ≡ relational trainer: merges AND encoder table") {
    // the production path (trainLocal) and the oracle-replayable
    // relational twin must agree exactly — merge sequence, counts,
    // and the final word→symbols encoder — on the real corpus
    val docs = spark.read.parquet(s"$testdataDir/documents.parquet")
    val (mLocal, eLocal) = Bpe.trainLocal(docs, 4)
    val (mRel, eRel) = Bpe.trainRelational(docs, 4)
    assert(mLocal === mRel)
    assert(encoderRows(eLocal) === encoderRows(eRel))
    assert(mLocal.size === 4)
  }

  test("production merge counts: >=1000 merges train driver-local in bounded time") {
    // a vocabulary with guaranteed >=1000 distinct merge rules: all
    // 3-letter words over a 10-letter alphabet — every one of the
    // 1000 words must eventually become its own single symbol, and
    // each round mints exactly one new symbol string, so exhaustion
    // takes >=1000 rounds. This is the merge count a real tokenizer
    // needs a meaningful fraction of (30k-50k), infeasible as a
    // per-round Spark job chain but seconds driver-local.
    val letters = "abcdefghij"
    val words = for (a <- letters; b <- letters; c <- letters)
      yield s"$a$b$c"
    val docs = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val (m, enc) = Bpe.trainLocal(docs, 1500)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(m.size >= 1000, s"expected >=1000 merges, got ${m.size}")
    assert(m.size < 1500, "loop should exhaust (early-stop) before the cap")
    // exhaustion means every word IS one symbol — the encoder agrees
    assert(enc.where(org.apache.spark.sql.functions.size(col("syms")) =!= 1)
      .count() === 0L)
    // merge steps are dense and correctly numbered
    assert(m.map(_._1) === (1 to m.size).toList)
    assert(secs < 60.0, s"driver-local training took ${secs}s")
  }

  // ---- round-12 vocabulary prune (the bounded driver collect) ----

  private def withConf[T](kv: (String, String)*)(body: => T): T =
    try { kv.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally kv.foreach { case (k, _) => spark.conf.unset(k) }

  test("default prune bounds do not bind on testdata: merges and encoder unchanged") {
    val docs = spark.read.parquet(s"$testdataDir/documents.parquet")
    val (mDefault, eDefault) = Bpe.trainLocal(docs, 4)
    val (mUnpruned, eUnpruned) = withConf(
      "spark.graft.bpe.minFreq" -> "1",
      "spark.graft.bpe.maxVocab" -> Int.MaxValue.toString) {
      Bpe.trainLocal(docs, 4)
    }
    assert(mDefault === mUnpruned)
    assert(encoderRows(eDefault) === encoderRows(eUnpruned))
  }

  test("maxVocab cap: top-V trains, trainers stay equal, pruned words char-encode") {
    // vocab aa:3 bb:2 cc:1; cap 2 keeps {aa, bb} — cc is pruned from
    // TRAINING but must still ENCODE (character fallback)
    val docs = Seq((0L, "aa aa aa bb bb cc")).toDF("doc_id", "text")
    withConf("spark.graft.bpe.maxVocab" -> "2") {
      val (mL, eL) = Bpe.trainLocal(docs, 2)
      val (mR, eR) = Bpe.trainRelational(docs, 2)
      assert(mL === List((1, "a", "a", "aa", 3L), (2, "b", "b", "bb", 2L)))
      assert(mL === mR)
      assert(encoderRows(eL) === encoderRows(eR))
      // encoder is TOTAL: all three corpus words present, cc as chars
      assert(encoderRows(eL) === List(
        "[aa,3,aa]", "[bb,2,bb]", "[cc,1,c c]"))
    }
  }

  test("minFreq cut: rare words excluded from training, still encoded") {
    val docs = Seq((0L, "aa aa aa bb bb cc")).toDF("doc_id", "text")
    withConf("spark.graft.bpe.minFreq" -> "2") {
      val (mL, eL) = Bpe.trainLocal(docs, 2)
      val (mR, eR) = Bpe.trainRelational(docs, 2)
      assert(mL === List((1, "a", "a", "aa", 3L), (2, "b", "b", "bb", 2L)))
      assert(mL === mR)
      assert(encoderRows(eL) === encoderRows(eR))
      assert(encoderRows(eL).exists(_.contains("c c")), "cc must char-encode")
    }
    // q200 stays total under pruning: every doc keeps its exact
    // whitespace token count; the pruned word costs one symbol per char
    withConf("spark.graft.bpe.maxVocab" -> "2") {
      val enc = Bpe.bpeEncode(docs, 2).collect()
      assert(enc.length === 1)
      assert(enc(0).getLong(1) === 6L) // n_tokens
      assert(enc(0).getLong(2) === 7L) // n_bpe: 3·1 + 2·1 + 1·2
    }
  }
}
