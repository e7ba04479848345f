package graft

/** The dictionary-encoding join inside Dedup.intSets is strategy-gated
  * by `spark.graft.vocabBroadcast` (VERDICT r1 #3: a forced
  * `broadcast(vocab)` OOMs on billion-entry n-gram/web vocabularies).
  * The gate must be plan-only: identical rows under every mode.
  */
class VocabBroadcastSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val affected = Seq("q18_near_dup_jaccard", "q22_minhash_lsh", "q24_ngram_jaccard")

  private def run(mode: String): Map[String, Seq[String]] = {
    spark.conf.set("spark.graft.vocabBroadcast", mode)
    try affected.map { q =>
      q -> SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq
    }.toMap
    finally spark.conf.unset("spark.graft.vocabBroadcast")
  }

  test("vocabBroadcast on/off/auto produce identical rows for q18/q22/q24") {
    val on = run("on")
    val off = run("off")
    val auto = run("auto")
    affected.foreach { q =>
      assert(on(q).nonEmpty, s"$q returned no rows")
      assert(off(q) === on(q), s"$q differs between on and off")
      assert(auto(q) === on(q), s"$q differs between on and auto")
    }
  }
}
