package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.lit

import graft.operators._
import graft.sources.RawCorpus

/** Degenerate-input behavior: every operator must return a well-typed
  * empty (or singleton) result, never throw — at 100 TB some partition
  * or some day's input WILL be empty. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  val empty = RawCorpus.emptyCorpus(spark)
  val vanishing = Seq((1L, "123 456 !!!"), (2L, "... 999")).toDF("doc_id", "text")
  val single = Seq((1L, "only one doc here")).toDF("doc_id", "text")

  test("index pipeline on an empty corpus: empty, well-typed results") {
    assert(InvertedIndex.postings(empty).count() === 0)
    assert(InvertedIndex.indexFormat(empty).count() === 0)
    assert(InvertedIndex.topkPerLetter(empty, 5).count() === 0)
  }

  test("corpus whose every token normalizes away behaves as empty") {
    assert(InvertedIndex.postings(vanishing).count() === 0)
    assert(TextAnalysis.tokenCount(vanishing).count() === 0)
    assert(TextAnalysis.fingerprint(vanishing).count() === 2) // fp of raw text still defined
  }

  test("round-3 operators on empty / degenerate inputs: no throw, well-typed") {
    // documents-shaped ops on the empty corpus
    assert(Dedup.dedupKeep(empty).count() === 0)
    assert(Dedup.simhashMatch(empty, 100L, 3).count() === 0)
    assert(Dedup.dedupClustersScale(empty, 0.9).count() === 0)
    assert(TextAnalysis.contamination(empty).count() === 0)
    assert(TextAnalysis.bigramLm(empty).count() === 0)
    assert(TextAnalysis.redact(empty).count() === 0)
    assert(TextAnalysis.filterPipeline(empty).count() === 0)
    assert(Sampling.packSequences(empty).count() === 0)
    assert(Sampling.stratifiedSample(empty.withColumn("lang", lit("en"))).count() === 0)
    // single-word doc: no bigram, one pack
    assert(TextAnalysis.bigramLm(Seq((1L, "word")).toDF("doc_id", "text")).count() === 0)
    assert(Sampling.packSequences(single).count() === 1)
    // events-shaped ops on an empty events frame
    val emptyEv = Seq.empty[(Long, Long, Long, String, Double)]
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    assert(Events.timeBuckets(emptyEv).count() === 0)
    assert(Events.trailingWindowSum(emptyEv).count() === 0)
    assert(Events.sessionize(emptyEv).count() === 0)
    assert(Relational.argmaxPerGroup(emptyEv).count() === 0)
    assert(Relational.windowNav(emptyEv).count() === 0)
    // embeddings-shaped op on an empty embeddings frame
    val emptyVec = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.dimStats(emptyVec).count() === 0)
  }

  test("round-3-late operators (q82-q89) on empty / degenerate inputs") {
    // documents-shaped
    assert(Dedup.spanDedup(empty).count() === 0)
    assert(Dedup.spanDedup(single).count() === 0) // 4 tokens < n=8 spans
    assert(Dedup.minhashSignatures(empty).count() === 0)
    assert(Dedup.minhashSignatures(single).count() === 1)
    assert(TextAnalysis.lengthBandFilter(empty).count() === 0)
    assert(TextAnalysis.pmiPairs(empty).count() === 0)
    assert(TextAnalysis.pmiPairs(single).count() === 0) // no pair clears minPair=5
    assert(TextAnalysis.lmScore(empty).count() === 0)
    assert(TextAnalysis.lmScore(Seq((1L, "word")).toDF("doc_id", "text")).count() === 0)
    assert(Multimodal.frameSample(spark, empty).count() === 0)
    // a doc whose payload is shorter than one frame drops out
    assert(Multimodal.frameSample(spark, Seq((1L, "tiny")).toDF("doc_id", "text"))
      .count() === 0)
    // events-shaped
    val emptyEv = Seq.empty[(Long, Long, Long, String, Double)]
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    assert(Events.sessionFunnel(emptyEv).count() === 0)
    // embeddings-shaped
    val emptyVec = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.quantizeStats(emptyVec).count() === 0)
  }

  test("round-4 operators (q90-q93) on empty / degenerate inputs") {
    // incremental near-dup: empty corpus, all-old, all-new — no pairs
    assert(Dedup.incrementalNearDup(empty, 10L, 0.9).count() === 0)
    assert(Dedup.incrementalNearDup(single, 10L, 0.9).count() === 0)   // all old
    assert(Dedup.incrementalNearDup(single, 0L, 0.9).count() === 0)    // all new
    // blocked simhash match: empty and single-doc
    assert(Dedup.simhashMatchScale(empty, 3).count() === 0)
    assert(Dedup.simhashMatchScale(single, 3).count() === 0)
    // k-means + semantic dedup on empty embeddings
    val emptyVec = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.kmeansAssign(emptyVec).count() === 0)
    assert(Similarity.semanticDedup(emptyVec, 0.5).count() === 0)
    // one vector: its own canonical singleton cluster, assigned to its
    // own centroid cell (it IS the whole codebook)
    val oneVec = Seq((7L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val km = Similarity.kmeansAssign(oneVec).collect()
    assert(km.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((7L, 7L)))
    val sd = Similarity.semanticDedup(oneVec, 0.5).collect()
    assert(sd.map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSeq ===
      Seq((7L, 7L, true)))
  }

  test("dedup family on empty and single-doc corpora: no pairs, no throw") {
    assert(Dedup.nearDupJaccard(empty, 1000L, 0.5).count() === 0)
    assert(Dedup.minhashNearDup(empty, 0.5).count() === 0)
    assert(Dedup.minhashNearDup(single, 0.5).count() === 0) // no pair with itself
    assert(Dedup.exactDedup(single).collect().map(_.getBoolean(3)).toSeq === Seq(false))
    assert(Dedup.simhash(empty).count() === 0)
  }

  test("round-2 operators on empty/single inputs: well-typed, no throw") {
    assert(TextAnalysis.chunkDocs(empty, 200, 150).count() === 0)
    assert(TextAnalysis.repetitionScore(empty).count() === 0)
    assert(Sampling.hashSplit(empty).count() === 0)
    assert(Dedup.dedupClusters(empty, 1000L, 0.5).count() === 0)
    // single doc: its own (trivial) cluster, canonical
    val solo = Dedup.dedupClusters(single, 1000L, 0.5).collect()
    assert(solo.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq ===
      Seq((1L, 1L, true)))
    // as-of with an empty right side: all left rows kept, asof null
    val l = Seq((1L, 1L, 10L, 1.0)).toDF("event_id", "user_id", "ts", "value")
    val r = Seq.empty[(Long, Long, Long, Double)].toDF("rid", "user_id", "ts", "rv")
    val asof = Events.asofJoin(l, r, "user_id", "ts", Seq("rid", "rv")).collect()
    assert(asof.length === 1 && asof(0).isNullAt(asof(0).fieldIndex("asof_rid")))
    // empty embeddings: ANN paths return empty, not an exception —
    // including the trained-codebook path (Lloyd rounds over nothing)
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.ivfAnn(emptyVecs, 5, 3).count() === 0)
    assert(Similarity.ivfAnn(emptyVecs, 5, 3, iters = 2).count() === 0)
    assert(Similarity.lshAnn(emptyVecs, 5, 3).count() === 0)
    // empty documents: budget mixing returns empty, not an exception
    val emptyDocs = Seq.empty[(Long, String, Long)].toDF("doc_id", "source", "n_chars")
    assert(Sampling.mixBudget(emptyDocs, 4000L).count() === 0)
  }

  test("asof joins: equal timestamps are inclusive both ways; right-side " +
      "ties break to the smallest id (the oracle total order)") {
    // user 1: right rows rid 5 and 3 at ts=100 (a tie), rid 9 at ts=50,
    // rid 7 at ts=200; the left row sits exactly at ts=100.
    val l = Seq((10L, 1L, 100L, 1.0)).toDF("event_id", "user_id", "ts", "value")
    val r = Seq((5L, 1L, 100L, 5.0), (3L, 1L, 100L, 3.0),
        (9L, 1L, 50L, 9.0), (7L, 1L, 200L, 7.0))
      .toDF("rid", "user_id", "ts", "rv")
    // backward "at or before": the equal-ts pair wins over ts=50, and
    // among the tie the SMALLEST rid is picked (partitioning-independent)
    val back = Events.asofJoin(l, r, "user_id", "ts", Seq("rid", "rv")).collect()
    assert(back.length === 1)
    assert(back(0).getAs[Long]("asof_rid") === 3L)
    // forward "at or after": equal-ts rows must be IN the frame (a
    // side-ordering that sorts right rows before the left row would
    // silently exclude them), and the tie again breaks to smallest rid
    val fwd = Events.asofJoinForward(l, r, "user_id", "ts", Seq("rid", "rv")).collect()
    assert(fwd.length === 1)
    assert(fwd(0).getAs[Long]("asof_rid") === 3L)
    // strictly-after works when no equal-ts row exists
    val l2 = Seq((10L, 1L, 150L, 1.0)).toDF("event_id", "user_id", "ts", "value")
    val fwd2 = Events.asofJoinForward(l2, r, "user_id", "ts", Seq("rid", "rv")).collect()
    assert(fwd2(0).getAs[Long]("asof_rid") === 7L)
    val back2 = Events.asofJoin(l2, r, "user_id", "ts", Seq("rid", "rv")).collect()
    assert(back2(0).getAs[Long]("asof_rid") === 3L)
  }

  test("parseWav survives corrupt chunk sizes (high bit set / oversized)") {
    // a valid header whose first chunk declares size 0xFFFFFFF8 — as an
    // Int that is −8 and the chunk walk would loop forever / walk
    // backward; the guard must end the walk and return the sentinel
    val b = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(56)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("junk".getBytes("US-ASCII")).putInt(0xFFFFFFF8)
    assert(Multimodal.parseWav(b.array()) === None)
    // size that simply overruns the buffer: also sentinel, no throw
    val c = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    c.put("RIFF".getBytes("US-ASCII")).putInt(56)
      .put("WAVE".getBytes("US-ASCII"))
    c.put("junk".getBytes("US-ASCII")).putInt(1000000)
    assert(Multimodal.parseWav(c.array()) === None)
  }

  test("lshRecall with an empty exact baseline yields NULL, not a crash") {
    // threshold 1.01 > any Jaccard → n_true = 0 → recall NULL (the
    // oracle's nullif(n_true, 0) twin)
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val row = Dedup.lshRecall(docs, 1000L, 1.01).collect()(0)
    assert(row.getAs[Long]("n_true") === 0L)
    assert(row.isNullAt(row.fieldIndex("recall_micros")))
  }

  test("empty/malformed manifests yield an empty corpus, not an exception") {
    val dir = Files.createTempDirectory("graft_empty")
    for ((name, body) <- Seq(("zero.txt", "0\n"), ("blank.txt", ""), ("junk.txt", "\n\n"))) {
      val manifest = dir.resolve(name)
      Files.writeString(manifest, body)
      val corpus = RawCorpus.fromManifest(spark, manifest.toString)
      assert(corpus.count() === 0, s"manifest $name")
      assert(InvertedIndex.postings(corpus).count() === 0, s"manifest $name")
    }
  }

  test("q176 rides the VARIANT type and agrees with the string JSON path") {
    import org.apache.spark.sql.functions.{col, parse_json}
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // the intermediate really is the binary variant encoding
    val vType = events.select(parse_json(col("props")).as("v")).schema("v").dataType
    assert(vType.typeName.toLowerCase.contains("variant"),
      s"parse_json did not produce a VARIANT: $vType")
    // typed variant extraction ≡ q16's get_json_object string path
    val viaVariant = Events.variantExtract(events)
      .collect().map(_.toString).toList
    val viaString = {
      import org.apache.spark.sql.functions._
      events
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .where(col("k").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"), sum(col("k")).as("sum_k"))
        .orderBy("event_type").collect().map(_.toString).toList
    }
    assert(viaVariant === viaString)
  }

  test("blank manifest line keeps later docs at their manifest positions") {
    val dir = Files.createTempDirectory("graft_blankline")
    def write(name: String, body: String) = {
      Files.writeString(dir.resolve(name), body); dir.resolve(name).toString
    }
    val f1 = write("a.txt", "alpha\n")
    val f3 = write("c.txt", "gamma\n")
    val manifest = write("m.txt", s"3\n$f1\n\n$f3\n")
    val ids = RawCorpus.fromManifest(spark, manifest)
      .select("doc_id").distinct().collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 3L)) // position 2 was blank; c.txt stays id 3
  }
}
