package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deterministic corpus sampling / split assignment — LLM-pipeline
  * extension (SURVEY §2.B last row).
  *
  * Train/val/test splits over a 100 TB corpus must be (a) stable across
  * reruns and engines, (b) computable per-row with no shuffle, and
  * (c) stratifiable. Spark's `sample()`/`TABLESAMPLE` are seeded per
  * partition — results change with partitioning — so the production
  * pattern is a content-keyed hash bucket: every row maps to a bucket
  * by a deterministic hash of its key, and split boundaries are bucket
  * ranges. The cross-engine `polyHash` (TextFns) makes the assignment
  * reproducible in DuckDB for the oracle, exactly as it would be
  * reproducible for a downstream consumer in another stack.
  */
object Sampling {

  /** THE cross-engine bucket contract, in one place: cast the id to a
    * string, polyHash it, take the positive remainder. Three operators
    * (q45/q61/q68) and their DuckDB oracle mirrors (`polyHashSql(...) %
    * n`) depend on this exact composition staying bit-identical —
    * change it here or nowhere. */
  private def hashBucket(id: org.apache.spark.sql.Column, buckets: Long) =
    pmod(TextFns.polyHash(id.cast("string")), lit(buckets))

  /** q45 — hash-bucket split assignment: bucket = polyHash(doc_id) mod
    * `buckets`, split = "train" below `trainBuckets`, else "val". A
    * pure per-row projection — no shuffle, no state, order-independent:
    * the same doc lands in the same split at any scale, partitioning,
    * or engine. */
  def hashSplit(docs: DataFrame, buckets: Int = 100, trainBuckets: Int = 90): DataFrame =
    docs
      .select(col("doc_id"),
        hashBucket(col("doc_id"), buckets.toLong).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainBuckets, lit("train")).otherwise(lit("val")))
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")

  /** q259 — SPLIT-LEAKAGE audit: how much of the val split is a
    * near-duplicate of something in train — the eval-hygiene number a
    * pipeline must read before trusting any held-out metric (a hash
    * split is uniform over DOCUMENTS, but near-dup clusters straddle
    * it, and every straddling edge lets the model "see" a val doc at
    * train time; a dedup-before-split pipeline drives this to zero,
    * everyone else ships leakage silently).
    *
    * Composition, not new machinery: the verified LSH edge set (the
    * session-memoized q22/q58 pass — no new candidate generation) has
    * each endpoint labeled with q45's hash-bucket split by two
    * doc-keyed joins; edges whose endpoints disagree are the leaks.
    * Output is the one-row audit: val population, cross-split edges,
    * DISTINCT leaked val docs, and the leak rate in exact micros
    * (`div` ≡ `//` on these nonnegative operands). Row counts at
    * every stage are edge-set-bounded; the split relation is a pure
    * projection (no shuffle). Zero-val-docs degrades to rate 0 under
    * the guarded division rather than an ANSI throw. */
  def splitLeakage(docs: DataFrame, threshold: Double = 0.95,
      buckets: Int = 100, trainBuckets: Int = 90): DataFrame = {
    val split = docs.select(col("doc_id"),
      when(hashBucket(col("doc_id"), buckets.toLong) < trainBuckets,
        lit("train")).otherwise(lit("val")).as("split"))
    val edges = Dedup.minhashNearDup(docs, threshold)
      .select("doc_a", "doc_b")
    val labeled = edges
      .join(split.select(col("doc_id").as("doc_a"),
        col("split").as("split_a")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"),
        col("split").as("split_b")), "doc_b")
    val cross = labeled.where(col("split_a") =!= col("split_b"))
    val leaked = cross
      .select(when(col("split_a") === "val", col("doc_a"))
        .otherwise(col("doc_b")).as("doc_id"))
      .distinct()
    val nVal = broadcast(split.where(col("split") === "val")
      .agg(count(lit(1)).as("n_val_docs")))
    val counts = cross.agg(count(lit(1)).as("n_cross_edges"))
      .crossJoin(broadcast(leaked.agg(count(lit(1)).as("n_leaked_val"))))
    counts.crossJoin(nVal)
      .withColumn("leak_micros", expr(
        "CASE WHEN n_val_docs = 0 THEN 0 " +
          "ELSE n_leaked_val * 1000000 div n_val_docs END"))
      .select("n_val_docs", "n_cross_edges", "n_leaked_val", "leak_micros")
  }

  /** Split-level summary (the sanity check a pipeline runs after
    * assignment): docs and mean bucket per split. */
  def splitStats(docs: DataFrame, buckets: Int = 100, trainBuckets: Int = 90): DataFrame =
    hashSplit(docs, buckets, trainBuckets)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("split")

  /** q68 — sequence packing: assign documents to fixed-token-budget
    * packs (the batch-construction step that feeds a trainer). A
    * GLOBAL greedy pack is inherently sequential (a driver-side scan),
    * so the scalable shape — what real pipelines do — is SHARDED
    * packing: documents hash into `shards` independent streams and
    * each shard packs greedily by running token count (one window per
    * shard, ordered by doc_id). `pack_id` is the pack the document
    * STARTS in: floor((cumsum − n_tok) / budget). Every step is a
    * deterministic integer computation — same packs on any engine or
    * partitioning. */
  def packSequences(docs: DataFrame, budget: Long = 512, shards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    TextFns.tokens(docs)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"))
      .withColumn("shard", hashBucket(col("doc_id"), shards.toLong))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("pack_id", expr(s"(cum - n_tok) div $budget"))
      .select("doc_id", "shard", "n_tok", "pack_id")
      .orderBy("doc_id")
  }

  /** q78 — pack ASSEMBLY: materialize q68's assignment into the actual
    * training sequences — one row per (shard, pack) with the documents
    * concatenated in doc_id order. The concatenation is made
    * deterministic by sorting the collected (doc_id, text) structs
    * before joining (bare collect_list order is partition-dependent);
    * the output carries the pack's md5 and length rather than the full
    * text so the relation stays narrow (the text itself would be the
    * sink's job). One join + one shuffle on the pack key. */
  def assemblePacks(docs: DataFrame, budget: Long = 512, shards: Int = 8): DataFrame =
    packSequences(docs, budget, shards)
      .join(docs.select("doc_id", "text"), Seq("doc_id"))
      .groupBy("shard", "pack_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
            s => s.getField("text")),
          "\n").as("pack_text"))
      .select(col("shard"), col("pack_id"), col("n_docs"), col("n_tokens"),
        length(col("pack_text")).cast("long").as("pack_len"),
        md5(col("pack_text")).as("pack_md5"))
      .orderBy("shard", "pack_id")

  /** q61 — stratified sampling audit: the same deterministic hash
    * bucketing as q45, applied at an equal rate (1/`buckets`) WITHIN
    * each stratum (here `lang`), reported per stratum. Because the
    * bucket is keyed on content (doc_id), not position, every stratum
    * is sampled at the same expected rate with zero coordination — no
    * per-stratum counts, no second pass, no shuffle beyond the final
    * summary aggregation. This is how a 100 TB pipeline draws an
    * audit/eval slice per language. */
  def stratifiedSample(docs: DataFrame, buckets: Int = 10): DataFrame =
    docs
      .select(col("doc_id"), col("lang"),
        (hashBucket(col("doc_id"), buckets.toLong) === 0).cast("long").as("sampled"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("sampled")).as("n_sampled"))
      .withColumn("rate", col("n_sampled").cast("double") / col("n_docs"))
      .orderBy("lang")

  /** q101 — data MIXING to a per-source byte budget: every source keeps
    * documents in deterministic content-hash order until its cumulative
    * `n_chars` passes `budget` — the "sample each source down to its
    * target share" step that composes a training mixture from
    * heterogeneous sources.
    *
    * The cumulative sum is a DISTRIBUTED PREFIX SUM, not a per-source
    * window: a `Window.partitionBy(source)` would put each source's
    * entire corpus in ONE task (the q68 anti-pattern — a web-scale
    * source is most of the data). The hash's VALUE RANGE is cut into
    * `MixShards` contiguous shards (a deterministic column expression —
    * no `spark_partition_id`/`repartitionByRange`, whose sampled
    * boundaries are physical-plan state that two consumers of the same
    * frame are not guaranteed to agree on): cumsum WITHIN each
    * (shard, source) group — ~corpus/MixShards rows each, no source
    * hotspot — then prefix the per-(shard, source) totals, a
    * MixShards×sources-row frame, broadcast back as offsets. Each
    * row's cum depends only on the global (h, doc_id) order, so the
    * result is partitioning-invariant (spec-pinned); the oracle states
    * the plain windowed form — the hash match proves
    * prefix-sum ≡ window. */
  /** q109 — temperature-based domain mixing: per-source sampling rates
    * ∝ size^α (α < 1 upsamples small sources relative to their mass —
    * the standard multilingual/multi-domain mixture rule), applied as
    * a DETERMINISTIC hash gate per document. The audit relation a
    * pipeline materializes before committing a mixture: per source,
    * its mass, computed keep-rate, and how many docs the gate keeps.
    *
    * Determinism across engines: the only libm call (`pow`) is
    * floor-quantized to integer millionths per source, the normalizer
    * is the exact integer SUM of those (a double Σ over sources would
    * be partition-order-dependent), the rate is rounded to 6 dp, and
    * the per-doc gate compares the cross-engine polyHash against
    * rate·P — a pure projection, no shuffle beyond the two bounded
    * aggregations. The rates relation is sources-sized (config-bounded,
    * never corpus) and broadcast. */
  def temperatureMix(docs: DataFrame, alpha: Double = 0.5,
      targetDocs: Long = 300): DataFrame = {
    val stats = docs.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_bytes"))
      .withColumn("pq",
        floor(pow(col("n_bytes").cast("double"), alpha) * 1e6).cast("long"))
    val z = stats.agg(sum(col("pq")).as("zq"))
    val rates = stats.crossJoin(broadcast(z))
      .withColumn("rate", round(least(lit(1.0),
        lit(targetDocs.toDouble) * col("pq") / col("zq") / col("n_docs")), 6))
      .select("source", "n_docs", "n_bytes", "rate")
    docs.select(col("doc_id"), col("source"))
      .withColumn("h", TextFns.polyHash(col("doc_id").cast("string")))
      .join(broadcast(rates), Seq("source"))
      .groupBy("source", "n_docs", "n_bytes", "rate")
      .agg(sum((col("h") < col("rate") * graft.functions.Hashing.P).cast("long"))
        .as("n_kept"))
      .orderBy("source")
  }

  /** q142 — source-concentration audit (Herfindahl–Hirschman index):
    * per language, HHI = Σ shareᵢ² over the source byte shares — the
    * "is this slice dominated by one crawl?" diversity check a mixing
    * pipeline runs before q101/q109 set budgets. ENTIRELY integer,
    * overflow-proof at any byte scale: each source's share is first
    * quantized to micros (bᵢ·10⁶ div total — the ·10⁶ is safe while a
    * source holds < 9·10¹² bytes; beyond that, pre-scale b), then
    * HHI micros = Σ shareᵢ² div 10⁶ (shares ≤ 10⁶ ⟹ Σ share² ≤
    * 10¹²·n_sources, far inside Long). The quantization is part of
    * the DEFINITION, identical in the oracle, so the gate is exact.
    * Two map-side-combinable aggregations + a lang-keyed broadcast of
    * per-lang totals (one row per language). HHI near 10⁶/n_sources
    * means balanced, near 10⁶ means one crawl dominates. */
  def sourceConcentration(docs: DataFrame): DataFrame = {
    val bySrc = docs.groupBy("lang", "source")
      .agg(sum(col("n_chars")).as("b"))
    val totals = bySrc.groupBy("lang")
      .agg(count(lit(1)).as("n_sources"), sum(col("b")).as("total"))
    bySrc.join(broadcast(totals), Seq("lang"))
      .withColumn("share", expr("b * 1000000 div total"))
      .groupBy("lang", "n_sources", "total")
      .agg(expr("CAST(sum(share * share) div 1000000 AS BIGINT)").as("hhi_micros"))
      .select(col("lang"), col("n_sources"),
        col("total").cast("long").as("total_bytes"), col("hhi_micros"))
      .orderBy("lang")
  }

  val MixShards = 32

  def mixBudget(docs: DataFrame, budget: Long): DataFrame = {
    val shardWidth = graft.functions.Hashing.P / MixShards + 1
    val keyed = docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("h", TextFns.polyHash(col("doc_id").cast("string")))
      .withColumn("pid", floor(col("h") / shardWidth).cast("int"))
    val wIn = Window.partitionBy(col("pid"), col("source"))
      .orderBy(col("h"), col("doc_id"))
    val within = keyed.withColumn("cum_in", sum(col("n_chars")).over(wIn))
    val wOff = Window.partitionBy(col("source")).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("pid"), col("source"))
      .agg(sum(col("n_chars")).as("psum"))
      .withColumn("offset", coalesce(sum(col("psum")).over(wOff), lit(0L)))
      .select(col("pid"), col("source"), col("offset"))
    within.join(broadcast(offsets), Seq("pid", "source"))
      .withColumn("cum", col("cum_in") + col("offset"))
      .where(col("cum") <= budget)
      .select(col("doc_id"), col("source"), col("n_chars"), col("cum"))
      .orderBy("source", "cum", "doc_id")
  }

  /** q198 — WEIGHTED sampling without replacement (Efraimidis–
    * Spirakis A-Res): every record gets key = ln(u)/w for a uniform
    * u ∈ (0,1) and weight w > 0; the k LARGEST keys are a weighted
    * sample without replacement — each doc's inclusion probability
    * proportional to its weight (here `n_chars`: the byte-budget
    * sampling a mixing pipeline applies when longer documents should
    * carry proportionally more mass). The twist that makes it an
    * ENGINE operator: u is not `rand()` (partitioning-dependent,
    * un-oracle-able) but a hash-derived rational —
    * `(polyHash(doc_id) mod M + 1)/(M+2)` — so the sample is a pure
    * deterministic projection, reproducible across engines, runs, and
    * partitionings (the q45 discipline applied to weighted sampling);
    * re-keying by a salt string would re-draw it. The ln-key is
    * floor-quantized to 1e-9 (the shared libm-ulp fence) and the
    * selection is one TakeOrdered — a per-partition k-heap, no
    * shuffle, no sort of the corpus at any scale. */
  def weightedSample(docs: DataFrame, k: Int = 50): DataFrame = {
    val M = 1000003L
    val u = (pmod(TextFns.polyHash(col("doc_id").cast("string")), lit(M)) + 1L)
      .cast("double") / lit((M + 2).toDouble)
    docs
      .where(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"),
        floor(log(u) / col("n_chars") * 1e9).cast("long").as("key_q"))
      .orderBy(col("key_q").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Order-preserving hash-bucket width for [[quotaSplit]]: polyHash
    * values live in [0, P) with P = 1e9+7, so `h div 2^18` yields
    * ~3,815 contiguous buckets — bounded regardless of corpus size,
    * and a monotone PREFIX of the (h, doc_id) order, which is what
    * makes the blocked selection below ≡ the naive global rank. */
  private val QuotaBucketWidth = 262144L

  /** q234 — EXACT per-stratum quota split: each `lang` contributes
    * precisely `floor(n_lang · pct / 100)` documents to train (the
    * eval-set contract q45's bucket split cannot make — hash buckets
    * give the rate in expectation only, and a small stratum can miss
    * its quota by enough to skew per-language eval).
    *
    * The naive shape is `row_number() OVER (PARTITION BY lang ORDER BY
    * h, doc_id) <= quota` — one task per stratum sorting the whole
    * stratum (the q68/q148 single-task-window trap; a web-scale lang
    * is most of the corpus). The scale shape here is two-level
    * selection over an order-preserving bucket histogram:
    *
    *  1. per-(lang, bucket) counts — BOUNDED (langs × ~3.8k buckets),
    *     one map-side-combinable aggregation of the corpus;
    *  2. cumulative counts per lang over that bounded relation (a
    *     window over thousands of rows, never the corpus) find each
    *     stratum's BOUNDARY bucket — every earlier bucket is entirely
    *     train, every later one entirely val;
    *  3. docs join the broadcast boundary relation: non-boundary rows
    *     decide row-locally (zero shuffle); only the ~n/3.8k boundary-
    *     bucket rows per lang are ranked — a window PARTITIONED BY
    *     (lang, bucket), so its partitions shrink WITH the bucket
    *     count, never a whole stratum in one task.
    *
    * Because bucket = h div 2^18 is a monotone prefix of the (h,
    * doc_id) order, (bucket, then h, doc_id within the boundary) is
    * EXACTLY the naive global order — the oracle states the naive
    * windowed form and the driver hash match proves blocked ≡ naive
    * (the q22/q91/q217 blocking law applied to split assignment). */
  def quotaSplit(docs: DataFrame, pctTrain: Int = 80): DataFrame = {
    val keyed = docs.select(col("doc_id"), col("lang"),
        TextFns.polyHash(col("doc_id").cast("string")).as("h"))
      .withColumn("bucket", expr(s"h div $QuotaBucketWidth"))
    val hist = keyed.groupBy("lang", "bucket").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("lang").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bounds = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .join(hist.groupBy("lang").agg(sum(col("cnt")).as("n")), "lang")
      .withColumn("quota", expr(s"n * $pctTrain div 100"))
      .select(col("lang"), col("bucket"), col("cum"),
        (col("cum") - col("cnt")).as("cb"), col("quota"))
    val tagged = keyed.join(broadcast(bounds), Seq("lang", "bucket"))
    val sure = tagged
      .where(col("cum") <= col("quota") || col("cb") >= col("quota"))
      .select(col("doc_id"), col("lang"),
        when(col("cum") <= col("quota"), lit("train"))
          .otherwise(lit("val")).as("split"))
    val edgeW = Window.partitionBy("lang", "bucket").orderBy("h", "doc_id")
    val edge = tagged
      .where(col("cb") < col("quota") && col("quota") < col("cum"))
      .withColumn("rk", row_number().over(edgeW))
      .select(col("doc_id"), col("lang"),
        when(col("rk") <= col("quota") - col("cb"), lit("train"))
          .otherwise(lit("val")).as("split"))
    sure.unionByName(edge).orderBy("doc_id")
  }
}
