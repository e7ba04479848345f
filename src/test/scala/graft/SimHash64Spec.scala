package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The production-width (64-bit, xxhash64-token) SimHash path. It has
  * no DuckDB oracle — xxhash64 has no cross-engine mirror — so like
  * streaming it is spec-gated: the properties that the oracle pins for
  * the 28-bit family are pinned here directly at width 64. */
class SimHash64Spec extends SparkSpec {
  import spark.implicits._

  def docs = graft.sources.Tables(spark, testdataDir, "documents")
    .where($"doc_id" < 300)

  test("signatures are deterministic and use the full 64-bit range") {
    val a = Dedup.simhash64(docs).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Dedup.simhash64(docs.repartition(7)).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b)) // partitioning-invariant
    // sign bit actually exercised: some signatures negative, some not
    assert(a.exists(_._2 < 0) && a.exists(_._2 >= 0))
  }

  test("blocked match ≡ all-pairs at width 64 (pigeonhole exhaustive)") {
    val blocked = Dedup.simhashMatch64(docs, 3)
    val sigs = Dedup.simhash64(docs)
    val naive = sigs.select($"doc_id".as("doc_a"), $"simhash".as("sh_a"))
      .join(sigs.select($"doc_id".as("doc_b"), $"simhash".as("sh_b")),
        $"doc_a" < $"doc_b")
      .withColumn("dist", bit_count($"sh_a".bitwiseXOR($"sh_b")).cast("long"))
      .where($"dist" <= 3)
      .select("doc_a", "doc_b", "dist")
    assert(blocked.exceptAll(naive).isEmpty)
    assert(naive.exceptAll(blocked).isEmpty)
  }

  test("incremental 64-bit match ≡ the cross-boundary subset of the full match, across a cap sweep") {
    // the q94 exhaustive-blocking law at production width: for every
    // split point, the incremental probe emits exactly the full
    // match's pairs that straddle the boundary (oriented new←old),
    // nothing else — so a daily ingest loses no recall vs a rebuild
    val full = Dedup.simhashMatch64(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    var nonVacuous = 0
    for (cap <- Seq(75L, 150L, 225L)) {
      val inc = Dedup.incrementalSimhashMatch64(docs, cap, 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expected = full.collect {
        case (a, b, d) if a < cap && b >= cap => (b, a, d)
      }
      assert(inc === expected, s"cap=$cap")
      if (expected.nonEmpty) nonVacuous += 1
    }
    assert(nonVacuous >= 2, "cap sweep mostly vacuous on this corpus")
  }

  test("64-bit calibration: near buckets track exact Jaccard, far buckets are the chance tail") {
    // the q276 production-width twin: per Hamming-distance bucket of
    // the blocked candidate pairs, mean EXACT Jaccard. Pin the
    // ordering the audit exists to read: the near-diagonal buckets
    // (dist ≤ maxDist — the pairs the matcher accepts) carry higher
    // mean Jaccard than every far bucket (chance block collisions
    // past the cut), and distance 0 pairs are exact duplicates.
    val cal = Dedup.simhashCalibration64(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cal.nonEmpty)
    val (near, far) = cal.partition(_._1 <= 3)
    assert(near.nonEmpty, "no near-bucket pairs — vacuous")
    // dist-0 pairs are signature-identical — (near-)exact duplicates
    // (identical sets give exactly 1_000_000; a high-Jaccard near-dup
    // CAN tie all 64 bit votes, so pin a floor, not equality)
    cal.find(_._1 == 0L).foreach { case (_, _, mean) =>
      assert(mean >= 900000L, s"distance-0 mean Jaccard $mean")
    }
    if (far.nonEmpty) {
      val worstNear = near.map(_._3).min
      val bestFar = far.map(_._3).max
      assert(worstNear > bestFar,
        s"near-bucket mean Jaccard $worstNear ≤ far-bucket $bestFar")
    }
    // bucket count is bounded by the signature width + 1, never pairs
    assert(cal.length <= 65)
  }

  test("28-bit calibration audit slice: identity at oracle sizes, bounded and deterministic when it binds") {
    import graft.sources.Tables
    val full = Tables(spark, testdataDir, "documents")
    // identity: at ≤ targetDocs docs the slice is the SAME DataFrame,
    // so q276's oracle rows are untouched and the memoized q91 tower
    // is still shared
    val base = Dedup.simhashCalibration(full, 3).collect().toSeq
    spark.conf.set("spark.graft.simhashCalib.targetDocs", "100")
    try {
      // forced binding: stride = ceil(500/100) = 5 → the audit runs on
      // exactly the doc_id % 5 == 0 slice — replayable arithmetic,
      // same relation an engine at any parallelism derives
      val sliced = Dedup.simhashCalibration(full, 3).collect().toSeq
      val manual = Dedup.simhashCalibration(
        full.where($"doc_id" % 5 === 0), 3).collect().toSeq
      assert(sliced === manual)
      assert(sliced.nonEmpty)
      assert(sliced !== base, "forced slice changed nothing — vacuous")
    } finally spark.conf.unset("spark.graft.simhashCalib.targetDocs")
    assert(Dedup.simhashCalibration(full, 3).collect().toSeq === base)
  }

  test("signatures exercise bits above the 28-bit oracle window") {
    // the point of the production path is the extra signature width;
    // pin that bits 28..63 are actually populated. (A cross-width
    // collision-count comparison is deliberately NOT asserted — fewer
    // collisions at width 64 holds in expectation, not pointwise, since
    // the two paths use different token hashes; on another corpus the
    // ordering could flip with no code defect.)
    val sigs = Dedup.simhash64(docs).collect().map(_.getLong(1))
    assert(sigs.exists(s => (s >>> 28) != 0 && (s >>> 28) != (-1L >>> 28)))
  }
}
