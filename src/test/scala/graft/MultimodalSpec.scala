package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq((1L, "abc"), (2L, ""), (3L, "zz")).toDF("doc_id", "text")

  test("media table: opaque binary + typed metadata struct") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("media").dataType.typeName === "binary")
    val meta = m.where($"doc_id" === 1).select("meta.mime", "meta.n_bytes").collect()(0)
    assert(meta.getString(0) === "text/plain")
    assert(meta.getLong(1) === 3L)
  }

  test("stubbed decode: deterministic features, batch plumbing intact") {
    val f = Multimodal.mediaFeatures(spark, docs, batchSize = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // byte_sum('abc') = 97+98+99 = 294; empty payload decodes to zeros
    assert(f === List((1L, 3L, 294L), (2L, 0L, 0L), (3L, 2L, 244L)))
  }
}
