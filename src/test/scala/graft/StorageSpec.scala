package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.InvertedIndex
import graft.sources.{IndexStore, Tables}

/** Storage-layer scale techniques: persisted partition-pruned index,
  * bucketed co-located joins, JSON source round-trip. */
class StorageSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("persisted index: lookups partition-prune to one letter") {
    val out = Files.createTempDirectory("graft_index_store").toString
    val docs = Tables(spark, dir, "documents")
    IndexStore.save(docs, out)
    val index = IndexStore.load(spark, out)
    // value parity with the in-memory pipeline
    val direct = InvertedIndex.postings(docs)
      .where($"word" === "batch").collect()(0).getSeq[Long](2)
    val stored = IndexStore.lookup(index, "batch").collect()(0).getSeq[Long](2)
    assert(stored === direct)
    // the scan must prune on the letter partition column
    val plan = IndexStore.lookup(index, "batch")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("letter"),
      s"expected letter partition pruning in:\n$plan")
    val docsWith = IndexStore.docsWith(index, "batch").collect().map(_.getLong(0))
    assert(docsWith.toSeq === docsWith.toSeq.sorted && docsWith.nonEmpty)
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a temp dir set at session build (SparkSpec)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Tables(spark, dir, "lineitem")
        .write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables(spark, dir, "orders")
        .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // bucketing co-locates both sides: the JOIN itself needs no
      // exchange (the single remaining shuffle is the final groupBy)
      assert(shuffles.length <= 1, s"unexpected shuffles: $shuffles")
      assert(joined.collect().map(_.getLong(1)).sum === 6000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("json source round-trips the documents table") {
    val out = Files.createTempDirectory("graft_json").toString + "/docs"
    val docs = Tables(spark, dir, "documents")
    docs.write.mode("overwrite").json(out)
    val back = spark.read.json(out)
    assert(back.count() === docs.count())
    val row = back.where($"doc_id" === 7).select("text", "lang").collect()(0)
    val orig = docs.where($"doc_id" === 7).select("text", "lang").collect()(0)
    assert(row === orig)
  }

  test("csv source round-trips the documents table (quoted free text)") {
    val out = Files.createTempDirectory("graft_csv").toString + "/docs"
    val docs = Tables(spark, dir, "documents")
    docs.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").schema(docs.schema).csv(out)
    assert(back.count() === docs.count())
    val row = back.where($"doc_id" === 7).select("text", "lang").collect()(0)
    val orig = docs.where($"doc_id" === 7).select("text", "lang").collect()(0)
    assert(row === orig)
    // the whole index pipeline must agree across source formats
    val viaCsv = InvertedIndex.postings(back).collect().map(_.toString).toSeq
    val viaParquet = InvertedIndex.postings(docs).collect().map(_.toString).toSeq
    assert(viaCsv === viaParquet)
  }

  test("sidecar-served tables equal their parquet originals, µs intact") {
    import graft.operators.{Events, Relational}
    import graft.sources.Sidecar
    val viaCsv = Relational.lineitemProfile(Sidecar.csv(spark, dir, "lineitem"))
      .collect().map(_.toString).toList
    val viaPq = Relational.lineitemProfile(Tables(spark, dir, "lineitem"))
      .collect().map(_.toString).toList
    assert(viaCsv === viaPq)
    val jsonProf = Events.typeProfile(Sidecar.jsonl(spark, dir, "events"))
      .collect()
    val pqProf = Events.typeProfile(Tables(spark, dir, "events")).collect()
    assert(jsonProf.map(_.toString).toList === pqProf.map(_.toString).toList)
    // the fidelity tripwire must be armed: at least one gated min/max
    // epoch-µs value carries sub-millisecond digits, so a reader that
    // fell back to the default millis text pattern COULD NOT pass
    assert(pqProf.exists(r => r.getLong(4) % 1000 != 0 || r.getLong(5) % 1000 != 0),
      "all gated timestamps are millis-round — the µs tripwire is vacuous")
  }

  test("xml sidecar serves the parquet documents byte-identically") {
    import graft.operators.TextAnalysis
    import graft.sources.Sidecar
    val viaXml = TextAnalysis.docProfile(Sidecar.xml(spark, dir, "documents"))
      .collect().map(_.toString).toList
    val viaPq = TextAnalysis.docProfile(Tables(spark, dir, "documents"))
      .collect().map(_.toString).toList
    assert(viaXml === viaPq)
    assert(viaXml.nonEmpty)
  }

  test("xml sidecar round-trips events timestamps at µs precision") {
    import graft.operators.Events
    import graft.sources.Sidecar
    val viaXml = Events.typeProfile(Sidecar.xml(spark, dir, "events"))
      .collect().map(_.toString).toList
    val viaPq = Events.typeProfile(Tables(spark, dir, "events"))
      .collect().map(_.toString).toList
    assert(viaXml === viaPq)
  }

  test("xml round-trip survives markup-hostile text under the sidecar options") {
    import spark.implicits._
    // the characters the XML writer must escape (& < > " ') plus
    // embedded newlines and leading/trailing whitespace the reader's
    // DEFAULT would trim (ignoreSurroundingSpaces defaults true —
    // the sidecar pins it false). \r excluded: XML 1.0 parsers
    // normalize line endings, a documented format limit, not a bug.
    val nasty = Seq(
      (1L, "a & b < c > d \"quoted\" 'single'"),
      (2L, "  leading and trailing  "),
      (3L, "line one\nline two\n\ttabbed"),
      (4L, "unicode: é中文 ☃"),
      (5L, "<tag>looks like markup</tag> &amp; entity-shaped"))
      .toDF("doc_id", "text")
    // the empty string is the classic text-format trap (an empty
    // element CAN read back as NULL under default options); under the
    // sidecar's pinned ignoreSurroundingSpaces=false it round-trips
    // intact — asserted as row 6 so a future option or Spark-version
    // drift that silently nulls it fails HERE, not via downstream
    // NULL-skipping aggregates
    val withEmpty = nasty.unionByName(Seq((6L, "")).toDF("doc_id", "text"))
    val out = java.nio.file.Files
      .createTempDirectory("graft_xml_rt").toString + "/docs"
    withEmpty.write.option("rowTag", "row").xml(out)
    val back = spark.read
      .option("rowTag", "row")
      .option("ignoreSurroundingSpaces", "false")
      .schema(nasty.schema)
      .xml(out)
    val got = back.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toList
    val want = withEmpty.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toList
    assert(got === want)
  }

  test("orc sidecar serves orders with µs-exact NTZ timestamps") {
    import graft.operators.Relational
    import graft.sources.Sidecar
    val viaOrc = Relational.ordersProfile(Sidecar.orc(spark, dir, "orders"))
      .collect().map(_.toString).toList
    val viaPq = Relational.ordersProfile(Tables(spark, dir, "orders"))
      .collect().map(_.toString).toList
    assert(viaOrc === viaPq)
    assert(viaOrc.nonEmpty)
  }

  test("avro sidecar serves the parquet documents byte-identically") {
    // same content gate as the XML twin — Avro strings are
    // length-prefixed, never escaped, so EVERY markup-hostile case
    // (entities, newlines, surrounding whitespace, empty string) must
    // survive with no option pinning at all
    import graft.operators.TextAnalysis
    import graft.sources.Sidecar
    val viaAvro = TextAnalysis.docProfile(Sidecar.avro(spark, dir, "documents"))
      .collect().map(_.toString).toList
    val viaPq = TextAnalysis.docProfile(Tables(spark, dir, "documents"))
      .collect().map(_.toString).toList
    assert(viaAvro === viaPq)
    assert(viaAvro.nonEmpty)
  }

  test("dynamic partition overwrite backfills one day without touching others") {
    // the standard incremental-backfill pattern at 100 TB: rewrite ONE
    // date partition in place; static overwrite mode would drop ALL
    // partitions first
    val out = Files.createTempDirectory("graft_dyn").toString + "/events"
    val days = Seq((1L, "day01", 1.0), (2L, "day02", 2.0))
      .toDF("event_id", "day", "value")
    days.write.partitionBy("day").parquet(out)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((3L, "day02", 9.0)).toDF("event_id", "day", "value")
        .write.mode("overwrite").partitionBy("day").parquet(out)
      val back = spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getString(2), r.getDouble(1))).toSet
      // day 1 intact, day 2 replaced by the backfill
      assert(back === Set((1L, "day01", 1.0), (3L, "day02", 9.0)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  test("file-based streaming source feeds the incremental index (readStream)") {
    // MemoryStream covers the transform logic (StreamingSpec); this
    // drives the REAL file source path: readStream over a parquet
    // directory, new files = new micro-batches.
    val stage = Files.createTempDirectory("graft_stream_src").toString
    val docs = Tables(spark, dir, "documents").limit(50)
      .withColumn("ingest_ts", lit(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .select("doc_id", "text", "ingest_ts")
    docs.write.mode("overwrite").parquet(stage)
    val streamed = spark.readStream.schema(docs.schema).parquet(stage)
    val q = graft.streaming.EventStreams.streamingPostings(streamed)
      .writeStream.format("memory").queryName("fidx").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("fidx").collect()
        .map(r => (r.getString(0), r.getSeq[Long](1).toList)).toSet
      val batch = InvertedIndex.postings(docs.drop("ingest_ts")).collect()
        .map(r => (r.getString(0), r.getSeq[Long](2).toList)).toSet
      assert(got === batch)
    } finally q.stop()
  }

  test("parquet schema evolution: mergeSchema reads old + new epochs as one table") {
    import spark.implicits._
    // the lake-evolution story: an early epoch wrote (doc_id, text);
    // a later epoch added a quality column. mergeSchema=true serves
    // the UNION schema with nulls for the old files — no rewrite of
    // history, which at 100 TB is the difference between a config
    // flag and a petabyte backfill.
    val root = Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "old doc")).toDF("doc_id", "text")
      .write.parquet(s"$root/epoch=0")
    Seq((2L, "new doc", 0.9)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$root/epoch=1")
    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.sorted.toList ===
      List("doc_id", "epoch", "quality", "text"))
    val rows = merged.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toList
    assert(rows === List((1L, "old doc", -1.0), (2L, "new doc", 0.9)))
    // the old epoch genuinely lacks the column (so the union schema
    // above was mergeSchema's work, not a property of the files) —
    // and a plain read of it can never surface `quality`
    val oldOnly = spark.read.parquet(s"$root/epoch=0")
    assert(!oldOnly.columns.contains("quality"))
    assert(oldOnly.columns.sorted.toList === List("doc_id", "text"))
  }

  test("q222 evolved sidecar: NULL lang exactly on gen0, reversed layout never shears") {
    // the gated two-generation layout (the oracle checks aggregate
    // tripwires; this pins the ROW-LEVEL semantics): gen0 = even ids
    // written without `lang` and with the physical column order
    // REVERSED — resolution must be by name, values must not shear
    val docs = Tables(spark, dir, "documents")
    val merged = graft.sources.Sidecar.evolvedDocuments(spark, dir)
    assert(merged.count() === docs.count())
    val joined = merged.alias("m")
      .join(docs.alias("o"), col("m.doc_id") === col("o.doc_id"))
      .select(col("m.doc_id"), col("m.lang").as("m_lang"),
        col("o.lang").as("o_lang"), col("m.text").as("m_text"),
        col("o.text").as("o_text"), col("m.n_chars").as("m_nc"),
        col("o.n_chars").as("o_nc"))
      .collect()
    assert(joined.length === docs.count())
    joined.foreach { r =>
      val id = r.getLong(0)
      if (id % 2 == 0) assert(r.isNullAt(1), s"gen0 doc $id must have NULL lang")
      else assert(r.getString(1) === r.getString(2), s"gen1 doc $id lang drifted")
      // value shear under the reversed gen0 layout would swap columns
      assert(r.getString(3) === r.getString(4), s"doc $id text sheared")
      assert(r.getLong(5) === r.getLong(6), s"doc $id n_chars sheared")
    }
    // the gen0 files GENUINELY lack the column and carry the reversed
    // physical order (so the merge above was by-name reconciliation,
    // not a property of identical files)
    val out = merged.inputFiles.map(_.replaceAll("/[^/]*$", ""))
      .distinct.filter(_.endsWith("gen0")).head
    val gen0 = spark.read.parquet(out)
    assert(!gen0.columns.contains("lang"))
    assert(gen0.columns.toList === docs.columns.filterNot(_ == "lang").reverse.toList)
  }

  test("Trigger.AvailableNow drains the backlog and terminates itself") {
    // the BACKFILL trigger: one invocation processes everything
    // available, then stops — streaming exactly-once semantics with
    // batch-job scheduling (the mode a 100 TB catch-up run uses; a
    // continuous trigger would hold the cluster forever, a plain batch
    // read would lose the source's exactly-once bookkeeping).
    val stage = Files.createTempDirectory("graft_avnow_src").toString
    val docs = Tables(spark, dir, "documents").limit(40)
      .select("doc_id", "text")
    docs.write.mode("overwrite").parquet(stage)
    val streamed = spark.readStream.schema(docs.schema).parquet(stage)
    val q = streamed.groupBy().count()
      .writeStream.format("memory").queryName("avnow")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // no stop(): AvailableNow must terminate on its own
    assert(q.awaitTermination(60000),
      "AvailableNow query must self-terminate after draining")
    assert(spark.table("avnow").collect().map(_.getLong(0)).toList ===
      List(40L))
  }
}
