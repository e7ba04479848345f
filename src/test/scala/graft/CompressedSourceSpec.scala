package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.{Sidecar, Tables}

/** Compressed ingestion (q255/q256): content fidelity through the
  * codec round trips, plus the SCALE property the surface exists to
  * pin — gzip is unsplittable (one .gz file = one input task), so
  * parallelism must come from the file boundary, while parquet stays
  * splittable under any codec because compression happens per column
  * chunk inside row groups.
  *
  * The split assertions run under a tiny
  * `spark.sql.files.maxPartitionBytes` — at the default 128 MB this
  * corpus packs into one partition whatever the layout, and the
  * trap/restore pair would be vacuous both ways. */
class CompressedSourceSpec extends SparkSpec {
  private val dir = testdataDir

  private def profile(df: DataFrame): List[String] =
    TextAnalysis.docProfile(df).collect().map(_.toString).toList

  /** Run `body` with file-split planning forced fine-grained. */
  private def smallSplits[A](body: => A): A = {
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try body finally {
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
      spark.conf.unset("spark.sql.files.openCostInBytes")
    }
  }

  test("gz jsonl sidecar: content ≡ parquet; files are genuine gzip members") {
    val viaGz = profile(Sidecar.gzJsonl(spark, dir, "documents"))
    val viaPq = profile(Tables(spark, dir, "documents"))
    assert(viaGz === viaPq)
    assert(viaGz.nonEmpty)
    // the copy is REALLY gzip (magic bytes), not a renamed plain file
    val files = Sidecar.gzJsonl(spark, dir, "documents")
      .select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.forall(_.endsWith(".gz")))
    val first = java.nio.file.Paths.get(new java.net.URI(files.head))
    val magic = java.nio.file.Files.newInputStream(first)
    try {
      assert(magic.read() === 0x1f && magic.read() === 0x8b,
        "file lacks the gzip magic — the codec option silently no-opped")
    } finally magic.close()
  }

  test("zstd parquet sidecar: content ≡ parquet; codec recorded as ZSTD") {
    val served = Sidecar.zstdParquet(spark, dir, "documents")
    assert(profile(served) === profile(Tables(spark, dir, "documents")))
    // the footer must actually record zstd column chunks
    val file = served.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).head
    val meta = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file),
        spark.sparkContext.hadoopConfiguration)).getFooter
    val codecs = meta.getBlocks.get(0).getColumns.asInstanceOf[
      java.util.List[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]]
    assert((0 until codecs.size()).forall(
      i => codecs.get(i).getCodec.toString == "ZSTD"))
  }

  test("gzip split behavior: multi-file layout fans out, single-file is ONE task") {
    smallSplits {
      // the q255 layout: 8 gzip members → 8 schedulable tasks even
      // though no single member can split
      val multi = Sidecar.gzJsonl(spark, dir, "documents")
      val nFiles = multi.select(input_file_name()).distinct().count()
      assert(nFiles > 1, "sidecar did not produce a multi-file layout")
      val nTasks = multi.queryExecution.toRdd.getNumPartitions
      assert(nTasks > 1,
        s"multi-file gz layout planned $nTasks task(s) — parallelism lost")
      // the TRAP, measured: one gz file far above maxPartitionBytes
      // still plans exactly one task — a 100 GB dump would serialize
      // the whole scan behind one core
      val docs = Tables(spark, dir, "documents")
      val out = java.nio.file.Files
        .createTempDirectory("graft_gz_one").toString + "/one"
      docs.coalesce(1).write.option("compression", "gzip").json(out)
      val one = spark.read.schema(docs.schema).json(out)
      val oneBytes = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".gz")).map(_.length()).sum
      assert(oneBytes > 4096, "trap file under maxPartitionBytes — vacuous")
      assert(one.queryExecution.toRdd.getNumPartitions === 1,
        "a single gzip member must plan exactly one input task")
      assert(profile(one) === profile(docs))
    }
  }

  test("gz member count is size-targeted: parts track source bytes into the member band") {
    // the derivation rule: ceil(bytes/target) with the multi-file floor
    assert(Sidecar.gzParts(0L, 1000L) === Sidecar.MinGzParts)
    assert(Sidecar.gzParts(7999L, 1000L) === Sidecar.MinGzParts)
    assert(Sidecar.gzParts(8001L, 1000L) === 9)
    assert(Sidecar.gzParts(100L << 20,
      Sidecar.DefaultGzTargetMemberBytes) === Sidecar.MinGzParts)
    // 100 TB with the default 128 MB rule: parts grow with the corpus
    // so MEMBERS don't — a fixed parts=8 would make 12.5 TB members
    assert(Sidecar.gzParts(100L << 40,
      Sidecar.DefaultGzTargetMemberBytes) === 819200)
    // a materialized landing zone under a small target: the count
    // follows the rule and member sizes land in the band around the
    // target (the parquet-size estimate carries encoding slack — the
    // band, not byte equality, is the contract)
    val tiny = 4096L
    val srcBytes = Sidecar.sourceBytes(s"$dir/documents.parquet")
    val expect = Sidecar.gzParts(srcBytes, tiny)
    assert(expect > Sidecar.MinGzParts,
      s"corpus too small ($srcBytes B) to exercise the size-targeted path")
    spark.conf.set("spark.graft.gzTargetMemberBytes", tiny.toString)
    try {
      val served = Sidecar.gzJsonl(spark, dir, "documents")
      val files = served.select(input_file_name()).distinct()
        .collect().map(_.getString(0))
      assert(files.length === expect,
        s"expected $expect members for $srcBytes B at $tiny B/member, got ${files.length}")
      val sizes = files.map(f =>
        new java.io.File(new java.net.URI(f)).length())
      assert(sizes.max <= 4L * tiny,
        s"member band broken: max ${sizes.max} B vs target $tiny B")
      assert(sizes.sum / sizes.length >= tiny / 8,
        s"members collapsed far below the target band: mean ${sizes.sum / sizes.length} B")
      // content fidelity is untouched by the layout change
      assert(profile(served) === profile(Tables(spark, dir, "documents")))
      // the EXPLICIT-target surface (gzJsonlSized — a distinct name, so
      // a stale positional `parts` call can't silently become a byte
      // target) derives the same member count for the same target
      val explicit = Sidecar.gzJsonlSized(spark, dir, "documents", tiny)
      assert(explicit.select(input_file_name()).distinct().count()
        === expect.toLong)
    } finally spark.conf.unset("spark.graft.gzTargetMemberBytes")
  }

  test("gz jsonl round-trips events timestamps at µs precision") {
    // the µs fidelity tripwire through the compressed text path: the
    // same discipline StorageSpec pins for plain CSV/JSON — a reader
    // falling back to the default millis pattern could not pass
    import graft.operators.Events
    val viaGz = Events.typeProfile(Sidecar.gzJsonl(spark, dir, "events"))
      .collect().map(_.toString).toList
    val viaPq = Events.typeProfile(Tables(spark, dir, "events"))
      .collect().map(_.toString).toList
    assert(viaGz === viaPq)
    assert(viaGz.nonEmpty)
  }

  test("gz jsonl landing zone tails as a STREAM: new members = new micro-batches") {
    import org.apache.spark.sql.functions.lit
    // real corpora land as .jsonl.gz waves; readStream over the
    // directory must tail them (Spark's file source decodes gzip
    // transparently), each new member a new micro-batch, stream ≡
    // batch at every point — the q255 surface closed at stream time
    val stage = java.nio.file.Files
      .createTempDirectory("graft_gz_stream").toString
    val docs = Tables(spark, dir, "documents").limit(60)
      .withColumn("ingest_ts",
        lit(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .select("doc_id", "text", "ingest_ts")
    val wave1 = docs.where(col("doc_id") < 30)
    val wave2 = docs.where(col("doc_id") >= 30)
    def land(w: org.apache.spark.sql.DataFrame): Unit =
      w.coalesce(1).write.mode("append")
        .option("compression", "gzip")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(stage)
    land(wave1)
    // the landing zone really is compressed members
    assert(new java.io.File(stage).listFiles()
      .filter(_.getName.startsWith("part-")).forall(_.getName.endsWith(".gz")))
    val streamed = spark.readStream.schema(docs.schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .json(stage)
    def batchPostings(w: org.apache.spark.sql.DataFrame) =
      graft.operators.InvertedIndex.postings(w.drop("ingest_ts")).collect()
        .map(r => (r.getString(0), r.getSeq[Long](2).toList)).toSet
    val q = graft.streaming.EventStreams.streamingPostings(streamed)
      .writeStream.format("memory").queryName("gzidx")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      def got() = spark.table("gzidx").collect()
        .map(r => (r.getString(0), r.getSeq[Long](1).toList)).toSet
      assert(got() === batchPostings(wave1))
      // the second wave lands as another gz member: a NEW micro-batch
      // must pick it up and converge to the full-corpus index
      land(wave2)
      q.processAllAvailable()
      assert(got() === batchPostings(docs))
    } finally q.stop()
  }

  test("zstd parquet splits at planning grain — the codec never pins the task count") {
    smallSplits {
      val served = Sidecar.zstdParquet(spark, dir, "documents")
      val nTasks = served.queryExecution.toRdd.getNumPartitions
      assert(nTasks > 1,
        s"zstd parquet planned $nTasks task(s) under 4 KB splits — " +
          "the codec is constraining split points")
    }
  }
}
