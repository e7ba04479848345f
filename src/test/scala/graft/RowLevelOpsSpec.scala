package graft

import org.apache.spark.sql.functions._

import graft.operators.InvertedIndex
import graft.sources.{GraftCatalog, IndexStore, IndexTextSource}

/** Row-level DML on the graft-index table (SupportsRowLevelOperations,
  * GROUP-BASED copy-on-write where the group is the whole artifact):
  * MERGE INTO, UPDATE, and the DELETEs the metadata path refuses — all
  * through catalog SQL, all republishing via the V2 committer so the
  * artifact stays READY and grammar-sorted after every statement. */
class RowLevelOpsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$testdataDir/documents.parquet")

  private def freshArtifact(evenOnly: Boolean = false): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_rlo").toString
    IndexStore.writeIndexTable(
      InvertedIndex.postingsUnordered(
        if (evenOnly) docs.where(col("doc_id") % 2 === 0) else docs), dir)
    dir
  }

  private var catSeq = 0
  private def cat(dir: String): String = {
    catSeq += 1
    val name = s"graft_rlo$catSeq"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse",
      new java.io.File(dir).getParent)
    s"$name.`${new java.io.File(dir).getName}`"
  }

  private def rows(dir: String) = IndexStore.readIndexTable(spark, dir)
    .orderBy("word").collect().map(_.toString).toList

  test("MERGE INTO syncs the artifact to a source snapshot (upsert + prune)") {
    val dir = freshArtifact(evenOnly = true)
    val tbl = cat(dir)
    InvertedIndex.postingsUnordered(docs)
      .select(col("word"), col("df"),
        col("postings").cast("array<bigint>").as("postings"))
      .createOrReplaceTempView("graft_merge_src")
    spark.sql(
      s"""MERGE INTO $tbl t
         |USING graft_merge_src s
         |ON t.word = s.word
         |WHEN MATCHED THEN UPDATE SET df = s.df, postings = s.postings
         |WHEN NOT MATCHED THEN
         |  INSERT (word, df, postings) VALUES (s.word, s.df, s.postings)
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    // the half-corpus artifact is now the FULL corpus index
    val expect = InvertedIndex.postingsUnordered(docs)
      .select(col("word"), col("df"),
        col("postings").cast("array<bigint>").as("postings"))
      .orderBy("word").collect().map(_.toString).toList
    assert(rows(dir) === expect)
    // the DML republished a sorted, ready artifact: top-N stays legal
    assert(new java.io.File(dir, "_GRAFT_READY").exists)
    assert(new java.io.File(dir, IndexTextSource.SortedMarker).exists)
  }

  test("UPDATE rewrites posting lists; df derives from the new list on read") {
    val dir = freshArtifact()
    val tbl = cat(dir)
    val before = rows(dir)
    spark.sql(
      s"UPDATE $tbl SET postings = array(7L, 9L), df = 2L WHERE word = 'batch'")
    val batch = IndexStore.readIndexTable(spark, dir)
      .where(col("word") === "batch").collect()
    assert(batch.length === 1)
    assert(batch.head.getLong(1) === 2L)
    assert(batch.head.getSeq[Long](2) === Seq(7L, 9L))
    // every other word is untouched
    val after = IndexStore.readIndexTable(spark, dir)
      .where(col("word") =!= "batch")
      .orderBy("word").collect().map(_.toString).toList
    assert(after === before.filterNot(_.contains("[batch,")))
  }

  test("DELETE with a non-word predicate rewrites instead of refusing") {
    val dir = freshArtifact()
    val tbl = cat(dir)
    // a df cutoff that splits the vocabulary (the corpus' df range is
    // scale-dependent, so derive it from the data)
    val dfs = IndexStore.readIndexTable(spark, dir)
      .select("df").distinct().collect().map(_.getLong(0)).sorted
    assert(dfs.length >= 2, "fixture needs at least two distinct df values")
    val cutoff = dfs(dfs.length / 2)
    val keep = IndexStore.readIndexTable(spark, dir)
      .where(col("df") <= cutoff).orderBy("word")
      .collect().map(_.toString).toList
    assert(keep.nonEmpty, "fixture needs rows on both sides of the cutoff")
    spark.sql(s"DELETE FROM $tbl WHERE df > $cutoff")
    assert(rows(dir) === keep)
    assert(new java.io.File(dir, "_GRAFT_READY").exists)
  }

  test("row-level DML preserves retained generations (history survives rewrites)") {
    val dir = freshArtifact(evenOnly = true)
    IndexStore.writeIndexDelta(
      InvertedIndex.postingsUnordered(docs.where(col("doc_id") % 2 === 1)),
      dir, epoch = 1L)
    IndexStore.compact(spark, dir, retainGeneration = true)
    val gen0 = IndexStore.readIndexTable(spark, s"$dir/_gen_0")
      .orderBy("word").collect().map(_.toString).toList
    val tbl = cat(dir)
    spark.sql(s"UPDATE $tbl SET postings = array(1L), df = 1L WHERE word = 'batch'")
    assert(IndexStore.listGenerations(spark, dir) === Seq(0L))
    assert(IndexStore.readIndexTable(spark, s"$dir/_gen_0")
      .orderBy("word").collect().map(_.toString).toList === gen0)
  }

  test("a failed rewrite leaves the artifact intact (all-or-nothing)") {
    val dir = freshArtifact()
    val tbl = cat(dir)
    val before = rows(dir)
    // an UPDATE whose new rows violate the writer's contract (empty
    // word) fails in the write tasks — the commit never runs
    intercept[Exception] {
      spark.sql(s"UPDATE $tbl SET word = '' WHERE word = 'batch'")
    }
    assert(rows(dir) === before)
    assert(new java.io.File(dir, "_GRAFT_READY").exists)
  }
}
