package graft

import org.apache.spark.sql.functions._

import graft.operators.InvertedIndex
import graft.sources.{GraftCatalog, IndexStore}

/** The graft TableCatalog (graft.sources.GraftCatalog): a warehouse of
  * R16 index artifacts plugged into Spark's catalog resolution — named
  * SQL access, SHOW TABLES, CTAS through the V2 writer, DROP/RENAME —
  * with every scan pushdown behavior intact through the catalog path. */
class CatalogSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$testdataDir/documents.parquet")
  private lazy val warehouse = {
    val w = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val idx = IndexStore.textIndexFor(spark, testdataDir)
    // register the artifact as table `idx` by linking it into the
    // warehouse (same filesystem: a copy would do equally)
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(w, "idx"), java.nio.file.Paths.get(idx))
    spark.conf.set("spark.sql.catalog.graft_wh", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_wh.warehouse", w)
    w
  }

  test("named SQL access resolves through the catalog, pushdown intact") {
    warehouse
    val got = spark.sql(
      "SELECT word, df FROM graft_wh.idx WHERE word = 'batch'").collect()
    val expect = InvertedIndex.postingsUnordered(docs)
      .where(col("word") === "batch").select("word", "df").collect()
    assert(got.map(_.toString).sorted === expect.map(_.toString).sorted)
    // the word predicate still prunes letter files through the catalog
    val plan = spark.sql(
      "SELECT word, df FROM graft_wh.idx WHERE word = 'batch'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft-index") && plan.contains("PushedFilters"),
      s"catalog path lost the custom scan:\n$plan")
  }

  test("SHOW TABLES lists the artifact; a non-table dir is not listed") {
    warehouse
    new java.io.File(warehouse, "not_a_table").mkdirs()
    val names = spark.sql("SHOW TABLES IN graft_wh")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(names.contains("idx"), s"missing idx in $names")
    assert(!names.contains("not_a_table"), s"junk dir listed: $names")
  }

  test("CTAS through the catalog: V2 writer, readable back, droppable") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS graft_wh.ctas_idx")
    spark.sql(
      """CREATE TABLE graft_wh.ctas_idx AS
        |SELECT word, df, postings FROM graft_wh.idx WHERE word LIKE 'b%'
        |""".stripMargin)
    val back = spark.sql(
      "SELECT word, df FROM graft_wh.ctas_idx ORDER BY word").collect()
    val expect = spark.sql(
      "SELECT word, df FROM graft_wh.idx WHERE word LIKE 'b%' ORDER BY word")
      .collect()
    assert(back.map(_.toString).toSeq === expect.map(_.toString).toSeq)
    // the write's RequiresDistributionAndOrdering sorts EVERY insert
    // path, so even a CTAS artifact earns the sorted marker …
    assert(new java.io.File(s"$warehouse/ctas_idx/_GRAFT_SORTED").exists(),
      "CTAS artifact missing the sorted marker")
    // … and its top-N answers match the source table's
    val top = spark.sql(
      "SELECT word FROM graft_wh.ctas_idx ORDER BY df DESC, word LIMIT 3")
      .collect().map(_.getString(0)).toSeq
    val topExpect = spark.sql(
      "SELECT word FROM graft_wh.idx WHERE word LIKE 'b%' ORDER BY df DESC, word LIMIT 3")
      .collect().map(_.getString(0)).toSeq
    assert(top === topExpect)
    spark.sql("DROP TABLE graft_wh.ctas_idx")
    assert(!new java.io.File(s"$warehouse/ctas_idx").exists())
    assert(intercept[Exception](
      spark.sql("SELECT * FROM graft_wh.ctas_idx").collect())
      .getMessage.toLowerCase.contains("table"))
  }

  test("RENAME moves the artifact directory") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS graft_wh.rn_a")
    spark.sql("DROP TABLE IF EXISTS graft_wh.rn_b")
    spark.sql(
      "CREATE TABLE graft_wh.rn_a AS SELECT word, df, postings FROM graft_wh.idx LIMIT 5")
    // the destination is resolved inside the same catalog — an
    // unqualified name keeps it in the warehouse root
    spark.sql("ALTER TABLE graft_wh.rn_a RENAME TO rn_b")
    assert(!new java.io.File(s"$warehouse/rn_a").exists())
    assert(spark.sql("SELECT count(*) FROM graft_wh.rn_b")
      .collect()(0).getLong(0) === 5L)
    spark.sql("DROP TABLE graft_wh.rn_b")
  }

  test("namespaces map to directories: CREATE/SHOW/USE-path/DROP") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_wh.proj1")
    assert(new java.io.File(s"$warehouse/proj1").isDirectory)
    val ns = spark.sql("SHOW NAMESPACES IN graft_wh")
      .collect().map(_.getString(0)).toSet
    assert(ns.contains("proj1"), s"missing proj1 in $ns")
    // table dirs are NOT namespaces (disjoint by artifact shape)
    assert(!ns.contains("idx"), s"table listed as namespace: $ns")
    // a table created INSIDE the namespace resolves and lists there
    spark.sql("DROP TABLE IF EXISTS graft_wh.proj1.t")
    spark.sql(
      "CREATE TABLE graft_wh.proj1.t AS SELECT word, df, postings FROM graft_wh.idx LIMIT 3")
    assert(spark.sql("SELECT count(*) FROM graft_wh.proj1.t")
      .collect()(0).getLong(0) === 3L)
    val tbls = spark.sql("SHOW TABLES IN graft_wh.proj1")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(tbls === Set("t"))
    // dropping a non-empty namespace needs CASCADE
    intercept[Exception](spark.sql("DROP NAMESPACE graft_wh.proj1"))
    spark.sql("DROP NAMESPACE graft_wh.proj1 CASCADE")
    assert(!new java.io.File(s"$warehouse/proj1").exists())
  }

  test("CREATE TABLE with a non-index schema is rejected") {
    warehouse
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft_wh.bad (x INT, y STRING) USING `graft-index`")
    }
    assert(e.getMessage.contains("word"), s"wrong error: ${e.getMessage}")
  }
}
