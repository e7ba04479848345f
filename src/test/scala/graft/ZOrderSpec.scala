package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.functions.ZOrder
import graft.sources.Tables

/** Z-order clustering: the LAYOUT property behind q159's bit-exact
  * key. A file sorted by the Morton interleave of (partkey, suppkey)
  * clusters BOTH dimensions, so parquet row-group min/max footers
  * admit a secondary-dimension predicate to a small fraction of row
  * groups; a single-key sort scatters the secondary dimension across
  * every row group. Measured via the scan's own numOutputRows: with
  * row-group pruning, the scan emits only the rows of ADMITTED row
  * groups. */
class ZOrderSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01" // enough rows for many groups

  private def writeSorted(df: DataFrame, sortCol: org.apache.spark.sql.Column,
      path: String): Unit =
    df.repartition(1).sortWithinPartitions(sortCol)
      // tiny row groups so the 60k-row table spans ~dozens of them —
      // the unit of pruning this spec measures. Pruning resolution IS
      // row-group granularity: with too few groups even a perfect
      // clustering can't isolate a secondary-dimension stripe.
      .write.option("parquet.block.size", (8 * 1024).toString)
      .option("parquet.page.size", (2 * 1024).toString)
      .mode("overwrite").parquet(path)

  private def scanRows(df: DataFrame): (Long, Long) = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val res = df.collect()
      val scan = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head
      (scan.metrics("numOutputRows").value, res.length.toLong)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("z-sorted layout admits a secondary-dim predicate to fewer row groups") {
    val li = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val base = Files.createTempDirectory("graft_zorder").toString
    writeSorted(li, col("l_partkey"), s"$base/bypart")
    writeSorted(li.withColumn("zkey",
        ZOrder.mortonKey(col("l_partkey"), col("l_suppkey"))),
      col("zkey"), s"$base/byz")

    def filtered(path: String) = spark.read.parquet(path)
      .where(col("l_suppkey") === 7L)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val (rowsByPart, nByPart) = scanRows(filtered(s"$base/bypart"))
    val (rowsByZ, nByZ) = scanRows(filtered(s"$base/byz"))

    // identical query results from both layouts
    assert(nByPart === nByZ && nByZ > 0)
    // the partkey-sorted layout scatters suppkey across ~every row
    // group (scan emits ~the whole table); the z-sorted layout prunes
    // most groups. Factor 2 is a conservative floor — measured ~5×.
    assert(rowsByZ * 2 < rowsByPart,
      s"z-order pruning vacuous: z-scan $rowsByZ vs partkey-scan $rowsByPart")
    // and pruning actually happened at all (not a single-row-group file)
    val total = li.count()
    assert(rowsByZ < total, s"no row group pruned ($rowsByZ of $total)")
  }

  test("morton key ≡ a driver-side bit-interleave recompute") {
    def interleave(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 31) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val rows = Tables(spark, dir, "lineitem").limit(500)
      .select(col("l_partkey"), col("l_suppkey"),
        ZOrder.mortonKey(col("l_partkey"), col("l_suppkey")).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) === interleave(r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) >= 0L, "key left the positive-LONG sort range")
    }
  }
}
