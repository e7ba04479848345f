package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.Events
import graft.sources.{EventStore, Tables}

/** Day-partitioned events: partition pruning (PartitionFilters — a
  * planning-time directory prune, distinct from row-group predicate
  * pushdown) and value parity between store-served and raw-table
  * aggregations. */
class PartitionPruneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val events = Tables(spark, dir, "events")
  private lazy val store = {
    val out = Files.createTempDirectory("graft_events_store").toString + "/events"
    EventStore.saveByDay(events, out)
    out
  }

  private def canon(df: DataFrame) = df.collect().map(_.toString).toList

  test("a day-bounded read partition-prunes to the named days' files") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val days = spark.read.parquet(store).select(date_format(col("day"),
          "yyyy-MM-dd").as("d")).distinct().collect().map(_.getString(0)).sorted
      assert(days.length > 5, s"fixture has only ${days.length} days")
      val (from, to) = (days(1), days(2))
      val sliced = EventStore.loadDays(spark, store, from, to)
      // collect() runs THIS dataset's own queryExecution (count() would
      // build a separate aggregate plan whose metrics live elsewhere)
      sliced.collect()
      val scans = sliced.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty)
      // the plan must prune on the PARTITION column (not just push a
      // data filter into row groups)
      val planStr = sliced.queryExecution.executedPlan.toString
      assert(planStr.contains("PartitionFilters") &&
        planStr.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
          .contains("day"),
        s"expected a day PartitionFilter in:\n$planStr")
      // and the files actually read are exactly the two day directories
      val filesRead = scans.map(_.metrics("numFiles").value).sum
      val dayDirs = Files.list(Paths.get(store)).iterator()
      val expected = scala.jdk.CollectionConverters.IteratorHasAsScala(dayDirs)
        .asScala.filter { p =>
          val n = p.getFileName.toString
          n >= s"day=$from" && n <= s"day=$to" && n.startsWith("day=")
        }
        .map(d => Files.list(d).iterator())
        .flatMap(it => scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala)
        .count(_.getFileName.toString.endsWith(".parquet"))
      assert(expected > 0)
      assert(filesRead === expected,
        s"read $filesRead files; the $from..$to day dirs hold $expected")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("store-served q17 aggregation == raw-table q17 (full range)") {
    val st = EventStore.load(spark, store)
    val full = EventStore.dateTruncAggDays(st, "0000-01-01", "9999-12-31")
    assert(canon(full) === canon(Events.dateTruncAgg(events)))
  }

  test("store-served day-range aggregations == raw-table equivalents") {
    val days = Events.dateTruncAgg(events).select("day").distinct()
      .collect().map(_.getString(0)).sorted
    val (from, to) = (days(2), days(4))
    val st = EventStore.load(spark, store)
    val served = EventStore.dateTruncAggDays(st, from, to)
    val raw = Events.dateTruncAgg(events)
      .where(col("day").between(from, to))
    assert(canon(served) === canon(raw))
    assert(served.count() > 0)
    // q63's buckets compose with pruning the same way (6h buckets
    // subdivide days, so a day range selects whole buckets)
    val servedB = EventStore.timeBucketsDays(st, from, to)
    val rawB = Events.timeBuckets(
      events.where(Events.tsDay(events).between(from, to)))
    assert(canon(servedB) === canon(rawB))
  }
}
