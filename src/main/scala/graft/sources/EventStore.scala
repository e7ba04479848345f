package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Events

/** The events stream as a DAY-PARTITIONED persisted table — the
  * everyday 100 TB layout: an append-only event log lands one
  * directory per calendar day, and every time-bounded query afterwards
  * reads ONLY the day directories it names. That is PARTITION pruning
  * — a metadata operation that never opens a file — on top of the
  * row-group predicate pushdown the raw table already gets: a
  * one-week query against a year of 100 TB events scans 7/365ths of
  * the data before any I/O happens.
  *
  * The partition key is `Events.tsDay` — the SAME expression q17
  * groups by — so the stored layout and the query key cannot drift.
  * Writes use dynamic partition overwrite semantics upstream
  * (StorageSpec's backfill test); `ts` itself is stored unchanged
  * (nanos LONG or native timestamp, whichever the source surfaced).
  * PartitionPruneSpec pins: (a) a day-bounded read plans
  * `PartitionFilters` and reads only the named days' files, and (b)
  * the served aggregations are row-identical to the raw-table forms.
  */
object EventStore {

  /** Persist events partitioned by calendar day. */
  def saveByDay(events: DataFrame, path: String): Unit =
    events.withColumn("day", Events.tsDay(events))
      .write.mode("overwrite").partitionBy("day").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** `day` as yyyy-MM-dd STRING regardless of partition-column type
    * inference (an unquoted yyyy-MM-dd partition value reads back as
    * DATE by default). */
  private def dayStr(store: DataFrame): Column =
    store.schema("day").dataType match {
      case org.apache.spark.sql.types.StringType => col("day")
      case _ => date_format(col("day"), "yyyy-MM-dd")
    }

  /** A day-bounded slice — the filter lands on the PARTITION column,
    * so pruning happens at planning time (directory listing), not scan
    * time. */
  def loadDays(spark: SparkSession, path: String, from: String,
      to: String): DataFrame = {
    val store = load(spark, path)
    store.where(dayStr(store).between(from, to))
  }

  /** q17's aggregation served FROM the store for a bounded day range:
    * the day key is the partition column itself — no re-derivation
    * from ts, and the scan touches only the named day directories. */
  def dateTruncAggDays(store: DataFrame, from: String, to: String): DataFrame =
    store.where(dayStr(store).between(from, to))
      .groupBy(dayStr(store).as("day"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("day", "event_type")

  /** q63's tumbling buckets served from the store over a day range —
    * partition pruning composes with any downstream operator, the
    * bucket arithmetic included. */
  def timeBucketsDays(store: DataFrame, from: String, to: String,
      bucket: java.time.Duration = java.time.Duration.ofHours(6)): DataFrame =
    Events.timeBuckets(store.where(dayStr(store).between(from, to)), bucket)
}
