package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, DataFrameWriter, Row, SparkSession}

/** Non-parquet file sources as FIRST-CLASS gated surfaces: a table is
  * materialized once per (format, sf dir) as CSV / JSON-lines in the
  * JVM temp dir, then SERVED from that text copy — while the oracle
  * still reads the original parquet. A green CORRECTNESS row through
  * this path therefore gates the whole text round-trip (writer
  * quoting/escaping, reader parsing, schema application) end-to-end,
  * not just a same-engine echo test.
  *
  * Two deliberate engineering choices a 100 TB pipeline needs anyway:
  *
  *  - **Explicit schema on read** (the parquet schema), never
  *    inference: CSV inference reads everything as STRING, and JSON
  *    inference samples the data — a column whose sampled values all
  *    LOOK integral silently flips DOUBLE→LONG between runs. Schema
  *    inference over 100 TB is also a full extra pass.
  *  - **Microsecond timestamp format**: the default text timestamp
  *    pattern carries millis; `events.ts` is µs-grained, so the
  *    default would silently floor 999 of every 1000 timestamps. Both
  *    writer and reader pin a 6-digit fractional pattern (applies to
  *    TIMESTAMP and TIMESTAMP_NTZ columns alike).
  *
  * The text copy is written once (guarded by Spark's own _SUCCESS
  * marker) and reused across queries in the session — mirroring a lake
  * where the CSV/JSON landing zone already exists.
  */
object Sidecar {

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  private def path(fmt: String, sfDir: String, name: String) =
    s"${sys.props("java.io.tmpdir")}/graft_sidecar_${fmt}_" +
      s"${java.lang.Integer.toHexString(sfDir.hashCode)}_$name"

  private def timestamped[T](rw: Either[DataFrameReader, DataFrameWriter[Row]]) =
    rw match {
      case Left(r) => Left(r.option("timestampFormat", TsFmt)
        .option("timestampNTZFormat", TsFmt))
      case Right(w) => Right(w.option("timestampFormat", TsFmt)
        .option("timestampNTZFormat", TsFmt))
    }

  private def materialize(df: DataFrame, fmt: String, out: String): Unit =
    synchronized {
      if (!new java.io.File(out, "_SUCCESS").exists()) {
        val Right(w) = timestamped(Right(df.write.mode("overwrite")))
        fmt match {
          case "csv" => w.option("header", "true").csv(out)
          case "json" => w.json(out)
        }
      }
    }

  /** `name` served from a CSV copy (header, default quoting) with the
    * parquet schema applied on read. */
  def csv(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val pq = Tables(spark, sfDir, name)
    val out = path("csv", sfDir, name)
    materialize(pq, "csv", out)
    val Left(r) = timestamped(Left(spark.read.option("header", "true")
      .schema(pq.schema)))
    r.csv(out)
  }

  /** `name` served from a JSON-lines copy with the parquet schema
    * applied on read. */
  def jsonl(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val pq = Tables(spark, sfDir, name)
    val out = path("json", sfDir, name)
    materialize(pq, "json", out)
    val Left(r) = timestamped(Left(spark.read.schema(pq.schema)))
    r.json(out)
  }
}
