package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated testdata
  * (/root/repo/TESTDATA.md). One parquet file per table under
  * `<sfDir>/<name>.parquet`.
  *
  * At cluster scale these would be directories of many parquet files
  * (or an external catalog); the API is the same — `spark.read.parquet`
  * prunes columns and pushes filters into the scan either way.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
