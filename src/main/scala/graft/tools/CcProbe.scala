package graft.tools

import org.apache.spark.sql.SparkSession

/** Perf probe for the q58 chain: times the LSH edge build and the CC
  * loop separately and reports the round count. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.9)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // Wrong-results guard (found in-round via the q206 merge law; see
      // NswSpec "union partitioning claim"): Spark 4.1's default
      // spark.sql.unionOutputPartitioning=true lets a window/distinct
      // above a union of co-partitioned branches skip its shuffle, and
      // under AQE + broadcast towers the claim is not always honored by
      // the union's actual partition layout.
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables(spark, sf, "documents")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (i <- 1 to 2) {
      val edges = t(s"pass$i minhashNearDup")(
        graft.operators.Dedup.minhashNearDup(docs, threshold))
      t(s"pass$i clusterLabels")(
        graft.operators.Dedup.clusterLabels(docs.select("doc_id"),
          edges.select("doc_a", "doc_b")).count())
      println(s"pass$i rounds = " +
        spark.conf.get("spark.graft.cc.lastRounds", "?"))
    }
    spark.stop()
  }
}
