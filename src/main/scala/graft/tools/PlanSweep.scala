import org.apache.spark.sql.SparkSession
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      // Wrong-results guard (found in-round via the q206 merge law; see
      // NswSpec "union partitioning claim"): Spark 4.1's default
      // spark.sql.unionOutputPartitioning=true lets a window/distinct
      // above a union of co-partitioned branches skip its shuffle, and
      // under AQE + broadcast towers the claim is not always honored by
      // the union's actual partition layout.
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.eagerMaterialize", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val names = args(0).split(",")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      val cart = plan.linesIterator.count(_.contains("CartesianProduct"))
      val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
      val exch = plan.linesIterator.count(_.contains("Exchange"))
      val spw  = plan.linesIterator.count(l => l.contains("Window") && !l.contains("partitionBy"))
      val scans = plan.linesIterator.count(_.contains("Scan parquet"))
      println(s"== $n cartesian=$cart bnlj=$bnlj exchange=$exch windows=$spw scans=$scans")
      if (cart > 0) println(plan)
      graft.operators.Dedup.releaseLazyHandles() // after plan capture
    }
    spark.stop()
  }
}
