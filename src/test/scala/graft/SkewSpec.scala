package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relational, Skew}
import graft.sources.Tables

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join ≡ plain join on a skewed key") {
    // Zipf-ish: key 'hot' carries 90% of rows
    val big = (1 to 900).map(i => (i.toLong, "hot")) ++ (1 to 100).map(i => (i.toLong, s"k${i % 10}"))
    val bigDf = big.toDF("id", "key")
    val smallDf = (Seq("hot") ++ (0 until 10).map(i => s"k$i")).zipWithIndex.toDF("key", "v")
    val plain = bigDf.join(smallDf, "key").groupBy("key").agg(count(lit(1)), sum("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(bigDf, smallDf, "key", col("id"), 8)
      .groupBy("key").agg(count(lit(1)), sum("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("q39 approx distinct within 10% of exact (rsd=0.02)") {
    val rows = Relational.approxDistinct(Tables(spark, "/root/testdata/sf0.001", "lineitem"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.1,
        s"approx $approx vs exact $exact")
    }
  }
}
