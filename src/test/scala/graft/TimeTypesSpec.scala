package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Events, Similarity}
import graft.sources.Tables

/** Round-2 verdict #5 (extended round 6): the events time operators
  * must accept every ts representation a parquet source can surface —
  * epoch-nanos LONG (nanosAsLong config), TIMESTAMP_NTZ (µs,
  * isAdjustedToUTC=false — the round-6 testdata layout), and a native
  * TIMESTAMP — a library user on a normal timestamp column previously
  * hit an interval-vs-long type error in sessionize. Each operator
  * runs on the same data in all representations and must produce
  * identical results. */
class TimeTypesSpec extends SparkSpec {
  private val dir = testdataDir

  /** The real events table in whatever ts representation the current
    * testdata uses. */
  private def evRaw: DataFrame = Tables(spark, dir, "events")

  /** ts as epoch-nanos LONG (the pre-round-6 nanosAsLong layout; the
    * testdata's ts granularity is µs, so the ×1000 loses nothing). */
  private def evLong: DataFrame = evRaw.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => evRaw
    case _ => evRaw.withColumn("ts",
      unix_micros(col("ts").cast("timestamp")) * lit(1000L))
  }

  /** Same table, ts as a native TIMESTAMP. */
  private def evTs: DataFrame =
    evLong.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  private def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(r => (0 until r.length).map(r.get))

  test("sessionize: LONG-nanos and TIMESTAMP ts produce identical sessions") {
    assert(evTs.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val a = rowsOf(Events.sessionize(evLong))
    val b = rowsOf(Events.sessionize(evTs))
    assert(a.nonEmpty && a === b)
    // and the raw representation (TIMESTAMP_NTZ in the round-6
    // testdata) agrees with both derived forms
    assert(a === rowsOf(Events.sessionize(evRaw)))
  }

  test("sessionize: the Duration gap parameter actually changes granularity") {
    val coarse = Events.sessionize(evLong, java.time.Duration.ofDays(3650))
      .agg(sum(col("n_sessions"))).collect()(0).getLong(0)
    val fine = Events.sessionize(evLong, java.time.Duration.ofNanos(1))
      .agg(sum(col("n_sessions"))).collect()(0).getLong(0)
    val users = evLong.select("user_id").distinct().count()
    assert(coarse === users) // one giant session per user
    assert(fine === evLong.count()) // every event its own session
  }

  test("lagLead: LONG-nanos and TIMESTAMP ts produce identical navigation") {
    val a = rowsOf(Events.lagLead(evLong))
    val b = rowsOf(Events.lagLead(evTs))
    assert(a.nonEmpty && a === b)
  }

  test("asofJoin: LONG-nanos and TIMESTAMP ts produce identical matches") {
    val a = rowsOf(Events.purchaseAsofClick(evLong))
    val b = rowsOf(Events.purchaseAsofClick(evTs))
    assert(a.nonEmpty && a === b)
  }

  test("sessionFunnel: dual ts types agree, counts match a brute force") {
    val a = rowsOf(Events.sessionFunnel(evLong))
    val b = rowsOf(Events.sessionFunnel(evTs))
    assert(a.nonEmpty && a === b)
    // brute force from the raw rows: sessionize by the same 5-min gap,
    // then check min(click ts) < max(purchase ts) per session
    val gap = java.time.Duration.ofMinutes(5).toNanos
    val raw = evLong.select("user_id", "event_id", "ts", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expect = raw.groupBy(_._1).map { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._2))
      val sessions = sorted.foldLeft(List.empty[List[(Long, String)]]) {
        case (acc, e) =>
          acc match {
            case cur :: rest if e._3 - cur.head._1 <= gap =>
              ((e._3, e._4) :: cur) :: rest
            case _ => List((e._3, e._4)) :: acc
          }
      }
      val stats = sessions.map { s =>
        val clicks = s.filter(_._2 == "click").map(_._1)
        val purchases = s.filter(_._2 == "purchase").map(_._1)
        (clicks.nonEmpty,
          clicks.nonEmpty && purchases.nonEmpty && clicks.min < purchases.max)
      }
      (uid, sessions.length.toLong, stats.count(_._1).toLong,
        stats.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    val got = a.map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
      r(2).asInstanceOf[Long], r(3).asInstanceOf[Long]))
    assert(got === expect)
    assert(got.exists(_._4 > 0), "no session converted — vacuous")
    assert(got.exists { case (_, n, _, c) => c < n }, "every session converted — vacuous")
  }

  test("ivf nprobe>1 recall vs exact top-k is >= single-cell recall") {
    val emb = Tables(spark, dir, "embeddings")
    val exact = Similarity.cosineTopK(emb, 20, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nprobe: Int): Int =
      Similarity.ivfAnn(emb, 20, 3, numCents = 32, nprobe = nprobe).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
        .intersect(exact).size
    val r1 = recall(1)
    val r2 = recall(2)
    assert(r2 >= r1, s"nprobe=2 recall $r2 < nprobe=1 recall $r1")
    assert(r2 > 0)
  }
}
