package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Operator-level invariants on the sf0.001 testdata (the DuckDB oracle
  * at sf0.01 is the authoritative value check; these pin structural
  * invariants and run fast in CI). */
class OperatorsSpec extends SparkSpec {
  private val dir = testdataDir
  private def t(n: String) = Tables(spark, dir, n)

  test("q10 semi + anti partition the customer table") {
    val rows = Relational.joinSemiAnti(t("customer"), t("orders"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows("with_orders") + rows("without_orders") === t("customer").count())
  }

  test("q12 rollup grand total equals table count") {
    val grand = Relational.rollupAgg(t("orders"))
      .where(col("status") === "ALL").collect()
    assert(grand.length === 1)
    assert(grand(0).getLong(2) === t("orders").count())
  }

  test("q13 returns exactly k rows in descending price order") {
    val rows = Relational.sortLimit(t("orders"), 10).collect()
    assert(rows.length === 10)
    val prices = rows.map(_.getDouble(1))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q19 cosine: self-similarity excluded, k neighbors per query, cos in [-1,1]") {
    val rows = Similarity.cosineTopK(t("embeddings"), 5, 3).collect()
    assert(rows.length === 15)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0))
  }

  test("q18 jaccard bounds and symmetry-free pairs") {
    val rows = Dedup.nearDupJaccard(t("documents"), 1000L, 0.5).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0))
  }

  test("q20 document counts per lang sum to corpus size") {
    val n = TextAnalysis.textStats(t("documents"))
      .agg(sum(col("n_docs"))).collect()(0).getLong(0)
    assert(n === t("documents").count())
  }

  test("q43 ivf: in-cell neighbors only, ≤k per query, nonempty recall vs exact") {
    val ivf = Similarity.ivfAnn(t("embeddings"), 20, 3).collect()
    assert(ivf.nonEmpty)
    assert(ivf.forall(r => r.getLong(1) != r.getLong(0)))
    assert(ivf.groupBy(_.getLong(0)).forall(_._2.length <= 3))
    // IVF is approximate, but with a shared codebook SOME exact top-3
    // neighbors must be co-celled and recovered
    val exact = Similarity.cosineTopK(t("embeddings"), 20, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.intersect(exact).nonEmpty)
  }

  test("q102 trained ivf: same contract as q43, trained-codebook recall ≥ seed") {
    val trained = Similarity.ivfAnn(t("embeddings"), 20, 3, iters = 2).collect()
    assert(trained.nonEmpty)
    assert(trained.forall(r => r.getLong(1) != r.getLong(0)))
    assert(trained.groupBy(_.getLong(0)).forall(_._2.length <= 3))
    val exact = Similarity.cosineTopK(t("embeddings"), 20, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val trainedHits = trained
      .map(r => (r.getLong(0), r.getLong(1))).toSet.intersect(exact).size
    // recall stays usable (nonzero overlap with the exact top-3).
    // Measured on this testdata: trained 50 vs seed 57 exact hits at
    // nprobe=2 — Lloyd minimizes QUANTIZATION error, not neighbor
    // recall, and the synthetic embeddings have no cluster structure
    // for it to find, so trained ≥ seed is NOT an invariant and is
    // deliberately not asserted.
    assert(trainedHits > 0)
  }

  test("q103 hybrid RRF: fused score reconstructs from the shipped ranks") {
    val got = Similarity.hybridRrf(t("documents"), t("embeddings"),
      Seq("spark", "join", "batch"), 0L, 100, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.map(_._1).distinct.length === got.length)
    // the output is self-consistent: rrf is EXACTLY the fusion of the
    // shipped ranks (absent list ⇒ rank −1 ⇒ zero contribution)
    got.foreach { case (_, rt, rv, rrf) =>
      val expect = (if (rt > 0) 1.0 / (rt + 60) else 0.0) +
        (if (rv > 0) 1.0 / (rv + 60) else 0.0)
      assert(rrf === expect)
    }
    // descending fused order; a doc ranked #1 in BOTH lists would score
    // 2/61 — the max; all scores in (0, 2/61]
    assert(got.map(_._4).toList === got.map(_._4).sorted.reverse.toList)
    assert(got.forall(r => r._4 > 0 && r._4 <= 2.0 / 61))
  }

  test("q44 chunks: overlap reconstructs the document, last chunk short") {
    import spark.implicits._
    val text = ("ab" * 170) // 340 chars -> p = 1, 151, 301
    val rows = TextAnalysis.chunkDocs(Seq((1L, text)).toDF("doc_id", "text"), 200, 150)
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(rows.map(_._1).toList === List(0L, 1L, 2L))
    assert(rows(0)._2 === text.substring(0, 200))
    assert(rows(1)._2 === text.substring(150, 340))
    assert(rows(2)._2 === text.substring(300))
    // stitching non-overlap prefixes + final chunk == original
    val stitched = rows.dropRight(1).map(_._2.take(150)).mkString + rows.last._2
    assert(stitched === text)
  }

  test("q47 pivot: cells partition the orders table exactly") {
    val rows = Relational.pivotAgg(t("orders")).collect()
    val cellSum = rows.map(r => (1 to 5).map(r.getLong).sum).sum
    assert(cellSum === t("orders").count())
    assert(rows.map(_.getString(0)).toList === rows.map(_.getString(0)).toList.sorted)
  }

  test("q48 unpivot round-trips q47: long-form totals equal the wide cells") {
    val wide = Relational.pivotAgg(t("orders")).collect()
      .flatMap(r => (1 to 5).map(i => (r.getString(0), s"p$i", r.getLong(i)))).toSet
    val long = Relational.unpivotAgg(t("orders")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(long === wide)
  }

  test("q46 asof: latest at-or-before match per key, inclusive ties, null when none") {
    import spark.implicits._
    val ev = Seq(
      (10L, 1L, 100L, "click", 1.0),
      (11L, 1L, 150L, "click", 2.0),
      (20L, 1L, 200L, "purchase", 5.0), // after both clicks -> click 11
      (21L, 1L, 50L, "purchase", 6.0),  // before any click  -> null
      (22L, 1L, 150L, "purchase", 7.0), // ties click 11     -> inclusive match
      (30L, 2L, 10L, "purchase", 8.0)   // user without clicks -> null
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Events.purchaseAsofClick(ev).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got === Map(20L -> 11L, 21L -> -1L, 22L -> 11L, 30L -> -1L))
  }

  test("scale clustering (LSH edges) refines exact clustering, never merges wrongly") {
    val docs = t("documents")
    val exact = Dedup.dedupClusters(docs, 1000L, 0.95).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scale = Dedup.dedupClustersScale(docs, 0.95).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scale.keySet === exact.keySet)
    // refinement: two docs the SCALE path clusters together must also
    // be together in the exact clustering (LSH verify has no false
    // positives; it can only miss edges, splitting components)
    scale.groupBy(_._2).values.foreach { members =>
      val exactLabels = members.keys.map(exact).toSet
      assert(exactLabels.size === 1,
        s"scale cluster spans exact clusters: $members -> $exactLabels")
    }
  }

  test("q49 clusters: transitive chains collapse to one canonical id") {
    import spark.implicits._
    // 1-2 and 2-3 are near-dup edges but 1-3 is NOT (jaccard 0.5 < 0.6):
    // clustering must still chain all three (two propagation rounds)
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d e"), (3L, "b c d e f"),
      (4L, "x y z"), (5L, "x y z"), (6L, "lonely words here")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupClusters(docs, 100L, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toList
    assert(got === List(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 4L, false), (6L, 6L, true)))
  }

  test("q50 repetition: a pathological doc scores near 1, varied text near 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam" * 50),            // one 4-gram repeated -> extreme
      (2L, ('a' to 'z').mkString)   // all distinct grams -> dup_ratio 0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L)._1 > 0.9 && got(1L)._2 > 0.2)
    assert(got(2L)._1 === 0.0)
    assert(got(2L)._2 === 1.0 / 23)
  }

  test("q51 quantiles are monotone; q52 corr within [-1,1] and matches corr()") {
    val q = Relational.quantileProfile(t("events")).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val v = (1 to 4).map(r.getDouble)
      assert(v.zip(v.tail).forall { case (a, b) => a <= b }, s"non-monotone: $v")
    }
    val c = Relational.corrStats(t("lineitem")).collect()
    assert(c.nonEmpty)
    val builtin = t("lineitem").groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    c.foreach { r =>
      val v = r.getDouble(2)
      assert(math.abs(v) <= 1.0)
      // decimal-sum formulation agrees with the built-in up to the
      // 6-dp output rounding (the built-in is unrounded)
      assert(math.abs(v - builtin(r.getString(0))) < 1e-6)
    }
  }

  test("q53 regex actually matches the corpus (non-vacuous) and counts align") {
    val rows = TextAnalysis.regexExtract(t("documents")).collect()
    assert(rows.map(_.getLong(1)).sum > 0, "pattern matches nothing — vacuous query")
    rows.foreach { r =>
      if (r.getLong(1) > 0) assert(r.getString(2).endsWith("er"))
      else assert(r.getString(2) === "")
    }
  }

  test("q57 scalar subquery: above-mean counts are a strict non-empty subset") {
    val total = t("events").count()
    val above = Relational.scalarSubquery(t("events")).collect().map(_.getLong(1)).sum
    assert(above > 0 && above < total)
  }

  test("q54 sessionize: per-user event totals conserved, session counts sane") {
    val rows = Events.sessionize(t("events")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._4).sum === t("events").count())
    rows.foreach { case (_, nSess, maxEv, nEv) =>
      assert(nSess >= 1 && maxEv <= nEv && nSess <= nEv)
    }
  }

  test("q100 TPC-H Q5: region-bounded nations, co-nationality honored") {
    import org.apache.spark.sql.functions.col
    val got = Relational.tpchQ5(t("region"), t("nation"), t("customer"),
      t("supplier"), t("orders"), t("lineitem"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    // every output nation is an ASIA nation; revenue strictly positive;
    // presentation order is revenue DESC
    val asia = t("nation")
      .join(t("region").where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(got.nonEmpty && got.map(_._1).forall(asia))
    assert(got.forall(_._2 > 0))
    assert(got.map(_._2).toList === got.map(_._2).sorted.reverse.toList)
  }

  test("q101 mix budget: prefix-sum ≡ plain window, partitioning-invariant") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = t("documents")
    val got = Sampling.mixBudget(docs, 4000L)
    // plain per-source windowed cumsum (the oracle's form)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val plain = docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("h", graft.functions.TextFns.polyHash(col("doc_id").cast("string")))
      .withColumn("cum", sum(col("n_chars")).over(w))
      .where(col("cum") <= 4000L)
      .select("doc_id", "source", "n_chars", "cum")
    assert(got.count() > 0)
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)
    val again = Sampling.mixBudget(docs.repartition(7), 4000L)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(again.sameElements(Sampling.mixBudget(docs, 4000L)
      .collect().map(r => (r.getLong(0), r.getLong(3)))))
    // every source's kept bytes stay within budget
    val over = Sampling.mixBudget(docs, 4000L)
      .groupBy("source").agg(max(col("cum")).as("m"))
      .where(col("m") > 4000L)
    assert(over.isEmpty)
  }

  test("q45 split: partitioning-invariant, bucket-ranged, exhaustive") {
    val docs = t("documents")
    val a = Sampling.hashSplit(docs).collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val b = Sampling.hashSplit(docs.repartition(7)).collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(a.toSeq === b.toSeq) // same assignment at any partitioning
    assert(a.length === docs.count())
    assert(a.forall { case (_, bkt, s) =>
      bkt >= 0 && bkt < 100 && (if (bkt < 90) s == "train" else s == "val") })
    assert(a.map(_._3).distinct.sorted.toList === List("train", "val"))
  }

  test("q201 dq audit counts planted violations null-safely; flags the corpus's real PK issue") {
    import spark.implicits._
    import java.sql.Date
    val d = Date.valueOf("1998-01-01")
    val li = Seq(
      (1L, 1, Option(d), Option("A"), Option(0.05)),
      (1L, 1, Option(d), Option("N"), Option(0.0)),    // dup key (1,1)
      (2L, 1, Option.empty[Date], Option("R"), Option(0.1)), // null shipdate
      (3L, 1, Option(d), Option.empty[String], Option(0.2)), // null flag + range
      (9L, 1, Option(d), Option("X"), Option(-0.01)))  // bad flag + range + orphan
      .toDF("l_orderkey", "l_linenumber", "l_shipdate", "l_returnflag", "l_discount")
    val ord = Seq(1L, 2L, 3L).toDF("o_orderkey")
    val got = Relational.dqAudit(li, ord).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toList
    assert(got === List(
      ("li_discount_range", 5L, 2L, false),
      ("li_flag_accepted", 5L, 2L, false),   // NULL counts as a violation
      ("li_orderkey_ref", 5L, 1L, false),
      ("li_pk_unique", 5L, 2L, false),       // both rows of the dup key
      ("li_shipdate_complete", 5L, 1L, false)))
    // …and on the real corpus the audit EARNS ITS KEEP: four rules
    // pass, but the synthetic generator does NOT enforce the
    // (l_orderkey, l_linenumber) key it mimics — the audit flags it
    val real = Relational.dqAudit(t("lineitem"), t("orders")).collect()
      .map(r => (r.getString(0), r.getBoolean(3))).toMap
    assert(real("li_discount_range") && real("li_flag_accepted") &&
      real("li_orderkey_ref") && real("li_shipdate_complete"))
    assert(!real("li_pk_unique"),
      "the synthetic lineitem has duplicate (orderkey, linenumber) pairs — if this ever passes, the generator changed")
  }

  test("q198 weighted sample is partitioning-invariant and weight-biased") {
    val docs = t("documents")
    val a = Sampling.weightedSample(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val b = Sampling.weightedSample(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(a === b, "the sample must be a pure function of the data")
    assert(a.size === 50)
    // weight = n_chars → the sample's mean length must sit above the
    // corpus mean (deterministic on this corpus, not a flaky
    // statistical bound: the fixed hash fixes the draw)
    val sampleMean = a.map(_._2).sum.toDouble / a.size
    val corpusMean = docs.agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"length-weighted sample mean $sampleMean must exceed corpus mean $corpusMean")
    // selection is a per-partition heap, never a corpus sort
    val plan = Sampling.weightedSample(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q04 rank filter plans a WindowGroupLimit (per-group heap, no full sort)") {
    // Catalyst's rank-limit optimization: `rank <= k` over a window
    // inserts WindowGroupLimit — each group keeps a k-row heap BEFORE
    // the window sort, so a 100 TB letter group ships k survivors, not
    // the group. Without it, top-k-per-group sorts every group fully.
    val plan = graft.operators.InvertedIndex.topkPerLetter(t("documents"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected the rank-filter to trigger WindowGroupLimit:\n$plan")
  }
}
