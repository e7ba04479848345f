package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Dedup, Relational, Sketches}

/** Property tests for the round-5 blocking/frontier operators — the
  * class whose correctness claim is an EQUIVALENCE ("blocked ≡ naive",
  * "sharded ≡ dominance definition", "est ≥ truth"): example-based
  * specs pin the testdata's shapes, these pin RANDOM shapes the
  * testdata never produces (adversarial duplicate structure, all-equal
  * corners, single-element sets). Small generators on purpose — each
  * Spark round trip costs ~100 ms, and the interesting failures are
  * boundary structures, not volume. */
class BlockingPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def checkProp(p: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("prefix filter ≡ all-pairs Jaccard on random corpora (incl. heavy dup structure)") {
    // tiny vocabulary forces massive token overlap — the regime where
    // prefix pruning is most aggressive and an unsound prefix length
    // would actually lose pairs
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val genCorpus = for {
      nDocs <- Gen.choose(2, 8)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(1, 6)
        ws <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield ws.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val p = Prop.forAll(genCorpus) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val blocked = Dedup.prefixFilterNearDup(df, 3L, 4L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
      val naive = Dedup.nearDupJaccard(df, Long.MaxValue, 0.75).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
      blocked == naive
    }
    checkProp(p, 25)
  }

  test("skyline ≡ dominance definition on random (price, date) clouds") {
    val genOrders = for {
      n <- Gen.choose(1, 14)
      rows <- Gen.listOfN(n, for {
        price <- Gen.choose(1, 5).map(_ * 100.0) // coarse → many ties
        day <- Gen.choose(1, 5)
      } yield (price, f"2024-01-0$day"))
    } yield rows.zipWithIndex.map { case ((p, d), i) => (i.toLong, p, d) }
    val p = Prop.forAll(genOrders) { rows =>
      val df = rows.toDF("o_orderkey", "o_totalprice", "ds")
        .withColumn("o_orderdate",
          org.apache.spark.sql.functions.col("ds").cast("timestamp"))
      val got = Relational.skyline(df).collect().map(_.getLong(0)).toSet
      val all = rows.map { case (k, p0, d) => (k, math.round(p0 * 100), d) }
      val exp = all.filter { case (_, pc, d) =>
        !all.exists { case (_, pc2, d2) =>
          pc2 >= pc && d2 >= d && (pc2 > pc || d2 > d) }
      }.map(_._1).toSet
      got == exp
    }
    checkProp(p, 25)
  }

  test("fuzzy join ≡ naive levenshtein on random short strings") {
    val genNames = for {
      n <- Gen.choose(2, 8)
      names <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 4)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield names.distinct.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val p = Prop.forAll(genNames) { rows =>
      val df = rows.toDF("c_custkey", "c_name")
      val got = Dedup.fuzzyNameJoin(df, 1000L).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val byId = rows.toMap
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val exp = (for {
        (i, a) <- rows; (j, b) <- rows
        if i < j && lev(a, b) <= 1
      } yield (i, j)).toSet
      got == exp
    }
    checkProp(p, 25)
  }

  test("PassJoin k=4 ≡ naive levenshtein on random strings (short + planted-edit long)") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def naive(rows: Seq[(Long, String)]): Set[(Long, Long, Long)] =
      (for {
        (i, a) <- rows; (j, b) <- rows
        if i < j; e = lev(a, b) if e <= 4
      } yield (i, j, e.toLong)).toSet
    def blocked(rows: Seq[(Long, String)]): Set[(Long, Long, Long)] =
      Dedup.editDistanceJoin(rows.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // regime 1 — strings SHORTER than k+1 segments (empty-segment
    // degenerate case): tiny alphabet forces dense matches
    val genShort = for {
      n <- Gen.choose(2, 7)
      ss <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 6)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
      } yield cs.mkString)
    } yield ss.distinct.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val p = Prop.forAll(genShort) { rows => blocked(rows) == naive(rows) }
    checkProp(p, 20)
    // regime 2 — LONG strings with planted edit scripts at exactly the
    // threshold boundary (3, 4, and 5 edits: the 5-edit pair must be
    // excluded even though it shares many segments)
    val base = (0 until 6).map(i =>
      (0 until 60).map(j => ('a' + (i * 31 + j * 7) % 26).toChar).mkString)
    def edit(s: String, ops: Int, seed: Int): String =
      (0 until ops).foldLeft(s) { (acc, o) =>
        val p0 = (seed * 13 + o * 29) % math.max(1, acc.length)
        o % 3 match {
          case 0 => acc.substring(0, p0) + "zz".charAt(o % 2) + acc.substring(p0 + 1)
          case 1 => acc.substring(0, p0) + "q" + acc.substring(p0)
          case 2 => acc.substring(0, p0) + acc.substring(math.min(p0 + 1, acc.length))
        }
      }
    val planted = base.zipWithIndex.flatMap { case (s, i) =>
      Seq((i * 10L, s), (i * 10L + 1, edit(s, 1 + i % 5, i)))
    }
    assert(blocked(planted) === naive(planted))
    assert(naive(planted).nonEmpty, "planted pairs all above threshold — vacuous")
  }

  test("CMS estimate ≥ exact count on every random corpus (sketch invariant)") {
    val vocab = Vector("qq", "ww", "rr", "tt", "yy")
    val genDocs = for {
      n <- Gen.choose(1, 6)
      docs <- Gen.listOfN(n, Gen.listOfN(4, Gen.oneOf(vocab)).map(_.mkString(" ")))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val p = Prop.forAll(genDocs) { docs =>
      val rows = Sketches.cmsHeavyHitters(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      rows.forall { case (df, est) => est >= df }
    }
    checkProp(p, 25)
  }

  test("q257 float buckets: order-preserving encoding + containment on random doubles") {
    // the bucket id must be a MONOTONE function of the value (else the
    // cumsum boundary rule picks the wrong bucket) and every value
    // must lie inside its own bucket's [lo, hi] — across the entire
    // double range: normals of any magnitude, subnormals (where the
    // exponent clamps), negatives, zero, and exact powers of two
    // (where the log2 seed sits exactly on a boundary and only the
    // pow-correction keeps both engines on the same side)
    val interesting = Gen.oneOf(
      0.0, 1.0, -1.0, 8.0, math.nextDown(8.0), math.nextUp(8.0),
      java.lang.Double.MIN_VALUE, 2.2e-308, -4.9e-310, 1.7e308,
      -1.7e308, 1e-300, 5e-324, math.pow(2, -1022), math.pow(2, 1023))
    val anyDouble = for {
      m <- Gen.choose(-1.0, 1.0)
      e <- Gen.choose(-320, 307)
      pick <- Gen.frequency(3 -> Gen.const(m * math.pow(10, e)),
        1 -> interesting)
    } yield pick
    val p = Prop.forAll(Gen.listOfN(12, anyDouble)) { xs =>
      val rows = Relational.floatBuckets(
        xs.zipWithIndex.map(_.swap).toDF("i", "v"), "v")
        .collect().map(r => (r.getDouble(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3)))
      val contained = rows.forall { case (x, _, lo, hi) =>
        lo <= x && x <= hi }
      val sorted = rows.sortBy(_._1)
      val monotone = sorted.sliding(2).forall {
        case Array((x1, b1, _, _), (x2, b2, _, _)) =>
          x1 > x2 || b1 <= b2
        case _ => true
      }
      contained && monotone
    }
    checkProp(p, 30)
  }
}
