package graft

import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._

import graft.operators.{Relational, TextAnalysis}
import graft.sources.Tables

/** q188 pipe syntax, q189 collation grouping, q190 parameterized SQL,
  * q191 duplicate-gram rate — the Spark-4 SQL-surface batch. The
  * engine claims are: pipe syntax is SURFACE (same plan as classic
  * text), parameter binding is parse-time and injection-safe, and the
  * collated group key carries case-insensitivity in its TYPE. */
class SqlSurfaceSpec extends SparkSpec {

  private def t(n: String) = Tables(spark, testdataDir, n)

  // ---- q188: SQL pipe syntax ----

  test("q188 pipe chain optimizes to the classic GROUP BY + HAVING plan") {
    val pipe = Relational.pipeSqlAgg(t("lineitem"))
    val classic = Relational.pipeSqlAggClassic(t("lineitem"))
    // the analyzed pipe plan carries PipeOperator marker nodes (so
    // Dataset.sameSemantics is false by design); the optimizer erases
    // them — the two texts must reach ONE optimized plan
    assert(pipe.queryExecution.optimizedPlan
        .sameResult(classic.queryExecution.optimizedPlan),
      "pipe |> chain must optimize to the classic text's plan — surface, not dialect")
    val a = pipe.collect().map(_.toSeq).toList
    val b = classic.collect().map(_.toSeq).toList
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("q188 post-aggregate |> WHERE is HAVING, not a row filter") {
    // a pipe WHERE after AGGREGATE sees aggregate output columns —
    // n_rows resolves; the same name before aggregation would not
    val li = t("lineitem")
    li.createOrReplaceTempView("graft_li_pipe_having")
    val high = spark.sql(
      """FROM graft_li_pipe_having
        ||> AGGREGATE count(*) AS n_rows GROUP BY l_returnflag
        ||> WHERE n_rows > 1
        ||> ORDER BY l_returnflag""".stripMargin)
    val expected = spark.sql(
      """SELECT l_returnflag, count(*) AS n_rows
        |FROM graft_li_pipe_having GROUP BY l_returnflag
        |HAVING count(*) > 1 ORDER BY l_returnflag""".stripMargin)
    assert(high.collect().map(_.toSeq).toList ===
      expected.collect().map(_.toSeq).toList)
  }

  // ---- q189: collation-aware grouping ----

  test("q189 grouping key carries the UTF8_LCASE collation in its type") {
    val agg = TextAnalysis.collatedVocab(t("documents"))
      .queryExecution.analyzed.collect { case a: Aggregate => a }
    assert(agg.nonEmpty)
    val keyTypes = agg.flatMap(_.groupingExpressions).map(_.dataType.toString)
    assert(keyTypes.exists(_.contains("UTF8_LCASE")),
      s"expected a UTF8_LCASE-collated group key, got: $keyTypes")
  }

  test("q189 merges case variants exactly as GROUP BY lower(word)") {
    import spark.implicits._
    val docs = Seq((1L, "Ab aB AB cd x1y"), (2L, "ab CD tt")).toDF("doc_id", "text")
    val got = TextAnalysis.collatedVocab(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    // ab: variants {Ab, aB, AB, ab} = 4, occurrences 4; cd: {cd, CD} = 2/2;
    // tt: 1/1; "x1y" normalizes to xy: 1/1
    assert(got === List(("ab", 4L, 4L), ("cd", 2L, 2L),
      ("tt", 1L, 1L), ("xy", 1L, 1L)))
  }

  test("q189 collated path ≡ lower() path on the real corpus") {
    val docs = t("documents")
    val viaCollation = TextAnalysis.collatedVocab(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    val viaLower = docs
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .select(regexp_replace(col("tok"), "[^A-Za-z]", "").as("cw"))
      .where(length(col("cw")) > 0)
      .groupBy(lower(col("cw")).as("word"))
      .agg(countDistinct(col("cw")).as("n_variants"),
        count(lit(1)).as("occurrences"))
      .orderBy("word").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(viaCollation === viaLower)
  }

  // ---- q190: parameterized SQL + IDENTIFIER ----

  test("q190 bound parameters produce the literal text's results") {
    val docs = t("documents")
    val bound = Relational.paramIdentifierAgg(docs).collect().map(_.toSeq).toList
    docs.createOrReplaceTempView("graft_docs_param_lit")
    val literal = spark.sql(
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM graft_docs_param_lit WHERE n_chars >= 300
        |GROUP BY lang ORDER BY lang""".stripMargin)
      .collect().map(_.toSeq).toList
    assert(bound === literal)
    assert(bound.nonEmpty)
  }

  test("q190 an injection-shaped IDENTIFIER value fails, never reparses") {
    t("documents").createOrReplaceTempView("graft_docs_param")
    val e = intercept[Exception] {
      spark.sql("SELECT count(*) AS n FROM IDENTIFIER(:tbl)",
        Map("tbl" -> "graft_docs_param WHERE 1=0")).collect()
    }
    // the value is rejected as an invalid identifier — it is never
    // spliced into the statement as SQL text
    assert(e.getMessage.toLowerCase.contains("identifier") ||
      e.getMessage.contains("PARSE_SYNTAX_ERROR"))
  }

  test("q190 value parameters bind as typed literals that reach pushdown") {
    val plan = Relational.paramIdentifierAgg(t("documents"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("300"),
      s"bound literal must appear in the optimized filter, got:\n$plan")
  }

  // ---- q191: duplicate n-gram rate ----

  test("q191 exact rates on a constructed corpus") {
    import spark.implicits._
    // doc 1 and 2 share identical text → every gram duplicated (rate 1);
    // doc 3 is unique → rate 0; doc 4 is too short for any 13-gram
    val docs = Seq(
      (1L, "abcdefghijklmnop"), (2L, "abcdefghijklmnop"),
      (3L, "zyxwvutsrqponmlk"), (4L, "short")).toDF("doc_id", "text")
    val got = TextAnalysis.dupNgramRate(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toList
    assert(got === List(
      (1L, 4L, 4L, 1.0), (2L, 4L, 4L, 1.0), (3L, 4L, 0L, 0.0)))
  }

  test("q191 gram relation is computed once; dup membership is a JOIN, not a window") {
    val df = TextAnalysis.dupNgramRate(t("documents"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // one corpus scan: the distinct (doc, gram) exchange feeds both
    // the gram-frequency aggregate and the join back
    assert(plan.contains("ReusedExchange"),
      s"the distinct (doc, gram) exchange must feed both consumers once:\n$plan")
    // and the dup-set membership stays a gram-keyed JOIN — a window
    // partition cannot be AQE-split under a viral boilerplate gram
    // (the measured-faster window variant was rejected for exactly
    // that; see the operator's doc)
    assert(!plan.contains("WindowExec"),
      s"dup membership must be the skew-splittable join shape, never a window:\n$plan")
  }

  test("EXECUTE IMMEDIATE runs dynamic text with USING parameters, not splices") {
    t("documents").createOrReplaceTempView("graft_docs_ei")
    // the dynamic-text escape hatch still binds values as PARAMETERS —
    // the composed statement is parameterized, never string-assembled
    val viaEi = spark.sql(
      """EXECUTE IMMEDIATE
        |  'SELECT lang, count(*) AS n FROM graft_docs_ei
        |   WHERE n_chars >= ? GROUP BY lang ORDER BY lang'
        |  USING 300""".stripMargin).collect().map(_.toSeq).toList
    val direct = spark.sql(
      """SELECT lang, count(*) AS n FROM graft_docs_ei
        |WHERE n_chars >= 300 GROUP BY lang ORDER BY lang""".stripMargin)
      .collect().map(_.toSeq).toList
    assert(viaEi === direct)
    assert(viaEi.nonEmpty)
  }

  // ---- q192: SQL UDF ----

  test("q192 the SQL UDF is macro-inlined: no call node, one plan with the body") {
    val viaUdf = Relational.sqlUdfRevenue(t("lineitem"))
    val inlined = Relational.sqlUdfRevenueInline(t("lineitem"))
    val opt = viaUdf.queryExecution.optimizedPlan
    assert(!opt.toString.toLowerCase.contains("graft_line_rev"),
      s"the UDF must be erased from the optimized plan:\n$opt")
    // the body's expression is IN the plan (the only residue of the
    // call is the parameter-binding aliases in a collapsed Project)
    assert(opt.toString.contains("as decimal(18,4)"),
      s"the inlined body's cast must appear in the optimized plan:\n$opt")
    assert(viaUdf.collect().map(_.toSeq).toList ===
      inlined.collect().map(_.toSeq).toList)
  }

  // ---- q193: SQL table function ----

  test("q193 the TVF inlines; its argument folds into the pushed predicate") {
    val df = Relational.sqlTvfLangProfile(t("documents"))
    val opt = df.queryExecution.optimizedPlan
    assert(!opt.toString.toLowerCase.contains("graft_lang_profile"),
      s"the TVF must be erased from the optimized plan:\n$opt")
    assert(opt.toString.contains("280"),
      s"the argument must reach the optimized filter as a literal:\n$opt")
    val pushed = df.queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") &&
      pushed.contains("GreaterThanOrEqual(n_chars,280)"),
      s"the folded argument must reach the parquet scan:\n$pushed")
    assert(df.collect().nonEmpty)
  }

  // ---- q220: GROUP BY ALL / ORDER BY ALL / lateral column alias ----

  test("q220 sugared text optimizes to the fully explicit classic plan") {
    val sugared = Relational.sqlSugarAgg(t("orders"))
    t("orders").createOrReplaceTempView("graft_ord_sugar_classic")
    // the lateral alias chain desugars to NESTED projections (Spark
    // inserts a Project per alias hop so the div is evaluated once) —
    // the explicit form states those subqueries literally
    val classic = spark.sql(
      """SELECT o_orderstatus, o_orderpriority, n, sum_cents, avg_cents,
        |       avg_cents * n AS floor_cents
        |FROM (
        |  SELECT o_orderstatus, o_orderpriority, n, sum_cents,
        |         sum_cents div n AS avg_cents
        |  FROM (
        |    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |    FROM graft_ord_sugar_classic
        |    GROUP BY o_orderstatus, o_orderpriority
        |  )
        |)
        |ORDER BY o_orderstatus, o_orderpriority, n, sum_cents,
        |         avg_cents, floor_cents""".stripMargin)
    // the sugars must be SURFACE: one optimized plan for both texts —
    // GROUP BY ALL inferred exactly {status, priority}, the lateral
    // alias chain expanded to the explicit nested projections, ORDER
    // BY ALL enumerated the whole select list left to right
    assert(sugared.queryExecution.optimizedPlan
        .sameResult(classic.queryExecution.optimizedPlan),
      "GROUP BY ALL / ORDER BY ALL / lateral alias must be sugar, not dialect")
    val a = sugared.collect().map(_.toSeq).toList
    assert(a === classic.collect().map(_.toSeq).toList)
    assert(a.nonEmpty)
  }

  test("q220 lateral alias chain resolves left-to-right across two hops") {
    // floor_cents consumes avg_cents, itself defined from base items
    // in the SAME select list — two-hop lateral resolution
    val row = spark.sql(
      """SELECT sum_cents div n AS avg_cents, avg_cents * n AS floor_cents
        |FROM (SELECT 7L AS sum_cents, 2L AS n)""".stripMargin).collect()
    assert(row.map(_.toSeq).toList === List(Seq(3L, 6L)))
  }

  test("q220 engine limitation pinned: lateral alias + GROUP BY ALL rejected") {
    // Spark 4.1 cannot combine a lateral column alias with GROUP BY
    // ALL in one statement — the reason sqlSugarAgg is layered. Pinned
    // so a version that lifts the restriction fails HERE (then the
    // operator can fuse back to one statement).
    t("orders").createOrReplaceTempView("graft_ord_sugar_limit")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT o_orderstatus, count(*) AS n,
          |       n + 0L AS n2
          |FROM graft_ord_sugar_limit GROUP BY ALL""".stripMargin).collect()
    }
    assert(e.getCondition != null &&
      e.getCondition.contains("LATERAL_COLUMN_ALIAS_IN_GROUP_BY"),
      s"expected the documented restriction, got: ${e.getMessage}")
  }
}
