package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, TextFns}

/** Fixed-size sketch operators — aggregations whose state is CONSTANT
  * in corpus size (a d×w integer grid), the structure that lets a
  * 100 TB frequency profile travel as a few KB. Unlike the engine's
  * HLL surface (q39, rows-only — engines' HLL layouts differ), the
  * count-min sketch here is built from the shared deterministic hash
  * family (graft.functions.Hashing), so the DuckDB oracle reproduces
  * the sketch — and its estimates — bit-for-bit. */
object Sketches {

  /** Sketch geometry: depth 4 (one row per hash), width 256. ε ≈
    * 2e/w of the total count, δ ≈ e^−d — coarse on purpose so the
    * testdata actually exercises collisions (est > df on some words;
    * the spec pins one). */
  val CmsDepth = 4
  val CmsWidth = 256

  /** q118 — count-min-sketch heavy hitters: estimated occurrence
    * counts for the true top-`k` words, alongside the exact counts.
    * The sketch invariant est ≥ df holds per construction (hash
    * collisions only ever ADD mass); the estimate is min over the
    * `CmsDepth` rows.
    *
    * Scale shape: one token aggregation with map-side combine builds
    * the per-word counts; the sketch is a `CmsDepth`·`CmsWidth`-cell
    * aggregation of those — CONSTANT-size state regardless of corpus
    * (this is the operator you'd keep as a streaming accumulator); the
    * probe joins the top-k words against the sketch on the (row,
    * bucket) cell key — k·d probe rows against d·w cells, both
    * broadcast-size. Hash family: bucket_j(word) = ((a_j·h + b_j) mod
    * P) mod w over the shared polyHash, a_j/b_j from Hashing.perm*. */
  /** The d (row, bucket) coordinates of one hashed value — the ONE
    * formula the batch sketch, the streaming accumulator, and the
    * oracle (via SparkEntry's interpolated constants) all share. */
  private[graft] def cmsCoords(h: org.apache.spark.sql.Column) =
    array((0 until CmsDepth).map { j =>
      struct(lit(j).as("j"),
        (((h * Hashing.permA(j) + Hashing.permB(j)) % Hashing.P)
          % CmsWidth).as("bucket"))
    }: _*)

  /** One (j, bucket) row per token OCCURRENCE per sketch row — the
    * projection whose count-aggregation IS the sketch. Works on batch
    * and streaming token relations alike (narrow, stateless). */
  private[graft] def cmsTokenCells(toks: DataFrame): DataFrame =
    toks.select(explode(cmsCoords(TextFns.polyHash(col("word")))).as("cell"))
      .select(col("cell.j").as("j"), col("cell.bucket").as("bucket"))

  def cmsHeavyHitters(docs: DataFrame, k: Int = 30): DataFrame = {
    val cellArr = explode(cmsCoords(TextFns.polyHash(col("word")))).as("cell")
    def withCells(words: DataFrame): DataFrame = words
      .select(col("word"), col("df"), cellArr)
      .select(col("word"), col("df"), col("cell.j").as("j"),
        col("cell.bucket").as("bucket"))
    val counts = TextFns.tokens(docs).groupBy("word")
      .agg(count(lit(1)).as("df"))
    // every word contributes its full count to exactly one bucket per
    // sketch row, so summing df per (j, bucket) IS the sketch
    val cells = withCells(counts).groupBy("j", "bucket")
      .agg(sum(col("df")).as("cellsum"))
    // global top-k plans as TakeOrdered (per-partition heaps + one
    // k-row merge), never a single-partition window
    val topk = withCells(counts.orderBy(col("df").desc, col("word").asc)
      .limit(k))
    topk.join(broadcast(cells), Seq("j", "bucket"))
      .groupBy("word", "df")
      .agg(min(col("cellsum")).as("est"))
      .orderBy(col("df").desc, col("word").asc)
  }

  /** Bloom geometry: 3 hashes into 1024 bits. With |S| ≈ 150 keys the
    * fill is ~35% and the FP rate ~(fill)³ ≈ 4% — deliberately lossy
    * enough that the testdata exhibits real false positives (the spec
    * pins some exist; `is_member` exposes them). */
  val BloomK = 3
  val BloomBits = 1024

  /** q122 — Bloom-filter pre-filtered join: the shuffle-elimination
    * pattern for a selective join at 100 TB. The build side (customers
    * of one nation) is collapsed to a `BloomK`×`BloomBits`-bit bit-set
    * relation — constant-size, broadcast to the fact scan — and orders
    * are kept only when ALL `BloomK` probe bits are set; the surviving
    * sliver then left-joins the true key set, labeling each pass as a
    * real member or a Bloom false positive. At scale the bloom probe
    * runs map-side inside the fact scan (a broadcast hash join on the
    * bit key), so the expensive key shuffle happens only for rows that
    * already passed — this is exactly Spark's own runtime-filter
    * optimization, made explicit with a deterministic hash family the
    * DuckDB oracle replays bit-for-bit.
    *
    * Bit position j for key x: ((x·a_j + b_j) mod P) mod `BloomBits`
    * (a/b from Hashing.perm*, reserved rows `BloomPermBase`+j so the
    * family is disjoint from the CMS rows). */
  val BloomPermBase = 8
  def bloomJoin(customer: DataFrame, orders: DataFrame,
      nationKey: Long = 1L): DataFrame = {
    def pos(j: Int, key: org.apache.spark.sql.Column) =
      ((key * Hashing.permA(BloomPermBase + j)
        + Hashing.permB(BloomPermBase + j)) % Hashing.P) % BloomBits
    val keys = customer.where(col("c_nationkey") === nationKey)
      .select(col("c_custkey").as("k"))
    val bits = keys.select(explode(array((0 until BloomK).map { j =>
        struct(lit(j).as("j"), pos(j, col("k")).as("pos"))
      }: _*)).as("b"))
      .select(col("b.j").as("j"), col("b.pos").as("pos"))
      .distinct()
    val probe = orders.select(col("o_orderkey"), col("o_custkey"))
      .select(col("*"), explode(array((0 until BloomK).map { j =>
        struct(lit(j).as("j"), pos(j, col("o_custkey")).as("pos"))
      }: _*)).as("b"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("b.j").as("j"), col("b.pos").as("pos"))
    // bits is distinct per (j,pos), so each probe row matches at most
    // once — count == BloomK ⟺ every bit set
    val pass = probe.join(broadcast(bits), Seq("j", "pos"))
      .groupBy("o_orderkey", "o_custkey")
      .agg(count(lit(1)).as("nbits"))
      .where(col("nbits") === BloomK)
    pass.join(keys, pass("o_custkey") === keys("k"), "left")
      .select(col("o_orderkey"), col("o_custkey"),
        col("k").isNotNull.as("is_member"))
      .orderBy("o_orderkey")
  }

  /** HLL geometry: 64 registers (6 bucket bits out of polyHash's ~30),
    * rank = trailing zeros of the remaining 24 bits + 1, saturating at
    * 25. α_m·m²·10⁶ kept as ONE exact integer numerator so the
    * estimate is computed entirely in Long division — no transcendental
    * or float op anywhere (q39's engine HLL stays rows-only; this
    * sketch is the fully-oracle-gated twin). */
  val HllRegisters = 64
  val HllMaxRank = 25
  /** ⌊0.709·64²·2³⁰·1000⌋ = 709·4096·2³⁰·1000 (α₆₄ = 0.709): est_micros
    * = HllEstNum div Σ_j 2^(30−reg_j). */
  val HllEstNum: Long = 709L * 4096L * 1073741824L * 1000L

  /** q124 — deterministic HyperLogLog: per-returnflag distinct-partkey
    * registers AND the integer-division estimate, fully hash-gated
    * against a DuckDB rebuild (the whole point vs q39: the hash family
    * is ours, so the sketch is engine-independent). Output is one row
    * per (group, register) — the mergeable sketch STATE, what a 100 TB
    * pipeline persists and max-merges across days — with the group's
    * exact count and estimate alongside.
    *
    * Scale shape: no pre-distinct — every fact row hashes and the
    * max-rank aggregation collapses map-side to groups×64 rows (THE
    * point of HLL: the exact `n_exact` audit column beside it is the
    * full key shuffle the sketch exists to avoid; a production run
    * drops it). */
  /** The per-(group, register) max-rank relation — THE sketch state.
    * Shared by the whole-table build (q124) and both sides of the
    * incremental merge (q130), so the register definition can never
    * drift between build and merge. */
  private[graft] def hllRegisters(lineitem: DataFrame): DataFrame = {
    val h = (col("l_partkey") * Hashing.permA(0) + Hashing.permB(0)) % Hashing.P
    lineitem
      .select(col("l_returnflag").as("rf"), h.as("hh"))
      .select(col("rf"), (col("hh") % HllRegisters).as("j"),
        expr(s"hh div $HllRegisters").as("h2"))
      .select(col("rf"), col("j"),
        when(col("h2") === 0, lit(HllMaxRank))
          .otherwise(expr("bit_count((h2 & -h2) - 1) + 1")).as("rank"))
      .groupBy("rf", "j")
      .agg(max(col("rank")).cast("long").as("reg"))
  }

  /** Grid completion + integer-division estimate over a register
    * relation — the output assembly both q124 and q130 share. */
  private def hllAssemble(regs: DataFrame, lineitem: DataFrame): DataFrame = {
    val exact = lineitem.groupBy(col("l_returnflag").as("rf"))
      .agg(countDistinct(col("l_partkey")).as("n_exact"))
    // empty registers (rank 0) materialize via the 0..63 grid so the
    // harmonic sum Σ 2^(30−reg) covers all m registers
    val grid = exact
      .select(col("rf"), col("n_exact"),
        explode(sequence(lit(0L), lit(HllRegisters - 1L))).as("j"))
      .join(regs, Seq("rf", "j"), "left")
      .withColumn("reg", coalesce(col("reg"), lit(0L)))
    val est = grid
      .groupBy("rf")
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - reg AS INT))"))
        .as("hsum"))
      .select(col("rf"), expr(s"$HllEstNum div hsum").as("est_micros"))
    grid.join(broadcast(est), Seq("rf"))
      .select(col("rf").as("l_returnflag"), col("j"), col("reg"),
        col("n_exact"), col("est_micros"))
      .orderBy("l_returnflag", "j")
  }

  def hllDistinct(lineitem: DataFrame): DataFrame =
    hllAssemble(hllRegisters(lineitem), lineitem)

  /** q130 — incremental HLL maintenance: the q120 merge ≡ rebuild law
    * for SKETCH state, under the other combine operator — registers
    * merge by MAX (sums for CMS cells, max for HLL ranks; both
    * associative+commutative, which is exactly what makes sketch state
    * incrementally maintainable). Stored registers (orderkey < `cap`)
    * max-merge with the new batch's; the output assembly — and the
    * ORACLE, which is literally q124's SQL text rebuilding from the
    * whole table — are shared with q124, so the hash match proves
    * max-merge ≡ whole-corpus rebuild. Only groups×64-row register
    * relations ever shuffle in the merge. */
  def hllMerge(lineitem: DataFrame, cap: Long): DataFrame = {
    val merged = hllRegisters(lineitem.where(col("l_orderkey") < cap))
      .unionByName(hllRegisters(lineitem.where(col("l_orderkey") >= cap)))
      .groupBy("rf", "j")
      .agg(max(col("reg")).as("reg"))
    hllAssemble(merged, lineitem)
  }
}
