package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text normalization + tokenization shared by the index pipeline and
  * the text-analysis operators.
  *
  * Semantics derive from the reference's map phase
  * (`/root/reference/main.c++:100-144`): split on whitespace, keep only
  * ASCII letters, fold to lowercase, drop tokens that normalize to
  * empty (`main.c++:125-128`, the segfault-guard the reference README
  * documents at `README.md:18`). Reference quirks Q1/Q3 (SURVEY §2.A)
  * are resolved to the canonical `\s+` form.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql
  * .functions` — no UDFs — so the whole tokenize→normalize→filter chain
  * stays inside WholeStageCodegen, the Spark analogue of the
  * reference's fused per-line map loop (`main.c++:98-146`).
  */
object TextFns {

  /** Lowercase + strip every non-ASCII-letter byte
    * (`main.c++:106-128`). */
  def normalize(c: Column): Column = lower(regexp_replace(c, "[^A-Za-z]", ""))

  /** UTF-8-aware normalization: keep every Unicode LETTER (`\p{L}` —
    * accented Latin, CJK, Cyrillic, …), fold case. The reference is
    * byte-wise ASCII (`main.c++:115-120` deletes every byte outside
    * `[A-Za-z]`, so multi-byte UTF-8 letters are destroyed) — [[normalize]]
    * keeps that parity path; a real multilingual corpus runs THIS one.
    * Java regex and DuckDB's RE2 agree on the `\p{L}` class; `lower` is
    * simple case folding on both engines (locale-special casings like
    * dotted-I are out of the portable contract). */
  def normalizeUnicode(c: Column): Column =
    lower(regexp_replace(c, "[^\\p{L}]", ""))

  /** Raw `(doc_id [, extraCols…], word)` token stream, duplicates kept
    * (reference R5 tokenize + R6 normalize). */
  def tokens(docs: DataFrame, extraCols: Seq[String] = Nil): DataFrame = {
    val keep = (Seq("doc_id") ++ extraCols).map(col) :+
      explode(split(col("text"), "\\s+")).as("tok")
    docs
      .select(keep: _*)
      .withColumn("word", normalize(col("tok")))
      .where(length(col("word")) > 0)
      .drop("tok")
  }

  /** Position-preserving variant of the tokenize→normalize→filter
    * chain: the full ordered token ARRAY for a `text` column, same
    * normalization as [[tokens]] (which is set-shaped after the
    * explode). Sequence-sensitive ops (n-gram LMs, span dedup, pack
    * assembly) need order; one narrow `transform`+`filter` projection,
    * stays in codegen. */
  def orderedWords: Column = orderedWordsOf(col("text"))

  /** [[orderedWords]] over an arbitrary input column — the ONE
    * tokenize-expression definition the Column API and the SQL-text
    * registration (`graft_tokenize`, GraftExtensions) both build, so
    * the two surfaces cannot drift. */
  def orderedWordsOf(c: Column): Column =
    filter(transform(split(c, "\\s+"), w => normalize(w)),
      w => w =!= lit(""))

  /** Unicode twin of [[tokens]]: raw `(doc_id [, extraCols…], tok,
    * word)` stream through [[normalizeUnicode]]. Keeps the raw `tok`
    * column so consumers can compare the Unicode and ASCII readings of
    * the same token (the q104 divergence audit). */
  def tokensUnicode(docs: DataFrame, extraCols: Seq[String] = Nil): DataFrame = {
    val keep = (Seq("doc_id") ++ extraCols).map(col) :+
      explode(split(col("text"), "\\s+")).as("tok")
    docs
      .select(keep: _*)
      .withColumn("word", normalizeUnicode(col("tok")))
      .where(length(col("word")) > 0)
  }

  /** Distinct `(doc_id, word)` pairs — the reference's per-file dedup
    * (R7, `main.c++:46-58,130-141`), expressed as a partial-aggregating
    * distinct so the dedup happens map-side before the shuffle. */
  def docWords(docs: DataFrame): DataFrame =
    tokens(docs).select("doc_id", "word").distinct()

  /** Position-carrying token stream `(doc_id, word, pos)` — the
    * tokenize→normalize→filter chain of [[tokens]] with the 0-based
    * offset of each token in the RAW whitespace split. Positions are
    * assigned BEFORE the empty-after-normalize drop, so adjacency is
    * judged on the original token sequence (a stripped-to-empty token
    * still occupies its slot and correctly breaks phrase adjacency);
    * the oracle computes positions the same way (zipped `unnest` over
    * the raw split). Foundation of the positional-index query family
    * (q95–q97). Stays in codegen: `posexplode` + the same
    * `regexp_replace` chain, no UDFs. */
  def posTokens(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(split(col("text"), "\\s+")).as(Seq("pos", "tok")))
      .withColumn("word", normalize(col("tok")))
      .where(length(col("word")) > 0)
      .select(col("doc_id"), col("word"), col("pos").cast("long").as("pos"))

  /** Modulus for the cross-engine polynomial hash. */
  val HashP = 1000000007L

  /** Deterministic, cross-engine (Spark ≡ DuckDB) polynomial string
    * hash: left-fold of ascii codes, `acc*31 + c (mod 1e9+7)`.
    * DuckDB equivalent:
    * `list_reduce(list_prepend(0, list_transform(string_split(s,''),
    *  c -> ascii(c))), (a,b) -> (a*31+b) % 1000000007)`.
    * Used wherever both engines must reproduce a numeric token hash
    * (MinHash, SimHash, fingerprints, split assignment). Round 2:
    * the codegen'd `PolyHashString` expression — the round-1
    * `aggregate(split(s, ''))` HOF interpreted and allocated per
    * character in the per-token hot paths; the fold is identical
    * (bit-identity pinned by FunctionsSpec). */
  def polyHash(c: Column): Column = PolyHashString(c)

  /** The round-1 HOF formulation, kept as the semantic specification
    * `PolyHashString` is tested against (FunctionsSpec bit-identity). */
  private[graft] def polyHashHof(c: Column): Column =
    aggregate(split(c, ""), lit(0L), (acc, ch) => (acc * 31 + ascii(ch)) % HashP)
}
