package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's runtime skew-join splitting is the
  * first line of defense (on by default); explicit salting is the
  * static alternative when a shuffle key is known-Zipfian — natural-
  * language word keys being the canonical case (SURVEY §7 "what's
  * hard": df follows Zipf).
  */
object Skew {

  /** Skew-safe equi-join of a big, Zipf-keyed relation against a
    * smaller one, WITHOUT broadcasting: the small side is replicated
    * `salts`× with an explicit salt column; each big-side row picks a
    * deterministic salt from `saltSource`, splitting every hot key's
    * rows across `salts` reducers instead of funneling them into one.
    * Result is identical to `big.join(small, key)` — the salt never
    * escapes. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "saltedJoin reserves the column name _salt; rename it on the inputs first")
    val saltedBig = big.withColumn("_salt", pmod(hash(saltSource), lit(salts)))
    val saltedSmall = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** q38 — the salted join under oracle: token stream (Zipf word key)
    * ⋈ per-word df dimension, re-aggregated per word. Equivalent to the
    * plain join; the plan shows the skew-split shuffle. */
  def saltedWordJoin(docs: DataFrame, salts: Int = 8): DataFrame = {
    val tokens = graft.functions.TextFns.tokens(docs)
    val dfDim = InvertedIndex.postingsUnordered(docs).select(col("word"), col("df"))
    saltedJoin(tokens, dfDim, "word", col("doc_id"), salts)
      .groupBy("word")
      .agg(count(lit(1)).as("n_tokens"), max(col("df")).as("df"))
      .orderBy("word")
  }
}
