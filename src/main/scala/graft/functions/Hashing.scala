package graft.functions

/** Deterministic hash-family constants shared by the MinHash / SimHash /
  * LSH operators AND their DuckDB oracle SQL (SparkEntry interpolates
  * the same literals into both sides, so the two engines compute the
  * same candidates bit-for-bit).
  *
  * The permutation family is h_i(x) = (a_i·x + b_i) mod P over the
  * polyHash token value (TextFns.polyHash). a_i must be LARGE and
  * well-mixed: with small multipliers h_i is near-monotonic in x, every
  * permutation picks the same min, and LSH degenerates (observed on the
  * testdata: identical candidate sets for any band config). Knuth's
  * multiplicative constant spreads them across [0, P).
  */
object Hashing {
  val P: Long = TextFns.HashP

  /** MinHash signature width and banding (b=2 bands × r=16 rows →
    * P(candidate) = 1-(1-j^16)^2: sharp around j≈0.9, which matches the
    * 0.95 verify threshold used by the near-dup queries). */
  val NumPerms = 32
  val RowsPerBand = 16
  val NumBands: Int = NumPerms / RowsPerBand

  def permA(i: Int): Long = ((2654435761L * (i + 1)) % P) | 1L
  def permB(i: Int): Long = (40503L * (i + 7) * (i + 7) + 297121507L) % P

  /** SimHash signature width (bits of the token polyHash). 28 =
    * (maxDist+1)·7 for the q91 pigeonhole blocking — 7-bit blocks give
    * 128 bucket values per block (16-bit/4-bit blocks in rounds ≤3
    * had only 16, so bucket occupancy grew 8× faster with the corpus)
    * — and every bit stays inside polyHash's well-mixed low 28 bits
    * (values are mod 1e9+7 < 2³⁰, so bits 28+ are biased toward 0 and
    * would be dead weight in a block). */
  val SimHashBits = 28

  /** Random-hyperplane LSH for embeddings: nPlanes sign bits, integer
    * weight lattice w(p,d) = ((131p + 31d) mod 17) − 8 — deterministic,
    * representable exactly in both engines' doubles. */
  val NumPlanes = 8
  def planeWeight(p: Int, d: Int): Int = ((p * 131 + d * 31) % 17) - 8
}
