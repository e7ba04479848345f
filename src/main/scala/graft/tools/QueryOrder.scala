package graft.tools

/** Prints the EXACT order Bench/Verify iterate `SparkEntry.queries`
  * (an immutable HashMap — iteration follows the CHAMP trie, so adding
  * keys can change which query runs before which). Diagnostic for
  * neighbor-effect drift analysis: a bench row's sample absorbs GC /
  * block-eviction pressure from whatever ran just before it, so a
  * reshuffled predecessor is a timing change with no code change. */
object QueryOrder {
  def main(args: Array[String]): Unit = {
    val names = graft.SparkEntry.queries.keys.toList
    names.zipWithIndex.foreach { case (n, i) => println(f"$i%3d $n") }
  }
}
