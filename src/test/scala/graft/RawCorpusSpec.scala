package graft

import java.nio.file.Files

import graft.operators.InvertedIndex
import graft.sources.RawCorpus

/** End-to-end parity with the reference's input contract: manifest →
  * raw text files → inverted index (R1–R3 + the full pipeline). */
class RawCorpusSpec extends SparkSpec {

  test("manifest corpus builds the golden index (1-based doc ids)") {
    val dir = Files.createTempDirectory("graft_corpus")
    def write(name: String, body: String) = {
      val p = dir.resolve(name)
      Files.writeString(p, body)
      p.toString
    }
    val f1 = write("d1.txt", "The quick brown fox.\nThe FOX!\n")
    val f2 = write("d2.txt", "quick, quick fox\n99 bottles\n")
    val f3 = write("d3.txt", "Zebra   fox\tjumps\n")
    // manifest: count line, then paths; CRLF endings (reference quirk Q3)
    val manifest = write("manifest.txt", s"3\r\n$f1\r\n$f2\r\n$f3\r\n")

    val corpus = RawCorpus.fromManifest(spark, manifest)
    val got = InvertedIndex.postings(corpus)
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](2).toList))
      .toMap
    assert(got === Map(
      "fox" -> List(1L, 2L, 3L), "quick" -> List(1L, 2L), "the" -> List(1L),
      "brown" -> List(1L), "bottles" -> List(2L), "zebra" -> List(3L),
      "jumps" -> List(3L)))
  }

  test("directory corpus: ids from file names, sidecar files ignored") {
    val dir = Files.createTempDirectory("graft_dircorpus")
    Files.writeString(dir.resolve("00007.txt"), "alpha beta\n")
    Files.writeString(dir.resolve("00042.txt"), "gamma\n")
    Files.writeString(dir.resolve("manifest.txt"), "not a doc\n")
    val corpus = RawCorpus.fromDirectory(spark, dir.toString)
    val ids = corpus.select("doc_id").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(7L, 42L))
    assert(corpus.count() === 2)
  }
}
