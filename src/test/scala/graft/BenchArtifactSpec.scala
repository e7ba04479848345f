package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cold-protocol artifact matcher (Bench.artifactPattern):
  * the clear for one corpus dir must hit every artifact shape the
  * sources actually write for THAT dir and none of a sibling scale's —
  * the earlier bare-substring match deleted /root/testdata/sf10's
  * artifacts when clearing for /root/testdata/sf1. */
class BenchArtifactSpec extends AnyFunSuite {

  private def matches(sfDir: String, name: String): Boolean =
    Bench.artifactPattern(sfDir).pattern.matcher(name).matches()

  test("Memos.clearAll registers every operator session memo") {
    // The cold protocol's claim — "every pass prices builds" — is only
    // as strong as clearAll's coverage. Scan the operators package for
    // public `def clearX(): Unit` memo hooks and assert each one is
    // invoked from Memos.scala, so a new memo that forgets to register
    // fails HERE instead of silently serving warm hits to passes 2+.
    import scala.jdk.CollectionConverters._
    val opsDir = java.nio.file.Paths.get("src/main/scala/graft/operators")
    assume(java.nio.file.Files.isDirectory(opsDir))
    val hook = """def (clear\w+)\(\): Unit""".r
    val declared = java.nio.file.Files.list(opsDir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap(p => hook.findAllMatchIn(
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
        .map(_.group(1)))
      .toSet
    val memos = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/tools/Memos.scala")), "UTF-8")
    val missing = declared.filterNot(h => memos.contains(s".$h()"))
    assert(declared.nonEmpty)
    assert(missing.isEmpty,
      s"operator memo hooks not registered in Memos.clearAll: $missing")
  }

  test("matches every real artifact shape for the target dir") {
    val d = "/root/testdata/sf0.1"
    // the REAL shape: kind prefix ends with '_' and an absolute dir's
    // token starts with '_', so names carry a double underscore
    val t = "__root_testdata_sf0_1"
    // IndexStore materialize-once artifacts: graft_<kind>_<token>_<hex>
    for (kind <- Seq("textindex", "dsv2idx", "delidx", "mergeidx",
                     "deltaidx", "compactidx", "ttidx", "vdidx"))
      assert(matches(d, s"graft_$kind${t}_1a2b3c4d"), kind)
    // VectorStore: same shape
    assert(matches(d, s"graft_vecstore${t}_ffffffff"))
    // Sidecar copies: graft_sidecar_<fmt>_<token>_<table>_<hex>
    for (fmt <- Seq("csv", "json", "xml", "orc", "avro"))
      assert(matches(d, s"graft_sidecar_$fmt${t}_documents_9"), fmt)
    // short (positive-int) fingerprints too
    assert(matches(d, s"graft_textindex${t}_7f"))
  }

  test("sf1 clear leaves sf10 and sf1.5 artifacts intact") {
    val sf1 = "/root/testdata/sf1"
    // sf10's token continues sf1's with a digit — must NOT match
    assert(!matches(sf1, "graft_textindex__root_testdata_sf10_1a2b3c4d"))
    assert(!matches(sf1, "graft_sidecar_csv__root_testdata_sf10_documents_9f"))
    // sf1.5 sanitizes to _sf1_5 — the '5' segment is not alphabetic,
    // so it cannot be mistaken for a table-name segment
    assert(!matches(sf1, "graft_textindex__root_testdata_sf1_5_1a2b3c4d"))
    assert(!matches(sf1, "graft_sidecar_csv__root_testdata_sf1_5_documents_9f"))
    // and sf1's own artifacts still match
    assert(matches(sf1, "graft_textindex__root_testdata_sf1_1a2b3c4d"))
    assert(matches(sf1, "graft_sidecar_csv__root_testdata_sf1_documents_9f"))
  }

  test("vs_prev parser reads the committed bench.json shape") {
    val txt = """{"metric":"total","value":188.0,"unit":"sec","queries":{"q01_tokenize":0.411989219,"q02_postings":1.19389489,"q275_merge_pending":0.5},"sf":"x","runs":3}"""
    val got = Bench.parsePrevQueries(txt)
    assert(got === Map("q01_tokenize" -> 0.411989219,
      "q02_postings" -> 1.19389489, "q275_merge_pending" -> 0.5))
    // the real committed artifact parses to its full query set
    val real = Bench.parsePrevQueries(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("bench.json")), "UTF-8"))
    assert(real.size >= 200, s"parsed only ${real.size} queries")
    assert(real.contains("q01_tokenize"))
    // junk inputs degrade to empty, never throw
    assert(Bench.parsePrevQueries("").isEmpty)
    assert(Bench.parsePrevQueries("{\"metric\":1}").isEmpty)
  }

  test("unrelated tmp entries never match") {
    val d = "/root/testdata/sf0.1"
    assert(!matches(d, "graft_wh12345"))                 // spec warehouses
    assert(!matches(d, "spark-abc123"))                  // spark scratch
    assert(!matches(d, "graft_index"))                   // demo default out
    assert(!matches(d, "graft_textindex__root_testdata_sf0_01_1a2b"))
  }
}
