package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract of Bench's LAST stdout line: the driver
  * keeps only a 2000-char stdout tail, and twice (rounds 6 and 7) the
  * query set outgrew the line and the round's bench number was lost to
  * a mid-JSON truncation. These tests bound the WORST-CASE line length
  * over the REAL query-name set and check the line is valid JSON, so
  * adding queries can never silently re-break the driver parse.
  */
class BenchLineSpec extends AnyFunSuite {

  private def worstCase: Seq[(String, Double)] =
    SparkEntry.queries.keys.toSeq.sorted.map(_ -> 9999.999)

  test("machine line fits the 2000-char tail at worst-case timings") {
    val line = Bench.machineLine(worstCase, nFailed = 999, sfNum = "0.001")
    assert(line.length <= 1900,
      s"machine line is ${line.length} chars — the driver tail keeps " +
        "2000; shrink the baseline subset or the per-entry format")
    assert(!line.contains('\n'))
  }

  test("machine line is one valid JSON object with the contract keys") {
    val line = Bench.machineLine(
      Seq("q01_agg_sum" -> 1.25, "q106_editdist_join" -> 4.5,
        "q47_norm_unicode" -> -1.0), nFailed = 1, sfNum = "0.1")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(line)
    assert(node.get("metric").asText() == "total")
    // total sums PASSING queries only — the -1 failure marker must
    // never read as a (fast) measurement
    assert(math.abs(node.get("value").asDouble() - 5.75) < 1e-9)
    assert(node.get("failed").asInt() == 1)
    assert(node.get("sf").asDouble() == 0.1)
    // q-number abbreviation, baseline subset only (q106 > 47 excluded)
    assert(node.get("queries").has("q01"))
    assert(node.get("queries").has("q47"))
    assert(!node.get("queries").has("q106"))
  }

  test("oracle_sql.json bytes are deterministic, sorted, and parseable") {
    val json = EntryKit.oracleSqlJson
    assert(json == EntryKit.oracleSqlJson)
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json)
    val keys = {
      val it = node.fieldNames()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    assert(keys == keys.sorted, "oracle_sql.json keys not name-sorted")
    assert(keys.toSet == SparkEntry.oracleSql.keySet)
    // spot-check a SQL body survives the escape round-trip
    val k = SparkEntry.oracleSql.keySet.min
    assert(node.get(k).asText() == SparkEntry.oracleSql(k))
  }

  test("jsonEscape covers quotes, backslashes, and all control chars") {
    val nasty = "a\"b\\c\nd\re\tfg"
    val escaped = EntryKit.jsonEscape(nasty)
    val back = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(escaped).asText()
    assert(back == nasty)
  }
}
