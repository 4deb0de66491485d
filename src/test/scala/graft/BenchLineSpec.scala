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

  test("query q-number prefixes are unique (duplicate-JSON-key guard)") {
    // machineLine keys by q-number prefix (takeWhile != '_') but only
    // emits the q01–q47 baseline subset; two SUBSET names sharing a
    // prefix would emit duplicate JSON keys and silently shadow one
    // timing at the driver's json.load. Outside the subset, prefix
    // twins are legitimate (q84_knn_join / q84_knn_scaled grade the
    // fixed-cell and derived-cell shapes of one operator) — no
    // artifact keys them by prefix: bench_detail.json and
    // CORRECTNESS use full names.
    val prefixes = SparkEntry.queries.keys.toSeq
      .filter { k =>
        val ds = k.drop(1).takeWhile(_.isDigit)
        ds.nonEmpty && ds.toInt <= 47
      }
      .map(_.takeWhile(_ != '_'))
    val dups = prefixes.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate q-number prefixes: $dups")
  }

  test("sf dir names with a suffix still yield a numeric sf token") {
    // the machine line interpolates sfNum unquoted; Bench's capture
    // regex must never hand it a non-numeric token (e.g. '0.1.' from
    // sf0.1.bak), which would invalidate the whole line's JSON
    val re = "sf([0-9]+(?:\\.[0-9]+)?)".r
    def cap(dir: String): String =
      re.findFirstMatchIn(dir).map(_.group(1)).getOrElse("0")
    assert(cap("/root/testdata/sf0.1") == "0.1")
    assert(cap("/root/testdata/sf0.1.bak") == "0.1")
    assert(cap("/tmp/nothing") == "0")
    for (d <- Seq("/x/sf0.1", "/x/sf0.1.bak", "/x/custom")) {
      val line = Bench.machineLine(Seq("q01_agg_sum" -> 1.0), 0, cap(d))
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    }
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
