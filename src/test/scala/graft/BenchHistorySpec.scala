package graft

import org.scalatest.funsuite.AnyFunSuite

/** The spike guard's trailing-history parser (Bench.parseHistory)
  * decides whether a bounded third bench sample fires — a parse that
  * silently read the wrong section (out_rows shares key names with
  * integer values) or choked on a truncated file would either spam
  * extra samples or never arm. Pin the contract. */
class BenchHistorySpec extends AnyFunSuite {

  test("reads the queries section only, as doubles") {
    val txt = """{"metric":"total","value":9.5,"unit":"sec",""" +
      """"queries":{"q1_agg":1.25,"stream_asof":7.5},""" +
      """"out_rows":{"q1_agg":120,"stream_asof":99999},""" +
      """"gc_ms":{"q1_agg":400,"stream_asof":12}}"""
    val h = Bench.parseHistory(txt)
    assert(h === Map("q1_agg" -> 1.25, "stream_asof" -> 7.5))
  }

  test("absent queries section or truncated file yields empty") {
    assert(Bench.parseHistory("") === Map.empty)
    assert(Bench.parseHistory("""{"metric":"total"}""") === Map.empty)
    // truncated mid-queries: indexOf("}") never matches
    assert(Bench.parseHistory("""{"queries":{"q1":1.2""") === Map.empty)
  }

  test("integer seconds and underscored names parse") {
    val h = Bench.parseHistory("""{"queries":{"mm_pdf_xref":2}}""")
    assert(h === Map("mm_pdf_xref" -> 2.0))
  }
}
