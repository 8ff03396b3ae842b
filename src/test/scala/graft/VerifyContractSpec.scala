package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Guards the driver contract around Verify's outputs: oracle_sql.json is
  * built by a hand-rolled escaper and consumed by the driver's json.load —
  * a single malformed oracle string would fail that parse and silently
  * zero a round's correctness (it has no other error channel). Every
  * oracle is round-tripped through a strict JSON parser here, and every
  * declared query is required to carry one (the zero-rows-only invariant
  * the catalog reached in round 6).
  */
class VerifyContractSpec extends AnyFunSuite {

  test("oracle_sql.json parses strictly and round-trips every oracle verbatim") {
    val mapper = new ObjectMapper()
    val node = mapper.readTree(Verify.oracleJson) // throws on malformed JSON
    assert(node.isObject)
    val keys = {
      val it = node.fieldNames()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    assert(keys.toSet == SparkEntry.oracleSql.keySet)
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(node.get(k).asText() == sql, s"oracle $k did not round-trip")
    }
  }

  test("every declared query carries an oracle — no silent rows-only rows") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracles: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without queries: $orphaned")
  }
}
