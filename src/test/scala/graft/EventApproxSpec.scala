package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventOps

/** Error envelope of the HLL++ approximate-distinct switch (e5) against the
  * exact form (e1) — the correctness gate for the one declared query whose
  * semantics are "approximately e1, at constant memory per group".
  */
class EventApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
    test(s"approx distinct users within 5% of exact per (week, event_type) ($sf)") {
      val exact = EventOps
        .queries("e1_weekly_activity")(spark, sf)
        .select("week_start", "event_type", "users")
        .collect()
        .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2))
        .toMap
      val approx = EventOps
        .e5Sketch(spark, sf)
        .select("week_start", "event_type", "approx_users")
        .collect()
        .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2))
        .toMap
      assert(approx.keySet == exact.keySet)
      val worst = exact.map { case (k, ex) =>
        math.abs(approx(k) - ex).toDouble / math.max(ex, 1L)
      }.max
      // rsd 0.02 -> 5% is > 2 sigma; small groups are exact (sparse mode)
      assert(worst <= 0.05, s"worst relative error $worst")
    }

  // e11's Spark-side sketch gate, asserted HERE as well as hash-compared:
  // the GK sketch at accuracy 1000 has a hard 0.1% rank bound, so the
  // 2%·n + 1 + tie-mass gate must hold on any input — a red here means the
  // sketch integration broke, independent of what DuckDB's t-digest does
  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
    test(s"e11's own rank gates hold for every event_type group ($sf)") {
      val rows = EventOps
        .queries("e11_quantile_sketch")(spark, sf)
        .select("event_type", "p50_ok", "p95_ok")
        .collect()
      assert(rows.nonEmpty)
      val bad = rows.filterNot(r => r.getBoolean(1) && r.getBoolean(2))
      assert(bad.isEmpty, s"gate failures: ${bad.mkString(", ")}")
    }
}
