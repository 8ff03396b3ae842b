package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F
import graft.sources.Tables

/** Event-stream analytics over the driver's `events` table — the batch
  * equivalents of the weekly-cadence telemetry aggregations
  * (hardware_report.py:427-437 weekly loop; user_activity.sql weekly grain),
  * plus sessionization, the canonical event-log operator.
  *
  * The same transforms are exposed for Structured Streaming in
  * `graft.streaming` (tumbling weekly windows + watermark); the batch form
  * here is the oracle-checkable surface.
  */
object EventOps {

  type Q = (SparkSession, String) => DataFrame

  /** Weekly activity rollup per event type: exact distinct users, event
    * counts, fixed-point value sums (user_activity.sql:72-84 shape). */
  private def e1WeeklyActivity(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .groupBy(
        F.weekStart(col("ts")).as("week_start"),
        col("event_type")
      )
      .agg(
        countDistinct(col("user_id")).as("users"),
        count(lit(1)).as("n_events"),
        sum(F.fixed4(col("value"))).as("value_f4")
      )
      .orderBy("week_start", "event_type")
  }

  /** Sessionization: a session breaks after a >30 min gap per user. Windowed
    * lag + running sum of boundary flags — all integer/μs arithmetic so the
    * oracle matches exactly. Partitioned by user: shuffles once on user_id,
    * scales linearly with users. */
  private def e2Sessionize(s: SparkSession, d: String): DataFrame =
    sessionized(s, d)
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        (max("us") - min("us")).as("span_us")
      )
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        sum("span_us").as("total_span_us"),
        max("n_events").as("max_session_events")
      )
      .orderBy("user_id")

  /** The shared sessionization frame: every event with its per-user
    * session_id (30-min-gap sessions, e2's definition — windowed lag +
    * running boundary-flag sum, all integer/μs arithmetic). Consumers:
    * e2's per-user rollup, j10's session intervals. */
  private def sessionized(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val gapUs = 30L * 60 * 1000000
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L)
      )
      .withColumn(
        "session_id",
        sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
      )
  }

  /** e18 — session PATH mining: each session's ordered event-type
    * sequence as a path string, counted corpus-wide, top-20 by frequency
    * (the behavioral-trajectory profile product analytics runs, and the
    * trajectory-extraction step an agent/behavior-cloning data pipeline
    * runs over interaction logs).
    *
    * Scale shape: the user-keyed session window is e2's one exchange; the
    * path is assembled INSIDE the (user, session) aggregation via
    * sort_array(collect_list(struct)) — per-session state, never a global
    * sort; path counting is one more keyed agg on a far smaller frame
    * (one row per session), and the top-20 boundary plans as
    * TakeOrderedAndProject (heap, no global sort). Determinism: the
    * struct sorts (us, event_id, type) with event_id unique, and the
    * top-20 tie-break is (count desc, path asc). */
  private def e18SessionPaths(s: SparkSession, d: String): DataFrame =
    sessionized(s, d)
      .groupBy("user_id", "session_id")
      .agg(
        concat_ws(
          ">",
          transform(
            array_sort(
              collect_list(struct(col("us"), col("event_id"), col("event_type")))
            ),
            e => e.getField("event_type")
          )
        ).as("path"),
        count(lit(1)).as("n_events")
      )
      .groupBy("path")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events")
      )
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(20)

  /** e19 — first-order Markov transition profile over in-session event
    * bigrams: P(next event type | current), exact counts plus a 6dp
    * probability (the session-dynamics fingerprint that catches logging
    * regressions and distribution drift between corpus snapshots).
    *
    * Scale shape: the bigram lag rides the SAME user-keyed window
    * exchange the sessionizer already paid (lag over (user, session
    * implicit via boundary flag) order); transition counting is one agg
    * over a |types|² keyspace — constant-size output no matter the event
    * volume. Probabilities are exact-integer ratios rounded at 6dp, the
    * catalog's standard cross-engine float pin. */
  private def e19MarkovTransitions(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val prevInSession =
      when(lag(col("session_id"), 1).over(byUser) === col("session_id"),
        lag(col("event_type"), 1).over(byUser))
    sessionized(s, d)
      .withColumn("prev_type", prevInSession)
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn(
        "p",
        round(col("n") / sum("n").over(Window.partitionBy("prev_type")), 6)
      )
      .orderBy("prev_type", "event_type")
  }

  /** e20 — SCD-style validity intervals (slowly-changing-dimension
    * history build): each user's event stream collapsed to consecutive
    * same-type segments with [valid_from, valid_to) interval bounds —
    * the versioned-dimension materialization a warehouse runs to answer
    * "what was the state AS OF time t" with a j4-style as-of join
    * instead of replaying the event log.
    *
    * Scale shape: one user-keyed window exchange (lag flag + running
    * segment id — the e2 sessionizer's mechanism pointed at value change
    * instead of time gaps), one (user, segment) agg, and the valid_to
    * carry is a lead over the SEGMENT frame (one row per segment, far
    * smaller than the event grain). Open segments keep a NULL valid_to —
    * the live row of an SCD table. */
  private def e20ScdIntervals(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val segs = sessionized(s, d)
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn(
        "chg",
        when(col("prev_type").isNull || col("prev_type") =!= col("event_type"), 1L)
          .otherwise(0L)
      )
      .withColumn(
        "seg_id",
        sum("chg").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      .groupBy("user_id", "seg_id")
      .agg(
        // all rows in a segment share the type by construction; min is
        // the order-free way to say "the" type
        min("event_type").as("event_type"),
        min("us").as("valid_from_us"),
        count(lit(1)).as("n_events")
      )
    segs
      .withColumn(
        "valid_to_us",
        lead(col("valid_from_us"), 1)
          .over(Window.partitionBy("user_id").orderBy("seg_id"))
      )
      .select("user_id", "seg_id", "event_type", "valid_from_us", "valid_to_us", "n_events")
      .orderBy("user_id", "seg_id")
  }

  /** Interval-overlap join (range × range) — concurrent-session pairs:
    * for every pair of DIFFERENT users, how many of their session pairs
    * overlap in time. The one join shape the catalog's as-of family
    * (j4/j5/j9: point-in-range) does not cover; the sessions-vs-sessions
    * form is the "who was online simultaneously" audit.
    *
    * Scale shape: the canonical BINNED interval join. Each session
    * explodes to the fixed-width time buckets it covers (1-day buckets;
    * session length is gap-bounded so the fan-out is 1–2 buckets per
    * session), the self-join runs as an EQUI-join on bucket — never the
    * quadratic theta-join a naive overlap predicate plans as
    * (BroadcastNestedLoopJoin) — and each overlapping pair is emitted
    * exactly once WITHOUT a distinct: only the bucket containing
    * max(start_a, start_b) reports it (that bucket is provably covered by
    * both intervals, and is unique per pair). Per-bucket cost is the true
    * concurrency density; the bucket width is the tuning knob. */
  private def j10IntervalOverlap(s: SparkSession, d: String): DataFrame = {
    val iv = sessionized(s, d)
      .groupBy("user_id", "session_id")
      .agg(min("us").as("s_us"), max("us").as("e_us"))
    intervalOverlapPairs(iv, 86400L * 1000000) // 1-day buckets
      .groupBy("user_a", "user_b")
      .agg(count(lit(1)).as("n_overlaps"))
      .orderBy("user_a", "user_b")
  }

  /** The binned-join pair stage over an arbitrary interval frame
    * (user_id, s_us, e_us) — factored so IntervalJoinSpec can certify
    * binned == naive on adversarial intervals (multi-bucket spans,
    * touching endpoints, zero length) that real session data never
    * produces. Emits one row per overlapping interval pair with both
    * endpoint sets. */
  private[graft] def intervalOverlapPairs(iv: DataFrame, bucketUs: Long): DataFrame = {
    // cached for its two self-join consumers (v4's pattern): the interval
    // build upstream runs once, not once per join side
    val binned = iv.select(
      col("user_id"),
      col("s_us"),
      col("e_us"),
      explode(
        sequence(
          expr(s"s_us div ${bucketUs}L"),
          expr(s"e_us div ${bucketUs}L")
        )
      ).as("bucket")
    ).cache()
    binned
      .as("a")
      .join(
        binned.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.user_id") < col("b.user_id") &&
          col("a.s_us") <= col("b.e_us") && col("b.s_us") <= col("a.e_us") &&
          col("a.bucket") ===
            expr(s"greatest(a.s_us, b.s_us) div ${bucketUs}L")
      )
      .select(
        col("a.user_id").as("user_a"),
        col("a.s_us").as("s_a"),
        col("a.e_us").as("e_a"),
        col("b.user_id").as("user_b"),
        col("b.s_us").as("s_b"),
        col("b.e_us").as("e_b")
      )
  }

  /** j10b — CONCURRENT-SESSIONS profile: per day, how many sessions were
    * active and the exact MAXIMUM number active at one instant — j10's
    * production sibling. j10's declared grain (every cross-user
    * overlapping session PAIR) is output-quadratic in per-day
    * concurrency by definition: R× more users on the same calendar is
    * R²× more overlapping pairs, so no plan makes the pair list cheap
    * (measured: 36.6× on 10× users, SCALING.md round 9b). The question
    * production actually asks at scale — "how concurrent is the
    * workload?" — is answered WITHOUT materializing any pair: split
    * each session at day boundaries, turn pieces into ±1 edge events,
    * and take a day-partitioned running sum (the classic sweep); the
    * max of the running sum is exact instantaneous concurrency.
    *
    * Scale: linear — one day-keyed exchange over ≤ (days-spanned)
    * pieces, zero joins, |days| output rows. Tie semantics: intervals
    * are inclusive ([s,e] and [e,·] DO overlap, j10's <=), so the end
    * edge sits at e+1 and ties order (us, delta) with −1 first; the
    * default RANGE frame makes same-instant edges atomic in both
    * engines. */
  private def j10bConcurrencyProfile(s: SparkSession, d: String): DataFrame = {
    val iv = sessionized(s, d)
      .groupBy("user_id", "session_id")
      .agg(min("us").as("s_us"), max("us").as("e_us"))
    concurrencyProfile(iv, 86400L * 1000000).orderBy("day_num")
  }

  /** The boundary-split ±1 sweep over an arbitrary inclusive interval
    * frame (s_us, e_us) — factored so IntervalJoinSpec can certify
    * sweep == naive per-instant counting on adversarial intervals
    * (multi-bucket spans, touching endpoints, zero length). */
  private[graft] def concurrencyProfile(iv: DataFrame, bucketUs: Long): DataFrame = {
    val pieces = iv
      .select(
        col("s_us"),
        col("e_us"),
        explode(
          sequence(expr(s"s_us div ${bucketUs}L"), expr(s"e_us div ${bucketUs}L"))
        ).as("day_num")
      )
      .select(
        col("day_num"),
        greatest(col("s_us"), col("day_num") * bucketUs).as("ps"),
        least(col("e_us"), (col("day_num") + 1) * bucketUs - 1).as("pe")
      )
    // both edges from ONE pass: a union of two pieces-selects would
    // re-run the sessionize → agg → boundary-split pipeline per branch
    val edges = pieces
      .select(
        col("day_num"),
        explode(
          array(
            struct(col("ps").as("us"), lit(1L).as("delta")),
            struct((col("pe") + 1).as("us"), lit(-1L).as("delta"))
          )
        ).as("e")
      )
      .select(col("day_num"), col("e.us").as("us"), col("e.delta").as("delta"))
    val w = Window.partitionBy("day_num").orderBy("us", "delta")
    edges
      .withColumn("active", sum("delta").over(w))
      .groupBy("day_num")
      .agg(
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_sessions"),
        max("active").as("max_concurrent")
      )
  }

  /** JSON property extraction from the `props` column (S4-adjacent: JSON
    * source decoding as a column op, not a driver-side loop). */
  private def e3JsonExtract(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("k")
      .agg(
        count(lit(1)).as("n_events"),
        sum(F.fixed4(col("value"))).as("value_f4")
      )
      .orderBy("k")
  }

  /** Conversion funnel: for each user who signed up, did a purchase follow
    * within 7 days? Self-join-free: per-user min signup ts vs min
    * later purchase ts via conditional aggregation — one shuffle on
    * user_id, no pairwise explosion at scale. */
  private def e4Funnel(s: SparkSession, d: String): DataFrame = {
    val horizonUs = 7L * 24 * 3600 * 1000000
    val perUser = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("us"))).as("signup_us"),
        count(when(col("event_type") === "signup", 1)).as("n_signups"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases")
      )
    val converted = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .join(perUser.select("user_id", "signup_us"), "user_id")
      .groupBy("user_id")
      .agg(
        max(
          when(
            col("event_type") === "purchase" &&
              col("us") >= col("signup_us") &&
              col("us") <= col("signup_us") + horizonUs,
            1L
          ).otherwise(0L)
        ).as("converted")
      )
    perUser
      .filter(col("signup_us").isNotNull)
      .join(converted, "user_id")
      .groupBy()
      .agg(
        count(lit(1)).as("n_signed_up_users"),
        sum(col("converted")).as("n_converted"),
        F.safeDiv(sum(col("converted")), count(lit(1))).as("conversion_rate")
      )
  }

  /** The PRODUCTION form of the approximate-distinct switch: HyperLogLog++
    * distinct users per (week, event_type) at 2% target rsd, and nothing
    * else. This is the declared exact->approx switch for unbounded inputs
    * (SURVEY §7.4): exact COUNT(DISTINCT) shuffles every (group, user)
    * pair, while the HLL sketch partial-aggregates map-side to a
    * constant-size buffer per group — the only form that holds at 100 TB
    * of events. The raw estimate is engine-specific, so THIS form has no
    * cross-engine oracle; its error envelope vs exact e1 is gated in
    * ScalaTest (EventApproxSpec). */
  def e5Sketch(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .groupBy(
        F.weekStart(col("ts")).as("week_start"),
        col("event_type")
      )
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n_events")
      )
      .orderBy("week_start", "event_type")
  }

  /** The declared e5 — [[e5Sketch]] wrapped in a split-column verification
    * harness so the row is hash-checkable: the EXACT distinct count rides
    * along as a sibling column (oracle-checked value-for-value), and the
    * engine-specific HLL estimate is surfaced as `approx_ok` — "the sketch
    * landed within 15% of exact" — a predicate BOTH engines evaluate over
    * their own HLL, true on both sides whenever both sketches behave
    * (Spark's rsd 0.02 and DuckDB's default HLL are each an order of
    * magnitude inside that bound; the tight 5% gate on the raw estimate
    * stays in EventApproxSpec). The exact column exists for verification
    * only — production runs [[e5Sketch]]. */
  private def e5ApproxDistinct(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .groupBy(
        F.weekStart(col("ts")).as("week_start"),
        col("event_type")
      )
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events")
      )
      .withColumn(
        "approx_ok",
        abs(col("approx_users") - col("exact_users")) <=
          lit(0.15) * greatest(col("exact_users"), lit(1L))
      )
      .select("week_start", "event_type", "n_events", "exact_users", "approx_ok")
      .orderBy("week_start", "event_type")
  }

  /** Retention cohort matrix — the product-analytics staple: users are
    * cohorted by their first active week, and each (cohort, week-offset)
    * cell counts how many came back. Four keyed aggregations/joins
    * (user-week distinct → per-user min → offset rollup → cohort-size
    * join), no window, no driver state; the cells table is tiny by
    * construction (weeks × weeks), so the final join broadcasts. The same
    * plan holds at 100 TB of events: everything shuffles on user_id or on
    * the small cohort key. */
  private def e6RetentionCohorts(s: SparkSession, d: String): DataFrame = {
    val uw = Tables.events(s, d)
      .select(col("user_id"), F.weekStart(col("ts")).as("week"))
      .distinct()
    val cohorts = uw.groupBy("user_id").agg(min("week").as("cohort_week"))
    val sizes = cohorts.groupBy("cohort_week").agg(count(lit(1)).as("cohort_users"))
    uw.join(cohorts, "user_id")
      .groupBy(
        col("cohort_week"),
        expr("datediff(week, cohort_week) DIV 7").cast("long").as("week_offset")
      )
      .agg(countDistinct("user_id").as("retained_users"))
      .join(broadcast(sizes), "cohort_week")
      .withColumn("retention_rate", col("retained_users") / col("cohort_users"))
      .select("cohort_week", "week_offset", "retained_users", "cohort_users", "retention_rate")
      .orderBy("cohort_week", "week_offset")
  }

  /** Rolling 7-day active users + DAU/WAU stickiness per day — the sliding
    * counterpart of e1's tumbling weeks. The sliding window is rewritten as
    * a BOUNDED fan-out: each distinct (user, day) contributes to exactly 7
    * as-of dates (one explode, ×7 rows), then one exact distinct per day —
    * no per-day self-joins, no window over the event log. The same plan
    * holds at 100 TB: fan-out is linear in distinct user-days, and the
    * distinct shuffles on (as_of, user). */
  private def e7RollingActive(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val hi = ud.agg(max("day").as("hi"))
    ud.select(
        col("user_id"),
        col("day"),
        explode(sequence(lit(0), lit(6))).as("o")
      )
      .withColumn("as_of", date_add(col("day"), col("o")))
      .crossJoin(broadcast(hi))
      .filter(col("as_of") <= col("hi"))
      .groupBy("as_of")
      .agg(
        countDistinct(when(col("day") === col("as_of"), col("user_id"))).as("dau"),
        countDistinct(col("user_id")).as("wau_7d")
      )
      .withColumn("stickiness", col("dau") / col("wau_7d"))
      .select("as_of", "dau", "wau_7d", "stickiness")
      .orderBy("as_of")
  }

  /** Rolling z-score anomaly detection on daily event volume — the alert
    * shape a pipeline health check runs: each (event_type, day) count is
    * scored against the mean/std of its own trailing 7 observed days.
    *
    * Variance comes from EXACT integer window sums (n·Σx² − (Σx)² over
    * n(n−1)) rather than stddev_samp: the window aggregates are longs, so
    * both engines feed bit-identical inputs into one fixed-form double
    * expression — Welford-style streaming variance differs in merge order
    * across engines and would hash-flip. Partitioned window (per event
    * type), one count shuffle; z is emitted only for full 7-day windows
    * with positive variance.
    *
    * Range limit, stated honestly: Σx² over a 7-row window of daily counts
    * stays inside a signed long while each daily count is < ~1.1e9
    * (7·(1.1e9)² < 2^63). Past that — ~10^9 events/day/series — lift the
    * sums to DECIMAL(38,0) on both engines; the z formula is unchanged. */
  private def e8AnomalyZscore(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window
      .partitionBy("event_type")
      .orderBy("day")
      .rowsBetween(-7, -1)
    val mean = col("s") / col("n")
    val variance =
      (col("n") * col("sumsq") - col("s") * col("s")) / (col("n") * (col("n") - 1))
    val z = round((col("n_events") - mean) / sqrt(variance), 6)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum("n_events").over(w))
      .withColumn("sumsq", sum(col("n_events") * col("n_events")).over(w))
      .withColumn(
        "z",
        when(col("n") === 7 && variance > 0, z)
      )
      .withColumn("is_anomaly", coalesce(abs(col("z")) > 2.0, lit(false)))
      .select("event_type", "day", "n_events", "z", "is_anomaly")
      .orderBy("event_type", "day")
  }

  /** Conversion-lag distribution — the funnel-timing follow-up to e4: per
    * signed-up user, the delay from first signup to the first purchase at
    * or after it, summarized as exact percentiles. All timestamp math on
    * integer microseconds (`unix_micros` / DuckDB `epoch_us` — exact), so
    * the percentile inputs are bit-identical cross-engine; the only double
    * arithmetic is the final fixed-form us→s division, rounded on both
    * sides. Two shuffles (per-user min, then the scalar percentile agg
    * whose input is one row per user). */
  private def e9ConversionLag(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val perUser = ev
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", col("us"))).as("signup_us"))
      .filter(col("signup_us").isNotNull)
    val lags = ev
      .join(perUser, "user_id")
      .groupBy("user_id")
      .agg(
        (min(
          when(
            col("event_type") === "purchase" && col("us") >= col("signup_us"),
            col("us")
          )
        ) - min(col("signup_us"))).as("lag_us")
      )
    lags.agg(
      count(lit(1)).as("n_signed_up_users"),
      count(col("lag_us")).as("n_converted"),
      round(percentile(col("lag_us"), lit(0.5)) / 1e6, 4).as("p50_lag_s"),
      round(percentile(col("lag_us"), lit(0.9)) / 1e6, 4).as("p90_lag_s"),
      round(percentile(col("lag_us"), lit(0.99)) / 1e6, 4).as("p99_lag_s")
    )
  }

  /** Latest-record-per-key snapshot — log compaction / CDC materialization:
    * each (user, event_type) keeps only its most recent event, ordered by
    * event time with the id as the deterministic late-tie breaker. One
    * shuffle; `WindowGroupLimit` pushes the rank-1 filter into the sort so
    * only one row per key survives each partial. At 100 TB this is the
    * query shape MERGE/compaction jobs run per partition. */
  private def e10LatestPerKey(s: SparkSession, d: String): DataFrame = {
    val w = Window
      .partitionBy("user_id", "event_type")
      .orderBy(col("last_us").desc, col("event_id").desc)
    Tables.events(s, d)
      .select(
        col("user_id"),
        col("event_type"),
        col("event_id"),
        unix_micros(col("ts")).as("last_us"),
        F.fixed4(col("value")).as("value_f4")
      )
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "last_us", "value_f4")
      .orderBy("user_id", "event_type")
  }

  /** Mergeable quantile sketch next to the exact percentiles — e5's
    * split-column harness applied to quantiles: the exact p50/p95 columns
    * (interpolated, the e9/a14-proven cross-engine form) are hash-checked
    * value-for-value, while each engine's OWN sketch (Spark's
    * Greenwald-Khanna `percentile_approx`, DuckDB's t-digest
    * `approx_quantile`) is verified by a RANK gate rather than a value
    * compare: the count of rows at or below the sketch's answer must sit
    * within 2%·n + 1 of the target rank. A rank gate is the sketch's
    * actual contract (both structures bound rank error, not value error),
    * so the check is meaningful on any value distribution.
    *
    * Scale shape: the sketch is constant-size mergeable state per group —
    * the 100 TB form, where an exact percentile would need a full sort per
    * group; the exact columns are the test-scale certificate. One grouped
    * agg + one broadcast join back for the rank count. */
  private def e11QuantileSketch(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val sk = ev
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        percentile(col("value"), lit(0.5)).as("ex50"),
        percentile(col("value"), lit(0.95)).as("ex95"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("ap50"),
        percentile_approx(col("value"), lit(0.95), lit(1000)).as("ap95")
      )
    // The gate carries an explicit TIE-MASS term (count of rows EQUAL to
    // the sketch's answer): both sketches bound the rank of the returned
    // value, but count(<= v) overshoots that rank by up to v's
    // multiplicity when the quantile lands on a heavy value — without the
    // term, a value with multiplicity > 2%·n at the quantile would flip
    // one engine's gate but not the other's (a data-dependent hash flake,
    // ADVICE r6). Each engine still verifies its OWN sketch.
    ev.join(broadcast(sk), "event_type")
      .groupBy("event_type", "n", "ex50", "ex95", "ap50", "ap95")
      .agg(
        sum(when(col("value") <= col("ap50"), 1L).otherwise(0L)).as("r50"),
        sum(when(col("value") <= col("ap95"), 1L).otherwise(0L)).as("r95"),
        sum(when(col("value") === col("ap50"), 1L).otherwise(0L)).as("t50"),
        sum(when(col("value") === col("ap95"), 1L).otherwise(0L)).as("t95")
      )
      .select(
        col("event_type"),
        col("n"),
        round(col("ex50"), 4).as("p50"),
        round(col("ex95"), 4).as("p95"),
        (abs(col("r50") - lit(0.5) * col("n")) <= lit(0.02) * col("n") + 1 + col("t50"))
          .as("p50_ok"),
        (abs(col("r95") - lit(0.95) * col("n")) <= lit(0.02) * col("n") + 1 + col("t95"))
          .as("p95_ok")
      )
      .orderBy("event_type")
  }

  /** Distinct-count rollup from stored sketch partials — the pattern
    * exact COUNT DISTINCT can never have: distinct counts are
    * non-additive, so weekly exacts cannot be built from daily exacts,
    * but HLL sketches union losslessly. Daily (day, event_type) sketches
    * are the STORED state (constant bytes per key); the weekly answer
    * merges seven partials per key without touching raw events again —
    * at 100 TB this is the difference between answering an arbitrary
    * date-range distinct query from kilobytes of partials and re-scanning
    * the raw log. Verified with the e5 split-column harness: the exact
    * weekly count is hash-checked, and the MERGED-sketch estimate must
    * sit within 15% of it (DuckDB gates its own approx the same way). */
  private def e12SketchRollup(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val daily = ev
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val weekly = daily
      .groupBy(
        date_trunc("week", col("day")).cast("date").as("week_start"),
        col("event_type")
      )
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_users"))
    val exact = ev
      .groupBy(
        date_trunc("week", col("ts")).cast("date").as("week_start"),
        col("event_type")
      )
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact
      .join(weekly, Seq("week_start", "event_type"))
      .select(
        col("week_start"),
        col("event_type"),
        col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          lit(0.15) * greatest(col("exact_users"), lit(1L))).as("approx_ok")
      )
      .orderBy("week_start", "event_type")
  }

  /** Integer decay-weight table shared by e13 and its oracle: α = 0.9 as
    * the exact rational 9/10, weight(lag) = 9^lag·10^(13−lag) — i.e.
    * α^lag scaled by 10¹³ — exact Longs for lag 0..13. Single source of
    * truth so no cross-engine pow() appears in the pipeline or the hash. */
  private val ewmaWeights: IndexedSeq[Long] =
    (0 to 13).map(l => (BigInt(9).pow(l) * BigInt(10).pow(13 - l)).toLong)

  /** Trending score per event type — exponentially-decayed daily counts
    * (EWMA over a 14-day horizon, α = 0.9): the "what's hot now" rollup
    * every event pipeline publishes. The decay is computed CLOSED-FORM —
    * score = Σ_d cnt_d·α^(D−d) — as one weighted sum over the daily count
    * table, not a day-by-day recursive update, so there is no ordered
    * window over the corpus and no state: one (event_type, day) keyed agg
    * with map-side combine, a broadcast scalar max-day, a 14-entry literal
    * weight lookup, one tiny per-type agg. At 100 TB the only full-data
    * pass is the daily count, which any event store already maintains.
    *
    * All arithmetic is exact integers until the final display division:
    * `score13` (the α-scaled score ×10¹³) anchors the cross-engine hash.
    * Counts up to ~10⁵/day fit the Long comfortably (1.4e18 headroom); a
    * corpus with >10⁵ events per (type, day) switches the sum to
    * DECIMAL(38,0) — noted, not needed at any driver scale. */
  private def e13TrendingEwma(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val maxDay = daily.agg(max(col("day")).as("max_day"))
    daily
      .crossJoin(broadcast(maxDay))
      .withColumn("lag", datediff(col("max_day"), col("day")))
      .filter(col("lag") <= 13)
      .withColumn("wt", element_at(typedlit(ewmaWeights), col("lag") + 1))
      .groupBy("event_type")
      .agg(sum(col("cnt") * col("wt")).as("score13"))
      .withColumn("trend", round(col("score13") / lit(1e13), 6))
      .orderBy(col("score13").desc, col("event_type"))
  }

  /** The e13 weight table as SQL literals (lag, weight). */
  private val ewmaWeightValues: String =
    ewmaWeights.zipWithIndex
      .map { case (w, l) => s"($l, ${w}::BIGINT)" }
      .mkString(", ")

  /** e14 — EXACT distinct rollup from STORED mergeable partials: e12's
    * pattern (daily per-key state merged into weekly answers without
    * rescanning raw events) with the error bar removed. HLL is only
    * needed when the id SET is too big to carry; for integer id domains
    * a paged bitmap ([[graft.functions.Bitmap64]]) carries the exact set
    * in O(touched-pages) bytes — OR is lossless union, popcount is the
    * answer, and the result is plain-oracle-checkable (no split-column
    * semi-oracle, no rank gate: the count IS count(DISTINCT)).
    *
    * At 100 TB: daily (day, event_type) bitmaps are the stored state —
    * kilobytes per key for clustered id spaces — and any date-range
    * distinct query is answered by OR-ing partials. Both stages are
    * keyed aggs with map-side combine (each executor ships one bitmap
    * per group, never rows); nothing driver-side. The e12 trade in
    * reverse: choose HLL when ids are unbounded/sparse, the bitmap when
    * exactness matters and ids are dense — this catalog now carries
    * both, certified. */
  private def e14BitmapRollup(s: SparkSession, d: String): DataFrame = {
    val build = udaf(new graft.functions.BitmapBuildAggregator)
    val mergeCount = udaf(new graft.functions.BitmapMergeCountAggregator)
    val daily = Tables
      .events(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(build(col("user_id")).as("bm"))
    daily
      .groupBy(
        date_trunc("week", col("day")).cast("date").as("week_start"),
        col("event_type")
      )
      .agg(
        mergeCount(col("bm")).as("exact_users"),
        count(lit(1)).as("n_daily_partials")
      )
      .orderBy("week_start", "event_type")
  }

  /** e15 — exact SLIDING-window distinct from the e14 partials: trailing
    * 7-day active users per day, computed by replicating each day's
    * BITMAP across the ≤7 window rows it contributes to and OR-merging
    * per window. e7 computes the same answer by replicating the
    * (user, day) STREAM 7× before a countDistinct — row-grain work 7×
    * the corpus. Here the 7× replication applies to one kilobyte-scale
    * partial per day: at 100 TB the raw events are touched once (the
    * daily bitmap build e14 already stores), and every sliding window
    * after that is partial-merge work independent of corpus size — the
    * thing neither counts (non-additive) nor row replication (7× scans)
    * can give. Exactness is what the bitmap buys over HLL unions.
    *
    * Answer parity with e7's wau_7d column is the oracle (same trailing
    * window, same hi-edge clip), plus n_partials = merged days. */
  private def e15SlidingDistinct(s: SparkSession, d: String): DataFrame = {
    val build = udaf(new graft.functions.BitmapBuildAggregator)
    val mergeCount = udaf(new graft.functions.BitmapMergeCountAggregator)
    val daily = Tables
      .events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(build(col("user_id")).as("bm"))
    val hi = daily.agg(max("day").as("hi"))
    daily
      .select(col("day"), col("bm"), explode(sequence(lit(0), lit(6))).as("o"))
      .withColumn("as_of", date_add(col("day"), col("o")))
      .crossJoin(broadcast(hi))
      .filter(col("as_of") <= col("hi"))
      .groupBy("as_of")
      .agg(
        mergeCount(col("bm")).as("wau_7d"),
        count(lit(1)).as("n_partials")
      )
      .orderBy("as_of")
  }

  /** e16 — cohort retention from bitmap INTERSECTIONS: for every ordered
    * week pair, how many of week_a's actives are still active in week_b.
    * Completes the partial-set algebra: e14 unions partials (rollup),
    * e15 slides the union, e16 intersects — |A∩B| is the operation a
    * count or an HLL sketch fundamentally cannot answer from stored
    * state (inclusion-exclusion on HLLs compounds error), and the reason
    * to store SETS rather than numbers.
    *
    * The intersection runs in the native `graft_bitmap_and_count`
    * expression (one codegen'd merge walk over the two canonical
    * serialized forms — AND-with-self doubles as cardinality, so n_a
    * needs no second aggregator). At 100 TB the raw stream is touched
    * once by the weekly bitmap build; the pair frame is |weeks|² rows of
    * kilobyte partials — driver-scale work over stored state. */
  private def e16CohortRetention(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val build = udaf(new graft.functions.BitmapBuildAggregator)
    val weekly = Tables
      .events(s, d)
      .groupBy(date_trunc("week", col("ts")).cast("date").as("week"))
      .agg(build(col("user_id")).as("bm"))
    val a = weekly.select(col("week").as("week_a"), col("bm").as("bm_a"))
    val b = weekly.select(col("week").as("week_b"), col("bm").as("bm_b"))
    a.join(broadcast(b), col("week_a") <= col("week_b"))
      .select(
        col("week_a"),
        col("week_b"),
        call_function("graft_bitmap_and_count", col("bm_a"), col("bm_a")).as("n_a"),
        call_function("graft_bitmap_and_count", col("bm_a"), col("bm_b")).as("n_both")
      )
      .withColumn("retention", round(col("n_both").cast("double") / col("n_a"), 6))
      .orderBy("week_a", "week_b")
  }

  /** e17 — DAU/MAU stickiness from the stored daily bitmap partials: the
    * classic engagement ratio ("what fraction of the monthly audience
    * shows up on a given day"), computed EXACTLY from e14's persisted
    * state. DAU is one popcount of the day's own bitmap; MAU is e15's
    * sliding-union pattern widened to 28 days; stickiness is their
    * display ratio. The 28× replication applies to kilobyte bitmaps, not
    * the raw (user, day) stream — raw events are touched once by the
    * daily build, everything after is partial-merge work independent of
    * corpus size, and unlike HLL state the bitmap union is exact at
    * every window width. Integer dau/mau anchor the cross-engine hash. */
  private def e17Stickiness(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val build = udaf(new graft.functions.BitmapBuildAggregator)
    val mergeCount = udaf(new graft.functions.BitmapMergeCountAggregator)
    val daily = Tables
      .events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(build(col("user_id")).as("bm"))
    val dau = daily.select(
      col("day").as("as_of"),
      call_function("graft_bitmap_and_count", col("bm"), col("bm")).as("dau")
    )
    val hi = daily.agg(max("day").as("hi"))
    val mau = daily
      .select(col("day"), col("bm"), explode(sequence(lit(0), lit(27))).as("o"))
      .withColumn("as_of", date_add(col("day"), col("o")))
      .crossJoin(broadcast(hi))
      .filter(col("as_of") <= col("hi"))
      .groupBy("as_of")
      .agg(mergeCount(col("bm")).as("mau"), count(lit(1)).as("n_partials"))
    dau
      .join(mau, "as_of")
      .withColumn("stickiness", round(col("dau").cast("double") / col("mau"), 6))
      .select("as_of", "dau", "mau", "n_partials", "stickiness")
      .orderBy("as_of")
  }

  /** Growth accounting per (event_type, week): classify each active
    * (user, week) as NEW (first-ever week for that type), RETAINED
    * (active the immediately preceding week) or RESURRECTED (active
    * before, but with a gap), and attribute a CHURN to week w+7 for
    * users active at w but not at w+7 — the standard
    * new/retained/resurrected/churned ledger whose identity
    * `actives(w) = new + retained + resurrected` and
    * `churned(w) = actives(w-7) - retained(w)` product analytics is
    * built on. Churn at the horizon is NOT emitted (a user's absence
    * after the last observed week is right-censored, not churn) — the
    * cap is the global max week, one broadcast scalar.
    *
    * Scale: one distinct over (type, user, week) — the only shuffle on
    * raw-event volume — then a per-(type, user) window over the tiny
    * distinct frame, which is CACHED so its three consumers (status
    * rows, churn rows, the horizon scalar) cost one events scan, not
    * three. Status and churn contributions union into a single
    * (type, week) agg — which also keeps the ledger COMPLETE: a week
    * where every user of a type churns still gets its
    * (0, 0, 0, n_churned) row instead of vanishing from a status-side
    * join. quick_ratio ((new+resurrected)/churned, the growth-health
    * headline) is 6dp display math off the integer-anchored counts. */
  private def e21GrowthAccounting(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type", "user_id").orderBy("week")
    val lagged = Tables
      .events(s, d)
      .select(col("event_type"), col("user_id"), F.weekStart(col("ts")).as("week"))
      .distinct()
      .withColumn("prev", lag("week", 1).over(w))
      .withColumn("nxt", lead("week", 1).over(w))
      .cache()
    val horizon = lagged.agg(max("week").as("maxw"))
    val status = lagged.select(
      col("event_type"),
      col("week"),
      when(col("prev").isNull, 1L).otherwise(0L).as("is_new"),
      when(datediff(col("week"), col("prev")) === 7, 1L).otherwise(0L).as("is_ret"),
      when(datediff(col("week"), col("prev")) > 7, 1L).otherwise(0L).as("is_res"),
      lit(0L).as("is_churn")
    )
    val churn = lagged
      .filter(col("nxt").isNull || datediff(col("nxt"), col("week")) > 7)
      .select(
        col("event_type"),
        date_add(col("week"), 7).as("week"),
        lit(0L).as("is_new"),
        lit(0L).as("is_ret"),
        lit(0L).as("is_res"),
        lit(1L).as("is_churn")
      )
    status
      .unionByName(churn)
      .crossJoin(broadcast(horizon))
      .filter(col("week") <= col("maxw"))
      .groupBy("event_type", "week")
      .agg(
        sum("is_new").as("n_new"),
        sum("is_ret").as("n_retained"),
        sum("is_res").as("n_resurrected"),
        sum("is_churn").as("n_churned")
      )
      .withColumn(
        "quick_ratio",
        when(
          col("n_churned") > 0,
          round((col("n_new") + col("n_resurrected")).cast("double") / col("n_churned"), 6)
        )
      )
      .select("event_type", "week", "n_new", "n_retained", "n_resurrected", "n_churned", "quick_ratio")
      .orderBy("event_type", "week")
  }

  /** Last-touch revenue attribution — every purchase's value credited to
    * the same user's latest PRECEDING non-purchase event within a
    * 30-minute lookback (else 'direct'): the standard marketing-
    * attribution rollup, and the carry-forward window (j9's
    * last-ignoreNulls mechanism) pointed at a business rule instead of a
    * join. Two ignoreNulls carries (type and its μs) are consistent
    * because they null out on exactly the same rows.
    *
    * Scale: ONE user-keyed window pass over the event log — no
    * purchase⋈touch self-join (the naive form is a range join per
    * purchase) — then a |types|-row agg; the share column is a window
    * over that constant-size frame. Integer μs bounds and fixed-point
    * revenue anchor the hash. */
  private def e22LastTouch(s: SparkSession, d: String): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = Tables
      .events(s, d)
      .select(
        col("user_id"),
        col("event_id"),
        col("event_type"),
        unix_micros(col("ts")).as("us"),
        F.fixed4(col("value")).as("value_f4")
      )
    val attributed = base
      .withColumn(
        "touch_type",
        last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true).over(w)
      )
      .withColumn(
        "touch_us",
        last(when(col("event_type") =!= "purchase", col("us")), ignoreNulls = true).over(w)
      )
      .filter(col("event_type") === "purchase")
      .withColumn(
        "touch",
        when(
          col("touch_us").isNotNull && col("us") - col("touch_us") <= 1800000000L,
          col("touch_type")
        ).otherwise("direct")
      )
    attributed
      .groupBy("touch")
      .agg(
        count(lit(1)).as("n_purchases"),
        sum("value_f4").as("revenue_f4")
      )
      .withColumn(
        "share",
        round(col("revenue_f4").cast("double") / sum("revenue_f4").over(Window.partitionBy()), 6)
      )
      .select("touch", "n_purchases", "revenue_f4", "share")
      .orderBy("touch")
  }

  /** NEAREST-event alignment join (j11) — for every `error`, the closest
    * `click` by the same user in EITHER direction within a ±6 h
    * tolerance: the sensor-fusion/point-in-time alignment semantics j4's
    * backward-only as-of can't express (j4 answers "state at the time",
    * j11 answers "which reading does this one pair with"). Nearest =
    * the closer of the carried-forward previous candidate and the
    * carried-backward next candidate, ties to the earlier one.
    *
    * Scale: the union-stream trick again — NO error×click join at any
    * scale: both types ride one user-keyed window pass (two ignoreNulls
    * carries over mirrored frames), so the cost is one shuffle of the
    * filtered stream. Unmatched errors stay as NULL rows — alignment
    * coverage is observable, not silently inner-joined away. */
  private def j11NearestAlign(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val back = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val fwd = byUser.rowsBetween(1, Window.unboundedFollowing)
    val tolUs = 6L * 3600 * 1000000
    val clickUs = when(col("event_type") === "click", col("us"))
    val picked = Tables
      .events(s, d)
      .filter(col("event_type").isin("error", "click"))
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", last(clickUs, ignoreNulls = true).over(back))
      .withColumn("next_us", first(clickUs, ignoreNulls = true).over(fwd))
      .filter(col("event_type") === "error")
      .withColumn(
        "cand",
        when(
          col("prev_us").isNotNull &&
            (col("next_us").isNull || col("us") - col("prev_us") <= col("next_us") - col("us")),
          col("prev_us")
        ).otherwise(col("next_us"))
      )
      .withColumn("aligned", col("cand").isNotNull && abs(col("us") - col("cand")) <= tolUs)
    picked
      .select(
        col("user_id"),
        col("event_id"),
        col("us"),
        when(col("aligned"), col("cand")).as("click_us"),
        when(col("aligned"), abs(col("us") - col("cand"))).as("delta_us"),
        col("aligned")
      )
      .orderBy("event_id")
  }

  /** Engagement-inequality profile — the Lorenz curve and exact Gini of
    * per-user event volume ("what share of activity comes from the top
    * users"): the concentration diagnostic behind power-user and
    * bot-skew analyses. Emitted as the activity-level HISTOGRAM with
    * running Lorenz shares, plus an ALL row carrying the Gini.
    *
    * Scale: the trick is the same as t40's terciles — users are NEVER
    * globally sorted. One user-keyed count agg, then a histogram keyed
    * by the (bounded) distinct activity level; the Lorenz windows and
    * the Gini's trapezoid sum run over histogram rows only. The Gini
    * numerator Σ u_k·(2·cumE_k − e_k) is exact integer arithmetic, so
    * the 6dp display value is a deterministic ratio of integers. */
  private def e23EngagementGini(s: SparkSession, d: String): DataFrame = {
    val hist = Tables
      .events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .groupBy(col("n").as("level"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("n_events", col("level") * col("n_users"))
    // bounded frame: one row per distinct activity level
    val w = Window.orderBy("level").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum_users", sum("n_users").over(w))
      .withColumn("cum_events", sum("n_events").over(w))
    // the trapezoid numerator is bounded by U·E — beyond long range in
    // the 1e9-users × 1e12-events regime — so it accumulates in
    // decimal(38,0), the same domain as DuckDB's HUGEINT; the per-level
    // cums stay long (bounded by E)
    val tot = cum.agg(
      max("cum_users").as("u"),
      max("cum_events").as("e"),
      sum(
        col("n_users").cast("decimal(38,0)") *
          (col("cum_events") * 2 - col("n_events")).cast("decimal(38,0)")
      ).as("num")
    )
    val levels = cum
      .crossJoin(broadcast(tot))
      .select(
        col("level"),
        col("n_users"),
        col("cum_users"),
        col("cum_events"),
        round(col("cum_users").cast("double") / col("u"), 6).as("lorenz_users"),
        round(col("cum_events").cast("double") / col("e"), 6).as("lorenz_events"),
        lit(null).cast("double").as("gini")
      )
    val all = tot.select(
      lit(null).cast("long").as("level"),
      col("u").as("n_users"),
      col("u").as("cum_users"),
      col("e").as("cum_events"),
      lit(1.0).as("lorenz_users"),
      lit(1.0).as("lorenz_events"),
      round(lit(1.0) - col("num").cast("double") / (col("u").cast("double") * col("e")), 6)
        .as("gini")
    )
    levels.unionByName(all).orderBy(col("level").asc_nulls_last)
  }

  /** Inter-event cadence histogram — the distribution of per-user gaps
    * between consecutive same-type events, bucketed at power-of-two
    * microsecond boundaries (bucket = bit length of the gap — an
    * integer log2 with NO floating log: `length(bin(gap))`, identical
    * string semantics in both engines). The activity-cadence profile
    * behind session-timeout and watermark-delay tuning: the 30-min
    * sessionization gap and the streaming watermark are policy choices
    * this histogram makes empirical.
    *
    * Scale: one user-keyed window pass for the lag, then a histogram
    * agg onto ≤ 64·|types| keys — constant-size output at any event
    * volume. */
  private def e24CadenceHistogram(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    Tables
      .events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag("us", 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("gap_us", col("us") - col("prev"))
      .withColumn("bucket", length(bin(col("gap_us"))).cast("long"))
      .groupBy("event_type", "bucket")
      .agg(
        count(lit(1)).as("n_gaps"),
        min("gap_us").as("min_gap_us"),
        max("gap_us").as("max_gap_us")
      )
      .orderBy("event_type", "bucket")
  }

  /** Bot-likeness via inter-event REGULARITY (e25) — humans are bursty,
    * schedulers are metronomes: per (user, type), the coefficient of
    * variation of inter-event gaps, flagged `regular` when CV < 0.5.
    * The flag is decided ENTIRELY in integers — CV < 1/2 ⟺
    * 4·(n·Σx² − (Σx)²) < (Σx)² over whole-second gaps — so the verdict
    * can never drift across engines; the 6dp cv column is display math
    * over the same exact sums.
    *
    * Scale: e24's one user-keyed lag pass, then a (user, type)-grain agg
    * of three integer sums (n, Σx, Σx²) with map-side combine — the
    * moment-sketch shape, mergeable at any partitioning. Σx² is bounded
    * by n·(time-range in s)² — ~1e16 at a month of seconds, 6 decades
    * inside long. */
  private def e25BotRegularity(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    Tables
      .events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag("us", 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("gap_s", ((col("us") - col("prev")) / 1000000L).cast("long"))
      .groupBy("user_id", "event_type")
      .agg(
        count(lit(1)).as("n_gaps"),
        sum("gap_s").as("sum_s"),
        sum(col("gap_s") * col("gap_s")).as("sumsq_s")
      )
      .filter(col("n_gaps") >= 3 && col("sum_s") > 0)
      .withColumn(
        "cv",
        round(
          sqrt((col("n_gaps") * col("sumsq_s") - col("sum_s") * col("sum_s")).cast("double"))
            / col("sum_s"),
          6
        )
      )
      .withColumn(
        "regular",
        (col("n_gaps") * col("sumsq_s") - col("sum_s") * col("sum_s")) * 4 <
          col("sum_s") * col("sum_s")
      )
      .select("user_id", "event_type", "n_gaps", "sum_s", "sumsq_s", "cv", "regular")
      .orderBy("user_id", "event_type")
  }

  /** Session-grain co-occurrence LIFT (e30) — market-basket analysis
    * over sessions: for every event-type pair, how much more often the
    * two types share a session than independence predicts,
    * lift = P(a,b)/(P(a)·P(b)). The co-occurrence complement of e19's
    * Markov profile (e19 asks "what follows what"; e30 asks "what goes
    * TOGETHER", order-free) — the cross-sell/feature-affinity signal.
    * lift6 is a pure integer cross-multiplication
    * (n_ab·n_sessions·1e6) div (n_a·n_b) — no probability ever
    * materializes as a float.
    *
    * Scale: rides e2's one user-keyed exchange to session ids; the
    * distinct (session, type) frame is ≤|types| rows per session; the
    * in-session pair self-join fans out ≤C(|types|,2) per session; the
    * rollup lands on ≤|types|² keys. The cross-terms accumulate in
    * decimal(38,0) (n_ab·N·1e6 overflows long at 1e9 sessions — the
    * e23/e28 HUGEINT discipline). */
  private def e30CooccurrenceLift(s: SparkSession, d: String): DataFrame = {
    val st = sessionized(s, d)
      .select(
        concat_ws("#", col("user_id"), col("session_id")).as("sid"),
        col("event_type")
      )
      .distinct()
      .cache()
    val nSessions = st.select("sid").distinct().count()
    val typeCounts = st.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
    st.as("a")
      .join(st.as("b"), col("a.sid") === col("b.sid") && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
      .join(typeCounts.select(col("event_type").as("type_a"), col("n_t").as("n_a")), "type_a")
      .join(typeCounts.select(col("event_type").as("type_b"), col("n_t").as("n_b")), "type_b")
      .withColumn(
        "lift6",
        expr(
          s"CAST((CAST(n_ab AS DECIMAL(38,0)) * ${nSessions}L * 1000000) " +
            "div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
        )
      )
      .select("type_a", "type_b", "n_ab", "n_a", "n_b", "lift6")
      .orderBy("type_a", "type_b")
  }

  /** Abandonment analysis (e29) — the temporal ANTI-join: click
    * (intent) events NOT followed by a purchase within 1 h, rolled up
    * per day with the abandonment rate. The negative-space counterpart
    * of e4's funnel (e4 counts who converted; e29 finds the intents
    * that went nowhere and when) and of j4/j11's positive pairings —
    * "NO matching event in the window" is the join kind none of them
    * express.
    *
    * Scale: ZERO join nodes — the naive form is a cart ⋈ purchase range
    * join under NOT EXISTS; here the NEXT purchase time rides j11's
    * forward mirrored carry (first purchase-us in the following frame)
    * on ONE user-keyed window pass, and abandonment is a plain
    * per-row test (no next purchase, or next > us + 1h). Day rollup
    * lands on bounded keys; integer counts + one floor division. */
  private def e29Abandonment(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val fwd = byUser.rowsBetween(1, Window.unboundedFollowing)
    val hourUs = 3600L * 1000000
    val purchaseUs = when(col("event_type") === "purchase", col("us"))
    Tables
      .events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"), unix_micros(col("ts")).as("us"))
      .withColumn("next_purchase_us", first(purchaseUs, ignoreNulls = true).over(fwd))
      .filter(col("event_type") === "click")
      .withColumn(
        "abandoned",
        col("next_purchase_us").isNull ||
          col("next_purchase_us") - col("us") > hourUs
      )
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_intents"),
        sum(when(col("abandoned"), 1L).otherwise(0L)).as("n_abandoned")
      )
      .withColumn("abandon6", expr("(n_abandoned * 1000000) div n_intents"))
      .orderBy("day")
  }

  /** Native SESSION-WINDOW aggregation (w8) — e2's sessionization run
    * through Spark's built-in `session_window` operator instead of the
    * lag+running-sum mechanism: the engine merges overlapping
    * [ts, ts+gap) windows in a dedicated physical operator
    * (UpdatingSessions/MergingSessions — the same machinery Structured
    * Streaming's session windows use), so the window-kind coverage
    * includes the one Spark treats as a first-class aggregation mode.
    * Semantics note vs e2: `session_window` starts a new session at
    * gap ≥ 30 min where e2's lag test uses gap > 30 min — identical on
    * any corpus without an exactly-30-minute gap; the oracle replays the
    * ≥ rule.
    *
    * Scale: one user-keyed exchange; sessions merge inside the
    * aggregation operator with no self-join and no second pass. */
  private def w8SessionWindow(s: SparkSession, d: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    Tables
      .events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn(
        "span_us",
        unix_micros(col("sw.end")) - unix_micros(col("sw.start")) - gapUs
      )
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("n_events").cast("long").as("n_events"),
        sum("span_us").as("total_span_us"),
        max("n_events").as("max_session_events")
      )
      .orderBy("user_id")
  }

  /** Per-type volume TREND fit (e28) — exact ordinary-least-squares
    * slope of daily event counts over time: the "is this event type
    * growing or dying" signal behind alerting thresholds and capacity
    * planning, computed without any approximate regression library.
    * OLS over integer (day-offset, count) pairs is CLOSED-FORM integer
    * arithmetic: slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²), so with
    * cross-terms accumulated in decimal(38,0) (the e23/t56 HUGEINT
    * discipline — Σx·Σy at 1e4 days × 1e12 events overflows long) the
    * 6dp slope is one integral division, truncation-toward-zero in both
    * engines (verified for negative slopes).
    *
    * Scale: one (type, day)-keyed count agg with map-side combine — the
    * only raw-volume shuffle; the moment sums aggregate the bounded
    * (type, day) frame onto |types| keys; x anchors at the global min
    * day (one broadcast scalar) to keep Σx² small. */
  private def e28TrendFit(s: SparkSession, d: String): DataFrame = {
    val daily = Tables
      .events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val m = daily.agg(min("day").as("d0"))
    daily
      .crossJoin(broadcast(m))
      .withColumn("x", datediff(col("day"), col("d0")).cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        sum("x").as("sx"),
        sum("y").as("sy"),
        // the MOMENT sums themselves accumulate wide: Σx·y at 1e4 days
        // × 1e12 events/day is ~1e20, past long BEFORE the cross-terms
        // (a long sum would wrap silently where DuckDB's HUGEINT
        // doesn't — the cross-engine drift the discipline exists for)
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy_w"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx_w")
      )
      .withColumn(
        "num",
        expr("CAST(n_days AS DECIMAL(38,0)) * sxy_w - CAST(sx AS DECIMAL(38,0)) * sy")
      )
      .withColumn(
        "den",
        expr("CAST(n_days AS DECIMAL(38,0)) * sxx_w - CAST(sx AS DECIMAL(38,0)) * sx")
      )
      .withColumn("slope6", expr("CAST((num * 1000000) div greatest(den, 1) AS BIGINT)"))
      // anchor columns rendered BIGINT for the hash; exact at any scale
      // where they fit (the wide internals above never wrap either way)
      .withColumn("sxy", expr("CAST(sxy_w AS BIGINT)"))
      .withColumn("sxx", expr("CAST(sxx_w AS BIGINT)"))
      .select("event_type", "n_days", "sx", "sy", "sxy", "sxx", "slope6")
      .orderBy("event_type")
  }

  /** Event DEBOUNCE profile (e27) — collapse retry/double-click bursts:
    * per (user, type), a maximal chain of events with consecutive gaps
    * < 5 min is ONE burst, its leading edge the one "real" event; the
    * report shows per type how much of the stream is burst echo
    * (n_suppressed / suppression rate) and the worst burst length — the
    * ingest-hygiene signal that separates genuine volume from client
    * retries before any count-based metric consumes the stream.
    *
    * Scale: e2's sessionization mechanism at burst grain — one lag pass
    * and one running-sum pass on the SAME (user, type)-keyed window
    * order, and the (type, user, burst) burst-length agg is co-located
    * with it (grouping keys ⊇ the window partition keys — no second
    * corpus exchange); the final rollup lands on |types| keys. All
    * integer; suppression6 one floor division. */
  private def e27Debounce(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    val wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    val gapUs = 300L * 1000000
    Tables
      .events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag("us", 1).over(w))
      .withColumn("lead_edge", col("prev").isNull || col("us") - col("prev") >= gapUs)
      .withColumn("burst", sum(when(col("lead_edge"), 1L).otherwise(0L)).over(wcum))
      .groupBy("event_type", "user_id", "burst")
      .agg(count(lit(1)).as("blen"))
      .groupBy("event_type")
      .agg(
        sum("blen").cast("long").as("n_events"),
        count(lit(1)).as("n_kept"),
        max("blen").as("max_burst")
      )
      .withColumn("n_suppressed", col("n_events") - col("n_kept"))
      .withColumn("suppression6", expr("(n_suppressed * 1000000) div n_events"))
      .select("event_type", "n_events", "n_kept", "n_suppressed", "max_burst", "suppression6")
      .orderBy("event_type")
  }

  /** Point-in-time SCD dimension LOOKUP (j12) — each purchase enriched
    * with the dimension version valid AT its event time: the user's
    * activity-mode segment (e20's consecutive-same-type runs over the
    * NON-purchase stream — purchases are transparent to the dimension,
    * they don't break a run). The classic warehouse "join fact to SCD-2
    * dimension at fact time", completing the temporal-join family: J4
    * point-as-of, j9 big-to-big as-of, j10 interval×interval, j11
    * nearest-either-side, j12 point-in-VERSION-INTERVAL with the version
    * attributes carried. A purchase before the user's first touch keeps
    * NULL version with `covered=false` — lookup coverage observable.
    *
    * Scale: ZERO join nodes — the naive form is a purchase ⋈ interval
    * range join; here dimension construction AND lookup ride ONE
    * user-keyed window pass (e22's carry mechanism): run starts flagged
    * by a type-change test against the lagged carry, then the version
    * (type, valid_from) carries forward into each purchase row. One
    * keyed exchange at any scale, plan-pinned join-free. */
  private def j12ScdLookup(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val cur = byUser.rowsBetween(Window.unboundedPreceding, 0)
    val prev = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val ntype = when(col("event_type") =!= "purchase", col("event_type"))
    Tables
      .events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_type", last(ntype, ignoreNulls = true).over(prev))
      .withColumn("version_type", last(ntype, ignoreNulls = true).over(cur))
      .withColumn(
        "srun",
        when(
          col("event_type") =!= "purchase" &&
            (col("prev_type").isNull || col("prev_type") =!= col("event_type")),
          col("us")
        )
      )
      .withColumn("version_from", last(col("srun"), ignoreNulls = true).over(cur))
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id"),
        col("us"),
        col("version_type"),
        col("version_from"),
        col("version_type").isNotNull.as("covered")
      )
      .orderBy("event_id")
  }

  /** User-lifetime SURVIVAL curve (e26) — for each day offset k, how many
    * users have an observed lifetime of at least k days (lifetime =
    * last-seen day − first-seen day), with the survival fraction. The
    * churn-risk complement of e6's cohort view: e6 asks "did the cohort
    * come back in week w", e26 asks "how long do users last at all" —
    * the curve whose knee sets re-engagement timing.
    *
    * Scale: users are NEVER globally sorted (e23's histogram
    * discipline) — one user-keyed min/max agg, then a histogram keyed
    * by the BOUNDED distinct lifetime (product age caps it), and the
    * survival tail-sums run over histogram rows via a broadcast
    * theta-join onto the day spine (t37's terminal-frame mechanism).
    * survival6 is an exact integer ratio — floor(1e6·alive/total) via
    * integer div — so the curve can never drift across engines. */
  private def e26SurvivalCurve(s: SparkSession, d: String): DataFrame = {
    val hist = Tables
      .events(s, d)
      .groupBy("user_id")
      .agg(datediff(max(to_date(col("ts"))), min(to_date(col("ts")))).cast("long").as("lifetime"))
      .groupBy("lifetime")
      .agg(count(lit(1)).as("n_users"))
    val tot = hist.agg(sum("n_users").cast("long").as("n_total"), max("lifetime").as("max_life"))
    // bounded spine (one row per day offset) × bounded histogram: the
    // theta-join is broadcast-NLJ over terminal frames, never the corpus
    val spine = tot.select(explode(sequence(lit(0L), col("max_life"))).as("k"), col("n_total"))
    spine
      .join(broadcast(hist), col("lifetime") >= col("k"))
      .groupBy("k", "n_total")
      .agg(sum("n_users").cast("long").as("n_alive"))
      .withColumn("survival6", expr("(n_alive * 1000000) div n_total"))
      .select("k", "n_alive", "n_total", "survival6")
      .orderBy("k")
  }

  /** e31 — SEQUENCE-PATTERN matching over daily trajectories, the
    * engine's MATCH_RECOGNIZE analog: user-days containing a `view` …
    * `click` … `purchase` subsequence (in order, gaps allowed) with NO
    * `error` anywhere between the view and the purchase — the "clean
    * conversion trajectory" selector, and the shape every row-pattern
    * query (fraud step-sequences, agent-trace filtering for
    * behavior-cloning corpora) reduces to. The grain is (user, day)
    * rather than the 30-min session because it is the coarsest BOUNDED
    * unit: a day's events per user cap the path string, where a full
    * user history would not. On this corpus the exclusion bites: ~18% of
    * view…click…purchase trajectories carry an intervening error and are
    * correctly rejected.
    *
    * Spark-first shape: ONE exchange keyed (user_id, day) builds the
    * ordered type-path, then the pattern is a single codegen `rlike` per
    * trajectory row — zero joins, no window pass at all. Matching runs
    * over a SINGLE-CHAR encoding of the path (view→v, click→c,
    * purchase→p, signup→s, error→e, anything else→x) so "no error
    * between" is the RE2-safe class `[^e]` — a true error-EXCLUSION, not
    * a whitelist of today's other types that would silently narrow the
    * semantics the day a sixth event type appears. The DuckDB oracle
    * applies the identical mapping and pattern. */
  private def e31SequenceMatch(s: SparkSession, d: String): DataFrame = {
    val sorted = array_sort(
      collect_list(struct(col("us"), col("event_id"), col("event_type")))
    )
    def code(t: org.apache.spark.sql.Column) =
      when(t === "error", lit("e"))
        .when(t === "view", lit("v"))
        .when(t === "click", lit("c"))
        .when(t === "purchase", lit("p"))
        .when(t === "signup", lit("s"))
        .otherwise(lit("x"))
    Tables
      .events(s, d)
      .select(
        col("user_id"),
        to_date(col("ts")).as("day"),
        unix_micros(col("ts")).as("us"),
        col("event_id"),
        col("event_type")
      )
      .groupBy("user_id", "day")
      .agg(
        concat_ws(">", transform(sorted, e => e.getField("event_type"))).as("path"),
        concat_ws("", transform(sorted, e => code(e.getField("event_type")))).as("cpath"),
        count(lit(1)).as("n_events")
      )
      .filter(col("cpath").rlike("v[^e]*c[^e]*p"))
      .select("user_id", "day", "path", "n_events")
      .orderBy("user_id", "day")
  }

  /** Exact lag AUTOCORRELATION of the daily event series (e32) — the
    * seasonality detector: per event type, the autocorrelation of daily
    * volume at lags 1..10 days, so a weekly cadence announces itself as
    * the lag-7 peak (and its absence certifies the series is safe to
    * compare day-over-day without calendar adjustment). e28 fits the
    * TREND (is volume growing?); e32 reads the RHYTHM (does it repeat?)
    * — the other half of the classical decomposition, and the check run
    * before any day-grain anomaly rule (e8's z-score) is trusted.
    *
    * The day spine is ZERO-FILLED (f6's mechanism): autocorrelation
    * over a gappy series silently shifts every lag past a missing day,
    * so absent (type, day) cells become explicit zeros first.
    *
    * Spark-first shape: ONE exchange over raw events (the daily count
    * agg, map-side combined); everything after runs on the |types|·days
    * frame — the spine cross-join is broadcast-of-tiny, the 10 lag
    * products ride ONE type-keyed window pass as an array of `lead`s
    * exploded to (type, lag) grain, and the rollup lands on ≤10·|types|
    * keys. At 100 TB the post-agg frame is still |types|·days rows —
    * the plan's cost is the one count agg.
    *
    * Determinism (e28's discipline): mean-centering is cross-multiplied
    * away — z_t = n·y_t − Σy stays integer, num(ℓ) = Σ z_t·z_{t+ℓ} and
    * den = Σ z_t² accumulate in decimal(38,0) (both carry the same n²
    * factor, so r = num/den is EXACT rational arithmetic), and r6 is
    * one truncating division — negative-lag truncation verified
    * identical between Spark `div` and DuckDB `//` (both toward zero).
    *
    * Exactness envelope, stated precisely (the round-9b review caught
    * the first draft over-claiming): per-term products are ≤ (n·y)², so
    * num/den reach ~n·(n·y)² and r6's num·10⁶ must stay inside 38
    * digits ⇒ exact while |num| ≤ 1e31, i.e. daily volumes y ≤ ~1e10
    * per type against a 10⁴-day history — beyond that, rescale the
    * series first (divide daily counts by a fixed power of ten — the
    * standard instrument rescale; r is scale-invariant). The envelope
    * is ENFORCED, not assumed: Spark's non-ANSI decimal overflow would
    * return a silent NULL where DuckDB's HUGEINT errors, so the query
    * raises on the Spark side too instead of hash-diverging quietly. */
  private def e32Autocorrelation(s: SparkSession, d: String): DataFrame = {
    val maxLag = 10
    // ONE raw-volume pass: the spine bounds and the type list both
    // derive from the cached daily frame (min/max over day == min/max
    // over ts at day grain), never a second events scan
    val daily = Tables
      .events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .cache()
    val mm = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = mm.select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val dense = daily
      .select("event_type")
      .distinct()
      .crossJoin(broadcast(spine))
      .join(daily, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("y"))
    val st = dense
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("y").as("sy"))
    val z = dense
      .join(broadcast(st), "event_type")
      .withColumn("z", col("n") * col("y") - col("sy"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val lagCols = (1 to maxLag).map { l =>
      struct(lit(l).as("lag"), lead(col("z"), l).over(w).as("zl"))
    }
    val num = z
      .withColumn("ls", array(lagCols: _*))
      .select(col("event_type"), col("z"), explode(col("ls")).as("p"))
      .filter(col("p.zl").isNotNull)
      .groupBy(col("event_type"), col("p.lag").as("lag"))
      .agg(sum(col("z").cast("decimal(38,0)") * col("p.zl")).as("num_w"))
    val den = z
      .groupBy("event_type")
      .agg(sum(col("z").cast("decimal(38,0)") * col("z")).as("den_w"))
    num
      .join(broadcast(den), "event_type")
      // loud envelope guard (see Scaladoc): past it Spark's decimal
      // overflow NULLs silently while DuckDB errors — fail symmetrically
      .withColumn(
        "num_w",
        expr(
          "CASE WHEN abs(num_w) > CAST(1e31 AS DECIMAL(38,0)) " +
            "THEN raise_error('e32: |num| exceeds the exact-r6 envelope — rescale the daily series') " +
            "ELSE num_w END"
        )
      )
      // anchors are emitted as VARCHAR on both engines: exact at any
      // magnitude (decimal(38,0) ↔ HUGEINT render identically, scale 0,
      // no trailing zeros) and immune to the driver's decimal hash
      // canonicalization that redded this row in r9; a BIGINT cast would
      // NULL silently at 9.2e18 on the Spark side where DuckDB errors
      .withColumn("num", col("num_w").cast("string"))
      .withColumn("den", col("den_w").cast("string"))
      .withColumn("r6", expr("CAST((num_w * 1000000) div greatest(den_w, 1) AS BIGINT)"))
      .select("event_type", "lag", "num", "den", "r6")
      .orderBy("event_type", "lag")
  }

  val queries: Map[String, Q] = Map(
    "e32_autocorrelation" -> (e32Autocorrelation _),
    "e31_sequence_match" -> (e31SequenceMatch _),
    "e30_cooccurrence_lift" -> (e30CooccurrenceLift _),
    "e29_abandonment" -> (e29Abandonment _),
    "w8_session_window" -> (w8SessionWindow _),
    "e28_trend_fit" -> (e28TrendFit _),
    "e27_debounce" -> (e27Debounce _),
    "j12_scd_lookup" -> (j12ScdLookup _),
    "e26_survival_curve" -> (e26SurvivalCurve _),
    "e25_bot_regularity" -> (e25BotRegularity _),
    "e24_cadence_histogram" -> (e24CadenceHistogram _),
    "e23_engagement_gini" -> (e23EngagementGini _),
    "j11_nearest_align" -> (j11NearestAlign _),
    "e22_last_touch" -> (e22LastTouch _),
    "e21_growth_accounting" -> (e21GrowthAccounting _),
    "e17_stickiness" -> (e17Stickiness _),
    "e16_cohort_retention" -> (e16CohortRetention _),
    "e15_sliding_distinct" -> (e15SlidingDistinct _),
    "e14_bitmap_rollup" -> (e14BitmapRollup _),
    "e13_trending_ewma" -> (e13TrendingEwma _),
    "e12_sketch_rollup" -> (e12SketchRollup _),
    "e11_quantile_sketch" -> (e11QuantileSketch _),
    "e10_latest_per_key" -> (e10LatestPerKey _),
    "e9_conversion_lag" -> (e9ConversionLag _),
    "e8_anomaly_zscore" -> (e8AnomalyZscore _),
    "e7_rolling_active" -> (e7RollingActive _),
    "e6_retention_cohorts" -> (e6RetentionCohorts _),
    "e1_weekly_activity" -> (e1WeeklyActivity _),
    "e2_sessionize" -> (e2Sessionize _),
    "e18_session_paths" -> (e18SessionPaths _),
    "e19_markov_transitions" -> (e19MarkovTransitions _),
    "e20_scd_intervals" -> (e20ScdIntervals _),
    "j10_interval_overlap" -> (j10IntervalOverlap _),
    "j10b_concurrency_profile" -> (j10bConcurrencyProfile _),
    "e3_json_extract" -> (e3JsonExtract _),
    "e4_funnel" -> (e4Funnel _),
    "e5_approx_distinct" -> (e5ApproxDistinct _)
  )

  val oracles: Map[String, String] = Map(
    // e28's HUGEINT discipline at lag grain; `//` ≡ Spark `div` (both
    // truncate toward zero — verified on negative numerators)
    "e32_autocorrelation" ->
      """WITH mm AS (
           SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
           FROM events
         ), spine AS (
           SELECT CAST(unnest(generate_series(
             CAST((SELECT d0 FROM mm) AS TIMESTAMP),
             CAST((SELECT d1 FROM mm) AS TIMESTAMP),
             INTERVAL 1 DAY)) AS DATE) AS day
         ), daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS y
           FROM events GROUP BY 1, 2
         ), dense AS (
           SELECT t.event_type, s.day, COALESCE(d.y, 0) AS y
           FROM (SELECT DISTINCT event_type FROM events) t
           CROSS JOIN spine s
           LEFT JOIN daily d USING (event_type, day)
         ), st AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS sy
           FROM dense GROUP BY 1
         ), z AS (
           SELECT d.event_type, d.day, st.n * d.y - st.sy AS z
           FROM dense d JOIN st USING (event_type)
         ), num AS (
           SELECT a.event_type, l.lag,
             sum(CAST(a.z AS HUGEINT) * b.z) AS num_w
           FROM z a
           CROSS JOIN (SELECT CAST(unnest(range(1, 11)) AS INTEGER) AS lag) l
           JOIN z b ON b.event_type = a.event_type
                   AND b.day = a.day + l.lag
           GROUP BY 1, 2
         ), den AS (
           SELECT event_type, sum(CAST(z AS HUGEINT) * z) AS den_w
           FROM z GROUP BY 1
         )
         SELECT n.event_type, CAST(n.lag AS INTEGER) AS lag,
           CAST(n.num_w AS VARCHAR) AS num, CAST(d.den_w AS VARCHAR) AS den,
           CAST((n.num_w * 1000000) // greatest(d.den_w, 1) AS BIGINT) AS r6
         FROM num n JOIN den d USING (event_type)
         ORDER BY event_type, lag""",
    // e31: one (user, day)-keyed path agg, then the IDENTICAL RE2-safe
    // pattern — "no error between" as gap alternations, no lookahead
    "e31_sequence_match" ->
      """WITH ps AS (
           SELECT user_id, CAST(ts AS DATE) AS day,
             string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id)
               AS path,
             string_agg(CASE event_type
                          WHEN 'error' THEN 'e' WHEN 'view' THEN 'v'
                          WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
                          WHEN 'signup' THEN 's' ELSE 'x' END,
                        '' ORDER BY epoch_us(ts), event_id) AS cpath,
             count(*) AS n_events
           FROM events GROUP BY 1, 2
         )
         SELECT user_id, day, path, n_events
         FROM ps
         WHERE regexp_matches(cpath, 'v[^e]*c[^e]*p')
         ORDER BY user_id, day""",
    // e2's session CTEs + distinct (session, type) + in-session pair
    // join; lift6 cross-multiplies in HUGEINT (= Spark's decimal(38,0))
    "e30_cooccurrence_lift" ->
      """WITH base AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events
         ), flagged AS (
           SELECT user_id, event_id, event_type, us,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         ), sessioned AS (
           SELECT user_id, event_type,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
           FROM flagged
         ), st AS (
           SELECT DISTINCT user_id, session_id, event_type FROM sessioned
         ), ns AS (
           SELECT CAST(count(DISTINCT (user_id, session_id)) AS BIGINT)
             AS n_sessions
           FROM st
         ), tc AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
           FROM st GROUP BY event_type
         ), pairs AS (
           SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_ab
           FROM st a JOIN st b
             ON a.user_id = b.user_id AND a.session_id = b.session_id
            AND a.event_type < b.event_type
           GROUP BY type_a, type_b
         )
         SELECT type_a, type_b, n_ab, ta.n_t AS n_a, tb.n_t AS n_b,
           CAST((CAST(n_ab AS HUGEINT) * n_sessions * 1000000)
             // (CAST(ta.n_t AS HUGEINT) * tb.n_t) AS BIGINT) AS lift6
         FROM pairs
         JOIN tc ta ON ta.event_type = type_a
         JOIN tc tb ON tb.event_type = type_b
         CROSS JOIN ns
         ORDER BY type_a, type_b""",
    // the same forward carry (e22's idiom mirrored) — abandonment is a
    // per-row test, never a NOT EXISTS range join
    "e29_abandonment" ->
      """WITH base AS (
           SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us
           FROM events WHERE event_type IN ('click', 'purchase')
         ), carried AS (
           SELECT event_type, ts, us,
             first_value(CASE WHEN event_type = 'purchase'
                              THEN us END IGNORE NULLS) OVER w
               AS next_purchase_us
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
         ), intents AS (
           SELECT CAST(ts AS DATE) AS day,
             (next_purchase_us IS NULL
              OR next_purchase_us - us > 3600000000) AS abandoned
           FROM carried WHERE event_type = 'click'
         )
         SELECT day,
           CAST(count(*) AS BIGINT) AS n_intents,
           CAST(sum(CASE WHEN abandoned THEN 1 ELSE 0 END) AS BIGINT)
             AS n_abandoned,
           CAST((CAST(sum(CASE WHEN abandoned THEN 1 ELSE 0 END)
               AS BIGINT) * 1000000) // count(*) AS BIGINT) AS abandon6
         FROM intents GROUP BY day ORDER BY day""",
    // session_window's >= gap rule replayed via lag + running-sum ids;
    // span from per-session min/max us
    "w8_session_window" ->
      """WITH base AS (
           SELECT user_id, event_id, epoch_us(ts) AS us FROM events
         ), g AS (
           SELECT user_id, event_id, us,
             CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS ns
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         ), sess AS (
           SELECT user_id, us,
             CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS sid
           FROM g
         ), per AS (
           SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
             max(us) - min(us) AS span_us
           FROM sess GROUP BY user_id, sid
         )
         SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(sum(span_us) AS BIGINT) AS total_span_us,
           max(n_events) AS max_session_events
         FROM per GROUP BY user_id ORDER BY user_id""",
    // same daily counts + min-day offset; cross-terms in HUGEINT
    // (= Spark's decimal(38,0)); // truncates toward zero like div
    "e28_trend_fit" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS y
           FROM events GROUP BY event_type, day
         ), m AS (SELECT min(day) AS d0 FROM daily),
         xy AS (
           SELECT event_type,
             CAST(date_diff('day', d0, day) AS BIGINT) AS x, y
           FROM daily CROSS JOIN m
         ), s AS (
           SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy_w,
             sum(CAST(x AS HUGEINT) * x) AS sxx_w
           FROM xy GROUP BY event_type
         )
         SELECT event_type, n_days, sx, sy,
           CAST(sxy_w AS BIGINT) AS sxy, CAST(sxx_w AS BIGINT) AS sxx,
           CAST(((CAST(n_days AS HUGEINT) * sxy_w
                  - CAST(sx AS HUGEINT) * sy) * 1000000)
             // greatest(CAST(n_days AS HUGEINT) * sxx_w
                  - CAST(sx AS HUGEINT) * sx, 1) AS BIGINT) AS slope6
         FROM s ORDER BY event_type""",
    // same lag + running-sum burst ids; suppression6 is the identical
    // integer floor division
    "e27_debounce" ->
      """WITH base AS (
           SELECT user_id, event_type, event_id, epoch_us(ts) AS us
           FROM events
         ), g AS (
           SELECT user_id, event_type, event_id, us,
             lag(us) OVER (PARTITION BY user_id, event_type
                           ORDER BY us, event_id) AS prev
           FROM base
         ), f AS (
           SELECT user_id, event_type, event_id, us,
             CASE WHEN prev IS NULL OR us - prev >= 300000000
                  THEN 1 ELSE 0 END AS lead_edge
           FROM g
         ), b AS (
           SELECT event_type, user_id,
             CAST(sum(lead_edge) OVER (PARTITION BY user_id, event_type
               ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS burst
           FROM f
         ), bl AS (
           SELECT event_type, user_id, burst,
             CAST(count(*) AS BIGINT) AS blen
           FROM b GROUP BY event_type, user_id, burst
         )
         SELECT event_type,
           CAST(sum(blen) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(blen) - count(*) AS BIGINT) AS n_suppressed,
           max(blen) AS max_burst,
           CAST((CAST(sum(blen) - count(*) AS BIGINT) * 1000000)
             // CAST(sum(blen) AS BIGINT) AS BIGINT) AS suppression6
         FROM bl GROUP BY event_type ORDER BY event_type""",
    // the same carry windows replayed (e22's idiom) — run starts from the
    // lagged-carry type-change test, version carried into purchase rows
    "j12_scd_lookup" ->
      """WITH base AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events
         ), carried AS (
           SELECT user_id, event_id, event_type, us,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS) OVER wp
               AS prev_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS) OVER wc
               AS version_type
           FROM base
           WINDOW wp AS (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  wc AS (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ), runs AS (
           SELECT *, CASE WHEN event_type <> 'purchase'
                           AND (prev_type IS NULL
                                OR prev_type <> event_type)
                          THEN us END AS srun
           FROM carried
         ), vf AS (
           SELECT *, last_value(srun IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS version_from
           FROM runs
         )
         SELECT user_id, event_id, us, version_type, version_from,
           version_type IS NOT NULL AS covered
         FROM vf WHERE event_type = 'purchase' ORDER BY event_id""",
    // same user-keyed lifetime histogram + spine theta-join tail sums;
    // survival6 is the identical integer floor division in both engines
    "e26_survival_curve" ->
      """WITH life AS (
           SELECT user_id,
             date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
               AS lifetime
           FROM events GROUP BY user_id
         ), hist AS (
           SELECT lifetime, CAST(count(*) AS BIGINT) AS n_users
           FROM life GROUP BY lifetime
         ), tot AS (
           SELECT CAST(sum(n_users) AS BIGINT) AS n_total,
             max(lifetime) AS max_life
           FROM hist
         ), spine AS (
           SELECT unnest(range(0, max_life + 1)) AS k, n_total FROM tot
         )
         SELECT CAST(k AS BIGINT) AS k,
           CAST(sum(h.n_users) AS BIGINT) AS n_alive,
           n_total,
           CAST((CAST(sum(h.n_users) AS BIGINT) * 1000000) // n_total
             AS BIGINT) AS survival6
         FROM spine JOIN hist h ON h.lifetime >= spine.k
         GROUP BY k, n_total ORDER BY k""",
    // same lag + whole-second gaps; the regular flag is the pure-integer
    // cross-multiplied CV<1/2 test, cv is display math over exact sums
    "e25_bot_regularity" ->
      """WITH base AS (
           SELECT user_id, event_type, event_id, epoch_us(ts) AS us
           FROM events
         ), gaps AS (
           SELECT user_id, event_type,
             (us - lag(us) OVER w) // 1000000 AS gap_s
           FROM base
           WINDOW w AS (PARTITION BY user_id, event_type
                        ORDER BY us, event_id)
         ), sums AS (
           SELECT user_id, event_type,
             CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(gap_s) AS BIGINT) AS sum_s,
             CAST(sum(gap_s * gap_s) AS BIGINT) AS sumsq_s
           FROM gaps WHERE gap_s IS NOT NULL
           GROUP BY user_id, event_type
         )
         SELECT user_id, event_type, n_gaps, sum_s, sumsq_s,
           round(sqrt(CAST(n_gaps * sumsq_s - sum_s * sum_s AS DOUBLE))
                 / sum_s, 6) AS cv,
           (n_gaps * sumsq_s - sum_s * sum_s) * 4 < sum_s * sum_s AS regular
         FROM sums WHERE n_gaps >= 3 AND sum_s > 0
         ORDER BY user_id, event_type""",
    // same lag + bit-length bucket (bin() renders identically); integer
    // gap extremes anchor each bucket
    "e24_cadence_histogram" ->
      """WITH base AS (
           SELECT user_id, event_type, event_id, epoch_us(ts) AS us
           FROM events
         ), gaps AS (
           SELECT event_type, us - lag(us) OVER w AS gap_us
           FROM base
           WINDOW w AS (PARTITION BY user_id, event_type
                        ORDER BY us, event_id)
         )
         SELECT event_type,
           CAST(length(bin(gap_us)) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_gaps,
           min(gap_us) AS min_gap_us,
           max(gap_us) AS max_gap_us
         FROM gaps WHERE gap_us IS NOT NULL
         GROUP BY event_type, bucket
         ORDER BY event_type, bucket""",
    // histogram-keyed Lorenz windows (users never sorted); the Gini
    // trapezoid numerator is exact integer arithmetic
    "e23_engagement_gini" ->
      """WITH counts AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events
           GROUP BY user_id
         ), hist AS (
           SELECT n AS level, CAST(count(*) AS BIGINT) AS n_users,
             CAST(n * count(*) AS BIGINT) AS n_events
           FROM counts GROUP BY n
         ), cum AS (
           SELECT level, n_users, n_events,
             CAST(sum(n_users) OVER w AS BIGINT) AS cum_users,
             CAST(sum(n_events) OVER w AS BIGINT) AS cum_events
           FROM hist
           WINDOW w AS (ORDER BY level
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ), tot AS (
           SELECT max(cum_users) AS u, max(cum_events) AS e FROM cum
         ), g AS (
           SELECT CAST(sum(n_users * (2 * cum_events - n_events)) AS BIGINT)
             AS num
           FROM cum
         )
         SELECT level, n_users, cum_users, cum_events,
           round(CAST(cum_users AS DOUBLE) / u, 6) AS lorenz_users,
           round(CAST(cum_events AS DOUBLE) / e, 6) AS lorenz_events,
           CAST(NULL AS DOUBLE) AS gini
         FROM cum, tot
         UNION ALL
         SELECT NULL, u, u, e, 1.0, 1.0,
           round(1.0 - CAST(num AS DOUBLE) / (CAST(u AS DOUBLE) * e), 6)
         FROM tot, g
         ORDER BY level NULLS LAST""",
    // mirrored ignoreNulls carries over one user-keyed pass; unmatched
    // errors surface as NULL columns with aligned=false
    "j11_nearest_align" ->
      """WITH base AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events WHERE event_type IN ('error', 'click')
         ), carried AS (
           SELECT user_id, event_id, event_type, us,
             last_value(CASE WHEN event_type = 'click' THEN us END
                        IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_us,
             first_value(CASE WHEN event_type = 'click' THEN us END
                         IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_us
           FROM base
         ), picked AS (
           SELECT user_id, event_id, us,
             CASE WHEN prev_us IS NOT NULL
                       AND (next_us IS NULL OR us - prev_us <= next_us - us)
                  THEN prev_us ELSE next_us END AS cand
           FROM carried WHERE event_type = 'error'
         ), flagged AS (
           SELECT user_id, event_id, us, cand,
             cand IS NOT NULL AND abs(us - cand) <= 21600000000 AS aligned
           FROM picked
         )
         SELECT user_id, event_id, us,
           CASE WHEN aligned THEN cand END AS click_us,
           CASE WHEN aligned THEN abs(us - cand) END AS delta_us,
           aligned
         FROM flagged ORDER BY event_id""",
    // one carry-forward window (last IGNORE NULLS twice — consistent, the
    // carries null out on the same rows); integer μs bound + fixed-point
    // revenue anchor the hash, share is 6dp display math
    "e22_last_touch" ->
      """WITH base AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             CAST(round(value * 10000) AS BIGINT) AS value_f4
           FROM events
         ), carried AS (
           SELECT user_id, event_type, us, value_f4,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS) OVER w
               AS touch_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN us END IGNORE NULLS) OVER w AS touch_us
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ), attributed AS (
           SELECT CASE WHEN touch_us IS NOT NULL
                            AND us - touch_us <= 1800000000
                       THEN touch_type ELSE 'direct' END AS touch,
             value_f4
           FROM carried WHERE event_type = 'purchase'
         )
         SELECT touch, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(value_f4) AS BIGINT) AS revenue_f4,
           round(CAST(sum(value_f4) AS DOUBLE)
                 / (SELECT sum(value_f4) FROM attributed), 6) AS share
         FROM attributed GROUP BY touch ORDER BY touch""",
    // lag/lead over the distinct (type, user, week) frame; status and
    // churn contributions UNION into one agg (complete ledger — churn-only
    // weeks survive); integer counts anchor the hash, quick_ratio is 6dp
    // display math over them
    "e21_growth_accounting" ->
      """WITH uw AS (
           SELECT DISTINCT event_type, user_id,
             CAST(date_trunc('week', ts) AS DATE) AS week
           FROM events
         ), lagged AS (
           SELECT event_type, user_id, week,
             lag(week) OVER w AS prev, lead(week) OVER w AS nxt
           FROM uw
           WINDOW w AS (PARTITION BY event_type, user_id ORDER BY week)
         ), horizon AS (SELECT max(week) AS maxw FROM lagged
         ), contrib AS (
           SELECT event_type, week,
             CASE WHEN prev IS NULL THEN 1 ELSE 0 END AS is_new,
             CASE WHEN week - prev = 7 THEN 1 ELSE 0 END AS is_ret,
             CASE WHEN week - prev > 7 THEN 1 ELSE 0 END AS is_res,
             0 AS is_churn
           FROM lagged
           UNION ALL
           SELECT event_type, week + 7, 0, 0, 0, 1
           FROM lagged WHERE nxt IS NULL OR nxt - week > 7
         )
         SELECT event_type, week,
           CAST(sum(is_new) AS BIGINT) AS n_new,
           CAST(sum(is_ret) AS BIGINT) AS n_retained,
           CAST(sum(is_res) AS BIGINT) AS n_resurrected,
           CAST(sum(is_churn) AS BIGINT) AS n_churned,
           CASE WHEN sum(is_churn) > 0
                THEN round(CAST(sum(is_new) + sum(is_res) AS DOUBLE)
                           / sum(is_churn), 6)
           END AS quick_ratio
         FROM contrib, horizon WHERE week <= maxw
         GROUP BY event_type, week
         ORDER BY event_type, week""",
    // the whole point of the bitmap partial: the merged answer is EXACT,
    // so the oracle is plain count(DISTINCT) — no semi-oracle machinery
    "e14_bitmap_rollup" ->
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
           event_type,
           count(DISTINCT user_id) AS exact_users,
           count(DISTINCT CAST(ts AS DATE)) AS n_daily_partials
         FROM events GROUP BY 1, 2 ORDER BY week_start, event_type""",
    // exact-integer decayed sum: the weight table is the same Scala value
    // rendered as literals, so no pow() on either engine; score13 anchors
    // the hash, trend is a display division of an exact integer
    "e13_trending_ewma" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
         |  FROM events GROUP BY 1, 2
         |), mx AS (SELECT max(day) AS max_day FROM daily),
         |wt(lag, w) AS (VALUES $ewmaWeightValues)
         |SELECT event_type,
         |  CAST(sum(cnt * w) AS BIGINT) AS score13,
         |  round(CAST(sum(cnt * w) AS BIGINT) / 1e13, 6) AS trend
         |FROM daily, mx
         |JOIN wt ON datediff('day', day, max_day) = wt.lag
         |WHERE datediff('day', day, max_day) <= 13
         |GROUP BY event_type
         |ORDER BY score13 DESC, event_type""".stripMargin,
    // split-column semi-oracle: exact_users is checked value-for-value;
    // approx_ok compares each engine's OWN HLL estimate to the shared
    // exact count, so the sketch is verified without requiring the two
    // engines' sketches to agree bit-for-bit
    "e5_approx_distinct" ->
      """SELECT week_start, event_type, n_events, exact_users,
           abs(approx_users - exact_users) <= 0.15 * greatest(exact_users, 1)
             AS approx_ok
         FROM (
           SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
             event_type,
             count(*) AS n_events,
             count(DISTINCT user_id) AS exact_users,
             approx_count_distinct(user_id) AS approx_users
           FROM events GROUP BY 1, 2
         )
         ORDER BY week_start, event_type""",
    // exact weekly distinct hash-checked; the merged-partials estimate is
    // gated against it on the Spark side, DuckDB gates its own approx —
    // each engine verifies its own sketch against the shared exact column
    "e12_sketch_rollup" ->
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
           event_type,
           count(DISTINCT user_id) AS exact_users,
           abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
             <= 0.15 * greatest(count(DISTINCT user_id), 1) AS approx_ok
         FROM events GROUP BY 1, 2 ORDER BY week_start, event_type""",
    // exact p50/p95 hash-checked; each engine's own sketch (GK vs
    // t-digest) passes a rank gate against its own data — the sketch's
    // actual contract — instead of a cross-engine value compare. The gate
    // is widened by the tie mass at the sketch's answer (count of rows
    // EQUAL to it), mirroring the Spark side: count(<= v) overshoots v's
    // rank by its multiplicity, so a heavy value at the quantile must not
    // flip one engine's boolean (data-dependent flake, ADVICE r6)
    "e11_quantile_sketch" ->
      """WITH sk AS (
           SELECT event_type, count(*) AS n,
             quantile_cont(value, 0.5) AS ex50,
             quantile_cont(value, 0.95) AS ex95,
             approx_quantile(value, 0.5) AS ap50,
             approx_quantile(value, 0.95) AS ap95
           FROM events GROUP BY event_type
         )
         SELECT s.event_type, s.n,
           round(s.ex50, 4) AS p50,
           round(s.ex95, 4) AS p95,
           abs(sum(CASE WHEN e.value <= s.ap50 THEN 1 ELSE 0 END)
               - 0.5 * s.n) <= 0.02 * s.n + 1
               + sum(CASE WHEN e.value = s.ap50 THEN 1 ELSE 0 END) AS p50_ok,
           abs(sum(CASE WHEN e.value <= s.ap95 THEN 1 ELSE 0 END)
               - 0.95 * s.n) <= 0.02 * s.n + 1
               + sum(CASE WHEN e.value = s.ap95 THEN 1 ELSE 0 END) AS p95_ok
         FROM events e JOIN sk s USING (event_type)
         GROUP BY s.event_type, s.n, s.ex50, s.ex95, s.ap50, s.ap95
         ORDER BY s.event_type""",
    "e10_latest_per_key" ->
      """SELECT user_id, event_type, event_id, last_us, value_f4 FROM (
           SELECT user_id, event_type, event_id,
             epoch_us(ts) AS last_us,
             CAST(round(value * 10000) AS BIGINT) AS value_f4,
             row_number() OVER (PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
           FROM events
         ) WHERE rn = 1 ORDER BY user_id, event_type""",
    "e9_conversion_lag" ->
      """WITH per_user AS (
           SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
               AS signup_us
           FROM events GROUP BY user_id
           HAVING signup_us IS NOT NULL
         ), lags AS (
           SELECT e.user_id,
             min(CASE WHEN e.event_type = 'purchase'
                       AND epoch_us(e.ts) >= p.signup_us
                      THEN epoch_us(e.ts) END) - min(p.signup_us) AS lag_us
           FROM events e JOIN per_user p ON e.user_id = p.user_id
           GROUP BY e.user_id
         )
         SELECT count(*) AS n_signed_up_users,
           count(lag_us) AS n_converted,
           round(quantile_cont(lag_us, 0.5) / 1e6, 4) AS p50_lag_s,
           round(quantile_cont(lag_us, 0.9) / 1e6, 4) AS p90_lag_s,
           round(quantile_cont(lag_us, 0.99) / 1e6, 4) AS p99_lag_s
         FROM lags""",
    "e8_anomaly_zscore" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
           FROM events GROUP BY 1, 2
         ), win AS (
           SELECT event_type, day, n_events,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(n_events) OVER w AS BIGINT) AS s,
             CAST(sum(n_events * n_events) OVER w AS BIGINT) AS sumsq
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
         )
         SELECT event_type, day, n_events,
           CASE WHEN n = 7
                 AND (n * sumsq - s * s) / (n * (n - 1)) > 0
                THEN round((n_events - s / n)
                     / sqrt((n * sumsq - s * s) / (n * (n - 1))), 6)
           END AS z,
           coalesce(abs(CASE WHEN n = 7
                 AND (n * sumsq - s * s) / (n * (n - 1)) > 0
                THEN round((n_events - s / n)
                     / sqrt((n * sumsq - s * s) / (n * (n - 1))), 6)
           END) > 2.0, false) AS is_anomaly
         FROM win ORDER BY event_type, day""",
    // exact trailing-28 window at (user, day) grain; n_partials counts
    // the DISTINCT days contributing bitmaps to each window — the same
    // observability column e15 carries
    "e17_stickiness" ->
      """WITH base AS (
           SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
         ), days AS (SELECT DISTINCT day FROM base),
         dau AS (SELECT day, count(*) AS dau FROM base GROUP BY day),
         mau AS (
           SELECT d.day AS as_of, count(DISTINCT b.user_id) AS mau,
             count(DISTINCT b.day) AS n_partials
           FROM days d JOIN base b
             ON b.day <= d.day AND b.day >= d.day - 27
           GROUP BY d.day
         )
         SELECT m.as_of, u.dau, m.mau, m.n_partials,
           round(CAST(u.dau AS DOUBLE) / m.mau, 6) AS stickiness
         FROM mau m JOIN dau u ON u.day = m.as_of
         ORDER BY m.as_of""",
    // ordered week pairs from the spine LEFT JOIN the co-active counts,
    // so a pair with zero common users still appears (bitmap AND = 0)
    "e16_cohort_retention" ->
      """WITH uw AS (
           SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS week
           FROM events
         ), na AS (SELECT week, count(*) AS n_a FROM uw GROUP BY week),
         pairs AS (
           SELECT a.week AS week_a, b.week AS week_b
           FROM na a JOIN na b ON a.week <= b.week
         ), co AS (
           SELECT x.week AS week_a, y.week AS week_b, count(*) AS n_both
           FROM uw x JOIN uw y
             ON x.user_id = y.user_id AND x.week <= y.week
           GROUP BY 1, 2
         )
         SELECT p.week_a, p.week_b, na.n_a,
           COALESCE(co.n_both, 0) AS n_both,
           round(CAST(COALESCE(co.n_both, 0) AS DOUBLE) / na.n_a, 6)
             AS retention
         FROM pairs p
         JOIN na ON na.week = p.week_a
         LEFT JOIN co ON co.week_a = p.week_a AND co.week_b = p.week_b
         ORDER BY p.week_a, p.week_b""",
    // e7's trailing window reproduced at the DAY grain: the distinct
    // count is over users, the partial count over contributing days
    "e15_sliding_distinct" ->
      """WITH ud AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
         ), b AS (
           SELECT max(day) AS hi FROM ud
         ), fan AS (
           SELECT user_id, day, day + CAST(o AS INTEGER) AS as_of
           FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS o)
         )
         SELECT as_of,
           count(DISTINCT user_id) AS wau_7d,
           count(DISTINCT day) AS n_partials
         FROM fan CROSS JOIN b
         WHERE as_of <= hi
         GROUP BY as_of ORDER BY as_of""",
    "e7_rolling_active" ->
      """WITH ud AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
         ), b AS (
           SELECT max(day) AS hi FROM ud
         ), fan AS (
           SELECT user_id, day, day + CAST(o AS INTEGER) AS as_of
           FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS o)
         )
         SELECT as_of,
           count(DISTINCT CASE WHEN day = as_of THEN user_id END) AS dau,
           count(DISTINCT user_id) AS wau_7d,
           CAST(count(DISTINCT CASE WHEN day = as_of THEN user_id END)
             AS DOUBLE) / count(DISTINCT user_id) AS stickiness
         FROM fan CROSS JOIN b
         WHERE as_of <= hi
         GROUP BY as_of ORDER BY as_of""",
    "e6_retention_cohorts" ->
      """WITH uw AS (
           SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS week
           FROM events
         ), cohorts AS (
           SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id
         ), sizes AS (
           SELECT cohort_week, count(*) AS cohort_users
           FROM cohorts GROUP BY cohort_week
         ), ret AS (
           SELECT c.cohort_week,
             date_diff('day', c.cohort_week, uw.week) // 7 AS week_offset,
             count(DISTINCT uw.user_id) AS retained_users
           FROM uw JOIN cohorts c USING (user_id)
           GROUP BY 1, 2
         )
         SELECT r.cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
           retained_users, cohort_users,
           CAST(retained_users AS DOUBLE) / cohort_users AS retention_rate
         FROM ret r JOIN sizes USING (cohort_week)
         ORDER BY cohort_week, week_offset""",
    "e4_funnel" ->
      """WITH per_user AS (
           SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
               AS signup_us
           FROM events GROUP BY user_id
         ), conv AS (
           SELECT e.user_id,
             max(CASE WHEN e.event_type = 'purchase'
                       AND epoch_us(e.ts) >= p.signup_us
                       AND epoch_us(e.ts) <= p.signup_us + 604800000000
                      THEN 1 ELSE 0 END) AS converted
           FROM events e JOIN per_user p ON e.user_id = p.user_id
           GROUP BY e.user_id
         )
         SELECT count(*) AS n_signed_up_users,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           CAST(sum(converted) AS DOUBLE) / nullif(count(*), 0)
             AS conversion_rate
         FROM per_user JOIN conv USING (user_id)
         WHERE signup_us IS NOT NULL""",
    "e1_weekly_activity" ->
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start, event_type,
         count(DISTINCT user_id) AS users, count(*) AS n_events,
         CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS value_f4
         FROM events GROUP BY 1, 2 ORDER BY week_start, event_type""",
    "e2_sessionize" ->
      """WITH base AS (
           SELECT user_id, event_id, epoch_us(ts) AS us FROM events
         ), flagged AS (
           SELECT user_id, event_id, us,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         ), sessioned AS (
           SELECT user_id, us,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
           FROM flagged
         ), per_session AS (
           SELECT user_id, session_id, count(*) AS n_events,
             max(us) - min(us) AS span_us
           FROM sessioned GROUP BY user_id, session_id
         )
         SELECT user_id, count(*) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(sum(span_us) AS BIGINT) AS total_span_us,
           max(n_events) AS max_session_events
         FROM per_session GROUP BY user_id ORDER BY user_id""",
    // e2's session CTEs + in-session ordered path via string_agg; top-20
    // with the (count desc, path asc) tie-break the Spark side pins
    "e18_session_paths" ->
      """WITH base AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
         ), flagged AS (
           SELECT user_id, event_id, event_type, us,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         ), sessioned AS (
           SELECT user_id, event_id, event_type, us,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
           FROM flagged
         ), per_session AS (
           SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY us, event_id) AS path,
             count(*) AS n_events
           FROM sessioned GROUP BY user_id, session_id
         )
         SELECT path, count(*) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events
         FROM per_session GROUP BY path
         ORDER BY n_sessions DESC, path ASC LIMIT 20""",
    // same-type run-length segmentation via lag flag + running sum, the
    // segment-grain lead carries valid_to; open segments stay NULL
    "e20_scd_intervals" ->
      """WITH base AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
         ), flagged AS (
           SELECT user_id, event_id, event_type, us,
             CASE WHEN lag(event_type) OVER w IS NULL
                       OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         ), segged AS (
           SELECT user_id, event_type, us,
             CAST(sum(chg) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS seg_id
           FROM flagged
         ), segs AS (
           SELECT user_id, seg_id, min(event_type) AS event_type,
             min(us) AS valid_from_us, count(*) AS n_events
           FROM segged GROUP BY user_id, seg_id
         )
         SELECT user_id, seg_id, event_type, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY seg_id)
             AS valid_to_us,
           n_events
         FROM segs ORDER BY user_id, seg_id""",
    // same session CTEs; in-session bigram lag, exact counts, 6dp ratio
    "e19_markov_transitions" ->
      """WITH base AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
         ), flagged AS (
           SELECT user_id, event_id, event_type, us,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         ), sessioned AS (
           SELECT user_id, event_id, event_type, us,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
           FROM flagged
         ), bigrams AS (
           SELECT
             lag(event_type) OVER w2 AS prev_type,
             lag(session_id) OVER w2 AS prev_session,
             session_id, event_type
           FROM sessioned
           WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id)
         ), trans AS (
           SELECT prev_type, event_type, count(*) AS n
           FROM bigrams
           WHERE prev_type IS NOT NULL AND prev_session = session_id
           GROUP BY prev_type, event_type
         )
         SELECT prev_type, event_type, n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY prev_type), 6) AS p
         FROM trans ORDER BY prev_type, event_type""",
    // e2's session CTEs verbatim + the naive overlap self-join the binned
    // equi-join must exactly reproduce (count at session-pair grain)
    "j10_interval_overlap" ->
      """WITH base AS (
           SELECT user_id, event_id, epoch_us(ts) AS us FROM events
         ), flagged AS (
           SELECT user_id, event_id, us,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         ), sessioned AS (
           SELECT user_id, us,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
           FROM flagged
         ), iv AS (
           SELECT user_id, session_id, min(us) AS s_us, max(us) AS e_us
           FROM sessioned GROUP BY user_id, session_id
         )
         SELECT a.user_id AS user_a, b.user_id AS user_b,
           count(*) AS n_overlaps
         FROM iv a JOIN iv b
           ON a.user_id < b.user_id
          AND a.s_us <= b.e_us AND b.s_us <= a.e_us
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "j10b_concurrency_profile" ->
      """WITH base AS (
           SELECT user_id, event_id, epoch_us(ts) AS us FROM events
         ), flagged AS (
           SELECT user_id, event_id, us,
             CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
           FROM base
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         ), sessioned AS (
           SELECT user_id, us,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
           FROM flagged
         ), iv AS (
           SELECT user_id, session_id, min(us) AS s_us, max(us) AS e_us
           FROM sessioned GROUP BY user_id, session_id
         ), pieces AS (
           SELECT unnest(generate_series(s_us // 86400000000,
                                         e_us // 86400000000)) AS day_num,
                  s_us, e_us
           FROM iv
         ), pc AS (
           SELECT day_num,
                  greatest(s_us, day_num * 86400000000) AS ps,
                  least(e_us, (day_num + 1) * 86400000000 - 1) AS pe
           FROM pieces
         ), edges AS (
           SELECT day_num, ps AS us, CAST(1 AS BIGINT) AS delta FROM pc
           UNION ALL
           SELECT day_num, pe + 1 AS us, CAST(-1 AS BIGINT) AS delta FROM pc
         ), swept AS (
           SELECT day_num, delta,
             sum(delta) OVER (PARTITION BY day_num ORDER BY us, delta) AS active
           FROM edges
         )
         SELECT day_num,
           CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sessions,
           CAST(max(active) AS BIGINT) AS max_concurrent
         FROM swept GROUP BY day_num ORDER BY day_num""",
    "e3_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         count(*) AS n_events,
         CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS value_f4
         FROM events GROUP BY k ORDER BY k"""
  )
}
