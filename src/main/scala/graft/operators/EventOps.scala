package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** [EXT] Time-bucketed analytics over the `events` table. The
  * reference has no temporal surface at all (its dates are inert
  * strings — SURVEY.md §1.2), so these model the batch side of a
  * streaming pipeline: tumbling-window rollups and gap-based
  * sessionization. The Structured Streaming twins of these plans live
  * in graft.streaming (same logical shapes via readStream).
  *
  * Timestamps: events.ts is parquet TIMESTAMP(NANOS); Tables.loadEvents
  * rebuilds a microsecond timestamp. Oracles CAST to TIMESTAMP (micros)
  * so both engines truncate identically. Bucket keys are exported as
  * epoch seconds (long) — engine-neutral, no tz/format drift.
  */
object EventOps {
  type Q = (SparkSession, String) => DataFrame

  /** q50 — hourly tumbling rollup per event type: the canonical
    * pre-aggregation shape. Narrow truncation + hash aggregate; output
    * cardinality = hours × types, so the shuffle carries partial
    * states only. At 100 TB this is the query that motivates
    * date-partitioned storage (scan prunes to the queried window). */
  val q50HourlyRollup: Q = (spark, dir) =>
    Tables.load(spark, dir, "events")
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        graft.functions.Exact.moneySum(col("value")).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour_epoch", "event_type")

  val q50Oracle: String =
    """SELECT CAST(FLOOR(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP)))) AS BIGINT) AS hour_epoch,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2 ORDER BY hour_epoch, event_type""".stripMargin

  /** q51 — gap-based sessionization: a new session starts when a user
    * is idle > 30 min; emits per-session bounds and stats. Classic
    * lag + running-sum window pair; the only shuffle is the
    * partitionBy(user_id), which is exactly the key a real pipeline
    * would already be bucketed on. */
  val q51Sessionize: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.load(spark, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_timestamp(min(col("ts"))).as("start_epoch"),
        unix_timestamp(max(col("ts"))).as("end_epoch"),
        graft.functions.Exact.moneySum(col("value")).as("session_value"))
      .orderBy("user_id", "session_seq")
  }

  val q51Oracle: String =
    """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |flagged AS (
      |  SELECT *,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR date_diff('second', LAG(ts) OVER w, ts) > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      |  FROM flagged)
      |SELECT user_id, session_seq, COUNT(*) AS n_events,
      |  CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS start_epoch,
      |  CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS end_epoch,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |FROM sessions GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** q52 — per-type daily top spender: windowed rank over a grouped
    * aggregate (two-level: day×type×user rollup, then rank within
    * day×type). Exercises agg → window → filter chaining. */
  val q52DailyTopUser: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.load(spark, dir, "events")
      .groupBy(
        unix_timestamp(date_trunc("day", col("ts"))).as("day_epoch"),
        col("event_type"), col("user_id"))
      .agg(graft.functions.Exact.moneySum(col("value")).as("user_value"))
    val w = Window.partitionBy("day_epoch", "event_type")
      .orderBy(col("user_value").desc, col("user_id"))
    daily.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .orderBy("day_epoch", "event_type")
  }

  val q52Oracle: String =
    """WITH daily AS (
      |  SELECT CAST(FLOOR(epoch(date_trunc('day', CAST(ts AS TIMESTAMP)))) AS BIGINT) AS day_epoch,
      |    event_type, user_id,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS user_value
      |  FROM events GROUP BY 1, 2, 3),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY day_epoch, event_type
      |    ORDER BY user_value DESC, user_id) AS rnk
      |  FROM daily)
      |SELECT day_epoch, event_type, user_id, user_value, rnk FROM ranked
      |WHERE rnk = 1 ORDER BY day_epoch, event_type""".stripMargin

  /** q53 — the at-scale twin of q50's exact COUNT(DISTINCT user_id):
    * HyperLogLog++ via approx_count_distinct. Exact distinct needs a
    * second shuffle keyed on (group, user); the sketch merges in the
    * same single exchange as the other aggregates — at 100 TB this is
    * the difference between one pass and two (the PRODUCTION call is
    * the HLL-only agg; that one-pass shape is what the scaladoc's
    * scale argument describes).
    *
    * HASH-VERIFIED since round 16 (the round-15 verdict's rows-only
    * shrink): a sketch value itself is engine-internal, so instead of
    * faking cross-engine precision the query emits the EXACT distinct
    * count alongside a boolean asserting the HLL estimate landed
    * within ±3σ of it (σ = [[HllDefaultRsd]]·exact — the rsd this
    * query's approx_count_distinct call uses, Spark's documented
    * default; floored at 1 for tiny groups where the sparse-mode
    * sketch is exact). 3σ, not 2σ, since round 17 (ADVICE): the rsd is
    * a ~95%-per-group statistical guarantee at 2σ, so a new fixture or
    * an HLL++ implementation change could legitimately push one group
    * past 2σ and report estimator tail behavior as an engine bug;
    * 3σ (~99.7%) keeps the gate meaningful — a broken sketch is orders
    * of magnitude off, not 15% — without pinning it to this fixture.
    * The oracle recomputes the exact count and asserts the flag TRUE
    * by construction — an out-of-bound estimate flips Spark's flag to
    * false and hash-fails. The exactness of the count and the
    * boundedness of the sketch are both verified; the estimate's exact
    * value, which no other engine can replay, is deliberately not part
    * of the contract (EventTextSpec additionally bounds the raw
    * estimate against q50's exact count). */
  val q53ApproxUsers: Q = (spark, dir) =>
    Tables.load(spark, dir, "events")
      .groupBy(
        unix_timestamp(date_trunc("day", col("ts"))).as("day_epoch"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("day_epoch"), col("event_type"), col("n_events"),
        col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double") <=
          greatest(lit(1.0), lit(3 * HllDefaultRsd) * col("exact_users")))
          .as("hll_within_3sd"))
      .orderBy("day_epoch", "event_type")

  /** Spark's documented default relativeSD for approx_count_distinct
    * — the ONE constant q53's band derives from, so passing an
    * explicit rsd to the agg can never silently desync the gate
    * (round-17 ADVICE). */
  private val HllDefaultRsd = 0.05

  val q53Oracle: String =
    """SELECT CAST(FLOOR(epoch(date_trunc('day', CAST(ts AS TIMESTAMP)))) AS BIGINT) AS day_epoch,
      |  event_type, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS exact_users,
      |  TRUE AS hll_within_3sd
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q150 — EVENT BURST DETECTION ([EXT], round 16): per-type daily
    * z-scores over the event stream — the ingest-monitoring analytic
    * a continuously-fed training-data lake runs beside its pipelines
    * (a crawler source going hot, a bot flood, a dead feed all show
    * up as |z| spikes on per-type volume long before they poison
    * downstream dedup/mixing stats). Two-level shape: the q50-style
    * day×type hash rollup REDUCES the stream to |days|×|types| rows
    * (the only pass over raw events — partial+final agg, one
    * exchange), then mean/stddev ride a whole-partition window over
    * that tiny relation; at 100 TB the window input is still
    * thousands of rows. Determinism: counts are exact integers; the
    * z-score is ROUNDed to 4 (double fold noise ~1e-15 rel, the q44
    * precedent) and the burst flag compares the ROUNDED score (q35's
    * rank-on-the-rounded-value discipline), so the boolean cannot
    * float-flip between engines; a zero/undefined stddev (constant or
    * singleton type) pins z to 0 by CASE in both engines. */
  val q150BurstDetection: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.load(spark, dir, "events")
      .groupBy(
        unix_timestamp(date_trunc("day", col("ts"))).as("day_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type")
    daily
      .withColumn("mu", avg(col("n_events")).over(w))
      .withColumn("sigma",
        coalesce(stddev(col("n_events")).over(w), lit(0.0)))
      .withColumn("z_score",
        round(when(col("sigma") === 0.0, lit(0.0))
          .otherwise((col("n_events") - col("mu")) / col("sigma")), 4))
      .select(col("event_type"), col("day_epoch"), col("n_events"),
        col("z_score"), (abs(col("z_score")) > 2.0).as("is_burst"))
      .orderBy("event_type", "day_epoch")
  }

  val q150Oracle: String =
    """WITH daily AS (
      |  SELECT CAST(FLOOR(epoch(date_trunc('day', CAST(ts AS TIMESTAMP)))) AS BIGINT) AS day_epoch,
      |    event_type, COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |z AS (
      |  SELECT event_type, day_epoch, n_events,
      |    ROUND(CASE
      |      WHEN COALESCE(STDDEV(n_events) OVER (PARTITION BY event_type), 0) = 0
      |        THEN 0
      |      ELSE (n_events - AVG(n_events) OVER (PARTITION BY event_type))
      |           / STDDEV(n_events) OVER (PARTITION BY event_type)
      |      END, 4) AS z_score
      |  FROM daily)
      |SELECT event_type, day_epoch, n_events, z_score,
      |  ABS(z_score) > 2.0 AS is_burst
      |FROM z ORDER BY event_type, day_epoch""".stripMargin

  /** q54 — AS-OF JOIN: for every purchase, the user's latest click
    * strictly before it (attribution's core primitive; DuckDB ships it
    * as a dedicated `ASOF JOIN` operator). Spark-first formulation:
    * tag both event streams in ONE relation and take
    * `last(click_ts, ignoreNulls)` over a per-user time-ordered window
    * bounded at 1 PRECEDING — a single user_id shuffle + sort, no
    * join at all, no per-key driver loops, and every user's timeline
    * is processed independently (perfectly partitionable at 100 TB).
    * The naive alternative — a range self-join click×purchase with a
    * max-per-purchase aggregate — fans out quadratically on active
    * users; the window shape is linear in events. Micros epoch keys
    * keep both engines' sub-second ordering identical. */
  val q54AsofJoin: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("click_us",
        when(col("event_type") === "click", col("ts_us")))
      .withColumn("last_click_us",
        last(col("click_us"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("last_click_us").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts_us").as("purchase_us"),
        col("last_click_us"),
        expr("(ts_us - last_click_us) div 1000000").as("gap_s"))
      .orderBy("event_id")
  }

  /** Staged AS MATERIALIZED (round 14): the plain-CTE form OOM'd the
    * round-13 driver checker on a memory-starved host ("failed to
    * allocate block of 16 KB") — the same failure class the
    * q57/q76/q78/q82/q83 conversions cleared in round 13.
    * Materializing each stage bounds the window operator's input to
    * an already-computed narrow relation instead of a fused
    * scan+filter+window pipeline, and the final projection runs over
    * a second small materialized stage. Replayed vs the plain form at
    * sf0.01: identical rows; verified under a fork-isolated 256 MB
    * cap (tools/capwalk.py, capwalk_r14.txt). */
  val q54Oracle: String =
    """WITH o54_ev AS MATERIALIZED (
      |  SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |o54_m AS MATERIALIZED (
      |  SELECT event_id, user_id, event_type, ts_us,
      |    LAST_VALUE(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_us
      |  FROM o54_ev)
      |SELECT event_id, user_id, ts_us AS purchase_us, last_click_us,
      |  (ts_us - last_click_us) // 1000000 AS gap_s
      |FROM o54_m WHERE event_type = 'purchase' AND last_click_us IS NOT NULL
      |ORDER BY event_id""".stripMargin

  /** q55 — RANGE JOIN (point-in-interval): count error events inside
    * each user session's [start, end] bounds. Spark has no native
    * interval-join operator — the naive formulation
    * `sessions JOIN events ON user AND ts BETWEEN start AND end` plans
    * as a per-user BroadcastNestedLoopJoin. The scalable composition:
    * snap both sides onto a 30-minute bucket GRID (sessions explode
    * into the buckets they span — `sequence` generator, codegen'd;
    * each point maps to exactly one bucket) and equi-join on (user,
    * bucket) + exact BETWEEN refine. Hash-shuffle join, work linear in
    * points + interval-bucket spans; a point matches each interval in
    * at most one bucket, so no dedup pass is needed. Grid step trades
    * fan-out vs candidate precision — the classic interval-index knob.
    */
  val q55RangeJoin: Q = (spark, dir) => {
    val sessions = q51Sessionize(spark, dir)
      .select(col("user_id"), col("session_seq"),
        col("start_epoch"), col("end_epoch"))
    val sBuckets = sessions.select(col("user_id"), col("session_seq"),
      col("start_epoch"), col("end_epoch"),
      explode(expr("sequence(start_epoch div 1800, end_epoch div 1800)"))
        .as("bucket"))
    val errs = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"),
        unix_timestamp(col("ts")).as("err_epoch"))
      .withColumn("bucket", expr("err_epoch div 1800"))
    sBuckets.join(errs,
        sBuckets("user_id") === errs("e_user") &&
          sBuckets("bucket") === errs("bucket"))
      .filter(col("err_epoch").between(col("start_epoch"), col("end_epoch")))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_errors"))
      .orderBy("user_id", "session_seq")
  }

  /** Staged AS MATERIALIZED (round 14, same driver-OOM clearance as
    * q54): `e` is consumed TWICE (sessionization chain + the error
    * probe side of the final join) — materializing it stops the
    * re-inline, and each window stage runs over a pre-computed narrow
    * relation. The error side is pre-filtered into its own stage so
    * the interval join probes a small materialized relation instead
    * of re-scanning events. Replayed vs the plain form at sf0.01:
    * identical rows; 256 MB capwalk green. */
  val q55Oracle: String =
    """WITH o55_e AS MATERIALIZED (
      |  SELECT event_id, user_id, event_type,
      |    CAST(ts AS TIMESTAMP) AS ts FROM events),
      |o55_flagged AS MATERIALIZED (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR date_diff('second', LAG(ts) OVER w, ts) > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM o55_e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |o55_numbered AS MATERIALIZED (
      |  SELECT user_id, ts, CAST(SUM(new_session) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      |  FROM o55_flagged),
      |o55_sess AS MATERIALIZED (
      |  SELECT user_id, session_seq,
      |    CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS start_epoch,
      |    CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS end_epoch
      |  FROM o55_numbered GROUP BY user_id, session_seq),
      |o55_err AS MATERIALIZED (
      |  SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS err_epoch
      |  FROM o55_e WHERE event_type = 'error')
      |SELECT s.user_id, s.session_seq, COUNT(*) AS n_errors
      |FROM o55_sess s JOIN o55_err err
      |  ON err.user_id = s.user_id
      |  AND err.err_epoch BETWEEN s.start_epoch AND s.end_epoch
      |GROUP BY s.user_id, s.session_seq
      |ORDER BY s.user_id, s.session_seq""".stripMargin

  /** q57 — NATIVE session windows: `session_window(ts, gap)`, Spark's
    * built-in gap-session operator, as the cross-check twin of q51's
    * hand-built lag + running-sum sessionization. Boundary semantics,
    * pinned by EventTextSpec on a crafted fixture: a session whose end
    * TOUCHES the next event's start merges (split only at gap
    * STRICTLY > 30 min — same `>` as q51), but the gap is measured in
    * exact MICROSECONDS where q51 floors both timestamps to whole
    * seconds first — so the two can differ on sub-second data when a
    * true gap straddles 1800 s while its floored difference does not.
    * The DuckDB oracle replays the native operator's exact-micros
    * semantics, so this query hash-matches on its own; EventTextSpec
    * pins it against a manual window-algebra twin built with the SAME
    * semantics (operator vs algebra must agree row-for-row), and the
    * batch plan is the same one Structured Streaming runs with a
    * watermark (session_window is streaming-native — SURVEY §2.7).
    * Scale shape: one user_id shuffle, sessions assembled per-user —
    * identical posture to q51. */
  val q57SessionWindow: Q = (spark, dir) =>
    Tables.load(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Exact.moneySum(col("value")).as("session_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "start_us")

  /** ONE statement, AS-MATERIALIZED stages (round 13): each window
    * pass still evaluates exactly once (no CTE re-inlining — the
    * round-10 OOM), but inside a single statement so the driver
    * checker's multi-statement handling (the round-12 empty-file
    * incident) can't be tripped. Identical window algebra; the hash
    * contract is unchanged. */
  val q57Oracle: String =
    """WITH o57_flagged AS MATERIALIZED (
      |  SELECT *,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR date_diff('microsecond', LAG(ts) OVER w, ts) > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      |        FROM events)
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |o57_sessions AS MATERIALIZED (
      |  SELECT user_id, ts, value, CAST(SUM(new_session) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      |  FROM o57_flagged)
      |SELECT user_id,
      |  epoch_us(MIN(ts)) AS start_us,
      |  epoch_us(MAX(ts)) + 1800000000 AS end_us,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |FROM o57_sessions GROUP BY user_id, session_seq
      |ORDER BY user_id, start_us""".stripMargin

  /** q56 — JSON property extraction + rollup over the `props` column
    * (every event carries a JSON payload; training-data events always
    * do). `get_json_object` is Spark's codegen'd JSON path evaluator —
    * extraction happens per-row in the scan stage, the aggregate only
    * sees the extracted long. */
  val q56JsonProps: Q = (spark, dir) =>
    Tables.load(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val q56Oracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The fact-⋈-dimension deviation pipeline behind [[q82SaltedJoin]],
    * with the salt width as a parameter so DedupSpec-style equality
    * (salted == unsalted) is a one-liner. `salt = None` plans the
    * plain user_id shuffle join; `Some(s)` the salted one. */
  private[graft] def userDeviation(spark: SparkSession, dir: String,
      salt: Option[Int]): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    // Amplify one hot key in-query (q30's injected-work precedent):
    // every user-0 event gets 20 extra copies, so user 0 carries ~60%
    // of the join's rows — the boilerplate-user / null-key-bucket
    // shape that makes an unsalted shuffle join straggle at scale.
    val hot = ev.filter(col("user_id") === 0)
      .withColumn("rep", explode(expr("sequence(1, 20)")))
      .select((col("event_id") + col("rep") * lit(100000000L)).as("event_id"),
        col("user_id"), col("event_type"), col("value"))
    val fact = ev.unionByName(hot)
    val stats = fact.groupBy("user_id").agg(avg(col("value")).as("user_avg"))
    val joined = salt match {
      case None => fact.join(stats, Seq("user_id"))
      case Some(s) =>
        // fact side: deterministic shard off the row key (replayable,
        // unlike a random salt — retries land identically); dim side:
        // replicated s ways so every (user, salt) bucket has its row.
        // The hot key's rows now spread across s reducers instead of
        // one; the dim grows |dim|×s — the trade salting buys.
        val salted = fact.withColumn("salt",
          pmod(col("event_id"), lit(s)).cast("int"))
        val statsX = stats.withColumn("salt",
          explode(expr(s"sequence(0, ${s - 1})")))
        salted.join(statsX, Seq("user_id", "salt"))
    }
    joined
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        round(avg(abs(col("value") - col("user_avg"))), 4).as("avg_abs_dev"))
      .orderBy("event_type")
  }

  /** q82 — SALTED shuffle join: the skew-mitigation shape for a
    * big-⋈-big equi join whose key histogram has a hyper-hot entry
    * (one power user / boilerplate key / null bucket). The salt is
    * INVISIBLE in the result — the oracle is the plain join SQL — and
    * equality with the unsalted plan is asserted in EventTextSpec.
    * This is the hand-rolled counterpart to AQE's skew-join split
    * (which only rewrites sort-merge joins AFTER a shuffle
    * materializes the skew; salting fixes the layout before it
    * exists, and composes with map-side aggregation upstream). The
    * per-event deviation vs the user's mean is the kind of per-row ⋈
    * per-key-aggregate join a feature pipeline runs constantly. */
  val q82SaltedJoin: Q = (spark, dir) => userDeviation(spark, dir, Some(8))

  val q82Oracle: String =
    """WITH fact AS (
      |  SELECT event_id, user_id, event_type, value FROM events
      |  UNION ALL
      |  SELECT event_id + r * 100000000, user_id, event_type, value
      |  FROM events, UNNEST(range(1, 21)) g(r) WHERE user_id = 0),
      |stats AS (SELECT user_id, AVG(value) AS user_avg FROM fact GROUP BY 1)
      |SELECT event_type, COUNT(*) AS n_events,
      |  ROUND(AVG(ABS(value - user_avg)), 4) AS avg_abs_dev
      |FROM fact JOIN stats USING (user_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q118 — FUNNEL ANALYSIS ([EXT], round 11): the classic ordered-
    * sequence metric over the event stream — per user, the FIRST-TOUCH
    * click → view → purchase progression: t1 = the user's first click,
    * t2 = first view at-or-after t1, t3 = first purchase at-or-after
    * t2; the funnel completes iff t3 − t1 ≤ 1 hour. First-touch
    * anchoring (vs maximal-window search) is the standard product
    * metric and — unlike per-row patterns — is a pure composition of
    * conditional MINs, so the whole operator is engine-replayable and
    * hash-verified. Emits one row per user who clicked, with stage
    * timestamps (epoch micros, null if never reached) and the
    * completion flag. Shapes at scale: three filtered aggregations all
    * keyed by user_id — ONE shuffle family, co-partitioned joins (AQE
    * merges them); no windows over the full stream, no event-order
    * state. */
  val q118Funnel: Q = (spark, dir) => {
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val c1 = e.filter(col("event_type") === "click")
      .groupBy("user_id").agg(min(col("us")).as("t1"))
    val v2 = e.filter(col("event_type") === "view")
      .join(c1, "user_id").filter(col("us") >= col("t1"))
      .groupBy("user_id").agg(min(col("us")).as("t2"))
    val p3 = e.filter(col("event_type") === "purchase")
      .join(v2, "user_id").filter(col("us") >= col("t2"))
      .groupBy("user_id").agg(min(col("us")).as("t3"))
    c1.join(v2, Seq("user_id"), "left")
      .join(p3, Seq("user_id"), "left")
      .select(col("user_id"), col("t1"), col("t2"), col("t3"),
        (col("t3").isNotNull &&
          col("t3") - col("t1") <= 3600L * 1000000L).as("completed"))
      .orderBy("user_id")
  }

  val q118Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |c1 AS (SELECT user_id, MIN(us) AS t1 FROM e
      |  WHERE event_type = 'click' GROUP BY 1),
      |v2 AS (SELECT e.user_id, MIN(us) AS t2
      |  FROM e JOIN c1 ON c1.user_id = e.user_id
      |  WHERE event_type = 'view' AND us >= t1 GROUP BY 1),
      |p3 AS (SELECT e.user_id, MIN(us) AS t3
      |  FROM e JOIN v2 ON v2.user_id = e.user_id
      |  WHERE event_type = 'purchase' AND us >= t2 GROUP BY 1)
      |SELECT c1.user_id, t1, t2, t3,
      |  COALESCE(t3 - t1 <= 3600000000, FALSE) AS completed
      |FROM c1 LEFT JOIN v2 ON v2.user_id = c1.user_id
      |LEFT JOIN p3 ON p3.user_id = c1.user_id
      |ORDER BY c1.user_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q118_funnel" -> q118Funnel,
    "q82_salted_join" -> q82SaltedJoin,
    "q54_asof_join" -> q54AsofJoin,
    "q55_range_join" -> q55RangeJoin,
    "q56_json_props" -> q56JsonProps,
    "q57_session_window" -> q57SessionWindow,
    "q50_hourly_rollup" -> q50HourlyRollup,
    "q51_sessionize" -> q51Sessionize,
    "q52_daily_top_user" -> q52DailyTopUser,
    "q53_approx_users" -> q53ApproxUsers,
    "q150_burst_detection" -> q150BurstDetection)

  val oracles: Map[String, String] = Map(
    "q118_funnel" -> q118Oracle,
    "q82_salted_join" -> q82Oracle,
    "q54_asof_join" -> q54Oracle,
    "q55_range_join" -> q55Oracle,
    "q56_json_props" -> q56Oracle,
    "q57_session_window" -> q57Oracle,
    "q50_hourly_rollup" -> q50Oracle,
    "q51_sessionize" -> q51Oracle,
    "q52_daily_top_user" -> q52Oracle,
    "q53_approx_users" -> q53Oracle,
    "q150_burst_detection" -> q150Oracle)
}
