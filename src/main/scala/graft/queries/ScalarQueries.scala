package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function breadth (strings, dates, null handling — all
  * engine-exact operations; transcendentals are deliberately excluded from
  * oracle outputs since libm ulp behavior differs across engines) plus the
  * batch twin of gap sessionization (lag + running-sum windows).
  */
object ScalarQueries {
  import Q.QueryFn

  val defs: Map[String, QueryFn] = Map(
    "sc_string_funcs" -> ((s, dir) => {
      Tables.customer(s, dir).selectExpr(
        "c_custkey",
        "UPPER(c_name) AS name_u",
        "LOWER(c_mktsegment) AS seg_l",
        "SUBSTRING(c_name, 1, 8) AS name_pre",
        "LENGTH(TRIM(c_name)) AS name_len",
        "CONCAT_WS('|', c_mktsegment, c_name) AS tagged",
        "LPAD(CAST(c_custkey AS STRING), 8, '0') AS key_pad",
        "REPLACE(c_name, '#', '-') AS name_r")
    }),

    "sc_date_funcs" -> ((s, dir) => {
      Tables.orders(s, dir).selectExpr(
        "o_orderkey",
        "YEAR(o_orderdate) AS y",
        "MONTH(o_orderdate) AS m",
        "DAY(o_orderdate) AS d",
        "CAST(DATE_ADD(CAST(o_orderdate AS DATE), 30) AS TIMESTAMP) AS due_ts",
        "LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end",
        "DATEDIFF(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS days_since")
    }),

    // Datetime breadth beyond sc_date_funcs: truncation, calendar parts,
    // month arithmetic (both engines clamp end-of-month).
    "sc_date_funcs2" -> ((s, dir) => {
      Tables.orders(s, dir).selectExpr(
        "o_orderkey",
        "CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start",
        "QUARTER(o_orderdate) AS q",
        "DAYOFWEEK(o_orderdate) AS dw", // 1=Sunday..7=Saturday
        "WEEKOFYEAR(o_orderdate) AS wy",
        "ADD_MONTHS(CAST(o_orderdate AS DATE), 2) AS plus2m")
    }),

    // Map-typed column surface: construction, lookup, keys, cardinality.
    // The oracle states the semantic RESULT in plain SQL — maps need no
    // cross-engine representation to be proven.
    "sc_map_funcs" -> ((s, dir) => {
      Tables.orders(s, dir)
        .selectExpr("o_orderkey", "o_custkey",
          "MAP_FROM_ARRAYS(ARRAY('okey', 'ckey'), ARRAY(o_orderkey, o_custkey)) AS m")
        .selectExpr("o_orderkey",
          "ELEMENT_AT(m, 'okey') AS v_okey",
          "ELEMENT_AT(m, 'ckey') AS v_ckey",
          "ELEMENT_AT(m, 'missing') AS v_missing",
          "CAST(SIZE(m) AS INTEGER) AS n_entries",
          "ARRAY_JOIN(ARRAY_SORT(MAP_KEYS(m)), ',') AS keys_sorted")
    }),

    "sc_null_funcs" -> ((s, dir) => {
      Tables.orders(s, dir).selectExpr(
        "o_orderkey",
        "COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_c",
        "IFNULL(NULLIF(o_orderpriority, o_orderpriority), 'none') AS pr_c",
        "NVL2(NULLIF(o_orderstatus, 'F'), 'not_f', 'f') AS nvl2_c")
    }),

    "sc_math_funcs" -> ((s, dir) => {
      Tables.lineitem(s, dir).selectExpr(
        "l_orderkey", "l_linenumber",
        "ABS(l_quantity - 25) AS dev",
        // CEIL/FLOOR: Spark yields BIGINT, DuckDB DOUBLE — pin both sides
        // to BIGINT so the driver's value-hash sees identical reprs.
        "CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil",
        "CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k_floor",
        "SQRT(l_quantity) AS qty_sqrt",
        "PMOD(CAST(l_quantity AS INT), 7) AS qty_mod")
    }),

    // Array-function surface over the documents token arrays.
    "sc_array_funcs" -> ((s, dir) => {
      graft.Tables.documents(s, dir).selectExpr(
        "doc_id",
        s"CAST(SIZE(${Q.TokensExpr}) AS BIGINT) AS n_tok",
        s"ARRAY_JOIN(SLICE(${Q.TokensExpr}, 1, 3), '-') AS first3",
        s"ARRAY_CONTAINS(${Q.TokensExpr}, 'the') AS has_the",
        s"CAST(ARRAY_POSITION(${Q.TokensExpr}, 'the') AS BIGINT) AS pos_the",
        s"ARRAY_MIN(${Q.TokensExpr}) AS tok_min",
        s"ARRAY_MAX(${Q.TokensExpr}) AS tok_max",
        s"ELEMENT_AT(${Q.TokensExpr}, -1) AS tok_last")
    }),

    // Array higher-order functions: transform / filter / aggregate.
    "sc_hof_funcs" -> ((s, dir) => {
      val T = Q.TokensExpr
      graft.Tables.documents(s, dir).selectExpr(
        "doc_id",
        s"CAST(AGGREGATE($T, 0, (acc, t) -> acc + LENGTH(t)) AS BIGINT) AS tot_len",
        s"CAST(SIZE(FILTER($T, t -> LENGTH(t) > 4)) AS BIGINT) AS n_long",
        s"ARRAY_JOIN(TRANSFORM(SLICE($T, 1, 3), t -> UPPER(t)), ',') AS up3")
    }),

    // Typed JSON parsing (from_json with an explicit schema) vs the
    // get_json_object string path in events_json_extract.
    "events_from_json_struct" -> ((s, dir) => {
      Tables.events(s, dir).selectExpr(
        "event_id",
        "from_json(props, 'k INT').k AS k",
        "CAST(from_json(props, 'k INT') IS NOT NULL AS BOOLEAN) AS parsed")
    }),

    // Conditional scalar surface: greatest/least/if chains.
    "sc_conditional_funcs" -> ((s, dir) => {
      Tables.lineitem(s, dir).selectExpr(
        "l_orderkey", "l_linenumber",
        "GREATEST(l_quantity, l_discount * 100, l_tax * 100) AS g3",
        "LEAST(l_quantity, l_extendedprice / 1000) AS l2",
        "IF(l_quantity > 25, 'heavy', 'light') AS weight_band",
        "CASE l_returnflag WHEN 'A' THEN 1 WHEN 'R' THEN 2 ELSE 0 END AS flag_code")
    }),

    // Batch gap sessionization: lag + running sum assigns session ids, then
    // per-session rollup — the SQL twin of EventStreams.userSessions.
    "events_sessions_batch" -> ((s, dir) => {
      import s.implicits._
      val order = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("prev_ts", lag($"ts", 1).over(order))
        .withColumn("new_sess",
          when($"prev_ts".isNull ||
            unix_micros($"ts") - unix_micros($"prev_ts") > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum($"new_sess").over(running))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          (sum(round($"value" * 100)) / 100.0).as("total_value"),
          min($"ts").as("started"), max($"ts").as("ended"))
    }),

    // Ordered conversion funnel (view -> click -> purchase): each stage's
    // timestamp is the FIRST qualifying event strictly after the previous
    // stage — the sequential dependency is three per-user min-aggregates
    // chained through equi-joins on user_id, not a window over the raw
    // event stream. Each stage's output is users-sized (broadcastable at
    // any corpus scale); events shuffle once per stage on user_id.
    "events_funnel" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir).select($"user_id", $"event_type", $"ts")
      val v = ev.where($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("t_view"))
      val c = ev.where($"event_type" === "click")
        .join(v, Seq("user_id")).where($"ts" > $"t_view")
        .groupBy($"user_id").agg(min($"ts").as("t_click"))
      val p = ev.where($"event_type" === "purchase")
        .join(c, Seq("user_id")).where($"ts" > $"t_click")
        .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select($"user_id", $"t_view", $"t_click", $"t_purchase")
    }),

    // Weekly cohort retention: cohort = ISO week of the user's first
    // event (DATE_TRUNC('week') is Monday-start in both engines),
    // retention cell = distinct users from that cohort active at each
    // week offset. The corpus reduces to distinct (user, week) rows
    // FIRST — the only full-data pass; everything after is users-sized.
    "events_retention" -> ((s, dir) => {
      import s.implicits._
      val wk = Tables.events(s, dir)
        .selectExpr("user_id", "CAST(DATE_TRUNC('week', ts) AS DATE) AS wk")
        .distinct()
      val cohort = wk.groupBy($"user_id").agg(min($"wk").as("cohort_week"))
      wk.join(cohort, Seq("user_id"))
        .selectExpr("cohort_week",
          "CAST(DATEDIFF(wk, cohort_week) DIV 7 AS INT) AS week_offset",
          "user_id")
        .groupBy($"cohort_week", $"week_offset")
        .agg(countDistinct($"user_id").as("n_users"))
    }),

    // Time-series gap-fill + forward-fill resample: each user's sparse
    // event stream becomes a REGULAR hourly grid (sequence+explode over
    // the user's own [first,last] hour — no global calendar), gaps carry
    // n_events=0 and the last observed hourly total forward (the energy
    // reference's silver stage aligns exactly such per-county hourly
    // series before the gold join; this is the missing-row repair step a
    // forecast join needs). Scale shape: one (user,hour) aggregate, one
    // users-sized bounds aggregate, the grid join on (user,hour), and a
    // PER-USER window — no single-partition stage anywhere; hourly cents
    // are integer sums, so the forward-filled value is order-exact.
    "events_gapfill_ffill" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val obs = Tables.events(s, dir)
        .filter($"user_id" < 20 && $"event_type" === "view")
        .groupBy($"user_id", date_trunc("hour", $"ts").as("hour"))
        .agg(count(lit(1)).as("n_events"),
          sum(round($"value" * 100).cast("long")).as("cents"))
      val grid = obs.groupBy($"user_id")
        .agg(min($"hour").as("h0"), max($"hour").as("h1"))
        .select($"user_id",
          explode(sequence($"h0", $"h1", expr("interval 1 hour"))).as("hour"))
      val w = Window.partitionBy($"user_id").orderBy($"hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(obs, Seq("user_id", "hour"), "left")
        .select($"user_id", $"hour",
          coalesce($"n_events", lit(0L)).as("n_events"),
          last($"cents", ignoreNulls = true).over(w).as("cents_ff"))
    }),

    // Linear-interpolation resample — the smooth sibling of
    // events_gapfill_ffill: gap hours take the line between the
    // surrounding observations (every gap is bracketed by construction —
    // the grid spans [first,last] observed hour; the nc-NULL hold-last
    // branch is defense for callers gridding past the last point). The
    // bracketing observation per gap row comes from two per-user windows
    // (last-non-null behind, first-non-null ahead); the interpolation
    // itself is (next−prev)·Δt as ONE exact integer product, then a
    // single double division — the identical two-FP-op expression on the
    // oracle side, so the hash comparison is safe (same discipline as
    // the haversine J7 oracle).
    "events_interpolate" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val obs = Tables.events(s, dir)
        .filter($"user_id" < 20 && $"event_type" === "view")
        .groupBy($"user_id", date_trunc("hour", $"ts").as("hour"))
        .agg(sum(round($"value" * 100).cast("long")).as("cents"))
      val grid = obs.groupBy($"user_id")
        .agg(min($"hour").as("h0"), max($"hour").as("h1"))
        .select($"user_id",
          explode(sequence($"h0", $"h1", expr("interval 1 hour"))).as("hour"))
      val past = Window.partitionBy($"user_id").orderBy($"hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val future = Window.partitionBy($"user_id").orderBy($"hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obsHour = when($"cents".isNotNull, $"hour")
      grid.join(obs, Seq("user_id", "hour"), "left")
        .withColumn("pc", last($"cents", ignoreNulls = true).over(past))
        .withColumn("ph", last(obsHour, ignoreNulls = true).over(past))
        .withColumn("nc", first($"cents", ignoreNulls = true).over(future))
        .withColumn("nh", first(obsHour, ignoreNulls = true).over(future))
        .select($"user_id", $"hour",
          when($"cents".isNotNull, $"cents".cast("double"))
            .when($"nc".isNull, $"pc".cast("double"))
            .otherwise($"pc" +
              (($"nc" - $"pc") *
                (unix_timestamp($"hour") - unix_timestamp($"ph"))) /
                (unix_timestamp($"nh") - unix_timestamp($"ph")))
            .as("cents_interp"))
    }),

    // Robust per-series anomaly flags — median/MAD, the outlier rule
    // that survives the outliers it hunts (a mean/stddev gate moves with
    // every spike; the median doesn't). Flags hourly totals more than
    // 3 MADs from the user's median. Exact `percentile` matches DuckDB's
    // quantile_cont bit-for-bit on integer cents (the parity
    // agg_percentile_exact established); all arithmetic downstream is
    // single-op on exact values, so the > comparison can't diverge. At
    // 100 TB swap percentile for approx_percentile per series — same
    // plan shape, two user-level aggregates joined back on user_id.
    "events_anomaly_mad" -> ((s, dir) => {
      import s.implicits._
      val obs = Tables.events(s, dir)
        .filter($"event_type" === "view")
        .groupBy($"user_id", date_trunc("hour", $"ts").as("hour"))
        .agg(sum(round($"value" * 100).cast("long")).as("cents"))
      val med = obs.groupBy($"user_id")
        .agg(expr("percentile(cents, 0.5)").as("med"))
      val dev = obs.join(med, Seq("user_id"))
        .withColumn("adev", abs($"cents" - $"med"))
      val mad = dev.groupBy($"user_id")
        .agg(expr("percentile(adev, 0.5)").as("mad"))
      dev.join(mad, Seq("user_id"))
        .filter($"adev" > lit(3) * $"mad")
        .select($"user_id", $"hour", $"cents", $"med", $"mad")
    })
  )

  val oracles: Map[String, String] = Map(
    "sc_string_funcs" ->
      ("SELECT c_custkey, UPPER(c_name) AS name_u, LOWER(c_mktsegment) AS seg_l, " +
       "SUBSTRING(c_name, 1, 8) AS name_pre, " +
       "CAST(LENGTH(TRIM(c_name)) AS INTEGER) AS name_len, " +
       "CONCAT_WS('|', c_mktsegment, c_name) AS tagged, " +
       "LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS key_pad, " +
       "REPLACE(c_name, '#', '-') AS name_r FROM customer"),
    "sc_date_funcs" ->
      ("SELECT o_orderkey, CAST(YEAR(o_orderdate) AS INTEGER) AS y, " +
       "CAST(MONTH(o_orderdate) AS INTEGER) AS m, " +
       "CAST(DAY(o_orderdate) AS INTEGER) AS d, " +
       "CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_ts, " +
       "LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end, " +
       "CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INTEGER) AS days_since " +
       "FROM orders"),
    "sc_date_funcs2" ->
      ("SELECT o_orderkey, CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start, " +
       "CAST(QUARTER(o_orderdate) AS INTEGER) AS q, " +
       "CAST(DAYOFWEEK(o_orderdate) + 1 AS INTEGER) AS dw, " +
       "CAST(WEEKOFYEAR(o_orderdate) AS INTEGER) AS wy, " +
       "CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m " +
       "FROM orders"),
    "sc_map_funcs" ->
      ("SELECT o_orderkey, o_orderkey AS v_okey, o_custkey AS v_ckey, " +
       "CAST(NULL AS BIGINT) AS v_missing, 2 AS n_entries, " +
       "'ckey,okey' AS keys_sorted FROM orders"),
    "sc_null_funcs" ->
      ("SELECT o_orderkey, COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_c, " +
       "IFNULL(NULLIF(o_orderpriority, o_orderpriority), 'none') AS pr_c, " +
       "CASE WHEN NULLIF(o_orderstatus, 'F') IS NOT NULL THEN 'not_f' ELSE 'f' END AS nvl2_c " +
       "FROM orders"),
    "sc_math_funcs" ->
      ("SELECT l_orderkey, l_linenumber, ABS(l_quantity - 25) AS dev, " +
       "CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil, " +
       "CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k_floor, " +
       "SQRT(l_quantity) AS qty_sqrt, " +
       "CAST(CAST(l_quantity AS INTEGER) % 7 AS INTEGER) AS qty_mod FROM lineitem"),
    "sc_array_funcs" -> {
      val T = "regexp_extract_all(text, '\\S+')"
      (s"SELECT doc_id, CAST(LEN($T) AS BIGINT) AS n_tok, " +
       s"array_to_string(($T)[1:3], '-') AS first3, " +
       s"list_contains($T, 'the') AS has_the, " +
       s"CAST(COALESCE(list_position($T, 'the'), 0) AS BIGINT) AS pos_the, " +
       s"list_min($T) AS tok_min, list_max($T) AS tok_max, " +
       s"($T)[-1] AS tok_last FROM documents")
    },
    "sc_hof_funcs" -> {
      val T = "regexp_extract_all(text, '\\S+')"
      (s"SELECT doc_id, " +
       s"CAST(list_sum(list_transform($T, t -> length(t))) AS BIGINT) AS tot_len, " +
       s"CAST(len(list_filter($T, t -> length(t) > 4)) AS BIGINT) AS n_long, " +
       s"array_to_string(list_transform(($T)[1:3], t -> upper(t)), ',') AS up3 " +
       "FROM documents")
    },
    "events_from_json_struct" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, " +
       "props IS NOT NULL AS parsed FROM events"),
    "sc_conditional_funcs" ->
      ("SELECT l_orderkey, l_linenumber, " +
       "GREATEST(l_quantity, l_discount * 100, l_tax * 100) AS g3, " +
       "LEAST(l_quantity, l_extendedprice / 1000) AS l2, " +
       "CASE WHEN l_quantity > 25 THEN 'heavy' ELSE 'light' END AS weight_band, " +
       "CAST(CASE l_returnflag WHEN 'A' THEN 1 WHEN 'R' THEN 2 ELSE 0 END AS INTEGER) " +
       "AS flag_code FROM lineitem"),
    "events_sessions_batch" ->
      ("""WITH marked AS (
         |  SELECT user_id, event_id, ts, value,
         |         CASE WHEN lag(ts) OVER w IS NULL
         |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         |              THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT user_id, ts, value,
         |         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |  FROM marked)
         |SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |       SUM(ROUND(value * 100)) / 100.0 AS total_value,
         |       CAST(MIN(ts) AS TIMESTAMP) AS started,
         |       CAST(MAX(ts) AS TIMESTAMP) AS ended
         |FROM sess GROUP BY user_id, session_id""".stripMargin),
    "events_funnel" ->
      ("""WITH v AS (
         |  SELECT user_id, MIN(ts) AS t_view FROM events
         |  WHERE event_type = 'view' GROUP BY 1),
         |c AS (
         |  SELECT e.user_id, MIN(e.ts) AS t_click
         |  FROM events e JOIN v ON e.user_id = v.user_id
         |  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
         |p AS (
         |  SELECT e.user_id, MIN(e.ts) AS t_purchase
         |  FROM events e JOIN c ON e.user_id = c.user_id
         |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
         |SELECT v.user_id, CAST(v.t_view AS TIMESTAMP) AS t_view,
         |       CAST(c.t_click AS TIMESTAMP) AS t_click,
         |       CAST(p.t_purchase AS TIMESTAMP) AS t_purchase
         |FROM v LEFT JOIN c ON v.user_id = c.user_id
         |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin),
    "events_retention" ->
      ("""WITH wk AS (
         |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
         |  FROM events),
         |cohort AS (SELECT user_id, MIN(wk) AS cohort_week FROM wk GROUP BY 1)
         |SELECT cohort.cohort_week,
         |       CAST(date_diff('day', cohort.cohort_week, wk.wk) // 7 AS INTEGER)
         |         AS week_offset,
         |       CAST(COUNT(DISTINCT wk.user_id) AS BIGINT) AS n_users
         |FROM wk JOIN cohort ON wk.user_id = cohort.user_id
         |GROUP BY 1, 2""".stripMargin),
    "events_gapfill_ffill" ->
      ("""WITH obs AS (
         |  SELECT user_id, date_trunc('hour', ts) AS hour,
         |         COUNT(*) AS n_events,
         |         CAST(SUM(ROUND(value * 100)) AS BIGINT) AS cents
         |  FROM events WHERE user_id < 20 AND event_type = 'view'
         |  GROUP BY 1, 2),
         |bounds AS (
         |  SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1
         |  FROM obs GROUP BY 1),
         |grid AS (
         |  SELECT user_id,
         |         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
         |  FROM bounds)
         |SELECT g.user_id, g.hour,
         |       CAST(COALESCE(o.n_events, 0) AS BIGINT) AS n_events,
         |       last_value(o.cents IGNORE NULLS) OVER (
         |         PARTITION BY g.user_id ORDER BY g.hour
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_ff
         |FROM grid g LEFT JOIN obs o
         |  ON g.user_id = o.user_id AND g.hour = o.hour""".stripMargin),
    "events_interpolate" ->
      ("""WITH obs AS (
         |  SELECT user_id, date_trunc('hour', ts) AS hour,
         |         CAST(SUM(ROUND(value * 100)) AS BIGINT) AS cents
         |  FROM events WHERE user_id < 20 AND event_type = 'view'
         |  GROUP BY 1, 2),
         |bounds AS (
         |  SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1
         |  FROM obs GROUP BY 1),
         |grid AS (
         |  SELECT user_id,
         |         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
         |  FROM bounds),
         |j AS (
         |  SELECT g.user_id, g.hour, o.cents,
         |         last_value(o.cents IGNORE NULLS) OVER (
         |           PARTITION BY g.user_id ORDER BY g.hour
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
         |         last_value(CASE WHEN o.cents IS NOT NULL THEN g.hour END
         |             IGNORE NULLS) OVER (
         |           PARTITION BY g.user_id ORDER BY g.hour
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
         |         first_value(o.cents IGNORE NULLS) OVER (
         |           PARTITION BY g.user_id ORDER BY g.hour
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
         |         first_value(CASE WHEN o.cents IS NOT NULL THEN g.hour END
         |             IGNORE NULLS) OVER (
         |           PARTITION BY g.user_id ORDER BY g.hour
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
         |  FROM grid g LEFT JOIN obs o
         |    ON g.user_id = o.user_id AND g.hour = o.hour)
         |SELECT user_id, hour,
         |       CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
         |            WHEN nc IS NULL THEN CAST(pc AS DOUBLE)
         |            ELSE pc + ((nc - pc) *
         |                   date_diff('second', ph, hour)) /
         |                   date_diff('second', ph, nh)
         |       END AS cents_interp
         |FROM j""".stripMargin),
    "events_anomaly_mad" ->
      ("""WITH obs AS (
         |  SELECT user_id, date_trunc('hour', ts) AS hour,
         |         CAST(SUM(ROUND(value * 100)) AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'view'
         |  GROUP BY 1, 2),
         |med AS (
         |  SELECT user_id, quantile_cont(cents, 0.5) AS med
         |  FROM obs GROUP BY 1),
         |dev AS (
         |  SELECT o.user_id, o.hour, o.cents, m.med,
         |         ABS(o.cents - m.med) AS adev
         |  FROM obs o JOIN med m ON o.user_id = m.user_id),
         |mad AS (
         |  SELECT user_id, quantile_cont(adev, 0.5) AS mad
         |  FROM dev GROUP BY 1)
         |SELECT d.user_id, d.hour, d.cents, d.med, m.mad
         |FROM dev d JOIN mad m ON d.user_id = m.user_id
         |WHERE d.adev > 3 * m.mad""".stripMargin)
  )
}
