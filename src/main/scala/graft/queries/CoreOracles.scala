package graft.queries

/** DuckDB oracle SQL for every entry in [[CoreQueries.queries]]. Column
  * names/aliases match the Spark side exactly (the driver sorts columns by
  * name before hashing). Integer sums are cast to BIGINT because DuckDB
  * promotes sum(BIGINT) to HUGEINT, which would schema-mismatch.
  */
object CoreOracles {

  private val s = CoreQueries.WStart
  private val e = CoreQueries.WEnd
  private val Seq(o1, o2) = CoreQueries.Outages

  /** K1's state-run CTE chain, shared by k1/k2 (mirrors
    * RuntimeSql.stateRuns — see that scaladoc for the equivalence argument
    * against /root/reference/src/openstack_billing_db/model.py:90-156).
    */
  private val runsCte: String =
    s"""WITH mapped AS (
       |  SELECT user_id AS key, epoch_us(ts) AS ts_us, event_id AS tie,
       |         CASE WHEN event_type = 'error' THEN 'Error'
       |              WHEN event_type = 'signup' THEN 'Running'
       |              WHEN event_type = 'purchase' THEN 'Stopped'
       |              WHEN event_type = 'view' THEN 'Shelved' END AS state
       |  FROM events
       |), f AS (
       |  SELECT *, 0 AS synth FROM mapped WHERE state IS NOT NULL
       |), m AS (
       |  SELECT key, state, ts_us, tie, synth FROM (
       |    SELECT f.*, lag(state) OVER (PARTITION BY key ORDER BY synth, ts_us, tie) AS prev
       |    FROM f) t
       |  WHERE prev IS NULL OR state <> prev
       |), runs AS (
       |  SELECT key, state, ts_us,
       |         lead(ts_us) OVER (PARTITION BY key ORDER BY synth, ts_us, tie) AS next_ts_us
       |  FROM m
       |)""".stripMargin

  /** F3's synth→parse→classify head, shared by the two F3 oracles.
    * Mirrors CoreQueries.f3SynthPci + Enrich.gpuSuTypeLenient /
    * gpuCountLenient / quarantineReason via DuckDB JSON functions; both
    * engines synthesize their own payload and only the derived values
    * must agree.
    */
  private val f3ClassifiedSql: String =
    """WITH synth AS (
      |  SELECT event_id,
      |    CASE event_id % 10
      |      WHEN 3 THEN '[]'
      |      WHEN 4 THEN '[{"count": "1", "alias_name": "A100"}]'
      |      WHEN 5 THEN '[{"count": "2", "alias_name": "v100"}]'
      |      WHEN 6 THEN '[{"count": "4", "alias_name": "a100-sxm4"}]'
      |      WHEN 7 THEN '[{"count": "1", "alias_name": "h100"}]'
      |      WHEN 8 THEN '[{"count": "1", "alias_name": "v100"}, {"count": "1", "alias_name": "v100"}]'
      |      WHEN 9 THEN '[{"count": "x1", "alias_name": "k80"}]'
      |      ELSE NULL END AS pci
      |  FROM events
      |), parsed AS (
      |  SELECT event_id, pci,
      |    json_array_length(pci) AS len,
      |    lower(json_extract_string(pci, '$[0].alias_name')) AS alias,
      |    json_extract_string(pci, '$[0].count') AS cnt
      |  FROM synth
      |), cls AS (
      |  SELECT event_id,
      |    CASE WHEN pci IS NULL OR len = 0 THEN 'cpu'
      |         WHEN len > 1 THEN NULL
      |         WHEN alias IN ('a100', 'a100-sxm4', 'v100', 'k80')
      |           THEN 'gpu_' || replace(alias, '-', '')
      |         ELSE NULL END AS su_type,
      |    CASE WHEN pci IS NULL OR len = 0 THEN 0
      |         ELSE TRY_CAST(cnt AS INTEGER) END AS gpu_count,
      |    CASE WHEN len > 1 THEN 'multiple pci_requests entries'
      |         WHEN pci IS NOT NULL AND len = 1
      |              AND alias NOT IN ('a100', 'a100-sxm4', 'v100', 'k80')
      |           THEN 'invalid pci alias ' || alias
      |         WHEN pci IS NOT NULL AND len = 1
      |              AND TRY_CAST(cnt AS INTEGER) IS NULL
      |           THEN 'invalid pci count ' || cnt
      |         END AS reason
      |  FROM parsed
      |)
      |""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_base_price,
        |  CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "r1_distinct" ->
      "SELECT DISTINCT user_id FROM events",

    "r2_left_join" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "r3_temporal_filter" ->
      s"""SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
         |FROM events
         |WHERE epoch_us(ts) > ${graft.core.Types.utcMicros(2024, 1, 15)}
         |   OR event_type = 'signup'""".stripMargin,

    "r5_sorted_events" ->
      """SELECT user_id,
        |  array_to_string(array_agg(CAST(event_id AS VARCHAR) ORDER BY epoch_us(ts), event_id), ',') AS event_ids
        |FROM events GROUP BY user_id""".stripMargin,

    "r6_events_per_entity" ->
      """SELECT user_id, count(*) AS n_events,
        |  min(epoch_us(ts)) AS first_ts_us, max(epoch_us(ts)) AS last_ts_us
        |FROM events GROUP BY user_id""".stripMargin,

    "r8_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        |FROM events GROUP BY user_id""".stripMargin,

    "r7_unpivot" ->
      """WITH wide AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        |  FROM events GROUP BY user_id
        |), long AS (
        |  SELECT user_id, 'click' AS event_type, n_click AS n FROM wide
        |  UNION ALL SELECT user_id, 'purchase', n_purchase FROM wide
        |  UNION ALL SELECT user_id, 'error', n_error FROM wide
        |)
        |SELECT user_id, event_type, n FROM long WHERE n > 0""".stripMargin,

    "f1_service_units" ->
      """SELECT p_partkey,
        |  CAST(CASE WHEN p_partkey % 4 <> 0 THEN p_partkey % 4
        |       ELSE floor(greatest(CAST(p_size AS DOUBLE), p_retailprice / 409.6)) END AS BIGINT)
        |    AS service_units
        |FROM part""".stripMargin,

    "f4_time_clamp" ->
      s"""SELECT event_id, greatest(least(epoch_us(ts), $e), $s) AS clamped_us
         |FROM events""".stripMargin,

    "f9_round_money" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))), 2) AS DECIMAL(38,2)) AS VARCHAR) AS revenue
        |FROM lineitem""".stripMargin,

    "f10_ceil_hours" ->
      """SELECT event_id, CAST(ceil(value / 60.0) AS BIGINT) AS ceil_units
        |FROM events""".stripMargin,

    "a1_su_hour_agg" ->
      """SELECT user_id, event_type,
        |  CAST(sum(CAST(ceil(value / 60.0) AS BIGINT)) AS BIGINT) AS su_hours
        |FROM events WHERE value > 0
        |GROUP BY user_id, event_type""".stripMargin,

    "k1_state_machine" ->
      s"""$runsCte, c AS (
         |  SELECT key, state,
         |         greatest(least(ts_us, $e), $s) AS t0,
         |         coalesce(greatest(least(next_ts_us, $e), $s), $e) AS t1
         |  FROM runs
         |)
         |SELECT key,
         |  CAST(sum(CASE WHEN state = 'Running' THEN t1 - t0 ELSE 0 END) AS BIGINT) AS running_us,
         |  CAST(sum(CASE WHEN state = 'Stopped' THEN t1 - t0 ELSE 0 END) AS BIGINT) AS stopped_us
         |FROM c GROUP BY key""".stripMargin,

    "billing_invoice" ->
      s"""$runsCte, iv AS (
         |  SELECT * FROM (VALUES ($s, $e, 1), (${o1._1}, ${o1._2}, -1), (${o2._1}, ${o2._2}, -1))
         |    AS t(iv_start, iv_end, weight)
         |), c AS (
         |  SELECT key, state, weight,
         |         greatest(least(ts_us, iv_end), iv_start) AS t0,
         |         coalesce(greatest(least(next_ts_us, iv_end), iv_start), iv_end) AS t1
         |  FROM runs CROSS JOIN iv
         |), rt AS (
         |  SELECT key,
         |    CAST(sum(CASE WHEN state = 'Running' THEN (t1 - t0) * weight ELSE 0 END) AS BIGINT) AS running_us
         |  FROM c GROUP BY key
         |), su AS (
         |  SELECT key,
         |    CAST(ceil(running_us / 3600000000.0) AS BIGINT) AS runtime_hours,
         |    CASE WHEN key % 5 = 0 THEN 2 ELSE 0 END AS gpu_count
         |  FROM rt
         |  WHERE CAST(ceil(running_us / 3600000000.0) AS BIGINT) > 0
         |), typed AS (
         |  SELECT key, runtime_hours,
         |    CASE WHEN gpu_count > 0 THEN 'gpu_v100' ELSE 'cpu' END AS su_type,
         |    CAST(CASE WHEN gpu_count <> 0 THEN gpu_count
         |         ELSE floor(greatest(CAST(key % 4 + 1 AS DOUBLE),
         |                             (key % 8 * 2048 + 2048) / 4096.0)) END AS BIGINT)
         |      AS service_units,
         |    'proj-' || (key % 3) AS project_id
         |  FROM su
         |)
         |SELECT project_id, su_type,
         |  CAST(sum(runtime_hours * service_units) AS BIGINT) AS su_hours,
         |  CAST(CAST(round(CASE WHEN su_type = 'gpu_v100' THEN CAST('1.214' AS DECIMAL(18,6))
         |        ELSE CAST('0.013' AS DECIMAL(18,6)) END
         |    * CAST(sum(runtime_hours * service_units) AS BIGINT), 2) AS DECIMAL(38,2)) AS VARCHAR) AS cost
         |FROM typed GROUP BY project_id, su_type""".stripMargin,

    "j1_join3_revenue" ->
      """SELECT n_name,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "w1_topn_per_group" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin,

    "w2_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,2)) AS VARCHAR) AS running_spend
        |FROM orders""".stripMargin,

    "g1_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "sj1_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300)""".stripMargin,

    // the oracle is the PLAIN semi join — row equality proves the bloom
    // prefilter introduced no false drops and the confirm killed every
    // false positive
    "sj4_bloom_semijoin" ->
      """SELECT l_orderkey,
        |  count(*) AS n_lines,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey = l_orderkey AND o_totalprice > 200)
        |GROUP BY l_orderkey""".stripMargin,

    "a4_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.99), 6) AS price_p99
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // w4b: bounds contract like a5 — the quartile ids and exact N from
    // the oracle, the rated-error verdict asserted TRUE.
    "w4b_quartile_approx" ->
      """SELECT CAST(t.q AS BIGINT) AS quartile,
        |  (SELECT count(DISTINCT o_custkey) FROM orders) AS n_total,
        |  TRUE AS ok
        |FROM (VALUES (1), (2), (3), (4)) AS t(q)""".stripMargin,

    // a5: the oracle's side of the bounds contract — exact distinct from
    // DuckDB, and the rated-error verdicts asserted TRUE. If Spark's
    // sketch drifts past its rated error, its boolean goes FALSE and the
    // hash comparison fails.
    "a5_approx_sketches" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  TRUE AS hll_ok,
        |  TRUE AS kll_ok
        |FROM events GROUP BY event_type""".stripMargin,

    "a6_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sy,
        |    -- DECIMAL(19,6), not (18,6): widths <= 18 keep int64 physical
        |    -- storage in DuckDB and the product overflows at runtime; 19
        |    -- promotes to hugeint. Values are exact either way.
        |    CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS DOUBLE) AS syy,
        |    CAST(CAST(sum(CAST(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag,
        |  round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS qty_stddev,
        |  round((sxx - sx * sx / n) / (n - 1), 6) AS qty_var,
        |  round((n * sxy - sx * sy) /
        |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS qty_price_corr,
        |  round(sx / n, 6) AS qty_mean
        |FROM m""".stripMargin,

    "f6_month_bucket" ->
      """SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us,
        |  count(*) AS n_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS month_revenue
        |FROM orders GROUP BY 1""".stripMargin,

    "so1_except" ->
      """SELECT DISTINCT o_custkey FROM orders
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400""".stripMargin,

    "so2_intersect" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        |INTERSECT
        |SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'""".stripMargin,

    "sj2_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "aj1_asof_join" ->
      """WITH day AS (
        |  SELECT o_custkey AS key, epoch_us(o_orderdate) AS ots,
        |         CAST(count(*) AS BIGINT) AS day_orders
        |  FROM orders GROUP BY 1, 2
        |), ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        |)
        |SELECT event_id, user_id, ts_us,
        |  coalesce(ots, -1) AS last_order_us,
        |  coalesce(day_orders, 0) AS last_day_orders
        |FROM ev ASOF LEFT JOIN day ON ev.user_id = day.key AND ev.ts_us >= day.ots""".stripMargin,

    // aj1's ASOF join with the freshness cut applied to the matched pair.
    "aj5_asof_tolerance" ->
      s"""WITH day AS (
         |  SELECT o_custkey AS key, epoch_us(o_orderdate) AS ots,
         |         CAST(count(*) AS BIGINT) AS day_orders
         |  FROM orders GROUP BY 1, 2
         |), ev AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
         |)
         |SELECT event_id, user_id, ts_us,
         |  coalesce(CASE WHEN ts_us - ots <= ${CoreQueries.AsofToleranceUs}
         |    THEN ots END, -1) AS last_order_us,
         |  coalesce(CASE WHEN ts_us - ots <= ${CoreQueries.AsofToleranceUs}
         |    THEN day_orders END, 0) AS last_day_orders
         |FROM ev ASOF LEFT JOIN day
         |  ON ev.user_id = day.key AND ev.ts_us >= day.ots""".stripMargin,

    // the native-operator form must satisfy the SAME oracle as aj1
    "aj4_asof_native" ->
      """WITH day AS (
        |  SELECT o_custkey AS key, epoch_us(o_orderdate) AS ots,
        |         CAST(count(*) AS BIGINT) AS day_orders
        |  FROM orders GROUP BY 1, 2
        |), ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        |)
        |SELECT event_id, user_id, ts_us,
        |  coalesce(ots, -1) AS last_order_us,
        |  coalesce(day_orders, 0) AS last_day_orders
        |FROM ev ASOF LEFT JOIN day ON ev.user_id = day.key AND ev.ts_us >= day.ots""".stripMargin,

    "aj2_asof_next" ->
      """WITH day AS (
        |  SELECT o_custkey AS key, epoch_us(o_orderdate) AS ots,
        |         CAST(count(*) AS BIGINT) AS day_orders
        |  FROM orders GROUP BY 1, 2
        |), ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        |)
        |SELECT event_id, user_id, ts_us,
        |  coalesce(ots, -1) AS next_order_us,
        |  coalesce(day_orders, 0) AS next_day_orders
        |FROM ev ASOF LEFT JOIN day ON ev.user_id = day.key AND ev.ts_us <= day.ots""".stripMargin,

    "rj1_range_join" ->
      s"""WITH iv AS (
         |  SELECT * FROM (VALUES (0, ${o1._1}, ${o1._2}), (1, ${o2._1}, ${o2._2}))
         |    AS t(iv_id, iv_start, iv_end)
         |)
         |SELECT CAST(iv_id AS BIGINT) AS iv_id,
         |  CAST(count(event_id) AS BIGINT) AS n_events
         |FROM iv LEFT JOIN events
         |  ON epoch_us(ts) >= iv_start AND epoch_us(ts) < iv_end
         |GROUP BY 1""".stripMargin,

    "rj2_range_binned" ->
      s"""WITH iv AS (
         |  SELECT * FROM (VALUES (0, ${o1._1}, ${o1._2}), (1, ${o2._1}, ${o2._2}))
         |    AS t(iv_id, iv_start, iv_end)
         |)
         |SELECT CAST(iv_id AS BIGINT) AS iv_id,
         |  CAST(count(event_id) AS BIGINT) AS n_events
         |FROM iv LEFT JOIN events
         |  ON epoch_us(ts) >= iv_start AND epoch_us(ts) < iv_end
         |GROUP BY 1""".stripMargin,

    "g2_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "g3_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,

    "w3_lag_gaps" ->
      """SELECT o_custkey, o_orderkey,
        |  coalesce(ots - lag(ots) OVER (PARTITION BY o_custkey ORDER BY ots, o_orderkey), -1) AS gap_us
        |FROM (SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS ots FROM orders)""".stripMargin,

    "w4_ntile_quartile" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS spend
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT o_custkey, CAST(spend AS VARCHAR) AS spend,
        |  CAST(ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS BIGINT) AS quartile,
        |  round(percent_rank() OVER (ORDER BY spend DESC, o_custkey), 6) AS pr
        |FROM spend""".stripMargin,

    "so3_union_all" ->
      """SELECT event_id, 'signup' AS src FROM events WHERE event_type = 'signup'
        |UNION ALL
        |SELECT event_id, 'error' AS src FROM events WHERE event_type = 'error'""".stripMargin,

    "w5_range_frame" ->
      """SELECT event_id,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts_us
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_trailing_hour
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)""".stripMargin,

    "so4_except_all" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |EXCEPT ALL
        |SELECT user_id FROM events WHERE event_type = 'view'""".stripMargin,

    "so5_intersect_all" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT ALL
        |SELECT user_id FROM events WHERE event_type = 'view'""".stripMargin,

    "a8_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events
        |), r AS (
        |  SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
        |  FROM h
        |)
        |SELECT event_type,
        |  round(63 / (('0x' || substr(h, 1, 8))::BIGINT / 4294967296.0), 6) AS kmv_estimate
        |FROM r WHERE rk = 64""".stripMargin,

    // first-occurrence flags + running sum — the distinct-window
    // dissolution replayed.
    "w11_cum_distinct" ->
      """WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    event_type,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) = 1 THEN 1 ELSE 0 END
        |      AS first_seen
        |  FROM events)
        |SELECT user_id, event_id, ts_us,
        |  CAST(sum(first_seen) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_types_seen
        |FROM b""".stripMargin,

    // the same one-rounding reciprocal sum and integer division.
    "a22_harmonic_mean" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(1000000.0 / value) AS BIGINT)) AS BIGINT)
        |    AS recip_sum_micro,
        |  CAST(count(*) * 1000000000000 //
        |    sum(CAST(round(1000000.0 / value) AS BIGINT)) AS BIGINT)
        |    AS harmonic_micro
        |FROM events WHERE value > 0 GROUP BY 1""".stripMargin,

    // the same micro-ln long sum, the same fixed-order exp back out.
    "a21_geomean" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(ln(value) * 1000000.0) AS BIGINT)) AS BIGINT)
        |    AS ln_sum_micro,
        |  CAST(round(exp(CAST(sum(CAST(round(ln(value) * 1000000.0)
        |      AS BIGINT)) AS DOUBLE) / count(*) / 1000000.0)
        |    * 1000000.0) AS BIGINT) AS geomean_micro
        |FROM events WHERE value > 0 GROUP BY 1""".stripMargin,

    "w9_percent_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_totalprice, o_orderkey)""".stripMargin,

    // both estimators replayed beside the exact count: the HLL register
    // chain over event_id and the a8 KMV k-th-smallest rule.
    "a20_sketch_accuracy" -> {
      val w = graft.ops.SketchOps.HllW
      val cap = graft.ops.SketchOps.HllRankCap
      val mask = (1L << w) - 1
      val m = graft.ops.SketchOps.HllM
      val num = graft.ops.SketchOps.HllEstNumerator
      s"""WITH hh AS (SELECT event_type,
         |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
         |      AS h FROM events),
         |hr AS (SELECT event_type, h >> $w AS idx,
         |    CAST(CASE WHEN (h & $mask) = 0 THEN $cap
         |      ELSE $cap - length(bin(h & $mask)) END AS BIGINT) AS rank
         |  FROM hh),
         |regs AS (SELECT event_type, idx, max(rank) AS max_rank FROM hr
         |  GROUP BY 1, 2),
         |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_registers,
         |    CAST(sum(CAST(1 AS BIGINT) << ($cap - max_rank)) AS BIGINT)
         |      AS zf FROM regs GROUP BY 1),
         |e AS (SELECT event_type,
         |    CAST($num // (zf + ($m - n_registers) * ${1L << cap})
         |      AS BIGINT) AS hll_est_micro FROM g),
         |kh AS (SELECT DISTINCT event_type,
         |    md5(CAST(event_id AS VARCHAR)) AS h FROM events),
         |kr AS (SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
         |  FROM kh),
         |kv AS (SELECT event_type,
         |    round(63 / (('0x' || substr(h, 1, 8))::BIGINT / 4294967296.0), 6)
         |      AS kmv_estimate
         |  FROM kr WHERE rk = 64),
         |x AS (SELECT event_type,
         |    CAST(count(DISTINCT event_id) AS BIGINT) AS exact_distinct
         |  FROM events GROUP BY 1)
         |SELECT x.event_type, x.exact_distinct, e.hll_est_micro,
         |  CAST(abs(e.hll_est_micro - x.exact_distinct * 1000000)
         |    // x.exact_distinct AS BIGINT) AS hll_err_ppm,
         |  kv.kmv_estimate,
         |  CAST(floor(abs(kv.kmv_estimate - x.exact_distinct)
         |    / x.exact_distinct * 1000000.0) AS BIGINT) AS kmv_err_ppm
         |FROM x JOIN e USING (event_type) JOIN kv USING (event_type)"""
        .stripMargin
    },

    "a7_histogram" ->
      """SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY bucket""".stripMargin,

    "sj3_full_outer" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
        |), big AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_big
        |  FROM orders WHERE o_totalprice > 450 GROUP BY o_custkey
        |)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |  coalesce(c_name, '') AS c_name,
        |  coalesce(n_big, 0) AS n_big
        |FROM cust FULL OUTER JOIN big ON c_custkey = o_custkey""".stripMargin,

    // Q3 replayed: numeric top-10, VARCHAR projection of the revenue.
    "j5_shipping_priority" ->
      """SELECT l_orderkey, ots, o_orderpriority,
        |  CAST(CAST(rev AS DECIMAL(38,6)) AS VARCHAR) AS revenue
        |FROM (
        |  SELECT l_orderkey, epoch_us(o_orderdate) AS ots, o_orderpriority,
        |    sum(CAST(round(l_extendedprice * (1.0 - l_discount), 6)
        |      AS DECIMAL(28,6))) AS rev
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE c_mktsegment = 'BUILDING'
        |    AND o_orderdate < TIMESTAMP '1998-06-01'
        |    AND l_shipdate > TIMESTAMP '1998-06-01'
        |  GROUP BY 1, 2, 3)
        |ORDER BY rev DESC, ots, l_orderkey LIMIT 10""".stripMargin,

    "dq_join_skew" ->
      """WITH c AS (SELECT l_orderkey, count(*) AS c FROM lineitem
        |  GROUP BY 1)
        |SELECT c AS rows_per_key, CAST(count(*) AS BIGINT) AS n_keys
        |FROM c GROUP BY 1""".stripMargin,

    "src1_csv_roundtrip" ->
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        |FROM events""".stripMargin,

    // typed-Aggregator summary: the direct recompute, per event_type.
    "a16_typed_summary" ->
      """WITH v AS (SELECT event_type,
        |    CAST(round(value * 1e6, 0) AS BIGINT) AS m FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(m) AS BIGINT) AS sum_micro,
        |  min(m) AS min_micro, max(m) AS max_micro,
        |  CAST(round(CAST(sum(m) AS DOUBLE) / count(*), 0) AS BIGINT)
        |    AS avg_micro
        |FROM v GROUP BY event_type""".stripMargin,

    // the Q5-shape replay: same joins, same filters, same decimal
    // revenue contract.
    "j4_local_supplier_revenue" ->
      """SELECT n_name,
        |  CAST(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount), 6)
        |    AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS VARCHAR) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,

    // the corrupt split replayed: lines with event_id % 10 = 3 were
    // truncated (⇒ all parse fields NULL, counted corrupt), the rest
    // parse cleanly.
    "src6_corrupt_json" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(0 AS BIGINT) AS n_corrupt
        |FROM events WHERE event_id % 10 <> 3 GROUP BY event_type
        |UNION ALL
        |SELECT NULL AS event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_corrupt
        |FROM events WHERE event_id % 10 = 3""".stripMargin,

    // the partition-pruned aggregate recomputed off the original table:
    // pruning must lose nothing the filter keeps.
    "src5_partitioned_roundtrip" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT)) AS BIGINT)
        |    AS sum_micro,
        |  max(epoch_us(ts)) AS max_ts_us
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY event_type""".stripMargin,

    "src2_json_roundtrip" ->
      """SELECT event_id, event_type, value, epoch_us(ts) AS ts_us
        |FROM events""".stripMargin,

    // identity through the gzip wire format.
    "src7_gzip_roundtrip" ->
      """SELECT event_id, event_type, value, epoch_us(ts) AS ts_us
        |FROM events""".stripMargin,

    "src3_orc_roundtrip" ->
      """SELECT event_id, user_id, value, epoch_us(ts) AS ts_us
        |FROM events""".stripMargin,

    "f2_json_parse" ->
      """SELECT event_id,
        |  coalesce(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS k
        |FROM events""".stripMargin,

    // one aggregation pass, unpivoted: mirrors ProfileOps.constraintSuite
    "dq_constraints" ->
      """WITH m AS (SELECT
        |  round(CAST(count(DISTINCT event_id) AS DOUBLE) / count(*), 6) AS m0,
        |  round(avg(CASE WHEN user_id IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS m1,
        |  round(avg(CASE WHEN value BETWEEN 0 AND 100 THEN 1.0 ELSE 0.0 END), 6) AS m2,
        |  round(avg(CASE WHEN event_type IN ('click','view','purchase','signup')
        |                 THEN 1.0 ELSE 0.0 END), 6) AS m3,
        |  round(avg(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
        |                 THEN 1.0 ELSE 0.0 END), 6) AS m4
        |  FROM events),
        |s AS (
        |  SELECT 'event_id_unique' AS check_name, m0 AS metric,
        |    CAST(1.0 AS DOUBLE) AS min_accept FROM m
        |  UNION ALL SELECT 'user_id_complete', m1, 0.99 FROM m
        |  UNION ALL SELECT 'value_in_range', m2, 0.99 FROM m
        |  UNION ALL SELECT 'type_in_domain', m3, 0.95 FROM m
        |  UNION ALL SELECT 'props_json_k', m4, 0.9 FROM m)
        |SELECT check_name, metric, min_accept,
        |  CAST(CASE WHEN metric >= min_accept THEN 1 ELSE 0 END AS BIGINT) AS passed
        |FROM s""".stripMargin,

    "f3_gpu_flavor" -> (f3ClassifiedSql +
      """SELECT event_id,
        |  coalesce(su_type, '(quarantined)') AS su_type,
        |  CAST(coalesce(gpu_count, -1) AS BIGINT) AS gpu_count,
        |  coalesce(reason, 'ok') AS quarantine_reason
        |FROM cls""".stripMargin),

    "f3_gpu_quarantine" -> (f3ClassifiedSql +
      """SELECT (su_type IS NOT NULL AND reason IS NULL) AS is_clean,
        |  coalesce(reason, 'ok') AS quarantine_reason,
        |  count(*) AS n
        |FROM cls GROUP BY 1, 2""".stripMargin),

    "skew_salted_sum" ->
      """SELECT event_type,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,

    "w6_global_cumsum" ->
      """SELECT o_orderkey,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    ORDER BY o_orderkey
        |    ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,2)) AS VARCHAR) AS running_total
        |FROM orders""".stripMargin,

    "iv1_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS iv_start,
        |    epoch_us(ts) + CAST(CAST(value AS DECIMAL(18,2)) * 1000000 AS BIGINT) AS iv_end,
        |    event_id
        |  FROM events
        |), x AS (
        |  SELECT user_id, iv_start, iv_end, event_id,
        |    max(iv_end) OVER (PARTITION BY user_id ORDER BY iv_start, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
        |  FROM iv
        |), y AS (
        |  SELECT user_id, iv_start, iv_end, event_id,
        |    CASE WHEN prior_max IS NULL OR iv_start > prior_max THEN 1 ELSE 0 END AS is_new
        |  FROM x
        |), z AS (
        |  SELECT user_id, iv_start, iv_end,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY iv_start, event_id
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM y
        |)
        |SELECT user_id, min(iv_start) AS island_start, max(iv_end) AS island_end,
        |  count(*) AS n_merged
        |FROM z GROUP BY user_id, island""".stripMargin,

    // the island merge rolled to covered/span time per user.
    "iv3_coverage" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS iv_start,
        |    epoch_us(ts) + CAST(CAST(value AS DECIMAL(18,2)) * 1000000 AS BIGINT) AS iv_end,
        |    event_id
        |  FROM events
        |), x AS (
        |  SELECT user_id, iv_start, iv_end, event_id,
        |    max(iv_end) OVER (PARTITION BY user_id ORDER BY iv_start, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
        |  FROM iv
        |), y AS (
        |  SELECT user_id, iv_start, iv_end, event_id,
        |    CASE WHEN prior_max IS NULL OR iv_start > prior_max THEN 1 ELSE 0 END AS is_new
        |  FROM x
        |), z AS (
        |  SELECT user_id, iv_start, iv_end,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY iv_start, event_id
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM y
        |), isl AS (
        |  SELECT user_id, min(iv_start) AS s, max(iv_end) AS e
        |  FROM z GROUP BY user_id, island
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(e - s) AS BIGINT) AS covered_us,
        |  CAST(max(e) - min(s) AS BIGINT) AS span_us,
        |  CAST(sum(e - s) * 1000000 // (max(e) - min(s)) AS BIGINT)
        |    AS coverage_ppm
        |FROM isl GROUP BY user_id""".stripMargin,

    "j2_salted_join" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey""".stripMargin,

    "a9_winsorized" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    round(quantile_cont(l_extendedprice, 0.05), 6) AS lo,
        |    round(quantile_cont(l_extendedprice, 0.95), 6) AS hi
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag,
        |  round(CAST(CAST(sum(CAST(least(greatest(l_extendedprice, lo), hi) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) / count(*), 6) AS wins_mean,
        |  CAST(sum(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped
        |FROM lineitem JOIN b USING (l_returnflag)
        |GROUP BY l_returnflag""".stripMargin,

    "aj3_asof_bucketed" ->
      """WITH day AS (
        |  SELECT o_custkey AS key, epoch_us(o_orderdate) AS ots,
        |         CAST(count(*) AS BIGINT) AS day_orders
        |  FROM orders GROUP BY 1, 2
        |), ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        |)
        |SELECT event_id, user_id, ts_us,
        |  coalesce(ots, -1) AS last_order_us,
        |  coalesce(day_orders, 0) AS last_day_orders
        |FROM ev ASOF LEFT JOIN day ON ev.user_id = day.key AND ev.ts_us >= day.ots""".stripMargin,

    "src4_schema_evolution" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, event_type,
        |  CAST(NULL AS DOUBLE) AS value, 1 AS src_v
        |FROM events WHERE event_id % 2 = 0
        |UNION ALL
        |SELECT event_id, epoch_us(ts) AS ts_us,
        |  CAST(NULL AS VARCHAR) AS event_type, value, 2 AS src_v
        |FROM events WHERE event_id % 2 = 1""".stripMargin,

    // bit-interleave replay of Layout.zorderKey: a's bits odd, b's even
    "layout_zorder" -> {
      val terms = (0 until 10).map(i =>
        s"(((a >> $i) & 1) << ${2 * i + 1}) | (((b >> $i) & 1) << ${2 * i})")
      s"""WITH m AS (SELECT event_id, event_id % 1024 AS b,
         |    user_id % 1024 AS a FROM events)
         |SELECT event_id, a, b,
         |  ${terms.mkString(" | ")} AS zkey
         |FROM m""".stripMargin
    },

    // the same exact-decimal moments and fixed-order Pearson doubles.
    "profile_corr" -> {
      // the LEFT product operand widens to DECIMAL(19,6): that forces
      // DuckDB's int128 multiply path (two narrow operands multiply in
      // int64 and overflow on a squared price)
      def v(c: String) = s"CAST(round(CAST($c AS DOUBLE), 6) AS DECIMAL(12,6))"
      def vw(c: String) = s"CAST(${v(c)} AS DECIMAL(19,6))"
      def pair(a: String, b: String) =
        s"""SELECT '$a' AS col_a, '$b' AS col_b, n,
           |  CAST(round((CAST(n AS DOUBLE) * CAST(sxy_${a}_$b AS DOUBLE)
           |      - CAST(sx_$a AS DOUBLE) * CAST(sx_$b AS DOUBLE))
           |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx_$a AS DOUBLE)
           |        - CAST(sx_$a AS DOUBLE) * CAST(sx_$a AS DOUBLE))
           |      * (CAST(n AS DOUBLE) * CAST(sxx_$b AS DOUBLE)
           |        - CAST(sx_$b AS DOUBLE) * CAST(sx_$b AS DOUBLE)))
           |    * 1000000.0) AS BIGINT) AS r_micro FROM m""".stripMargin
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val moments =
        "CAST(count(*) AS BIGINT) AS n, " +
          cols.map(c => s"sum(${v(c)}) AS sx_$c, sum(${vw(c)} * ${v(c)}) AS sxx_$c")
            .mkString(", ") + ", " +
          cols.combinations(2).toSeq.map { case Seq(a, b) =>
            s"sum(${vw(a)} * ${v(b)}) AS sxy_${a}_$b"
          }.mkString(", ")
      val selects = cols.combinations(2).toSeq
        .map { case Seq(a, b) => pair(a, b) }
        .mkString("\nUNION ALL\n")
      s"""WITH m AS (SELECT $moments FROM lineitem)
         |$selects""".stripMargin
    },

    // the same most-specific-first Allen ladder over exact endpoints.
    "iv2_allen" ->
      """WITH iv AS (SELECT user_id, event_type,
        |    epoch_us(min(ts)) AS st, epoch_us(max(ts)) AS en
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.st AS s1, a.en AS e1, b.st AS s2, b.en AS e2
        |  FROM iv a JOIN iv b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type)
        |SELECT CASE
        |    WHEN s1 = s2 AND e1 = e2 THEN 'equals'
        |    WHEN e1 < s2 THEN 'precedes'
        |    WHEN e1 = s2 THEN 'meets'
        |    WHEN e2 < s1 THEN 'preceded_by'
        |    WHEN e2 = s1 THEN 'met_by'
        |    WHEN s1 = s2 AND e1 < e2 THEN 'starts'
        |    WHEN s1 = s2 THEN 'started_by'
        |    WHEN e1 = e2 AND s1 > s2 THEN 'finishes'
        |    WHEN e1 = e2 THEN 'finished_by'
        |    WHEN s1 > s2 AND e1 < e2 THEN 'during'
        |    WHEN s1 < s2 AND e1 > e2 THEN 'contains'
        |    WHEN s1 < s2 THEN 'overlaps'
        |    ELSE 'overlapped_by' END AS relation,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM p GROUP BY 1""".stripMargin,

    // the xy2d bit walk as a recursive CTE: per level, the quadrant
    // digit and the reflect+swap rotation, terminal at i = -1.
    "layout_hilbert" ->
      """WITH RECURSIVE m AS (SELECT event_id, user_id % 1024 AS a,
        |    event_id % 1024 AS b FROM events),
        |r(event_id, i, x, y, d) AS (
        |  SELECT event_id, 9, a, b, CAST(0 AS BIGINT) FROM m
        |  UNION ALL
        |  SELECT event_id, i - 1,
        |    CASE WHEN ry = 0
        |      THEN (CASE WHEN rx = 1 THEN s - 1 - y ELSE y END)
        |      ELSE (CASE WHEN rx = 1 AND ry = 0 THEN s - 1 - x ELSE x END)
        |    END,
        |    CASE WHEN ry = 0
        |      THEN (CASE WHEN rx = 1 THEN s - 1 - x ELSE x END)
        |      ELSE (CASE WHEN rx = 1 AND ry = 0 THEN s - 1 - y ELSE y END)
        |    END,
        |    d + s * s * xor(3 * rx, ry)
        |  FROM (SELECT event_id, i, x, y, d,
        |      CAST(1 AS BIGINT) << i AS s,
        |      CASE WHEN (x & (CAST(1 AS BIGINT) << i)) > 0
        |        THEN 1 ELSE 0 END AS rx,
        |      CASE WHEN (y & (CAST(1 AS BIGINT) << i)) > 0
        |        THEN 1 ELSE 0 END AS ry
        |    FROM r WHERE i >= 0))
        |SELECT m.event_id, m.a, m.b, r.d AS hkey
        |FROM m JOIN r ON r.event_id = m.event_id AND r.i = -1"""
        .stripMargin,

    "ts_gapfill" ->
      """WITH pb AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS bkt,
        |         count(*) AS n
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2
        |), span AS (
        |  SELECT user_id, min(bkt) AS lo, max(bkt) AS hi FROM pb GROUP BY 1
        |), grid AS (
        |  SELECT user_id, unnest(range(lo, hi + 1)) AS bkt FROM span
        |)
        |SELECT grid.user_id, grid.bkt * 86400000000 AS bucket_start,
        |  CAST(coalesce(n, 0) AS BIGINT) AS n_events
        |FROM grid LEFT JOIN pb USING (user_id, bkt)""".stripMargin,

    "cdc_latest" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value
        |FROM (SELECT *, row_number() OVER (
        |    PARTITION BY user_id
        |    ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1""".stripMargin,

    "cdc_scd2" ->
      """SELECT user_id, event_id, event_type,
        |  epoch_us(ts) AS valid_from_us,
        |  lead(epoch_us(ts)) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS valid_to_us
        |FROM events""".stripMargin,

    "sql5_lateral" ->
      """SELECT n.n_name, t.c_name, CAST(t.bal AS VARCHAR) AS top_balance
        |FROM nation n,
        |LATERAL (
        |  SELECT c_name, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_name
        |  LIMIT 1
        |) t""".stripMargin,

    "f16_null_semantics" ->
      """WITH e AS (SELECT
        |    CASE WHEN event_id % 3 = 0 THEN value END AS v,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS k
        |  FROM events)
        |SELECT coalesce(k, '(null key)') AS k,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(v) AS BIGINT) AS n_nonnull,
        |  CAST(count(DISTINCT v) AS BIGINT) AS n_distinct_nonnull,
        |  coalesce(CAST(CAST(sum(CAST(v AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR),
        |    '(all null)') AS sum_v,
        |  round(CAST(CAST(sum(CAST(v AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
        |    / count(v), 6) AS avg_v
        |FROM e GROUP BY k""".stripMargin,

    "cdc_apply" -> {
      val cut = graft.core.Types.utcMicros(2024, 1, 15)
      s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         |    event_type, value FROM events),
         |snap AS (SELECT user_id, event_type, value FROM (
         |  SELECT *, row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts_us DESC, event_id DESC) AS rn
         |  FROM ev WHERE ts_us < $cut) WHERE rn = 1),
         |win AS (SELECT user_id,
         |    CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
         |    event_type, value FROM (
         |  SELECT *, row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts_us DESC, event_id DESC) AS rn
         |  FROM ev WHERE ts_us >= $cut) WHERE rn = 1)
         |SELECT s.user_id, s.event_type, s.value
         |FROM snap s LEFT JOIN win w USING (user_id) WHERE w.user_id IS NULL
         |UNION ALL
         |SELECT user_id, event_type, value FROM win WHERE op = 'upsert'""".stripMargin
    },

    // from-scratch recompute over ALL events — equals the engine's
    // base⊕delta merge exactly iff the aggregates are algebraic and the
    // micro units exact (the identity under test).
    "cdc_agg_merge" ->
      """WITH v AS (SELECT user_id,
        |    CAST(round(value * 1e6, 0) AS BIGINT) AS v_micro FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v_micro) AS BIGINT) AS sum_micro,
        |  min(v_micro) AS min_micro, max(v_micro) AS max_micro,
        |  CAST(round(CAST(sum(v_micro) AS DOUBLE) / count(*), 0) AS BIGINT)
        |    AS avg_micro
        |FROM v GROUP BY user_id""".stripMargin,

    // full-recompute histogram + the same exact-integer quantile read —
    // equals the engine's base⊕delta bin merge by bin additivity.
    "cdc_hist_merge" -> {
      val (nb, lo, w) = (CoreQueries.HistBins, CoreQueries.HistLoMicro,
        CoreQueries.HistWidthMicro)
      val vals = CoreQueries.HistQuantilesPermille
        .map(q => s"($q)").mkString(", ")
      s"""WITH b AS (SELECT least(greatest(CAST(floor(
         |      CAST(CAST(round(value * 1e6, 0) AS BIGINT) - $lo AS DOUBLE)
         |      / $w) AS BIGINT), 0), ${nb - 1}) AS bin FROM events),
         |h AS (SELECT bin, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1),
         |cum AS (SELECT bin, n, sum(n) OVER (ORDER BY bin) AS cum_n FROM h),
         |t AS (SELECT sum(n) AS total FROM h),
         |q(q_permille) AS (VALUES $vals),
         |sel AS (SELECT q_permille, min(bin) AS bin
         |  FROM q, t, cum
         |  WHERE cum_n >= (q_permille * total + 999) // 1000
         |  GROUP BY 1)
         |SELECT CAST(q_permille AS BIGINT) AS q_permille, sel.bin,
         |  CAST($lo + sel.bin * $w AS BIGINT) AS edge_micro,
         |  CAST(cum.cum_n AS BIGINT) AS cum_n
         |FROM sel JOIN cum ON sel.bin = cum.bin""".stripMargin
    },

    // PSI replay: same fixed grid + clamp, add-one smoothing, identical
    // double expression micro-rounded per bin.
    "dq_psi_drift" -> {
      val (nb, lo, w) = (CoreQueries.HistBins, CoreQueries.HistLoMicro,
        CoreQueries.HistWidthMicro)
      val cut = graft.core.Types.utcMicros(2024, 1, 15)
      def binCte(name: String, cond: String) =
        s"""$name AS (SELECT least(greatest(CAST(floor(
           |      CAST(CAST(round(value * 1e6, 0) AS BIGINT) - $lo AS DOUBLE)
           |      / $w) AS BIGINT), 0), ${nb - 1}) AS bin
           |  FROM events WHERE epoch_us(ts) $cond $cut)""".stripMargin
      s"""WITH ${binCte("r", "<")},
         |${binCte("c", ">=")},
         |rb AS (SELECT bin, count(*) AS n FROM r GROUP BY 1),
         |cb AS (SELECT bin, count(*) AS n FROM c GROUP BY 1),
         |spine AS (SELECT unnest(range(0, $nb)) AS bin),
         |j AS (SELECT spine.bin,
         |    CAST(coalesce(rb.n, 0) AS BIGINT) AS ref_n,
         |    CAST(coalesce(cb.n, 0) AS BIGINT) AS cur_n
         |  FROM spine LEFT JOIN rb USING (bin) LEFT JOIN cb USING (bin)),
         |t AS (SELECT sum(ref_n) AS nr, sum(cur_n) AS nc FROM j)
         |SELECT bin, ref_n, cur_n,
         |  CAST(round((CAST(cur_n + 1 AS DOUBLE) / CAST(nc + $nb AS DOUBLE)
         |      - CAST(ref_n + 1 AS DOUBLE) / CAST(nr + $nb AS DOUBLE))
         |    * ln((CAST(cur_n + 1 AS DOUBLE) / CAST(nc + $nb AS DOUBLE))
         |        / (CAST(ref_n + 1 AS DOUBLE) / CAST(nr + $nb AS DOUBLE)))
         |    * 1e6, 0) AS BIGINT) AS psi_term_micro
         |FROM j, t""".stripMargin
    },

    "f15_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
        |  FROM events),
        |x AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id) AS prev_ts FROM e),
        |y AS (SELECT *, CASE WHEN prev_ts IS NULL
        |    OR ts_us - prev_ts >= 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM x),
        |z AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM y)
        |SELECT user_id,
        |  min(ts_us) AS session_start_us,
        |  max(ts_us) + 1800000000 AS session_end_us,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_value
        |FROM z GROUP BY user_id, sid""".stripMargin,

    "profile_columns" -> {
      def row(c: String, numericAsDec: Boolean) = {
        val mn = if (numericAsDec) s"CAST(CAST(min($c) AS DECIMAL(18,6)) AS VARCHAR)"
                 else s"CAST(min($c) AS VARCHAR)"
        val mx = if (numericAsDec) s"CAST(CAST(max($c) AS DECIMAL(18,6)) AS VARCHAR)"
                 else s"CAST(max($c) AS VARCHAR)"
        s"""SELECT '$c' AS col_name,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  $mn AS min_val, $mx AS max_val
           |FROM o""".stripMargin
      }
      val rows = Seq(
        row("o_orderkey", false), row("o_custkey", false),
        row("o_orderstatus", false), row("o_totalprice", true),
        row("o_orderpriority", false), row("o_orderdate_us", false))
      s"""WITH o AS (SELECT *, epoch_us(o_orderdate) AS o_orderdate_us FROM orders)
         |${rows.mkString("\nUNION ALL\n")}""".stripMargin
    },

    "f12_window_tumbling" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_start_us,
        |  count(*) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,

    "f13_window_sliding" ->
      """WITH e AS (SELECT epoch_us(ts) AS t FROM events),
        |x AS (
        |  SELECT (t // 1800000000) * 1800000000 - k * 1800000000 AS win_start_us
        |  FROM e CROSS JOIN (VALUES (0), (1)) AS o(k)
        |)
        |SELECT win_start_us, count(*) AS n_events
        |FROM x GROUP BY 1""".stripMargin,

    "bf1_bloom_prune" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 450)""".stripMargin,

    "j3_nullsafe" ->
      """WITH e AS (
        |  SELECT nullif(user_id % 50, 25) AS k, count(*) AS n_events
        |  FROM events GROUP BY 1
        |), c AS (
        |  SELECT nullif(c_custkey % 50, 25) AS k, count(*) AS n_cust
        |  FROM customer GROUP BY 1
        |)
        |SELECT coalesce(e.k, -1) AS k,
        |  CAST(n_events AS BIGINT) AS n_events,
        |  CAST(n_cust AS BIGINT) AS n_cust
        |FROM e JOIN c ON e.k IS NOT DISTINCT FROM c.k""".stripMargin,

    "a11_mad" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    round(quantile_cont(l_extendedprice, 0.5), 6) AS med
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag,
        |  first(med) AS median_price,
        |  round(quantile_cont(abs(l_extendedprice - med), 0.5), 6) AS mad_price
        |FROM lineitem JOIN m USING (l_returnflag)
        |GROUP BY l_returnflag""".stripMargin,

    "a12_countmin" -> {
      val d = graft.ops.SketchOps.CmsDepth
      val w = graft.ops.SketchOps.CmsWidth
      def bucket(k: String, r: String) =
        s"(('0x' || substr(md5($r || ':' || CAST($k AS VARCHAR)), 1, 8))::BIGINT % $w)"
      s"""WITH ev AS (SELECT user_id FROM events),
         |rows_ AS (SELECT unnest(range($d)) AS r),
         |rb AS (SELECT user_id, r, ${bucket("user_id", "r")} AS b
         |  FROM ev CROSS JOIN rows_),
         |cms AS (SELECT r, b, count(*) AS c FROM rb GROUP BY r, b),
         |exact AS (SELECT user_id, CAST(count(*) AS BIGINT) AS true_count
         |  FROM ev GROUP BY user_id),
         |kb AS (SELECT e.user_id, rows_.r, ${bucket("e.user_id", "rows_.r")} AS b
         |  FROM exact e CROSS JOIN rows_),
         |est AS (SELECT kb.user_id, min(c) AS cms_estimate
         |  FROM kb JOIN cms USING (r, b) GROUP BY kb.user_id)
         |SELECT e.user_id, e.true_count,
         |  CAST(est.cms_estimate AS BIGINT) AS cms_estimate,
         |  est.cms_estimate >= e.true_count AS never_undercounts
         |FROM exact e JOIN est USING (user_id)""".stripMargin
    },

    "a13_heavy_hitters" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS true_count
        |FROM events GROUP BY user_id HAVING count(*) >= 80""".stripMargin,

    // correlated key-sample join-size estimate: same md5 16-bit draw on
    // both sides, Σ c_o·c_l over surviving keys × 16, vs the real join.
    "a17_join_card_est" ->
      """WITH co AS (SELECT o_orderkey AS k, count(*) AS c FROM orders
        |  WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT
        |    < 4096 GROUP BY 1),
        |cl AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem
        |  WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 4))::BIGINT
        |    < 4096 GROUP BY 1),
        |e AS (SELECT CAST(sum(co.c * cl.c) * 16 AS BIGINT) AS est_rows
        |  FROM co JOIN cl USING (k)),
        |x AS (SELECT count(*) AS exact_rows FROM orders
        |  JOIN lineitem ON o_orderkey = l_orderkey)
        |SELECT e.est_rows, x.exact_rows,
        |  CAST(abs(e.est_rows - x.exact_rows) * 1000000 // x.exact_rows
        |    AS BIGINT) AS err_ppm
        |FROM e, x""".stripMargin,

    // the skyline by definition: no other part weakly better on both
    // dimensions and strictly better on one (DuckDB plans the
    // inequality pair as an IEJoin — fine at oracle scale).
    "w8_skyline" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part r
        |WHERE NOT EXISTS (SELECT 1 FROM part o
        |  WHERE o.p_retailprice >= r.p_retailprice AND o.p_size <= r.p_size
        |    AND (o.p_retailprice > r.p_retailprice OR o.p_size < r.p_size))"""
        .stripMargin,

    // the same perturbed views diffed with null-safe compares.
    "cdc_reconcile" ->
      """WITH base AS (SELECT event_id, event_type, value FROM events),
        |v1 AS (SELECT * FROM base WHERE event_id % 7 <> 3),
        |v2 AS (SELECT event_id, event_type,
        |    CASE WHEN event_id % 13 = 0 THEN value + 1.0 ELSE value END
        |      AS value
        |  FROM base WHERE event_id % 11 <> 4),
        |j AS (SELECT v1.event_id AS ka, v2.event_id AS kb,
        |    v1.event_type AS at, v2.event_type AS bt,
        |    v1.value AS av, v2.value AS bv
        |  FROM v1 FULL OUTER JOIN v2 ON v1.event_id = v2.event_id)
        |SELECT
        |  CAST(sum(CASE WHEN ka IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_v1,
        |  CAST(sum(CASE WHEN kb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_v2,
        |  CAST(sum(CASE WHEN ka IS NULL AND kb IS NOT NULL THEN 1 ELSE 0
        |    END) AS BIGINT) AS n_added,
        |  CAST(sum(CASE WHEN ka IS NOT NULL AND kb IS NULL THEN 1 ELSE 0
        |    END) AS BIGINT) AS n_removed,
        |  CAST(sum(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
        |    AND (NOT (at IS NOT DISTINCT FROM bt)
        |      OR NOT (av IS NOT DISTINCT FROM bv)) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_changed,
        |  CAST(sum(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
        |    AND (at IS NOT DISTINCT FROM bt)
        |    AND (av IS NOT DISTINCT FROM bv) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_unchanged,
        |  CAST(sum(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
        |    AND NOT (at IS NOT DISTINCT FROM bt) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS changed_event_type,
        |  CAST(sum(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL
        |    AND NOT (av IS NOT DISTINCT FROM bv) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS changed_value
        |FROM j""".stripMargin,

    // the FULL join recomputed from scratch — equal to the query's
    // delta-rule maintenance by the distribution identity.
    "cdc_join_merge" ->
      """SELECT epoch_us(o_orderdate) // 2678400000000 AS month_bucket,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DECIMAL(38,2)) AS VARCHAR) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin,

    // the same integer Poisson thresholds on the same md5(key:b) draw,
    // exact decimal replicate sums, identical mean/round arithmetic.
    "a19_bootstrap_ci" -> {
      val ts = graft.ops.ExperimentOps.PoissonThresholds
      val sumTerms = ts.map(t => s"CASE WHEN u >= $t THEN 1 ELSE 0 END")
        .mkString(" + ")
      """WITH base AS (SELECT CAST(event_id AS VARCHAR) AS kk,
        |    CAST(round(value, 6) AS DECIMAL(18,6)) AS v FROM events),
        |ex AS (SELECT v, kk, b,
        |    ('0x' || substr(md5(kk || ':' || CAST(b // 8 AS VARCHAR)),
        |      CAST((b % 8) * 4 + 1 AS INT), 4))::BIGINT AS u
        |  FROM base, (SELECT unnest(range(0, 64)) AS b)),
        |mu AS (SELECT v, b, CAST(SUMTERMS AS BIGINT) AS mult FROM ex),
        |rep AS (SELECT b,
        |    CAST(round(CAST(sum(v * mult) AS DOUBLE) / sum(mult)
        |      * 1000000.0) AS BIGINT) AS m
        |  FROM mu GROUP BY b),
        |rk AS (SELECT m, row_number() OVER (ORDER BY m, b) AS rk FROM rep),
        |fl AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(round(CAST(sum(v) AS DOUBLE) / count(*) * 1000000.0)
        |      AS BIGINT) AS mean_micro FROM base)
        |SELECT fl.n_rows, fl.mean_micro,
        |  CAST(64 AS BIGINT) AS n_replicates,
        |  (SELECT m FROM rk WHERE rk = 2) AS ci_lo_micro,
        |  (SELECT m FROM rk WHERE rk = 63) AS ci_hi_micro
        |FROM fl""".stripMargin.replace("SUMTERMS", "(" + sumTerms + ")")
    },

    // the same md5 arm split, exact decimal moments, and the identical
    // fixed-order mean/variance/Welch-t doubles, micro-rounded.
    "a18_ab_lift" ->
      """WITH m AS (SELECT
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT
        |      < 32768 AS a,
        |    CAST(round(value, 6) AS DECIMAL(18,6)) AS v
        |  FROM events),
        |g AS (SELECT
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    sum(CASE WHEN a THEN v ELSE CAST(0 AS DECIMAL(18,6)) END) AS s1a,
        |    sum(CASE WHEN NOT a THEN v ELSE CAST(0 AS DECIMAL(18,6)) END) AS s1b,
        |    sum(CASE WHEN a THEN v * v
        |        ELSE CAST(0 AS DECIMAL(18,6)) END) AS s2a,
        |    sum(CASE WHEN NOT a THEN v * v
        |        ELSE CAST(0 AS DECIMAL(18,6)) END) AS s2b
        |  FROM m)
        |SELECT n_a, n_b,
        |  CAST(round(CAST(s1a AS DOUBLE) / n_a * 1000000.0) AS BIGINT)
        |    AS mean_a_micro,
        |  CAST(round(CAST(s1b AS DOUBLE) / n_b * 1000000.0) AS BIGINT)
        |    AS mean_b_micro,
        |  CAST(CASE WHEN s1b = 0 THEN 0 ELSE
        |    round((CAST(s1a AS DOUBLE) / n_a - CAST(s1b AS DOUBLE) / n_b)
        |      / (CAST(s1b AS DOUBLE) / n_b) * 1000000.0) END AS BIGINT)
        |    AS lift_ppm,
        |  CAST(round((CAST(s1a AS DOUBLE) / n_a - CAST(s1b AS DOUBLE) / n_b)
        |    / sqrt(((CAST(s2a AS DOUBLE)
        |        - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / n_a)
        |        / (n_a - 1)) / n_a
        |      + ((CAST(s2b AS DOUBLE)
        |        - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE) / n_b)
        |        / (n_b - 1)) / n_b)
        |    * 1000000.0) AS BIGINT) AS t_micro
        |FROM g""".stripMargin,

    // first digit from the integer part's string; the nine Benford
    // probabilities are the SAME Scala-computed literals the Spark plan
    // carries, so the χ² doubles replay exactly.
    "dq_benford" -> {
      val plist = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
        .mkString("[", ", ", "]")
      s"""WITH o AS (SELECT CAST(substr(CAST(CAST(floor(l_extendedprice)
         |      AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
         |    CAST(count(*) AS BIGINT) AS n_obs
         |  FROM lineitem WHERE l_extendedprice >= 1 GROUP BY 1),
         |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM o),
         |s AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit),
         |j AS (SELECT s.digit, coalesce(o.n_obs, 0) AS n_obs
         |  FROM s LEFT JOIN o USING (digit))
         |SELECT CAST(j.digit AS BIGINT) AS digit, j.n_obs,
         |  CAST(round(t.n * ($plist)[j.digit] * 1000000.0) AS BIGINT)
         |    AS exp_micro,
         |  CAST(round((CAST(j.n_obs AS DOUBLE) - t.n * ($plist)[j.digit])
         |      * (CAST(j.n_obs AS DOUBLE) - t.n * ($plist)[j.digit])
         |      / (t.n * ($plist)[j.digit]) * 1000000.0) AS BIGINT)
         |    AS chi_term_micro
         |FROM j, t""".stripMargin
    },

    "w7_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER w AS last_ok,
        |  coalesce(nth_value(o_orderkey, 2) OVER w, -1) AS second_ok
        |FROM (SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS ots FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY ots, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,

    "sql3_subqueries" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_nationkey IN
        |    (SELECT n_nationkey FROM nation WHERE n_name LIKE '%A%')
        |  AND EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c_custkey
        |      AND o.o_totalprice > (
        |        SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |                    AS DOUBLE) / count(*)
        |        FROM orders))""".stripMargin,

    "f14_variant_json" ->
      """SELECT event_id,
        |  coalesce(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS k
        |FROM events""".stripMargin,

    "sql4_recursive_cte" ->
      """WITH RECURSIVE months(m, mx) AS (
        |  SELECT date_trunc('month', mn), date_trunc('month', mx)
        |  FROM (SELECT min(o_orderdate) AS mn, max(o_orderdate) AS mx
        |        FROM orders)
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH, mx FROM months WHERE m < mx
        |)
        |SELECT epoch_us(m) AS month_us, CAST(coalesce(n, 0) AS BIGINT) AS n_orders
        |FROM months LEFT JOIN (
        |  SELECT date_trunc('month', o_orderdate) AS m2, count(*) AS n
        |  FROM orders GROUP BY 1) ON m = m2""".stripMargin,

    "a10_zscore" ->
      """WITH s AS (
        |  SELECT event_type, count(value) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_d,
        |    CAST(sum(CAST(value * value AS DECIMAL(28,10))) AS DOUBLE) AS sumsq_d
        |  FROM events GROUP BY event_type
        |), st AS (
        |  SELECT event_type, sum_d / n AS mean,
        |    sqrt((sumsq_d - sum_d * sum_d / n) / (n - 1)) AS sd
        |  FROM s
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN abs(value - mean) > 3.0 * sd THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM events JOIN st USING (event_type)
        |GROUP BY event_type""".stripMargin,

    "k2_interval_subtract" ->
      s"""$runsCte, iv AS (
         |  SELECT * FROM (VALUES ($s, $e, 1), (${o1._1}, ${o1._2}, -1), (${o2._1}, ${o2._2}, -1))
         |    AS t(iv_start, iv_end, weight)
         |), c AS (
         |  SELECT key, state, weight,
         |         greatest(least(ts_us, iv_end), iv_start) AS t0,
         |         coalesce(greatest(least(next_ts_us, iv_end), iv_start), iv_end) AS t1
         |  FROM runs CROSS JOIN iv
         |)
         |SELECT key,
         |  CAST(sum(CASE WHEN state = 'Running' THEN (t1 - t0) * weight ELSE 0 END) AS BIGINT) AS running_us,
         |  CAST(sum(CASE WHEN state = 'Stopped' THEN (t1 - t0) * weight ELSE 0 END) AS BIGINT) AS stopped_us
         |FROM c GROUP BY key""".stripMargin,

    // Spearman replayed: tie-averaged DOUBLED ranks from the distinct-
    // value spines (pure integers), HUGEINT moments, the same fixed
    // double order for ρ.
    "profile_spearman" ->
      """WITH d AS (SELECT l_quantity AS a, l_discount AS b FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
        |ra AS (SELECT v_a, 2 * cum - cnt + 1 AS r2_a FROM (
        |  SELECT a AS v_a, count(*) AS cnt,
        |    sum(count(*)) OVER (ORDER BY a
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d GROUP BY a)),
        |rb AS (SELECT v_b, 2 * cum - cnt + 1 AS r2_b FROM (
        |  SELECT b AS v_b, count(*) AS cnt,
        |    sum(count(*)) OVER (ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d GROUP BY b)),
        |j AS (SELECT r2_a, r2_b FROM d
        |  JOIN ra ON d.a = ra.v_a JOIN rb ON d.b = rb.v_b),
        |m AS (SELECT count(*) AS n,
        |  sum(CAST(r2_a AS HUGEINT)) AS sx, sum(CAST(r2_b AS HUGEINT)) AS sy,
        |  sum(CAST(r2_a AS HUGEINT) * r2_a) AS sxx,
        |  sum(CAST(r2_b AS HUGEINT) * r2_b) AS syy,
        |  sum(CAST(r2_a AS HUGEINT) * r2_b) AS sxy FROM j)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    * 1000000.0) AS BIGINT) AS rho_micro
        |FROM m""".stripMargin,

    // χ² cells replayed: margins from the cells, the full cross spine,
    // identical expected-count op order.
    "dq_chi_square" ->
      """WITH cells AS (SELECT l_returnflag AS va, l_linestatus AS vb,
        |    count(*) AS n_obs FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        |  GROUP BY 1, 2),
        |ra AS (SELECT va, sum(n_obs) AS row_n FROM cells GROUP BY 1),
        |cb AS (SELECT vb, sum(n_obs) AS col_n FROM cells GROUP BY 1),
        |tot AS (SELECT sum(n_obs) AS n FROM cells),
        |sp AS (SELECT va, vb, CAST(coalesce(n_obs, 0) AS BIGINT) AS n_obs,
        |    CAST(row_n AS DOUBLE) * col_n / n AS e
        |  FROM ra CROSS JOIN cb LEFT JOIN cells USING (va, vb) CROSS JOIN tot)
        |SELECT va, vb, n_obs,
        |  CAST(round(e * 1000000.0) AS BIGINT) AS exp_micro,
        |  CAST(round((CAST(n_obs AS DOUBLE) - e) * (CAST(n_obs AS DOUBLE) - e)
        |    / e * 1000000.0) AS BIGINT) AS chi_term_micro
        |FROM sp""".stripMargin,

    // Cramér's V from the same micro-additive terms; V's double derives
    // from the exact micro sum, like the Spark side.
    "dq_cramers_v" ->
      """WITH cells AS (SELECT l_returnflag AS va, l_linestatus AS vb,
        |    count(*) AS n_obs FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        |  GROUP BY 1, 2),
        |ra AS (SELECT va, sum(n_obs) AS row_n FROM cells GROUP BY 1),
        |cb AS (SELECT vb, sum(n_obs) AS col_n FROM cells GROUP BY 1),
        |tot AS (SELECT sum(n_obs) AS n FROM cells),
        |sp AS (SELECT va, vb, CAST(coalesce(n_obs, 0) AS BIGINT) AS n_obs,
        |    CAST(row_n AS DOUBLE) * col_n / n AS e
        |  FROM ra CROSS JOIN cb LEFT JOIN cells USING (va, vb) CROSS JOIN tot),
        |terms AS (SELECT va, vb, n_obs,
        |  CAST(round((CAST(n_obs AS DOUBLE) - e) * (CAST(n_obs AS DOUBLE) - e)
        |    / e * 1000000.0) AS BIGINT) AS chi_term_micro FROM sp),
        |a AS (SELECT sum(n_obs) AS n, count(DISTINCT va) AS n_rows,
        |  count(DISTINCT vb) AS n_cols, sum(chi_term_micro) AS chi2_micro
        |  FROM terms)
        |SELECT CAST(n AS BIGINT) AS n, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_cols AS BIGINT) AS n_cols,
        |  CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
        |  CAST(chi2_micro AS BIGINT) AS chi2_micro,
        |  CAST(CASE WHEN least(n_rows, n_cols) - 1 < 1 THEN 0
        |    ELSE round(sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0
        |      / (CAST(n AS DOUBLE) * (least(n_rows, n_cols) - 1)))
        |      * 1000000.0) END AS BIGINT) AS v_micro
        |FROM a""".stripMargin,

    // Kendall τ-b replayed from the contingency cells: the same
    // ordered-cell-pair concordance sums (HUGEINT-exact), margin tie
    // terms, identical fixed double order for τ.
    "profile_kendall" ->
      """WITH cells AS (SELECT l_quantity AS va, l_discount AS vb,
        |    count(*) AS c FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        |  GROUP BY 1, 2),
        |p AS (SELECT
        |  sum(CASE WHEN y.vb > x.vb THEN CAST(x.c AS HUGEINT) * y.c
        |    ELSE 0 END) AS nc,
        |  sum(CASE WHEN y.vb < x.vb THEN CAST(x.c AS HUGEINT) * y.c
        |    ELSE 0 END) AS nd
        |  FROM cells x JOIN cells y ON y.va > x.va),
        |m AS (SELECT sum(c) AS n FROM cells),
        |ta AS (SELECT sum(CAST(q AS HUGEINT) * q) AS sa2
        |  FROM (SELECT sum(c) AS q FROM cells GROUP BY va)),
        |tb AS (SELECT sum(CAST(q AS HUGEINT) * q) AS sb2
        |  FROM (SELECT sum(c) AS q FROM cells GROUP BY vb))
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(nc AS VARCHAR) AS nc, CAST(nd AS VARCHAR) AS nd,
        |  CAST(round((CAST(nc AS DOUBLE) - CAST(nd AS DOUBLE)) /
        |    sqrt(CAST((CAST(n AS HUGEINT) * n - n) - (sa2 - n) AS DOUBLE) / 2.0
        |      * (CAST((CAST(n AS HUGEINT) * n - n) - (sb2 - n) AS DOUBLE) / 2.0))
        |    * 1000000.0) AS BIGINT) AS tau_micro
        |FROM p CROSS JOIN m CROSS JOIN ta CROSS JOIN tb""".stripMargin,

    // median/MAD replayed: the same value-spine cumulative windows, the
    // same lower-weighted-median rule (cum·2 ≥ n), zero-MAD convention
    // v ≠ median, fixed double order for the 0.6745 modified z.
    "dq_robust_zscore" ->
      """WITH sp AS (SELECT event_type AS key,
        |    CAST(round(CAST(value AS DOUBLE), 6) AS DECIMAL(18,6)) AS v,
        |    count(*) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |cu AS (SELECT key, v, c,
        |    sum(c) OVER (PARTITION BY key ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY key) AS n FROM sp),
        |md AS (SELECT key, max(n) AS n,
        |    min(CASE WHEN cum * 2 >= n THEN v END) AS med
        |  FROM cu GROUP BY key),
        |dv AS (SELECT sp.key, abs(sp.v - md.med) AS v, sum(sp.c) AS c
        |  FROM sp JOIN md ON sp.key = md.key GROUP BY 1, 2),
        |dc AS (SELECT key, v, c,
        |    sum(c) OVER (PARTITION BY key ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY key) AS n FROM dv),
        |mad AS (SELECT key, min(CASE WHEN cum * 2 >= n THEN v END) AS mad
        |  FROM dc GROUP BY key)
        |SELECT sp.key, CAST(max(md.n) AS BIGINT) AS n,
        |  CAST(round(CAST(max(md.med) AS DOUBLE) * 1000000.0) AS BIGINT)
        |    AS med_micro,
        |  CAST(round(CAST(max(mad.mad) AS DOUBLE) * 1000000.0) AS BIGINT)
        |    AS mad_micro,
        |  CAST(sum(CASE WHEN (CASE WHEN mad.mad > 0
        |      THEN 0.6745 * CAST(abs(sp.v - md.med) AS DOUBLE)
        |        / CAST(mad.mad AS DOUBLE) > 3.5
        |      ELSE sp.v <> md.med END)
        |    THEN sp.c ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM sp JOIN md ON sp.key = md.key JOIN mad ON sp.key = mad.key
        |GROUP BY sp.key""".stripMargin,

    // trimmed mean replayed: identical surviving-multiplicity window
    // formula kept(v) = max(0, min(cum, n−k) − max(cum−c, k)).
    "a24_trimmed_mean" ->
      """WITH sp AS (SELECT event_type AS key,
        |    CAST(round(CAST(value AS DOUBLE), 6) AS DECIMAL(18,6)) AS v,
        |    count(*) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |cu AS (SELECT key, v, c,
        |    sum(c) OVER (PARTITION BY key ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY key) AS n FROM sp),
        |kk AS (SELECT key, v, c, cum, n, n // 10 AS k FROM cu),
        |kp AS (SELECT key, v, c, n, k,
        |    greatest(0, least(cum, n - k) - greatest(cum - c, k)) AS kept
        |  FROM kk)
        |SELECT key, CAST(max(n) AS BIGINT) AS n,
        |  CAST(max(k) AS BIGINT) AS k_trim,
        |  CAST(round(CAST(sum(v * c) AS DOUBLE) / max(n) * 1000000.0)
        |    AS BIGINT) AS mean_micro,
        |  CAST(round(CAST(sum(v * kept) AS DOUBLE) / sum(kept) * 1000000.0)
        |    AS BIGINT) AS trimmed_mean_micro
        |FROM kp GROUP BY key""".stripMargin
  )
}
