"""The §2-inventory query registry: every operator capability as a
(spark_fn, oracle_sql) pair.

This is the correctness surface the driver grades (CORRECTNESS_r{N}.json):
each entry's Spark DataFrame result must hash-match its DuckDB oracle at
sf0.01 — row count, schema, and order-insensitive value hash, with columns
matched by *name*. Conventions that make that work:

- every computed column is aliased identically on both sides;
- money/measure sums go through DECIMAL so they are order-independent and
  bit-identical across engines (double addition is not associative);
- every hash-dependent operator uses functions.hashing.portable_hash64
  (identical in both engines);
- floating outputs (cosines, scores) are rounded to a fixed scale on both
  sides before compare/threshold.

Reference coverage map (SURVEY.md §2): sources → the parquet loads; map/
flatMap/filter → map_project / flatmap_tokens / filter_predicate; keyBy+reduce
→ keyed_* and running_reduce; aggregators SUM/MIN/MAX/MINBY/MAXBY → keyed_agg
/ keyed_minby / keyed_maxby; WordCount end-to-end → wordcount; sinks are
exercised by the driver collecting results. Everything beyond (joins, sort/
limit, windows, dedup/similarity/text/multimodal) is the Spark-native surface
the reference lacks, exposed as first-class capabilities.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mini_flink_spark.session import read_table


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    def deco(fn):
        QUERIES[name] = QuerySpec(name, fn, oracle, tags)
        return fn

    return deco


_CONF_APPLIED: set[int] = set()


def _t(spark, sf_dir, name) -> DataFrame:
    # The queries must behave on ANY caller-provided session (the driver uses
    # its own), so runtime-settable confs the plans depend on are (re)applied
    # here, not only in session.get_spark: InferFiltersFromGenerate clones
    # whole expression pipelines below exchanges (25× on shingle/minhash
    # paths — see session.py for the full story). Applied once per session
    # (the conf.set is a py4j round-trip; no point paying it per table read).
    key = id(spark)
    if key not in _CONF_APPLIED:
        spark.conf.set(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # The events ts column reads as TIMESTAMP_NTZ and is cast to TIMESTAMP
        # (session.read_table); a non-UTC caller session would shift the
        # instant against the DuckDB oracle's naive wall times. Pin UTC here
        # so query results don't depend on the caller's timezone.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        _CONF_APPLIED.add(key)
    return read_table(spark, sf_dir, name)


# Decimal-exact sum rendered to double — order-independent on both engines.
def dsum(col: str, scale: str = "(28,10)") -> F.Column:
    return F.sum(F.col(col).cast(f"decimal{scale}")).cast("double")


def dsum_sql(col: str, scale: str = "(28,10)") -> str:
    return f"(sum(({col})::DECIMAL{scale}))::DOUBLE"


# =========================================================================
# Core mini-flink surface
# =========================================================================


@register(
    "map_project",
    """
    SELECT event_id, value * 2.0 AS doubled, upper(event_type) AS type_u
    FROM events
    """,
    ("core", "map"),
)
def q_map_project(spark, sf_dir):
    """map (StreamMap.java:40-43): 1→1 columnar projection."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.col("value") * 2.0).alias("doubled"),
        F.upper("event_type").alias("type_u"),
    )


@register(
    "filter_predicate",
    """
    SELECT event_id, user_id, value FROM events
    WHERE event_type = 'purchase' AND value > 50.0
    """,
    ("core", "filter"),
)
def q_filter_predicate(spark, sf_dir):
    """filter (StreamFilter.java:38-42): predicate pushed to the parquet scan."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 50.0)).select(
        "event_id", "user_id", "value"
    )


@register(
    "flatmap_tokens",
    """
    SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(
        lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS tok
    FROM documents
    """,
    ("core", "flatmap"),
)
def q_flatmap_tokens(spark, sf_dir):
    """flatMap (StreamFlatMap.java:48-52): 1→N via explode."""
    from mini_flink_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.explode(tokens("text")).alias("tok"))


@register(
    "keyed_agg",
    f"""
    SELECT user_id,
           {dsum_sql('value')} AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value,
           count(*) AS cnt
    FROM events GROUP BY user_id
    """,
    ("core", "keyby", "reduce"),
)
def q_keyed_agg(spark, sf_dir):
    """keyBy + reduce with SUM/MIN/MAX aggregators (StreamGroupedReduce.java:
    35-56, SumAggregator.java:33-72, ComparableAggregator.java:31-93),
    converged state. One shuffle, map-side partials."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        dsum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "keyed_minby",
    """
    SELECT user_id, event_id, value FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value ASC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    ("core", "minby"),
)
def q_keyed_minby(spark, sf_dir):
    """MINBY with first-arrival tie-break (ComparableAggregator.java:78-86):
    whole record of the minimal value — single-pass min_by aggregation, not a
    window sort."""
    from mini_flink_spark.operators.aggregations import min_by_record

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return min_by_record(ev, [F.col("user_id")], "value", "event_id", first=True).select(
        "user_id", "event_id", "value"
    )


@register(
    "keyed_maxby",
    """
    SELECT user_id, event_id, value FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    ("core", "maxby"),
)
def q_keyed_maxby(spark, sf_dir):
    from mini_flink_spark.operators.aggregations import max_by_record

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return max_by_record(ev, [F.col("user_id")], "value", "event_id", first=True).select(
        "user_id", "event_id", "value"
    )


@register(
    "running_reduce",
    """
    SELECT user_id, event_id,
           (sum(value::DECIMAL(28,10)) OVER (
              PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE AS running_sum
    FROM events
    """,
    ("core", "running-reduce"),
)
def q_running_reduce(spark, sf_dir):
    """The reference's per-record cumulative emission (StreamGroupedReduce.java:
    40-54) — batch rendering: one row per input record carrying the running
    per-key sum in arrival (event_id) order."""
    from mini_flink_spark.operators.running_reduce import running_agg

    ev = _t(spark, sf_dir, "events")
    return running_agg(
        ev, ["user_id"], "event_id",
        running_sum=F.sum(F.col("value").cast("decimal(28,10)")),
    ).select("user_id", "event_id", F.col("running_sum").cast("double").alias("running_sum"))


@register(
    "wordcount",
    """
    SELECT tok AS word, count(*) AS count FROM (
      SELECT unnest(string_split(trim(regexp_replace(regexp_replace(
          lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS tok
      FROM documents
    ) GROUP BY tok
    """,
    ("core", "e2e"),
)
def q_wordcount(spark, sf_dir):
    """The reference's canonical program (WordCount.java:12-35) over the
    documents corpus: source → flatMap → keyBy → reduce, converged counts."""
    from mini_flink_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


@register(
    "distinct_event_types",
    "SELECT DISTINCT event_type FROM events",
    ("relational",),
)
def q_distinct(spark, sf_dir):
    return _t(spark, sf_dir, "events").select("event_type").distinct()


@register(
    "events_json_extract",
    """
    SELECT json_extract_string(props, '$.k')::BIGINT AS k_val, count(*) AS cnt
    FROM events GROUP BY 1
    """,
    ("relational", "json"),
)
def q_events_json(spark, sf_dir):
    """JSON payload extraction (the props column is the reference's opaque
    flatMap payload; here a columnar json path, no UDF)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").cast("bigint").alias("k_val"))
        .groupBy("k_val")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# =========================================================================
# Relational breadth (Spark-native surface; reference has none of these)
# =========================================================================


@register(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity', '(18,2)')} AS sum_qty,
           {dsum_sql('l_extendedprice', '(18,2)')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)', '(28,6)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', '(28,8)')} AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    ("relational", "bench"),
)
def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary — filter + wide aggregation. Decimal
    accumulation; predicate reaches the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "(18,2)").alias("sum_qty"),
            dsum("l_extendedprice", "(18,2)").alias("sum_base_price"),
            F.sum(disc.cast("decimal(28,6)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(28,8)")).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "top_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    ("relational", "sort"),
)
def q_top_orders(spark, sf_dir):
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps +
    driver merge, no global sort."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "join_revenue_by_segment",
    f"""
    SELECT c.c_mktsegment,
           {dsum_sql('o.o_totalprice', '(18,2)')} AS revenue,
           count(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    ("relational", "join", "bench"),
)
def q_join_revenue(spark, sf_dir):
    """Fact-dim join: customer is broadcast (no shuffle of orders)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            dsum("o_totalprice", "(18,2)").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "join_customer_nation_region",
    f"""
    SELECT r.r_name,
           count(*) AS n_customers,
           {dsum_sql('c.c_acctbal', '(18,2)')} AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    ("relational", "join"),
)
def q_join_cnr(spark, sf_dir):
    """Snowflake join chain, both dims broadcast."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "(18,2)").alias("total_acctbal"),
        )
    )


@register(
    "semi_join_customers_with_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    ("relational", "join"),
)
def q_semi_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "anti_join_parts_never_ordered",
    """
    SELECT p_partkey, p_name FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
    ("relational", "join"),
)
def q_anti_join(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select("p_partkey", "p_name")


@register(
    "set_union_nation_keys",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    ("relational", "setop"),
)
def q_set_union(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_intersect_nation_keys",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    ("relational", "setop"),
)
def q_set_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except_late_orders",
    """
    SELECT o_orderkey AS orderkey FROM orders
    EXCEPT
    SELECT l_orderkey AS orderkey FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    """,
    ("relational", "setop"),
)
def q_set_except(spark, sf_dir):
    """EXCEPT: orders with no lineitem shipped before 1997 (plans as a
    left-anti hash join after distinct — no sort)."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("orderkey"))
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        .select(F.col("l_orderkey").alias("orderkey"))
    )
    return o.subtract(li)  # subtract == EXCEPT (distinct) semantics


@register(
    "distinct_users_per_type",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
    ("relational", "agg"),
)
def q_distinct_users(spark, sf_dir):
    """COUNT(DISTINCT) — Catalyst expands to a two-phase partial-distinct
    aggregate (Expand + two HashAggregates), so the distinct set never
    concentrates on one task."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# =========================================================================
# Time windows (the live rendering of the reference's dead watermark/timer
# machinery, SURVEY.md §2.8)
# =========================================================================


@register(
    "window_tumbling_hourly",
    f"""
    SELECT date_trunc('hour', ts::TIMESTAMP) AS hour_start,
           count(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM events GROUP BY 1
    """,
    ("window", "bench"),
)
def q_window_tumbling(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("hour_start"), "n_events", "sum_value")
    )


@register(
    "window_sliding",
    """
    SELECT w_start, count(*) AS n_events FROM (
      SELECT unnest([
          time_bucket(INTERVAL 30 MINUTE, ts::TIMESTAMP),
          time_bucket(INTERVAL 30 MINUTE, ts::TIMESTAMP) - INTERVAL 30 MINUTE
      ]) AS w_start
      FROM events
    ) GROUP BY w_start
    """,
    ("window",),
)
def q_window_sliding(spark, sf_dir):
    """1-hour windows sliding every 30 min: each event lands in 2 windows."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("w_start"), "n_events")
    )


@register(
    "window_session",
    """
    WITH flagged AS (
      SELECT user_id, ts::TIMESTAMP AS ts,
             CASE WHEN ts::TIMESTAMP - lag(ts::TIMESTAMP) OVER (
                    PARTITION BY user_id ORDER BY ts) > INTERVAL 10 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM sessions GROUP BY user_id, session_no
    """,
    ("window", "session"),
)
def q_window_session(spark, sf_dir):
    """Session windows (10-min gap) — Spark's session_window vs the classic
    gaps-and-islands oracle."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


@register(
    "salted_keyed_agg",
    f"""
    SELECT user_id,
           {dsum_sql('value')} AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value,
           count(*) AS cnt
    FROM events GROUP BY user_id
    """,
    ("core", "skew"),
)
def q_salted_keyed_agg(spark, sf_dir):
    """The skew-proof two-phase (key, salt) -> key aggregation, proven
    result-identical to the plain keyed aggregate (same oracle as keyed_agg).
    Decimal accumulation keeps the sum order-independent across the extra
    re-association the salting introduces."""
    from mini_flink_spark.operators.aggregations import salted_agg

    ev = _t(spark, sf_dir, "events")
    out = salted_agg(ev, ["user_id"], "value", n_salts=8, sum_cast="decimal(28,10)")
    return out.select(
        "user_id",
        F.col("sum_value").cast("double").alias("sum_value"),
        "min_value",
        "max_value",
        "cnt",
    )


# =========================================================================
# Temporal joins (as-of / interval — operators Spark lacks as built-ins,
# implemented shuffle-friendly in operators/asof.py)
# =========================================================================


@register(
    "asof_click_attribution",
    """
    WITH tagged AS (
      SELECT user_id, ts::TIMESTAMP AS ts, 1 AS side, event_id,
             NULL::BIGINT AS c_eid, NULL::TIMESTAMP AS c_ts
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts::TIMESTAMP, 0, event_id, event_id, ts::TIMESTAMP
      FROM events WHERE event_type = 'click'
    ),
    carried AS (
      SELECT side, event_id, user_id, ts,
             last_value(c_eid IGNORE NULLS) OVER w AS click_event_id,
             last_value(c_ts IGNORE NULLS) OVER w AS click_ts
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, c_eid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, click_event_id,
           epoch_us(ts) - epoch_us(click_ts) AS gap_us
    FROM carried WHERE side = 1
    """,
    ("temporal", "asof"),
)
def q_asof_attribution(spark, sf_dir):
    """As-of join: each purchase attributed to the user's latest prior click.
    Union + keyed ordered window — one shuffle, no inequality join."""
    from mini_flink_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter("event_type = 'purchase'").select("event_id", "user_id", "ts")
    clicks = ev.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    out = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["event_id", "ts"], tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("event_id_asof").alias("click_event_id"),
        (F.unix_micros("ts") - F.unix_micros("ts_asof")).alias("gap_us"),
    )


@register(
    "interval_join_click_purchase",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           epoch_us(p.ts::TIMESTAMP) - epoch_us(c.ts::TIMESTAMP) AS gap_us
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts::TIMESTAMP >= c.ts::TIMESTAMP
     AND p.ts::TIMESTAMP <= c.ts::TIMESTAMP + INTERVAL 30 MINUTE
    """,
    ("temporal", "interval-join"),
)
def q_interval_join(spark, sf_dir):
    """Interval join: (click, purchase) pairs of the same user within 30 min —
    bucketed equi-join, never a nested-loop inequality join."""
    from mini_flink_spark.operators.asof import interval_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    out = interval_join(
        clicks, purchases, on="user_id", left_ts="c_ts", right_ts="p_ts",
        lower_s=0, upper_s=1800,
    )
    return out.select(
        "click_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )


# =========================================================================
# Multidimensional aggregation & window analytics
# =========================================================================


@register(
    "rollup_region_nation",
    f"""
    SELECT r.r_name, n.n_name,
           count(*) AS n_customers,
           {dsum_sql('c.c_acctbal', '(18,2)')} AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    ("relational", "rollup"),
)
def q_rollup(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "(18,2)").alias("total_acctbal"),
        )
    )


@register(
    "cube_daily_events",
    f"""
    SELECT event_type, strftime(date_trunc('day', ts::TIMESTAMP), '%Y-%m-%d') AS day,
           count(*) AS n_events,
           {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY CUBE (event_type, strftime(date_trunc('day', ts::TIMESTAMP), '%Y-%m-%d'))
    """,
    ("relational", "cube"),
)
def q_cube(spark, sf_dir):
    # day rendered as a string: cube's grand-total rows carry NULL grouping
    # keys, and a null timestamp column round-trips badly (pandas NaT) through
    # hash comparators
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"))
        .cube("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_user_event_counts",
    "SELECT user_id, "
    + ", ".join(
        f"count(*) FILTER (event_type = '{t}') AS n_{t}" for t in EVENT_TYPES
    )
    + " FROM events GROUP BY user_id",
    ("relational", "pivot"),
)
def q_pivot(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    piv = ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).count()
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
    )


@register(
    "topn_orders_per_priority",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    ("relational", "window-fn"),
)
def q_topn_per_group(spark, sf_dir):
    """Top-3 orders per priority. 5 priority values over the whole orders
    table is the hot-group shape — but a bare `row_number() <= k` filter is
    SAFE here on Spark 4: InferWindowGroupLimit plants a PARTIAL
    WindowGroupLimit on the map side (each input split keeps its own top-k
    per group before the exchange), so the post-shuffle sort sees <=
    k x map_tasks rows per group, never the full stratum. Plan-pinned in
    test_plans.test_stratified_ops_window_group_limit — a manual salted
    tournament would double-pay for what Catalyst already does (round-8
    finding, SCALE_NOTES)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "user_event_gaps",
    """
    SELECT event_id, user_id,
           epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts::TIMESTAMP) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
    FROM events
    """,
    ("relational", "window-fn"),
)
def q_user_gaps(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )


@register(
    "value_percentiles_by_type",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95
    FROM events GROUP BY event_type
    """,
    ("relational", "percentile"),
)
def q_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (percentile_cont semantics —
    deterministic, unlike float-sum aggregates).

    Round 9: Spark's exact `percentile()` aggregate buffers every
    (value, count) pair of a group in ONE hash map — with a 25-value
    stratum key that is the hot-stratum OOM shape at corpus scale. The
    rank-based rendering is bounded everywhere: range-sliced exact rank
    per stratum (`_range_sliced_rank`), then percentile_cont's
    interpolation read off the rows at ranks floor(p*(n-1))+1 and +2
    (r10: the floor is taken on p*(n-1) itself, matching the oracle's
    double arithmetic exactly — ADVICE r9) — a per-row CASE plus one
    ordinary sum aggregate. Bit-identical to percentile()/quantile_cont
    (oracle unchanged)."""
    from mini_flink_spark.queries_pipeline import (
        _percentile_cont_contrib,
        _range_sliced_rank,
    )

    ev = _t(spark, sf_dir, "events")
    ranked = _range_sliced_rank(
        ev.select("event_type", "value", "event_id"),
        [F.asc("value"), F.asc("event_id")],
        F.col("value"),
        ["event_type"],
        total_col="_n",
    )
    return ranked.groupBy("event_type").agg(
        F.round(F.sum(_percentile_cont_contrib(0.5)), 6).alias("p50"),
        F.round(F.sum(_percentile_cont_contrib(0.95)), 6).alias("p95"),
    )


# =========================================================================
# Analytical breadth: TPC-H-shaped multi-join aggregates, grouping sets,
# scalar subqueries, window analytics, and function batteries. All Spark
# built-ins end-to-end (no Python in the hot path).
# =========================================================================


@register(
    "shipping_priority",
    f"""
    SELECT l.l_orderkey,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', '(28,6)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC LIMIT 10
    """,
    ("relational", "join", "bench"),
)
def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-k.
    customer is small relative to lineitem, so the filtered side broadcasts
    (AQE picks it below the 10 MB threshold); top-k is TakeOrderedAndProject,
    never a global sort."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev.cast("decimal(28,6)")).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "returned_item_revenue",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', '(28,6)')} AS revenue,
           count(*) AS n_items
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC LIMIT 20
    """,
    ("relational", "join"),
)
def q_returned_item_revenue(spark, sf_dir):
    """TPC-H Q10 shape: lost-revenue-per-customer over returned items.
    Two broadcastable dims (customer, nation) against the lineitem→orders
    fact join; the returnflag filter reaches the scan."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(rev.cast("decimal(28,6)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "grouping_sets_orders",
    f"""
    SELECT o_orderpriority, o_orderstatus,
           {dsum_sql('o_totalprice', '(18,2)')} AS revenue, count(*) AS cnt
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
    ("relational", "multidim"),
)
def q_grouping_sets_orders(spark, sf_dir):
    """Explicit GROUPING SETS (complements the rollup/cube queries): one
    shuffle, Expand feeds all three groupings — not three scans."""
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderpriority"], ["o_orderstatus"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(dsum("o_totalprice", "(18,2)").alias("revenue"), F.count(F.lit(1)).alias("cnt"))


@register(
    "parts_above_avg_price",
    """
    SELECT p.p_partkey, p.p_retailprice
    FROM part p,
         (SELECT sum(p_retailprice::DECIMAL(18,4)) AS total, count(*) AS cnt FROM part) s
    WHERE p.p_retailprice::DECIMAL(18,4) * s.cnt > s.total
    """,
    ("relational", "subquery"),
)
def q_parts_above_avg(spark, sf_dir):
    """Scalar-subquery shape (price above global mean). The mean comparison is
    done multiplicatively in DECIMAL (price*cnt > sum) so it is exact on both
    engines — no decimal-division scale differences. The 1-row aggregate is
    broadcast; the fact side never collects to the driver."""
    p = _t(spark, sf_dir, "part")
    s = p.agg(
        F.sum(F.col("p_retailprice").cast("decimal(18,4)")).alias("total"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        p.crossJoin(F.broadcast(s))
        .filter(F.col("p_retailprice").cast("decimal(18,4)") * F.col("cnt") > F.col("total"))
        .select("p_partkey", "p_retailprice")
    )


@register(
    "datetime_battery",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           quarter(o_orderdate) AS qtr,
           day(o_orderdate) AS dom,
           date_trunc('month', o_orderdate) AS month_start,
           date_diff('day', o_orderdate::DATE, DATE '2000-01-01') AS days_to_y2k
    FROM orders
    """,
    ("functions", "datetime"),
)
def q_datetime_battery(spark, sf_dir):
    """Date/time scalar-function battery (the reference's 'expression
    language' is opaque Java lambdas; here the columnar equivalents)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k"
        ),
    )


@register(
    "string_battery",
    """
    SELECT p_partkey,
           upper(p_name) AS name_u,
           length(p_name) AS name_len,
           substring(p_name, 1, 8) AS name_pre,
           replace(p_type, ' ', '_') AS type_snake,
           concat(p_brand, '#', p_type) AS brand_type,
           lpad(p_partkey::VARCHAR, 12, '0') AS key_pad,
           split_part(p_name, ' ', 1) AS first_word
    FROM part
    """,
    ("functions", "string"),
)
def q_string_battery(spark, sf_dir):
    """String scalar-function battery — all JVM-side expressions inside one
    whole-stage-codegen span."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_u"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_pre"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_partkey").cast("string"), 12, "0").alias("key_pad"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
    )


@register(
    "sample_hash_deterministic",
    """
    SELECT doc_id, lang, source FROM documents
    WHERE substring(md5(doc_id::VARCHAR), 1, 2) < '1a'
    """,
    ("extension", "sampling"),
)
def q_sample_hash(spark, sf_dir):
    """Deterministic ~10% hash sample — the training-pipeline sampling
    primitive. Unlike rand()-based sampling it is reproducible across engines,
    runs, and partitionings (the hash depends only on the row key), composable
    with incremental reruns, and embarrassingly parallel (no RNG state)."""
    d = _t(spark, sf_dir, "documents")
    return d.filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a").select(
        "doc_id", "lang", "source"
    )


@register(
    "embedding_norms",
    """
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x))), 4) + 0.0
             AS l2_norm,
           round(list_sum(list_transform(embedding, x -> x::DOUBLE)) / len(embedding), 4) + 0.0
             AS mean_component
    FROM embeddings
    """,
    ("extension", "vector"),
)
def q_embedding_norms(spark, sf_dir):
    """Higher-order array functions over the embedding column (no UDF): the
    fold stays JVM-side. Rounded to 4 dp — float-sum association noise is far
    below that at dim=64."""
    e = _t(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        "embedding", F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    tot = F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x.cast("double"))
    return e.select(
        "vec_id",
        (F.round(F.sqrt(sq), 4) + F.lit(0.0)).alias("l2_norm"),
        (F.round(tot / F.size("embedding"), 4) + F.lit(0.0)).alias("mean_component"),
    )


@register(
    "running_total_per_customer",
    """
    SELECT o_orderkey, o_custkey,
           (sum(o_totalprice::DECIMAL(18,2)) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))::DOUBLE
             AS running_spend
    FROM orders
    """,
    ("relational", "window-fn"),
)
def q_running_total(spark, sf_dir):
    """Cumulative per-key running total — the window-function face of the
    reference's running reduce (StreamGroupedReduce.java:40-54): same
    per-key-in-order accumulation, expressed as a batch window. Partitioned
    by customer, so it scales horizontally (no global window)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "ntile_price_quartiles",
    """
    SELECT o_orderpriority, bucket, count(*) AS cnt,
           min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
    FROM (
      SELECT o_orderpriority, o_totalprice,
             ntile(4) OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    GROUP BY o_orderpriority, bucket
    """,
    ("relational", "window-fn"),
)
def q_ntile_quartiles(spark, sf_dir):
    """ntile bucketing per partition key (quartile stats per priority).

    Round 9: o_orderpriority has FIVE values, so the partitioned ntile
    window was still a full-stratum sort (~20 TB per task at target scale)
    — the same trap as a global window, just five-way. Replaced by the
    range-sliced exact rank + closed-form tile arithmetic
    (`_range_sliced_rank` / `_ntile_from_rank`, queries_pipeline.py):
    bit-identical buckets, every sort task bounded to ~stratum/64 rows."""
    from mini_flink_spark.queries_pipeline import (
        _ntile_from_rank,
        _range_sliced_rank,
    )

    o = _t(spark, sf_dir, "orders")
    ranked = _range_sliced_rank(
        o.select("o_orderpriority", "o_totalprice", "o_orderkey"),
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        F.col("o_totalprice"),
        ["o_orderpriority"],
        total_col="_n",
    )
    return (
        ranked.select(
            "o_orderpriority",
            "o_totalprice",
            _ntile_from_rank("rank", "_n", 4).alias("bucket"),
        )
        .groupBy("o_orderpriority", "bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


# The driver grades exactly the first 50 queries in registration order, so the
# exported dicts put a curated window first. Rotation policy (VERDICT r3 #3):
# the 15 §2 reference-surface rows and 10 flagship LLM-pipeline anchors stay
# pinned every round; the other 25 slots rotate. Round 11's rotation: the
# ten changed-shape regrades from the VERDICT-r10/ADVICE-r10 surgery (see
# the dict below) and a 15-slot oldest-first refresh — the deferred r2
# straggler plus 14 of the 25 r3-era rows. Everything else keeps
# registration order after the window — nothing is removed, only reordered.
# Round-9 rotation-policy amendment (VERDICT r8 #1 asks for exactly this):
# the never-graded pool is now SMALLER than the 25 rotating slots, so two
# further slot classes fill the window, in priority order after the
# never-graded backlog:
#   1. changed-shape regrades — queries whose PLAN was materially rewritten
#      since their last green verdict (declared below with the round+reason
#      so the policy test can audit them; an entry self-expires once the new
#      shape has its own green driver row, i.e. remove it next rotation);
#   2. oldest-verdict refresh — remaining slots re-certify rows whose latest
#      verdict is the OLDEST on record, so driver evidence never goes stale.
CHANGED_SHAPE_REGRADES: dict[str, str] = {
    # (round-11 entries expired: all ten got green driver rows on their new
    # shapes in CORRECTNESS_r11 — the dict's self-expiry rule, as VERDICT
    # r11 "Next round" #6 orders.)
    # round-12 surgery — VERDICT r11 #1 and #5:
    "multimodal_phash_neardup": (
        "r12: MAX_BAND_BUCKET hot-bucket cap now ON for the graded row and "
        "the oracle rewritten from O(n²) brute force to the banded "
        "algorithm's DuckDB twin (cap mirrored via HAVING count(*) <= cap "
        "over distinct signatures) — VERDICT r11 #5; losslessness at "
        "radius 3 pinned by tests/test_round12_ops.py"
    ),
    "dedup_minhash_lsh": (
        "r12: signature stage moved to the memoizing Arrow path "
        "(minhash_sig_arrow — pd.factorize + per-distinct-shingle md5, "
        "bit-identical signatures pinned) — VERDICT r11 #1; pinned flagship "
        "slot, regraded every round"
    ),
    # NOTE (r12, not individual entries): normalize_text collapsed to one
    # regex pass ([^a-z0-9]+ -> ' ') with CHARACTER-IDENTICAL output
    # (pinned row-for-row on the bench corpus by tests/test_round12_ops.py)
    # — every tokenizer consumer's plan swaps the sub-expression but no
    # value anywhere can change. The refresh slots below deliberately
    # prioritize tokenizer adopters so the driver re-certifies the new
    # expression across the text family anyway.
}

GRADED_WINDOW: tuple[str, ...] = (
    # §2 reference surface — one row per operator (pinned forever)
    "map_project",
    "filter_predicate",
    "flatmap_tokens",
    "keyed_agg",
    "keyed_minby",
    "keyed_maxby",
    "running_reduce",
    "wordcount",
    "from_elements_keyed_sum",
    "from_collection_scalar",
    "rebalance_roundtrip",
    "transform_map_partitions",
    "window_tumbling_hourly",
    "window_sliding",
    "window_session",
    # flagship LLM-pipeline anchors (pinned; dedup_embedding_cosine stays to
    # certify the round-4 de-vacuation — planted dups, spark_rows > 0)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_duplicate_spans",
    "dedup_span_removal",
    "dedup_embedding_cosine",
    "ann_topk_lsh",
    "heavy_hitter_tokens",
    "gopher_quality_flags",
    "curation_pipeline_v2",
    "bpe_learn_merges",
    # ---- round-12 rotation (VERDICT r11 #1/#5/#6) ----
    # changed-shape regrade (CHANGED_SHAPE_REGRADES above): the phash band
    # cap + banded oracle. (dedup_minhash_lsh's Arrow-signature reshape is
    # regraded through its PINNED flagship slot above.)
    "multimodal_phash_neardup",
    # oldest-verdict refresh, drained OLDEST-FIRST (VERDICT r11 #6): ALL 11
    # remaining r3-era rows (the set VERDICT names — nothing older than r4
    # remains after this window grades)...
    "top_orders",
    "join_revenue_by_segment",
    "salted_keyed_agg",
    "shipping_priority",
    "text_token_count",
    "text_quality",
    "text_langid",
    "decontamination_check",
    "mixture_weights",
    "dedup_incremental",
    "dedup_components",
    # ...then the pool advances to the r4-era verdicts; the 13 slots left
    # go to the r4 rows closest to round-12's code changes first (the
    # single-regex normalize_text adopters and minhash/Arrow-signature
    # consumers: curation_pipeline_spec, paragraph_boilerplate,
    # dedup_containment, dedup_intradoc_blocks, winnowing_fingerprints,
    # url_canonical_dedup, text_search_bm25_persisted, source_overlap_matrix,
    # dsir_importance_weights), then cadence (ann_topk_ivf_persisted,
    # coreset_kcenter, dedup_embedding_components, forecast_revenue). The 10
    # r4 rows left over (market_share, order_priority_checking,
    # profit_by_nation_year, promo_revenue_share, retention_cohorts,
    # scd2_user_state_history, stats_moments_battery, window_fn_battery,
    # hybrid_search_rrf, volume_shipping) head round 13's queue.
    "curation_pipeline_spec",
    "paragraph_boilerplate",
    "dedup_containment",
    "dedup_intradoc_blocks",
    "winnowing_fingerprints",
    "url_canonical_dedup",
    "text_search_bm25_persisted",
    "source_overlap_matrix",
    "dsir_importance_weights",
    "ann_topk_ivf_persisted",
    "coreset_kcenter",
    "dedup_embedding_components",
    "forecast_revenue",
)
# Round-13 rotation backlog (updated r12): the 10 r4-era rows left after
# round 12's drain (market_share, order_priority_checking,
# profit_by_nation_year, promo_revenue_share, retention_cohorts,
# scd2_user_state_history, stats_moments_battery, window_fn_battery,
# hybrid_search_rrf, volume_shipping — set-diff the CORRECTNESS_r*
# artifacts as rounds 9-12 did), then the pool advances to the r5-era
# verdicts. The r12 CHANGED_SHAPE_REGRADES entries self-expire once
# CORRECTNESS_r12 shows green rows on the new shapes.


def _ordered_names() -> list[str]:
    window = [n for n in GRADED_WINDOW if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(window)]
    return window + rest


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name].fn for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle
    }


# extension-layer registrations live in their own modules to keep this file
# focused on the reference surface; importing them populates QUERIES.
from mini_flink_spark import queries_ext  # noqa: E402,F401  (registration side effect)
from mini_flink_spark import queries_tpch  # noqa: E402,F401  (registration side effect)
from mini_flink_spark import queries_pipeline  # noqa: E402,F401  (registration side effect)
