"""Benchmark / correctness-gate queries over the synthetic star schema.

Each entry pairs an idiomatic-PySpark query (DataFrame API, Catalyst-friendly)
with an equivalent ANSI-SQL oracle that DuckDB runs on the same parquet
tables. The driver compares row counts, schemas, and order-insensitive value
hashes — so every computed column is aliased identically on both sides, and
every float that passes through an order-dependent aggregate is rounded to a
fixed scale on both sides (per-row IEEE arithmetic is deterministic and needs
no rounding; cross-partition summation order is not).

Query → reference-operator map (SURVEY.md §2): see each docstring.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from foresttime_builder_spark.operators import (
    expand_grid,
    fill_gaps,
    linear_interpolate,
    step_interpolate,
)
from foresttime_builder_spark.operators.cache import carry_cache
from foresttime_builder_spark.operators.dedup import (
    derive_candidate_budget,
    minhash_lsh_pairs,
    simhash,
    token_jaccard_pairs,
)
from foresttime_builder_spark.sources import load_table


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None → rows-only check


def _hash60(col: Column) -> Column:
    """Deterministic 60-bit hash shared with the DuckDB oracle: first 15 hex
    digits of md5, as a bigint. (Spark's murmur ``F.hash`` has no DuckDB
    twin, so engine-portable operators hash via md5.)"""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


_HASH60_SQL = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


# --------------------------------------------------------------------------
# Relational core
# --------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with scalar expressions (SURVEY §2.4 A2; TPC-H Q1 shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.floor(F.sum("l_quantity") * 100 + F.lit(0.5)).cast("long").alias(
                "sum_qty_e2"
            ),
            F.floor(F.sum("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias(
                "sum_base_price_e2"
            ),
            F.floor(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100
                + F.lit(0.5)
            ).cast("long").alias("sum_disc_price_e2"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q01 = """
SELECT l_returnflag, l_linestatus,
       CAST(floor(sum(l_quantity) * 100 + 0.5) AS BIGINT) AS sum_qty_e2,
       CAST(floor(sum(l_extendedprice) * 100 + 0.5) AS BIGINT) AS sum_base_price_e2,
       CAST(floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT)
         AS sum_disc_price_e2,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q02_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way broadcast dimension join + aggregate (SURVEY §2.3 J7)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.year("o_orderdate").alias("year"))
        .agg(
            # per-row e2 quantize -> exact BIGINT sum (order-free; the
            # double-sum form diverged in its last ulp under fuzz
            # magnitudes — same fix as q43/q62)
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    + F.lit(0.5)
                ).cast("long")
            ).cast("long").alias("revenue_e2"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_Q02 = """
SELECT r_name AS region, year(o_orderdate) AS year,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT)
         AS revenue_e2,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, year(o_orderdate)
"""


def q03_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join preserving unmatched left rows (SURVEY §2.3 J1-J3 shape)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.floor(
                F.coalesce(F.sum("o_totalprice"), F.lit(0.0)) * 100 + F.lit(0.5)
            ).cast("long").alias("total_spend_e2"),
        )
    )


ORACLE_Q03 = """
SELECT c_custkey, c_mktsegment,
       count(o_orderkey) AS n_orders,
       CAST(floor(coalesce(sum(o_totalprice), 0.0) * 100 + 0.5) AS BIGINT)
         AS total_spend_e2
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
"""


def q04_snapshot_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two yearly snapshots (SURVEY §2.3 J4)."""
    o = load_table(spark, sf_dir, "orders")
    y95 = (
        o.filter(F.year("o_orderdate") == 1995)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_1995"))
    )
    y96 = (
        o.filter(F.year("o_orderdate") == 1996)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_1996"))
    )
    return (
        y95.join(y96, "custkey", "full")
        .select(
            "custkey",
            F.coalesce("n_1995", F.lit(0)).alias("n_1995"),
            F.coalesce("n_1996", F.lit(0)).alias("n_1996"),
        )
    )


ORACLE_Q04 = """
SELECT coalesce(a.custkey, b.custkey) AS custkey,
       coalesce(n_1995, 0) AS n_1995,
       coalesce(n_1996, 0) AS n_1996
FROM (SELECT o_custkey AS custkey, count(*) AS n_1995 FROM orders
      WHERE year(o_orderdate) = 1995 GROUP BY 1) a
FULL OUTER JOIN
     (SELECT o_custkey AS custkey, count(*) AS n_1996 FROM orders
      WHERE year(o_orderdate) = 1996 GROUP BY 1) b
USING (custkey)
"""


_QTY_BANDS = [("tiny", 0.0, 10.0), ("small", 10.0, 25.0), ("mid", 25.0, 40.0), ("large", 40.0, 1e9)]


def q05_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast range/band theta-join, interval [lo, hi) (SURVEY §2.3 J6 —
    the DESIGNCD×DIA TPA-rules join, re-expressed on l_quantity)."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_QTY_BANDS, "band string, lo double, hi double")
    joined = li.join(
        F.broadcast(bands),
        (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        "left",
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.sum("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias(
            "band_price_e2"
        ),
    )


ORACLE_Q05 = """
SELECT band, count(*) AS n,
       CAST(floor(sum(l_extendedprice) * 100 + 0.5) AS BIGINT) AS band_price_e2
FROM lineitem
LEFT JOIN (VALUES ('tiny', 0.0, 10.0), ('small', 10.0, 25.0),
                  ('mid', 25.0, 40.0), ('large', 40.0, 1e9)) bands(band, lo, hi)
  ON l_quantity >= lo AND l_quantity < hi
GROUP BY band
"""


def q06_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event picks the most recent prior click's
    value (SURVEY §2.3 J13, the interval/as-of join, as a window as-of)."""
    # an event without a timestamp has no as-of position, and a NULL
    # event_id cannot break ts ties (Spark orders NULLS FIRST, DuckDB
    # NULLS LAST) — excluded identically in the oracle
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.col("value")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn(
            "last_click_value_e4",
            F.floor(last_click * 10000 + F.lit(0.5)).cast("long"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long").alias(
                "purchase_value_e4"
            ),
            "last_click_value_e4",
        )
    )


ORACLE_Q06 = """
SELECT event_id, user_id,
       CAST(floor(value * 10000 + 0.5) AS BIGINT) AS purchase_value_e4,
       CAST(floor(last_click_value * 10000 + 0.5) AS BIGINT) AS last_click_value_e4
FROM (
  SELECT event_id, user_id, event_type, value,
         last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_value
  FROM events
  WHERE ts IS NOT NULL AND event_id IS NOT NULL
) t
WHERE event_type = 'purchase'
"""


def q18_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain aggregation sweep in one pass (SURVEY §2.4 A7 → GROUPING SETS)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.floor(F.sum("l_quantity") * 100 + F.lit(0.5)).cast("long").alias(
                "sum_qty_e2"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty_e2",
            "n",
        )
    )


ORACLE_Q18 = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(floor(sum(l_quantity) * 100 + 0.5) AS BIGINT) AS sum_qty_e2,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q19_manual_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide reshape via conditional aggregation (SURVEY §2.6 O5)."""
    li = load_table(spark, sf_dir, "lineitem")
    flag = F.col("l_returnflag")
    return li.groupBy("l_linestatus").agg(
        F.floor(
            F.sum(F.when(flag == "A", F.col("l_quantity")).otherwise(0.0)) * 100
            + F.lit(0.5)
        ).cast("long").alias("qty_A_e2"),
        F.floor(
            F.sum(F.when(flag == "N", F.col("l_quantity")).otherwise(0.0)) * 100
            + F.lit(0.5)
        ).cast("long").alias("qty_N_e2"),
        F.floor(
            F.sum(F.when(flag == "R", F.col("l_quantity")).otherwise(0.0)) * 100
            + F.lit(0.5)
        ).cast("long").alias("qty_R_e2"),
    )


ORACLE_Q19 = """
SELECT l_linestatus,
       CAST(floor(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0.0 END)
                  * 100 + 0.5) AS BIGINT) AS qty_A_e2,
       CAST(floor(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0.0 END)
                  * 100 + 0.5) AS BIGINT) AS qty_N_e2,
       CAST(floor(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END)
                  * 100 + 0.5) AS BIGINT) AS qty_R_e2
FROM lineitem
GROUP BY l_linestatus
"""


def q20_yearly_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level rollup + ratio — the population-scaling query shape
    (SURVEY §3.3: per-plot totals → per-year totals → ratio; here per-customer
    totals → per-year revenue per active customer)."""
    o = load_table(spark, sf_dir, "orders")
    per_cust_year = o.groupBy(
        F.col("o_custkey").alias("custkey"), F.year("o_orderdate").alias("year")
    ).agg(F.sum("o_totalprice").alias("cust_total"))
    return (
        per_cust_year.groupBy("year")
        .agg(
            F.round(F.sum("cust_total"), 2).alias("_tr"),
            F.countDistinct("custkey").alias("n_customers"),
        )
        .select(
            "year",
            F.floor(F.col("_tr") * 100 + F.lit(0.5)).cast("long").alias(
                "total_revenue_e2"
            ),
            "n_customers",
            F.floor(
                F.col("_tr") / F.col("n_customers") * 10000 + F.lit(0.5)
            ).cast("long").alias("revenue_per_customer_e4"),
        )
    )


ORACLE_Q20 = """
WITH per_cust_year AS (
  SELECT o_custkey AS custkey, year(o_orderdate) AS year,
         sum(o_totalprice) AS cust_total
  FROM orders GROUP BY 1, 2
)
SELECT year,
       CAST(floor(round(sum(cust_total), 2) * 100 + 0.5) AS BIGINT)
         AS total_revenue_e2,
       count(DISTINCT custkey) AS n_customers,
       CAST(floor(round(sum(cust_total), 2) / count(DISTINCT custkey) * 10000
                  + 0.5) AS BIGINT) AS revenue_per_customer_e4
FROM per_cust_year GROUP BY year
"""


def q21_monthly_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag/lead transition windows (SURVEY §2.5 W9)."""
    # a NULL ship date has no (year, month) lag position, and Spark/DuckDB
    # disagree on where NULL order keys sort — excluded identically
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").isNotNull()
    )
    monthly = li.groupBy(
        F.col("l_suppkey").alias("suppkey"),
        F.year("l_shipdate").alias("year"),
        F.month("l_shipdate").alias("month"),
    ).agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
    w = W.partitionBy("suppkey").orderBy("year", "month")
    return monthly.select(
        "suppkey",
        "year",
        "month",
        F.floor(F.col("qty") * 100 + F.lit(0.5)).cast("long").alias("qty_e2"),
        F.floor(F.lag("qty", 1).over(w) * 100 + F.lit(0.5)).cast("long").alias(
            "prev_qty_e2"
        ),
        F.floor(
            (F.col("qty") - F.lag("qty", 1).over(w)) * 100 + F.lit(0.5)
        ).cast("long").alias("qty_delta_e2"),
    )


ORACLE_Q21 = """
WITH monthly AS (
  SELECT l_suppkey AS suppkey, year(l_shipdate) AS year,
         month(l_shipdate) AS month, round(sum(l_quantity), 2) AS qty
  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1, 2, 3
)
SELECT suppkey, year, month,
       CAST(floor(qty * 100 + 0.5) AS BIGINT) AS qty_e2,
       CAST(floor(lag(qty, 1) OVER w * 100 + 0.5) AS BIGINT) AS prev_qty_e2,
       CAST(floor((qty - lag(qty, 1) OVER w) * 100 + 0.5) AS BIGINT)
         AS qty_delta_e2
FROM monthly
WINDOW w AS (PARTITION BY suppkey ORDER BY year, month)
"""


# --------------------------------------------------------------------------
# Time-series / annualization operators on the synthetic panel
# --------------------------------------------------------------------------

# Deterministic hole-punching so the dense grid has real gaps to interpolate.
_PANEL_FILTER = "((o_custkey + year(o_orderdate)) % 3) != 0"


def _orders_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.col("o_custkey").alias("custkey"), F.year("o_orderdate").alias("year")
        )
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("val"),
            F.min("o_orderpriority").alias("prio"),
        )
        .filter(F.expr("((custkey + year) % 3) != 0"))
    )


_PANEL_SQL = f"""
  SELECT o_custkey AS custkey, year(o_orderdate) AS year,
         round(sum(o_totalprice), 4) AS val, min(o_orderpriority) AS prio
  FROM orders GROUP BY 1, 2
  HAVING {_PANEL_FILTER}
"""

_GRID_SQL = f"""
  panel AS ({_PANEL_SQL}),
  bounds AS (SELECT custkey, min(year) lo, max(year) hi FROM panel GROUP BY 1),
  grid AS (SELECT custkey, unnest(generate_series(lo, hi)) AS year FROM bounds),
  joined AS (
    SELECT grid.custkey, grid.year, panel.val, panel.prio,
           panel.custkey IS NULL AS interpolated
    FROM grid LEFT JOIN panel
      ON grid.custkey = panel.custkey AND grid.year = panel.year
  )
"""


def q07_expand_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense year-grid expansion with provenance flag (SURVEY §2.5 W10 +
    §2.3 J5 — ``expand_data``'s sequence/explode + flagged join)."""
    panel = _orders_panel(spark, sf_dir)
    return expand_grid(panel, ["custkey"], "year").select(
        "custkey",
        "year",
        F.floor(F.col("val") * 10000 + F.lit(0.5)).cast("long").alias("val_e4"),
        "interpolated",
    )


ORACLE_Q07 = f"""
WITH {_GRID_SQL}
SELECT custkey, year,
       CAST(floor(val * 10000 + 0.5) AS BIGINT) AS val_e4, interpolated
FROM joined
"""


def q08_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed linear interpolation over the dense grid (SURVEY §2.5 W4)."""
    panel = _orders_panel(spark, sf_dir)
    g = expand_grid(panel, ["custkey"], "year")
    out = linear_interpolate(g, ["custkey"], "year", ["val"])
    return out.select(
        "custkey",
        "year",
        F.floor(F.col("val") * 10000 + F.lit(0.5)).cast("long").alias("val_e4"),
        "interpolated",
    )


ORACLE_Q08 = f"""
WITH {_GRID_SQL},
kn AS (
  -- per-group sorted known-point array: the same formulation the Spark
  -- operator uses (collect_list of (x, y) structs), so every branch —
  -- including the EXTRAPOLATION arms the old window-only twin lacked
  -- (caught by the fuzz sweep: trailing NULL measurements never occur in
  -- the clean panel, so the gate had never exercised them) — is the
  -- identical array arithmetic
  SELECT custkey,
         list(struct_pack(x := CAST(year AS DOUBLE), y := val)
              ORDER BY year) AS k
  FROM joined WHERE val IS NOT NULL GROUP BY custkey
)
SELECT j.custkey, j.year,
  CAST(floor((CASE
    WHEN j.val IS NOT NULL THEN j.val
    WHEN k IS NULL OR len(k) = 0 THEN NULL
    WHEN len(k) = 1
      THEN (list_filter(k, e -> e.x <= j.year)[-1]).y
    WHEN len(list_filter(k, e -> e.x <= j.year)) > 0
     AND len(list_filter(k, e -> e.x >= j.year)) > 0
      THEN (list_filter(k, e -> e.x <= j.year)[-1]).y
           + ((list_filter(k, e -> e.x >= j.year)[1]).y
              - (list_filter(k, e -> e.x <= j.year)[-1]).y)
             / ((list_filter(k, e -> e.x >= j.year)[1]).x
                - (list_filter(k, e -> e.x <= j.year)[-1]).x)
             * (j.year - (list_filter(k, e -> e.x <= j.year)[-1]).x)
    WHEN j.year > k[-1].x
      THEN k[-1].y + (k[-1].y - k[-2].y) / (k[-1].x - k[-2].x)
           * (j.year - k[-1].x)
    ELSE k[1].y + (k[1].y - k[2].y) / (k[1].x - k[2].x)
         * (j.year - k[1].x)
    END) * 10000 + 0.5) AS BIGINT) AS val_e4,
  j.interpolated
FROM joined j LEFT JOIN kn USING (custkey)
"""


def q09_step_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Midpoint-switch categorical interpolation (SURVEY §2.5 W5)."""
    panel = _orders_panel(spark, sf_dir)
    g = expand_grid(panel, ["custkey"], "year")
    out = step_interpolate(g, ["custkey"], "year", ["prio"])
    return out.select("custkey", "year", "prio", "interpolated")


ORACLE_Q09 = f"""
WITH {_GRID_SQL},
idx AS (
  SELECT *, row_number() OVER (PARTITION BY custkey ORDER BY year) AS i
  FROM joined
),
w AS (
  SELECT custkey, year, prio, interpolated, i,
    last_value(prio IGNORE NULLS) OVER
      (PARTITION BY custkey ORDER BY i
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    last_value(CASE WHEN prio IS NOT NULL THEN i END IGNORE NULLS) OVER
      (PARTITION BY custkey ORDER BY i
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_i,
    first_value(prio IGNORE NULLS) OVER
      (PARTITION BY custkey ORDER BY i
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    first_value(CASE WHEN prio IS NOT NULL THEN i END IGNORE NULLS) OVER
      (PARTITION BY custkey ORDER BY i
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_i
  FROM idx
)
SELECT custkey, year,
  CASE
    WHEN prio IS NOT NULL THEN prio
    WHEN prev_v IS NULL THEN NULL
    WHEN next_v IS NULL THEN prev_v
    WHEN i < prev_i + ceil((next_i - prev_i) / 2.0) THEN prev_v
    ELSE next_v
  END AS prio,
  interpolated
FROM w
"""


def q10_fill_downup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Down-then-up gap fill of group-invariant columns (SURVEY §2.5 W1/W3)."""
    panel = _orders_panel(spark, sf_dir)
    g = expand_grid(panel, ["custkey"], "year")
    out = fill_gaps(g, ["custkey"], "year", ["prio"], direction="downup")
    return out.select("custkey", "year", F.col("prio").alias("prio_filled"))


ORACLE_Q10 = f"""
WITH {_GRID_SQL}
SELECT custkey, year,
  coalesce(
    last_value(prio IGNORE NULLS) OVER
      (PARTITION BY custkey ORDER BY year
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    first_value(prio IGNORE NULLS) OVER
      (PARTITION BY custkey ORDER BY year
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
  ) AS prio_filled
FROM joined
"""


def q11_first_flag_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group first-year-where-condition broadcast to all rows
    (SURVEY §2.5 W6/W7 — the first-dead-year window)."""
    o = load_table(spark, sf_dir, "orders")
    w_all = W.partitionBy("o_custkey")
    first_f = F.min(
        F.when(F.col("o_orderstatus") == "F", F.year("o_orderdate"))
    ).over(w_all)
    return (
        o.withColumn("first_f_year", first_f)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.min("first_f_year").alias("first_f_year"))
    )


ORACLE_Q11 = """
SELECT o_custkey AS custkey,
       min(CASE WHEN o_orderstatus = 'F' THEN year(o_orderdate) END)
         AS first_f_year
FROM orders GROUP BY 1
"""


def q22_expns_per_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expansion-factor pattern: constant / countDistinct per group
    (SURVEY §2.4 A5 — EXPNS = area / n_plots)."""
    o = load_table(spark, sf_dir, "orders")
    area = 1_000_000.0
    return (
        o.groupBy(F.year("o_orderdate").alias("year"))
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
        .withColumn(
            "expns_e4",
            F.floor(F.lit(area) / F.col("n_customers") * 10000 + F.lit(0.5)).cast(
                "long"
            ),
        )
    )


ORACLE_Q22 = """
SELECT year(o_orderdate) AS year,
       count(DISTINCT o_custkey) AS n_customers,
       CAST(floor(1000000.0 / count(DISTINCT o_custkey) * 10000 + 0.5) AS BIGINT)
         AS expns_e4
FROM orders GROUP BY 1
"""


# --------------------------------------------------------------------------
# Text / dedup / similarity (LLM-data-pipeline operators)
# --------------------------------------------------------------------------


def q12_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: survivor id + group size per distinct
    text (dedup operator family, BASELINE.json north star)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


ORACLE_Q12 = """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY 1
"""


def q13_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality scoring: token count, mean word length, stopword ratio
    (text-analysis operator family)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop = F.array([F.lit(s) for s in ["the", "a", "of", "and", "to"]])
    n_tok = F.size(toks)
    n_stop = F.size(F.array_intersect(toks, stop))
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.floor(F.length("text") / n_tok * 10000 + F.lit(0.5)).cast("long").alias(
            "mean_tok_len_e4"
        ),
        F.floor(
            F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
            / n_tok * 10000 + F.lit(0.5)
        ).cast("long").alias("stopword_ratio_e4"),
        (n_stop > 0).alias("has_stopword"),
    )


ORACLE_Q13 = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       CAST(floor(length(text) / len(string_split(text, ' ')) * 10000 + 0.5)
            AS BIGINT) AS mean_tok_len_e4,
       CAST(floor(len(list_filter(string_split(text, ' '),
                                  t -> list_contains(['the','a','of','and','to'], t)))
                  / len(string_split(text, ' ')) * 10000 + 0.5) AS BIGINT)
         AS stopword_ratio_e4,
       len(list_intersect(string_split(text, ' '),
                          ['the','a','of','and','to'])) > 0 AS has_stopword
FROM documents
"""


def q14_token_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency table over distinct tokens (inverted-index /
    fingerprinting building block)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 10)
    )


ORACLE_Q14 = """
SELECT token, count(*) AS df
FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
      FROM documents) t
GROUP BY token HAVING count(*) >= 10
"""


def q15_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit-ish content fingerprint from the document's token multiset
    (engine-portable md5-based hashing)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    return toks.groupBy("doc_id").agg(
        F.min(_hash60(F.col("token"))).alias("min_token_hash"),
        F.max(_hash60(F.col("token"))).alias("max_token_hash"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


ORACLE_Q15 = f"""
SELECT doc_id,
       min({_HASH60_SQL.format(x='token')}) AS min_token_hash,
       max({_HASH60_SQL.format(x='token')}) AS max_token_hash,
       count(*) AS n_tokens
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
GROUP BY doc_id
"""


def q16_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard near-duplicate pairs with prefix filtering
    (n-gram dedup family). The oracle is the naive quadratic inverted-index
    join — prefix filtering is lossless, so results are identical while the
    Spark plan only self-joins each document's rarest-token prefix."""
    d = load_table(spark, sf_dir, "documents")
    # strategy='auto': the driver SFs have a 31-token vocabulary, so the
    # probe picks the 64-bit-mask path there; scaled corpora (tools/
    # make_sf.py shifts the vocabulary per copy) exceed 64 tokens and the
    # probe flips to the SSJoin prefix filter.  The probe job IS the scale
    # path — pinning 'bitmask' here overflowed the mask sum the first time
    # the query ran on a >64-token corpus (caught by run_at_scale at sf1).
    # Budget guard (q54's adjudicated pattern): sf0.01 (gate) and sf1 stay
    # exact under any real budget; at sf10 the exact projection (~1.25e9
    # candidates) exceeds local shuffle disk — measured: unguarded q16
    # killed its JVM at 132 s in the r11 sweep — so it degrades to banded
    # LSH with identical verification and schema.
    pairs = token_jaccard_pairs(
        d, "doc_id", "text", threshold=0.8, strategy="auto",
        candidate_budget=derive_candidate_budget(spark),
        on_budget="degrade",
    )
    # carry_cache: the fixed-point projection is the frame we return; without
    # re-attaching, the operator's persisted docsets would be unpersisted the
    # moment `pairs` goes out of scope — before the plan ever executes
    return carry_cache(
        pairs.select(
            "doc_a",
            "doc_b",
            "n_common",
            F.floor(F.col("jaccard") * 10000 + F.lit(0.5)).cast("long").alias(
                "jaccard_e4"
            ),
        ),
        pairs,
    )


ORACLE_Q16 = """
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents
),
sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       CAST(floor(round(n_common / (sa.sz + sb.sz - n_common), 4) * 10000 + 0.5)
            AS BIGINT) AS jaccard_e4
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_common / (sa.sz + sb.sz - n_common), 4) >= 0.8
"""


def q54_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram (shingle) set-similarity pairs — the n-gram flavor
    of exact Jaccard dedup (vs q16's whitespace tokens). The trigram
    vocabulary (~380) rules out the 64-bit mask path, so this exercises the
    SSJoin prefix filter with a dense shingle alphabet.

    100x-scale posture: the dense alphabet is the prefix filter's WORST
    vocabulary — at sf10 the exact path's candidate stream physically
    exceeds local shuffle disk (measured: 8 GB heap died at ~150 s, 48 GB
    heap filled 74 GB of /tmp and died at ~556 s with 'No space left on
    device').  So q54 carries the candidate-budget guard with
    on_budget='degrade' (like q76 documents for the token family): when
    the sampled projection exceeds the disk-derived budget the plan
    switches to banded shingle-MinHash-LSH candidates with the same exact
    verification and schema — high recall instead of guaranteed-total
    recall, which is the only honest posture once exact pairs are
    output-bound.  The sf0.01 gate stays on the exact path (projection
    far below any real budget), so the oracle hash-match still proves the
    exact machinery.

    Measured at sf10 (166,700 docs, idle local[32]): exact-path sampled
    projection 2.96e9 candidates vs a 2.9e8 disk-derived budget → degrade
    fires; the banded shingle-LSH candidate stream is 12.5e6 rows (236x
    below the exact projection) and the query completes in 294.8 s on the
    default 8 GB heap (2,600 verified pairs)."""
    from foresttime_builder_spark.operators.dedup import (
        char_ngrams,
        derive_candidate_budget,
        token_jaccard_pairs,
    )

    # deterministic corpus slice: the ORACLE is a naive trigram
    # inverted-index self-join that goes quadratic at larger SFs (the Spark
    # side's prefix filter would cope; the gate is sized for its twin)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    pairs = token_jaccard_pairs(
        d,
        "doc_id",
        "text",
        threshold=0.8,
        strategy="prefix",
        tokenizer=char_ngrams("text"),
        candidate_budget=derive_candidate_budget(spark),
        on_budget="degrade",
    )
    # carry_cache: keep the persisted shingle relation alive past the
    # wrapper's fixed-point projection (see q16)
    return carry_cache(
        pairs.select(
            "doc_a",
            "doc_b",
            "n_common",
            F.floor(F.col("jaccard") * 10000 + F.lit(0.5)).cast("long").alias(
                "jaccard_e4"
            ),
        ),
        pairs,
    )


ORACLE_Q54 = """
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN length(text) < 3 THEN []
         ELSE list_transform(range(1, length(text) - 1),
                             i -> substring(text, CAST(i AS INT), 3)) END
  )) AS token
  FROM documents WHERE doc_id % 3 = 0
),
sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       CAST(floor(round(n_common / (sa.sz + sb.sz - n_common), 4) * 10000 + 0.5)
            AS BIGINT) AS jaccard_e4
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_common / (sa.sz + sb.sz - n_common), 4) >= 0.8
"""


def q17_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k over the embedding column for a probe subset
    (similarity-search baseline; the IVF/LSH variants prune the same plan).
    Executes via the numpy matmul kernel (operators.ann.brute_topk_np): the
    tiny probe set rides in the task closure, each partition emits only its
    local top-k, so nothing quadratic crosses Arrow — the JVM
    higher-order-function formulation evaluates ~3 lambdas per vector
    element per pair and was measured ~4× slower.

    The probe predicate is FIXED-SIZE by construction: ``vec_id % 25 == 0
    AND vec_id < 25 * 512`` selects at most 512 probes regardless of corpus
    size, so the operator's MAX_BRUTE_PROBES guard can never fire as the
    scale factor grows (at sf<=0.1 every vec_id is < 12800, so results are
    identical to the previous %25-only sample)."""
    from foresttime_builder_spark.operators.ann import brute_topk_np

    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id", F.transform("embedding", lambda v: v.cast("double")).alias("vec")
    )
    probes = base.filter(
        (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 25 * 512)
    ).select(F.col("vec_id").alias("probe_id"), F.col("vec").alias("probe_vec"))
    out = brute_topk_np(base, probes, k=5)
    return out.select(
        "probe_id",
        "neighbor_id",
        F.floor(F.col("cosine") * 1000000 + F.lit(0.5)).cast("long").alias(
            "cosine_e6"
        ),
        "rank",
    )


ORACLE_Q17 = """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
),
pairs AS (
  SELECT p.vec_id AS probe_id, b.vec_id AS neighbor_id,
         round(list_dot_product(p.vec, b.vec)
               / (sqrt(list_dot_product(p.vec, p.vec))
                  * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cosine
  FROM base p JOIN base b ON p.vec_id != b.vec_id
  WHERE p.vec_id % 25 = 0 AND p.vec_id < 25 * 512
),
ranked AS (
  SELECT *, row_number() OVER
    (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT probe_id, neighbor_id,
       CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_e6, rank
FROM ranked WHERE rank <= 5
"""


def q23_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH near-dup candidates verified with exact Jaccard
    (the sub-quadratic dedup path). Oracle replicates the identical banding
    construction, so candidate recall is bit-for-bit reproducible."""
    d = load_table(spark, sf_dir, "documents")
    # verify='auto' (see q16 note): the probe picks the popcount mask path
    # at the driver SFs, general array_intersect on wider vocabularies
    pairs = minhash_lsh_pairs(
        d,
        "doc_id",
        "text",
        n_hashes=_MH_N,
        band_size=_MH_BAND,
        threshold=0.5,
        verify="auto",
        # feasibility guard, 16 B per (long, long) candidate row: on this
        # deliberately self-similar corpus the banded stream approaches
        # n_bands x true_pairs (~7e9 projected at sf10 — the unguarded
        # query died there at 176 s); sf0.01/sf1 run under budget
        candidate_budget=derive_candidate_budget(
            spark, bytes_per_candidate=16
        ),
    )
    # fixed-point gate emission of the (already 4-rounded) jaccard;
    # carry_cache keeps the operator's persisted mask relation alive until
    # this returned projection is itself dropped
    return carry_cache(
        pairs.select(
            "doc_a",
            "doc_b",
            "n_common",
            F.floor(F.col("jaccard") * 10000 + F.lit(0.5)).cast("long").alias(
                "jaccard_e4"
            ),
        ),
        pairs,
    )


_MH_N, _MH_BAND = 16, 2


def _minhash_lsh_oracle(
    n_hashes: int = _MH_N, band_size: int = _MH_BAND, threshold: float = 0.5
) -> str:
    mins = ",\n         ".join(
        f"min({_HASH60_SQL.format(x=repr(str(i) + '|') + ' || token')}) AS mh_{i:02d}"
        for i in range(n_hashes)
    )
    n_bands = n_hashes // band_size
    bands = ",\n         ".join(
        "md5(concat_ws('|', '{b}', {cols})) AS band_{b}".format(
            b=b,
            cols=", ".join(
                f"CAST(mh_{b * band_size + j:02d} AS VARCHAR)"
                for j in range(band_size)
            ),
        )
        for b in range(n_bands)
    )
    band_list = ", ".join(f"band_{b}" for b in range(n_bands))
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents
),
sigs AS (
  SELECT doc_id,
         {mins}
  FROM tok GROUP BY doc_id
),
banded AS (
  SELECT doc_id,
         {bands}
  FROM sigs
),
stacked AS (
  SELECT doc_id, unnest([{band_list}]) AS band_key FROM banded
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM stacked a JOIN stacked b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
docsets AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks,
         len(list_distinct(string_split(text, ' '))) AS sz
  FROM documents
)
SELECT doc_a, doc_b,
       len(list_intersect(sa.toks, sb.toks)) AS n_common,
       CAST(floor(round(len(list_intersect(sa.toks, sb.toks))
                        / (sa.sz + sb.sz - len(list_intersect(sa.toks, sb.toks))), 4)
                  * 10000 + 0.5) AS BIGINT)
         AS jaccard_e4
FROM cand
JOIN docsets sa ON sa.doc_id = doc_a
JOIN docsets sb ON sb.doc_id = doc_b
WHERE round(len(list_intersect(sa.toks, sb.toks))
            / (sa.sz + sb.sz - len(list_intersect(sa.toks, sb.toks))), 4) >= {threshold}
"""


def q24_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprints (Hamming-distance near-dup family)."""
    d = load_table(spark, sf_dir, "documents")
    return simhash(d, "doc_id", "text", n_bits=_SH_BITS)


_SH_BITS = 60


def _simhash_oracle() -> str:
    h = _HASH60_SQL.format(x="token")
    bits = " + ".join(
        f"(CASE WHEN sum((h >> {k}) & 1) * 2 > count(*) THEN CAST({2**k} AS BIGINT) ELSE 0 END)"
        for k in range(_SH_BITS)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, {h} AS h
  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        FROM documents) t
)
SELECT doc_id, {bits} AS simhash, count(*) AS n_tokens
FROM tok GROUP BY doc_id
"""


def q25_fia_annualize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship end-to-end pipeline: panel → dense grid → linear +
    midpoint-switch interpolation → TPA band join → mortality masks
    (SURVEY §3.1 — the full ``fia_annualize`` chain), value-hash-gated
    stage-for-stage against a DuckDB SQL twin."""
    from foresttime_builder_spark.plans.fia_on_synthetic import annualize_panel

    return annualize_panel(spark, sf_dir)


def _annualize_oracle() -> str:
    from foresttime_builder_spark.plans.fia_on_synthetic import ORACLE_ANNUALIZE

    return ORACLE_ANNUALIZE


def q26_nsvb_carbon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full NSVB carbon/biomass estimation chain on the annualized synthetic
    panel (SURVEY §2.8 / §3.2): three-level coefficient resolution, equation
    dispatch, bisection merch heights, volume deduction + harmonization —
    value-hash-gated against a generated stage-by-stage DuckDB twin."""
    from foresttime_builder_spark.plans.carbon_on_synthetic import estimate_panel

    return estimate_panel(spark, sf_dir)


def _carbon_oracle() -> str:
    from foresttime_builder_spark.plans.carbon_on_synthetic import ORACLE_CARBON

    return ORACLE_CARBON


def q27_population_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population/area scaling over the estimated panel: EXPNS, domain
    indicators, plot totals, per-year ratio (SURVEY §3.3, §2.4 A2-A5)."""
    from foresttime_builder_spark.plans.carbon_on_synthetic import population_panel

    return population_panel(spark, sf_dir)


def q28_grain_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain aggregation sweep via one GROUPING SETS pass
    (SURVEY §2.4 A7)."""
    from foresttime_builder_spark.plans.carbon_on_synthetic import grain_sweep_panel

    return grain_sweep_panel(spark, sf_dir)


def _pop_oracle() -> str:
    from foresttime_builder_spark.plans.carbon_on_synthetic import (
        ORACLE_POPULATION,
        carbon_cte,
    )

    return ORACLE_POPULATION.format(chain=carbon_cte())


def q52_population_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Design-based (POP_STRATUM / POP_PLOT_STRATUM_ASSGN) population
    scaling: each plot inherits its stratum's EXPNS and ADJ_FACTOR_SUBP —
    the rFIA/EVALIDator-style estimator the simplified per-year EXPNS
    (q27) approximates (SURVEY §3.3; vignettes/pop_scaling.qmd:36-44)."""
    from foresttime_builder_spark.plans.carbon_on_synthetic import (
        population_stratified_panel,
    )

    return population_stratified_panel(spark, sf_dir)


def _pop_stratified_oracle() -> str:
    from foresttime_builder_spark.plans.carbon_on_synthetic import (
        ORACLE_POPULATION_STRATIFIED,
        carbon_cte,
    )

    return ORACLE_POPULATION_STRATIFIED.format(chain=carbon_cte())


def q38_sapling_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sapling state machine over the annualized panel: lag/lead year-over-
    year transitions + per-from-state proportions (SURVEY §2.5 W9, the
    reference's ``scripts/05-check_saplings.R`` transition matrix)."""
    from foresttime_builder_spark.plans import fia
    from foresttime_builder_spark.plans.fia_on_synthetic import (
        _PANEL_SQL,
        synthetic_tree_panel,
    )

    panel = synthetic_tree_panel(spark, sf_dir)
    ann = fia.adjust_mortality(
        fia.interpolate_data(fia.expand_data(panel)), use_mortyr=True
    )
    state = (
        F.when(F.col("STATUSCD").isNull(), "unknown")
        .when(F.col("STATUSCD") == 2, "dead")
        .when(F.col("STATUSCD") == 0, "gone")
        .when(F.col("DIA") < 5.0, "sapling")
        .when(F.col("DIA") >= 5.0, "tree")
        .otherwise("unknown")
    )
    # full tree key (value-identical: a tree lives in one plot) so the lag
    # window reuses the annualize chain's (plot_ID, tree_ID) partitioning
    # instead of forcing a private tree_ID-only exchange
    w = W.partitionBy("plot_ID", "tree_ID").orderBy("YEAR")
    d = (
        ann.withColumn("state", state)
        .withColumn("prev_state", F.lag("state", 1).over(w))
        .filter(F.col("prev_state").isNotNull())
    )
    counts = d.groupBy("prev_state", "state").agg(F.count(F.lit(1)).alias("n"))
    tot = W.partitionBy("prev_state")
    return counts.select(
        "prev_state",
        "state",
        "n",
        F.floor(F.col("n") / F.sum("n").over(tot) * 10000 + F.lit(0.5)).cast(
            "long"
        ).alias("prop_e4"),
    )


def _sapling_oracle() -> str:
    from foresttime_builder_spark.plans.fia_on_synthetic import (
        _PANEL_SQL,
        annualize_cte,
    )

    return f"""
WITH {annualize_cte(_PANEL_SQL)},
st AS (
  SELECT tree_ID, YEAR,
    CASE WHEN STATUSCD IS NULL THEN 'unknown'
         WHEN STATUSCD = 2 THEN 'dead'
         WHEN STATUSCD = 0 THEN 'gone'
         WHEN DIA < 5.0 THEN 'sapling'
         WHEN DIA >= 5.0 THEN 'tree'
         ELSE 'unknown' END AS state
  FROM final
),
tr AS (
  SELECT state, lag(state) OVER (PARTITION BY tree_ID ORDER BY YEAR)
           AS prev_state
  FROM st
),
counts AS (
  SELECT prev_state, state, count(*) AS n FROM tr
  WHERE prev_state IS NOT NULL GROUP BY 1, 2
)
SELECT prev_state, state, n,
       CAST(floor(n / (sum(n) OVER (PARTITION BY prev_state)) * 10000 + 0.5)
            AS BIGINT) AS prop_e4
FROM counts
"""


def q39_id_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key build + split roundtrip (SURVEY §2.6 O6 / §1.2:
    underscore-joined plot/tree IDs and their inverse)."""
    from foresttime_builder_spark.plans.fia import (
        add_composite_ids,
        split_composite_ids,
    )

    c = load_table(spark, sf_dir, "customer")
    synth = c.select(
        (F.col("c_nationkey") + 1).alias("STATECD"),
        F.lit(1).alias("UNITCD"),
        (F.col("c_custkey") % 100).alias("COUNTYCD"),
        F.col("c_custkey").alias("PLOT"),
        (F.col("c_custkey") % 4 + 1).alias("SUBP"),
        (F.col("c_custkey") % 9 + 1).alias("TREE"),
    )
    built = add_composite_ids(synth)
    parsed = split_composite_ids(
        built.select("tree_ID", "plot_ID"), id_col="tree_ID"
    )
    return parsed.select(
        "tree_ID",
        "plot_ID",
        F.col("STATECD").cast("int").alias("statecd"),
        F.col("COUNTYCD").cast("int").alias("countycd"),
        F.col("SUBP").cast("int").alias("subp"),
        F.col("TREE").cast("int").alias("tree"),
    )


ORACLE_Q39 = """
WITH synth AS (
  SELECT c_nationkey + 1 AS STATECD, 1 AS UNITCD, c_custkey % 100 AS COUNTYCD,
         c_custkey AS PLOT, c_custkey % 4 + 1 AS SUBP, c_custkey % 9 + 1 AS TREE
  FROM customer
),
built AS (
  SELECT concat_ws('_', STATECD, UNITCD, COUNTYCD, PLOT) AS plot_ID,
         concat_ws('_', STATECD, UNITCD, COUNTYCD, PLOT, SUBP, TREE) AS tree_ID
  FROM synth
)
SELECT tree_ID, plot_ID,
       CAST(string_split(tree_ID, '_')[1] AS INT) AS statecd,
       CAST(string_split(tree_ID, '_')[3] AS INT) AS countycd,
       CAST(string_split(tree_ID, '_')[5] AS INT) AS subp,
       CAST(string_split(tree_ID, '_')[6] AS INT) AS tree
FROM built
"""


def q32_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID heuristic (text-analysis family)."""
    from foresttime_builder_spark.operators.text import language_id

    return language_id(load_table(spark, sf_dir, "documents"), "doc_id", "text")


def q33_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-flavored subword token counting (text-analysis family)."""
    from foresttime_builder_spark.operators.text import token_count_bpe

    return token_count_bpe(load_table(spark, sf_dir, "documents"), "doc_id", "text")


def q34_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-k-gram winnowing fingerprints (rolling-hash family)."""
    from foresttime_builder_spark.operators.text import winnow_fingerprint

    return winnow_fingerprint(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


def q35_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column plumbing: Arrow-batched mapInPandas decode stub
    over an opaque payload (multimodal family)."""
    from foresttime_builder_spark.operators.multimodal import (
        decode_features,
        with_payload,
    )

    d = with_payload(load_table(spark, sf_dir, "documents"))
    out = decode_features(d, impl="fake")
    return out.select(
        "doc_id",
        "byte_len",
        "thumb_hash",
        *[
            F.floor(F.col("features").getItem(j) * 1000000 + F.lit(0.5))
            .cast("long")
            .alias(f"f{j}_e6")
            for j in range(8)
        ],
    )


ORACLE_Q35 = """
SELECT doc_id, length(coalesce(text, '')) AS byte_len,
       md5(substr(coalesce(text, ''), 1, 256)) AS thumb_hash,
       {feats}
FROM documents
""".format(
    feats=", ".join(
        "CAST(floor(CAST(('0x' || substr(md5(coalesce(text, '')), 1 + 2 * %d, 2))"
        " AS BIGINT) / 255.0 * 1000000 + 0.5) AS BIGINT) AS f%d_e6" % (j, j)
        for j in range(8)
    )
)


def q55_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal decode: dependency-free container-header parsing
    (``operators.multimodal.parse_image_header``) over payloads carrying
    genuine PNG/GIF/JPEG headers, via the Arrow mapInPandas stage.

    The payload column is synthesized JVM-side from doc attributes
    (``unhex``/``concat`` column algebra — real magic bytes, IHDR/LSD/SOF0
    layouts, correct endianness per format), with every 4th document left
    as raw text to exercise the unrecognized→null path.  The oracle
    recomputes the expected metadata arithmetically from the same doc
    attributes, so the gate verifies the byte ENCODER (Spark column
    algebra) and the byte DECODER (Python header parser) against an
    independent closed form."""
    from foresttime_builder_spark.operators.multimodal import decode_features

    d = load_table(spark, sf_dir, "documents")
    w = (16 + F.col("doc_id") % 640).cast("int")
    h = (16 + F.col("doc_id") % 480).cast("int")
    be4 = lambda c: F.lpad(F.hex(c), 8, "0")  # 4-byte big-endian hex
    be2 = lambda c: F.lpad(F.hex(c), 4, "0")
    le2 = lambda c: F.concat(  # 2-byte little-endian hex
        F.lpad(F.hex(c % 256), 2, "0"), F.lpad(F.hex(F.floor(c / 256)), 2, "0")
    )
    png = F.unhex(
        F.concat(
            F.lit("89504E470D0A1A0A0000000D49484452"), be4(w), be4(h)
        )
    )
    gif = F.unhex(F.concat(F.lit("474946383961"), le2(w), le2(h)))
    jpeg = F.unhex(F.concat(F.lit("FFD8FFC0001108"), be2(h), be2(w)))
    payload = (
        F.when(F.col("doc_id") % 4 == 0, png)
        .when(F.col("doc_id") % 4 == 1, gif)
        .when(F.col("doc_id") % 4 == 2, jpeg)
        .otherwise(F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8"))
    )
    out = decode_features(
        d.select("doc_id", payload.alias("payload")), impl="real"
    )
    return out.select(
        "doc_id",
        F.col("byte_len").cast("long").alias("byte_len"),
        "format",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
    )


ORACLE_Q55 = """
SELECT doc_id,
  CAST(CASE doc_id % 4 WHEN 0 THEN 24 WHEN 1 THEN 10 WHEN 2 THEN 11
       ELSE octet_length(CAST(coalesce(text, '') AS BLOB)) END AS BIGINT)
    AS byte_len,
  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'jpeg'
       END AS format,
  CAST(CASE WHEN doc_id % 4 <= 2 THEN 16 + doc_id % 640 END AS BIGINT) AS width,
  CAST(CASE WHEN doc_id % 4 <= 2 THEN 16 + doc_id % 480 END AS BIGINT) AS height
FROM documents
"""


def q56_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing into 256-token context windows, sharded
    ``(source, doc_id % 4)`` for parallelism (training-pipeline family;
    see ``operators/packing.py`` for the scale decomposition).  The whole
    fold runs JVM-side via the higher-order ``F.aggregate`` — the oracle is
    a recursive CTE stepping the identical first-fit-sequential recurrence
    one row at a time."""
    from foresttime_builder_spark.operators.packing import pack_sequences

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        # NULL text -> '' (one empty token): a NULL length would poison
        # the running fill/bin fold state for the whole stream
        F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias(
            "n_tok"
        ),
    )
    return pack_sequences(
        d, "n_tok", capacity=256, group_cols=["source"], n_shards=4
    )


ORACLE_Q56 = """
WITH RECURSIVE ordered AS (
  SELECT doc_id, source, doc_id % 4 AS shard,
         CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)
           AS n_tokens,
         row_number() OVER (PARTITION BY source, doc_id % 4 ORDER BY doc_id) AS rn
  FROM documents
  WHERE doc_id IS NOT NULL
), packed AS (
  SELECT doc_id, source, shard, n_tokens, rn,
         CAST(1 AS BIGINT) AS bin_id, n_tokens AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.doc_id, o.source, o.shard, o.n_tokens, o.rn,
         CASE WHEN p.fill + o.n_tokens > 256 THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.fill + o.n_tokens > 256 THEN o.n_tokens
              ELSE p.fill + o.n_tokens END
  FROM packed p
  -- IS NOT DISTINCT FROM: a NULL source is a packing stream too (Spark
  -- groupBy treats NULL as a group), and a plain equi-join would break
  -- the recursive chain after its first row
  JOIN ordered o ON o.source IS NOT DISTINCT FROM p.source
                AND o.shard = p.shard AND o.rn = p.rn + 1
)
SELECT doc_id, source, shard, n_tokens, bin_id FROM packed
"""


def q57_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source quota sampling (corpus mixing): each
    source contributes its ``quota`` lowest-hash documents — a
    reproducible uniform draw stable under repartitioning
    (``operators/sampling.py``).  Quotas are a derived broadcast dim."""
    from foresttime_builder_spark.operators.sampling import quota_sample

    d = load_table(spark, sf_dir, "documents")
    quotas = (
        d.select("source")
        .distinct()
        .select(
            "source",
            (5 + F.substring("source", 4, 10).try_cast("long") % 7).alias("quota"),
        )
    )
    out = quota_sample(d.select("doc_id", "source"), quotas)
    return out.select("doc_id", "source", "sample_rank", "quota")


ORACLE_Q57 = """
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                         AS BIGINT) ASC, doc_id ASC
         ) AS sample_rank
  FROM documents
  WHERE doc_id IS NOT NULL
), quotas AS (
  SELECT source, 5 + TRY_CAST(substr(source, 4) AS BIGINT) % 7 AS quota
  FROM (SELECT DISTINCT source FROM documents) s
)
SELECT r.doc_id, r.source, CAST(r.sample_rank AS INT) AS sample_rank, q.quota
FROM ranked r JOIN quotas q USING (source)
WHERE r.sample_rank <= q.quota
"""


def q58_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train docs (sources other than
    src0/src1) sharing any token 5-gram with the eval slice (src0/src1).
    Distinct-before-join + broadcast eval side — one shuffle total
    (``operators/decontaminate.py``)."""
    from foresttime_builder_spark.operators.decontaminate import contamination

    d = load_table(spark, sf_dir, "documents")
    ev = d.filter(F.col("source").isin("src0", "src1"))
    tr = d.filter(~F.col("source").isin("src0", "src1"))
    return contamination(tr, ev, n=5)


ORACLE_Q58 = """
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, source,
         unnest(list_transform(generate_series(1, len(t) - 4),
                               i -> array_to_string(t[i:i+4], ' '))) AS gram
  FROM toks
), ev AS (
  SELECT DISTINCT gram, doc_id AS eval_doc FROM grams
  WHERE source IN ('src0', 'src1')
), tr AS (
  SELECT DISTINCT doc_id, gram FROM grams
  WHERE source NOT IN ('src0', 'src1')
)
SELECT t.doc_id,
       count(DISTINCT t.gram) AS n_collided_grams,
       count(DISTINCT e.eval_doc) AS n_eval_docs
FROM tr t JOIN ev e USING (gram)
GROUP BY t.doc_id
"""


def q59_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (top-n-gram coverage, duplicate
    tokens) — the quality gate a corpus pipeline runs before training
    (`operators/text.repetition_quality`; Rae et al. 2021 §A1.1)."""
    from foresttime_builder_spark.operators.text import repetition_quality

    return repetition_quality(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


def q36_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-chunk 'frame' sampling over binary payloads, JVM-side
    (multimodal family)."""
    from foresttime_builder_spark.operators.multimodal import (
        frame_sample,
        with_payload,
    )

    d = with_payload(load_table(spark, sf_dir, "documents"))
    out = frame_sample(d, chunk=128, every=2)
    # try_element_at: a 0-frame payload has an EMPTY hash list, and plain
    # element_at raises INVALID_ARRAY_INDEX under ANSI instead of NULL
    return out.select(
        "doc_id",
        "n_frames",
        "n_sampled",
        F.try_element_at("frame_hashes", F.lit(1)).alias("first_frame_hash"),
        F.try_element_at("frame_hashes", F.lit(-1)).alias("last_frame_hash"),
    )


ORACLE_Q36 = """
WITH f AS (
  SELECT doc_id, coalesce(text, '') AS t,
    CAST(ceil(length(coalesce(text, '')) / 128.0) AS INT) AS n_frames,
    list_filter(
      generate_series(0, CAST(ceil(length(coalesce(text, '')) / 128.0) AS INT) - 1),
      i -> i % 2 = 0) AS ids
  FROM documents
)
SELECT doc_id, n_frames, len(ids) AS n_sampled,
       md5(substr(t, CAST(ids[1] * 128 + 1 AS INT), 128))
         AS first_frame_hash,
       md5(substr(t, CAST(ids[-1] * 128 + 1 AS INT), 128))
         AS last_frame_hash
FROM f
"""


def q37_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN with exact in-bucket re-ranking — the
    sub-quadratic similarity-search path (similarity family)."""
    from foresttime_builder_spark.operators.ann import lsh_topk

    out = lsh_topk(load_table(spark, sf_dir, "embeddings"))
    # fixed-point gate emission of the (already 6-rounded) cosine;
    # carry_cache is a no-op today (lsh_topk persists nothing) but keeps the
    # wrapper safe if the operator ever gains a cached intermediate
    return carry_cache(
        out.select(
            "probe_id",
            "neighbor_id",
            F.floor(F.col("cosine") * 1000000 + F.lit(0.5)).cast("long").alias(
                "cosine_e6"
            ),
            "rank",
        ),
        out,
    )


def q40_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucketed candidates +
    exact cosine verification (dedup family)."""
    from foresttime_builder_spark.operators.ann import embedding_neardup_pairs

    out = embedding_neardup_pairs(load_table(spark, sf_dir, "embeddings"))
    return carry_cache(
        out.select(
            "id_a",
            "id_b",
            F.floor(F.col("cosine") * 1000000 + F.lit(0.5)).cast("long").alias(
                "cosine_e6"
            ),
        ),
        out,
    )


def q42_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic mini k-means inverted lists + nprobe-limited
    exact re-ranking — the centroid-based scale path for similarity search
    (complements the LSH path, q37).

    nprobe defaults to 'auto' (recall-targeted ceil(11k/(4·lg k)) — r13,
    measured curves in RECALL_IVF_r13.json; history: nprobe=2 at recall
    1/3 in r9, flat ceil(0.4k) in r12 whose candidate volume saturated
    the budget at sf10 and silently degraded recall to 0.35).  Since the
    r13 cogroup re-rank the candidate scan runs as per-list Arrow
    kernels — candidates never materialize as rows — so the budget guard
    bounds the (probe,list) pair stream instead; it never binds at any
    measured SF (sf10: 633 s budget-saturated → 29.6 s un-degraded,
    recall 0.896)."""
    from foresttime_builder_spark.operators.ann import ivf_topk

    out = ivf_topk(
        load_table(spark, sf_dir, "embeddings"),
        candidate_budget=derive_candidate_budget(spark),
        on_budget="degrade",
    )
    return carry_cache(
        out.select(
            "probe_id",
            "neighbor_id",
            F.floor(F.col("cosine") * 1000000 + F.lit(0.5)).cast("long").alias(
                "cosine_e6"
            ),
            "rank",
        ),
        out,
    )


def q43_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join routed through the co-bucketed parquet layout
    (sources.bucketing): both sides bucketed on the order key, so the join
    plans with zero shuffle Exchange at any scale. The oracle verifies the
    bucketed round-trip preserves the join result."""
    import hashlib
    import os
    import tempfile

    from foresttime_builder_spark.sources.bucketing import (
        co_bucketed_join,
        write_bucketed,
    )

    # Deterministic layout location keyed on the source directory: repeated
    # invocations (bench loops, the correctness gate) reuse the bucketed
    # copy instead of rewriting it into a fresh mkdtemp each time, and the
    # key suffix on the catalog names keeps concurrent sessions pointed at
    # different sf dirs from colliding on a shared warehouse.
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    tmp = os.path.join(tempfile.gettempdir(), f"ftb_q43_{key}")
    orders_tbl = f"ftb_q43_orders_{key}"
    lineitem_tbl = f"ftb_q43_lineitem_{key}"
    for tbl, src, path, cols, sort_cols in (
        (orders_tbl, "orders", f"{tmp}/orders", ["o_orderkey"], None),
        (
            lineitem_tbl,
            "lineitem",
            f"{tmp}/lineitem",
            ["l_orderkey"],
            ["l_orderkey", "l_linenumber"],
        ),
    ):
        if not (spark.catalog.tableExists(tbl) and os.path.isdir(path)):
            write_bucketed(
                load_table(spark, sf_dir, src),
                tbl,
                path,
                cols,
                num_buckets=8,
                sort_cols=sort_cols,
            )
    j = co_bucketed_join(spark, orders_tbl, lineitem_tbl, "o_orderkey", "l_orderkey")
    return j.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").alias("year"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        # per-row e2 quantize -> exact BIGINT sum: a double sum of
        # 1e8-magnitude products is summation-order-dependent in its last
        # ulp, which e2 flooring then exposes as off-by-one cross-engine
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + F.lit(0.5)
            ).cast("long")
        ).cast("long").alias("revenue_e2"),
    )


ORACLE_Q43 = """
SELECT o_orderpriority AS priority, year(o_orderdate) AS year,
       count(*) AS n_rows,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT)
         AS revenue_e2
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1, 2
"""


def q44_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient two-stage aggregation (operators.skew.salted_agg):
    l_returnflag has 3 values over the whole fact table — the worst-case hot
    key — so the salt spreads each key over 16 reducers before merging.
    sum(l_quantity) is integer-valued, hence order-insensitive and exact
    against the single-stage oracle."""
    from foresttime_builder_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty": ("sum", F.col("l_quantity")),
            "n_items": ("count", F.lit(1)),
            "min_price": ("min", F.col("l_extendedprice")),
            "max_price": ("max", F.col("l_extendedprice")),
        },
        salt=16,
        salt_from=["l_orderkey", "l_linenumber"],
    )
    return out.select(
        "l_returnflag",
        F.floor(F.col("sum_qty") * 100 + F.lit(0.5)).cast("long").alias(
            "sum_qty_e2"
        ),
        "n_items",
        F.floor(F.col("min_price") * 100 + F.lit(0.5)).cast("long").alias(
            "min_price_e2"
        ),
        F.floor(F.col("max_price") * 100 + F.lit(0.5)).cast("long").alias(
            "max_price_e2"
        ),
    )


ORACLE_Q44 = """
SELECT l_returnflag,
       CAST(floor(sum(l_quantity) * 100 + 0.5) AS BIGINT) AS sum_qty_e2,
       count(*) AS n_items,
       CAST(floor(min(l_extendedprice) * 100 + 0.5) AS BIGINT) AS min_price_e2,
       CAST(floor(max(l_extendedprice) * 100 + 0.5) AS BIGINT) AS max_price_e2
FROM lineitem
GROUP BY l_returnflag
"""


def q45_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient equi-join (operators.skew.salted_join): the orders
    side is replicated 8× with an explicit salt and lineitem scattered by a
    deterministic row-hash salt, so a hot order key cannot pin one reducer.
    Result identical to the plain join; aggregated for a stable gate."""
    from foresttime_builder_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    j = salted_join(
        li, o, ["l_orderkey"], salt=8, salt_from=["l_orderkey", "l_linenumber"]
    )
    return j.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.floor(F.sum("l_quantity") * 100 + F.lit(0.5)).cast("long").alias(
            "sum_qty_e2"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE_Q45 = """
SELECT o_orderpriority AS priority,
       CAST(floor(sum(l_quantity) * 100 + 0.5) AS BIGINT) AS sum_qty_e2,
       count(*) AS n_rows
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def q46_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic KMV (bottom-k) distinct-count sketch over the order
    custkeys (operators.sketch): md5-based, so the APPROXIMATE estimate is
    bit-identical cross-engine and the gate verifies a sketch exactly."""
    from foresttime_builder_spark.operators.sketch import kmv_distinct

    o = load_table(spark, sf_dir, "orders")
    out = kmv_distinct(o, "o_custkey", k=64)
    return carry_cache(
        out.select(
            F.floor(F.col("est_distinct") * 10000 + F.lit(0.5)).cast("long").alias(
                "est_distinct_e4"
            ),
            "n_exact",
        ),
        out,
    )


def _kmv_oracle() -> str:
    from foresttime_builder_spark.operators.sketch import kmv_oracle_sql

    return (
        "SELECT CAST(floor(est_distinct * 10000 + 0.5) AS BIGINT) "
        "AS est_distinct_e4, n_exact "
        f"FROM ({kmv_oracle_sql('orders', 'o_custkey', k=64)}) z"
    )


def q47_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic two-table as-of join (operators.asof, SURVEY §2.3 J13): each
    purchase event picks the latest click AT OR BEFORE it per user via the
    union-then-window formulation (one shuffle, no range explosion)."""
    from foresttime_builder_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    )  # same no-time/no-identity exclusion as q06, mirrored in the oracle
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.col("value").alias("click_value")
    )
    j = asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_on="ts",
        right_on="ts",
        value_cols=["click_value"],
        right_order=["event_id"],
    )
    return j.select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long").alias(
            "purchase_value_e4"
        ),
        F.floor(F.col("click_value") * 10000 + F.lit(0.5)).cast("long").alias(
            "asof_click_value_e4"
        ),
    )


ORACLE_Q47 = """
WITH ev AS (
  SELECT * FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL
),
clicks AS (SELECT * FROM ev WHERE event_type = 'click')
SELECT p.event_id, p.user_id,
       CAST(floor(p.value * 10000 + 0.5) AS BIGINT) AS purchase_value_e4,
       CAST(floor((SELECT c.value FROM clicks c
                   -- IS NOT DISTINCT FROM: the Spark operator's window
                   -- PARTITION BY groups NULL user_ids together; a plain
                   -- equality would orphan every NULL-user purchase
                   WHERE c.user_id IS NOT DISTINCT FROM p.user_id
                     AND c.ts <= p.ts
                   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) * 10000 + 0.5)
            AS BIGINT) AS asof_click_value_e4
FROM ev p WHERE p.event_type = 'purchase'
"""


def q48_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group: Spark's ``percentile`` and
    DuckDB's ``quantile_cont`` both implement type-7 linear interpolation,
    so exact values gate cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.9D))")
    return li.groupBy("l_returnflag").agg(
        F.floor(pct.getItem(0) * 10000 + F.lit(0.5)).cast("long").alias("p25_e4"),
        F.floor(pct.getItem(1) * 10000 + F.lit(0.5)).cast("long").alias("p50_e4"),
        F.floor(pct.getItem(2) * 10000 + F.lit(0.5)).cast("long").alias("p90_e4"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLE_Q48 = """
SELECT l_returnflag,
       CAST(floor(quantile_cont(l_extendedprice, 0.25) * 10000 + 0.5) AS BIGINT)
         AS p25_e4,
       CAST(floor(quantile_cont(l_extendedprice, 0.5) * 10000 + 0.5) AS BIGINT)
         AS p50_e4,
       CAST(floor(quantile_cont(l_extendedprice, 0.9) * 10000 + 0.5) AS BIGINT)
         AS p90_e4,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


def q49_merge_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental merge/upsert (operators.upsert.merge_latest): events up to
    Jan 15 form the base state, later events are the update batch; one row
    per (user_id, event_type) with the newest (ts, event_id) wins — the
    idempotent batch analog of the reference's overwrite-and-rerun refresh."""
    from foresttime_builder_spark.operators.upsert import merge_latest

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    cutoff = "2024-01-15 00:00:00"
    base = ev.filter(F.col("ts") <= F.lit(cutoff).cast("timestamp"))
    updates = ev.filter(F.col("ts") > F.lit(cutoff).cast("timestamp"))
    merged = merge_latest(
        base, updates, keys=["user_id", "event_type"],
        version_col="ts", tie_break=["event_id"],
    )
    return merged.select(
        "user_id",
        "event_type",
        "event_id",
        F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long").alias(
            "last_value_e4"
        ),
    )


ORACLE_Q49 = """
SELECT user_id, event_type, event_id,
       CAST(floor(value * 10000 + 0.5) AS BIGINT) AS last_value_e4
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  -- ts IS NOT NULL: the Spark side's base/updates cutoff split excludes
  -- NULL-version rows by construction (NULL <= cutoff and NULL > cutoff
  -- are both false) — a row with no version cannot win a merge anyway
  FROM events WHERE ts IS NOT NULL
) t
WHERE rn = 1
"""


def q50_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clustering: connected components over the exact
    token-Jaccard pair graph (operators.graph, Pregel-style min-label
    propagation), yielding a deterministic canonical cluster id (min doc_id)
    and cluster size — the step a training-data pipeline runs after dup
    detection to keep one representative per cluster."""
    from foresttime_builder_spark.operators.graph import cluster_near_dups

    d = load_table(spark, sf_dir, "documents")
    # strategy='auto' (see q16 note): probes the vocabulary and only takes
    # the 64-bit mask path when it is provably applicable.  Budget guard
    # wired HERE (the earlier comment claimed run_at_scale passed it —
    # it never did, and the unguarded exact pair stream OOM'd the r11
    # sf10 sweep at 130 s): gate SFs stay exact, scale degrades to banded
    # LSH edges feeding the same components/clustering.
    return cluster_near_dups(
        d, "doc_id", "text", threshold=0.8, strategy="auto",
        candidate_budget=derive_candidate_budget(spark),
        on_budget="degrade",
    )


def q51_state_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end per-state production job on the scenario fixture: FIA CSVs
    → CSV source layer → tidy → annualize (BOTH mortality variants) → NSVB
    estimate → parquet sink → read-back (``scripts/state-parquet.R:10-49``).
    The oracle rebuilds the identical CSV rows as VALUES and runs the SQL
    twin of every stage (plans.state_on_fixture)."""
    from foresttime_builder_spark.plans.state_on_fixture import (
        state_pipeline_roundtrip,
    )

    return state_pipeline_roundtrip(spark, sf_dir)


def _state_pipeline_oracle() -> str:
    from foresttime_builder_spark.plans.state_on_fixture import oracle_sql

    return oracle_sql()


def _dup_clusters_oracle(rounds: int | None = None) -> str:
    """Min-label propagation unrolled to a fixed depth: exact once
    ``rounds`` >= the dup-graph diameter (measured <= ~8 on the synthetic
    corpus; near-dup clusters are dense).  Depth defaults to
    ``operators.graph.MAX_ITER_DEFAULT`` — the same bound the Spark
    operator enforces (raising on non-convergence), so operator and oracle
    can never silently disagree on depth.  A recursive reachability-closure
    CTE is also exact but materializes |component|²-scale intermediates —
    it ran minutes on this avg-degree-120 graph where the layered form runs
    in milliseconds.  Every layer is MATERIALIZED: DuckDB inlines CTEs per
    reference, and each layer references its predecessor twice — unmarked,
    the chain expands exponentially."""
    if rounds is None:
        from foresttime_builder_spark.operators.graph import MAX_ITER_DEFAULT

        rounds = MAX_ITER_DEFAULT
    layers = []
    for i in range(rounds):
        layers.append(
            f"lab{i + 1} AS MATERIALIZED ("
            f"  SELECT n.id, least(n.lab, coalesce(m.minlab, n.lab)) AS lab"
            f"  FROM lab{i} n LEFT JOIN ("
            f"    SELECT s.b AS id, min(l.lab) AS minlab"
            f"    FROM sym s JOIN lab{i} l ON l.id = s.a GROUP BY s.b"
            f"  ) m ON n.id = m.id)"
        )
    chain = ",\n".join(layers)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents
),
sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(n_common / (sa.sz + sb.sz - n_common), 4) >= 0.8
),
sym AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
lab0 AS MATERIALIZED (SELECT id, id AS lab FROM (SELECT DISTINCT a AS id FROM sym)),
{chain},
comp AS (SELECT id AS doc_id, lab AS cluster_id FROM lab{rounds}),
csize AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1)
SELECT doc_id, comp.cluster_id, cluster_size
FROM comp JOIN csize ON comp.cluster_id = csize.cluster_id
"""


def q41_sql_over_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL entry through the catalog surface (temp views, SURVEY S6):
    the engine is usable from spark.sql alone."""
    from foresttime_builder_spark.sources.readers import register_views

    register_views(spark, sf_dir, names=("orders", "customer"))
    return spark.sql(
        """
        SELECT c_mktsegment, year(o_orderdate) AS year,
               count(*) AS n_orders,
               CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT)
                 AS revenue_e2
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
        """
    )


ORACLE_Q41 = """
SELECT c_mktsegment, year(o_orderdate) AS year, count(*) AS n_orders,
       CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS revenue_e2
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
"""


def _neardup_oracle() -> str:
    from foresttime_builder_spark.operators.ann import embedding_neardup_oracle_sql

    return (
        "SELECT id_a, id_b, "
        "CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_e6 "
        f"FROM ({embedding_neardup_oracle_sql()}) z"
    )


def _ann_oracle() -> str:
    from foresttime_builder_spark.operators.ann import lsh_topk_oracle_sql

    return (
        "SELECT probe_id, neighbor_id, "
        "CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_e6, rank "
        f"FROM ({lsh_topk_oracle_sql()}) z"
    )


def _ivf_oracle() -> str:
    from foresttime_builder_spark.operators.ann import ivf_topk_oracle_sql

    return (
        "SELECT probe_id, neighbor_id, "
        "CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_e6, rank "
        f"FROM ({ivf_topk_oracle_sql()}) z"
    )


# --------------------------------------------------------------------------
# Corpus hygiene: PII scrubbing, URL canonicalization + domain quotas,
# semi-join reduction (operators/scrub.py, operators/runtime_filter.py)
# --------------------------------------------------------------------------

def _pii_suffix_spark() -> list[Column]:
    """Deterministic PII-bearing suffix appended to every document on BOTH
    engine sides — the synthetic corpus has no real emails/IPs/phones, so
    without this the scrub gate would assert nothing but zeros.  (Lazy:
    Columns cannot be built before a session exists.)"""
    return [
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com from 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    ]

_PII_SUFFIX_SQL = (
    "' contact user' || CAST(doc_id AS VARCHAR) || '@mail' || "
    "CAST(doc_id % 7 AS VARCHAR) || '.example.com from 10.' || "
    "CAST(doc_id % 200 AS VARCHAR) || '.0.' || "
    "CAST(doc_id % 250 AS VARCHAR) || ' call 555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def q60_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect-and-mask (emails / IPv4 / phone-shaped spans) — the
    hygiene pass between ingest and dedup in a corpus pipeline
    (`operators/scrub.pii_scrub`; narrow, shuffle-free, codegen'd)."""
    from foresttime_builder_spark.operators.scrub import pii_scrub

    d = load_table(spark, sf_dir, "documents").withColumn(
        "text_pii", F.concat(F.col("text"), *_pii_suffix_spark())
    )
    return pii_scrub(d, "doc_id", "text_pii")


def _pii_oracle() -> str:
    from foresttime_builder_spark.operators.scrub import pii_scrub_oracle_sql

    return (
        "WITH enriched AS (SELECT doc_id, "
        f"text || {_PII_SUFFIX_SQL} AS text_pii FROM documents) "
        + pii_scrub_oracle_sql("doc_id", "text_pii", "enriched")
    )


def _url_spark() -> Column:
    """Deterministic per-document URL, built identically on both engine
    sides (lazy — see :func:`_pii_suffix_spark`)."""
    return F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("site"),
        (F.col("doc_id") % 37).cast("string"),
        F.lit(".example.com/p/"),
        (F.col("doc_id") % 1000).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("?utm_source=x&ref=y")).otherwise(
            F.lit("")
        ),
    )

_URL_SQL = (
    "'https://' || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END || "
    "'site' || CAST(doc_id % 37 AS VARCHAR) || '.example.com/p/' || "
    "CAST(doc_id % 1000 AS VARCHAR) || "
    "CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x&ref=y' ELSE '' END"
)


def q61_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + per-domain quota (keep top-8 docs per host
    by size) — the crawl-balance cap, run through the skew-resistant
    two-stage path (`operators/scrub.domain_cap(two_stage=True)`), which
    the gate proves equals the plain single-window semantics."""
    from foresttime_builder_spark.operators.scrub import (
        canonicalize_url,
        domain_cap,
    )

    d = load_table(spark, sf_dir, "documents").withColumn("url", _url_spark())
    capped = domain_cap(
        canonicalize_url(d, "url"),
        "host",
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        cap=8,
        two_stage=True,
        salt_on=F.col("doc_id"),
    )
    return capped.select(
        "doc_id",
        "host",
        "canon_url",
        F.col("rank_in_domain").cast("long").alias("rank_in_domain"),
    )


def _domain_quota_oracle() -> str:
    from foresttime_builder_spark.operators.scrub import canonical_url_sql

    canon, host = canonical_url_sql("url")
    return f"""
WITH with_url AS (
  SELECT doc_id, n_chars, {_URL_SQL} AS url FROM documents
), canon AS (
  SELECT doc_id, n_chars, {canon} AS canon_url, {host} AS host FROM with_url
), ranked AS (
  SELECT doc_id, host, canon_url,
         row_number() OVER (PARTITION BY host ORDER BY n_chars DESC, doc_id ASC)
           AS rank_in_domain
  FROM canon
)
SELECT doc_id, host, canon_url, rank_in_domain
FROM ranked WHERE rank_in_domain <= 8
"""


def q62_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime semi-join reduction: broadcast the selective order
    subset's hash-bucket set to pre-filter lineitem before the (hinted
    shuffle) join — `operators/runtime_filter.semi_reduced_join`.  The
    oracle is the PLAIN join: the gate proves the reduction changes
    nothing."""
    from foresttime_builder_spark.operators.runtime_filter import (
        semi_reduced_join,
    )

    li = load_table(spark, sf_dir, "lineitem").hint("shuffle_hash")
    sel = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-03-01"))
        & (F.col("o_orderdate") < F.lit("1995-06-01"))
    )
    joined = semi_reduced_join(li, sel, "l_orderkey", "o_orderkey")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        # per-row e2 quantize -> exact BIGINT sum: a double sum of
        # 1e8-magnitude products is summation-order-dependent in its last
        # ulp, which e2 flooring then exposes as off-by-one cross-engine
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + F.lit(0.5)
            ).cast("long")
        ).cast("long").alias("revenue_e2"),
    )


ORACLE_Q62 = """
SELECT o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_e2
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate >= '1995-03-01' AND o_orderdate < '1995-06-01'
GROUP BY o_orderpriority
"""


def q64_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level frequent-n-gram heavy hitters (partial-agg count +
    TakeOrdered top-k — `operators/text.top_token_ngrams`)."""
    from foresttime_builder_spark.operators.text import top_token_ngrams

    return top_token_ngrams(
        load_table(spark, sf_dir, "documents"), "text", n=3, k=20
    )


def _top_ngrams_oracle() -> str:
    from foresttime_builder_spark.operators.text import (
        top_token_ngrams_oracle_sql,
    )

    return top_token_ngrams_oracle_sql("text", "documents", n=3, k=20)


def q65_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucketed train/val/test split assignment
    (`operators/sampling.split_assign`), summarized per (source, split)."""
    from foresttime_builder_spark.operators.sampling import split_assign

    d = split_assign(load_table(spark, sf_dir, "documents"))
    return d.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


def _split_assign_oracle() -> str:
    from foresttime_builder_spark.operators.sampling import (
        split_assign_oracle_sql,
    )

    case = split_assign_oracle_sql()
    return f"""
SELECT source, {case} AS split, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY source, split
"""


def q66_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink+source round trip (`sources/jsonl.py`): write the corpus
    as sharded newline-JSON, re-read it under the pinned schema, and
    aggregate with an order-insensitive 60-bit content signature.  The
    oracle reads the original parquet — the gate therefore proves the
    JSONL round trip is byte-faithful."""
    import tempfile

    from foresttime_builder_spark.operators.dedup import hash60
    from foresttime_builder_spark.sources.jsonl import read_jsonl, write_jsonl

    d = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="q66_jsonl_")
    write_jsonl(d, path)
    r = read_jsonl(
        spark,
        path,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    return r.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.expr(
            "bit_xor(cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint))"
        ).alias("content_sig"),
    )


ORACLE_Q66 = """
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
         AS content_sig
FROM documents GROUP BY lang
"""


def q67_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers grouped by first-order month, activity
    counted by whole months since the cohort month — the canonical
    analytics query a downstream team runs on the engine (window min +
    calendar arithmetic kept to integer year*12+month so both engines
    compute identically)."""
    # NULL custkey / NULL order date carry no cohort identity or month
    # position — excluded identically in the oracle (whose USING join
    # would silently drop the NULL-key rows Spark's window groups)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    w = W.partitionBy("o_custkey")
    monthnum = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    base = o.withColumn("first_dt", F.min("o_orderdate").over(w))
    return (
        base.select(
            F.date_format("first_dt", "yyyy-MM").alias("cohort_month"),
            (monthnum(F.col("o_orderdate")) - monthnum(F.col("first_dt"))).alias(
                "months_since"
            ),
            "o_custkey",
        )
        .groupBy("cohort_month", "months_since")
        .agg(F.count_distinct("o_custkey").alias("n_active"))
    )


ORACLE_Q67 = """
WITH o AS (
  SELECT * FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
), f AS (
  SELECT o_custkey, min(o_orderdate) AS first_dt FROM o GROUP BY o_custkey
)
SELECT strftime(f.first_dt, '%Y-%m') AS cohort_month,
       (year(o.o_orderdate) - year(f.first_dt)) * 12
         + month(o.o_orderdate) - month(f.first_dt) AS months_since,
       count(DISTINCT o.o_custkey) AS n_active
FROM o JOIN f USING (o_custkey)
GROUP BY 1, 2
"""


def q68_batch_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch (30-min inactivity gap) — the
    batch mirror of the streaming session windows (q30), via the
    lag + cumulative-sum islands idiom: one shuffle on user_id serves the
    lag, the session numbering, and the final per-session aggregate."""
    # no-identity/no-time exclusion (same class as q06/q104): NULL order
    # keys take different window positions per engine
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("timestamp").cast("long") - F.lag(
        F.col("ts").cast("timestamp").cast("long")
    ).over(w)
    sess = (
        ev.withColumn(
            "new_sess",
            F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_sess").over(w))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(F.col("ts").cast("timestamp").cast("long"))
            - F.min(F.col("ts").cast("timestamp").cast("long"))
        ).alias(
            "duration_s"
        ),
        F.floor(F.sum("value") * 10000 + F.lit(0.5)).cast("long").alias(
            "total_value_e4"
        ),
    )


ORACLE_Q68 = """
WITH secs AS (
  -- per-event truncation to whole epoch seconds BEFORE any difference,
  -- mirroring Spark's cast(timestamp as long) exactly (epoch() alone keeps
  -- the sub-second fraction and differences would round differently)
  SELECT user_id, event_id, ts, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
), lagged AS (
  SELECT *, es - lag(es) OVER
    (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM secs
), marked AS (
  SELECT *, CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM lagged
), numbered AS (
  SELECT *, sum(new_sess) OVER
    (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
  FROM marked
)
SELECT user_id, session_id, count(*) AS n_events,
       max(es) - min(es) AS duration_s,
       CAST(floor(sum(value) * 10000 + 0.5) AS BIGINT) AS total_value_e4
FROM numbered GROUP BY user_id, session_id
"""


def q69_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel (view → click-after-view →
    purchase-after-click) per user — the conversion query every event
    pipeline runs.  Expressed as three stacked conditional window minima
    over ONE user_id partition (each stage's column feeds the next
    stage's condition), so the whole funnel costs a single shuffle."""
    # the oracle's USING joins drop NULL-user rows; exclude identically
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    es = F.col("ts").cast("timestamp").cast("long")
    w = W.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "v", F.min(F.when(F.col("event_type") == "view", es)).over(w)
        )
        .withColumn(
            "c",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (es >= F.col("v")), es
                )
            ).over(w),
        )
        .withColumn(
            "p",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (es >= F.col("c")),
                    es,
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("v").alias("view_es"),
        F.max("c").alias("click_es"),
        F.max("p").alias("purchase_es"),
    )
    stage = (
        F.when(F.col("purchase_es").isNotNull(), 3)
        .when(F.col("click_es").isNotNull(), 2)
        .when(F.col("view_es").isNotNull(), 1)
        .otherwise(0)
    )
    return per_user.select(
        "user_id", "view_es", "click_es", "purchase_es", stage.alias("stage")
    )


ORACLE_Q69 = """
WITH es AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events WHERE user_id IS NOT NULL
), v AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN es END) AS view_es
  FROM es GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.es) AS click_es
  FROM es e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.es >= v.view_es
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.es) AS purchase_es
  FROM es e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.es >= c.click_es
  GROUP BY e.user_id
)
SELECT v.user_id, v.view_es, c.click_es, p.purchase_es,
       CASE WHEN p.purchase_es IS NOT NULL THEN 3
            WHEN c.click_es IS NOT NULL THEN 2
            WHEN v.view_es IS NOT NULL THEN 1
            ELSE 0 END AS stage
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


def q70_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet sink + partition-pruned readback: write
    the corpus partitioned by ``lang``, re-read only the ``en`` partition
    (the scan must touch one directory, not one-fifth of every file), and
    prove fidelity with the same content signature as q66.  Oracle reads
    the original parquet WHERE lang = 'en'."""
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="q70_part_")
    d.write.partitionBy("lang").mode("overwrite").parquet(path)
    r = spark.read.parquet(path).filter(F.col("lang") == "en")
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.expr(
            "bit_xor(cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint))"
        ).alias("content_sig"),
    )


ORACLE_Q70 = """
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
         AS content_sig
FROM documents WHERE lang = 'en' GROUP BY source
"""


def q71_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-match: document-title pairs within edit distance 1 via
    deletion-neighborhood blocking (`operators/dedup.edit_distance_pairs`
    — FastSS/SymSpell family; lossless blocking + exact levenshtein
    verify, no all-pairs stage).  The corpus slice exists only because the
    ORACLE is the quadratic levenshtein cross join; Spark's path is
    sub-quadratic and runs unsliced at scale (sf1/sf10 sweeps)."""
    from foresttime_builder_spark.operators.dedup import edit_distance_pairs

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", F.substring("text", 1, 24).alias("title"))
    )
    return edit_distance_pairs(d, "doc_id", "title")


ORACLE_Q71 = """
WITH t AS (
  SELECT doc_id, substr(text, 1, 24) AS title
  FROM documents WHERE doc_id % 2 = 0
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(a.title, b.title) AS dist
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE levenshtein(a.title, b.title) <= 1
"""


def q72_novelty_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest novelty check: which src0 documents are content-
    new relative to the rest of the corpus — one hash left-anti join (the
    batch-vs-corpus exact dedup every incremental pipeline runs before
    admitting a crawl drop)."""
    d = load_table(spark, sf_dir, "documents")
    new = d.filter(F.col("source") == "src0")
    base_hashes = (
        d.filter(F.col("source") != "src0")
        .select(F.md5("text").alias("h"))
        .distinct()
    )
    novel = new.join(
        base_hashes, F.md5(new["text"]) == F.col("h"), "left_anti"
    )
    return novel.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_novel"),
        F.sum("n_chars").alias("total_chars"),
    )


ORACLE_Q72 = """
SELECT lang, count(*) AS n_novel,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents n
WHERE source = 'src0' AND NOT EXISTS (
  SELECT 1 FROM documents b
  WHERE b.source <> 'src0' AND md5(b.text) = md5(n.text)
)
GROUP BY lang
"""


def q73_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer rolling 7-day order revenue via a RANGE window frame
    (value-based, not row-based — the frame type none of the other window
    queries exercise).  One shuffle on the customer key."""
    o = load_table(spark, sf_dir, "orders")
    es = F.col("o_orderdate").cast("timestamp").cast("long")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(es)
        .rangeBetween(-6 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        es.alias("es"),
        F.floor(F.sum("o_totalprice").over(w) * 100 + F.lit(0.5))
        .cast("long")
        .alias("rolling_7d_e2"),
    )


ORACLE_Q73 = """
WITH t AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(floor(epoch(o_orderdate)) AS BIGINT) AS es
  FROM orders
)
SELECT o_orderkey, o_custkey, es,
       CAST(floor(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY es
         RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW
       ) * 100 + 0.5) AS BIGINT) AS rolling_7d_e2
FROM t
"""


def q74_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-reweighted source mixing: sqrt-of-count quotas
    (`operators/sampling.temperature_quotas`, alpha=0.5 — the UniMax-style
    rebalance) drawn with the deterministic hash-rank sampler
    (`quota_sample`).  Emits per-source quota, drawn count, and the exact
    sum of drawn doc_ids — so the gate pins WHICH documents were drawn,
    not just how many."""
    from foresttime_builder_spark.operators.sampling import (
        quota_sample,
        temperature_quotas,
    )

    d = load_table(spark, sf_dir, "documents")
    quotas = temperature_quotas(d, "source", budget=300)
    # quota_sample broadcasts the whole quota dim, so n_docs/weight ride
    # along and the dim is in the plan ONCE (a second join would duplicate
    # the 1-row-total crossJoin and the counts aggregation)
    drawn = quota_sample(d, quotas, "source")
    return drawn.groupBy("source", "n_docs", "weight", "quota").agg(
        F.count(F.lit(1)).alias("n_drawn"),
        F.sum("doc_id").alias("drawn_id_sum"),
    )


ORACLE_Q74 = """
WITH c AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
), w AS (
  SELECT source, n_docs,
         CAST(floor(sqrt(n_docs) * 1000000) AS BIGINT) AS weight
  FROM c
), t AS (
  SELECT CAST(sum(weight) AS BIGINT) AS W FROM w
), q AS (
  SELECT source, n_docs, weight,
         CAST(floor(300 * weight / W) AS BIGINT) AS quota
  FROM w, t
), ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                         AS BIGINT) ASC, doc_id ASC
         ) AS sample_rank
  FROM documents
  WHERE doc_id IS NOT NULL
)
SELECT q.source, q.n_docs, q.weight, q.quota,
       count(*) AS n_drawn,
       CAST(sum(r.doc_id) AS BIGINT) AS drawn_id_sum
FROM ranked r JOIN q USING (source)
WHERE r.sample_rank <= q.quota
GROUP BY q.source, q.n_docs, q.weight, q.quota
"""


def q75_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys over two document dimensions —
    the multi-column data-skipping layout (Delta OPTIMIZE ZORDER /
    Iceberg z-rewrite family; `operators/layout.zorder_key`).  The gate
    pins the interleaving bit-exactly; the layout test
    (`tests/test_zorder.py`) proves row-group min/max stats tighten on
    BOTH dimensions."""
    from foresttime_builder_spark.operators.layout import zorder_key

    d = load_table(spark, sf_dir, "documents")
    x = F.pmod(F.col("n_chars"), F.lit(1 << 16))
    y = F.pmod(F.col("doc_id"), F.lit(1 << 16))
    return d.select(
        "doc_id",
        x.alias("x"),
        y.alias("y"),
        zorder_key(x, y, bits=16).alias("zkey"),
    )


def _zorder_oracle() -> str:
    from foresttime_builder_spark.operators.layout import zorder_key_sql

    return f"""
WITH t AS (
  SELECT doc_id, n_chars % 65536 AS x, doc_id % 65536 AS y FROM documents
)
SELECT doc_id, x, y, {zorder_key_sql("x", "y", 16)} AS zkey FROM t
"""


def q76_jaccard_budget_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-pair regime guard in its degrade mode
    (`operators/dedup.token_jaccard_pairs(candidate_budget=..., on_budget=
    'degrade')`): the sample-based estimator projects the prefix join's
    candidate stream BEFORE any full-corpus shuffle, and a deliberately
    tiny budget forces the banded-MinHash fallback — LSH candidates with
    the same exact verification and output schema as q16, centered for the
    0.8 threshold (n_hashes=16, band_size=4).  This is the in-engine
    escape hatch for the regime where q16's exact answer is physically
    output-bound (sf10: ~1.25e9-candidate shuffle > local disk).

    ``candidate_budget=1`` is the FORCING lever (any projection exceeds
    it), so the fallback is guarded by ``degrade_budget`` — the physical
    disk-derived figure — instead of inheriting the demo budget: the
    banded stream completes wherever it physically fits (349 s / 72.8M
    pairs at sf10) and raises the designed feasibility error where even
    it would not."""
    d = load_table(spark, sf_dir, "documents")
    pairs = token_jaccard_pairs(
        d, "doc_id", "text", threshold=0.8, strategy="prefix",
        candidate_budget=1, on_budget="degrade",
        degrade_budget=derive_candidate_budget(spark),
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        "n_common",
        F.floor(F.col("jaccard") * 10000 + F.lit(0.5)).cast("long").alias(
            "jaccard_e4"
        ),
    )


def q78_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch shaping (`operators/packing.
    length_bucket_batches`): power-of-two length buckets (padding-waste
    cap) cut into fixed-token-budget batches by a bucket-partitioned
    running sum — the batching step between a packed corpus and a trainer
    / inference server."""
    from foresttime_builder_spark.operators.packing import length_bucket_batches

    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", F.size(F.split(F.col("text"), " ")).alias("len"))
    return length_bucket_batches(docs, "len", token_budget=2048)


def _length_bucket_oracle() -> str:
    from foresttime_builder_spark.operators.packing import (
        length_bucket_batches_oracle_sql,
    )

    return length_bucket_batches_oracle_sql(
        "(SELECT doc_id, len(string_split(text, ' ')) AS len FROM documents)",
        "len",
        token_budget=2048,
    )


def q77_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup FINALIZE — the step after clustering (q50) that a training
    pipeline actually ships: keep exactly one representative per near-dup
    cluster, chosen by a quality rule (longest document, doc_id
    tie-break), and pass every singleton through.  Delegates to
    ``operators.graph.dedup_finalize`` — the guarded entry point whose
    ``candidate_budget``/``on_budget`` passes through the whole chain
    (scale runs use on_budget='degrade'; the gate runs the exact path).
    One extra hash shuffle on the cluster key over q50; keep rule is a
    total order, so the result is deterministic and engine-portable."""
    from foresttime_builder_spark.operators.graph import dedup_finalize

    d = load_table(spark, sf_dir, "documents")
    # budget guard wired like q50 (the unguarded chain OOM'd the r11 sf10
    # sweep); gate SFs stay exact
    return dedup_finalize(
        d, "doc_id", "text", threshold=0.8, strategy="auto",
        candidate_budget=derive_candidate_budget(spark),
        on_budget="degrade",
    )


def _dedup_keep_best_oracle() -> str:
    return f"""
WITH clusters AS ({_dup_clusters_oracle()}),
toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
joined AS (
  SELECT t.doc_id, t.n_tokens,
         coalesce(c.cluster_id, t.doc_id) AS cluster_id,
         coalesce(c.cluster_size, 1) AS cluster_size
  FROM toks t LEFT JOIN clusters c ON t.doc_id = c.doc_id
),
ranked AS (
  SELECT *, row_number() OVER
    (PARTITION BY cluster_id ORDER BY n_tokens DESC, doc_id) AS rnk
  FROM joined
)
SELECT doc_id, cluster_id, cluster_size, n_tokens
FROM ranked WHERE rnk = 1
"""


def q63_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication coverage (Lee et al. 2022 ExactSubstr,
    re-expressed as a distributed rolling-window inventory + per-document
    interval union — `operators/substr.duplicated_span_coverage`)."""
    from foresttime_builder_spark.operators.substr import (
        duplicated_span_coverage,
    )

    return duplicated_span_coverage(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", n=8
    )


def _dup_spans_oracle() -> str:
    from foresttime_builder_spark.operators.substr import (
        duplicated_span_coverage_oracle_sql,
    )

    return duplicated_span_coverage_oracle_sql("doc_id", "text", "documents", n=8)


def _text_oracle(fn_name: str) -> str:
    from foresttime_builder_spark.operators import text as text_ops

    return getattr(text_ops, fn_name)("doc_id", "text", "documents")


def _stream(name: str):
    """Late-bind the streaming queries (module imports streaming machinery)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from foresttime_builder_spark.plans import streaming_queries

        return getattr(streaming_queries, name)(spark, sf_dir)

    return run


def _stream_oracle(name: str) -> str:
    from foresttime_builder_spark.plans import streaming_queries

    return getattr(streaming_queries, name)


def _grain_oracle() -> str:
    from foresttime_builder_spark.plans.carbon_on_synthetic import (
        ORACLE_GRAIN_SWEEP,
        carbon_cte,
    )

    return ORACLE_GRAIN_SWEEP.format(chain=carbon_cte())


def q79_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / CDC (`operators/diff.snapshot_diff`): classify every
    key across two table versions as insert / delete / update — the change
    feed that replaces the reference's overwrite-and-rerun refresh
    (``scripts/state-parquet.R``) for incremental consumers.  Snapshots are
    carved deterministically from `orders`: the "new" version adds 1997
    orders (inserts), drops `o_orderkey % 101 = 0` (deletes), and bumps the
    price cents of `o_orderkey % 97 = 0` (updates).  Scale: both sides
    hash map-side to (key, md5) before the one full-outer shuffle; only
    changed keys are emitted (doubles are pre-normalized to cent bigints —
    the operator's cross-engine hash contract)."""
    from foresttime_builder_spark.operators.diff import snapshot_diff

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_orderdate",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_e2"),
    )
    old = base.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    new = (
        base.filter(
            (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
            & (F.col("o_orderkey") % 101 != 0)
        )
        .withColumn(
            "price_e2",
            F.col("price_e2")
            + F.when(F.col("o_orderkey") % 97 == 0, F.lit(1)).otherwise(F.lit(0)),
        )
    )
    return snapshot_diff(
        old, new, keys=["o_orderkey"], compare_cols=["o_orderstatus", "price_e2"]
    )


def _snapshot_diff_oracle() -> str:
    from foresttime_builder_spark.operators.diff import snapshot_diff_oracle_sql

    base = (
        "SELECT o_orderkey, o_orderdate, o_orderstatus, "
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_e2 "
        "FROM orders"
    )
    old_sql = f"SELECT * FROM ({base}) WHERE o_orderdate < DATE '1997-01-01'"
    new_sql = (
        f"SELECT o_orderkey, o_orderdate, o_orderstatus, "
        f"price_e2 + CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END AS price_e2 "
        f"FROM ({base}) "
        f"WHERE o_orderdate < DATE '1998-01-01' AND o_orderkey % 101 != 0"
    )
    return snapshot_diff_oracle_sql(
        old_sql, new_sql, keys=["o_orderkey"],
        compare_cols=["o_orderstatus", "price_e2"],
    )


def q80_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (`operators/text.chunk_tokens`):
    every document split into 32-token windows advancing by 16 — the step
    between a cleaned corpus and a context-window-bounded trainer/embedder.
    Spark-first: one hoisted split projection, explode(sequence) chunk
    indices, one slice per chunk; rows never leave the JVM."""
    from foresttime_builder_spark.operators.text import chunk_tokens

    d = load_table(spark, sf_dir, "documents")
    return chunk_tokens(d, "doc_id", "text", size=32, stride=16)


def _chunk_tokens_oracle() -> str:
    from foresttime_builder_spark.operators.text import chunk_tokens_oracle_sql

    return chunk_tokens_oracle_sql(
        "doc_id", "text", "documents", size=32, stride=16
    )


def q81_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus statistics profile (`operators/text.corpus_profile`):
    doc counts, token totals, and the exact token-length distribution
    (min / median / p95 / max) per `source` — the data-card numbers a
    curator reads before mixing sources.  One partial-aggregating shuffle."""
    from foresttime_builder_spark.operators.text import corpus_profile

    d = load_table(spark, sf_dir, "documents")
    return corpus_profile(d, "text", "source")


def _corpus_profile_oracle() -> str:
    from foresttime_builder_spark.operators.text import corpus_profile_oracle_sql

    return corpus_profile_oracle_sql("text", "source", "documents")


#: fixed term bag for the q82 gate — mixes high- and mid-df tokens of the
#: synthetic vocabulary so idf spread is non-trivial
_BM25_TERMS = ("spark", "hash", "window", "merge")


def q82_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance mining (`operators/relevance.bm25_scores`): score
    every document against a fixed query-term bag. Spark-first: one 1-row
    stats aggregate (N, avgdl, per-term df) broadcast into a zero-shuffle
    scoring scan; tf via built-in `size(array_remove(...))`, no lambda
    HOFs, no explode."""
    from foresttime_builder_spark.operators.relevance import bm25_scores

    d = load_table(spark, sf_dir, "documents")
    return bm25_scores(d, "doc_id", "text", _BM25_TERMS)


def _bm25_oracle() -> str:
    from foresttime_builder_spark.operators.relevance import bm25_scores_oracle_sql

    return bm25_scores_oracle_sql("doc_id", "text", "documents", _BM25_TERMS)


def q83_quota_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q57's quota sampling through the guarded hash-threshold prefilter
    (`prefilter_safety=2.0`): each source ranks only ~2x its quota instead
    of every row; sources the probabilistic cut undershot are re-ranked
    exactly in-plan. The oracle is q57's plain full-ranking SQL — passing
    proves the prefilter is lossless."""
    from foresttime_builder_spark.operators.sampling import quota_sample

    d = load_table(spark, sf_dir, "documents")
    quotas = (
        d.select("source")
        .distinct()
        .select(
            "source",
            (5 + F.substring("source", 4, 10).try_cast("long") % 7).alias("quota"),
        )
    )
    out = quota_sample(
        d.select("doc_id", "source"), quotas, prefilter_safety=2.0
    )
    return out.select("doc_id", "source", "sample_rank", "quota")


def q84_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch upsampling to exact per-source quotas
    (`operators/sampling.upsample_to_quota`): sources smaller than their
    quota repeat whole epochs plus a lowest-hash remainder draw ("3.2
    epochs of the small high-quality source"); larger sources degrade to
    quota_sample's downsampling draw. Quotas 10..90 vs 25-doc sources at
    the gate SF exercise both branches."""
    from foresttime_builder_spark.operators.sampling import upsample_to_quota

    d = load_table(spark, sf_dir, "documents")
    quotas = (
        d.select("source")
        .distinct()
        .select(
            "source",
            (10 + (F.substring("source", 4, 10).try_cast("long") % 5) * 20).alias(
                "quota"
            ),
        )
    )
    out = upsample_to_quota(d.select("doc_id", "source"), quotas)
    return out.select("doc_id", "source", "sample_rank", "quota", "epoch")


def _epoch_upsample_oracle() -> str:
    from foresttime_builder_spark.operators.sampling import (
        upsample_to_quota_oracle_sql,
    )

    quotas_sql = (
        "SELECT source, 10 + TRY_CAST(substr(source, 4) AS BIGINT) % 5 * 20 AS quota "
        "FROM (SELECT DISTINCT source FROM documents) s"
    )
    return upsample_to_quota_oracle_sql(
        "(SELECT doc_id, source FROM documents)", quotas_sql
    )


def q85_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite quality gate
    (`operators/text.quality_gate`): five rule predicates (length, mean
    word length, symbol ratio, distinct stopwords, repetition) folded
    into one pass/fail verdict + deterministic fail-reason string per
    document. Single scan, zero shuffles, no lambda HOFs."""
    from foresttime_builder_spark.operators.text import quality_gate

    d = load_table(spark, sf_dir, "documents")
    return quality_gate(d, "doc_id", "text")


def _quality_gate_oracle() -> str:
    from foresttime_builder_spark.operators.text import quality_gate_oracle_sql

    return quality_gate_oracle_sql("doc_id", "text", "documents")


def q86_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style statistical-LM scoring (`operators/lm.ngram_lm_score`):
    corpus-trained add-k-smoothed bigram log-prob totals per document —
    the perplexity-filter signal. Per-bigram log-probs quantize to e6
    BIGINTs BEFORE summation so the aggregate is order-free integer
    arithmetic; bigrams stream from a hoisted-split explode(sequence) +
    element_at projection (no lambda HOFs)."""
    from foresttime_builder_spark.operators.lm import ngram_lm_score

    d = load_table(spark, sf_dir, "documents")
    return ngram_lm_score(d, "doc_id", "text")


def _lm_score_oracle() -> str:
    from foresttime_builder_spark.operators.lm import ngram_lm_score_oracle_sql

    return ngram_lm_score_oracle_sql("doc_id", "text", "documents")


def q87_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication END-TO-END: embedding-cosine
    near-dup pairs (q40's LSH-bucketed candidates + exact verify) feed
    min-label connected components (q50's operator), every vector joins
    back so singletons form their own cluster, and the representative is
    the smallest vec_id — which IS the component label, so `kept` is a
    pure comparison. The whole chain is existing gated operators
    composed; the oracle replays the identical pair SQL + the identical
    fixed-depth label propagation."""
    from foresttime_builder_spark.operators.ann import embedding_neardup_pairs
    from foresttime_builder_spark.operators.graph import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    # SemDeDup keeps only true semantic duplicates: a HIGH cosine bar
    # (0.85) — which also keeps components small and dense, so the
    # label-propagation diameter stays far under the iteration bound
    # (0.3 produced a sprawling diameter->17 chain at sf0.1)
    pairs = embedding_neardup_pairs(emb, threshold=0.85)
    comp = connected_components(pairs, "id_a", "id_b")
    assigned = (
        emb.select("vec_id")
        .join(comp, emb["vec_id"] == comp["id"], "left")
        .select(
            "vec_id", F.coalesce("comp", "vec_id").alias("cluster_id")
        )
    )
    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return assigned.join(sizes, "cluster_id").select(
        "vec_id",
        "cluster_id",
        "cluster_size",
        (F.col("vec_id") == F.col("cluster_id")).alias("kept"),
    )


def _semantic_dedup_oracle(rounds: int | None = None) -> str:
    """Same layered min-label chain as `_dup_clusters_oracle`, over the
    embedding near-dup pair SQL, with singleton attach + kept flag."""
    from foresttime_builder_spark.operators.ann import (
        embedding_neardup_oracle_sql,
    )

    if rounds is None:
        from foresttime_builder_spark.operators.graph import MAX_ITER_DEFAULT

        rounds = MAX_ITER_DEFAULT
    layers = []
    for i in range(rounds):
        layers.append(
            f"lab{i + 1} AS MATERIALIZED ("
            f"  SELECT n.id, least(n.lab, coalesce(m.minlab, n.lab)) AS lab"
            f"  FROM lab{i} n LEFT JOIN ("
            f"    SELECT s.b AS id, min(l.lab) AS minlab"
            f"    FROM sym s JOIN lab{i} l ON l.id = s.a GROUP BY s.b"
            f"  ) m ON n.id = m.id)"
        )
    chain = ",\n".join(layers)
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT id_a, id_b FROM ({embedding_neardup_oracle_sql(threshold=0.85)}) p
),
sym AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
lab0 AS MATERIALIZED (SELECT id, id AS lab FROM (SELECT DISTINCT a AS id FROM sym)),
{chain},
comp AS (SELECT id, lab FROM lab{rounds}),
assigned AS (
  SELECT e.vec_id, coalesce(c.lab, e.vec_id) AS cluster_id
  FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.id
),
csize AS (SELECT cluster_id, count(*) AS cluster_size FROM assigned GROUP BY 1)
SELECT vec_id, assigned.cluster_id, cluster_size,
       vec_id = assigned.cluster_id AS kept
FROM assigned JOIN csize ON assigned.cluster_id = csize.cluster_id
"""


def q88_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights (`operators/dsir.dsir_logweights`):
    hashed unigram+bigram bag models (Xie et al. 2023) — target = the
    English subset, raw = the whole corpus — scoring every document by
    the e6-quantized integer sum of per-bucket log-likelihood ratios.
    Bucket model broadcasts (<= n_buckets rows); feature stream is the
    hoisted-split explode(sequence) projection with map-side
    pre-aggregation per (doc, bucket)."""
    from foresttime_builder_spark.operators.dsir import dsir_logweights

    d = load_table(spark, sf_dir, "documents").withColumn(
        "is_target", F.col("lang") == F.lit("en")
    )
    return dsir_logweights(d, "doc_id", "text", "is_target")


def _dsir_oracle() -> str:
    from foresttime_builder_spark.operators.dsir import (
        dsir_logweights_oracle_sql,
    )

    return dsir_logweights_oracle_sql(
        "doc_id", "text", "documents", "lang = 'en'"
    )


def q89_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (`operators/invindex.inverted_index`): term ->
    (df, cf, top-3 postings by tf with full deterministic tie-break),
    with the stopword-elision bound `max_doc_freq=400` exercised (drops
    corpus-ubiquitous terms before the per-term window so the worst key
    stays bounded)."""
    from foresttime_builder_spark.operators.invindex import inverted_index

    d = load_table(spark, sf_dir, "documents")
    return inverted_index(d, "doc_id", "text", k=3, max_doc_freq=400)


def _inverted_index_oracle() -> str:
    from foresttime_builder_spark.operators.invindex import (
        inverted_index_oracle_sql,
    )

    return inverted_index_oracle_sql(
        "doc_id", "text", "documents", k=3, max_doc_freq=400
    )


def q90_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental batch-vs-history dedup
    (`operators/dedup.incremental_dedup`): the nightly-ingest shape —
    batch docs are checked against an already-kept history via content
    hash (exact) and banded MinHash + exact-Jaccard verify (near).  The
    overlapping id split (history < 300, batch >= 200) makes the
    exact_hist arm fire on real rows; near_hist fires on the corpus'
    genuine near-dups crossing the split."""
    from foresttime_builder_spark.operators.dedup import incremental_dedup

    d = load_table(spark, sf_dir, "documents")
    history = d.filter(F.col("doc_id") < 300)
    batch = d.filter(F.col("doc_id") >= 200)
    return incremental_dedup(history, batch, "doc_id", "text")


def _incremental_dedup_oracle(
    n_hashes: int = 16, band_size: int = 4, threshold: float = 0.5
) -> str:
    n_bands = n_hashes // band_size
    mins = ",\n         ".join(
        f"min({_HASH60_SQL.format(x=repr(str(i) + '|') + ' || token')}) AS mh_{i:02d}"
        for i in range(n_hashes)
    )
    bands = ",\n         ".join(
        "md5(concat_ws('|', '{b}', {cols})) AS band_{b}".format(
            b=b,
            cols=", ".join(
                f"CAST(mh_{b * band_size + j:02d} AS VARCHAR)"
                for j in range(band_size)
            ),
        )
        for b in range(n_bands)
    )
    band_list = ", ".join(f"band_{b}" for b in range(n_bands))

    def _stack(src: str) -> str:
        return f"""(
  SELECT doc_id, unnest([{band_list}]) AS band_key FROM (
    SELECT doc_id, {bands} FROM (
      SELECT doc_id, {mins}
      FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
            FROM {src})
      GROUP BY doc_id
    )
  )
)"""

    return f"""
WITH history AS (SELECT * FROM documents WHERE doc_id < 300),
batch AS (SELECT * FROM documents WHERE doc_id >= 200),
b_hash AS (SELECT doc_id AS bid, CASE WHEN text IS NULL THEN '<NULL>' ELSE md5(text) END AS h FROM batch),
hist_keep AS (
  SELECT CASE WHEN text IS NULL THEN '<NULL>' ELSE md5(text) END AS h, min(doc_id) AS exact_hist_id FROM history GROUP BY 1
),
batch_keep AS (SELECT h, min(bid) AS batch_keep_id FROM b_hash GROUP BY h),
cand AS (
  SELECT DISTINCT b.doc_id AS bid, h.doc_id AS hid
  FROM {_stack("batch")} b JOIN {_stack("history")} h USING (band_key)
),
bsets AS (
  SELECT doc_id AS bid, list_distinct(string_split(text, ' ')) AS btoks,
         len(list_distinct(string_split(text, ' '))) AS bsz
  FROM batch
),
hsets AS (
  SELECT doc_id AS hid, list_distinct(string_split(text, ' ')) AS htoks,
         len(list_distinct(string_split(text, ' '))) AS hsz
  FROM history
),
near_keep AS (
  SELECT bid, min(hid) AS near_hist_id
  FROM cand JOIN bsets USING (bid) JOIN hsets USING (hid)
  WHERE len(list_intersect(btoks, htoks))
        / (bsz + hsz - len(list_intersect(btoks, htoks))) >= {threshold!r}
  GROUP BY bid
)
SELECT bid AS doc_id,
       CASE WHEN exact_hist_id IS NOT NULL THEN 'exact_hist'
            WHEN bid <> batch_keep_id THEN 'exact_batch'
            WHEN near_hist_id IS NOT NULL THEN 'near_hist'
            ELSE 'kept' END AS verdict,
       CASE WHEN exact_hist_id IS NOT NULL THEN exact_hist_id
            WHEN bid <> batch_keep_id THEN batch_keep_id
            ELSE near_hist_id END AS match_id
FROM b_hash
LEFT JOIN hist_keep USING (h)
JOIN batch_keep USING (h)
LEFT JOIN near_keep USING (bid)
"""


def q91_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-diversity matrix (`operators/text.vocabulary_overlap`):
    pairwise vocabulary Jaccard between sources, distinct-reduced before
    the token self-join so join input is vocabulary-sized."""
    from foresttime_builder_spark.operators.text import vocabulary_overlap

    d = load_table(spark, sf_dir, "documents")
    return vocabulary_overlap(d, "source", "text")


def _vocab_overlap_oracle() -> str:
    from foresttime_builder_spark.operators.text import (
        vocabulary_overlap_oracle_sql,
    )

    return vocabulary_overlap_oracle_sql("source", "text", "documents")


def q92_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 dimension build (`operators/scd.scd2_build`): collapse
    each user's event stream into distinct consecutive event_type runs
    with validity intervals — one shuffle, two stacked windows on the
    same key partitioning."""
    from foresttime_builder_spark.operators.scd import scd2_build

    e = load_table(spark, sf_dir, "events")
    return scd2_build(e, "user_id", "ts", ["event_type"], "event_id")


def _scd2_oracle() -> str:
    from foresttime_builder_spark.operators.scd import scd2_build_oracle_sql

    return scd2_build_oracle_sql(
        "user_id", "ts", ["event_type"], "event_id", "events"
    )


def q93_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (`operators/ivm.incremental_group_sum`):
    a per-user sum/count view is delta-merged from an old to a new
    events snapshot — deletes (event_id % 23 = 3), value updates
    (% 13 = 0), group-moving updates (% 17 = 1), and inserts (% 11 = 0
    absent from old) all in play.  The oracle is a FULL RECOMPUTE over
    the new snapshot: hash-matching it proves the delta algebra."""
    from foresttime_builder_spark.operators.ivm import incremental_group_sum

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("value_e2"),
    )
    old = e.filter(F.col("event_id") % 11 != 0)
    new = (
        e.filter(F.col("event_id") % 23 != 3)
        .withColumn(
            "value_e2",
            F.when(
                F.col("event_id") % 13 == 0, F.col("value_e2") + 100
            ).otherwise(F.col("value_e2")),
        )
        .withColumn(
            "user_id",
            F.when(
                F.col("event_id") % 17 == 1, F.col("user_id") + 1
            ).otherwise(F.col("user_id")),
        )
    )
    return incremental_group_sum(
        old, new, ["event_id"], "user_id", "value_e2"
    )


def _incremental_agg_oracle() -> str:
    from foresttime_builder_spark.operators.ivm import (
        incremental_group_sum_oracle_sql,
    )

    new_sql = """
      SELECT event_id,
             CASE WHEN event_id % 17 = 1 THEN user_id + 1 ELSE user_id END
               AS user_id,
             CASE WHEN event_id % 13 = 0
                  THEN CAST(floor(value * 100) AS BIGINT) + 100
                  ELSE CAST(floor(value * 100) AS BIGINT) END AS value_e2
      FROM events WHERE event_id % 23 <> 3
    """
    return incremental_group_sum_oracle_sql(new_sql, "user_id", "value_e2")


def q94_tfidf_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TF-IDF signature terms
    (`operators/text.tfidf_signature_terms`): top-5 terms per source by
    group-level tf-idf with fully-ordered ties — the "what makes this
    crawl different" profile."""
    from foresttime_builder_spark.operators.text import tfidf_signature_terms

    d = load_table(spark, sf_dir, "documents")
    return tfidf_signature_terms(d, "source", "text", k=5)


def _tfidf_signatures_oracle() -> str:
    from foresttime_builder_spark.operators.text import (
        tfidf_signature_terms_oracle_sql,
    )

    return tfidf_signature_terms_oracle_sql("source", "text", "documents", k=5)


def q95_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL sign-matrix dimensionality reduction
    (`operators/ann.random_projection`): 64 -> 8 dims via a
    deterministic md5-parity +-1 matrix, e9-quantized int64 Arrow
    matmul — zero shuffles, exact cross-engine."""
    from foresttime_builder_spark.operators.ann import random_projection

    emb = load_table(spark, sf_dir, "embeddings")
    return random_projection(emb, "vec_id", "embedding", out_dims=8)


def _random_projection_oracle() -> str:
    from foresttime_builder_spark.operators.ann import (
        random_projection_oracle_sql,
    )

    return random_projection_oracle_sql(
        "embeddings", "vec_id", "embedding", out_dims=8
    )


def q97_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the events `props` JSON column
    (`get_json_object`, JVM-side SIMD JSON path — no UDF), bucket the
    extracted integer, and aggregate counts + value sums per bucket.
    The analytics-engine table stake for JSON payload columns."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.select(
            (F.floor(k / 10) * 10).cast("long").alias("k_bucket"),
            F.floor(F.col("value") * 100).cast("long").alias("value_e2"),
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value_e2").cast("long").alias("total_value_e2"),
        )
    )


ORACLE_Q97 = """
-- json_valid guard: DuckDB's json_extract_string ERRORS on malformed
-- JSON ('' or junk), while Spark's get_json_object returns NULL
SELECT CAST(floor(CAST(CASE WHEN json_valid(props)
                 THEN json_extract_string(props, '$.k') END AS INTEGER) / 10)
            * 10 AS BIGINT) AS k_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
         AS total_value_e2
FROM events GROUP BY 1
"""


def q98_numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-width histogram (`operators/profile.numeric_histogram`)
    of order totals in cents — all-integer boundary arithmetic, one
    1-row stats broadcast + one bounded groupBy."""
    from foresttime_builder_spark.operators.profile import numeric_histogram

    o = load_table(spark, sf_dir, "orders")
    return numeric_histogram(o, "o_totalprice", n_buckets=16, scale=100)


def _numeric_histogram_oracle() -> str:
    from foresttime_builder_spark.operators.profile import (
        numeric_histogram_oracle_sql,
    )

    return numeric_histogram_oracle_sql(
        "o_totalprice", "orders", n_buckets=16, scale=100
    )


def q99_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source score calibration
    (`operators/sampling.calibrate_scores`): within-source percent_rank
    of document length — the normalization applied before a single
    global quality threshold spans heterogeneous sources.  ONE window
    shuffle, no joins."""
    from foresttime_builder_spark.operators.sampling import calibrate_scores

    d = load_table(spark, sf_dir, "documents")
    return calibrate_scores(d, "doc_id", "source", "n_chars")


def _score_calibration_oracle() -> str:
    from foresttime_builder_spark.operators.sampling import (
        calibrate_scores_oracle_sql,
    )

    return calibrate_scores_oracle_sql(
        "doc_id", "source", "n_chars", "documents"
    )


def q100_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data pipeline END-TO-END: Gopher-style quality gate
    (q85's operator) -> exact dedup keep-smallest (q12's) -> per-source
    quota sampling (q57/q83's) — three gated operators composed the way
    a production curation job chains them.  The oracle replays the
    identical composition in one SQL text, so the gate certifies the
    stage INTERFACES, not just each stage alone."""
    from foresttime_builder_spark.operators.dedup import exact_dedup
    from foresttime_builder_spark.operators.sampling import quota_sample
    from foresttime_builder_spark.operators.text import quality_gate

    d = load_table(spark, sf_dir, "documents")
    gate = quality_gate(d, "doc_id", "text")
    survivors = d.join(
        gate.filter(F.col("passes")).select("doc_id", "n_tokens"), "doc_id"
    )
    keepers = exact_dedup(survivors, "doc_id", "text").select(
        F.col("keep_doc_id").alias("doc_id")
    )
    pool = survivors.join(keepers, "doc_id")
    quotas = (
        pool.select("source").distinct().withColumn("quota", F.lit(10))
    )
    sampled = quota_sample(
        pool.select("doc_id", "source", "n_tokens"), quotas
    )
    return sampled.select("doc_id", "source", "n_tokens", "sample_rank")


def _pipeline_e2e_oracle() -> str:
    from foresttime_builder_spark.operators.text import quality_gate_oracle_sql

    gate = quality_gate_oracle_sql("doc_id", "text", "documents")
    h = _HASH60_SQL.format(x="CAST(doc_id AS VARCHAR)")
    return f"""
WITH gate AS ({gate}),
survivors AS (
  SELECT d.doc_id, d.source, d.text, g.n_tokens
  FROM documents d JOIN gate g USING (doc_id)
  WHERE g.passes
),
keepers AS (
  SELECT min(doc_id) AS doc_id FROM survivors GROUP BY md5(text)
),
pool AS (
  SELECT s.doc_id, s.source, s.n_tokens
  FROM survivors s JOIN keepers USING (doc_id)
),
ranked AS (
  SELECT doc_id, source, n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY {h}, doc_id)
           AS sample_rank
  -- source IS NOT NULL mirrors the Spark side's quotas equi-join, which
  -- can never match a NULL mix key
  FROM pool WHERE source IS NOT NULL
)
SELECT doc_id, source, n_tokens, CAST(sample_rank AS BIGINT) AS sample_rank
FROM ranked WHERE sample_rank <= 10
"""


def q101_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@3 of the IVF index (q42's operator)
    against brute-force ground truth (q17's kernel) on the shared
    bounded probe set — the eval harness that tells a pipeline whether
    its nprobe/k_clusters are good enough before committing to the
    approximate path.  Both sides are deterministic (6-dp rounding +
    neighbor-id tie-break), so recall itself is engine-exact.  History:
    the old nprobe=2 default measured mean recall@3 = 1/3 at sf0.01
    (round 9); the r12 ceil(0.4·k) rule hit the bar at gate SFs but
    budget-degraded to recall 0.35 at sf10; the r13 recall-targeted
    ceil(11k/(4·lg k)) (adaptive_nprobe, curves in RECALL_IVF_r13.json)
    measures 0.90 / 0.854 / 0.896 at sf0.01 / sf1 / sf10 with the budget
    never binding — the harness drove both fixes, and now guards them.
    Budget-degrade rides along exactly as in q42."""
    from foresttime_builder_spark.operators.ann import brute_topk_np, ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    cap = 25 * 512  # bounded probe subset, q17's convention
    ivf = ivf_topk(
        e,
        candidate_budget=derive_candidate_budget(spark),
        on_budget="degrade",
    ).filter(F.col("probe_id") < cap)
    base = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    probes = base.filter(
        (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < cap)
    ).select(F.col("vec_id").alias("probe_id"), F.col("vec").alias("probe_vec"))
    exact = brute_topk_np(base, probes, k=3).select(
        F.col("probe_id").alias("e_probe"),
        F.col("neighbor_id").alias("e_neighbor"),
    )
    matched = ivf.join(
        exact,
        (F.col("probe_id") == F.col("e_probe"))
        & (F.col("neighbor_id") == F.col("e_neighbor")),
        "left",
    )
    return matched.groupBy("probe_id").agg(
        F.sum(F.when(F.col("e_probe").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_matched"),
        F.floor(
            F.sum(F.when(F.col("e_probe").isNotNull(), 1).otherwise(0))
            * 1_000_000
            / 3
        )
        .cast("long")
        .alias("recall_e6"),
    )


def _ann_recall_oracle() -> str:
    from foresttime_builder_spark.operators.ann import ivf_topk_oracle_sql

    return f"""
WITH ivf AS (
  SELECT probe_id, neighbor_id FROM ({ivf_topk_oracle_sql()}) z
  WHERE probe_id < 25 * 512
),
base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
),
pairs AS (
  SELECT p.vec_id AS probe_id, b.vec_id AS neighbor_id,
         round(list_dot_product(p.vec, b.vec)
               / (sqrt(list_dot_product(p.vec, p.vec))
                  * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cosine
  FROM base p JOIN base b ON p.vec_id != b.vec_id
  WHERE p.vec_id % 25 = 0 AND p.vec_id < 25 * 512
),
exact AS (
  SELECT probe_id AS e_probe, neighbor_id AS e_neighbor
  FROM (
    SELECT *, row_number() OVER
      (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM pairs
  ) WHERE rank <= 3
)
SELECT i.probe_id,
       CAST(sum(CASE WHEN e.e_probe IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched,
       CAST(floor(sum(CASE WHEN e.e_probe IS NOT NULL THEN 1 ELSE 0 END)
                  * 1000000 / 3) AS BIGINT) AS recall_e6
FROM ivf i LEFT JOIN exact e
  ON i.probe_id = e.e_probe AND i.neighbor_id = e.e_neighbor
GROUP BY i.probe_id
"""


def q102_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement
    (`operators/sampling.weighted_sample`, Efraimidis-Spirakis A-ES):
    5 docs per language, probability proportional to length weight,
    fully reproducible from hashed ids — one window shuffle."""
    from foresttime_builder_spark.operators.sampling import weighted_sample

    d = load_table(spark, sf_dir, "documents")
    return weighted_sample(d, "doc_id", "lang", "n_chars", k=5)


def _weighted_sample_oracle() -> str:
    from foresttime_builder_spark.operators.sampling import (
        weighted_sample_oracle_sql,
    )

    return weighted_sample_oracle_sql(
        "doc_id", "lang", "n_chars", "documents", k=5
    )


def q103_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users over time — the running-distinct
    analytic Spark has no native window for, decomposed as first-seen
    flag + cumulative sum: a user contributes to the running total only
    on their first day, so ``cum_distinct(d) = sum over days <= d of
    new_users``.  Per-day grain: the final cumsum window runs over a
    BOUNDED day table (one row per day), never over events."""
    e = (
        load_table(spark, sf_dir, "events")
        # a NULL ts has no day, and a NULL day row would sort to a
        # different end of the cumulative window in each engine
        .filter(F.col("ts").isNotNull())
        .select(F.to_date("ts").alias("day"), "user_id")
    )
    daily = e.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("daily_active")
    )
    first_seen = e.groupBy("user_id").agg(F.min("day").alias("first_day"))
    new_users = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    joined = daily.join(new_users, "day", "left").select(
        "day",
        "daily_active",
        F.coalesce("new_users", F.lit(0)).cast("long").alias("new_users"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return joined.withColumn(
        "cum_distinct_users", F.sum("new_users").over(w).cast("long")
    )


ORACLE_Q103 = """
WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events
           WHERE ts IS NOT NULL),
daily AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS daily_active
  FROM e GROUP BY day
),
first_seen AS (SELECT user_id, min(day) AS first_day FROM e GROUP BY user_id),
new_users AS (
  SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
  FROM first_seen GROUP BY first_day
)
SELECT d.day, d.daily_active,
       CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
       CAST(sum(coalesce(n.new_users, 0)) OVER (
         ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_distinct_users
FROM daily d LEFT JOIN new_users n ON d.day = n.day
"""


def q104_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window anomaly scoring: each (event_type, day) count gets
    a z-score against its trailing 7-day window.  Variance comes from
    EXACT integer window sums (n*sumsq - sum^2 over n*(n-1)) rather than
    the engines' streaming stddev kernels (Welford vs naive would
    disagree in low bits); the sums are then widened to DOUBLE on both
    engine sides before the identical IEEE products/divisions under the
    e6 floor (int64 s1*s1 would overflow at ~3e9 events/window while
    DuckDB widens to HUGEINT).  NULL where the window has <2 rows or
    zero variance."""
    e = load_table(spark, sf_dir, "events")
    # a NULL timestamp has no day — and a NULL day would take a different
    # window POSITION in each engine (Spark sorts NULLS FIRST, DuckDB
    # NULLS LAST), shifting every trailing window by one row
    daily = e.filter(F.col("ts").isNotNull()).groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    x = F.col("n_events")
    # the window sums stay exact BIGINTs; the variance arithmetic is then
    # done in DOUBLE on BOTH engine sides (identical IEEE ops) — int64
    # s1*s1 would overflow at ~3e9 events/window while DuckDB silently
    # widens to HUGEINT, breaking parity exactly at scale
    s1 = F.sum(x).over(w).cast("double")
    s2 = F.sum(x * x).over(w).cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    num = n * s2 - s1 * s1
    var = num / (n * (n - F.lit(1.0)))
    z = (x - s1 / n) / F.sqrt(var)
    return daily.select(
        "event_type",
        "day",
        "n_events",
        F.when((n >= 2) & (num > 0), F.floor(z * 1_000_000))
        .cast("long")
        .alias("z_e6"),
    )


ORACLE_Q104 = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), win AS (
  SELECT event_type, day, n_events,
         CAST(sum(n_events) OVER w AS DOUBLE) AS s1,
         CAST(sum(n_events * n_events) OVER w AS DOUBLE) AS s2,
         CAST(count(*) OVER w AS DOUBLE) AS n
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, n_events,
       CASE WHEN n >= 2 AND n * s2 - s1 * s1 > 0 THEN
         CAST(floor((n_events - s1 / n)
                    / sqrt((n * s2 - s1 * s1) / (n * (n - 1.0)))
                    * 1000000) AS BIGINT)
       END AS z_e6
FROM win
"""


def q105_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group statistics: order totals winsorized at the exact
    interpolated p05/p95 (Spark `percentile` == DuckDB `quantile_cont`,
    both the (n-1)*p linear-interpolation definition), then clipped
    values are e2-quantized BEFORE summation so the robust mean is an
    exact integer aggregate.  The outlier-resistant profile a pipeline
    reads instead of raw means."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_e2"),
    )
    pcts = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(price_e2, 0.05)").alias("_p05"),
        F.expr("percentile(price_e2, 0.95)").alias("_p95"),
    )
    clipped = o.join(F.broadcast(pcts), "o_orderpriority").select(
        "o_orderpriority",
        F.floor(
            F.least(
                F.greatest(F.col("price_e2").cast("double"), F.col("_p05")),
                F.col("_p95"),
            )
        )
        .cast("long")
        .alias("_w"),
    )
    return clipped.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("_w").cast("long").alias("winsorized_sum_e2"),
    )


ORACLE_Q105 = """
WITH o AS (
  SELECT o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_e2
  FROM orders
), pcts AS (
  SELECT o_orderpriority,
         quantile_cont(price_e2, 0.05) AS p05,
         quantile_cont(price_e2, 0.95) AS p95
  FROM o GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(least(greatest(CAST(price_e2 AS DOUBLE), p05),
                                 p95)) AS BIGINT)) AS BIGINT)
         AS winsorized_sum_e2
FROM o JOIN pcts USING (o_orderpriority)
GROUP BY o.o_orderpriority
"""


def q106_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two parquet snapshots written with
    DIFFERENT schemas (v1 lacks ``o_orderstatus``; v2 added it) are read
    back through ``mergeSchema`` — v1 rows surface the new column as
    NULL, exactly how a long-lived table accretes columns in production.
    The oracle recomputes the same aggregate straight from the source
    table with the v1 rows' status nulled, proving the merged read is
    lossless (the q70 fidelity pattern)."""
    import os
    import tempfile

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_e2"),
    )
    v1 = o.filter(F.year("o_orderdate") == 1995).select(
        "o_orderkey", "price_e2"
    )
    v2 = o.filter(F.year("o_orderdate") == 1996).select(
        "o_orderkey", "price_e2", "o_orderstatus"
    )
    # fixed per-sf scratch path, overwritten each run — mkdtemp() here
    # would leak one orphan temp dir per sweep/gate invocation (cleanup
    # after return is impossible: the result DataFrame reads these files
    # lazily, after this function exits)
    # per-process scratch: overwritten across runs within a process (no
    # per-run mkdtemp leak) but distinct across processes (a concurrent
    # gate + bench pair must not clobber each other's lazily-read files)
    base = os.path.join(
        tempfile.gettempdir(),
        f"q106_evo_scratch_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    v1.write.mode("overwrite").parquet(f"{base}/v1")
    v2.write.mode("overwrite").parquet(f"{base}/v2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/v1", f"{base}/v2"
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("price_e2").cast("long").alias("total_e2"),
    )


ORACLE_Q106 = """
SELECT CASE WHEN year(o_orderdate) = 1996 THEN o_orderstatus END
         AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_e2
FROM orders
WHERE year(o_orderdate) IN (1995, 1996)
GROUP BY 1
"""


def q107_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram (`operators/profile.equidepth_histogram`):
    ntile over the (value, id) total order — the optimizer-style
    histogram complementing q98's equi-width buckets."""
    from foresttime_builder_spark.operators.profile import equidepth_histogram

    o = load_table(spark, sf_dir, "orders")
    return equidepth_histogram(
        o, "o_totalprice", "o_orderkey", n_buckets=12, scale=100
    )


def _equidepth_oracle() -> str:
    from foresttime_builder_spark.operators.profile import (
        equidepth_histogram_oracle_sql,
    )

    return equidepth_histogram_oracle_sql(
        "o_totalprice", "o_orderkey", "orders", n_buckets=12, scale=100
    )


def q109_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reshape round-trip: pivot order counts to a wide (year x status)
    matrix, then `unpivot` (melt) back to long — the wide->long
    direction q19's manual pivot lacks.  The oracle computes the long
    form directly, so the gate proves pivot∘unpivot is the identity on
    non-empty cells (unpivot drops NULL cells by design —
    include_nulls=False — matching the direct GROUP BY which never had
    those rows)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("year"), "o_orderstatus"
    )
    wide = (
        o.groupBy("year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    long = wide.unpivot(
        ["year"], ["F", "O", "P"], "o_orderstatus", "n_orders"
    ).filter(F.col("n_orders").isNotNull())
    return long.select(
        "year", "o_orderstatus", F.col("n_orders").cast("long").alias("n_orders")
    )


ORACLE_Q109 = """
SELECT year(o_orderdate) AS year, o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderstatus IN ('F', 'O', 'P')
GROUP BY 1, 2
"""


def q110_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 `pyspark.sql.datasource`,
    `sources/pysource.py`): a deterministic md5-derived synthetic-record
    generator whose `partitions()` fans generation across executors with
    no driver materialization.  Aggregated per lang so the gate hashes a
    stable shape; the oracle regenerates the identical rows from
    generate_series."""
    from foresttime_builder_spark.sources.pysource import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    d = (
        spark.read.format("synthetic_docs")
        .option("n_rows", 5000)
        .option("n_partitions", 8)
        .load()
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("score").cast("long").alias("total_score"),
        F.min("doc_id").cast("long").alias("min_id"),
        F.max("doc_id").cast("long").alias("max_id"),
    )


def _python_datasource_oracle() -> str:
    from foresttime_builder_spark.sources.pysource import (
        synthetic_docs_oracle_sql,
    )

    return f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(score) AS BIGINT) AS total_score,
       CAST(min(doc_id) AS BIGINT) AS min_id,
       CAST(max(doc_id) AS BIGINT) AS max_id
FROM ({synthetic_docs_oracle_sql(5000)})
GROUP BY lang
"""


def q111_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-superset detection
    (`operators/dedup.containment_pairs`): pairs where |A∩B|/|A| >= 0.8
    — the quoted-copy-plus-boilerplate signal symmetric Jaccard misses.
    LOSSLESS containment prefix-filter blocking (rarest tokens of the
    contained side vs the full inverted index), exact verify."""
    from foresttime_builder_spark.operators.dedup import containment_pairs

    d = load_table(spark, sf_dir, "documents")
    # feasibility guard (16 B per candidate row — see q23): the
    # containment pair list is output-bound on this corpus (sf1 measured
    # 141M pairs; the unguarded sf10 run died at 138 s)
    return containment_pairs(
        d, "doc_id", "text", threshold=0.8,
        candidate_budget=derive_candidate_budget(
            spark, bytes_per_candidate=16
        ),
    )


def _containment_oracle(threshold: float = 0.8) -> str:
    return f"""
WITH docsets AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks,
         len(list_distinct(string_split(text, ' '))) AS sz
  FROM documents
),
tok AS (
  SELECT doc_id, sz, unnest(toks) AS token FROM docsets
),
dfreq AS (SELECT token, count(*) AS df FROM tok GROUP BY token),
prefix AS (
  SELECT doc_id AS contained_id, token
  FROM (
    SELECT t.doc_id, t.token, t.sz,
           row_number() OVER (
             PARTITION BY t.doc_id ORDER BY d.df, t.token
           ) AS rnk
    FROM tok t JOIN dfreq d USING (token)
  )
  WHERE rnk <= sz - ceil({threshold!r} * sz) + 1
),
cand AS (
  SELECT DISTINCT p.contained_id, i.doc_id AS container_id
  FROM prefix p JOIN tok i USING (token)
  WHERE p.contained_id != i.doc_id
)
SELECT contained_id, container_id,
       len(list_intersect(sa.toks, sb.toks)) AS n_common,
       round(len(list_intersect(sa.toks, sb.toks)) / sa.sz, 4) AS containment
FROM cand
JOIN docsets sa ON sa.doc_id = contained_id
JOIN docsets sb ON sb.doc_id = container_id
WHERE len(list_intersect(sa.toks, sb.toks)) / sa.sz >= {threshold!r}
"""


def q112_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified train/val/test split
    (`operators/sampling.stratified_split_exact`): per-language split
    counts exact to floor(n*bp/10000), rank order = the deterministic
    (salt, id) hash — vs q65's append-stable but only-in-expectation
    hash cells."""
    from foresttime_builder_spark.operators.sampling import (
        stratified_split_exact,
    )

    d = load_table(spark, sf_dir, "documents")
    return stratified_split_exact(d, "doc_id", "lang")


def _stratified_split_oracle() -> str:
    from foresttime_builder_spark.operators.sampling import (
        stratified_split_exact_oracle_sql,
    )

    return stratified_split_exact_oracle_sql("doc_id", "lang", "documents")


def q113_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (`operators/asof.interval_overlap_join`):
    per-user-day activity spans overlap-joined against daily 10:00-14:00
    maintenance windows via integer bucket explode + EQUI-join + exact
    verify — the ranges-x-ranges join made hash-partitionable."""
    from foresttime_builder_spark.operators.asof import interval_overlap_join

    e = load_table(spark, sf_dir, "events")
    # ts arrives as TIMESTAMP_NTZ, which has no direct BIGINT cast; the
    # session runs in UTC so the timestamp hop matches DuckDB's epoch()
    ep = F.col("ts").cast("timestamp").cast("long")
    spans = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.min(ep).alias("s_start"),
        (F.max(ep) + 1).alias("s_end"),
    )
    windows = (
        e.select(F.to_date("ts").alias("wday"))
        .distinct()
        .select(
            "wday",
            (F.col("wday").cast("timestamp").cast("long") + 10 * 3600).alias(
                "w_start"
            ),
            (F.col("wday").cast("timestamp").cast("long") + 14 * 3600).alias(
                "w_end"
            ),
        )
    )
    out = interval_overlap_join(
        spans, windows, "s_start", "s_end", "w_start", "w_end",
        bucket_width=6 * 3600,
    )
    return out.select(
        "user_id", "day", "wday", "s_start", "s_end", "w_start", "w_end"
    )


ORACLE_Q113 = """
WITH spans AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         min(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) AS s_start,
         max(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) + 1 AS s_end
  FROM events GROUP BY 1, 2
),
windows AS (
  SELECT wday,
         CAST(floor(epoch(CAST(wday AS TIMESTAMP))) AS BIGINT) + 10 * 3600
           AS w_start,
         CAST(floor(epoch(CAST(wday AS TIMESTAMP))) AS BIGINT) + 14 * 3600
           AS w_end
  FROM (SELECT DISTINCT CAST(ts AS DATE) AS wday FROM events)
)
SELECT user_id, day, wday, s_start, s_end, w_start, w_end
FROM spans JOIN windows
  ON s_start < w_end AND w_start < s_end
"""


def q114_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift between two order snapshots
    (1995 vs 1996 price distributions): fixed-rule price buckets, smoothed
    proportions, per-bucket PSI terms quantized to e9 BIGINTs BEFORE the
    sum (order-free) — the ML-monitoring signal for "did the input
    distribution move"."""
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("_y"),
        F.floor(F.col("o_totalprice") / 50_000).cast("long").alias("_bkt"),
    )
    counts = (
        o.filter(F.col("_y").isin(1995, 1996))
        .groupBy("_bkt")
        .agg(
            F.sum(F.when(F.col("_y") == 1995, 1).otherwise(0)).alias("_c1"),
            F.sum(F.when(F.col("_y") == 1996, 1).otherwise(0)).alias("_c2"),
        )
    )
    totals = counts.agg(
        F.sum("_c1").alias("_n1"),
        F.sum("_c2").alias("_n2"),
        F.count(F.lit(1)).alias("_B"),
    )
    p1 = (F.col("_c1") + F.lit(0.5)) / (F.col("_n1") + F.lit(0.5) * F.col("_B"))
    p2 = (F.col("_c2") + F.lit(0.5)) / (F.col("_n2") + F.lit(0.5) * F.col("_B"))
    terms = counts.crossJoin(F.broadcast(totals)).select(
        F.col("_bkt"),
        F.floor((p1 - p2) * F.log(p1 / p2) * 1e9).cast("long").alias("_t_e9"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("_t_e9").cast("long").alias("psi_e9"),
    )


ORACLE_Q114 = """
WITH o AS (
  SELECT year(o_orderdate) AS y,
         CAST(floor(o_totalprice / 50000) AS BIGINT) AS bkt
  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
),
counts AS (
  SELECT bkt,
         sum(CASE WHEN y = 1995 THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN y = 1996 THEN 1 ELSE 0 END) AS c2
  FROM o GROUP BY bkt
),
totals AS (
  SELECT sum(c1) AS n1, sum(c2) AS n2, count(*) AS B FROM counts
),
terms AS (
  SELECT CAST(floor(
           ((c1 + 0.5) / (n1 + 0.5 * B) - (c2 + 0.5) / (n2 + 0.5 * B))
           * ln(((c1 + 0.5) / (n1 + 0.5 * B)) / ((c2 + 0.5) / (n2 + 0.5 * B)))
           * 1e9) AS BIGINT) AS t_e9
  FROM counts CROSS JOIN totals
)
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(t_e9) AS BIGINT) AS psi_e9
FROM terms
"""


def q115_equidepth_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled equi-depth histogram
    (`operators/profile.equidepth_histogram_sampled`): ntile over a
    deterministic md5-hash 20% sample of (o_totalprice, o_orderkey) — the
    100 TB variant of q107 that sorts only the sample instead of every
    row; per-bucket depth error ~ n_buckets/sqrt(m)."""
    from foresttime_builder_spark.operators.profile import (
        equidepth_histogram_sampled,
    )

    o = load_table(spark, sf_dir, "orders")
    return equidepth_histogram_sampled(
        o, "o_totalprice", "o_orderkey", n_buckets=12, scale=100,
        fraction=0.2,
    )


def _equidepth_sampled_oracle() -> str:
    from foresttime_builder_spark.operators.profile import (
        equidepth_histogram_sampled_oracle_sql,
    )

    return equidepth_histogram_sampled_oracle_sql(
        "o_totalprice", "o_orderkey", "orders", n_buckets=12, scale=100,
        fraction=0.2,
    )


def q116_fuzzy_join_d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-match at edit distance <= 2 — q71's deeper variant via
    COMPOSED deletion neighborhoods (explode the 1-deletion step twice;
    FastSS: depth-2 neighborhoods intersect iff distance <= 2), with the
    max_key_len probe guarding the O(L^2) explode.  Oracle = quadratic
    levenshtein cross join."""
    from foresttime_builder_spark.operators.dedup import edit_distance_pairs

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", F.substring("text", 1, 12).alias("title"))
    )
    return edit_distance_pairs(d, "doc_id", "title", max_dist=2)


ORACLE_Q116 = """
WITH t AS (
  SELECT doc_id, substr(text, 1, 12) AS title
  FROM documents WHERE doc_id % 2 = 0
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(a.title, b.title) AS dist
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE levenshtein(a.title, b.title) <= 2
"""


def q117_group_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary-size KMV sketch
    (`operators/sketch.kmv_distinct_by`): estimate each source's distinct
    whitespace-token count from its 64 minimum md5 hashes — the mergeable
    per-group cardinality profile `vocabulary_overlap` recommends past a
    few thousand groups, with the exact count alongside so the sketch's
    error is part of the gated output."""
    from foresttime_builder_spark.operators.sketch import kmv_distinct_by

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.split(F.coalesce(F.col("text"), F.lit("")), " ")
        ).alias("tok"),
    )
    out = kmv_distinct_by(toks, "source", "tok", k=64, with_exact=True)
    # carry_cache: the operator persists its distinct hash relation across
    # three plan branches; ownership must follow the frame we return
    return carry_cache(
        out.select(
            "source",
            F.floor(F.col("est_distinct") * 10000 + F.lit(0.5))
            .cast("long")
            .alias("est_distinct_e4"),
            F.col("n_exact").cast("long").alias("n_exact"),
        ),
        out,
    )


def _group_kmv_oracle() -> str:
    from foresttime_builder_spark.operators.sketch import kmv_by_oracle_sql

    inner = (
        "(SELECT source, unnest(string_split(coalesce(text, ''), ' ')) "
        "AS tok FROM documents)"
    )
    return (
        "SELECT source, CAST(floor(est_distinct * 10000 + 0.5) AS BIGINT)"
        " AS est_distinct_e4, CAST(n_exact AS BIGINT) AS n_exact FROM ("
        + kmv_by_oracle_sql(inner, "source", "tok", k=64, with_exact=True)
        + ") z"
    )


def q118_group_kmv_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate-ONLY per-group KMV (`operators/sketch.kmv_distinct_by`
    with ``with_exact=False``) — the 100 TB form the operator's docstring
    promises: per-language distinct-token cardinality where the rank
    window sees only ~``oversample*k`` pre-cut hashes per group instead
    of each group's full distinct hash space.  The DuckDB twin ranks the
    FULL space, so the hash gate proves the pre-cut is lossless."""
    from foresttime_builder_spark.operators.sketch import kmv_distinct_by

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(
            F.split(F.coalesce(F.col("text"), F.lit("")), " ")
        ).alias("tok"),
    )
    out = kmv_distinct_by(toks, "lang", "tok", k=64, with_exact=False)
    return carry_cache(
        out.select(
            "lang",
            F.floor(F.col("est_distinct") * 10000 + F.lit(0.5))
            .cast("long")
            .alias("est_distinct_e4"),
        ),
        out,
    )


def _group_kmv_estimate_oracle() -> str:
    from foresttime_builder_spark.operators.sketch import kmv_by_oracle_sql

    inner = (
        "(SELECT lang, unnest(string_split(coalesce(text, ''), ' ')) "
        "AS tok FROM documents)"
    )
    return (
        "SELECT lang, CAST(floor(est_distinct * 10000 + 0.5) AS BIGINT)"
        " AS est_distinct_e4 FROM ("
        + kmv_by_oracle_sql(inner, "lang", "tok", k=64, with_exact=False)
        + ") z"
    )


def q119_lsh_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-stream LSH clustering (`operators/dedup.lsh_representatives`)
    — the measured escape hatch the q23 feasibility raise points at: one
    ``(doc_id, rep_id, cluster_size)`` row per document via bucket-star
    edges (≤ n_docs × n_bands, REGARDLESS of similarity density), exact
    verification of each star edge, and O(log n) star CC.  Same banding
    parameters as q23, so this is exactly q23's workload answered with a
    linear plan — it must complete at the sf10 density where q23's pair
    enumeration correctly raises."""
    from foresttime_builder_spark.operators.dedup import lsh_representatives

    d = load_table(spark, sf_dir, "documents")
    return lsh_representatives(
        d, "doc_id", "text", n_hashes=_MH_N, band_size=_MH_BAND,
        threshold=0.5, verify="auto",
    )


def _lsh_representatives_oracle(
    n_hashes: int = _MH_N,
    band_size: int = _MH_BAND,
    threshold: float = 0.5,
    rounds: int | None = None,
) -> str:
    """DuckDB twin of :func:`q119_lsh_representatives`: identical minhash/
    banding construction as the q23 oracle, bucket-min star edges via a
    window (min ignores NULL ids; ``<>`` drops NULL-id rows — matching the
    Spark operator's NULL contract), exact-jaccard edge verification, then
    min-label layers with POINTER JUMPING: each round propagates neighbor
    minima AND shortcuts ``lab := min(lab, lab[lab])``, so ``rounds``
    layers cover component diameter ~2^rounds — unconditionally exact for
    any gate corpus, unlike q50's plain unroll (whose Spark twin raises at
    the same fixed bound, keeping parity; the q119 Spark side runs the
    certified star CC with a DIFFERENT bound, so a fixed-depth oracle
    here could silently desync on a deep hub-chain graph — r12 review
    finding).  The shortcut join is sound because a label is always the
    id of a node in the same component (init lab=id; propagate and
    shortcut both take minima over same-component node ids)."""
    if rounds is None:
        from foresttime_builder_spark.operators.graph import MAX_ITER_DEFAULT

        rounds = MAX_ITER_DEFAULT
    mins = ",\n         ".join(
        f"min({_HASH60_SQL.format(x=repr(str(i) + '|') + ' || token')}) AS mh_{i:02d}"
        for i in range(n_hashes)
    )
    n_bands = n_hashes // band_size
    bands = ",\n         ".join(
        "md5(concat_ws('|', '{b}', {cols})) AS band_{b}".format(
            b=b,
            cols=", ".join(
                f"CAST(mh_{b * band_size + j:02d} AS VARCHAR)"
                for j in range(band_size)
            ),
        )
        for b in range(n_bands)
    )
    band_list = ", ".join(f"band_{b}" for b in range(n_bands))
    layers = []
    for i in range(rounds):
        layers.append(
            f"lab{i + 1}p AS MATERIALIZED ("
            f"  SELECT n.id, least(n.lab, coalesce(m.minlab, n.lab)) AS lab"
            f"  FROM lab{i} n LEFT JOIN ("
            f"    SELECT s.b AS id, min(l.lab) AS minlab"
            f"    FROM sym s JOIN lab{i} l ON l.id = s.a GROUP BY s.b"
            f"  ) m ON n.id = m.id),\n"
            f"lab{i + 1} AS MATERIALIZED ("
            f"  SELECT n.id, least(n.lab, l2.lab) AS lab"
            f"  FROM lab{i + 1}p n JOIN lab{i + 1}p l2 ON n.lab = l2.id)"
        )
    chain = ",\n".join(layers)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents
),
sigs AS (
  SELECT doc_id,
         {mins}
  FROM tok GROUP BY doc_id
),
banded AS (
  SELECT doc_id,
         {bands}
  FROM sigs
),
stacked AS (
  SELECT doc_id, unnest([{band_list}]) AS band_key FROM banded
),
edges AS (
  SELECT DISTINCT hub AS doc_a, doc_id AS doc_b FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY band_key) AS hub
    FROM stacked
  ) s WHERE doc_id <> hub
),
docsets AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks,
         len(list_distinct(string_split(text, ' '))) AS sz
  FROM documents
),
ver AS MATERIALIZED (
  SELECT doc_a, doc_b
  FROM edges
  JOIN docsets sa ON sa.doc_id = doc_a
  JOIN docsets sb ON sb.doc_id = doc_b
  WHERE round(len(list_intersect(sa.toks, sb.toks))
              / (sa.sz + sb.sz - len(list_intersect(sa.toks, sb.toks))), 4)
        >= {threshold}
),
eedges AS (
  -- exact-duplicate star tier (jaccard 1.0 by construction, no verify):
  -- identical texts must co-cluster even when a dissimilar lower-id doc
  -- holds every shared bucket's hub role
  SELECT hub AS doc_a, doc_id AS doc_b FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS hub
    FROM documents WHERE text IS NOT NULL
  ) e WHERE doc_id <> hub
),
sym AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM ver
  UNION SELECT doc_b, doc_a FROM ver
  UNION SELECT doc_a, doc_b FROM eedges
  UNION SELECT doc_b, doc_a FROM eedges
),
lab0 AS MATERIALIZED (
  SELECT id, id AS lab FROM (SELECT DISTINCT a AS id FROM sym)
),
{chain},
comp AS (SELECT id, lab FROM lab{rounds}),
assigned AS (
  SELECT d.doc_id, coalesce(c.lab, d.doc_id) AS rep_id
  FROM (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL) d
  LEFT JOIN comp c ON c.id = d.doc_id
)
SELECT doc_id, rep_id,
       count(*) OVER (PARTITION BY rep_id) AS cluster_size
FROM assigned
"""


def q120_cluster_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clustering degrade LADDER end-to-end (`operators/graph.
    cluster_near_dups(on_budget='representatives')`) with a forcing
    budget, so the gate certifies the final rung: exact prefix-join
    infeasible → banded LSH degrade infeasible → linear bucket-star
    representatives, adapted to the cluster_near_dups contract (same
    columns, singletons excluded).  The DuckDB twin replays the q119
    construction filtered to non-singletons — the adapter (rename +
    filter) is exactly what this gate pins."""
    from foresttime_builder_spark.operators.graph import cluster_near_dups

    d = load_table(spark, sf_dir, "documents")
    # candidate_budget=1 forces both upper rungs infeasible at any SF;
    # degrade_budget=1 keeps the LSH rung's forwarded budget forcing too.
    # strategy is PINNED to 'prefix' because the candidate-budget guard
    # applies to the prefix/naive join strategies only — 'auto' resolves
    # to the mask family at gate vocabularies and runs the exact path,
    # never reaching the ladder (found while gating this query: the
    # 'forced' run silently produced the exact clustering instead)
    return cluster_near_dups(
        d, "doc_id", "text", threshold=0.5, strategy="prefix",
        candidate_budget=1, on_budget="representatives", degrade_budget=1,
    )


def _cluster_ladder_oracle() -> str:
    return (
        "SELECT doc_id, rep_id AS cluster_id, cluster_size FROM ("
        + _lsh_representatives_oracle(threshold=0.5)
        + ") z WHERE cluster_size > 1"
    )


QUERIES: dict[str, QuerySpec] = {
    "q01_pricing_summary": QuerySpec(q01_pricing_summary, ORACLE_Q01),
    "q02_region_revenue": QuerySpec(q02_region_revenue, ORACLE_Q02),
    "q03_customer_order_counts": QuerySpec(q03_customer_order_counts, ORACLE_Q03),
    "q04_snapshot_full_outer": QuerySpec(q04_snapshot_full_outer, ORACLE_Q04),
    "q05_range_band_join": QuerySpec(q05_range_band_join, ORACLE_Q05),
    "q06_asof_last_click": QuerySpec(q06_asof_last_click, ORACLE_Q06),
    "q07_expand_grid": QuerySpec(q07_expand_grid, ORACLE_Q07),
    "q08_linear_interp": QuerySpec(q08_linear_interp, ORACLE_Q08),
    "q09_step_interp": QuerySpec(q09_step_interp, ORACLE_Q09),
    "q10_fill_downup": QuerySpec(q10_fill_downup, ORACLE_Q10),
    "q11_first_flag_year": QuerySpec(q11_first_flag_year, ORACLE_Q11),
    "q12_dedup_exact": QuerySpec(q12_dedup_exact, ORACLE_Q12),
    "q13_text_quality": QuerySpec(q13_text_quality, ORACLE_Q13),
    "q14_token_df": QuerySpec(q14_token_df, ORACLE_Q14),
    "q15_doc_fingerprint": QuerySpec(q15_doc_fingerprint, ORACLE_Q15),
    "q16_jaccard_pairs": QuerySpec(q16_jaccard_pairs, ORACLE_Q16),
    "q17_cosine_topk": QuerySpec(q17_cosine_topk, ORACLE_Q17),
    "q18_grouping_sets": QuerySpec(q18_grouping_sets, ORACLE_Q18),
    "q19_manual_pivot": QuerySpec(q19_manual_pivot, ORACLE_Q19),
    "q20_yearly_ratio": QuerySpec(q20_yearly_ratio, ORACLE_Q20),
    "q21_monthly_lag": QuerySpec(q21_monthly_lag, ORACLE_Q21),
    "q22_expns_per_year": QuerySpec(q22_expns_per_year, ORACLE_Q22),
    "q23_minhash_lsh": QuerySpec(q23_minhash_lsh, _minhash_lsh_oracle()),
    "q24_simhash": QuerySpec(q24_simhash, _simhash_oracle()),
    "q25_fia_annualize": QuerySpec(q25_fia_annualize, _annualize_oracle()),
    "q26_nsvb_carbon": QuerySpec(q26_nsvb_carbon, _carbon_oracle()),
    "q27_population_scaling": QuerySpec(q27_population_scaling, _pop_oracle()),
    "q28_grain_sweep": QuerySpec(q28_grain_sweep, _grain_oracle()),
    "q29_stream_rollup": QuerySpec(
        _stream("q29_stream_rollup"), _stream_oracle("ORACLE_STREAM_ROLLUP")
    ),
    "q30_stream_sessions": QuerySpec(
        _stream("q30_stream_sessions"), _stream_oracle("ORACLE_STREAM_SESSIONS")
    ),
    "q31_stream_stateful": QuerySpec(
        _stream("q31_stream_stateful"), _stream_oracle("ORACLE_STREAM_STATEFUL")
    ),
    "q32_language_id": QuerySpec(
        q32_language_id, _text_oracle("language_id_oracle_sql")
    ),
    "q33_bpe_tokens": QuerySpec(
        q33_bpe_tokens, _text_oracle("token_count_bpe_oracle_sql")
    ),
    "q34_winnow_fingerprint": QuerySpec(
        q34_winnow_fingerprint, _text_oracle("winnow_fingerprint_oracle_sql")
    ),
    "q35_multimodal_features": QuerySpec(q35_multimodal_features, ORACLE_Q35),
    "q36_frame_sample": QuerySpec(q36_frame_sample, ORACLE_Q36),
    "q37_ann_lsh": QuerySpec(q37_ann_lsh, _ann_oracle()),
    "q38_sapling_transitions": QuerySpec(q38_sapling_transitions, _sapling_oracle()),
    "q39_id_roundtrip": QuerySpec(q39_id_roundtrip, ORACLE_Q39),
    "q40_embed_neardup": QuerySpec(q40_embed_neardup, _neardup_oracle()),
    "q41_sql_over_views": QuerySpec(q41_sql_over_views, ORACLE_Q41),
    "q42_ann_ivf": QuerySpec(q42_ann_ivf, _ivf_oracle()),
    "q43_bucketed_join": QuerySpec(q43_bucketed_join, ORACLE_Q43),
    "q44_salted_skew_agg": QuerySpec(q44_salted_skew_agg, ORACLE_Q44),
    "q45_salted_join": QuerySpec(q45_salted_join, ORACLE_Q45),
    "q46_kmv_sketch": QuerySpec(q46_kmv_sketch, _kmv_oracle()),
    "q47_asof_join": QuerySpec(q47_asof_join, ORACLE_Q47),
    "q48_group_percentiles": QuerySpec(q48_group_percentiles, ORACLE_Q48),
    "q49_merge_latest": QuerySpec(q49_merge_latest, ORACLE_Q49),
    "q50_dup_clusters": QuerySpec(q50_dup_clusters, _dup_clusters_oracle()),
    "q51_state_pipeline": QuerySpec(q51_state_pipeline, _state_pipeline_oracle()),
    "q52_population_stratified": QuerySpec(
        q52_population_stratified, _pop_stratified_oracle()
    ),
    "q53_stream_attribution": QuerySpec(
        _stream("q53_stream_attribution"),
        _stream_oracle("ORACLE_STREAM_ATTRIBUTION"),
    ),
    "q54_ngram_jaccard": QuerySpec(q54_ngram_jaccard, ORACLE_Q54),
    "q55_image_meta": QuerySpec(q55_image_meta, ORACLE_Q55),
    "q56_sequence_packing": QuerySpec(q56_sequence_packing, ORACLE_Q56),
    "q57_source_mixing": QuerySpec(q57_source_mixing, ORACLE_Q57),
    "q58_decontamination": QuerySpec(q58_decontamination, ORACLE_Q58),
    "q59_repetition_quality": QuerySpec(
        q59_repetition_quality, _text_oracle("repetition_quality_oracle_sql")
    ),
    "q60_pii_scrub": QuerySpec(q60_pii_scrub, _pii_oracle()),
    "q61_domain_quota": QuerySpec(q61_domain_quota, _domain_quota_oracle()),
    "q62_semijoin_reduction": QuerySpec(q62_semijoin_reduction, ORACLE_Q62),
    "q63_dup_spans": QuerySpec(q63_dup_spans, _dup_spans_oracle()),
    "q64_top_ngrams": QuerySpec(q64_top_ngrams, _top_ngrams_oracle()),
    "q65_split_assign": QuerySpec(q65_split_assign, _split_assign_oracle()),
    "q66_jsonl_roundtrip": QuerySpec(q66_jsonl_roundtrip, ORACLE_Q66),
    "q67_cohort_retention": QuerySpec(q67_cohort_retention, ORACLE_Q67),
    "q68_batch_sessions": QuerySpec(q68_batch_sessions, ORACLE_Q68),
    "q69_event_funnel": QuerySpec(q69_event_funnel, ORACLE_Q69),
    "q70_partitioned_sink": QuerySpec(q70_partitioned_sink, ORACLE_Q70),
    "q71_fuzzy_join": QuerySpec(q71_fuzzy_join, ORACLE_Q71),
    "q72_novelty_check": QuerySpec(q72_novelty_check, ORACLE_Q72),
    "q73_rolling_revenue": QuerySpec(q73_rolling_revenue, ORACLE_Q73),
    "q74_temperature_mix": QuerySpec(q74_temperature_mix, ORACLE_Q74),
    "q75_zorder_key": QuerySpec(q75_zorder_key, _zorder_oracle()),
    "q76_jaccard_budget_guard": QuerySpec(
        q76_jaccard_budget_guard,
        _minhash_lsh_oracle(n_hashes=16, band_size=4, threshold=0.8),
    ),
    "q77_dedup_keep_best": QuerySpec(
        q77_dedup_keep_best, _dedup_keep_best_oracle()
    ),
    "q78_length_bucket_batches": QuerySpec(
        q78_length_bucket_batches, _length_bucket_oracle()
    ),
    "q79_snapshot_diff": QuerySpec(q79_snapshot_diff, _snapshot_diff_oracle()),
    "q80_chunk_tokens": QuerySpec(q80_chunk_tokens, _chunk_tokens_oracle()),
    "q81_corpus_profile": QuerySpec(q81_corpus_profile, _corpus_profile_oracle()),
    "q82_bm25_scores": QuerySpec(q82_bm25_scores, _bm25_oracle()),
    "q83_quota_prefilter": QuerySpec(q83_quota_prefilter, ORACLE_Q57),
    "q84_epoch_upsample": QuerySpec(q84_epoch_upsample, _epoch_upsample_oracle()),
    "q85_quality_gate": QuerySpec(q85_quality_gate, _quality_gate_oracle()),
    "q86_lm_score": QuerySpec(q86_lm_score, _lm_score_oracle()),
    "q87_semantic_dedup": QuerySpec(q87_semantic_dedup, _semantic_dedup_oracle()),
    "q88_dsir_weights": QuerySpec(q88_dsir_weights, _dsir_oracle()),
    "q89_inverted_index": QuerySpec(q89_inverted_index, _inverted_index_oracle()),
    "q90_incremental_dedup": QuerySpec(
        q90_incremental_dedup, _incremental_dedup_oracle()
    ),
    "q91_vocab_overlap": QuerySpec(q91_vocab_overlap, _vocab_overlap_oracle()),
    "q92_scd2_build": QuerySpec(q92_scd2_build, _scd2_oracle()),
    "q93_incremental_agg": QuerySpec(
        q93_incremental_agg, _incremental_agg_oracle()
    ),
    "q94_tfidf_signatures": QuerySpec(
        q94_tfidf_signatures, _tfidf_signatures_oracle()
    ),
    "q95_random_projection": QuerySpec(
        q95_random_projection, _random_projection_oracle()
    ),
    "q96_stream_dedup": QuerySpec(
        _stream("q96_stream_dedup"), _stream_oracle("ORACLE_STREAM_DEDUP")
    ),
    "q97_json_extract": QuerySpec(q97_json_extract, ORACLE_Q97),
    "q98_numeric_histogram": QuerySpec(
        q98_numeric_histogram, _numeric_histogram_oracle()
    ),
    "q99_score_calibration": QuerySpec(
        q99_score_calibration, _score_calibration_oracle()
    ),
    "q100_pipeline_e2e": QuerySpec(q100_pipeline_e2e, _pipeline_e2e_oracle()),
    "q101_ann_recall": QuerySpec(q101_ann_recall, _ann_recall_oracle()),
    "q102_weighted_sample": QuerySpec(
        q102_weighted_sample, _weighted_sample_oracle()
    ),
    "q103_cumulative_distinct": QuerySpec(q103_cumulative_distinct, ORACLE_Q103),
    "q104_anomaly_zscore": QuerySpec(q104_anomaly_zscore, ORACLE_Q104),
    "q105_winsorized_stats": QuerySpec(q105_winsorized_stats, ORACLE_Q105),
    "q106_schema_evolution": QuerySpec(q106_schema_evolution, ORACLE_Q106),
    "q107_equidepth_histogram": QuerySpec(
        q107_equidepth_histogram, _equidepth_oracle()
    ),
    "q108_stream_outer_join": QuerySpec(
        _stream("q108_stream_outer_join"),
        _stream_oracle("ORACLE_STREAM_OUTER_JOIN"),
    ),
    "q109_unpivot_roundtrip": QuerySpec(q109_unpivot_roundtrip, ORACLE_Q109),
    "q110_python_datasource": QuerySpec(
        q110_python_datasource, _python_datasource_oracle()
    ),
    "q111_containment_pairs": QuerySpec(
        q111_containment_pairs, _containment_oracle()
    ),
    "q112_stratified_split": QuerySpec(
        q112_stratified_split, _stratified_split_oracle()
    ),
    "q113_interval_overlap": QuerySpec(q113_interval_overlap, ORACLE_Q113),
    "q114_distribution_drift": QuerySpec(
        q114_distribution_drift, ORACLE_Q114
    ),
    "q115_equidepth_sampled": QuerySpec(
        q115_equidepth_sampled, _equidepth_sampled_oracle()
    ),
    "q116_fuzzy_join_d2": QuerySpec(q116_fuzzy_join_d2, ORACLE_Q116),
    "q117_group_kmv": QuerySpec(q117_group_kmv, _group_kmv_oracle()),
    "q118_group_kmv_estimate": QuerySpec(
        q118_group_kmv_estimate, _group_kmv_estimate_oracle()
    ),
    "q119_lsh_representatives": QuerySpec(
        q119_lsh_representatives, _lsh_representatives_oracle()
    ),
    "q120_cluster_ladder": QuerySpec(q120_cluster_ladder, _cluster_ladder_oracle()),
}
