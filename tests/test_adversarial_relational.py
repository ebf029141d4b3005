"""CI pins for the round-8 RELATIONAL shape-fuzz findings.

tools/make_adversarial_sf.py (second extension) appends the
dirty-warehouse shapes the synthetic generator never emits — NULL and
dangling join keys, NULL group/order keys, NULL event time, NaN/±Inf
measures, zero/negative money, duplicate PKs, malformed JSON props —
and the full-registry sweep over that corpus found six cross-engine
divergence classes (BASELINE.md §5d, second wave). One representative
query per class runs here end-to-end against its DuckDB oracle on the
crafted corpus, so none of the classes can silently regress:

- events ingestion rule (io.EVENTS_INGEST_RULE): one +Inf value row
  used to kill every cents-ified events aggregate with
  ARITHMETIC_OVERFLOW under ANSI mode → events_hypertable_rollup;
- NULL-key universe/join-loss: distinct() vs count(DISTINCT) NULL
  semantics emptied the relational division; NULL-key rows silently
  fell out of equi-join pipelines → rel_division_priorities,
  customers_rfm_segments, basket_part_affinity;
- NULL window-order keys: Spark ASC = NULLS FIRST vs DuckDB = NULLS
  LAST → window_moving_avg;
- NULL-total partition predicates: date<c / date>=c both drop a NULL
  date, silently leaking rows from incremental rollup maintenance →
  agg_incremental_daily;
- time-series domain: NULL dates / NULL types have no slot in a
  monthly series or gap-fill spine → orders_yoy_growth,
  events_gapfill_hourly;
- math/JSON domains: sqrt(<0) and ln(<=0) throw on DuckDB but yield
  NaN on Spark; malformed JSON throws on DuckDB but yields NULL on
  Spark → scalar_string_math, udaf_geomean_price, json_extract_events.
"""

from __future__ import annotations

import importlib
import os

import duckdb
import pytest

from tests.test_oracle_parity import canonicalize

PINNED = (
    "events_hypertable_rollup",
    "rel_division_priorities",
    "customers_rfm_segments",
    "basket_part_affinity",
    "window_moving_avg",
    "agg_incremental_daily",
    "orders_yoy_growth",
    "events_gapfill_hourly",
    "scalar_string_math",
    "udaf_geomean_price",
    "json_extract_events",
)


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("adversarial_sf")
    os.environ["ADV_OUT"] = str(out)
    try:
        import tools.make_adversarial_sf as adv

        importlib.reload(adv)  # pick up ADV_OUT
        adv.main()
    finally:
        os.environ.pop("ADV_OUT", None)
    return str(out)


def test_relational_fuzz_classes_match_oracle(spark, adversarial_dir):
    import __spark_entry__ as entry_mod
    from dbscan_spark.io import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{adversarial_dir}/{t}.parquet'"
        )
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    for name in PINNED:
        got = canonicalize(qs[name](spark, adversarial_dir).toPandas())
        want = canonicalize(con.sql(oracles[name]).df())
        assert got == want, f"{name} diverges on the adversarial corpus"


def test_skyline_orders_matches_quadratic_not_exists(spark, tmp_path):
    """skyline_orders' calendar-bounded decomposition must equal the
    literal quadratic NOT-EXISTS dominance definition, including
    both-dims-tied rows (neither dominates -> both kept) and NULL
    exclusion."""
    import duckdb
    import pandas as pd

    from dbscan_spark.operators.relational import skyline_orders

    rows = [
        (0, "1995-01-01", 100.0),
        (1, "1995-01-01", 100.0),   # exact tie of 0 -> both kept
        (2, "1995-01-02", 100.0),   # dominates 0/1 (later, equal price)
        (3, "1995-01-02", 50.0),    # dominated by 2 (same date, less)
        (4, "1995-01-03", 99.0),    # skyline (latest, lower price ok)
        (5, None, 999.0),           # NULL date excluded
        (6, "1995-01-04", None),    # NULL price excluded
    ]
    pd.DataFrame(
        {
            "o_orderkey": [r[0] for r in rows],
            "o_custkey": [1] * len(rows),
            "o_orderstatus": ["O"] * len(rows),
            "o_totalprice": [r[2] for r in rows],
            "o_orderdate": pd.to_datetime([r[1] for r in rows]).date,
            "o_orderpriority": ["1-URGENT"] * len(rows),
        }
    ).to_parquet(tmp_path / "orders.parquet", index=False)
    got = sorted(
        r["o_orderkey"]
        for r in skyline_orders(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS FROM '{tmp_path}/orders.parquet'")
    want = sorted(
        r[0]
        for r in con.sql(
            """
            WITH dd AS (SELECT * FROM orders
                        WHERE o_orderdate IS NOT NULL
                          AND o_totalprice IS NOT NULL)
            SELECT o_orderkey FROM dd a WHERE NOT EXISTS (
              SELECT 1 FROM dd b
              WHERE b.o_orderdate >= a.o_orderdate
                AND b.o_totalprice >= a.o_totalprice
                AND (b.o_orderdate > a.o_orderdate
                     OR b.o_totalprice > a.o_totalprice))
            """
        ).fetchall()
    )
    assert got == want == [2, 4]
