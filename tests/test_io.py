"""Sources and sinks: reference-format CSV round-trip (reference O1/O2 —
textFile + split(',') in, "$x,$y,$cluster" lines out, README.md:73-85) and
the parquet sink with hive-style partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbscan_spark.io import (
    EVENTS_CSV_SCHEMA,
    EVENTS_JSON_SCHEMA,
    events_csv_dir,
    events_json_dir,
    load_table,
    read_events_csv,
    read_events_json,
    read_points_csv,
    write_clustered_csv,
    write_parquet,
)
from tests.conftest import SF_TINY


def test_csv_roundtrip_reference_format(spark, tmp_path):
    pts = spark.createDataFrame(
        [(1.5, -2.25, 3), (0.0, 4.5, 0)], "x double, y double, cluster long"
    )
    out = str(tmp_path / "clustered")
    write_clustered_csv(pts, out)
    back = read_points_csv(spark, out)
    rows = {(r["x"], r["y"]): r["expected"] for r in back.collect()}
    assert rows == {(1.5, -2.25): 3.0, (0.0, 4.5): 0.0}


def test_read_points_csv_two_column(spark, tmp_path):
    """The label column is optional, as in the reference's usage input."""
    p = tmp_path / "pts.csv"
    p.write_text("1.0,2.0\n-3.5,0.25\n")
    rows = read_points_csv(spark, str(p)).collect()
    assert {(r["x"], r["y"]) for r in rows} == {(1.0, 2.0), (-3.5, 0.25)}
    assert all(r["expected"] is None for r in rows)


def test_json_source_mirrors_parquet_values(spark):
    """The JSON-lines source must reproduce the parquet table's values
    exactly (longs, doubles, strings) under its explicit schema."""
    path = events_json_dir(spark, SF_TINY)
    back = read_events_json(spark, path)
    assert back.schema == EVENTS_JSON_SCHEMA
    want = (
        load_table(spark, SF_TINY, "events")
        .select("event_id", "user_id", "event_type", "value", "props")
    )
    assert back.count() == want.count()
    # exact value round-trip: anti-join both ways is empty
    assert back.exceptAll(want).count() == 0
    assert want.exceptAll(back).count() == 0


def test_csv_source_mirrors_parquet_values(spark):
    """The headered-CSV source must reproduce the parquet values exactly
    under its explicit schema (longs, doubles, strings)."""
    path = events_csv_dir(spark, SF_TINY)
    back = read_events_csv(spark, path)
    assert back.schema == EVENTS_CSV_SCHEMA
    want = load_table(spark, SF_TINY, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    assert back.count() == want.count()
    assert back.exceptAll(want).count() == 0
    assert want.exceptAll(back).count() == 0


def test_parquet_sink_partitioned_scan_prunes(spark, tmp_path):
    """Hive-partitioned sink: reading back with a partition predicate must
    prune to one partition directory."""
    out = str(tmp_path / "by_flag")
    lineitem = load_table(spark, SF_TINY, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    write_parquet(lineitem, out, partition_by=["l_returnflag"])
    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    want = lineitem.filter(F.col("l_returnflag") == "R").count()
    assert back.count() == want
    plan = spark._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC source/sink: values round-trip exactly, and the ORC scan takes
    predicate pushdown + column pruning like parquet."""
    from dbscan_spark.io import read_orc, write_orc

    out = str(tmp_path / "orders_orc")
    orders = load_table(spark, SF_TINY, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    write_orc(orders, out)
    back = read_orc(spark, out)
    assert back.count() == orders.count()
    want = {
        (r.o_orderkey, round(r.o_totalprice, 2))
        for r in orders.filter(F.col("o_totalprice") > 400000).collect()
    }
    got_df = back.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey", "o_totalprice"
    )
    got = {(r.o_orderkey, round(r.o_totalprice, 2)) for r in got_df.collect()}
    assert got == want
    plan = spark._jvm.PythonSQLUtils.explainString(
        got_df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [" in plan and "GreaterThan" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "o_orderpriority" not in read_schema[0]


def test_compact_parquet_dir_merges_small_files(spark, tmp_path):
    """20 tiny files must compact into the byte-sized file count (here 1)
    with exact row parity, into a fresh directory."""
    import glob
    import os

    from dbscan_spark.io import compact_parquet_dir

    src = str(tmp_path / "frag")
    for i in range(20):
        spark.range(i * 10, (i + 1) * 10).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
    n_in = len(glob.glob(os.path.join(src, "*.parquet")))
    assert n_in >= 20, n_in

    dst = str(tmp_path / "compact")
    n_out = compact_parquet_dir(spark, src, dst, target_file_bytes=10**9)
    assert n_out == 1
    files = glob.glob(os.path.join(dst, "*.parquet"))
    assert len(files) == 1, files
    got = sorted(r["id"] for r in spark.read.parquet(dst).collect())
    assert got == list(range(200))


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """The z-ordered layout must give each file a tight 2-D bounding box
    (parquet footer min/max on BOTH columns), unlike a round-robin
    layout where every file spans the whole domain — that tightness is
    what lets a predicate on either column prune files."""
    import glob

    import pyarrow.parquet as pq

    from dbscan_spark.io import load_table, write_zorder_parquet

    li = load_table(spark, SF_TINY, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    zdir = str(tmp_path / "zorder")
    rdir = str(tmp_path / "roundrobin")
    write_zorder_parquet(li, "l_partkey", "l_suppkey", zdir, n_files=8)
    li.repartition(8).write.mode("overwrite").parquet(rdir)

    def mean_bbox_area(d):
        areas, n = [], 0
        for p in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(p).metadata
            lo = {c: None for c in ("l_partkey", "l_suppkey")}
            hi = {c: None for c in ("l_partkey", "l_suppkey")}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in lo and col.statistics is not None:
                        s = col.statistics
                        lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                        hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
            areas.append(
                (hi["l_partkey"] - lo["l_partkey"] + 1)
                * (hi["l_suppkey"] - lo["l_suppkey"] + 1)
            )
            n += 1
        assert n == 8, f"{d}: {n} files"
        return sum(areas) / n

    z_area, rr_area = mean_bbox_area(zdir), mean_bbox_area(rdir)
    # every round-robin file spans ~the full domain; z-order files must
    # average well under half of it
    assert z_area < 0.5 * rr_area, (z_area, rr_area)

    # file pruning: a narrow l_partkey range must intersect strictly
    # fewer z-files than round-robin files (which all intersect)
    def files_hit(d, lo_q, hi_q):
        hit = 0
        for p in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(p).metadata
            fmin, fmax = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == "l_partkey" and col.statistics:
                        s = col.statistics
                        fmin = s.min if fmin is None else min(fmin, s.min)
                        fmax = s.max if fmax is None else max(fmax, s.max)
            if fmin is not None and not (hi_q < fmin or lo_q > fmax):
                hit += 1
        return hit

    assert files_hit(zdir, 1, 20) < files_hit(rdir, 1, 20)


def test_python_datasource_partition_parallelism(spark):
    """The custom Python DataSource must expose its n_partitions option
    as actual scan partitions (generation parallelism == partition
    count) and generate exactly n_rows deterministic rows."""
    from dbscan_spark import datasource

    datasource.register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 1000)
        .option("n_partitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == 1000
    assert len({r["event_id"] for r in rows}) == 1000
    r7 = next(r for r in rows if r["event_id"] == 7)
    assert r7["user_id"] == (7 * 2654435761) % 997
    assert r7["event_type"] == "purchase"  # EVENT_TYPES[7 % 5]
    assert r7["value"] == ((7 * 1103515245 + 12345) % 10000) / 100.0


def test_load_embeddings_excludes_ragged(spark, tmp_path):
    """The audited wrong-dimension ingestion rule (round-9 ragged-vector
    fuzz): the modal vector length defines "well-formed", ties break to
    the larger dimension, and malformed rows never reach a consumer —
    so a v[dim-1] projection cannot throw INVALID_ARRAY_INDEX and a
    numpy stack cannot crash on one truncated row."""
    import numpy as np
    import pandas as pd

    from dbscan_spark.io import embeddings_modal_dim, load_embeddings

    vecs = [[float(i)] * 4 for i in range(6)] + [[9.0, 9.0]]
    pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [np.array(v, dtype=np.float32) for v in vecs],
            "label": [0] * len(vecs),
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)
    assert embeddings_modal_dim(spark, str(tmp_path)) == 4
    rows = load_embeddings(spark, str(tmp_path)).collect()
    assert sorted(r["vec_id"] for r in rows) == [0, 1, 2, 3, 4, 5]
    # the excluded row is exactly the ragged one; surviving rows are
    # safely indexable at the full dimension
    got = (
        load_embeddings(spark, str(tmp_path))
        .select(F.col("embedding")[3].alias("last"))
        .collect()
    )
    assert len(got) == 6


def test_embeddings_modal_dim_tie_breaks_larger(spark, tmp_path):
    """A 50/50 dimension split resolves to the LARGER dimension — the
    deterministic tie rule shared with the DuckDB twin
    (io.EMB_CLEAN_SQL: ORDER BY count(*) DESC, d DESC)."""
    import numpy as np
    import pandas as pd

    from dbscan_spark.io import embeddings_modal_dim

    vecs = [[1.0] * 2, [2.0] * 2, [3.0] * 8, [4.0] * 8]
    pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "embedding": [np.array(v, dtype=np.float32) for v in vecs],
            "label": [0] * len(vecs),
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)
    assert embeddings_modal_dim(spark, str(tmp_path)) == 8


def test_clear_modal_dim_cache_invalidates_rewritten_corpus(
    spark, tmp_path
):
    """ADVICE r9: a corpus REWRITTEN at the same path within one process
    must not keep the stale cached modal dimension — corpus-writing
    tools invoke io.clear_modal_dim_cache after rewriting."""
    import numpy as np
    import pandas as pd

    from dbscan_spark.io import clear_modal_dim_cache, embeddings_modal_dim

    def write(dim):
        pd.DataFrame(
            {
                "vec_id": range(3),
                "embedding": [
                    np.ones(dim, dtype=np.float32) for _ in range(3)
                ],
                "label": [0] * 3,
            }
        ).to_parquet(tmp_path / "embeddings.parquet", index=False)

    write(4)
    assert embeddings_modal_dim(spark, str(tmp_path)) == 4
    write(8)
    # stale without the hook (documented process-lifetime cache) ...
    assert embeddings_modal_dim(spark, str(tmp_path)) == 4
    # ... fresh after it
    clear_modal_dim_cache(str(tmp_path))
    assert embeddings_modal_dim(spark, str(tmp_path)) == 8
    # path-scoped: clearing one dir leaves others untouched
    clear_modal_dim_cache(None)


def test_manifest_sink_two_phase_commit(spark, tmp_path):
    """The Python DataSource WRITER (manifest_sink): (a) the committed
    roundtrip equals the source table value-for-value; (b) readers key
    on the manifest, so an orphaned staged file and a stray
    non-manifest part in the directory are both INVISIBLE; (c) the
    staging dir holds no leftovers after a successful commit."""
    import json
    import os

    from dbscan_spark.datasource import read_manifest_sink, register
    from dbscan_spark.io import load_table

    register(spark)
    sup = load_table(spark, SF_TINY, "supplier")
    path = str(tmp_path / "sink")
    sup.write.format("manifest_sink").option("path", path).mode(
        "append"
    ).save()
    # (c) nothing left staged
    assert os.listdir(os.path.join(path, "_tmp")) == []
    # (b) plant an orphan staged file + a stray committed-looking part
    with open(os.path.join(path, "_tmp", "part-orphan.json"), "w") as fh:
        fh.write('{"s_suppkey": 999999}\n')
    with open(os.path.join(path, "part-stray.json"), "w") as fh:
        fh.write(
            '{"s_suppkey": 888888, "s_name": "x", "s_nationkey": 0,'
            ' "s_acctbal": 1.0}\n'
        )
    back = read_manifest_sink(spark, path, sup.schema)
    key = lambda r: (  # noqa: E731
        r["s_suppkey"], r["s_name"], r["s_nationkey"], r["s_acctbal"]
    )
    assert sorted(map(key, back.collect())) == sorted(
        map(key, sup.collect())
    )
    # (a+b) manifest row counts reconcile to the table exactly
    with open(os.path.join(path, "_MANIFEST")) as fh:
        manifest = json.load(fh)
    assert sum(p["n_rows"] for p in manifest["parts"]) == sup.count()
