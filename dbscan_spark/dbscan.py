"""Distributed DBSCAN as an idiomatic PySpark DataFrame pipeline.

Re-expression of the reference's RDD dataflow (DBSCAN.scala:80-242) in
DataFrame operators so Catalyst plans every distributed step:

1. grid histogram        — ``groupBy(floor(x/2ε), floor(y/2ε)).count()``
                           (reference O3-O5, DBSCAN.scala:84-90); only cell
                           counts ever reach the driver, never points.
2. spatial BSP           — driver-side pure function over the histogram
                           (partitioner.find_partitions; reference
                           EvenSplitPartitioner.scala).
3. point→partition assign — broadcast containment theta-join against the
                           ε-grown "outer" rectangles; points in overlap
                           margins are intentionally duplicated (reference
                           O8, DBSCAN.scala:108-112). BroadcastNestedLoopJoin
                           on a table of ≤ thousands of rows.
4. local clustering      — ``repartition('pid').groupBy('pid')
                           .applyInPandas(kernel)`` — Arrow-batched numpy
                           DBSCAN per spatial partition, group size bounded
                           by ``max_points_per_partition`` (reference O9-O10).
5. merge                 — margin points re-keyed to their home partition via
                           a second broadcast rect join (O12-O13); cluster
                           adjacency from a self-equi-join on (x, y) (O14);
                           driver union-find assigns global ids over the
                           (tiny) local-cluster graph (O15,
                           DBSCANGraph.scala); broadcast-join relabel
                           (O16) and an order-insensitive margin dedup
                           (O17 made deterministic, SURVEY.md §2.3 P5).
6. union                 — inner ∪ deduped margin (O18); disjoint by the
                           strict/inclusive containment rules (P6).

Scale notes (100 TB thinking):
* Driver state is O(#grid cells) + O(#local clusters) — identical bound to
  the reference; raise ``minimum_rectangle_size`` (i.e. eps) or pre-filter
  if the cell histogram itself would explode.
* The only shuffles are the histogram aggregate (partial+final combine),
  the per-partition repartition for the kernel, and the margin self-join;
  the rectangle and global-id tables are always broadcast.
* AQE handles residual skew in the kernel shuffle; the BSP bound
  ``max_points_per_partition`` is the primary skew control, exactly as in
  the reference (best-effort under unsplittable hot cells, P8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from dbscan_spark.graph import assign_global_ids
from dbscan_spark.kernel import local_dbscan_matrix
from dbscan_spark.partitioner import Rectangle, find_partitions, margins

_FLAG_RANK = {"noise": 0, "border": 1, "core": 2}


def _rects_df(spark, margin_list):
    """Broadcast-able table of (pid, inner, main, outer) rectangle bounds."""
    rows = [
        (
            pid,
            inner.x, inner.y, inner.x2, inner.y2,
            main.x, main.y, main.x2, main.y2,
            outer.x, outer.y, outer.x2, outer.y2,
        )
        for pid, inner, main, outer in margin_list
    ]
    schema = (
        "pid int, ix double, iy double, ix2 double, iy2 double, "
        "mx double, my double, mx2 double, my2 double, "
        "ox double, oy double, ox2 double, oy2 double"
    )
    return spark.createDataFrame(rows, schema)


def dbscan(
    df: DataFrame,
    eps: float,
    min_points: int,
    max_points_per_partition: int = 250,
    x_col: str = "x",
    y_col: str = "y",
    features_col: str | None = None,
) -> DataFrame:
    """Cluster points; returns the input columns plus ``cluster`` (long,
    0 = noise) and ``flag`` ('core'|'border'|'noise').

    With ``features_col=None`` this is strict 2-D reference parity:
    distance on (x, y). With ``features_col`` naming an ``array<double>``
    column, distance is Euclidean over the full vector while spatial
    partitioning stays on (x, y) — correct for any dimensionality because
    a projection distance never exceeds the full distance, so the ε-margin
    duplication in the (x, y) plane is a superset of n-D ε-connectivity
    across partitions (the same 2-D rule the reference hardwires,
    DBSCANPoint.scala:23-24, generalized instead of imposed).

    Points are identified by their (x, y[, features]) value during the
    margin merge — duplicate coordinate vectors collapse to one output row
    in the margin zone, with extra columns resolved by ``max`` (the
    reference has the same value-identity semantics via its point-keyed
    dedup map, DBSCAN.scala:204-227).

    Precondition when ``features_col`` is set: ``x_col``/``y_col`` MUST be
    the first two components of the feature vector (the projection the
    spatial partitioning runs on). Unrelated (x, y) columns would silently
    corrupt the cross-partition merge, so the kernel validates the
    equality per group and fails the job with a clear error otherwise.

    The returned DataFrame is persisted and already materialized (the
    merge phase is inherently eager — same as the reference); the two
    internal intermediates are released before returning. The RESULT's
    cache belongs to the caller: call ``.unpersist()`` (or
    ``DBSCANModel.unpersist()``) when done, or a loop of dbscan() calls
    accumulates one cached result per call until LRU eviction.
    """
    spark = df.sparkSession
    eps = float(eps)  # numpy scalars would poison createDataFrame below
    min_points = int(min_points)
    size = 2.0 * eps  # minimumRectangleSize (DBSCAN.scala:74, P7)
    X, Y = F.col(x_col), F.col(y_col)

    # -- 1. grid histogram (only cell counts reach the driver) -------------
    cell_rows = (
        df.groupBy(
            (F.floor(X / size) * size).alias("cx"),
            (F.floor(Y / size) * size).alias("cy"),
        )
        .count()
        .collect()
    )
    hist = {(r["cx"], r["cy"]): r["count"] for r in cell_rows}
    if not hist:
        return df.withColumn("cluster", F.lit(0).cast("long")).withColumn(
            "flag", F.lit("noise")
        )

    # -- 2. driver-side BSP + ε margins ------------------------------------
    parts = find_partitions(hist, max_points_per_partition, size)
    margin_list = margins(parts, eps)
    rects = _rects_df(spark, margin_list)

    # -- 3. assignment join: outer (ε-grown) containment, border-inclusive
    #       (P6: >= / <= for outer), duplicating margin points -------------
    in_outer = (
        (X >= F.col("ox")) & (X <= F.col("ox2"))
        & (Y >= F.col("oy")) & (Y <= F.col("oy2"))
    )
    assigned = df.join(F.broadcast(rects), in_outer).select("pid", *df.columns)

    # -- 4. per-partition numpy DBSCAN kernel ------------------------------
    #    The kernel also tags each row's margin candidacy against its OWN
    #    partition's ε-shrunk inner box (a vectorized bound check on data
    #    already in memory): downstream, inner points are then a plain
    #    filter instead of a broadcast rect join, and the dest-pid margin
    #    join only sees the (small) tagged slice instead of every point.
    out_schema = T.StructType(
        assigned.schema.fields
        + [
            T.StructField("cluster", T.LongType(), False),
            T.StructField("flag", T.StringType(), False),
            T.StructField("in_margin", T.BooleanType(), False),
        ]
    )

    inner_bounds = {
        pid: (inner.x, inner.y, inner.x2, inner.y2)
        for pid, inner, _main, _outer in margin_list
    }

    import numpy as np

    def _cluster_group(pdf):
        xs = pdf[x_col].to_numpy(dtype=np.float64)
        ys = pdf[y_col].to_numpy(dtype=np.float64)
        if features_col is not None:
            X = (
                np.stack(pdf[features_col].to_numpy())
                if len(pdf)
                else np.zeros((0, 2))
            )
            X = np.asarray(X, dtype=np.float64)
            if len(X) and not (
                np.array_equal(X[:, 0], xs) and np.array_equal(X[:, 1], ys)
            ):
                raise ValueError(
                    f"dbscan: ({x_col!r}, {y_col!r}) must equal the first "
                    f"two components of {features_col!r} — the spatial "
                    "partitioning runs on that projection and unrelated "
                    "columns would corrupt the cross-partition merge"
                )
        else:
            X = np.column_stack([xs, ys])
        labels, flags = local_dbscan_matrix(X, eps, min_points)
        out = pdf.copy()
        out["cluster"] = labels
        out["flag"] = flags
        if len(pdf):
            ix, iy, ix2, iy2 = inner_bounds[int(pdf["pid"].iloc[0])]
            out["in_margin"] = ~(
                (xs > ix) & (xs < ix2) & (ys > iy) & (ys < iy2)
            )
        else:
            out["in_margin"] = np.zeros(0, dtype=bool)
        return out

    clustered = (
        assigned.repartition(max(len(parts), 1), "pid")
        .groupBy("pid")
        .applyInPandas(_cluster_group, out_schema)
        .persist()
    )

    # -- 5a. margin candidates: in a partition's main box but not strictly
    #        inside its ε-shrunk inner box (P6: inclusive main, strict inner)
    in_main = (
        (X >= F.col("mx")) & (X <= F.col("mx2"))
        & (Y >= F.col("my")) & (Y <= F.col("my2"))
    )
    strictly_in_inner = (
        (X > F.col("ix")) & (X < F.col("ix2"))
        & (Y > F.col("iy")) & (Y < F.col("iy2"))
    )
    margin_pts = (
        clustered.filter(F.col("in_margin"))
        .withColumnRenamed("pid", "src_pid")
        .join(F.broadcast(rects), in_main & ~strictly_in_inner)
        .select(
            F.col("pid").alias("dest_pid"),
            F.col("src_pid"),
            *df.columns,
            "cluster",
            "flag",
        )
        .persist()
    )

    # -- 5b. adjacency: same point under two different (pid, cluster) ids,
    #        both non-noise ⇒ those local clusters are one global cluster.
    #        One collect_set aggregate groups each margin point's
    #        (src_pid, cluster) sightings per dest partition; the pair
    #        expansion is a per-row HOF over sets bounded by the number of
    #        rectangles overlapping one point (≤4 in the BSP grid). This
    #        replaces a sort-merge SELF-join that shuffled margin_pts
    #        twice and sorted both sides — one exchange instead of two,
    #        no sorts, at any scale --------------------------------------
    ident_cols = [x_col, y_col] + (
        [features_col] if features_col is not None else []
    )
    per_point = (
        margin_pts.filter(F.col("cluster") > 0)
        .groupBy("dest_pid", *ident_cols)
        .agg(
            F.collect_set(
                F.struct(
                    F.col("src_pid").alias("p"), F.col("cluster").alias("c")
                )
            ).alias("ids")
        )
    )
    pairs = F.expr(
        "filter(flatten(transform(ids, a -> transform(ids, b -> "
        "struct(a.p AS p1, a.c AS c1, b.p AS p2, b.c AS c2)))), "
        "x -> x.p1 < x.p2)"
    )
    edges_df = per_point.select(F.explode(pairs).alias("e")).select(
        "e.p1", "e.c1", "e.p2", "e.c2"
    )

    # -- 5c. driver union-find over local-cluster ids (tiny). The distinct
    #        local ids ride along in the SAME job as the adjacency edges
    #        (union with null right-hand side), and ONE distinct over the
    #        fused union dedupes both row kinds (they can't collide: id
    #        rows have null p2) — one driver round-trip, one dedup
    #        exchange for the whole merge phase ---------------------------
    ids_df = clustered.filter(F.col("cluster") > 0).select(
        F.col("pid").alias("p1"),
        F.col("cluster").alias("c1"),
        F.lit(None).cast("int").alias("p2"),
        F.lit(None).cast("long").alias("c2"),
    )
    fused_rows = edges_df.unionByName(ids_df).distinct().collect()
    edge_rows = [r for r in fused_rows if r.p2 is not None]
    local_ids = [(r.p1, r.c1) for r in fused_rows if r.p2 is None]
    gmap = assign_global_ids(
        local_ids, [((r.p1, r.c1), (r.p2, r.c2)) for r in edge_rows]
    )
    gmap_df = spark.createDataFrame(
        [(p, c, g) for (p, c), g in gmap.items()],
        "pid int, cluster long, global_cluster long",
    )

    # -- 6a. inner points: strictly inside own partition's inner box keep
    #        exactly one copy — the kernel's in_margin tag makes this a
    #        plain cached-scan filter (no rect join); relabel via broadcast
    #        map (left join keeps noise at 0) ------------------------------
    inner_final = (
        clustered.filter(~F.col("in_margin"))
        .join(F.broadcast(gmap_df), ["pid", "cluster"], "left")
        .select(
            *df.columns,
            F.coalesce("global_cluster", F.lit(0)).alias("cluster"),
            "flag",
        )
    )

    # -- 6b. margin dedup: order-insensitive replacement for the
    #        reference's nondeterministic "last non-noise wins" fold (P5):
    #        take max global id (density-connected duplicates share one id)
    #        and the strongest flag core > border > noise -------------------
    flag_rank = (
        F.when(F.col("flag") == "core", 2)
        .when(F.col("flag") == "border", 1)
        .otherwise(0)
    )
    identity_cols = [x_col, y_col] + (
        [features_col] if features_col is not None else []
    )
    extra_cols = [c for c in df.columns if c not in identity_cols]
    gmap_src = gmap_df.withColumnRenamed("pid", "src_pid")
    margin_final = (
        margin_pts.join(F.broadcast(gmap_src), ["src_pid", "cluster"], "left")
        .withColumn("gcluster", F.coalesce("global_cluster", F.lit(0)))
        .groupBy(*identity_cols)
        .agg(
            F.max("gcluster").alias("cluster"),
            F.max(F.struct(flag_rank.alias("r"), F.col("flag"))).alias("_f"),
            *[F.max(c).alias(c) for c in extra_cols],
        )
        .select(*df.columns, "cluster", F.col("_f.flag").alias("flag"))
    )

    # -- 7. materialize the result, then release the internal caches (they
    #       were only ever needed once more after the merge collect; the
    #       result keeps full lineage, so fault recovery recomputes rather
    #       than relying on unreliable checkpoint storage) -----------------
    result = inner_final.unionByName(margin_final).persist()
    result.count()
    clustered.unpersist()
    margin_pts.unpersist()
    return result


def predict(
    model: DataFrame,
    new_points: DataFrame,
    eps: float,
    x_col: str = "x",
    y_col: str = "y",
    features_col: str | None = None,
) -> DataFrame:
    """Label new points against a fitted model (the reference declares this
    but throws NotImplementedError, DBSCAN.scala:244-251 — implemented here
    for real).

    A new point joins the cluster of its nearest core point within ε, else
    noise. Scalable formulation: key core points by their ε-grid cell,
    explode each new point to its 3×3 candidate cell ring, equi-join on the
    cell key (shuffle hash join — no cross join), exact-filter by distance,
    then window top-1. ``model`` is the output of :func:`dbscan`.

    With ``features_col`` (same contract as :func:`dbscan`: x/y are the
    first two vector components), the exact distance filter runs over the
    FULL vector while candidate generation stays on the (x, y) cell ring —
    correct because a projection distance never exceeds the full distance,
    so the ring is a superset of the true n-D ε-neighborhood.
    """
    from pyspark.sql.window import Window

    core_cols = [
        F.col(x_col).alias("core_x"),
        F.col(y_col).alias("core_y"),
        F.col("cluster").alias("core_cluster"),
        F.floor(F.col(x_col) / eps).cast("long").alias("cell_x"),
        F.floor(F.col(y_col) / eps).cast("long").alias("cell_y"),
    ]
    if features_col is not None:
        core_cols.append(F.col(features_col).alias("core_feats"))
    cores = model.filter(F.col("flag") == "core").select(*core_cols)
    probes = (
        new_points.withColumn("_cx", F.floor(F.col(x_col) / eps).cast("long"))
        .withColumn("_cy", F.floor(F.col(y_col) / eps).cast("long"))
        .withColumn("_ox", F.expr("explode(array(-1L, 0L, 1L))"))
        .withColumn("_oy", F.expr("explode(array(-1L, 0L, 1L))"))
        .withColumn("cell_x", F.col("_cx") + F.col("_ox"))
        .withColumn("cell_y", F.col("_cy") + F.col("_oy"))
    )
    if features_col is not None:
        dist2 = F.aggregate(
            F.zip_with(
                F.col(features_col),
                F.col("core_feats"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    else:
        dx = F.col(x_col) - F.col("core_x")
        dy = F.col(y_col) - F.col("core_y")
        dist2 = dx * dx + dy * dy

    # inner join + ε filter first, THEN left-join the winners back onto the
    # probes: a probe whose candidate cells all hold cores beyond ε must
    # still surface as noise (a pure left-join-then-filter would drop it).
    best = (
        probes.join(cores, ["cell_x", "cell_y"])
        .withColumn("_d2", dist2)
        .filter(F.col("_d2") <= eps * eps)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*new_points.columns).orderBy(
                    F.col("_d2").asc(), F.col("core_cluster").asc()
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(*new_points.columns, "core_cluster")
    )
    return new_points.join(best, new_points.columns, "left").select(
        *new_points.columns,
        F.coalesce(F.col("core_cluster"), F.lit(0)).alias("cluster"),
        F.when(F.col("core_cluster").isNotNull(), F.lit("border"))
        .otherwise(F.lit("noise"))
        .alias("flag"),
    )


class DBSCANModel:
    """Fitted-model wrapper mirroring the reference's public surface so a
    reference user can switch 1:1: ``DBSCAN.train(...)`` →
    :func:`train`, ``model.labeledPoints`` → :attr:`labeled_points`,
    ``model.predict(v)`` → :meth:`predict` (the reference *declares*
    predict but throws, DBSCAN.scala:249-251 — implemented here).

    ``labeled_points`` is the already-materialized clustering result (the
    input columns plus ``cluster``/``flag``), exactly what
    ``model.labeledPoints`` exposes in the reference (DBSCAN.scala:253-256).
    """

    def __init__(
        self,
        labeled_points: DataFrame,
        eps: float,
        min_points: int,
        max_points_per_partition: int,
        x_col: str = "x",
        y_col: str = "y",
        features_col: str | None = None,
    ) -> None:
        self.labeled_points = labeled_points
        self.eps = float(eps)
        self.min_points = int(min_points)
        self.max_points_per_partition = int(max_points_per_partition)
        self._x_col = x_col
        self._y_col = y_col
        self._features_col = features_col

    def predict(self, new_points: DataFrame) -> DataFrame:
        """Label new points against the fitted model: nearest core point
        within ε wins, else noise (see module-level :func:`predict`). A
        model fitted with ``features_col`` measures the full n-D distance;
        ``new_points`` must then carry the same column."""
        return predict(
            self.labeled_points,
            new_points,
            self.eps,
            x_col=self._x_col,
            y_col=self._y_col,
            features_col=self._features_col,
        )

    def unpersist(self) -> None:
        """Release the cached labeled_points (the result stays usable —
        full lineage is kept, so later actions recompute)."""
        self.labeled_points.unpersist()


def train(
    df: DataFrame,
    eps: float,
    min_points: int,
    max_points_per_partition: int = 250,
    x_col: str = "x",
    y_col: str = "y",
    features_col: str | None = None,
) -> DBSCANModel:
    """Reference-parity entry point (DBSCAN.train, DBSCAN.scala:40-48):
    runs :func:`dbscan` and wraps the result in a :class:`DBSCANModel`."""
    labeled = dbscan(
        df,
        eps=eps,
        min_points=min_points,
        max_points_per_partition=max_points_per_partition,
        x_col=x_col,
        y_col=y_col,
        features_col=features_col,
    )
    return DBSCANModel(
        labeled,
        eps,
        min_points,
        max_points_per_partition,
        x_col,
        y_col,
        features_col,
    )
