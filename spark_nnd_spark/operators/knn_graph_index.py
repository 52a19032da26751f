"""Persisted K-NN-graph index family (the 10th): the flagship NND
artifact (reference output contract NND.scala:63,66 —
``RDD[(Long, NodeWithNeighbors)]``) with the same build → probe →
extend → retract → compact lifecycle every other expensive artifact in
the engine carries (LSH postings, IVF cells, span grams, image bands,
token stats, covariance moments).

Layout under ``{path}``:

- ``points/``     (id, features, label, finished) hive-partitioned by
  ``partition`` — the vector table every probe's fetch join hits;
- ``adjacency/``  (id, neighbors) hive-partitioned by ``partition`` —
  the base graph as of the last build/compaction;
- ``reverse/``    (id, src) REVERSE-edge pairs hive-partitioned by
  ``partition`` — one row per adjacency edge, keyed by TARGET: ``src``
  lists ``id`` among its neighbors (edges never cross ``partition``,
  so the pair inherits its row's partition). The search's undirected
  expansion reads this as a second id-keyed lookup instead of
  re-deriving reverse edges by exploding the full adjacency every
  iteration — written at build/persist and compact;
- ``updates/``    (id, neighbors, partition, batch) — append-only
  adjacency DELTAS from ``extend``; a row supersedes the base row (and
  any lower-``batch`` update) for its id;
- ``meta/``       build parameters pinned so extend replays the build
  configuration;
- ``tombstones/`` the shared O(retracted) delete log
  (operators/index_lifecycle).

Scale contract (100 TB):

- **extend is O(batch) in compute, shuffle, AND write**:
  ``update_graph_delta`` (nnd/descent) bounds every exchange to the
  new batch's neighborhood — the stored graph is scanned, never
  exploded, joined, or materialized at corpus size, and reverse
  expansion reads the maintained sidecar; the delta write covers only
  rows whose neighbor list actually changed — the base adjacency is
  never rewritten on ingest.
- **read pays O(updated), not O(graph)**: resolution is base
  anti-join broadcast(update ids) ∪ latest-per-id over the UPDATES
  table alone — no corpus-sized window. Tombstones mask rows via the
  standard broadcast anti-join; stale in-LIST references to retracted
  or superseded nodes are left in place and die at the probe's
  vector-fetch join (nnd/search._expand_score), the same delete-log
  read tax every other family pays until compaction.
- **compact restores the zero-tax read**: fold updates into the base,
  physically prune tombstoned ids from rows AND neighbor lists,
  clear both logs (tombstones dropped LAST, so a crashed compaction
  stays correct and a retry converges).
"""

from __future__ import annotations

import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_nnd_spark.nnd.descent import build_graph, update_graph_delta
from spark_nnd_spark.operators import index_lifecycle as IL
from spark_nnd_spark.schemas import normalize_points

_NEIGHBOR_T = "array<struct<id bigint, similarity double>>"


def _exists(spark: SparkSession, path: str) -> bool:
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    jsc = spark.sparkContext._jsc  # noqa: SLF001
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(jsc.hadoopConfiguration()).exists(hpath)


def build_knn_graph_index(
    points: DataFrame,
    path: str,
    k: int,
    max_iterations: int = 5,
    early_termination: float = 0.01,
    sample_rate: float = 1.0,
    buckets_per_instance: int = 4,
    seed: int = 42,
    n_anchors: int = 256,
) -> None:
    """Build the graph (nnd/descent.build_graph) and persist points +
    adjacency + pinned build params. One NND build, two
    hive-partitioned writes — nothing beyond what the build itself
    shuffles."""
    pts = normalize_points(points)
    g = build_graph(
        pts,
        k=k,
        max_iterations=max_iterations,
        early_termination=early_termination,
        sample_rate=sample_rate,
        buckets_per_instance=buckets_per_instance,
        seed=seed,
        validate=False,
    )
    persist_graph_index(
        g, path,
        k=k, max_iterations=max_iterations,
        early_termination=early_termination, sample_rate=sample_rate,
        buckets_per_instance=buckets_per_instance, seed=seed,
        n_anchors=n_anchors,
    )


def persist_graph_index(
    graph: DataFrame,
    path: str,
    k: int,
    max_iterations: int = 5,
    early_termination: float = 0.01,
    sample_rate: float = 1.0,
    buckets_per_instance: int = 4,
    seed: int = 42,
    n_anchors: int = 256,
) -> None:
    """Persist an ALREADY-BUILT graph (a build_graph/update_graph
    result) into the family layout — the entry point for users who
    hold the artifact in memory and want the lifecycle without paying
    a rebuild. The params are pinned as meta so extend replays the
    build configuration; they must be the ones the graph was built
    with."""
    spark = graph.sparkSession
    g = graph.localCheckpoint(eager=True)
    g.select("id", "features", "label", "finished", "partition").write.mode(
        "overwrite"
    ).partitionBy("partition").parquet(f"{path}/points")
    adj = g.filter(F.col("neighbors").isNotNull()).select(
        "id", "neighbors", "partition"
    )
    adj.write.mode("overwrite").partitionBy("partition").parquet(
        f"{path}/adjacency"
    )
    _write_reverse(spark.read.parquet(f"{path}/adjacency"), path)
    # coarse entry layer (the HNSW-upper-layer move): a deterministic
    # per-partition sample of stored nodes with their vectors; searches
    # opting in (use_anchors) seed from each query's NEAREST anchors
    # instead of shared random entries — recall at small n_entry
    from spark_nnd_spark.nnd.search import entry_points  # noqa: PLC0415

    entry_points(
        spark.read.parquet(f"{path}/points").select(
            "id", "features", "partition"
        ),
        int(n_anchors),
        int(seed),
    ).join(
        spark.read.parquet(f"{path}/points").select("id", "partition"), "id"
    ).select("id", "features", "partition").write.mode(
        "overwrite"
    ).partitionBy("partition").parquet(f"{path}/anchors")
    spark.createDataFrame(
        [(
            int(k), int(max_iterations), float(early_termination),
            float(sample_rate), int(buckets_per_instance), int(seed),
        )],
        "k long, max_iterations long, early_termination double, "
        "sample_rate double, buckets_per_instance long, seed long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def _meta(spark: SparkSession, path: str) -> dict[str, Any]:
    return spark.read.parquet(f"{path}/meta").collect()[0].asDict()


def _rev_pairs(adj: DataFrame) -> DataFrame:
    """Adjacency exploded into reverse-edge pairs keyed by TARGET:
    (id = the listed neighbor, src = the row that lists it). Edges
    never cross ``partition`` (NND.scala:296-306 gates cross-partition
    similarity to -inf), so the pair keeps its source row's value."""
    return adj.select(
        F.col("id").alias("src"),
        F.explode(F.transform("neighbors", lambda s: s["id"])).alias("id"),
        "partition",
    ).select("id", "src", "partition")


def _write_reverse(adj: DataFrame, path: str) -> None:
    _rev_pairs(adj).write.mode("overwrite").partitionBy(
        "partition"
    ).parquet(f"{path}/reverse")


def _latest_updates(spark: SparkSession, path: str) -> DataFrame:
    """Latest delta row per updated id, checkpointed. ONE map-side-
    combinable ``max_by`` aggregate instead of the former row_number
    window: the window exchanged EVERY pending delta row plus a sort,
    where the aggregate's partial combine ships at most one row per id
    per map task — the read-tax resolution every extend and every
    probe under pending deltas pays, so its constant matters at
    ingest cadence (VERDICT r15 #2/#4: the small-batch extend and the
    gate probe inherit prior batches' delta volume here). max_by on
    the batch number is exactly latest-per-id; batches are distinct
    per extend append, so no tie exists (and a same-batch tie would
    have been nondeterministic under the window too)."""
    upd = spark.read.parquet(f"{path}/updates")
    return (
        upd.groupBy("id")
        .agg(
            F.max_by(F.struct("neighbors", "partition"), "batch").alias("__l")
        )
        .select("id", "__l.neighbors", "__l.partition")
        .localCheckpoint(eager=True)
    )


def _resolved_reverse(
    spark: SparkSession, path: str, latest: DataFrame | None = None
) -> DataFrame:
    """Reverse pairs equal (by construction) to exploding the
    update-RESOLVED adjacency: base pairs whose ``src`` has no delta,
    plus the latest delta rows exploded. The base side pays one
    broadcast anti-join on src (O(updated) ids); only the O(updated)
    delta rows are exploded at read time. Falls back to deriving from
    the resolved adjacency when the sidecar is absent (an index
    persisted before the sidecar existed). ``latest`` lets a caller
    that already resolved the deltas (read_graph + reverse in one
    probe; the extend) share ONE resolution instead of paying it per
    view."""
    if not _exists(spark, f"{path}/reverse"):
        return _rev_pairs(
            _resolved_adjacency(spark, path, latest)
        ).select("id", "src")
    base = spark.read.parquet(f"{path}/reverse").select("id", "src")
    if not _exists(spark, f"{path}/updates"):
        return base
    if latest is None:
        latest = _latest_updates(spark, path)
    # the checkpointed latest IS one row per updated id — its id column
    # replaces the former second full pass + distinct over the updates
    upd_ids = latest.select(F.col("id").alias("src"))
    return base.join(F.broadcast(upd_ids), "src", "left_anti").unionByName(
        _rev_pairs(latest).select("id", "src")
    )


def _resolved_adjacency(
    spark: SparkSession, path: str, latest: DataFrame | None = None
) -> DataFrame:
    """Base adjacency with update deltas applied: base rows whose id
    has no delta, plus the latest delta per updated id. The only
    exchange is the latest-per-id aggregate over the UPDATES table
    (_latest_updates); the base side pays one broadcast anti-join."""
    base = spark.read.parquet(f"{path}/adjacency")
    if not _exists(spark, f"{path}/updates"):
        return base
    if latest is None:
        latest = _latest_updates(spark, path)
    upd_ids = latest.select("id")
    return base.join(F.broadcast(upd_ids), "id", "left_anti").unionByName(
        latest
    )


def read_graph(
    spark: SparkSession, path: str, latest: DataFrame | None = None
) -> DataFrame:
    """The stored graph in ``build_graph`` output shape (id, features,
    label, partition, finished, neighbors), tombstone-masked and
    update-resolved. Neighbor LISTS may still reference retracted /
    superseded ids until compaction — probes drop those at the
    vector-fetch join; consumers that need pruned lists run
    :func:`compact_knn_graph_index` first (or explode-filter
    themselves). ``latest`` optionally shares one delta resolution
    (_latest_updates) with the caller's other views."""
    tomb = IL.read_tombstones(spark, path)
    pts = IL.anti_tombstones(
        spark.read.parquet(f"{path}/points"), tomb, "id"
    )
    adj = IL.anti_tombstones(
        _resolved_adjacency(spark, path, latest), tomb, "id"
    )
    return pts.join(adj.select("id", "neighbors"), "id", "left").select(
        "id", "features", "label", "partition", "finished",
        F.when(F.col("finished"), F.lit(None).cast(_NEIGHBOR_T))
        .otherwise(F.coalesce("neighbors", F.array().cast(_NEIGHBOR_T)))
        .alias("neighbors"),
    )


def graph_index_search(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    ef: int = 64,
    beam: int = 16,
    n_entry: int = 16,
    max_iterations: int = 20,
    seed: int = 42,
    query_id_col: str = "query_id",
    query_vec_col: str = "q_vec",
    exclude_ids: DataFrame | None = None,
    use_anchors: bool = False,
) -> DataFrame:
    """Nearest STORED neighbors of each query vector, served by greedy
    search (nnd/search.graph_search_topk) over the persisted graph.
    Tombstoned nodes cannot surface: their rows are masked out of both
    the adjacency and the vector table before the search sees them.
    ``exclude_ids`` additionally masks the given node ids for THIS
    probe only (broadcast anti-join) — the replay-purity device of the
    ingest gate (a retried micro-batch that partially admitted itself
    must still probe the exact pre-batch graph).

    ``use_anchors=True`` seeds each query from its NEAREST stored
    anchors (the coarse entry layer persisted at build) instead of
    shared random entries — the recall-at-small-n_entry mode measured
    in BENCH_GS_SWEEP; anchors are masked by the same tombstone +
    exclude rules as every other read, so a retracted anchor can
    neither seed nor surface."""
    from spark_nnd_spark.nnd.search import graph_search_topk  # noqa: PLC0415

    # resolve pending deltas ONCE per probe: the graph view and the
    # reverse sidecar both consume the same checkpointed latest-per-id
    # table instead of each paying its own O(pending deltas) aggregate
    latest = (
        _latest_updates(spark, path)
        if _exists(spark, f"{path}/updates")
        else None
    )
    g = read_graph(spark, path, latest)
    anchors = None
    if use_anchors:
        if not _exists(spark, f"{path}/anchors"):
            # silent fallback to random-entry seeding degrades
            # duplicate-detection recall with no signal (ADVICE r15 —
            # the BENCH_GRAPH_GATE 129/200 miss was exactly this shape)
            import logging  # noqa: PLC0415

            logging.getLogger(__name__).warning(
                "use_anchors=True but %s/anchors does not exist "
                "(index persisted without anchors?) — falling back to "
                "random-entry seeding; recall at small n_entry degrades",
                path,
            )
        else:
            anchors = IL.anti_tombstones(
                spark.read.parquet(f"{path}/anchors"),
                IL.read_tombstones(spark, path),
                "id",
            )
    # Reverse expansion from the maintained sidecar: mask exactly the
    # SOURCES the inline derivation would lose when its adjacency rows
    # are masked (tombstoned + probe-excluded ids), so sidecar-served
    # search equals inline search row-for-row. Stale TARGETS need no
    # mask — a masked candidate dies at the vector-fetch join.
    rev = _resolved_reverse(spark, path, latest)
    rev = IL.anti_tombstones(rev, IL.read_tombstones(spark, path), "src")
    if exclude_ids is not None:
        ex = F.broadcast(
            exclude_ids.select(
                F.col(exclude_ids.columns[0]).alias("id")
            ).distinct()
        )
        g = g.join(ex, "id", "left_anti")
        rev = rev.join(
            ex.select(F.col("id").alias("src")), "src", "left_anti"
        )
        if anchors is not None:
            anchors = anchors.join(ex, "id", "left_anti")
    return graph_search_topk(
        g,
        queries,
        k=k,
        ef=ef,
        beam=beam,
        n_entry=n_entry,
        max_iterations=max_iterations,
        seed=seed,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        points=g.select("id", "features", "partition"),
        reverse=rev,
        anchors=anchors,
    )


def _graph_tables(
    spark: SparkSession | None = None, path: str | None = None
) -> list[IL.TableSpec]:
    """Upsert/purge table specs. ``reverse`` is keyed by ``src`` — an
    upserted id's OLD out-edges must leave the sidecar with its old
    adjacency row (its appearances as a target are resolved at read
    time). Included only when the sidecar exists (pre-sidecar
    indexes)."""
    tables: list[IL.TableSpec] = [
        ("points", "id", "partition"), ("adjacency", "id", "partition")
    ]
    if spark is not None and path is not None and _exists(
        spark, f"{path}/reverse"
    ):
        tables.append(("reverse", "src", "partition"))
    if spark is not None and path is not None and _exists(
        spark, f"{path}/anchors"
    ):
        # an upserted id's stale anchor vector must leave with its old
        # rows; the batch's version re-enters only via a rebuild sample
        tables.append(("anchors", "id", "partition"))
    return tables


def extend_knn_graph_index(
    spark: SparkSession, path: str, new_points: DataFrame
) -> None:
    """Fold a batch of new points into the stored graph and append the
    resulting adjacency CHANGES as a delta. Both compute AND shuffle
    scale with the batch NEIGHBORHOOD, not the corpus
    (nnd/descent.update_graph_delta): the stored graph is only ever
    SCANNED — no O(corpus) materialization, explode, join, or diff
    anywhere in the job. Reverse expansion during the update reads the
    maintained sidecar, so even the scan-time explode is skipped.

    The honest size of "neighborhood" (measured per-stage, r15): the
    batch's bucket cohorts receive candidates, and each descent hop
    activates the receivers' neighbor groups, so the touched set —
    and with it extend shuffle — is O(min(corpus,
    batch·draws·bucket_size·K̄)). Corpus-independence holds once the
    corpus exceeds that bound (BENCH_GRAPH_INDEX's tiny-batch sweep
    is the in-bound measurement; the larger batches saturate the
    test corpora and track min(corpus, ·)).

    Re-admission of tombstoned ids is the standard upsert
    (index_lifecycle.settle_readmission: purge old physical rows,
    clear their tombstones) — a retracted-then-reingested node comes
    back with only its new vector. Live-id overlap also settles as an
    upsert: the batch's version of the point wins.
    """
    new_pts = normalize_points(new_points).localCheckpoint(eager=True)
    # full upsert via the shared kernel: tombstoned AND still-live
    # overlap purged from points + base adjacency + reverse sidecar +
    # any update deltas, so the batch's version of each id wins; the
    # live check reads the O(points) roster, and the purge rewrite
    # only fires on actual overlap
    tables = _graph_tables(spark, path)
    if _exists(spark, f"{path}/updates"):
        tables.append(("updates", "id", None))
    IL.settle_upsert(
        spark, path, new_pts.select("id"), tables,
        roster=("points", "id", "partition"),
    )

    # Lazy, tombstone-masked views pinned AFTER the upsert and BEFORE
    # any append — file listings are fixed at read creation, so the
    # update's scans never see this batch's own writes.
    tomb = IL.read_tombstones(spark, path)
    latest = (
        _latest_updates(spark, path)
        if _exists(spark, f"{path}/updates")
        else None
    )
    prev_adj = IL.anti_tombstones(
        _resolved_adjacency(spark, path, latest), tomb, "id"
    ).select("id", "neighbors")
    prev_pts = IL.anti_tombstones(
        spark.read.parquet(f"{path}/points"), tomb, "id"
    )
    rev = IL.anti_tombstones(
        _resolved_reverse(spark, path, latest), tomb, "src"
    )
    all_pts = prev_pts.select(
        "id", "features", "label", "partition", "finished"
    ).unionByName(
        new_pts.select("id", "features", "label", "partition", "finished")
    )

    m = _meta(spark, path)
    # Delta = rows whose neighbor list changed (new ids have no prev
    # row). Struct-array equality is exact — no float normalization
    # needed, both sides carry the kernel's float64 sims.
    changed = update_graph_delta(
        prev_adj,
        all_pts,
        k=int(m["k"]),
        max_iterations=int(m["max_iterations"]),
        early_termination=float(m["early_termination"]),
        sample_rate=float(m["sample_rate"]),
        buckets_per_instance=int(m["buckets_per_instance"]),
        seed=int(m["seed"]),
        new_ids=new_pts.select("id"),
        reverse=rev,
    ).localCheckpoint(eager=True)

    batch_no = 0
    if _exists(spark, f"{path}/updates"):
        # the overlap purge above may have emptied the table → max None
        prev_max = (
            spark.read.parquet(f"{path}/updates")
            .agg(F.max("batch"))
            .collect()[0][0]
        )
        batch_no = (prev_max + 1) if prev_max is not None else 0
    new_pts.select("id", "features", "label", "finished", "partition").write.mode(
        "append"
    ).partitionBy("partition").parquet(f"{path}/points")
    changed.withColumn("batch", F.lit(batch_no).cast("long")).write.mode(
        "append"
    ).parquet(f"{path}/updates")


def retract_from_knn_graph_index(
    spark: SparkSession, path: str, ids: DataFrame
) -> None:
    """Tombstone-retract nodes: O(retracted) append; every read path
    masks their rows immediately, and their appearances inside other
    nodes' neighbor lists die at the probe's vector-fetch join until
    compaction physically prunes them."""
    IL.append_tombstones(spark, path, ids)


def compact_knn_graph_index(spark: SparkSession, path: str) -> None:
    """Fold updates + tombstones into the physical tables: resolved
    adjacency minus tombstoned rows, neighbor lists pruned of
    tombstoned ids, points minus tombstoned rows; drop the updates
    dir, then the tombstone log LAST (a crash at any point leaves a
    state every read path still serves correctly, and a retry
    converges)."""
    tomb = IL.read_tombstones(spark, path)
    adj = _resolved_adjacency(spark, path)
    pts = spark.read.parquet(f"{path}/points")
    if tomb is not None:
        adj = IL.anti_tombstones(adj, tomb, "id")
        pts = IL.anti_tombstones(pts, tomb, "id")
        n_tomb = tomb.count()
        if 0 < n_tomb <= 4096:
            # typical log is O(retracted) small — a driver literal
            # keeps list pruning inside codegen, no explode/regroup
            tomb_ids = [r.id for r in tomb.collect()]
            lit = F.array(*[F.lit(int(i)) for i in tomb_ids])
            adj = adj.select(
                "id",
                F.filter(
                    "neighbors", lambda s: ~F.array_contains(lit, s["id"])
                ).alias("neighbors"),
                "partition",
            )
        elif n_tomb > 4096:
            # mass retraction: the id list never touches the driver —
            # explode, broadcast anti-join, regroup in position order.
            # The extra O(N·K) exchange lives inside an operation that
            # already rewrites the whole adjacency, so the asymptotics
            # of compaction are unchanged.
            expl = adj.select(
                "id", "partition",
                F.posexplode_outer("neighbors").alias("pos", "nb"),
            )
            kept = (
                expl.filter(F.col("nb").isNotNull())
                .join(
                    F.broadcast(tomb.select(F.col("id").alias("__tid"))),
                    F.col("nb")["id"] == F.col("__tid"),
                    "left_anti",
                )
                .groupBy("id")
                .agg(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("pos", "nb"))),
                        lambda s: s["nb"],
                    ).alias("neighbors")
                )
            )
            adj = (
                adj.select("id", "partition")
                .join(kept, "id", "left")
                .select(
                    "id",
                    F.coalesce(
                        "neighbors", F.array().cast(_NEIGHBOR_T)
                    ).alias("neighbors"),
                    "partition",
                )
            )
    adj = adj.localCheckpoint(eager=True)  # detach from files being replaced
    pts = pts.localCheckpoint(eager=True)
    adj.write.mode("overwrite").partitionBy("partition").parquet(
        f"{path}/adjacency"
    )
    pts.write.mode("overwrite").partitionBy("partition").parquet(
        f"{path}/points"
    )
    # reverse sidecar rebuilt from the compacted adjacency — pruned
    # lists mean pruned pairs; zero-tax reverse reads are restored
    _write_reverse(spark.read.parquet(f"{path}/adjacency"), path)
    if tomb is not None and _exists(spark, f"{path}/anchors"):
        anchors = IL.anti_tombstones(
            spark.read.parquet(f"{path}/anchors"), tomb, "id"
        ).localCheckpoint(eager=True)
        anchors.write.mode("overwrite").partitionBy("partition").parquet(
            f"{path}/anchors"
        )
    if _exists(spark, f"{path}/updates"):
        shutil.rmtree(f"{path}/updates", ignore_errors=True)
    if tomb is not None:
        shutil.rmtree(f"{path}/tombstones", ignore_errors=True)
