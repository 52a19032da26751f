"""Deterministic k-means operators over embedding columns.

Extension layer (the reference has no clustering surface; SURVEY.md
§2.3): corpus-curation pipelines cluster embeddings to balance topic
mixtures, pick diverse training subsets, and seed IVF-style indexes.
The primitive both uses need is one exact, replayable Lloyd step:
assign every vector to its nearest centroid, then re-average.

Scale design — the corpus is never shuffled for the *assignment*:
centroids are k·dim doubles (plan metadata, exactly like the IVF
trained centroids in operators/similarity.py), so they are inlined as
a LITERAL array of structs and the nearest-centroid choice becomes a
single projection: ``array_min(transform(centroids, c ->
struct(dist(c), cid)))``. The alternative — crossJoin with a centroid
table and a groupBy/window argmin — ships N·k rows through an
exchange; the literal form ships zero. Re-averaging (``kmeans_step``)
is a posexplode + hash aggregate on (cluster, dim): Catalyst applies
map-side partial aggregation, so the exchange carries at most
``k·dim`` partial sums per task regardless of N.

All arithmetic is plain double sums evaluated left-to-right, so a SQL
engine replays it bit-for-bit (the q59 DuckDB oracle does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Centroids = list[tuple[int, list[float]]]


def seed_centroids(
    df: DataFrame, k: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> Centroids:
    """First-k-ids seeding: centroid j = the vector with id j. A tiny
    driver collect (k rows — the same O(small) class as the partition
    histogram and the IVF training sample), deterministic across runs
    and engines; no RNG state."""
    rows = (
        df.filter(F.col(id_col) < k)
        .select(F.col(id_col).cast("long").alias("cid"), F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    return [(int(r["cid"]), [float(x) for x in r["v"]]) for r in sorted(rows)]


def _sq_l2(vec: Column, center: list[float]) -> Column:
    """Squared L2 distance to a literal centroid, as a sequential
    left fold (same evaluation order as DuckDB's list_sum)."""
    lit_center = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(vec, lit_center, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def nearest_centroid_expr(centroids: Centroids, vec_col: Column | str) -> Column:
    """Argmin over literal centroids — a pure projection, no shuffle.
    ``array_min`` orders struct elements lexicographically, so
    (distance, cid) breaks distance ties on the smaller cluster id."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    vec = vec.cast("array<double>")
    candidates = [
        F.struct(_sq_l2(vec, center).alias("dist"), F.lit(int(cid)).alias("cid"))
        for cid, center in centroids
    ]
    return F.array_min(F.array(*candidates)).getField("cid")


def kmeans_assign(
    df: DataFrame,
    centroids: Centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster_id) assignment — one narrow map over the corpus."""
    return df.select(
        F.col(id_col),
        nearest_centroid_expr(centroids, vec_col).cast("long").alias("cluster_id"),
    )


def kmeans_step(
    df: DataFrame,
    centroids: Centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One exact Lloyd iteration: assignment (narrow) + re-average via
    posexplode → hash aggregate on (cluster_id, i). Returns one row per
    (cluster_id, dimension) with the new centroid mean and the member
    count — the re-aggregation shape that survives 100× because only
    k·dim partials cross the exchange."""
    assigned = df.select(
        nearest_centroid_expr(centroids, vec_col).cast("long").alias("cluster_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    exploded = assigned.select("cluster_id", F.posexplode("v").alias("i", "x"))
    return (
        exploded.groupBy("cluster_id", "i")
        .agg(F.avg("x").alias("centroid"), F.count("*").alias("n"))
        .select("cluster_id", F.col("i").cast("long").alias("i"), "centroid", "n")
    )


# ---------------------------------------- covariance spectrum (PCA)

COV_QUANT = 1_000_000   # component quantization: exact integer sums
EIG_VSCALE = 100_000    # eigenvector iterate scale (5-digit grid)


def int_covariance(df: DataFrame, vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Covariance matrix of an embedding column with EXACT integer
    corpus aggregates — the input every spectral diagnostic (PCA,
    anisotropy, effective dimensionality) needs, built so any engine
    reproduces it bit-for-bit. Components quantize to COV_QUANT
    micro-units (BIGINT); the corpus-sized sums Σqᵢqⱼ and Σqᵢ are
    integer (order-free — the q165/q169 cross-engine discipline;
    DECIMAL(38,0) accumulators, so no corpus size overflows them,
    while per-element products stay BIGINT — fine through per-
    component magnitudes of ~3e3); the
    final ``cov = A/N − (Bᵢ/N)(Bⱼ/N)`` is a fixed sequence of IEEE
    double ops on exact integers, identical everywhere, rounded back
    to a BIGINT in micro² units (1e12 × the real covariance).

    Returns the full symmetric matrix as (i, j, c) rows, 1-based
    dims, c in micro² units.

    Scale (100 TB): one corpus scan; the upper-triangle explode is
    O(rows · d²/2) narrow work map-side combined into d²/2 cells, so
    the exchange carries O(d² · partitions) partial sums — never row
    data. For d where d² explode dominates (d ≳ 1k), swap the explode
    for a per-partition Arrow Gram-matrix kernel emitting the same
    (i, j, partial) rows; the aggregation contract is unchanged."""
    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * COV_QUANT + F.lit(0.5)).cast("long"),
    )
    rows = df.select(q.alias("q"))
    g = rows.select(F.posexplode("q").alias("i0", "qi"), "q")
    upper = g.select(
        (F.col("i0") + 1).alias("i"),
        "qi",
        F.posexplode(
            F.slice("q", F.col("i0") + 1, F.lit(dim) - F.col("i0"))
        ).alias("k0", "qj"),
    ).select(
        "i",
        (F.col("i") + F.col("k0")).alias("j"),
        (F.col("qi") * F.col("qj")).alias("p"),
    )
    # DECIMAL(38,0) sums: exact at any corpus size (per-element
    # products stay BIGINT — bounded by (quant·max|x|)², fine through
    # |x| ~ 3e3; DuckDB's SUM(BIGINT) is HUGEINT, also exact)
    a = upper.groupBy("i", "j").agg(
        F.sum(F.col("p").cast("decimal(38,0)")).alias("a")
    )
    b = (
        g.select((F.col("i0") + 1).alias("i"), "qi")
        .groupBy("i")
        .agg(
            F.sum(F.col("qi").cast("decimal(38,0)")).alias("bv"),
            F.count("*").alias("n"),
        )
    )
    cov_u = (
        a.join(F.broadcast(b.select("i", F.col("bv").alias("bi"), "n")), "i")
        .join(
            F.broadcast(b.select(F.col("i").alias("j"), F.col("bv").alias("bj"))),
            "j",
        )
        .select(
            "i",
            "j",
            F.floor(
                F.col("a").cast("double") / F.col("n")
                - (F.col("bi").cast("double") / F.col("n"))
                * (F.col("bj").cast("double") / F.col("n"))
                + F.lit(0.5)
            ).cast("long").alias("c"),
        )
    )
    return cov_u.unionByName(
        cov_u.filter("i <> j").select(
            F.col("j").alias("i"), F.col("i").alias("j"), "c"
        )
    )


def top_eigen_power(
    cov: DataFrame, dim: int = 64, iters: int = 3, vscale: int = EIG_VSCALE
) -> DataFrame:
    """Top eigenvalue/eigenvector of an :func:`int_covariance` matrix
    by POWER ITERATION — the engine's iterative-linear-algebra tier
    (embedding anisotropy: a dominant eigenvalue means one direction
    carries most of the variance and cosine similarities collapse).
    Each round is one matvec ``w = C·v`` as a grouped integer
    aggregate (exact, order-free), then norm/Rayleigh folds over the
    d-row result in FIXED index order (deterministic IEEE doubles —
    the q157 fold idiom) and a re-quantized iterate
    ``v' = round(w/‖w‖ · vscale)``. The O(d) iterate is the one
    driver scalar per round (the convergence-scalar class,
    NND.scala:118); all corpus- and matrix-sized math stays in plans.

    Emits one row per iteration: (iter, lambda_top — Rayleigh
    quotient in ORIGINAL units, explained_frac = λ/trace, top_dim,
    top_loading). Deterministic cross-engine; the DuckDB oracle
    unrolls the same rounds over list folds.

    Scale: the matrix is O(d²) rows; every iteration is a d²-row
    aggregate + a d-row fold — driver-adjacent constant cost next to
    the corpus scan that built the matrix."""
    per_iter, _ = _power_loop(cov, dim, iters, vscale)
    out = per_iter[0]
    for r in per_iter[1:]:
        out = out.unionByName(r)
    return out.orderBy("iter")


def top_eigen_vector(
    cov: DataFrame, dim: int = 64, iters: int = 3, vscale: int = EIG_VSCALE
) -> list[int]:
    """The final power-iteration iterate as ``vscale``-scaled integers
    (‖v/vscale‖ ≈ 1 up to the integer grid) — the trained direction a
    post-processing transform projects against (q180). Same loop and
    same numbers as :func:`top_eigen_power`."""
    _, m = _power_loop(cov, dim, iters, vscale)
    return m


# Above this dim the power loop's O(d²) matrix stays distributed:
# collecting it to the driver is bounded and fast at embedding dims
# (d=64 -> 4096 rows; d=512 -> 262k rows) but would be a silent
# driver-memory regression at d=1024-4096 (1M-16M rows) — ADVICE r15.
POWER_DRIVER_MAX_DIM = 512


def _power_loop(
    cov: DataFrame, dim: int, iters: int, vscale: int
) -> tuple[list[DataFrame], list[int]]:
    """Dispatch: driver loop at bounded dims (one job per loop), the
    distributed matvec loop above POWER_DRIVER_MAX_DIM (identical
    numbers — the driver loop's integer matvec and fixed-order IEEE
    folds replicate it exactly; asserted equal in test_cov_stats)."""
    if dim <= POWER_DRIVER_MAX_DIM:
        return _power_loop_driver(cov, dim, iters, vscale)
    return _power_loop_distributed(cov, dim, iters, vscale)


def _power_loop_distributed(
    cov: DataFrame, dim: int, iters: int, vscale: int
) -> tuple[list[DataFrame], list[int]]:
    """The pre-r15 distributed loop: each round is one matvec
    ``w = C·v`` as a grouped DECIMAL(38,0) aggregate plus fixed-order
    IEEE folds, ~2 jobs per round. Kept as the large-dim path — every
    corpus- and matrix-sized object stays in plans; only the O(d)
    iterate and stats reach the driver."""
    import math  # noqa: PLC0415

    cov = cov.localCheckpoint(eager=True)
    trace_row = cov.filter("i = j").agg(F.sum("c").alias("trace"))
    m = [int(math.floor(vscale / math.sqrt(dim) + 0.5))] * dim
    per_iter = []
    for t in range(1, iters + 1):
        vlit = F.array(*[F.lit(x).cast("long") for x in m])
        w_df = cov.groupBy("i").agg(
            F.sum(
                F.col("c").cast("decimal(38,0)")
                * F.element_at(vlit, F.col("j").cast("int"))
            ).alias("w")
        )
        packed = w_df.agg(
            F.array_sort(F.collect_list(F.struct("i", "w"))).alias("ws")
        )
        stats = packed.select(
            "ws",
            F.sqrt(
                F.aggregate(
                    "ws",
                    F.lit(0.0),
                    lambda acc, s: acc
                    + s["w"].cast("double") * s["w"].cast("double"),
                )
            ).alias("norm"),
            F.aggregate(
                "ws",
                F.lit(0.0),
                lambda acc, s: acc
                + F.element_at(vlit, s["i"].cast("int")).cast("double")
                * s["w"].cast("double"),
            ).alias("num"),
            F.aggregate(
                vlit,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ).alias("den"),
        ).localCheckpoint(eager=True)
        row = stats.crossJoin(trace_row).select(
            F.lit(t).cast("long").alias("iter"),
            F.round(
                F.col("num") / F.col("den") / F.lit(1.0e12), 8
            ).alias("lambda_top"),
            F.round(
                F.try_divide(
                    F.col("num") / F.col("den"), F.col("trace").cast("double")
                ),
                6,
            ).alias("explained_frac"),
            "norm",
        )
        got = stats.collect()[0]
        norm = got["norm"]
        if not norm:  # zero covariance: keep the current iterate
            m = list(m)
        else:
            m = [
                int(math.floor(float(s["w"]) / norm * vscale + 0.5))
                for s in got["ws"]
            ]
        top0 = min(range(dim), key=lambda idx: (-abs(m[idx]), idx))
        per_iter.append(
            row.select(
                "iter",
                "lambda_top",
                "explained_frac",
                F.lit(top0 + 1).cast("long").alias("top_dim"),
                F.round(
                    F.lit(m[top0]).cast("double") / F.lit(float(vscale)), 6
                ).alias("top_loading"),
            )
        )
    return per_iter, m


def _power_loop_driver(
    cov: DataFrame, dim: int, iters: int, vscale: int
) -> tuple[list[DataFrame], list[int]]:
    """The loop runs ON THE DRIVER over the collected O(d²) matrix —
    a bounded collect (the NND.scala:118 convergence-scalar class;
    4096 rows at d=64). The distributed form paid 2 Spark jobs per
    round (matvec aggregate + stats collect) on a 4096-row input —
    pure scheduling overhead (guide §1.2: fix the algorithm's job
    count before its per-task work). Numerics are IDENTICAL by
    construction: the matvec Σ c·m is exact integer arithmetic
    (Python int == the old DECIMAL(38,0) sum), and the norm/Rayleigh
    folds run the same IEEE-double ops in the same fixed index order
    the old F.aggregate folds (and the DuckDB oracle's list_reduce)
    use; the final round/divide expressions stay SPARK expressions
    over literals, so rounding semantics are byte-identical too."""
    import math  # noqa: PLC0415

    spark = cov.sparkSession
    rows = cov.select("i", "j", "c").collect()
    mat: dict[int, list[tuple[int, int]]] = {}
    trace = 0
    for r in rows:
        mat.setdefault(r["i"], []).append((r["j"], r["c"]))
        if r["i"] == r["j"]:
            trace += r["c"]
    m = [int(math.floor(vscale / math.sqrt(dim) + 0.5))] * dim
    per_iter = []
    for t in range(1, iters + 1):
        # exact integer matvec w = C·v (order-free)
        w = {i: sum(c * m[j - 1] for j, c in cols) for i, cols in mat.items()}
        ws = sorted(w.items())  # ascending i — the old array_sort order
        # the three folds, in the old plans' fixed order and IEEE ops
        norm_sq = 0.0
        num = 0.0
        for i, wi in ws:
            fw = float(wi)
            norm_sq = norm_sq + fw * fw
            num = num + float(m[i - 1]) * fw
        norm = math.sqrt(norm_sq)
        den = 0.0
        for x in m:
            fx = float(x)
            den = den + fx * fx
        if norm:  # zero covariance (constant corpus): w ≡ 0 — keep
            # the current iterate instead of dividing by zero;
            # lambda/explained emit as 0/null from the SQL side
            m = [
                int(math.floor(float(wi) / norm * vscale + 0.5))
                for _, wi in ws
            ]
        top0 = min(range(dim), key=lambda idx: (-abs(m[idx]), idx))
        per_iter.append(
            spark.range(1).select(
                F.lit(t).cast("long").alias("iter"),
                F.round(
                    F.lit(num) / F.lit(den) / F.lit(1.0e12), 8
                ).alias("lambda_top"),
                F.round(
                    F.try_divide(
                        F.lit(num) / F.lit(den),
                        F.lit(trace).cast("long").cast("double"),
                    ),
                    6,
                ).alias("explained_frac"),
                F.lit(top0 + 1).cast("long").alias("top_dim"),
                F.round(
                    F.lit(m[top0]).cast("double") / F.lit(float(vscale)), 6
                ).alias("top_loading"),
            )
        )
    return per_iter, m


def kmeans_curve(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = COV_QUANT,
) -> DataFrame:
    """Lloyd k-means TRAINED FOR ``iters`` ROUNDS with a per-round
    convergence curve — the loop q59 computes one step of, made
    cross-engine exact end-to-end by the integer discipline: vectors
    quantize once to ``quant`` micro-units, so every distance is a
    pure BIGINT sum (argmin has no float in it at all), the per-round
    inertia Σ min-dist² is an EXACT integer (order-free — no float
    accumulation anywhere in the corpus-sized sums), and the centroid
    update re-rounds the exact integer means back onto the micro grid
    (floor(S/n + 0.5) on a deterministic double quotient; S is an
    exact DECIMAL(38,0) sum — DuckDB's HUGEINT — so no corpus size
    overflows it). Empty clusters keep their previous centroid.

    Per round: assignment is a narrow projection against literal
    centroids (k fold-expressions — zero shuffle, the clustering.py
    contract), the update one (cluster, dim) map-side-combined
    aggregate; the k·dim integer centroid table is the per-round
    driver scalar (the convergence-scalar class, NND.scala:118).

    Returns (round, inertia_micro2, n_clusters) — inertia in micro²
    units (quant² × L2²), monotone non-increasing over rounds."""
    import math  # noqa: PLC0415

    qexpr = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * quant + F.lit(0.5)).cast("long"),
    )
    qv = df.select(F.col(id_col).alias("id"), qexpr.alias("q")).localCheckpoint(
        eager=True
    )
    cents = {
        int(r["id"]): [int(x) for x in r["q"]]
        for r in qv.filter(F.col("id") < k).collect()
    }
    if not cents:
        msg = (
            f"kmeans_curve seeds centroids from ids < k={k} (the q178 "
            "oracle convention); this corpus has no such ids — remap "
            "ids to start at 0 or raise k"
        )
        raise ValueError(msg)
    rows = []
    for t in range(1, iters + 1):
        cand = [
            F.struct(
                F.aggregate(
                    F.zip_with(
                        "q",
                        F.array(*[F.lit(x).cast("long") for x in cv]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                ).alias("dist"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, cv in sorted(cents.items())
        ]
        best = F.array_min(F.array(*cand))
        assigned = qv.select(
            "q",
            best["cid"].cast("long").alias("cid"),
            best["dist"].alias("mind"),
        )
        # ONE map-side-combined k-row aggregate per round serves both
        # the curve row (Σ mind, #clusters) and — on non-final rounds —
        # the centroid update (per-dim Σq as 'dim' columnar sums). The
        # former three passes (full N-row checkpoint + inertia agg +
        # posexplode×dim regroup) shipped O(N·dim) rows to local disk
        # and through an exchange each round; this ships O(k·dim)
        # partial-agg cells and touches the corpus exactly once.
        dim = len(next(iter(cents.values())))
        # Per-dim sums stay in LONG: |component| <= quant (unit-range
        # inputs x micro grid), so the sum overflows 2^63 only past
        # ~9e12 rows per cluster — far beyond any corpus this engine
        # partitions into one aggregate. Long buffers keep the k-row
        # hash aggregate on the primitive codegen fast path; the
        # decimal variant allocated 64 Decimals per input row and
        # measured ~1.5x slower end-to-end. Inertia is different:
        # per-row mind is O(dim x quant^2) ~ 2.6e14, so its corpus sum
        # genuinely needs DECIMAL(38,0) and keeps it.
        per_dim = (
            [
                F.sum(F.element_at("q", i + 1)).alias(f"s{i}")
                for i in range(dim)
            ]
            if t < iters
            else []
        )
        stats = (
            assigned.groupBy("cid")
            .agg(
                F.sum(F.col("mind").cast("decimal(38,0)")).alias("sm"),
                F.count("*").alias("n"),
                *per_dim,
            )
            .localCheckpoint(eager=True)
        )
        rows.append(
            stats.agg(
                F.sum("sm").cast("double").alias("inertia_micro2"),
                F.count("*").alias("n_clusters"),
            ).select(
                F.lit(t).cast("long").alias("round"),
                "inertia_micro2",
                F.col("n_clusters").cast("long").alias("n_clusters"),
            )
        )
        if t < iters:
            got = stats.collect()
            # loud overflow guard for the LONG per-dim sums (ADVICE
            # r15): |component| <= quant, so a cluster's sum is exact
            # while n * quant < 2^63 — assert the bound instead of
            # silently wrapping into corrupted centroids
            for r in got:
                if r["n"] >= (1 << 63) // (quant + 1):
                    msg = (
                        f"k-means cluster {r['cid']} holds {r['n']} rows: "
                        "per-dim LONG sums could overflow; shrink the "
                        "corpus per aggregate or widen to DECIMAL"
                    )
                    raise OverflowError(msg)
            upd = {
                int(r["cid"]): [
                    int(math.floor(float(r[f"s{i}"]) / r["n"] + 0.5))
                    for i in range(dim)
                ]
                for r in got
            }
            cents = {cid: upd.get(cid, cv) for cid, cv in cents.items()}
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("round")


# ----------------------- persisted mergeable covariance statistics

def _cov_partials(df: DataFrame, vec_col: str, dim: int, quant: int):
    """Exact integer moment partials of a batch: (i, j, a) upper-
    triangle second moments + (i, b, n) first moments — the same
    explode as :func:`int_covariance`, stopped BEFORE the N-division
    so the result is a pure sum (associative, mergeable, retractable
    by subtraction)."""
    q = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * quant + F.lit(0.5)).cast("long"),
    )
    rows = df.select(q.alias("q"))
    g = rows.select(F.posexplode("q").alias("i0", "qi"), "q")
    second = (
        g.select(
            (F.col("i0") + 1).alias("i"),
            "qi",
            F.posexplode(
                F.slice("q", F.col("i0") + 1, F.lit(dim) - F.col("i0"))
            ).alias("k0", "qj"),
        )
        .select("i", (F.col("i") + F.col("k0")).alias("j"), (F.col("qi") * F.col("qj")).alias("p"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("p").cast("decimal(38,0)")).alias("a"))
    )
    first = (
        g.select((F.col("i0") + 1).alias("i"), "qi")
        .groupBy("i")
        .agg(
            F.sum(F.col("qi").cast("decimal(38,0)")).alias("b"),
            F.count("*").alias("n"),
        )
    )
    return second, first


def build_cov_stats(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    dim: int = 64,
    quant: int = COV_QUANT,
) -> None:
    """Persist the MERGEABLE covariance statistics of an embedding
    corpus — the incremental-PCA sidecar (8th persisted family, the
    algebraic one): because every stored number is an exact integer
    SUM (Σqᵢqⱼ, Σqᵢ, N — the :func:`int_covariance` discipline),
    extending with a batch is addition, retracting one is subtraction,
    and extend == fresh-rebuild EXACTLY, not approximately. O(d²)
    stored rows regardless of corpus size; a spectrum probe
    (:func:`cov_from_stats` + :func:`top_eigen_power`) never rescans
    the corpus."""
    from spark_nnd_spark.operators.state_commit import next_version  # noqa: PLC0415

    spark = df.sparkSession
    second, first = _cov_partials(df, vec_col, dim, quant)
    spark.createDataFrame(
        [(int(dim), int(quant))], "dim int, quant long"
    ).write.mode("overwrite").parquet(f"{path}/meta")
    _commit_cov_state(
        spark, path, next_version(spark, path), second, first,
        spark.createDataFrame([], "batch_id long"),
    )


def cov_state_dir(spark, path: str) -> str:
    """Directory of the LATEST committed stats version — the only
    state readers ever see (operators/state_commit, the shared
    atomic-commit path of the algebraic families)."""
    from spark_nnd_spark.operators.state_commit import state_dir  # noqa: PLC0415

    return state_dir(spark, path)


def _commit_cov_state(
    spark, path: str, version: int, second, first, applied
) -> None:
    """One atomic rename publishes moments + applied markers together
    (operators/state_commit) — 'batch applied' and 'batch marked
    applied' are one indivisible event, closing the double-count
    window a replayed at-least-once delivery could otherwise hit."""
    from spark_nnd_spark.operators.state_commit import commit_state  # noqa: PLC0415

    commit_state(
        spark, path, version,
        {"second": second, "first": first, "applied": applied},
    )


def _merge_with_marker(
    spark, path: str, df: DataFrame, vec_col: str, sign: int, batch_id
) -> None:
    """Shared extend/retract body. Unlike the set-based index families
    (where a replayed append is absorbed by downstream distincts), a
    replayed MERGE double-counts — so callers with at-least-once
    delivery (streams, retried jobs) pass ``batch_id`` and the merge
    becomes at-most-once: the applied-batch table lives INSIDE the
    versioned state and is published by the same atomic rename as the
    moments themselves, so there is no window where a batch is applied
    but unmarked (or marked but unapplied). Markerless calls
    (``batch_id=None``) are for one-shot batch jobs."""
    state = cov_state_dir(spark, path)
    applied = spark.read.parquet(f"{state}/applied")
    if batch_id is not None and applied.filter(
        F.col("batch_id") == int(batch_id)
    ).take(1):
        return
    meta = spark.read.parquet(f"{path}/meta").first()
    second2, first2 = _cov_partials(df, vec_col, meta["dim"], meta["quant"])
    s = F.lit(sign).cast("long")
    second = (
        spark.read.parquet(f"{state}/second")
        .unionByName(second2.select("i", "j", (F.col("a") * s).alias("a")))
        .groupBy("i", "j")
        .agg(F.sum("a").alias("a"))
    )
    first = (
        spark.read.parquet(f"{state}/first")
        .unionByName(
            first2.select("i", (F.col("b") * s).alias("b"), (F.col("n") * s).alias("n"))
        )
        .groupBy("i")
        .agg(F.sum("b").alias("b"), F.sum("n").alias("n"))
    )
    if batch_id is not None:
        applied = applied.unionByName(
            spark.createDataFrame([(int(batch_id),)], "batch_id long")
        )
    version = int(state.rsplit("v=", 1)[1]) + 1
    _commit_cov_state(spark, path, version, second, first, applied)


def extend_cov_stats(
    spark, path: str, new_df: DataFrame, vec_col: str = "embedding",
    batch_id: int | None = None,
) -> None:
    """Admit a batch: ADD its integer moment partials to the stored
    sums. Exactly equals a fresh build over the union (integer sums
    are associative+commutative — tested), and costs one batch scan +
    an O(d²) merge. Pass ``batch_id`` under at-least-once delivery:
    a replayed extend with an applied marker is a no-op (tested)."""
    _merge_with_marker(spark, path, new_df, vec_col, 1, batch_id)


def retract_cov_stats(
    spark, path: str, old_df: DataFrame, vec_col: str = "embedding",
    batch_id: int | None = None,
) -> None:
    """Retract documents: SUBTRACT their moment partials — the
    algebraic retraction no other index family gets for free (no
    tombstones, no compaction; the stats after retract(B) equal a
    fresh build without B exactly — tested). ``batch_id`` gives the
    same at-most-once replay guard as extend."""
    _merge_with_marker(spark, path, old_df, vec_col, -1, batch_id)


def cov_from_stats(spark, path: str) -> DataFrame:
    """The symmetric integer covariance matrix served from the
    persisted stats — same (i, j, c) contract as
    :func:`int_covariance`, zero corpus I/O."""
    state = cov_state_dir(spark, path)
    second = spark.read.parquet(f"{state}/second")
    first = spark.read.parquet(f"{state}/first")
    cov_u = (
        second.join(F.broadcast(first.select("i", F.col("b").alias("bi"), "n")), "i")
        .join(F.broadcast(first.select(F.col("i").alias("j"), F.col("b").alias("bj"))), "j")
        .select(
            "i",
            "j",
            F.floor(
                F.col("a").cast("double") / F.col("n")
                - (F.col("bi").cast("double") / F.col("n"))
                * (F.col("bj").cast("double") / F.col("n"))
                + F.lit(0.5)
            ).cast("long").alias("c"),
        )
    )
    return cov_u.unionByName(
        cov_u.filter("i <> j").select(F.col("j").alias("i"), F.col("i").alias("j"), "c")
    )


def abtt_scores(
    df: DataFrame,
    mu: list[int],
    v: list[int],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = COV_QUANT,
    vscale: int = EIG_VSCALE,
) -> DataFrame:
    """All-but-the-top projection scores (Mu & Viswanath, ICLR 2018:
    subtract the corpus mean, then remove the top principal
    direction(s) — the standard anisotropy correction for embedding
    spaces). Given the micro-unit mean ``mu`` and the trained
    ``vscale``-scaled direction ``v`` (:func:`top_eigen_vector`), emit
    per vector the signed projection onto the top direction and the
    residual norm after removing it — the corrected vector's length.
    A large |proj| relative to resid_norm marks the vectors the
    dominant direction explains (the ones whose cosine similarities
    are inflated before correction).

    Cross-engine exactness: centered coordinates and both inner
    products are pure BIGINT arithmetic (order-free); the two final
    rescale/sqrt steps are fixed IEEE ops on exact integers. The
    direction is unit up to the integer grid (‖v/vscale‖ ≈ 1 ± 1e-5)
    — a diagnostic-grade correction, documented.

    Scale: one narrow corpus projection — mean and direction are
    literals, nothing shuffles."""
    mu_lit = F.array(*[F.lit(int(x)).cast("long") for x in mu])
    v_lit = F.array(*[F.lit(int(x)).cast("long") for x in v])
    qexpr = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * quant + F.lit(0.5)).cast("long"),
    )
    base = df.select(
        F.col(id_col), F.zip_with(qexpr, mu_lit, lambda a, b: a - b).alias("xc")
    )
    proj_int = F.aggregate(
        F.zip_with("xc", v_lit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    norm2_int = F.aggregate(
        F.transform("xc", lambda a: a * a),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    proj_d = proj_int.cast("double") / F.lit(float(quant) * float(vscale))
    norm2_d = norm2_int.cast("double") / F.lit(float(quant) * float(quant))
    return base.select(
        id_col,
        F.round(proj_d, 6).alias("proj"),
        F.round(
            F.sqrt(F.greatest(norm2_d - proj_d * proj_d, F.lit(0.0))), 6
        ).alias("resid_norm"),
    )


def deflate(
    cov: DataFrame,
    v: list[int],
    lam_d: float,
) -> DataFrame:
    """Hotelling deflation: C' = C − λ·(v vᵀ)/(vᵀv), in the integer
    matrix units — the step that turns the top-eigenvector loop into
    a top-K spectrum (power-iterate, deflate, repeat). ``v`` is the
    integer iterate (:func:`top_eigen_vector`), ``lam_d`` the
    matrix-unit eigenvalue estimate; vᵀv is an exact integer, so the
    per-cell correction floor(λ·vᵢ·vⱼ/vᵀv + 0.5) is a fixed
    deterministic double expression. Residual-direction leakage is
    bounded by the iterate's quantization (‖v‖/vscale − 1 ≈ 1e-5) —
    fine for spectrum diagnostics, documented."""
    vtv = sum(x * x for x in v)  # exact Python int
    v_lit = F.array(*[F.lit(int(x)).cast("long") for x in v])
    corr = F.floor(
        F.lit(float(lam_d))
        * F.element_at(v_lit, F.col("i").cast("int")).cast("double")
        * F.element_at(v_lit, F.col("j").cast("int")).cast("double")
        / F.lit(float(vtv))
        + F.lit(0.5)
    ).cast("long")
    return cov.select("i", "j", (F.col("c") - corr).alias("c"))
