"""Operator-level tests: relational primitives, dedup family, ANN
recall, input validation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_nnd_spark.operators.relational import (
    dedup_with_preference,
    group_top_k,
    sample_per_group,
)
from spark_nnd_spark.operators import dedup as DD
from spark_nnd_spark.operators import similarity as SIM
from spark_nnd_spark.schemas import InvalidPointsError, validate_points, normalize_points
from tests.conftest import SF_SMOKE



pytestmark = pytest.mark.slow  # heavy tier: deselected from the default fast run

def test_group_top_k(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 30.0, "b"), (1, 20.0, "c"), (2, 5.0, "d")],
        "k long, v double, tag string",
    )
    out = group_top_k(df, ["k"], [F.desc("v")], 2).collect()
    got = {(r["k"], r["tag"]) for r in out}
    assert got == {(1, "b"), (1, "c"), (2, "d")}


def test_dedup_with_preference(spark):
    df = spark.createDataFrame(
        [(1, "x", True, 0.5), (1, "x", False, 0.9), (1, "y", False, 0.7)],
        "k long, cand string, is_b boolean, sim double",
    )
    out = dedup_with_preference(df, ["k", "cand"], [F.desc("is_b")]).collect()
    by_cand = {r["cand"]: r for r in out}
    assert by_cand["x"]["is_b"] is True  # B-preferred copy survives
    assert len(out) == 2


def test_sample_per_group_deterministic(spark):
    df = spark.createDataFrame([(g, i) for g in range(3) for i in range(20)], "g long, id long")
    a = sample_per_group(df, ["g"], 0.3, seed=5).filter("sampled").collect()
    b = sample_per_group(df, ["g"], 0.3, seed=5).filter("sampled").collect()
    assert sorted((r["g"], r["id"]) for r in a) == sorted((r["g"], r["id"]) for r in b)
    from collections import Counter

    per_group = Counter(r["g"] for r in a)
    assert all(v == 6 for v in per_group.values())  # ceil(0.3*20)


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """LSH candidates must recover the high-jaccard pairs (banding with
    these params catches jaccard ≥ 0.2 with high probability)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    exact = {
        (r["id_a"], r["id_b"])
        for r in DD.jaccard_pairs(docs, n=3, threshold=0.2).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_lsh_pairs(docs, num_hashes=16, bands=4, threshold=0.2).collect()
    }
    assert lsh <= exact  # verify step guarantees precision
    assert len(lsh) >= 0.8 * len(exact), f"LSH recall {len(lsh)}/{len(exact)}"


def test_ann_lsh_recall_vs_brute(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    brute = SIM.ann_brute_topk(emb, q, k=5).collect()
    lsh = SIM.ann_lsh_topk(emb, q, k=5, n_planes=8, seed=42).collect()
    bt = {}
    for r in brute:
        bt.setdefault(r["query_id"], set()).add(r["nb_id"])
    lt = {}
    for r in lsh:
        lt.setdefault(r["query_id"], set()).add(r["nb_id"])
    recall = sum(len(bt[q] & lt.get(q, set())) for q in bt) / sum(len(v) for v in bt.values())
    assert recall >= 0.5, f"ANN-LSH recall {recall:.2f}"  # multiprobe 8-bit buckets


def test_binary_topk_recall_and_shortlist_containment(spark):
    """The 1-bit tier: (a) recall@5 vs brute stays above a floor set
    well under the measured value (0.50 at sf0.001/sf0.01 with the
    4x-oversample shortlist=20 — 64-dim sign bits are a coarse code;
    recall is bought with the shortlist knob: 0.68 at 50, 0.84 at
    100, measured); (b) every returned neighbor must come from the
    hamming shortlist AND carry the exact cosine — cross-checked
    against brute's scores."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    brute = SIM.ann_brute_topk(emb, q, k=5).collect()
    binr = SIM.binary_hamming_topk(emb, q, k=5, shortlist=20).collect()
    bt = {}
    for r in brute:
        bt.setdefault(r["query_id"], set()).add(r["nb_id"])
    bn = {}
    for r in binr:
        bn.setdefault(r["query_id"], set()).add(r["nb_id"])
        assert 0 <= r["hamming"] <= 64
    recall = sum(len(bt[k] & bn.get(k, set())) for k in bt) / sum(
        len(v) for v in bt.values()
    )
    assert recall >= 0.3, f"binary recall {recall:.2f}"
    # exact rerank: cosines must equal brute's cosine for shared pairs
    bcos = {(r["query_id"], r["nb_id"]): r["cosine"] for r in brute}
    for r in binr:
        key = (r["query_id"], r["nb_id"])
        if key in bcos:
            assert abs(r["cosine"] - bcos[key]) < 1e-12


def test_connected_components_multihop(spark):
    from spark_nnd_spark.operators.graph import connected_components

    # two chains and a singleton edge: {1-2-3-4}, {10-11}, {20-21}
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (21, 20)], "id_a long, id_b long"
    )
    got = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_lsh_signature_udf_matches_expr(spark):
    """The Arrow matmul signature kernel equals the pure-expression form
    table by table (same hyperplanes, same sign convention)."""
    import numpy as np

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(50)
    dim = len(emb.select("embedding").first()[0])
    n_planes, n_tables, seed = 6, 3, 42
    planes = np.vstack(
        [SIM.hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    )
    udf_sigs = SIM.lsh_signatures_udf(planes, n_tables)
    expr_sigs = F.array(
        *[
            SIM.lsh_signature_expr(
                "embedding", SIM.hyperplanes(dim, n_planes, seed + 1000 * t)
            )
            for t in range(n_tables)
        ]
    )
    rows = emb.select(
        udf_sigs(F.col("embedding").cast("array<double>")).alias("u"),
        expr_sigs.alias("e"),
    ).collect()
    assert all(list(r["u"]) == list(r["e"]) for r in rows)


def test_ann_ivf_recall_vs_brute(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    brute = SIM.ann_brute_topk(emb, q, k=5).collect()
    ivf = SIM.ann_ivf_topk(emb, q, k=5, n_centroids=8, n_probe=3, seed=42).collect()
    bt, it = {}, {}
    for r in brute:
        bt.setdefault(r["query_id"], set()).add(r["nb_id"])
    for r in ivf:
        it.setdefault(r["query_id"], set()).add(r["nb_id"])
    recall = sum(len(bt[q] & it.get(q, set())) for q in bt) / sum(len(v) for v in bt.values())
    assert recall >= 0.6, f"ANN-IVF recall {recall:.2f}"
    # determinism: sample-trained centroids are seeded
    again = SIM.ann_ivf_topk(emb, q, k=5, n_centroids=8, n_probe=3, seed=42).collect()
    assert sorted(map(tuple, ivf)) == sorted(map(tuple, again))


def test_embedding_neardup_lsh_finds_exact_pairs(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"]) for r in SIM.embedding_neardup_exact(emb, 0.45).collect()
    }
    # 0.45 is a loose threshold (θ≈63°) for this synthetic corpus; real
    # near-dup thresholds (≥0.95) collide far more readily — compensate
    # with short signatures and more tables here.
    lsh = {
        (r["id_a"], r["id_b"])
        for r in SIM.embedding_neardup(emb, 0.45, n_planes=3, n_tables=8).collect()
    }
    assert lsh <= exact
    if exact:
        assert len(lsh) >= 0.7 * len(exact)


def test_validate_points_rejects_bad_input(spark):
    good = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])], "id long, features array<double>"
    )
    validate_points(normalize_points(good))  # no raise

    dup = spark.createDataFrame(
        [(0, [1.0]), (0, [2.0])], "id long, features array<double>"
    )
    with pytest.raises(InvalidPointsError, match="duplicate"):
        validate_points(normalize_points(dup))

    raggy = spark.createDataFrame(
        [(0, [1.0]), (1, [2.0, 3.0])], "id long, features array<double>"
    )
    with pytest.raises(InvalidPointsError, match="dimensionality"):
        validate_points(normalize_points(raggy))

    with pytest.raises(InvalidPointsError, match="columns"):
        normalize_points(spark.createDataFrame([(1,)], "id long"))


def test_exact_dedup_counts(spark, duck):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = DD.exact_dedup(docs).collect()
    n_docs = docs.count()
    assert sum(r["dup_count"] for r in out) == n_docs
    assert len(out) == duck.sql("SELECT COUNT(DISTINCT text) FROM documents").fetchone()[0]


def test_sink_roundtrip_partitioned(spark, tmp_path):
    from spark_nnd_spark.sources.sinks import read_back, write_table

    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(90)], "id long, part int, v double"
    )
    path = str(tmp_path / "out")
    write_table(df, path, partition_by=["part"], target_file_rows=30)
    back = read_back(spark, path)
    assert back.count() == 90
    assert {r["part"] for r in back.select("part").distinct().collect()} == {0, 1, 2}
    # partition pruning reaches the scan
    plan = back.filter(back.part == 1)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert sorted(r["id"] for r in back.collect()) == list(range(90))


def test_jaccard_df_cut_drops_hot_shingle(spark):
    """Skew guard (dedup.shingle_postings max_shingle_freq): a shingle
    present in every doc must not drive the self-join; with the cut it
    contributes nothing to intersections, and pairs whose only overlap
    was the hot shingle disappear."""
    boiler = "the quick brown fox"  # one 3-shingle + fragments in every doc
    rows = [(i, f"{boiler} unique{i} filler{i} tail{i}") for i in range(20)]
    # two genuinely similar docs sharing a long distinctive run
    rows += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon eta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # explicit None: the operator DEFAULT is now the corpus-derived
    # 'auto' budget cap, which (correctly) cuts this fixture's
    # every-doc boilerplate shingle — this test wants the raw join
    uncapped = {(r["id_a"], r["id_b"])
                for r in DD.jaccard_pairs(
                    docs, n=3, threshold=0.1, max_shingle_freq=None
                ).collect()}
    capped = {(r["id_a"], r["id_b"])
              for r in DD.jaccard_pairs(docs, n=3, threshold=0.1,
                                        max_shingle_freq=5).collect()}
    assert (100, 101) in uncapped and (100, 101) in capped
    # boilerplate-only pairs exist uncapped, vanish with the guard on
    assert any(a < 100 and b < 100 for a, b in uncapped)
    assert not any(a < 100 and b < 100 for a, b in capped)


def test_lsh_band_cap_drops_hot_bucket(spark):
    """Skew guard (minhash_lsh_pairs max_band_freq): a cluster of
    identical docs collides in every band; with the cap below the
    cluster size its buckets are dropped and the m^2 candidate blowup
    never reaches the join, while unrelated similar pairs survive."""
    rows = [(i, "same boilerplate text repeated everywhere always") for i in range(30)]
    # identical pair: identical signatures -> collide in every band,
    # so survival under the cap is deterministic
    rows += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon zeta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = {(r["id_a"], r["id_b"])
              for r in DD.minhash_lsh_pairs(docs, num_hashes=16, bands=4,
                                            threshold=0.1, max_band_freq=10).collect()}
    assert (100, 101) in capped
    assert not any(a < 100 and b < 100 for a, b in capped)
    # uncapped, the identical cluster produces all 30*29/2 pairs
    uncapped = DD.minhash_lsh_pairs(docs, num_hashes=16, bands=4,
                                    threshold=0.1).count()
    assert uncapped >= 30 * 29 / 2


def test_ann_lsh_query_pred_matches_queries_path(spark):
    """Self-search elision (query_pred): driver-built probes must give
    exactly the queries-DataFrame path's results, with fewer Arrow
    signature stages in the plan."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    pred = F.col("vec_id") < 10
    old = SIM.ann_lsh_topk(emb, emb.filter(pred), k=5, n_planes=8, seed=42)
    new = SIM.ann_lsh_topk(emb, None, k=5, n_planes=8, seed=42,
                           query_pred=pred, dim=64)
    assert sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))
    n_old = old._jdf.queryExecution().executedPlan().toString().count("ArrowEvalPython")
    n_new = new._jdf.queryExecution().executedPlan().toString().count("ArrowEvalPython")
    assert n_new < n_old

    with pytest.raises(ValueError):
        SIM.ann_lsh_topk(emb, emb, query_pred=pred)
    with pytest.raises(ValueError):
        SIM.ann_lsh_topk(emb, None)

    # empty query set -> empty, schema intact
    empty = SIM.ann_lsh_topk(emb, None, query_pred=F.col("vec_id") < 0, dim=64)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "nb_id", "rank", "cosine"]

    # broadcast-small cap is per-call tunable: a tiny cap trips on a
    # 10-row query set, and raising it back restores the default path
    with pytest.raises(ValueError, match="more than 4 rows"):
        SIM.ann_lsh_topk(emb, None, query_pred=pred, dim=64, max_query_rows=4)
    widened = SIM.ann_lsh_topk(emb, None, k=5, n_planes=8, seed=42,
                               query_pred=pred, dim=64, max_query_rows=16)
    assert sorted(map(tuple, widened.collect())) == sorted(map(tuple, old.collect()))


def test_connected_components_long_chain_log_rounds(spark):
    """Pointer jumping: a 1000-node chain (diameter 999) must converge
    in O(log N) rounds, not O(diameter)."""
    from spark_nnd_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "id_a long, id_b long"
    )
    rounds = []
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            pairs, on_round=lambda i, c: rounds.append((i, c))
        ).collect()
    }
    assert got == {i: 0 for i in range(1000)}
    assert len(rounds) <= 12, f"chain took {len(rounds)} rounds"

    # The production convergence path (monotone label-sum aggregate,
    # used when no on_round hook listens) must land on exactly the same
    # fixpoint as the exact changed-count path exercised above.
    got_sum_path = {
        r["id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got_sum_path == got


def test_asof_join_edge_cases(spark):
    """asof_join semantics: latest right.ts <= left.ts per key; equal
    timestamps match; duplicate right timestamps resolve by highest
    tiebreak; no prior right row -> nulls."""
    import datetime as dt

    from spark_nnd_spark.operators.events import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, 10, t(5)), (2, 10, t(10)), (3, 10, t(2)), (4, 20, t(9)), (5, 30, t(9))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        # user 10: rows at t3 and two at t10 (tiebreak -> event_id 102)
        [(100, 10, t(3), 1.0), (101, 10, t(10), 2.0), (102, 10, t(10), 3.0),
         # user 20: only a LATER row (no match for left at t9)
         (103, 20, t(30), 9.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {r["event_id"]: (r["value_asof"], r["ts_asof"]) for r in
           asof_join(left, right).collect()}
    assert got[1] == (1.0, t(3))       # latest <= t5 is t3
    assert got[2] == (3.0, t(10))      # equal ts matches, tiebreak 102
    assert got[3] == (None, None)      # nothing at or before t2
    assert got[4] == (None, None)      # user 20's only row is later
    assert got[5] == (None, None)      # user 30 absent from right


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located join: two tables bucketed identically on the join key
    must join with zero Exchange in the plan (the 100 TB recurring-join
    primitive), and results must match the plain shuffle join."""
    from spark_nnd_spark.sources.sinks import write_bucketed

    a = spark.createDataFrame([(i, float(i)) for i in range(200)], "k long, va double")
    b = spark.createDataFrame([(i, i * 10) for i in range(0, 200, 2)], "k long, vb long")
    write_bucketed(a, "t_bucket_a", ["k"], 4, sort_by=["k"], mode="overwrite",
                   path=str(tmp_path / "a"))
    write_bucketed(b, "t_bucket_b", ["k"], 4, sort_by=["k"], mode="overwrite",
                   path=str(tmp_path / "b"))
    try:
        ta, tb = spark.table("t_bucket_a"), spark.table("t_bucket_b")
        # hint merge: at test size Spark would broadcast (also fine, but
        # the property under test is the bucketed SMJ with no shuffle)
        joined = ta.hint("merge").join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        got = sorted(map(tuple, joined.collect()))
        want = sorted(map(tuple, a.join(b, "k").collect()))
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_deterministic_sample_nested_and_reproducible(spark):
    from spark_nnd_spark.operators import sampling as SA

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    s20 = {r["doc_id"] for r in SA.deterministic_sample(docs, 0.2).select("doc_id").collect()}
    s20_again = {r["doc_id"] for r in SA.deterministic_sample(docs, 0.2).select("doc_id").collect()}
    s40 = {r["doc_id"] for r in SA.deterministic_sample(docs, 0.4).select("doc_id").collect()}
    n = docs.count()
    assert s20 == s20_again  # no RNG state: exact replay
    assert s20 <= s40  # thresholds nest: growing the rate keeps the old sample
    assert abs(len(s40) / n - 0.4) < 0.15  # uniform hash ≈ the rate


def test_stratified_sample_rates_per_stratum(spark):
    from spark_nnd_spark.operators import sampling as SA

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rates = {"en": 0.2, "fr": 1.0}
    out = SA.stratified_sample(docs, rates, strata_col="lang", id_col="doc_id")
    got = {r["lang"]: r["c"] for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    tot = {r["lang"]: r["c"] for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert set(got) <= {"en", "fr"}  # default rate 0 drops unlisted strata
    assert got["fr"] == tot["fr"]  # rate 1.0 keeps everything
    assert 0.0 < got["en"] / tot["en"] < 0.5  # dominant stratum downsampled


def test_range_join_matches_naive_theta_join(spark):
    from spark_nnd_spark.operators import events as EV

    from spark_nnd_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "ts"
    ).limit(2000)
    base = ev.select("event_id", "user_id", "ts")
    got = {
        (r["event_id"], r["event_id_r"])
        for r in EV.range_join(base, base, keys=["user_id"], lower_sec=-300, upper_sec=300).collect()
    }
    a, b = base.alias("a"), base.alias("b")
    want = {
        (r["la"], r["lb"])
        for r in a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & F.col("b.ts").cast("long").between(
                F.col("a.ts").cast("long") - 300, F.col("a.ts").cast("long") + 300
            ),
        )
        .select(F.col("a.event_id").alias("la"), F.col("b.event_id").alias("lb"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_simhash_neardup_pairs_exact_within_pigeonhole_radius(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    sims = {r["doc_id"]: r["simhash"] for r in DD.simhash_df(docs).collect()}
    ids = sorted(sims)
    exact_h2 = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sims[a] ^ sims[b]).count("1") <= 2
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in DD.simhash_neardup_pairs(docs, max_hamming=3).collect()
    }
    # pigeonhole: ≤ SIMHASH_BANDS−1 differing bits can't straddle every
    # band, so banding finds ALL pairs at hamming ≤ 2 (no guard set)
    assert exact_h2 <= set(got)
    for (a, b), h in got.items():
        assert h == bin(sims[a] ^ sims[b]).count("1") and h <= 3


def test_label_centroids_match_numpy(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = {(r["label"], r["i"]): (r["centroid"], r["n"]) for r in SIM.label_centroids(emb).collect()}
    rows = emb.select("label", "embedding").collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(np.array(r["embedding"], dtype=np.float64))
    for lbl, vecs in by_label.items():
        mean = np.mean(vecs, axis=0)
        for i in range(len(mean)):
            c, n = got[(lbl, i)]
            assert n == len(vecs)
            assert abs(c - mean[i]) < 1e-9


def test_jsonl_csv_roundtrip(spark, tmp_path):
    from spark_nnd_spark.sources import read_csv, read_jsonl, write_csv, write_jsonl

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    want = {(r["doc_id"], r["text"], r["lang"]) for r in docs.collect()}

    jdir = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, jdir, partition_by=["lang"])
    back = read_jsonl(spark, jdir, schema="doc_id long, text string, source string, n_chars long, lang string")
    got = {(r["doc_id"], r["text"], r["lang"]) for r in back.collect()}
    assert got == want

    cdir = str(tmp_path / "cust_csv")
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    write_csv(cust, cdir)
    back_c = read_csv(spark, cdir, schema="c_custkey long, c_name string, c_acctbal double")
    assert {tuple(r) for r in back_c.collect()} == {tuple(r) for r in cust.collect()}

    # schema and infer are mutually exclusive: the schema would silently
    # win and no inference would run — reject the ambiguous call
    with pytest.raises(ValueError, match="both schema and infer"):
        read_csv(spark, cdir, schema="c_custkey long", infer=True)
    with pytest.raises(ValueError, match="requires a schema"):
        read_csv(spark, cdir)


def test_decontaminate_flags_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps away"),      # shares one 5-shingle
            (11, "completely unrelated training text here"),
            (12, "quick brown fox jumps over the lazy"),  # shares three 5-shingles
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_hits"], r["contaminated"]) for r in
           DD.decontaminate(corpus, bench, n=5).collect()}
    assert got[10] == (1, True)
    assert got[11] == (0, False)
    assert got[12] == (3, True)
    # scale contract: the benchmark side broadcasts; the corpus never shuffles
    plan = DD.decontaminate(corpus, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_salted_join_spreads_hot_key_and_preserves_results(spark):
    from spark_nnd_spark.operators.relational import salted_join

    # one pathological key (0) holding 90% of the fact side
    fact = spark.createDataFrame(
        [(i, 0 if i < 900 else i % 7 + 1) for i in range(1000)], "row_id long, k long"
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(8)], "k long, label string")
    got = salted_join(fact, dim, key="k", salt_src="row_id", n_salts=8).collect()
    want = fact.join(dim, "k").collect()
    assert sorted((r["row_id"], r["label"]) for r in got) == sorted(
        (r["row_id"], r["label"]) for r in want
    )
    # the hot key's rows actually fan out across salts
    l = fact.withColumn("__salt", F.pmod(F.xxhash64("row_id"), F.lit(8)))
    n_buckets = l.filter("k = 0").select("__salt").distinct().count()
    assert n_buckets == 8


def test_sql_surface_matches_dataframe_path(spark):
    """The engine's spark.sql surface: corpus views registered once,
    then plain ANSI SQL plans through the same Catalyst pipeline as
    the DataFrame API (identical results by construction)."""
    from spark_nnd_spark.queries.relational import q2_group_count
    from spark_nnd_spark.sources import register_views

    register_views(spark, SF_SMOKE)
    got = spark.sql(
        "SELECT l_returnflag, COUNT(*) AS c FROM lineitem GROUP BY 1 ORDER BY 1"
    ).collect()
    want = q2_group_count(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


# ----------------------------------------------------------- funnel

def test_funnel_stages_ordering_and_strictness(spark):
    from datetime import datetime

    from spark_nnd_spark.operators.events import funnel_stages

    def ts(s):
        return datetime(2026, 1, 1, 0, 0, s)

    rows = [
        # user 1: full funnel in order → stage 3
        (1, 1, ts(1), "view"), (1, 2, ts(2), "click"), (1, 3, ts(3), "purchase"),
        # user 2: click BEFORE the first view never counts; the later
        # purchase needs a qualifying click → stage 1
        (2, 4, ts(1), "click"), (2, 5, ts(2), "view"), (2, 6, ts(3), "purchase"),
        # user 3: click at the SAME timestamp as the first view — the
        # strictly-after rule excludes it → stage 1
        (3, 7, ts(5), "view"), (3, 8, ts(5), "click"),
        # user 4: purchase with no view at all → stage 0
        (4, 9, ts(1), "purchase"),
        # user 5: second view→click pair after a premature click → 2
        (5, 10, ts(1), "click"), (5, 11, ts(2), "view"), (5, 12, ts(3), "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    out = {
        r["user_id"]: r
        for r in funnel_stages(df, ["view", "click", "purchase"]).collect()
    }
    assert out[1]["stage"] == 3 and out[1]["t_purchase"] is not None
    assert out[2]["stage"] == 1 and out[2]["t_click"] is None
    assert out[3]["stage"] == 1
    assert out[4]["stage"] == 0 and out[4]["t_view"] is None
    assert out[5]["stage"] == 2


# ----------------------------------------------------------- k-means

def test_kmeans_step_matches_numpy(spark):
    from spark_nnd_spark.operators.clustering import kmeans_step, seed_centroids

    rng = np.random.default_rng(7)
    X = rng.normal(size=(100, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    cents = seed_centroids(df, 4)
    assert [c[0] for c in cents] == [0, 1, 2, 3]
    step = kmeans_step(df, cents).collect()
    C = X[:4]
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    assign = d.argmin(1)
    assert len(step) == 4 * 8
    for r in step:
        members = X[assign == r["cluster_id"]]
        assert r["n"] == len(members)
        assert abs(members[:, r["i"]].mean() - r["centroid"]) < 1e-9


def test_kmeans_assignment_is_narrow(spark):
    """Assignment against literal centroids must be a pure projection:
    no exchange, no join — the corpus never shuffles."""
    from spark_nnd_spark.operators.clustering import kmeans_assign, seed_centroids

    rng = np.random.default_rng(3)
    X = rng.normal(size=(50, 4))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    assigned = kmeans_assign(df, seed_centroids(df, 3))
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_training_shards_deterministic_and_complete(spark, tmp_path):
    from pyspark.sql import functions as F2

    from spark_nnd_spark.sources import load_table
    from spark_nnd_spark.sources.sinks import read_back, write_training_shards

    d = load_table(spark, SF_SMOKE, "documents")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(d, p1, n_shards=8, id_col="doc_id", sort_within=["doc_id"])
    write_training_shards(d, p2, n_shards=8, id_col="doc_id", sort_within=["doc_id"])
    b1, b2 = read_back(spark, p1), read_back(spark, p2)
    # complete: nothing lost or duplicated
    assert b1.count() == d.count()
    # deterministic: same (doc_id, shard) membership across reruns
    m1 = {(r["doc_id"], r["shard"]) for r in b1.select("doc_id", "shard").collect()}
    m2 = {(r["doc_id"], r["shard"]) for r in b2.select("doc_id", "shard").collect()}
    assert m1 == m2
    # shard = xxhash64(id) % n, replayable in-engine
    expect = {
        (r["doc_id"], r["s"])
        for r in d.select(
            "doc_id", F2.pmod(F2.xxhash64("doc_id"), F2.lit(8)).cast("int").alias("s")
        ).collect()
    }
    assert m1 == expect


def test_ivf_index_roundtrip_matches_inline(spark, tmp_path):
    """Persisted-index serving must reproduce the inline IVF result
    exactly (same centroids → same cells → same candidates), and the
    assignment layout must be hive-partitioned by cell."""
    import os

    from spark_nnd_spark.operators.similarity import (
        ann_ivf_query_index,
        ann_ivf_topk,
        build_ivf_index,
        train_ivf_centroids,
    )
    from spark_nnd_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    idx = str(tmp_path / "ivf")
    cents = build_ivf_index(emb, idx, n_centroids=8, seed=42)
    got = {
        (r["query_id"], r["nb_id"], r["rank"])
        for r in ann_ivf_query_index(spark, idx, queries, k=5, n_probe=3).collect()
    }
    inline = {
        (r["query_id"], r["nb_id"], r["rank"])
        for r in ann_ivf_topk(
            emb, queries, k=5, n_probe=3, centroids=cents
        ).collect()
    }
    assert got == inline and len(got) > 0
    # hive layout: one directory per cell
    cells = [d for d in os.listdir(f"{idx}/assignments") if d.startswith("cell=")]
    assert len(cells) == len({c for _, _, c in []} | {int(d.split("=")[1]) for d in cells})
    assert len(cells) >= 2
    # re-training is deterministic
    cents2 = train_ivf_centroids(emb, n_centroids=8, seed=42)
    import numpy as np2

    assert np2.allclose(cents, cents2)


def test_ivf_training_sizes_sample_without_a_count_job(spark):
    """The trainer's sampling rate comes from parquet footers (no
    corpus pass) or a caller-supplied n_rows; both must reproduce the
    count()-sized sample bit-for-bit, and a corpus smaller than
    n_centroids must fail loudly instead of silently training a
    degenerate index."""
    import numpy as np2
    import pytest as pt

    from spark_nnd_spark.operators.similarity import (
        _estimate_rows,
        train_ivf_centroids,
    )
    from spark_nnd_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    assert _estimate_rows(emb) == emb.count()
    # createDataFrame plans have no files → None → keep-everything rate
    mem = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(40)], "vec_id long, embedding array<double>"
    )
    assert _estimate_rows(mem) is None
    # metadata-sized, caller-sized, and in-memory paths all agree
    a = train_ivf_centroids(emb, n_centroids=8, seed=42)
    b = train_ivf_centroids(emb, n_centroids=8, seed=42, n_rows=emb.count())
    assert np2.allclose(a, b)
    with pt.raises(ValueError, match="n_centroids"):
        train_ivf_centroids(mem.filter(F.col("vec_id") < 4), n_centroids=8, seed=1)


def test_chunking_covers_every_token_exactly_with_stride(spark):
    """q65 invariants: every token of every doc lands in ≥1 chunk;
    every chunk except possibly the last is full-size; consecutive
    chunks overlap by CHUNK_TOKENS - CHUNK_STRIDE tokens."""
    from spark_nnd_spark.queries.pipeline import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        q65_chunk_documents,
    )
    from spark_nnd_spark.sources import load_table

    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    chunks = q65_chunk_documents(spark, SF_SMOKE).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, toks in docs.items():
        if not toks:
            assert doc_id not in by_doc
            continue
        rows = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        # contiguous chunk indexes from 0
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        covered = 0
        for r in rows:
            start = r["chunk_idx"] * CHUNK_STRIDE
            got = r["chunk_text"].split(" ") if r["chunk_text"] else []
            assert got == toks[start : start + CHUNK_TOKENS]
            assert r["n_tokens"] == len(got)
            covered = max(covered, start + len(got))
        assert covered == len(toks)  # full coverage, nothing beyond
        if len(rows) > 1:
            assert all(r["n_tokens"] == CHUNK_TOKENS for r in rows[:-1])


def test_end_to_end_corpus_build_is_deterministic(spark, tmp_path):
    """The full corpus-build chain a reference user would run — quality
    gate → LSH near-dup keep/drop → stratified downsample → sharded
    training export — must produce byte-identical shard membership and
    content across two independent runs (the replayability contract
    every resumable 100 TB build depends on)."""
    from spark_nnd_spark.functions import text as TX
    from spark_nnd_spark.operators import dedup as DD
    from spark_nnd_spark.operators import sampling as SA
    from spark_nnd_spark.operators.graph import connected_components
    from spark_nnd_spark.sources import load_table
    from spark_nnd_spark.sources.sinks import write_training_shards

    def build(out_dir: str):
        d = load_table(spark, SF_SMOKE, "documents")
        # quality gate (narrow)
        kept = d.filter(
            (TX.token_count_expr("text") >= 5)
            & (TX.stopword_ratio_expr("text") <= 0.6)
        )
        # near-dup keep/drop: keep component labels + singletons
        pairs = DD.minhash_lsh_pairs(kept, num_hashes=16, bands=4, n=3, threshold=0.2)
        comp = connected_components(pairs).select(
            F.col("id").alias("doc_id"), "component"
        )
        deduped = (
            kept.join(comp, "doc_id", "left")
            .filter(F.col("component").isNull() | (F.col("component") == F.col("doc_id")))
            .drop("component")
        )
        # deterministic stratified downsample by lang
        sampled = SA.stratified_sample(
            deduped, {"en": 0.5, "fr": 1.0, "de": 1.0, "es": 1.0, "ja": 1.0},
            strata_col="lang", id_col="doc_id",
        )
        write_training_shards(sampled, out_dir, n_shards=4, id_col="doc_id",
                              sort_within=["doc_id"])
        return {
            (r["shard"], r["doc_id"], r["text"])
            for r in spark.read.parquet(out_dir).select("shard", "doc_id", "text").collect()
        }

    a = build(str(tmp_path / "run_a"))
    b = build(str(tmp_path / "run_b"))
    assert a == b and len(a) > 50
    # every shard nonempty and membership follows the documented hash
    shards = {s for s, _, _ in a}
    assert shards == {0, 1, 2, 3}


def test_quantized_topk_tracks_exact_brute(spark):
    """int8 quantization must (a) keep every |q_i| <= 127 with exact
    integer norms, and (b) rank nearly the same neighbors as the exact
    float tier — per-dim error is <= scale/2, tiny vs 64-dim dot."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    qz = SIM.quantize_embeddings(emb).collect()
    for r in qz[:50]:
        assert all(abs(x) <= 127 for x in r["qvec"])
        assert r["qnorm2"] == sum(x * x for x in r["qvec"])

    q = emb.filter(F.col("vec_id") < 20)
    brute = SIM.ann_brute_topk(emb, q, k=5).collect()
    quant = SIM.quantized_brute_topk(emb, q, k=5).collect()
    bt, qt = {}, {}
    for r in brute:
        bt.setdefault(r["query_id"], set()).add(r["nb_id"])
    for r in quant:
        qt.setdefault(r["query_id"], set()).add(r["nb_id"])
    recall = sum(len(bt[k] & qt.get(k, set())) for k in bt) / sum(
        len(v) for v in bt.values()
    )
    assert recall >= 0.9, f"quantized recall {recall:.2f}"


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC sink/source: values survive a partitioned round-trip and the
    columnar scan keeps predicate pushdown + column pruning (the reason
    ORC is first-class next to parquet)."""
    from spark_nnd_spark.sources import read_orc, write_orc

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    odir = str(tmp_path / "docs_orc")
    write_orc(docs, odir, partition_by=["lang"])
    back = read_orc(spark, odir)
    want = {(r["doc_id"], r["text"], r["lang"]) for r in docs.collect()}
    got = {(r["doc_id"], r["text"], r["lang"]) for r in back.collect()}
    assert got == want

    plan = (
        back.filter(F.col("doc_id") < 100)
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]" in plan
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_weighted_sample_prefers_heavy_rows(spark):
    """Efraimidis-Spirakis property: expected inclusion grows with
    weight, so the sampled mean weight must exceed the corpus mean.
    Also: determinism (two runs identical) and exact per-stratum k."""
    from spark_nnd_spark.operators.sampling import weighted_sample

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = weighted_sample(
        docs, k=10, weight=F.col("n_chars").cast("double"),
        strata_col="source", id_col="doc_id",
    )
    rows = out.collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r["n_chars"])
    n_src = docs.select("source").distinct().count()
    assert len(per_src) == n_src
    assert all(len(v) == 10 for v in per_src.values())
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = sum(sum(v) for v in per_src.values()) / sum(
        len(v) for v in per_src.values()
    )
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)
    again = {(r["doc_id"],) for r in out.collect()}
    assert again == {(r["doc_id"],) for r in rows}


def test_compact_parquet_merges_tiny_files(spark, tmp_path):
    """32 tiny files in, a handful out, same rows; file count sized
    from metadata without scanning data."""
    import glob

    from spark_nnd_spark.sources.sinks import compact_parquet

    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    docs.repartition(32).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 32

    n = compact_parquet(spark, src, dest, target_file_bytes=10**12)
    assert n == 1
    assert len(glob.glob(f"{dest}/*.parquet")) == 1
    back = spark.read.parquet(dest)
    assert back.count() == docs.count()
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }


def test_pq_adc_rerank_recovers_recall(spark):
    """The production PQ chain: trained per-subspace codebooks (Lloyd
    on the deterministic sample) + ADC shortlist + exact rerank must
    recover most of brute-force recall; the raw coarse-code pass alone
    does not (that is the point of reranking). Codes stay in range."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    brute = SIM.ann_brute_topk(emb, q, k=5).collect()
    bt = {}
    for r in brute:
        bt.setdefault(r["query_id"], set()).add(r["nb_id"])

    cb = SIM.train_pq_codebooks(emb, m=16, n_codes=16)
    assert cb.shape == (16, 16, 4)
    codes = SIM.pq_encode(emb, cb).collect()
    assert all(0 <= c < 16 for r in codes for c in r["codes"])

    out = SIM.pq_adc_topk(emb, q, k=5, codebooks=cb, rerank=50).collect()
    qt = {}
    for r in out:
        qt.setdefault(r["query_id"], set()).add(r["nb_id"])
    recall = sum(len(bt[k] & qt.get(k, set())) for k in bt) / sum(
        len(v) for v in bt.values()
    )
    assert recall >= 0.8, f"PQ+rerank recall {recall:.2f}"


def test_containment_pairs_directed(spark):
    """containment_pairs: a short doc fully embedded in a long one must
    yield a (short -> long) directed edge with containment 1.0, with NO
    reverse edge (the long doc is not contained in the short one), and
    the pair must be invisible to symmetric Jaccard at the same bar."""
    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"extra{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, short), (2, long_), (3, "totally unrelated words here now")],
        "doc_id long, text string",
    )
    rows = {
        (r["contained"], r["container"]): r["containment"]
        for r in DD.containment_pairs(docs, n=3, threshold=0.7).collect()
    }
    assert rows == {(1, 2): 1.0}
    jac = DD.jaccard_pairs(docs, n=3, threshold=0.7).collect()
    assert jac == []  # symmetric dedup misses the subset duplicate


def test_pagerank_matches_hand_computation_and_conserves_mass(spark):
    """pagerank: with no dangling nodes total rank is conserved
    (sum == 1 every iteration), and a 3-node path graph matches the
    closed-form hand computation of 3 damped rounds."""
    from spark_nnd_spark.operators.graph import pagerank

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {r["id"]: (r["deg"], r["rank"]) for r in pagerank(pairs).collect()}

    # replay the exact same arithmetic in python
    edges = [(1, 2), (2, 1), (2, 3), (3, 2)]
    deg = {1: 1, 2: 2, 3: 1}
    n = 3
    rank = {v: 1.0 / n for v in deg}
    for _ in range(3):
        inflow = {v: 0.0 for v in deg}
        for s, d in edges:
            inflow[d] += rank[s] / deg[s]
        rank = {v: 0.15 / n + 0.85 * inflow[v] for v in deg}
    assert set(got) == set(deg)
    for v in deg:
        assert got[v][0] == deg[v]
        assert abs(got[v][1] - rank[v]) < 1e-12, v
    assert abs(sum(r for _, r in got.values()) - 1.0) < 1e-9


def test_neardup_index_roundtrip_equals_inline(spark, tmp_path):
    """Verdicts served from the persisted near-dup index must equal the
    inline incremental_dedup over the same split, including the
    hot-bucket census semantics (corpus stats + live batch counts ==
    inline census over the union). Also checks the on-disk layout."""
    import os

    from spark_nnd_spark.operators.dedup import (
        build_neardup_index,
        incremental_dedup,
        neardup_query_index,
    )
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    corpus = d.filter(F.col("source") != "src0")
    batch = d.filter(F.col("source") == "src0")
    idx = str(tmp_path / "ndidx")
    build_neardup_index(corpus, idx, num_hashes=16, bands=4, n=3)

    for cap in (100, 2):  # generous cap and a cap that actually bites
        inline = sorted(
            tuple(r)
            for r in incremental_dedup(
                d,
                F.col("source") == "src0",
                num_hashes=16,
                bands=4,
                n=3,
                threshold=0.2,
                max_band_freq=cap,
            ).collect()
        )
        indexed = sorted(
            tuple(r)
            for r in neardup_query_index(
                spark, idx, batch, threshold=0.2, max_band_freq=cap
            ).collect()
        )
        assert indexed == inline and len(indexed) > 0

    # layout: bands hive-partitioned by band, all four sidecars present
    bands = [p for p in os.listdir(f"{idx}/bands") if p.startswith("band=")]
    assert len(bands) == 4
    for part in ("meta", "digests", "band_stats", "shingles"):
        assert os.path.isdir(f"{idx}/{part}")
    # probe parameters come from the index meta, not the caller
    meta = spark.read.parquet(f"{idx}/meta").first()
    assert (meta["num_hashes"], meta["bands"], meta["n"]) == (16, 4, 3)


def test_hash_hamming_pairs_banded_equals_brute(spark):
    """Pigeonhole exactness: with max_hamming <= n_bands - 1 the banded
    join must reproduce the all-pairs filter row-for-row."""
    from spark_nnd_spark.operators.dedup import hash_hamming_pairs
    from spark_nnd_spark.operators.multimodal import perceptual_hash
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    ph = perceptual_hash(d, id_col="doc_id")
    banded = sorted(
        tuple(r)
        for r in hash_hamming_pairs(
            ph, hash_col="phash", id_col="id", n_bands=4, max_hamming=3
        ).collect()
    )
    a = ph.select(F.col("id").alias("id_a"), F.col("phash").alias("h_a"))
    b = ph.select(F.col("id").alias("id_b"), F.col("phash").alias("h_b"))
    brute = sorted(
        tuple(r)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
        .collect()
    )
    assert banded == brute and len(banded) > 0


def test_neardup_pairs_index_equals_inline(spark, tmp_path):
    """Pairs served from the persisted index must equal the inline
    minhash_lsh_pairs over the same docs, including the census cut
    (stored bucket stats == inline census over the full set)."""
    from spark_nnd_spark.operators.dedup import (
        build_neardup_index,
        minhash_lsh_pairs,
        neardup_pairs_index,
    )
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    idx = str(tmp_path / "fullidx")
    build_neardup_index(d, idx, num_hashes=16, bands=4, n=3)
    for cap in (100, 2):
        inline = sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in minhash_lsh_pairs(
                d, num_hashes=16, bands=4, n=3, threshold=0.2, max_band_freq=cap
            ).collect()
        )
        indexed = sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in neardup_pairs_index(
                spark, idx, threshold=0.2, max_band_freq=cap
            ).collect()
        )
        assert indexed == inline and len(indexed) > 0


def test_extend_neardup_index_equals_fresh_build(spark, tmp_path):
    """The continuous-ingest loop: an index built on part of the corpus
    then EXTENDED with another slice must serve the same verdicts (and
    the same pairs) as an index built fresh over the union."""
    from spark_nnd_spark.operators.dedup import (
        build_neardup_index,
        extend_neardup_index,
        neardup_pairs_index,
        neardup_query_index,
    )
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    base = d.filter(F.col("doc_id") % 3 == 0)
    addition = d.filter(F.col("doc_id") % 3 == 1)
    probe = d.filter(F.col("doc_id") % 3 == 2).select("doc_id", "text")

    grown = str(tmp_path / "grown")
    build_neardup_index(base, grown)
    extend_neardup_index(spark, grown, addition)
    fresh = str(tmp_path / "fresh")
    build_neardup_index(d.filter(F.col("doc_id") % 3 != 2), fresh)

    for cap in (None, 2):
        got = sorted(
            tuple(r)
            for r in neardup_query_index(
                spark, grown, probe, max_band_freq=cap
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in neardup_query_index(
                spark, fresh, probe, max_band_freq=cap
            ).collect()
        )
        assert got == want and len(got) > 0
    got_pairs = sorted(
        (r["id_a"], r["id_b"]) for r in neardup_pairs_index(spark, grown).collect()
    )
    want_pairs = sorted(
        (r["id_a"], r["id_b"]) for r in neardup_pairs_index(spark, fresh).collect()
    )
    assert got_pairs == want_pairs


def test_retract_and_compact_neardup_index(spark, tmp_path):
    """The delete half of the lifecycle: retract → probe/pairs equal a
    fresh index built WITHOUT the retracted docs (tombstone anti-join);
    the capped path refuses until compaction; compact → physical
    tables match the fresh build, tombstones gone, capped path back,
    and a second compact is a no-op."""
    import os

    from spark_nnd_spark.operators.dedup import (
        build_neardup_index,
        compact_neardup_index,
        neardup_pairs_index,
        neardup_query_index,
        retract_from_neardup_index,
    )
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    corpus = d.filter(F.col("doc_id") % 3 != 2)
    probe = d.filter(F.col("doc_id") % 3 == 2).select("doc_id", "text")
    gone = corpus.filter(F.col("doc_id") % 5 == 0)

    idx = str(tmp_path / "idx")
    build_neardup_index(corpus, idx)
    retract_from_neardup_index(spark, idx, gone.select("doc_id"))
    fresh = str(tmp_path / "fresh")
    build_neardup_index(corpus.filter(F.col("doc_id") % 5 != 0), fresh)

    def verdicts(path, cap=None):
        return sorted(
            tuple(r)
            for r in neardup_query_index(
                spark, path, probe, max_band_freq=cap
            ).collect()
        )

    def pairs(path, cap=None):
        return sorted(
            (r["id_a"], r["id_b"])
            for r in neardup_pairs_index(spark, path, max_band_freq=cap).collect()
        )

    assert verdicts(idx) == verdicts(fresh) and len(verdicts(idx)) > 0
    assert pairs(idx) == pairs(fresh)
    with pytest.raises(ValueError, match="tombstones"):
        neardup_query_index(spark, idx, probe, max_band_freq=2)
    with pytest.raises(ValueError, match="tombstones"):
        neardup_pairs_index(spark, idx, max_band_freq=2)

    # retract is idempotent under retry (duplicate tombstones harmless)
    retract_from_neardup_index(spark, idx, gone.select("doc_id"))
    assert verdicts(idx) == verdicts(fresh)

    compact_neardup_index(spark, idx)
    assert not os.path.isdir(f"{idx}/tombstones")
    for tbl in ("digests", "bands", "shingles", "band_stats"):
        got = sorted(map(tuple, spark.read.parquet(f"{idx}/{tbl}").collect()))
        want = sorted(map(tuple, spark.read.parquet(f"{fresh}/{tbl}").collect()))
        assert got == want, f"{tbl} differs after compact"
    for cap in (None, 2):
        assert verdicts(idx, cap) == verdicts(fresh, cap)
    compact_neardup_index(spark, idx)  # no-op on a clean index
    assert verdicts(idx) == verdicts(fresh)


def test_readmission_after_retract_is_upsert(spark, tmp_path):
    """Extending an index with ids that are tombstoned must UPSERT:
    old physical rows purged, tombstones cleared, only the new content
    visible — equal to a fresh build over the final corpus state, even
    when the re-admitted text CHANGED (the stale-shingle hazard)."""
    import os

    from spark_nnd_spark.operators.dedup import (
        build_neardup_index,
        extend_neardup_index,
        neardup_pairs_index,
        neardup_query_index,
        retract_from_neardup_index,
    )
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    corpus = d.filter(F.col("doc_id") % 3 != 2).select("doc_id", "text")
    probe = d.filter(F.col("doc_id") % 3 == 2).select("doc_id", "text")
    victim_ids = corpus.filter(F.col("doc_id") % 5 == 0)

    idx = str(tmp_path / "idx")
    build_neardup_index(corpus, idx)
    retract_from_neardup_index(spark, idx, victim_ids.select("doc_id"))
    # re-admit the same ids with CHANGED content (text reversed at the
    # token level — same tokens, different order => different shingles)
    changed = victim_ids.select(
        "doc_id",
        F.array_join(F.reverse(F.split("text", " ")), " ").alias("text"),
    )
    extend_neardup_index(spark, idx, changed)
    assert not os.path.isdir(f"{idx}/tombstones")  # all cleared

    final_corpus = corpus.filter(F.col("doc_id") % 5 != 0).unionByName(changed)
    fresh = str(tmp_path / "fresh")
    build_neardup_index(final_corpus, fresh)

    for cap in (None, 2):  # tombstones gone => capped path valid again
        got = sorted(
            tuple(r)
            for r in neardup_query_index(
                spark, idx, probe, max_band_freq=cap
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in neardup_query_index(
                spark, fresh, probe, max_band_freq=cap
            ).collect()
        )
        assert got == want and len(got) > 0
    got_pairs = sorted(
        (r["id_a"], r["id_b"]) for r in neardup_pairs_index(spark, idx).collect()
    )
    want_pairs = sorted(
        (r["id_a"], r["id_b"]) for r in neardup_pairs_index(spark, fresh).collect()
    )
    assert got_pairs == want_pairs

    # partial overlap: retract two sets, re-admit only one — the other
    # stays tombstoned (log rewritten, not dropped)
    retract_from_neardup_index(
        spark, idx, final_corpus.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    )
    retract_from_neardup_index(
        spark, idx, final_corpus.filter(F.col("doc_id") % 5 == 1).select("doc_id")
    )
    extend_neardup_index(
        spark, idx, final_corpus.filter(F.col("doc_id") % 5 == 0)
    )
    assert os.path.isdir(f"{idx}/tombstones")
    left = {r["id"] for r in spark.read.parquet(f"{idx}/tombstones").collect()}
    want_left = {
        r["doc_id"]
        for r in final_corpus.filter(F.col("doc_id") % 5 == 1).collect()
    }
    assert left == want_left


def test_jaccard_pairs_index_equals_inline(spark, tmp_path):
    """Jaccard pairs from the stored shingle sidecar must equal the
    tokenize-inline path (the sidecar stores exactly shingles_expr's
    output), with and without the df-cut."""
    from spark_nnd_spark.operators.dedup import (
        build_neardup_index,
        jaccard_pairs,
        jaccard_pairs_index,
    )
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    idx = str(tmp_path / "jidx")
    build_neardup_index(d, idx, num_hashes=16, bands=4, n=3)
    for cut in (None, 2):
        inline = sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in jaccard_pairs(
                d, n=3, threshold=0.2, max_shingle_freq=cut
            ).collect()
        )
        indexed = sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in jaccard_pairs_index(
                spark, idx, threshold=0.2, max_shingle_freq=cut
            ).collect()
        )
        assert indexed == inline and len(indexed) > 0


def test_containment_pairs_index_equals_inline(spark, tmp_path):
    from spark_nnd_spark.operators.dedup import (
        build_neardup_index,
        containment_pairs,
        containment_pairs_index,
    )
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    idx = str(tmp_path / "cidx")
    build_neardup_index(d, idx, num_hashes=16, bands=4, n=3)
    for cut in (None, 2):
        inline = sorted(
            (r["contained"], r["container"], round(r["containment"], 9))
            for r in containment_pairs(
                d, n=3, threshold=0.3, max_shingle_freq=cut
            ).collect()
        )
        indexed = sorted(
            (r["contained"], r["container"], round(r["containment"], 9))
            for r in containment_pairs_index(
                spark, idx, threshold=0.3, max_shingle_freq=cut
            ).collect()
        )
        assert indexed == inline and len(indexed) > 0


def test_bm25_index_equals_inline_query(spark, tmp_path):
    """BM25 from the persisted postings index must reproduce the inline
    q68 pipeline's scores exactly (same tf/df/dl/idf arithmetic)."""
    from spark_nnd_spark.operators.retrieval import (
        bm25_query_index,
        build_text_index,
    )
    from spark_nnd_spark.queries.pipeline import q68_bm25, q108_indexed_bm25

    inline = [tuple(r) for r in q68_bm25(spark, SF_SMOKE).collect()]
    got = [tuple(r) for r in q108_indexed_bm25(spark, SF_SMOKE).collect()]
    assert got == inline and len(got) > 0

    # operator level, fresh index, different terms
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    idx = str(tmp_path / "tidx")
    build_text_index(d, idx)
    out = bm25_query_index(spark, idx, ["the", "data"]).collect()
    assert len(out) > 0
    assert all(r["n_terms"] >= 1 and r["score"] is not None for r in out)


def test_kmv_distinct_sketch_properties(spark):
    """KMV sketch: (a) the exact-count branch fires below k and is
    exact, (b) the estimator branch is within KMV's expected error for
    uniform-ish hashes, (c) the merge is partitioning-independent —
    the same data through 1 partition and 32 partitions yields
    bit-identical sketch rows (the associativity that makes it a
    sketch, not a sample)."""
    from pyspark.sql import functions as F

    from spark_nnd_spark.operators.sketches import kmv_distinct, kmv_mix_expr

    big = spark.range(2000).select(
        F.lit("big").alias("g"), F.col("id").alias("v")
    )
    small = spark.range(7).select(
        F.lit("small").alias("g"), F.col("id").alias("v")
    )
    df = big.union(small)

    def run(d):
        return {
            r["g"]: (r["n_kept"], r["kth_hash"], round(r["kmv_estimate"], 9))
            for r in kmv_distinct(
                d, "g", kmv_mix_expr(F.col("v")), k=64
            ).collect()
        }

    one = run(df.coalesce(1))
    many = run(df.repartition(32))
    assert one == many  # merge associativity / determinism

    n_kept_small, kth_small, est_small = one["small"]
    assert (n_kept_small, kth_small, est_small) == (7, None, 7.0)
    n_kept_big, kth_big, est_big = one["big"]
    assert n_kept_big == 64 and kth_big is not None
    # k=64 → relative std ≈ 1/sqrt(62) ≈ 13%; allow 4 sigma
    assert abs(est_big - 2000) / 2000 < 0.5


def test_scd2_intervals_tile_the_timeline(spark):
    """SCD2 contract: per user, versions are 1..k, consecutive statuses
    differ, valid_to of version v equals valid_from of v+1 (no gaps, no
    overlaps), exactly one open (is_current) interval, and the interval
    event counts sum back to the user's event count."""
    from spark_nnd_spark.operators.events import scd2_intervals
    from spark_nnd_spark.sources import load_table

    e = load_table(spark, SF_SMOKE, "events")
    iv = scd2_intervals(e).collect()
    by_user: dict[int, list] = {}
    for r in iv:
        by_user.setdefault(r["user_id"], []).append(r)
    ev_counts = {
        r["user_id"]: r["n"]
        for r in e.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert by_user, "no intervals produced"
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        assert sum(r["n_events"] for r in rows) == ev_counts[uid]
        assert sum(r["is_current"] for r in rows) == 1
        assert rows[-1]["is_current"] and rows[-1]["valid_to"] is None
        for a, b in zip(rows, rows[1:]):
            assert a["status"] != b["status"], "runs must be maximal"
            assert a["valid_to"] == b["valid_from"], "intervals must tile"


def test_temperature_mix_rates_and_determinism(spark):
    """Mixing contract: the sample is deterministic across runs, every
    kept row exists in the corpus, and per-source keep-fractions track
    the analytic rate min(1, B·w_s/n_s) (exact-Bernoulli md5 draw ⇒
    binomial tolerance)."""
    import math

    from spark_nnd_spark.operators.sampling import temperature_mix
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    got1 = sorted(r["doc_id"] for r in temperature_mix(d, budget_frac=0.5).collect())
    got2 = sorted(r["doc_id"] for r in temperature_mix(d, budget_frac=0.5).collect())
    assert got1 == got2 and got1, "must be deterministic and non-empty"

    n_by_src = {
        r["source"]: r["n"]
        for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(n_by_src.values())
    z = sum(math.sqrt(n) for n in n_by_src.values())
    kept = {
        r["source"]: r["n"]
        for r in temperature_mix(d, budget_frac=0.5)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for src, n_s in n_by_src.items():
        rate = min(1.0, 0.5 * n_total * math.sqrt(n_s) / z / n_s)
        k = kept.get(src, 0)
        tol = 4 * math.sqrt(n_s * rate * (1 - rate)) + 1
        assert abs(k - n_s * rate) <= tol, (src, k, n_s * rate)


def test_temperature_mix_upweights_small_sources(spark):
    """α=0.5 must give a SMALLER keep-rate to larger sources (that is
    the point of temperature mixing): observed keep-fraction ordering
    is opposite to source-size ordering wherever rates are < 1."""
    import math

    from spark_nnd_spark.operators.sampling import temperature_mix
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    n_by_src = {
        r["source"]: r["n"]
        for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(n_by_src.values())
    z = sum(math.sqrt(n) for n in n_by_src.values())
    rates = {
        s: min(1.0, 0.25 * n_total * math.sqrt(n) / z / n)
        for s, n in n_by_src.items()
    }
    bigger = max(n_by_src, key=n_by_src.get)
    smaller = min(n_by_src, key=n_by_src.get)
    if n_by_src[bigger] > n_by_src[smaller]:
        assert rates[bigger] <= rates[smaller]


def test_assign_shards_partition_and_order(spark):
    """Sharding contract: a permutation (every row exactly once), pos
    is a 1..k dense sequence per shard, shards are balanced within a
    binomial envelope, and the seed changes the assignment while
    keeping it a permutation."""
    from spark_nnd_spark.operators.sampling import assign_shards
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    n = d.count()
    out = assign_shards(d, n_shards=8, seed="a").collect()
    assert len(out) == n
    assert sorted(r["doc_id"] for r in out) == sorted(
        r["doc_id"] for r in d.collect()
    )
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    out_b = assign_shards(d, n_shards=8, seed="b").collect()
    moved = sum(
        1
        for ra, rb in zip(
            sorted(out, key=lambda r: r["doc_id"]),
            sorted(out_b, key=lambda r: r["doc_id"]),
        )
        if ra["shard"] != rb["shard"]
    )
    assert moved > 0, "changing the seed must reshuffle"


def test_linear_score_bounds_and_keep_flag(spark):
    """Model-score contract: sigmoid output in (0,1) and keep flag
    consistent with the 0.5 threshold."""
    from spark_nnd_spark.functions.text import linear_score_expr
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    rows = d.select(
        linear_score_expr("text").alias("s"),
        (linear_score_expr("text") >= F.lit(0.5)).alias("keep"),
    ).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["s"] < 1.0
        assert r["keep"] == (r["s"] >= 0.5)


def test_mrl_two_stage_equals_brute_when_coarse_covers_corpus(spark):
    """MRL cascade contract: with coarse_k >= corpus size the coarse
    stage is a no-op filter, so the two-stage result must EQUAL the
    exact brute-force top-k row-for-row; with a tight coarse_k it
    still returns k rows per query with descending cosines."""
    from spark_nnd_spark.operators.similarity import ann_brute_topk, mrl_two_stage_topk
    from spark_nnd_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 5)

    full = sorted(
        (r["query_id"], r["rank"], r["nb_id"])
        for r in mrl_two_stage_topk(emb, queries, coarse_k=n, k=5).collect()
    )
    brute = sorted(
        (r["query_id"], r["rank"], r["nb_id"])
        for r in ann_brute_topk(emb, queries, k=5).collect()
    )
    assert full == brute

    tight = mrl_two_stage_topk(emb, queries, prefix_dims=16, coarse_k=20, k=5).collect()
    per_q: dict[int, list] = {}
    for r in tight:
        per_q.setdefault(r["query_id"], []).append(r)
    assert len(per_q) == 5
    for rows in per_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_bloom_semi_join_exact_and_prefilter_selective(spark):
    """Bloom contract: no false negatives (result == plain semi join)
    and the pre-filter alone keeps every true match while dropping a
    real fraction of non-matches (it's a filter, not a pass-through)."""
    from spark_nnd_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain_expr,
        bloom_semi_join,
    )
    from spark_nnd_spark.sources import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    urgent = load_table(spark, SF_SMOKE, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    m = 1 << 14
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey", m_bits=m)
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    want = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in li.join(
            urgent.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
            "l_orderkey",
            "left_semi",
        )
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    assert got == want and got, "bloom-prefixed semi join must equal plain semi join"

    words = bloom_build(urgent, "o_orderkey", m_bits=m)
    n_all = li.count()
    n_pre = li.filter(bloom_might_contain_expr("l_orderkey", words, m)).count()
    n_match = len(want)
    assert n_match <= n_pre < n_all, (n_match, n_pre, n_all)


def test_native_window_group_limit_bounds_topk(spark):
    """Spark-first two-phase top-K: the plain rank<=k window must carry
    Catalyst's WindowGroupLimit Partial cut BELOW the exchange (each
    map task forwards at most groups*k rows), and a k larger than
    every group must still return whole groups correctly."""
    from spark_nnd_spark.operators.relational import group_top_k
    from spark_nnd_spark.functions.text import token_count_expr
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents").select(
        "source", token_count_expr("text").alias("n_tokens"), "doc_id"
    )
    plan = (
        group_top_k(d, ["source"], [F.desc("n_tokens"), F.asc("doc_id")], 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("WindowGroupLimit") == 2, plan  # Partial + Final
    # the Partial cut renders BELOW the exchange (children print below)
    assert "Partial" in plan[plan.rindex("WindowGroupLimit"):]
    assert plan.rindex("WindowGroupLimit") > plan.index("Exchange hashpartitioning")

    n_docs = d.count()
    full = group_top_k(
        d, ["source"], [F.desc("n_tokens"), F.asc("doc_id")], n_docs + 1
    ).count()
    assert full == n_docs


def test_triangle_counts_hand_graph(spark):
    """Two triangles sharing edge (2,3) plus a triangle-free square:
    shared-edge nodes participate in 2 triangles, the others in 1,
    square nodes in none. Duplicate/reversed input edges must not
    double-count."""
    from spark_nnd_spark.operators.graph import triangle_counts

    edges = [
        (1, 2), (2, 3), (1, 3),          # triangle A
        (3, 2), (2, 4), (3, 4),          # triangle B (one edge reversed dup)
        (10, 11), (11, 12), (12, 13), (13, 10),  # square, no diagonal
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_label_propagation_matches_reference_rule(spark):
    """2-iteration LPA must equal a literal per-node replay of the
    rule (mode of neighbor labels, ties to the smallest label)."""
    from spark_nnd_spark.operators.graph import label_propagation

    edges = [
        (1, 2), (2, 3), (1, 3),      # tight clique
        (3, 4),                      # bridge
        (4, 5), (5, 6), (4, 6),      # second clique
        (7, 8),                      # isolated pair
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["label"] for r in label_propagation(df, iterations=2).collect()}

    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {v: v for v in adj}
    for _ in range(2):
        nxt = {}
        for v, nbrs in adj.items():
            counts: dict[int, int] = {}
            for u in nbrs:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            nxt[v] = min(
                counts, key=lambda lab: (-counts[lab], lab)
            )
        labels = nxt
    assert got == labels


def test_cms_never_underestimates_and_is_tight_on_heavy_keys(spark):
    """CMS contract: estimate >= exact for every key (collisions only
    add), estimates are exact when the sketch is sparse relative to
    the key space, and two sketches merge by cell-wise addition."""
    from spark_nnd_spark.operators.sketches import cms_estimate, cms_sketch
    from spark_nnd_spark.functions.text import token_hash_lambda
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    hashed = d.select(
        F.explode(F.split("text", " ")).alias("token")
    ).select("token", token_hash_lambda(F.col("token")).alias("h"))
    sketch = cms_sketch(hashed, "h")
    exact = hashed.groupBy("token").agg(
        F.count("*").alias("exact_n"), F.min("h").alias("h")
    )
    est = cms_estimate(sketch, exact, "h")
    rows = est.collect()
    assert rows
    assert all(r["cms_n"] >= r["exact_n"] for r in rows)

    # mergeability: sketch(A) + sketch(B) == sketch(A ∪ B) cell-wise,
    # with the stream split deterministically into two halves
    sk_all = {(r["row"], r["col"]): r["n"] for r in cms_sketch(hashed, "h").collect()}
    half1 = hashed.withColumn("i", F.monotonically_increasing_id()).filter(
        F.col("i") % 2 == 0
    )
    half2 = hashed.withColumn("i", F.monotonically_increasing_id()).filter(
        F.col("i") % 2 == 1
    )
    merged: dict[tuple, int] = {}
    for half in (half1, half2):
        for r in cms_sketch(half.drop("i"), "h").collect():
            k = (r["row"], r["col"])
            merged[k] = merged.get(k, 0) + r["n"]
    assert merged == sk_all


def test_mrl_index_roundtrip_equals_inline(spark, tmp_path):
    """Persisted-index contract (the IVF/near-dup convention): serving
    the cascade from the stored prefix sidecar + full table must be
    row-identical to the inline operator over the same corpus."""
    from spark_nnd_spark.operators.similarity import (
        build_mrl_index,
        mrl_query_index,
        mrl_two_stage_topk,
    )
    from spark_nnd_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "mrl_idx")
    build_mrl_index(emb, path, prefix_dims=16)
    got = sorted(
        (r["query_id"], r["rank"], r["nb_id"], round(r["cosine"], 9))
        for r in mrl_query_index(spark, path, queries, coarse_k=20, k=5).collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["nb_id"], round(r["cosine"], 9))
        for r in mrl_two_stage_topk(
            emb, queries, prefix_dims=16, coarse_k=20, k=5
        ).collect()
    )
    assert got == want and got


def test_extend_text_index_equals_fresh_build(spark, tmp_path):
    """The continuous-ingest loop for the BM25 postings index: an index
    built on part of the corpus then EXTENDED with the rest must score
    every query identically to an index built fresh over the union —
    same postings, same doclens-derived corpus stats."""
    from spark_nnd_spark.operators.retrieval import (
        bm25_query_index,
        build_text_index,
        extend_text_index,
    )
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    base = d.filter(F.col("doc_id") % 2 == 0)
    addition = d.filter(F.col("doc_id") % 2 == 1)

    grown = str(tmp_path / "grown")
    build_text_index(base, grown)
    extend_text_index(spark, grown, addition)
    fresh = str(tmp_path / "fresh")
    build_text_index(d, fresh)

    for terms in (["the", "data"], ["spark", "table", "value"]):
        got = sorted(
            (r["doc_id"], r["n_terms"], round(r["score"], 9))
            for r in bm25_query_index(spark, grown, terms).collect()
        )
        want = sorted(
            (r["doc_id"], r["n_terms"], round(r["score"], 9))
            for r in bm25_query_index(spark, fresh, terms).collect()
        )
        assert got == want and len(got) > 0
    # stats parity: n_docs/avgdl must reflect the union exactly
    g = spark.read.parquet(f"{grown}/stats").first()
    f_ = spark.read.parquet(f"{fresh}/stats").first()
    assert g["n_docs"] == f_["n_docs"]
    assert abs(g["avgdl"] - f_["avgdl"]) < 1e-12


def test_retract_compact_text_index(spark, tmp_path):
    """BM25 retraction must reach the corpus stats, not just the
    postings: tombstoned probes recompute n_docs/avgdl live and score
    exactly like a fresh build without the docs; compaction restores
    the stored-stats path; re-admission with CHANGED text is an
    upsert (old postings purged)."""
    import os

    from spark_nnd_spark.operators.retrieval import (
        bm25_query_index,
        build_text_index,
        compact_text_index,
        extend_text_index,
        retract_from_text_index,
    )
    from spark_nnd_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    victims = d.filter(F.col("doc_id") % 5 == 0)

    idx = str(tmp_path / "idx")
    build_text_index(d, idx)
    retract_from_text_index(spark, idx, victims.select("doc_id"))
    fresh = str(tmp_path / "fresh")
    build_text_index(d.filter(F.col("doc_id") % 5 != 0), fresh)

    def scores(path, terms):
        return sorted(
            (r["doc_id"], r["n_terms"], round(r["score"], 9))
            for r in bm25_query_index(spark, path, terms).collect()
        )

    for terms in (["the", "data"], ["spark", "table", "value"]):
        assert scores(idx, terms) == scores(fresh, terms)
        assert len(scores(idx, terms)) > 0

    compact_text_index(spark, idx)
    assert not os.path.isdir(f"{idx}/tombstones")
    for terms in (["the", "data"],):
        assert scores(idx, terms) == scores(fresh, terms)
    g = spark.read.parquet(f"{idx}/stats").first()
    f_ = spark.read.parquet(f"{fresh}/stats").first()
    assert g["n_docs"] == f_["n_docs"] and abs(g["avgdl"] - f_["avgdl"]) < 1e-12

    # re-admission upsert with changed text
    retract_from_text_index(spark, idx, victims.select("doc_id"))
    changed = victims.select(
        "doc_id", F.array_join(F.reverse(F.split("text", " ")), " ").alias("text")
    )
    extend_text_index(spark, idx, changed)
    assert not os.path.isdir(f"{idx}/tombstones")
    final = d.filter(F.col("doc_id") % 5 != 0).select("doc_id", "text").unionByName(
        changed
    )
    fresh2 = str(tmp_path / "fresh2")
    build_text_index(final, fresh2)
    for terms in (["the", "data"], ["spark", "table", "value"]):
        assert scores(idx, terms) == scores(fresh2, terms)


def test_binary_index_equals_inline_and_lifecycle(spark, tmp_path):
    """The persisted bits sidecar must serve exactly the inline
    cascade's rows; extend==fresh-build; retraction/compaction and
    changed-content re-admission behave like every other family."""
    import os

    from spark_nnd_spark.operators.similarity import (
        binary_hamming_topk,
        build_binary_index,
        compact_binary_index,
        binary_query_index,
        extend_binary_index,
        retract_from_binary_index,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)

    def rows(df):
        return sorted(
            (r["query_id"], r["nb_id"], r["rank"], r["hamming"], round(r["cosine"], 9))
            for r in df.collect()
        )

    idx = str(tmp_path / "idx")
    build_binary_index(emb, idx)
    assert rows(binary_query_index(spark, idx, q)) == rows(
        binary_hamming_topk(emb, q)
    )

    # extend == fresh build
    grown = str(tmp_path / "grown")
    build_binary_index(emb.filter(F.col("vec_id") % 2 == 0), grown)
    extend_binary_index(spark, grown, emb.filter(F.col("vec_id") % 2 == 1))
    assert rows(binary_query_index(spark, grown, q)) == rows(
        binary_query_index(spark, idx, q)
    )

    # retract == fresh build without; compact; changed-vector re-admit
    victims = emb.filter(F.col("vec_id") % 5 == 2)
    retract_from_binary_index(spark, idx, victims.select("vec_id"))
    fresh = str(tmp_path / "fresh")
    build_binary_index(emb.filter(F.col("vec_id") % 5 != 2), fresh)
    assert rows(binary_query_index(spark, idx, q)) == rows(
        binary_query_index(spark, fresh, q)
    )
    compact_binary_index(spark, idx)
    assert not os.path.isdir(f"{idx}/tombstones")
    assert rows(binary_query_index(spark, idx, q)) == rows(
        binary_query_index(spark, fresh, q)
    )
    retract_from_binary_index(spark, idx, victims.select("vec_id"))
    changed = victims.select("vec_id", F.reverse("embedding").alias("embedding"))
    extend_binary_index(spark, idx, changed)
    assert not os.path.isdir(f"{idx}/tombstones")
    fresh2 = str(tmp_path / "fresh2")
    build_binary_index(
        emb.filter(F.col("vec_id") % 5 != 2)
        .select("vec_id", "embedding")
        .unionByName(changed),
        fresh2,
    )
    assert rows(binary_query_index(spark, idx, q)) == rows(
        binary_query_index(spark, fresh2, q)
    )


def test_retract_compact_mrl_index(spark, tmp_path):
    """MRL retraction: tombstoned coarse scan == fresh build without
    the vectors; compact folds the log; re-admission with CHANGED
    vectors is an upsert."""
    import os

    from spark_nnd_spark.operators.similarity import (
        build_mrl_index,
        compact_mrl_index,
        extend_mrl_index,
        mrl_query_index,
        retract_from_mrl_index,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    victims = emb.filter(F.col("vec_id") % 5 == 2)

    idx = str(tmp_path / "idx")
    build_mrl_index(emb, idx)
    retract_from_mrl_index(spark, idx, victims.select("vec_id"))
    fresh = str(tmp_path / "fresh")
    build_mrl_index(emb.filter(F.col("vec_id") % 5 != 2), fresh)

    def res(path):
        return sorted(
            (r["query_id"], r["nb_id"], r["rank"], round(r["cosine"], 9))
            for r in mrl_query_index(spark, path, q).collect()
        )

    assert res(idx) == res(fresh) and len(res(idx)) > 0
    compact_mrl_index(spark, idx)
    assert not os.path.isdir(f"{idx}/tombstones")
    assert res(idx) == res(fresh)

    retract_from_mrl_index(spark, idx, victims.select("vec_id"))
    changed = victims.select("vec_id", F.reverse("embedding").alias("embedding"))
    extend_mrl_index(spark, idx, changed)
    assert not os.path.isdir(f"{idx}/tombstones")
    fresh2 = str(tmp_path / "fresh2")
    build_mrl_index(
        emb.filter(F.col("vec_id") % 5 != 2)
        .select("vec_id", "embedding")
        .unionByName(changed),
        fresh2,
    )
    assert res(idx) == res(fresh2)


def test_retract_compact_ivf_and_ivfpq_index(spark, tmp_path):
    """IVF / IVF-PQ retraction: tombstoned cell scans == fresh builds
    without the vectors (same FIXED centroids/codebooks both sides —
    the quantizer is not membership); compact folds the log;
    re-admission with CHANGED vectors is an upsert."""
    import os

    from spark_nnd_spark.operators.similarity import (
        ann_ivf_query_index,
        build_ivf_index,
        build_ivfpq_index,
        compact_ivf_index,
        compact_ivfpq_index,
        extend_ivf_index,
        extend_ivfpq_index,
        fixed_centroids,
        ivfpq_query_index,
        pq_codebooks,
        retract_from_ivf_index,
        retract_from_ivfpq_index,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    victims = emb.filter(F.col("vec_id") % 5 == 2)
    remain = emb.filter(F.col("vec_id") % 5 != 2)
    cents = fixed_centroids(64, 16, 42)
    cb = pq_codebooks(64, 8, 16, 42)

    ivf, ivf_fresh = str(tmp_path / "ivf"), str(tmp_path / "ivf_fresh")
    build_ivf_index(emb, ivf, centroids=cents)
    retract_from_ivf_index(spark, ivf, victims.select("vec_id"))
    build_ivf_index(remain, ivf_fresh, centroids=cents)

    def ivf_res(path):
        return sorted(
            (r["query_id"], r["nb_id"], r["rank"])
            for r in ann_ivf_query_index(spark, path, q).collect()
        )

    assert ivf_res(ivf) == ivf_res(ivf_fresh) and len(ivf_res(ivf)) > 0
    compact_ivf_index(spark, ivf)
    assert not os.path.isdir(f"{ivf}/tombstones")
    assert ivf_res(ivf) == ivf_res(ivf_fresh)
    # upsert with changed vectors
    retract_from_ivf_index(spark, ivf, victims.select("vec_id"))
    changed = victims.select("vec_id", F.reverse("embedding").alias("embedding"))
    extend_ivf_index(spark, ivf, changed)
    assert not os.path.isdir(f"{ivf}/tombstones")
    ivf_fresh2 = str(tmp_path / "ivf_fresh2")
    build_ivf_index(
        remain.select("vec_id", "embedding").unionByName(changed),
        ivf_fresh2,
        centroids=cents,
    )
    assert ivf_res(ivf) == ivf_res(ivf_fresh2)

    pq, pq_fresh = str(tmp_path / "pq"), str(tmp_path / "pq_fresh")
    build_ivfpq_index(emb, pq, centroids=cents, codebooks=cb)
    retract_from_ivfpq_index(spark, pq, victims.select("vec_id"))
    build_ivfpq_index(remain, pq_fresh, centroids=cents, codebooks=cb)

    def pq_res(path):
        return sorted(
            (r["query_id"], r["nb_id"], r["rank"])
            for r in ivfpq_query_index(spark, path, q).collect()
        )

    assert pq_res(pq) == pq_res(pq_fresh) and len(pq_res(pq)) > 0
    compact_ivfpq_index(spark, pq)
    assert not os.path.isdir(f"{pq}/tombstones")
    assert pq_res(pq) == pq_res(pq_fresh)
    extend_ivfpq_index(spark, pq, changed)  # plain extension (no tombstones)
    pq_fresh2 = str(tmp_path / "pq_fresh2")
    build_ivfpq_index(
        remain.select("vec_id", "embedding").unionByName(changed),
        pq_fresh2,
        centroids=cents,
        codebooks=cb,
    )
    assert pq_res(pq) == pq_res(pq_fresh2)


def test_extend_mrl_index_equals_fresh_build(spark, tmp_path):
    """The continuous-ingest loop for the MRL prefix sidecar: extending
    must slice new vectors at the INDEX's stored prefix_dims (never a
    caller value) and serve the same cascade as a fresh build."""
    from spark_nnd_spark.operators.similarity import (
        build_mrl_index,
        extend_mrl_index,
        mrl_query_index,
    )
    from spark_nnd_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    addition = emb.filter(F.col("vec_id") % 2 == 1)

    grown = str(tmp_path / "grown")
    build_mrl_index(base, grown, prefix_dims=16)
    extend_mrl_index(spark, grown, addition)
    fresh = str(tmp_path / "fresh")
    build_mrl_index(emb, fresh, prefix_dims=16)

    got = sorted(
        (r["query_id"], r["rank"], r["nb_id"], round(r["cosine"], 9))
        for r in mrl_query_index(spark, grown, queries, coarse_k=20, k=5).collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["nb_id"], round(r["cosine"], 9))
        for r in mrl_query_index(spark, fresh, queries, coarse_k=20, k=5).collect()
    )
    assert got == want and got
    # the extension must have been sliced at the stored 16 dims
    pre = spark.read.parquet(f"{grown}/prefix")
    assert pre.filter(F.size("c_pre") != 16).count() == 0
    assert pre.count() == emb.count()


def test_histogram_sketch_bound_and_mergeability(spark):
    """The two properties that make the fixed-boundary histogram a
    quantile SKETCH: (1) |estimate − exact rank-⌈p·n⌉ statistic| ≤ one
    bin width, for every group and probability; (2) cell-wise addition
    of two halves' histograms equals the whole corpus's histogram (the
    merge is associative — what bounds streaming/distributed state)."""
    import numpy as np

    from spark_nnd_spark.functions import text as TX
    from spark_nnd_spark.operators.sketches import (
        fixed_histogram,
        histogram_quantiles,
    )
    from spark_nnd_spark.sources import load_table

    LO, W, B = 0.0, 8.0, 64
    probs = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    d = load_table(spark, SF_SMOKE, "documents").select(
        "source", "doc_id", TX.token_count_expr("text").cast("double").alias("v")
    )
    est = {
        r["grp"]: r
        for r in histogram_quantiles(d, "source", F.col("v"), LO, W, B, probs).collect()
    }
    pdf = d.toPandas()
    assert set(est) == set(pdf.source.unique())
    for src, grp in pdf.groupby("source"):
        vs = np.sort(grp.v.values)
        n = len(vs)
        assert est[src]["n"] == n
        for lab, p in probs.items():
            exact = vs[int(np.ceil(p * n)) - 1]
            assert abs(est[src][lab] - exact) <= W, (src, lab, est[src][lab], exact)

    # mergeability: hist(half A) + hist(half B) == hist(A ∪ B) cell-wise
    a = d.filter(F.col("doc_id") % 2 == 0)
    b = d.filter(F.col("doc_id") % 2 == 1)

    def cells(df):
        return {
            (r["grp"], r["bin"]): r["cnt"]
            for r in fixed_histogram(df, "source", F.col("v"), LO, W, B).collect()
        }

    ca, cb, cw = cells(a), cells(b), cells(d)
    merged: dict = {}
    for c in (ca, cb):
        for k, v in c.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == cw

    # clamping: out-of-range values land in the edge bins, never lost
    edge = spark.createDataFrame(
        [("s", -5.0), ("s", 1e9)], "source string, v double"
    )
    ce = cells(edge)
    assert ce == {("s", 0): 1, ("s", B - 1): 1}


def test_ivfpq_index_roundtrip_equals_inline_and_recall(spark, tmp_path):
    """Composed IVF-PQ (IVFADC + exact rerank): (1) serving from the
    persisted index must be row-identical to the inline operator over
    the same centroids/codebooks; (2) the cascade's recall must stay
    within 80% of its IVF ceiling (same cells, exact ranking of all
    probed members) — the bound the 40-row shortlist buys back from
    the 8-int codes. Deterministic: fixed centroids, seeded codebooks,
    total tie-breaks."""
    from spark_nnd_spark.operators.similarity import (
        ann_brute_topk,
        ann_ivf_topk,
        build_ivfpq_index,
        fixed_centroids,
        ivfpq_query_index,
        ivfpq_topk,
        pq_codebooks,
    )
    from spark_nnd_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    cents = fixed_centroids(64, 16, 42)
    cb = pq_codebooks(64, 8, 16, 42)

    inline = sorted(
        (r["query_id"], r["rank"], r["nb_id"], round(r["cosine"], 9))
        for r in ivfpq_topk(
            emb, q, k=5, n_probe=4, shortlist=40, centroids=cents, codebooks=cb
        ).collect()
    )
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, path, centroids=cents, codebooks=cb)
    served = sorted(
        (r["query_id"], r["rank"], r["nb_id"], round(r["cosine"], 9))
        for r in ivfpq_query_index(
            spark, path, q, k=5, n_probe=4, shortlist=40
        ).collect()
    )
    assert served == inline and len(served) > 0

    brute = {
        (r["query_id"], r["nb_id"]) for r in ann_brute_topk(emb, q, k=5).collect()
    }
    ceiling = {
        (r["query_id"], r["nb_id"])
        for r in ann_ivf_topk(emb, q, k=5, n_probe=4, centroids=cents).collect()
    }
    got = {(t[0], t[2]) for t in inline}
    recall_pq = len(got & brute) / len(brute)
    recall_ceiling = len(ceiling & brute) / len(brute)
    assert recall_pq >= 0.8 * recall_ceiling, (recall_pq, recall_ceiling)


def test_extend_ivf_and_ivfpq_index_equals_fresh_build(spark, tmp_path):
    """The continuous-ingest loop for the vector indexes: extending
    with a second slice must serve the same results as a fresh build
    over the union — assignment uses the STORED centroids and encoding
    the STORED codebooks, so extension can never diverge from the base
    build's parameters."""
    from spark_nnd_spark.operators.similarity import (
        ann_ivf_query_index,
        build_ivf_index,
        build_ivfpq_index,
        extend_ivf_index,
        extend_ivfpq_index,
        fixed_centroids,
        ivfpq_query_index,
        pq_codebooks,
    )
    from spark_nnd_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    addition = emb.filter(F.col("vec_id") % 2 == 1)
    cents = fixed_centroids(64, 16, 42)
    cb = pq_codebooks(64, 8, 16, 42)

    grown_ivf = str(tmp_path / "grown_ivf")
    build_ivf_index(base, grown_ivf, centroids=cents)
    extend_ivf_index(spark, grown_ivf, addition)
    fresh_ivf = str(tmp_path / "fresh_ivf")
    build_ivf_index(emb, fresh_ivf, centroids=cents)
    got = sorted(
        tuple(r) for r in ann_ivf_query_index(spark, grown_ivf, q, k=5).collect()
    )
    want = sorted(
        tuple(r) for r in ann_ivf_query_index(spark, fresh_ivf, q, k=5).collect()
    )
    assert got == want and len(got) > 0

    grown_pq = str(tmp_path / "grown_pq")
    build_ivfpq_index(base, grown_pq, centroids=cents, codebooks=cb)
    extend_ivfpq_index(spark, grown_pq, addition)
    fresh_pq = str(tmp_path / "fresh_pq")
    build_ivfpq_index(emb, fresh_pq, centroids=cents, codebooks=cb)
    got = sorted(
        tuple(r)
        for r in ivfpq_query_index(
            spark, grown_pq, q, k=5, n_probe=4, shortlist=40
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in ivfpq_query_index(
            spark, fresh_pq, q, k=5, n_probe=4, shortlist=40
        ).collect()
    )
    assert got == want and len(got) > 0


def test_bloom_broadcast_probe_matches_literal_probe(spark):
    """The large-m Bloom probe (broadcast numpy words + Arrow-batched
    bit test) must agree bit-for-bit with the literal-expression probe
    — both hash JVM-side with the build's salted xxhash64 — and the
    semi join must return identical rows either way, including at an
    m_bits (2^22) where the literal expression tree is impractical."""
    from spark_nnd_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain_expr,
        bloom_might_contain_pandas,
        bloom_semi_join,
    )

    big = spark.range(0, 5000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    keys = spark.range(0, 5000, 7).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    m = 1 << 14
    words = bloom_build(keys, "key", m)
    lit_hits = {
        r["key"]
        for r in big.filter(bloom_might_contain_expr("key", words, m)).collect()
    }
    bc_hits = {
        r["key"]
        for r in big.filter(
            bloom_might_contain_pandas(spark, "key", words, m)
        ).collect()
    }
    assert lit_hits == bc_hits and len(lit_hits) > 0

    want = sorted(
        r["key"] for r in bloom_semi_join(big, keys, "key", m_bits=m).collect()
    )
    got = sorted(
        r["key"]
        for r in bloom_semi_join(
            big, keys, "key", m_bits=m, broadcast_probe=True
        ).collect()
    )
    assert got == want

    # the regime the broadcast path exists for: 2^22 bits (65k words —
    # far past the literal form's practical bound), near-zero FP rate
    m_large = 1 << 22
    big_words = bloom_build(keys, "key", m_large)
    assert len(big_words) == m_large // 64
    hits = sorted(
        r["key"]
        for r in big.filter(
            bloom_might_contain_pandas(spark, "key", big_words, m_large)
        ).collect()
    )
    exact = sorted(r["key"] for r in keys.collect())
    assert set(exact) <= set(hits)  # no false negatives, ever
    assert len(hits) <= len(exact) + 5  # fp ~ (1-e^(-2n/m))^2 ≈ 1e-7


# ------------------------------------------- span scrub (q135 family)

def test_span_scrub_coverage_and_corpus_rule(spark):
    """Segmentation: floor(n/5) non-overlapping spans, trailing
    partial dropped, <5-token docs emit nothing. Rule: scrubbed iff
    the span occurs in >= min_df DISTINCT docs — in-doc repeats alone
    never scrub (corpus-frequency rule, not in-doc repetition)."""
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k"),          # 2 spans + trailing k
            (2, "a b c d e x y z w v"),            # shares span 1 with doc 1
            (3, "too short"),                      # 0 spans
            (4, "p q r s t p q r s t"),            # same span twice, one doc
        ],
        "doc_id long, text string",
    )
    out = DD.span_scrub(df, span_words=5, min_df=2).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2, 4}  # doc 3 has no spans
    d1 = {r["span_idx"]: r for r in by_doc[1]}
    assert len(d1) == 2  # trailing "k" dropped
    assert d1[0]["span"] == "a b c d e" and d1[0]["scrubbed"]
    assert d1[0]["span_docfreq"] == 2
    assert d1[1]["span"] == "f g h i j" and not d1[1]["scrubbed"]
    d2 = {r["span_idx"]: r for r in by_doc[2]}
    assert d2[0]["scrubbed"] and not d2[1]["scrubbed"]
    # doc 4: two occurrences of one span, docfreq still 1 -> kept
    assert len(by_doc[4]) == 2
    assert all(r["span_docfreq"] == 1 and not r["scrubbed"] for r in by_doc[4])


# --------------------------------- blocked fuzzy matching (q136 family)

def test_fuzzy_name_pairs_block_contract_and_counts(spark):
    """Pairs require BOTH an edit distance in [1, max_dist] AND a
    shared token under the df-cut — near pairs with disjoint tokens
    are not reported (the blocking contract is part of the
    semantics), and raising the df-cut past a token's frequency
    removes its block."""
    rows = [
        ("red widget",), ("red widget",), ("rad widget",),   # dist 1, share "widget"
        ("blue gadget",), ("blue gidget",),                  # dist 1, share "blue"
        ("aaa bbb",), ("aab bbc",),                          # dist 2, NO shared token
    ]
    df = spark.createDataFrame(rows, "p_name string")
    out = DD.fuzzy_name_pairs(df, "p_name", max_dist=3, max_token_freq=1000)
    got = {(r["name_a"], r["name_b"]): r for r in out.collect()}
    assert set(got) == {
        ("rad widget", "red widget"),
        ("blue gadget", "blue gidget"),
    }
    r = got[("rad widget", "red widget")]
    assert r["dist"] == 1 and r["n_a"] == 1 and r["n_b"] == 2  # row counts
    # df-cut: with max_token_freq=1 every shared token is too hot,
    # so all blocks (and therefore all pairs) disappear
    assert DD.fuzzy_name_pairs(df, "p_name", max_dist=3, max_token_freq=1).count() == 0


# ------------------------------------- evaluation (q137/q139 family)

def test_grouped_auc_hand_computed_groups(spark):
    """AUC against hand-computed rank sums: perfect ranking -> 1.0,
    inverted -> 0.0, one discordant pair of two -> 0.5, equal scores
    broken by id, single-class -> NULL."""
    from spark_nnd_spark.operators.evaluation import grouped_auc

    rows = [
        # g1: pos {0.8, 0.6} all above neg {0.4, 0.2} -> AUC 1
        ("g1", 1, 0.8, True), ("g1", 2, 0.6, True),
        ("g1", 3, 0.4, False), ("g1", 4, 0.2, False),
        # g2: the one positive ranks below the one negative -> AUC 0
        ("g2", 1, 0.4, True), ("g2", 2, 0.6, False),
        # g3: pos {0.9, 0.5}, neg {0.7} -> rank sum 4 -> (4-3)/2 = 0.5
        ("g3", 1, 0.9, True), ("g3", 2, 0.5, True), ("g3", 3, 0.7, False),
        # g4: all-equal scores, tie broken by id: pos id1 rank1,
        # neg id2 rank2 -> AUC (1-1)/1 = 0
        ("g4", 1, 0.5, True), ("g4", 2, 0.5, False),
        # g5: single class -> undefined
        ("g5", 1, 0.3, True), ("g5", 2, 0.9, True),
    ]
    df = spark.createDataFrame(rows, "src string, id long, score double, label boolean")
    out = {r["src"]: r for r in grouped_auc(df, "src", "score", "label", "id").collect()}
    assert out["g1"]["auc"] == 1.0
    assert out["g2"]["auc"] == 0.0
    assert out["g3"]["auc"] == 0.5
    assert out["g4"]["auc"] == 0.0
    assert out["g5"]["auc"] is None
    assert (out["g1"]["n_pos"], out["g1"]["n_neg"]) == (2, 2)


def test_calibration_bins_exact_cells(spark):
    """Bin ids are floor(score*n) clamped to the top bin; cells carry
    exact counts / means / positive rates."""
    from spark_nnd_spark.operators.evaluation import calibration_bins

    rows = [
        (0.05, True), (0.05, False),   # bin 0, pos rate 0.5
        (0.15, False),                 # bin 1
        (0.999, True), (1.0, True),    # both clamp/floor into bin 9
    ]
    df = spark.createDataFrame(rows, "score double, label boolean")
    out = {r["bin"]: r for r in calibration_bins(df, "score", "label", n_bins=10).collect()}
    assert set(out) == {0, 1, 9}
    assert out[0]["n"] == 2 and out[0]["pos_rate"] == 0.5
    assert out[0]["mean_score"] == 0.05
    assert out[1]["n"] == 1 and out[1]["pos_rate"] == 0.0
    assert out[9]["n"] == 2 and out[9]["pos_rate"] == 1.0  # 1.0 clamped to bin 9


# ----------------------------------------- semantic dedup (q138)

def test_semantic_dedup_keep_rule_and_cell_blocking(spark):
    """Greedy-by-id keep rule within a cell; near-identical vectors in
    DIFFERENT cells are never compared (cell blocking is part of the
    semantics, the IVF convention)."""
    cents = np.array([[10.0, 0.0], [0.0, 10.0]])
    rows = [
        (1, [5.0, 0.1]),    # cell 0, kept (smallest id in its dup set)
        (2, [5.0, 0.11]),   # cell 0, cos vs id1 ~1 -> dropped
        (3, [0.1, 5.0]),    # cell 1, direction ~ id1 is IRRELEVANT (other cell)
        (4, [5.0, 0.1]),    # cell 0, exact dup of id1 -> dropped
        (5, [3.0, 2.9]),    # cell 0 (dot ties broken toward cell 0), unique -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in SIM.semantic_dedup(df, cents, tau=0.99).collect()}
    assert len(out) == 5
    assert out[1]["keep"] and out[1]["cell"] == 0
    assert not out[2]["keep"]
    assert out[3]["keep"] and out[3]["cell"] == 1  # same direction as 1 but other cell
    assert not out[4]["keep"]
    assert out[5]["keep"]


def test_cross_decontaminate_planted_paraphrase(spark):
    """q148 kernel: a train vector that is a near-copy (paraphrase) of
    an eval vector is flagged; an unrelated same-cell vector is clean;
    a near-copy that lands in a DIFFERENT cell is not compared (cell
    blocking is part of the semantics, as in q138)."""
    cents = np.array([[10.0, 0.0], [0.0, 10.0]])
    eval_rows = [(100, [5.0, 0.1]), (101, [0.1, 5.0])]
    train_rows = [
        (1, [5.0, 0.11]),   # cell 0, cos vs eval 100 ~1 -> contaminated
        (2, [3.0, 2.9]),    # cell 0 (tie toward 0), cos vs 100 ~0.73 < tau
        (3, [0.11, 5.0]),   # cell 1, paraphrase of eval 101 -> contaminated
        (4, [5.0, 0.1]),    # cell 0, EXACT copy of eval 100 -> contaminated
    ]
    ev = spark.createDataFrame(eval_rows, "vec_id long, embedding array<double>")
    tr = spark.createDataFrame(train_rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in SIM.cross_decontaminate(tr, ev, cents, tau=0.99).collect()
    }
    assert len(out) == 4
    assert out[1]["contaminated"] and out[1]["first_eval_id"] == 100
    assert not out[2]["contaminated"]
    assert out[2]["n_eval_hits"] == 0 and out[2]["first_eval_id"] == -1
    assert out[3]["contaminated"] and out[3]["first_eval_id"] == 101
    assert out[4]["contaminated"] and out[4]["n_eval_hits"] == 1


def test_cross_decontaminate_cell_blocking_misses_cross_cell_copy(spark):
    """The documented trade: a paraphrase assigned to a different cell
    than its eval twin is NOT flagged — the same bounded-comparison
    contract the IVF index makes for search."""
    cents = np.array([[10.0, 0.0], [0.0, 10.0]])
    # eval in cell 0; train copy nudged across the decision boundary
    ev = spark.createDataFrame(
        [(100, [5.0, 4.9])], "vec_id long, embedding array<double>"
    )
    tr = spark.createDataFrame(
        [(1, [4.9, 5.0])], "vec_id long, embedding array<double>"
    )
    out = SIM.cross_decontaminate(tr, ev, cents, tau=0.9).collect()
    assert len(out) == 1
    assert not out[0]["contaminated"]  # cos ~0.9998 but cells differ


# -------------------------------- DSIR importance weights (q140)

def test_budget_waterfill_hand_solved(spark):
    """q149 kernel vs a hand-solved 4-source example: total=1350,
    budget=675 (1/2), cap=337 (1/2 of budget). Sorted by availability:
    C(50), A(100), B(200) saturate (50*4=200, 100*3+50=350,
    200*2+150=550, all <= 675); D is capped 1000->337 and gets the
    leftover level (675-350)//1 = 325, remainder 0."""
    from spark_nnd_spark.operators.sampling import budget_waterfill

    df = spark.createDataFrame(
        [("A", 100), ("B", 200), ("C", 50), ("D", 1000)],
        "source string, tokens long",
    )
    out = {
        r["source"]: r
        for r in budget_waterfill(df, budget_frac=(1, 2), cap_frac=(1, 2)).collect()
    }
    assert out["C"]["saturated"] and out["C"]["alloc_tokens"] == 50
    assert out["A"]["saturated"] and out["A"]["alloc_tokens"] == 100
    assert out["B"]["saturated"] and out["B"]["alloc_tokens"] == 200
    d = out["D"]
    assert d["capped"] and not d["saturated"]
    assert d["avail_tokens"] == 337 and d["alloc_tokens"] == 325
    assert d["rate"] == 0.325
    assert sum(r["alloc_tokens"] for r in out.values()) == 675


def test_budget_waterfill_underfilled_and_remainder(spark):
    """Budget above total availability -> every source saturated, taken
    whole, budget underfilled. And a remainder case: budget=100 over
    3 uncapped equal sources -> level 33, first source in (avail,
    source) order gets the +1."""
    from spark_nnd_spark.operators.sampling import budget_waterfill

    df = spark.createDataFrame(
        [("A", 10), ("B", 20)], "source string, tokens long"
    )
    out = {
        r["source"]: r
        for r in budget_waterfill(df, budget_frac=(2, 1), cap_frac=(1, 1)).collect()
    }
    assert all(r["saturated"] for r in out.values())
    assert out["A"]["alloc_tokens"] == 10 and out["B"]["alloc_tokens"] == 20

    df2 = spark.createDataFrame(
        [("x", 500), ("y", 500), ("z", 500)], "source string, tokens long"
    )
    # budget = 1500 * 1 // 15 = 100; nobody saturated (500*3 > 100)
    out2 = {
        r["source"]: r
        for r in budget_waterfill(df2, budget_frac=(1, 15), cap_frac=(1, 1)).collect()
    }
    allocs = [out2[s]["alloc_tokens"] for s in ("x", "y", "z")]
    assert allocs == [34, 33, 33]  # level 33, remainder 1 -> first in order
    assert sum(allocs) == 100


def test_dsir_log_weights_hand_computed(spark):
    """Hand-computed add-one-smoothed target/raw log ratios on a
    3-doc corpus: raw = {a:3, b:1, c:3} (total 7, V=3), target (d1)
    = {a:2, b:1} (total 3); the target-like doc scores positive,
    the off-target doc negative."""
    import math

    from spark_nnd_spark.operators.sampling import dsir_log_weights

    df = spark.createDataFrame(
        [(1, "a a b", True), (2, "a c", False), (3, "c c", False)],
        "doc_id long, text string, is_tgt boolean",
    )
    out = {
        r["doc_id"]: r
        for r in dsir_log_weights(
            df, F.split("text", " "), "is_tgt"
        ).collect()
    }

    def lw(tgt, raw):
        return math.log((tgt + 1) / (3 + 3)) - math.log((raw + 1) / (7 + 3))

    assert out[1]["n_tokens"] == 3
    assert out[1]["log_weight"] == pytest.approx(2 * lw(2, 3) + lw(1, 1), abs=1e-6)
    assert out[2]["log_weight"] == pytest.approx(lw(2, 3) + lw(0, 3), abs=1e-6)
    assert out[3]["log_weight"] == pytest.approx(2 * lw(0, 3), abs=1e-6)
    assert out[1]["log_weight"] > 0 > out[3]["log_weight"]


# ------------------------------------ leakage-safe split (q141)

def test_leakage_safe_split_clusters_never_straddle(spark):
    """Every member of a near-dup component gets the identical
    (bucket, split); singletons hash their own id; buckets live in
    [0, 100) and splits in {train, val, test}."""
    from spark_nnd_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r for r in leakage_safe_split(docs, pairs).collect()}
    assert len(out) == 6
    assert out[1]["component"] == out[2]["component"] == out[3]["component"] == 1
    assert out[5]["component"] == out[6]["component"] == 5
    assert out[4]["component"] == 4  # singleton: its own label
    for grp in ([1, 2, 3], [5, 6]):
        assert len({(out[i]["bucket"], out[i]["split"]) for i in grp}) == 1
    for r in out.values():
        assert 0 <= r["bucket"] < 100
        assert r["split"] in {"train", "val", "test"}


# ------------------------------ KMV set algebra (q145 family)

def test_kmv_pair_jaccard_exact_when_k_covers_union(spark):
    """With k >= |union| the KMV resemblance estimator IS the exact
    Jaccard (U_k = the whole union); disjoint pairs read 0. Also
    checks the k-truncated branch against the estimator's definition
    (the k smallest union hashes, counted for joint membership)."""
    from spark_nnd_spark.operators.sketches import (
        kmv_group_minhashes,
        kmv_pair_jaccard,
    )

    rows = (
        [("a", h) for h in range(1, 41)]
        + [("b", h) for h in range(21, 61)]
        + [("c", h) for h in range(100, 111)]
    )
    df = spark.createDataFrame(rows, "src string, h long")
    mins = kmv_group_minhashes(df, "src", F.col("h"), k=64)
    out = {
        (r["grp_a"], r["grp_b"]): r
        for r in kmv_pair_jaccard(mins, k=64).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert ab["n_union_kept"] == 60 and ab["n_both"] == 20
    assert ab["jaccard_est"] == pytest.approx(20 / 60, abs=1e-6)
    assert out[("a", "c")]["n_both"] == 0
    assert out[("a", "c")]["jaccard_est"] == 0.0

    # k-truncated branch: U_16 of (a, b) is hashes 1..16 — all a-only
    mins16 = kmv_group_minhashes(df, "src", F.col("h"), k=16)
    trunc = {
        (r["grp_a"], r["grp_b"]): r
        for r in kmv_pair_jaccard(mins16, k=16).collect()
    }
    assert trunc[("a", "b")]["n_union_kept"] == 16
    assert trunc[("a", "b")]["n_both"] == 0


def test_lr_train_curve_converges(spark):
    """q169: the per-epoch train losses must be monotone decreasing
    (full-batch GD on a smooth convex loss with a sane rate), weights
    must move every epoch, and the held-out AUC rows must be valid
    probabilities or the -1.0 single-class sentinel."""
    from spark_nnd_spark.queries.pipeline import (
        LR_EPOCHS,
        q169_lr_train_curve,
    )
    from tests.conftest import SF_SMOKE

    rows = q169_lr_train_curve(spark, SF_SMOKE).collect()
    losses = [r.value for r in rows if r.kind == "loss"]
    assert len(losses) == LR_EPOCHS
    assert all(a > b for a, b in zip(losses, losses[1:])), losses
    weights = {(r.epoch, r.name): r.value for r in rows if r.kind == "weight"}
    assert len(weights) == 4 * LR_EPOCHS
    # gradient steps actually move the parameters epoch over epoch
    assert any(
        weights[(e, n)] != weights[(e + 1, n)]
        for e in range(1, LR_EPOCHS)
        for n in ("bias", "ntok", "stop", "ttr")
    )
    aucs = [r.value for r in rows if r.kind == "auc"]
    assert aucs and all(v == -1.0 or 0.0 <= v <= 1.0 for v in aucs)


def test_auto_df_cap_tracks_corpus(spark):
    """'auto' df-cut (the BENCH_SF1_SPOT fix): on a small / open-vocab
    corpus the derived cap sits at-or-above the whole df distribution
    (nothing cut — results equal the uncut join); on a
    vocabulary-saturated corpus with a Zipf head the cap lands between
    head and body, so ONLY the quadratic head keys are cut — without
    hand-tuning an absolute."""
    from spark_nnd_spark.operators.dedup import derived_df_cap

    # open-ish fixture: every doc mostly unique — auto == uncut rows
    rows = [(i, f"u{i} v{i} w{i} x{i} y{i} z{i}") for i in range(30)]
    rows += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon eta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    auto = {(r.id_a, r.id_b)
            for r in DD.jaccard_pairs(docs, n=3, threshold=0.1).collect()}
    uncut = {(r.id_a, r.id_b)
             for r in DD.jaccard_pairs(
                 docs, n=3, threshold=0.1, max_shingle_freq=None
             ).collect()}
    assert auto == uncut and (100, 101) in auto

    # saturated fixture: one boilerplate shingle in EVERY doc (df 400,
    # the Zipf head) over a body of df<=2 content shingles — the
    # derived cap must land strictly between body and head
    sat = [(i, f"the quick brown p{i % 200} q{i % 200} r{i}")
           for i in range(400)]
    sdocs = spark.createDataFrame(sat, "doc_id long, text string")
    posts = sdocs.select(
        F.col("doc_id"),
        F.explode(
            __import__(
                "spark_nnd_spark.functions.text", fromlist=["text"]
            ).shingles_expr("text", 3)
        ).alias("shingle"),
    )
    cap = derived_df_cap(posts.groupBy("shingle").agg(F.count("*").alias("df")))
    assert 2 <= cap < 400
    # with the head cut, boilerplate-ONLY pairs (overlap = just the
    # hot shingle, J = 1/7) vanish and the join is no longer quadratic
    # in the hot key; the 200 genuine content pairs all survive
    pairs = {(r.id_a, r.id_b)
             for r in DD.jaccard_pairs(sdocs, n=3, threshold=0.1).collect()}
    uncut = {(r.id_a, r.id_b)
             for r in DD.jaccard_pairs(
                 sdocs, n=3, threshold=0.1, max_shingle_freq=None
             ).collect()}
    content = {(i, i + 200) for i in range(200)}
    assert pairs == content
    assert len(uncut) > 10_000 and content <= uncut


def test_auto_df_cut_is_observable(spark, caplog):
    """r11 ADVICE: the 'auto' default silently traded recall — an
    ENGAGED cut must now emit a WARNING with the dropped-posting
    counts and record the derivation in LAST_DERIVED_CAP, so callers
    can audit the trade without re-deriving the histogram."""
    import logging

    from spark_nnd_spark.functions import text as TX
    from spark_nnd_spark.operators.dedup import (
        LAST_DERIVED_CAP,
        derived_df_cap,
    )

    sat = [(i, f"the quick brown p{i % 200} q{i % 200} r{i}")
           for i in range(400)]
    sdocs = spark.createDataFrame(sat, "doc_id long, text string")
    posts = sdocs.select(
        F.col("doc_id"),
        F.explode(TX.shingles_expr("text", 3)).alias("shingle"),
    ).groupBy("shingle").agg(F.count("*").alias("df"))
    with caplog.at_level(logging.WARNING, "spark_nnd_spark.operators.dedup"):
        cap = derived_df_cap(posts)
    assert LAST_DERIVED_CAP["cap"] == cap
    assert LAST_DERIVED_CAP["max_df"] == 400
    assert LAST_DERIVED_CAP["keys_cut"] >= 1
    assert LAST_DERIVED_CAP["postings_cut"] >= 400
    assert any("auto df-cut engaged" in r.message for r in caplog.records)

    # a cut that does NOT engage (open vocab) stays silent
    open_posts = spark.createDataFrame(
        [(f"s{i}", 1) for i in range(50)], "shingle string, df long"
    )
    caplog.clear()
    with caplog.at_level(logging.WARNING, "spark_nnd_spark.operators.dedup"):
        derived_df_cap(open_posts)
    assert LAST_DERIVED_CAP["keys_cut"] == 0
    assert not caplog.records


def test_pack_whole_docs_next_fit(spark):
    """Whole-doc next-fit packing: hand-computed assignments on a
    fixture (context 10, block 4) — docs never split, bins open on
    overflow, an oversize doc (n > context) packs alone, and blocks
    pack independently."""
    from spark_nnd_spark.operators.sampling import pack_whole_docs

    lens = [4, 5, 3, 12, 2, 9, 1, 10]
    df = spark.createDataFrame(
        [("s", i, " ".join(["w"] * n)) for i, n in enumerate(lens)],
        "source string, doc_id long, text string",
    )
    out = pack_whole_docs(
        df, F.size(F.split("text", " ")), context_len=10, block_docs=4
    )
    rows = {r.doc_id: r for r in out.collect()}
    # block 0: 4+5=9 -> bin0; 3 overflows -> bin1; 12 oversize -> bin2
    assert [(rows[i].block, rows[i].bin) for i in range(4)] == [
        (0, 0), (0, 0), (0, 1), (0, 2)]
    assert rows[1].fill_after == 9 and rows[3].oversize == 1
    # block 1 restarts: 2 -> bin0; 9 overflows -> bin1; 1 fits (fill
    # 10); 10 overflows -> bin2
    assert [(rows[i].block, rows[i].bin) for i in range(4, 8)] == [
        (1, 0), (1, 1), (1, 1), (1, 2)]
    assert rows[6].fill_after == 10
    # every doc exactly once; non-oversize pack totals respect context
    assert out.count() == len(lens)
    packs = out.groupBy("source", "block", "bin").agg(
        F.sum("n_tokens").alias("tot"), F.max("oversize").alias("ov")
    )
    assert packs.filter((F.col("ov") == 0) & (F.col("tot") > 10)).count() == 0


def test_kmeans_curve_monotone_inertia(spark):
    """Lloyd's algorithm never increases inertia: the q178 kernel on a
    clustered fixture must produce a non-increasing exact-integer
    inertia curve and keep every cluster alive."""
    import numpy as np

    from spark_nnd_spark.operators.clustering import kmeans_curve

    rng = np.random.default_rng(7)
    centers = rng.normal(0, 1, (4, 8))
    rows = [
        (i, (centers[i % 4] + rng.normal(0, 0.05, 8)).tolist())
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_curve(df, k=4, iters=3).collect()
    inert = [r.inertia_micro2 for r in out]
    assert inert == sorted(inert, reverse=True)
    assert all(r.n_clusters == 4 for r in out)
    # determinism: same input, same exact integers
    again = [r.inertia_micro2 for r in kmeans_curve(df, k=4, iters=3).collect()]
    assert again == inert


def test_kmeans_curve_rejects_unseedable_id_space(spark):
    """Seeding takes ids < k; an id space starting at 100 yields zero
    seeds and must raise a clear ValueError, not an opaque array
    failure (r11 ADVICE)."""
    import pytest

    from spark_nnd_spark.operators.clustering import kmeans_curve

    df = spark.createDataFrame(
        [(100 + i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ids < k"):
        kmeans_curve(df, k=4, iters=1)


def test_power_iteration_survives_constant_corpus(spark):
    """A constant-embedding corpus has a ZERO covariance matrix; the
    power loop must not divide by the zero norm (r11 ADVICE) — it
    emits rows (lambda 0) and keeps the iterate."""
    from spark_nnd_spark.operators.clustering import (
        int_covariance,
        top_eigen_power,
    )

    df = spark.createDataFrame(
        [(i, [0.5] * 4) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    out = top_eigen_power(int_covariance(df, dim=4), dim=4, iters=2).collect()
    assert [r.iter for r in out] == [1, 2]
    assert all(r.lambda_top == 0.0 for r in out)


def test_chunk_tokens_windows_and_edges(spark):
    """Chunk coordinates on a hand-checked fixture: overlap covers
    every token, the tail chunk is short with its TRUE length, a doc
    shorter than one window yields exactly one chunk, and an empty doc
    yields none."""
    from spark_nnd_spark.operators.sampling import chunk_tokens

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "a b c"),                               # 3 tokens
            (3, ""),                                    # empty -> none
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.chunk_idx): r
        for r in chunk_tokens(docs, size=4, stride=3).collect()
    }
    # doc 1: starts 0,3,6,9 -> 4 chunks; last has 1 token
    assert sorted(k for k in out if k[0] == 1) == [(1, i) for i in range(4)]
    assert out[(1, 0)].chunk_text == "t0 t1 t2 t3"
    assert out[(1, 1)].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
    assert out[(1, 3)].chunk_text == "t9" and out[(1, 3)].n_tokens == 1
    # every token of doc 1 appears in >= 1 chunk
    covered = set()
    for k, r in out.items():
        if k[0] == 1:
            covered.update(r.chunk_text.split(" "))
    assert covered == {f"t{i}" for i in range(10)}
    # doc 2: one short chunk; doc 3: absent
    assert sorted(k for k in out if k[0] == 2) == [(2, 0)]
    assert out[(2, 0)].n_tokens == 3 and out[(2, 0)].chunk_text == "a b c"
    assert not [k for k in out if k[0] == 3]
    import pytest

    with pytest.raises(ValueError, match="positive"):
        chunk_tokens(docs, size=0, stride=3)


def test_quality_select_quota_and_ties(spark):
    """q189 kernel semantics on a fixture with score ties at the
    boundary: per-source quota is n*pct div 100, full buckets keep
    whole, the boundary bucket admits by ascending doc_id."""
    from spark_nnd_spark.queries.pipeline import q189_quality_select

    # use the real query at smoke SF and check the quota invariant
    out = q189_quality_select(spark, SF_SMOKE).collect()
    import collections

    per = collections.Counter(r.source for r in out)
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ns = {r.source: r.n for r in d.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    from spark_nnd_spark.queries.pipeline import SELECT_PCT

    for s, n in ns.items():
        assert per.get(s, 0) == (n * SELECT_PCT) // 100, s


def test_binary_index_duplicate_submission_upsert(spark, tmp_path):
    """The vector families share the full-upsert kernel: re-extending
    a LIVE vec_id replaces its rows (the batch's version wins), never
    duplicates them — a duplicate would surface twice in top-k."""
    import numpy as np

    from spark_nnd_spark.operators.similarity import (
        build_binary_index,
        extend_binary_index,
    )

    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(40)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = str(tmp_path / "bidx")
    build_binary_index(corpus, idx)
    moved = spark.createDataFrame(
        [(0, [9.0] * 8)], "vec_id long, embedding array<double>"
    )
    extend_binary_index(spark, idx, moved)
    full = spark.read.parquet(f"{idx}/full")
    assert full.filter(F.col("nb_id") == 0).count() == 1  # replaced, not doubled
    assert spark.read.parquet(f"{idx}/bits").filter(
        F.col("nb_id") == 0
    ).count() == 1
    vec_col = [c for c in full.columns if c != "nb_id"][0]
    got = full.filter(F.col("nb_id") == 0).collect()[0]
    assert list(got[vec_col]) == [9.0] * 8
