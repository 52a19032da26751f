#!/usr/bin/env python
"""sf1.0 spot-bench (VERDICT r9 stretch): run the most expensive
headline queries at 10x the bench tier and record the wall + shuffle
scaling ratio per query — the cheapest direct evidence that nothing
superlinear hides between the plan-shape asserts and the 100 TB story.

/root/testdata ships no sf1.0 and is read-only, so the sweep generates
a synthetic corpus family that mirrors the testdata's measured shape
(31-word vocabulary, 10-100 tokens/doc, 20 sources, 5 langs, ~5%
planted 2-edit near-dups; 64-dim clustered embeddings) at BOTH scales
— sf0.1-equivalent (5k docs / 2k vecs) and sf1.0 (50k docs / 20k vecs)
— and compares each query against ITSELF across the 10x step. Same
per-id deterministic generation at both scales (the bench_dedup.py
convention), so the ratio isolates scaling, not corpus-shape drift.

Exclusions (documented, not silent): q24/q33's brute-force exact tier
is O(N^2) BY DESIGN (it is the recall oracle, not a production path);
the q103/q105-family indexed queries amortize a session index build
that would pollute a single-shot measure (their probe scaling is
already measured in BENCH_DEDUP_SCALE.json).

Usage: python scripts/bench_sf1_spot.py  (writes BENCH_SF1_SPOT.json)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from spark_nnd_spark import get_spark  # noqa: E402

SEED = 42
VOCAB_SRC = "/root/testdata/sf0.1/documents.parquet"
SPOT_QUERIES = [
    "q25_nnd_graph",
    "q83_incremental_dedup",
    "q155_curation_board",
    "q153_dedup_sweep",
    "q16_minhash_lsh_pairs",
    "q14_jaccard_pairs",
    "q88_containment_pairs",
    "q74_shingle_novelty",
    "q79_pq_adc_topk",
    "q61_dedup_keep",
    "q156_exact_spans",
    "q164_dup_flow",
    "q165_lm_perplexity",
    "q173_pack_manifest",
    "q175_boilerplate_ngrams",
    "q176_preference_pairs",
    "q177_pca_power",
    "q178_kmeans_curve",
    "q186_chunk_export",
    "q188_source_divergence",
    "q189_quality_select",
    "q190_corpus_export",
    "q191_chunk_bm25",
    "q203_domain_quality",
    "q204_domain_blocklist",
    "q206_gapfill_locf",
    "q207_ohlc_bars",
    "q208_prototype_prune",
    "q205_indexed_winnow",
    "q209_indexed_winnow_pairs",
    "q210_gapfill_grain",
    "q201_indexed_graph_search",
    "q211_extended_graph_recall",
    "q212_rollup_ohlc",
    "q213_rollup_daily",
    "q214_rollup_gapfill",
    "q215_rollup_refresh",
]
# (docs, vecs, events, users) — events/users mirror the testdata's
# measured density (sf0.01 = 10k events / 150 users over 30 days)
SCALES = {
    "sf0.1eq": (5000, 2000, 100_000, 1500),
    "sf1.0": (50000, 20000, 1_000_000, 15000),
}
LANGS = ["en", "de", "fr", "es", "pt"]
N_CLUSTERS = 8
DIM = 64


def _vocab() -> list[str]:
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT DISTINCT unnest(string_split(text, ' ')) AS t"
        f" FROM '{VOCAB_SRC}' ORDER BY t"
    ).fetchall()
    return [r[0] for r in rows]


def _gen_documents(n: int, vocab: list[str], out: str) -> None:
    """Deterministic per-id docs mirroring the testdata shape; every
    20th doc is a 2-token-edit near-dup of its predecessor (the
    testdata's ~5% planted near-dup density)."""
    rng = np.random.default_rng(SEED)
    v = np.array(vocab)
    rows = []
    prev_toks: list[str] | None = None
    for i in range(n):
        if i % 20 == 19 and prev_toks is not None:
            toks = list(prev_toks)
            for j in rng.integers(0, len(toks), size=2):
                toks[int(j)] = str(v[int(rng.integers(0, len(v)))])
        else:
            ln = int(rng.integers(10, 101))
            toks = [str(x) for x in v[rng.integers(0, len(v), size=ln)]]
        text = " ".join(toks)
        rows.append(
            (i, text, LANGS[i % len(LANGS)], f"src{i % 20}", len(text))
        )
        prev_toks = toks
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(out, index=False)


def _gen_embeddings(n: int, out: str) -> None:
    rng = np.random.default_rng(SEED + 1)
    centers = rng.uniform(-50, 50, size=(N_CLUSTERS, DIM))
    cluster = rng.integers(0, N_CLUSTERS, size=n)
    vecs = centers[cluster] + rng.normal(0, 3.0, size=(n, DIM))
    pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in vecs],
            "label": cluster.astype(np.int32),
        }
    ).to_parquet(out, index=False)


def _gen_events(n: int, n_users: int, out: str) -> None:
    """Deterministic events mirroring the testdata shape: 30 days of
    uniformly-spaced timestamps, 5 types, 2-decimal values."""
    rng = np.random.default_rng(SEED + 2)
    span_us = 30 * 86400 * 1_000_000
    base = np.datetime64("2024-01-01", "us")
    ts = base + np.sort(rng.integers(0, span_us, size=n)).astype(
        "timedelta64[us]"
    )
    types = np.array(["click", "view", "purchase", "error", "scroll"])
    pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
            "event_type": types[rng.integers(0, len(types), size=n)],
            "value": np.round(rng.uniform(0, 20, size=n), 2),
            "props": [f'{{"k": {int(x)}}}' for x in rng.integers(0, 100, size=n)],
        }
    ).to_parquet(out, index=False)


def _stage_writes(spark) -> dict[int, int] | None:
    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        if not base:
            return None
        stages = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages")
        )
        return {s["stageId"]: s.get("shuffleWriteBytes", 0) for s in stages}
    except Exception:  # noqa: BLE001
        return None


def main() -> None:
    from spark_nnd_spark.queries.knn import KNN_QUERIES
    from spark_nnd_spark.queries.pipeline import PIPELINE_QUERIES

    all_q = {**PIPELINE_QUERIES, **KNN_QUERIES}
    vocab = _vocab()
    root = tempfile.mkdtemp(prefix="sf1spot_")
    for tag, (nd, nv, ne, nu) in SCALES.items():
        d = os.path.join(root, tag)
        os.makedirs(d, exist_ok=True)
        _gen_documents(nd, vocab, f"{d}/documents.parquet")
        _gen_embeddings(nv, f"{d}/embeddings.parquet")
        _gen_events(ne, nu, f"{d}/events.parquet")
        print(
            f"# generated {tag}: {nd} docs / {nv} vecs / {ne} events",
            file=sys.stderr,
        )

    spark = get_spark(
        app_name="bench_sf1_spot",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "20000",
        },
    )
    results: dict[str, dict] = {}
    for tag in SCALES:
        d = os.path.join(root, tag)
        for name in SPOT_QUERIES:
            import gc

            gc.collect()
            spark._jvm.System.gc()  # noqa: SLF001
            before = _stage_writes(spark)
            t0 = time.perf_counter()
            try:
                n_rows = all_q[name](spark, d).count()
                err = None
            except Exception as exc:  # noqa: BLE001
                n_rows, err = None, f"{type(exc).__name__}: {exc}"[:200]
            dt = round(time.perf_counter() - t0, 3)
            sh = None
            if before is not None:
                after = _stage_writes(spark)
                if after is not None:
                    sh = round(
                        sum(b - before.get(s, 0) for s, b in after.items())
                        / 1e6,
                        2,
                    )
            rec = results.setdefault(name, {})
            rec[tag] = {"sec": dt, "rows": n_rows, "shuffle_mb": sh, "err": err}
            print(f"# {tag} {name}: {dt:.2f}s rows={n_rows} sh={sh}", file=sys.stderr)

    out = []
    for name in SPOT_QUERIES:
        a, b = results[name].get("sf0.1eq", {}), results[name].get("sf1.0", {})
        ratio = (
            round(b["sec"] / a["sec"], 2)
            if a.get("sec") and b.get("sec") and not (a["err"] or b["err"])
            else None
        )
        sh_ratio = (
            round(b["shuffle_mb"] / a["shuffle_mb"], 2)
            if a.get("shuffle_mb") and b.get("shuffle_mb")
            else None
        )
        out.append(
            {
                "query": name,
                "sf01eq_sec": a.get("sec"),
                "sf1_sec": b.get("sec"),
                "wall_ratio_10x": ratio,
                "sf01eq_shuffle_mb": a.get("shuffle_mb"),
                "sf1_shuffle_mb": b.get("shuffle_mb"),
                "shuffle_ratio_10x": sh_ratio,
                "sf01eq_rows": a.get("rows"),
                "sf1_rows": b.get("rows"),
                "err": a.get("err") or b.get("err"),
            }
        )
    record = {
        "scales": {
            k: {"docs": v[0], "vecs": v[1], "events": v[2], "users": v[3]}
            for k, v in SCALES.items()
        },
        "excluded": {
            "q24_knn_exact/q33_ann_recall": "brute-force exact tier is "
            "O(N^2) by design (recall oracle, not a production path)",
            "q103/q105-family": "session index build would pollute a "
            "single-shot measure; probe scaling measured in "
            "BENCH_DEDUP_SCALE.json",
        },
        "results": out,
    }
    dest = os.environ.get("SF1_SPOT_OUT", "BENCH_SF1_SPOT.json")
    with open(dest, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps({"metric": "sf1_spot", "n_queries": len(out), "out": dest}))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
