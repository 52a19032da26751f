"""Text-analysis column expressions with engine-portable semantics.

Everything here is defined by *integer and IEEE-double arithmetic only*
(polynomial rolling hashes mod a prime, ratios of counts), so each
builder has two renderings with bit-identical results:

- a Spark ``Column`` (``*_expr``) built from ``split``/``transform``/
  ``aggregate`` — JVM-side, codegen'd, no UDFs;
- an ANSI-SQL string (``*_sql``) DuckDB runs as the correctness oracle
  (``string_split``/``list_transform``/``list_reduce``).

This is what makes the dedup family (fingerprint, MinHash) fully
DuckDB-checkable instead of relying on engine-specific hash builtins
(Spark's xxhash64 and DuckDB's hash() disagree, so neither can be an
oracle for the other).

Reference provenance: the reference engine has no string functions at
all (SURVEY.md §2.3 "Scalar functions: math only") — this module is the
training-data-pipeline extension layer, built on the same primitives
(per-group agg, top-K) the reference algorithm uses.

Hash design (shared constants below):
- token hash: left fold over character codes ``h = (h*31 + ascii(c)) % P``
  (Java-`String.hashCode`-style, made portable by the mod);
- document fingerprint: left fold over token hashes
  ``H = (H*131 + h_t) % P`` — a rolling hash of the token stream;
- MinHash_j: ``min over distinct shingles s of (A_j * hash(s) + B_j) % P``
  with per-row affine constants — the classic universal-hash family.
  ``A_j*h < 2^63`` holds because ``A_j ≤ 2*16+3`` and ``h < P ≈ 2^30``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007  # prime modulus for all rolling hashes
TOKEN_BASE = 31
DOC_BASE = 131


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------- tokens

def tokens_expr(text: Column | str) -> Column:
    """Whitespace tokenization (single-space delimiter, matching the
    corpus format and DuckDB's non-regex string_split)."""
    return F.split(_c(text), " ")


def tokens_sql(text: str = "text") -> str:
    return f"string_split({text}, ' ')"


def token_count_expr(text: Column | str) -> Column:
    return F.size(tokens_expr(text))


def token_count_sql(text: str = "text") -> str:
    return f"len({tokens_sql(text)})"


# ----------------------------------------------------------- token hash

def token_hash_lambda(tok: Column) -> Column:
    """Polynomial hash of one token: fold (h*31 + ascii(char)) % P."""
    return F.aggregate(
        F.split(tok, ""),
        F.lit(0).cast("long"),
        lambda h, ch: (h * TOKEN_BASE + F.ascii(ch)) % P,
    )


def token_hash_sql(tok: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({tok}, ''), ch -> ascii(ch)::BIGINT)), "
        f"(h, c) -> (h * {TOKEN_BASE} + c) % {P})"
    )


# ------------------------------------------------------ doc fingerprint

def fingerprint_expr(text: Column | str) -> Column:
    """Rolling hash of the whole token stream — order-sensitive document
    fingerprint (two docs collide iff token sequences match, w.h.p.)."""
    return F.aggregate(
        tokens_expr(text),
        F.lit(0).cast("long"),
        lambda h, tok: (h * DOC_BASE + token_hash_lambda(tok)) % P,
    )


def fingerprint_sql(text: str = "text") -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform({tokens_sql(text)}, t -> {token_hash_sql('t')})), "
        f"(h, th) -> (h * {DOC_BASE} + th) % {P})"
    )


# -------------------------------------------------------------- shingles

def shingles_expr(text: Column | str, n: int = 3) -> Column:
    """Distinct n-token shingles (space-joined). Short docs (< n tokens)
    yield an empty array."""
    toks = tokens_expr(text)
    return F.array_distinct(
        F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - n + 1),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        )
    )


def shingles_sql(text: str = "text", n: int = 3) -> str:
    toks = tokens_sql(text)
    inner = (
        f"list_transform(range(1, len({toks}) - {n} + 2), "
        f"i -> array_to_string(list_transform(range(i, i + {n}), j -> {toks}[j]), ' '))"
    )
    return f"list_distinct(CASE WHEN len({toks}) < {n} THEN [] ELSE {inner} END)"


# ----------------------------------------------------- repetition stats

def ngrams_expr(text: Column | str, n: int = 2) -> Column:
    """ALL n-token grams in order (space-joined, duplicates kept —
    unlike shingles_expr, which dedups for set-similarity). Short docs
    (< n tokens) yield an empty array."""
    toks = tokens_expr(text)
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def ngrams_sql(text: str = "text", n: int = 2) -> str:
    toks = tokens_sql(text)
    inner = (
        f"list_transform(range(1, len({toks}) - {n} + 2), "
        f"i -> array_to_string(list_transform(range(i, i + {n}), j -> {toks}[j]), ' '))"
    )
    return f"CASE WHEN len({toks}) < {n} THEN [] ELSE {inner} END"


def repetition_stats_expr(ngrams: Column) -> Column:
    """struct(best, dup) over an n-gram array, computed NARROW — sort
    the grams and run-length-scan them in one F.aggregate fold, no
    explode/groupBy: ``best`` = occurrences of the most frequent gram,
    ``dup`` = total occurrences of grams appearing >= 2 times (when a
    run reaches 2 both members count, each further member adds 1).
    The sentinel prev='' never equals a real gram: for n >= 2 every
    gram contains the join space. Empty array folds to (0, 0)."""
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit("").alias("prev"),
        zero.alias("run"),
        zero.alias("best"),
        zero.alias("dup"),
    )

    def step(acc, x):
        run = (
            F.when(x == acc["prev"], acc["run"] + F.lit(1))
            .otherwise(F.lit(1))
            .cast("long")
        )
        dup = (
            acc["dup"]
            + F.when(run == 2, F.lit(2)).when(run > 2, F.lit(1)).otherwise(F.lit(0))
        ).cast("long")
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            dup.alias("dup"),
        )

    return F.aggregate(
        F.array_sort(_c(ngrams)),
        init,
        step,
        lambda acc: F.struct(acc["best"].alias("best"), acc["dup"].alias("dup")),
    )


# -------------------------------------------------------------- minhash

def minhash_expr(text: Column | str, num_hashes: int = 16, n: int = 3) -> Column:
    """MinHash signature over n-token shingles: array of ``num_hashes``
    minima of affine universal hashes of the shingle hashes. Empty
    shingle set → signature of P (sentinel > any hash value)."""
    sh = shingles_expr(text, n)
    hashes = F.transform(sh, token_hash_lambda)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda j: F.coalesce(
            F.array_min(
                F.transform(hashes, lambda h: (h * (2 * j + 3) + j * 7919) % P)
            ),
            F.lit(P).cast("long"),
        ),
    )


def minhash_sql(text: str = "text", num_hashes: int = 16, n: int = 3) -> str:
    sh = shingles_sql(text, n)
    hashes = f"list_transform({sh}, s -> {token_hash_sql('s')})"
    return (
        f"list_transform(range(0, {num_hashes}), "
        f"j -> coalesce(list_min(list_transform({hashes}, "
        f"h -> (h * (2*j + 3) + j * 7919) % {P})), {P}::BIGINT))"
    )


# ----------------------------------------------------------- text stats

EN_STOP = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def stopword_ratio_expr(text: Column | str) -> Column:
    toks = tokens_expr(text)
    return F.size(F.filter(toks, lambda t: t.isin(*EN_STOP))) / F.size(toks)


def stopword_ratio_sql(text: str = "text") -> str:
    lst = ", ".join(f"'{w}'" for w in EN_STOP)
    toks = tokens_sql(text)
    return f"len(list_filter({toks}, t -> t IN ({lst}))) * 1.0 / len({toks})"


def avg_token_len_expr(text: Column | str) -> Column:
    toks = tokens_expr(text)
    return F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)) / F.size(toks)


def avg_token_len_sql(text: str = "text") -> str:
    toks = tokens_sql(text)
    return f"list_sum(list_transform({toks}, t -> length(t)))::DOUBLE / len({toks})"


def type_token_ratio_expr(text: Column | str) -> Column:
    """Lexical diversity: distinct tokens / tokens — a quality signal
    (word-soup spam scores low)."""
    toks = tokens_expr(text)
    return F.size(F.array_distinct(toks)) / F.size(toks)


def type_token_ratio_sql(text: str = "text") -> str:
    toks = tokens_sql(text)
    return f"len(list_distinct({toks})) * 1.0 / len({toks})"


# ------------------------------------------------------------- language

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "of", "and", "to", "is", "in"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "fr": ("le", "la", "les", "et", "des", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3"),
}


def lang_scores_expr(text: Column | str) -> dict[str, Column]:
    """Marker-stopword hit count per language (n-gram-heuristic family).
    Deterministic; prediction = argmax with ascending-lang tiebreak."""
    toks = tokens_expr(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predicted_lang_expr(text: Column | str) -> Column:
    scores = lang_scores_expr(text)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    # max score, ties broken by ascending lang: sort by (-score, lang)
    best = F.array_min(
        F.transform(pairs, lambda p: F.struct((-p["score"]).alias("neg"), p["lang"].alias("lang")))
    )
    return best["lang"]


def lang_scores_sql(text: str = "text") -> dict[str, str]:
    toks = tokens_sql(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in markers)
        out[lang] = f"len(list_filter({toks}, t -> t IN ({lst})))"
    return out


def predicted_lang_sql(text: str = "text") -> str:
    scores = lang_scores_sql(text)
    structs = ", ".join(
        f"{{'neg': -({scores[lang]}), 'lang': '{lang}'}}" for lang in sorted(LANG_MARKERS)
    )
    return f"(list_min([{structs}])).lang"


# ------------------------------------------------------------ winnowing

def ordered_shingle_hashes_expr(text: Column | str, n: int = 4) -> Column:
    """Positional n-token shingle hashes — NOT distinct and NOT
    reordered, because winnowing's window selection is
    position-sensitive. Short docs (< n tokens) yield an empty array."""
    toks = tokens_expr(text)
    return F.when(F.size(toks) < n, F.array().cast("array<long>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: token_hash_lambda(F.array_join(F.slice(toks, i, n), " ")),
        )
    )


def ordered_shingle_hashes_sql(text: str = "text", n: int = 4) -> str:
    toks = tokens_sql(text)
    shingle = (
        f"array_to_string(list_transform(range(i, i + {n}), j -> {toks}[j]), ' ')"
    )
    inner = (
        f"list_transform(range(1, len({toks}) - {n} + 2), "
        f"i -> {token_hash_sql(shingle)})"
    )
    return f"CASE WHEN len({toks}) < {n} THEN [] ELSE {inner} END"


def winnow_select_expr(hashes: Column | str, w: int = 4) -> Column:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003): slide a window of ``w`` consecutive shingle hashes
    and record each window's MINIMUM; the fingerprint set is the
    distinct minima. Guarantees every run of ``w`` shingles contributes
    a fingerprint (the window-coverage property the matching guarantee
    rests on) while keeping only ~2/(w+1) of the hashes — the standard
    local-document-fingerprint scheme behind plagiarism/near-dup
    detection at corpus scale. A doc shorter than one window (but with
    ≥1 shingle) is its own single window; empty in → empty out.

    Pure array-lambda arithmetic (no shuffle, no UDF); pass a
    pre-projected hashes column so the shingle hashing runs once."""
    hs = _c(hashes) if isinstance(hashes, str) else hashes
    starts = F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(hs) - w + 1))
    mins = F.transform(starts, lambda s: F.array_min(F.slice(hs, s, w)))
    return F.when(F.size(hs) == 0, F.array().cast("array<long>")).otherwise(
        F.array_distinct(mins)
    )


def winnow_select_sql(hashes: str, w: int = 4) -> str:
    """DuckDB rendering of winnow_select_expr. ``hashes`` should be a
    column name (it is referenced several times); DuckDB list slices
    are 1-based, inclusive on both ends, and clamp to the list end."""
    mins = (
        f"list_transform(range(1, greatest(1, len({hashes}) - {w - 1}) + 1), "
        f"s -> list_min(({hashes})[s : s + {w - 1}]))"
    )
    return (
        f"CASE WHEN len({hashes}) = 0 THEN [] "
        f"ELSE list_distinct({mins}) END"
    )


# -------------------------------------- hashed linear quality model

MODEL_DIM = 1024          # hashing-trick feature space
MODEL_WMOD = 1997         # prime: bucket -> integer weight numerator
MODEL_WMUL = 2654435761   # Knuth multiplicative constant
MODEL_BIAS = 0.1


def hashed_bucket_lambda(tok: Column) -> Column:
    """Hashing-trick feature bucket of one token: the polynomial token
    hash folded into MODEL_DIM buckets."""
    return token_hash_lambda(tok) % MODEL_DIM


def hashed_bucket_sql(tok: str) -> str:
    return f"({token_hash_sql(tok)} % {MODEL_DIM})"


def linear_score_expr(text: Column | str) -> Column:
    """fastText-style linear quality model scored with pure built-in
    expressions: each token hashes into one of MODEL_DIM buckets, the
    bucket's weight is ``(bucket·MODEL_WMUL mod MODEL_WMOD)/MODEL_WMOD
    − 0.5`` (a fixed pseudo-random weight table that never ships as
    data — it's arithmetic), and the doc score is
    ``sigmoid(bias + Σ weights)``.

    The token sum runs ENTIRELY in 64-bit integers (Σ of the weight
    NUMERATORS; the ``/MODEL_WMOD − 0.5·n`` rescale happens once at
    the end), so the result is exact and order-independent — the
    DuckDB oracle replays it bit-for-bit with no float-accumulation
    hazard. A real trained model drops in by replacing the arithmetic
    weight with a `MapType` literal / broadcast lookup; the plan shape
    (narrow array-lambda fold, zero shuffle, zero UDF) is identical.
    """
    toks = tokens_expr(text)
    num = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + (hashed_bucket_lambda(t) * MODEL_WMUL) % MODEL_WMOD,
    )
    z = (
        F.lit(MODEL_BIAS)
        + num.cast("double") / F.lit(float(MODEL_WMOD))
        - F.lit(0.5) * F.size(toks)
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def linear_score_sql(text: str = "text") -> str:
    """DuckDB rendering of linear_score_expr (same integer-exact sum,
    same final double arithmetic)."""
    toks = tokens_sql(text)
    num = (
        f"list_sum(list_prepend(0::BIGINT, list_transform({toks}, "
        f"t -> ({hashed_bucket_sql('t')} * {MODEL_WMUL}) % {MODEL_WMOD})))"
    )
    z = (
        f"({MODEL_BIAS} + CAST({num} AS DOUBLE) / {float(MODEL_WMOD)}"
        f" - 0.5 * len({toks}))"
    )
    return f"(1.0 / (1.0 + exp(-{z})))"


# ------------------------------------------------- tree-ensemble model

# GBDT-style quality classifier (q130): depth-2 trees over
# INTEGER-exact document features, so every split comparison is exact
# on any engine and only the final fixed-order sum of leaf values is
# float (identical literal order both renderings => bit-identical).
# TREES is the "trained model" — opaque constants, the same stance as
# the q111 weight table; an XGBoost/LightGBM dump maps 1:1 onto this
# rendering (one nested CASE WHEN per tree, a pure map stage at any
# scale). Feature ranges in the synthetic corpus: n_tokens 10..99,
# n_distinct 6..31, stop_hits ~1..40, max_tok_len 5..8.
# Tree: (root_feat, root_thr, (lf, lt, v_ll, v_lr), (rf, rt, v_rl, v_rr))
# semantics: feat[root] <= thr ? (feat[lf] <= lt ? v_ll : v_lr)
#                              : (feat[rf] <= rt ? v_rl : v_rr)
TREE_FEATURES = ("n_tokens", "n_distinct", "stop_hits", "max_tok_len")
TREES: tuple = (
    ("n_tokens", 30, ("stop_hits", 3, -0.42, 0.11), ("n_distinct", 18, 0.07, 0.23)),
    ("stop_hits", 8, ("n_tokens", 55, 0.05, -0.13), ("max_tok_len", 6, 0.19, 0.08)),
    ("n_distinct", 14, ("n_tokens", 22, -0.08, -0.27), ("stop_hits", 15, 0.16, -0.05)),
    ("max_tok_len", 6, ("n_distinct", 20, 0.04, 0.12), ("n_tokens", 70, 0.02, -0.18)),
    ("n_tokens", 60, ("n_distinct", 16, -0.11, 0.09), ("stop_hits", 20, 0.13, -0.21)),
    ("stop_hits", 2, ("max_tok_len", 7, -0.31, -0.12), ("n_distinct", 24, 0.06, 0.17)),
)
TREE_BIAS = 0.05


def _tree_feature_exprs(text: Column | str) -> dict[str, Column]:
    toks = tokens_expr(text)
    return {
        "n_tokens": F.size(toks).cast("long"),
        "n_distinct": F.size(F.array_distinct(toks)).cast("long"),
        "stop_hits": F.size(F.filter(toks, lambda t: t.isin(*EN_STOP))).cast("long"),
        "max_tok_len": F.array_max(F.transform(toks, F.length)).cast("long"),
    }


def tree_score_expr(text: Column | str) -> Column:
    """Ensemble margin: TREE_BIAS + Σ leaf values, trees evaluated as
    nested CASE WHEN over integer features — zero shuffle, zero UDF."""
    f = _tree_feature_exprs(text)
    total = F.lit(float(TREE_BIAS))
    for root_f, root_t, (lf, lt, vll, vlr), (rf, rt, vrl, vrr) in TREES:
        left = F.when(f[lf] <= lt, F.lit(vll)).otherwise(F.lit(vlr))
        right = F.when(f[rf] <= rt, F.lit(vrl)).otherwise(F.lit(vrr))
        total = total + F.when(f[root_f] <= root_t, left).otherwise(right)
    return total


def _tree_feature_sqls(text: str = "text") -> dict[str, str]:
    toks = tokens_sql(text)
    stop_lst = ", ".join(f"'{w}'" for w in EN_STOP)
    return {
        "n_tokens": f"len({toks})::BIGINT",
        "n_distinct": f"len(list_distinct({toks}))::BIGINT",
        "stop_hits": f"len(list_filter({toks}, t -> t IN ({stop_lst})))::BIGINT",
        "max_tok_len": f"list_max(list_transform({toks}, t -> len(t)))::BIGINT",
    }


def tree_score_sql(text: str = "text") -> str:
    """DuckDB rendering of tree_score_expr — same literals, same order.
    Every leaf literal is CAST to DOUBLE: DuckDB parses 0.42 as
    DECIMAL and exact decimal addition would diverge from Spark's
    IEEE doubles (the q126 lesson)."""
    f = _tree_feature_sqls(text)

    def d(x: float) -> str:
        return f"CAST({float(x)!r} AS DOUBLE)"

    parts = [d(TREE_BIAS)]
    for root_f, root_t, (lf, lt, vll, vlr), (rf, rt, vrl, vrr) in TREES:
        left = f"CASE WHEN {f[lf]} <= {lt} THEN {d(vll)} ELSE {d(vlr)} END"
        right = f"CASE WHEN {f[rf]} <= {rt} THEN {d(vrl)} ELSE {d(vrr)} END"
        parts.append(
            f"CASE WHEN {f[root_f]} <= {root_t} THEN ({left}) ELSE ({right}) END"
        )
    return "(" + " + ".join(parts) + ")"


# ------------------------------------------------- PII detect / redact

# Deliberately lookaround-free patterns: the intersection of Java
# regex (Spark) and RE2 (DuckDB) — char classes, bounded repetition
# and \b word boundaries only. Leftmost-non-overlapping match
# semantics agree between the engines for this class of pattern, so
# counts and replacements replay exactly.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # kind -> (pattern, replacement tag); redaction applies in this
    # dict order (email first: its domain would otherwise be clipped
    # by the ip rule on numeric hosts).
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
}


def pii_count_expr(text: Column | str, kind: str) -> Column:
    """Occurrences of one PII kind — a codegen regexp_count, no UDF."""
    return F.regexp_count(_c(text), F.lit(PII_PATTERNS[kind][0]))


def pii_count_sql(kind: str, text: str = "text") -> str:
    """DuckDB rendering: RE2 extract-all, counted."""
    pat = PII_PATTERNS[kind][0].replace("'", "''")
    return f"len(regexp_extract_all({text}, '{pat}'))"


def pii_redact_expr(text: Column | str) -> Column:
    """All PII kinds replaced by their typed tags, applied in the
    declared order — one chained regexp_replace, still a single
    projection (no shuffle, no UDF)."""
    out = _c(text)
    for pat, tag in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_redact_sql(text: str = "text") -> str:
    """DuckDB rendering — NOTE the explicit 'g' flag: DuckDB's
    regexp_replace substitutes only the first match by default,
    where Spark's always substitutes all."""
    out = text
    for pat, tag in PII_PATTERNS.values():
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{tag}', 'g')"
    return out


def char_pairs_expr(word: Column | str) -> Column:
    """Adjacent character pairs of a word — the BPE merge-candidate
    enumeration (substring(w, i, 2) for i in 1..len-1). Callers must
    filter length >= 2 first: Spark's sequence(1, 0) would count DOWN."""
    w = _c(word)
    return F.transform(
        F.sequence(F.lit(1), F.length(w) - 1),
        lambda i: F.substring(w, i, 2),
    )


def char_pairs_sql(word: str) -> str:
    """DuckDB rendering (range(1, n) already excludes n)."""
    return f"list_transform(range(1, length({word})), i -> {word}[i : i + 1])"
