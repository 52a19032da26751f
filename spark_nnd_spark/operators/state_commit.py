"""Atomic versioned-state commits for ALGEBRAIC index families.

The set-based families (near-dup, span, image, …) tolerate replayed
appends — downstream distincts absorb them. The algebraic families
(covariance stats, token stats) store exact integer SUMS, where a
replayed merge double-counts; their durability contract is therefore
stronger: a batch's moment merge and its applied-marker must become
visible in ONE indivisible event. This module provides that event:

- state lives under ``{path}/state/v={N}/<table>`` with a
  ``_COMMITTED`` marker file per version;
- a commit writes every table plus the marker into a staging
  directory, then publishes it with a single filesystem RENAME —
  a crash at any point before the rename leaves the previous version
  intact and the new one invisible (an unrenamed staging dir is never
  listed as a version);
- readers resolve the LATEST committed version; GC keeps the new
  version plus one predecessor so a reader holding a lazy plan over
  the previous version stays valid.

Extracted from the covariance family (r11 ADVICE #1) so every
algebraic family shares one audited commit path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _fs(spark, path: str):
    jvm = spark.sparkContext._jvm  # noqa: SLF001
    jsc = spark.sparkContext._jsc  # noqa: SLF001
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, hpath.getFileSystem(jsc.hadoopConfiguration())


def committed_versions(spark, path: str) -> list[int]:
    """Version numbers under ``{path}/state`` whose _COMMITTED marker
    exists — a half-renamed or staged directory is simply invisible."""
    jvm, fs = _fs(spark, path)
    root = jvm.org.apache.hadoop.fs.Path(f"{path}/state")
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("v="):
            continue
        try:
            v = int(name[2:])
        except ValueError:
            continue
        if fs.exists(jvm.org.apache.hadoop.fs.Path(f"{path}/state/{name}/_COMMITTED")):
            out.append(v)
    return sorted(out)


def state_dir(spark, path: str) -> str:
    """Directory of the LATEST committed version — the only state
    readers ever see. Raises if no committed build exists."""
    vs = committed_versions(spark, path)
    if not vs:
        msg = f"no committed state under {path}"
        raise ValueError(msg)
    return f"{path}/state/v={vs[-1]}"


def next_version(spark, path: str) -> int:
    """Latest committed version + 1, or 0 for a fresh path — what a
    (re)build must commit as so it never collides with existing state
    (Hadoop's rename-into-existing-dir semantics would otherwise NEST
    the staging dir inside the old version while readers keep serving
    the stale one)."""
    vs = committed_versions(spark, path)
    return (vs[-1] + 1) if vs else 0


def commit_state(
    spark, path: str, version: int, tables: dict[str, DataFrame]
) -> None:
    """Write every table plus the _COMMITTED marker into one staging
    directory, then one RENAME publishes all of it as ``v={version}``
    — 'batch applied' and 'batch marked applied' are one indivisible
    event (callers put the applied-batch table in ``tables``).

    Fails fast if ``v={version}`` already exists: Hadoop's
    rename-into-existing-dir would silently nest the staging dir
    inside it and readers would keep serving whatever version is
    latest — a rebuild must go through :func:`next_version`."""
    jvm, fs = _fs(spark, path)
    final = jvm.org.apache.hadoop.fs.Path(f"{path}/state/v={version}")
    if fs.exists(final):
        msg = (
            f"state version v={version} already exists under {path}; "
            "rebuilds must commit next_version(), not overwrite"
        )
        raise ValueError(msg)
    staging = f"{path}/state/_staging_v={version}"
    sp = jvm.org.apache.hadoop.fs.Path(staging)
    fs.delete(sp, True)  # leftover from a crashed attempt
    for name, df in tables.items():
        df.coalesce(1).write.parquet(f"{staging}/{name}")
    fs.create(jvm.org.apache.hadoop.fs.Path(f"{staging}/_COMMITTED")).close()
    if not fs.rename(sp, final):
        msg = f"state commit rename failed: {staging} -> v={version}"
        raise OSError(msg)
    # GC: keep the new version plus one predecessor (a reader holding
    # a lazy plan over the previous version stays valid).
    for v in committed_versions(spark, path):
        if v < version - 1:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/state/v={v}"), True)
