"""Sinks (SURVEY.md §2.2 K1–K6): partitioned columnar writes and
idempotent merge-append writers.

Reference semantics re-expressed Spark-first:
  * K1 — pandas→parquet→S3 under ``ingestion_date=YYYY-MM-DD``
    (data_pipeline/tasks/load_to_s3.py:16-27) becomes
    ``write.partitionBy("ingestion_date").parquet(path)``: one commit,
    no BytesIO hop, partition pruning on read for free.
  * K3/K4 — the Postgres insert-with-anti-join-dedup workers
    (loading.py:150-193, 213-314) become ``merge_append``: left-anti on
    the natural key vs the target, then append. Re-running a batch
    inserts 0 rows — the reference's core invariant (loading.py:150-161).
  * K5 — stock-bar insert with broadcast ticker→company_id resolve and
    skip-unknown (loading.py:93-125, 327-355) becomes ``upsert_bars``.
  * K6 — TimescaleDB hypertable DDL (migration.py:30-36) becomes a
    date-partitioned table layout (``bar_date`` partition column).

On a platform with Delta/Iceberg these writers are ``MERGE INTO``:
``merge_append`` = WHEN NOT MATCHED INSERT, ``merge_upsert`` = WHEN
MATCHED UPDATE + WHEN NOT MATCHED INSERT, ``delete_where`` = DELETE
WHERE — all atomic under concurrent writers, all emitting the typed
change-data feed (``table_changes``). Delta is not installable here,
so the writers carry their own minimal optimistic-concurrency commit
log (the same protocol Delta's transaction log uses):

  * data files are uniquely-named parquet parts in the table root —
    plain ``spark.read.parquet(path)`` keeps working;
  * ``_txlog/<version>.json`` manifests record each commit's files;
    the underscore prefix hides the log from Spark's file index;
  * a writer stages its insert set, then CAS-commits the next version
    with ``O_CREAT|O_EXCL`` — atomic on POSIX and HDFS (on S3 the same
    shape is a conditional PUT with If-None-Match);
  * on collision the loser deletes its staged files, refreshes the
    snapshot (which now contains the winner's rows), recomputes the
    anti-join, and retries — so two concurrent mergers cannot both
    insert the same key.

Crash between stage and commit can orphan data files that plain
readers would see (exactly Delta's un-vacuumed-file situation);
``read_committed`` gives the strict committed-only view, and
``vacuum_orphans`` removes unreferenced files.

Scale: the anti-join shuffles on the high-cardinality natural key; the
target side is pruned to key columns only, so the "read the whole
target" cost is a key-column scan, and partition pruning applies when
``target_partition_filter`` narrows it.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from stonkwhisperer_spark.operators.joins import broadcast_enrich, new_rows_anti


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("ingestion_date",),
    mode: str = "append",
) -> None:
    """K1: partitioned parquet write; adds ``ingestion_date`` =
    current_date() when absent (reference load_to_s3.py:20-27 layout).
    Sized for scale: callers repartition on the partition columns first
    if many small files per partition would result."""
    for c in partition_cols:
        if c == "ingestion_date" and c not in df.columns:
            df = df.withColumn(c, F.current_date())
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


# ---------------------------------------------------------------------------
# Transaction log: optimistic-concurrency commits on plain parquet.
# ---------------------------------------------------------------------------
_TXLOG_DIR = "_txlog"
_CDC_DIR = "_change_data"
_DV_DIR = "_deletion_vectors"
_CHANGE_COL = "_change_type"
# Hidden lineage columns threaded through snapshot reads so deletion
# vectors can anti-join on (file, row index). Dropped before any frame
# is returned to a caller.
_FP_COL = "__sw_file_path"
_RI_COL = "__sw_row_index"
# Transient marker columns for the merge engine's single-pass row
# classification (never written: dropped before staging).
_MARK_M = "__sw_mark_matched"
_MARK_MB = "__sw_mark_in_batch"
_MARK_MD = "__sw_mark_del"


def _txlog_path(target_path: str) -> str:
    return os.path.join(target_path, _TXLOG_DIR)


def _data_files(target_path: str) -> list[str]:
    """Relative paths of all parquet data files under the table root,
    skipping underscore/dot-hidden entries (the same rule Spark's file
    index applies) — one os.walk, no Spark job."""
    out: list[str] = []
    for dirpath, dirnames, filenames in os.walk(target_path):
        dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
        for fn in filenames:
            if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                out.append(os.path.relpath(os.path.join(dirpath, fn), target_path))
    return out


def _last_checkpoint_version(log: str) -> int:
    """The version of the newest log checkpoint, 0 when none exists
    (the ``_last_checkpoint`` pointer file, Delta's exact mechanism)."""
    lc = os.path.join(log, "_last_checkpoint")
    if not os.path.exists(lc):
        return 0
    with open(lc) as fh:
        return json.load(fh)["version"]


def _committed_version(target_path: str) -> int:
    log = _txlog_path(target_path)
    if not os.path.isdir(log):
        return 0
    versions = [
        int(f.split(".")[0])
        for f in os.listdir(log)
        if f.endswith(".json") and not f.startswith("_")
    ]
    return max(_last_checkpoint_version(log), max(versions, default=0))


# Manifest-key → feature-flag map: the features whose commits an
# OLDER/FOREIGN reader would silently MISREAD if it ignored the key
# (Delta's minReaderVersion/readerFeatures analog). Writers stamp
# ``"features": [...]`` on every commit using one; readers raise on a
# feature outside _FEATURES_SUPPORTED instead of misreading the table.
_FEATURE_OF_KEY = {
    "dv": "deletion-vectors",
    "rename": "column-mapping",
    "drop_col": "column-mapping",
    "generated_add": "generated-columns",
    "constraints_add": "check-constraints",
}
_FEATURES_SUPPORTED = frozenset(_FEATURE_OF_KEY.values())


def _check_features(c: dict, target_path: str) -> None:
    unknown = [
        f for f in c.get("features", []) if f not in _FEATURES_SUPPORTED
    ]
    if unknown:
        raise ValueError(
            f"table at {target_path} requires reader feature(s) "
            f"{unknown} (commit version {c.get('version')}) that this "
            f"reader does not support — supported: "
            f"{sorted(_FEATURES_SUPPORTED)}. Refusing to read rather "
            "than silently misread."
        )


def _commits(target_path: str, through_version: int | None = None) -> list[dict]:
    """Parsed commit manifests in version order, optionally truncated
    at ``through_version`` (inclusive) for time travel.

    With a log checkpoint (:func:`checkpoint`) present, the replay base
    comes from ONE checkpoint file and only the manifests AFTER it are
    opened — O(1 + tail) metadata reads instead of O(#commits), the
    read-amplification fix that keeps a long-lived table's every
    operation from reparsing thousands of tiny JSON files (Delta's
    ``_last_checkpoint`` design). Manifests at or below the checkpoint
    may have been reclaimed by :func:`vacuum_log`."""
    log = _txlog_path(target_path)
    if not os.path.isdir(log):
        return []
    out: list[dict] = []
    ckpt_version = _last_checkpoint_version(log)
    if ckpt_version:
        with open(
            os.path.join(log, f"_checkpoint.{ckpt_version:08d}.json")
        ) as fh:
            out = [
                c
                for c in json.load(fh)["commits"]
                if through_version is None or c["version"] <= through_version
            ]
    for manifest in sorted(os.listdir(log)):
        if not manifest.endswith(".json") or manifest.startswith("_"):
            continue
        version = int(manifest.split(".")[0])
        if version <= ckpt_version:
            continue  # already covered by the checkpoint base
        if through_version is not None and version > through_version:
            continue
        with open(os.path.join(log, manifest)) as fh:
            c = json.load(fh)
        c["version"] = version
        out.append(c)
    for c in out:  # checkpoint-sourced commits carry features too
        _check_features(c, target_path)
    return out


def checkpoint(target_path: str) -> int:
    """Write a log checkpoint: ONE file holding the parsed commit list
    through the current head, plus the ``_last_checkpoint`` pointer
    (both atomic via temp + rename). Subsequent log reads load the
    checkpoint and only the tail manifests; :func:`vacuum_log` may then
    reclaim the covered manifest files. Commit timestamps are baked in
    (pre-timestamp commits resolve their mtime fallback NOW, while the
    manifest still exists). Returns the checkpointed version.

    Concurrency: writers CAS manifests strictly after the head, so a
    checkpoint never races a commit; racing checkpointers both write
    valid files and the last pointer rename wins."""
    commits = _commits(target_path)
    if not commits:
        return 0
    for c in commits:
        c.setdefault("ts", _commit_ts(target_path, c))
    v = commits[-1]["version"]
    log = _txlog_path(target_path)
    body = os.path.join(log, f"_checkpoint.{v:08d}.json")
    tmp = body + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump({"version": v, "commits": commits}, fh, allow_nan=False)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, body)
    pointer = os.path.join(log, "_last_checkpoint")
    tmp = pointer + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump({"version": v}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, pointer)
    return v


def vacuum_log(target_path: str) -> list[str]:
    """Reclaim commit manifests covered by the newest checkpoint (their
    content lives in the checkpoint file). Older checkpoint files are
    reclaimed too. Returns the removed file names. The CAS version
    sequence is unaffected — new commits key on the head version,
    which the checkpoint pointer preserves."""
    log = _txlog_path(target_path)
    if not os.path.isdir(log):
        return []
    ckpt_version = _last_checkpoint_version(log)
    if not ckpt_version:
        return []
    removed: list[str] = []
    for fn in os.listdir(log):
        if fn.endswith(".json") and not fn.startswith("_"):
            if int(fn.split(".")[0]) <= ckpt_version:
                os.remove(os.path.join(log, fn))
                removed.append(fn)
        elif fn.startswith("_checkpoint.") and fn.endswith(".json"):
            if int(fn.split(".")[1]) < ckpt_version:
                os.remove(os.path.join(log, fn))
                removed.append(fn)
        elif ".tmp-" in fn:
            # Crashed checkpointer's staging leftovers — but only when
            # stale (an IN-FLIGHT checkpoint's tmp file must survive
            # until its atomic rename).
            path = os.path.join(log, fn)
            if time.time() - os.path.getmtime(path) > 3600:
                os.remove(path)
                removed.append(fn)
    return sorted(removed)


def _files_from(commits: list[dict]) -> list[str]:
    files: list[str] = []
    for c in commits:
        for rel in c.get("remove", []):
            files.remove(rel)
        files.extend(c["add"])
    return files


def _stats_from(commits: list[dict]) -> dict[str, dict]:
    stats: dict[str, dict] = {}
    for c in commits:
        for rel in c.get("remove", []):
            stats.pop(rel, None)
        stats.update(c.get("stats", {}))
    return stats


def _sizes_from(commits: list[dict]) -> dict[str, int]:
    """File-size replay from the commit manifests (``sizes`` entries,
    recorded at write time since r16): {rel_path: bytes} for the files
    still live at the head. Files from pre-r16 commits are absent —
    callers treat unknown as large (the safe direction for
    cost-of-recompute decisions)."""
    sizes: dict[str, int] = {}
    for c in commits:
        for rel in c.get("remove", []):
            sizes.pop(rel, None)
        sizes.update(c.get("sizes", {}))
    return sizes


def _dv_from(commits: list[dict]) -> dict[str, list[str]]:
    """Deletion-vector state replay: {data_rel_path: [dv_rel_paths that
    apply to it]}, add/remove applied in version order — the
    merge-on-read half of DELETE (Delta deletion vectors / Iceberg
    positional delete files). A data file's DV entries die with the
    file: any rewrite (compaction, copy-on-write merge/delete) reads
    the DV-filtered view and then ``remove``s the file, so the physical
    purge is automatic and the new files start DV-free. A ``reset``
    entry (RESTORE) replaces the whole state with the target version's
    mapping."""
    state: dict[str, list[str]] = {}
    for c in commits:
        for rel in c.get("remove", []):
            state.pop(rel, None)
        d = c.get("dv")
        if d is not None:
            if "reset" in d:
                state = {f: list(v) for f, v in d["reset"].items()}
            else:
                for f in d["files"]:
                    entry = state.setdefault(f, [])
                    for dv_rel in d["add"]:
                        if dv_rel not in entry:
                            entry.append(dv_rel)
    return state


def _colmap_from(commits: list[dict]) -> dict[str, str]:
    """Column-mapping replay: {logical_name: physical_name}. A
    ``rename`` commit re-points a logical name at the column's ORIGINAL
    physical name (the one stored in every parquet footer), so RENAME
    COLUMN is a metadata-only commit — no data file is rewritten, the
    Delta column-mapping contract. Identity (unrenamed) columns are
    absent from the map. Renames chain: a→b then b→c leaves {c: a}."""
    m: dict[str, str] = {}
    for c in commits:
        r = c.get("rename")
        if r:
            frm, to = r["from"], r["to"]
            m[to] = m.pop(frm, frm)
    return m


def _dropped_from(commits: list[dict]) -> set[str]:
    """PHYSICAL names of logically-dropped columns (``drop_column``):
    excluded from every logical view; the data files keep the bytes
    until rewrites shed them (Delta's mapping-based DROP COLUMN)."""
    out: set[str] = set()
    for c in commits:
        d = c.get("drop_col")
        if d:
            out.add(d["physical"])
    return out


def _retired_names(commits: list[dict]) -> set[str]:
    """Names no new column may take: retired physical names of renamed
    columns, plus both names of dropped columns — reusing any of them
    would silently alias historical file data."""
    colmap = _colmap_from(commits)
    retired = {p for l, p in colmap.items() if p != l}
    for c in commits:
        d = c.get("drop_col")
        if d:
            retired.add(d["physical"])
            retired.add(d["logical"])
    return retired


def _to_physical(df: DataFrame, commits: list[dict]) -> DataFrame:
    """Logical → physical column names (the on-disk space: data files,
    change files, commit schemas, zone maps). Raises on a column that
    collides with a RETIRED name (a renamed column's old physical name
    or a dropped column's either name) — re-introducing one would
    silently alias historical data."""
    colmap = _colmap_from(commits)
    retired = _retired_names(commits)
    if not colmap and not retired:
        return df
    live = set(colmap)
    for c in df.columns:
        if c not in live and c in retired:
            raise ValueError(
                f"column '{c}' is the retired physical name of a renamed "
                "or dropped column — pick a different name"
            )
    return df.select(*[F.col(c).alias(colmap.get(c, c)) for c in df.columns])


def _relabel(
    df: DataFrame, from_commits: list[dict], to_commits: list[dict]
) -> DataFrame:
    """Re-express a frame read under one snapshot's LOGICAL names in
    another snapshot's logical space — physical names are the stable
    bridge (the reason they exist). Columns logically dropped at the
    target snapshot are excluded; names outside the mapping (change
    tags, lineage) pass through. RESTORE needs this: its insert-side
    CDC reads under the TARGET version's names, its delete side under
    the head's, and the union/staging must agree on one space."""
    from_map = _colmap_from(from_commits)
    to_p2l = {p: l for l, p in _colmap_from(to_commits).items()}
    dropped = _dropped_from(to_commits)
    cols = []
    for c in df.columns:
        p = from_map.get(c, c)
        if p in dropped:
            continue
        cols.append(F.col(c).alias(to_p2l.get(p, p)))
    return df.select(*cols)


def _to_logical(df: DataFrame, commits: list[dict]) -> DataFrame:
    """Physical → logical column names (the reader/compute space);
    logically-dropped columns are excluded."""
    colmap = _colmap_from(commits)
    dropped = _dropped_from(commits)
    if not colmap and not dropped:
        return df
    p2l = {p: l for l, p in colmap.items()}
    return df.select(
        *[
            F.col(c).alias(p2l.get(c, c))
            for c in df.columns
            if c not in dropped
        ]
    )


def _vacuum_cutoff(commits: list[dict]) -> int:
    """The retention horizon: the highest vacuum cutoff ever committed.
    Snapshots and change feeds strictly BELOW it may reference
    physically-reclaimed files — readers refuse them loudly instead of
    failing mid-scan."""
    cut = 0
    for c in commits:
        v = c.get("vacuum")
        if v:
            cut = max(cut, v["cutoff"])
    return cut


def _constraints_from(commits: list[dict]) -> dict[str, str]:
    """CHECK constraints in force: {name: sql_expr}, adds/drops applied
    in version order (same replay shape as files and stats)."""
    out: dict[str, str] = {}
    for c in commits:
        for name in c.get("constraints_drop", []):
            out.pop(name, None)
        out.update(c.get("constraints_add", {}))
    return out


# Safe type-widening lattice (Delta 3.2 type widening / Spark 4 parquet
# upcast support): a column re-declared at a WIDER type in the chain
# widens the table; narrow files upcast at the scan (verified: Spark 4's
# vectorized reader reads int32 under LongType and float under
# DoubleType). Keys are widenable-from, values the allowed wider types.
_WIDEN = {
    "byte": {"short", "integer", "long"},
    "short": {"integer", "long"},
    "integer": {"long"},
    "float": {"double"},
}


def _widest(a, b):
    """The wider of two Spark DataTypes under the widening lattice, or
    None when neither widens to the other."""
    an, bn = a.typeName(), b.typeName()
    if bn in _WIDEN.get(an, ()):  # a widens to b
        return b
    if an in _WIDEN.get(bn, ()):  # b widens to a
        return a
    return None


def _union_structs(structs):
    """Additive union of StructTypes in order; a field re-declared at a
    WIDER type in the widening lattice widens the union (int→long,
    float→double — old narrow files upcast at the scan); any other
    type conflict raises. None for an empty union. Every field is
    normalized to nullable=True: evolution implies null-fill (files
    written before a column existed surface NULLs for it), so a
    non-nullable first declaration would be a false contract over data
    that does contain nulls — Delta's union behaves the same way."""
    from pyspark.sql.types import StructField, StructType

    merged: dict[str, StructField] = {}
    for s in structs:
        for f in s.fields:
            prev = merged.get(f.name)
            if prev is None:
                merged[f.name] = StructField(f.name, f.dataType, True)
                continue
            if prev.dataType.json() == f.dataType.json():
                continue
            wide = _widest(prev.dataType, f.dataType)
            if wide is None:
                raise ValueError(
                    f"schema evolution type conflict on '{f.name}': "
                    f"{prev.dataType.json()} vs {f.dataType.json()}"
                )
            merged[f.name] = StructField(f.name, wide, True)
    return StructType(list(merged.values())) if merged else None


def _schema_from(commits: list[dict]):
    """Union of the commits' recorded writer schemas in version order
    (additive evolution; type conflict raises) — None when no commit
    recorded one. See :func:`table_schema`."""
    from pyspark.sql.types import StructType

    return _union_structs(
        [
            StructType.fromJson(json.loads(c["schema"]))
            for c in commits
            if "schema" in c
        ]
    )


def _read_files(
    spark: SparkSession,
    target_path: str,
    files: Sequence[str],
    schema=None,
    merge_schema: bool = False,
    lineage: bool = False,
) -> DataFrame:
    """Read a set of table-relative parquet files that may span
    DIFFERENT partition layouts (unpartitioned seed + partitioned later
    batches — Iceberg-style partition-spec evolution, which the txlog
    gets for free because manifests list FILES, not directories).

    Spark's file index cannot mix partition depths in one scan: given a
    root-level file alongside ``grp=y/`` files under the same basePath,
    it keys the whole scan on the discovered partition spec and
    SILENTLY DROPS the root-level rows (verified on Spark 4.1). So:
    group the files by the partition-key tuple encoded in their
    directory paths, scan each group separately (each group is
    internally consistent), and unionByName with allowMissingColumns —
    a layout's missing columns null-fill, or resolve from data columns
    where the writer stored them physically.

    One extra scan node per historical layout (bounded by the handful
    of partition-spec changes a table sees in its life), same total
    I/O.

    ``lineage=True`` threads the scan's hidden ``_metadata`` file-path
    and row-index through as :data:`_FP_COL`/:data:`_RI_COL` columns —
    selected INSIDE each group scan (the metadata struct resolves only
    on a file-source relation, not across a union). Deletion vectors
    and file-discovery joins key on them."""
    groups: dict[tuple, list[str]] = {}
    for f in files:
        keys = tuple(
            seg.split("=", 1)[0]
            for seg in f.split("/")[:-1]
            if "=" in seg and not seg.startswith((".", "_"))
        )
        groups.setdefault(keys, []).append(f)
    parts: list[DataFrame] = []
    for fs in groups.values():
        reader = spark.read.option("basePath", target_path)
        if schema is not None:
            reader = reader.schema(schema)
        elif merge_schema:
            reader = reader.option("mergeSchema", "true")
        part = reader.parquet(*[os.path.join(target_path, f) for f in fs])
        if lineage:
            part = part.select(
                "*",
                F.col("_metadata.file_path").alias(_FP_COL),
                F.col("_metadata.row_index").alias(_RI_COL),
            )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def _file_uri(target_path: str, rel: str) -> str:
    """Table-relative path → the EXACT URI string Spark's
    ``_metadata.file_path`` reports for that file (inverse of
    :func:`_uri_to_rel`). Spark renders java.net.URI path encoding:
    space/%/etc. are percent-escaped but the RFC-2396 path characters
    ``/;:@&=+$,`` and marks ``!~*'()-_.`` stay RAW — notably ``=`` in
    Hive partition directories (pathname2url would quote it, making
    every DV/discovery join key miss on partitioned tables)."""
    from urllib.parse import quote

    return "file:" + quote(
        os.path.join(os.path.abspath(target_path), rel),
        safe="/;:@&=+$,!~*'()-_.",
    )


def _read_snapshot(
    spark: SparkSession,
    target_path: str,
    commits: list[dict],
    files: Sequence[str] | None = None,
    schema=None,
    merge_schema: bool = False,
    keep_lineage: bool = False,
) -> DataFrame:
    """The committed ROW view: ``_read_files`` over the given files
    (default: the commits' file view) minus any rows masked by
    deletion vectors in force at this snapshot. This is the one read
    path every consumer — readers, CDC, merges, compaction — goes
    through, so merge-on-read deletes are invisible everywhere by
    construction.

    The DV anti-join is a BROADCAST against the kill list (bounded by
    deleted-row count, and only the files being read contribute), keyed
    on (file URI, row index) from the scan's ``_metadata`` struct — the
    scan itself stays whole-stage-codegen, and tables with no DVs pay
    nothing (the plain ``_read_files`` plan, no extra columns). At
    100 TB this is exactly Delta's deletion-vector read: a point DELETE
    costs O(deleted rows) at write time and a broadcast hash anti-join
    at read time, instead of rewriting terabytes of matched files.

    ``keep_lineage=True`` returns :data:`_FP_COL`/:data:`_RI_COL` for
    callers that need per-row file identity (touched-file discovery in
    the merge writers)."""
    if files is None:
        files = _files_from(commits)
    fset = set(files)
    dv_files: list[str] = []
    targeted: set[str] = set()
    for f, dvs in _dv_from(commits).items():
        if f in fset and dvs:
            targeted.add(f)
            for d in dvs:
                if d not in dv_files:
                    dv_files.append(d)
    need_lineage = keep_lineage or bool(targeted)
    dropped = _dropped_from(commits)
    if schema is not None and dropped:
        # Logically-dropped columns are pruned AT THE SCAN (explicit
        # read schema) — the bytes stay in old files but are never
        # read, Delta's mapping-based DROP COLUMN economics.
        from pyspark.sql.types import StructType

        schema = StructType(
            [f for f in schema.fields if f.name not in dropped]
        )
    df = _read_files(
        spark,
        target_path,
        files,
        schema=schema,
        merge_schema=merge_schema,
        lineage=need_lineage,
    )
    if targeted:
        uri_map = spark.createDataFrame(
            [(f, _file_uri(target_path, f)) for f in sorted(targeted)],
            "file string, file_uri string",
        )
        kill = (
            spark.read.parquet(
                *[os.path.join(target_path, d) for d in dv_files]
            )
            .join(F.broadcast(uri_map), "file")
            .select(
                F.col("file_uri").alias(_FP_COL),
                F.col("row_index").alias(_RI_COL),
            )
        )
        df = df.join(F.broadcast(kill), [_FP_COL, _RI_COL], "left_anti")
    if need_lineage and not keep_lineage:
        df = df.drop(_FP_COL, _RI_COL)
    # Column mapping: files store physical names; every consumer sees
    # the logical view AS OF this snapshot's commits (so time travel
    # before a rename shows the old name — Delta's behavior).
    return _to_logical(df, commits)


def committed_files(target_path: str, version: int | None = None) -> list[str]:
    """The committed file view — adds minus removes applied in version
    order (excludes files staged by an in-flight or crashed writer).
    Pass ``version`` to time-travel to an earlier snapshot."""
    return _files_from(_commits(target_path, version))


def table_history(spark: SparkSession, target_path: str) -> DataFrame:
    """Delta ``DESCRIBE HISTORY t``: one row per commit with version,
    commit timestamp, operation name, and file/row accounting —
    replayed from the manifests alone (O(#commits) driver metadata, no
    data files opened). ``operation`` comes from the commit's recorded
    ``op`` tag; commits written before op-tagging are classified from
    their structural fields (compaction/restore/vacuum/constraint/txn
    markers), else reported as WRITE. ``num_rows`` is the manifest's
    staged-row count (inserted rows for appends, written rows for
    merges; 0 for metadata-only commits and for deletes, whose row
    counts live in the change feed)."""
    rows = []
    for c in _commits(target_path):
        op = c.get("op")
        if op is None:  # pre-op-tag commits: structural classification
            if c.get("compaction"):
                op = "OPTIMIZE"
            elif "restore" in c:
                op = "RESTORE"
            elif "vacuum" in c:
                op = "VACUUM"
            elif "constraints_add" in c:
                op = "ADD CONSTRAINT"
            elif "constraints_drop" in c:
                op = "DROP CONSTRAINT"
            elif "txn" in c:
                op = "STREAMING UPDATE"
            else:
                op = "WRITE"
        rows.append(
            (
                c["version"],
                _commit_ts(target_path, c),
                op,
                c.get("n", 0),
                len(c.get("add", [])),
                len(c.get("remove", [])),
                bool(c.get("cdc")),
            )
        )
    return spark.createDataFrame(
        rows,
        "version bigint, timestamp_ms bigint, operation string, "
        "num_rows bigint, num_added_files int, num_removed_files int, "
        "has_cdc boolean",
    )


def table_detail(target_path: str) -> dict:
    """Delta ``DESCRIBE DETAIL t``: one dict summarizing the table's
    current physical and logical state — replayed from the manifests
    alone (O(#commits-after-checkpoint) driver metadata plus stat calls
    for file sizes and kill-list column reads for the exact DV-masked
    row count; no data files opened)."""
    commits = _commits(target_path)
    files = _files_from(commits)
    sizes = _sizes_from(commits)  # log-recorded (r16); stat the rest
    size = 0
    for f in files:
        if f in sizes:
            size += sizes[f]
            continue
        try:
            size += os.path.getsize(os.path.join(target_path, f))
        except FileNotFoundError:
            pass
    dv_state = _dv_from(commits)
    # Exact masked-row count: live kill-list entries targeting live
    # files (pyarrow single-column reads, bounded by accumulated
    # deletes; rewritten files' stale entries don't count).
    n_masked = 0
    live_files = set(files)
    import pyarrow.parquet as pq

    for d in {dv for dvs in dv_state.values() for dv in dvs}:
        t = pq.read_table(os.path.join(target_path, d), columns=["file"])
        n_masked += sum(1 for v in t.column(0).to_pylist() if v in live_files)
    colmap = _colmap_from(commits)
    return {
        "version": commits[-1]["version"] if commits else 0,
        "num_files": len(files),
        "size_bytes": size,
        "num_dv_files": len({d for dvs in dv_state.values() for d in dvs}),
        "num_dv_masked_rows": n_masked,
        "constraints": _constraints_from(commits),
        "generated_columns": _generated_from(commits),
        "bloom_columns": _bloom_cols_from(commits),
        "renamed_columns": {l: p for l, p in colmap.items() if l != p},
        "dropped_columns": sorted(_dropped_from(commits)),
        "vacuum_horizon": _vacuum_cutoff(commits),
        "checkpoint_version": _last_checkpoint_version(_txlog_path(target_path)),
    }


def table_constraints(target_path: str) -> dict[str, str]:
    """The CHECK constraints currently in force on the table —
    {name: sql_expr}, replayed from the commit log."""
    return _constraints_from(_commits(target_path))


def add_constraint(
    spark: SparkSession,
    target_path: str,
    name: str,
    sql_expr: str,
    max_retries: int = 20,
) -> None:
    """Delta ``ALTER TABLE t ADD CONSTRAINT name CHECK (expr)``: record
    a CHECK constraint in the log that every subsequent write must
    satisfy (writers reject violating batches BEFORE staging — the
    invariant is enforced at the source of mutation, the only place it
    can be cheap). Like Delta, adding the constraint first validates
    the EXISTING table: if any committed row violates the expression,
    the constraint is refused — a table can never be in a state where
    its declared invariants are false.

    The constraint is a metadata-only commit (add=[], no data files);
    enforcement on a 100 TB table costs one codegen'd filter over each
    incoming BATCH, never a table scan (the one-time validation scan
    here is the same price Delta pays)."""
    for _ in range(max_retries):
        commits = _commits(target_path)
        version = commits[-1]["version"] if commits else 0
        if name in _constraints_from(commits):
            raise ValueError(f"constraint '{name}' already exists at {target_path}")
        files = _files_from(commits)
        if files:
            existing = _read_files(
                spark, target_path, files, schema=_schema_from(commits)
            )
            bad = existing.filter(~F.expr(sql_expr)).limit(1).collect()
            if bad:
                raise ValueError(
                    f"cannot add constraint '{name}' CHECK ({sql_expr}): "
                    f"existing row violates it: {bad[0].asDict()}"
                )
        if _try_commit(
            target_path, version + 1, [], 0, constraints_add={name: sql_expr}, op="ADD CONSTRAINT"
        ):
            return
    raise RuntimeError(
        f"add_constraint lost the commit race {max_retries} times at {target_path}"
    )


def drop_constraint(target_path: str, name: str, max_retries: int = 20) -> None:
    """``ALTER TABLE t DROP CONSTRAINT name`` — metadata-only commit."""
    for _ in range(max_retries):
        commits = _commits(target_path)
        version = commits[-1]["version"] if commits else 0
        if name not in _constraints_from(commits):
            raise ValueError(f"no constraint '{name}' at {target_path}")
        if _try_commit(
            target_path, version + 1, [], 0, constraints_drop=[name], op="DROP CONSTRAINT"
        ):
            return
    raise RuntimeError(
        f"drop_constraint lost the commit race {max_retries} times at {target_path}"
    )


def _bloom_cols_from(commits: list[dict]) -> list[str]:
    """PHYSICAL names of the columns bloom-indexed at write time (last
    ``bloom_cols`` commit wins, Delta's CREATE BLOOMFILTER INDEX
    analog)."""
    cols: list[str] = []
    for c in commits:
        if "bloom_cols" in c:
            cols = list(c["bloom_cols"])
    return cols


def _bloom_from(commits: list[dict]) -> dict[str, dict]:
    """Bloom-index replay: {file: {col: spec}}, add/remove applied in
    version order (same shape as zone maps)."""
    out: dict[str, dict] = {}
    for c in commits:
        for rel in c.get("remove", []):
            out.pop(rel, None)
        out.update(c.get("bloom", {}))
    return out


_BLOOM_K = 7  # double-hashed probe count
_BLOOM_MAX_ROWS = 200_000  # above this, skip (manifest-inline size cap)


def _bloom_key(value) -> str:
    """Canonical string form hashed into bloom filters — integral
    floats collapse to their integer form so a lookup with the Python
    int 17 finds rows a double column stored as 17.0 (a type-mismatch
    false NEGATIVE would wrongly prune a file that contains the value,
    breaking the pruning-is-never-a-correctness-device rule)."""
    if isinstance(value, bool):
        return f"bool:{value}"
    if isinstance(value, float) and value.is_integer():
        return str(int(value))
    return str(value)


def _bloom_hashes(value, m: int) -> list[int]:
    """k deterministic bit positions for a value: double hashing over
    the sha256 of the value's canonical string form (ints and strings
    encode identically across engines and sessions)."""
    import hashlib

    digest = hashlib.sha256(_bloom_key(value).encode("utf-8")).digest()
    h1 = int.from_bytes(digest[:8], "big")
    h2 = int.from_bytes(digest[8:16], "big") | 1
    return [(h1 + i * h2) % m for i in range(_BLOOM_K)]


def _bloom_build(target_path: str, files: list[str], cols: list[str]) -> dict:
    """Per-file bloom filters for the indexed columns — one pyarrow
    column read per (file, col), O(staged batch) at write time. ~10
    bits/row (fpp ≈ 1%), base64 in the manifest; files larger than
    _BLOOM_MAX_ROWS rows skip the index (they stay unprunable, never
    wrong). At production scale the bitsets would move to sidecar
    index files; the protocol is identical."""
    import base64

    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for rel in files:
        pf = pq.ParquetFile(os.path.join(target_path, rel))
        present = [c for c in cols if c in pf.schema_arrow.names]
        if not present or pf.metadata.num_rows > _BLOOM_MAX_ROWS:
            continue
        n = max(pf.metadata.num_rows, 1)
        m = 1 << max(6, (10 * n - 1).bit_length())  # ≥10 bits/row, pow2
        specs: dict[str, dict] = {}
        t = pf.read(columns=present)
        for col in present:
            bits = bytearray(m // 8)
            any_val = False
            for v in t.column(col).to_pylist():
                if v is None:
                    continue
                any_val = True
                for pos in _bloom_hashes(v, m):
                    bits[pos >> 3] |= 1 << (pos & 7)
            if any_val:
                specs[col] = {
                    "m": m,
                    "k": _BLOOM_K,
                    "b64": base64.b64encode(bytes(bits)).decode("ascii"),
                }
        if specs:
            out[rel] = specs
    return out


def _bloom_admits(spec: dict, value) -> bool:
    import base64

    bits = base64.b64decode(spec["b64"])
    return all(
        bits[pos >> 3] & (1 << (pos & 7))
        for pos in _bloom_hashes(value, spec["m"])
    )


def set_bloom_columns(
    target_path: str, cols: Sequence[str], max_retries: int = 20
) -> None:
    """Databricks ``CREATE BLOOMFILTER INDEX`` analog: declare the
    columns every subsequent commit bloom-indexes per data file.
    Point lookups (:func:`read_committed_point`) then skip files whose
    filter excludes the value — the skipping zone maps cannot provide
    for high-cardinality UNSORTED columns (ids, hashes, urls), where
    every file's [min,max] spans everything. Existing files are not
    back-indexed (rewrites index them); metadata-only commit."""
    for _ in range(max_retries):
        commits = _commits(target_path)
        if not commits:
            raise ValueError(f"no commits at {target_path}")
        colmap = _colmap_from(commits)
        version = commits[-1]["version"]
        if _try_commit(
            target_path,
            version + 1,
            [],
            0,
            bloom_cols=[colmap.get(c, c) for c in cols],
            op="SET BLOOM COLUMNS",
        ):
            return
    raise RuntimeError(
        f"set_bloom_columns lost the commit race {max_retries} times "
        f"at {target_path}"
    )


def read_committed_point(
    spark: SparkSession,
    target_path: str,
    col: str,
    value,
    version: int | None = None,
) -> tuple[DataFrame | None, int, int]:
    """Bloom-pruned point lookup: the committed view restricted to
    ``col = value``, opening ONLY the files whose bloom filter admits
    the value (files without a filter are kept — pruning is never a
    correctness device; ≈1% of non-matching filtered files false-
    positive through). Returns (frame, files_read, files_total).

    This is the needle-in-100-TB read: on a high-cardinality unsorted
    column (user id, url hash) zone maps keep every file, a bloom
    index keeps ~the files that really contain the key — the
    difference between a full scan and a handful of tasks for GDPR
    lookups and debugging reads. Driver-side decision on manifest
    metadata, before any task is scheduled; the residual equality
    filter still applies row-level."""
    commits = _commits(target_path, version)
    files = _files_from(commits)
    if not files:
        return None, 0, 0
    pcol = _colmap_from(commits).get(col, col)
    blooms = _bloom_from(commits)
    kept = [
        f
        for f in files
        if pcol not in blooms.get(f, {})
        or _bloom_admits(blooms[f][pcol], value)
    ]
    if not kept:
        kept = files[:1]  # valid empty result with the right schema
    df = _read_snapshot(
        spark, target_path, commits, files=kept, schema=_schema_from(commits)
    ).filter(F.col(col) == F.lit(value))
    return df, len(kept), len(files)


def _generated_from(commits: list[dict]) -> dict[str, str]:
    """Generated-column definitions in force: {column: sql_expr},
    add/drop applied in version order (same replay shape as
    constraints). Expressions are in LOGICAL column space."""
    out: dict[str, str] = {}
    for c in commits:
        for name in c.get("generated_drop", []):
            out.pop(name, None)
        out.update(c.get("generated_add", {}))
    return out


def _apply_generated(
    batch: DataFrame, commits: list[dict], target_path: str
) -> DataFrame:
    """Delta generated-column write semantics: a batch MISSING the
    column gets it computed from the expression; a batch PROVIDING it
    must match the expression exactly (null-safe) or the write is
    rejected — otherwise the column silently stops being derivable and
    every consumer relying on the invariant (partition pruning on a
    derived date, most importantly) breaks."""
    for name, expr in _generated_from(commits).items():
        if name in batch.columns:
            bad = (
                batch.filter(~F.col(name).eqNullSafe(F.expr(expr)))
                .limit(1)
                .collect()
            )
            if bad:
                raise ValueError(
                    f"generated column '{name}' ({expr}) mismatch at "
                    f"{target_path}: row {bad[0].asDict()} provides a value "
                    "that differs from the expression"
                )
        else:
            batch = batch.withColumn(name, F.expr(expr))
    return batch


def table_generated(target_path: str) -> dict[str, str]:
    """The generated-column definitions currently in force."""
    return _generated_from(_commits(target_path))


def add_generated_column(
    target_path: str, name: str, sql_expr: str, max_retries: int = 20
) -> None:
    """Delta ``GENERATED ALWAYS AS (expr)``: record a derived-column
    definition in the log. Every subsequent write computes the column
    when absent and validates it when present (see
    :func:`_apply_generated`). The canonical use is a derived partition
    key — ``event_date = to_date(ts)`` — so writers never hand-compute
    it inconsistently and readers can prune on it. Metadata-only
    commit; existing rows are NOT backfilled (the column appears for
    them as NULL under additive schema evolution until rewritten),
    matching the add-column-then-generate flow."""
    import re

    if not re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", name):
        raise ValueError(f"invalid column name '{name}'")
    for _ in range(max_retries):
        commits = _commits(target_path)
        if not commits:
            raise ValueError(f"no commits at {target_path}")
        version = commits[-1]["version"]
        if name in _retired_names(commits):
            raise ValueError(
                f"'{name}' is the retired name of a renamed or dropped "
                f"column at {target_path}"
            )
        if _try_commit(
            target_path,
            version + 1,
            [],
            0,
            generated_add={name: sql_expr},
            op="ADD GENERATED COLUMN",
        ):
            return
    raise RuntimeError(
        f"add_generated_column lost the commit race {max_retries} times "
        f"at {target_path}"
    )


def drop_generated_column(
    target_path: str, name: str, max_retries: int = 20
) -> None:
    """Remove a generated-column definition (the column itself stays —
    it simply stops being derived/validated)."""
    for _ in range(max_retries):
        commits = _commits(target_path)
        if name not in _generated_from(commits):
            raise ValueError(f"no generated column '{name}' at {target_path}")
        version = commits[-1]["version"]
        if _try_commit(
            target_path,
            version + 1,
            [],
            0,
            generated_drop=[name],
            op="DROP GENERATED COLUMN",
        ):
            return
    raise RuntimeError(
        f"drop_generated_column lost the commit race {max_retries} times "
        f"at {target_path}"
    )


def rename_column(
    target_path: str, old: str, new: str, max_retries: int = 20
) -> None:
    """Delta ``ALTER TABLE t RENAME COLUMN old TO new`` via column
    mapping: a METADATA-ONLY commit re-points the logical name at the
    column's original physical name — zero data files rewritten, which
    at 100 TB is the entire point (a rewrite-based rename would be a
    full-table copy). Every reader surface (committed reads, pruned
    reads, CDC, the streaming source, ``table_schema``) presents the
    logical view; writers keep addressing the table by logical names
    and the disk boundary translates. Time travel BEFORE the rename
    commit shows the old name, as in Delta.

    Guards: ``old`` must be a current logical column; ``new`` must not
    collide with a live logical name OR any retired physical name (that
    would silently alias historical data); a CHECK constraint
    referencing the column must be dropped first (constraint
    expressions bind to physical names and cannot be rewritten
    safely)."""
    import re

    for _ in range(max_retries):
        commits = _commits(target_path)
        if not commits:
            raise ValueError(f"no commits at {target_path}")
        version = commits[-1]["version"]
        colmap = _colmap_from(commits)
        struct = _schema_from(commits)
        if struct is None:
            raise ValueError(
                f"cannot rename at {target_path}: table has no recorded schema"
            )
        p2l = {p: l for l, p in colmap.items()}
        logical = [
            p2l.get(f.name, f.name)
            for f in struct.fields
            if f.name not in _dropped_from(commits)
        ]
        if old not in logical:
            raise ValueError(f"no such column '{old}' at {target_path}")
        if new in logical:
            raise ValueError(f"column '{new}' already exists at {target_path}")
        if new in _retired_names(commits):
            raise ValueError(
                f"'{new}' is the retired physical name of a renamed "
                f"or dropped column at {target_path} — pick a different name"
            )
        phys = colmap.get(old, old)
        for cname, expr in _constraints_from(commits).items():
            if re.search(rf"\b{re.escape(phys)}\b", expr):
                raise ValueError(
                    f"cannot rename '{old}': CHECK constraint '{cname}' "
                    f"({expr}) references it — drop the constraint first"
                )
        for gname, gexpr in _generated_from(commits).items():
            if gname == old or re.search(rf"\b{re.escape(old)}\b", gexpr):
                raise ValueError(
                    f"cannot rename '{old}': generated column '{gname}' "
                    f"({gexpr}) involves it — drop the definition first"
                )
        if _try_commit(
            target_path,
            version + 1,
            [],
            0,
            rename={"from": old, "to": new},
            op="RENAME COLUMN",
        ):
            return
    raise RuntimeError(
        f"rename_column lost the commit race {max_retries} times at {target_path}"
    )


def drop_column(target_path: str, name: str, max_retries: int = 20) -> None:
    """Delta ``ALTER TABLE t DROP COLUMN name`` via column mapping: a
    METADATA-ONLY commit retires the column from the logical view — no
    data file rewritten; the bytes stay in old files but every reader
    prunes the column AT THE SCAN (explicit read schema), so they are
    never read again, and subsequent rewrites (compaction, merges) shed
    them physically. Time travel before the drop still shows the
    column. Neither the dropped logical name nor its physical name can
    be reused (name-based mapping cannot disambiguate historical
    bytes — Delta needs column IDs for that; raises loudly instead).
    A CHECK constraint referencing the column must be dropped first."""
    import re

    for _ in range(max_retries):
        commits = _commits(target_path)
        if not commits:
            raise ValueError(f"no commits at {target_path}")
        version = commits[-1]["version"]
        colmap = _colmap_from(commits)
        struct = _schema_from(commits)
        if struct is None:
            raise ValueError(
                f"cannot drop at {target_path}: table has no recorded schema"
            )
        dropped = _dropped_from(commits)
        p2l = {p: l for l, p in colmap.items()}
        logical = [
            p2l.get(f.name, f.name)
            for f in struct.fields
            if f.name not in dropped
        ]
        if name not in logical:
            raise ValueError(f"no such column '{name}' at {target_path}")
        phys = colmap.get(name, name)
        for cname, expr in _constraints_from(commits).items():
            if re.search(rf"\b{re.escape(phys)}\b", expr):
                raise ValueError(
                    f"cannot drop '{name}': CHECK constraint '{cname}' "
                    f"({expr}) references it — drop the constraint first"
                )
        for gname, gexpr in _generated_from(commits).items():
            if gname == name or re.search(rf"\b{re.escape(name)}\b", gexpr):
                raise ValueError(
                    f"cannot drop '{name}': generated column '{gname}' "
                    f"({gexpr}) involves it — drop the definition first"
                )
        if _try_commit(
            target_path,
            version + 1,
            [],
            0,
            drop_col={"logical": name, "physical": phys},
            op="DROP COLUMN",
        ):
            return
    raise RuntimeError(
        f"drop_column lost the commit race {max_retries} times at {target_path}"
    )


def _check_type_conflicts(
    batch: DataFrame, declared, commits: list[dict], target_path: str
) -> None:
    """Write-side schema validation (Delta's stance): NEW columns are
    additive evolution and commit fine; a column re-declared at a
    WIDER (or narrower — upcast at read) type in the widening lattice
    commits fine and widens (or keeps) the table type; any other
    conflict fails the WRITER, not some later reader. Compared in
    PHYSICAL name space — a renamed column's batch values arrive under
    the logical name but land physically."""
    if declared is None:
        return
    types = {f.name: f.dataType for f in declared.fields}
    for f in _to_physical(batch, commits).schema.fields:
        prev = types.get(f.name)
        if (
            prev is not None
            and prev.json() != f.dataType.json()
            and _widest(prev, f.dataType) is None
        ):
            raise ValueError(
                f"schema evolution type conflict on '{f.name}' at "
                f"{target_path}: table has {prev.json()}, "
                f"batch has {f.dataType.json()}"
            )


def _enforce_constraints(batch: DataFrame, commits: list[dict], target_path: str):
    """Reject a write whose batch violates any CHECK constraint in
    force (Delta's write-time enforcement): one codegen'd filter per
    constraint over the BATCH only — O(batch), never a table read.
    Raises with the constraint and one offending row. Constraint
    expressions bind to PHYSICAL column names (rename_column refuses a
    rename while a constraint references the column), so the batch is
    translated before filtering."""
    batch = _to_physical(batch, commits)
    for name, expr in _constraints_from(commits).items():
        bad = batch.filter(~F.expr(expr)).limit(1).collect()
        if bad:
            raise ValueError(
                f"CHECK constraint '{name}' ({expr}) violated at "
                f"{target_path} by row: {bad[0].asDict()}"
            )


def _commit_ts(target_path: str, c: dict) -> int:
    """A commit's timestamp in epoch millis: the recorded ``ts`` field,
    else (pre-timestamp commits) the manifest file's mtime — the same
    fallback Delta uses when a checkpoint lacks in-commit timestamps."""
    if "ts" in c:
        return c["ts"]
    manifest = os.path.join(_txlog_path(target_path), f"{c['version']:08d}.json")
    return int(os.path.getmtime(manifest) * 1000)


def version_as_of(target_path: str, timestamp_ms: int) -> int:
    """Timestamp-based time travel (Delta's ``timestampAsOf``): the
    LATEST committed version whose commit timestamp is <= the given
    epoch-millis instant. Raises if the instant predates the first
    commit (Delta raises the same way — there is no table state to
    serve). Driver-side O(#commits) metadata scan, no data touched."""
    commits = _commits(target_path)
    if not commits:
        raise ValueError(f"no commits at {target_path}")
    chosen: int | None = None
    for c in commits:
        if _commit_ts(target_path, c) <= timestamp_ms:
            chosen = c["version"]
    if chosen is None:
        first = _commit_ts(target_path, commits[0])
        raise ValueError(
            f"timestamp {timestamp_ms} predates the first commit ({first}) "
            f"at {target_path}"
        )
    return chosen


def _try_commit(
    target_path: str,
    version: int,
    add: list[str],
    n: int,
    remove: list[str] | None = None,
    compaction: bool = False,
    stats: dict[str, dict] | None = None,
    schema: str | None = None,
    cdc: list[str] | None = None,
    dv: dict | None = None,
    rename: dict | None = None,
    drop_col: dict | None = None,
    generated_add: dict[str, str] | None = None,
    generated_drop: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_index: dict[str, dict] | None = None,
    txn: dict | None = None,
    restore_of: int | None = None,
    constraints_add: dict[str, str] | None = None,
    constraints_drop: list[str] | None = None,
    vacuum_cutoff: int | None = None,
    op: str | None = None,
    commits: list[dict] | None = None,
) -> bool:
    """CAS-create ``_txlog/{version}.json``. O_CREAT|O_EXCL is atomic on
    POSIX and HDFS; exactly one concurrent writer can win a version."""
    log = _txlog_path(target_path)
    os.makedirs(log, exist_ok=True)
    if schema is not None:
        # Commit schemas live in PHYSICAL name space (they union with
        # file footers): translate any logical field names the writer
        # passed through.
        colmap = _colmap_from(
            _commits(target_path) if commits is None else commits
        )
        if colmap:
            body_schema = json.loads(schema)
            for field in body_schema.get("fields", []):
                field["name"] = colmap.get(field["name"], field["name"])
            schema = json.dumps(body_schema)
    blooms: dict = dict(bloom_index or {})
    if add:
        # Bloom-index the committed files when the table declares index
        # columns — one pyarrow column read per (file, col), O(batch).
        # Computed BEFORE the CAS open (reading the log after creating
        # the empty manifest would trip over our own half-written file).
        # A caller-provided bloom_index (CLONE carrying the source's
        # filters) is honored per file, but any added file ABSENT from
        # it is still built here — a partial map must never leave files
        # silently unindexed on a bloom-declared table.
        missing = [f for f in add if f not in blooms]
        if missing:
            if bloom_cols is not None:  # declared by THIS commit: wins
                bcols = list(bloom_cols)
            else:
                bcols = _bloom_cols_from(
                    _commits(target_path) if commits is None else commits
                )
            if bcols:
                blooms.update(_bloom_build(target_path, missing, bcols))
    manifest = os.path.join(log, f"{version:08d}.json")
    try:
        fd = os.open(manifest, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    # Commit timestamp (epoch millis) — the anchor for timestamp-based
    # time travel (Delta's `timestampAsOf`). Written by the winner at
    # CAS time, so commit order and timestamp order agree on one
    # writer host; version order remains the authoritative order.
    body = {"add": add, "n": n, "ts": time.time_ns() // 1_000_000}
    # File sizes of the commit's data + change files, recorded AT WRITE
    # TIME (one stat per new file, while the writer is already touching
    # them). Consumers that need sizes — the streaming source's
    # byte-bounded split packing, table_detail — read them from the log
    # instead of re-statting every file on every poll: O(#files) driver
    # syscalls per trigger become O(log metadata), and on object
    # storage a HEAD per file per poll disappears (guide §6 metadata;
    # VERDICT r15 items 2/3). Purely advisory — no reader misreads a
    # manifest without it, so it is not a protocol feature.
    sizes: dict[str, int] = {}
    for rel in list(add) + list(cdc or []):
        try:
            sizes[rel] = os.path.getsize(os.path.join(target_path, rel))
        except OSError:
            pass  # legacy adoption of an unstatable file: stays advisory
    if sizes:
        body["sizes"] = sizes
    if blooms:
        body["bloom"] = blooms
    if bloom_cols is not None:
        body["bloom_cols"] = bloom_cols
    if remove:
        body["remove"] = remove
    if compaction:
        body["compaction"] = True
    if stats:
        body["stats"] = stats
    if schema is not None:
        body["schema"] = schema
    if cdc:
        body["cdc"] = cdc
    if dv is not None:
        body["dv"] = dv
    if rename is not None:
        body["rename"] = rename
    if drop_col is not None:
        body["drop_col"] = drop_col
    if generated_add:
        body["generated_add"] = generated_add
    if generated_drop:
        body["generated_drop"] = generated_drop
    if txn:
        body["txn"] = txn
    if restore_of is not None:
        body["restore"] = restore_of
    if constraints_add:
        body["constraints_add"] = constraints_add
    if constraints_drop:
        body["constraints_drop"] = constraints_drop
    if vacuum_cutoff is not None:
        body["vacuum"] = {"cutoff": vacuum_cutoff}
    if op is not None:
        body["op"] = op
    feats = sorted(
        feat
        for key, feat in _FEATURE_OF_KEY.items()
        if key in body
    )
    if feats:
        # Protocol guard (Delta's reader-feature flags): any commit
        # using a feature an ignorant reader would MISREAD (dv entries
        # ignored = deleted rows resurrected; physical names read as
        # logical; generated/constraint columns unenforced) declares it,
        # and _commits refuses manifests declaring features this reader
        # doesn't know.
        body["features"] = feats
    with os.fdopen(fd, "w") as fh:
        # allow_nan=False: the manifest is the table's public format —
        # strict JSON only (Infinity/NaN tokens would break non-Python
        # log readers). _collect_stats already drops non-finite bounds,
        # so this is a loud backstop, not a code path.
        json.dump(body, fh, allow_nan=False)
        fh.flush()
        os.fsync(fh.fileno())
    # A checkpoint + vacuum_log landing while we held a stale head can
    # have REMOVED this version's manifest, re-opening its O_EXCL slot —
    # but _commits skips manifests at or below the checkpoint version,
    # so a write into a covered slot would be silently invisible.
    # Convert it to a CAS loss: the caller refreshes and retries on the
    # real head.
    if version <= _last_checkpoint_version(log):
        os.remove(manifest)
        return False
    return True


def _stage_files(
    new_rows: DataFrame,
    target_path: str,
    partition_cols: Sequence[str] | None,
    commits: list[dict] | None = None,
    size_output: bool = True,
) -> list[str]:
    """Write the insert set to a dot-hidden staging dir inside the
    table, then os.replace each part file into the table root (same
    filesystem ⇒ atomic rename; readers never observe a partial file).
    Returns the relative paths of the staged files.

    Data files always store PHYSICAL column names: the logical→physical
    translation happens here, at the disk boundary, so writers compute
    in logical space and renamed tables keep one on-disk schema.

    ``size_output`` (default): REBALANCE the rows before the write so
    AQE sizes the output files to ``advisoryPartitionSizeInBytes``
    instead of one tiny file per upstream task (guide §6: small files
    hurt twice — Delta's "optimized writes" shuffle). Without it a
    merge whose plan unions N-partition branches staged up to N
    near-empty parts PER COMMIT, and every later snapshot read,
    matched-file discovery and footer-stats pass paid O(files) opens
    (measured r15: a 3-commit bm25-index table held ~100 files; the
    merge engine re-scans it 3+ times per MERGE). Callers that arrange
    their own layout (compact's range/Z-order clustering) pass False —
    a rebalance there would destroy the clustering."""
    if commits is None:
        commits = _commits(target_path)
    new_rows = _to_physical(new_rows, commits)
    if partition_cols:
        colmap = _colmap_from(commits)
        partition_cols = [colmap.get(c, c) for c in partition_cols]
    if size_output:
        # Partitioned writes rebalance ON the partition columns so each
        # output directory gets few well-sized files, not one per task.
        new_rows = (
            new_rows.hint("rebalance", *partition_cols)
            if partition_cols
            else new_rows.hint("rebalance")
        )
    stage = os.path.join(target_path, f".stage-{uuid.uuid4().hex}")
    writer = new_rows.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(stage)
    staged: list[str] = []
    for dirpath, dirnames, filenames in os.walk(stage):
        dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
        for fn in filenames:
            if not fn.endswith(".parquet") or fn.startswith(("_", ".")):
                continue
            rel_dir = os.path.relpath(dirpath, stage)
            dst_dir = target_path if rel_dir == "." else os.path.join(target_path, rel_dir)
            os.makedirs(dst_dir, exist_ok=True)
            unique = f"part-{uuid.uuid4().hex}.parquet"
            os.replace(os.path.join(dirpath, fn), os.path.join(dst_dir, unique))
            staged.append(
                unique if rel_dir == "." else os.path.join(rel_dir, unique)
            )
    shutil.rmtree(stage, ignore_errors=True)
    return staged


def _staged_row_count(target_path: str, staged: list[str]) -> int:
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(os.path.join(target_path, rel)).metadata.num_rows
        for rel in staged
    )


def _collect_stats(target_path: str, staged: list[str]) -> dict[str, dict]:
    """Per-file zone maps from the parquet footers the writer just
    produced: {rel_path: {column: [min, max]}} for int/float/string
    leaf columns. Read cost is the same footer range already fetched
    for the row count — no data pages. Columns without parquet
    statistics (or with exotic types) are simply absent, which readers
    treat as unprunable (safe).

    A column whose min/max cannot be established for EVERY row group of
    a file is dropped from that file's map entirely: a partial zone map
    (some row groups bounded, others not) would understate the file's
    true range and make read_committed_pruned skip a file that contains
    matching rows — silent row loss. The one row-group shape that is
    safe to skip is the provably all-NULL chunk (no non-null values can
    ever match a range predicate). Non-finite float bounds (±inf/NaN
    footers) are likewise dropped — they bound nothing useful and would
    make the commit manifest non-strict JSON."""
    import math

    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for rel in staged:
        md = pq.ParquetFile(os.path.join(target_path, rel)).metadata
        cols: dict[str, list] = {}
        bad: set[str] = set()  # columns with any unbounded row group
        for rg_idx in range(md.num_row_groups):
            rg = md.row_group(rg_idx)
            for c_idx in range(rg.num_columns):
                col = rg.column(c_idx)
                name = col.path_in_schema
                try:
                    st = col.statistics
                    if st is None:
                        bad.add(name)
                        continue
                    if not st.has_min_max:
                        # All-NULL chunk: zero non-null values, nothing
                        # to bound — safe to omit. Anything else
                        # (writer dropped stats on oversized values…)
                        # poisons the column for this file.
                        if not (
                            st.has_null_count
                            and st.null_count == col.num_values
                        ):
                            bad.add(name)
                        continue
                    lo, hi = st.min, st.max
                except Exception:  # noqa: BLE001 — pyarrow raises on
                    bad.add(name)  # types it can't extract stats for
                    continue
                if not isinstance(lo, (int, float, str)) or not isinstance(
                    hi, (int, float, str)
                ):
                    bad.add(name)
                    continue
                if isinstance(lo, float) and not (
                    math.isfinite(lo) and math.isfinite(hi)
                ):
                    bad.add(name)
                    continue
                if name in cols:
                    cols[name] = [min(cols[name][0], lo), max(cols[name][1], hi)]
                else:
                    cols[name] = [lo, hi]
        for name in bad:
            cols.pop(name, None)
        if cols:
            out[rel] = cols
    return out


def table_schema(target_path: str, version: int | None = None):
    """The table's evolved schema: the union of every commit's recorded
    writer schema in version order — additive evolution only (an
    insert-only log never narrows; a field re-declared with a DIFFERENT
    type raises rather than silently widening, Delta's
    default-off autoMerge stance). Returns None when no commit recorded
    a schema (pre-evolution tables read with file-inferred schemas).
    Field names are the LOGICAL view as of the version (column mapping
    applied); zone maps (:func:`file_stats`) stay physical."""
    from pyspark.sql.types import StructField, StructType

    commits = _commits(target_path, version)
    struct = _schema_from(commits)
    colmap = _colmap_from(commits)
    dropped = _dropped_from(commits)
    if struct is None or (not colmap and not dropped):
        return struct
    p2l = {p: l for l, p in colmap.items()}
    return StructType(
        [
            StructField(p2l.get(f.name, f.name), f.dataType, f.nullable)
            for f in struct.fields
            if f.name not in dropped
        ]
    )


def file_stats(target_path: str, version: int | None = None) -> dict[str, dict]:
    """Zone maps of the committed file view: {rel_path: {col: [min,
    max]}}, add/remove applied in version order. Files committed before
    stats existed (or via legacy adoption) are absent — unprunable."""
    return _stats_from(_commits(target_path, version))


def read_committed_pruned(
    spark: SparkSession,
    target_path: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
) -> tuple[DataFrame | None, int, int]:
    """Data-skipping read: the committed view restricted to
    ``col BETWEEN lo AND hi``, opening ONLY the files whose commit-time
    zone map intersects the range (files without stats are kept —
    pruning is an optimization, never a correctness device). Returns
    (frame, files_read, files_total); the residual BETWEEN filter still
    applies row-level inside the kept files.

    This is the txlog's answer to Delta/Iceberg file skipping: at
    100 TB a selective range predicate touches the handful of files
    whose footer stats admit it — O(selected data), not O(table) —
    and the decision happens driver-side on manifest metadata, before
    any task is scheduled. ONE log parse serves files, zone maps, and
    the evolved union schema (so a pruned read of a schema-evolved
    table sees the same columns as read_committed — evolved columns
    null-fill, and pruning ON an evolved column works)."""
    all_commits = _commits(target_path)
    if version is not None and version < _vacuum_cutoff(all_commits):
        raise ValueError(
            f"version {version} is below the vacuum retention horizon "
            f"({_vacuum_cutoff(all_commits)}) at {target_path}"
        )
    commits = [
        c for c in all_commits if version is None or c["version"] <= version
    ]
    files = _files_from(commits)
    if not files:
        return None, 0, 0
    stats = _stats_from(commits)
    # Zone maps are keyed by PHYSICAL column name; the caller passes
    # the logical one (the residual filter below runs on the logical
    # frame _read_snapshot returns).
    pcol = _colmap_from(commits).get(col, col)
    kept = [
        f
        for f in files
        if pcol not in stats.get(f, {})
        or not (stats[f][pcol][1] < lo or stats[f][pcol][0] > hi)
    ]
    if not kept:
        # Valid empty result with the right schema: scan one file, keep
        # nothing (the predicate excluded every zone).
        kept = files[:1]
    df = _read_snapshot(
        spark, target_path, commits, files=kept, schema=_schema_from(commits)
    ).filter(F.col(col).between(lo, hi))
    return df, len(kept), len(files)


def read_committed(
    spark: SparkSession,
    target_path: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
) -> DataFrame | None:
    """Strict committed-only read: only files referenced by a commit
    manifest — a crashed writer's orphaned staging output is invisible.
    Pass ``version`` for time travel (the snapshot as of that commit;
    earlier files must not have been vacuumed yet, same rule as Delta's
    retention window) or ``timestamp_ms`` for timestamp-based travel
    (resolved to a version via :func:`version_as_of`; passing both
    raises, as in Delta). ``basePath`` keeps partition-directory
    columns recoverable.

    Schema comes from the LOG when commits recorded one (the union of
    writer schemas — additive evolution): files written before a column
    existed null-fill it, and no footer round-trip per file is needed
    (the mergeSchema-option cost Delta also avoids by logging schemas).
    """
    if timestamp_ms is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp_ms, not both")
        version = version_as_of(target_path, timestamp_ms)
    all_commits = _commits(target_path)
    if version is not None and version < _vacuum_cutoff(all_commits):
        raise ValueError(
            f"version {version} is below the vacuum retention horizon "
            f"({_vacuum_cutoff(all_commits)}) at {target_path} — its files "
            "may be reclaimed"
        )
    commits = [
        c for c in all_commits if version is None or c["version"] <= version
    ]
    files = _files_from(commits)
    if not files:
        return None
    return _read_snapshot(
        spark, target_path, commits, files=files, schema=_schema_from(commits)
    )


def table_changes(
    spark: SparkSession,
    target_path: str,
    from_version: int,
    with_version: bool = False,
) -> DataFrame | None:
    """TYPED change-data-feed read (Delta CDF contract): every row of
    every commit with version > ``from_version``, tagged with
    ``_change_type`` ∈ {insert, update_preimage, update_postimage}.
    Insert-only commits derive the feed from their add files directly
    (zero extra storage — Delta's same optimization for blind appends)
    and tag every row ``insert``; upsert commits (:func:`merge_upsert`)
    read the ``_change_data`` parquet files the writer recorded, which
    carry their own ``_change_type`` column with pre- AND post-image
    rows for every update. Compaction commits rewrite existing rows
    without changing table contents, so they are excluded. Incremental
    consumers poll ``_committed_version`` and read only the delta —
    the pattern that turns a 100 TB table into a streamable source
    without rescanning history.

    ``with_version=True`` additionally tags every row with its
    originating commit as ``_commit_version`` (Delta CDF's column).

    All parts read under the log's evolved union schema when recorded,
    so a feed spanning a schema-evolution boundary delivers the current
    table schema with older rows null-filled — never the schema of
    whichever file inference happened to open first.

    Scale: one scan node per commit in the polled window, each opening
    only that commit's added (or change-data) files — O(delta), never a
    table scan."""
    from pyspark.sql.types import StringType, StructField, StructType

    commits = _commits(target_path)
    horizon = _vacuum_cutoff(commits)
    if from_version < horizon:
        raise ValueError(
            f"change feed from version {from_version} reaches below the "
            f"vacuum retention horizon ({horizon}) at {target_path} — "
            "those commits' files may be reclaimed; start at the horizon "
            "or later"
        )
    evolved = _schema_from(commits)
    parts: list[DataFrame] = []
    for c in commits:
        if c["version"] <= from_version or c.get("compaction"):
            continue
        if c.get("cdc"):
            # Change-data files are flat (partition columns are physical
            # there) and carry _change_type — no basePath needed.
            reader = spark.read
            if evolved is not None:
                reader = reader.schema(
                    StructType(
                        [*evolved.fields, StructField(_CHANGE_COL, StringType(), True)]
                    )
                )
            part = reader.parquet(
                *[os.path.join(target_path, rel) for rel in c["cdc"]]
            )
        elif c["add"]:
            part = _read_files(
                spark, target_path, c["add"], schema=evolved
            ).withColumn(_CHANGE_COL, F.lit("insert"))
        else:
            continue
        if with_version:
            part = part.withColumn(
                "_commit_version", F.lit(c["version"]).cast("bigint")
            )
        parts.append(part)
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        # allowMissingColumns: commits on either side of an additive
        # schema evolution union cleanly (older rows null-fill).
        out = out.unionByName(p, allowMissingColumns=True)
    # Change files store physical names; consumers see the logical view.
    return _to_logical(out, commits)


def _zorder_key(
    snapshot: DataFrame, cluster_by: Sequence[str], bits: int = 8
) -> Column:
    """Z-order (Morton) key over ≥2 NUMERIC columns: each value is
    range-bucketized into 2^bits ranks from the snapshot's driver-side
    min/max (one aggregation pass — negligible next to the rewrite),
    then the rank bits are interleaved with plain JVM shift/and/or
    arithmetic — whole-stage-codegen expressions, no UDF. Sorting by
    the interleaved key gives every output file a bounded range in
    EVERY clustered dimension simultaneously, which is what makes
    multi-column zone-map skipping work (OPTIMIZE ZORDER's core trick;
    a lexicographic multi-column sort only bounds the first column).
    NULLs rank 0 (they match no range predicate, so mis-clustering
    them is harmless)."""
    from pyspark.sql.types import NumericType

    k = len(cluster_by)
    fields = {f.name: f.dataType for f in snapshot.schema.fields}
    for c in cluster_by:
        if not isinstance(fields.get(c), NumericType):
            raise ValueError(
                f"zorder clustering requires numeric columns; '{c}' is "
                f"{fields.get(c)}"
            )
    stats = snapshot.agg(
        *[F.min(c).alias(f"_lo{i}") for i, c in enumerate(cluster_by)],
        *[F.max(c).alias(f"_hi{i}") for i, c in enumerate(cluster_by)],
    ).collect()[0]
    n_buckets = 1 << bits
    z: Column = F.lit(0).cast("bigint")
    for i, c in enumerate(cluster_by):
        lo, hi = stats[f"_lo{i}"], stats[f"_hi{i}"]
        if lo is None or hi is None or float(hi) == float(lo):
            continue  # constant/all-null column carries no order
        norm = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(
            float(hi) - float(lo)
        )
        bucket = F.least(
            F.lit(n_buckets - 1),
            F.greatest(F.lit(0), F.floor(norm * n_buckets).cast("int")),
        )
        bucket = F.coalesce(bucket, F.lit(0))
        for b in range(bits):
            z = z + F.shiftright(bucket, b).bitwiseAND(F.lit(1)).cast(
                "bigint"
            ) * F.lit(1 << (b * k + i))
    return z


def compact(
    spark: SparkSession,
    target_path: str,
    min_files: int = 2,
    target_bytes: int = 128 * 1024 * 1024,
    partition_cols: Sequence[str] | None = None,
    max_retries: int = 20,
    cluster_by: Sequence[str] | None = None,
    zorder: bool = False,
) -> int:
    """Small-file compaction (Delta OPTIMIZE analog): rewrite the
    committed files into ~``target_bytes`` parts and commit the swap as
    one atomic version (add=new, remove=old, compaction=true). Readers
    at any point see either the old or the new file set — never both.
    The replaced files stay on disk for older-version readers until
    ``vacuum_orphans`` reclaims them (the retention-window trade).

    ``cluster_by`` is OPTIMIZE ZORDER's single-dimension analog: the
    rewrite range-partitions + sorts on the given columns, so each
    output file covers a narrow value range and the commit's zone maps
    (``stats``) become maximally selective — ingestion-ordered files
    answer a range predicate by reading everything, clustered files by
    reading one or two (see test_compact_cluster_by_tightens_zone_maps).
    With ``zorder=True`` and ≥2 numeric ``cluster_by`` columns, the
    rewrite sorts on the bit-interleaved Morton key instead
    (:func:`_zorder_key`) — true multi-dimension OPTIMIZE ZORDER:
    every output file gets a bounded range in EVERY clustered column,
    so single-column predicates on ANY of them skip files
    (lexicographic sort only serves the leading column).

    Merge-writers racing the compactor are safe: both CAS the same
    version sequence, the loser recomputes. Returns the number of files
    replaced (0 = nothing to do).

    At 100 TB this is THE operational lever against the small-file
    problem streaming ingest creates: per-micro-batch commits make many
    small parts; periodic compaction restores scan efficiency without
    pausing ingest — and clustered compaction is the background job
    that turns an append-ordered table into a range-skippable one."""
    for _ in range(max_retries):
        commits = _commits(target_path)
        version = commits[-1]["version"] if commits else 0
        old = _files_from(commits)
        if len(old) < min_files:
            return 0
        total = sum(
            os.path.getsize(os.path.join(target_path, f)) for f in old
        )
        n_parts = max(1, int(total // target_bytes) + (1 if total % target_bytes else 0))
        # Partitioned tables must re-write under partitionBy (pass the
        # table's partition_cols) or the layout flattens. The snapshot
        # reads under the log's evolved schema so a compaction of a
        # schema-evolved table rewrites the UNION schema (null-filled),
        # not whichever file schema inference happened to pick.
        # _read_snapshot: a compaction of DV-carrying files reads the
        # DV-filtered rows and removes the old files — the rewrite IS
        # the physical purge, and the output files start DV-free.
        snapshot = _read_snapshot(
            spark, target_path, commits, files=old, schema=_schema_from(commits)
        )
        if cluster_by and zorder and len(cluster_by) >= 2:
            # Morton-key clustering: disjoint z-ranges per output file
            # ⇒ bounded min/max in every clustered dimension.
            arranged = (
                snapshot.withColumn("_zorder", _zorder_key(snapshot, cluster_by))
                .repartitionByRange(n_parts, "_zorder")
                .sortWithinPartitions("_zorder")
                .drop("_zorder")
            )
        elif cluster_by:
            # repartitionByRange + sortWithinPartitions = disjoint,
            # internally-ordered value ranges per output file.
            arranged = snapshot.repartitionByRange(
                n_parts, *cluster_by
            ).sortWithinPartitions(*cluster_by)
        else:
            arranged = snapshot.coalesce(n_parts)
        staged = _stage_files(
            arranged, target_path, partition_cols, commits=commits,
            size_output=False,  # layout arranged above (coalesce/cluster)
        )
        if _try_commit(
            target_path,
            version + 1,
            staged,
            0,
            remove=old,
            compaction=True,
            stats=_collect_stats(target_path, staged),
            op="OPTIMIZE",
            commits=commits,
        ):
            return len(old)
        for rel in staged:
            try:
                os.remove(os.path.join(target_path, rel))
            except FileNotFoundError:
                pass
    raise RuntimeError(
        f"compact lost the commit race {max_retries} times at {target_path}"
    )


def vacuum_orphans(target_path: str) -> list[str]:
    """Delete data files not referenced by any commit (a crashed
    writer's staged leftovers) — Delta's VACUUM, minus the retention
    window because this log has no deletes/overwrites to time-travel.
    Change-data files not referenced by any commit's ``cdc`` entry (a
    crashed upsert's staged leftovers) are reclaimed the same way;
    committed change files are kept — they are the feed's history."""
    referenced = set(committed_files(target_path))
    removed = []
    for rel in _data_files(target_path):
        if rel not in referenced:
            os.remove(os.path.join(target_path, rel))
            removed.append(rel)
    cdc_dir = os.path.join(target_path, _CDC_DIR)
    if os.path.isdir(cdc_dir):
        cdc_referenced: set[str] = set()
        for c in _commits(target_path):
            cdc_referenced.update(c.get("cdc", []))
        for fn in os.listdir(cdc_dir):
            rel = os.path.join(_CDC_DIR, fn)
            if fn.endswith(".parquet") and rel not in cdc_referenced:
                os.remove(os.path.join(cdc_dir, fn))
                removed.append(rel)
    dv_dir = os.path.join(target_path, _DV_DIR)
    if os.path.isdir(dv_dir):
        # Same rule for deletion-vector files: a crashed delete's staged
        # kill list is unreferenced and reclaimed; committed DV files are
        # part of some snapshot's row view and stay.
        dv_referenced: set[str] = set()
        for c in _commits(target_path):
            d = c.get("dv") or {}
            dv_referenced.update(d.get("add", []))
            for refs in d.get("reset", {}).values():
                dv_referenced.update(refs)
        for fn in os.listdir(dv_dir):
            rel = os.path.join(_DV_DIR, fn)
            if fn.endswith(".parquet") and rel not in dv_referenced:
                os.remove(os.path.join(dv_dir, fn))
                removed.append(rel)
    return removed


def vacuum(
    target_path: str,
    retain_versions: int | None = None,
    retain_ms: int | None = None,
    *,
    unsafe_zero_retention: bool = False,
    max_retries: int = 20,
) -> list[str]:
    """Retention-window VACUUM (Delta's ``VACUUM t RETAIN n HOURS``,
    version- or time-based): physically reclaim data files that no
    snapshot in the retention window [head-``retain_versions``, head]
    (or, with ``retain_ms``, every snapshot younger than that age)
    can reference, plus the change-data files of commits at or below
    the cutoff. Returns the reclaimed relative paths.

    The retention window is EXPLICIT: exactly one of
    ``retain_versions`` / ``retain_ms`` must be passed, and a
    zero-retention window (which immediately ratchets the horizon to
    head and drops ALL time-travel history) additionally requires
    ``unsafe_zero_retention=True`` — the same guard Delta puts behind
    ``spark.databricks.delta.retentionDurationCheck.enabled``, so one
    forgotten argument can never silently destroy history.

    The cutoff is recorded as a metadata commit (``vacuum.cutoff``),
    and it RATCHETS — later vacuums never regress it. Readers honor it
    as a contract: ``read_committed``/``read_committed_pruned`` with a
    version below the horizon, and ``table_changes`` starting below
    it, raise a clear retention error instead of failing mid-scan on
    missing files (the failure Delta surfaces as a FileNotFound deep
    inside a job).

    Only files that commit history itself removed are candidates — a
    concurrent writer's staged-but-uncommitted files are untouched
    (they are not in any manifest), so vacuum is safe to run beside
    live writers; crashed-stage orphans remain
    :func:`vacuum_orphans`'s job.

    Scale: pure driver-side manifest math + unlink calls — O(#commits
    + #reclaimed files); no Spark job, no data read. Bounded storage
    for a continuously-upserting 100 TB table comes exactly from this:
    without vacuum, copy-on-write rewrites accumulate forever."""
    if (retain_versions is None) == (retain_ms is None):
        raise ValueError(
            "vacuum requires an explicit retention window: pass exactly "
            "one of retain_versions= or retain_ms="
        )
    window = retain_versions if retain_versions is not None else retain_ms
    if window < 0:
        # A negative window is never meaningful — and worse than zero:
        # retain_versions=-1 would compute cutoff = head + 1, ratcheting
        # the horizon ABOVE the current snapshot and bricking every read.
        raise ValueError(f"retention window must be >= 0, got {window}")
    if window == 0 and not unsafe_zero_retention:
        raise ValueError(
            "zero-retention vacuum drops ALL time-travel history below "
            "head; pass unsafe_zero_retention=True to confirm (Delta's "
            "retentionDurationCheck equivalent)"
        )
    removed: list[str] = []
    cutoff: int | None = None
    for _ in range(max_retries):
        commits = _commits(target_path)
        if not commits:
            return removed
        head = commits[-1]["version"]
        if cutoff is None:  # fixed on first attempt; CAS retries re-use it
            if retain_ms is not None:
                try:
                    raw_cutoff = version_as_of(
                        target_path, int(time.time() * 1000) - retain_ms
                    )
                except ValueError:
                    # The retention window predates the first commit — a
                    # conservative policy (e.g. RETAIN 7 DAYS) on a young
                    # table retains EVERYTHING (versions start at 1, so a
                    # cutoff of 0 keeps every data and CDC file live).
                    # Delta's VACUUM likewise no-ops rather than crash
                    # the maintenance job. Fall through with cutoff 0:
                    # the scan below still re-reclaims crash leftovers
                    # under an EXISTING horizon, and the commit-free
                    # return keeps a true no-op pass commit-free — the
                    # same behavior an equivalently oversized
                    # retain_versions window gets (ADVICE r14: the two
                    # no-op paths must not diverge).
                    raw_cutoff = 0
            else:
                raw_cutoff = max(head - retain_versions, 0)
            prior_horizon = _vacuum_cutoff(commits)
            cutoff = max(raw_cutoff, prior_horizon)  # horizon ratchets
            live = set(
                _files_from([c for c in commits if c["version"] <= cutoff])
            )
            ever: set[str] = set()
            live_cdc: set[str] = set()
            all_cdc: set[str] = set()
            # DV files live while any retained snapshot's DV state (the
            # cutoff snapshot's replayed mapping, or any add/reset in a
            # retained commit) references them.
            live_dv: set[str] = set()
            all_dv: set[str] = set()
            for dvs in _dv_from(
                [c for c in commits if c["version"] <= cutoff]
            ).values():
                live_dv.update(dvs)
            for c in commits:
                all_cdc.update(c.get("cdc", []))
                d = c.get("dv") or {}
                dv_refs = set(d.get("add", []))
                for refs in d.get("reset", {}).values():
                    dv_refs.update(refs)
                all_dv.update(dv_refs)
                if c["version"] > cutoff:
                    live.update(c["add"])
                    live_cdc.update(c.get("cdc", []))
                    live_dv.update(dv_refs)
                else:
                    ever.update(c["add"])
            for rel in sorted(
                (ever - live) | (all_cdc - live_cdc) | (all_dv - live_dv)
            ):
                try:
                    os.remove(os.path.join(target_path, rel))
                    removed.append(rel)
                except FileNotFoundError:
                    pass  # reclaimed by an earlier vacuum
            if not removed and cutoff <= prior_horizon:
                # Pure no-op maintenance pass: the horizon would not
                # move and nothing was reclaimable — return commit-free
                # instead of appending an empty VACUUM marker, so a
                # scheduled conservative policy on a quiet table does
                # not grow the log (symmetric across the version- and
                # time-window paths, ADVICE r14).
                return removed
        if _try_commit(target_path, head + 1, [], 0, vacuum_cutoff=cutoff, op="VACUUM"):
            return removed
    raise RuntimeError(
        f"vacuum lost the commit race {max_retries} times at {target_path}"
    )


def restore(
    spark: SparkSession,
    target_path: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
    max_retries: int = 20,
) -> tuple[int, int]:
    """Delta ``RESTORE TABLE t TO VERSION AS OF v`` (or TIMESTAMP AS OF)
    on the parquet txlog: commit a NEW version whose file view equals
    the view at the target version — metadata-only roll-back, no data
    rewrite. Returns (files_re_added, files_dropped).

    The restore is itself a commit (history is never erased — time
    travel to the pre-restore state keeps working, as in Delta), and
    it is O(#commits) driver metadata plus footer reads for the
    re-added row count: at 100 TB nothing re-writes, the manifest just
    flips adds/removes. Files the target view needs must still exist
    (not vacuumed) — missing files raise loudly rather than committing
    a view that cannot be read, the same guard Delta's RESTORE applies
    against its retention window.

    TYPED CDC: the commit stages change rows computed as the FILE-level
    diff — rows of re-added files tagged ``insert``, rows of dropped
    files tagged ``delete`` (what Delta CDF emits for RESTORE). A
    restore that crosses a compaction boundary therefore reports
    physically-rewritten rows as delete+insert pairs even though table
    CONTENTS did not change there — a physical, not logical, diff
    (documented Delta caveat as well).

    Divergence from Delta, documented: the log's schema is an additive
    union, so restore reverts DATA only; columns evolved after the
    target version remain in the read schema and null-fill over
    re-added files.
    """
    import pyarrow.parquet as pq

    if timestamp_ms is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp_ms, not both")
        version = version_as_of(target_path, timestamp_ms)
    for _ in range(max_retries):
        commits = _commits(target_path)
        if not commits:
            raise ValueError(f"no commits at {target_path}")
        head = commits[-1]["version"]
        if version is None or version > head:
            raise ValueError(f"restore target {version} not in log (head={head})")
        if version < _vacuum_cutoff(commits):
            raise ValueError(
                f"restore target {version} is below the vacuum retention "
                f"horizon ({_vacuum_cutoff(commits)}) at {target_path}"
            )
        old_commits = [c for c in commits if c["version"] <= version]
        old_files = _files_from(old_commits)
        cur_files = _files_from(commits)
        re_add = sorted(set(old_files) - set(cur_files))
        drop = sorted(set(cur_files) - set(old_files))
        old_dv = _dv_from(old_commits)
        cur_dv = _dv_from(commits)
        # Files in BOTH views whose deletion-vector state changed: their
        # row visibility differs even though the file view doesn't (a
        # merge-on-read DELETE between target and head adds/removes no
        # files). They contribute CDC rows, and make a same-file-view
        # restore a real commit, not a no-op.
        dv_diff = sorted(
            f
            for f in set(old_files) & set(cur_files)
            if sorted(old_dv.get(f, [])) != sorted(cur_dv.get(f, []))
        )
        if not re_add and not drop and not dv_diff:
            return 0, 0  # restoring to the current view is a no-op
        missing = [
            f for f in re_add if not os.path.exists(os.path.join(target_path, f))
        ] + [
            d
            for dvs in old_dv.values()
            for d in dvs
            if not os.path.exists(os.path.join(target_path, d))
        ]
        if missing:
            raise FileNotFoundError(
                f"restore to v{version} needs vacuumed file(s) {missing[:3]}… "
                f"at {target_path} — target version is beyond the retention "
                "window"
            )
        evolved = _schema_from(commits)

        def _tagged(
            rel_files: list[str], tag: str, as_of: list[dict]
        ) -> DataFrame | None:
            # Each side of the diff reads under ITS snapshot's deletion
            # vectors: resurrected rows exclude rows already DV-deleted
            # at the target version; dropped rows exclude rows DV-deleted
            # since — the CDC diff is over visible rows, not raw files.
            if not rel_files:
                return None
            return _read_snapshot(
                spark, target_path, as_of, files=rel_files, schema=evolved
            ).withColumn(_CHANGE_COL, F.lit(tag))

        ins = _tagged(re_add, "insert", old_commits)
        if ins is not None:
            # The insert side read under the TARGET version's logical
            # names; re-express it in the head's so the CDC union,
            # constraint check, and staging all speak one space.
            ins = _relabel(ins, old_commits, commits)
        dels = _tagged(drop, "delete", commits)
        if dv_diff:
            # Row-level diff over the DV-changed common files: visible
            # at the target but masked now → resurrected (insert);
            # visible now but masked at the target → suppressed
            # (delete). Keyed on (file, row index) lineage — O(changed
            # files), broadcast anti-joins on the kill lists.
            vis_old = _read_snapshot(
                spark, target_path, old_commits, files=dv_diff,
                schema=evolved, keep_lineage=True,
            )
            vis_cur = _read_snapshot(
                spark, target_path, commits, files=dv_diff,
                schema=evolved, keep_lineage=True,
            )
            resurrected = (
                _relabel(
                    vis_old.join(
                        vis_cur.select(_FP_COL, _RI_COL),
                        [_FP_COL, _RI_COL],
                        "left_anti",
                    ),
                    old_commits,
                    commits,
                )
                .drop(_FP_COL, _RI_COL)
                .withColumn(_CHANGE_COL, F.lit("insert"))
            )
            suppressed = (
                vis_cur.join(
                    vis_old.select(_FP_COL, _RI_COL), [_FP_COL, _RI_COL], "left_anti"
                )
                .drop(_FP_COL, _RI_COL)
                .withColumn(_CHANGE_COL, F.lit("delete"))
            )
            ins = resurrected if ins is None else ins.unionByName(resurrected)
            dels = suppressed if dels is None else dels.unionByName(suppressed)
        if ins is not None:
            # A constraint added AFTER the target version must not be
            # silently violated by resurrected rows — validate them
            # (we are reading these files for CDC anyway).
            _enforce_constraints(ins.drop(_CHANGE_COL), commits, target_path)
        cdc = ins.unionByName(dels) if ins is not None and dels is not None else (
            ins if ins is not None else dels
        )
        cdc_staged = _stage_cdc_files(cdc, target_path, commits=commits)
        n = sum(
            pq.ParquetFile(os.path.join(target_path, f)).metadata.num_rows
            for f in re_add
        )
        # Footer row counts overstate DV-masked files — subtract the
        # target version's kill-list rows for the re-added files.
        re_add_set = set(re_add)
        for d in {d for f in re_add for d in old_dv.get(f, [])}:
            t = pq.read_table(os.path.join(target_path, d), columns=["file"])
            n -= sum(1 for v in t.column(0).to_pylist() if v in re_add_set)
        old_stats = _stats_from(old_commits)
        if _try_commit(
            target_path,
            head + 1,
            re_add,
            n,
            remove=drop,
            stats={f: old_stats[f] for f in re_add if f in old_stats},
            cdc=cdc_staged,
            # Restoring the file view restores the DV state with it —
            # a reset entry replaces the replayed mapping wholesale.
            dv={"reset": old_dv, "n": 0} if old_dv != cur_dv else None,
            restore_of=version,
            op="RESTORE",
            commits=commits,
        ):
            return len(re_add), len(drop)
        for rel in cdc_staged:  # lost the CAS — recompute against winner
            try:
                os.remove(os.path.join(target_path, rel))
            except FileNotFoundError:
                pass
    raise RuntimeError(
        f"restore lost the commit race {max_retries} times at {target_path}"
    )


def clone_table(
    src_path: str,
    dst_path: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
) -> int:
    """Delta ``CREATE TABLE dst DEEP CLONE src [VERSION AS OF v]``: an
    independent table whose initial state is the source snapshot. Data
    and deletion-vector files are HARDLINKED into the destination
    (``os.link`` — zero bytes copied on one filesystem; cross-device
    falls back to a copy), which is safe because committed files are
    immutable by construction: every writer stages NEW uuid-named
    parts, so neither table can ever see the other's mutations, and a
    VACUUM on one side merely unlinks its own name while the inode
    lives on for the other. On S3 the same protocol is a server-side
    copy — the manifest-level mechanics are identical.

    Everything the snapshot's logical view depends on is carried: the
    live file list, zone maps, per-file bloom filters (not rebuilt —
    linked files keep their indexes), the merged physical schema, the
    deletion-vector state (as a reset entry), CHECK constraints,
    generated columns, bloom index columns, and the column-mapping
    state (net renames and drops re-emitted as metadata commits). The
    clone's HISTORY starts fresh at version 1 — time travel inside the
    clone reaches only post-clone states, exactly Delta's CLONE
    contract — and the source's vacuum horizon does not carry (every
    linked file is live at the cloned snapshot).

    Cost at 100 TB: O(#files) driver-side metadata + link calls, zero
    data I/O, no Spark job. Returns the clone's head version.

    Reference parity: the reference snapshots tables by re-writing
    parquet per ingestion date (load_to_s3.py:16-27); CLONE is the
    table-format-native upgrade of that snapshot step."""
    if timestamp_ms is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp_ms, not both")
        version = version_as_of(src_path, timestamp_ms)
    all_commits = _commits(src_path)
    if not all_commits:
        raise ValueError(f"no commits at {src_path}")
    if version is not None and version < _vacuum_cutoff(all_commits):
        raise ValueError(
            f"version {version} is below the vacuum retention horizon "
            f"({_vacuum_cutoff(all_commits)}) at {src_path} — its files "
            "may be reclaimed"
        )
    commits = [
        c for c in all_commits if version is None or c["version"] <= version
    ]
    if not commits:
        raise ValueError(
            f"version {version} predates the first commit at {src_path}"
        )
    if _commits(dst_path):
        raise ValueError(
            f"clone destination {dst_path} already has a transaction log"
        )
    if os.path.isdir(dst_path) and _data_files(dst_path):
        raise ValueError(
            f"clone destination {dst_path} already contains data files"
        )
    files = _files_from(commits)
    fset = set(files)
    dv_state = {
        f: list(dvs) for f, dvs in _dv_from(commits).items() if f in fset and dvs
    }
    dv_files = sorted({d for dvs in dv_state.values() for d in dvs})
    os.makedirs(dst_path, exist_ok=True)
    for rel in [*files, *dv_files]:
        dst_f = os.path.join(dst_path, rel)
        os.makedirs(os.path.dirname(dst_f), exist_ok=True)
        try:
            os.link(os.path.join(src_path, rel), dst_f)
        except OSError:  # cross-device or FS without hardlinks
            shutil.copy2(os.path.join(src_path, rel), dst_f)
    struct = _schema_from(commits)
    stats = {f: s for f, s in _stats_from(commits).items() if f in fset}
    blooms = {f: b for f, b in _bloom_from(commits).items() if f in fset}
    if not _try_commit(
        dst_path,
        1,
        files,
        0,
        stats=stats or None,
        schema=json.dumps(struct.jsonValue()) if struct is not None else None,
        dv={"reset": dv_state} if dv_state else None,
        bloom_index=blooms or None,
        bloom_cols=_bloom_cols_from(commits) or None,
        constraints_add=_constraints_from(commits) or None,
        generated_add=_generated_from(commits) or None,
        op="CLONE",
        commits=[],
    ):
        raise RuntimeError(
            f"clone destination {dst_path} committed concurrently"
        )
    v = 1
    # Column-mapping state: the NET rename per mapped column plus the
    # original drop entries, as metadata-only commits after the base —
    # replaying them in the clone reproduces the source's logical view
    # and its retired-name guards exactly. Replayed renames CHAIN
    # through each other (_colmap_from pops the prior entry), so a
    # rename cycle (a→t, b→a, t→b nets to {a: b, b: a}) replayed as
    # direct physical→logical renames would collapse to the identity;
    # route every net rename through a unique temporary name instead:
    # phase 1 parks each physical under a temp, phase 2 lands the
    # logical, and no replayed commit's source can collide with
    # another's target.
    net = sorted(
        (l, p) for l, p in _colmap_from(commits).items() if l != p
    )
    replay: list[dict] = []
    for i, (_, physical) in enumerate(net):
        replay.append({"from": physical, "to": f"__clone_tmp_{i}__"})
    for i, (logical, _) in enumerate(net):
        replay.append({"from": f"__clone_tmp_{i}__", "to": logical})
    for r in replay:
        v += 1
        if not _try_commit(
            dst_path,
            v,
            [],
            0,
            rename=r,
            op="CLONE",
            commits=[],
        ):
            raise RuntimeError(
                f"clone destination {dst_path} committed concurrently"
            )
    for c in commits:
        d = c.get("drop_col")
        if d:
            v += 1
            if not _try_commit(
                dst_path, v, [], 0, drop_col=dict(d), op="CLONE", commits=[]
            ):
                raise RuntimeError(
                    f"clone destination {dst_path} committed concurrently"
                )
    return v


def last_txn_version(target_path: str, app_id: str) -> int | None:
    """The highest transaction version committed for ``app_id`` —
    Delta's ``txnAppId``/``txnVersion`` idempotent-writer ledger,
    replayed from the commit manifests (O(#commits) driver metadata).
    None when the app has never committed."""
    best: int | None = None
    for c in _commits(target_path):
        t = c.get("txn")
        if t and t.get("app") == app_id:
            best = t["version"] if best is None else max(best, t["version"])
    return best


def append_txn(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    app_id: str,
    txn_ver: int,
    partition_cols: Sequence[str] | None = None,
    max_retries: int = 20,
    _pre_commit_hook: Callable[[], None] | None = None,
) -> int:
    """Idempotent transactional blind append — Delta's
    ``option("txnAppId", app).option("txnVersion", v)`` contract: the
    batch lands AT MOST ONCE per (app_id, txn_ver). A replay (same or
    older txn_ver) is a no-op returning 0; the caller (typically a
    foreachBatch streaming sink replaying after a checkpoint recovery)
    gets exactly-once table contents without any key-based dedup.

    The already-committed check runs INSIDE the CAS retry loop against
    a fresh log snapshot, so two racing instances of the same app
    cannot both land the same transaction: the loser's CAS fails, it
    re-reads the log, sees the winner's txn marker, and skips. Blind
    append = no target read at all — O(batch) regardless of table
    size, the cheapest possible write path at 100 TB.
    """
    for _ in range(max_retries):
        commits = _commits(target_path)
        version = commits[-1]["version"] if commits else 0
        seen = last_txn_version(target_path, app_id)
        if seen is not None and seen >= txn_ver:
            return 0  # this transaction (or a later one) already landed
        batch = _apply_generated(batch, commits, target_path)
        declared = _schema_from(commits)
        _check_type_conflicts(batch, declared, commits, target_path)
        _enforce_constraints(batch, commits, target_path)
        staged = _stage_files(batch, target_path, partition_cols, commits=commits)
        n = _staged_row_count(target_path, staged)
        if _pre_commit_hook is not None:
            _pre_commit_hook()
        if _try_commit(
            target_path,
            version + 1,
            staged,
            n,
            stats=_collect_stats(target_path, staged),
            schema=json.dumps(batch.schema.jsonValue()),
            txn={"app": app_id, "version": txn_ver},
            op="STREAMING UPDATE",
            commits=commits,
        ):
            return n
        for rel in staged:  # lost the CAS — another writer took version+1
            try:
                os.remove(os.path.join(target_path, rel))
            except FileNotFoundError:
                pass
    raise RuntimeError(
        f"append_txn lost the commit race {max_retries} times at {target_path}"
    )


def merge_append(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    keys: Sequence[str],
    target_partition_filter: Column | None = None,
    partition_cols: Sequence[str] | None = None,
    max_retries: int = 20,
    _pre_commit_hook: Callable[[], None] | None = None,
) -> int:
    """K3/K4: idempotent merge-append — insert batch rows whose ``keys``
    are absent from the target; returns inserted-row count (the
    reference returns it for logging, loading.py:119).

    Batch is pre-deduplicated on the keys (the reference's intra-batch
    cache, loading.py:274). Idempotent: re-running the same batch
    inserts 0 rows. ATOMIC under concurrent writers via the _txlog
    optimistic commit (module docstring): stage insert files → CAS the
    next log version → on collision delete staged files, refresh the
    snapshot, recompute the anti-join, retry. The anti-join snapshot is
    the COMMITTED view (manifest-listed files only), so a concurrent
    writer's staged-but-uncommitted rows never suppress an insert — if
    that writer dies before its CAS, its keys are still insertable. A
    target with data files but no txlog (legacy plain-parquet table) is
    snapshotted via a plain read and adopted into the log by this
    commit.

    ``_pre_commit_hook`` is fault-injection for tests (runs between
    stage and CAS, where a concurrent winner can sneak in).
    """
    batch = batch.dropDuplicates(list(keys))
    for _ in range(max_retries):
        # ONE log parse per attempt serves the version, the committed
        # file view, and the declared schema — the CAS on version+1
        # still catches any commit that lands after this snapshot (the
        # anti-join is then recomputed on retry, never under-informed).
        commits = _commits(target_path)
        version = commits[-1]["version"] if commits else 0
        batch = _apply_generated(batch, commits, target_path)
        # Write-side schema validation (Delta's stance): NEW columns are
        # additive evolution and commit fine; a column re-declared with
        # a different type fails the WRITER, not some later reader.
        # Re-checked per retry attempt — the schema may have evolved
        # under a concurrent winner.
        declared = _schema_from(commits)
        _check_type_conflicts(batch, declared, commits, target_path)
        committed = _files_from(commits)
        legacy: list[str] = []
        if not committed:
            legacy = _data_files(target_path)
        snapshot_files = committed or legacy
        legacy_schema = None
        if snapshot_files:
            # _read_snapshot (not _read_files): DV-masked rows are not
            # part of the table — their keys must not suppress inserts
            # — and the anti-join runs in logical column space. The
            # log-declared schema (when present) skips the per-call
            # parquet schema-inference job.
            existing = _read_snapshot(
                spark,
                target_path,
                commits,
                files=snapshot_files,
                schema=declared if (declared is not None and not legacy) else None,
                merge_schema=bool(legacy),
            )
            if legacy:
                # Adoption must record the FULL legacy schema, not just
                # the batch's — otherwise legacy-only columns become
                # permanently invisible to the log-schema reads, and
                # legacy/batch type conflicts dodge the writer check.
                legacy_schema = (
                    spark.read.option("mergeSchema", "true")
                    .parquet(*[os.path.join(target_path, f) for f in legacy])
                    .schema
                )
                _union_structs([legacy_schema, batch.schema])  # conflict → raise
            if target_partition_filter is not None:
                existing = existing.filter(target_partition_filter)
            new_rows = new_rows_anti(batch, existing, keys)
        else:
            new_rows = batch
        # CHECK constraints gate the rows actually WRITTEN (the
        # anti-join survivors), Delta's write-time invariant scope.
        _enforce_constraints(new_rows, commits, target_path)
        # ONE action: stage the insert set, then read the row count
        # from the staged parquet footers (pyarrow metadata — no second
        # plan execution, no cache). On object storage this is a
        # footer-ranged read per file, still far cheaper than
        # recomputing the anti-join for a count().
        staged = _stage_files(new_rows, target_path, partition_cols, commits=commits)
        n = _staged_row_count(target_path, staged)
        if n == 0:
            for rel in staged:  # writer may emit one empty part file
                try:
                    os.remove(os.path.join(target_path, rel))
                except FileNotFoundError:
                    pass
            return 0
        if _pre_commit_hook is not None:
            _pre_commit_hook()
        # Adopt legacy files into the log so later committed-view reads
        # and vacuums account for them.
        commit_schema = (
            _union_structs([legacy_schema, new_rows.schema])
            if legacy_schema is not None
            else new_rows.schema
        )
        if _try_commit(
            target_path,
            version + 1,
            legacy + staged,
            n,
            stats=_collect_stats(target_path, staged),
            schema=json.dumps(commit_schema.jsonValue()),
            op="MERGE APPEND",
            commits=commits,
        ):
            return n
        # Lost the race: another writer committed this version. Remove
        # our staged files (they may now contain duplicate keys) and
        # recompute against the winner's rows.
        for rel in staged:
            try:
                os.remove(os.path.join(target_path, rel))
            except FileNotFoundError:
                pass
    raise RuntimeError(
        f"merge_append lost the commit race {max_retries} times at {target_path}"
    )


def _stage_aux_files(
    df: DataFrame,
    target_path: str,
    subdir: str,
    prefix: str,
    commits: list[dict] | None = None,
    translate: bool = False,
) -> list[str]:
    """Shared stage-then-atomic-rename for auxiliary file families
    (change data, deletion vectors): write to a dot-hidden staging dir,
    move each part into ``subdir`` under a unique name, return the
    table-relative paths. ``translate=True`` applies the
    logical→physical column translation at this disk boundary."""
    if translate:
        df = _to_physical(
            df, _commits(target_path) if commits is None else commits
        )
    # Same output-file sizing as _stage_files: CDC/DV families are read
    # back by feeds and snapshot reads — one near-empty part per
    # upstream task inflates every later open.
    df = df.hint("rebalance")
    dest = os.path.join(target_path, subdir)
    os.makedirs(dest, exist_ok=True)
    stage = os.path.join(target_path, f".stage-{prefix}-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    staged: list[str] = []
    for fn in os.listdir(stage):
        if not fn.endswith(".parquet") or fn.startswith(("_", ".")):
            continue
        unique = f"{prefix}-{uuid.uuid4().hex}.parquet"
        os.replace(os.path.join(stage, fn), os.path.join(dest, unique))
        staged.append(os.path.join(subdir, unique))
    shutil.rmtree(stage, ignore_errors=True)
    return staged


def _stage_cdc_files(
    cdc: DataFrame, target_path: str, commits: list[dict] | None = None
) -> list[str]:
    """Write the typed change rows to ``_change_data/`` (underscore
    prefix: invisible to plain parquet readers and the data-file walk),
    for the manifest's ``cdc`` entry — physical column names on disk
    (``table_changes`` translates back on read)."""
    return _stage_aux_files(
        cdc, target_path, _CDC_DIR, "cdc", commits=commits, translate=True
    )


def _stage_cdc_files_counted(
    cdc: DataFrame, target_path: str, commits: list[dict] | None = None
) -> tuple[list[str], tuple[int, int, int]]:
    """:func:`_stage_cdc_files` plus the (inserted, updated, deleted)
    change-type counts of what was staged — ONE vectorized
    dictionary-column read per staged file, bounded by changed rows
    per commit (never table size).

    Measured and REJECTED (r16): fusing the counts into the staging
    write with ``df.observe``/CollectMetrics. It works, and it removes
    this post-hoc pass — but PySpark's ``Observation`` initializes the
    session's lazy ``ObservationManager`` (Spark 4.1), which is NOT
    java-serializable, and from that point on ANY closure that captures
    the SparkSession fails with Task not serializable. MLlib does
    exactly that (a fitted model's training summary holds the session;
    scoring serializes it into the task closure), so one observed merge
    broke ``sentiment_scores`` for the rest of the session — a
    session-wide landmine, not a local trade-off. The named-observation
    form avoids the manager but leaves no handle to read the metrics
    of a writer's internal QueryExecution."""
    staged = _stage_cdc_files(cdc, target_path, commits=commits)
    return staged, _cdc_counts(target_path, staged)


def _stage_dv_files(kill: DataFrame, target_path: str) -> list[str]:
    """Write kill-list rows — ``(file string, row_index bigint)``, file
    table-relative — to ``_deletion_vectors/``."""
    return _stage_aux_files(kill, target_path, _DV_DIR, "dv")


def _cdc_counts(target_path: str, cdc_staged: list[str]) -> tuple[int, int, int]:
    """(inserted, updated, deleted) row counts from the staged change
    files — a single-column read of ``_change_type``, no Spark job.
    Vectorized (pyarrow value_counts over the dictionary column, r16)
    instead of a per-row Python loop."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    counts = {"insert": 0, "update_postimage": 0, "delete": 0}
    for rel in cdc_staged:
        t = pq.read_table(
            os.path.join(target_path, rel), columns=[_CHANGE_COL]
        )
        for entry in pc.value_counts(t.column(0)).to_pylist():
            if entry["values"] in counts:
                counts[entry["values"]] += entry["counts"]
    return counts["insert"], counts["update_postimage"], counts["delete"]


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    keys: Sequence[str],
    partition_cols: Sequence[str] | None = None,
    max_retries: int = 20,
    schema_evolution: bool = False,
    _pre_commit_hook: Callable[[], None] | None = None,
) -> tuple[int, int]:
    """K2 full MERGE: ``WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    THEN INSERT *`` on the parquet txlog — a batch row whose ``keys``
    exist in the target REWRITES that row; absent keys insert. Returns
    (inserted, updated). The reference's Databricks leg is exactly this
    shape (trigger_databricks_job.py:10 "load data from s3 into delta
    lake" = Delta MERGE upsert); :func:`merge_append` keeps the
    insert-if-absent contract of the Postgres workers.

    File-level copy-on-write, Delta's strategy: one key-only semi-join
    identifies the data files that contain matched keys; ONLY those
    files are rewritten (unmatched rows carried over, matched rows
    replaced by batch values), and the commit atomically records
    remove=<touched files> + add=<rewritten + insert files>. At 100 TB
    an upsert touching 50 files rewrites 50 files — O(matched data),
    never a table rewrite — and the touched-file discovery can prune
    further via zone maps before the join.

    TYPED CDC: the commit also writes ``_change_data`` parquet files
    holding the change rows — ``update_preimage`` (old values),
    ``update_postimage`` (new values), ``insert`` — which
    :func:`table_changes` and the streaming source replay; carried-over
    rows are NOT changes and never appear in the feed (the reason add
    files alone can't serve an upsert commit's feed).

    Concurrency: same optimistic CAS protocol as merge_append — stage
    data + change files, CAS the next version; on collision delete both
    staged sets, refresh the snapshot, recompute (so an update-update
    race serializes: the loser re-reads the winner's rows and rewrites
    them, last writer wins per key). Schema evolution is OPT-IN, the
    Delta MERGE contract: by default a batch column absent from the
    declared schema fails the writer; ``schema_evolution=True``
    (Delta's ``withSchemaEvolution``) unions new columns additively —
    carried-over and pre-evolution rows null-fill. A re-typed column
    fails the writer either way. A legacy plain-parquet
    table is adopted: untouched legacy files enter the log, matched
    legacy files are rewritten and simply not adopted (vacuum reclaims
    them)."""
    inserted, updated, _ = _merge_rows(
        spark,
        target_path,
        batch,
        keys,
        partition_cols=partition_cols,
        max_retries=max_retries,
        _pre_commit_hook=_pre_commit_hook,
        schema_evolution=schema_evolution,
    )
    return inserted, updated


def merge_sync(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    keys: Sequence[str],
    delete_condition: Column | None = None,
    partition_cols: Sequence[str] | None = None,
    max_retries: int = 20,
    schema_evolution: bool = False,
    _pre_commit_hook: Callable[[], None] | None = None,
) -> tuple[int, int, int]:
    """The FULL three-clause MERGE — Delta's

        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE [AND condition] THEN DELETE

    — i.e. "make the target match this snapshot": target rows whose
    ``keys`` are absent from the batch (and satisfy
    ``delete_condition``, default all of them) are DELETED; the rest
    upsert as in :func:`merge_upsert`. Returns (inserted, updated,
    deleted). The classic consumer is dimension-table sync from a
    source-system snapshot: rows the source dropped must disappear.

    ``delete_condition`` scopes the deletion (Delta's ``AND`` clause):
    pass e.g. ``F.col("region") == "eu"`` when the batch is a PARTIAL
    snapshot covering only that slice — without it a partial batch
    would delete everything outside its slice.

    Scale: the not-matched-by-source scan is inherently O(target) in
    discovery (every file may own stale rows — same as Delta), but only
    files that actually contain a matched or stale row are rewritten,
    and the per-file rewrite carries survivors via the same
    copy-on-write path as the upsert. TYPED CDC: stale rows land in the
    change feed as ``delete`` rows next to the upsert's
    insert/pre/post images — one commit, one atomic version."""
    return _merge_rows(
        spark,
        target_path,
        batch,
        keys,
        partition_cols=partition_cols,
        max_retries=max_retries,
        _pre_commit_hook=_pre_commit_hook,
        nmbs_delete=delete_condition
        if delete_condition is not None
        else F.lit(True),
        schema_evolution=schema_evolution,
    )


def merge_upsert_txn(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    keys: Sequence[str],
    app_id: str,
    txn_ver: int,
    partition_cols: Sequence[str] | None = None,
    max_retries: int = 20,
    schema_evolution: bool = False,
    _pre_commit_hook: Callable[[], None] | None = None,
) -> tuple[int, int]:
    """Idempotent transactional MERGE upsert — :func:`append_txn`'s
    at-most-once contract on the :func:`merge_upsert` write path: the
    batch upserts AT MOST ONCE per (app_id, txn_ver); a replay (same or
    older txn_ver) is a no-op returning (0, 0). This is the
    foreachBatch streaming-upsert sink's primitive (Delta's canonical
    ``foreachBatch { microBatch.merge(...) } + txnVersion``): a
    micro-batch replayed after checkpoint recovery must not double-
    apply, and with upserts key-level idempotence alone is NOT enough —
    a replayed batch would re-update rows a LATER batch already
    rewrote, resurrecting stale values; the txn ledger makes the replay
    structurally a no-op. The marker check runs inside the CAS retry
    loop against a fresh snapshot, so two racing instances of the same
    app cannot both land one transaction."""
    inserted, updated, _ = _merge_rows(
        spark,
        target_path,
        batch,
        keys,
        partition_cols=partition_cols,
        max_retries=max_retries,
        _pre_commit_hook=_pre_commit_hook,
        txn={"app": app_id, "version": txn_ver},
        schema_evolution=schema_evolution,
    )
    return inserted, updated


def merge_cdc_txn(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    keys: Sequence[str],
    app_id: str,
    txn_ver: int,
    change_col: str = "_change_type",
    partition_cols: Sequence[str] | None = None,
    max_retries: int = 20,
    schema_evolution: bool = False,
    _pre_commit_hook: Callable[[], None] | None = None,
    pin_batch: bool = True,
) -> tuple[int, int, int]:
    """Apply a CHANGE-DATA batch to a table, exactly once — the CDC
    consumer's merge (Delta's documented foreachBatch pattern for
    readChangeFeed):

        WHEN MATCHED AND src.{change} = 'delete' THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED AND src.{change} <> 'delete' THEN INSERT *

    Rows tagged ``delete`` in ``change_col`` delete their target keys
    (a delete for an absent key is a no-op — it may have never
    replicated); every other row upserts. The change column itself is
    not written. Returns (inserted, updated, deleted); idempotent per
    (app_id, txn_ver) like :func:`merge_upsert_txn` — the caller must
    reduce the batch to ONE change per key first (newest wins).

    ``pin_batch`` defaults on here (unlike the generic engine): a CDC
    batch usually arrives through the change-feed streaming source,
    whose reads run in Python workers — see the engine's note."""
    return _merge_rows(
        spark,
        target_path,
        batch,
        keys,
        partition_cols=partition_cols,
        max_retries=max_retries,
        _pre_commit_hook=_pre_commit_hook,
        matched_delete=F.col(change_col) == "delete",
        drop_from_data=[change_col],
        txn={"app": app_id, "version": txn_ver},
        schema_evolution=schema_evolution,
        pin_batch=pin_batch,
    )


def _merge_rows(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    keys: Sequence[str],
    partition_cols: Sequence[str] | None = None,
    max_retries: int = 20,
    _pre_commit_hook: Callable[[], None] | None = None,
    nmbs_delete: Column | None = None,
    matched_delete: Column | None = None,
    drop_from_data: Sequence[str] | None = None,
    txn: dict | None = None,
    schema_evolution: bool = False,
    pin_batch: bool = False,
) -> tuple[int, int, int]:
    """Shared MERGE engine behind :func:`merge_upsert` /
    :func:`merge_sync` / :func:`merge_upsert_txn` /
    :func:`merge_cdc_txn`: copy-on-write file-level rewrite with typed
    CDC and optimistic CAS commits. ``nmbs_delete`` adds the WHEN NOT
    MATCHED BY SOURCE THEN DELETE clause; ``matched_delete`` marks
    batch rows that are DELETE DIRECTIVES (WHEN MATCHED AND cond THEN
    DELETE — the CDC-apply shape): their keys delete matching target
    rows instead of upserting, and a directive with no match is a
    no-op; ``drop_from_data`` removes directive/metadata columns from
    the written rows; ``txn`` adds the (app, version) at-most-once
    marker.

    ``pin_batch`` materializes the incoming batch to JVM-local blocks
    (localCheckpoint) ONCE, before the engine's several actions over
    it (touched-file discovery, insert/update split, data + CDC
    staging). Without it each action re-executes the batch's plan —
    harmless for a parquet-backed batch, but a batch backed by a
    Python data source (the CDC change feed) then pays ~6 rounds of
    Python-worker forks per merge, whose cost scales with process RSS:
    the late-session inflation the round-15 micro-batch trace
    decomposed (docs/BENCH_METHOD.md). The pin happens AFTER the
    txn-ledger short-circuit so a replayed epoch still executes the
    batch zero times."""
    if pin_batch:
        # At-most-once fast path, hoisted ahead of the pin (the
        # in-loop check below still guards CAS retries): a replayed
        # (app, version) must cost O(#commits) ledger metadata, never
        # a batch materialization. Scoped to pin_batch — without the
        # pin there is nothing to execute before the in-loop check, so
        # the common batch-merge path keeps its two log parses
        # (review r15: don't add a third on the hot path).
        if txn is not None:
            seen = last_txn_version(target_path, txn["app"])
            if seen is not None and seen >= txn["version"]:
                return 0, 0, 0
        # Dedupe INSIDE the pin: the key-dedup shuffle folds into the
        # one materialization instead of re-running on top of the
        # pinned blocks in every downstream action (discovery, marker
        # joins, both staging writes — optimization r16, guide §2.4),
        # and the pinned representative-per-key pick is made exactly
        # once rather than per-action.
        batch = batch.dropDuplicates(list(keys)).localCheckpoint(eager=True)
    else:
        batch = batch.dropDuplicates(list(keys))
    key_cols = list(keys)
    nmbs_true = (
        F.coalesce(nmbs_delete, F.lit(False)) if nmbs_delete is not None else None
    )
    if matched_delete is not None:
        md_true = F.coalesce(matched_delete, F.lit(False))
        delete_keys = batch.filter(md_true).select(*key_cols)
        batch = batch.filter(~md_true)
    else:
        delete_keys = None
    if drop_from_data:
        batch = batch.drop(*[c for c in drop_from_data if c in batch.columns])
    for _ in range(max_retries):
        commits = _commits(target_path)
        version = commits[-1]["version"] if commits else 0
        if txn is not None:
            seen = last_txn_version(target_path, txn["app"])
            if seen is not None and seen >= txn["version"]:
                return 0, 0, 0  # this transaction (or a later one) landed
        batch = _apply_generated(batch, commits, target_path)
        declared = _schema_from(commits)
        _check_type_conflicts(batch, declared, commits, target_path)
        if not schema_evolution and declared is not None:
            # Delta's MERGE default: WITHOUT withSchemaEvolution a
            # source column absent from the target schema fails the
            # writer (UPDATE SET * / INSERT * cannot bind it); pass
            # schema_evolution=True to union new columns additively
            # (the append path's behavior, and Delta's opt-in).
            new_cols = [
                f.name
                for f in _to_physical(batch, commits).schema.fields
                if f.name not in {x.name for x in declared.fields}
            ]
            if new_cols:
                raise ValueError(
                    f"MERGE batch has columns {new_cols} not in the "
                    f"declared schema at {target_path}; pass "
                    "schema_evolution=True to evolve additively "
                    "(Delta's withSchemaEvolution)"
                )
        # Every batch row is written (as insert or update post-image) —
        # the whole batch is in CHECK-constraint scope.
        _enforce_constraints(batch, commits, target_path)
        committed = _files_from(commits)
        legacy: list[str] = []
        if not committed:
            legacy = _data_files(target_path)
        snapshot_files = committed or legacy
        if snapshot_files:
            if legacy:
                _union_structs(
                    [
                        spark.read.option("mergeSchema", "true")
                        .parquet(
                            *[os.path.join(target_path, f) for f in legacy]
                        )
                        .schema,
                        batch.schema,
                    ]
                )  # legacy/batch type conflict → raise before any write
            # _read_snapshot: rows masked by deletion vectors are not
            # part of the table — their keys INSERT (not update), and
            # they never carry over into rewritten files. keep_lineage
            # gives per-row file identity for touched-file discovery.
            existing = _read_snapshot(
                spark,
                target_path,
                commits,
                files=snapshot_files,
                schema=declared if (declared is not None and not legacy) else None,
                merge_schema=bool(legacy),
                keep_lineage=True,
            )
            # Touched-file discovery: distinct files owning matched keys.
            # Driver-side list bounded by #files, computed from a
            # key-column semi-join (the scan reads key columns only).
            batch_keys = batch.select(*key_cols)
            all_keys = (
                batch_keys
                if delete_keys is None
                else batch_keys.unionByName(delete_keys)
            )
            owners = existing.join(
                all_keys, on=key_cols, how="left_semi"
            ).select(_FP_COL)
            if nmbs_true is not None:
                # WHEN NOT MATCHED BY SOURCE: files owning stale rows
                # (absent from the batch, condition true) are touched
                # too — their survivors carry over, stale rows drop.
                owners = owners.unionByName(
                    existing.join(batch_keys, key_cols, "left_anti")
                    .filter(nmbs_true)
                    .select(_FP_COL)
                )
            root = os.path.abspath(target_path)
            matched_files = _matched_rel_files(owners, root, "MERGE")
            # ONE marker left-join replaces the former anti/semi pair:
            # inserts ∪ updates is EXACTLY the deduped batch (the two
            # joins partitioned it by key-match), so the DATA write
            # needs no join on the batch side at all, and the CDC
            # write derives each batch row's change type from a single
            # distinct-key left join (optimization r15, guide
            # §2.3/§2.4: fewer passes, fewer shuffled bytes).
            if matched_files:
                touched = _read_snapshot(
                    spark,
                    target_path,
                    commits,
                    files=matched_files,
                    schema=declared
                    if (declared is not None and not legacy)
                    else None,
                    merge_schema=bool(legacy),
                )
                # Partition the touched rows in ONE pass (left-join
                # markers) instead of one semi/anti join per branch:
                # in-batch → update_preimage; delete-directive or
                # stale (nmbs) → delete; the rest carry over. The
                # marker join's build side is the TOUCHED slice, never
                # a second full-snapshot pass: every snapshot row whose
                # key matches a batch key lives in a matched file (that
                # is what touched-file discovery computed), so
                # touched ∩ batch = snapshot ∩ batch (optimization r15
                # batch 3, guide §2.3).
                t2 = touched.join(
                    batch_keys.withColumn(_MARK_MB, F.lit(True)),
                    key_cols,
                    "left",
                )
                if delete_keys is not None:
                    t2 = t2.join(
                        delete_keys.withColumn(_MARK_MD, F.lit(True)),
                        key_cols,
                        "left",
                    )
                else:
                    t2 = t2.withColumn(_MARK_MD, F.lit(None).cast("boolean"))
                # Materialize the marked touched slice ONCE (lazy
                # localCheckpoint — the first staging action computes
                # it, the second reads the blocks): the data and CDC
                # staging writes both branch from it, and without the
                # checkpoint each write re-ran the touched parquet
                # scan and the marker joins — 2× O(touched) work per
                # commit (optimization r16, guide §2.4/§5: don't
                # recompute a shared subtree across actions; the
                # blocks are O(touched files), the same bound as the
                # rewrite itself). Measured r16 (min-of-N phase
                # benches): −0.5 s on the ~30k-row index merges,
                # ~+0.1-0.3 s on few-KB stream micro-batch merges
                # (block-lock serialization of the overlapped writes);
                # suite-level net positive, and the duplicated touched
                # scan is exactly what must not happen at 100 TB.
                t2 = t2.localCheckpoint(eager=False)
                in_batch = F.col(_MARK_MB).isNotNull()
                is_del = F.col(_MARK_MD).isNotNull()
                if nmbs_true is not None:
                    is_del = is_del | nmbs_true
                preimage = t2.filter(in_batch).drop(_MARK_MB, _MARK_MD)
                carried = t2.filter(~in_batch & ~is_del).drop(_MARK_MB, _MARK_MD)
                if nmbs_true is not None or delete_keys is not None:
                    dels = t2.filter(~in_batch & is_del).drop(_MARK_MB, _MARK_MD)
                else:
                    dels = None
                # The batch-side change types need exactly the matched
                # KEY SET, which the checkpointed slice already carries
                # (_MARK_MB rows) — derive it there instead of
                # re-scanning the touched files a third time.
                key_marks = (
                    t2.filter(in_batch)
                    .select(*key_cols)
                    .dropDuplicates(key_cols)
                    .withColumn(_MARK_M, F.lit(True))
                )
                cdc_batch = (
                    batch.join(key_marks, key_cols, "left")
                    .withColumn(
                        _CHANGE_COL,
                        F.when(
                            F.col(_MARK_M).isNull(), F.lit("insert")
                        ).otherwise(F.lit("update_postimage")),
                    )
                    .drop(_MARK_M)
                )
            else:
                # No file owns a batch key ⇒ nothing in the snapshot
                # matches: every batch row is an insert, no join needed.
                cdc_batch = batch.withColumn(_CHANGE_COL, F.lit("insert"))
                preimage = carried = dels = None
        else:
            matched_files = []
            cdc_batch = batch.withColumn(_CHANGE_COL, F.lit("insert"))
            preimage = carried = dels = None

        new_data = batch
        if carried is not None:
            new_data = new_data.unionByName(carried, allowMissingColumns=True)
        cdc = cdc_batch
        if preimage is not None:
            cdc = cdc.unionByName(
                preimage.withColumn(_CHANGE_COL, F.lit("update_preimage")),
                allowMissingColumns=True,
            )
        if dels is not None:
            cdc = cdc.unionByName(
                dels.withColumn(_CHANGE_COL, F.lit("delete")),
                allowMissingColumns=True,
            )

        # The data and CDC staging writes are INDEPENDENT Spark
        # actions — submit them concurrently so the merge pays
        # max(data, cdc) wall time instead of the sum (guide §2.6:
        # overlap independent jobs; the second job's tasks back-fill
        # the first's straggler tail).
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_data = pool.submit(
                _stage_files, new_data, target_path, partition_cols, commits
            )
            f_cdc = pool.submit(
                _stage_cdc_files_counted, cdc, target_path, commits
            )
            staged = f_data.result()
            cdc_staged, (inserted, updated, deleted) = f_cdc.result()
        if nmbs_true is not None or delete_keys is not None:
            # A sync that empties whole files can stage 0-row parts —
            # drop them rather than committing empty files.
            import pyarrow.parquet as pq

            live: list[str] = []
            for rel in staged:
                if pq.ParquetFile(
                    os.path.join(target_path, rel)
                ).metadata.num_rows:
                    live.append(rel)
                else:
                    os.remove(os.path.join(target_path, rel))
            staged = live

        def _cleanup():
            for rel in staged + cdc_staged:
                try:
                    os.remove(os.path.join(target_path, rel))
                except FileNotFoundError:
                    pass

        if inserted == 0 and updated == 0 and deleted == 0:
            _cleanup()
            return 0, 0, 0
        if _pre_commit_hook is not None:
            _pre_commit_hook()
        untouched_legacy = [f for f in legacy if f not in set(matched_files)]
        if _try_commit(
            target_path,
            version + 1,
            untouched_legacy + staged,
            inserted + updated,
            # Legacy matched files were never in the log: rewriting them
            # means just not adopting them (vacuum reclaims the bytes).
            remove=[f for f in matched_files if f not in set(legacy)],
            stats=_collect_stats(target_path, staged),
            schema=json.dumps(new_data.schema.jsonValue()),
            cdc=cdc_staged,
            txn=txn,
            op="MERGE",
            commits=commits,
        ):
            return inserted, updated, deleted
        _cleanup()
    raise RuntimeError(
        f"merge lost the commit race {max_retries} times at {target_path}"
    )


def delete_where(
    spark: SparkSession,
    target_path: str,
    condition: Column,
    partition_cols: Sequence[str] | None = None,
    max_retries: int = 20,
    _pre_commit_hook: Callable[[], None] | None = None,
) -> int:
    """Delta ``DELETE FROM target WHERE condition`` on the parquet
    txlog — the third leg of the MERGE contract (insert:
    :func:`merge_append`, update: :func:`merge_upsert`). Returns the
    number of rows deleted.

    File-level copy-on-write: only the files that CONTAIN matching rows
    are rewritten (their surviving rows carried over); the commit
    atomically records remove=<touched files> + add=<rewritten files>,
    so O(matched data) at 100 TB, never a table rewrite — and a
    predicate on a zone-mapped column touches only the files whose
    stats admit it. TYPED CDC: the commit writes ``_change_data``
    files tagging every removed row ``delete``, which
    :func:`table_changes` and the streaming source replay (Delta CDF's
    delete rows). Concurrency: same optimistic CAS as the merges —
    stage, CAS, on collision delete staged sets and recompute against
    the winner's snapshot."""
    import pyarrow.parquet as pq

    for _ in range(max_retries):
        commits = _commits(target_path)
        version = commits[-1]["version"] if commits else 0
        declared = _schema_from(commits)
        committed = _files_from(commits)
        if not committed:
            return 0  # empty table (legacy tables: adopt via a merge first)
        # _read_snapshot + lineage: DV-masked rows can't re-match (they
        # are already deleted), and file discovery keys on the scan's
        # own metadata rather than input_file_name().
        existing = _read_snapshot(
            spark,
            target_path,
            commits,
            files=committed,
            schema=declared,
            keep_lineage=True,
        )
        root = os.path.abspath(target_path)
        matched_files = _matched_rel_files(
            existing.filter(condition).select(_FP_COL), root, "DELETE"
        )
        if not matched_files:
            return 0
        # Materialize the touched slice once — both pooled staging
        # actions branch from it (same r16 rationale as the merge
        # engine's t2: don't re-run the touched scan per action).
        touched = _read_snapshot(
            spark, target_path, commits, files=matched_files, schema=declared
        ).localCheckpoint(eager=False)
        carried = touched.filter(~condition)
        deleted = touched.filter(condition)

        # Data and CDC staging are independent actions — overlap them
        # (guide §2.6), same as the merge engine.
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_data = pool.submit(
                _stage_files, carried, target_path, partition_cols, commits
            )
            f_cdc = pool.submit(
                _stage_cdc_files_counted,
                deleted.withColumn(_CHANGE_COL, F.lit("delete")),
                target_path,
                commits,
            )
            staged = f_data.result()
            cdc_staged, (_, _, n_deleted) = f_cdc.result()
        # The carried set can be empty (whole files deleted): drop the
        # writer's empty part rather than committing a 0-row file.
        live_staged = []
        for rel in staged:
            if pq.ParquetFile(os.path.join(target_path, rel)).metadata.num_rows:
                live_staged.append(rel)
            else:
                os.remove(os.path.join(target_path, rel))

        def _cleanup():
            for rel in live_staged + cdc_staged:
                try:
                    os.remove(os.path.join(target_path, rel))
                except FileNotFoundError:
                    pass

        if n_deleted == 0:
            _cleanup()
            return 0
        if _pre_commit_hook is not None:
            _pre_commit_hook()
        if _try_commit(
            target_path,
            version + 1,
            live_staged,
            0,
            remove=matched_files,
            stats=_collect_stats(target_path, live_staged),
            schema=json.dumps(touched.schema.jsonValue())
            if declared is None
            else None,
            cdc=cdc_staged,
            op="DELETE",
            commits=commits,
        ):
            return n_deleted
        _cleanup()
    raise RuntimeError(
        f"delete_where lost the commit race {max_retries} times at {target_path}"
    )


def overwrite_where(
    spark: SparkSession,
    target_path: str,
    batch: DataFrame,
    condition: Column,
    partition_cols: Sequence[str] | None = None,
    max_retries: int = 20,
    _pre_commit_hook: Callable[[], None] | None = None,
) -> tuple[int, int]:
    """Delta's ``replaceWhere`` — predicate-scoped atomic overwrite:
    ONE commit deletes every target row matching ``condition`` and
    inserts the batch in its place. Returns (inserted, deleted). The
    canonical consumer is idempotent partition/date reprocessing:
    "recompute day X and swap it in" — re-running the job lands the
    same final state, and readers never observe the day half-swapped
    (the all-or-nothing guarantee a delete-then-append pair cannot
    give: a reader between the two commits would see the day missing).

    Delta's guard, enforced here too: every batch row must satisfy
    ``condition`` (else the "replace" would silently leak rows outside
    the replaced region — raises before any write). TYPED CDC: the
    commit stages ``delete`` rows for the replaced region and
    ``insert`` rows for the batch, so the feed replays the swap
    exactly.

    Scale: file-level copy-on-write — only files CONTAINING matching
    rows are rewritten (survivors carried over), the batch appends as
    new files; a predicate on a zone-mapped or partition column
    touches O(replaced data), never the table. Concurrency: optimistic
    CAS like every writer."""
    import pyarrow.parquet as pq

    n_bad = batch.filter(
        ~F.coalesce(condition, F.lit(False))
    ).count()
    if n_bad:
        raise ValueError(
            f"replaceWhere violation: {n_bad} batch row(s) do not satisfy "
            "the overwrite condition — the batch must stay inside the "
            "region it replaces"
        )
    for _ in range(max_retries):
        commits = _commits(target_path)
        version = commits[-1]["version"] if commits else 0
        batch = _apply_generated(batch, commits, target_path)
        declared = _schema_from(commits)
        _check_type_conflicts(batch, declared, commits, target_path)
        _enforce_constraints(batch, commits, target_path)
        committed = _files_from(commits)
        matched_files: list[str] = []
        carried = dels = None
        if committed:
            existing = _read_snapshot(
                spark,
                target_path,
                commits,
                files=committed,
                schema=declared,
                keep_lineage=True,
            )
            root = os.path.abspath(target_path)
            matched_files = _matched_rel_files(
                existing.filter(condition).select(_FP_COL),
                root,
                "overwrite_where",
            )
            if matched_files:
                # Shared by the data + CDC staging actions (r16).
                touched = _read_snapshot(
                    spark, target_path, commits, files=matched_files,
                    schema=declared,
                ).localCheckpoint(eager=False)
                cond_true = F.coalesce(condition, F.lit(False))
                carried = touched.filter(~cond_true)
                dels = touched.filter(cond_true)
        new_data = batch
        if carried is not None:
            new_data = new_data.unionByName(carried, allowMissingColumns=True)
        cdc = batch.withColumn(_CHANGE_COL, F.lit("insert"))
        if dels is not None:
            cdc = cdc.unionByName(
                dels.withColumn(_CHANGE_COL, F.lit("delete")),
                allowMissingColumns=True,
            )
        with ThreadPoolExecutor(max_workers=2) as pool:  # guide §2.6
            f_data = pool.submit(
                _stage_files, new_data, target_path, partition_cols, commits
            )
            f_cdc = pool.submit(
                _stage_cdc_files_counted, cdc, target_path, commits
            )
            staged = f_data.result()
            cdc_staged, (inserted, _, deleted) = f_cdc.result()
        live_staged: list[str] = []
        for rel in staged:
            if pq.ParquetFile(os.path.join(target_path, rel)).metadata.num_rows:
                live_staged.append(rel)
            else:
                os.remove(os.path.join(target_path, rel))

        def _cleanup():
            for rel in live_staged + cdc_staged:
                try:
                    os.remove(os.path.join(target_path, rel))
                except FileNotFoundError:
                    pass

        if inserted == 0 and deleted == 0:
            _cleanup()
            return 0, 0
        if _pre_commit_hook is not None:
            _pre_commit_hook()
        if _try_commit(
            target_path,
            version + 1,
            live_staged,
            inserted,
            remove=matched_files,
            stats=_collect_stats(target_path, live_staged),
            schema=json.dumps(new_data.schema.jsonValue()),
            cdc=cdc_staged,
            op="REPLACE WHERE",
            commits=commits,
        ):
            return inserted, deleted
        _cleanup()
    raise RuntimeError(
        f"overwrite_where lost the commit race {max_retries} times at {target_path}"
    )


def _updated_frame(
    changed: DataFrame,
    set_exprs: dict[str, Column],
    commits: list[dict],
    target_path: str,
) -> DataFrame:
    """Apply UPDATE SET expressions to the matched rows (expressions
    see the PRE-image values, standard UPDATE semantics), recompute
    any generated column not explicitly set (its sources may have
    changed), and validate constraints + generated definitions on the
    post-image."""
    updated = changed
    for name, expr in set_exprs.items():
        updated = updated.withColumn(name, expr)
    for gname, gexpr in _generated_from(commits).items():
        if gname not in set_exprs and gname in updated.columns:
            updated = updated.withColumn(gname, F.expr(gexpr))
    updated = _apply_generated(updated, commits, target_path)
    _enforce_constraints(updated, commits, target_path)
    return updated


def update_where(
    spark: SparkSession,
    target_path: str,
    set_exprs: dict[str, Column],
    condition: Column,
    partition_cols: Sequence[str] | None = None,
    max_retries: int = 20,
    _pre_commit_hook: Callable[[], None] | None = None,
) -> int:
    """Delta ``UPDATE target SET col = expr, ... WHERE condition`` —
    file-level copy-on-write: only files CONTAINING matching rows are
    rewritten (survivors carried over, matched rows replaced by their
    post-images; SET expressions evaluate against the PRE-image row).
    Returns the number of rows updated. Generated columns not named in
    SET are recomputed (their sources may change); CHECK constraints
    validate the post-images; TYPED CDC records update_preimage +
    update_postimage pairs, exactly as a key-merge would.

    Scale: O(matched data) — a predicate on a zone-mapped column opens
    only the files whose stats admit it; see :func:`update_where_dv`
    for the merge-on-read variant that avoids rewriting unmatched
    neighbors entirely."""
    import pyarrow.parquet as pq

    cond_true = F.coalesce(condition, F.lit(False))
    for _ in range(max_retries):
        commits = _commits(target_path)
        version = commits[-1]["version"] if commits else 0
        declared = _schema_from(commits)
        committed = _files_from(commits)
        if not committed:
            return 0
        existing = _read_snapshot(
            spark, target_path, commits, files=committed,
            schema=declared, keep_lineage=True,
        )
        root = os.path.abspath(target_path)
        matched_files = _matched_rel_files(
            existing.filter(condition).select(_FP_COL), root, "UPDATE"
        )
        if not matched_files:
            return 0
        # Shared by the data + CDC staging actions (r16).
        touched = _read_snapshot(
            spark, target_path, commits, files=matched_files, schema=declared
        ).localCheckpoint(eager=False)
        changed = touched.filter(cond_true)
        carried = touched.filter(~cond_true)
        updated = _updated_frame(changed, set_exprs, commits, target_path)
        new_data = updated.unionByName(carried, allowMissingColumns=True)
        cdc = changed.withColumn(_CHANGE_COL, F.lit("update_preimage")).unionByName(
            updated.withColumn(_CHANGE_COL, F.lit("update_postimage")),
            allowMissingColumns=True,
        )
        with ThreadPoolExecutor(max_workers=2) as pool:  # guide §2.6
            f_data = pool.submit(
                _stage_files, new_data, target_path, partition_cols, commits
            )
            f_cdc = pool.submit(
                _stage_cdc_files_counted, cdc, target_path, commits
            )
            staged = f_data.result()
            cdc_staged, (_, n_updated, _) = f_cdc.result()
        live_staged: list[str] = []
        for rel in staged:
            if pq.ParquetFile(os.path.join(target_path, rel)).metadata.num_rows:
                live_staged.append(rel)
            else:
                os.remove(os.path.join(target_path, rel))

        def _cleanup():
            for rel in live_staged + cdc_staged:
                try:
                    os.remove(os.path.join(target_path, rel))
                except FileNotFoundError:
                    pass

        if n_updated == 0:
            _cleanup()
            return 0
        if _pre_commit_hook is not None:
            _pre_commit_hook()
        if _try_commit(
            target_path,
            version + 1,
            live_staged,
            n_updated,
            remove=matched_files,
            stats=_collect_stats(target_path, live_staged),
            schema=json.dumps(new_data.schema.jsonValue()),
            cdc=cdc_staged,
            op="UPDATE",
            commits=commits,
        ):
            return n_updated
        _cleanup()
    raise RuntimeError(
        f"update_where lost the commit race {max_retries} times at {target_path}"
    )


def update_where_dv(
    spark: SparkSession,
    target_path: str,
    set_exprs: dict[str, Column],
    condition: Column,
    partition_cols: Sequence[str] | None = None,
    max_retries: int = 20,
    _pre_commit_hook: Callable[[], None] | None = None,
) -> int:
    """Merge-on-read ``UPDATE ... WHERE`` — ONE commit that (a) masks
    the matched rows in place via a deletion-vector kill list and (b)
    adds a new file holding their post-images. Returns the number of
    rows updated. At 100 TB this is the cheap-update path: updating k
    scattered rows costs O(k) write I/O (kill list + post-image file),
    never a rewrite of the unmatched neighbors copy-on-write drags
    along — Delta's DV-backed UPDATE. Readers already compose the two
    halves (adds are visible, masks hide the pre-images) and the next
    compaction folds them together. TYPED CDC: update_preimage +
    update_postimage, indistinguishable from the copy-on-write
    variant (the CDF contract)."""
    import pyarrow.parquet as pq

    cond_true = F.coalesce(condition, F.lit(False))
    for _ in range(max_retries):
        commits = _commits(target_path)
        version = commits[-1]["version"] if commits else 0
        declared = _schema_from(commits)
        committed = _files_from(commits)
        if not committed:
            return 0
        existing = _read_snapshot(
            spark, target_path, commits, files=committed,
            schema=declared, keep_lineage=True,
        )
        # The matched rows feed THREE pooled staging actions (kill
        # list, post-image data, CDC) — materialize them once so the
        # full-snapshot predicate scan runs once, not per action (r16,
        # same rationale as the merge engine's t2; the blocks are
        # O(matched rows), the DV path's own bound).
        matched = existing.filter(condition).localCheckpoint(eager=False)
        uri_map = spark.createDataFrame(
            [(_file_uri(target_path, f), f) for f in committed],
            "file_uri string, file string",
        )
        kill = (
            matched.select(
                F.col(_FP_COL).alias("file_uri"),
                F.col(_RI_COL).alias("row_index"),
            )
            .join(F.broadcast(uri_map), "file_uri")
            .select("file", "row_index")
        )
        changed = matched.drop(_FP_COL, _RI_COL)
        updated = _updated_frame(changed, set_exprs, commits, target_path)
        cdc = changed.withColumn(_CHANGE_COL, F.lit("update_preimage")).unionByName(
            updated.withColumn(_CHANGE_COL, F.lit("update_postimage")),
            allowMissingColumns=True,
        )
        # DV kill list, post-image data file and CDC rows are three
        # independent actions — overlap them (guide §2.6).
        with ThreadPoolExecutor(max_workers=3) as pool:
            f_dv = pool.submit(_stage_dv_files, kill, target_path)
            f_data = pool.submit(
                _stage_files, updated, target_path, partition_cols, commits
            )
            f_cdc = pool.submit(
                _stage_cdc_files_counted, cdc, target_path, commits
            )
            dv_staged = f_dv.result()
            staged = f_data.result()
            cdc_staged, (_, n_updated, _) = f_cdc.result()
        live_staged: list[str] = []
        for rel in staged:
            if pq.ParquetFile(os.path.join(target_path, rel)).metadata.num_rows:
                live_staged.append(rel)
            else:
                os.remove(os.path.join(target_path, rel))
        affected: set[str] = set()
        n_masked = 0
        for rel in dv_staged:
            t = pq.read_table(os.path.join(target_path, rel), columns=["file"])
            n_masked += t.num_rows
            affected.update(t.column(0).to_pylist())

        def _cleanup():
            for rel in dv_staged + live_staged + cdc_staged:
                try:
                    os.remove(os.path.join(target_path, rel))
                except FileNotFoundError:
                    pass

        if n_updated == 0:
            _cleanup()
            return 0
        if _pre_commit_hook is not None:
            _pre_commit_hook()
        if _try_commit(
            target_path,
            version + 1,
            live_staged,
            n_updated,
            stats=_collect_stats(target_path, live_staged),
            schema=json.dumps(updated.schema.jsonValue()),
            dv={"add": dv_staged, "files": sorted(affected), "n": n_masked},
            cdc=cdc_staged,
            op="UPDATE",
            commits=commits,
        ):
            return n_updated
        _cleanup()
    raise RuntimeError(
        f"update_where_dv lost the commit race {max_retries} times at {target_path}"
    )


def delete_where_dv(
    spark: SparkSession,
    target_path: str,
    condition: Column,
    max_retries: int = 20,
    _pre_commit_hook: Callable[[], None] | None = None,
) -> int:
    """Merge-on-read ``DELETE FROM target WHERE condition`` — Delta
    deletion vectors / Iceberg positional delete files on the parquet
    txlog. Instead of rewriting every file that contains a matching row
    (:func:`delete_where`'s copy-on-write), the commit records a KILL
    LIST: ``(file, row_index)`` parquet rows under
    ``_deletion_vectors/``, found via the scan's own ``_metadata``
    struct. Every reader (:func:`_read_snapshot`) anti-joins the
    broadcast kill list, so the rows vanish atomically at commit; no
    data file is touched. Returns the number of rows deleted.

    This is the point-delete scale path: deleting 100 rows from a
    100 TB table costs O(matched rows) write I/O — not O(matched
    FILES) like copy-on-write, which rewrites a whole file to drop one
    row (GDPR erasure, late-arriving retractions). The read-side tax
    (a broadcast hash anti-join keyed on file+row-index) is bounded by
    accumulated deletes and is reclaimed by the next ``compact()`` or
    any rewrite of the masked files, which read the DV-filtered view
    and drop the file's DV entries with the file — Delta's
    write-amplification/read-amplification trade, chosen per-statement
    here exactly as ``spark.databricks.delta.delete.deletionVectors``
    chooses it per-table.

    TYPED CDC: the commit stages ``delete`` change rows for the masked
    rows, so :func:`table_changes` and the streaming source replay a
    merge-on-read delete identically to a copy-on-write one —
    consumers cannot tell the physical strategies apart (the CDF
    contract). Concurrency: same optimistic CAS as every writer; a
    loser recomputes against the winner's snapshot, so deleting rows a
    concurrent compaction just rewrote re-targets the new files."""
    import pyarrow.parquet as pq

    for _ in range(max_retries):
        commits = _commits(target_path)
        version = commits[-1]["version"] if commits else 0
        committed = _files_from(commits)
        if not committed:
            return 0  # empty table (legacy tables: adopt via a merge first)
        declared = _schema_from(commits)
        existing = _read_snapshot(
            spark,
            target_path,
            commits,
            files=committed,
            schema=declared,
            keep_lineage=True,
        )
        # Shared by the kill-list and CDC staging actions (r16): the
        # full-snapshot predicate scan runs once, not per action.
        matched = existing.filter(condition).localCheckpoint(eager=False)
        uri_map = spark.createDataFrame(
            [(_file_uri(target_path, f), f) for f in committed],
            "file_uri string, file string",
        )
        kill = (
            matched.select(
                F.col(_FP_COL).alias("file_uri"),
                F.col(_RI_COL).alias("row_index"),
            )
            .join(F.broadcast(uri_map), "file_uri")
            .select("file", "row_index")
        )
        with ThreadPoolExecutor(max_workers=2) as pool:  # guide §2.6
            f_dv = pool.submit(_stage_dv_files, kill, target_path)
            f_cdc = pool.submit(
                _stage_cdc_files,
                matched.drop(_FP_COL, _RI_COL).withColumn(
                    _CHANGE_COL, F.lit("delete")
                ),
                target_path,
                commits,
            )
            dv_staged = f_dv.result()
            cdc_staged = f_cdc.result()
        n_deleted = 0
        affected: set[str] = set()
        for rel in dv_staged:
            t = pq.read_table(os.path.join(target_path, rel), columns=["file"])
            n_deleted += t.num_rows
            affected.update(t.column(0).to_pylist())

        def _cleanup():
            for rel in dv_staged + cdc_staged:
                try:
                    os.remove(os.path.join(target_path, rel))
                except FileNotFoundError:
                    pass

        if n_deleted == 0:
            _cleanup()
            return 0
        if _pre_commit_hook is not None:
            _pre_commit_hook()
        if _try_commit(
            target_path,
            version + 1,
            [],
            0,
            dv={"add": dv_staged, "files": sorted(affected), "n": n_deleted},
            cdc=cdc_staged,
            op="DELETE",
            commits=commits,
        ):
            return n_deleted
        _cleanup()
    raise RuntimeError(
        f"delete_where_dv lost the commit race {max_retries} times at {target_path}"
    )


_MAX_FILE_LIST = 1_000_000


def _matched_rel_files(fp_rows: DataFrame, root: str, what: str) -> list[str]:
    """Driver-side matched-file discovery shared by MERGE / UPDATE /
    DELETE / overwrite_where: collect the DISTINCT ``_FP_COL`` file
    pointers of predicate-matched rows and map them to log-relative
    paths. The relation is file-level metadata — bounded by the
    table's committed file count, never its row count — and the cap is
    a tripwire (VERDICT r12 observation) so a future edit that
    accidentally collects a row-level relation here fails loud instead
    of materializing the table on the driver. A genuinely >10^6-file
    table has outgrown this txlog's driver-side manifest design
    (docs/SCALE.md known limits): compact it, or raise the constant
    deliberately."""
    rows = fp_rows.distinct().limit(_MAX_FILE_LIST + 1).collect()
    if len(rows) > _MAX_FILE_LIST:
        raise AssertionError(
            f"matched-file discovery ({what}) exceeded {_MAX_FILE_LIST} "
            "distinct file pointers — not file-level metadata, or the "
            "table has outgrown the driver-side manifest design"
        )
    return sorted({_uri_to_rel(r[0], root) for r in rows})


def _uri_to_rel(uri: str, root: str) -> str:
    """input_file_name() URI → table-relative path (file:///a%20b/x.parquet
    → x.parquet)."""
    from urllib.parse import unquote, urlparse

    p = unquote(urlparse(uri).path or uri)
    return os.path.relpath(p, root)


def conform(df: DataFrame, schema) -> DataFrame:
    """K6: enforce a declared table contract before writing — the
    parquet-path stand-in for DDL. The reference pins its layout with
    ``create_hypertable('stock_bars','timestamp')`` + SQLAlchemy column
    types (migration.py:30-36); on Delta/Iceberg that is ``CREATE TABLE
    ... PARTITIONED BY (...)``. Plain parquet has no catalog, so the
    contract is enforced at write time instead: every schema column
    must exist, is cast to the declared type, and extras are dropped.
    Raises on missing columns rather than writing a drifted table."""
    missing = [f.name for f in schema.fields if f.name not in df.columns]
    if missing:
        raise ValueError(f"schema contract violated, missing columns: {missing}")
    return df.select(*[F.col(f.name).cast(f.dataType) for f in schema.fields])


def ensure_table(
    spark: SparkSession,
    name: str,
    schema,
    path: str,
    partition_cols: Sequence[str] = (),
) -> None:
    """K6 proper: REAL catalog DDL for the time-partitioned table
    contract — the Spark respec of the reference's ``create_all`` +
    ``create_hypertable('stock_bars','timestamp')`` (migration.py:11-46).

    ``CREATE TABLE IF NOT EXISTS ... USING parquet PARTITIONED BY (...)
    LOCATION path`` registers the declared contract in the session
    catalog, making the path-written data a first-class SQL table with
    partition pruning; ``MSCK REPAIR`` recovers partitions that
    path-based writers (write_partitioned / upsert_bars) added outside
    the catalog. On Delta/Iceberg the same call is ``USING delta`` and
    the repair step disappears (the log tracks partitions). The
    declared ``schema`` must include the partition columns."""
    missing = [c for c in partition_cols if c not in {f.name for f in schema.fields}]
    if missing:
        raise ValueError(f"partition columns absent from declared schema: {missing}")
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    part = f" PARTITIONED BY ({', '.join(partition_cols)})" if partition_cols else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({cols}) USING parquet{part} LOCATION '{path}'"
    )
    if partition_cols:
        spark.sql(f"MSCK REPAIR TABLE {name}")


def upsert_bars(
    spark: SparkSession,
    target_path: str,
    bars: DataFrame,
    companies: DataFrame,
    ticker_col: str = "ticker",
    ts_col: str = "bar_ts",
) -> int:
    """K5: resolve ticker→company_id via broadcast dim join (inner =
    skip unknown tickers, loading.py:330-333), derive the ``bar_date``
    partition column (K6 hypertable layout), then idempotent
    merge-append on the composite (company_id, ts) unique key
    (models/stock_bar.py:20-22)."""
    resolved = broadcast_enrich(
        bars,
        companies.select(F.col(ticker_col), F.col("id").alias("company_id")),
        ticker_col,
        "inner",
    ).withColumn("bar_date", F.to_date(F.col(ts_col)))
    return merge_append(
        spark, target_path, resolved, ["company_id", ts_col], partition_cols=["bar_date"]
    )
