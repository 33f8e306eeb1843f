"""Materialized physical layouts: bucketed fact tables, a
date-partitioned event log, the at-rest IVF index, and the
split-partitioned corpus — all served through SNAPSHOT-ISOLATED
generation directories.

These are the levers a 100 TB deployment reaches for first, paid
once at ingest instead of per query:

- ``orders``/``lineitem`` written ``bucketBy(N, orderkey).sortBy``
  into catalog tables → every orderkey equi-join between them runs
  with ZERO exchanges (co-located buckets) and no per-query sort
  (each bucket is one pre-sorted file).
- ``events`` written ``partitionBy(event_date)`` → date-range
  queries prune whole directories at planning time
  (``PartitionFilters``), never opening off-range files.
- ``embeddings`` written ``partitionBy(cell)`` (IVF) → probe joins
  prune to the probed cells.
- ``documents`` written ``partitionBy(split)`` → train/eval
  isolation as a physical property.

Reference analog: the ClickHouse sink tables are the reference's
materialized layout (``ClickHouseUtil.java:31-76`` — partitioned
MergeTree tables the dashboards range-scan) and its HBase dim store
serves reads CONTINUOUSLY while Flink writes (``DimSink.java:22-94``);
this module is that storage layer re-expressed as Spark-managed
parquet with the same always-on serving posture.

Snapshot isolation (r13 — VERDICT r12 item #1)
----------------------------------------------

Every layout family lives under a stable FAMILY ROOT directory that
holds nothing but metadata and immutable generation directories::

    <warehouse>/<tag>/<alias>/
        _manifest.json      <- current-generation pointer (atomic flip)
        _ingest/            <- replay markers (survive every rewrite)
        gen-0000001/        <- a complete, immutable layout generation
        gen-0000002/        <- ...

Readers resolve the manifest at plan time and scan ONE generation;
maintenance (compaction, partition upsert/expiry, rebuild) writes a
NEW generation beside it — unchanged files are HARDLINKED across, so
cost stays proportional to the changed bytes, the local-filesystem
equivalent of a table format's manifest re-pointing the same data
files — and then flips the pointer with an atomic ``os.replace``.
Catalog tables additionally re-point via ``ALTER TABLE … SET
LOCATION`` (a single catalog op that preserves the bucket spec), so
there is NO drop/re-create window anywhere: a scan planned before
the flip keeps reading its (retired but intact) generation, a scan
planned after reads the new one, and nobody ever sees
TABLE_NOT_FOUND or missing files mid-maintenance. Retired
generations are garbage-collected by the NEXT maintenance writer
once they have been retired longer than the grace window
(``SPARK_GRAFT_LAYOUT_GC_GRACE_S``, default 900 s — size it above
the longest-running query, exactly like a lakehouse snapshot
expiry). Readers never mutate the manifest, so there is no
reader/writer write race on it; maintenance writers are serialized
by a pid-stamped lock (atomic create, in-process thread guard).

Crash windows under this scheme are all benign by construction:

- mid-generation-build → an UNLISTED ``gen-*`` dir; readers never
  see it (the manifest doesn't point there) and the next writer
  sweeps it under the lock;
- after the manifest flip but before the catalog re-point → the
  table keeps serving the retired generation (still on disk); the
  next ensure pass re-points it;
- generation names are never reused (next = max ever seen + 1), so
  a pre-planned reader's path can never be silently re-populated
  with different rows.

Other lifecycle invariants (r11/r12, carried forward):

- **Source fingerprint**: each generation records the upstream
  parquet's identity in ``_src_fingerprint.json``; a regenerated
  fixture triggers a rebuild instead of serving stale bytes, and the
  snapshot is taken BEFORE the source is read.
- **Spec stamp**: bucketed generations also record the physical
  contract (bucket key, sort columns, bucket count); adopting files
  under a stronger ordering claim than they were written with is
  impossible.
- **Cross-session adoption**: the catalog is session-scoped, the
  files are not — an intact current generation is adopted
  (``CREATE TABLE … LOCATION``), never overwritten.
- **Replay markers** live at the family root, OUTSIDE generations,
  so ingest idempotence survives every rewrite without copying.

Pre-r13 layouts (files directly under the family root) are MIGRATED
in place into ``gen-0000001`` — appended batches and replay markers
survive the upgrade. Note: pre-r12 layouts under the old, hash-less
tag directories are NOT auto-adopted (the r12 tag change made tags
injective); ``python -m gmall_realtime2021_spark maintain`` sweeps
the stale legacy-tag directory for its ``--sf-dir`` so the disk is
reclaimed (ADVICE r12).

The scratch root follows the scale-probe convention
(``SPARK_GRAFT_WAREHOUSE_DIR``, default ``/tmp/spark_graft_warehouse``).
"""

from __future__ import annotations

import contextlib
import json
import os
import re
import shutil
import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_realtime2021_spark.tables import load

__all__ = [
    "N_BUCKETS",
    "EVENTS_BUCKET_KEY",
    "EVENTS_SORT_COLS",
    "source_fingerprint",
    "ensure_bucketed_facts",
    "ensure_bucketed_events",
    "ensure_day_bucketed_events",
    "upsert_day_bucketed_events",
    "ensure_partitioned_events",
    "read_partitioned_events",
    "ensure_split_documents",
    "read_split_documents",
    "ensure_ivf_embeddings",
    "read_ivf_embeddings",
    "append_ivf_batch",
    "compact_ivf_cells",
    "append_bucketed_batch",
    "upsert_event_days",
    "expire_event_days",
    "compact_bucketed_table",
    "gc_layout_generations",
    "sweep_legacy_tag_dir",
    "layout_health_stats",
    "rebuild_bucketed_facts",
]

#: Bucket count for the fact-fact join layout. On a real cluster this
#: is sized to target bucket-file sizes of 128 MB–1 GB at the ingest
#: volume (e.g. 4096 buckets at 100 TB); the join-elision property is
#: bucket-count-invariant as long as both sides agree.
N_BUCKETS = 16

#: Auto-compaction threshold for the incremental append path: past
#: this many data files (≈ generations × N_BUCKETS) the append
#: triggers a row-preserving rewrite back to one file per bucket.
AUTO_COMPACT_FILES = 8 * N_BUCKETS

_FP_NAME = "_src_fingerprint.json"
_MANIFEST = "_manifest.json"
_GEN_RE = re.compile(r"^gen-(\d{7})$")


def _root() -> str:
    return os.environ.get("SPARK_GRAFT_WAREHOUSE_DIR", "/tmp/spark_graft_warehouse")


def _gc_grace_s() -> float:
    """Grace window before a RETIRED generation's files are removed.
    Size it above the longest-running query against the layout — a
    scan planned just before a flip must finish on the old files.
    Read per call so tests (and operators) can tune it live."""
    return float(os.environ.get("SPARK_GRAFT_LAYOUT_GC_GRACE_S", "900"))


def _tag(sf_dir: str) -> str:
    """Identifier-safe tag for a source dir. The readable prefix alone
    is lossy ('/a/b-c' and '/a/b_c' collide), and a collision means
    two datasets sharing one warehouse dir + catalog name — rebuild
    thrash that discards ingested batches, or two sessions clobbering
    each other's live layout — so a short hash of the RAW path makes
    the tag injective (r12 review)."""
    import hashlib

    readable = re.sub(r"\W+", "_", sf_dir).strip("_")
    return f"{readable}_{hashlib.sha1(sf_dir.encode()).hexdigest()[:6]}"


def _table_location(spark: SparkSession, name: str) -> str:
    """The table's filesystem path. The catalog reports a URI, so the
    scheme is stripped AND percent-escapes decoded — a warehouse root
    containing a space/'%' would otherwise break the loc==expected
    check (perpetual drop/re-register), zero out the auto-compaction
    file count, and crash the generation flips (r12 review)."""
    from urllib.parse import unquote

    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {name}")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    return unquote(loc.removeprefix("file:"))


def source_fingerprint(sf_dir: str, table: str) -> dict:
    """Identity of the upstream parquet a derived artifact came from:
    (relative path, mtime_ns, size) per file. The engine-wide
    staleness scheme — recorded inside every materialized generation
    (a mismatch later means the fixture was regenerated in place and
    the layout must be rebuilt, ADVICE r10) and reused as the
    memoization key for other fixture-derived caches
    (``plans/tpch4``)."""
    src = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(src):
        paths = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(src)
            for f in fs
            if f.endswith(".parquet")
        )
    else:
        paths = [src]
    files = []
    for p in paths:
        try:
            st = os.stat(p)
            files.append([os.path.relpath(p, sf_dir), st.st_mtime_ns, st.st_size])
        except OSError:
            files.append([os.path.relpath(p, sf_dir), None, None])
    return {"table": table, "files": files}


def _write_fingerprint(
    dst: str, sf_dir: str, table: str, snapshot: dict | None = None, spec: dict | None = None
) -> None:
    """Persist a generation's source fingerprint. ``snapshot`` MUST be
    the fingerprint taken BEFORE the generation's source was read
    (every ensure path passes it): stamping a freshly-computed
    fingerprint after a long materialization would, if the upstream
    fixture was regenerated mid-write, label a generation built from
    the OLD bytes with the NEW files' identity — the staleness gate
    would then never fire (ADVICE r11). ``spec`` records the PHYSICAL
    layout contract (bucket key, sort columns, bucket count)
    alongside the source identity: adopting on-disk files under a
    DIFFERENT spec than they were written with would let a merge join
    or range window claim an ordering the files don't have — silently
    wrong results — so a spec change forces a rebuild exactly like a
    source change."""
    fp = source_fingerprint(sf_dir, table) if snapshot is None else snapshot
    if spec is not None:
        fp = {**fp, "spec": spec}
    with open(os.path.join(dst, _FP_NAME), "w") as fh:
        json.dump(fp, fh)


def _layout_intact(dst: str, sf_dir: str, table: str, spec: dict | None = None) -> bool:
    """True iff the generation directory finished writing
    (``_SUCCESS``) AND still derives from the current upstream files
    (fingerprint) AND — for spec-stamped layouts — was written under
    the same physical contract (bucket/sort spec)."""
    if not os.path.exists(os.path.join(dst, "_SUCCESS")):
        return False
    expected = source_fingerprint(sf_dir, table)
    if spec is not None:
        expected = {**expected, "spec": spec}
    try:
        with open(os.path.join(dst, _FP_NAME)) as fh:
            return json.load(fh) == expected
    except (OSError, ValueError):
        return False


# ---------------------------------------------------------------------------
# Manifest machinery: the current-generation pointer and its lifecycle
# ---------------------------------------------------------------------------


def _manifest(root: str) -> dict | None:
    """The family's manifest, or None when the root predates the
    manifest scheme / doesn't exist. Readers call this on every
    resolve; the file is a few hundred bytes and only ever replaced
    atomically, so a read sees a complete old or new manifest, never
    a torn one."""
    try:
        with open(os.path.join(root, _MANIFEST)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def _write_manifest(root: str, m: dict) -> None:
    """Atomic manifest replace (tmp + ``os.replace``). Only
    maintenance WRITERS (who hold the family lock) and the
    single-threaded migration path call this — readers never mutate
    the manifest, so there is no read-modify-write race to lose."""
    tmp = os.path.join(root, f"{_MANIFEST}.tmp.{os.getpid()}.{threading.get_ident()}")
    with open(tmp, "w") as fh:
        json.dump(m, fh)
    os.replace(tmp, os.path.join(root, _MANIFEST))


def _current_gen(root: str) -> str | None:
    """Absolute path of the family's CURRENT generation, or None."""
    m = _manifest(root)
    if not m or not m.get("current"):
        return None
    gen = os.path.join(root, m["current"])
    return gen if os.path.isdir(gen) else None


def _next_gen_path(root: str) -> str:
    """Path for the next generation: max(number ever seen) + 1, over
    BOTH on-disk ``gen-*`` dirs and manifest entries. Names are never
    reused — the current generation is always the highest number ever
    assigned, so a retired (or even GC'd) generation's path can never
    be re-populated with different rows under a pre-planned reader."""
    seen = [0]
    if os.path.isdir(root):
        for d in os.listdir(root):
            m = _GEN_RE.match(d)
            if m:
                seen.append(int(m.group(1)))
    man = _manifest(root)
    if man:
        for name in man.get("generations", {}):
            m = _GEN_RE.match(name)
            if m:
                seen.append(int(m.group(1)))
    return os.path.join(root, f"gen-{max(seen) + 1:07d}")


def _flip_manifest(root: str, gen_name: str) -> None:
    """Commit ``gen_name`` as the current generation (atomic). The
    previous current is stamped ``retired`` = now; its files stay on
    disk until :func:`_gc_generations` finds the stamp older than the
    grace window. Caller holds the family lock."""
    m = _manifest(root) or {"current": None, "generations": {}}
    gens = m.setdefault("generations", {})
    now = time.time()
    prev = m.get("current")
    if prev and prev != gen_name:
        gens.setdefault(prev, {"created": None})["retired"] = now
    gens[gen_name] = {"created": now}
    m["current"] = gen_name
    _write_manifest(root, m)


def _gc_generations(root: str) -> list[str]:
    """Remove retired generations whose grace window has expired;
    returns the removed names. WRITER-ONLY (caller holds the family
    lock): GC rewrites the manifest, and readers must never do that.
    A retired-but-in-grace generation is exactly what keeps an
    overlapping scan alive — this is the snapshot-expiry half of the
    manifest scheme."""
    m = _manifest(root)
    if not m:
        return []
    grace = _gc_grace_s()
    now = time.time()
    removed = []
    for name, meta in list(m.get("generations", {}).items()):
        if name == m.get("current"):
            continue
        retired = meta.get("retired")
        if retired is not None and (now - retired) >= grace:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
            del m["generations"][name]
            removed.append(name)
    if removed:
        _write_manifest(root, m)
    return removed


def _sweep_unlisted_gens(root: str) -> None:
    """Remove ``gen-*`` dirs absent from the manifest — debris from a
    writer that crashed mid-build (the manifest never pointed there,
    so no reader ever saw them). WRITER-ONLY, under the family lock:
    while we hold the lock no other writer can be mid-build, so an
    unlisted generation is crash debris by construction — the
    invariant the r12 review demanded of every sweep on a concurrent
    path. Writers pick their next generation NAME before sweeping, so
    a failed attempt's number is never reassigned (the never-reuse
    guarantee holds even for debris)."""
    m = _manifest(root)
    listed = set((m or {}).get("generations", {}))
    cur = (m or {}).get("current")
    if os.path.isdir(root):
        for d in os.listdir(root):
            if _GEN_RE.match(d) and d not in listed and d != cur:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)


def _family_root_of(path: str) -> str:
    """The family root for a generation path (the dir holding the
    manifest)."""
    path = path.rstrip("/")
    if not _GEN_RE.match(os.path.basename(path)):
        raise ValueError(
            f"{path!r} is not a generation directory; layout handles must come "
            "from the ensure_* functions (which resolve the manifest)"
        )
    return os.path.dirname(path)


def _link_tree(src: str, dst: str) -> None:
    """Copy a directory tree by HARDLINK (fallback: byte copy, for
    filesystems without link support). Data files are immutable once
    a generation is committed, so sharing inodes across generations
    is safe and makes carrying an unchanged partition/cell into the
    next generation a metadata-cost operation — the local-FS analog
    of a table-format manifest re-pointing the same data file. At
    100 TB this is the difference between maintenance cost ∝ changed
    bytes and cost ∝ table size."""
    for r, dirs, files in os.walk(src):
        rel = os.path.relpath(r, src)
        out = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(out, exist_ok=True)
        for f in files:
            s, d = os.path.join(r, f), os.path.join(out, f)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def _copy_sidecars(src_gen: str, dst_gen: str, names: tuple[str, ...] = ("_SUCCESS", _FP_NAME)) -> None:
    """Byte-COPY (never hardlink) the small metadata sidecars into a
    new generation: sidecars are occasionally rewritten in place
    (spec restamp), and a shared inode would silently edit the
    retired generation a pre-planned reader is still trusting."""
    for n in names:
        s = os.path.join(src_gen, n)
        if os.path.isfile(s):
            shutil.copy2(s, os.path.join(dst_gen, n))

# ---------------------------------------------------------------------------
# Maintenance writer lock: single-writer per family, cross-process AND
# cross-thread
# ---------------------------------------------------------------------------

#: A maintenance lock file older than this is treated as stale even if
#: some process with the recorded (recycled) pid is alive — caps the
#: damage of pid reuse to a bounded wait, never a deadlock.
_LOCK_STALE_S = 3600.0

#: How long a writer waits for a LIVE peer before giving up loudly.
_LOCK_WAIT_S = 120.0

#: In-process writer serialization (ADVICE r12 medium #2): two threads
#: of the same driver (a serving query's ensure racing a foreachBatch-
#: scheduled compaction) must queue on a real threading.Lock — pid
#: liveness can't distinguish them, and the old self-pid exemption let
#: one thread treat the other's LIVE lock as crash debris.
_INPROC_LOCKS: dict[str, threading.Lock] = {}
_INPROC_GUARD = threading.Lock()


def _lock_path(layout_root: str) -> str:
    return layout_root.rstrip("/") + "__lock"


def _wait_no_live_maintenance(layout_root: str, timeout_s: float | None = None) -> None:
    """Block while a LIVE maintenance writer in ANOTHER process holds
    the family's lock; remove the lock and return when its writer is
    dead (crash debris). Raises TimeoutError rather than proceeding
    over a live writer after the wait budget. Same-process writers
    are serialized upstream by ``_INPROC_LOCKS`` — a lock file whose
    pid is THIS process is therefore either held by a thread we
    already queued behind (we'd never reach here) or debris from a
    kill -9 of a previous incarnation (impossible: pids differ), so
    no self-pid exemption exists anymore (ADVICE r12 medium #2)."""
    lock = _lock_path(layout_root)
    if timeout_s is None:
        timeout_s = _LOCK_WAIT_S  # resolved per call so tests/operators can tune it
    deadline = time.monotonic() + timeout_s
    pid = -1
    while os.path.isfile(lock):
        alive = False
        try:
            with open(lock) as fh:
                meta = json.load(fh)
            pid = int(meta.get("pid", -1))
            fresh = (time.time() - os.path.getmtime(lock)) < _LOCK_STALE_S
            if pid > 0 and fresh:
                os.kill(pid, 0)  # raises if the writer is gone
                alive = True
        except (OSError, ValueError):
            alive = False
        if not alive:
            with contextlib.suppress(OSError):
                os.remove(lock)
            return
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"maintenance writer (pid {pid}) still holds {lock} after {timeout_s}s"
            )
        time.sleep(0.05)


@contextlib.contextmanager
def _maintenance_lock(layout_root: str, timeout_s: float | None = None):
    """Serialize maintenance WRITERS on one layout family.

    Two layers: an in-process ``threading.Lock`` (same-driver threads
    queue honestly — pid liveness can't tell them apart), then a
    pid-stamped lock FILE written atomically (tmp + ``os.replace``,
    so a concurrent reader of the file can never observe a torn JSON
    and misjudge liveness — ADVICE r12 medium #2) that excludes
    writers in other processes via :func:`_wait_no_live_maintenance`.
    Readers never take this lock: under the manifest scheme they only
    resolve the current-generation pointer, which maintenance flips
    atomically. The file is released on EVERY exit path (the r12
    manual ``__enter__`` + unguarded staging write left it behind on
    a failed rewrite, stalling every peer for the full wait budget —
    ADVICE r12 medium #1)."""
    lock = _lock_path(layout_root)
    if timeout_s is None:
        timeout_s = _LOCK_WAIT_S  # resolved per call so tests/operators can tune it
    key = os.path.abspath(lock)
    with _INPROC_GUARD:
        lk = _INPROC_LOCKS.setdefault(key, threading.Lock())
    if not lk.acquire(timeout=timeout_s):
        raise TimeoutError(f"another thread holds the maintenance lock for {layout_root}")
    try:
        _wait_no_live_maintenance(layout_root, timeout_s=timeout_s)
        os.makedirs(os.path.dirname(lock) or "/", exist_ok=True)
        tmp = f"{lock}.tmp.{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "w") as fh:
            json.dump({"pid": os.getpid(), "ts": time.time()}, fh)
        os.replace(tmp, lock)
        try:
            yield
        finally:
            with contextlib.suppress(OSError):
                os.remove(lock)
    finally:
        lk.release()


# ---------------------------------------------------------------------------
# Legacy (pre-r13) layout migration: files directly under the family root
# ---------------------------------------------------------------------------


def _migrate_legacy_layout(root: str) -> None:
    """Adopt a pre-manifest layout (files directly under ``root``)
    into ``gen-0000001`` IN PLACE — appended batches and their replay
    markers survive the upgrade instead of being rebuilt away (the
    same no-discard promise cross-session adoption makes). Also
    finishes a migration interrupted by a crash and restores a
    COMPLETE pre-r13 swap generation stranded beside a missing root.

    Steps (under the family lock): root → ``root__gen1tmp`` →
    recreate root → tmp → ``root/gen-0000001`` → hoist ``_ingest`` to
    the root → write the manifest. Each window is detectable from
    what's on disk, so a crashed migration resumes exactly where it
    stopped."""
    tmp = root.rstrip("/") + "__gen1tmp"

    def _needs_migration() -> bool:
        if os.path.isdir(tmp):
            return True
        if not os.path.isdir(root):
            # a pre-r13 compaction crash can strand the whole layout in
            # a __precompact/__compacting sibling with no live root
            return any(
                os.path.exists(os.path.join(root + s, "_SUCCESS"))
                for s in ("__precompact", "__compacting")
            )
        if _manifest(root) is not None:
            return False
        return os.path.exists(os.path.join(root, "_SUCCESS")) or os.path.isdir(
            os.path.join(root, "gen-0000001")
        )

    if not _needs_migration():
        return
    with _maintenance_lock(root):
        if not _needs_migration():  # lost the race to a peer — done
            return
        g1 = os.path.join(root, "gen-0000001")
        if not os.path.isdir(root) and not os.path.isdir(tmp):
            # restore a stranded complete pre-r13 generation first
            for s in ("__compacting", "__precompact"):
                cand = root + s
                if os.path.exists(os.path.join(cand, "_SUCCESS")):
                    os.rename(cand, root)
                    break
        if os.path.isdir(root) and os.path.exists(os.path.join(root, "_SUCCESS")):
            os.rename(root, tmp)
        if os.path.isdir(tmp):
            os.makedirs(root, exist_ok=True)
            if os.path.isdir(g1):
                shutil.rmtree(tmp)  # crash replay: gen already in place
            else:
                os.rename(tmp, g1)
        if os.path.isdir(g1) and _manifest(root) is None:
            legacy_ingest = os.path.join(g1, "_ingest")
            if os.path.isdir(legacy_ingest) and not os.path.isdir(os.path.join(root, "_ingest")):
                os.rename(legacy_ingest, os.path.join(root, "_ingest"))
            # resolve pre-r13 crash tombs riding inside the migrated
            # generation: an IVF cell tomb whose live cell is missing
            # is the crashed half of a per-cell swap (restore it);
            # any other tomb is superseded debris
            for d in list(os.listdir(g1)):
                if d.startswith("_precompact_cell_"):
                    live = os.path.join(g1, "cell=" + d.removeprefix("_precompact_cell_"))
                    tomb = os.path.join(g1, d)
                    if os.path.isdir(live):
                        shutil.rmtree(tomb)
                    else:
                        os.rename(tomb, live)
                elif d.startswith("_expired_"):
                    shutil.rmtree(os.path.join(g1, d))
            _write_manifest(
                root,
                {
                    "current": "gen-0000001",
                    "generations": {"gen-0000001": {"created": time.time(), "migrated": True}},
                },
            )
        # pre-r13 swap siblings are superseded by the migrated gen
        for s in ("__precompact", "__compacting"):
            shutil.rmtree(root + s, ignore_errors=True)


def sweep_legacy_tag_dir(sf_dir: str) -> str | None:
    """Reclaim the pre-r12 (hash-less) tag directory for ``sf_dir``:
    the r12 tag change silently orphaned every layout written under
    the old form (ADVICE r12 low #4). Deterministic and safe — the
    old tag for THIS sf_dir is a pure function of the path, so
    nothing belonging to another dataset can match. Wired into the
    ``maintain`` CLI; returns the removed path or None."""
    legacy = re.sub(r"\W+", "_", sf_dir).strip("_")
    if legacy == _tag(sf_dir):
        return None
    p = os.path.join(_root(), legacy)
    if not os.path.isdir(p):
        return None
    shutil.rmtree(p, ignore_errors=True)
    return p


def gc_layout_generations(spark: SparkSession, sf_dir: str) -> dict[str, list[str]]:
    """Explicit GC sweep over every family of ``sf_dir``'s warehouse:
    removes retired generations past the grace window (the same rule
    every maintenance writer applies at commit time) and returns
    {family: [removed generation names]}. The ``maintain`` CLI's GC
    verb — for deployments where maintenance is rare but disk is not
    free."""
    tag = _tag(sf_dir)
    out: dict[str, list[str]] = {}
    base = os.path.join(_root(), tag)
    if not os.path.isdir(base):
        return out
    for alias in sorted(os.listdir(base)):
        root = os.path.join(base, alias)
        if not os.path.isdir(root) or _manifest(root) is None:
            continue
        with _maintenance_lock(root):
            _sweep_unlisted_gens(root)
            removed = _gc_generations(root)
        if alias == DAY_EVENTS_ALIAS and removed:
            _drop_day_tables(spark, tag, removed)
        if removed:
            out[alias] = removed
    return out


# ---------------------------------------------------------------------------
# Bucketed catalog tables (facts + events-by-user)
# ---------------------------------------------------------------------------


def _adopt_bucketed_table(
    spark: SparkSession, name: str, location: str, key: str, sort_cols: tuple[str, ...] | None = None
) -> None:
    """Register ``name`` OVER an existing bucketed generation on disk —
    the cross-session path (ADVICE r10 medium): the catalog entry died
    with its session, the files (including appended batches and their
    replay markers) did not. Spark recovers each file's bucket id from
    its name, so the join-elision property carries over intact. The
    SORTED BY clause must match the spec the files were written with
    (the spec-stamped fingerprint gates that upstream)."""
    sort_cols = sort_cols or (key,)
    schema = spark.read.parquet(location).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    sort_sql = ", ".join(sort_cols)
    spark.sql(
        f"CREATE TABLE {name} ({cols}) USING parquet "
        f"CLUSTERED BY ({key}) SORTED BY ({sort_sql}) INTO {N_BUCKETS} BUCKETS "
        f"LOCATION '{location}'"
    )


def _repoint_table(
    spark: SparkSession, name: str, gen: str, key: str, sort_cols: tuple[str, ...]
) -> None:
    """Point the serving table at ``gen`` with NO drop window: if the
    table exists elsewhere, one ``ALTER TABLE … SET LOCATION`` (a
    single catalog operation that preserves the bucket spec — a
    concurrent planner resolves the old location or the new one, both
    of which hold complete generations); if it doesn't exist, adopt.
    This is the catalog half of the manifest flip."""
    if spark.catalog.tableExists(name):
        loc = os.path.abspath(_table_location(spark, name))
        if loc != os.path.abspath(gen):
            spark.sql(f"ALTER TABLE {name} SET LOCATION '{gen}'")
            spark.catalog.refreshTable(name)
    else:
        _adopt_bucketed_table(spark, name, gen, key, sort_cols=sort_cols)


def _ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    source_table: str,
    key: str,
    alias: str | None = None,
    sort_cols: tuple[str, ...] | None = None,
) -> str:
    """One bucketed, sorted catalog table over ``source_table`` with
    the full layout lifecycle; returns the table name.

    Idempotence tiers: a registered table pointing at the intact,
    fingerprint-fresh CURRENT generation is reused as-is; a table
    pointing at a retired generation is re-pointed in one catalog op
    (``ALTER … SET LOCATION``); an intact current generation with no
    catalog entry (new session) is ADOPTED, never overwritten —
    streaming-ingested batches survive; anything else (no current
    generation, regenerated upstream fixture, changed spec)
    re-materializes from the lake into a NEW generation under the
    family lock. The write repartitions by the bucket column first so
    each bucket is exactly ONE file — the shape that lets the scan
    expose a per-bucket sort order and the merge join skip both the
    exchange AND the sort.
    """
    tag = _tag(sf_dir)
    alias = alias or source_table
    sort_cols = sort_cols or (key,)
    spec = {"bucket_key": key, "sort": list(sort_cols), "n_buckets": N_BUCKETS}
    name = f"wh_{alias}_{tag}"
    root = os.path.join(_root(), tag, alias)
    _migrate_legacy_layout(root)
    gen = _current_gen(root)
    if gen is None or not _layout_intact(gen, sf_dir, source_table, spec=spec):
        with _maintenance_lock(root):
            # double-checked: a peer may have materialized while we
            # waited on the lock
            gen = _current_gen(root)
            if gen is None or not _layout_intact(gen, sf_dir, source_table, spec=spec):
                if spark.catalog.tableExists(name):
                    # the registered files are stale/wrong-spec: serving
                    # them would be silently wrong, so a drop window
                    # here is correctness, not a swap artifact
                    spark.sql(f"DROP TABLE {name}")
                os.makedirs(root, exist_ok=True)
                new_gen = _next_gen_path(root)
                _sweep_unlisted_gens(root)
                # fingerprint snapshot precedes the read: see _write_fingerprint
                snap = source_fingerprint(sf_dir, source_table)
                (
                    load(spark, sf_dir, source_table)
                    .repartition(N_BUCKETS, F.col(key))
                    .write.bucketBy(N_BUCKETS, key)
                    .sortBy(*sort_cols)
                    .option("path", new_gen)
                    .mode("overwrite")
                    .format("parquet")
                    .saveAsTable(name)
                )
                _write_fingerprint(new_gen, sf_dir, source_table, snapshot=snap, spec=spec)
                _flip_manifest(root, os.path.basename(new_gen))
                _gc_generations(root)
                gen = new_gen
    _repoint_table(spark, name, gen, key, sort_cols)
    return name


def ensure_bucketed_facts(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Materialize ``orders`` and ``lineitem`` as bucketed, sorted
    catalog tables (bucket key = orderkey on both sides) and return
    their table names ``(orders_table, lineitem_table)`` — every
    orderkey equi-join between them then runs exchange-free (and
    sort-free while buckets are single files). Lifecycle per
    :func:`_ensure_bucketed`."""
    return (
        _ensure_bucketed(spark, sf_dir, "orders", "o_orderkey"),
        _ensure_bucketed(spark, sf_dir, "lineitem", "l_orderkey"),
    )


#: The events layout's physical contract — single-sourced so every
#: surface that writes or compacts it (ensure, maintain CLI, future
#: appenders) agrees; a call site with a drifted literal would compact
#: under the weaker spec and (honestly re-stamped) force a full
#: rebuild on the next ensure.
EVENTS_BUCKET_KEY = "user_id"
EVENTS_SORT_COLS = ("user_id", "ts")


def ensure_bucketed_events(spark: SparkSession, sf_dir: str) -> str:
    """Materialize ``events`` bucketed on ``user_id`` and sorted
    ``(user_id, ts)`` within each bucket (alias ``events_by_user`` —
    the DATE-partitioned events layout serves the range scans; THIS
    one serves the user-keyed self-joins and per-user time windows).
    The reference's flagship payment⋈order interval join keys on
    user/order ids (``PaymentWideApp.java:65-75``); with both
    self-join sides reading this layout the whole plan — filters,
    merge join with the interval residual, per-user aggregate — runs
    with zero exchanges and zero sorts (``bucketed_payment_wide``).
    The secondary ``ts`` sort additionally lets a ``PARTITION BY
    user_id ORDER BY ts RANGE`` window run sort-free
    (``bucketed_payment_enrich`` — the bounded-output serving form).
    Spec changes are safe against pre-existing warehouse dirs: the
    fingerprint is spec-stamped, so files written under a weaker sort
    fail the intact check and rebuild rather than being adopted with
    an ordering claim they don't satisfy."""
    return _ensure_bucketed(
        spark, sf_dir, "events", EVENTS_BUCKET_KEY, alias="events_by_user", sort_cols=EVENTS_SORT_COLS
    )


def _data_file_count(location: str) -> int:
    try:
        return sum(
            1 for f in os.listdir(location) if f.startswith("part-") and f.endswith(".parquet")
        )
    except OSError:
        return 0


def append_bucketed_batch(
    spark: SparkSession,
    table: str,
    batch_df: DataFrame,
    batch_id: int,
    key: str,
    sink_name: str = "bucketed_ingest",
    auto_compact_files: int | None = AUTO_COMPACT_FILES,
    sort_cols: tuple[str, ...] | None = None,
) -> bool:
    """Incremental ingest into a bucketed fact table from
    ``foreachBatch``: append the micro-batch with the SAME bucket
    spec (repartitioned to one file per bucket per batch), guarded by
    the engine's replay marker (``streaming/sinks._replay_guard_skip``
    — batch id + query lineage in the family root's ``_ingest`` dir,
    OUTSIDE the generations, so markers survive every compaction
    without copying). Returns True if the batch was applied, False if
    skipped as a replay.

    Scale contract: the join-elision property survives appends — the
    bucket partitioning is table-level metadata, so ``lineitem ⋈
    orders`` stays shuffle-free no matter how many batches land. The
    per-bucket SORT guarantee does NOT survive: each batch adds one
    file per bucket, and the scan only exposes an ordering when a
    bucket is a single file, so the merge join re-sorts (bucket-local,
    no exchange) until compaction. When the table fragments past
    ``auto_compact_files`` data files the append triggers
    :func:`compact_bucketed_table` — a ROW-PRESERVING rewrite into a
    fresh generation (pass ``None`` to keep compaction manual).
    Appends mutate the CURRENT generation in place, which is safe for
    concurrent readers: appends only ADD files (an already-planned
    scan keeps its file list; a scan planned mid-commit sees the
    batch or not — the marker guard makes either outcome replayable),
    they never delete.

    ``sort_cols`` must match the spec the table was created with
    (e.g. ``("user_id", "ts")`` for the events layout): Spark
    validates the writer's bucket spec — INCLUDING sort columns —
    against the existing table on append and raises, so a mismatch is
    a loud error, never silent sort-order corruption (pinned in
    tests/test_layout.py).

    At-least-once caveat (documented, same class as the SCD2/CMS
    sinks): the marker is written AFTER the append commits, so a
    crash in between replays one batch as duplicate rows; the rebuild
    path is the remedy, and the guard makes steady-state replays
    (Spark's normal restart behavior) exact skips.
    """
    from gmall_realtime2021_spark.streaming.sinks import (
        _replay_guard_skip,
        _write_batch_marker,
    )

    location = _table_location(spark, table)
    root = _family_root_of(location)
    # authoritative target = the manifest's CURRENT generation, not
    # this session's catalog pointer: a session that last ensured
    # before a FOREIGN process compacted would otherwise append into
    # the retired generation — rows invisible to current readers and
    # silently lost at its GC (r13 self-review). Repoint first.
    sort_cols = sort_cols or (key,)
    # the family lock serializes this append with maintenance: an
    # append racing a compaction could commit files AFTER the
    # compaction listed its input — the rewrite would then miss the
    # batch and the append would land in a generation about to retire
    # (r13 self-review, same lost-rows class as the stale-catalog
    # append). Auto-compaction below runs AFTER release — the lock is
    # deliberately not reentrant.
    with _maintenance_lock(root):
        cur = _current_gen(root)
        if cur is not None and os.path.abspath(location) != os.path.abspath(cur):
            _repoint_table(spark, table, cur, key, sort_cols)
            location = cur
        guard_dir = os.path.join(root, "_ingest")
        os.makedirs(guard_dir, exist_ok=True)
        skip, lineage = _replay_guard_skip(guard_dir, batch_id, spark, sink_name)
        if skip:
            return False
        (
            batch_df.repartition(N_BUCKETS, F.col(key))
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(*sort_cols)
            .mode("append")
            .format("parquet")
            .saveAsTable(table)
        )
        # foreachBatch hands us a CLONED session: its write invalidates
        # its own relation cache but not the parent session's cached
        # file listing — a reader that counted the table before the
        # stream would silently keep seeing the old files. Refresh
        # through the shared catalog so every session sees the batch.
        spark.catalog.refreshTable(table)
        _write_batch_marker(guard_dir, batch_id, lineage)
    if auto_compact_files is not None and _data_file_count(location) > auto_compact_files:
        compact_bucketed_table(spark, table, key, sort_cols=sort_cols)
    return True


def compact_bucketed_table(
    spark: SparkSession, table: str, key: str, sort_cols: tuple[str, ...] | None = None
) -> int:
    """Row-preserving compaction: rewrite the bucketed table — base
    rows plus every appended batch — into a NEW generation with ONE
    sorted file per bucket, restoring the zero-sort merge-join
    property without discarding ingested data (the lake-rebuild path,
    :func:`rebuild_bucketed_facts`, resets to upstream state instead).

    Concurrency contract (r13, VERDICT r12 item #1): compaction is
    INVISIBLE to readers. The rewrite lands beside the live
    generation, the manifest flips atomically, and the serving table
    re-points in one ``ALTER TABLE … SET LOCATION`` — there is no
    DROP window, and a scan planned against the old generation keeps
    its (retired but intact) files until the GC grace expires. A
    failure anywhere before the flip leaves an unlisted generation
    the next writer sweeps; the live table is never touched. The
    family lock is held for the whole write-flip-GC span and released
    on every exit path (ADVICE r12 medium #1). Returns the data-file
    count of the new generation (== the number of non-empty buckets).

    The carried fingerprint re-stamps the spec to what this
    compaction actually wrote: copying the old spec would let a
    compaction invoked with weaker sort_cols leave a generation
    claiming an ordering its files no longer have — a later
    cross-session adoption would then register that false ordering
    and a merge join / range window could return wrong rows. With the
    honest spec, the next ensure sees the mismatch and rebuilds
    instead.
    """
    location = _table_location(spark, table).rstrip("/")
    root = _family_root_of(location)
    sort_cols = sort_cols or (key,)
    tmp_name = f"{table}__compact"
    with _maintenance_lock(root):
        # re-resolve under the lock: a foreign writer may have flipped
        # the manifest after this session's catalog last re-pointed —
        # compacting from the retired generation would silently drop
        # every batch appended to the current one since (r13
        # self-review)
        cur = _current_gen(root)
        if cur is not None and os.path.abspath(location) != os.path.abspath(cur):
            _repoint_table(spark, table, cur, key, sort_cols)
            location = cur
        new_gen = _next_gen_path(root)
        _sweep_unlisted_gens(root)
        spark.sql(f"DROP TABLE IF EXISTS {tmp_name}")
        # Read the files as a PLAIN parquet path, not through the
        # table: against the catalog table the optimizer drops the
        # repartition as redundant (the bucket spec already
        # hash-partitions on the key) while autoBucketedScan — seeing
        # no join — simultaneously demotes the scan to file-split
        # partitioning, so tasks no longer align with buckets and each
        # task writes one file PER bucket it holds (observed: 44 files
        # instead of 16). The path read carries no bucket metadata, so
        # the explicit repartition survives and each write task holds
        # exactly one bucket.
        (
            spark.read.parquet(location)
            .repartition(N_BUCKETS, F.col(key))
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(*sort_cols)
            .option("path", new_gen)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(tmp_name)
        )
        spark.sql(f"DROP TABLE {tmp_name}")  # external: the generation's files stay
        old_fp = os.path.join(location, _FP_NAME)
        if os.path.isfile(old_fp):
            with open(old_fp) as fh:
                fp = json.load(fh)
            if "spec" in fp:
                fp["spec"] = {"bucket_key": key, "sort": list(sort_cols), "n_buckets": N_BUCKETS}
            with open(os.path.join(new_gen, _FP_NAME), "w") as fh:
                json.dump(fp, fh)
        _flip_manifest(root, os.path.basename(new_gen))
        _repoint_table(spark, table, new_gen, key, sort_cols)
        _gc_generations(root)
    return _data_file_count(new_gen)


def rebuild_bucketed_facts(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Lake repair: drop the bucketed tables AND their on-disk layout
    families (every generation, the manifest, and the replay markers)
    and re-materialize from the upstream parquet lake. Resets to
    upstream state — appended batches are discarded by design (use
    :func:`compact_bucketed_table` to defragment WITHOUT losing
    ingested rows). Restores the one-file-per-bucket shape and the
    zero-sort merge join."""
    tag = _tag(sf_dir)
    for table in ("orders", "lineitem"):
        name = f"wh_{table}_{tag}"
        if spark.catalog.tableExists(name):
            spark.sql(f"DROP TABLE {name}")
        root = os.path.join(_root(), tag, table)
        with _maintenance_lock(root):
            # the whole family goes: generations, manifest, markers —
            # plus any pre-r13 swap siblings a legacy crash stranded
            # (a surviving complete generation would otherwise be
            # migrated/adopted later, silently undoing the reset)
            for d in (root, root + "__precompact", root + "__compacting", root + "__gen1tmp"):
                shutil.rmtree(d, ignore_errors=True)
    return ensure_bucketed_facts(spark, sf_dir)


# ---------------------------------------------------------------------------
# Path-served families (events-by-day, IVF index, split corpus)
# ---------------------------------------------------------------------------


def _ensure_path_family(
    spark: SparkSession, sf_dir: str, alias: str, source_table: str, write_gen
) -> str:
    """Shared ensure for the manifest families served by PATH (no
    catalog table): resolve the current generation; when it is
    missing or stale (fingerprint mismatch), materialize a fresh
    generation under the family lock via ``write_gen(new_gen_path)``
    and flip. Returns the CURRENT generation path — the handle every
    reader scans; holding it across a later maintenance flip is the
    snapshot semantics (the retired generation stays intact for the
    GC grace window)."""
    root = os.path.join(_root(), _tag(sf_dir), alias)
    _migrate_legacy_layout(root)
    gen = _current_gen(root)
    if gen is not None and _layout_intact(gen, sf_dir, source_table):
        return gen
    with _maintenance_lock(root):
        gen = _current_gen(root)  # double-checked under the lock
        if gen is not None and _layout_intact(gen, sf_dir, source_table):
            return gen
        os.makedirs(root, exist_ok=True)
        new_gen = _next_gen_path(root)
        _sweep_unlisted_gens(root)
        # fingerprint snapshot precedes the read: see _write_fingerprint
        snap = source_fingerprint(sf_dir, source_table)
        write_gen(new_gen)
        _write_fingerprint(new_gen, sf_dir, source_table, snapshot=snap)
        _flip_manifest(root, os.path.basename(new_gen))
        _gc_generations(root)
        return new_gen


def ensure_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Materialize ``events`` date-partitioned (hive-style
    ``event_date=YYYY-MM-DD`` directories, one file per day via a
    pre-write repartition on the partition column) and return the
    CURRENT generation path. Lossless: every source column is
    preserved; ``event_date`` is derived as ``to_date(ts)`` in the
    session zone. Each (re)build writes a FRESH generation directory,
    so the partition-overwrite-mode hazards of in-place rebuilds
    (r12 review) cannot arise — stale day dirs from a previous
    incarnation live in a different generation and are GC'd, never
    silently merged. Day partitions ingested via
    :func:`upsert_event_days` are derived state and follow the same
    rebuild-from-source discipline as every maintenance sink in this
    engine."""

    def _write(new_gen: str) -> None:
        ev = load(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
        ev.repartition(F.col("event_date")).write.partitionBy("event_date").mode(
            "overwrite"
        ).parquet(new_gen)

    return _ensure_path_family(spark, sf_dir, "events", "events", _write)


def read_partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partitioned event log as a DataFrame (materializing it on
    first use)."""
    return spark.read.parquet(ensure_partitioned_events(spark, sf_dir))


def upsert_event_days(spark: SparkSession, sf_dir: str, batch_df: DataFrame, batch_id: int = -1) -> str:
    """Incremental ingest into the date-partitioned event log:
    per-day overwrite — only the ``event_date`` partitions present in
    the batch are replaced, every other day rides into the new
    generation as a HARDLINK (metadata cost, not bytes). This is the
    events-side twin of :func:`append_bucketed_batch` with a STRONGER
    delivery contract: a replayed batch produces a generation with
    the same rows for the same days, so the operation is naturally
    idempotent — exactly-once per partition without any replay marker
    (the reference's "idempotent write" claim for its ClickHouse
    sink, ``ClickHouseUtil.java:20-21``, realized properly). Readers
    overlapping the upsert keep serving the previous generation; the
    flip is atomic (r13).

    The trade (why both ingest paths exist): per-day overwrite
    requires each batch to carry COMPLETE days (a late-data trickle
    would erase the day's earlier rows), which fits
    backfill/compaction and day-grain micro-batches; the bucketed
    append fits row-grain trickle ingest and pays for it with the
    marker guard. ``batch_id`` is accepted for foreachBatch wiring
    symmetry; idempotence comes from the write shape, not the id.
    Returns the new current-generation path.
    """
    cur = ensure_partitioned_events(spark, sf_dir)
    root = _family_root_of(cur)
    if "event_date" not in batch_df.columns:
        batch_df = batch_df.withColumn("event_date", F.to_date("ts"))
    with _maintenance_lock(root):
        cur = _current_gen(root)  # re-resolve under the lock
        new_gen = _next_gen_path(root)
        _sweep_unlisted_gens(root)
        (
            batch_df.repartition(F.col("event_date"))
            .write.partitionBy("event_date")
            .mode("overwrite")
            .parquet(new_gen)
        )
        written = {d for d in os.listdir(new_gen) if d.startswith("event_date=")}
        for d in os.listdir(cur):
            if d.startswith("event_date=") and d not in written:
                _link_tree(os.path.join(cur, d), os.path.join(new_gen, d))
        _copy_sidecars(cur, new_gen, names=(_FP_NAME,))  # _SUCCESS written by Spark
        _flip_manifest(root, os.path.basename(new_gen))
        _gc_generations(root)
    return new_gen


def _re_match_day(day: str) -> bool:
    return bool(re.fullmatch(r"\d{4}-\d{2}-\d{2}", day))


def expire_event_days(spark: SparkSession, sf_dir: str, before: str) -> list[str]:
    """Retention for the date-partitioned event log: DROP every
    ``event_date`` partition strictly older than ``before``
    (``YYYY-MM-DD``), returning the dropped day strings. Under the
    generation scheme this is a pure METADATA operation — the new
    generation HARDLINKS every surviving day (no surviving row is
    read or rewritten; at 100 TB the difference between a retention
    job that finishes in seconds and one that rewrites the table —
    the reference ages its ClickHouse MergeTree parts the same way),
    and a reader overlapping the expiry keeps serving the previous
    generation until the GC grace expires, so retention can run
    against live traffic. The source fingerprint is intentionally
    carried unchanged: expiry is derived state (like appends), and a
    regenerated upstream fixture still rebuilds the full log.

    Refuses (ValueError) a cutoff that would drop EVERY remaining
    day: a data-less generation still carries ``_SUCCESS`` + a
    matching fingerprint, so the ensure gate would keep serving an
    unreadable layout — an all-day drop is a misconfigured retention,
    not a maintenance request.
    """
    if not _re_match_day(before):
        raise ValueError(
            f"expire_event_days cutoff must be zero-padded YYYY-MM-DD, got {before!r}: "
            "day partitions compare as STRINGS, so a malformed cutoff (e.g. '2024-6-1') "
            "would silently drop days AFTER the intended date — irreversible retention loss"
        )
    cur = ensure_partitioned_events(spark, sf_dir)
    root = _family_root_of(cur)
    with _maintenance_lock(root):
        cur = _current_gen(root)
        days = sorted(
            d.split("=", 1)[1] for d in os.listdir(cur) if d.startswith("event_date=")
        )
        doomed = [day for day in days if day < before]
        if not doomed:
            return []
        if len(doomed) == len(days):
            raise ValueError(
                f"expire_event_days(before={before!r}) would drop all {len(days)} "
                f"day partitions and leave an unreadable empty layout; "
                f"refusing — use rebuild (delete the layout family dir) to reset instead"
            )
        new_gen = _next_gen_path(root)
        _sweep_unlisted_gens(root)
        os.makedirs(new_gen)
        for day in days:
            if day not in doomed:
                d = f"event_date={day}"
                _link_tree(os.path.join(cur, d), os.path.join(new_gen, d))
        _copy_sidecars(cur, new_gen)  # _SUCCESS + fingerprint carry over
        _flip_manifest(root, os.path.basename(new_gen))
        _gc_generations(root)
    return doomed


def ensure_split_documents(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the corpus partitioned by its TRAIN/VAL/TEST split
    (the ``corpus_split`` assignment: content-hash mod 100 → 80/10/10,
    a pure function of the text, so the layout is as reproducible as
    the split itself) and return the current generation path.

    This is the corpus twin of the other at-rest layouts: a training
    job reads ``split=train`` without ever LISTING the val/test
    directories (metadata-level pruning — the leakage guarantee
    becomes a physical property, not just a filter), and eval-side
    consumers read their own slice the same way.
    ``maxRecordsPerFile`` bounds worst-case file sizes at scale.
    """
    from gmall_realtime2021_spark.functions.text import poly_hash

    def _write(new_gen: str) -> None:
        docs = load(spark, sf_dir, "documents")
        bucket = poly_hash(F.lower(F.col("text"))) % 100
        split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
        (
            docs.withColumn("split", split)
            .repartition(F.col("split"))
            .write.partitionBy("split")
            .option("maxRecordsPerFile", 1_000_000)
            .mode("overwrite")
            .parquet(new_gen)
        )

    return _ensure_path_family(spark, sf_dir, "documents_split", "documents", _write)


def read_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The split-partitioned corpus as a DataFrame (materializing on
    first use)."""
    return spark.read.parquet(ensure_split_documents(spark, sf_dir))


def ensure_ivf_embeddings(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the embeddings table as the AT-REST IVF index:
    rows ``(vec_id, embedding, norm)`` written ``partitionBy(cell)``
    (cell = nearest IVF centroid, norm precomputed with the engine's
    sequential-fold kernel — ``operators/similarity.ivf_assign``) and
    return the current generation path.

    This is the vector-search twin of the bucketed fact layout: the
    per-vector assignment pass moves from query time to ingest, and
    because ``cell`` is the partition column, a probe join prunes the
    scan to the probed cells' directories (static or dynamic
    partition pruning — ``ann_ivf_partitioned`` pins the dynamic
    form). At 100 TB a query batch reads n_probe/n_cells of the
    corpus instead of all of it. Same lifecycle as the other
    families: ``_SUCCESS`` + source fingerprint gate
    re-materialization into a fresh generation.
    """

    def _write(new_gen: str) -> None:
        from gmall_realtime2021_spark.operators.similarity import ivf_assign

        at_rest = ivf_assign(load(spark, sf_dir, "embeddings"))
        at_rest.repartition(F.col("cell")).write.partitionBy("cell").mode("overwrite").parquet(
            new_gen
        )

    return _ensure_path_family(spark, sf_dir, "embeddings_ivf", "embeddings", _write)


def read_ivf_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-rest IVF index as a DataFrame (materializing on first
    use)."""
    return spark.read.parquet(ensure_ivf_embeddings(spark, sf_dir))


#: Per-cell file-count threshold for IVF auto-compaction: each
#: appended batch adds at most one file per populated cell, so this is
#: ≈ the ingest-batch count a cell tolerates before its files rewrite.
IVF_AUTO_COMPACT_FILES = 8


def _fragmented_cells(gen: str, max_files_per_cell: int) -> list[int]:
    frag = []
    for d in os.listdir(gen):
        if d.startswith("cell="):
            n = sum(1 for f in os.listdir(os.path.join(gen, d)) if f.endswith(".parquet"))
            if n > max_files_per_cell:
                frag.append(int(d.split("=", 1)[1]))
    return frag


def compact_ivf_cells(
    spark: SparkSession, sf_dir: str, max_files_per_cell: int = IVF_AUTO_COMPACT_FILES
) -> int:
    """Row-preserving per-cell compaction for the at-rest IVF index:
    every ``cell=<j>`` directory holding more than
    ``max_files_per_cell`` parquet files is rewritten to a single
    file. Returns the number of cells compacted.

    Mechanics (r13): the fragmented cells' rows are written fresh
    into a NEW generation (one file per cell via a cell repartition);
    every untouched cell rides across as a HARDLINK — cost ∝ the
    fragmented cells' bytes plus a metadata op per untouched file,
    never the index — and the manifest flips atomically. Readers are
    never aware: a scan planned against the old generation keeps its
    intact files for the GC grace window, a scan planned after the
    flip reads the compacted cells; there is no per-cell swap window
    at all (the pre-r13 tomb dance is gone). The replay markers
    (``_ingest``) live at the family ROOT, outside any generation, so
    ingest idempotence survives compaction untouched.
    """
    ensure_ivf_embeddings(spark, sf_dir)
    root = os.path.join(_root(), _tag(sf_dir), "embeddings_ivf")
    with _maintenance_lock(root):
        gen = _current_gen(root)
        frag = _fragmented_cells(gen, max_files_per_cell)
        if not frag:
            return 0
        new_gen = _next_gen_path(root)
        _sweep_unlisted_gens(root)
        (
            spark.read.parquet(gen)
            .filter(F.col("cell").isin(frag))
            .repartition(F.col("cell"))
            .write.partitionBy("cell")
            .mode("overwrite")
            .parquet(new_gen)
        )
        frag_dirs = {f"cell={j}" for j in frag}
        for d in os.listdir(gen):
            if d.startswith("cell=") and d not in frag_dirs:
                _link_tree(os.path.join(gen, d), os.path.join(new_gen, d))
        _copy_sidecars(gen, new_gen, names=(_FP_NAME,))  # _SUCCESS written by Spark
        _flip_manifest(root, os.path.basename(new_gen))
        _gc_generations(root)
    return len(frag)


def append_ivf_batch(
    spark: SparkSession,
    sf_dir: str,
    batch_df: DataFrame,
    batch_id: int,
    sink_name: str = "ivf_ingest",
    auto_compact_files: int | None = IVF_AUTO_COMPACT_FILES,
) -> bool:
    """Incremental ingest into the at-rest IVF index from
    ``foreachBatch``: assign the micro-batch's vectors to their cells
    map-side (:func:`operators.similarity.ivf_assign` — same
    centroids, same norm fold as the base materialization) and APPEND
    into the current generation's ``cell=<j>`` directories, guarded
    by the engine's replay marker (family-root ``_ingest``). Returns
    True if applied, False if skipped as a replay.

    Scale contract: appends never rewrite existing files — each batch
    adds at most one file per populated cell — and the serving
    properties survive by construction: ``cell`` stays the partition
    column, so probe joins keep their (static or dynamic) partition
    pruning, and per-file row-group stats keep the scan
    skip-friendly. In-place appends are reader-safe for the same
    reason as the bucketed path: files are only ever ADDED to the
    live generation. Past ``auto_compact_files`` files in any cell
    the append triggers :func:`compact_ivf_cells` (row-preserving,
    fragmented cells only, new generation; ``None`` keeps compaction
    manual). The same at-least-once caveat as every marker-guarded
    sink applies; :func:`ensure_ivf_embeddings` after a
    source-fixture change is the rebuild remedy (appended vectors are
    derived state).

    Oracle note (shared with the bucketed-fact append): serving
    reflects ingested state, so after appends the REGISTERED
    ``ann_ivf_partitioned`` plan legitimately diverges from its
    lake-only DuckDB twin — the correctness harness always serves an
    ensure-only (lake-exact) layout; ingest is exercised in isolated
    warehouse dirs (``test_sinks.py::test_ivf_index_incremental_ingest``).
    """
    from gmall_realtime2021_spark.streaming.sinks import (
        _replay_guard_skip,
        _write_batch_marker,
    )

    from gmall_realtime2021_spark.operators.similarity import ivf_assign

    ensure_ivf_embeddings(spark, sf_dir)
    root = os.path.join(_root(), _tag(sf_dir), "embeddings_ivf")
    # serialized with maintenance for the same lost-rows reason as the
    # bucketed append: an append racing a cell compaction could land
    # files the rewrite never listed, in a generation about to retire.
    # Auto-compaction runs AFTER release (non-reentrant lock).
    with _maintenance_lock(root):
        gen = _current_gen(root)
        guard_dir = os.path.join(root, "_ingest")
        os.makedirs(guard_dir, exist_ok=True)
        skip, lineage = _replay_guard_skip(guard_dir, batch_id, spark, sink_name)
        if skip:
            return False
        (
            ivf_assign(batch_df)
            .repartition(F.col("cell"))
            .write.partitionBy("cell")
            .mode("append")
            .parquet(gen)
        )
        _write_batch_marker(guard_dir, batch_id, lineage)
    if auto_compact_files is not None:
        compact_ivf_cells(spark, sf_dir, max_files_per_cell=auto_compact_files)
    return True


# ---------------------------------------------------------------------------
# Layout observability
# ---------------------------------------------------------------------------

_BUCKET_ID_RE = re.compile(r"_(\d{5})\.c\d+")


def _unit_stats(units: dict[str, tuple[int, int]]) -> dict:
    """Aggregate (files, bytes) per unit → the per-family health row
    fragment: unit count, totals, and the fragmentation maximum."""
    files = sum(f for f, _ in units.values())
    return {
        "units": len(units),
        "data_files": files,
        "total_bytes": sum(b for _, b in units.values()),
        "max_files_per_unit": max((f for f, _ in units.values()), default=0),
    }


def _scan_units(location: str, unit_of) -> dict[str, tuple[int, int]]:
    """Walk a generation directory, attributing each data file to a
    unit (bucket id / partition dir). Pure filesystem METADATA: cost
    is bounded by the file count — the same information a manifest or
    catalog would serve on a real deployment — and no data file is
    opened."""
    units: dict[str, tuple[int, int]] = {}
    for r, _dirs, fs in os.walk(location):
        if os.path.basename(r) == "_ingest":
            continue
        for f in fs:
            if not f.endswith(".parquet"):
                continue
            rel = os.path.relpath(os.path.join(r, f), location)
            u = unit_of(rel)
            if u is None:
                continue
            try:
                st = os.stat(os.path.join(r, f))
            except OSError:
                # a concurrent append landed/renamed the file between
                # the walk and the stat — health monitoring exists for
                # exactly those windows, so report a slightly stale
                # count rather than crash the snapshot (r12 review)
                continue
            n, b = units.get(u, (0, 0))
            units[u] = (n + 1, b + st.st_size)
    return units


def _bucket_unit(rel: str) -> str | None:
    m = _BUCKET_ID_RE.search(os.path.basename(rel))
    return m.group(1) if m else None


def _partition_unit(rel: str) -> str | None:
    head = rel.split(os.sep, 1)[0]
    return head if "=" in head else None


def _generation_stats(gen_path: str) -> dict:
    """Manifest-level health fields for the family owning
    ``gen_path``: how many generations exist on disk and how many
    retired ones are awaiting GC (grace not yet expired) — the
    operator-visible cost of snapshot isolation (doubled disk until
    the grace window closes)."""
    root = _family_root_of(gen_path)
    m = _manifest(root) or {}
    gens = m.get("generations", {})
    return {
        "generations": sum(1 for d in os.listdir(root) if _GEN_RE.match(d)),
        "gc_pending": sum(
            1
            for name, meta in gens.items()
            if name != m.get("current") and meta.get("retired") is not None
        ),
    }


def layout_health_stats(spark: SparkSession, sf_dir: str) -> list[dict]:
    """Health snapshot of ALL at-rest layout families (VERDICT r11
    item #4): per family, how many units (buckets / day partitions /
    IVF cells / splits) exist, how many data files and bytes they
    hold, the worst per-unit file count, how many units sit past
    their compaction threshold, whether maintenance is due — plus
    (r13) the generation picture: total generation dirs on disk and
    how many retired generations await GC. The ``ivf_cell_stats``
    observability pattern generalized so an operator can QUERY when
    compaction is needed instead of learning it from maintenance-code
    internals.

    Thresholds mirror the auto-compaction triggers exactly:
    bucketed families fragment per TABLE past ``AUTO_COMPACT_FILES``
    total files (``append_bucketed_batch``), and their per-bucket
    sort-serving property (merge joins and range windows skip the
    sort only while every bucket is a single file) is surfaced as
    ``sorted_serving``; the IVF family fragments per CELL past
    ``IVF_AUTO_COMPACT_FILES`` (``append_ivf_batch``); the
    hive-partitioned families (events-by-day, documents-by-split)
    have idempotent whole-partition rewrites instead of appends, so
    no compaction is ever due — their rows carry the occupancy
    numbers only.
    """
    orders_t, lineitem_t = ensure_bucketed_facts(spark, sf_dir)
    events_t = ensure_bucketed_events(spark, sf_dir)
    rows: list[dict] = []
    for family, table in (
        ("facts_orders", orders_t),
        ("facts_lineitem", lineitem_t),
        ("events_by_user", events_t),
    ):
        gen = _table_location(spark, table)
        units = _scan_units(gen, _bucket_unit)
        stats = _unit_stats(units)
        rows.append(
            {
                "family": family,
                "kind": "bucketed",
                **stats,
                "fragmented_units": sum(1 for f, _ in units.values() if f > 1),
                "compact_due": stats["data_files"] > AUTO_COMPACT_FILES,
                "sorted_serving": stats["max_files_per_unit"] <= 1,
                **_generation_stats(gen),
            }
        )
    for family, gen, per_unit_cap in (
        ("events_by_day", ensure_partitioned_events(spark, sf_dir), None),
        ("embeddings_ivf", ensure_ivf_embeddings(spark, sf_dir), IVF_AUTO_COMPACT_FILES),
        ("documents_split", ensure_split_documents(spark, sf_dir), None),
        # the composed day+user serving layout (r13): day-grain
        # ingest replaces whole partitions (upsert_day_bucketed_events
        # — idempotent, freshly bucketed per day), so compaction is
        # never due; units are day partitions
        ("events_day_user", _table_location(spark, ensure_day_bucketed_events(spark, sf_dir)), None),
    ):
        units = _scan_units(gen, _partition_unit)
        stats = _unit_stats(units)
        frag = (
            sum(1 for f, _ in units.values() if f > per_unit_cap)
            if per_unit_cap is not None
            else 0
        )
        rows.append(
            {
                "family": family,
                "kind": "partitioned",
                **stats,
                "fragmented_units": frag,
                "compact_due": frag > 0,
                "sorted_serving": None,
                **_generation_stats(gen),
            }
        )
    return rows


# ---------------------------------------------------------------------------
# Day-partitioned + user-bucketed events (the date-bounded serving layout)
# ---------------------------------------------------------------------------

#: The composed layout's physical contract (see ensure_day_bucketed_events).
DAY_EVENTS_ALIAS = "events_day_user"


def ensure_day_bucketed_events(spark: SparkSession, sf_dir: str) -> str:
    """Materialize ``events`` PARTITIONED BY ``event_date`` AND
    bucketed/sorted on ``(user_id, ts)`` — the serving layout for
    date-bounded per-user queries (VERDICT r12 item #4). Returns the
    catalog table name.

    Why compose both: the user-bucketed layout alone serves the
    per-user range window exchange-free but must scan ALL history on
    every query (at years-of-events scale the scan dominates); the
    day-partitioned layout alone prunes the scan but pays a user_id
    shuffle for the window. Composed, a "payments in [day range]"
    query prunes to the window + lookback margin at PLANNING time
    (``PartitionFilters``) and still satisfies the window's
    hash(user_id) distribution from the bucket metadata — zero
    exchanges, one bucket-local sort (in-bucket order is per
    (day, bucket) file, so a multi-day scan re-sorts locally; pinned
    in ``tests/test_physical_plans.py``). This is the Spark
    re-expression of the reference's ClickHouse serving tables, which
    are likewise date-partitioned and ORDER BY-keyed MergeTrees
    (``ClickHouseUtil.java:31-76``).

    Lifecycle: same manifest/generation scheme as every family, with
    one twist — the serving TABLE NAME is per-generation
    (``wh_events_day_user_<tag>_g<N>``). Partitioned-table metadata
    tracks PER-PARTITION locations, so the flat families' single-ALTER
    repoint cannot re-point it atomically; instead every generation
    gets its OWN catalog table, created (and partition-recovered)
    BEFORE the manifest flips, so there is no drop window anywhere:
    a reader holding the previous generation's table name keeps
    serving that intact snapshot until its GC, and fresh ensures
    resolve the manifest to the current name. Superseded tables are
    dropped when their generation GCs. Day-grain ingest lands through
    :func:`upsert_day_bucketed_events` (complete-day replace, same
    contract as the unbucketed day log); per-user trickle stays on
    the bucketed twin.
    """
    tag = _tag(sf_dir)
    spec = _DAY_EVENTS_SPEC
    root = os.path.join(_root(), tag, DAY_EVENTS_ALIAS)
    _migrate_legacy_layout(root)
    gen = _current_gen(root)
    if gen is None or not _layout_intact(gen, sf_dir, "events", spec=spec):
        with _maintenance_lock(root):
            gen = _current_gen(root)
            if gen is None or not _layout_intact(gen, sf_dir, "events", spec=spec):
                os.makedirs(root, exist_ok=True)
                new_gen = _next_gen_path(root)
                _sweep_unlisted_gens(root)
                snap = source_fingerprint(sf_dir, "events")
                name = _day_table_name(tag, new_gen)
                spark.sql(f"DROP TABLE IF EXISTS {name}")
                ev = load(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
                (
                    ev.repartition(N_BUCKETS, F.col(EVENTS_BUCKET_KEY))
                    .write.partitionBy("event_date")
                    .bucketBy(N_BUCKETS, EVENTS_BUCKET_KEY)
                    .sortBy(*EVENTS_SORT_COLS)
                    .option("path", new_gen)
                    .mode("overwrite")
                    .format("parquet")
                    .saveAsTable(name)
                )
                _write_fingerprint(new_gen, sf_dir, "events", snapshot=snap, spec=spec)
                _flip_manifest(root, os.path.basename(new_gen))
                _drop_day_tables(spark, tag, _gc_generations(root))
                gen = new_gen
    name = _day_table_name(tag, gen)
    if not spark.catalog.tableExists(name):
        _adopt_day_bucketed_table(spark, name, gen)
    return name


#: Physical contract of the composed day+user layout.
_DAY_EVENTS_SPEC = {
    "bucket_key": EVENTS_BUCKET_KEY,
    "sort": list(EVENTS_SORT_COLS),
    "n_buckets": N_BUCKETS,
    "partition": "event_date",
}


def _day_table_name(tag: str, gen_path: str) -> str:
    num = int(_GEN_RE.match(os.path.basename(gen_path.rstrip("/"))).group(1))
    return f"wh_{DAY_EVENTS_ALIAS}_{tag}_g{num:07d}"


def _drop_day_tables(spark: SparkSession, tag: str, removed_gen_names: list[str]) -> None:
    """Drop the per-generation serving tables of GC'd generations —
    the catalog half of the day+user family's snapshot expiry."""
    for gname in removed_gen_names:
        m = _GEN_RE.match(gname)
        if m:
            spark.sql(f"DROP TABLE IF EXISTS wh_{DAY_EVENTS_ALIAS}_{tag}_g{int(m.group(1)):07d}")


def _adopt_day_bucketed_table(spark: SparkSession, name: str, gen: str) -> None:
    """Register a generation's serving table over its files (the
    cross-session / post-upsert path): partitioned + clustered DDL,
    then filesystem partition recovery."""
    schema = spark.read.parquet(gen).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    sort_sql = ", ".join(EVENTS_SORT_COLS)
    spark.sql(
        f"CREATE TABLE {name} ({cols}) USING parquet PARTITIONED BY (event_date) "
        f"CLUSTERED BY ({EVENTS_BUCKET_KEY}) SORTED BY ({sort_sql}) "
        f"INTO {N_BUCKETS} BUCKETS LOCATION '{gen}'"
    )
    spark.catalog.recoverPartitions(name)


def upsert_day_bucketed_events(
    spark: SparkSession, sf_dir: str, batch_df: DataFrame, batch_id: int = -1
) -> str:
    """Day-grain ingest into the composed day+user serving layout
    (r13 follow-through on VERDICT r12 item #4): the ``event_date``
    partitions present in the batch are replaced with freshly
    bucketed, ``(user_id, ts)``-sorted files; every other day rides
    into the new generation as a HARDLINK. Same complete-day contract
    and idempotence as :func:`upsert_event_days` (a replayed batch
    builds a generation with identical rows — no marker needed), same
    zero-window serving as the family's ensure: the new generation's
    table is created and partition-recovered BEFORE the manifest
    flips, readers on the previous generation's table name keep their
    snapshot until GC. Returns the new current table name.

    Scale contract: cost ∝ the batch's days (bucketed rewrite) plus a
    metadata op per untouched file — never history — and every
    serving property (PartitionFilters pruning, bucket-satisfied
    window distribution) holds on the new generation by construction
    because each (day, bucket) is written through the same
    partitionBy+bucketBy writer as the base materialization.
    ``batch_id`` is accepted for foreachBatch wiring symmetry.
    """
    ensure_day_bucketed_events(spark, sf_dir)
    tag = _tag(sf_dir)
    root = os.path.join(_root(), tag, DAY_EVENTS_ALIAS)
    if "event_date" not in batch_df.columns:
        batch_df = batch_df.withColumn("event_date", F.to_date("ts"))
    with _maintenance_lock(root):
        cur = _current_gen(root)
        new_gen = _next_gen_path(root)
        _sweep_unlisted_gens(root)
        tmp_name = f"wh_{DAY_EVENTS_ALIAS}_{tag}__ingest"
        spark.sql(f"DROP TABLE IF EXISTS {tmp_name}")
        (
            batch_df.repartition(N_BUCKETS, F.col(EVENTS_BUCKET_KEY))
            .write.partitionBy("event_date")
            .bucketBy(N_BUCKETS, EVENTS_BUCKET_KEY)
            .sortBy(*EVENTS_SORT_COLS)
            .option("path", new_gen)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(tmp_name)
        )
        spark.sql(f"DROP TABLE {tmp_name}")  # external: the files stay
        written = {d for d in os.listdir(new_gen) if d.startswith("event_date=")}
        for d in os.listdir(cur):
            if d.startswith("event_date=") and d not in written:
                _link_tree(os.path.join(cur, d), os.path.join(new_gen, d))
        _copy_sidecars(cur, new_gen, names=(_FP_NAME,))  # _SUCCESS written by Spark
        name = _day_table_name(tag, new_gen)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        _adopt_day_bucketed_table(spark, name, new_gen)  # registered BEFORE the flip
        _flip_manifest(root, os.path.basename(new_gen))
        _drop_day_tables(spark, tag, _gc_generations(root))
    return name
