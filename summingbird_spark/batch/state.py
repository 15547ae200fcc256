"""Batch run state — the exactly-once commit protocol.

Reference: ``WaitingState`` checkpointing (ScaldingPlatform.scala:788-841:
``state.begin.willAccept(interval) → run → succeed | fail``), implemented
by ``HDFSState`` (summingbird-batch-hadoop/.../state/HDFSState.scala:29-99)
and ``CheckpointState`` (.../state/CheckpointState.scala:1-171) over
versioned directories with atomic success markers
(FileVersionTracking.scala:1-73).

Here: a tiny JSON ledger of committed batch intervals next to the store.
``begin(lo, hi)`` narrows the request to what is not yet committed
(startFromNextInterval analog), refuses non-contiguous requests, and the
returned RunningState must be resolved exactly once. Together with the
store's atomic ``_SUCCESS``-marked snapshot writes this gives the same
guarantee the reference has: a batch is either fully committed (snapshot +
ledger entry) or invisible.

Concurrency model: one writer per store, enforced by detection rather
than locking — succeed() refuses to commit if the ledger moved since
begin() (two double-scheduled runs: the loser fails loudly after the
winner's snapshot+ledger are complete). Like the reference's
HDFSState-over-version-dirs, runs that overlap IN FLIGHT on the same
version directory are the scheduler's contract to prevent; the ledger
guard bounds the blast radius to a loud error instead of a silent
double-append.
"""

from __future__ import annotations

import json
import os
import tempfile
import warnings
from typing import Optional


class StateError(Exception):
    pass


# filesystems where POSIX advisory locks (flock) can be silent no-ops —
# the commit guard degrades to best-effort there (ADVICE r10)
_NETWORK_FS_TYPES = frozenset(
    {"nfs", "nfs4", "cifs", "smb3", "smbfs", "9p", "afs", "ceph",
     "glusterfs", "lustre", "beegfs", "sshfs", "davfs", "davfs2"}
)


def _mount_fs_type(path: str, mounts_file: str = "/proc/mounts") -> Optional[str]:
    """Filesystem type of the mount holding ``path`` (longest-prefix match
    over the mount table), or None when undeterminable (non-Linux, no
    /proc). Best-effort by design — a miss only skips a warning."""
    try:
        real = os.path.realpath(path)
        best_len, fs_type = -1, None
        with open(mounts_file) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 3:
                    continue
                # octal escapes (\040 for space) per proc(5); a malformed
                # escape (e.g. trailing backslash) raises UnicodeDecodeError
                # — skip that mount line rather than abort the whole scan
                # (ADVICE r11: this is a cosmetic warning, never a crash)
                try:
                    mnt = parts[1].encode().decode("unicode_escape")
                except ValueError:
                    continue
                if real == mnt or real.startswith(mnt.rstrip("/") + "/"):
                    if len(mnt) > best_len:
                        best_len, fs_type = len(mnt), parts[2]
        return fs_type
    except OSError:
        return None


def _warn_if_lock_unreliable(path: str, mounts_file: str = "/proc/mounts") -> bool:
    """Warn (once per call site semantics — callers invoke at init) when
    ``path`` lives on a filesystem where flock is advisory-at-best, so the
    concurrent-commit guard in ``_commit`` degrades to the scheduler's
    single-writer contract alone. Returns True iff it warned."""
    fs = _mount_fs_type(path, mounts_file)
    if fs is None:
        return False
    base = fs.split(".", 1)  # fuse.sshfs → ("fuse", "sshfs")
    networky = (
        fs in _NETWORK_FS_TYPES
        or base[0] == "fuse"
        or (len(base) == 2 and base[1] in _NETWORK_FS_TYPES)
    )
    if networky:
        warnings.warn(
            f"CheckpointState at {path!r} is on a {fs!r} filesystem: flock "
            "may be a no-op there, so the concurrent-commit guard is "
            "best-effort — rely on the scheduler's single-writer contract "
            "(see module docstring)",
            RuntimeWarning,
            stacklevel=3,
        )
        return True
    return False


class CheckpointState:
    """Tracks the exclusive upper batch bound committed so far."""

    def __init__(self, path: str, start_batch: Optional[int] = None):
        self.path = path
        self._file = os.path.join(path, "state.json")
        self.start_batch = start_batch
        os.makedirs(path, exist_ok=True)
        _warn_if_lock_unreliable(path)

    def _load(self) -> dict:
        if not os.path.exists(self._file):
            return {"committed_through": None, "history": []}
        with open(self._file) as f:
            return json.load(f)

    def committed_through(self) -> Optional[int]:
        return self._load()["committed_through"]

    def begin(self, through_batch: int) -> "RunningState":
        """willAccept: compute the still-uncommitted interval
        (last_committed, through]."""
        st = self._load()
        last = st["committed_through"]
        if last is None:
            lo = self.start_batch
        else:
            lo = last + 1
        if last is not None and through_batch <= last:
            raise StateError(
                f"interval through batch {through_batch} already committed "
                f"(state at {last})"
            )
        return RunningState(self, lo, through_batch, expected_last=last)

    def _commit(self, lo: Optional[int], hi: int, expected_last) -> None:
        # the load-check-replace below must be one atomic step or the
        # optimistic check is itself a TOCTOU window (two succeed()s
        # interleaving their loads both pass it — review r10). flock
        # serializes committers on this host and is released by the
        # kernel on process death, so no stale-lock recovery is needed;
        # cross-host stores need the scheduler's single-writer contract
        # (module docstring) just like the reference's HDFSState.
        import fcntl

        lock_fd = os.open(os.path.join(self.path, ".commit.lock"),
                          os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(lock_fd, fcntl.LOCK_EX)
            st = self._load()
            # optimistic-concurrency check: the ledger must still be
            # where begin() saw it. A double-scheduled run (two crons, a
            # retry racing the original) would otherwise silently append
            # the same interval twice while both writers raced the
            # store's version dir — the lost-update this protocol exists
            # to prevent. The loser fails loudly here, AFTER the
            # winner's snapshot+ledger are complete and consistent.
            if st["committed_through"] != expected_last:
                raise StateError(
                    f"concurrent commit detected: ledger moved from "
                    f"{expected_last} to {st['committed_through']} since "
                    f"begin(); refusing to double-commit through {hi}"
                )
            st["history"].append({"lo": lo, "hi": hi})
            st["committed_through"] = hi
            # atomic replace — the HDFSState success-marker analog
            fd, tmp = tempfile.mkstemp(dir=self.path)
            with os.fdopen(fd, "w") as f:
                json.dump(st, f)
            os.replace(tmp, self._file)
        finally:
            os.close(lock_fd)  # releases the flock


class RunningState:
    """Must be resolved exactly once: succeed() or fail()."""

    def __init__(
        self,
        state: CheckpointState,
        lo_batch: Optional[int],
        hi_batch: int,
        expected_last: Optional[int] = None,
    ):
        self.state = state
        self.lo_batch = lo_batch
        self.hi_batch = hi_batch
        self._expected_last = expected_last
        self._resolved = False

    def succeed(self) -> None:
        if self._resolved:
            raise StateError("state already resolved")
        self._resolved = True
        self.state._commit(self.lo_batch, self.hi_batch, self._expected_last)

    def fail(self, err: Optional[BaseException] = None) -> None:
        if self._resolved:
            raise StateError("state already resolved")
        self._resolved = True  # nothing written — the batch stays uncommitted


def run_batch_job(
    spark,
    store,
    deltas,
    batcher,
    through_batch: int,
    state: CheckpointState,
    value_col: str = "value",
    **rollforward_kwargs,
):
    """The Scalding.run analog: begin → rollforward → succeed/fail.
    Returns the new snapshot DataFrame, or raises after recording failure.
    """
    from .store import rollforward

    running = state.begin(through_batch)
    try:
        snap = rollforward(
            spark, store, deltas, batcher, through_batch, value_col=value_col,
            **rollforward_kwargs,
        )
        # force materialization before declaring success
        snap.count()
    except BaseException as e:
        running.fail(e)
        raise
    running.succeed()
    return snap
