"""Fast scratch-root selection for fixture, checkpoint and sink
temp directories.

Why this exists (round 13, measured): the suite's lifecycle fixtures —
streaming inboxes/checkpoints/sinks, collection persistence roots,
shard/z-order layouts, multimodal fixture renders — all landed in
``tempfile.mkdtemp()``'s default root (``/tmp``). On this rig ``/tmp``
sustains ~13 MB/s for fsync'd writes while any path under the home
filesystem sustains ~200-300 MB/s (same block device — the sandbox
throttles ``/tmp`` specifically; production boxes show the same class
of asymmetry when ``/tmp`` is a small tmpfs, a separate slow volume,
or quota-throttled). The cost was real and measured: the
`stream_watermark_counts` row (checkpoint commits + state-store deltas
+ a parquet sink, all under the scratch root) ran 26-27 s warm with
``/tmp`` scratch and 3.2-3.4 s with a fast root — the single largest
wall in the round-13 baseline bench (guide §6: I/O layout is part of
the plan).

Selection policy:

* ``SPARK_GRAFT_SCRATCH`` env var, when set, wins unconditionally
  (the deployment knows its disks).
* Otherwise the candidates — the system temp dir and
  ``~/.cache/chroma_rs_spark/scratch`` — are probed ONCE per process
  with an 8 MB fsync'd write (median of 3 — this host's documented
  1.8-4x drift waves can mispick on a single sample), and the faster
  root wins. The probe costs ~150 ms on a healthy disk and pays for
  itself three orders of magnitude over when it steers a streaming
  checkpoint off a throttled ``/tmp``.
* The winning root is persisted to a marker file under ``~/.cache``
  (24 h TTL) so child/sibling Python processes skip the ~48 MB of
  re-probe writes; delete the marker (or set ``SPARK_GRAFT_SCRATCH``)
  to force a re-probe.

This module intentionally does NOT touch ``spark.local.dir`` (shuffle
scratch): shuffle writes are buffered, never fsync'd, and measured
flat across roots here (dispatch-floor probe: 415 ms median on /tmp vs
793 ms on the "fast" root — host noise, no /tmp penalty); on a real
cluster that knob belongs to the deployment, not the library.
"""

from __future__ import annotations

import os
import tempfile
import time

_PROBE_BYTES = 8 << 20
_PROBE_REPS = 3
_MARKER_TTL_SEC = 24 * 3600
_cached_root: str | None = None


def _probe_seconds(d: str) -> float:
    """Median of _PROBE_REPS write+fsync probes under `d`; inf on
    failure. One sample is not trustworthy here: the host's measured
    1.8-4x drift waves can make the fast root momentarily look slow
    (ADVICE r13), while a throttled /tmp is consistently ~15-20x
    slower — the median keeps the decision on the persistent signal."""
    path = os.path.join(d, f".scratch_probe_{os.getpid()}")
    samples = []
    try:
        for _ in range(_PROBE_REPS):
            t0 = time.time()
            with open(path, "wb") as f:
                f.write(b"\0" * _PROBE_BYTES)
                f.flush()
                os.fsync(f.fileno())
            samples.append(time.time() - t0)
        samples.sort()
        return samples[len(samples) // 2]
    except OSError:
        return float("inf")
    finally:
        try:
            os.remove(path)
        except OSError:
            pass


def _marker_path() -> str:
    return os.path.join(
        os.path.expanduser("~"), ".cache", "chroma_rs_spark", "scratch_root"
    )


def _read_marker() -> str | None:
    """A fresh (<TTL) marker from a previous probe, if still usable."""
    try:
        p = _marker_path()
        if time.time() - os.path.getmtime(p) > _MARKER_TTL_SEC:
            return None
        with open(p) as f:
            root = f.read().strip()
        if not root:
            return None
        os.makedirs(root, exist_ok=True)
        return root if os.access(root, os.W_OK) else None
    except OSError:
        return None


def _write_marker(root: str) -> None:
    try:
        p = _marker_path()
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = f"{p}.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(root)
        os.replace(tmp, p)
    except OSError:
        pass  # marker is an optimization; probing still decided


def scratch_root() -> str:
    """The process-wide scratch root (created if missing)."""
    global _cached_root
    if _cached_root is not None:
        return _cached_root
    env = os.environ.get("SPARK_GRAFT_SCRATCH")
    if env:
        os.makedirs(env, exist_ok=True)
        _cached_root = env
        return env
    marker = _read_marker()
    if marker is not None:
        _cached_root = marker
        return marker
    sys_tmp = tempfile.gettempdir()
    home_cache = os.path.join(
        os.path.expanduser("~"), ".cache", "chroma_rs_spark", "scratch"
    )
    candidates = [sys_tmp]
    if os.path.abspath(home_cache) != os.path.abspath(sys_tmp):
        candidates.append(home_cache)
    best, best_t = sys_tmp, float("inf")
    for d in candidates:
        try:
            os.makedirs(d, exist_ok=True)
        except OSError:
            continue
        t = _probe_seconds(d)
        if t < best_t:
            best, best_t = d, t
    _write_marker(best)
    _cached_root = best
    return best


def mkscratch(prefix: str) -> str:
    """``tempfile.mkdtemp`` under the probed fast scratch root."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())
