"""Estimator state checkpoint/resume.

The reference has NO checkpointing (SURVEY.md §5.4: state lives in memory;
re-initialization comes from an external pose). This module adds it: the
smoother window, EKF state, and engine counters serialize to a single
``.npz`` (pytree leaves flattened by path), so a node can restart mid-mission
and resume smoothing where it left off.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1


def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray]) -> None:
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in leaves:
        key = prefix + jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)


def save_estimator(est, path: str) -> None:
    """Serialize a StateEstimator's resumable state to `path` (.npz)."""
    import contextlib

    # (state, time) must be captured ATOMICALLY: under the threaded wrapper
    # the filter thread rebinds both between any two reads here, and a
    # checkpoint pairing state k+1 with time k would re-integrate one
    # already-applied IMU period on resume. sync_lock is the filter lock.
    lock = getattr(est, "sync_lock", None)
    with lock if lock is not None else contextlib.nullcontext():
        ekf_state = est.ekf_state
        ekf_time = est._ekf_time
    data: Dict[str, np.ndarray] = {
        "__version__": np.asarray(FORMAT_VERSION),
        "n_keyposes": np.asarray(est._n_keyposes),
        "last_keypose_t": np.asarray(est._last_keypose_t if est._last_keypose_t is not None else -1),
        "ekf_time": np.asarray(ekf_time if ekf_time is not None else -1),
        "mode": np.asarray(est.mode.value),
        # Host int-ns keypose times (exact; the window's f32 timestamps
        # cannot reconstruct these at epoch scale). Fix attachment needs them.
        "keypose_times_ns": np.asarray(est._keypose_times_ns, np.int64),
        # Window timestamps are mission-relative seconds; the origin anchors
        # them back to epoch ns.
        "time_origin_ns": np.asarray(est._time_origin_ns),
    }
    _flatten(est.window, "window", data)
    if ekf_state is not None:
        _flatten(ekf_state, "ekf", data)
    # Atomic update: a crash mid-write must never leave a truncated .npz at
    # `path` (the node rewrites the checkpoint on every smoother update, and
    # a torn file would defeat the mid-mission-restart purpose).
    import os

    tmp = path + ".tmp"
    np.savez_compressed(tmp, **data)
    # np.savez appends .npz if missing — mirror that for the rename source.
    if not os.path.exists(tmp) and os.path.exists(tmp + ".npz"):
        tmp = tmp + ".npz"
    os.replace(tmp, path)


def load_estimator(est, path: str) -> None:
    """Restore state saved by save_estimator into a freshly constructed
    StateEstimator (same params/window geometry)."""
    from .ekf import EkfState
    from .state_estimator import SmootherMode

    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    if int(data["__version__"]) != FORMAT_VERSION:
        # NOT an assert: -O must not silently load an incompatible format.
        raise ValueError(
            f"checkpoint format {int(data['__version__'])} != {FORMAT_VERSION}"
        )

    def _unflatten(template, prefix):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        new_leaves = []
        for path_, leaf in leaves:
            key = prefix + jax.tree_util.keystr(path_)
            if key not in data and ".fix_" in key:
                # The fix_* pose-fix fields postdate some checkpoints: keep
                # the fresh template's defaults ("no fixes recorded"). Any
                # OTHER missing key still raises — a torn/corrupted file
                # must fail loudly, not silently reset state.
                arr = np.asarray(leaf)
            else:
                arr = data[key]
            tmpl_shape = getattr(leaf, "shape", None)
            if tmpl_shape is not None and tuple(arr.shape) != tuple(tmpl_shape):
                if ".lmk_" in key:
                    # max_landmarks changed between save and load (e.g. the
                    # r4 default 0 -> 16): landmark history is additive
                    # evidence, not core state — resume with empty columns
                    # rather than refusing the whole mission checkpoint.
                    arr = np.asarray(leaf)
                else:
                    # Anything else mis-shaped means the window geometry
                    # changed (window/max_ranges/n_imu config): unflattening
                    # it silently would corrupt every downstream jit — fail
                    # loudly with the actual mismatch.
                    raise ValueError(
                        f"checkpoint field {key} shape {tuple(arr.shape)} != "
                        f"configured {tuple(tmpl_shape)} — estimator was "
                        "built with different window geometry than the saved "
                        "mission"
                    )
            new_leaves.append(jnp.asarray(arr, getattr(leaf, "dtype", None)))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    est.window = _unflatten(est.window, "window")
    # "ekf." = the flattened EKF tree prefix. NOT bare "ekf": the scalar
    # "ekf_time" key is always present, which would force this branch (and a
    # KeyError in _unflatten) for checkpoints saved before EKF init.
    if any(k.startswith("ekf.") or k.startswith("ekf[") for k in data):
        if est.ekf_state is None:
            from .ekf import ekf_initialize

            est.ekf_state = ekf_initialize(dtype=jnp.float64)
        est.ekf_state = _unflatten(est.ekf_state, "ekf")
    est._n_keyposes = int(data["n_keyposes"])
    est._time_origin_ns = int(data.get("time_origin_ns", 0))
    if "keypose_times_ns" in data:
        est._keypose_times_ns = [int(t) for t in data["keypose_times_ns"]]
    else:
        # Pre-fix_* checkpoint: approximate from the window's (possibly f32)
        # MISSION-RELATIVE timestamps, re-anchored by the restored origin so
        # the result is in the same epoch-ns base as fix stamps and
        # _last_keypose_t — fix attachment on resumed pre-upgrade missions
        # may still miss (f32 quantization), but nothing else reads these.
        ts = np.asarray(est.window.timestamps, np.float64)
        est._keypose_times_ns = [
            int(round(ts[k] * 1e9)) + est._time_origin_ns
            for k in range(est._n_keyposes)
        ]
    lk = int(data["last_keypose_t"])
    est._last_keypose_t = lk if lk >= 0 else None
    et = int(data["ekf_time"])
    est._ekf_time = et if et >= 0 else None
    est.mode = SmootherMode(int(data["mode"]))
