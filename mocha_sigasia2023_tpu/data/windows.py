"""Clip windowing as batched gathers.

The reference slices windows in Python loops (generate_database.py:57-84,
data_loader.py:195-206).  Here windowing is an index matrix built once on
the host and applied as a single device gather, so thousands of sliding
windows (the streaming runtime featurizes one window per frame,
test_fullframework.py:127-128) materialize as one batched op.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp


def padded_window_indices(T: int, window: int, step: int) -> Tuple[np.ndarray, np.ndarray]:
    """Index/pad-mask matrices with the preprocess-variant semantics
    (generate_database.py:66-84): start positions range(0, T - window//4,
    step); short tail windows are padded by repeating the slice's first
    element on the left ((deficit+1)//2 entries) and last element on the
    right (deficit//2).

    Returns (idx, is_pad) of shape (num_windows, window); velocity-like
    channels zero the padded entries (vel_ang=True in the reference).
    """
    starts = np.arange(0, max(T - window // 4, 0), step)
    idx = np.zeros((len(starts), window), dtype=np.int32)
    pad = np.zeros((len(starts), window), dtype=bool)
    for w, j in enumerate(starts):
        L = min(window, T - j)
        deficit = window - L
        left = deficit // 2 + deficit % 2
        right = deficit // 2
        idx[w, :left] = j
        idx[w, left : left + L] = np.arange(j, j + L)
        idx[w, left + L :] = j + L - 1
        pad[w, :left] = True
        pad[w, left + L :] = True
    return idx, pad


def full_window_indices(T: int, window: int, step: int) -> np.ndarray:
    """Training-variant windowing (data_loader.py:195-206): same start range
    but short windows are dropped."""
    starts = [j for j in range(0, max(T - window // 4, 0), step) if T - j >= window]
    starts = np.asarray(starts, dtype=np.int32)
    return starts[:, None] + np.arange(window, dtype=np.int32)[None, :]


def gather_windows(x, idx, pad_mask=None):
    """Apply an index matrix along axis 0: (T, ...) -> (W, window, ...);
    padded entries optionally zeroed (velocity semantics)."""
    out = jnp.asarray(x)[idx]
    if pad_mask is not None:
        mask = jnp.asarray(~pad_mask, dtype=out.dtype)
        out = out * mask.reshape(mask.shape + (1,) * (out.ndim - 2))
    return out


def reflect_pad_to(x: np.ndarray, target: int) -> np.ndarray:
    """Whole-clip reflect padding for the divide=False path
    (generate_database.py:18-37): symmetric ping-pong reflection extending
    the clip to ``target`` frames (left-biased on odd deficits)."""
    T = len(x)
    if T >= target:
        return x

    def reflection(src, tlen):
        seg = np.flip(src, axis=0)
        out = seg.copy()
        while len(out) < tlen:
            seg = np.flip(seg, axis=0)
            out = np.concatenate([out, seg], axis=0)
        return out[:tlen]

    deficit = target - T
    left_len = deficit // 2 + deficit % 2
    right_len = deficit // 2
    left = np.flip(reflection(np.flip(x, axis=0), left_len), axis=0)
    right = reflection(x, right_len)
    return np.concatenate([left, x, right], axis=0)


def whole_clip_padded(features: Dict, min_multiple: int = 4, min_len: int = 12) -> Dict:
    """divide=False path (generate_database.py:58-63): pad the whole clip to
    the next multiple of ``min_multiple`` plus ``min_multiple`` (minimum
    ``min_len``) with reflect padding."""
    T = int(features["positions"].shape[0])
    target = max((T // min_multiple) * min_multiple + min_multiple, min_len)
    out = {}
    for k in ("positions", "velocities", "rotations", "angular_velocities", "contacts"):
        out[k] = jnp.asarray(reflect_pad_to(np.asarray(features[k]), target))
    for k in ("bone_parents", "bone_names"):
        out[k] = features[k]
    return out


def window_features(features: Dict, window: int = 60, step: int = 20,
                    *, padded: bool = True) -> Dict:
    """Window a featurized clip into (W, window, J, C) arrays.

    ``padded=True`` uses the preprocess semantics (tail windows repeat-
    padded, velocity channels zeroed in the pad); ``padded=False`` uses the
    training semantics (short windows dropped).
    """
    T = int(features["positions"].shape[0])
    if padded:
        idx, pad = padded_window_indices(T, window, step)
        vel_pad = pad
    else:
        idx = full_window_indices(T, window, step)
        pad, vel_pad = None, None
    return {
        "positions": gather_windows(features["positions"], idx),
        "velocities": gather_windows(features["velocities"], idx, vel_pad),
        "rotations": gather_windows(features["rotations"], idx),
        "angular_velocities": gather_windows(features["angular_velocities"], idx, vel_pad),
        "contacts": gather_windows(features["contacts"], idx),
    }
