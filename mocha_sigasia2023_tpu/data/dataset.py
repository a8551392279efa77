"""Windowed training features + normalization stats.

Semantics target: /root/reference/data_loader.py (MotionDataset:9-192).
The per-window feature math (character-space X, root-pinned-to-last-frame,
parent-local Y with re-derived finite-difference velocities) is one jitted
batched function shared by training and the streaming runtime — the
reference duplicates it in three places (data_loader.py:64-104,
test_fullframework.py:141-185, compute_cnt_norm.py:131-153).

Feature layout per joint (the contract everything shares, 15 channels):
    [pos(3), xform_xy(6), vel(3), ang(3)]
X = character-space (root-relative), Y = parent-local; the root bone row is
dropped before the network (trainer.py:116-117).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Iterator

import numpy as np
import jax
import jax.numpy as jnp

from ..kinematics import quat
from ..io.database import load_database
from .windows import full_window_indices


def window_vel(pos, fps=60.0):
    """Central difference along the window axis (axis 1) with endpoint
    extrapolation (data_loader.py:91-96).

    Public contract shared with the streaming runtime: the hoisted
    featurizer (runtime/features.py `_stream_chunk_outputs`) re-derives Y
    velocities with EXACTLY these finite-difference semantics — edits here
    change both training features and served streams."""
    inner = 0.5 * (pos[:, 2:] - pos[:, 1:-1]) * fps + \
            0.5 * (pos[:, 1:-1] - pos[:, :-2]) * fps
    first = inner[:, 0] - (inner[:, 2] - inner[:, 1])
    last = inner[:, -1] + (inner[:, -1] - inner[:, -2])
    return jnp.concatenate([first[:, None], inner, last[:, None]], axis=1)


def window_ang(rot, fps=60.0):
    """(data_loader.py:99-104); shares :func:`window_vel`'s contract."""
    fwd = quat.to_scaled_angle_axis(quat.abs_(quat.mul_inv(rot[:, 2:], rot[:, 1:-1])))
    bwd = quat.to_scaled_angle_axis(quat.abs_(quat.mul_inv(rot[:, 1:-1], rot[:, :-2])))
    inner = 0.5 * fwd * fps + 0.5 * bwd * fps
    first = inner[:, 0] - (inner[:, 2] - inner[:, 1])
    last = inner[:, -1] + (inner[:, -1] - inner[:, -2])
    return jnp.concatenate([first[:, None], inner, last[:, None]], axis=1)


# backward-compat aliases (pre-round-4 private names)
_window_vel = window_vel
_window_ang = window_ang


def window_xy_features(Yrot, Ypos, Yvel, Yang, parents):
    """Windowed local pose -> (X, Y, root) feature tensors.

    Inputs are (B, T, J, ·) windows of parent-local pose+velocity.  Steps
    (data_loader.py:64-104):
      1. local root velocities Yrvel/Yrang in body coordinates,
      2. FK-with-velocities to world,
      3. pin every frame's root track to the window's LAST frame,
      4. character-space X features relative to that pinned root,
      5. IK back to parent-local Y (root rows become identity/zero),
      6. re-derive Y velocities by finite difference within the window.

    Returns X (B,T,J,15), Y (B,T,J,15), root (B,T,6).
    """
    window = Yrot.shape[1]

    Yrvel = quat.inv_mul_vec(Yrot[:, :, 0], Yvel[:, :, 0])
    Yrang = quat.inv_mul_vec(Yrot[:, :, 0], Yang[:, :, 0])

    Grot, Gpos, Gvel, Gang = quat.fk_vel(Yrot, Ypos, Yvel, Yang, parents)

    def pin_last(a):
        return a.at[:, :, 0:1].set(
            jnp.repeat(a[:, -1:, 0:1], window, axis=1))

    Grot, Gpos = pin_last(Grot), pin_last(Gpos)
    Gvel, Gang = pin_last(Gvel), pin_last(Gang)

    root_rot = Grot[:, :, 0:1]
    Xpos = quat.inv_mul_vec(root_rot, Gpos - Gpos[:, :, 0:1])
    Xrot = quat.inv_mul(root_rot, Grot)
    Xtxy = quat.to_xform_xy(Xrot)
    Xvel = quat.inv_mul_vec(root_rot, Gvel)
    Xang = quat.inv_mul_vec(root_rot, Gang)

    Yrot2, Ypos2 = quat.ik(Xrot, Xpos, parents)
    Ytxy = quat.to_xform_xy(Yrot2)
    Yvel2 = window_vel(Ypos2)
    Yang2 = window_ang(Yrot2)

    b, t, j = Xpos.shape[:3]
    X = jnp.concatenate(
        [Xpos, Xtxy.reshape(b, t, j, 6), Xvel, Xang], axis=-1)
    Y = jnp.concatenate(
        [Ypos2, Ytxy.reshape(b, t, j, 6), Yvel2, Yang2], axis=-1)
    root = jnp.concatenate([Yrvel, Yrang], axis=-1)
    return X, Y, root


@functools.lru_cache(maxsize=8)
def _window_features_jit(parents_key):
    parents = np.asarray(parents_key)

    @jax.jit
    def fn(Yrot, Ypos, Yvel, Yang):
        return window_xy_features(Yrot, Ypos, Yvel, Yang, parents)

    return fn


def compute_window_features(Yrot, Ypos, Yvel, Yang, parents, batch=2048):
    """Jit-cached, chunked wrapper (bounds device memory on large datasets).

    The tail chunk is padded up to the bucket size so every dataset size
    compiles at most two shapes (full bucket + a sub-bucket when the whole
    set is smaller) — remote TPU compiles are expensive.
    """
    fn = _window_features_jit(tuple(int(p) for p in parents))
    n = len(Yrot)
    outs = []
    for i in range(0, n, batch):
        sl = slice(i, i + batch)
        chunk = [Yrot[sl], Ypos[sl], Yvel[sl], Yang[sl]]
        pad = 0
        if n > batch and len(chunk[0]) < batch:
            pad = batch - len(chunk[0])
            chunk = [np.concatenate(
                [c, np.repeat(np.asarray(c[-1:]), pad, axis=0)], axis=0)
                for c in chunk]
        out = fn(*(jnp.asarray(c) for c in chunk))
        out = [np.asarray(o) for o in out]
        if pad:
            out = [o[:-pad] for o in out]
        outs.append(out)
    X = np.concatenate([o[0] for o in outs], axis=0)
    Y = np.concatenate([o[1] for o in outs], axis=0)
    root = np.concatenate([o[2] for o in outs], axis=0)
    return X, Y, root


def compute_norm_stats(X, Y, root) -> Dict[str, np.ndarray]:
    """Per-joint-channel mean/std over (windows, frames)
    (data_loader.py:107-152); std floored with +1e-6."""
    def ms(a):
        return (a.mean(axis=(0, 1)).astype(np.float32),
                a.std(axis=(0, 1)).astype(np.float32))

    X_mean, X_std = ms(X)
    Y_mean, Y_std = ms(Y)
    root_mean, root_std = ms(root)
    return {
        "X_mean": X_mean, "X_std": X_std + 1e-6,
        "Y_mean": Y_mean, "Y_std": Y_std + 1e-6,
        "root_mean": root_mean, "root_std": root_std,
    }


class MotionDataset:
    """Windowed motion dataset over a packed database.bin
    (MotionDataset, data_loader.py:9-192).

    Items are dicts {X (60,25,15), Y (60,25,15), root (60,6),
    contact (60,2), label} as float32 numpy; stats are cached to norm.npz
    next to the database.
    """

    def __init__(self, data_dir: str, phase: str = "train",
                 window: int = 60, window_step: int = 20):
        name = "database_test.bin" if phase == "test" else "database.bin"
        db = load_database(os.path.join(data_dir, name))
        norm_path = os.path.join(data_dir, "norm.npz")

        parents = db["bone_parents"]
        starts, stops = db["range_starts"], db["range_stops"]

        idx_all, labels, actions = [], [], []
        for i in range(len(starts)):
            idx = full_window_indices(
                int(stops[i] - starts[i]), window, window_step) + int(starts[i])
            idx_all.append(idx)
            labels += [int(db["style_labels"][i])] * len(idx)
            actions += [int(db["action_labels"][i])] * len(idx)
        idx_all = np.concatenate(idx_all, axis=0)

        Ypos = db["bone_positions"].astype(np.float32)[idx_all]
        Yvel = db["bone_velocities"].astype(np.float32)[idx_all]
        Yrot = db["bone_rotations"].astype(np.float32)[idx_all]
        Yang = db["bone_angular_velocities"].astype(np.float32)[idx_all]
        contacts = db["contact_states"].astype(np.float32)[idx_all]

        X, Y, root = compute_window_features(Yrot, Ypos, Yvel, Yang, parents)

        if not os.path.exists(norm_path):
            np.savez_compressed(norm_path, **compute_norm_stats(X, Y, root))

        self.X = X.astype(np.float32)
        self.Y = Y.astype(np.float32)
        self.root = root.astype(np.float32)
        self.contact = contacts
        self.label = np.asarray(labels, dtype=np.int32)
        self.action = np.asarray(actions, dtype=np.int32)
        self.parents = np.asarray(parents)
        self.norm = {k: v for k, v in np.load(norm_path).items()}

    def __len__(self):
        return len(self.X)

    def __getitem__(self, index):
        return {
            "X": self.X[index],
            "Y": self.Y[index],
            "root": self.root[index],
            "contact": self.contact[index],
            "label": self.label[index],
        }


def iterate_batches(dataset: MotionDataset, batch_size: int, *,
                    shuffle: bool = True, drop_last: bool = True,
                    seed: int = 0, epoch: int = 0) -> Iterator[Dict]:
    """Host-side batch iterator (replaces the torch DataLoader,
    data_loader.py:209-217): shuffled index epochs, stacked numpy dicts."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.RandomState(seed + epoch).shuffle(order)
    stop = n - (n % batch_size) if drop_last else n
    for i in range(0, stop, batch_size):
        sel = order[i:i + batch_size]
        yield {
            "X": dataset.X[sel],
            "Y": dataset.Y[sel],
            "root": dataset.root[sel],
            "contact": dataset.contact[sel],
            "label": dataset.label[sel],
        }


def prefetch_batches(batches: Iterator[Dict], *, place=None,
                     depth: int = 2) -> Iterator[Dict]:
    """Prefetching wrapper over a batch iterator: a background thread
    gathers (and optionally device-places) up to ``depth`` batches ahead,
    so host batch assembly and H2D transfer overlap the device step.

    Role parity: the reference's ``DataLoader(num_workers=4,
    pin_memory=True)`` (/root/reference/data_loader.py:209-217).  One
    thread suffices here — the features are precomputed arrays in RAM, so
    "loading" is a fancy gather; parallel workers would only add IPC.

    ``place``: optional callable applied in the worker thread, e.g.
    ``lambda b: shard_batch(mesh, b)`` to issue the sharded device_put
    ahead of time.  Exceptions in the worker propagate to the consumer.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(int(depth), 1))
    end = object()

    def worker():
        try:
            for b in batches:
                q.put(place(b) if place is not None else b)
        except BaseException as e:  # re-raised on the consumer side
            q.put(e)
            return
        q.put(end)

    t = threading.Thread(target=worker, daemon=True,
                         name="mocha-batch-prefetch")
    t.start()
    while True:
        item = q.get()
        if item is end:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
