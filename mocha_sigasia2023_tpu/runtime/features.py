"""Clip -> per-window encoder features for the streaming runtime.

Covers the featurize+encode stage of the demo (test_fullframework.py:124-203)
and the dataset-wide feature exports:
  * compute_cnt_norm.py (cnt_norm.npz — dataset mean/std of the context
    feature) and
  * collect_CVAE_feature_action.py (per-character encoded/cnt features with
    action labels, sliding window step 1).

Everything batches: all sliding windows of a clip are featurized in one
gather and encoded in chunks of jit-compiled batches.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..data.dataset import window_xy_features, window_vel
from ..kinematics import quat
from ..data.preprocess import featurize_clip_jit
from ..data.windows import padded_window_indices, gather_windows, full_window_indices
from ..models import generator as gen


@functools.lru_cache(maxsize=4)
def _encode_jit(cfg: gen.GeneratorConfig):
    @jax.jit
    def fn(params, X_in):
        encoded = gen.encode(params, cfg, X_in)
        return encoded, gen.content_feature(encoded)

    return fn


def encode_windows(params, cfg: gen.GeneratorConfig, X: np.ndarray,
                   norm: Dict[str, np.ndarray], batch: int = 256):
    """Normalize (dropping the root bone, trainer.py:116) and run the
    embedding+encoder over windows in jitted chunks.

    X: (N, T, J, 15) raw window features.  Returns (encoded, cnt) as
    (N, tokens, dim) numpy arrays.
    """
    X_mean = norm["X_mean"][None, None]
    X_std = norm["X_std"][None, None]
    fn = _encode_jit(cfg)
    enc_out, cnt_out = [], []
    n = len(X)
    for i in range(0, n, batch):
        xb = X[i:i + batch]
        pad = 0
        if len(xb) < batch and n > batch:
            pad = batch - len(xb)  # keep one compiled shape
            xb = np.concatenate([xb, np.repeat(xb[-1:], pad, axis=0)], axis=0)
        x_in = jnp.asarray((xb[:, :, 1:] - X_mean[:, :, 1:]) / X_std[:, :, 1:],
                           jnp.float32)
        e, c = fn(params, x_in)
        e, c = np.asarray(e), np.asarray(c)
        if pad:
            e, c = e[:-pad], c[:-pad]
        enc_out.append(e)
        cnt_out.append(c)
    return np.concatenate(enc_out), np.concatenate(cnt_out)


def clip_stream_features(bvh_data: Dict, params, cfg: gen.GeneratorConfig,
                         norm: Dict[str, np.ndarray], *, window: int = 60,
                         mirror: bool = False) -> Dict[str, np.ndarray]:
    """Full streaming featurization of one clip (test_fullframework.py:124-203):
    sliding windows every frame, X/Y/root recompute, batched encode.

    Returns per-window arrays: encoded/cnt (N, 90, 256) plus the last-frame
    pose rows the streaming loop consumes (N, J, .) and per-window root
    velocities/window-mean hip speeds.
    """
    feats = featurize_clip_jit(bvh_data, mirror=mirror,
                               contact_velocity_threshold=0.5)
    parents = feats["bone_parents"]
    T = int(feats["positions"].shape[0])
    idx, pad = padded_window_indices(T, window, 1)

    Ypos = gather_windows(feats["positions"], idx)
    Yvel = gather_windows(feats["velocities"], idx, pad)
    Yrot = gather_windows(feats["rotations"], idx)
    Yang = gather_windows(feats["angular_velocities"], idx, pad)
    contacts = gather_windows(feats["contacts"], idx)

    X, Y, root = window_xy_features(Yrot, Ypos, Yvel, Yang, parents)
    # re-derived parent-local pose (root rows identity/zero): the stream
    # consumes the LAST frame of each window (test_fullframework.py:458-462)
    Ypos2 = Y[..., :3]
    Yrot2 = _rot_from_Y(Y)
    Yvel2 = Y[..., 9:12]
    Yang2 = Y[..., 12:15]

    encoded, cnt = encode_windows(params, cfg, np.asarray(X), norm)

    hips_speed_mean = np.asarray(
        jnp.mean(jnp.linalg.norm(Yvel2[:, :, 1], axis=-1), axis=1))

    return {
        "encoded": encoded,
        "cnt": cnt,
        "pos_last": np.asarray(Ypos2[:, -1]),
        "rot_last": np.asarray(Yrot2[:, -1]),
        "vel_last": np.asarray(Yvel2[:, -1]),
        "ang_last": np.asarray(Yang2[:, -1]),
        "rvel_last": np.asarray(root[:, -1, :3]),
        "rang_last": np.asarray(root[:, -1, 3:]),
        "contact_last": np.asarray(contacts[:, -1]),
        "hips_speed_mean": hips_speed_mean,
        "bone_parents": parents,
        "bone_names": feats["bone_names"],
    }


def _rot_from_Y(Y):
    b, t, j = Y.shape[:3]
    return quat.from_xform_xy(Y[..., 3:9].reshape(b, t, j, 3, 2))


def _tail_vel(pos4, fps=60.0):
    """window_vel's LAST row from just the window's last 4 rows — exact:
    last = inner[-1] + (inner[-1] - inner[-2]), and those two central
    differences touch only pos rows T-4..T-1 (same arithmetic per element
    as the full form, so results are bitwise identical)."""
    inner1 = 0.5 * (pos4[:, 3] - pos4[:, 2]) * fps \
        + 0.5 * (pos4[:, 2] - pos4[:, 1]) * fps
    inner2 = 0.5 * (pos4[:, 2] - pos4[:, 1]) * fps \
        + 0.5 * (pos4[:, 1] - pos4[:, 0]) * fps
    return inner1 + (inner1 - inner2)


def _tail_ang(rot4, fps=60.0):
    """window_ang's LAST row from the window's last 4 rows (see
    :func:`_tail_vel`); the shared fwd/bwd difference d(r2, r1) is computed
    once, exactly as the vectorized form does."""
    def d(a, b):
        return quat.to_scaled_angle_axis(quat.abs_(quat.mul_inv(a, b)))

    d32 = d(rot4[:, 3], rot4[:, 2])
    d21 = d(rot4[:, 2], rot4[:, 1])
    d10 = d(rot4[:, 1], rot4[:, 0])
    inner1 = 0.5 * d32 * fps + 0.5 * d21 * fps
    inner2 = 0.5 * d21 * fps + 0.5 * d10 * fps
    return inner1 + (inner1 - inner2)


def _per_frame_world(feats, bone_parents):
    """Hoist the window-independent kinematics to ONE per-frame pass.

    With stride-1 sliding windows every frame appears in up to ``window``
    windows, and the reference recomputes FK/IK for each
    (test_fullframework.py:141-185 re-derives the whole window per frame).
    But world FK is pointwise per frame, and ``fk_vel`` is *linear* in the
    local velocities — so the pad-zeroed velocity semantics of tail
    windows survive the hoist (zero local vel/ang ⇒ zero world vel/ang),
    and window gathers of these (T, J, ·) arrays are exact.  Measured on
    v5e this removes the 60x-redundant FK/IK traffic that made the
    featurize stage bandwidth-bound (scripts/e2e_stage_probe.py).
    """
    Grot, Gpos, Gvel, Gang = quat.fk_vel(
        feats["rotations"], feats["positions"], feats["velocities"],
        feats["angular_velocities"], bone_parents)
    # local root velocities in body coordinates (data_loader.py:64-67) are
    # per-frame quantities; the stream only reads the window's last row
    Yrvel = quat.inv_mul_vec(feats["rotations"][..., 0, :],
                             feats["velocities"][..., 0, :])
    Yrang = quat.inv_mul_vec(feats["rotations"][..., 0, :],
                             feats["angular_velocities"][..., 0, :])
    return {"Grot": Grot, "Gpos": Gpos, "Gvel": Gvel, "Gang": Gang,
            "Lrot": feats["rotations"], "Lpos": feats["positions"],
            "Yrvel": Yrvel, "Yrang": Yrang,
            "contacts": feats["contacts"]}


def _stream_chunk_outputs(pf, ci, cp, bone_parents, params, cfg,
                          X_mean, X_std, compute_dtype, emit_cnt=True,
                          skip_encode=False):
    """One chunk of windows -> encoder features + last-frame stream rows,
    from per-frame world-FK arrays (:func:`_per_frame_world`).

    Exactly reproduces window_xy_features + the last-row slicing of
    clip_stream_features (the host oracle path, kept on the general form):
      * X = character-space features w.r.t. the window-last root — the
        per-window inv(R_last) rotations are intrinsic and stay;
      * parent-local Y rows are window-independent (inv(G_p) G_c cancels
        the pin) except the root row (identity/zero) and root-child rows
        (which equal the already-computed X rows), so no per-window IK;
      * Y velocities re-derive by finite difference inside the window
        (same window_vel/window_ang, on the cheap reconstructed Y).

    NOTE on the hoist's float contract: the root-row substitution (exact
    identity quat / zero pos) and the Lrot/Lpos reuse for non-root-child
    joints are only float-APPROXIMATELY equal to the oracle's per-window
    quat.ik round-trip (mul(inv(q), q) is near- but not exactly identity),
    so this path's outputs sit ~1e-7 off the host oracle.  Correctness
    rests on (a) fk_vel being linear-homogeneous in the velocity states so
    post-FK pad masking commutes, and (b) the device==host equivalence
    test (tests/test_features.py TestClipStreamFeaturesDevice, atol 2e-4)
    — edits to quat.ik/fk_vel must keep that test green.
    """
    par = np.asarray(bone_parents)
    J = len(par)
    is_root = jnp.asarray((np.arange(J) == 0).reshape(J, 1))
    is_rchild = jnp.asarray(((par == 0) & (np.arange(J) != 0)).reshape(J, 1))

    maskf = (~cp).astype(jnp.float32)
    m = maskf[..., None, None]
    Grot = pf["Grot"][ci]
    Gpos = pf["Gpos"][ci]
    Gvel = pf["Gvel"][ci] * m
    Gang = pf["Gang"][ci] * m

    window = Grot.shape[1]

    def pin_last(a):  # pin the root track to the window's LAST frame
        return a.at[:, :, 0:1].set(jnp.repeat(a[:, -1:, 0:1], window, axis=1))

    Grot, Gpos = pin_last(Grot), pin_last(Gpos)
    Gvel, Gang = pin_last(Gvel), pin_last(Gang)

    root_rot = Grot[:, :, 0:1]
    Xpos = quat.inv_mul_vec(root_rot, Gpos - Gpos[:, :, 0:1])
    Xrot = quat.inv_mul(root_rot, Grot)
    Xvel = quat.inv_mul_vec(root_rot, Gvel)
    Xang = quat.inv_mul_vec(root_rot, Gang)
    b, t, j = Xpos.shape[:3]
    X = jnp.concatenate(
        [Xpos, quat.to_xform_xy(Xrot).reshape(b, t, j, 6), Xvel, Xang],
        axis=-1)
    x_in = (X[:, :, 1:] - X_mean[None, None, 1:]) / X_std[None, None, 1:]
    if compute_dtype is not None:
        x_in = x_in.astype(compute_dtype)
    if skip_encode:
        # probe-only ablation (scripts/e2e_stage_probe.py): replace the
        # encoder matmuls with a trivial reduce that still CONSUMES x_in,
        # so the window-gather/X-derive pipeline can't be dead-code
        # eliminated — isolates encoder MXU cost from gather bandwidth
        encoded = jnp.broadcast_to(
            jnp.mean(x_in, axis=(1, 2, 3), dtype=jnp.float32)
            [:, None, None],
            (x_in.shape[0], cfg.num_tokens, cfg.encoder_dim))
    else:
        encoded = gen.encode(params, cfg, x_in)
    # emit_cnt=False: the runtime re-derives cnt from encoded on demand
    # (it is exactly content_feature(encoded)) — carrying both doubles
    # per-frame stream inputs, the serving-residency bottleneck
    cnt = gen.content_feature(encoded) if emit_cnt else None

    # The stream consumes only the window's LAST Y rows (plus the joint-1
    # velocity track for the speed guard), so the parent-local
    # reconstruction + finite differences run on the last 4 rows instead
    # of all `window` — exact (window_vel/window_ang's last row touches
    # rows T-4..T-1 only; joint 1 is always the synthesized root's child,
    # so its Y track equals the already-computed Xpos track).  Measured on
    # v5e this removes the dominant non-encoder cost of the stage: the
    # full-window quat-log window_ang and the (window, J) Lrot/Lpos
    # gathers were computed 60 rows wide and read 1 row
    # (scripts/e2e_stage_probe.py, encode-skipped ablation).
    identq = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    ci_t = ci[:, -4:]
    Yrot2_t = jnp.where(is_root, identq,
                        jnp.where(is_rchild, Xrot[:, -4:],
                                  pf["Lrot"][ci_t]))
    Ypos2_t = jnp.where(is_root, 0.0,
                        jnp.where(is_rchild, Xpos[:, -4:],
                                  pf["Lpos"][ci_t]))
    hips_vel = window_vel(Xpos[:, :, 1:2])[:, :, 0]

    # match the oracle's quat->xform_xy->quat canonicalization of rot_last
    rot_last = quat.from_xform_xy(quat.to_xform_xy(Yrot2_t[:, -1]))
    last_mask = maskf[:, -1]
    last_idx = ci[:, -1]
    out_cnt = {} if cnt is None else {"cnt": cnt.astype(jnp.float32)}
    return {
        "encoded": encoded.astype(jnp.float32),
        **out_cnt,
        "pos_last": Ypos2_t[:, -1],
        "rot_last": rot_last,
        "vel_last": _tail_vel(Ypos2_t),
        "ang_last": _tail_ang(Yrot2_t),
        "rvel_last": pf["Yrvel"][last_idx] * last_mask[:, None],
        "rang_last": pf["Yrang"][last_idx] * last_mask[:, None],
        "contact_last": pf["contacts"][last_idx].astype(jnp.float32),
        "hips_speed_mean": jnp.mean(
            jnp.linalg.norm(hips_vel, axis=-1), axis=1),
    }


@functools.lru_cache(maxsize=16)
def _stream_featurizer_jitted(cfg: gen.GeneratorConfig, nframes, order, names,
                              parents, window, mirror, threshold, fps, chunk,
                              compute_dtype, emit_cnt=True):
    from jax import lax

    from ..data.preprocess import featurize_clip

    parents_arr = np.asarray(parents)
    bone_parents = np.concatenate([[-1], parents_arr + 1])
    idx, pad = padded_window_indices(nframes, window, 1)
    n_windows = len(idx)
    csize = min(chunk, n_windows)
    G = -(-n_windows // csize)
    pad_rows = G * csize - n_windows
    idx_p = np.concatenate([idx, np.repeat(idx[-1:], pad_rows, axis=0)])
    pad_p = np.concatenate([pad, np.repeat(pad[-1:], pad_rows, axis=0)])
    idx_p = idx_p.reshape(G, csize, window)
    pad_p = pad_p.reshape(G, csize, window)

    def fn(params, X_mean, X_std, rot_deg, pos_cm):
        feats = featurize_clip(
            rot_deg, pos_cm, order, list(names), parents_arr, mirror=mirror,
            contact_velocity_threshold=threshold, fps=fps)
        pf = _per_frame_world(feats, bone_parents)

        def do_chunk(c):
            ci, cp = c
            return _stream_chunk_outputs(pf, ci, cp, bone_parents, params,
                                         cfg, X_mean, X_std, compute_dtype,
                                         emit_cnt)

        if G == 1:
            out = do_chunk((jnp.asarray(idx_p[0]), jnp.asarray(pad_p[0])))
            return jax.tree.map(lambda a: a[:n_windows], out)
        out = lax.map(do_chunk, (jnp.asarray(idx_p), jnp.asarray(pad_p)))
        return jax.tree.map(
            lambda a: a.reshape((G * csize,) + a.shape[2:])[:n_windows], out)

    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def _batch_stream_featurizer_jitted(cfg: gen.GeneratorConfig, n_clips,
                                    nframes, order, names, parents, window,
                                    threshold, fps, chunk, compute_dtype,
                                    emit_cnt=True, skip_encode=False):
    from jax import lax

    from ..data.preprocess import featurize_clip

    parents_arr = np.asarray(parents)
    bone_parents = np.concatenate([[-1], parents_arr + 1])
    idx, pad = padded_window_indices(nframes, window, 1)
    n_w = len(idx)
    # flatten (clip, window-row) into indices over the (S*T)-stacked
    # per-frame features so all clips' windows chunk together
    flat_idx = (np.arange(n_clips)[:, None, None] * nframes
                + idx[None]).reshape(n_clips * n_w, window).astype(np.int32)
    flat_pad = np.broadcast_to(
        pad[None], (n_clips, n_w, window)).reshape(n_clips * n_w, window)
    total = n_clips * n_w
    csize = min(chunk, total)
    G = -(-total // csize)
    pad_rows = G * csize - total
    flat_idx = np.concatenate(
        [flat_idx, np.repeat(flat_idx[-1:], pad_rows, axis=0)])
    flat_pad = np.concatenate(
        [flat_pad, np.repeat(flat_pad[-1:], pad_rows, axis=0)])
    flat_idx = flat_idx.reshape(G, csize, window)
    flat_pad = flat_pad.reshape(G, csize, window)

    def fn(params, X_mean, X_std, rot_deg, pos_cm):
        def one_clip(r, p):
            out = featurize_clip(
                r, p, order, list(names), parents_arr,
                contact_velocity_threshold=threshold, fps=fps)
            return {k: out[k] for k in _BSF_KEYS}

        feats = jax.vmap(one_clip)(rot_deg, pos_cm)
        # per-frame world FK over the (clips, frames) batch, then flatten so
        # all clips' windows gather from one (S*T, J, ·) stack
        pf = _per_frame_world(feats, bone_parents)
        pf = {k: v.reshape((n_clips * nframes,) + v.shape[2:])
              for k, v in pf.items()}

        def do_chunk(c):
            ci, cp = c
            return _stream_chunk_outputs(pf, ci, cp, bone_parents, params,
                                         cfg, X_mean, X_std, compute_dtype,
                                         emit_cnt, skip_encode)

        if G == 1:
            out = do_chunk((jnp.asarray(flat_idx[0]),
                            jnp.asarray(flat_pad[0])))
        else:
            out = lax.map(do_chunk, (jnp.asarray(flat_idx),
                                     jnp.asarray(flat_pad)))
            out = jax.tree.map(
                lambda a: a.reshape((G * csize,) + a.shape[2:]), out)
        out = jax.tree.map(
            lambda a: a[:total].reshape((n_clips, n_w) + a.shape[1:]), out)
        frame0 = {k: v[:, 0] for k, v in out.items()}
        xs = {k: jnp.moveaxis(v[:, 1:], 0, 1) for k, v in out.items()}
        return frame0, xs

    return jax.jit(fn)


_BSF_KEYS = ("positions", "velocities", "rotations", "angular_velocities",
             "contacts")


def batch_stream_features_device(clips, params, cfg: gen.GeneratorConfig,
                                 norm: Dict[str, np.ndarray], *,
                                 window: int = 60, chunk: int = 128,
                                 compute_dtype=None, emit_cnt: bool = True,
                                 skip_encode: bool = False):
    """Featurize+encode MANY same-length, same-skeleton clips as ONE jitted
    program emitting the (frame0, xs) pytrees make_batch_runner consumes.

    This is the serving throughput path: the per-clip variant costs one
    dispatch per clip plus ~20 host-side stacks, and on relay-attached
    hosts every dispatch pays the tunnel RTT (~30 ms) — at 64 clips that
    overhead exceeds the actual device compute.  Here the whole batch is
    one dispatch; windows from all clips chunk together through the
    encoder (``chunk`` windows per lax.map step bounds peak memory)."""
    c0 = clips[0]
    rot = jnp.asarray(np.stack([np.asarray(c["rotations"], np.float32)
                                for c in clips]))
    pos = jnp.asarray(np.stack([np.asarray(c["positions"], np.float32)
                                for c in clips]))
    fn = _batch_stream_featurizer_jitted(
        cfg, len(clips), rot.shape[1], c0["order"], tuple(c0["names"]),
        tuple(int(p) for p in c0["parents"]), int(window), 0.5, 60.0,
        int(chunk),
        None if compute_dtype is None else jnp.dtype(compute_dtype).name,
        bool(emit_cnt), bool(skip_encode))
    return fn(params, jnp.asarray(norm["X_mean"], jnp.float32),
              jnp.asarray(norm["X_std"], jnp.float32), rot, pos)


def batch_stream_features_ragged(clips, params, cfg: gen.GeneratorConfig,
                                 norm: Dict[str, np.ndarray], *,
                                 window: int = 60, chunk: int = 128,
                                 compute_dtype=None, emit_cnt: bool = True):
    """Featurize+encode clips of MIXED lengths as FEW jitted dispatches:
    clips group by frame count and each group runs through
    :func:`batch_stream_features_device` — one program per distinct
    length instead of one per clip (featurize math is per-clip identical,
    so grouping is exact, unlike raw-frame padding which would shift the
    savgol/velocity edge handling of real frames).

    This is the CLI serving path for ``characterize --src-dir``
    (the reference flow at test_fullframework.py:124-203 per clip): the
    per-clip dispatch form measured 6.0k frames/s-class on relay hosts
    (per-dispatch RTT + ~20 host stacks each); the grouped form costs one
    dispatch per distinct clip length.

    Returns ``(frame0, xs, n_windows, n_groups)``: the make_batch_runner
    input pytrees with shorter clips' window rows edge-padded
    (repeat-last) to the longest clip's count — callers trim outputs with
    the true per-clip ``n_windows``.
    """
    lengths = [int(np.asarray(c["rotations"]).shape[0]) for c in clips]
    groups: Dict[int, list] = {}
    for i, L in enumerate(lengths):
        groups.setdefault(L, []).append(i)
    n_w = {L: len(padded_window_indices(L, window, 1)[0]) for L in groups}
    w_max = max(n_w.values())

    f0_parts, xs_parts, order = [], [], []
    for L in sorted(groups):
        idxs = groups[L]
        frame0_g, xs_g = batch_stream_features_device(
            [clips[i] for i in idxs], params, cfg, norm, window=window,
            chunk=chunk, compute_dtype=compute_dtype, emit_cnt=emit_cnt)
        pad_t = (w_max - 1) - (n_w[L] - 1)
        if pad_t:
            xs_g = jax.tree.map(
                lambda a: jnp.concatenate(
                    [a, jnp.repeat(a[-1:], pad_t, axis=0)], axis=0), xs_g)
        f0_parts.append(frame0_g)
        xs_parts.append(xs_g)
        order += idxs
    frame0 = jax.tree.map(lambda *a: jnp.concatenate(a, axis=0), *f0_parts)
    xs = jax.tree.map(lambda *a: jnp.concatenate(a, axis=1), *xs_parts)
    inv = np.argsort(np.asarray(order))  # back to input clip order
    frame0 = jax.tree.map(lambda a: a[inv], frame0)
    xs = jax.tree.map(lambda a: a[:, inv], xs)
    return frame0, xs, [n_w[L] for L in lengths], len(groups)


def clip_stream_features_device(bvh_data: Dict, params,
                                cfg: gen.GeneratorConfig,
                                norm: Dict[str, np.ndarray], *,
                                window: int = 60, mirror: bool = False,
                                chunk: int = 128, compute_dtype=None,
                                emit_cnt: bool = True) -> Dict:
    """Device-resident equivalent of :func:`clip_stream_features`: the whole
    featurize -> sliding-window gather -> X/Y derive -> encode pipeline runs
    as ONE jitted XLA program per clip length (long clips process in
    ``chunk``-window groups via lax.map, bounding peak memory), and the
    returned feature arrays stay on device — no host round-trips between
    featurization and the stream scan.

    This is the throughput path the end-to-end benchmark measures
    (test_fullframework.py:124-203 performs this stage per frame inside its
    demo loop); ``compute_dtype=jnp.bfloat16`` runs the encoder matmuls in
    bf16 (cast ``params`` to match).
    """
    rot = jnp.asarray(bvh_data["rotations"], jnp.float32)
    pos = jnp.asarray(bvh_data["positions"], jnp.float32)
    fn = _stream_featurizer_jitted(
        cfg, rot.shape[0], bvh_data["order"], tuple(bvh_data["names"]),
        tuple(int(p) for p in bvh_data["parents"]), int(window), bool(mirror),
        0.5, 60.0, int(chunk),
        None if compute_dtype is None else jnp.dtype(compute_dtype).name,
        bool(emit_cnt))
    out = dict(fn(params, jnp.asarray(norm["X_mean"], jnp.float32),
                  jnp.asarray(norm["X_std"], jnp.float32), rot, pos))
    out["bone_parents"] = np.concatenate(
        [[-1], np.asarray(bvh_data["parents"]) + 1])
    out["bone_names"] = ["Root"] + list(bvh_data["names"])
    return out


def database_window_features(db: Dict, *, window: int = 60, step: int = 20,
                             clip_filter=None):
    """Window a loaded database per range with labels, full windows only
    (compute_cnt_norm.py:102-129 semantics).

    clip_filter(style_label, action_label) -> bool optionally restricts to
    a character/action subset (collect_CVAE_feature_action.py:104-108).
    """
    starts, stops = db["range_starts"], db["range_stops"]
    idx_all, styles, actions = [], [], []
    for i in range(len(starts)):
        if clip_filter is not None and not clip_filter(
                int(db["style_labels"][i]), int(db["action_labels"][i])):
            continue
        idx = full_window_indices(int(stops[i] - starts[i]), window, step) \
            + int(starts[i])
        idx_all.append(idx)
        styles += [int(db["style_labels"][i])] * len(idx)
        actions += [int(db["action_labels"][i])] * len(idx)
    if not idx_all:
        raise ValueError("clip_filter selected no clips")
    idx_all = np.concatenate(idx_all)
    return idx_all, np.asarray(styles, np.int32), np.asarray(actions, np.int32)


def encode_database(db: Dict, params, cfg: gen.GeneratorConfig,
                    norm: Dict[str, np.ndarray], *, window: int = 60,
                    step: int = 20, clip_filter=None, batch: int = 256):
    """Encode database windows -> (encoded, cnt, styles, actions).

    With step=20 this reproduces compute_cnt_norm.py's dataset pass; with
    step=1 and a clip_filter it reproduces collect_CVAE_feature_action.py's
    per-character sliding features.
    """
    from ..data.dataset import compute_window_features

    idx, styles, actions = database_window_features(
        db, window=window, step=step, clip_filter=clip_filter)
    parents = db["bone_parents"]
    X, _, _ = compute_window_features(
        db["bone_rotations"].astype(np.float32)[idx],
        db["bone_positions"].astype(np.float32)[idx],
        db["bone_velocities"].astype(np.float32)[idx],
        db["bone_angular_velocities"].astype(np.float32)[idx],
        parents)
    encoded, cnt = encode_windows(params, cfg, X, norm, batch=batch)
    return encoded, cnt, styles, actions


def compute_cnt_norm(encoded: np.ndarray, cnt: np.ndarray):
    """Dataset context-feature statistics (compute_cnt_norm.py:174-179):
    mean/std over windows, kept per (token, channel)."""
    return {
        "mean": cnt.mean(axis=0),
        "std": cnt.std(axis=0),
        "encoded_mean": encoded.mean(axis=0),
        "encoded_std": encoded.std(axis=0),
    }


def collect_character_features(db: Dict, params, cfg, norm, *,
                               style_labels: Sequence[int],
                               action_labels: Sequence[int],
                               window: int = 60):
    """Per-character sliding-window feature export
    (collect_CVAE_feature_action.py:100-189): encoded/cnt at window step 1
    over the selected style/action clips, with per-clip range bookkeeping.

    Note the reference slides ``for j in range(window, total_frames)`` —
    i.e. windows [j-window, j) for j in [window, T): T-window windows per
    clip, full windows only, offset by one from the step-1 full_window set
    (which would include j=T).  We reproduce that exactly.
    """
    starts, stops = db["range_starts"], db["range_stops"]
    sel_idx, actions = [], []
    out_starts, out_stops = [], []
    for i in range(len(starts)):
        if int(db["style_labels"][i]) not in set(style_labels):
            continue
        if int(db["action_labels"][i]) not in set(action_labels):
            continue
        T = int(stops[i] - starts[i])
        rows = np.asarray(
            [np.arange(j - window, j) for j in range(window, T)],
            dtype=np.int32) + int(starts[i])
        if len(rows) == 0:
            continue
        sel_idx.append(rows)
        actions += [int(db["action_labels"][i])] * len(rows)
        off = 0 if not out_stops else out_stops[-1]
        out_starts.append(off)
        out_stops.append(off + (T - window))
    from ..data.dataset import compute_window_features

    idx = np.concatenate(sel_idx)
    parents = db["bone_parents"]
    X, _, _ = compute_window_features(
        db["bone_rotations"].astype(np.float32)[idx],
        db["bone_positions"].astype(np.float32)[idx],
        db["bone_velocities"].astype(np.float32)[idx],
        db["bone_angular_velocities"].astype(np.float32)[idx],
        parents)
    encoded, cnt = encode_windows(params, cfg, X, norm)
    return {
        "encoded": encoded,
        "cnt": cnt,
        "range_starts": np.asarray(out_starts, np.int32),
        "range_stops": np.asarray(out_stops, np.int32),
        "action_label": np.asarray(actions, np.int32),
    }
