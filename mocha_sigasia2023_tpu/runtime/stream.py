"""The streaming characterization loop as one jitted, scannable step.

Semantics target: the frame loop of /root/reference/test_fullframework.py
(:288-641): per frame — context match (NN over the character database and/or
CVAE rollout), decode, root-motion integration with the velocity-ratio
guard, foot-contact locking + two-bone IK fixup, and velocity blending.

TPU-native structure: the whole step is a pure function over a carried
``StreamCarry`` pytree; `lax.scan` runs clips offline at full device
throughput, a single jitted step serves live streams, and everything vmaps
over parallel streams.  The reference's per-frame CPU<->device ping-pong
(BallTree on CPU, decoder on GPU, NumPy IK) disappears: one XLA program per
frame.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..kinematics import quat
from ..kinematics.inertial import ContactState, contact_update
from ..models import cvae as jcvae
from ..models import generator as gen
from .matching import nn_index, nn_index_grouped


class IKConfig(NamedTuple):
    """Contact/IK constants (test_fullframework.py:109-114)."""

    enabled: bool = True
    max_length_buffer: float = 0.015
    foot_height: float = 0.02
    toe_length: float = 0.15
    unlock_radius: float = 0.2
    blending_halflife: float = 0.1


class RuntimeConsts(NamedTuple):
    """Static-per-session arrays closed over by the jitted step."""

    Y_mean: jnp.ndarray          # (J, 15) including root row
    Y_std: jnp.ndarray           # (J, 15)
    cha_encoded: jnp.ndarray     # (M, tokens, dim) character database
    cha_cnt_flat: jnp.ndarray    # (M, tokens*dim) normalized for NN
    cha_cnt_sq: jnp.ndarray      # (M,)
    cnt_mean: jnp.ndarray        # (tokens, dim)
    cnt_std: jnp.ndarray         # (tokens, dim) — already / temp_weight
    src_cnt_mean: jnp.ndarray    # CVAE conditioning norms (cvae_norm.npz)
    src_cnt_std: jnp.ndarray
    cha_encoded_mean: jnp.ndarray
    cha_encoded_std: jnp.ndarray


class StreamCarry(NamedTuple):
    """Per-stream carried state.

    The root integrators (``*_pos0``/``*_rot0``) and the contact springs
    are the only unbounded accumulators in the loop — everything else is
    re-derived per frame or decays (the 0.5-blend halves errors each
    step).  With ``root_dtype=float64`` those accumulators run in f64
    (tiny: a handful of scalars per stream) while decode/FK/IK stay f32,
    closing the long-horizon drift vs the f64 NumPy reference
    (test_fullframework.py:476-528) to <1e-3 over 500+ frames.
    """

    src_pos0: jnp.ndarray        # (3,) integrated source root position
    src_rot0: jnp.ndarray        # (4,)
    trans_pos0: jnp.ndarray      # (3,) CVAE-stream root position accumulator
    trans_prev_pos: jnp.ndarray  # (J, 3) last blended CVAE-stream pose
    trans_rot0: jnp.ndarray      # (4,) CVAE-stream root rotation
    ik_prev_pos: jnp.ndarray     # (J, 3) last IK-adjusted pose
    cm_pos0: jnp.ndarray         # (3,) NN-stream root position
    cm_rot0: jnp.ndarray         # (4,)
    prev_cha_encoded: jnp.ndarray  # (tokens, dim)
    contacts: ContactState       # batched over the 2 contact bones
    key: jax.Array


def _resolve_root_dtype(root_dtype):
    """float64 accumulators require the global x64 flag; enable it on
    first use (the trainer already does the same for loss_dtype).

    This is a PROCESS-GLOBAL side effect: after the flip, unrelated JAX
    code in the same process promotes Python floats / numpy f64 inputs to
    f64 instead of silently downcasting to f32, which changes dtypes (and
    recompiles) elsewhere.  Fine for the CLI processes that own the
    default; library users embedding the runtime alongside other JAX
    programs should pass ``root_dtype=jnp.float32`` (or pre-enable x64
    themselves).  A one-time warning announces the flip."""
    if root_dtype is None:
        return jnp.float32
    root_dtype = jnp.dtype(root_dtype)
    if root_dtype == jnp.float64 and not jax.config.jax_enable_x64:
        import warnings

        warnings.warn(
            "root_dtype=float64 enables jax_enable_x64 for the WHOLE "
            "process (dtype semantics of unrelated JAX code change); "
            "pass root_dtype=jnp.float32 to keep the global default",
            stacklevel=3)
        jax.config.update("jax_enable_x64", True)
    return root_dtype


def _decode_frames(params, cfg, consts: RuntimeConsts, src_enc, cha_encs,
                   compute_dtype=None, lean=False):
    """Decode one source window against K character encodings in ONE
    batched decoder call and split each last frame into pose channels
    (test_fullframework.py:301-318).  Returns per-K tuples (pos, rot,
    vel_last, ang, root_joint_speed_mean).  ``compute_dtype=bfloat16`` runs
    the decoder matmuls in bf16 (pass bf16-cast params), f32 pose math.

    ``lean=True`` uses gen.decode_stream — the exact-math decoder tail
    restricted to the last-frame pose + joint-0 velocity track the step
    consumes.  Measured on v5e at 64 streams: 44% SLOWER (12.5k vs 22.3k
    frames/s) — the sliced (3x24) and (60x7) conv shapes pad to MXU tiles
    far worse than the dense 60x24 head, so the 20% FLOP cut loses to
    utilization.  Default stays False (full decode).
    """
    K = cha_encs.shape[0]
    src_pair = jnp.broadcast_to(src_enc[None], (K,) + src_enc.shape)
    if compute_dtype is not None:
        src_pair = src_pair.astype(compute_dtype)
        cha_encs = cha_encs.astype(compute_dtype)
    if lean:
        last, vel0 = gen.decode_stream(params, cfg, src_pair, cha_encs)
        last = (last.astype(jnp.float32) * consts.Y_std[1:]
                + consts.Y_mean[1:])
        vel0 = (vel0.astype(jnp.float32) * consts.Y_std[1, 9:12]
                + consts.Y_mean[1, 9:12])
        pos = last[:, :, :3]
        txy = last[:, :, 3:9].reshape(K, -1, 3, 2)
        vel_last = last[:, :, 9:12]
        ang = last[:, :, 12:15]
        rot = quat.from_xform_xy(txy)
        hips_speed = jnp.mean(jnp.linalg.norm(vel0, axis=-1), axis=-1)
        return pos, rot, vel_last, ang, hips_speed
    Ytil = gen.decode(params, cfg, src_pair, cha_encs)
    Ytil = Ytil.astype(jnp.float32)
    Ytil = Ytil * consts.Y_std[1:] + consts.Y_mean[1:]
    pos = Ytil[:, -1, :, :3]
    txy = Ytil[:, -1, :, 3:9].reshape(K, -1, 3, 2)
    vel_full = Ytil[..., 9:12]
    ang = Ytil[:, -1, :, 12:15]
    rot = quat.from_xform_xy(txy)
    hips_speed = jnp.mean(jnp.linalg.norm(vel_full[:, :, 0], axis=-1), axis=-1)
    return pos, rot, vel_full[:, -1], ang, hips_speed


def _decode_frame(params, cfg, consts: RuntimeConsts, src_enc, cha_enc,
                  compute_dtype=None, lean=False):
    out = _decode_frames(params, cfg, consts, src_enc, cha_enc[None],
                         compute_dtype, lean=lean)
    return tuple(a[0] for a in out)


def _integrate_root(prev_pos0, prev_rot0, rvel, rang, dt):
    """World-space root integration (test_fullframework.py:476-479)."""
    rootvel = quat.mul_vec(prev_rot0, rvel)
    rootang = quat.mul_vec(prev_rot0, rang)
    rootpos = prev_pos0 + rootvel * dt
    rootrot = quat.mul(prev_rot0, quat.from_scaled_angle_axis(rootang * dt))
    return rootpos, rootrot, rootvel, rootang


def _guarded_ratio(pred_speed_mean, src_speed_mean):
    """Velocity-ratio guard (test_fullframework.py:492-495): scale source
    root velocity by the predicted/source hip-speed ratio, clamped to 1
    outside [0.33, 3]."""
    ratio = pred_speed_mean / src_speed_mean
    bad = (ratio > 3.0) | (ratio < 0.33) | ~jnp.isfinite(ratio)
    return jnp.where(bad, 1.0, ratio)


def _assemble(rootpos, rootrot, rootvel, rootang, pos, rot, vel, ang):
    """Prepend the integrated root bone row (test_fullframework.py:505-508).
    Root rows are cast down to the pose dtype so f64 root accumulators
    don't promote the whole pose (decode/FK/IK stay f32)."""
    return (
        jnp.concatenate([rootpos[None].astype(pos.dtype), pos], axis=0),
        jnp.concatenate([rootrot[None].astype(rot.dtype), rot], axis=0),
        jnp.concatenate([rootvel[None].astype(vel.dtype), vel], axis=0),
        jnp.concatenate([rootang[None].astype(ang.dtype), ang], axis=0),
    )


@functools.lru_cache(maxsize=None)
def _foot_chain_indices(parents_key, contact_bones):
    toes = np.asarray(contact_bones, np.int32)
    parents = np.asarray(parents_key)
    heels = parents[toes]
    knees = parents[heels]
    hips = parents[knees]
    roots = parents[hips]
    return toes, heels, knees, hips, roots


def _ik_fixup(parents_key, contact_bones, ik: IKConfig, dt,
              contacts: ContactState, bone_pos, bone_rot, input_state):
    """Foot-contact locking + two-bone IK (test_fullframework.py:538-623),
    vectorized over both feet.

    The reference recomputes per-foot partial FK chains with memoization;
    here one level-scheduled full-skeleton FK feeds both feet (the adjusted
    hip/knee rotations of the two chains are disjoint, so a single pass is
    exact).  Returns (new contact state, adjusted rotations).
    """
    toes, heels, knees, hips, roots = _foot_chain_indices(
        parents_key, contact_bones)
    parents = np.asarray(parents_key)

    grot, gpos = quat.fk(bone_rot, bone_pos, parents)

    # cast to the spring-state dtype (f64 under root_dtype=float64) so the
    # carried ContactState keeps a stable dtype across scan iterations
    new_cs = contact_update(
        contacts, gpos[toes].astype(contacts.position.dtype), input_state,
        ik.unlock_radius, ik.foot_height, ik.blending_halflife, dt)

    contact_clamped = jnp.concatenate(
        [
            new_cs.position[..., 0:1],
            jnp.maximum(new_cs.position[..., 1:2], ik.foot_height),
            new_cs.position[..., 2:3],
        ],
        axis=-1,
    )

    target = contact_clamped + (gpos[heels] - gpos[toes])
    fwd = quat.mul_vec(grot[knees], jnp.asarray([0.0, 1.0, 0.0], bone_pos.dtype))

    new_hip_lr, new_knee_lr = quat.ik_two_bone(
        bone_rot[hips], bone_rot[knees],
        gpos[hips], gpos[knees], gpos[heels],
        target, fwd,
        grot[hips], grot[knees], grot[roots],
        ik.max_length_buffer,
    )

    adjusted = (bone_rot.at[hips].set(new_hip_lr.astype(bone_rot.dtype))
                .at[knees].set(new_knee_lr.astype(bone_rot.dtype)))
    return new_cs, adjusted


def make_stream_step(cfg: gen.GeneratorConfig,
                     cvae_cfg: Optional[jcvae.CVAEConfig], parents,
                     contact_bones=(5, 24), ik: IKConfig = IKConfig(),
                     dt: float = 1.0 / 60.0, deterministic: bool = False,
                     use_cvae: bool = True, compute_cm: bool = True,
                     compute_dtype=None, root_dtype=None,
                     fuse_decodes: bool = False, lean_decode: bool = False,
                     cvae_dtype=None):
    """Build the pure per-frame step function.

    ``cvae_dtype`` runs ONLY the CVAE sample in the given dtype (callers
    must cast cvae_params to match) while the generator decodes and pose
    math stay in ``compute_dtype``/f32 — the CVAE is the step's hot op
    (~63%, README ablation table) and is matmul-roofline-bound, so bf16
    there buys most of the full-bf16 speedup at a fraction of the
    numeric exposure.  Defaults to ``compute_dtype``.

    step(ctx, carry, frame_inputs) -> (carry, outputs) where ctx =
    (params, cvae_params, consts) is passed explicitly (NOT closed over) so
    jitted callers take weights and the character database as arguments —
    closed-over device arrays would be baked into the HLO as constants.
    """
    parents_key = tuple(int(p) for p in parents)
    cbones = tuple(int(b) for b in contact_bones)
    root_dtype = _resolve_root_dtype(root_dtype)
    if cvae_dtype is None:
        cvae_dtype = compute_dtype

    def _decode_two(params, consts, src_enc, cvae_cha, nn_cha):
        """Decode the CVAE and NN streams; ``fuse_decodes`` stacks them
        into one K=2 decoder call (one matmul batch), else two calls.

        Measured on v5e (bench.py --fuse-decodes, 64 streams): the fused
        form is 26% SLOWER (15.7k vs 21.2k frames/s) — under the stream
        vmap the extra K dim gives XLA a (S, 2, ...) layout it tiles worse
        than two clean (S, ...) calls.  Default stays separate."""
        if fuse_decodes:
            outs = _decode_frames(params, cfg, consts, src_enc,
                                  jnp.stack([cvae_cha, nn_cha]),
                                  compute_dtype, lean=lean_decode)
            return tuple(a[0] for a in outs), tuple(a[1] for a in outs)
        t = _decode_frame(params, cfg, consts, src_enc, cvae_cha,
                          compute_dtype, lean=lean_decode)
        c = _decode_frame(params, cfg, consts, src_enc, nn_cha,
                          compute_dtype, lean=lean_decode)
        return t, c

    def step(ctx, carry: StreamCarry, x: Dict):
        params, cvae_params, consts = ctx
        key = carry.key
        # cnt is EXACTLY mean_variance_norm(encoded) (model.py:96-98), so
        # streams need not carry it: when absent it re-derives here from
        # the encoded the step already consumes (a ~90x256 norm — noise
        # next to the CVAE/decoder matmuls).  Carrying both doubles the
        # per-frame stream inputs resident in HBM (the S=256 OOM).
        cnt = (x["cnt"] if "cnt" in x
               else gen.content_feature(x["encoded"]))
        # --- context matching -------------------------------------------
        if "nn_idx" in x:
            # precomputed by the batch runner's hoisted matcher (the NN
            # query is a pure function of the source cnt input, so all
            # T x S matches run as one pre-scan einsum)
            idx = x["nn_idx"]
        else:
            src_cnt_nm = (cnt - consts.cnt_mean) / consts.cnt_std
            q_flat = src_cnt_nm.reshape(-1)
            db_flat = consts.cha_cnt_flat
            if compute_dtype is not None:
                # the 23k-dim score matmul dominates NN cost; bf16 with the
                # precomputed f32 |x|^2 keeps the argmin stable in practice
                q_flat = q_flat.astype(compute_dtype)
                db_flat = db_flat.astype(compute_dtype)
            idx = nn_index(q_flat, db_flat, consts.cha_cnt_sq)
        # cast covers bf16-stored database stacks (cast_database)
        nn_cha_encoded = consts.cha_encoded[idx].astype(jnp.float32)

        if use_cvae:
            condition = jnp.concatenate(
                [
                    (cnt - consts.src_cnt_mean) / consts.src_cnt_std,
                    (carry.prev_cha_encoded - consts.cha_encoded_mean)
                    / consts.cha_encoded_std,
                ],
                axis=0,
            )
            if cvae_dtype is not None:
                condition = condition.astype(cvae_dtype)
            key, k_s = jax.random.split(key)
            vae_out = jcvae.sample(
                cvae_params, condition[None], cvae_cfg,
                key=None if deterministic else k_s,
                deterministic=deterministic)[0].astype(jnp.float32)
            cvae_cha_encoded = (
                vae_out * consts.cha_encoded_std + consts.cha_encoded_mean)
        else:
            cvae_cha_encoded = nn_cha_encoded
        prev_cha_encoded = cvae_cha_encoded

        # --- decode both streams ------------------------------------------
        if compute_cm and use_cvae:
            (t_pos, t_rot, t_vel, t_ang, t_speed), \
                (c_pos, c_rot, c_vel, c_ang, c_speed) = _decode_two(
                    params, consts, x["encoded"], cvae_cha_encoded,
                    nn_cha_encoded)
        else:
            t_pos, t_rot, t_vel, t_ang, t_speed = _decode_frame(
                params, cfg, consts, x["encoded"], cvae_cha_encoded,
                compute_dtype, lean=lean_decode)
            c_pos, c_rot, c_vel, c_ang, c_speed = (
                t_pos, t_rot, t_vel, t_ang, t_speed)

        # --- source root integration (f64 accumulators when root_dtype
        # is float64; pose-level outputs cast back to f32) -----------------
        s_rootpos, s_rootrot, s_rootvel, s_rootang = _integrate_root(
            carry.src_pos0, carry.src_rot0, x["rvel_last"], x["rang_last"], dt)
        f32 = x["pos_last"].dtype
        src_pos = x["pos_last"].at[0].set(s_rootpos.astype(f32))
        src_rot = x["rot_last"].at[0].set(s_rootrot.astype(f32))
        src_vel = x["vel_last"].at[0].set(s_rootvel.astype(f32))
        src_ang = x["ang_last"].at[0].set(s_rootang.astype(f32))

        # --- CVAE/trans stream root integration --------------------------
        t_ratio = _guarded_ratio(t_speed, x["hips_speed_mean"])
        t_rootpos, t_rootrot, t_rootvel, t_rootang = _integrate_root(
            carry.trans_pos0, carry.trans_rot0,
            x["rvel_last"] * t_ratio, x["rang_last"], dt)
        trans_pos, trans_rot, trans_vel, trans_ang = _assemble(
            t_rootpos, t_rootrot, t_rootvel, t_rootang,
            t_pos, t_rot, t_vel, t_ang)

        # --- NN/cm stream root integration -------------------------------
        c_ratio = _guarded_ratio(c_speed, x["hips_speed_mean"])
        c_rootpos, c_rootrot, c_rootvel, c_rootang = _integrate_root(
            carry.cm_pos0, carry.cm_rot0,
            x["rvel_last"] * c_ratio, x["rang_last"], dt)
        cm_pos, cm_rot, cm_vel, cm_ang = _assemble(
            c_rootpos, c_rootrot, c_rootvel, c_rootang,
            c_pos, c_rot, c_vel, c_ang)

        # --- contact fixup with foot locking + IK -------------------------
        # blended pose fed to the IK (test_fullframework.py:532-536)
        ik_blend = 0.5 * (carry.ik_prev_pos + trans_vel * dt) + 0.5 * trans_pos
        if ik.enabled:
            new_cs, adjusted_rot = _ik_fixup(
                parents_key, cbones, ik, dt, carry.contacts,
                ik_blend, trans_rot, x["contact_last"] > 0.5)
        else:
            new_cs, adjusted_rot = carry.contacts, trans_rot

        # --- blending for the raw trans stream ----------------------------
        trans_blended = (
            0.5 * (carry.trans_prev_pos + trans_vel * dt) + 0.5 * trans_pos)

        new_carry = StreamCarry(
            src_pos0=s_rootpos,
            src_rot0=s_rootrot,
            trans_pos0=t_rootpos,
            trans_prev_pos=trans_blended,
            trans_rot0=t_rootrot,
            ik_prev_pos=ik_blend,
            cm_pos0=c_rootpos,
            cm_rot0=c_rootrot,
            prev_cha_encoded=prev_cha_encoded,
            contacts=new_cs,
            key=key,
        )
        outputs = {
            "src_pos": src_pos, "src_rot": src_rot,
            "src_vel": src_vel, "src_ang": src_ang,
            "trans_pos": trans_blended, "trans_rot": trans_rot,
            "ik_pos": ik_blend, "ik_rot": adjusted_rot,
            "cm_pos": cm_pos, "cm_rot": cm_rot,
            "contact": x["contact_last"],
            "nn_index": idx,
        }
        return new_carry, outputs

    return step


def init_stream(params, cfg, consts: RuntimeConsts, parents, frame0: Dict,
                contact_bones=(5, 24), dt: float = 1.0 / 60.0,
                key: Optional[jax.Array] = None, root_dtype=None,
                lean_decode: bool = False):
    """Frame-0 bootstrap (test_fullframework.py:288-435): NN match, decode,
    identity-root integration, contact-state reset at the decoded toe pose.
    Returns (carry, frame0 outputs)."""
    key = jax.random.PRNGKey(0) if key is None else key
    parents_key = tuple(int(p) for p in parents)
    root_dtype = _resolve_root_dtype(root_dtype)

    if "nn_idx" in frame0:
        idx = frame0["nn_idx"]  # precomputed by the batch runner
    else:
        cnt = (frame0["cnt"] if "cnt" in frame0
               else gen.content_feature(frame0["encoded"]))
        src_cnt_nm = (cnt - consts.cnt_mean) / consts.cnt_std
        idx = nn_index(src_cnt_nm.reshape(-1), consts.cha_cnt_flat,
                       consts.cha_cnt_sq)
    cha_enc = consts.cha_encoded[idx].astype(jnp.float32)

    t_pos, t_rot, t_vel, t_ang, t_speed = _decode_frame(
        params, cfg, consts, frame0["encoded"], cha_enc, lean=lean_decode)

    identity = jnp.asarray([1.0, 0.0, 0.0, 0.0], root_dtype)
    zero3 = jnp.zeros(3, root_dtype)

    # source bootstrap
    s_rootpos, s_rootrot, s_rootvel, s_rootang = _integrate_root(
        zero3, identity, frame0["rvel_last"], frame0["rang_last"], dt)
    f32 = frame0["pos_last"].dtype
    src_pos = frame0["pos_last"].at[0].set(s_rootpos.astype(f32))
    src_rot = frame0["rot_last"].at[0].set(s_rootrot.astype(f32))
    src_vel = frame0["vel_last"].at[0].set(s_rootvel.astype(f32))
    src_ang = frame0["ang_last"].at[0].set(s_rootang.astype(f32))

    # characterized bootstrap (both streams share the NN match at frame 0)
    ratio = _guarded_ratio(t_speed, frame0["hips_speed_mean"])
    t_rootpos, t_rootrot, t_rootvel, t_rootang = _integrate_root(
        zero3, identity, frame0["rvel_last"] * ratio, frame0["rang_last"], dt)
    trans_pos, trans_rot, trans_vel, trans_ang = _assemble(
        t_rootpos, t_rootrot, t_rootvel, t_rootang, t_pos, t_rot, t_vel, t_ang)

    # contact state pinned at the decoded toe pose (:412-431)
    toes = np.asarray(contact_bones, np.int32)
    toe_pos, toe_vel = [], []
    for b in toes:
        gp, gv, _, _ = quat.fk_vel_bone(
            trans_rot, trans_pos, trans_vel, trans_ang, parents_key, int(b))
        toe_pos.append(gp)
        toe_vel.append(gv)
    cs = ContactState.init(jnp.stack(toe_pos).astype(root_dtype),
                           jnp.stack(toe_vel).astype(root_dtype))

    carry = StreamCarry(
        src_pos0=s_rootpos, src_rot0=s_rootrot,
        trans_pos0=t_rootpos, trans_prev_pos=trans_pos,
        trans_rot0=t_rootrot,
        ik_prev_pos=trans_pos,
        cm_pos0=t_rootpos, cm_rot0=t_rootrot,
        prev_cha_encoded=cha_enc,
        contacts=cs, key=key,
    )
    outputs = {
        "src_pos": src_pos, "src_rot": src_rot,
        "src_vel": src_vel, "src_ang": src_ang,
        "trans_pos": trans_pos, "trans_rot": trans_rot,
        "ik_pos": trans_pos, "ik_rot": trans_rot,
        "cm_pos": trans_pos, "cm_rot": trans_rot,
        "contact": frame0["contact_last"],
        "nn_index": idx,
    }
    return carry, outputs


_FEAT_KEYS = ("encoded", "pos_last", "rot_last", "vel_last",
              "ang_last", "rvel_last", "rang_last", "contact_last",
              "hips_speed_mean")


def _as_f32_feats(stream_feats: Dict) -> Dict:
    """Load the stream feature pytree as f32 (contact included) — explicit
    so enabling x64 for f64 root accumulators can't promote the inputs.

    "cnt" is optional: featurizers called with emit_cnt=False drop it and
    the runtime re-derives it from encoded (it is exactly
    mean_variance_norm(encoded)), halving per-frame stream residency."""
    out = {k: jnp.asarray(np.asarray(stream_feats[k]), jnp.float32)
           for k in _FEAT_KEYS}
    if "cnt" in stream_feats:
        out["cnt"] = jnp.asarray(np.asarray(stream_feats["cnt"]),
                                 jnp.float32)
    return out


def characterize_clip(params, cfg, cvae_params, cvae_cfg,
                      consts: RuntimeConsts, parents, stream_feats: Dict,
                      *, contact_bones=(5, 24), ik: IKConfig = IKConfig(),
                      dt: float = 1.0 / 60.0, deterministic: bool = False,
                      compute_cm: bool = True, compute_dtype=None,
                      root_dtype=jnp.float64, fuse_decodes: bool = False,
                      lean_decode: bool = False, cvae_dtype=None,
                      key: Optional[jax.Array] = None) -> Dict[str, np.ndarray]:
    """Offline characterization of a whole clip: frame-0 init + `lax.scan`
    over the remaining frames, all inside one jit.

    ``root_dtype`` defaults to float64 here (the offline demo path, where
    BASELINE's 1e-3 long-horizon fidelity bound applies); the batched
    throughput runner defaults to f32.  NOTE: the f64 default flips the
    process-global ``jax_enable_x64`` flag on first use (warned once; see
    ``_resolve_root_dtype``) — pass ``root_dtype=jnp.float32`` when
    embedding next to other JAX programs.
    """
    use_cvae = cvae_params is not None
    step = make_stream_step(cfg, cvae_cfg, parents, contact_bones, ik, dt,
                            deterministic, use_cvae=use_cvae,
                            compute_cm=compute_cm,
                            compute_dtype=compute_dtype,
                            root_dtype=root_dtype,
                            fuse_decodes=fuse_decodes,
                            lean_decode=lean_decode,
                            cvae_dtype=cvae_dtype)

    xs_all = _as_f32_feats(stream_feats)
    frame0 = {k: v[0] for k, v in xs_all.items()}
    xs = {k: v[1:] for k, v in xs_all.items()}

    @jax.jit
    def run(params, cvae_params, consts, frame0, xs, key):
        ctx = (params, cvae_params, consts)
        carry, out0 = init_stream(params, cfg, consts, parents, frame0,
                                  contact_bones, dt, key,
                                  root_dtype=root_dtype,
                                  lean_decode=lean_decode)
        _, outs = lax.scan(lambda c, x: step(ctx, c, x), carry, xs)
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), out0, outs)

    key = jax.random.PRNGKey(1777) if key is None else key
    return jax.tree.map(
        np.asarray, run(params, cvae_params, consts, frame0, xs, key))


def make_batch_runner(params, cfg, cvae_params, cvae_cfg,
                      consts: RuntimeConsts, parents, *,
                      contact_bones=(5, 24), ik: IKConfig = IKConfig(),
                      dt: float = 1.0 / 60.0, deterministic: bool = False,
                      compute_cm: bool = True, compute_dtype=None,
                      root_dtype=None, unroll: int = 1,
                      fuse_decodes: bool = False, lean_decode: bool = False,
                      multi_character: bool = False, cvae_dtype=None):
    """Batched-streams characterizer: vmap the per-frame step over S
    parallel streams and scan over time — the ">=10k frames/sec/chip" play
    (SURVEY.md §5: scale by batching streams, not sharding a window).

    Returns a jitted fn(frame0, xs, keys) where frame0 pytree leaves have
    leading dim S, xs leaves (T-1, S, ...), keys (S, 2).

    ``root_dtype=jnp.float64`` flips the process-global ``jax_enable_x64``
    flag on first use (warned once; see ``_resolve_root_dtype``).

    ``multi_character=True`` serves a DIFFERENT character per stream from
    ONE shared database stack: ``consts`` leaves carry a leading C
    (character) axis (build with :func:`stack_consts`, which pads
    databases to a common size with +inf-scored rows), and the runner
    takes an extra ``char_ids`` (S,) int32 array mapping each stream to
    its character.  Each stream's step gathers its character's rows from
    the shared stack — C characters cost C databases of HBM, not S.
    """
    use_cvae = cvae_params is not None
    step = make_stream_step(cfg, cvae_cfg, parents, contact_bones, ik, dt,
                            deterministic, use_cvae=use_cvae,
                            compute_cm=compute_cm,
                            compute_dtype=compute_dtype,
                            root_dtype=root_dtype,
                            fuse_decodes=fuse_decodes,
                            lean_decode=lean_decode,
                            cvae_dtype=cvae_dtype)

    # ---- hoisted context matching ---------------------------------------
    # The NN query is a pure function of the per-frame SOURCE cnt
    # (test_fullframework.py:443) — no dependence on the stream carry —
    # so every (frame, stream) match runs as a pre-scan einsum instead
    # of T per-frame matmuls inside it.  Multi-character sessions use
    # the grouped matcher: C*G*M*D total (G = largest per-character
    # stream count) vs the masked full-stack form's S*C*M*D — the C=1
    # cost for an even character distribution.
    def match(consts, cnt_chunk, char_ids, group_size):
        """(Tc, S, tok, dim) cnt -> (Tc, S) database indices."""
        if char_ids is None:
            q = (cnt_chunk - consts.cnt_mean) / consts.cnt_std
        else:
            q = (cnt_chunk - consts.cnt_mean[char_ids]) \
                / consts.cnt_std[char_ids]
        q = q.reshape(q.shape[:2] + (-1,))
        db = consts.cha_cnt_flat  # (M, D) or (C, M, D)
        if compute_dtype is not None:
            q = q.astype(compute_dtype)
            db = db.astype(compute_dtype)
        if char_ids is None:
            return nn_index(q, db, consts.cha_cnt_sq)
        return nn_index_grouped(q, db, consts.cha_cnt_sq, char_ids,
                                group_size)

    def match_xs(consts, xs, char_ids, group_size):
        """Pre-scan matching for a (T, S, ...) xs pytree -> (T, S) ids."""
        if "cnt" in xs:
            return match(consts, xs["cnt"], char_ids, group_size)
        # cnt dropped from the streams (it is exactly
        # mean_variance_norm(encoded)): re-derive it here in TIME
        # CHUNKS so the (T, S, tok, dim) cnt temp never materializes —
        # carrying it doubled the per-frame stream inputs and fed the
        # S=256 OOM.  Chunks overlap at the tail (identical rewrites)
        # to keep shapes static.
        enc = xs["encoded"]
        T = enc.shape[0]
        tchunk = min(32, T)
        nsteps = -(-T // tchunk)

        def body(i, acc):
            start = jnp.minimum(i * tchunk, T - tchunk)
            chunk = lax.dynamic_slice_in_dim(enc, start, tchunk, axis=0)
            idx = match(consts, gen.content_feature(chunk), char_ids,
                        group_size)
            return lax.dynamic_update_slice_in_dim(acc, idx, start, axis=0)

        return lax.fori_loop(0, nsteps, body,
                             jnp.zeros((T, enc.shape[1]), jnp.int32))

    def consts_for(consts, cid, char_ids):
        if char_ids is None:
            return consts
        # Character selection WITHOUT per-stream database copies: the
        # big leaves stay unbatched (C*M)-flattened shared arrays (a
        # naive consts[cid] gather under vmap materializes an
        # (S, M, tok, dim) temp — 11 GB at bench scale); the stream's
        # character is selected by masking other characters' rows to
        # +inf in the squared-norm term of the NN distance, so the
        # score matmul runs once against the shared stack and only
        # the winning row is gathered.
        C, M = consts.cha_cnt_sq.shape
        row_char = jnp.arange(C * M, dtype=jnp.int32) // M
        sq_masked = consts.cha_cnt_sq.reshape(-1) + jnp.where(
            row_char == cid, 0.0, jnp.inf)
        return consts._replace(
            cha_encoded=consts.cha_encoded.reshape(
                (C * M,) + consts.cha_encoded.shape[2:]),
            cha_cnt_flat=consts.cha_cnt_flat.reshape(
                (C * M, consts.cha_cnt_flat.shape[-1])),
            cha_cnt_sq=sq_masked,
            Y_mean=consts.Y_mean[cid], Y_std=consts.Y_std[cid],
            cnt_mean=consts.cnt_mean[cid],
            cnt_std=consts.cnt_std[cid],
            src_cnt_mean=consts.src_cnt_mean[cid],
            src_cnt_std=consts.src_cnt_std[cid],
            cha_encoded_mean=consts.cha_encoded_mean[cid],
            cha_encoded_std=consts.cha_encoded_std[cid])

    def init_streams(params, consts, frame0, keys, char_ids):
        """vmapped per-stream init; frame0 must already carry nn_idx."""
        def init_one(f0, key, cid):
            return init_stream(params, cfg, consts_for(consts, cid,
                                                       char_ids),
                               parents, f0, contact_bones, dt, key,
                               root_dtype=root_dtype,
                               lean_decode=lean_decode)

        cid_axis = None if char_ids is None else 0
        return jax.vmap(init_one, in_axes=(0, 0, cid_axis))(
            frame0, keys, char_ids)

    def scan_streams(params, cvae_params, consts, carry, xs, char_ids):
        """lax.scan of the vmapped step; xs must already carry nn_idx."""
        cid_axis = None if char_ids is None else 0
        step_v = jax.vmap(
            lambda c, x, cid: step(
                (params, cvae_params, consts_for(consts, cid, char_ids)),
                c, x),
            in_axes=(0, 0, cid_axis))
        return lax.scan(lambda c, x: step_v(c, x, char_ids), carry, xs,
                        unroll=unroll)

    def localize_nn(consts, out, char_ids):
        if char_ids is None:
            return out
        # NN matched against the (C*M)-flattened stack; report the
        # character-local index (reference semantics).  char_ids (S,)
        # broadcasts against both (T, S) scans and (S,) single frames.
        M = consts.cha_cnt_sq.shape[1]
        return dict(out, nn_index=out["nn_index"] - char_ids * M)

    @functools.partial(jax.jit, static_argnames=("group_size",))
    def run(params, cvae_params, consts, frame0, xs, keys, char_ids,
            group_size=None):
        idx0 = match(consts, gen.content_feature(frame0["encoded"])[None]
                     if "cnt" not in frame0 else frame0["cnt"][None],
                     char_ids, group_size)[0]
        idx_xs = match_xs(consts, xs, char_ids, group_size)
        frame0 = dict(frame0, nn_idx=idx0)
        xs = dict(xs, nn_idx=idx_xs)
        carry, out0 = init_streams(params, consts, frame0, keys, char_ids)
        _, outs = scan_streams(params, cvae_params, consts, carry, xs,
                               char_ids)
        # outs: (T-1, S, ...) -> prepend frame 0 -> (T, S, ...)
        out = jax.tree.map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), out0, outs)
        return localize_nn(consts, out, char_ids)

    # ---- time-chunked entries (bounded HBM residency) --------------------
    # The monolithic `run` holds the WHOLE (T, S, tok, dim) encoded stream
    # in HBM — 5.7 GB at S=256/T=240, the second half of the documented
    # S=256 OOM.  These two entries split the same program at chunk
    # boundaries: the carry crosses chunks unchanged, so outputs are
    # IDENTICAL to the monolithic scan (pinned by
    # tests/test_stream.py chunked==monolithic), while only ~2 chunks of
    # xs are device-resident at once and the host upload of chunk c+1
    # overlaps the device scan of chunk c (JAX async dispatch).
    @functools.partial(jax.jit, static_argnames=("group_size",))
    def init_chunked(params, cvae_params, consts, frame0, keys, char_ids,
                     group_size=None):
        idx0 = match(consts, gen.content_feature(frame0["encoded"])[None]
                     if "cnt" not in frame0 else frame0["cnt"][None],
                     char_ids, group_size)[0]
        carry, out0 = init_streams(params, consts,
                                   dict(frame0, nn_idx=idx0), keys,
                                   char_ids)
        return carry, localize_nn(consts, out0, char_ids)

    @functools.partial(jax.jit, static_argnames=("group_size",))
    def scan_chunked(params, cvae_params, consts, carry, xs, char_ids,
                     group_size=None):
        idx_xs = match_xs(consts, xs, char_ids, group_size)
        carry, outs = scan_streams(params, cvae_params, consts, carry,
                                   dict(xs, nn_idx=idx_xs), char_ids)
        return carry, localize_nn(consts, outs, char_ids)

    if multi_character:
        n_characters = int(consts.cha_cnt_sq.shape[0])

    def _check_cids(char_ids):
        # validate host-side: an out-of-range id would clamp silently
        # inside the jnp gathers and serve the wrong character
        cid = np.asarray(char_ids)
        if cid.size and (cid.min() < 0 or cid.max() >= n_characters):
            raise ValueError(
                f"char_ids must be in [0, {n_characters}) — got range "
                f"[{cid.min()}, {cid.max()}] for a {n_characters}-"
                "character consts stack")
        # static group size for the grouped matcher: the largest
        # per-character stream count (a new size retraces, but a
        # session's character distribution is fixed)
        group_size = int(np.bincount(cid, minlength=n_characters).max())
        return jnp.asarray(cid, jnp.int32), group_size

    if multi_character:
        def runner(frame0, xs, keys, char_ids):
            cid, group_size = _check_cids(char_ids)
            return run(params, cvae_params, consts, frame0, xs, keys,
                       cid, group_size=group_size)
    else:
        def runner(frame0, xs, keys):
            return run(params, cvae_params, consts, frame0, xs, keys, None)

    def chunked(frame0, xs, keys, char_ids=None, tchunk: int = 60):
        """Time-chunked driver over HOST-resident stream inputs (numpy
        pytrees from ``stack_stream_inputs(..., device=False)``): the
        monolithic runner uploads the whole (T, S, tok, dim) encoded
        stream (5.7 GB at S=256/T=240); this loop uploads one tchunk
        slice at a time, so device residency is ~2 chunks of xs plus the
        (small) pose outputs, and the upload of chunk c+1 overlaps the
        scan of chunk c via JAX async dispatch.  The scan carry crosses
        chunk boundaries unchanged, so outputs match the monolithic
        runner (pinned by tests/test_runtime.py TestChunkedRunner); the
        tail chunk is edge-padded to keep one compiled program and its
        padded outputs trimmed."""
        cid, group_size = (_check_cids(char_ids) if multi_character
                           else (None, None))
        T = next(iter(xs.values())).shape[0]
        tchunk = min(int(tchunk), T)
        carry, out0 = init_chunked(params, cvae_params, consts,
                                   jax.tree.map(jnp.asarray, frame0),
                                   keys, cid, group_size=group_size)
        outs = []
        for start in range(0, T, tchunk):
            chunk = {k: v[start:start + tchunk] for k, v in xs.items()}
            npad = tchunk - chunk["encoded"].shape[0]
            if npad:
                chunk = {k: np.concatenate(
                    [v, np.repeat(v[-1:], npad, axis=0)])
                    for k, v in chunk.items()}
            chunk = jax.tree.map(jnp.asarray, chunk)
            carry, o = scan_chunked(params, cvae_params, consts, carry,
                                    chunk, cid, group_size=group_size)
            outs.append(o)
        return jax.tree.map(
            lambda a, *bs: jnp.concatenate([a[None]] + list(bs),
                                           axis=0)[:T + 1],
            out0, *outs)

    runner.chunked = chunked
    # expose the inner jitted fn + bound context for AOT cost analysis /
    # profiling (same pattern as scripts/train_cost_probe.py)
    runner._inner = run
    runner._ctx = (params, cvae_params, consts)
    return runner


def pad_character_database(consts: RuntimeConsts, target_m: int) -> RuntimeConsts:
    """Pad one character's context database to ``target_m`` rows so
    differently-sized characters can stack into one batch.  Padded rows get
    +inf squared norm, so the exact NN argmin (|q|^2 - 2qx + |x|^2) can
    never select them; their encoded rows are zeros."""
    m = consts.cha_encoded.shape[0]
    if m > target_m:
        raise ValueError(f"database has {m} rows > target {target_m}")
    if m == target_m:
        return consts
    pad = target_m - m
    return consts._replace(
        cha_encoded=jnp.concatenate(
            [consts.cha_encoded,
             jnp.zeros((pad,) + consts.cha_encoded.shape[1:],
                       consts.cha_encoded.dtype)]),
        cha_cnt_flat=jnp.concatenate(
            [consts.cha_cnt_flat,
             jnp.zeros((pad, consts.cha_cnt_flat.shape[1]),
                       consts.cha_cnt_flat.dtype)]),
        cha_cnt_sq=jnp.concatenate(
            [consts.cha_cnt_sq,
             jnp.full((pad,), jnp.inf, consts.cha_cnt_sq.dtype)]),
    )


def cast_database(consts: RuntimeConsts, dtype) -> RuntimeConsts:
    """Store the big per-character database arrays (encoded rows + the
    normalized cnt matrix) in ``dtype`` (bf16 halves them — the full
    30-style roster at 2048 rows each is ~11 GB in f32, over half of a
    16 GB chip).  The |x|^2 norms stay f32 (cheap, and the argmin is a
    near-tie decider); gathered encoded rows cast back to f32 at use.
    NN picks can flip on exact ties vs the f32 stack — same contract as
    the bf16 compute knob (README bf16 fidelity row)."""
    dtype = jnp.dtype(dtype)
    return consts._replace(
        cha_encoded=consts.cha_encoded.astype(dtype),
        cha_cnt_flat=consts.cha_cnt_flat.astype(dtype),
    )


def stack_consts(consts_list) -> RuntimeConsts:
    """Stack per-character RuntimeConsts into the shared character stack
    for ``make_batch_runner(multi_character=True)`` (databases padded to a
    common size first)."""
    target_m = max(c.cha_encoded.shape[0] for c in consts_list)
    padded = [pad_character_database(c, target_m) for c in consts_list]
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *padded)


def stack_stream_inputs(stream_feats: Dict, device: bool = True):
    """Split featurized-clip arrays into (frame0, xs) pytrees for
    make_batch_runner; leading axes (S, T, ...) -> frame0 (S, ...),
    xs (T-1, S, ...).

    Host (numpy) inputs are transposed to scan-major layout BEFORE the
    device upload: a device-side ``jnp.moveaxis`` holds both the S-major
    original and the T-major copy live at once — at S=256 streams the
    encoded array alone is 5.7 GB, so the transpose temp was the first
    half of the documented S=256 OOM.  Device-resident inputs (the e2e
    path feeds the featurizer's outputs directly) keep the on-device
    moveaxis — they are already paid for.

    ``device=False`` keeps host leaves as numpy (no upload) — the input
    form for ``runner.chunked``, which streams one time chunk to the
    device at a time."""
    keys = _FEAT_KEYS + (("cnt",) if "cnt" in stream_feats else ())
    frame0, xs = {}, {}
    for k in keys:
        v = stream_feats[k]
        if isinstance(v, jax.Array):
            v = v.astype(jnp.float32)
            frame0[k] = v[:, 0]
            xs[k] = jnp.moveaxis(v[:, 1:], 0, 1)
        else:
            v = np.asarray(v, np.float32)
            frame0[k] = v[:, 0]
            xs[k] = np.ascontiguousarray(np.moveaxis(v[:, 1:], 0, 1))
            if device:
                frame0[k] = jnp.asarray(frame0[k])
                xs[k] = jnp.asarray(xs[k])
    return frame0, xs
