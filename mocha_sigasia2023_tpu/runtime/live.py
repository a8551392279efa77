"""Live (frame-at-a-time) characterization for real-time serving.

The offline path scans whole clips (`stream.characterize_clip`); this module
wraps the same per-frame step as a stateful session for interactive use —
push one source frame's features, get the characterized pose back within the
60 FPS budget.  The carry lives on device between calls; one jitted program
runs per frame (plus one per encoded source window).

Role parity: the interactive intent of the reference demo loop
(test_fullframework.py:438-641), minus its per-frame CPU<->device
ping-pong.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import cvae as jcvae
from ..models import generator as gen
from . import stream as rts
from .stream import IKConfig, RuntimeConsts, StreamCarry


class LiveCharacterizer:
    """Stateful real-time characterization session.

    Feed per-frame features (one row of runtime.features.clip_stream_features
    output) via :meth:`push_frame`; poses come back as dicts of numpy arrays.
    The first pushed frame bootstraps the contact state and root integrators
    (frame-0 semantics of the reference demo).
    """

    FEAT_KEYS = ("encoded", "cnt", "pos_last", "rot_last", "vel_last",
                 "ang_last", "rvel_last", "rang_last", "contact_last",
                 "hips_speed_mean")
    OUT_KEYS = ("src_pos", "src_rot", "src_vel", "src_ang",
                "trans_pos", "trans_rot", "ik_pos", "ik_rot",
                "cm_pos", "cm_rot", "contact", "nn_index")

    def __init__(self, params, cfg: gen.GeneratorConfig, cvae_params,
                 cvae_cfg: Optional[jcvae.CVAEConfig], consts: RuntimeConsts,
                 parents, *, contact_bones=(5, 24), ik: IKConfig = IKConfig(),
                 dt: float = 1.0 / 60.0, deterministic: bool = False,
                 root_dtype=None, key: Optional[jax.Array] = None):
        self._params = params
        self._cvae_params = cvae_params
        self._consts = consts
        self._cfg = cfg
        self._parents = parents
        self._contact_bones = tuple(int(b) for b in contact_bones)
        self._dt = dt
        self._key = jax.random.PRNGKey(1777) if key is None else key

        tok, dim = cfg.num_tokens, cfg.encoder_dim
        J = cfg.njoints + 1
        self._feat_shapes = {
            "encoded": (tok, dim), "cnt": (tok, dim),
            "pos_last": (J, 3), "rot_last": (J, 4),
            "vel_last": (J, 3), "ang_last": (J, 3),
            "rvel_last": (3,), "rang_last": (3,),
            "contact_last": (2,), "hips_speed_mean": (),
        }
        self._out_shapes = {
            "src_pos": (J, 3), "src_rot": (J, 4),
            "src_vel": (J, 3), "src_ang": (J, 3),
            "trans_pos": (J, 3), "trans_rot": (J, 4),
            "ik_pos": (J, 3), "ik_rot": (J, 4),
            "cm_pos": (J, 3), "cm_rot": (J, 4),
            "contact": (2,), "nn_index": (),
        }

        # root_dtype=float64 closes long-horizon drift for always-on
        # sessions; default f32 keeps the per-frame latency path lean
        step = rts.make_stream_step(
            cfg, cvae_cfg, parents, self._contact_bones, ik, dt,
            deterministic, use_cvae=cvae_params is not None,
            root_dtype=root_dtype)

        # Serving-latency structure: ONE flat f32 array crosses host->device
        # per frame and ONE comes back (a frame dict would cost a transfer
        # round-trip per leaf — 22 crossings; measured 419 ms p50 through
        # the relay vs ~70 ms packed).  Unflatten/flatten happen inside the
        # jitted program where they fuse to nothing.
        feat_shapes = dict(self._feat_shapes)

        def unflatten(flat):
            x, o = {}, 0
            for k in self.FEAT_KEYS:
                shp = feat_shapes[k]
                n = int(np.prod(shp)) if shp else 1
                x[k] = flat[o:o + n].reshape(shp)
                o += n
            return x

        def flatten_out(out):
            return jnp.concatenate(
                [out[k].astype(jnp.float32).reshape(-1)
                 for k in self.OUT_KEYS])

        def packed_step(params, cvae_params, consts, carry, flat):
            carry, out = step((params, cvae_params, consts), carry,
                              unflatten(flat))
            return carry, flatten_out(out)

        def packed_init(params, consts, flat, key):
            carry, out = rts.init_stream(
                params, cfg, consts, parents, unflatten(flat),
                self._contact_bones, dt, key, root_dtype=root_dtype)
            return carry, flatten_out(out)

        self._step = jax.jit(packed_step, donate_argnums=(3,))
        self._init = jax.jit(packed_init)
        self._carry: Optional[StreamCarry] = None
        self._pending = None

    def _pack(self, frame: Dict) -> jax.Array:
        flat = np.concatenate(
            [np.asarray(frame[k], np.float32).reshape(-1)
             for k in self.FEAT_KEYS])
        return jnp.asarray(flat)

    def _unpack_out(self, flat_out: np.ndarray) -> Dict[str, np.ndarray]:
        out, o = {}, 0
        for k in self.OUT_KEYS:
            shp = self._out_shapes[k]
            n = int(np.prod(shp)) if shp else 1
            out[k] = flat_out[o:o + n].reshape(shp)
            o += n
        out["nn_index"] = out["nn_index"].astype(np.int64)
        return out

    def reset(self) -> None:
        self._carry = None
        self._pending = None

    def _dispatch(self, frame: Dict):
        x = self._pack(frame)
        if self._carry is None:
            self._key, sub = jax.random.split(self._key)
            self._carry, out = self._init(
                self._params, self._consts, x, sub)
        else:
            self._carry, out = self._step(
                self._params, self._cvae_params, self._consts,
                self._carry, x)
        return out

    def push_frame(self, frame: Dict) -> Dict[str, np.ndarray]:
        """Process one source frame; returns the characterized pose dict
        (src/trans/ik/cm pos+rot rows, contact flags, NN index)."""
        if self._pending is not None:
            raise RuntimeError(
                "a pipelined frame is still in flight — call flush() "
                "before switching from push_frame_pipelined to push_frame "
                "(its pose would otherwise be silently dropped)")
        return self._unpack_out(np.asarray(self._dispatch(frame)))

    def push_frame_pipelined(self, frame: Dict) -> Optional[Dict[str, np.ndarray]]:
        """One-frame-pipelined serving: dispatch frame i, return frame
        i-1's pose (None on the first call; :meth:`flush` drains the tail).

        The device computes frame i while the host materializes frame
        i-1's already-finished output, so each call pays ONE host<->device
        round trip instead of the dispatch+fetch chain — on relay-tunneled
        hosts this runs at the RTT floor.  Cost: the output lags its input
        by one frame (16.7 ms at 60 fps source pacing).
        """
        out = self._dispatch(frame)
        prev, self._pending = self._pending, out
        return None if prev is None else self._unpack_out(np.asarray(prev))

    def flush(self) -> Optional[Dict[str, np.ndarray]]:
        """Return the last pipelined frame's pose (if any)."""
        prev, self._pending = self._pending, None
        return None if prev is None else self._unpack_out(np.asarray(prev))
