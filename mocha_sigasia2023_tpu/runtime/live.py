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

    def __init__(self, params, cfg: gen.GeneratorConfig, cvae_params,
                 cvae_cfg: Optional[jcvae.CVAEConfig], consts: RuntimeConsts,
                 parents, *, contact_bones=(5, 24), ik: IKConfig = IKConfig(),
                 dt: float = 1.0 / 60.0, deterministic: bool = False,
                 key: Optional[jax.Array] = None):
        self._params = params
        self._cvae_params = cvae_params
        self._consts = consts
        self._cfg = cfg
        self._parents = parents
        self._contact_bones = tuple(int(b) for b in contact_bones)
        self._dt = dt
        self._key = jax.random.PRNGKey(1777) if key is None else key

        step = rts.make_stream_step(
            cfg, cvae_cfg, parents, self._contact_bones, ik, dt,
            deterministic, use_cvae=cvae_params is not None)

        self._step = jax.jit(
            lambda params, cvae_params, consts, carry, x: step(
                (params, cvae_params, consts), carry, x))
        self._init = jax.jit(
            lambda params, consts, frame0, key: rts.init_stream(
                params, cfg, consts, parents, frame0, self._contact_bones,
                dt, key))
        self._carry: Optional[StreamCarry] = None

    def _pack(self, frame: Dict) -> Dict:
        x = {k: jnp.asarray(np.asarray(frame[k])) for k in self.FEAT_KEYS}
        x["contact_last"] = x["contact_last"].astype(jnp.float32)
        return x

    def reset(self) -> None:
        self._carry = None

    def push_frame(self, frame: Dict) -> Dict[str, np.ndarray]:
        """Process one source frame; returns the characterized pose dict
        (src/trans/ik/cm pos+rot rows, contact flags, NN index)."""
        x = self._pack(frame)
        if self._carry is None:
            self._key, sub = jax.random.split(self._key)
            self._carry, out = self._init(
                self._params, self._consts, x, sub)
        else:
            self._carry, out = self._step(
                self._params, self._cvae_params, self._consts,
                self._carry, x)
        return jax.tree.map(np.asarray, out)
