"""CVAE predictor trainer: scheduled-sampling autoregressive rollouts.

Semantics target: /root/reference/train_CVAE.py:26-289 —
  * temp-weighted context normalization (linspace 1->3 over the 15 temporal
    token groups, :64-92),
  * noise-augmented source contexts (:192-195),
  * nearest-neighbor ground-truth character features per action in cnt
    space (:197-214; BallTree -> one matmul top-1 here),
  * 10-step rollouts with teacher->ramp->student scheduled sampling and a
    p=0.8 dropout on the autoregressive condition (:162-171, 223-247),
  * per-offset optimizer steps with L1 + annealed KL (1e-2) + 0.1 x
    distance-preservation losses (:238-259),
  * AdamW + ExponentialLR(0.99) stepped every 200 iterations (:155-160,
    287-288).

TPU-native structure: the whole 9-offset rollout (including the 9 optimizer
updates) is one `lax.scan` inside a single jitted step; the NN match is a
batched matmul against the per-action character feature matrix.
"""

from __future__ import annotations

from typing import Dict, Iterator, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from einops import rearrange

from ..models import cvae as jcvae
from ..models.cvae import CVAEConfig
from ..models.layers import mean_variance_norm
from ..ops.numerics import safe_sqrt
from ..runtime.matching import nn_index
from .losses import kl_normal


def temp_weight_matrix(num_temp: int = 15, nbody: int = 6, dim: int = 256,
                       lo: float = 1.0, hi: float = 3.0) -> np.ndarray:
    """Temporal emphasis weights: recent frames matter more
    (train_CVAE.py:64-66).  Shape (num_temp*nbody, dim), token-major like
    the encoder output."""
    w = np.linspace(lo, hi, num=num_temp)
    w = np.repeat(w[:, None], nbody * dim, axis=1)
    return rearrange(w, "t (v c) -> (t v) c", v=nbody).astype(np.float32)


def rollout_indices(range_starts, range_stops, steps: int, stride: int = 5):
    """Consecutive-window rollout index sequences (train_CVAE.py:125-143)."""
    out = []
    for s, e in zip(range_starts, range_stops):
        for j in range(0, int(e - s) - steps, stride):
            out.append(np.arange(s + j, s + j + steps))
    return np.asarray(out, dtype=np.int32)


def sample_schedule(teacher: int, ramp: int, student: int) -> np.ndarray:
    """P(student forcing) per iteration (train_CVAE.py:162-171)."""
    return np.concatenate([
        np.zeros(teacher), np.linspace(0.0, 1.0, ramp), np.ones(student)
    ]).astype(np.float32)


class CVAETrainerConfig(NamedTuple):
    latent_dim: int = 256
    depth: int = 2
    nheads: int = 4
    feedforward_dim: int = 512
    dropout: float = 0.1
    nseq: int = 90
    rollout_steps: int = 10
    batch_size: int = 32
    lr: float = 1e-4
    weight_decay: float = 1e-4
    lr_gamma: float = 0.99
    lr_step_every: int = 200
    kl_w: float = 1e-2
    kl_anneal_start: int = 0
    kl_anneal_end: int = 5000
    dist_w: float = 0.1
    condition_dropout: float = 0.8
    teacher_iters: int = 10000
    ramping_iters: int = 10000
    student_iters: int = 20000
    # bf16 forwards with f32 master weights + f32 loss tails (mixed
    # precision; None = full f32, the reference-parity default)
    compute_dtype: Optional[str] = None

    @property
    def num_iters(self):
        return self.teacher_iters + self.ramping_iters + self.student_iters


class CVAETrainer:
    """Trains the CVAE over precomputed encoder features for one
    source->character pair."""

    def __init__(self, tc: CVAETrainerConfig, *, src_cnt, src_action,
                 src_range_starts, src_range_stops, cha_cnt, cha_encoded,
                 cha_action, cha_range_starts, cha_range_stops,
                 cnt_mean, cnt_std, target_actions, seed: int = 1777):
        self.tc = tc
        self.cfg = CVAEConfig(
            output_seq=tc.nseq, latent_dim=tc.latent_dim, depth=tc.depth,
            nheads=tc.nheads, feedforward_dim=tc.feedforward_dim,
            dropout=tc.dropout)

        tw = temp_weight_matrix(num_temp=tc.nseq // 6, nbody=6,
                                dim=tc.latent_dim)
        self.temp_weight = tw

        # normalization statistics (train_CVAE.py:68-102)
        self.norms = {
            "src_cnt_mean": src_cnt.mean(axis=0).astype(np.float32),
            "src_cnt_std": src_cnt.std(axis=0).astype(np.float32),
            "cha_cnt_mean": cha_cnt.mean(axis=0).astype(np.float32),
            "cha_cnt_std": cha_cnt.std(axis=0).astype(np.float32),
            "cha_encoded_mean": cha_encoded.mean(axis=0).astype(np.float32),
            "cha_encoded_std": cha_encoded.std(axis=0).astype(np.float32),
        }
        # temp-weighted stds (train_CVAE.py:88-92)
        self._cnt_std_w = (cnt_std / tw).astype(np.float32)
        self._cnt_mean = cnt_mean.astype(np.float32)
        self._src_cnt_std_w = self.norms["src_cnt_std"] / tw
        self._cha_cnt_std_w = self.norms["cha_cnt_std"] / tw
        self._cha_enc_std_w = self.norms["cha_encoded_std"] / tw
        self._noise_std = self._cnt_std_w + 1.0  # (:95)

        self.src_cnt = src_cnt
        self.cha_cnt = cha_cnt
        self.cha_encoded = cha_encoded
        self.src_idx = rollout_indices(src_range_starts, src_range_stops,
                                       tc.rollout_steps)
        self.cha_idx = rollout_indices(cha_range_starts, cha_range_stops,
                                       tc.rollout_steps)
        self.src_act = src_action[self.src_idx[:, 0]]
        self.cha_act = cha_action[self.cha_idx[:, 0]]
        self.target_actions = list(target_actions)
        self.schedule = sample_schedule(
            tc.teacher_iters, tc.ramping_iters, tc.student_iters)

        self.rng = np.random.RandomState(seed)
        self.key = jax.random.PRNGKey(seed)

        # LR decay cadence (train_CVAE.py:287-288): ExponentialLR(0.99)
        # stepped at the END of iterations 0, 200, 400, ... — but optax
        # counts optimizer UPDATES, of which each iteration performs
        # rollout_steps-1.  Map update-count -> iteration -> number of
        # scheduler steps taken before that iteration ran.
        updates_per_iter = max(tc.rollout_steps - 1, 1)

        def lr_schedule(count):
            it = count // updates_per_iter
            n_decays = jnp.where(it >= 1, (it - 1) // tc.lr_step_every + 1, 0)
            return tc.lr * (tc.lr_gamma ** n_decays)

        self.tx = optax.adamw(lr_schedule, weight_decay=tc.weight_decay)
        self.params = jcvae.init_cvae(jax.random.PRNGKey(seed + 1), self.cfg)
        self.opt_state = self.tx.init(self.params)
        self._rollout = jax.jit(self._rollout_impl)

    # ------------------------------------------------------------------

    def _rollout_impl(self, params, opt_state, src_cnt_nm, cha_enc_nm,
                      cha_cnt_nm, Dgnd, student_p, anneal_w, key):
        """One training iteration: scan over rollout offsets 1..S-1, with an
        optimizer update at every offset (train_CVAE.py:225-259)."""
        tc = self.tc
        enc_std = jnp.asarray(self._cha_enc_std_w)
        enc_mean = jnp.asarray(self.norms["cha_encoded_mean"])
        ccnt_std = jnp.asarray(self._cha_cnt_std_w)
        ccnt_mean = jnp.asarray(self.norms["cha_cnt_mean"])

        def cond_dropout(k, x):
            # torch F.dropout semantics: zero with p, scale kept by 1/(1-p)
            keep = 1.0 - tc.condition_dropout
            mask = jax.random.bernoulli(k, keep, x.shape)
            return jnp.where(mask, x / keep, 0.0)

        def make_condition(k, cnt_next, prev_enc):
            return jnp.concatenate([cnt_next, cond_dropout(k, prev_enc)],
                                   axis=1)

        k0, key = jax.random.split(key)
        condition0 = make_condition(k0, src_cnt_nm[:, 1], cha_enc_nm[:, 0])

        def offset_step(carry, offset):
            params, opt_state, condition, key = carry
            key, k_fwd, k_student, k_drop = jax.random.split(key, 4)

            def loss_fn(p):
                cdt = (jnp.dtype(tc.compute_dtype)
                       if tc.compute_dtype is not None else None)
                if cdt is not None:
                    # mixed precision: cast-through keeps f32 master
                    # weights (grads flow back through the cast); the
                    # loss tail below runs f32 regardless
                    p_fwd = jax.tree.map(lambda a: a.astype(cdt), p)
                    tgt = cha_enc_nm[:, offset].astype(cdt)
                    cond = condition.astype(cdt)
                else:
                    p_fwd, tgt, cond = p, cha_enc_nm[:, offset], condition
                out, (mu_po, lv_po), (mu_pr, lv_pr) = jcvae.forward(
                    p_fwd, tgt, cond, self.cfg, key=k_fwd, train=True)
                if cdt is not None:
                    out = out.astype(jnp.float32)
                    mu_po, lv_po, mu_pr, lv_pr = (
                        a.astype(jnp.float32)
                        for a in (mu_po, lv_po, mu_pr, lv_pr))
                kl = kl_normal(mu_po, lv_po, mu_pr, lv_pr).mean()
                enc_l1 = jnp.mean(jnp.abs(out - cha_enc_nm[:, offset]))
                out_un = out * enc_std + enc_mean
                cnt_til = (mean_variance_norm(out_un) - ccnt_mean) / ccnt_std
                # safe_sqrt: identical src/cha content rows (distance
                # exactly 0) must not emit inf grads (ops/numerics.py)
                Dtil = safe_sqrt(jnp.sum(jnp.square(
                    src_cnt_nm[:, offset] - cnt_til), axis=-1))
                dist_l1 = jnp.mean(jnp.abs(Dtil - Dgnd[:, offset]))
                cnt_l1 = jnp.mean(jnp.abs(cnt_til - cha_cnt_nm[:, offset]))
                total = enc_l1 + anneal_w * tc.kl_w * kl + tc.dist_w * dist_l1
                return total, (enc_l1, kl, cnt_l1, dist_l1, out)

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            enc_l1, kl, cnt_l1, dist_l1, out = aux
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            use_student = jax.random.uniform(k_student) < student_p
            next_frame = jnp.where(use_student, out, cha_enc_nm[:, offset])
            # condition for offset+1 (clamped gather keeps shapes static at
            # the final offset, where the condition is unused)
            nxt = jnp.minimum(offset + 1, tc.rollout_steps - 1)
            condition = make_condition(
                k_drop, src_cnt_nm[:, nxt], jax.lax.stop_gradient(next_frame))
            metrics = jnp.stack([enc_l1, kl, cnt_l1, dist_l1])
            return (params, opt_state, condition, key), metrics

        offsets = jnp.arange(1, tc.rollout_steps)
        (params, opt_state, _, _), metrics = jax.lax.scan(
            offset_step, (params, opt_state, condition0, key), offsets)
        # reference logging quirk kept verbatim: the per-iteration scalars
        # divide the 9-offset sums by num_steps_per_rollout = 10, not 9
        # (train_CVAE.py:266-269)
        return params, opt_state, metrics.sum(axis=0) / tc.rollout_steps

    # ------------------------------------------------------------------

    def sample_batch(self, it: int) -> Optional[Tuple]:
        """Host-side batch assembly: action pick, noise, NN ground truth
        (train_CVAE.py:181-224)."""
        tc = self.tc
        action = self.rng.choice(self.target_actions, 1)[0]
        src_pool = np.where(self.src_act == action)[0]
        if len(src_pool) < tc.batch_size:
            return None
        cha_pool = np.where(self.cha_act == action)[0]
        if len(cha_pool) < 1:
            return None

        samples = self.rng.choice(src_pool, tc.batch_size)
        bidx = self.src_idx[samples]
        src_cnt_b = self.src_cnt[bidx]  # (B, S, 90, 256)

        nsigma = self.rng.uniform(
            size=[tc.batch_size, 1, 1, 1]).astype(np.float32)
        noise = self.rng.normal(size=src_cnt_b.shape).astype(np.float32)
        src_cnt_hat = src_cnt_b + self._noise_std[None, None] * nsigma * noise

        cha_rollouts = self.cha_idx[cha_pool]
        cha_cnt_sel = self.cha_cnt[cha_rollouts]        # (M, S, 90, 256)
        cha_enc_sel = self.cha_encoded[cha_rollouts]

        # first-window NN in normalized cnt space (:207-211)
        db = ((cha_cnt_sel[:, 0] - self._cnt_mean[None]) /
              self._cnt_std_w[None]).reshape(len(cha_pool), -1)
        q = ((src_cnt_hat[:, 0] - self._cnt_mean[None]) /
             self._cnt_std_w[None]).reshape(tc.batch_size, -1)
        nearest = np.asarray(nn_index(jnp.asarray(q), jnp.asarray(db)))

        cha_enc_gnd = (cha_enc_sel[nearest]
                       - self.norms["cha_encoded_mean"][None, None]) \
            / self._cha_enc_std_w[None, None]
        src_cnt_nm = (src_cnt_hat - self.norms["src_cnt_mean"][None, None]) \
            / self._src_cnt_std_w[None, None]
        cha_cnt_nm = (cha_cnt_sel[nearest]
                      - self.norms["cha_cnt_mean"][None, None]) \
            / self._cha_cnt_std_w[None, None]
        Dgnd = np.sqrt(np.sum(np.square(src_cnt_nm - cha_cnt_nm), axis=-1))
        return (src_cnt_nm.astype(np.float32),
                cha_enc_gnd.astype(np.float32),
                cha_cnt_nm.astype(np.float32),
                Dgnd.astype(np.float32))

    def anneal_weight(self, it: int) -> float:
        tc = self.tc
        if it < tc.kl_anneal_start:
            return 0.0
        w = (it - tc.kl_anneal_start) / max(
            tc.kl_anneal_end - tc.kl_anneal_start, 1)
        return min(w, 1.0)

    def batch_stream(self, num_iters: int) -> Iterator[Tuple[int, Optional[Tuple]]]:
        """Yield (it, batch-or-None) for ``num_iters`` iterations.

        Host batch assembly (action pick, ~90 MB of noise, NN gather) is
        the per-iteration serial cost the reference pays inline
        (train_CVAE.py:181-224); wrapping THIS iterator in
        data.dataset.prefetch_batches(place=device-put) overlaps it (and
        the H2D upload) with the device rollout — the measured difference
        is 0.224 vs 13.8 iters/s on relay-attached hosts (bench.py
        --train-cvae [--sync-h2d]).  ``None`` batches (underfull action
        pools) are yielded so the consumer's iteration count stays in step
        with the sync loop's.
        """
        for it in range(num_iters):
            yield it, self.sample_batch(it)

    def step_placed(self, it: int, batch: Tuple) -> jax.Array:
        """One training iteration on a pre-placed (or host) batch; returns
        the DEVICE metrics vector [enc_l1, kl, cnt_l1, dist_l1] WITHOUT
        syncing — callers convert via :meth:`metrics_dict` when logging,
        so dispatches chain on-device between log points."""
        src_cnt_nm, cha_enc_nm, cha_cnt_nm, Dgnd = batch
        self.key, sub = jax.random.split(self.key)
        self.params, self.opt_state, m = self._rollout(
            self.params, self.opt_state,
            jnp.asarray(src_cnt_nm), jnp.asarray(cha_enc_nm),
            jnp.asarray(cha_cnt_nm), jnp.asarray(Dgnd),
            jnp.float32(self.schedule[min(it, len(self.schedule) - 1)]),
            jnp.float32(self.anneal_weight(it)), sub)
        return m

    def metrics_dict(self, it: int, m) -> Dict[str, float]:
        """Host-side metric materialization (the sync point)."""
        enc_l1, kl, cnt_l1, dist_l1 = np.asarray(m)
        return {
            "cvae/encoded_loss": float(enc_l1),
            "cvae/kl_loss": float(kl),
            "cvae/kl_weight": self.anneal_weight(it) * self.tc.kl_w,
            "cvae/cnt_loss": float(cnt_l1),
            "cvae/dist_loss": float(dist_l1),
        }

    def train_iteration(self, it: int) -> Optional[Dict[str, float]]:
        """Synchronous single iteration (assemble + step + metric fetch).
        The production CLI uses batch_stream + prefetch + step_placed
        instead; this form is the simple API and the --sync-h2d bench."""
        batch = self.sample_batch(it)
        if batch is None:
            return None
        m = self.step_placed(it, batch)
        return self.metrics_dict(it, m)

    def norm_artifacts(self) -> Dict[str, np.ndarray]:
        """cvae_norm.npz contents (train_CVAE.py:77-86)."""
        return {"std_weight": self.temp_weight, **self.norms}
