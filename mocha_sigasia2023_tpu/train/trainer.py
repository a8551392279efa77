"""Generator trainer: the full MOCHA objective under SPMD data parallelism.

Semantics target: /root/reference/trainer.py (Trainer:19-247,
compute_gen_loss:103-167).  Per step: six generator forwards —
translate(src->cha), reconstruct(src->src), reconstruct(cha->cha), a
feature-extraction pass for PatchNCE, and two cycle passes — with
FK-in-the-loss reconstruction, InfoNCE context preservation, gradient
clipping at 1.0, AdamW + epoch-step LR decay, and an EMA copy of the
generator (beta 0.999) used at inference.

TPU-native structure: one jitted train_step over a TrainState pytree;
batches shard over the mesh's ``data`` axis and XLA all-reduces gradients
over ICI (replacing nn.DataParallel).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models import generator as gen
from ..models import projector as prj
from ..ops.numerics import safe_clip_by_global_norm
from ..models.generator import GeneratorConfig
from ..models.projector import ProjectorConfig
from ..parallel import make_mesh, replicate, shard_batch
from . import checkpoint as ckpt
from .losses import (contrastive_acc, convert_YtilToX, patch_nce_loss,
                     recon_criterion)


class TrainState(NamedTuple):
    params: Dict[str, Any]     # {'gen': ..., 'prj': ...}
    gen_ema: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float, weight_decay: float, lr_drop_epochs: int,
                   steps_per_epoch: int, grad_clip: float = 1.0,
                   gamma: float = 0.1, clip_gen_only: bool = True):
    """AdamW + global-norm clip + StepLR-style staircase decay
    (trainer.py:37-40, 78, 98).

    ``clip_gen_only`` matches the reference exactly: it clips only the
    generator's gradients (``clip_grad_norm_(self.gen.parameters(), 1.0)``,
    trainer.py:78) — the projector's gradients pass through unclipped."""
    schedule = optax.exponential_decay(
        init_value=lr,
        transition_steps=max(lr_drop_epochs * steps_per_epoch, 1),
        decay_rate=gamma,
        staircase=True,
    )
    # safe variant: bit-identical to optax.clip_by_global_norm for finite
    # gradients; a non-finite global norm ZEROES the step instead of
    # poisoning the params with NaN (ops/numerics.py — the r5 convergence
    # incident's second line of defense)
    clip = safe_clip_by_global_norm(grad_clip)
    if clip_gen_only:
        clip = optax.masked(
            clip,
            lambda p: {"gen": jax.tree.map(lambda _: True, p["gen"]),
                       "prj": jax.tree.map(lambda _: False, p["prj"])})
    return optax.chain(
        clip,
        optax.adamw(schedule, weight_decay=weight_decay),
    )


def _cast_tree(t, dtype):
    return t if dtype is None else jax.tree.map(lambda a: a.astype(dtype), t)


def _make_fwd(gp, gen_cfg, train, compute_dtype, remat=False):
    """Generator forward with optional low-precision compute: params and
    inputs cast to ``compute_dtype`` (e.g. bf16) for the matmuls, outputs
    cast back to f32 so the FK losses keep full precision.  Master params
    and the optimizer stay f32 (gradients flow through the casts).

    ``remat=True`` wraps the forward in jax.checkpoint: the backward
    recomputes activations instead of storing them (~1.3x FLOPs for a
    ~10x activation-memory cut — batch 256 OOMs at 52 GB without it)."""
    gp_c = _cast_tree(gp, compute_dtype)

    def base(a, b, k, extract):
        if compute_dtype is not None:
            a = a.astype(compute_dtype)
            b = b.astype(compute_dtype)
        out = gen.forward(gp_c, gen_cfg, a, b, extract_feature=extract,
                          key=k, train=train)
        if extract:
            return tuple(o.astype(jnp.float32) for o in out)
        return out.astype(jnp.float32)

    if remat:
        plain = jax.checkpoint(lambda a, b, k: base(a, b, k, False))
        ext = jax.checkpoint(lambda a, b, k: base(a, b, k, True))

        def fwd(a, b, k, extract=False):
            return ext(a, b, k) if extract else plain(a, b, k)
    else:
        def fwd(a, b, k, extract=False):
            return base(a, b, k, extract)

    return fwd


def _bar(x, enabled):
    """``tail_barrier``: jax.lax.optimization_barrier between the generator
    forward and the loss tail.  The v5e-terminal XLA NaNs when it fuses the
    forward's backward with the FK-loss backward (see make_split_step_fns);
    the barrier forbids exactly that cross-fusion (its transpose barriers
    the cotangents too), letting the tails run in plain f32 instead of the
    emulated-f64 workaround.  Identity on values and gradients."""
    return jax.lax.optimization_barrier(x) if enabled else x


def compute_gen_loss(params, gen_cfg: GeneratorConfig, prj_cfg: ProjectorConfig,
                     batch_src, batch_cha, norm, parents, weights,
                     rng, train: bool = True, loss_dtype=None,
                     compute_dtype=None, remat=False, tail_barrier=False):
    """The full generator objective (trainer.py:103-167).  Returns
    (total, metrics dict).  ``loss_dtype=float64`` computes the loss tails
    (FK reconstruction, Y->X conversion, NCE) in f64 — the workaround for
    the v5e terminal compiler's f32 fusion miscompile (losses.py NOTE).
    ``compute_dtype=bfloat16`` runs the generator forwards in bf16 with
    f32 master weights and f32/f64 loss tails."""
    X_mean = norm["X_mean"][None, None]
    X_std = norm["X_std"][None, None]
    Y_mean = norm["Y_mean"][None, None]
    Y_std = norm["Y_std"][None, None]

    src_X, cha_X = batch_src["X"], batch_cha["X"]
    src_Y, cha_Y = batch_src["Y"], batch_cha["Y"]

    src_in = (src_X[:, :, 1:] - X_mean[:, :, 1:]) / X_std[:, :, 1:]
    cha_in = (cha_X[:, :, 1:] - X_mean[:, :, 1:]) / X_std[:, :, 1:]

    ks = jax.random.split(rng, 8)
    gp = params["gen"]
    fwd = _make_fwd(gp, gen_cfg, train, compute_dtype, remat=remat)

    trans_Ytil = _bar(fwd(src_in, cha_in, ks[0]), tail_barrier)
    recon_src = _bar(fwd(src_in, src_in, ks[1]), tail_barrier)
    recon_cha = _bar(fwd(cha_in, cha_in, ks[2]), tail_barrier)

    trans_dn = trans_Ytil * Y_std[:, :, 1:] + Y_mean[:, :, 1:]
    trans_X = convert_YtilToX(trans_dn, src_Y[:, :, 0:1], parents,
                              compute_dtype=loss_dtype)
    trans_in = (trans_X[:, :, 1:] - X_mean[:, :, 1:]) / X_std[:, :, 1:]

    recon_src_dn = recon_src * Y_std[:, :, 1:] + Y_mean[:, :, 1:]
    recon_cha_dn = recon_cha * Y_std[:, :, 1:] + Y_mean[:, :, 1:]
    loss_recon = 0.5 * (
        recon_criterion(recon_src_dn, src_Y, parents, compute_dtype=loss_dtype)
        + recon_criterion(recon_cha_dn, cha_Y, parents,
                          compute_dtype=loss_dtype))

    # PatchNCE context preservation (trainer.py:138-142).  With
    # num_patches=-1 ('all' mode) every token is a patch and the loss is
    # permutation-invariant, so the sample order is fixed under jit.
    _, _, src_cnt, trans_cnt = _bar(
        fwd(src_in, trans_in, ks[3], extract=True), tail_barrier)
    feat_k, patch_id = prj.apply_projector(params["prj"], prj_cfg, trans_cnt)
    feat_q, _ = prj.apply_projector(params["prj"], prj_cfg, src_cnt, patch_id)
    loss_nce, logits = patch_nce_loss(feat_q, feat_k,
                                      compute_dtype=loss_dtype)
    top1, top5 = contrastive_acc(logits)

    cyc_src = _bar(fwd(trans_in, src_in, ks[4]), tail_barrier)
    cyc_cha = _bar(fwd(cha_in, trans_in, ks[5]), tail_barrier)
    cyc_src_dn = cyc_src * Y_std[:, :, 1:] + Y_mean[:, :, 1:]
    cyc_cha_dn = cyc_cha * Y_std[:, :, 1:] + Y_mean[:, :, 1:]
    loss_cyc = 0.5 * (
        recon_criterion(cyc_src_dn, src_Y, parents, compute_dtype=loss_dtype)
        + recon_criterion(cyc_cha_dn, cha_Y, parents,
                          compute_dtype=loss_dtype))

    total = (weights["rec_w"] * loss_recon
             + weights["nce_w"] * loss_nce
             + weights["cyc_w"] * loss_cyc)
    metrics = {
        "gen/loss_total": total,
        "gen/loss_recon": loss_recon,
        "gen/loss_nce_cnt": loss_nce,
        "gen/cnt_acc_top1": top1,
        "gen/cnt_acc_top5": top5,
        "gen/loss_cyc": loss_cyc,
    }
    return total, metrics


def make_split_step_fns(gen_cfg, prj_cfg, parents, weights, loss_dtype, tx,
                        ema_beta, train: bool = True, compute_dtype=None,
                        remat=False, tail_barrier=False):
    """The training objective as SEPARATELY-JITTED small programs with
    explicit cotangent passing (mathematically identical gradients to the
    monolithic step).

    Why: the v5e terminal's XLA silently miscompiles (NaNs) once one
    compiled program fuses >= 2 generator forwards with the FK
    reconstruction backward — every component below was verified finite on
    the chip in isolation, the monolith not (see losses.py NOTE).  Each
    entry here is its own jit, so each compiles within the empirically-safe
    size class:

      recon_one   one self-reconstruction forward + FK loss grad
      trans_fwd   forward-only translate pass -> trans_in
      nce_grad    NCE value/grad wrt (params, trans_in)
      cyc_grad    one cycle forward + FK loss, grad wrt (params, inputs)
      trans_vjp   pull the summed trans_in cotangent back to params
      apply       combine grads + optimizer + EMA (donated state)

    Per step: 7 device programs chained on the host; arrays never leave the
    device.
    """
    import mocha_sigasia2023_tpu.models.projector as prj_mod

    def norm_x(X, norm):
        return (X[:, :, 1:] - norm["X_mean"][None, None, 1:]) \
            / norm["X_std"][None, None, 1:]

    def denorm_y(o, norm):
        return o * norm["Y_std"][None, None, 1:] + norm["Y_mean"][None, None, 1:]

    def trans_path(params, src_in, cha_in, src_root, norm, k):
        fwd = _make_fwd(params["gen"], gen_cfg, train, compute_dtype,
                        remat=remat)
        o = _bar(fwd(src_in, cha_in, k), tail_barrier)
        tx_ = convert_YtilToX(denorm_y(o, norm), src_root, parents,
                              compute_dtype=loss_dtype)
        return norm_x(tx_, norm)

    @jax.jit
    def trans_fwd(params, src_in, cha_in, src_root, norm, k):
        return trans_path(params, src_in, cha_in, src_root, norm, k)

    def _recon_one(params, a_in, gt_Y, norm, k):
        fwd = _make_fwd(params["gen"], gen_cfg, train, compute_dtype,
                        remat=remat)
        o = _bar(fwd(a_in, a_in, k), tail_barrier)
        return recon_criterion(denorm_y(o, norm), gt_Y, parents,
                               compute_dtype=loss_dtype)

    recon_one = jax.jit(jax.value_and_grad(_recon_one))

    def _nce(params, trans_in, src_in, norm, k):
        fwd = _make_fwd(params["gen"], gen_cfg, train, compute_dtype,
                        remat=remat)
        _, _, src_cnt, trans_cnt = _bar(
            fwd(src_in, trans_in, k, extract=True), tail_barrier)
        feat_k, pid = prj_mod.apply_projector(params["prj"], prj_cfg, trans_cnt)
        feat_q, _ = prj_mod.apply_projector(params["prj"], prj_cfg, src_cnt, pid)
        loss, logits = patch_nce_loss(feat_q, feat_k, compute_dtype=loss_dtype)
        return loss, logits

    nce_grad = jax.jit(
        jax.value_and_grad(_nce, argnums=(0, 1), has_aux=True))

    def _cyc(params, a_in, b_in, gt_Y, norm, k):
        fwd = _make_fwd(params["gen"], gen_cfg, train, compute_dtype,
                        remat=remat)
        o = _bar(fwd(a_in, b_in, k), tail_barrier)
        return recon_criterion(denorm_y(o, norm), gt_Y, parents,
                               compute_dtype=loss_dtype)

    cyc_grad_a = jax.jit(jax.value_and_grad(_cyc, argnums=(0, 1)))
    cyc_grad_b = jax.jit(jax.value_and_grad(_cyc, argnums=(0, 2)))

    @jax.jit
    def trans_vjp(params, src_in, cha_in, src_root, norm, k, cotangent):
        _, pull = jax.vjp(
            lambda p: trans_path(p, src_in, cha_in, src_root, norm, k),
            params)
        (g,) = pull(cotangent)
        return g

    @functools.partial(jax.jit, donate_argnums=(0,))
    def apply_update(state, g_rs, g_rc, g_nce_p, g_cs_p, g_cc_p, g_trans,
                     losses, logits):
        l_rs, l_rc, l_nce, l_cs, l_cc = losses
        grads = jax.tree.map(
            lambda a, b, c, d, e, f: (
                weights["rec_w"] * 0.5 * (a + b)
                + weights["nce_w"] * c
                + weights["cyc_w"] * 0.5 * (d + e) + f),
            g_rs, g_rc, g_nce_p, g_cs_p, g_cc_p, g_trans)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gen_ema = optax.incremental_update(
            params["gen"], state.gen_ema, 1.0 - ema_beta)
        l_recon = 0.5 * (l_rs + l_rc)
        l_cyc = 0.5 * (l_cs + l_cc)
        total = (weights["rec_w"] * l_recon + weights["nce_w"] * l_nce
                 + weights["cyc_w"] * l_cyc)
        top1, top5 = contrastive_acc(logits)
        metrics = {
            "gen/loss_total": total,
            "gen/loss_recon": l_recon,
            "gen/loss_nce_cnt": l_nce,
            "gen/cnt_acc_top1": top1,
            "gen/cnt_acc_top5": top5,
            "gen/loss_cyc": l_cyc,
        }
        new_state = TrainState(params, gen_ema, opt_state, state.step + 1)
        return new_state, metrics

    def _pieces(params, batch_src, batch_cha, norm, rng):
        # same split(rng, 8) + key->forward assignment as compute_gen_loss
        # so split-step and monolithic draw identical dropout masks — the
        # two modes are then gradient-equivalent (tested in test_train.py)
        ks = jax.random.split(rng, 8)
        src_in = (batch_src["X"][:, :, 1:] - norm["X_mean"][None, None, 1:]) \
            / norm["X_std"][None, None, 1:]
        cha_in = (batch_cha["X"][:, :, 1:] - norm["X_mean"][None, None, 1:]) \
            / norm["X_std"][None, None, 1:]
        src_Y, cha_Y = batch_src["Y"], batch_cha["Y"]
        src_root = src_Y[:, :, 0:1]

        l_rs, g_rs = recon_one(params, src_in, src_Y, norm, ks[1])
        l_rc, g_rc = recon_one(params, cha_in, cha_Y, norm, ks[2])
        trans_in = trans_fwd(params, src_in, cha_in, src_root, norm, ks[0])
        (l_nce, logits), (g_nce_p, g_nce_t) = nce_grad(
            params, trans_in, src_in, norm, ks[3])
        l_cs, (g_cs_p, g_cs_t) = cyc_grad_a(
            params, trans_in, src_in, src_Y, norm, ks[4])
        l_cc, (g_cc_p, g_cc_t) = cyc_grad_b(
            params, cha_in, trans_in, cha_Y, norm, ks[5])
        cotangent = (weights["nce_w"] * g_nce_t
                     + weights["cyc_w"] * 0.5 * (g_cs_t + g_cc_t))
        g_trans = trans_vjp(params, src_in, cha_in, src_root, norm, ks[0],
                            cotangent)
        return ((g_rs, g_rc, g_nce_p, g_cs_p, g_cc_p, g_trans),
                (l_rs, l_rc, l_nce, l_cs, l_cc), logits)

    def step(state, batch_src, batch_cha, norm, rng):
        grads6, losses, logits = _pieces(
            state.params, batch_src, batch_cha, norm, rng)
        return apply_update(state, *grads6, losses, logits)

    def compute_grads(params, batch_src, batch_cha, norm, rng):
        """Combined loss gradient — exposed for the split==mono
        equivalence test (compares against jax.grad of compute_gen_loss)."""
        (g_rs, g_rc, g_nce_p, g_cs_p, g_cc_p, g_trans), losses, _ = _pieces(
            params, batch_src, batch_cha, norm, rng)
        grads = jax.tree.map(
            lambda a, b, c, d, e, f: (
                weights["rec_w"] * 0.5 * (a + b)
                + weights["nce_w"] * c
                + weights["cyc_w"] * 0.5 * (d + e) + f),
            g_rs, g_rc, g_nce_p, g_cs_p, g_cc_p, g_trans)
        return grads, losses

    step.compute_grads = compute_grads
    return step


class GeneratorTrainer:
    """Owns params/EMA/optimizer and the jitted SPMD train step
    (role of trainer.Trainer, trainer.py:19-101)."""

    def __init__(self, config: Dict, steps_per_epoch: int,
                 mesh=None, seed: int = 1777):
        self.config = config
        # loss-tail compute dtype; 'float64' is the TPU-terminal workaround
        ld = config.get("loss_dtype")
        self.loss_dtype = jnp.dtype(ld) if ld else None
        if self.loss_dtype == jnp.float64:
            jax.config.update("jax_enable_x64", True)
        # split-step mode: per-component grad programs with explicit
        # cotangent routing (see make_split_step_fns) — the heavy fallback
        # for compilers where tail_barrier is insufficient; the shipped
        # config runs the barriered monolithic step (2.9x faster)
        self.split_step = bool(config.get("split_step", True))
        # dropout=False runs all forwards in eval mode (deterministic
        # training / parity testing against the torch reference, whose
        # hardcoded p=0.1 masks cannot be matched across frameworks)
        self.train_forwards = bool(config.get("dropout", True))
        # compute_dtype=bfloat16: forwards in bf16, f32 master weights +
        # f32/f64 loss tails (bench.py --train --bf16 experiment)
        cd = config.get("compute_dtype")
        self.compute_dtype = jnp.dtype(cd) if cd else None
        # remat=True: recompute forward activations in the backward
        # (jax.checkpoint) — trades ~1.3x FLOPs for ~10x activation memory;
        # required for batch >= 256 on a 16 GB chip (52 GB without)
        self.remat = bool(config.get("remat", False))
        # tail_barrier=True: optimization_barrier between forward and loss
        # tail — blocks the fusion the v5e-terminal XLA miscompiles, so the
        # tails can run f32 (loss_dtype: null) at full speed; see _bar
        self.tail_barrier = bool(config.get("tail_barrier", False))
        self.gen_cfg = GeneratorConfig.from_dict(config["model"])
        self.prj_cfg = ProjectorConfig(
            mode="all",
            num_patches=config["model"].get("num_patches", -1),
            encoder_dim=self.gen_cfg.encoder_dim,
            prj_dim=config["model"].get("prj_dim", 1024),
            nframes=self.gen_cfg.nframes,
            temporal_patch_size=self.gen_cfg.temporal_patch_size)
        parents = np.asarray(config["dataset"]["mocha"]["parents"])
        self.parents = np.concatenate([[-1], parents + 1])
        self.weights = {k: float(config[k]) for k in ("rec_w", "nce_w", "cyc_w")}
        self.ema_beta = float(config.get("ema_beta", 0.999))
        self.mesh = mesh if mesh is not None else make_mesh()

        key = jax.random.PRNGKey(seed)
        k_gen, k_prj = jax.random.split(key)
        gen_params = gen.init_generator(k_gen, self.gen_cfg)
        prj_params = prj.init_projector(k_prj, self.prj_cfg)

        self.tx = make_optimizer(
            lr=float(config["lr_gen"]),
            weight_decay=float(config["weight_decay_gen"]),
            lr_drop_epochs=int(config["lr_drop"]),
            steps_per_epoch=steps_per_epoch,
            grad_clip=float(config.get("grad_clip", 1.0)))

        params = {"gen": gen_params, "prj": prj_params}
        state = TrainState(
            params=params,
            gen_ema=jax.tree.map(jnp.copy, gen_params),
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32))
        self.state = replicate(self.mesh, state)
        if self.split_step:
            self._train_step = make_split_step_fns(
                self.gen_cfg, self.prj_cfg, self.parents, self.weights,
                self.loss_dtype, self.tx, self.ema_beta,
                train=self.train_forwards,
                compute_dtype=self.compute_dtype, remat=self.remat,
                tail_barrier=self.tail_barrier)
        else:
            self._train_step = jax.jit(self._step_impl, donate_argnums=(0,))

    def _step_impl(self, state: TrainState, batch_src, batch_cha, norm, rng):
        def loss_fn(params):
            return compute_gen_loss(
                params, self.gen_cfg, self.prj_cfg, batch_src, batch_cha,
                norm, self.parents, self.weights, rng,
                train=self.train_forwards, loss_dtype=self.loss_dtype,
                compute_dtype=self.compute_dtype, remat=self.remat,
                tail_barrier=self.tail_barrier)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gen_ema = optax.incremental_update(
            params["gen"], state.gen_ema, 1.0 - self.ema_beta)
        return TrainState(params, gen_ema, opt_state, state.step + 1), metrics

    def train_step(self, batch_src: Dict, batch_cha: Dict, norm: Dict,
                   rng) -> Dict[str, float]:
        batch_src = shard_batch(self.mesh, batch_src)
        batch_cha = shard_batch(self.mesh, batch_cha)
        self.state, metrics = self._train_step(
            self.state, batch_src, batch_cha, norm, rng)
        return metrics

    # -- checkpointing (trainer.py:210-247) --------------------------------

    def save(self, model_dir: str, epoch: int) -> str:
        path = ckpt.checkpoint_path(model_dir, epoch)
        state = jax.tree.map(np.asarray, self.state)
        ckpt.save_checkpoint(path, {
            "gen": state.params["gen"],
            "prj": state.params["prj"],
            "gen_ema": state.gen_ema,
            "opt_state": state.opt_state,
        })
        return path

    def load(self, path: str, resume: bool = False) -> int:
        state = jax.tree.map(np.asarray, self.state)
        saved = ckpt.load_checkpoint(path)
        # msgpack loses list structure; restore against the live templates
        params = {
            "gen": ckpt.restore_like(state.params["gen"], saved["gen"]),
            "prj": ckpt.restore_like(state.params["prj"], saved["prj"]),
        }
        gen_ema = ckpt.restore_like(state.gen_ema, saved["gen_ema"])
        opt_state = state.opt_state
        if resume and "opt_state" in saved:
            opt_state = ckpt.restore_like(state.opt_state, saved["opt_state"])
        new_state = TrainState(
            params=params, gen_ema=gen_ema, opt_state=opt_state,
            step=state.step)
        self.state = replicate(self.mesh, jax.tree.map(jnp.asarray, new_state))
        return ckpt.epoch_from_path(path)

    @property
    def gen_ema_params(self):
        return self.state.gen_ema
