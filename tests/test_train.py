"""Training-stack tests: loss parity with the reference, trainer smoke runs
on the virtual 8-device CPU mesh, checkpoint roundtrips."""

import os
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import add_reference_paths, reference_available
from helpers import MOCHA_PARENTS

from mocha_sigasia2023_tpu.train import losses as jlosses
from mocha_sigasia2023_tpu.train.trainer import GeneratorTrainer
from mocha_sigasia2023_tpu.train.trainer_cvae import (
    CVAETrainer, CVAETrainerConfig, temp_weight_matrix,
)
from mocha_sigasia2023_tpu.train import checkpoint as jckpt
from mocha_sigasia2023_tpu.parallel import make_mesh
from mocha_sigasia2023_tpu.data.dataset import MotionDataset, iterate_batches

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo unavailable", allow_module_level=True)

add_reference_paths()
import trainer as ref_trainer  # noqa: E402

MOCHA_PARENTS_25 = np.concatenate([[-1], MOCHA_PARENTS + 1])
torch.manual_seed(0)


class TestLossParity:
    def test_recon_criterion(self):
        B, T, J = 2, 8, 25
        gt = torch.randn(B, T, J, 15)
        pred = torch.randn(B, T, J - 1, 15)
        ref = ref_trainer.recon_criterion(pred, gt, MOCHA_PARENTS_25).item()
        ours = jlosses.recon_criterion(
            jnp.asarray(pred.numpy()), jnp.asarray(gt.numpy()),
            MOCHA_PARENTS_25)
        np.testing.assert_allclose(float(ours), ref, rtol=1e-4)

    def test_convert_YtilToX(self):
        B, T, J = 2, 6, 25
        pred = torch.randn(B, T, J - 1, 15)
        root = torch.randn(B, T, 1, 15)
        ref = ref_trainer.convert_YtilToX(pred, root, MOCHA_PARENTS_25).numpy()
        ours = jlosses.convert_YtilToX(
            jnp.asarray(pred.numpy()), jnp.asarray(root.numpy()),
            MOCHA_PARENTS_25)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)

    def test_patch_nce_loss(self):
        n, d = 64, 32
        q = torch.randn(n, d)
        k = torch.randn(n, d)
        fake = types.SimpleNamespace(
            config={"nce_includes_all_negatives_from_minibatch": True})
        ref_loss, ref_logits, _ = ref_trainer.Trainer.patch_nce_loss(
            fake, q.clone(), k.clone())
        ours, logits = jlosses.patch_nce_loss(
            jnp.asarray(q.numpy()), jnp.asarray(k.numpy()))
        np.testing.assert_allclose(float(ours), ref_loss.item(), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                                   atol=1e-4)

    def test_contrastive_acc(self):
        logits = jnp.asarray(np.random.RandomState(0).randn(40, 10))
        top1, top5 = jlosses.contrastive_acc(logits)
        ref1 = np.mean(np.argmax(np.asarray(logits), axis=1) == 0) * 100
        np.testing.assert_allclose(float(top1), ref1, atol=1e-5)

    def test_kl_normal_closed_form(self):
        rng = np.random.RandomState(3)
        mu_po, mu_pr = rng.randn(4, 8), rng.randn(4, 8)
        lv_po, lv_pr = rng.randn(4, 8) * 0.3, rng.randn(4, 8) * 0.3
        expected = 0.5 * np.sum(
            lv_pr - lv_po + (np.exp(lv_po) + (mu_po - mu_pr) ** 2)
            / np.exp(lv_pr) - 1.0, axis=-1).clip(min=0)
        ours = jlosses.kl_normal(*(jnp.asarray(a) for a in
                                   (mu_po, lv_po, mu_pr, lv_pr)))
        np.testing.assert_allclose(np.asarray(ours), expected, rtol=1e-5)

    def test_temp_weight_matches_reference_construction(self):
        from einops import rearrange as re_

        w = np.linspace(1.0, 3.0, num=15)
        w = np.repeat(w[:, None], 6 * 256, axis=1)
        ref = re_(w, "t (v c) -> (t v) c", v=6)
        np.testing.assert_allclose(temp_weight_matrix(), ref, rtol=1e-6)


SMALL_CONFIG = {
    "name": "test_model",
    "dataset": {"mocha": {"parents": MOCHA_PARENTS.tolist()}},
    "model": {
        "mot_in_dim": 15, "nframes": 60, "njoints": 24, "nbody": 6,
        "temporal_patch_size": 4,
        "encoder_dim": 64, "encoder_depth": 1, "encoder_heads": 2,
        "encoder_dim_head": 32, "encoder_mlp_dim": 128,
        "decoder_dim": 64, "decoder_depth": 1, "decoder_heads": 2,
        "decoder_dim_head": 32, "decoder_mlp_dim": 128,
        "prj_dim": 64, "num_patches": -1,
        "graph": {
            "joint": {"layout": "mocha", "strategy": "distance", "max_hop": 2},
            "bodypart": {"layout": "mocha", "strategy": "distance", "max_hop": 1},
        },
    },
    "lr_gen": 1e-4, "weight_decay_gen": 1e-4, "lr_drop": 100,
    "rec_w": 1, "nce_w": 0.1, "cyc_w": 1, "ema_beta": 0.999,
}


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    from test_dataset import build_synthetic_database

    d = tmp_path_factory.mktemp("train_ds")
    build_synthetic_database(str(d / "database.bin"), n_clips=2, T=140)
    return MotionDataset(str(d), "train")


class TestGeneratorTrainer:
    def test_train_steps_on_mesh(self, tiny_dataset):
        mesh = make_mesh()  # 8 virtual CPU devices
        assert mesh.devices.size == 8
        trainer = GeneratorTrainer(SMALL_CONFIG, steps_per_epoch=2, mesh=mesh)
        norm = tiny_dataset.norm
        key = jax.random.PRNGKey(0)

        losses = []
        it = iterate_batches(tiny_dataset, 8, shuffle=True, seed=0)
        batches = list(it)
        ema_before = np.asarray(
            jax.tree.leaves(trainer.state.gen_ema)[0]).copy()
        for i in range(3):
            key, sub = jax.random.split(key)
            b = batches[i % len(batches)]
            m = trainer.train_step(b, batches[(i + 1) % len(batches)],
                                   norm, sub)
            losses.append(float(m["gen/loss_total"]))
        assert all(np.isfinite(losses))
        assert int(trainer.state.step) == 3
        ema_after = np.asarray(jax.tree.leaves(trainer.state.gen_ema)[0])
        assert not np.allclose(ema_before, ema_after)

    def test_split_step_equals_monolithic(self, tiny_dataset):
        """The split-step trainer (7 chained programs with explicit
        cotangent routing, the v5e-terminal miscompile workaround) must
        produce the SAME gradients and metrics as the monolithic
        jax.value_and_grad of compute_gen_loss.  Both draw identical
        dropout masks (same split(rng, 8) key assignment), so equality is
        exact up to fp reassociation.

        Gradients — not Adam updates — are compared: Adam normalizes by
        sqrt(v)+eps, which amplifies fp-reassociation noise on near-zero-
        gradient elements into sign flips (observed 5/8192 elements), so
        update comparison cannot distinguish noise from a real bug.
        """
        from mocha_sigasia2023_tpu.train.trainer import (
            compute_gen_loss, make_split_step_fns)

        norm = {k: jnp.asarray(v) for k, v in tiny_dataset.norm.items()}
        batches = list(iterate_batches(tiny_dataset, 8, shuffle=True, seed=0))
        bs = {k: jnp.asarray(v) for k, v in batches[0].items()}
        bc = {k: jnp.asarray(v) for k, v in batches[1].items()}
        rng = jax.random.PRNGKey(42)

        t = GeneratorTrainer(dict(SMALL_CONFIG, split_step=True),
                             steps_per_epoch=2)
        assert t.split_step and hasattr(t._train_step, "compute_grads")
        params = jax.tree.map(jnp.asarray,
                              jax.tree.map(np.asarray, t.state.params))

        g_split, losses = t._train_step.compute_grads(
            params, bs, bc, norm, rng)

        def loss_fn(p):
            total, metrics = compute_gen_loss(
                p, t.gen_cfg, t.prj_cfg, bs, bc, norm, t.parents,
                t.weights, rng, train=True, loss_dtype=t.loss_dtype)
            return total, metrics

        (total_mono, m_mono), g_mono = jax.value_and_grad(
            loss_fn, has_aux=True)(params)

        l_rs, l_rc, l_nce, l_cs, l_cc = [float(x) for x in losses]
        np.testing.assert_allclose(
            0.5 * (l_rs + l_rc), float(m_mono["gen/loss_recon"]), rtol=1e-5)
        np.testing.assert_allclose(
            l_nce, float(m_mono["gen/loss_nce_cnt"]), rtol=1e-5)
        np.testing.assert_allclose(
            0.5 * (l_cs + l_cc), float(m_mono["gen/loss_cyc"]), rtol=1e-5)

        flat_s = jax.tree.leaves(jax.tree.map(np.asarray, g_split))
        flat_m = jax.tree.leaves(jax.tree.map(np.asarray, g_mono))
        assert len(flat_s) == len(flat_m)
        # Absolute floor 1e-5*gscale: XLA fuses/reassociates the split and
        # monolithic programs differently, so near-zero elements carry up to
        # a few e-5 of the max-gradient scale in pure fp noise (observed
        # 7/12288 elements at 1.8e-6*gscale).  A real cotangent-routing bug
        # mis-weights whole terms, i.e. errors at ~gscale — 4 orders above
        # this floor.
        gscale = max(float(np.abs(g).max()) for g in flat_m)
        for a, b in zip(flat_s, flat_m):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5 * gscale)
        # Complementary sensitivity check: the loose atol above tolerates a
        # few noisy elements, but BROAD low-level drift (a systematic small
        # cotangent error touching many elements) must still fail — require
        # <0.1% of all elements outside the original tight 1e-6*gscale floor.
        n_total = sum(a.size for a in flat_s)
        n_bad = sum(
            int(np.sum(np.abs(a - b) > 1e-6 * gscale + 1e-4 * np.abs(b)))
            for a, b in zip(flat_s, flat_m))
        assert n_bad < max(1, n_total // 1000), (
            f"{n_bad}/{n_total} gradient elements exceed the 1e-6*gscale "
            "floor — broad systematic drift, not isolated fp noise")

    def test_remat_step_equals_plain(self, tiny_dataset):
        """``remat: true`` (jax.checkpoint around the generator forwards —
        the activation-memory lever for batch >= 256, bench.py --train
        --remat) is semantically the identity transform: gradients must
        match the plain split-step to fp-reassociation noise."""
        norm = {k: jnp.asarray(v) for k, v in tiny_dataset.norm.items()}
        batches = list(iterate_batches(tiny_dataset, 8, shuffle=True, seed=0))
        bs = {k: jnp.asarray(v) for k, v in batches[0].items()}
        bc = {k: jnp.asarray(v) for k, v in batches[1].items()}
        rng = jax.random.PRNGKey(7)

        t0 = GeneratorTrainer(dict(SMALL_CONFIG, split_step=True),
                              steps_per_epoch=2)
        t1 = GeneratorTrainer(dict(SMALL_CONFIG, split_step=True,
                                   remat=True), steps_per_epoch=2)
        assert t1.remat and not t0.remat
        params = jax.tree.map(jnp.asarray,
                              jax.tree.map(np.asarray, t0.state.params))

        g0, l0 = t0._train_step.compute_grads(params, bs, bc, norm, rng)
        g1, l1 = t1._train_step.compute_grads(params, bs, bc, norm, rng)

        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-5)
        flat0 = jax.tree.leaves(jax.tree.map(np.asarray, g0))
        flat1 = jax.tree.leaves(jax.tree.map(np.asarray, g1))
        gscale = max(float(np.abs(g).max()) for g in flat0)
        for a, b in zip(flat0, flat1):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5 * gscale)

    def test_tail_barrier_step_equals_plain(self, tiny_dataset):
        """``tail_barrier: true`` (jax.lax.optimization_barrier between the
        generator forwards and the loss tails — the fusion fence that lets
        the tails run f32 on the miscompiling v5e terminal, bench.py
        --train --tail-barrier) is the identity on values and gradients:
        it must match the plain split-step to fp-reassociation noise."""
        norm = {k: jnp.asarray(v) for k, v in tiny_dataset.norm.items()}
        batches = list(iterate_batches(tiny_dataset, 8, shuffle=True, seed=0))
        bs = {k: jnp.asarray(v) for k, v in batches[0].items()}
        bc = {k: jnp.asarray(v) for k, v in batches[1].items()}
        rng = jax.random.PRNGKey(7)

        t0 = GeneratorTrainer(dict(SMALL_CONFIG, split_step=True),
                              steps_per_epoch=2)
        t1 = GeneratorTrainer(dict(SMALL_CONFIG, split_step=True,
                                   tail_barrier=True), steps_per_epoch=2)
        assert t1.tail_barrier and not t0.tail_barrier
        params = jax.tree.map(jnp.asarray,
                              jax.tree.map(np.asarray, t0.state.params))

        g0, l0 = t0._train_step.compute_grads(params, bs, bc, norm, rng)
        g1, l1 = t1._train_step.compute_grads(params, bs, bc, norm, rng)

        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-5)
        flat0 = jax.tree.leaves(jax.tree.map(np.asarray, g0))
        flat1 = jax.tree.leaves(jax.tree.map(np.asarray, g1))
        gscale = max(float(np.abs(g).max()) for g in flat0)
        for a, b in zip(flat0, flat1):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5 * gscale)

    def test_trajectory_matches_torch_reference(self, tiny_dataset, tmp_path):
        """Composed training dynamics vs the reference: build the torch
        Trainer (trainer.py:19-101) and GeneratorTrainer from the SAME
        weights, run 3 full steps (AdamW + gen-only clip + EMA) on the SAME
        batches with dropout disabled, and require the per-step loss
        trajectories AND the post-run EMA weights to agree.

        This is the one reference behavior the per-component parity tests
        (loss values, split==mono gradients) cannot cover piecewise: the
        optimizer/EMA state evolution across steps."""
        from mocha_sigasia2023_tpu.models import convert
        from mocha_sigasia2023_tpu.parallel import replicate
        from mocha_sigasia2023_tpu.train.trainer import TrainState

        cfg = dict(SMALL_CONFIG, model_dir=str(tmp_path),
                   nce_includes_all_negatives_from_minibatch=True,
                   split_step=True, dropout=False)
        torch.manual_seed(123)
        ref = ref_trainer.Trainer(cfg)
        # dropout off on both sides — masks cannot match across frameworks
        # (Trainer overrides .train() for the epoch loop; eval submodules)
        ref.gen.eval(), ref.gen_ema.eval(), ref.prj_cnt.eval()

        ours = GeneratorTrainer(cfg, steps_per_epoch=100)
        params = {
            "gen": convert.generator_from_torch(
                ref.gen.state_dict(), encoder_depth=1, decoder_depth=1),
            "prj": convert.projector_from_torch(ref.prj_cnt.state_dict()),
        }
        params = jax.tree.map(jnp.asarray, params)
        ours.state = replicate(ours.mesh, TrainState(
            params=params,
            gen_ema=jax.tree.map(jnp.copy, params["gen"]),
            opt_state=ours.tx.init(params),
            step=jnp.zeros((), jnp.int32)))

        norm = tiny_dataset.norm
        norm_t = {k: torch.as_tensor(v)[None, None] for k, v in norm.items()}
        # batch 8 = one row per device on the 8-device test mesh; the two
        # available batches cycle (both sides see the same sequence)
        batches = list(iterate_batches(tiny_dataset, 8, shuffle=True, seed=3))
        assert len(batches) >= 2

        key = jax.random.PRNGKey(0)
        for step in range(3):
            bs, bc = batches[step % 2], batches[(step + 1) % 2]
            bs_t = {k: torch.as_tensor(v) for k, v in bs.items()}
            bc_t = {k: torch.as_tensor(v) for k, v in bc.items()}

            # reference update (run_epoch body, trainer.py:74-80)
            total, ldict = ref.compute_gen_loss(bs_t, bc_t, dict(norm_t))
            ref.gen_opt.zero_grad()
            total.backward()
            torch.nn.utils.clip_grad_norm_(ref.gen.parameters(), 1.0)
            ref.gen_opt.step()
            ref_trainer.update_average(ref.gen_ema, ref.gen)

            key, sub = jax.random.split(key)
            m = ours.train_step(bs, bc, norm, sub)

            for name, rtol in (("gen/loss_total", 2e-3),
                               ("gen/loss_recon", 2e-3),
                               # NCE amplifies framework fp divergence: the
                               # cnt feature carries ~5e-3 abs noise through
                               # the instance norm (test_features tolerance)
                               # and the /0.07 temperature scales it into
                               # the logits — observed 0.7% rel at step 0
                               ("gen/loss_nce_cnt", 2e-2),
                               ("gen/loss_cyc", 2e-3)):
                np.testing.assert_allclose(
                    float(m[name]), float(ldict[name]), rtol=rtol,
                    err_msg=f"step {step}: {name}")

        # post-run EMA weights must agree (verifies AdamW + clip + EMA
        # state evolution, not just loss values)
        ema_ref = convert.generator_from_torch(
            ref.gen_ema.state_dict(), encoder_depth=1, decoder_depth=1)
        ours_ema = jax.tree.map(np.asarray, ours.state.gen_ema)
        for a, b in zip(jax.tree.leaves(ours_ema), jax.tree.leaves(ema_ref)):
            scale = max(float(np.abs(b).max()), 1e-3)
            np.testing.assert_allclose(a, b, atol=5e-5 * scale, rtol=2e-4)

    def test_checkpoint_roundtrip(self, tiny_dataset, tmp_path):
        trainer = GeneratorTrainer(SMALL_CONFIG, steps_per_epoch=2)
        path = trainer.save(str(tmp_path), epoch=25)
        assert jckpt.epoch_from_path(path) == 25

        trainer2 = GeneratorTrainer(SMALL_CONFIG, steps_per_epoch=2, seed=99)
        epoch = trainer2.load(path, resume=True)
        assert epoch == 25
        a = jax.tree.leaves(trainer.state.params["gen"])[0]
        b = jax.tree.leaves(trainer2.state.params["gen"])[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert jckpt.latest_checkpoint(str(tmp_path)) == path

        # loaded params must be APPLYABLE (msgpack turns layer lists into
        # dicts; restore must rebuild the original structure)
        import jax.numpy as jnp
        from mocha_sigasia2023_tpu.models import generator as gen_mod
        from mocha_sigasia2023_tpu.models.generator import GeneratorConfig

        cfg = GeneratorConfig.from_dict(SMALL_CONFIG["model"])
        x = jnp.zeros((1, 60, 24, 15))
        out = gen_mod.forward(trainer2.state.params["gen"], cfg, x, x)
        assert out.shape == (1, 60, 24, 15)
        structs_equal = jax.tree.structure(
            jax.tree.map(np.asarray, trainer.state.params)
        ) == jax.tree.structure(jax.tree.map(np.asarray, trainer2.state.params))
        assert structs_equal


class TestCVAETrainer:
    def test_rollout_iterations(self):
        rng = np.random.RandomState(0)
        N, S, T, D = 60, 90, 10, 32
        n_src, n_cha = 80, 70
        tc = CVAETrainerConfig(
            latent_dim=D, depth=1, nheads=2, feedforward_dim=64, nseq=S,
            rollout_steps=5, batch_size=4, teacher_iters=2, ramping_iters=2,
            student_iters=2, kl_anneal_end=4)
        src_cnt = rng.randn(n_src, S, D).astype(np.float32)
        cha_cnt = rng.randn(n_cha, S, D).astype(np.float32)
        cha_enc = rng.randn(n_cha, S, D).astype(np.float32)
        trainer = CVAETrainer(
            tc,
            src_cnt=src_cnt, src_action=np.zeros(n_src, np.int32),
            src_range_starts=np.array([0]), src_range_stops=np.array([n_src]),
            cha_cnt=cha_cnt, cha_encoded=cha_enc,
            cha_action=np.zeros(n_cha, np.int32),
            cha_range_starts=np.array([0]), cha_range_stops=np.array([n_cha]),
            cnt_mean=cha_cnt.mean(0), cnt_std=cha_cnt.std(0) + 1e-6,
            target_actions=[0])
        m1 = trainer.train_iteration(0)
        m2 = trainer.train_iteration(1)
        assert m1 is not None and m2 is not None
        assert np.isfinite(m1["cvae/encoded_loss"])
        assert np.isfinite(m2["cvae/kl_loss"])
        arts = trainer.norm_artifacts()
        assert arts["std_weight"].shape == (S, D)

    def test_prefetched_loop_matches_sync_loop(self):
        """The production CLI loop (batch_stream -> prefetch_batches with
        device placement -> step_placed, metrics fetched in one batched
        stack) must produce bit-identical params and metrics to the naive
        per-iteration train_iteration loop from the same seed — the fast
        path is a scheduling change, not a numeric one."""
        import jax.numpy as jnp

        from mocha_sigasia2023_tpu.data.dataset import prefetch_batches

        rng = np.random.RandomState(11)
        S, D, n = 12, 32, 60
        kw = dict(
            src_cnt=rng.randn(n, S, D).astype(np.float32),
            src_action=np.zeros(n, np.int32),
            src_range_starts=np.array([0]), src_range_stops=np.array([n]),
            cha_cnt=rng.randn(n, S, D).astype(np.float32),
            cha_encoded=rng.randn(n, S, D).astype(np.float32),
            cha_action=np.zeros(n, np.int32),
            cha_range_starts=np.array([0]), cha_range_stops=np.array([n]),
            cnt_mean=rng.randn(S, D).astype(np.float32),
            cnt_std=(rng.rand(S, D) + 0.5).astype(np.float32),
            target_actions=[0])
        tc = CVAETrainerConfig(
            latent_dim=D, depth=1, nheads=2, feedforward_dim=64, nseq=S,
            rollout_steps=4, batch_size=4, teacher_iters=2,
            ramping_iters=2, student_iters=2, kl_anneal_end=4)
        n_iters = 6

        sync = CVAETrainer(tc, **kw)
        sync_metrics = [sync.train_iteration(i) for i in range(n_iters)]

        pre = CVAETrainer(tc, **kw)

        def place(item):
            it, b = item
            if b is None:
                return it, None
            return it, tuple(jax.device_put(jnp.asarray(a)) for a in b)

        pending = []
        pre_metrics = {}
        for it, batch in prefetch_batches(pre.batch_stream(n_iters),
                                          place=place):
            if batch is None:
                pre_metrics[it] = None
                continue
            pending.append((it, pre.step_placed(it, batch)))
            if len(pending) == 3:  # batched metric fetch, one stack
                vals = np.asarray(jnp.stack([p[1] for p in pending]))
                for (i, _), v in zip(pending, vals):
                    pre_metrics[i] = pre.metrics_dict(i, v)
                pending.clear()
        for (i, m) in pending:
            pre_metrics[i] = pre.metrics_dict(i, np.asarray(m))

        for a, b in zip(jax.tree.leaves(sync.params),
                        jax.tree.leaves(pre.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for i, ms in enumerate(sync_metrics):
            if ms is None:
                assert pre_metrics[i] is None
                continue
            for k in ms:
                np.testing.assert_allclose(pre_metrics[i][k], ms[k],
                                           rtol=0, atol=0, err_msg=k)

    def test_bf16_mixed_precision_tracks_f32(self):
        """compute_dtype='bfloat16' (bench --train-cvae --bf16: bf16
        forwards, f32 master weights + loss tails) must keep f32 params,
        stay finite, and track the f32 trainer's first-iteration metrics
        from the same init/batch/keys within bf16 matmul noise."""
        rng = np.random.RandomState(3)
        S, D, n = 12, 32, 60
        kw = dict(
            src_cnt=rng.randn(n, S, D).astype(np.float32),
            src_action=np.zeros(n, np.int32),
            src_range_starts=np.array([0]), src_range_stops=np.array([n]),
            cha_cnt=rng.randn(n, S, D).astype(np.float32),
            cha_encoded=rng.randn(n, S, D).astype(np.float32),
            cha_action=np.zeros(n, np.int32),
            cha_range_starts=np.array([0]), cha_range_stops=np.array([n]),
            cnt_mean=rng.randn(S, D).astype(np.float32),
            cnt_std=(rng.rand(S, D) + 0.5).astype(np.float32),
            target_actions=[0])
        tc = CVAETrainerConfig(
            latent_dim=D, depth=1, nheads=2, feedforward_dim=64, nseq=S,
            rollout_steps=4, batch_size=4, teacher_iters=2,
            ramping_iters=2, student_iters=2, kl_anneal_end=4,
            dropout=0.0, condition_dropout=0.0)
        t32 = CVAETrainer(tc, **kw)
        tbf = CVAETrainer(tc._replace(compute_dtype="bfloat16"), **kw)
        # same seed -> same init, same host batch draw, same rollout keys
        m32 = t32.train_iteration(0)
        mbf = tbf.train_iteration(0)
        assert m32 is not None and mbf is not None
        for p in jax.tree.leaves(tbf.params):
            assert p.dtype == jnp.float32  # master weights stay f32
        for k in ("cvae/encoded_loss", "cvae/cnt_loss", "cvae/dist_loss"):
            a, b = m32[k], mbf[k]
            assert np.isfinite(b)
            assert abs(a - b) <= 0.05 * max(abs(a), 1.0), (k, a, b)


    def test_one_iteration_matches_torch_reference(self, monkeypatch):
        """One teacher-forced, noise-free training iteration of the
        reference rollout (train_CVAE.py:222-259: per-offset AdamW steps)
        vs CVAETrainer._rollout_impl, from the SAME converted weights and
        the SAME batch.  Reparameterization noise is zeroed (z = posterior
        mean) and condition dropout disabled on both sides — random draws
        cannot be matched across frameworks.  Per-iteration metrics and the
        post-rollout weights must agree."""
        import model_CVAE as ref_cvae_mod
        from mocha_sigasia2023_tpu.models import convert
        from mocha_sigasia2023_tpu.models import cvae as jcvae_mod

        S, D, B, R = 12, 32, 4, 4
        tc = CVAETrainerConfig(
            latent_dim=D, depth=1, nheads=2, feedforward_dim=64, nseq=S,
            rollout_steps=R, batch_size=B, condition_dropout=0.0,
            dropout=0.0)
        rng = np.random.RandomState(7)
        n_feat = 40
        trainer = CVAETrainer(
            tc,
            src_cnt=rng.randn(n_feat, S, D).astype(np.float32),
            src_action=np.zeros(n_feat, np.int32),
            src_range_starts=np.array([0]),
            src_range_stops=np.array([n_feat]),
            cha_cnt=rng.randn(n_feat, S, D).astype(np.float32),
            cha_encoded=rng.randn(n_feat, S, D).astype(np.float32),
            cha_action=np.zeros(n_feat, np.int32),
            cha_range_starts=np.array([0]),
            cha_range_stops=np.array([n_feat]),
            cnt_mean=rng.randn(S, D).astype(np.float32),
            cnt_std=(rng.rand(S, D) + 0.5).astype(np.float32),
            target_actions=[0])

        torch.manual_seed(11)
        ref = ref_cvae_mod.CVAE(output_seq=S, latent_dim=D, depth=1,
                                nheads=2, feedforward_dim=64, dropout=0.0)
        ref.train()
        params = jax.tree.map(
            jnp.asarray, convert.cvae_from_torch(ref.state_dict(), depth=1))
        trainer.params = params
        trainer.opt_state = trainer.tx.init(params)

        # zero the reparameterization noise on both sides
        monkeypatch.setattr(
            ref_cvae_mod.PriorNet, "reparameterize",
            lambda self, mu, logvar, deterministic=False: mu)
        monkeypatch.setattr(
            ref_cvae_mod.Encoder, "reparameterize",
            lambda self, mu, logvar, deterministic=False: mu)
        monkeypatch.setattr(jcvae_mod, "reparameterize",
                            lambda key, mu, logvar: mu)

        src_cnt_nm = rng.randn(B, R, S, D).astype(np.float32)
        cha_enc_nm = rng.randn(B, R, S, D).astype(np.float32)
        cha_cnt_nm = rng.randn(B, R, S, D).astype(np.float32)
        Dgnd = np.sqrt(np.sum((src_cnt_nm - cha_cnt_nm) ** 2,
                              axis=-1)).astype(np.float32)
        anneal_w = 0.7

        # ---- reference rollout, train_CVAE.py:222-259 (dropout p=0,
        # teacher forcing, noise-free) -----------------------------------
        def ref_kl(mu_po, lv_po, mu_pr, lv_pr):
            # train_CVAE.py:16-24
            ew = 0.5 * (lv_pr - lv_po + lv_po.exp() / lv_pr.exp()
                        + (mu_po - mu_pr).pow(2) / lv_pr.exp() - 1)
            return ew.sum(-1).clamp(min=0)

        enc_std_t = torch.as_tensor(trainer._cha_enc_std_w)
        enc_mean_t = torch.as_tensor(trainer.norms["cha_encoded_mean"])
        ccnt_std_t = torch.as_tensor(trainer._cha_cnt_std_w)
        ccnt_mean_t = torch.as_tensor(trainer.norms["cha_cnt_mean"])
        src_t = torch.as_tensor(src_cnt_nm)
        enc_t = torch.as_tensor(cha_enc_nm)
        ccnt_t = torch.as_tensor(cha_cnt_nm)
        Dgnd_t = torch.as_tensor(Dgnd)
        from net.transformer import mean_variance_norm as ref_mvn

        opt = torch.optim.AdamW(ref.parameters(), lr=tc.lr,
                                weight_decay=tc.weight_decay)
        condition = torch.cat([src_t[:, 1], enc_t[:, 0]], dim=1)
        sums = np.zeros(4)
        for offset in range(1, R):
            out, (mu_po, lv_po), (mu_pr, lv_pr) = ref(enc_t[:, offset],
                                                      condition)
            kl = ref_kl(mu_po, lv_po, mu_pr, lv_pr).mean()
            enc_l1 = torch.mean(torch.abs(out - enc_t[:, offset]))
            out_un = out * enc_std_t[None] + enc_mean_t[None]
            cnt_til = (ref_mvn(out_un.permute(0, 2, 1)).permute(0, 2, 1)
                       - ccnt_mean_t[None]) / ccnt_std_t[None]
            Dtil = torch.sqrt(torch.sum((src_t[:, offset] - cnt_til) ** 2,
                                        dim=-1))
            dist_l1 = torch.mean(torch.abs(Dtil - Dgnd_t[:, offset]))
            cnt_l1 = torch.mean(torch.abs(cnt_til - ccnt_t[:, offset]))
            if offset < R - 1:
                condition = torch.cat(
                    [src_t[:, offset + 1],
                     enc_t[:, offset].clone().detach()], dim=1)
            opt.zero_grad()
            (enc_l1 + anneal_w * tc.kl_w * kl + tc.dist_w * dist_l1).backward()
            opt.step()
            sums += [enc_l1.item(), kl.item(), cnt_l1.item(), dist_l1.item()]
        ref_metrics = sums / R  # the /num_steps_per_rollout logging quirk

        # ---- ours: one jitted rollout ----------------------------------
        p2, _, m = trainer._rollout(
            trainer.params, trainer.opt_state,
            jnp.asarray(src_cnt_nm), jnp.asarray(cha_enc_nm),
            jnp.asarray(cha_cnt_nm), jnp.asarray(Dgnd),
            jnp.float32(0.0), jnp.float32(anneal_w), jax.random.PRNGKey(0))

        # per-metric tolerances: enc_l1 is a plain mean-abs (tight); the KL
        # exponentiates random-init logvars, so framework-level fp noise in
        # mu/logvar (~5e-4) is amplified by e^{|logvar|} into a few percent
        # (observed 3.6%); cnt/dist pass through the instance norm (~0.5%)
        for ours_v, ref_v, rtol, name in zip(
                np.asarray(m), ref_metrics, (2e-3, 5e-2, 1e-2, 1e-2),
                ("enc_l1", "kl", "cnt_l1", "dist_l1")):
            np.testing.assert_allclose(ours_v, ref_v, rtol=rtol,
                                       err_msg=name)
        # Post-rollout weights: 3 AdamW steps must agree in aggregate.
        # Element-wise comparison is impossible after Adam — m/sqrt(v)
        # normalization turns fp noise on near-zero-gradient elements into
        # full +-lr sign flips (same effect documented in the split==mono
        # test) — so require the mean |ours-ref| divergence to stay a small
        # fraction of the mean update magnitude, plus a hard per-element
        # bound of the maximum possible honest drift.
        p_ref = convert.cvae_from_torch(ref.state_dict(), depth=1)
        flat_ours = np.concatenate(
            [np.asarray(a).ravel() for a in jax.tree.leaves(p2)])
        flat_ref = np.concatenate(
            [np.asarray(a).ravel() for a in jax.tree.leaves(p_ref)])
        flat_init = np.concatenate(
            [np.asarray(a).ravel() for a in jax.tree.leaves(params)])
        upd = np.abs(flat_ref - flat_init).mean()
        diff = np.abs(flat_ours - flat_ref).mean()
        assert upd > 1e-5, "reference rollout did not update weights"
        assert diff < 0.2 * upd, (
            f"param divergence {diff:.2e} vs mean update {upd:.2e}")
        assert np.abs(flat_ours - flat_ref).max() < 10 * tc.lr * (R - 1)


class TestOrbaxCheckpoint:
    def test_orbax_roundtrip_matches_msgpack_content(self, tmp_path):
        import jax.numpy as jnp
        from mocha_sigasia2023_tpu.train.checkpoint import (
            save_checkpoint, load_checkpoint, restore_like,
            save_checkpoint_orbax, load_checkpoint_orbax)
        from mocha_sigasia2023_tpu.models.cvae import CVAEConfig, init_cvae

        cfg = CVAEConfig(output_seq=12, latent_dim=16, depth=1, nheads=2,
                         feedforward_dim=32)
        params = init_cvae(jax.random.PRNGKey(0), cfg)
        state = {"cvae": params}

        mp = str(tmp_path / "c.msgpack")
        od = str(tmp_path / "c_orbax")
        save_checkpoint(mp, state)
        save_checkpoint_orbax(od, state)

        template = {"cvae": init_cvae(jax.random.PRNGKey(1), cfg)}
        a = restore_like(template, load_checkpoint(mp))
        b = load_checkpoint_orbax(od, template)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
