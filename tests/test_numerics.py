"""Gradient-safety regression tests (ops/numerics.py).

Round-5 incident: a 296-step generator training run at reference scale
NaN'd instantly at step 210 with no loss spike — the signature of a
finite-forward / non-finite-backward domain edge.  Every op hardened in
ops/numerics.py is pinned here twice: (a) finite forward AND gradient at
its degenerate edge, and (b) bitwise-identical values and gradients to
the original unguarded formula on non-degenerate data, so reference
parity is untouched.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mocha_sigasia2023_tpu.kinematics import quat, xform
from mocha_sigasia2023_tpu.kinematics.quat import _cross
from mocha_sigasia2023_tpu.models.layers import mean_variance_norm
from mocha_sigasia2023_tpu.ops.numerics import (
    safe_clip_by_global_norm, safe_sqrt, safe_unit_denom)


def grad_of_sum(f, x):
    return jax.grad(lambda v: jnp.sum(f(v)))(x)


def all_finite(*trees):
    return all(bool(jnp.isfinite(leaf).all())
               for t in trees for leaf in jax.tree.leaves(t))


class TestSafeSqrt:
    def test_identity_above_tiny(self):
        x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (512,))) + 1e-6
        assert bool((safe_sqrt(x) == jnp.sqrt(x)).all())
        ga = grad_of_sum(safe_sqrt, x)
        gb = grad_of_sum(jnp.sqrt, x)
        assert bool((ga == gb).all())

    def test_finite_gradient_at_zero(self):
        g = grad_of_sum(safe_sqrt, jnp.zeros(4))
        assert all_finite(g)
        # the plain op is the hazard this guards against
        assert not all_finite(grad_of_sum(jnp.sqrt, jnp.zeros(4)))


class TestSixDRepresentationEdges:
    """xform.from_xy / quat.from_xform_xy consume NETWORK-PREDICTED 6D
    columns in the recon and cycle losses — parallel/tiny columns used to
    be 0/0 = NaN forward with exploding backward."""

    EDGE_CASES = [
        jnp.array([[1.0, 1.0], [0.0, 0.0], [0.0, 0.0]], jnp.float32),  # parallel
        jnp.array([[1e-20, 0.0], [0.0, 1.0], [0.0, 0.0]], jnp.float32),  # tiny c0
        jnp.zeros((3, 2), jnp.float32),  # all-zero prediction
    ]

    @pytest.mark.parametrize("f", [xform.from_xy, quat.from_xform_xy],
                             ids=["xform.from_xy", "quat.from_xform_xy"])
    def test_finite_at_edges(self, f):
        for xy in self.EDGE_CASES:
            assert all_finite(f(xy)), f"fwd not finite at {xy}"
            assert all_finite(grad_of_sum(f, xy)), f"grad not finite at {xy}"

    def test_bitwise_parity_on_random(self):
        def raw_from_xy(xy):
            c0 = xy[..., 0]
            c2 = _cross(c0, xy[..., 1])
            c2 = c2 / jnp.sqrt(jnp.sum(jnp.square(c2), axis=-1))[..., None]
            c1 = _cross(c2, c0)
            c1 = c1 / jnp.sqrt(jnp.sum(jnp.square(c1), axis=-1))[..., None]
            return jnp.stack([c0, c1, c2], axis=-1)

        r = jax.random.normal(jax.random.PRNGKey(1), (256, 3, 2))
        assert bool((xform.from_xy(r) == raw_from_xy(r)).all())
        ga = jax.grad(lambda v: jnp.sum(xform.from_xy(v) ** 2))(r)
        gb = jax.grad(lambda v: jnp.sum(raw_from_xy(v) ** 2))(r)
        assert bool((ga == gb).all())

    def test_safe_unit_denom_matches_norm(self):
        c = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
        expect = jnp.sqrt(jnp.sum(jnp.square(c), axis=-1, keepdims=True))
        assert bool((safe_unit_denom(c) == expect).all())


class TestQuaternionEdges:
    def test_log_exp_normalize_finite_at_identity(self):
        qid = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
        qnear = jnp.array([1.0, 1e-25, 0.0, 0.0], jnp.float32)  # underflows
        for f, x in [(quat.log, qid), (quat.log, qnear),
                     (quat.exp, jnp.zeros(3, jnp.float32)),
                     (quat.normalize, jnp.zeros(4, jnp.float32))]:
            assert all_finite(f(x))
            assert all_finite(grad_of_sum(f, x)), f"{f.__name__} at {x}"

    def test_bitwise_parity_on_random(self):
        q = quat.normalize(jax.random.normal(jax.random.PRNGKey(3), (128, 4)))

        def raw_log(q, eps=1e-5):
            v_len = jnp.sqrt(
                jnp.sum(jnp.square(q[..., 1:]), axis=-1))[..., None]
            safe = jnp.where(v_len < eps, jnp.ones_like(v_len), v_len)
            halfangle = jnp.where(
                v_len < eps, jnp.ones_like(v_len),
                jnp.arctan2(v_len, q[..., 0:1]) / safe)
            return halfangle * q[..., 1:]

        def raw_normalize(x, eps=1e-8):
            return x / (jnp.sqrt(jnp.sum(x * x, axis=-1))[..., None] + eps)

        x = jax.random.normal(jax.random.PRNGKey(4), (128, 4))
        assert bool((quat.log(q) == raw_log(q)).all())
        assert bool((quat.normalize(x) == raw_normalize(x)).all())
        v = jax.random.normal(jax.random.PRNGKey(5), (128, 3))

        def raw_exp(v, eps=1e-5):
            halfangle = jnp.sqrt(jnp.sum(jnp.square(v), axis=-1))[..., None]
            c = jnp.where(halfangle < eps, jnp.ones_like(halfangle),
                          jnp.cos(halfangle))
            s = jnp.where(halfangle < eps, jnp.ones_like(halfangle),
                          jnp.sinc(halfangle / jnp.pi))
            return jnp.concatenate([c, s * v], axis=-1)

        assert bool((quat.exp(v) == raw_exp(v)).all())


class TestMeanVarianceNormEdge:
    """The prime suspect for the step-210 kill: a ReLU'd channel whose
    tokens all go dead gives var == 0 EXACTLY — the instance-norm forward
    stays finite ((x - mean)/eps = 0) but sqrt's backward is inf."""

    def test_dead_channel_has_finite_grads(self):
        # channel 0 constant (dead), channel 1 live
        x = jnp.stack([jnp.zeros((2, 8)), jnp.arange(16.0).reshape(2, 8)],
                      axis=-1)
        assert all_finite(mean_variance_norm(x))
        assert all_finite(grad_of_sum(mean_variance_norm, x))

    def test_bitwise_parity_on_random(self):
        def raw_mvn(x, eps=1e-5, axis=-2):
            mean = x.mean(axis=axis, keepdims=True)
            n = x.shape[axis]
            var = x.var(axis=axis, keepdims=True) * (n / max(n - 1, 1))
            return (x - mean) / (jnp.sqrt(var) + eps)

        x = jax.random.normal(jax.random.PRNGKey(6), (4, 90, 64))
        assert bool((mean_variance_norm(x) == raw_mvn(x)).all())
        g1 = jax.grad(lambda v: jnp.sum(mean_variance_norm(v) ** 2))(x)
        g2 = jax.grad(lambda v: jnp.sum(raw_mvn(v) ** 2))(x)
        assert bool((g1 == g2).all())


class TestSafeClipByGlobalNorm:
    def test_bit_identical_to_optax_for_finite(self):
        k = jax.random.PRNGKey(7)
        for scale in (1e-3, 1.0, 1e3):
            g = {"a": jax.random.normal(k, (17,)) * scale,
                 "b": jax.random.normal(jax.random.PRNGKey(8), (3, 5)) * scale}
            u1, _ = optax.clip_by_global_norm(1.0).update(g, optax.EmptyState())
            u2, _ = safe_clip_by_global_norm(1.0).update(g, optax.EmptyState())
            assert all(bool((u1[kk] == u2[kk]).all()) for kk in g)

    @pytest.mark.parametrize("bad", [jnp.inf, -jnp.inf, jnp.nan])
    def test_nonfinite_step_is_zeroed(self, bad):
        g = {"a": jnp.array([bad, 1.0]), "b": jnp.array([2.0])}
        u, _ = safe_clip_by_global_norm(1.0).update(g, optax.EmptyState())
        assert all(bool((u[kk] == 0.0).all()) for kk in g)

    def test_adamw_survives_one_poisoned_step(self):
        """A single NaN-gradient batch must leave params finite and the
        optimizer able to continue — plain optax clip propagates NaN here
        (how the r5 convergence run died at step 210)."""
        from mocha_sigasia2023_tpu.train.trainer import make_optimizer

        params = {"gen": {"w": jnp.ones((4,))}, "prj": {"w": jnp.ones((2,))}}
        tx = make_optimizer(lr=1e-3, weight_decay=1e-4, lr_drop_epochs=10,
                            steps_per_epoch=5)
        st = tx.init(params)
        good = jax.tree.map(jnp.ones_like, params)
        bad = {"gen": {"w": jnp.array([jnp.nan, 1.0, 1.0, 1.0])},
               "prj": {"w": jnp.ones((2,))}}
        for g in (good, bad, good):
            up, st = tx.update(g, st, params)
            params = optax.apply_updates(params, up)
            assert all_finite(params), "params poisoned by a bad step"


class TestTrainStepSurvivesDegenerateActivations:
    def test_gen_loss_grads_finite_with_all_zero_params(self):
        """All-zero generator+projector params drive every activation
        constant: var == 0 in each mean_variance_norm, zero projected
        patches in the NCE norm, parallel predicted 6D columns in the FK
        losses — every hazard at once.  Pre-hardening this produced NaN
        gradients; now the whole step must stay finite."""
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).parent))
        from test_train import SMALL_CONFIG, tiny_dataset  # noqa: F401
        from test_dataset import build_synthetic_database
        from mocha_sigasia2023_tpu.data.dataset import (
            MotionDataset, iterate_batches)
        from mocha_sigasia2023_tpu.train.trainer import (
            GeneratorTrainer, compute_gen_loss)

        import tempfile
        with tempfile.TemporaryDirectory() as d:
            build_synthetic_database(f"{d}/database.bin", n_clips=2, T=140)
            ds = MotionDataset(d, "train")
            t = GeneratorTrainer(SMALL_CONFIG, steps_per_epoch=2)
            batches = list(iterate_batches(ds, 8, shuffle=True, seed=0))
            zero_params = jax.tree.map(
                jnp.zeros_like, jax.tree.map(np.asarray, t.state.params))

            def loss_fn(p):
                total, metrics = compute_gen_loss(
                    p, t.gen_cfg, t.prj_cfg, batches[0], batches[1],
                    ds.norm, t.parents, t.weights,
                    jax.random.PRNGKey(0), train=False)
                return total, metrics

            (total, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(zero_params)
            assert bool(jnp.isfinite(total))
            assert all_finite(grads), "NaN/inf grads at degenerate params"
