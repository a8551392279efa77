"""Kinematics parity tests: JAX library vs the reference NumPy formulas.

The reference implementation (/root/reference/motion/quat.py, xform.py,
Inertialization.py) is imported as the golden oracle; our library must
reproduce it to float32 tolerance on random inputs, plus closed-form
identities.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import add_reference_paths, reference_available
from mocha_sigasia2023_tpu.kinematics import quat as jq
from mocha_sigasia2023_tpu.kinematics import xform as jx
from mocha_sigasia2023_tpu.kinematics import inertial as ji

if not reference_available():  # pragma: no cover
    pytest.skip("reference repo unavailable", allow_module_level=True)

add_reference_paths()
import quat as rq  # noqa: E402  (reference oracle)
import xform as rx  # noqa: E402
import Inertialization as rinert  # noqa: E402

RNG = np.random.RandomState(1777)

# mocha skeleton with synthesized root bone prepended (25 bones):
# configs/dataset.yaml mocha_parents shifted by +1 with -1 root.
MOCHA_PARENTS = np.concatenate(
    [[-1], np.array([-1, 0, 1, 2, 3, 0, 5, 6, 7, 8, 9, 10, 11, 8, 13, 14,
                     8, 16, 17, 18, 0, 20, 21, 22]) + 1]
)


def rand_quat(*shape):
    q = RNG.randn(*shape, 4).astype(np.float32)
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def rand_vec(*shape):
    return RNG.randn(*shape, 3).astype(np.float32)


def assert_close(a, b, atol=2e-5, rtol=2e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


class TestQuatAlgebra:
    def test_mul_matches_reference(self):
        x, y = rand_quat(7, 3), rand_quat(7, 3)
        assert_close(jq.mul(jnp.asarray(x), jnp.asarray(y)), rq.mul(x, y))

    def test_mul_vec_matches_reference(self):
        q, v = rand_quat(5, 4), rand_vec(5, 4)
        assert_close(jq.mul_vec(jnp.asarray(q), jnp.asarray(v)), rq.mul_vec(q, v))

    def test_inv_mul_vec(self):
        q, v = rand_quat(6), rand_vec(6)
        assert_close(jq.inv_mul_vec(jnp.asarray(q), jnp.asarray(v)),
                     rq.inv_mul_vec(q, v))

    def test_to_xform_roundtrip_and_reference(self):
        q = rand_quat(11)
        assert_close(jq.to_xform(jnp.asarray(q)), rq.to_xform(q))
        back = jq.from_xform(jq.to_xform(jnp.asarray(q)))
        # same rotation up to sign
        dot = np.abs(np.sum(np.asarray(back) * q, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_from_xform_matches_reference_all_branches(self):
        # large random rotations hit all four diagonal branches
        q = rand_quat(512)
        m = rq.to_xform(q)
        assert_close(jq.from_xform(jnp.asarray(m)), rq.from_xform(m))

    def test_xform_xy_roundtrip(self):
        q = rand_quat(64)
        txy = rq.to_xform_xy(q)
        assert_close(jq.to_xform_xy(jnp.asarray(q)), txy)
        assert_close(jq.from_xform_xy(jnp.asarray(txy).astype(jnp.float32)),
                     rq.from_xform_xy(txy), atol=1e-4, rtol=1e-3)

    def test_from_euler(self):
        e = (RNG.rand(9, 3).astype(np.float32) * 2 - 1) * np.pi
        for order in ["zyx", "xyz"]:
            assert_close(jq.from_euler(jnp.asarray(e), order), rq.from_euler(e, order))

    def test_to_euler(self):
        q = rand_quat(33)
        for order in ["xyz", "yzx"]:
            assert_close(jq.to_euler(jnp.asarray(q), order), rq.to_euler(q, order),
                         atol=1e-4, rtol=1e-3)

    def test_log_exp_scaled_angle_axis(self):
        q = jq.abs_(jnp.asarray(rand_quat(17)))
        v = jq.to_scaled_angle_axis(q)
        assert_close(v, rq.to_scaled_angle_axis(np.asarray(q)))
        assert_close(jq.from_scaled_angle_axis(v), np.asarray(q), atol=1e-4)

    def test_exp_small_angle(self):
        v = np.zeros((3, 3), dtype=np.float32)
        assert_close(jq.exp(jnp.asarray(v)), rq.exp(v))

    def test_between(self):
        u, v = rand_vec(8), rand_vec(8)
        assert_close(jq.between(jnp.asarray(u), jnp.asarray(v)), rq.between(u, v))

    def test_unroll_matches_sequential_reference(self):
        q = rand_quat(50, 6)
        # introduce deliberate sign flips
        q[::3] *= -1
        assert_close(jq.unroll(jnp.asarray(q)), rq.unroll(q.copy()))

    def test_grad_flows(self):
        q = jnp.asarray(rand_quat(4))
        g = jax.grad(lambda x: jnp.sum(jq.to_xform_xy(jq.normalize(x))))(q)
        assert np.all(np.isfinite(np.asarray(g)))


class TestFK:
    def test_fk_matches_reference(self):
        B, T, J = 3, 5, len(MOCHA_PARENTS)
        lrot, lpos = rand_quat(B, T, J), rand_vec(B, T, J)
        gr, gp = jq.fk(jnp.asarray(lrot), jnp.asarray(lpos), MOCHA_PARENTS)
        rgr, rgp = rq.fk(lrot, lpos, MOCHA_PARENTS)
        assert_close(gr, rgr, atol=1e-5, rtol=1e-4)
        assert_close(gp, rgp, atol=1e-5, rtol=1e-4)

    def test_ik_inverts_fk(self):
        B, J = 4, len(MOCHA_PARENTS)
        lrot, lpos = rand_quat(B, J), rand_vec(B, J)
        gr, gp = jq.fk(jnp.asarray(lrot), jnp.asarray(lpos), MOCHA_PARENTS)
        lr2, lp2 = jq.ik(gr, gp, MOCHA_PARENTS)
        dot = np.abs(np.sum(np.asarray(lr2) * lrot, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-4)
        assert_close(lp2, lpos, atol=1e-4, rtol=1e-3)

    def test_ik_matches_reference(self):
        B, J = 4, len(MOCHA_PARENTS)
        gr, gp = rand_quat(B, J), rand_vec(B, J)
        jr, jp = jq.ik(jnp.asarray(gr), jnp.asarray(gp), MOCHA_PARENTS)
        rr, rp = rq.ik(gr, gp, MOCHA_PARENTS)
        assert_close(jr, rr)
        assert_close(jp, rp)

    def test_fk_vel_matches_reference(self):
        B, J = 2, len(MOCHA_PARENTS)
        lrot, lpos = rand_quat(B, J), rand_vec(B, J)
        lvel, lang = rand_vec(B, J), rand_vec(B, J)
        out = jq.fk_vel(*(jnp.asarray(a) for a in (lrot, lpos, lvel, lang)),
                        MOCHA_PARENTS)
        ref = rq.fk_vel(lrot, lpos, lvel, lang, MOCHA_PARENTS)
        for a, b in zip(out, ref):
            assert_close(a, b, atol=1e-4, rtol=1e-3)

    def test_fk_vel_bone_matches_reference(self):
        J = len(MOCHA_PARENTS)
        lrot, lpos = rand_quat(J), rand_vec(J)
        lvel, lang = rand_vec(J), rand_vec(J)
        toe = 5  # LeftToeBase in the 25-bone rig
        gp, gv, gr, ga = jq.fk_vel_bone(
            *(jnp.asarray(a) for a in (lrot, lpos, lvel, lang)),
            MOCHA_PARENTS, toe)
        rp, rv, rr, ra = rq.fk_vel_bone(lpos, lvel, lrot, lang, MOCHA_PARENTS, toe)
        assert_close(gp, rp, atol=1e-5, rtol=1e-4)
        assert_close(gv, rv, atol=1e-4, rtol=1e-3)
        assert_close(gr, rr, atol=1e-5, rtol=1e-4)
        assert_close(ga, ra, atol=1e-5, rtol=1e-4)

    def test_fk_chain_matches_full_fk(self):
        J = len(MOCHA_PARENTS)
        lrot, lpos = rand_quat(J), rand_vec(J)
        gr, gp = jq.fk(jnp.asarray(lrot), jnp.asarray(lpos), MOCHA_PARENTS)
        toe = 5
        chain_out = jq.fk_chain(jnp.asarray(lrot), jnp.asarray(lpos),
                                MOCHA_PARENTS, toe)
        for j, (cr, cp) in chain_out.items():
            assert_close(cr, np.asarray(gr)[j], atol=1e-5, rtol=1e-4)
            assert_close(cp, np.asarray(gp)[j], atol=1e-5, rtol=1e-4)


class TestIKSolvers:
    def test_ik_two_bone_matches_reference(self):
        # Build a plausible leg chain: hip at origin-ish, knee, heel.
        for _ in range(10):
            hip = rand_vec()
            knee = hip + rand_vec() * 0.5
            heel = knee + rand_vec() * 0.5
            target = heel + rand_vec() * 0.2
            fwd = rq.normalize(rand_vec())
            root_gr, mid_gr, par_gr = rand_quat(), rand_quat(), rand_quat()
            root_lr, mid_lr = rand_quat(), rand_quat()

            ours = jq.ik_two_bone(
                *(jnp.asarray(a) for a in
                  (root_lr, mid_lr, hip, knee, heel, target, fwd,
                   root_gr, mid_gr, par_gr)), 0.015)
            ref = rq.ik_two_bone(root_lr, mid_lr, hip, knee, heel, target,
                                 fwd, root_gr, mid_gr, par_gr, 0.015)
            assert_close(ours[0], ref[0], atol=1e-4, rtol=1e-3)
            assert_close(ours[1], ref[1], atol=1e-4, rtol=1e-3)

    def test_ik_two_bone_clamped_target(self):
        hip = np.zeros(3, np.float32)
        knee = np.array([0, -0.5, 0], np.float32)
        heel = np.array([0, -1.0, 0], np.float32)
        target = np.array([0, -5.0, 0.2], np.float32)  # beyond max extension
        fwd = np.array([0, 0, 1], np.float32)
        q0 = np.array([1, 0, 0, 0], np.float32)
        ours = jq.ik_two_bone(
            *(jnp.asarray(a) for a in
              (q0, q0, hip, knee, heel, target, fwd, q0, q0, q0)), 0.015)
        ref = rq.ik_two_bone(q0, q0, hip, knee, heel, target, fwd,
                             q0, q0, q0, 0.015)
        assert_close(ours[0], ref[0], atol=1e-4, rtol=1e-3)
        assert_close(ours[1], ref[1], atol=1e-4, rtol=1e-3)


class TestXform:
    def test_from_xy_matches_reference(self):
        xy = rq.to_xform_xy(rand_quat(13))
        assert_close(jx.from_xy(jnp.asarray(xy, dtype=jnp.float32)),
                     rx.from_xy(xy), atol=1e-5, rtol=1e-4)

    def test_fk_vel_matches_reference(self):
        B, J = 2, len(MOCHA_PARENTS)
        lrot = rq.to_xform(rand_quat(B, J))
        lpos, lvel, lang = rand_vec(B, J), rand_vec(B, J), rand_vec(B, J)
        out = jx.fk_vel(*(jnp.asarray(a, dtype=jnp.float32)
                          for a in (lrot, lpos, lvel, lang)), MOCHA_PARENTS)
        ref = rx.fk_vel(lrot, lpos, lvel, lang, MOCHA_PARENTS)
        for a, b in zip(out, ref):
            assert_close(a, b, atol=1e-4, rtol=1e-3)


class TestInertialization:
    def test_spring_decay_pos(self):
        x, v = rand_vec(5), rand_vec(5)
        ours = ji.decay_spring_damper_pos(jnp.asarray(x), jnp.asarray(v), 0.1, 1 / 60)
        ref = rinert.decay_spring_damper_exact_pos(x, v, 0.1, 1 / 60)
        assert_close(ours[0], ref[0])
        assert_close(ours[1], ref[1])

    def test_spring_decay_rot(self):
        x, v = rand_quat(5), rand_vec(5)
        ours = ji.decay_spring_damper_rot(jnp.asarray(x), jnp.asarray(v), 0.1, 1 / 60)
        ref = rinert.decay_spring_damper_exact_rot(x, v, 0.1, 1 / 60)
        assert_close(ours[0], ref[0], atol=1e-4)
        assert_close(ours[1], ref[1], atol=1e-4)

    def test_contact_update_trajectory_matches_reference(self):
        """Run 120 frames of a synthetic toe trajectory through both state
        machines (lock + unlock + drift-unlock paths) and compare."""
        dt, halflife = 1 / 60.0, 0.1
        unlock_radius, foot_height = 0.2, 0.02
        T = 120
        t = np.arange(T) / 60.0
        toe = np.stack([
            0.4 * t,                      # drifting forward (forces unlock)
            np.abs(np.sin(t * 6.0)) * 0.1,
            np.zeros(T),
        ], axis=-1).astype(np.float32)
        contact_in = (toe[:, 1] < 0.02)

        # reference state (scalars)
        r = dict(state=False, lock=False, position=toe[0].copy(),
                 velocity=np.zeros(3), point=toe[0].copy(),
                 target=toe[0].copy(), off_p=np.zeros(3), off_v=np.zeros(3))
        # ours (batched over 1 bone)
        cs = ji.ContactState.init(jnp.asarray(toe[0][None]))

        for i in range(1, T):
            (r["state"], r["lock"], r["position"], r["velocity"], r["point"],
             r["target"], r["off_p"], r["off_v"]) = rinert.contact_update(
                r["state"], r["lock"], r["position"], r["velocity"],
                r["point"], r["target"], r["off_p"], r["off_v"],
                toe[i], bool(contact_in[i]), unlock_radius, foot_height,
                halflife, dt)
            cs = ji.contact_update(cs, jnp.asarray(toe[i][None]),
                                   jnp.asarray([contact_in[i]]),
                                   unlock_radius, foot_height, halflife, dt)
            assert bool(np.asarray(cs.lock)[0]) == bool(r["lock"]), f"frame {i}"
            assert bool(np.asarray(cs.state)[0]) == bool(r["state"]), f"frame {i}"
            assert_close(cs.position[0], r["position"], atol=1e-4, rtol=1e-3)
            assert_close(cs.point[0], r["point"], atol=1e-4, rtol=1e-3)

    def test_pose_inertializer_trajectory_matches_reference(self):
        """Whole-pose inertializer (pose_transition + pose_update) vs the
        reference per-bone loops (Inertialization.py:136-297): transition,
        40 update ticks, a SECOND mid-stream transition, 40 more ticks."""
        rng = np.random.RandomState(3)
        J, dt, halflife = 6, 1 / 60.0, 0.15

        def vecs():
            return rng.uniform(-1, 1, (J, 3)).astype(np.float32)

        def quats():
            return rand_quat(J).astype(np.float32)

        root_pos, root_vel = vecs()[0], vecs()[0]
        root_rot, root_ang = quats()[0], vecs()[0]
        src = dict(pos=vecs(), vel=vecs(), rot=quats(), ang=vecs())
        dst = dict(pos=vecs(), vel=vecs(), rot=quats(), ang=vecs())

        # reference state: copies (the reference mutates in place)
        r_off = [np.zeros((J, 3)), np.zeros((J, 3)),
                 np.tile(np.array([1.0, 0, 0, 0]), (J, 1)), np.zeros((J, 3))]
        off = ji.PoseOffsets.zeros(J)

        def do_transition():
            nonlocal r_off, off, r_trans, trans
            out = rinert.pose_transition(
                r_off[0].copy(), r_off[1].copy(), r_off[2].copy(),
                r_off[3].copy(), root_pos, root_vel, root_rot, root_ang,
                src["pos"], src["vel"], src["rot"], src["ang"],
                dst["pos"], dst["vel"], dst["rot"], dst["ang"])
            r_off, r_trans = list(out[:4]), out[4:]
            off, trans = ji.pose_transition(
                off, *(jnp.asarray(a) for a in
                       (root_pos, root_vel, root_rot, root_ang)),
                *(jnp.asarray(src[k]) for k in ("pos", "vel", "rot", "ang")),
                *(jnp.asarray(dst[k]) for k in ("pos", "vel", "rot", "ang")))
            for a, b in zip(off, r_off):
                assert_close(a, b, atol=1e-4, rtol=1e-3)

        r_trans, trans = None, None
        do_transition()

        t = 0.0
        for i in range(80):
            if i == 40:
                # mid-stream re-transition from fresh poses (the offsets are
                # non-zero now — exercises the accumulate path)
                src = dict(pos=vecs(), vel=vecs(), rot=quats(), ang=vecs())
                dst = dict(pos=vecs(), vel=vecs(), rot=quats(), ang=vecs())
                root_pos = root_pos + rng.uniform(-0.5, 0.5, 3)
                do_transition()
            t += dt
            in_pos = src["pos"] + 0.3 * np.sin(t * 4.0)
            in_vel = src["vel"] * np.cos(t * 2.0)
            in_rot = np.asarray(rq.mul(
                src["rot"],
                rq.from_scaled_angle_axis(
                    0.2 * np.sin(t * 3.0) * np.ones((J, 3)))), np.float32)
            in_ang = src["ang"] + 0.1 * np.cos(t * 5.0)

            ref = rinert.pose_update(
                np.zeros((J, 3)), np.zeros((J, 3)),
                np.tile(np.array([1.0, 0, 0, 0]), (J, 1)), np.zeros((J, 3)),
                r_off[0].copy(), r_off[1].copy(), r_off[2].copy(),
                r_off[3].copy(),
                in_pos, in_vel, in_rot, in_ang, *r_trans, halflife, dt)
            r_pose, r_off = list(ref[:4]), list(ref[4:])

            pos, vel, rot, ang, off = ji.pose_update(
                off, *(jnp.asarray(a) for a in
                       (in_pos, in_vel, in_rot, in_ang)),
                trans, halflife, dt)
            for a, b, name in zip((pos, vel, rot, ang), r_pose,
                                  ("pos", "vel", "rot", "ang")):
                assert_close(a, b, atol=2e-4, rtol=1e-3)
            for a, b in zip(off, r_off):
                assert_close(a, b, atol=2e-4, rtol=1e-3)


class TestFKVariants:
    def test_chain_matches_level(self):
        B, T, J = 2, 4, len(MOCHA_PARENTS)
        lrot, lpos = rand_quat(B, T, J), rand_vec(B, T, J)
        lvel, lang = rand_vec(B, T, J), rand_vec(B, T, J)
        a = jq.fk(jnp.asarray(lrot), jnp.asarray(lpos), MOCHA_PARENTS)
        b = jq.fk_chain_all(jnp.asarray(lrot), jnp.asarray(lpos), MOCHA_PARENTS)
        assert_close(a[0], b[0], atol=1e-5, rtol=1e-4)
        assert_close(a[1], b[1], atol=1e-5, rtol=1e-4)
        va = jq.fk_vel(*(jnp.asarray(x) for x in (lrot, lpos, lvel, lang)),
                       MOCHA_PARENTS)
        vb = jq.fk_vel_chain_all(
            *(jnp.asarray(x) for x in (lrot, lpos, lvel, lang)), MOCHA_PARENTS)
        for x, y in zip(va, vb):
            assert_close(x, y, atol=1e-4, rtol=1e-3)
