"""Distributed BA on the virtual 8-device CPU mesh must match single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_byzyh_tpu.parallel import dist_ba
from orbslam3_byzyh_tpu.solver import ba
from test_ba import K_PARAMS, make_problem, rot_err_deg, synth_ba
from orbslam3_byzyh_tpu.ops import lie


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs the forced multi-device CPU backend")
    return dist_ba.make_mesh(8)


class TestDistributedBA:
    def test_matches_single_device(self, mesh, rng):
        X, Rs, ts, okf, ouv, oval = synth_ba(rng, n_kf=5, n_lm=320)
        n_kf = len(Rs)
        Rp, tp = Rs.copy(), ts.copy()
        for k in range(2, n_kf):
            dR = np.asarray(lie.so3_exp(jnp.asarray(
                rng.uniform(-0.02, 0.02, 3).astype(np.float32))))
            Rp[k] = dR @ Rs[k]
            tp[k] = ts[k] + rng.uniform(-0.05, 0.05, 3)
        fixed = np.zeros(n_kf, bool)
        fixed[:2] = True
        prob = make_problem(X, Rp, tp, okf, ouv, oval, fixed)

        res_single = ba.bundle_adjust(prob)
        prob_sharded = dist_ba.shard_problem(prob, mesh)
        res_dist = dist_ba.dist_bundle_adjust(prob_sharded, mesh)

        # Identical math up to collective reduction order (f32 rounding).
        np.testing.assert_allclose(np.asarray(res_dist.R),
                                   np.asarray(res_single.R), atol=5e-4)
        np.testing.assert_allclose(np.asarray(res_dist.t),
                                   np.asarray(res_single.t), atol=5e-3)
        assert abs(float(res_dist.cost) - float(res_single.cost)) \
            < 0.05 * float(res_single.cost) + 1.0

    def test_improves_poses(self, mesh, rng):
        X, Rs, ts, okf, ouv, oval = synth_ba(rng, n_kf=5, n_lm=320)
        n_kf = len(Rs)
        Rp, tp = Rs.copy(), ts.copy()
        for k in range(2, n_kf):
            dR = np.asarray(lie.so3_exp(jnp.asarray(
                rng.uniform(-0.02, 0.02, 3).astype(np.float32))))
            Rp[k] = dR @ Rs[k]
            tp[k] = ts[k] + rng.uniform(-0.05, 0.05, 3)
        fixed = np.zeros(n_kf, bool)
        fixed[:2] = True
        prob = make_problem(X, Rp, tp, okf, ouv, oval, fixed)
        prob_sharded = dist_ba.shard_problem(prob, mesh)
        res = dist_ba.dist_bundle_adjust(prob_sharded, mesh)
        for k in range(2, n_kf):
            assert rot_err_deg(np.asarray(res.R[k]), Rs[k]) < 0.15
            assert np.linalg.norm(np.asarray(res.t[k]) - ts[k]) < 0.03
