"""Edge-sharded distributed pose graph on the virtual 8-device CPU mesh
must match the single-device optimizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_byzyh_tpu.ops import lie
from orbslam3_byzyh_tpu.parallel import dist_ba, dist_posegraph
from orbslam3_byzyh_tpu.solver import pose_graph
from test_sim3_posegraph import make_loop_problem


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs the forced multi-device CPU backend")
    return dist_ba.make_mesh(8)


def build_edges(rng, n_kf=16):
    Rs_gt, ts_gt, Rs_o, ts_o, rels = make_loop_problem(rng, n_kf)
    ei, ej, mR, mt, ms_, w = [], [], [], [], [], []
    for k in range(1, n_kf):
        ei.append(k)
        ej.append(k - 1)
        mR.append(rels[k - 1][0])
        mt.append(rels[k - 1][1])
        ms_.append(1.0)
        w.append(1.0)
    Rrel, trel, _ = pose_graph.relative_sim3(
        jnp.asarray(Rs_gt[-1]), jnp.asarray(ts_gt[-1]), jnp.asarray(1.0),
        jnp.asarray(Rs_gt[0]), jnp.asarray(ts_gt[0]), jnp.asarray(1.0))
    ei.append(n_kf - 1)
    ej.append(0)
    mR.append(np.asarray(Rrel))
    mt.append(np.asarray(trel))
    ms_.append(1.0)
    w.append(1.0)
    args = (jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.stack(mR)), jnp.asarray(np.stack(mt)),
            jnp.asarray(ms_, jnp.float32), jnp.asarray(w, jnp.float32))
    return Rs_gt, ts_gt, Rs_o, ts_o, args


class TestDistPoseGraph:
    def test_matches_single_device(self, mesh, rng):
        n_kf = 16
        Rs_gt, ts_gt, Rs_o, ts_o, args = build_edges(rng, n_kf)
        fixed = jnp.zeros(n_kf, bool).at[0].set(True)

        res_single = pose_graph.optimize_pose_graph(
            jnp.asarray(Rs_o), jnp.asarray(ts_o), jnp.ones(n_kf),
            *args, fixed, pose_graph.DOF_SE3, n_iters=20)

        padded = dist_posegraph.pad_edges(*args, len(mesh.devices))
        res_dist = dist_posegraph.dist_optimize_pose_graph(
            jnp.asarray(Rs_o), jnp.asarray(ts_o), jnp.ones(n_kf),
            *padded, fixed, pose_graph.DOF_SE3, mesh=mesh, n_iters=20)

        np.testing.assert_allclose(np.asarray(res_dist.R),
                                   np.asarray(res_single.R), atol=1e-3)
        np.testing.assert_allclose(np.asarray(res_dist.t),
                                   np.asarray(res_single.t), atol=5e-3)

    def test_reduces_drift(self, mesh, rng):
        n_kf = 16
        Rs_gt, ts_gt, Rs_o, ts_o, args = build_edges(rng, n_kf)
        fixed = jnp.zeros(n_kf, bool).at[0].set(True)
        drift_before = np.linalg.norm(
            (-Rs_o[-1].T @ ts_o[-1]) - (-Rs_gt[-1].T @ ts_gt[-1]))
        padded = dist_posegraph.pad_edges(*args, len(mesh.devices))
        res = dist_posegraph.dist_optimize_pose_graph(
            jnp.asarray(Rs_o), jnp.asarray(ts_o), jnp.ones(n_kf),
            *padded, fixed, pose_graph.DOF_SE3, mesh=mesh, n_iters=25)
        c_after = -np.einsum("nji,nj->ni", np.asarray(res.R),
                             np.asarray(res.t))
        c_gt = -np.einsum("nji,nj->ni", Rs_gt, ts_gt)
        drift_after = np.linalg.norm(c_after[-1] - c_gt[-1])
        assert drift_after < 0.5 * drift_before, (drift_before, drift_after)
