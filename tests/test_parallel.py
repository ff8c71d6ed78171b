"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
from hamer_yolo_tpu.models.hamer import HamerConfig
from hamer_yolo_tpu.models.mano import ManoModel
from hamer_yolo_tpu.models.mano_head import ManoHeadConfig
from hamer_yolo_tpu.models.vit import ViTConfig
from hamer_yolo_tpu.parallel.mesh import (
    make_mesh, vit_tp_shardings, shard_params, shard_batch, batch_sharding,
)
from hamer_yolo_tpu.training.train_hamer import (
    init_train_state, make_train_step, synthetic_batch, make_optimizers,
)

TINY_CFG = HamerConfig(
    image_size=64, crop_margin=8,
    vit=ViTConfig(img_size=(64, 48), embed_dim=64, depth=2, num_heads=4, compute_dtype="float32"),
    head=ManoHeadConfig(dim=32, context_dim=64, depth=2, heads=2, dim_head=8, mlp_dim=32),
)


def _mano():
    try:
        return ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        return ManoModel.from_arrays(synthetic_mano_model())


class TestMesh:
    def test_device_count(self):
        assert len(jax.devices()) == 8

    def test_make_mesh_shapes(self):
        mesh = make_mesh(n_data=4, n_model=2)
        assert mesh.shape == {"data": 4, "model": 2}

    def test_tp_sharding_rules(self):
        mesh = make_mesh(n_data=4, n_model=2)
        params = {"attn": {"qkv": {"w": jnp.zeros((64, 192))},
                           "proj": {"w": jnp.zeros((64, 64))}},
                  "norm": {"scale": jnp.zeros((64,))}}
        sh = vit_tp_shardings(params, mesh)
        assert sh["attn"]["qkv"]["w"].spec == P(None, "model")
        assert sh["attn"]["proj"]["w"].spec == P("model", None)
        assert sh["norm"]["scale"].spec == P()


class TestTrainStep:
    def test_dp_train_step_runs_and_matches_single_device(self):
        mano = _mano()
        state, (gen_tx, disc_tx) = init_train_state(jax.random.PRNGKey(0), TINY_CFG)
        step_fn = make_train_step(mano, TINY_CFG, gen_tx, disc_tx)
        batch = synthetic_batch(jax.random.PRNGKey(1), 8, TINY_CFG)

        # Single-device reference.
        s1, m1 = jax.jit(step_fn)(state, batch)

        # 4-way DP + 2-way TP.
        mesh = make_mesh(n_data=4, n_model=2)
        with jax.set_mesh(mesh):
            sh_params = shard_params(state.params, vit_tp_shardings(state.params, mesh))
            sh_state = state._replace(params=sh_params)
            sh_batch = shard_batch(batch, mesh)
            s2, m2 = jax.jit(step_fn)(sh_state, sh_batch)

        np.testing.assert_allclose(
            float(m1["total"]), float(m2["total"]), rtol=2e-4
        )
        # params actually updated
        d = jax.tree_util.tree_reduce(
            lambda acc, x: acc + float(jnp.abs(x).sum()),
            jax.tree_util.tree_map(lambda a, b: a - b, s1.params, state.params), 0.0,
        )
        assert d > 0.0

    def test_dcn_replica_axis_train_step(self):
        """2x2x2 (replica x data x model) mesh: the DCN-style outer axis.

        "replica" models the cross-host DCN dimension (pure DP whose only
        cross-axis collective is the gradient all-reduce); the step must
        match the single-device result exactly like plain DP does.
        """
        mano = _mano()
        state, (gen_tx, disc_tx) = init_train_state(jax.random.PRNGKey(0), TINY_CFG)
        step_fn = make_train_step(mano, TINY_CFG, gen_tx, disc_tx)
        batch = synthetic_batch(jax.random.PRNGKey(3), 8, TINY_CFG)

        s1, m1 = jax.jit(step_fn)(state, batch)

        mesh = make_mesh(n_data=2, n_model=2, n_replica=2)
        assert mesh.shape == {"replica": 2, "data": 2, "model": 2}
        with jax.set_mesh(mesh):
            sh_params = shard_params(state.params, vit_tp_shardings(state.params, mesh))
            sh_state = state._replace(params=sh_params)
            sh_batch = shard_batch(batch, mesh)
            # batch rows split over replica*data = 4 groups of 2
            assert sh_batch["img"].sharding.spec[0] == ("replica", "data")
            s2, m2 = jax.jit(step_fn)(sh_state, sh_batch)
        np.testing.assert_allclose(float(m1["total"]), float(m2["total"]), rtol=2e-4)

    def test_dcn_replica_grad_sync_equivalence(self):
        """Gradients all-reduced over replica+data == full-batch gradients."""
        mano = _mano()
        state, (gen_tx, disc_tx) = init_train_state(jax.random.PRNGKey(0), TINY_CFG)
        step = make_train_step(mano, TINY_CFG, gen_tx, disc_tx)
        batch = synthetic_batch(jax.random.PRNGKey(4), 8, TINY_CFG)

        s_full, _ = jax.jit(step)(state, batch)
        mesh = make_mesh(n_data=4, n_model=1, n_replica=2)
        with jax.set_mesh(mesh):
            s_dp, _ = jax.jit(step)(state, shard_batch(batch, mesh))
        lead = jax.tree_util.tree_leaves(s_full.params)
        lead_dp = jax.tree_util.tree_leaves(s_dp.params)
        for a, b in zip(lead[:10], lead_dp[:10]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_grad_sync_equivalence(self):
        """DP gradients == full-batch gradients (the DDP allreduce check)."""
        mano = _mano()
        state, (gen_tx, disc_tx) = init_train_state(jax.random.PRNGKey(0), TINY_CFG)
        step = make_train_step(mano, TINY_CFG, gen_tx, disc_tx)
        batch = synthetic_batch(jax.random.PRNGKey(2), 4, TINY_CFG)

        s_full, m_full = jax.jit(step)(state, batch)
        mesh = make_mesh(n_data=4, n_model=1)
        with jax.set_mesh(mesh):
            s_dp, m_dp = jax.jit(step)(state, shard_batch(batch, mesh))
        lead = jax.tree_util.tree_leaves(s_full.params)
        lead_dp = jax.tree_util.tree_leaves(s_dp.params)
        for a, b in zip(lead[:10], lead_dp[:10]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestFullsizeDryrun:
    @pytest.mark.skipif("RUN_FULLSIZE" not in __import__("os").environ,
                        reason="~40 min CPU compile; set RUN_FULLSIZE=1 "
                               "(artifact: assets/multichip_fullsize_r03.log)")
    def test_dryrun_multichip_fullsize(self):
        """Production-shape (ViT-H depth 32 dim 1280) TP+DP train step on
        the 8-device virtual mesh — the driver artifact's anti-rot test."""
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                        "__graft_entry__.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip_fullsize(len(jax.devices()))


class TestShardedInference:
    def test_composed_inference_program_sharded(self):
        """The dryrun's phase 2 (VERDICT r04 #6) as suite coverage: the
        COMPOSED serving program (infer_frames) batch-sharded over a
        DPxTP mesh compiles + executes with finite outputs."""
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "graft_entry_infer", os.path.join(os.path.dirname(__file__),
                                              "..", "__graft_entry__.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mesh = make_mesh(n_data=4, n_model=2)
        mod._dryrun_inference_phase(mesh, 4, mod._mano_model())
