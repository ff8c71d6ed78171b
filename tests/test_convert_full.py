"""Full-model converter coverage: every layer of the yolov7 deploy graph.

Builds a torch-layout state dict FROM our own randomly-initialized deploy
params (the exact inverse transposes), runs convert_yolov7_state_dict on
it, and checks the round trip reproduces the original pytree — validating
the converter's spec-index/prefix mapping across all 106 layers, and that
the converted model's forward matches exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import convert as cv
from hamer_yolo_tpu.models.yolov7.model import (
    C, DET, REP, SPP, YoloConfig, init_yolov7, yolov7_forward, yolov7_spec,
)


def _inv_conv(p):
    """Our {"w" HWIO, "b"} deploy conv -> torch-layout fused-conv keys."""
    out = {"conv.weight": np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))}
    if "b" in p:
        out["conv.bias"] = np.asarray(p["b"])
    return out


def pytree_to_torch_sd(params, spec):
    sd = {}
    for i, (frm, op, args) in enumerate(spec):
        p = params["layers"][i]
        prefix = f"model.{i}"
        if op == C:
            for k, v in _inv_conv(p["conv"]).items():
                sd[f"{prefix}.{k}"] = v
        elif op == SPP:
            for name in ("cv1", "cv2", "cv3", "cv4", "cv5", "cv6", "cv7"):
                for k, v in _inv_conv(p[name]["conv"]).items():
                    sd[f"{prefix}.{name}.{k}"] = v
        elif op == REP:
            sd[f"{prefix}.rbr_reparam.weight"] = np.transpose(
                np.asarray(p["reparam"]["w"]), (3, 2, 0, 1))
            sd[f"{prefix}.rbr_reparam.bias"] = np.asarray(p["reparam"]["b"])
        elif op == DET:
            for j, head in enumerate(p["m"]):
                sd[f"{prefix}.m.{j}.weight"] = np.transpose(
                    np.asarray(head["w"]), (3, 2, 0, 1))
                sd[f"{prefix}.m.{j}.bias"] = np.asarray(head["b"])
    return sd


class TestFullConverterRoundTrip:
    def test_all_layers_roundtrip_and_forward(self):
        cfg = YoloConfig(nc=3, img_size=64, compute_dtype="float32")
        spec = yolov7_spec()
        params = init_yolov7(jax.random.PRNGKey(0), cfg, deploy=True)
        sd = pytree_to_torch_sd(params, spec)
        restored = cv.convert_yolov7_state_dict(sd)

        # leaf-exact round trip
        orig_leaves = jax.tree_util.tree_leaves(params)
        rest_leaves = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(jnp.asarray, restored))
        assert len(orig_leaves) == len(rest_leaves)
        for a, b in zip(orig_leaves, rest_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # forward-exact
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 64, 64, 3)).astype(np.float32))
        y1 = np.asarray(yolov7_forward(params, x, cfg))
        y2 = np.asarray(yolov7_forward(
            jax.tree_util.tree_map(jnp.asarray, restored), x, cfg))
        np.testing.assert_array_equal(y1, y2)


class TestHamerConverterRoundTrip:
    def test_vit_and_head_roundtrip(self):
        from hamer_yolo_tpu.models.mano_head import ManoHeadConfig, init_mano_head
        from hamer_yolo_tpu.models.vit import ViTConfig, init_vit

        vcfg = ViTConfig(img_size=(64, 48), embed_dim=64, depth=2, num_heads=4,
                         compute_dtype="float32")
        hcfg = ManoHeadConfig(dim=32, context_dim=64, depth=2, heads=2,
                              dim_head=8, mlp_dim=32)
        vit = init_vit(jax.random.PRNGKey(0), vcfg)
        head = init_mano_head(jax.random.PRNGKey(1), hcfg)

        def lin_t(p):
            out = {"weight": np.transpose(np.asarray(p["w"]))}
            if "b" in p:
                out["bias"] = np.asarray(p["b"])
            return out

        sd = {}
        sd["backbone.patch_embed.proj.weight"] = np.transpose(
            np.asarray(vit["patch_embed"]["w"]), (3, 2, 0, 1))
        sd["backbone.patch_embed.proj.bias"] = np.asarray(vit["patch_embed"]["b"])
        sd["backbone.pos_embed"] = np.asarray(vit["pos_embed"])
        sd["backbone.last_norm.weight"] = np.asarray(vit["last_norm"]["scale"])
        sd["backbone.last_norm.bias"] = np.asarray(vit["last_norm"]["bias"])
        for i, blk in enumerate(vit["blocks"]):
            b = f"backbone.blocks.{i}."
            sd[b + "norm1.weight"] = np.asarray(blk["norm1"]["scale"])
            sd[b + "norm1.bias"] = np.asarray(blk["norm1"]["bias"])
            sd[b + "norm2.weight"] = np.asarray(blk["norm2"]["scale"])
            sd[b + "norm2.bias"] = np.asarray(blk["norm2"]["bias"])
            for k, v in lin_t(blk["attn"]["qkv"]).items():
                sd[b + f"attn.qkv.{k}"] = v
            for k, v in lin_t(blk["attn"]["proj"]).items():
                sd[b + f"attn.proj.{k}"] = v
            for k, v in lin_t(blk["mlp"]["fc1"]).items():
                sd[b + f"mlp.fc1.{k}"] = v
            for k, v in lin_t(blk["mlp"]["fc2"]).items():
                sd[b + f"mlp.fc2.{k}"] = v

        h = "mano_head."
        for k, v in lin_t(head["token_embed"]).items():
            sd[h + f"transformer.to_token_embedding.{k}"] = v
        sd[h + "transformer.pos_embedding"] = np.asarray(head["pos_embed"])
        for name in ("decpose", "decshape", "deccam"):
            for k, v in lin_t(head[name]).items():
                sd[h + f"{name}.{k}"] = v
        for b in ("init_hand_pose", "init_betas", "init_cam"):
            sd[h + b] = np.asarray(head[b])
        for i, layer in enumerate(head["layers"]):
            t = h + f"transformer.transformer.layers.{i}."
            sd[t + "0.norm.weight"] = np.asarray(layer["sa_norm"]["scale"])
            sd[t + "0.norm.bias"] = np.asarray(layer["sa_norm"]["bias"])
            sd[t + "0.fn.to_qkv.weight"] = np.transpose(np.asarray(layer["sa"]["qkv"]["w"]))
            for k, v in lin_t(layer["sa"]["proj"]).items():
                sd[t + f"0.fn.to_out.0.{k}"] = v
            sd[t + "1.norm.weight"] = np.asarray(layer["ca_norm"]["scale"])
            sd[t + "1.norm.bias"] = np.asarray(layer["ca_norm"]["bias"])
            sd[t + "1.fn.to_q.weight"] = np.transpose(np.asarray(layer["ca"]["to_q"]["w"]))
            sd[t + "1.fn.to_kv.weight"] = np.transpose(np.asarray(layer["ca"]["to_kv"]["w"]))
            for k, v in lin_t(layer["ca"]["proj"]).items():
                sd[t + f"1.fn.to_out.0.{k}"] = v
            sd[t + "2.norm.weight"] = np.asarray(layer["ff_norm"]["scale"])
            sd[t + "2.norm.bias"] = np.asarray(layer["ff_norm"]["bias"])
            for k, v in lin_t(layer["ff"]["fc1"]).items():
                sd[t + f"2.fn.net.0.{k}"] = v
            for k, v in lin_t(layer["ff"]["fc2"]).items():
                sd[t + f"2.fn.net.3.{k}"] = v

        r_vit = cv.convert_vit_state_dict(sd, "backbone.", depth=2)
        r_head = cv.convert_mano_head_state_dict(sd, "mano_head.", depth=2)

        for orig, restored in ((vit, r_vit), (head, r_head)):
            a = jax.tree_util.tree_leaves(orig)
            b = jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(jnp.asarray, restored))
            assert len(a) == len(b)
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_resize_pos_embed(self, rng):
        """Foreign-resolution pos-embed adapts bicubically to the runtime
        grid (reference get_abs_pos, hamer vit.py:26-57); same-grid input
        passes through bit-exact, cls slot preserved."""
        pos = rng.standard_normal((1, 1 + 14 * 14, 8)).astype(np.float32)
        same = cv.resize_pos_embed(pos, (14, 14))
        np.testing.assert_array_equal(same, pos)
        out = cv.resize_pos_embed(pos, (16, 12))
        assert out.shape == (1, 1 + 16 * 12, 8)
        np.testing.assert_array_equal(out[:, :1], pos[:, :1])
        # a constant embedding must resize to itself
        const = np.full((1, 1 + 14 * 14, 8), 3.5, np.float32)
        np.testing.assert_allclose(
            cv.resize_pos_embed(const, (16, 12))[:, 1:], 3.5, rtol=1e-5)
