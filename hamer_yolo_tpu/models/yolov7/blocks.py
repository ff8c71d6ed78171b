"""YOLOv7 building blocks as (init, apply) pure functions (NHWC).

Parity targets (reference yolo/yolov7/models/common.py):
- Conv = conv + BN + SiLU (:103); deploy form folds BN (fuseforward :113).
- MP = 2x2/2 max-pool (:34), SP = kxk/1 max-pool (:43).
- SPPCSPC cross-stage-partial SPP (:266-283).
- RepConv (:467-560): train-time 3x3+1x1+identity branches; deploy-time a
  single fused 3x3 conv+bias (+SiLU). Both forms and the fusion math are
  implemented (fuse happens at weight-conversion time).
- ImplicitA/M (:437-462) are fused into the Detect head convs at convert
  time (IDetect.fuse, models/yolo.py:186-198), so they exist here only in
  the training-form parameters.
- ReOrg (:52), Concat (:60), nearest-2x Upsample.

Everything is inference-BN-free where possible: the deploy graph is pure
conv+bias+SiLU, which XLA fuses into single HLO convolutions.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn

Params = Dict[str, Any]


def autopad(k: int) -> int:
    return k // 2


# --- Conv (+BN+SiLU). Deploy params: {"w", "b"}; train params add "bn". ---

def conv_block_init(key, c1: int, c2: int, k: int = 1, s: int = 1,
                    deploy: bool = True) -> Params:
    # s is not stored (params hold only arrays); pass it to conv_block.
    p: Params = {"conv": nn.conv_init(key, k, c1, c2, bias=deploy)}
    if not deploy:
        p["bn"] = nn.batch_norm_init(c2)
    return p


def conv_block(p: Params, x: jax.Array, s: int = 1, act: bool = True) -> jax.Array:
    """act: True = SiLU (the reference default), False = identity, or any
    callable from core/activations.py (the reference's swap-in zoo)."""
    w = p["conv"]["w"]
    k = (w["q"] if isinstance(w, dict) else w).shape[0]
    y = nn.conv2d(p["conv"], x, stride=s, padding=autopad(k))
    if "bn" in p:
        y = nn.batch_norm(p["bn"], y)
    if callable(act):
        return act(y)
    return jax.nn.silu(y) if act else y


def conv_block_train(p: Params, x: jax.Array, s: int = 1
                     ) -> Tuple[jax.Array, Params]:
    """Train-mode Conv+BN+SiLU: batch-stat BN, returns updated params."""
    k = p["conv"]["w"].shape[0]
    y = nn.conv2d(p["conv"], x, stride=s, padding=autopad(k))
    new_p = p
    if "bn" in p:
        y, new_bn = nn.batch_norm_train(p["bn"], y)
        new_p = dict(p, bn=new_bn)
    return jax.nn.silu(y), new_p


# --- Pooling / reshuffle ---

def mp(x: jax.Array, k: int = 2) -> jax.Array:
    return nn.max_pool(x, k, k)


def sp(x: jax.Array, k: int = 3, s: int = 1) -> jax.Array:
    return nn.max_pool(x, k, s, padding=k // 2)


def reorg(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C) space-to-depth.

    Channel order matches the reference's slice-concat
    (common.py:52: [::2,::2], [1::2,::2], [::2,1::2], [1::2,1::2]) but is
    formulated as reshape+transpose: on TPU the four strided slices of a
    lane-minor C=3 image each degenerate into scalar-ish gathers (~140 ms
    device at b32/1280² — 65%% of the whole w6 forward, profile_w6_r03),
    while the tiled transpose is plain bandwidth.
    """
    B, H, W, C = x.shape
    y = x.reshape(B, H // 2, 2, W // 2, 2, C)
    y = y.transpose(0, 1, 3, 4, 2, 5)  # (b, h2, w2, pw, ph, c)
    return y.reshape(B, H // 2, W // 2, 4 * C)


def reorg_conv_weight(w3: jax.Array) -> jax.Array:
    """Rearrange a (3, 3, 4C, O) conv weight that consumes ReOrg output
    into the equivalent (6, 6, C, O) stride-2 weight on the RAW image.

    ReOrg(x)[y, x', px*2C+py*C+c] = x[2y+py, 2x'+px, c], so a 3x3/s1 conv
    on the half-res 4C map is exactly a 6x6/s2 conv on the full-res C map
    with taps W6[2dy+py, 2dx+px, c] = W3[dy, dx, px*2C+py*C+c] and
    asymmetric padding (2, 3). Fusing skips materialising the 12-channel
    intermediate entirely (the C_in=12 conv is heavily lane-padded on
    TPU; the raw C=3 first-layer conv has dedicated XLA handling).
    """
    kh, kw, c4, o = w3.shape
    assert kh == 3 and kw == 3 and c4 % 4 == 0
    c = c4 // 4
    w = w3.reshape(3, 3, 2, 2, c, o)  # (dy, dx, px, py, c, o)
    w = w.transpose(0, 3, 1, 2, 4, 5)  # (dy, py, dx, px, c, o)
    return w.reshape(6, 6, c, o)


def reorg_conv_block(p: Params, x: jax.Array, act: bool = True) -> jax.Array:
    """conv_block(p, reorg(x)) computed as one 6x6/s2 conv on x.

    p must be a deploy/inference Conv whose weight is a plain (3,3,4C,O)
    array (int8-dict weights fall back to the unfused path in the model
    walk). BN/bias/activation act on output channels, so they apply
    unchanged.
    """
    conv = dict(p["conv"])
    conv["w"] = reorg_conv_weight(conv["w"])
    y = nn.conv2d(conv, x, stride=2, padding=((2, 3), (2, 3)))
    if "bn" in p:
        y = nn.batch_norm(p["bn"], y)
    if callable(act):
        return act(y)
    return jax.nn.silu(y) if act else y


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample."""
    B, H, W, C = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


# --- SPPCSPC ---

SPP_POOL_KS = (5, 9, 13)


def sppcspc_init(key, c1: int, c2: int, e: float = 0.5,
                 deploy: bool = True) -> Params:
    c_ = int(2 * c2 * e)
    keys = jax.random.split(key, 7)
    return {
        "cv1": conv_block_init(keys[0], c1, c_, 1, 1, deploy),
        "cv2": conv_block_init(keys[1], c1, c_, 1, 1, deploy),
        "cv3": conv_block_init(keys[2], c_, c_, 3, 1, deploy),
        "cv4": conv_block_init(keys[3], c_, c_, 1, 1, deploy),
        "cv5": conv_block_init(keys[4], 4 * c_, c_, 1, 1, deploy),
        "cv6": conv_block_init(keys[5], c_, c_, 3, 1, deploy),
        "cv7": conv_block_init(keys[6], 2 * c_, c2, 1, 1, deploy),
    }


def sppcspc(p: Params, x: jax.Array) -> jax.Array:
    x1 = conv_block(p["cv4"], conv_block(p["cv3"], conv_block(p["cv1"], x)))
    pools = [sp(x1, k) for k in SPP_POOL_KS]
    y1 = conv_block(p["cv6"], conv_block(p["cv5"], jnp.concatenate([x1] + pools, axis=-1)))
    y2 = conv_block(p["cv2"], x)
    return conv_block(p["cv7"], jnp.concatenate([y1, y2], axis=-1))


# --- RepConv ---

def repconv_init(key, c1: int, c2: int, s: int = 1, deploy: bool = True) -> Params:
    if deploy:
        return {"reparam": nn.conv_init(key, 3, c1, c2, bias=True)}
    k1, k2 = jax.random.split(key)
    p: Params = {
        "dense": nn.conv_init(k1, 3, c1, c2),
        "dense_bn": nn.batch_norm_init(c2),
        "1x1": nn.conv_init(k2, 1, c1, c2),
        "1x1_bn": nn.batch_norm_init(c2),
    }
    if c1 == c2 and s == 1:
        p["id_bn"] = nn.batch_norm_init(c1)
    return p


def repconv(p: Params, x: jax.Array, s: int = 1) -> jax.Array:
    if "reparam" in p:
        return jax.nn.silu(nn.conv2d(p["reparam"], x, stride=s, padding=1))
    y = nn.batch_norm(p["dense_bn"], nn.conv2d(p["dense"], x, stride=s, padding=1))
    y = y + nn.batch_norm(p["1x1_bn"], nn.conv2d(p["1x1"], x, stride=s, padding=0))
    if "id_bn" in p:
        y = y + nn.batch_norm(p["id_bn"], x)
    return jax.nn.silu(y)


def sppcspc_train(p: Params, x: jax.Array) -> Tuple[jax.Array, Params]:
    new_p = dict(p)
    x1, new_p["cv1"] = conv_block_train(p["cv1"], x)
    x1, new_p["cv3"] = conv_block_train(p["cv3"], x1)
    x1, new_p["cv4"] = conv_block_train(p["cv4"], x1)
    pools = [sp(x1, k) for k in SPP_POOL_KS]
    y1, new_p["cv5"] = conv_block_train(p["cv5"], jnp.concatenate([x1] + pools, -1))
    y1, new_p["cv6"] = conv_block_train(p["cv6"], y1)
    y2, new_p["cv2"] = conv_block_train(p["cv2"], x)
    out, new_p["cv7"] = conv_block_train(p["cv7"], jnp.concatenate([y1, y2], -1))
    return out, new_p


def repconv_train(p: Params, x: jax.Array, s: int = 1) -> Tuple[jax.Array, Params]:
    if "reparam" in p:
        return jax.nn.silu(nn.conv2d(p["reparam"], x, stride=s, padding=1)), p
    new_p = dict(p)
    y1, new_p["dense_bn"] = nn.batch_norm_train(
        p["dense_bn"], nn.conv2d(p["dense"], x, stride=s, padding=1))
    y2, new_p["1x1_bn"] = nn.batch_norm_train(
        p["1x1_bn"], nn.conv2d(p["1x1"], x, stride=s, padding=0))
    y = y1 + y2
    if "id_bn" in p:
        y3, new_p["id_bn"] = nn.batch_norm_train(p["id_bn"], x)
        y = y + y3
    return jax.nn.silu(y), new_p


def repconv_fuse(p: Params) -> Params:
    """Train-form RepConv -> deploy single 3x3 conv (RepConv fusion math)."""
    if "reparam" in p:
        return p
    dense = nn.fold_bn_into_conv({"w": p["dense"]["w"]}, p["dense_bn"])
    one = nn.fold_bn_into_conv({"w": p["1x1"]["w"]}, p["1x1_bn"])
    w = dense["w"] + jnp.pad(one["w"], ((1, 1), (1, 1), (0, 0), (0, 0)))
    b = dense["b"] + one["b"]
    if "id_bn" in p:
        c = p["dense"]["w"].shape[3]
        ident = jnp.zeros((3, 3, c, c)).at[1, 1].set(jnp.eye(c))
        idf = nn.fold_bn_into_conv({"w": ident}, p["id_bn"])
        w = w + idf["w"]
        b = b + idf["b"]
    return {"reparam": {"w": w, "b": b}}
