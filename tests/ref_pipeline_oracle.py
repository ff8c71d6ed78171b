"""Run the reference's COMPOSED pipeline in-process as a golden oracle.

This harness imports the reference's own code — `process_batch_manopara`
(/root/reference/hamer/infer.py:1223-1318) with its real `Detector`
(/root/reference/yolo/detector.py:23-153), real `HAMER` module
(/root/reference/hamer/hamer/models/hamer.py:19) and real `EstimateRGB`
(/root/reference/rootnet/Model_RGB.py:305) — builds RANDOM-weight torch
checkpoints in each model's NATIVE checkpoint format (yolov7 pickled-
module .pt consumed by attempt_load, HaMeR lightning `state_dict` .ckpt,
SAR {'network','rootnet'} .pth), runs the reference end to end on a real
image, and exposes the resulting per-image .npy hand dicts.

The composed-parity test (tests/test_pipeline_parity.py) then feeds the
SAME checkpoints through hamer_yolo_tpu.core.convert and asserts our
jitted pipeline reproduces the reference's saved npy MANO dicts.

Missing third-party deps are stubbed; stubs are either inert (GL /
profiling / export codepaths that the composed CPU pipeline never
executes) or faithful minimal re-implementations where the pipeline DOES
execute them:
  - torchvision.ops.nms          -> exact greedy NMS (torch)
  - torchvision.models.resnet34  -> torchvision-layout ResNet-34
  - torchvision.transforms       -> ToTensor/Normalize/Compose
  - timm.models.layers           -> to_2tuple/trunc_normal_/drop_path
  - yacs.config.CfgNode          -> minimal merge/freeze/attr-dict
  - pytorch_lightning            -> LightningModule + load_from_checkpoint
  - smplx MANOLayer              -> torch MANO LBS over assets/mano_right.npz
    (affects only pred_vertices/keypoints, which never reach the npy
    output; the npy comparison is therefore oracle-pure, and the LBS
    itself is separately golden-tested against the reference's own
    manopth in tests/test_reference_golden.py)

Hard-coded absolute paths inside the reference (`load_hamer`
models/__init__.py:45, mano_mean_params mano_head.py:53, sar_config
checkpoint) are redirected without editing the reference: numpy.load is
wrapped to remap the missing path, `load_hamer` is re-bound in the infer
module to the same 5 lines minus the hard-coded string, and the plain
Config objects are mutated (they are designed to be, config/*.py).
"""
from __future__ import annotations

import importlib
import importlib.util
import os
import sys
import types
from pathlib import Path

import numpy as np

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANO_NPZ = os.path.join(REPO, "assets", "mano_right.npz")

_MEAN_PARAMS_HARDPATH = "/home/pt/fbs/model/hamer/_DATA/data/mano_mean_params.npz"


def reference_available() -> bool:
    return os.path.exists(os.path.join(REF, "hamer", "infer.py"))


# ---------------------------------------------------------------------------
# stub construction
# ---------------------------------------------------------------------------

def _new_module(name: str, **attrs) -> types.ModuleType:
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    if "." in name:
        parent, leaf = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], leaf, mod)
    return mod


def _inert_module(name: str) -> types.ModuleType:
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__file__ = f"<stub {name}>"
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)

    def _getattr(attr, _n=name):
        if attr.startswith("__"):  # keep module introspection sane
            raise AttributeError(attr)
        return object

    mod.__getattr__ = _getattr  # PEP 562 catch-all
    sys.modules[name] = mod
    if "." in name:
        parent, leaf = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], leaf, mod)
    return mod


def _build_torchvision_stub():
    import torch
    import torch.nn as nn

    tv = _new_module("torchvision")

    # --- ops.nms: exact greedy NMS, torchvision semantics (keep iou <= thr,
    # descending score, stable tie-break by index) ---
    def nms(boxes: "torch.Tensor", scores: "torch.Tensor", iou_threshold: float):
        order = torch.argsort(scores, descending=True, stable=True)
        b = boxes[order]
        n = b.shape[0]
        x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        areas = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
        suppressed = torch.zeros(n, dtype=torch.bool)
        keep = []
        for i in range(n):
            if suppressed[i]:
                continue
            keep.append(order[i])
            if i + 1 >= n:
                break
            xx1 = torch.maximum(x1[i], x1[i + 1:])
            yy1 = torch.maximum(y1[i], y1[i + 1:])
            xx2 = torch.minimum(x2[i], x2[i + 1:])
            yy2 = torch.minimum(y2[i], y2[i + 1:])
            inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
            iou = inter / (areas[i] + areas[i + 1:] - inter)
            suppressed[i + 1:] |= iou > iou_threshold
        if not keep:
            return torch.zeros(0, dtype=torch.long)
        return torch.stack(keep)

    class _Dummy(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    ops = _new_module("torchvision.ops", nms=nms, DeformConv2d=_Dummy,
                      roi_pool=None, roi_align=None, ps_roi_pool=None,
                      ps_roi_align=None)
    tv.ops = ops

    # --- models.resnet34: torchvision-layout ResNet (BasicBlock) ---
    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, layers=(3, 4, 6, 3), num_classes=1000):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(64, layers[0])
            self.layer2 = self._make_layer(128, layers[1], stride=2)
            self.layer3 = self._make_layer(256, layers[2], stride=2)
            self.layer4 = self._make_layer(512, layers[3], stride=2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512, num_classes)

        def _make_layer(self, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes),
                )
            layers = [BasicBlock(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes
            for _ in range(1, blocks):
                layers.append(BasicBlock(self.inplanes, planes))
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(torch.flatten(self.avgpool(x), 1))

    def resnet34(pretrained=False, **kw):
        return ResNet((3, 4, 6, 3))

    def resnet18(pretrained=False, **kw):
        return ResNet((2, 2, 2, 2))

    def resnet50(pretrained=False, **kw):
        raise NotImplementedError("bottleneck resnets not stubbed")

    models = _new_module("torchvision.models", resnet34=resnet34,
                         resnet18=resnet18, resnet50=resnet50)
    tv.models = models

    # --- transforms: only what EstimateRGB uses ---
    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic)
            t = torch.from_numpy(arr.transpose(2, 0, 1).copy()).contiguous()
            if t.dtype == torch.uint8:
                t = t.float().div(255.0)
            return t.float()

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    transforms = _new_module("torchvision.transforms", ToTensor=ToTensor,
                             Normalize=Normalize, Compose=Compose)
    tv.transforms = transforms

    def _make_grid(t, *a, **k):
        return t[0] if hasattr(t, "__getitem__") else t

    utils = _new_module("torchvision.utils", save_image=lambda *a, **k: None,
                        make_grid=_make_grid)
    tv.utils = utils


def _build_timm_stub():
    import torch
    import torch.nn as nn

    def to_2tuple(x):
        return x if isinstance(x, (tuple, list)) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

    def drop_path(x, drop_prob=0.0, training=False):
        if drop_prob == 0.0 or not training:
            return x
        keep = 1 - drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
        return x.div(keep) * mask.floor_()

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return drop_path(x, self.drop_prob or 0.0, self.training)

    _new_module("timm")
    _new_module("timm.models")
    _new_module("timm.models.layers", to_2tuple=to_2tuple,
                trunc_normal_=trunc_normal_, drop_path=drop_path,
                DropPath=DropPath)
    _new_module("timm.models.registry", register_model=lambda f: f)


def _build_yacs_stub():
    import copy

    import yaml

    class CfgNode(dict):
        """Minimal yacs.config.CfgNode: attr access + yaml merge + freeze."""

        def __init__(self, init_dict=None, new_allowed=False):
            super().__init__()
            if init_dict:
                for k, v in init_dict.items():
                    self[k] = CfgNode(v) if isinstance(v, dict) else v

        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name)

        def __setattr__(self, name, value):
            self[name] = CfgNode(value) if isinstance(value, dict) and not isinstance(value, CfgNode) else value

        def merge_from_file(self, cfg_file):
            with open(cfg_file) as f:
                loaded = yaml.safe_load(f)
            self._merge(loaded or {})

        def _merge(self, other):
            for k, v in other.items():
                if isinstance(v, dict):
                    if not isinstance(self.get(k), CfgNode):
                        self[k] = CfgNode()
                    self[k]._merge(v)
                else:
                    self[k] = v

        def freeze(self):
            pass

        def defrost(self):
            pass

        def clone(self):
            return copy.deepcopy(self)

        def dump(self, **kw):
            def plain(d):
                return {k: plain(v) if isinstance(v, dict) else v
                        for k, v in d.items()}
            return yaml.safe_dump(plain(self))

    _new_module("yacs")
    _new_module("yacs.config", CfgNode=CfgNode)


def _build_lightning_stub():
    import torch
    import torch.nn as nn

    class LightningModule(nn.Module):
        @property
        def device(self):
            try:
                return next(self.parameters()).device
            except StopIteration:
                return torch.device("cpu")

        def save_hyperparameters(self, *a, **k):
            pass

        @classmethod
        def load_from_checkpoint(cls, checkpoint_path, strict=True,
                                 map_location="cpu", **kwargs):
            ckpt = torch.load(checkpoint_path, map_location="cpu",
                              weights_only=False)
            model = cls(**kwargs)
            model.load_state_dict(ckpt["state_dict"], strict=strict)
            return model

    class LightningDataModule:
        def __init__(self, *a, **k):
            pass

    pl = _new_module("pytorch_lightning", LightningModule=LightningModule,
                     LightningDataModule=LightningDataModule)
    _new_module("pytorch_lightning.utilities")
    _new_module("pytorch_lightning.utilities.rank_zero",
                rank_zero_only=lambda fn: fn)
    pl.utilities.rank_zero = sys.modules["pytorch_lightning.utilities.rank_zero"]


def _torch_mano_lbs(data, betas, rotmats):
    """smplx-convention MANO LBS in torch (meters, FK joints).

    Mirrors hamer_yolo_tpu.models.mano.lbs, which is golden-tested against
    the reference's own manopth ManoLayer (test_reference_golden.py).
    """
    import torch

    B = rotmats.shape[0]
    v_template = torch.from_numpy(data["v_template"]).float()
    shapedirs = torch.from_numpy(data["shapedirs"]).float()
    posedirs = torch.from_numpy(data["posedirs"]).float()
    J_regressor = torch.from_numpy(data["J_regressor"]).float()
    weights = torch.from_numpy(data["weights"]).float()
    parents = [int(p) for p in data["kintree_parents"]]

    nb = betas.shape[-1]
    v_shaped = v_template + torch.einsum("vds,bs->bvd", shapedirs[..., :nb], betas)
    j_rest = torch.einsum("jv,bvd->bjd", J_regressor, v_shaped)
    eye = torch.eye(3, dtype=rotmats.dtype)
    pose_feature = (rotmats[:, 1:] - eye).reshape(B, 135)
    v_posed = v_shaped + torch.einsum("vdp,bp->bvd", posedirs, pose_feature)

    transforms = [None] * 16
    transforms[0] = torch.cat([rotmats[:, 0], j_rest[:, 0, :, None]], dim=-1)
    for k in range(1, 16):
        p = parents[k]
        t_rel = j_rest[:, k] - j_rest[:, p]
        rel = torch.cat([rotmats[:, k], t_rel[:, :, None]], dim=-1)
        parent = transforms[p]
        rot = torch.einsum("bij,bjk->bik", parent[:, :, :3], rel[:, :, :3])
        tr = torch.einsum("bij,bj->bi", parent[:, :, :3], rel[:, :, 3]) + parent[:, :, 3]
        transforms[k] = torch.cat([rot, tr[:, :, None]], dim=-1)
    A = torch.stack(transforms, dim=1)
    joints = A[:, :, :, 3]
    t_skin = joints - torch.einsum("bkij,bkj->bki", A[:, :, :, :3], j_rest)
    R_blend = torch.einsum("vk,bkij->bvij", weights, A[:, :, :, :3])
    t_blend = torch.einsum("vk,bki->bvi", weights, t_skin)
    verts = torch.einsum("bvij,bvj->bvi", R_blend, v_posed) + t_blend
    return verts, joints


def _build_smplx_stub():
    import torch
    import torch.nn as nn

    smplx = _new_module("smplx")

    class MANOOutput:
        def __init__(self, vertices=None, joints=None, **kw):
            self.vertices = vertices
            self.joints = joints
            for k, v in kw.items():
                setattr(self, k, v)

    def to_tensor(array, dtype=None):
        return torch.tensor(array, dtype=dtype or torch.float32)

    def vertices2joints(J, vertices):
        return torch.einsum("jv,bvd->bjd", J, vertices)

    _new_module("smplx.utils", MANOOutput=MANOOutput, to_tensor=to_tensor)
    _new_module("smplx.lbs", vertices2joints=vertices2joints)
    # smplx vertex_ids['mano'] (fingertips), mano_wrapper.py:30
    _new_module("smplx.vertex_ids", vertex_ids={
        "mano": {"thumb": 744, "index": 320, "middle": 443,
                 "ring": 554, "pinky": 671},
    })

    class MANOLayer(nn.Module):
        def __init__(self, *args, **kwargs):
            super().__init__()
            data = np.load(MANO_NPZ, allow_pickle=True)
            self._data = {k: np.asarray(data[k]) for k in data.files}
            self.faces = self._data["f"].astype(np.int64)

        def forward(self, betas=None, global_orient=None, hand_pose=None,
                    pose2rot=False, **kwargs):
            B = betas.shape[0]
            rotmats = torch.cat([
                global_orient.reshape(B, 1, 3, 3),
                hand_pose.reshape(B, 15, 3, 3),
            ], dim=1)
            verts, joints = _torch_mano_lbs(self._data, betas.float(),
                                            rotmats.float())
            return MANOOutput(vertices=verts, joints=joints)

    smplx.MANOLayer = MANOLayer
    smplx.MANO = MANOLayer
    smplx.utils = sys.modules["smplx.utils"]
    smplx.lbs = sys.modules["smplx.lbs"]
    smplx.vertex_ids = sys.modules["smplx.vertex_ids"]


def _build_misc_stubs():
    # GL / viz / export / profiling deps never exercised by the composed
    # CPU pipeline.
    for name in ("pyrender", "trimesh", "open3d", "onnxruntime",
                 "webdataset", "chumpy", "braceexpand", "pytorch3d",
                 "pytorch3d.transforms"):
        if name not in sys.modules:
            _inert_module(name)

    if "plyfile" not in sys.modules:
        _new_module("plyfile", PlyData=object, PlyElement=object)

    if "line_profiler" not in sys.modules:
        class LineProfiler:
            def __init__(self, *a, **k):
                pass

            def __call__(self, fn):
                return fn

        _new_module("line_profiler", LineProfiler=LineProfiler,
                    profile=lambda fn: fn)

    if "skimage" not in sys.modules:
        from scipy import ndimage

        def gaussian(image, sigma=1.0, channel_axis=None,
                     preserve_range=False, **kw):
            out = np.empty_like(image, dtype=np.float64)
            if channel_axis is not None:
                for c in range(image.shape[channel_axis]):
                    idx = [slice(None)] * image.ndim
                    idx[channel_axis] = c
                    out[tuple(idx)] = ndimage.gaussian_filter(
                        image[tuple(idx)].astype(np.float64), sigma)
            else:
                out = ndimage.gaussian_filter(image.astype(np.float64), sigma)
            return out

        import cv2

        def rotate(image, angle, resize=False, preserve_range=False, **kw):
            h, w = image.shape[:2]
            M = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
            return cv2.warpAffine(np.asarray(image, np.float64), M, (w, h))

        def resize(image, output_shape, preserve_range=False, **kw):
            return cv2.resize(np.asarray(image, np.float64),
                              (output_shape[1], output_shape[0]),
                              interpolation=cv2.INTER_LINEAR)

        _new_module("skimage")
        _new_module("skimage.filters", gaussian=gaussian)
        _new_module("skimage.transform", rotate=rotate, resize=resize)


def _patch_numpy_load():
    """Redirect the reference's hard-coded mano_mean_params path
    (mano_head.py:53) to the file authored next to the hamer ckpt."""
    if getattr(np, "_hyt_load_patched", False):
        return
    orig = np.load

    def load(path, *a, **k):
        if isinstance(path, str) and path == _MEAN_PARAMS_HARDPATH:
            redirect = os.environ.get("HYT_MEAN_PARAMS_NPZ")
            if redirect:
                path = redirect
        return orig(path, *a, **k)

    np.load = load
    np._hyt_load_patched = True


# ---------------------------------------------------------------------------
# environment install + reference import
# ---------------------------------------------------------------------------

_env = {}


def install_reference_environment():
    """Install stubs + sys.path and import the reference pipeline modules.

    Returns a dict of live reference modules/classes. Idempotent.
    """
    if _env:
        return _env

    _build_torchvision_stub()
    _build_timm_stub()
    _build_yacs_stub()
    _build_lightning_stub()
    _build_smplx_stub()
    _build_misc_stubs()
    _patch_numpy_load()

    for p in (os.path.join(REF, "hamer"), os.path.join(REF, "yolo"), REF):
        if p not in sys.path:
            sys.path.insert(0, p)

    # chumpy-free MANO pkl loading for the reference's manopth chain
    # (manolayer.py:9); same injection as tests/test_reference_golden.py.
    from scipy import sparse

    from hamer_yolo_tpu.core.mano_assets import load_mano_pkl

    class _R:
        def __init__(self, a):
            self.r = a

    def ready_arguments(path, posekey4vposed="pose"):
        side = "LEFT" if "LEFT" in os.path.basename(str(path)).upper() else "RIGHT"
        real = os.path.join(REF, "rootnet", "KeypointFusion", "MANO",
                            f"MANO_{side}.pkl")
        d = load_mano_pkl(real)
        parents = d["kintree_parents"].astype(np.int64)
        kintree = np.stack([parents, np.arange(16)])
        return {
            "betas": _R(np.zeros(d["shapedirs"].shape[-1], np.float32)),
            "shapedirs": _R(d["shapedirs"]),
            "posedirs": _R(d["posedirs"]),
            "v_template": _R(d["v_template"]),
            "weights": _R(d["weights"]),
            "J_regressor": sparse.csc_matrix(d["J_regressor"]),
            "f": d["f"],
            "kintree_table": kintree,
            "hands_components": d["hands_components"],
            "hands_mean": d["hands_mean"],
            "hands_coeffs": d.get("hands_coeffs"),
        }

    _new_module(
        "rootnet.KeypointFusion.manopth.mano.webuser.smpl_handpca_wrapper_HAND_only",
        ready_arguments=ready_arguments)

    # `model.rootnet` alias used by infer.py ("from model.rootnet.Model_RGB
    # import get_model"); pre-seed so only ONE copy of Model_RGB exists.
    rootnet_model_rgb = importlib.import_module("rootnet.Model_RGB")
    model_pkg = types.ModuleType("model")
    model_pkg.__path__ = []
    sys.modules.setdefault("model", model_pkg)
    sys.modules["model.rootnet"] = sys.modules["rootnet"]
    sys.modules["model.rootnet.Model_RGB"] = rootnet_model_rgb

    # import the pipeline pieces
    ref_yolo_models = importlib.import_module("yolov7.models.yolo")
    ref_detector = importlib.import_module("yolo.detector")
    yolo_config = importlib.import_module("config.yolo_config")
    hamer_config = importlib.import_module("config.hamer_config")
    hamer_models = importlib.import_module("hamer.models")
    sar_config = importlib.import_module("rootnet.sar_config_stage_1")

    spec = importlib.util.spec_from_file_location(
        "ref_infer", os.path.join(REF, "hamer", "infer.py"))
    ref_infer = importlib.util.module_from_spec(spec)
    sys.modules["ref_infer"] = ref_infer
    spec.loader.exec_module(ref_infer)

    _env.update(dict(
        infer=ref_infer,
        detector_mod=ref_detector,
        yolo_models=ref_yolo_models,
        yolo_opt=yolo_config.yolo_opt,
        hamer_opt=hamer_config.hamer_opt,
        hamer_models=hamer_models,
        rgb_opt=sar_config.rgb_opt,
        model_rgb=rootnet_model_rgb,
    ))
    return _env


# ---------------------------------------------------------------------------
# random-weight checkpoints in the reference's native formats
# ---------------------------------------------------------------------------

HAMER_MODEL_CONFIG_YAML = """\
MODEL:
  IMAGE_SIZE: 256
  IMAGE_MEAN: [0.485, 0.456, 0.406]
  IMAGE_STD: [0.229, 0.224, 0.225]
  BACKBONE:
    TYPE: vit
  MANO_HEAD:
    TYPE: transformer_decoder
    IN_CHANNELS: 2048
    TRANSFORMER_DECODER:
      depth: 6
      heads: 8
      mlp_dim: 1024
      dim_head: 64
      dropout: 0.0
      emb_dropout: 0.0
      norm: layer
      context_dim: 1280
MANO:
  DATA_DIR: _DATA/data/
  MODEL_PATH: ./mano
  GENDER: neutral
  NUM_HAND_JOINTS: 15
  MEAN_PARAMS: ./mano_mean_params.npz
  CREATE_BODY_POSE: false
EXTRA:
  FOCAL_LENGTH: 5000
LOSS_WEIGHTS:
  ADVERSARIAL: 0
"""


def install_kpfusion_environment():
    """Make the reference's KeypointFusion package importable.

    Its modules import through a `software.KeypointFusion.*` namespace
    (the repo layout on the authors' machine); alias it onto
    /root/reference/rootnet/KeypointFusion, stub the CUDA pointnet2 ops
    with a pure-torch QueryAndGroup (ball query + grouping, exactly the
    _ext semantics), and pre-seed the chumpy-needing webuser module.
    """
    install_reference_environment()
    if "software" in sys.modules:
        return

    import torch

    # the KeypointFusion code hard-codes .cuda() on tensors/modules
    # (TR_Encoder.forward, decoders); make it a no-op on this CPU host.
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    soft = types.ModuleType("software")
    soft.__path__ = []
    sys.modules["software"] = soft
    kpf = types.ModuleType("software.KeypointFusion")
    kpf.__path__ = [os.path.join(REF, "rootnet", "KeypointFusion")]
    sys.modules["software.KeypointFusion"] = kpf
    soft.KeypointFusion = kpf

    # pure-torch QueryAndGroup matching pointnet2_ops semantics
    class QueryAndGroup(torch.nn.Module):
        def __init__(self, radius, nsample, use_xyz=True):
            super().__init__()
            self.radius, self.nsample, self.use_xyz = radius, nsample, use_xyz

        def forward(self, xyz, new_xyz, features=None):
            B, N, _ = xyz.shape
            S = new_xyz.shape[1]
            d2 = torch.cdist(new_xyz, xyz) ** 2              # (B, S, N)
            inside = d2 < self.radius ** 2                   # strict, _ext parity
            # ball_query: first nsample indices inside the radius; missing
            # slots replicate the first found; none found -> index 0
            arange = torch.arange(N).view(1, 1, N).expand(inside.shape)
            big = torch.where(inside, arange, torch.full_like(arange, N))
            order, _ = torch.sort(big, dim=-1)
            order = order[:, :, :self.nsample]
            first = order[:, :, :1].expand_as(order)
            idx = torch.where(order >= N, first, order)
            idx = torch.where(idx >= N, torch.zeros_like(idx), idx)
            grouped_xyz = torch.gather(
                xyz.unsqueeze(1).expand(B, S, N, 3), 2,
                idx.unsqueeze(-1).expand(B, S, self.nsample, 3))
            grouped_xyz = (grouped_xyz - new_xyz.unsqueeze(2)).permute(0, 3, 1, 2)
            if features is not None:
                C = features.shape[1]
                grouped_feat = torch.gather(
                    features.unsqueeze(2).expand(B, C, S, N), 3,
                    idx.unsqueeze(1).expand(B, C, S, self.nsample))
                if self.use_xyz:
                    return torch.cat([grouped_xyz, grouped_feat], dim=1)
                return grouped_feat
            return grouped_xyz

    pn_base = "software.KeypointFusion.pointNet"
    _new_module(pn_base)
    _new_module(pn_base + ".pointnet2_ops_lib")
    _new_module(pn_base + ".pointnet2_ops_lib.pointnet2_ops")
    _new_module(pn_base + ".pointnet2_ops_lib.pointnet2_ops.pointnet2_utils",
                QueryAndGroup=QueryAndGroup)

    # chumpy-needing MANO loader used by the dataloader package
    _new_module(
        "software.KeypointFusion.dataloader.webuser.smpl_handpca_wrapper_HAND_only",
        load_model=lambda *a, **k: None)


def install_pointnet_zoo_environment():
    """Make the reference's pointNet MODEL ZOO importable on CPU.

    Extends the kpfusion stubs: pointnet2_utils gains torch
    implementations of the remaining _ext ops (furthest_point_sample,
    gather_operation, three_nn, three_interpolate, GroupAll — same
    semantics as the numpy oracles in tests/test_pointnet.py), then the
    reference's OWN pointnet2_modules.py / point2_ssg_cls.py /
    point2_ssg_sem.py / DGCNN.py are imported unmodified. Returns the
    zoo modules.
    """
    install_kpfusion_environment()
    if "_zoo" in _env:
        return _env["_zoo"]

    import torch

    pn_base = "software.KeypointFusion.pointNet"
    utils_mod = sys.modules[pn_base + ".pointnet2_ops_lib.pointnet2_ops"
                            + ".pointnet2_utils"]

    def _sqdist(a, b):
        # exact diff^2 form (matches ops/pointnet.pairwise_sqdist, NOT
        # the mm-based cdist which differs in float rounding)
        diff = a[:, :, None, :] - b[:, None, :, :]
        return (diff * diff).sum(-1)

    def furthest_point_sample(xyz, npoint):
        B, N, _ = xyz.shape
        idx = torch.zeros(B, npoint, dtype=torch.long)
        dist = torch.full((B, N), 1e10)
        last = torch.zeros(B, dtype=torch.long)
        for i in range(npoint):
            idx[:, i] = last
            sel = xyz[torch.arange(B), last][:, None]
            d = ((xyz - sel) ** 2).sum(-1)
            dist = torch.minimum(dist, d)
            last = dist.argmax(-1)
        return idx.int()

    def gather_operation(features, idx):
        B, C, _ = features.shape
        S = idx.shape[1]
        return torch.gather(
            features, 2, idx.long().unsqueeze(1).expand(B, C, S))

    def three_nn(unknown, known):
        d2 = _sqdist(unknown, known)
        dist2, idx = torch.topk(d2, 3, dim=-1, largest=False)
        return torch.sqrt(torch.clamp(dist2, min=0.0)), idx.int()

    def three_interpolate(feats, idx, weight):
        B, C, _ = feats.shape
        n = idx.shape[1]
        gathered = torch.gather(
            feats.unsqueeze(2).expand(B, C, n, feats.shape[2]), 3,
            idx.long().unsqueeze(1).expand(B, C, n, 3))
        return (gathered * weight.unsqueeze(1)).sum(-1)

    class GroupAll(torch.nn.Module):
        def __init__(self, use_xyz=True):
            super().__init__()
            self.use_xyz = use_xyz

        def forward(self, xyz, new_xyz, features=None):
            grouped_xyz = xyz.transpose(1, 2).unsqueeze(2)  # (B,3,1,N)
            if features is not None:
                grouped_features = features.unsqueeze(2)
                if self.use_xyz:
                    return torch.cat([grouped_xyz, grouped_features], dim=1)
                return grouped_features
            return grouped_xyz

    utils_mod.furthest_point_sample = furthest_point_sample
    utils_mod.gather_operation = gather_operation
    utils_mod.three_nn = three_nn
    utils_mod.three_interpolate = three_interpolate
    utils_mod.GroupAll = GroupAll

    pdir = os.path.join(REF, "rootnet", "KeypointFusion", "pointNet")

    def _load(modname, fname):
        spec = importlib.util.spec_from_file_location(
            modname, os.path.join(pdir, fname))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[modname] = mod
        spec.loader.exec_module(mod)
        return mod

    # the reference's own SA/FP module file (build_shared_mlp etc.)
    modules_mod = _load("pointnet2_ops.pointnet2_modules",
                        os.path.join("pointnet2_ops_lib", "pointnet2_ops",
                                     "pointnet2_modules.py"))
    ops_pkg = _new_module("pointnet2_ops")
    ops_pkg.pointnet2_modules = modules_mod
    ops_pkg.pointnet2_utils = utils_mod
    sys.modules["pointnet2_ops.pointnet2_utils"] = utils_mod

    # `pointNet` package alias (point2_ssg_sem imports through it)
    pkg = types.ModuleType("pointNet")
    pkg.__path__ = [pdir]
    sys.modules["pointNet"] = pkg

    cls_mod = _load("pointNet.point2_ssg_cls", "point2_ssg_cls.py")
    pkg.point2_ssg_cls = cls_mod
    sem_mod = _load("pointNet.point2_ssg_sem", "point2_ssg_sem.py")
    dgcnn_mod = _load("pointNet.DGCNN", "DGCNN.py")

    # get_graph_feature hard-codes device('cuda') (DGCNN.py:39); rebind
    # a faithful CPU copy of the same math (knn -> flat gather -> cat)
    def get_graph_feature_cpu(x, k=20, idx=None, dim9=False):
        batch_size = x.size(0)
        num_points = x.size(2)
        x = x.view(batch_size, -1, num_points)
        if idx is None:
            idx = dgcnn_mod.knn(x if not dim9 else x[:, 6:], k=k)
        idx_base = torch.arange(
            0, batch_size, device=x.device).view(-1, 1, 1) * num_points
        idx = (idx + idx_base).view(-1)
        _, num_dims, _ = x.size()
        x = x.transpose(2, 1).contiguous()
        feature = x.view(batch_size * num_points, -1)[idx, :]
        feature = feature.view(batch_size, num_points, k, num_dims)
        x = x.view(batch_size, num_points, 1, num_dims).repeat(1, 1, k, 1)
        return torch.cat((feature - x, x), dim=3).permute(
            0, 3, 1, 2).contiguous()

    dgcnn_mod.get_graph_feature = get_graph_feature_cpu

    # the second utils flavor (pure torch, pointNet/pointnet2_utils.py)
    # and the part-seg / MSG-large models built on it
    utils2_mod = _load("pointNet.pointnet2_utils", "pointnet2_utils.py")
    pkg.pointnet2_utils = utils2_mod
    part_mod = _load("pointNet.pointnet2_part_seg_ssg",
                     "pointnet2_part_seg_ssg.py")

    pointmlp_mod = _load("pointNet.pointMLP", "pointMLP.py")

    _env["_zoo"] = dict(cls=cls_mod, sem=sem_mod, dgcnn=dgcnn_mod,
                        part=part_mod, utils2=utils2_mod,
                        pointmlp=pointmlp_mod)
    return _env["_zoo"]


class pinned_fps_start:
    """Pin the yanx27 farthest_point_sample's torch.randint seed draw
    (pointNet/pointnet2_utils.py:75) to index 0 — the CUDA kernel's (and
    our ops/pointnet) deterministic convention — for oracle runs."""

    def __enter__(self):
        import torch

        self._orig = torch.randint

        def zero_randint(low, high=None, size=None, **kw):
            if size is None:  # randint(high, size) form
                low, high, size = 0, low, high
            kw.setdefault("dtype", torch.long)
            device = kw.pop("device", None)
            t = torch.zeros(size, dtype=kw["dtype"])
            return t.to(device) if device is not None else t

        import torch as _t

        _t.randint = zero_randint
        return self

    def __exit__(self, *exc):
        import torch

        torch.randint = self._orig
        return False


def load_model_rgbd_module():
    """Import the reference's Model_RGBD.py (Model_RGBD.py:1-680).

    It was written to run with cwd=KeypointFusion, importing top-level
    `config` / `util` / `dataloader` / `model.model`; those names collide
    with the pipeline packages already on sys.path, so alias them
    explicitly before loading the file by path.
    """
    install_kpfusion_environment()
    if "ref_model_rgbd" in sys.modules:
        return sys.modules["ref_model_rgbd"]

    kpf_dir = os.path.join(REF, "rootnet", "KeypointFusion")

    # `from config import opt` -> attach KeypointFusion/config.py's opt to
    # the existing top-level config namespace package.
    spec = importlib.util.spec_from_file_location(
        "kpf_config", os.path.join(kpf_dir, "config.py"))
    kpf_config = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(kpf_config)
    sys.modules["config"].opt = kpf_config.opt if hasattr(kpf_config, "opt") \
        else kpf_config.Config()

    # `from util import vis_tool` / `from dataloader...` / `from model.model`
    util_pkg = types.ModuleType("util")
    util_pkg.__path__ = [os.path.join(kpf_dir, "util")]
    sys.modules.setdefault("util", util_pkg)
    dl_pkg = types.ModuleType("dataloader")
    dl_pkg.__path__ = [os.path.join(kpf_dir, "dataloader")]
    sys.modules.setdefault("dataloader", dl_pkg)
    mm = importlib.import_module("software.KeypointFusion.model.model")
    sys.modules["model.model"] = mm

    spec = importlib.util.spec_from_file_location(
        "ref_model_rgbd", os.path.join(kpf_dir, "Model_RGBD.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_model_rgbd"] = mod
    spec.loader.exec_module(mod)
    return mod


DEFAULT_CALIBRATION_IMAGE = os.path.join(REF, "hamer", "example_data",
                                         "test1.jpg")


def _liven_random_detector(model, calibration_image: str):
    """Make a RANDOM-weight yolov7 produce usable, well-separated peaks.

    An untrained 106-layer SiLU net in eval mode is spatially dead: with
    init-time BN running stats (mean 0, var 1) every BN is an identity,
    torch's default conv init underscales, and the activations decay to
    exactly zero by ~layer 30, leaving bias-driven constant confidence
    plateaus (ties make NMS ordering ill-defined across frameworks).

    Fix: BN CALIBRATION — one train-mode forward on a real image with
    momentum=1 writes the observed batch statistics into every BN's
    running buffers, after which eval-mode BN actually normalizes each
    layer and the random features propagate end to end (measured: spatial
    std ~0.6 at every depth, confidence peaks 0.52/0.42/0.31 distinct).
    If the peaks still miss the 0.25 threshold, nudge the detect biases
    (the reference's _initialize_biases puts the obj logit at ~-8).
    """
    import cv2
    import torch

    img = cv2.imread(calibration_image)
    assert img is not None, calibration_image
    # same letterbox the Detector applies (LoadImage/process_img)
    from yolo.yolov7.utils.datasets import letterbox  # type: ignore

    lb = letterbox(img, 640, stride=32)[0]
    x = torch.from_numpy(lb[:, :, ::-1].transpose(2, 0, 1).copy()).float()
    x = (x / 255.0)[None]

    model.train()
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.momentum = 1.0
    with torch.no_grad():
        model(x)
    model.eval()

    det = model.model[-1]

    # Shape the wh channels: random wh logits decode to degenerate boxes
    # (e.g. 1-px slivers that the reference's process_bbox rejects).
    # Damp their spatial variation and bias toward sigma~0.6 so every
    # detection is roughly anchor-sized.
    with torch.no_grad():
        for mi in det.m:
            w_v = mi.weight.view(det.na, -1, *mi.weight.shape[1:])
            b_v = mi.bias.view(det.na, -1)
            w_v[:, 2:4] *= 0.2
            b_v[:, 2:4] = 0.3

    def peak_stats():
        with torch.no_grad():
            pred = model(x)[0][0]
        q = (pred[:, 4:5] * pred[:, 5:]).reshape(-1)
        top = torch.topk(q, 12).values
        return float(top[0]), int((q > 0.25).sum()), top

    for _ in range(40):
        best, n_above, top = peak_stats()
        if best > 0.45 and n_above >= 2:
            break
        with torch.no_grad():
            for mi in det.m:
                b = mi.bias.view(det.na, -1)
                b[:, 4] += 0.25
    best, n_above, top = peak_stats()
    # distinct peak values => deterministic NMS ordering on both sides
    assert best > 0.3, f"random detector never fired (best conf {best})"
    assert n_above < 5000, f"degenerate plateau: {n_above} above threshold"
    assert float(top[0] - top[11]) > 1e-4, f"tied peaks: {top}"

    # Pick a confidence threshold in the WIDEST gap of the candidate
    # distribution so sub-pixel preprocessing noise (device letterbox vs
    # cv2 fixed-point resize) cannot flip a borderline candidate across
    # the threshold on one side only.
    t = top.numpy()
    gaps = t[:-1] - t[1:]
    gi = int(np.argmax(gaps[:6]))
    conf_thres = float((t[gi] + t[gi + 1]) / 2.0)
    assert gaps[gi] > 0.01, f"no safe threshold gap in peaks {t}"
    return conf_thres


def make_checkpoints(out_dir: str, seed: int = 0,
                     calibration_image: str = DEFAULT_CALIBRATION_IMAGE) -> dict:
    """Build the three random-weight checkpoints in native formats.

    Returns {"yolo": path, "hamer": path, "model_cfg": path, "sar": path}.
    Paths are all-lowercase (attempt_download lowercases, google_utils:21).
    """
    import torch

    env = install_reference_environment()
    out = Path(out_dir)
    (out / "checkpoints").mkdir(parents=True, exist_ok=True)

    torch.manual_seed(seed)

    # --- mean params npz (identity 6d pose, zero shape, sane cam scale) ---
    pose6d = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 16)
    mean_npz = out / "mano_mean_params.npz"
    np.savez(mean_npz, pose=pose6d, shape=np.zeros(10, np.float32),
             cam=np.array([0.9, 0.0, 0.0], np.float32))
    os.environ["HYT_MEAN_PARAMS_NPZ"] = str(mean_npz)

    # --- yolov7: training-form Model from the reference's own cfg yaml,
    # saved the way train.py saves ckpts ({'model': nn.Module}) ---
    yolo_path = out / "checkpoints" / "yolov7_best.pt"
    meta_path = out / "oracle_meta.json"
    if not yolo_path.exists():
        import json

        Model = env["yolo_models"].Model
        cfg_yaml = os.path.join(REF, "yolo", "yolov7", "cfg", "training",
                                "yolov7.yaml")
        model = Model(cfg_yaml, ch=3, nc=3)
        model.names = ["hand0", "right", "hand2"]
        conf_thres = _liven_random_detector(model, calibration_image)
        # real ckpts store the EMA copy, which has requires_grad=False
        # (torch_utils.ModelEMA); IDetect.fuse relies on that.
        for p in model.parameters():
            p.requires_grad_(False)
        torch.save({"model": model.float(), "epoch": -1}, str(yolo_path))
        meta_path.write_text(json.dumps({"conf_thres": conf_thres}))

    # --- hamer: lightning-style ckpt with a full-size random HAMER ---
    hamer_path = out / "checkpoints" / "hamer.ckpt"
    model_cfg_path = out / "model_config.yaml"
    if not model_cfg_path.exists():
        model_cfg_path.write_text(HAMER_MODEL_CONFIG_YAML)
    if not hamer_path.exists():
        from hamer.configs import get_config  # type: ignore

        cfg = get_config(str(model_cfg_path), update_cachedir=False)
        if "BBOX_SHAPE" not in cfg.MODEL:
            cfg.MODEL.BBOX_SHAPE = [192, 256]
        torch.manual_seed(seed + 1)
        hamer_model = env["hamer_models"].HAMER(cfg=cfg)
        sd = {k: v for k, v in hamer_model.state_dict().items()}
        torch.save({"state_dict": sd}, str(hamer_path))
        del hamer_model

    # --- SAR: {'network','rootnet'} dict like SAR-resnet34-Root.pth ---
    sar_path = out / "checkpoints" / "sar-resnet34-root.pth"
    if not sar_path.exists():
        SAR = env["model_rgb"].SAR
        ResRootNet = env["model_rgb"].ResRootNet
        torch.manual_seed(seed + 2)
        sar = SAR("resnet34", in_channels=512)
        rootnet = ResRootNet(inplanes=512)
        torch.save({"network": sar.state_dict(),
                    "rootnet": rootnet.state_dict()}, str(sar_path))

    import json

    meta = json.loads(meta_path.read_text())
    return {"yolo": str(yolo_path), "hamer": str(hamer_path),
            "model_cfg": str(model_cfg_path), "sar": str(sar_path),
            "mean_params": str(mean_npz),
            "conf_thres": float(meta["conf_thres"])}


# ---------------------------------------------------------------------------
# run the reference composed pipeline
# ---------------------------------------------------------------------------

def run_reference_pipeline(ckpts: dict, input_dir: str, output_dir: str,
                           K: np.ndarray, conf_thres: float = 0.25) -> dict:
    """Point the reference's config objects at `ckpts`, then execute
    process_batch_manopara on `input_dir`. Returns {image_stem: npy dict}.
    """
    env = install_reference_environment()
    infer = env["infer"]

    # pipeline config objects are plain mutable classes (config/*.py)
    env["yolo_opt"].weights = ckpts["yolo"]
    env["yolo_opt"].device = "cpu"
    env["yolo_opt"].conf_thres = conf_thres
    env["hamer_opt"].ckpt_path = ckpts["hamer"]
    env["hamer_opt"].use_onnx = False
    env["rgb_opt"].checkpoint = ckpts["sar"]

    os.environ["HYT_MEAN_PARAMS_NPZ"] = ckpts["mean_params"]

    # load_hamer (models/__init__.py:32-47) hard-codes its checkpoint path
    # at :45; re-bind the same logic minus that line.
    def load_hamer_redirected(checkpoint_path):
        from hamer.configs import get_config  # type: ignore

        model_cfg = str(Path(checkpoint_path).parent.parent / "model_config.yaml")
        cfg = get_config(model_cfg, update_cachedir=False)
        if cfg.MODEL.BACKBONE.TYPE == "vit" and "BBOX_SHAPE" not in cfg.MODEL:
            cfg.defrost()
            cfg.MODEL.BBOX_SHAPE = [192, 256]
            cfg.freeze()
        model = env["hamer_models"].HAMER.load_from_checkpoint(
            checkpoint_path, strict=False, cfg=cfg)
        return model, cfg

    orig_load_hamer = infer.load_hamer
    infer.load_hamer = load_hamer_redirected
    try:
        infer.process_batch_manopara(input_dir, output_dir, k_real=K)
    finally:
        infer.load_hamer = orig_load_hamer

    results = {}
    for f in sorted(os.listdir(output_dir)):
        if f.endswith(".npy"):
            results[f[:-4]] = np.load(os.path.join(output_dir, f),
                                      allow_pickle=True).item()
    return results


def shared_pipeline_checkpoints(tmp_path_factory):
    """Session-cached 640x448 test frame + native random-weight
    checkpoints (seed 0) + our converted params — built ONCE and reused
    by every composed-oracle module (suite-time hygiene: the full-size
    HAMER random init + conversion costs minutes)."""
    if "_shared_ck" in _env:
        return _env["_shared_ck"]
    import cv2

    base = tmp_path_factory.mktemp("shared_ck")
    input_dir = base / "input"
    input_dir.mkdir()
    img_full = cv2.imread(os.path.join(REF, "hamer", "example_data",
                                       "test1.jpg"))
    img_640 = cv2.resize(img_full, (640, 448), interpolation=cv2.INTER_AREA)
    cv2.imwrite(str(input_dir / "test1.png"), img_640)
    ck = make_checkpoints(str(base), seed=0,
                          calibration_image=str(input_dir / "test1.png"))
    _env["_shared_ck"] = dict(base=base, ck=ck, input_dir=str(input_dir),
                              img=cv2.imread(str(input_dir / "test1.png")))
    return _env["_shared_ck"]


def shared_converted_stack():
    """Our converted params + mano + f32 PipelineConfig for the shared
    checkpoints (cached alongside them)."""
    if "_shared_stack" in _env:
        return _env["_shared_stack"]
    if "_shared_ck" not in _env:
        raise RuntimeError("call shared_pipeline_checkpoints first")
    from dataclasses import replace

    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.core.convert import convert_pipeline_checkpoints
    from hamer_yolo_tpu.core.mano_assets import load_mano_model
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.pipeline.frame import PipelineConfig

    ck = _env["_shared_ck"]["ck"]
    mano = ManoModel.from_arrays(load_mano_model("right"))
    params = convert_pipeline_checkpoints(
        ck["yolo"], ck["hamer"], ck["sar"],
        template=np.asarray(mano.v_template))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    base = PipelineConfig(max_hands=4)
    cfg = replace(
        base,
        conf_thres=ck["conf_thres"],
        yolo=replace(base.yolo, nc=3, compute_dtype="float32"),
        hamer=replace(base.hamer,
                      vit=replace(base.hamer.vit, compute_dtype="float32")),
        sar=replace(base.sar, compute_dtype="float32"),
    )
    _env["_shared_stack"] = dict(params=params, mano=mano, cfg=cfg)
    return _env["_shared_stack"]


class _redirect_load_hamer:
    """Context manager: re-bind a reference infer-style module's
    load_hamer to the same logic minus the hard-coded checkpoint path
    (models/__init__.py:45)."""

    def __init__(self, infer_mod):
        self.mod = infer_mod

    def __enter__(self):
        env = install_reference_environment()

        def load_hamer_redirected(checkpoint_path):
            from hamer.configs import get_config  # type: ignore

            model_cfg = str(Path(checkpoint_path).parent.parent
                            / "model_config.yaml")
            cfg = get_config(model_cfg, update_cachedir=False)
            if cfg.MODEL.BACKBONE.TYPE == "vit" and \
                    "BBOX_SHAPE" not in cfg.MODEL:
                cfg.defrost()
                cfg.MODEL.BBOX_SHAPE = [192, 256]
                cfg.freeze()
            model = env["hamer_models"].HAMER.load_from_checkpoint(
                checkpoint_path, strict=False, cfg=cfg)
            return model, cfg

        self.orig = self.mod.load_hamer
        self.mod.load_hamer = load_hamer_redirected
        return self.mod

    def __exit__(self, *exc):
        self.mod.load_hamer = self.orig
        return False


def run_reference_mask_pipeline(ckpts: dict, input_dir: str, mask_dir: str,
                                output_dir: str,
                                intrinsics_path: str) -> dict:
    """Execute process_batch_manopara_with_mask (infer.py:1099-1220):
    bbox from mask pixels == 3, detector bypassed, right hand only."""
    env = install_reference_environment()
    infer = env["infer"]
    env["hamer_opt"].ckpt_path = ckpts["hamer"]
    env["hamer_opt"].use_onnx = False
    os.environ["HYT_MEAN_PARAMS_NPZ"] = ckpts["mean_params"]
    with _redirect_load_hamer(infer):
        infer.process_batch_manopara_with_mask(
            input_dir, mask_dir, output_dir, intrinsics_path)
    results = {}
    for f in sorted(os.listdir(output_dir)):
        if f.endswith(".npy"):
            results[f[:-4]] = np.load(os.path.join(output_dir, f),
                                      allow_pickle=True).item()
    return results


def install_d_infer():
    """Load the reference's depth-refined CLI module (hamer/d_infer.py)."""
    install_reference_environment()
    if "d_infer" not in _env:
        spec = importlib.util.spec_from_file_location(
            "ref_d_infer", os.path.join(REF, "hamer", "d_infer.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_d_infer"] = mod
        spec.loader.exec_module(mod)
        _env["d_infer"] = mod
    return _env["d_infer"]


def _write_obj_file(path, vertices, faces):
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]:.8f} {v[1]:.8f} {v[2]:.8f}\n")
        for tri in faces:
            f.write(f"f {int(tri[0]) + 1} {int(tri[1]) + 1} "
                    f"{int(tri[2]) + 1}\n")


def read_obj_file(path):
    """Parse v/f lines -> (vertices (N,3) f64, faces (M,3) int 0-based)."""
    vs, fs = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                vs.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                fs.append([int(p.split("/")[0]) - 1 for p in parts[1:4]])
    return np.asarray(vs, np.float64), np.asarray(fs, np.int64)


def _upgrade_trimesh_stub():
    """Swap the inert trimesh stub for a minimal FUNCTIONAL one so the
    reference's reconstruct_and_save_obj_with_wrapper (infer.py:1321)
    writes real OBJ files (Trimesh + util.concatenate + .export)."""
    tm = sys.modules.get("trimesh")
    if tm is None:
        tm = _new_module("trimesh")
    # __dict__ check, NOT getattr: the inert stub's PEP 562 catch-all
    # returns a truthy object for ANY attribute
    if "_hyt_functional" in tm.__dict__:
        return tm

    class _Visual:
        def __init__(self):
            self.vertex_colors = None

    class Trimesh:
        def __init__(self, vertices, faces, process=False):
            self.vertices = np.asarray(vertices, np.float64)
            self.faces = np.asarray(faces, np.int64)
            self.visual = _Visual()

        def export(self, path):
            _write_obj_file(path, self.vertices, self.faces)

    def concatenate(meshes):
        vs, fs, off = [], [], 0
        for m in meshes:
            vs.append(m.vertices)
            fs.append(m.faces + off)
            off += len(m.vertices)
        return Trimesh(np.concatenate(vs, 0), np.concatenate(fs, 0))

    util = types.ModuleType("trimesh.util")
    util.concatenate = concatenate
    tm.Trimesh = Trimesh
    tm.util = util
    tm._hyt_functional = True
    sys.modules["trimesh.util"] = util
    return tm


def run_reference_reconstruct(npy_dir: str, obj_dir: str) -> dict:
    """Execute reconstruct_and_save_obj_with_wrapper (infer.py:1321-1436)
    on saved npy dicts; returns {stem: (vertices, faces)} parsed from the
    OBJ files it writes (via the functional trimesh stub)."""
    import torch

    env = install_reference_environment()
    _upgrade_trimesh_stub()
    infer = env["infer"]

    from hamer.models.mano_wrapper import MANO  # type: ignore

    class _FakeHamer:
        pass

    fh = _FakeHamer()
    fh.device = torch.device("cpu")
    fh.mano = MANO()
    infer.reconstruct_and_save_obj_with_wrapper(npy_dir, obj_dir, fh)
    results = {}
    for f in sorted(os.listdir(obj_dir)):
        if f.endswith(".obj"):
            results[f[:-4]] = read_obj_file(os.path.join(obj_dir, f))
    return results
