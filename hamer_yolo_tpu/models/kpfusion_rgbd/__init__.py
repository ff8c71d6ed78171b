"""Layer-exact KeypointFusion RGBD stack (reference rootnet/KeypointFusion).

The reference carries a complete second framework for RGB-D hand pose:
ResNet-UNet image streams, dense offset/heatmap/weight decode, point-cloud
feature aggregation with multi-scale ball-query grouping (DESA), BERT-style
intra-modal keypoint transformers, DETR-style cross-modal decoders, a
2-stage fusion pipeline (KPFusion), and a Model_RGBD runtime. This package
rebuilds it layer-exactly (converter-checked against the reference's own
torch modules) on JAX/TPU:

- resunet.py      OfficialResNetUnet (+_RGB2offset_3D)  [resnetUnet.py:251,335]
- geometry.py     normalized uvd<->xyz, offset maps, pcl indices, GAM
                  [model/model.py:432-520, processing_depth.py:775-1070]
- bert.py         TR_Encoder / KP_Interaction_TR        [model/model.py:33-130]
- transfusion.py  TransformerDecoderLayer + detr/updated/spatial decoders
                  [model/transfusion_head.py:97-799]
- desa.py         DESA multi-scale grouping             [model/model.py:132-208]
- model.py        Block_KPFusion + 2-stage KPFusion     [model/model.py:211-430]
- centernet.py    centerNet detection head              [model/centerNet.py]
- runtime.py      Model_RGBD-equivalent host pre/post   [Model_RGBD.py:30-460]
- layers.py       CBAM / RGBDFusion / hourglass PoseNet [cbam.py,
                  fusion_layer.py:40, hourglass.py:163]
- mano_head.py    mano_regHead MANO-parameter head      [model/mano_head.py:177]
"""
# model.py exports are re-exported lazily to keep partial builds importable
try:  # noqa: SIM105
    from hamer_yolo_tpu.models.kpfusion_rgbd.model import (  # noqa: F401
        KPFusionConfig, init_kpfusion, kpfusion_forward,
    )
except ImportError:  # pragma: no cover - during incremental construction
    pass
