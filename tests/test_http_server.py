"""HTTP serving front end: concurrent clients, dynamic micro-batching.

Tiny models on CPU; 6 concurrent POST /infer clients must all receive
valid hand JSON, and the micro-batcher must have grouped them into fewer
device dispatches than requests (the Triton-style dynamic batching the
reference deploys, yolo/yolov7/deploy/triton-inference-server/).
"""
from __future__ import annotations

import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    import cv2
    import jax

    from hamer_yolo_tpu.core.checkpoint import init_pipeline_params
    from hamer_yolo_tpu.core.mano_assets import synthetic_mano_model
    from hamer_yolo_tpu.models.hamer import HamerConfig
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.models.mano_head import ManoHeadConfig
    from hamer_yolo_tpu.models.sar import SarConfig
    from hamer_yolo_tpu.models.vit import ViTConfig
    from hamer_yolo_tpu.models.yolov7 import YoloConfig
    from hamer_yolo_tpu.pipeline.frame import PipelineConfig
    from hamer_yolo_tpu.pipeline.http_server import make_http_server
    from hamer_yolo_tpu.pipeline.serving import BatchedPipeline

    cfg = PipelineConfig(
        max_hands=2, det_size=64, crop_size=64,
        yolo=YoloConfig(nc=3, img_size=64),
        hamer=HamerConfig(
            image_size=64, crop_margin=8,
            vit=ViTConfig(img_size=(64, 48), embed_dim=64, depth=2,
                          num_heads=4),
            head=ManoHeadConfig(dim=32, context_dim=64, depth=2, heads=2,
                                dim_head=8, mlp_dim=32),
        ),
        sar=SarConfig(backbone="resnet34", input_size=64, feature_hw=2,
                      heatmap_size=8),
    )
    mano = ManoModel.from_arrays(synthetic_mano_model())
    params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                  yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
                                  sar_cfg=cfg.sar)
    pipe = BatchedPipeline(params, mano, cfg, batch_size=4,
                           bucket_hw=(96, 128))
    srv = make_http_server(pipe, "127.0.0.1", 0, max_wait_ms=200.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()

    # one warmup request to compile the program before the timed burst
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
    ok, buf = cv2.imencode(".png", img)
    assert ok
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    req = urllib.request.Request(url + "/infer", data=buf.tobytes(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.status == 200
    yield srv, url, buf.tobytes()
    srv.shutdown()
    srv.batcher.close()


class TestHTTPServer:
    def test_healthz_and_stats(self, server):
        _, url, _ = server
        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"] is True
        with urllib.request.urlopen(url + "/stats", timeout=30) as r:
            s = json.loads(r.read())
            assert s["frames"] >= 1 and s["batches"] >= 1

    def test_concurrent_clients_are_batched(self, server):
        srv, url, payload = server
        batches_before = srv.batcher.batches
        results = [None] * 6
        errors = []

        def post(i):
            try:
                req = urllib.request.Request(url + "/infer", data=payload,
                                             method="POST")
                with urllib.request.urlopen(req, timeout=300) as r:
                    results[i] = json.loads(r.read())
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=post, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors
        for res in results:
            assert res is not None
            assert res["height"] == 96 and res["width"] == 128
            for hand in res["hands"]:
                assert hand["side"] in ("left", "right")
                assert len(hand["betas"]) == 10
                assert len(hand["theta"]) == 48
                assert len(hand["cam_t"]) == 3
        # 6 requests, batch_size 4 -> at most 3 extra dispatches; dynamic
        # batching must have merged at least two requests somewhere.
        n_batches = srv.batcher.batches - batches_before
        assert 1 <= n_batches < 6

    def test_bad_payload_is_400(self, server):
        _, url, _ = server
        req = urllib.request.Request(url + "/infer", data=b"not-an-image",
                                     method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code == 400
        assert raised
