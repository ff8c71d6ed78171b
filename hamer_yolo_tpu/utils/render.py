"""GL-free lit mesh rasterizer (pyrender-quality replacement).

Capability parity with the reference's offscreen pyrender path
(/root/reference/hamer/hamer/utils/renderer.py:222-386 Renderer.__call__ /
render_rgba, /root/reference/hamer/hamer/utils/mesh_renderer.py:403-430):
a lit, z-buffered, anti-aliased mesh overlay blended onto the source
frame — without EGL/OSMesa/GL context, so it runs anywhere the pipeline
runs (the reference needs a GPU GL context; SURVEY §2.3 "Renderers").

Design: classic software rasterization, vectorized in numpy —
- smooth per-vertex normals (area-weighted face-normal accumulation),
- perspective projection through the real camera intrinsics K,
- per-pixel barycentric interpolation with perspective correction,
- z-buffer hidden-surface removal (replaces the painter's algorithm in
  utils/viz.shaded_mesh_overlay, which draws far-to-near and cannot
  resolve cyclic overlap, e.g. interleaved fingers),
- Blinn-Phong shading: ambient + Lambert diffuse + specular highlight
  (pyrender's default PBR material approximated with the same base
  color the reference uses, LIGHT_BLUE / (0.65, 0.74, 0.86)),
- anti-aliasing by SSxSS supersampling + box filter (pyrender uses
  4-sample MSAA; SS=2 gives equivalent edge quality).

Host-side viz utility: stays numpy (one frame at a time, called from the
CLI/report path). The device-side per-crop overlays used in training
grids keep the cheap painter path.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

# Reference mesh color (hamer demo LIGHT_BLUE), RGB in [0,1].
LIGHT_BLUE = (0.65, 0.74, 0.86)


def vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Smooth per-vertex normals: area-weighted face-normal accumulation.

    vertices (V, 3), faces (F, 3) int -> (V, 3) unit normals.
    """
    tri = vertices[faces]  # (F, 3, 3)
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])  # area-weighted
    vn = np.zeros_like(vertices)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    return vn / np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)


def _shade(normals: np.ndarray, view_dir: np.ndarray, base_rgb: np.ndarray,
           light_dir: np.ndarray, ambient: float, diffuse: float,
           specular: float, shininess: float) -> np.ndarray:
    """Blinn-Phong over an (N, 3) normal array -> (N, 3) RGB in [0, 1]."""
    l = -light_dir  # direction TOWARD the light
    ndotl = np.clip(normals @ l, 0.0, None)
    h = l - view_dir
    h = h / np.maximum(np.linalg.norm(h), 1e-12)
    ndoth = np.clip(normals @ h, 0.0, None)
    col = base_rgb * (ambient + diffuse * ndotl[:, None])
    col += specular * (ndoth[:, None] ** shininess)
    return np.clip(col, 0.0, 1.0)


def rasterize_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    K: np.ndarray,
    image_hw: Tuple[int, int],
    base_color: Sequence[float] = LIGHT_BLUE,
    light_dir: Sequence[float] = (0.25, -0.35, 0.9),
    ambient: float = 0.30,
    diffuse: float = 0.65,
    specular: float = 0.35,
    shininess: float = 24.0,
    ss: int = 2,
    backface_cull: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Render a camera-space mesh to an RGBA float buffer.

    vertices (V, 3) camera coords (+z forward), faces (F, 3), K (3, 3).
    Returns (rgb (H, W, 3) float in [0,1], alpha (H, W) float in [0,1]);
    alpha is the supersampled coverage, fractional on silhouette edges
    (the anti-aliasing), 0 where no mesh.
    """
    H, W = int(image_hw[0]), int(image_hw[1])
    Hs, Ws = H * ss, W * ss
    base_rgb = np.asarray(base_color, np.float64)
    ld = np.asarray(light_dir, np.float64)
    ld = ld / np.linalg.norm(ld)

    z = np.maximum(vertices[:, 2], 1e-9)
    u = (vertices[:, 0] / z * K[0, 0] + K[0, 2]) * ss
    v = (vertices[:, 1] / z * K[1, 1] + K[1, 2]) * ss
    inv_z = 1.0 / z
    vn = vertex_normals(vertices, faces)

    # Per-vertex shading (Gouraud at supersampled resolution ~= per-pixel
    # quality for MANO-density meshes), perspective-correct interpolation.
    view = np.array([0.0, 0.0, 1.0])
    vcol = _shade(vn, view, base_rgb, ld, ambient, diffuse, specular, shininess)

    zbuf = np.full((Hs, Ws), np.inf, np.float64)
    cbuf = np.zeros((Hs, Ws, 3), np.float64)
    mask = np.zeros((Hs, Ws), bool)

    fu, fv = u[faces], v[faces]            # (F, 3)
    fiz = inv_z[faces]                     # (F, 3)
    fcol = vcol[faces]                     # (F, 3, 3)

    # Signed area in screen space; cull backfaces + degenerates.
    area = ((fu[:, 1] - fu[:, 0]) * (fv[:, 2] - fv[:, 0])
            - (fu[:, 2] - fu[:, 0]) * (fv[:, 1] - fv[:, 0]))
    if backface_cull:
        keep = area < -1e-12  # +y down, +z forward: front faces wind CW
    else:
        keep = np.abs(area) > 1e-12
    order = np.nonzero(keep)[0]

    for fi in order:
        x0 = max(int(np.floor(fu[fi].min())), 0)
        x1 = min(int(np.ceil(fu[fi].max())) + 1, Ws)
        y0 = max(int(np.floor(fv[fi].min())), 0)
        y1 = min(int(np.ceil(fv[fi].max())) + 1, Hs)
        if x0 >= x1 or y0 >= y1:
            continue
        px, py = np.meshgrid(np.arange(x0, x1) + 0.5, np.arange(y0, y1) + 0.5)
        a = area[fi]
        w0 = ((fu[fi, 1] - px) * (fv[fi, 2] - py)
              - (fu[fi, 2] - px) * (fv[fi, 1] - py)) / a
        w1 = ((fu[fi, 2] - px) * (fv[fi, 0] - py)
              - (fu[fi, 0] - px) * (fv[fi, 2] - py)) / a
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        # Perspective-correct: interpolate attr/z and 1/z.
        iz = w0 * fiz[fi, 0] + w1 * fiz[fi, 1] + w2 * fiz[fi, 2]
        depth = 1.0 / np.maximum(iz, 1e-12)
        sub_z = zbuf[y0:y1, x0:x1]
        win = inside & (depth < sub_z)
        if not win.any():
            continue
        cw = (w0[..., None] * fcol[fi, 0] * fiz[fi, 0]
              + w1[..., None] * fcol[fi, 1] * fiz[fi, 1]
              + w2[..., None] * fcol[fi, 2] * fiz[fi, 2]) * depth[..., None]
        sub_z[win] = depth[win]
        cbuf[y0:y1, x0:x1][win] = cw[win]
        mask[y0:y1, x0:x1] |= win

    # Box-filter downsample: fractional coverage = anti-aliased alpha.
    rgb = cbuf.reshape(H, ss, W, ss, 3).mean(axis=(1, 3))
    alpha = mask.reshape(H, ss, W, ss).astype(np.float64).mean(axis=(1, 3))
    # Un-premultiply the color where partially covered.
    nz = alpha > 0
    rgb[nz] /= alpha[nz, None]
    return rgb, alpha


def lit_mesh_overlay(
    image_bgr: np.ndarray,
    vertices: np.ndarray,
    faces: np.ndarray,
    K: np.ndarray,
    base_color: Sequence[float] = LIGHT_BLUE,
    alpha_scale: float = 1.0,
    **kwargs,
) -> np.ndarray:
    """Blend a lit, anti-aliased mesh render onto a BGR frame (uint8).

    Drop-in upgrade of utils/viz.shaded_mesh_overlay; same call shape as
    the reference's renderer(..., image) composite (renderer.py:253-258:
    out = rgba.alpha * rgb + (1 - alpha) * image).
    """
    rgb, alpha = rasterize_mesh(vertices, faces, K, image_bgr.shape[:2],
                                base_color=base_color, **kwargs)
    a = (alpha * alpha_scale)[..., None]
    bgr = rgb[..., ::-1] * 255.0
    out = a * bgr + (1.0 - a) * image_bgr.astype(np.float64)
    return np.clip(out, 0, 255).astype(np.uint8)


def render_rgba(
    vertices: np.ndarray,
    faces: np.ndarray,
    K: np.ndarray,
    image_hw: Tuple[int, int],
    **kwargs,
) -> np.ndarray:
    """(H, W, 4) float RGBA render on transparent background
    (renderer.render_rgba equivalent for side-view / grid composites)."""
    rgb, alpha = rasterize_mesh(vertices, faces, K, image_hw, **kwargs)
    return np.concatenate([rgb, alpha[..., None]], axis=-1)
