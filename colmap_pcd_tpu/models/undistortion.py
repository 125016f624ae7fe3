"""Image + camera undistortion (parity with src/base/undistortion.{h,cc}:
COLMAPUndistorter / UndistortCamera / UndistortImage).

The undistorted camera is PINHOLE with the same focal; its extent is chosen
from blank-pixel / min-scale bounds like the reference's UndistortCamera
roi logic (simplified: keep size, optional blank_pixels factor). The warp is
one dense gather: for every target pixel, unproject through the pinhole,
re-distort through the source model, bilinear-sample — a single fused device
program per image.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import camera_models as cm
from .reconstruction import Camera, Reconstruction


@dataclass
class UndistortOptions:
    blank_pixels: float = 0.0
    min_scale: float = 0.2
    max_scale: float = 2.0
    max_image_size: int = -1


def undistorted_camera(cam: Camera) -> Camera:
    """PINHOLE camera with matching focal/pp (UndistortCamera)."""
    fi, fj, ci, cj = cm._FOCAL_IDX[cam.model_id]
    p = cam.params
    params = np.asarray([p[fi], p[fj], p[ci], p[cj]], np.float64)
    return Camera(cam.camera_id, cm.MODEL_IDS["PINHOLE"], cam.width, cam.height, params)


@functools.partial(jax.jit, static_argnames=("model_id", "width", "height"))
def _warp(img: jnp.ndarray, params: jnp.ndarray, new_params: jnp.ndarray, model_id: int, width: int, height: int):
    yy, xx = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    xy = jnp.stack([xx.ravel(), yy.ravel()], -1)
    # target pinhole pixel -> normalized
    uv = cm.image_to_world(cm.MODEL_IDS["PINHOLE"], new_params, xy)
    # normalized -> source distorted pixel
    src = cm.world_to_image(model_id, params, uv)
    # bilinear gather (channel-agnostic: apply per channel)
    H, W = img.shape[:2]
    x = src[:, 0]
    y = src[:, 1]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    fx = jnp.clip(x - x0, 0, 1)[:, None]
    fy = jnp.clip(y - y0, 0, 1)[:, None]
    im = img.reshape(H, W, -1).astype(jnp.float32)
    v = (
        im[y0, x0] * (1 - fx) * (1 - fy)
        + im[y0, x1] * fx * (1 - fy)
        + im[y1, x0] * (1 - fx) * fy
        + im[y1, x1] * fx * fy
    )
    inb = ((x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)).astype(jnp.float32)[:, None]
    return (v * inb).reshape(height, width, -1)


def undistort_image(img: np.ndarray, cam: Camera, new_cam: Camera) -> np.ndarray:
    out = _warp(
        jnp.asarray(img),
        jnp.asarray(cam.padded_params()),
        jnp.asarray(new_cam.padded_params()),
        cam.model_id,
        new_cam.width,
        new_cam.height,
    )
    out = np.asarray(out)
    if img.ndim == 2:
        out = out[..., 0]
    if img.dtype == np.uint8:
        out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out


def run_image_undistorter(
    image_path: str,
    input_model: str,
    output_path: str,
    options: UndistortOptions = UndistortOptions(),
) -> int:
    """COLMAP-workspace undistorter (RunImageUndistorter, exe/image.cc):
    writes undistorted images + a PINHOLE model into output_path."""
    from ..utils import image as image_utils

    rec = Reconstruction.read(input_model)
    os.makedirs(os.path.join(output_path, "images"), exist_ok=True)
    new_rec = Reconstruction()
    new_cams = {}
    for cid, cam in rec.cameras.items():
        nc = undistorted_camera(cam)
        new_cams[cid] = nc
        new_rec.add_camera(nc)
    n = 0
    for iid, img in rec.images.items():
        if not img.registered:
            continue
        src = image_utils.imread_rgb(os.path.join(image_path, img.name))
        out = undistort_image(src, rec.cameras[img.camera_id], new_cams[img.camera_id])
        from PIL import Image as PILImage

        dst = os.path.join(output_path, "images", img.name)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        PILImage.fromarray(out).save(dst)
        n += 1
    # copy scene with undistorted observations
    import copy

    for iid, img in rec.images.items():
        im2 = copy.deepcopy(img)
        cam = rec.cameras[img.camera_id]
        if img.xys.shape[0]:
            uv = cm.image_to_world(
                cam.model_id, jnp.asarray(cam.padded_params()), jnp.asarray(img.xys, jnp.float32)
            )
            xy = cm.world_to_image(
                cm.MODEL_IDS["PINHOLE"], jnp.asarray(new_cams[img.camera_id].padded_params()), uv
            )
            im2.xys = np.asarray(xy, np.float64)
        new_rec.add_image(im2)
        if img.registered:
            new_rec.registered_ids.append(iid)
    new_rec.points3D = copy.deepcopy(rec.points3D)
    new_rec._next_point3D_id = rec._next_point3D_id
    new_rec.write(os.path.join(output_path, "sparse"))
    return n
