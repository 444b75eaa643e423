"""BEV voxel grid sampling and camera projection (host-side precompute).

Pure-numpy reimplementation of the reference's geometry stack:

* ``sample_3d_points`` (model/SCA.py:112-162): a voxel grid over the BEV
  bounds. Note the x axis spans only ``(0, X]`` at *half* the BEV resolution —
  the grid is ``(bev_h // 2, bev_w, depth)`` — which is what makes the SCA key
  plane ``(bev_h // 2, bev_w * depth)``.
* ``BEV2CameraProjector`` (model/bev_cmr_proj.py:12-124): rescale intrinsics,
  project homogeneous voxels through ``inv(imu_to_cmr) @ points`` then
  ``K @ .`` with perspective divide, mask out-of-bounds (and optionally
  gray-calibration pixels), normalize to [-1, 1] for grid sampling.

Everything here runs once per vehicle type at model build and is baked into
the model as constants; no gradients flow through it (the reference wraps the
equivalent in ``@torch.no_grad``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def sample_3d_points(
    bev_bound: Dict[str, float],
    bev_feat_shape: int,
    bev_depth_dim: int,
    z_shift: float,
) -> np.ndarray:
    """Homogeneous 3-D voxel centers over the BEV bounds.

    Returns:
      (4, bev_feat_shape // 2, bev_feat_shape, bev_depth_dim) array of
      ``[x, y, z, 1]`` rows, mirroring model/SCA.py:112-162: x in
      ``(0, X]`` (forward of the vehicle, half resolution), y in ``[-Y, Y]``,
      z in ``[-Z, Z] + z_shift``.
    """
    x_half = bev_bound["X"] / bev_feat_shape
    y_half = bev_bound["Y"] / bev_feat_shape
    z_half = bev_bound["Z"] / bev_depth_dim

    xs = np.arange(x_half, bev_bound["X"] + x_half, 2 * x_half, dtype=np.float64)
    ys = np.arange(
        -bev_bound["Y"] + y_half, bev_bound["Y"] + y_half, 2 * y_half, dtype=np.float64
    )
    zs = np.arange(
        -bev_bound["Z"] + z_half + z_shift,
        bev_bound["Z"] + z_half + z_shift,
        2 * z_half,
        dtype=np.float64,
    )
    gx, gy = np.meshgrid(xs, ys, indexing="ij")  # (h2, w)
    h2, w = gx.shape
    d = zs.shape[0]
    pts = np.empty((4, h2, w, d), dtype=np.float32)
    pts[0] = gx[:, :, None]
    pts[1] = gy[:, :, None]
    pts[2] = zs[None, None, :]
    pts[3] = 1.0
    return pts


class BEV2CameraProjector:
    """Project BEV voxel centers into each camera view.

    Mirrors model/bev_cmr_proj.py:12-124 with the same key order and masking
    semantics; implemented in numpy (host) because the result is a constant.

    Args:
      imu_to_rgb: {vehicle_type: [4x4 extrinsic per view]}.
      K: {vehicle_type: [3x3 or 3x4 intrinsic per view]} (only the 3x3 block
        is used, as in bev_cmr_proj.py:73).
      vehicle_type_code: the active vehicle type key.
      img_width/img_height: post-resize per-view image size.
      ori_img_width/ori_img_height: capture resolution (intrinsics rescale).
      remove_ref_in_gray: drop reference points landing on gray (128,128,128)
        calibration pixels (bev_cmr_proj.py:114-122).
      bound_check_img_paths: per-view calibration image paths for the gray mask.
    """

    def __init__(
        self,
        imu_to_rgb: Dict[int, Sequence],
        K: Dict[int, Sequence],
        vehicle_type_code: int,
        img_width: int,
        img_height: int,
        ori_img_width: int,
        ori_img_height: int,
        remove_ref_in_gray: bool = False,
        bound_check_img_paths: Optional[List[str]] = None,
        logger=None,
    ):
        self.scale_x = img_width / ori_img_width
        self.scale_y = img_height / ori_img_height
        self.img_width = img_width
        self.img_height = img_height
        self.vehicle_type_code = vehicle_type_code
        self.remove_ref_in_gray = remove_ref_in_gray
        self.bound_check_img_paths = bound_check_img_paths
        self.logger = logger

        self.imu_to_cmr = {
            k: [np.asarray(m, dtype=np.float64) for m in v]
            for k, v in imu_to_rgb.items()
        }
        # Rescale K in place like bev_cmr_proj.py:41-46.
        self.K = {}
        for key, mats in K.items():
            scaled = []
            for m in mats:
                m = np.asarray(m, dtype=np.float64).copy()
                m[0, 0] *= self.scale_x
                m[0, 2] *= self.scale_x
                m[1, 1] *= self.scale_y
                m[1, 2] *= self.scale_y
                scaled.append(m)
            self.K[key] = scaled

    def bev_grid_to_camera(self, points_3d: np.ndarray) -> Dict[int, List[np.ndarray]]:
        """Project voxels into every view of the active vehicle type.

        Args:
          points_3d: (4, h, w, z) homogeneous voxel centers.

        Returns:
          {vehicle_type_code: [per-view (2, h, w, z) arrays]} of normalized
          [-1, 1] (x, y) pixel coordinates; out-of-bounds points are zeroed
          before normalization (bev_cmr_proj.py:76).
        """
        WIDTH_IDX, HEIGHT_IDX = 0, 1
        _, h, w, z = points_3d.shape
        flat = points_3d.reshape(4, -1).astype(np.float64)
        views = []
        extrinsics = self.imu_to_cmr[self.vehicle_type_code]
        intrinsics = self.K[self.vehicle_type_code]
        for module in range(len(extrinsics)):
            pts_cam = np.linalg.inv(extrinsics[module]) @ flat
            pts_2d = intrinsics[module][:3, :3] @ pts_cam[:3]
            pts_2d = (pts_2d / pts_2d[-1])[:2]
            mask = self._in_bound_mask(pts_2d, module)
            pts_2d = np.where(mask[None, :], pts_2d, 0.0)
            pts_2d[WIDTH_IDX] = pts_2d[WIDTH_IDX] / (self.img_width - 1)
            pts_2d[HEIGHT_IDX] = pts_2d[HEIGHT_IDX] / (self.img_height - 1)
            pts_2d = pts_2d * 2.0 - 1.0
            views.append(pts_2d.reshape(2, h, w, z).astype(np.float32))
        return {self.vehicle_type_code: views}

    def _in_bound_mask(self, points_2d: np.ndarray, module: int) -> np.ndarray:
        """bev_cmr_proj.py:105-124: int-cast bounds check + optional gray mask."""
        WIDTH_IDX, HEIGHT_IDX = 0, 1
        pts = points_2d.astype(np.int32)
        mask = (
            (pts[HEIGHT_IDX] >= 0)
            & (pts[HEIGHT_IDX] < self.img_height - 1)
            & (pts[WIDTH_IDX] >= 0)
            & (pts[WIDTH_IDX] < self.img_width - 1)
        )
        if self.remove_ref_in_gray and self.bound_check_img_paths:
            from PIL import Image

            ref_img = np.asarray(
                Image.open(self.bound_check_img_paths[module]).convert("RGB")
            )  # (H, W, 3)
            pts = np.where(mask[None, :], pts, 0)
            values = ref_img[pts[HEIGHT_IDX], pts[WIDTH_IDX]]  # (N, 3)
            gray = (values == 128).sum(axis=-1) == 3
            mask = mask & ~gray
        return mask


def reference_points_all_types(
    imu_to_rgb: Dict[int, Sequence],
    K: Dict[int, Sequence],
    vehicle_types: Sequence[int],
    bev_bound: Dict[str, float],
    bev_feat_shape: int,
    bev_depth_dim: int,
    z_shift: float,
    img_width: int,
    img_height: int,
    ori_img_width: int,
    ori_img_height: int,
    remove_ref_in_gray: bool = False,
    bound_check_img_paths: Optional[List[str]] = None,
) -> np.ndarray:
    """Stacked reference points for every vehicle type.

    Returns:
      (n_types, n_views, h2, w * depth, 2) float32 array of (x, y) coords in
      [-1, 1], laid out exactly as SCA consumes them (model/SCA.py:77-85:
      ``repeat(points, "v n h w d -> b v h (w d) n")``).
    """
    pts3d = sample_3d_points(bev_bound, bev_feat_shape, bev_depth_dim, z_shift)
    out = []
    for vt in vehicle_types:
        projector = BEV2CameraProjector(
            imu_to_rgb=imu_to_rgb,
            K=K,
            vehicle_type_code=vt,
            img_width=img_width,
            img_height=img_height,
            ori_img_width=ori_img_width,
            ori_img_height=ori_img_height,
            remove_ref_in_gray=remove_ref_in_gray,
            bound_check_img_paths=bound_check_img_paths,
        )
        views = projector.bev_grid_to_camera(pts3d)[vt]
        # (n, h, w, d) -> (h, w*d, n)
        stacked = np.stack(
            [v.transpose(1, 2, 3, 0).reshape(v.shape[1], -1, 2) for v in views], axis=0
        )
        out.append(stacked)
    return np.stack(out, axis=0).astype(np.float32)


def default_camera_rig(
    n_views: int = 3,
    img_width: int = 224,
    img_height: int = 224,
    fov_deg: float = 90.0,
    cam_height: float = 1.8,
    yaw_spread_deg: float = 60.0,
):
    """A synthetic surround-camera rig used when the dataset's calibration is
    unavailable (the reference's calibration lives in the redacted config).

    Cameras sit at the vehicle origin, pitched level, yawed at
    ``{-spread, 0, +spread}`` degrees, looking forward (+x). Returns
    ``(imu_to_rgb, K)`` dicts keyed by vehicle type 0 in the reference's
    format: imu->camera 4x4s and 3x4 intrinsics at capture resolution.
    """
    f = (img_width / 2.0) / np.tan(np.radians(fov_deg) / 2.0)
    K = np.array(
        [
            [f, 0.0, img_width / 2.0, 0.0],
            [0.0, f, img_height / 2.0, 0.0],
            [0.0, 0.0, 1.0, 0.0],
        ]
    )
    yaws = np.linspace(yaw_spread_deg, -yaw_spread_deg, n_views)
    extrinsics = []
    for yaw in np.radians(yaws):
        # camera axes: z forward (+x vehicle rotated by yaw), x right, y down
        fwd = np.array([np.cos(yaw), np.sin(yaw), 0.0])
        right = np.array([np.sin(yaw), -np.cos(yaw), 0.0])
        down = np.array([0.0, 0.0, -1.0])
        R_cam_in_imu = np.stack([right, down, fwd], axis=1)  # columns = cam axes
        T = np.eye(4)
        T[:3, :3] = R_cam_in_imu
        T[:3, 3] = [0.0, 0.0, cam_height]
        extrinsics.append(T)
    return {0: extrinsics}, {0: [K.copy() for _ in range(n_views)]}
