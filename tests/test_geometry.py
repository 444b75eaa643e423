"""Geometry tests: voxel sampling, camera projection, ego-motion warp."""

import numpy as np
import jax.numpy as jnp

from bevrender_tpu.geometry.projection import (
    BEV2CameraProjector,
    default_camera_rig,
    reference_points_all_types,
    sample_3d_points,
)
from bevrender_tpu.geometry.ego_motion import affine_warp, project_history_bev


class TestSample3DPoints:
    def test_grid_shape_is_half_height(self):
        """model/SCA.py:112-162: x spans (0, X] at half resolution."""
        pts = sample_3d_points({"X": 25.2, "Y": 25.2, "Z": 2.5}, 56, 5, -1.0)
        assert pts.shape == (4, 28, 56, 5)
        assert np.all(pts[3] == 1.0)

    def test_bounds_and_shift(self):
        bound = {"X": 10.0, "Y": 10.0, "Z": 2.0}
        pts = sample_3d_points(bound, 8, 4, -1.0)
        assert pts.shape == (4, 4, 8, 4)
        xs = pts[0, :, 0, 0]
        np.testing.assert_allclose(xs, [1.25, 3.75, 6.25, 8.75])
        ys = pts[1, 0, :, 0]
        assert ys[0] == -10.0 + 1.25 and ys[-1] == 10.0 - 1.25
        zs = pts[2, 0, 0, :]
        # [-Z + z_half + shift, ...] with z_half = 0.5, shift = -1
        np.testing.assert_allclose(zs, [-2.5, -1.5, -0.5, 0.5])


class TestProjection:
    def _projector(self):
        rig, K = default_camera_rig(n_views=3, img_width=64, img_height=64)
        return BEV2CameraProjector(
            imu_to_rgb=rig,
            K=K,
            vehicle_type_code=0,
            img_width=64,
            img_height=64,
            ori_img_width=64,
            ori_img_height=64,
        )

    def test_forward_point_hits_center_column(self):
        proj = self._projector()
        # A point straight ahead at camera height projects to the image center
        # of the middle (yaw=0) camera.
        pts = np.array([[10.0], [0.0], [1.8], [1.0]])
        views = proj.bev_grid_to_camera(pts.reshape(4, 1, 1, 1))[0]
        x, y = views[1][:, 0, 0, 0]
        np.testing.assert_allclose([x, y], [0.0, 0.0], atol=0.05)

    def test_out_of_bounds_zeroed_then_normalized(self):
        # Single forward camera; a point far to the side projects outside the
        # frame -> filled 0 then normalized to -1 (bev_cmr_proj.py:76,95-97).
        # (Parity note: like the reference, there is no positive-depth check,
        # only the pixel-bounds mask of bev_cmr_proj.py:105-113.)
        rig, K = default_camera_rig(n_views=1, img_width=64, img_height=64,
                                    yaw_spread_deg=0.0)
        proj = BEV2CameraProjector(
            imu_to_rgb=rig, K=K, vehicle_type_code=0,
            img_width=64, img_height=64, ori_img_width=64, ori_img_height=64,
        )
        pts = np.array([[0.1], [30.0], [0.0], [1.0]]).reshape(4, 1, 1, 1)
        views = proj.bev_grid_to_camera(pts)[0]
        np.testing.assert_allclose(views[0][:, 0, 0, 0], [-1.0, -1.0], atol=1e-6)

    def test_reference_points_layout(self):
        rig, K = default_camera_rig(n_views=3)
        ref = reference_points_all_types(
            imu_to_rgb=rig,
            K=K,
            vehicle_types=[0],
            bev_bound={"X": 25.2, "Y": 25.2, "Z": 2.5},
            bev_feat_shape=56,
            bev_depth_dim=5,
            z_shift=-1.0,
            img_width=224,
            img_height=224,
            ori_img_width=224,
            ori_img_height=224,
        )
        # (types, views, h2, w*d, 2) — the SCA key plane (SURVEY section 2.1)
        assert ref.shape == (1, 3, 28, 280, 2)
        # int32-truncation in the bounds mask (bev_cmr_proj.py:106) admits
        # pixels in (-1, 0), so normalized coords can dip slightly below -1,
        # exactly as in the reference.
        assert ref.min() >= -1.02 and ref.max() <= 1.0
        # Some points must land in front of the cameras.
        assert (ref > -1.0).any()


class TestAffineWarp:
    def test_identity(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.standard_normal((2, 9, 9, 3)).astype(np.float32))
        out = affine_warp(img, jnp.zeros(2), jnp.zeros((2, 2)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_translation_shifts_image(self):
        img = np.zeros((1, 7, 7, 1), np.float32)
        img[0, 3, 3, 0] = 1.0
        out = affine_warp(jnp.asarray(img), jnp.zeros(1), jnp.asarray([[2.0, 0.0]]))
        # positive tx moves content right (torchvision convention)
        assert np.asarray(out)[0, 3, 5, 0] == 1.0

    def test_rotation_90deg(self):
        img = np.zeros((1, 7, 7, 1), np.float32)
        img[0, 2, 3, 0] = 1.0  # one pixel above center
        out = affine_warp(
            jnp.asarray(img), jnp.asarray([np.pi / 2]), jnp.zeros((1, 2))
        )
        # CCW (y-up) == appears at the right of center in (row, col) indexing
        assert np.asarray(out)[0, 3, 4, 0] > 0.99

    @staticmethod
    def _smooth(shape):
        # bilinear interpolation is near-exact on smooth fields
        h, w = shape[1], shape[2]
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        base = np.sin(xx / 6.0) + np.cos(yy / 5.0)
        return np.broadcast_to(
            base[None, :, :, None], shape
        ).astype(np.float32).copy()

    def test_warp_roundtrip(self):
        img = self._smooth((1, 33, 33, 2))
        ang = jnp.asarray([0.3])
        fwd = affine_warp(jnp.asarray(img), ang, jnp.zeros((1, 2)))
        back = affine_warp(fwd, -ang, jnp.zeros((1, 2)))
        err = np.abs(np.asarray(back)[0, 12:21, 12:21] - img[0, 12:21, 12:21])
        assert err.mean() < 0.02

    def test_project_history_identity_pose(self):
        bev = jnp.asarray(self._smooth((2, 17, 17, 4)))
        pose = np.zeros((2, 2, 3), np.float32)
        pose[:, :, 0] = 5.0
        pose[:, :, 1] = 7.0
        pose[:, :, 2] = 0.4  # same heading both frames
        out = project_history_bev(bev, jnp.asarray(pose))
        # rotate by r then -r (both about center, no translation): near-identity
        err = np.abs(np.asarray(out)[:, 5:12, 5:12] - np.asarray(bev)[:, 5:12, 5:12])
        assert err.mean() < 0.02

    def test_bev_pose_convention_aligns_synthetic_trace(self):
        """Pins the pose convention the flagship recall demo feeds the
        eval-time ego-motion warp (scripts/recall_demo.py --pose-mode bev):
        ``SyntheticGeoDataset.trace`` rows are (row, col, heading) world
        pixels, while ``project_history_bev`` (reference parity,
        model/encoder.py:413-466) wants torchvision (x, y) translations —
        so (row, col) must be SWAPPED to (x=col, y=row) and scaled by
        bev_size/map_tile, with sign +1. With that convention the warped
        prev-pose BEV content matches the current-pose content far better
        than no warp; with the un-swapped convention it does not."""
        import jax

        from bevrender_tpu.data.dataset import SyntheticGeoDataset

        tile, bev = 32, 8
        ds = SyntheticGeoDataset(
            n_items=64, num_views=1, window_num_imgs=1, img_height=16,
            img_width=16, map_tile=tile, world=256, noise=0.0, seed=0,
            detail=0.5,
        )
        f = tile // bev
        pool = lambda img: img.reshape(bev, f, bev, f, 3).mean(axis=(1, 3))
        idx = list(range(1, 64, 9))
        pb = np.stack([pool(ds._crop(*ds.trace[i - 1][:2], tile)) for i in idx])
        cb = np.stack([pool(ds._crop(*ds.trace[i][:2], tile)) for i in idx])
        pose_rc = np.stack(
            [np.stack([ds.trace[i - 1][:2], ds.trace[i][:2]]) for i in idx]
        ) * (bev / tile)
        warp = jax.jit(project_history_bev)
        m = 2  # interior: zero-fill borders excluded
        mse = lambda a, b: float(np.mean((a[:, m:-m, m:-m] - b[:, m:-m, m:-m]) ** 2))
        base = mse(pb, cb)

        def run(xy):
            pose = np.concatenate(
                [xy, np.zeros_like(xy[..., :1])], axis=-1
            ).astype(np.float32)
            return mse(np.asarray(warp(jnp.asarray(pb.astype(np.float32)),
                                       jnp.asarray(pose))), cb)

        err_swap = run(pose_rc[:, :, ::-1])  # (row,col) -> (x,y): CORRECT
        err_raw = run(pose_rc)               # unswapped: wrong axis order
        assert err_swap < 0.3 * base, (
            f"swapped-convention warp should beat no-warp: {err_swap:.5f} vs "
            f"unwarped {base:.5f}"
        )
        assert err_swap < 0.5 * err_raw, (
            f"swapped convention should beat raw (row,col) order: "
            f"{err_swap:.5f} vs {err_raw:.5f}"
        )


class TestMultiVehicleType:
    def test_model_selects_per_type_reference_points(self):
        """Two vehicle types with different rigs must produce different
        renders through the same params (SCA.py:78-85 per-type lookup)."""
        import jax
        import jax.numpy as jnp

        from bevrender_tpu.config import Config, tiny_model_config
        from bevrender_tpu.data.dataset import SyntheticDataset
        from bevrender_tpu.data.prefetch import collate
        from bevrender_tpu.models.bevrender import BEVRenderModel

        rig0, K0 = default_camera_rig(n_views=2, img_width=32, img_height=32,
                                      yaw_spread_deg=30.0)
        rig1, K1 = default_camera_rig(n_views=2, img_width=32, img_height=32,
                                      yaw_spread_deg=80.0)
        cfg = Config()
        cfg.model = tiny_model_config(
            imu_to_rgb={0: rig0[0], 1: rig1[0]},
            intrinsic_k={0: K0[0], 1: K1[0]},
        )
        cfg.data.window_num_imgs = 1
        ds = SyntheticDataset(n_items=2, num_views=2, window_num_imgs=1,
                              img_height=32, img_width=32, map_tile=32,
                              n_vehicle_types=2)
        batch = collate([ds[0], ds[0]])
        model = BEVRenderModel(cfg)
        assert model.vehicle_types == [0, 1]
        variables = model.init(jax.random.PRNGKey(0), batch)

        vt0 = jnp.zeros_like(jnp.asarray(batch["vehicle_type"]))
        vt1 = jnp.ones_like(vt0)
        out0 = model.apply(variables, batch["camera"], batch["vehicle_pose"],
                           vt0, train=False)
        out1 = model.apply(variables, batch["camera"], batch["vehicle_pose"],
                           vt1, train=False)
        assert float(jnp.abs(out0 - out1).max()) > 1e-6
