"""Synthetic datasets: learnable fake pose data, no files required.

SURVEY.md §4 test strategy: "integration: synthetic-dataset end-to-end
train-step loss-decreases test; eval-metric pipeline on synthetic GT where
MPJPE is analytically known". Images are rendered as per-joint Gaussian
blobs (distinct per-joint intensities over 3 channels), so a heatmap network
can genuinely learn joint detection from them.

Two flavors:
- :class:`SyntheticPoseDataset` — single-view, MPII-style (2D training).
- :class:`SyntheticMultiviewDataset` — an H36M-style 4-camera rig with GT
  3D joints, camera parameters, and view groups (self-supervised pipeline).
Also :func:`write_synthetic_mpii` materializes an on-disk MPII-format tree
to exercise the real file readers.
"""

from __future__ import annotations

import json
import os

import numpy as np

from epipolarpose_tpu.data.joints_dataset import JointsDataset, JointsRecord
from epipolarpose_tpu.geometry.camera import Camera


def _render_blobs(joints, shape, num_joints, blob_sigma=4.0):
    """Render an (H, W, 3) float image with one Gaussian blob per joint.

    Channel weights depend on joint id so joints are distinguishable.
    ``blob_sigma`` may be a scalar or a per-joint array (the multiview
    dataset's perspective depth cue renders nearer joints larger).
    """
    H, W = shape
    img = np.zeros((H, W, 3), np.float32)
    sig = np.broadcast_to(np.asarray(blob_sigma, np.float32),
                          (len(joints),))
    for j, (x, y) in enumerate(joints):
        # each blob only touches a +-4 sigma window (exact to f32
        # precision: exp(-8) ~ 3e-4 scales below the uint8 quantization
        # step); full-frame evaluation made 1024^2 renders ~0.4 s each
        r = max(int(np.ceil(4.0 * sig[j])), 2)
        x0 = max(int(np.floor(x)) - r, 0)
        y0 = max(int(np.floor(y)) - r, 0)
        x1 = min(int(np.ceil(x)) + r + 1, W)
        y1 = min(int(np.ceil(y)) + r + 1, H)
        if x0 >= x1 or y0 >= y1:
            continue
        ys = np.arange(y0, y1, dtype=np.float32)[:, None]
        xs = np.arange(x0, x1, dtype=np.float32)[None, :]
        g = np.exp(-((xs - x) ** 2 + (ys - y) ** 2) / (2 * sig[j] ** 2))
        w = np.array([np.cos(j * 1.3) ** 2, np.sin(j * 0.7) ** 2,
                      ((j % 4) + 1) / 4.0], np.float32)
        img[y0:y1, x0:x1] += g[..., None] * w
    return np.clip(img, 0, 1)


class SyntheticPoseDataset(JointsDataset):
    """Single-view synthetic dataset; MPII-compatible surface.

    ``flip_pairs`` is EMPTY on purpose: each blob keeps a unique,
    side-independent color, so a horizontal flip is a pure geometric
    mirror — label j still marks the color-j blob. Human-style pair
    swapping (reference fliplr_joints) would relabel color-a blobs as b
    on every flipped sample: 50% of the epoch gets contradictory labels
    and training plateaus (measured: r50@256 PCKh stuck ~18 with pairs
    declared). Pair-swap logic itself is exercised by tests with explicit
    flip_pairs and by the real MPII/H36M datasets."""

    flip_pairs = ()

    def __init__(self, cfg, num_samples: int = 64, is_train: bool = True,
                 image_shape=(256, 256), seed: int = 0, **kwargs):
        self.image_shape = image_shape
        J = int(cfg.MODEL.NUM_JOINTS)
        rng = np.random.default_rng(seed)
        side = float(min(image_shape))
        margin = 0.31 * side
        spread = 0.23 * side
        box_scale = side / 200.0 * 0.9
        records = []
        for i in range(num_samples):
            center = rng.uniform(
                [margin, margin],
                [image_shape[1] - margin, image_shape[0] - margin],
                2).astype(np.float32)
            joints = (center + rng.uniform(-spread, spread, (J, 2))).astype(
                np.float32)
            records.append(JointsRecord(
                image=f"synthetic://{i}", center=center,
                scale=np.array([box_scale, box_scale], np.float32),
                joints=joints, joints_vis=np.ones(J, np.float32)))
        super().__init__(cfg, records, is_train, **kwargs)

    def _read_image(self, path: str) -> np.ndarray:
        idx = int(path.split("://")[1])
        rec = self.records[idx]
        img = _render_blobs(rec.joints, self.image_shape, len(rec.joints))
        return (img * 255).astype(np.uint8)

    def evaluate(self, cfg, preds, output_dir=None, **kwargs):
        from epipolarpose_tpu.ops.metrics import pckh
        import jax.numpy as jnp
        preds = np.asarray(preds)[..., :2]
        gts = np.stack([r.joints for r in self.records])[:len(preds)]
        heads = np.full(len(preds), 30.0, np.float32)
        per_joint, mean = pckh(jnp.asarray(preds), jnp.asarray(gts),
                               jnp.asarray(heads))
        return {"Mean": float(mean)}, float(mean)


def _rodrigues_batch(aa: np.ndarray) -> np.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3) (numpy)."""
    theta = np.linalg.norm(aa, axis=-1, keepdims=True)
    k = aa / np.maximum(theta, 1e-12)
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    z = np.zeros_like(kx)
    K = np.stack([
        np.stack([z, -kz, ky], axis=-1),
        np.stack([kz, z, -kx], axis=-1),
        np.stack([-ky, kx, z], axis=-1),
    ], axis=-2)
    t = theta[..., None]
    eye = np.broadcast_to(np.eye(3, dtype=aa.dtype), K.shape)
    return eye + np.sin(t) * K + (1.0 - np.cos(t)) * (K @ K)


def skeleton_template(num_joints: int, seed: int = 1234):
    """Fixed kinematic-tree template for structured synthetic skeletons.

    Deterministic per (num_joints, seed): a parent tree, per-bone lengths
    (mm), rest directions, and a LOW-RANK joint-angle basis. Sampled poses
    (:func:`synth_skeleton_poses`) therefore share exactly-constant bone
    lengths and live on a low-dimensional pose manifold — the structure a
    refinement unit exploits (the reference trains its refiner/ MLP on real
    mocap poses, which are similarly low-rank; SURVEY.md §2.A [M]).
    """
    rng = np.random.default_rng(seed + 7919 * num_joints)
    parents = np.array([(j - 1) // 2 for j in range(num_joints)])
    parents[0] = -1
    lengths = rng.uniform(150.0, 400.0, num_joints).astype(np.float32)
    rest = rng.normal(size=(num_joints, 3)).astype(np.float32)
    rest /= np.linalg.norm(rest, axis=1, keepdims=True)
    latent_dim = 8
    basis = rng.normal(size=(latent_dim, num_joints, 3)).astype(np.float32)
    basis *= 0.3 / np.sqrt(latent_dim)       # ~0.3 rad rms per joint
    return parents, lengths, rest, basis


def synth_skeleton_poses(rng: np.random.Generator, n: int,
                         num_joints: int) -> np.ndarray:
    """Sample (n, J, 3) root-relative skeleton poses (mm, world frame).

    Kinematic-tree forward pass: per-sample low-dim latent -> per-joint
    axis-angle perturbations accumulated down the tree, plus a free global
    rotation about the vertical. Bone lengths are exactly constant across
    samples and the intrinsic dimensionality is latent_dim + 1 (of 3J),
    so denoising the distribution is genuinely learnable — unlike an
    i.i.d.-uniform joint bank, whose optimal denoiser is the identity.
    """
    parents, lengths, rest, basis = skeleton_template(num_joints)
    J = num_joints
    z = rng.normal(size=(n, basis.shape[0])).astype(np.float32)
    aa = np.einsum("nk,kjc->njc", z, basis)             # (n, J, 3)
    g = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    cg, sg = np.cos(g), np.sin(g)
    zn = np.zeros_like(cg)
    on = np.ones_like(cg)
    Rg = np.stack([
        np.stack([cg, -sg, zn], axis=-1),
        np.stack([sg, cg, zn], axis=-1),
        np.stack([zn, zn, on], axis=-1),
    ], axis=-2)                                          # (n, 3, 3)
    Racc = np.zeros((n, J, 3, 3), np.float32)
    pos = np.zeros((n, J, 3), np.float32)
    Rj = _rodrigues_batch(aa)                            # (n, J, 3, 3)
    for j in range(J):
        if parents[j] < 0:
            Racc[:, j] = Rg @ Rj[:, j]
        else:
            Racc[:, j] = Racc[:, parents[j]] @ Rj[:, j]
            bone = lengths[j] * rest[j]
            pos[:, j] = pos[:, parents[j]] + np.einsum(
                "nij,j->ni", Racc[:, j], bone)
    return pos


def make_rig(num_views: int = 4, radius: float = 4500.0,
             height: float = 1500.0, focal: float = 1145.0,
             img_size: int = 1000, seed: int = 0):
    """H36M-like camera rig (mm units), returns list[Camera]."""
    rng = np.random.default_rng(seed)
    cams = []
    for v in range(num_views):
        ang = 2 * np.pi * v / num_views + rng.uniform(-0.1, 0.1)
        T = np.array([radius * np.cos(ang), radius * np.sin(ang), height],
                     np.float32)
        z = -T / np.linalg.norm(T)
        up = np.array([0, 0, 1.0], np.float32)
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        cams.append(Camera(
            R=np.stack([x, y, z]).astype(np.float32), T=T,
            f=np.array([focal, focal], np.float32),
            c=np.array([img_size / 2, img_size / 2], np.float32),
            k=np.array([-0.2, 0.24, -0.002], np.float32),
            p=np.array([0.001, -0.0005], np.float32)))
    return cams


class SyntheticMultiviewDataset(JointsDataset):
    """H36M-style synthetic rig: 4 views per time instant, GT 3D joints
    (world mm), per-view cameras, multi-view groups."""

    # empty for the same label-consistency reason as SyntheticPoseDataset:
    # blob colors are side-independent, so flips must not swap labels
    flip_pairs = ()
    root_idx = 0
    perf_higher_is_better = False   # evaluates like H36M (MPJPE)

    def __init__(self, cfg, num_frames: int = 16, is_train: bool = True,
                 image_shape=(256, 256), num_views: int = 4, seed: int = 0,
                 pose_mode: str = "uniform", depth_cue: float = 0.0,
                 **kwargs):
        self.image_shape = image_shape
        # depth_cue > 0: render each joint's blob at the size a fixed
        # metric ball would project to (sigma ∝ (f/z)^gamma, normalized
        # to the frame's mean depth so the average appearance matches the
        # cue-free renderer). gamma=1 is true perspective (±~13% size
        # across a skeleton's depth spread at this rig's distance);
        # gamma>1 amplifies the cue. 0 disables (constant sigma) — then
        # per-joint root-relative depth is UNOBSERVABLE from one view and
        # a monocular student's z error floors at the pose-prior error
        # (measured r5: held-out xy 35 mm vs |z| 103 mm, SS_TEACHER.md).
        self.depth_cue = float(depth_cue)
        J = int(cfg.MODEL.NUM_JOINTS)
        rng = np.random.default_rng(seed)
        self.rig = make_rig(num_views, img_size=image_shape[0] * 4,
                            seed=seed)
        records, groups = [], []
        import jax
        from epipolarpose_tpu.geometry import (project_point_radial,
                                               world_to_camera_frame)
        if pose_mode == "skeleton":
            # structured kinematic-tree skeletons (constant bone lengths,
            # low-rank pose manifold): root-relative MONOCULAR depth is
            # learnable, so an SS student can generalize to held-out
            # frames. With the i.i.d.-uniform bank below, per-joint
            # root-relative depth is unobservable from one view and
            # held-out MPJPE floors at the depth-prior error (~290 mm
            # measured r4) no matter how long the SS loop runs.
            poses_w = synth_skeleton_poses(rng, num_frames, J)
            poses_w += rng.uniform([-150.0, -150.0, 600.0],
                                   [150.0, 150.0, 1000.0],
                                   (num_frames, 1, 3)).astype(np.float32)
        else:
            # random "skeletons": joints in an 800mm cube near the origin
            poses_w = rng.uniform(-400, 400, (num_frames, J, 3)).astype(
                np.float32)
            poses_w[:, :, 2] += 900.0
        # ONE batched projection for all (view, frame) pairs, pinned to the
        # host CPU backend. Per-view eager jax calls here each cost a full
        # device round-trip under the tunneled axon backend (~0.4 s x 2 x
        # V x F measured r4: the 64-frame constructor took 14 MINUTES);
        # this is host metadata prep, not training compute — the training
        # path's geometry stays on-device inside the fused SS step.
        cam_b = jax.tree.map(
            lambda *x: np.stack(x)[:, None], *self.rig)  # leaves (V,1,...)
        # local_devices, not devices: under jax.distributed the global
        # device list starts with process 0's devices, and a non-zero
        # process CANNOT fetch from them ("spans non-addressable devices"
        # — this exact line killed pod-DP workers mid-suite in r5)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            px_all = np.asarray(project_point_radial(poses_w, cam_b)[0])
            pc_all = np.asarray(world_to_camera_frame(poses_w, cam_b))
        for t in range(num_frames):
            pose_w = poses_w[t]
            group = []
            for v, cam in enumerate(self.rig):
                px = px_all[v, t]
                center = px.mean(axis=0).astype(np.float32)
                extent = float(np.abs(px - center).max() * 2.4 + 40)
                pose_cam = pc_all[v, t]
                group.append(len(records))
                records.append(JointsRecord(
                    image=f"synthetic://{t}:{v}", center=center,
                    scale=np.array([extent / 200, extent / 200], np.float32),
                    joints=px.astype(np.float32),
                    joints_vis=np.ones(J, np.float32),
                    joints_3d=pose_cam.astype(np.float32),
                    meta={"subject": 1, "action": "Synth", "subaction": 1,
                          "camera": str(v), "frame": t, "pose_world": pose_w,
                          "view": v}))
            groups.append(tuple(group))
        self.view_groups = groups
        super().__init__(cfg, records, is_train, **kwargs)

    def _read_image(self, path: str) -> np.ndarray:
        t, v = map(int, path.split("://")[1].split(":"))
        rec = self.records[self.view_groups[t][v]]
        size = self.image_shape[0] * 4
        sigma = float(rec.scale[0] * 200 / 40)
        if self.depth_cue > 0:
            z = rec.joints_3d[:, 2]            # camera-frame depth (mm)
            sigma = sigma * (z.mean() / z) ** self.depth_cue
        img = _render_blobs(rec.joints, (size, size), len(rec.joints),
                            blob_sigma=sigma)
        return (img * 255).astype(np.uint8)

    def camera_for(self, rec: JointsRecord):
        return self.rig[int(rec.meta["camera"])]

    # reuse H36M's multi-view batching and evaluation
    view_batches = None  # set below

    def evaluate(self, cfg, preds, output_dir=None, **kwargs):
        from epipolarpose_tpu.data.h36m import H36MDataset
        return H36MDataset.evaluate(self, cfg, preds, output_dir, **kwargs)


from epipolarpose_tpu.data.h36m import H36MDataset as _H36M  # noqa: E402

SyntheticMultiviewDataset.view_batches = _H36M.view_batches
SyntheticMultiviewDataset._augmented_crops = _H36M._augmented_crops
SyntheticMultiviewDataset._aug_affines = _H36M._aug_affines
SyntheticMultiviewDataset._dual_batch_native = _H36M._dual_batch_native
SyntheticMultiviewDataset._teacher_crop_size = _H36M._teacher_crop_size
SyntheticMultiviewDataset._scale_teacher_crop = _H36M._scale_teacher_crop
SyntheticMultiviewDataset._preds_to_camera_mm = _H36M._preds_to_camera_mm
SyntheticMultiviewDataset.pss_centers = _H36M.pss_centers


def write_synthetic_mpii(root: str, cfg, num_samples: int = 8,
                         seed: int = 0) -> None:
    """Materialize an MPII-format tree (annot json + images) on disk."""
    import cv2
    os.makedirs(os.path.join(root, "annot"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    ds = SyntheticPoseDataset(cfg, num_samples, seed=seed)
    annots = []
    for i, rec in enumerate(ds.records):
        name = f"synth_{i:05d}.jpg"
        img = ds._read_image(rec.image)
        cv2.imwrite(os.path.join(root, "images", name),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        annots.append({
            "image": name,
            # undo the reader's center/scale adjustment (+15s, *1.25, -1)
            # and write MATLAB 1-based joint coords so round-trips match
            "center": [float(rec.center[0] + 1),
                       float(rec.center[1] + 1 - 15 * rec.scale[1] / 1.25)],
            "scale": float(rec.scale[0] / 1.25),
            "joints": (rec.joints + 1).tolist(),
            "joints_vis": rec.joints_vis.tolist(),
        })
    for split in ("train", "valid"):
        with open(os.path.join(root, "annot", f"{split}.json"), "w") as f:
            json.dump(annots, f)


def write_synthetic_h36m(root: str, cfg, num_frames: int = 6,
                         seed: int = 0, camera_ids=None) -> None:
    """Materialize an H36M-format tree (annot jsons + cameras + images,
    including zip-packed images for the zipreader path).

    ``camera_ids``: optional 4-tuple of camera names to write (e.g. the
    real H36M ids) so the tree reads back without patching
    ``h36m.CAMERA_IDS``; default keeps the synthetic '0'..'3' names.
    """
    import cv2
    import zipfile
    os.makedirs(os.path.join(root, "annot"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    ds = SyntheticMultiviewDataset(cfg, num_frames=num_frames, seed=seed)
    cam_name = (lambda v: str(camera_ids[v])) if camera_ids else str

    cameras = {}
    for v, cam in enumerate(ds.rig):
        cameras[f"1:{cam_name(v)}"] = {
            "R": np.asarray(cam.R).tolist(), "T": np.asarray(cam.T).tolist(),
            "f": np.asarray(cam.f).tolist(), "c": np.asarray(cam.c).tolist(),
            "k": np.asarray(cam.k).tolist(), "p": np.asarray(cam.p).tolist(),
        }
    with open(os.path.join(root, "annot", "cameras.json"), "w") as f:
        json.dump(cameras, f)

    zip_path = os.path.join(root, "images", "S1.zip")
    annots = []
    with zipfile.ZipFile(zip_path, "w") as z:
        for i, rec in enumerate(ds.records):
            name = f"S1/img_{i:05d}.jpg"
            img = ds._read_image(rec.image)
            ok, enc = cv2.imencode(
                ".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 95])
            z.writestr(name, enc.tobytes())
            annots.append({
                "image": f"{zip_path}@/{name}",
                "center": rec.center.tolist(),
                "scale": rec.scale.tolist(),
                "joints_2d": rec.joints.tolist(),
                "joints_vis": rec.joints_vis.tolist(),
                "joints_3d": rec.joints_3d.tolist(),
                "subject": 1,
                "action": rec.meta["action"],
                "subaction": rec.meta["subaction"],
                "camera": cam_name(int(rec.meta["camera"])),
                "frame": rec.meta["frame"],
            })
    for split in ("train", "valid"):
        with open(os.path.join(root, "annot", f"{split}.json"), "w") as f:
            json.dump(annots, f)
