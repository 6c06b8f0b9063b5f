"""Human3.6M dataset: multi-view records, cameras, MPJPE evaluation.

Reference ``lib/dataset/h36m.py`` (SURVEY.md §2.A [M]): subjects S1,S5,S6,
S7,S8 train / S9,S11 test; images served from per-subject zips via the
zipreader; 4 synchronized cameras (ids 54138969, 55011271, 58860488,
60457274); 17-joint skeleton; labels selectable between GT and triangulated
pseudo-GT; evaluation MPJPE per action (+ PA-MPJPE / NMPJPE / PSS).

On-disk layout expected here (reference-compatible in spirit; exact files
re-verified once the reference mounts — §0 caveat):
  <root>/annot/<image_set>.json   list of samples, fields:
      image, center [2], scale [2], joints_2d [J,2], joints_3d [J,3]
      (camera-frame mm, root-centered or absolute), subject, action,
      subaction, camera, frame
  <root>/annot/cameras.json       {"<subject>:<camera>": {R, T, f, c, k, p}}

H36M 17-joint order (integral-pose convention [M]):
  0 pelv 1 rhip 2 rkne 3 rank 4 lhip 5 lkne 6 lank 7 spine 8 neck
  9 head 10 site 11 lsho 12 lelb 13 lwri 14 rsho 15 relb 16 rwri
"""

from __future__ import annotations

import collections
import json
import os

import numpy as np

from epipolarpose_tpu.data.joints_dataset import JointsDataset, JointsRecord
from epipolarpose_tpu.geometry.camera import Camera

CAMERA_IDS = ("54138969", "55011271", "58860488", "60457274")
TRAIN_SUBJECTS = (1, 5, 6, 7, 8)
TEST_SUBJECTS = (9, 11)
FLIP_PAIRS = ((1, 4), (2, 5), (3, 6), (11, 14), (12, 15), (13, 16))
ROOT_IDX = 0
ACTIONS = ("Directions", "Discussion", "Eating", "Greeting", "Phoning",
           "Photo", "Posing", "Purchases", "Sitting", "SittingDown",
           "Smoking", "Waiting", "WalkDog", "Walking", "WalkTogether")


def load_cameras(path: str) -> dict[str, Camera]:
    """cameras.json -> {"<subject>:<camera_id>": Camera} (numpy fields)."""
    with open(path) as f:
        raw = json.load(f)
    cams = {}
    for key, c in raw.items():
        cams[key] = Camera(
            R=np.array(c["R"], np.float32).reshape(3, 3),
            T=np.array(c["T"], np.float32).reshape(3),
            f=np.array(c["f"], np.float32).reshape(2),
            c=np.array(c["c"], np.float32).reshape(2),
            k=np.array(c["k"], np.float32).reshape(3),
            p=np.array(c["p"], np.float32).reshape(2),
        )
    return cams


class H36MDataset(JointsDataset):
    flip_pairs = FLIP_PAIRS
    root_idx = ROOT_IDX
    perf_higher_is_better = False   # perf indicator is MPJPE (mm, lower=better)

    def __init__(self, cfg, root: str, image_set: str, is_train: bool,
                 **kwargs):
        self.root = root
        self.image_set = image_set
        self.subsample = int(cfg.DATASET.get("SUBSAMPLE", 1)) or 1
        records, cameras, groups = self._load(cfg, root, image_set)
        self.cameras = cameras
        self.view_groups = groups     # [(rec_idx per camera view), ...]
        super().__init__(cfg, records, is_train, **kwargs)

    def _load(self, cfg, root, image_set):
        annot_file = os.path.join(root, "annot", f"{image_set}.json")
        with open(annot_file) as f:
            annots = json.load(f)
        cam_file = os.path.join(root, "annot", "cameras.json")
        cameras = load_cameras(cam_file) if os.path.exists(cam_file) else {}

        records = []
        group_map: dict[tuple, dict[str, int]] = collections.defaultdict(dict)
        # SUBSAMPLE strides over TIME INSTANTS (frame keys in order of
        # first appearance), not flat records: a per-record stride would
        # keep one camera of frame 0, one of frame 1, ... and destroy
        # every 4-view group (no SS batches at all). Frame-key striding
        # keeps ALL views of every Nth instant — same record count on the
        # standard 4-camera layout, and the reference's "every 64th
        # frame" eval protocol reads naturally as frames, not rows [M].
        frame_ids: dict[tuple, int] = {}
        for i, a in enumerate(annots):
            fkey = (a.get("subject"), a.get("action"), a.get("subaction"),
                    a.get("frame"))
            if frame_ids.setdefault(fkey, len(frame_ids)) % self.subsample:
                continue
            joints3d = (np.array(a["joints_3d"], np.float32)
                        if "joints_3d" in a else None)
            rec = JointsRecord(
                image=os.path.join(root, "images", a["image"])
                if not str(a["image"]).startswith("/") and "@" not in
                str(a["image"]) else a["image"],
                center=np.array(a["center"], np.float32),
                scale=np.array(a["scale"], np.float32).reshape(-1)[:2]
                if np.ndim(a["scale"]) else np.array(
                    [a["scale"], a["scale"]], np.float32),
                joints=np.array(a["joints_2d"], np.float32),
                joints_vis=np.array(
                    a.get("joints_vis", np.ones(len(a["joints_2d"]))),
                    np.float32),
                joints_3d=joints3d,
                meta={
                    "subject": a.get("subject"),
                    "action": a.get("action"),
                    "subaction": a.get("subaction"),
                    "camera": str(a.get("camera")),
                    "frame": a.get("frame"),
                })
            idx = len(records)
            records.append(rec)
            key = (a.get("subject"), a.get("action"), a.get("subaction"),
                   a.get("frame"))
            group_map[key][str(a.get("camera"))] = idx

        groups = [tuple(g[c] for c in CAMERA_IDS)
                  for g in group_map.values()
                  if all(c in g for c in CAMERA_IDS)]
        return records, cameras, groups

    def camera_for(self, rec: JointsRecord) -> Camera | None:
        key = f"{rec.meta['subject']}:{rec.meta['camera']}"
        return self.cameras.get(key)

    # ---------------------------------------------------- multi-view batches
    def view_batches(self, groups_per_batch: int, seed: int = 0,
                     shuffle: bool | None = None, augment: bool = False,
                     process_index: int = 0, process_count: int = 1):
        """Yield multi-view batches for self-supervision: dict with
        input (G, V, H, W, 3), centers/scales (G, V, 2), camera pytree with
        leading (G, V) dims — everything the teacher->triangulate->student
        pipeline needs (SURVEY §3.2).

        ``augment=True`` additionally emits a SECOND, augmented crop per
        view (``input_aug``, its source->crop affine ``aug_M`` with random
        scale/rotation, and ``aug_flip``): the teacher sees the clean crop,
        the student trains on the augmented one (dual-crop SS — the online
        equivalent of the reference's offline-pseudo-GT + augmented
        training).
        """
        n = len(self.view_groups)
        order = np.arange(n)
        if shuffle if shuffle is not None else self.is_train:
            np.random.default_rng(seed).shuffle(order)
        stop = n - (n % groups_per_batch)
        for b in range(0, stop, groups_per_batch):
            gidx = order[b:b + groups_per_batch]
            if process_count > 1:
                # pod DP: same global group order everywhere; this host
                # decodes only its groups (see host_shard_indices)
                from epipolarpose_tpu.data.joints_dataset import \
                    host_shard_indices
                gidx = host_shard_indices(gidx, process_index, process_count)
            flat = [i for g in gidx for i in self.view_groups[g]]
            t_scale = float(getattr(self.cfg.TPU, "SS_TEACHER_SCALE", 1.0)) \
                if augment else 1.0
            batch = None
            if augment:
                # fused dual-crop fast path: ONE decode per frame feeds both
                # the clean teacher crop and the augmented student crop
                batch = self._dual_batch_native(flat, seed_clean=seed + b,
                                                seed_aug=seed + b + 1,
                                                teacher_scale=t_scale)
            if batch is None:
                was_train = self.is_train
                try:
                    self.is_train = False    # clean crops for the teacher
                    batch = self.get_batch(flat, seed=seed + b)
                finally:
                    self.is_train = was_train
                if augment:
                    batch.update(self._augmented_crops(flat,
                                                       seed=seed + b + 1))
                    if t_scale != 1.0:
                        batch = self._scale_teacher_crop(batch, t_scale)
            V = len(CAMERA_IDS)
            out = {k: v.reshape((len(gidx), V) + v.shape[1:])
                   for k, v in batch.items()}
            cams = [self.camera_for(self.records[i]) for i in flat]
            if all(c is not None for c in cams):
                import jax
                cam = jax.tree.map(lambda *x: np.stack(x).reshape(
                    (len(gidx), V) + np.asarray(x[0]).shape), *cams)
                out["camera"] = cam
            yield out

    def _aug_affines(self, indices, seed: int):
        """Augmented-crop affines + flip flags for dual-crop SS.

        Returns (Ms (N, 2, 3) source->crop with random scale/rotation and a
        crop-space horizontal flip folded in, flips (N,) float 0/1)."""
        n = len(indices)
        Ms = np.zeros((n, 2, 3), np.float32)
        flips = np.zeros(n, np.float32)
        from epipolarpose_tpu.geometry import affine as A
        for k, idx in enumerate(indices):
            rec = self.records[idx]
            # record-index seeding: pod-host slices must reproduce the
            # single-process batch content (see JointsDataset._get_batch_pool)
            rng = np.random.default_rng(seed * 1_000_003 + int(idx))
            s_mult, rot, do_flip = self._augment_params(rng)
            M = A.get_affine_transform_np(
                rec.center, rec.scale * s_mult, rot, self.image_size)
            if do_flip:
                # fold the horizontal crop-space flip into the affine:
                # M_flip = F ∘ M with F: x' = (W-1) - x
                F = np.array([[-1.0, 0.0, self.image_size[0] - 1.0],
                              [0.0, 1.0, 0.0]], np.float32)
                M = np.concatenate(
                    [F[:, :2] @ M[:, :2],
                     (F[:, :2] @ M[:, 2] + F[:, 2])[:, None]], axis=1)
            Ms[k] = M
            flips[k] = float(do_flip)
        return Ms, flips

    def _teacher_crop_size(self, teacher_scale: float):
        return (max(int(round(self.image_size[0] * teacher_scale)), 1),
                max(int(round(self.image_size[1] * teacher_scale)), 1))

    def _scale_teacher_crop(self, batch: dict, teacher_scale: float) -> dict:
        """Fallback (non-native) half-res teacher crop: bilinear-resize the
        full-res clean crop. The native path warps directly at the scaled
        size; the difference (resample-of-warp vs direct warp, a <=0.5-px
        pixel-center offset) is below the teacher's heatmap-argmax
        precision. ``joints`` follow ``input`` into the scaled crop frame.
        """
        import cv2
        W, H = self._teacher_crop_size(teacher_scale)
        batch = dict(batch)
        batch["input"] = np.stack(
            [cv2.resize(im, (W, H), interpolation=cv2.INTER_LINEAR)
             for im in batch["input"]])
        if "joints" in batch:
            # get_affine_transform maps the box to [0,W]x[0,H] in continuous
            # coords, so the scaled-crop affine is exactly s * M1
            j = batch["joints"].copy()
            j[..., :2] *= np.float32(teacher_scale)
            batch["joints"] = j
        return batch

    def _dual_batch_native(self, indices, seed_clean: int, seed_aug: int,
                           teacher_scale: float = 1.0):
        """Fused dual-crop batch: decode each frame ONCE, warp twice.

        Produces the full multi-view batch (clean teacher crop as ``input``
        + augmented student crop as ``input_aug``) through one
        decode_warp2 native call — halves the dominant host decode cost vs
        get_batch + _augmented_crops. ``teacher_scale`` < 1 warps the clean
        crop at a reduced size (TPU.SS_TEACHER_SCALE — the teacher only
        feeds a heatmap argmax; measured in docs/PROFILE_r4.md); ``joints``
        are then in the scaled crop frame. Returns None when the native
        loader is unavailable/ineligible (callers fall back to the two-pass
        path).
        """
        if not self._use_native(indices, seed_clean):
            return None
        from epipolarpose_tpu.data import fastloader
        from epipolarpose_tpu.data.zipreader import read_file_bytes
        from epipolarpose_tpu.geometry import affine as A

        recs = [self.records[i] for i in indices]
        bufs = list(self.pool.map(lambda r: read_file_bytes(r.image), recs))
        centers = np.stack([r.center for r in recs]).astype(np.float32)
        scales = np.stack([r.scale for r in recs]).astype(np.float32)
        joints = np.stack([r.joints for r in recs]).astype(np.float32)
        vis = np.stack([r.joints_vis for r in recs]).astype(np.float32)
        n = len(recs)
        t_size = self.image_size if teacher_scale == 1.0 else \
            self._teacher_crop_size(teacher_scale)
        M1 = A.get_affine_transform_np(centers, scales,
                                       np.zeros(n, np.float32),
                                       t_size)
        M2, flips = self._aug_affines(indices, seed_aug)
        crops, crops_aug = fastloader.decode_warp2_batch(
            bufs, M1, M2, self.image_size, output_size1=t_size)
        joints_crop = np.einsum("nij,nkj->nki", M1[:, :, :2], joints) \
            + M1[:, None, :, 2]
        batch = dict(input=crops, joints=joints_crop.astype(np.float32),
                     joints_vis=vis, center=centers, scale=scales,
                     rotation=np.zeros(n, np.float32),
                     index=np.asarray(indices, np.int64),
                     input_aug=crops_aug, aug_M=M2, aug_flip=flips)
        if recs[0].joints_3d is not None:
            batch["joints_3d"] = np.stack(
                [r.joints_3d for r in recs]).astype(np.float32)
        return batch

    def _augmented_crops(self, indices, seed: int) -> dict:
        """Second (augmented) crop per sample for dual-crop SS.

        Fast path: ONE fused native decode+warp call for the whole batch
        (rotation/flip folded into the affines — the C++ loader handles
        arbitrary affines and DCT-scales the decode); cv2 fallback
        otherwise."""
        Ms, flips = self._aug_affines(indices, seed)

        if self._use_native(indices, seed):
            from epipolarpose_tpu.data import fastloader
            from epipolarpose_tpu.data.zipreader import read_file_bytes
            bufs = list(self.pool.map(
                lambda i: read_file_bytes(self.records[i].image), indices))
            crops = fastloader.decode_warp_batch(bufs, Ms, self.image_size)
        else:
            import cv2
            crops = np.zeros(
                (len(indices),) + tuple(self.image_size[::-1]) + (3,),
                np.uint8)
            for k, idx in enumerate(indices):
                img = self._read_image(self.records[idx].image)
                crops[k] = cv2.warpAffine(img, Ms[k], self.image_size,
                                          flags=cv2.INTER_LINEAR)
        return {"input_aug": crops, "aug_M": Ms, "aug_flip": flips}

    # ------------------------------------------------------------ evaluate
    def evaluate(self, cfg, preds, output_dir=None, **kwargs):
        """MPJPE per action + mean; NMPJPE + PA-MPJPE (protocol 2).

        preds: (N, J, 3) as emitted by the integral eval step — (x, y) in
        source-image PIXELS, z in root-relative camera mm. When cameras and
        absolute-depth GT are available (the real H36M protocol), preds are
        back-projected to camera-frame mm with the GT root depth
        (integral-pose eval protocol [M]: undistort -> pixel2cam). Without
        cameras (legacy/synthetic paths) preds are taken as camera-frame mm
        directly.
        """
        from epipolarpose_tpu.ops.metrics import mpjpe, nmpjpe, pa_mpjpe
        preds = np.asarray(preds)
        recs = self.records[:len(preds)]
        gts, actions = [], []
        for r in recs:
            g = r.joints_3d
            gts.append(g - g[self.root_idx:self.root_idx + 1])
            actions.append((r.meta or {}).get("action", "All"))
        gts = np.stack(gts)

        preds = self._preds_to_camera_mm(preds, recs)
        preds = preds - preds[:, self.root_idx:self.root_idx + 1]

        name_value = {}
        actions_arr = np.array([str(a) for a in actions])
        for act in sorted(set(actions_arr.tolist())):
            m = actions_arr == act
            name_value[str(act)] = float(mpjpe(preds[m], gts[m]))
        mean = float(mpjpe(preds, gts))
        name_value["MPJPE"] = mean
        name_value["NMPJPE"] = float(nmpjpe(preds, gts))
        name_value["PA-MPJPE"] = float(pa_mpjpe(preds, gts))

        # PSS@{50,100} — the paper's distribution-aware metric [M]. Cluster
        # centers are fit on TRAIN-split poses (paper protocol), cached on
        # disk; falls back to the eval GT only when no train annot exists.
        from epipolarpose_tpu.ops.metrics import pss
        for k in (50, 100):
            centers = self.pss_centers(k, fallback_gts=gts)
            if centers is not None:
                name_value[f"PSS@{k}"] = float(
                    pss(preds.astype(np.float32), gts.astype(np.float32),
                        centers))
        return name_value, mean

    def pss_centers(self, k: int, fallback_gts=None):
        """k-means PSS centers from TRAIN-split root-centered poses.

        Cached at <root>/annot/pss_centers_k{k}.npy. The paper fits the
        pose clusters on training data [M]; fitting on the eval set (the
        round-1 behavior) skews the metric. Returns None when neither a
        train annot nor enough fallback poses exist.
        """
        import jax
        from epipolarpose_tpu.ops.metrics import (PSS_EMBED_VERSION,
                                                  fit_pss_centers)

        # cache name keys on the embedding version: centers fit under an
        # older _pose_embed definition must not be reused (ADVICE r2)
        cache = os.path.join(
            self.root, "annot",
            f"pss_centers_k{k}_v{PSS_EMBED_VERSION}.npy") \
            if getattr(self, "root", None) else None
        if cache and os.path.exists(cache):
            return np.load(cache)

        poses = None
        train_annot = os.path.join(self.root, "annot", "train.json") \
            if getattr(self, "root", None) else None
        if train_annot and os.path.exists(train_annot):
            with open(train_annot) as f:
                annots = json.load(f)
            ps = [np.asarray(a["joints_3d"], np.float32)
                  for a in annots if "joints_3d" in a]
            if len(ps) >= 2 * k:
                poses = np.stack(ps)
                poses = poses - poses[:, self.root_idx:self.root_idx + 1]
        from_train_split = poses is not None
        if poses is None:
            if fallback_gts is None or len(fallback_gts) < 2 * k:
                return None
            poses = np.asarray(fallback_gts, np.float32)

        centers = np.asarray(fit_pss_centers(
            jax.random.PRNGKey(0), poses.astype(np.float32), k=k))
        # cache ONLY train-split fits: persisting an eval-set fallback fit
        # would permanently pin the skewed centers the train-split protocol
        # exists to avoid, even after train.json appears
        if cache and from_train_split:
            try:
                np.save(cache, centers)
            except OSError:
                pass
        return centers

    def _preds_to_camera_mm(self, preds, recs):
        """Lift eval-step predictions (x, y px; z rel-mm) to camera mm.

        Uses the GT root depth per the integral-pose protocol; predictions
        are undistorted before the pinhole back-projection so the camera's
        radial/tangential model is honored. Falls back to interpreting
        preds as camera-frame mm when cameras or absolute GT depth are
        missing (synthetic/legacy data)."""
        cams = [self.camera_for(r) for r in recs]
        root_z = np.asarray([r.joints_3d[self.root_idx, 2] for r in recs],
                            np.float32)
        if any(c is None for c in cams) or np.median(np.abs(root_z)) < 1.0:
            return preds
        import jax
        import jax.numpy as jnp
        from epipolarpose_tpu.geometry import pixel2cam, undistort_points
        cam_b = jax.tree.map(lambda *x: np.stack(x), *cams)
        px = undistort_points(jnp.asarray(preds[..., :2], jnp.float32),
                              cam_b)
        depth = jnp.asarray(preds[..., 2], jnp.float32) + root_z[:, None]
        return np.asarray(pixel2cam(px, depth, cam_b))
