"""Self-supervised epipolar training: teacher -> triangulate -> student.

The reference's headline contribution (paper §3, SURVEY.md §3.2) runs as a
host-side OFFLINE stage: frozen MPII 2D teacher over 4 views, numpy DLT per
joint, pseudo-GT written to disk, then normal 3D training. Here the WHOLE
pipeline is ONE jit on device (BASELINE.json north star: "the
self-supervised loop (2D teacher -> triangulated pseudo-GT -> 3D student)
runs data-parallel over a v5e slice"):

    teacher heatmaps (G·V crops)                 [MXU]
      -> argmax + quarter-offset decode          [VPU]
      -> crop->source affine + undistortion      [VPU]
      -> confidence-weighted batched DLT         [VPU, adjugate solver]
      -> per-view reprojection -> integral targets
      -> student forward/backward + adam update  [MXU]

Pseudo-GT never touches the host; the teacher runs on the same device
inside the same program, so XLA overlaps everything.

Augmentation: the TEACHER always sees clean crops (its crop->source mapping
must be the plain (center, scale) affine). Training loaders additionally
request dual-crop batches (``view_batches(augment=True)``): a second,
scale/rotation/flip-augmented crop per view that the STUDENT trains on,
with pseudo-GT remapped through the augmentation affine — the online
equivalent of the reference's offline-pseudo-GT + augmented training.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from epipolarpose_tpu.core.steps import normalize_images
from epipolarpose_tpu.geometry import (
    get_affine_transform, affine_transform, project_point_radial,
    triangulate, undistort_points, world_to_camera_frame,
)
from epipolarpose_tpu.ops import (
    generate_integral_target, integral_l1_loss, softmax_integral,
)
from epipolarpose_tpu.ops.heatmap import get_max_preds, post_process_preds
from epipolarpose_tpu.geometry.affine import transform_preds


class Teacher(NamedTuple):
    """Frozen 2D heatmap network (MPII pre-trained PoseResNet)."""

    model: Any
    params: Any
    batch_stats: Any

    def __call__(self, imgs):
        return self.model.apply(
            {"params": self.params, "batch_stats": self.batch_stats},
            imgs, train=False)


def load_teacher(cfg, fallback_state=None) -> Teacher:
    """Build the frozen 2D teacher from cfg.MODEL.PRETRAINED.

    Without a checkpoint (dev/synthetic runs) the teacher is initialized
    randomly — the pipeline still runs end-to-end but pseudo-GT is noise;
    tests use a GT-teacher instead (see make_gt_teacher).
    """
    from epipolarpose_tpu.models import PoseResNet, init_pose_net

    extra = cfg.MODEL.EXTRA
    model = PoseResNet(
        num_layers=int(extra.NUM_LAYERS),
        num_joints=int(cfg.MODEL.NUM_JOINTS),
        depth_dim=1,
        num_deconv_filters=tuple(extra.NUM_DECONV_FILTERS),
        num_deconv_kernels=tuple(extra.NUM_DECONV_KERNELS),
        final_conv_kernel=int(extra.FINAL_CONV_KERNEL),
        dtype=jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16"
        else jnp.float32)
    pretrained = str(cfg.MODEL.PRETRAINED)

    def init():
        p, s = init_pose_net(model, jax.random.PRNGKey(1),
                             tuple(cfg.MODEL.IMAGE_SIZE))
        return {"params": p, "batch_stats": s}

    if pretrained:
        # accepts BOTH formats, like every other checkpoint entry point:
        # a torch .pth(.tar) OR an orbax dir (e.g. the best/ checkpoint of
        # a fully-supervised 2D run trained with this repo). The template
        # is a lazy factory: the torch branch never pays the device init.
        from epipolarpose_tpu.core.checkpoint import load_model_variables
        variables = load_model_variables(pretrained, init,
                                         int(extra.NUM_LAYERS))
        return Teacher(model, variables["params"],
                       variables["batch_stats"])
    v = init()
    return Teacher(model, v["params"], v["batch_stats"])


def teacher_detect(cfg, teacher: Teacher, imgs, centers, scales):
    """Run the teacher and decode to source-image 2D + confidence.

    imgs: (B, H, W, 3) normalized crops; centers/scales: (B, 2).
    Returns (joints_src (B, J, 2), conf (B, J)).

    Heatmap dims come from the teacher's OUTPUT, not the config: the
    fully-convolutional teacher may run on reduced-resolution crops
    (TPU.SS_TEACHER_SCALE) and transform_preds maps whatever grid it
    produced back into the source frame via center/scale.
    """
    hm = teacher(imgs)
    hm_h, hm_w = int(hm.shape[-3]), int(hm.shape[-2])
    preds, maxvals = get_max_preds(hm)
    preds = post_process_preds(hm, preds)
    joints_src = transform_preds(preds, centers, scales, (hm_w, hm_h))
    # f32 regardless of TPU.COMPUTE_DTYPE: conf feeds DLT weights and host
    # reporting (ml_dtypes bf16 scalars don't even support ':.2f').
    return joints_src.astype(jnp.float32), maxvals.astype(jnp.float32)


def generate_pseudo_gt(cfg, detections, conf, cameras):
    """Triangulate multi-view detections into world-frame pseudo-GT.

    detections: (G, V, J, 2) source-image pixels; conf: (G, V, J);
    cameras: Camera pytree with leading (G, V) dims.
    Returns (X_world (G, J, 3), residual (G, J)).
    This is judged config (3): batched DLT/SVD pseudo-GT generation.
    """
    und = undistort_points(detections, cameras)
    method = str(cfg.TPU.TRIANGULATION.METHOD)
    weights = conf if bool(cfg.TPU.TRIANGULATION.CONF_WEIGHT) else None
    return triangulate(und, cameras.P, weights=weights, method=method)


def make_ss_train_step(cfg, model, teacher: Teacher, mesh=None,
                       donate: bool = True, detect_fn=None,
                       flip_pairs=(), refiner=None, fused_steps: int = 1):
    """Jitted self-supervised step over multi-view batches.

    batch: input (G, V, H, W, 3) in [0,1], center/scale (G, V, 2),
    camera pytree (G, V, ...), joints_vis (G, V, J).
    Returns (state, metrics) with loss + mean triangulation residual.

    ``detect_fn(imgs, centers, scales) -> (joints_src, conf)`` overrides the
    teacher (tests inject a perfect detector to isolate the geometry path).

    ``refiner``: optional callable (N, J, 3) -> (N, J, 3) applied to the
    root-relative triangulated poses before they become student targets —
    the paper's refinement unit in the loop ("SS + R" rows [M]); build one
    from a trained checkpoint with :func:`load_refiner`.

    ``fused_steps=K``: scan K optimizer steps per dispatch over a K-stacked
    super-batch (see ``core.steps.compile_step``).
    """
    image_size = tuple(int(v) for v in cfg.MODEL.IMAGE_SIZE)
    depth_dim = int(cfg.MODEL.EXTRA.DEPTH_DIM)
    depth_bound = float(cfg.MODEL.EXTRA.get("DEPTH_BOUND", 1000.0))
    num_joints = int(cfg.MODEL.NUM_JOINTS)
    root_idx = 0
    conf_min = float(cfg.TPU.get("SS_CONF_MIN", 0.05))

    def step(state, batch, tvars=None):
        G, V = batch["input"].shape[:2]
        flat = lambda x: x.reshape((G * V,) + x.shape[2:])
        imgs = normalize_images(flat(batch["input"]))
        centers = flat(batch["center"])
        scales = flat(batch["scale"])

        # 1) frozen teacher -> source-space 2D detections. Precomputed
        # detections may instead ride in the batch (det_src (G, V, J, 2)
        # source px + optional det_conf): the reference's OFFLINE
        # pseudo-GT route (detections generated once, e.g. by
        # scripts/generate_pseudo_gt.py) — and it isolates the geometry
        # path from the teacher in experiments
        if "det_src" in batch:
            joints_src = flat(batch["det_src"])
            conf = flat(batch["det_conf"]) if "det_conf" in batch else \
                jnp.ones(joints_src.shape[:-1], joints_src.dtype)
        elif detect_fn is not None:
            joints_src, conf = detect_fn(imgs, centers, scales)
        else:
            # tvars (the frozen teacher's params/batch_stats) arrive as a
            # jit ARGUMENT via compile_step(const_args=...) — closed over,
            # they bake ~100 MB of weights into the executable as
            # constants (measured r5: 300 MB cache entries, the dominant
            # cold-compile cost of every SS step)
            t = Teacher(teacher.model, tvars[0], tvars[1])
            joints_src, conf = teacher_detect(cfg, t, imgs, centers,
                                              scales)
        joints_src = jax.lax.stop_gradient(joints_src)
        conf = jax.lax.stop_gradient(conf)

        # 2) triangulate into pseudo-GT; 3) project into each view
        cam = batch["camera"]
        det = joints_src.reshape(G, V, num_joints, 2)
        if str(cfg.TPU.SS_CAMERAS) == "estimated":
            # calibration-free: recover the rig from the detections
            from epipolarpose_tpu.geometry.rig import pseudo_gt_uncalibrated
            bone_mm = float(cfg.TPU.get("SS_BONE_LENGTH_MM", 0.0))
            bones = _h36m_bones(num_joints) if bone_mm > 0 else None
            # all groups share the physical rig; intrinsics from group 0
            intrinsics = jax.tree.map(lambda x: x[0], cam)
            X0, P_est, res = pseudo_gt_uncalibrated(
                det, intrinsics, conf=conf.reshape(G, V, -1),
                bone_pairs=bones,
                bone_length_mm=bone_mm if bone_mm > 0 else None)
            if refiner is not None:
                root = X0[:, root_idx:root_idx + 1]
                X0 = root + jax.lax.stop_gradient(refiner(X0 - root))
            # X0 is in camera-0 frame; per-view coords via estimated [R|t]
            Xh = jnp.concatenate([X0, jnp.ones_like(X0[..., :1])], -1)
            X_cam = jnp.einsum("vij,gnj->gvni", P_est, Xh)
            z_safe = jnp.where(jnp.abs(X_cam[..., 2:3]) < 1e-6, 1e-6,
                               X_cam[..., 2:3])
            xyn = X_cam[..., :2] / z_safe               # normalized coords
            px = (xyn * intrinsics.f[None, :, None, :]
                  + intrinsics.c[None, :, None, :])
        else:
            X_w, res = generate_pseudo_gt(cfg, det, conf.reshape(G, V, -1),
                                          cam)
            if refiner is not None:
                root = X_w[:, root_idx:root_idx + 1]
                X_w = root + jax.lax.stop_gradient(refiner(X_w - root))
            X_cam = world_to_camera_frame(X_w[:, None], cam)  # (G, V, J, 3)
            px, _ = project_point_radial(X_w[:, None], cam)   # (G, V, J, 2)
        M = get_affine_transform(centers, scales, 0.0, image_size)
        xy_crop = affine_transform(flat(px), M[:, None, :, :])
        z_rel = flat(X_cam[..., 2])
        z_rel = z_rel - z_rel[..., root_idx:root_idx + 1]

        vis = flat(batch["joints_vis"]) if "joints_vis" in batch else \
            jnp.ones_like(z_rel)
        # gate targets on the MIN teacher confidence across views — a joint
        # mistriangulated anywhere shouldn't supervise the student
        conf_ok = (conf.reshape(G, V, -1).min(axis=1) > conf_min)
        vis = vis * jnp.repeat(conf_ok.astype(vis.dtype), V, axis=0)

        # dual-crop augmentation: the STUDENT trains on the augmented crop,
        # with pseudo-GT remapped through the aug affine (+ L/R identity
        # swap on flipped samples); depth is in-plane-rotation invariant
        if "input_aug" in batch:
            imgs = normalize_images(flat(batch["input_aug"]))
            M_aug = flat(batch["aug_M"])
            xy_crop = affine_transform(flat(px), M_aug[:, None, :, :])
            is_flip = flat(batch["aug_flip"])[:, None] > 0.5
            perm = list(range(num_joints))
            for a, b in flip_pairs:
                if a < num_joints and b < num_joints:
                    perm[a], perm[b] = perm[b], perm[a]
            perm = jnp.asarray(perm)
            xy_crop = jnp.where(is_flip[..., None], xy_crop[:, perm],
                                xy_crop)
            z_rel = jnp.where(is_flip, z_rel[:, perm], z_rel)
            vis = jnp.where(is_flip, vis[:, perm], vis)
        target, tw = generate_integral_target(
            xy_crop, vis, image_size, depth_bound=depth_bound,
            joints_depth=z_rel)
        # degenerate rigs/triangulations can emit nan/inf targets — zero
        # their weight and sanitize so masking is airtight
        finite = jnp.all(jnp.isfinite(target), axis=-1)
        tw = tw * finite.astype(tw.dtype)
        target = jnp.nan_to_num(target)
        target = jax.lax.stop_gradient(target)
        tw = jax.lax.stop_gradient(tw)

        # 4) student update
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, mutable=["batch_stats"])
            coords = softmax_integral(out, num_joints, depth_dim)
            return integral_l1_loss(coords, target, tw), \
                mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        return state, {"loss": loss, "tri_residual": res.mean(),
                       "teacher_conf": conf.mean()}

    from epipolarpose_tpu.core.steps import compile_step
    if teacher is not None and detect_fn is None:
        return compile_step(step, mesh=mesh, donate=donate,
                            fused_steps=fused_steps,
                            const_args=(teacher.params,
                                        teacher.batch_stats))
    return compile_step(lambda st, b: step(st, b), mesh=mesh,
                        donate=donate, fused_steps=fused_steps)


def load_refiner(cfg, checkpoint_path: str):
    """Load a trained refinement unit -> callable for make_ss_train_step.

    Width/depth are INFERRED from the checkpoint's parameter shapes (the
    trainer exposes --hidden/--blocks; a fixed-arch template restore would
    reject any non-default refiner)."""
    from epipolarpose_tpu.core.checkpoint import load_variables, restore_raw
    from epipolarpose_tpu.core.refine import create_refiner_state, \
        make_refiner_apply
    raw = restore_raw(checkpoint_path)
    stem = raw["params"]["_LinearBlock_0"]["Dense_0"]["kernel"]
    hidden = int(np.asarray(stem).shape[1])
    blocks = sum(1 for k in raw["params"] if k.startswith("_ResidualBlock_"))
    model, state = create_refiner_state(int(cfg.MODEL.NUM_JOINTS),
                                        jax.random.PRNGKey(0),
                                        hidden=hidden, blocks=blocks)
    restored = load_variables(checkpoint_path,
                              {"params": state.params,
                               "batch_stats": state.batch_stats})
    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"])
    apply = make_refiner_apply(model)
    return lambda poses: apply(state, poses)


def _h36m_bones(num_joints: int):
    """Limb pairs used for bone-length scale fixing (H36M 17-joint order)."""
    pairs = ((1, 2), (2, 3), (4, 5), (5, 6), (11, 12), (12, 13),
             (14, 15), (15, 16))
    return [p for p in pairs if p[0] < num_joints and p[1] < num_joints]


def make_gt_teacher(joints_src, conf=None):
    """Test/dryrun helper: a 'perfect teacher' emitting fixed detections.

    ``joints_src``: (B, J, 2) source-space GT detections captured at build
    time (B = flattened G·V of the batch it will be used with); ``conf``:
    optional (B, J). Returns ``detect(imgs, centers, scales)`` with the
    ``detect_fn`` signature :func:`make_ss_train_step` expects — it ignores
    the images and returns the captured detections, isolating the
    triangulation/student path from teacher quality.
    """
    joints_src = jnp.asarray(joints_src, jnp.float32)
    c = jnp.asarray(conf, jnp.float32) if conf is not None else \
        jnp.ones(joints_src.shape[:-1], jnp.float32)

    def detect(imgs, centers, scales):
        del imgs, centers, scales
        return joints_src, c
    return detect
