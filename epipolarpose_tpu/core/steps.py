"""Jitted train / eval steps with fused on-device preprocessing.

This is where the north-star fusion happens (BASELINE.json): normalization,
heatmap/integral target generation, the model forward/backward, the loss and
train-time accuracy all live inside ONE jit per step; the host only ships
decoded crops + joint coords. Sharding: batches are annotated over the
mesh's ``data`` axis, parameters replicated — XLA derives the gradient
all-reduce (the reference's DataParallel equivalent, SURVEY §2.C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from epipolarpose_tpu.data.joints_dataset import IMAGENET_MEAN, IMAGENET_STD
from epipolarpose_tpu.ops import (
    generate_integral_target, generate_target, heatmap_accuracy,
    integral_l1_loss, joints_mse_loss, softmax_integral,
)
from epipolarpose_tpu.ops.heatmap import get_final_preds
from epipolarpose_tpu.geometry.affine import (flip_back, flip_back_volume,
                                              transform_preds)


def normalize_images(x):
    """(N, H, W, 3) -> ImageNet-normalized (reference Normalize).

    Accepts float crops in [0,1] OR uint8 crops in [0,255]: loaders ship
    uint8 (4x fewer host->device bytes) and the /255 folds into this affine
    inside the jit. Both paths produce identical values (u8/255 is exact in
    f32).
    """
    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def _root_relative_depth(joints_3d, root_idx: int):
    z = joints_3d[..., 2]
    return z - z[..., root_idx:root_idx + 1]


def compile_step(step, mesh=None, donate: bool = True,
                 fused_steps: int = 1, const_args=None):
    """jit a ``(state, batch) -> (state, metrics)`` step function.

    ``fused_steps=K > 1`` wraps the step in a ``lax.scan`` over a
    SUPER-batch — K host batches stacked on a new leading axis (see
    ``data.pipeline.stack_batches``) — so ONE Python dispatch runs K
    optimizer steps. Per-step dispatch through a high-RTT host↔device link
    costs a fixed round trip (measured ~0.6 s through a tunneled PJRT
    device, VERDICT r2 weak #1); fusing divides that tax by K. Metrics
    come back with a leading (K,) axis, one entry per inner step.

    ``const_args``: an optional pytree of arrays the step needs but that
    never changes across calls (e.g. a frozen teacher's variables). The
    step must then take ``(state, batch, consts)``; the pytree is passed
    as a jit ARGUMENT and partially applied here. Closing over large
    arrays instead bakes them into the executable as constants — measured
    r5: the frozen r50 teacher baked ~300 MB into each SS-step compile
    cache entry and dominated its cold-compile time.
    """
    if fused_steps > 1:
        inner = step
        if const_args is not None:
            def step(state, superbatch, consts):  # noqa: F811
                return jax.lax.scan(
                    lambda st, b: inner(st, b, consts), state, superbatch)
        else:
            def step(state, superbatch):          # noqa: F811
                return jax.lax.scan(inner, state, superbatch)

    donate_args = (0,) if donate else ()
    if mesh is not None:
        from epipolarpose_tpu.parallel import replicated
        repl = replicated(mesh)
        in_sh = (repl, None) if const_args is None else (repl, None, repl)
        jitted = jax.jit(step, donate_argnums=donate_args,
                         in_shardings=in_sh,
                         out_shardings=(repl, repl))
    else:
        jitted = jax.jit(step, donate_argnums=donate_args)
    if const_args is None:
        return jitted
    if mesh is not None:
        consts = jax.device_put(const_args, replicated(mesh))
    else:
        consts = jax.device_put(const_args)

    def wrapper(state, batch):
        return jitted(state, batch, consts)
    # callers that re-wrap the step in an outer jit (bench loops) must
    # pass consts as a TRACED argument of their own — calling `wrapper`
    # under a trace would capture `consts` concrete and bake it after all
    wrapper.jitted = jitted
    wrapper.const_args = consts
    return wrapper


def make_train_step(cfg, model, mesh=None, donate: bool = True,
                    fused_steps: int = 1):
    """Build the jitted train step for the configured target type.

    Returns ``train_step(state, batch) -> (state, metrics)`` where metrics
    has scalar ``loss`` (+ ``acc`` for heatmap training). With
    ``fused_steps=K`` the step instead takes a K-stacked super-batch and
    runs K optimizer steps per call (see :func:`compile_step`).
    """
    target_type = cfg.MODEL.EXTRA.TARGET_TYPE
    image_size = tuple(int(v) for v in cfg.MODEL.IMAGE_SIZE)
    heatmap_size = tuple(int(v) for v in cfg.MODEL.EXTRA.HEATMAP_SIZE)
    sigma = float(cfg.MODEL.EXTRA.SIGMA)
    depth_dim = int(cfg.MODEL.EXTRA.DEPTH_DIM)
    depth_bound = float(cfg.MODEL.EXTRA.get("DEPTH_BOUND", 1000.0))
    num_joints = int(cfg.MODEL.NUM_JOINTS)
    use_tw = bool(cfg.LOSS.USE_TARGET_WEIGHT)
    root_idx = 0

    def step(state, batch):
        imgs = normalize_images(batch["input"])

        if target_type == "gaussian":
            target, tw = generate_target(
                batch["joints"], batch["joints_vis"], heatmap_size, sigma,
                image_size)
        else:
            depth = None
            if "joints_3d" in batch:
                depth = _root_relative_depth(batch["joints_3d"], root_idx)
            target, tw = generate_integral_target(
                batch["joints"], batch["joints_vis"], image_size,
                depth_bound=depth_bound, joints_depth=depth)
        if not use_tw:
            tw = None

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, mutable=["batch_stats"])
            if target_type == "gaussian":
                loss = joints_mse_loss(out, target, tw)
            else:
                coords = softmax_integral(out, num_joints, depth_dim)
                loss = integral_l1_loss(coords, target, tw)
            return loss, (out, mutated["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_stats)
        metrics = {"loss": loss}
        if target_type == "gaussian":
            _, avg_acc, _, _ = heatmap_accuracy(out, target)
            metrics["acc"] = avg_acc
        return state, metrics

    # state replicated; batch shardings are inherited from the arrays
    # (shard_batch places them: batch over 'data', image rows over
    # 'model' when spatial partitioning is on)
    return compile_step(step, mesh=mesh, donate=donate,
                        fused_steps=fused_steps)


def make_eval_step(cfg, model, mesh=None, flip_pairs=(), fused_steps=1):
    """Build the jitted eval step.

    gaussian: returns source-space 2D preds + maxvals (optionally flip-test
    averaged with SHIFT_HEATMAP, reference validate [H]).
    integral:  returns (N, J, 3) preds — (x, y) in source pixels, z in
    root-relative mm.

    ``fused_steps=K``: the step takes a K-stacked super-batch and returns
    outputs with a leading (K,) axis — eval through a high-RTT link is
    dispatch-bound (one ~RTT round trip per batch vs ~10 ms of compute),
    so fusing K batches per dispatch divides that tax like the fused
    train driver (:func:`compile_step`). ``validate()`` flattens the
    leading axis transparently.
    """
    target_type = cfg.MODEL.EXTRA.TARGET_TYPE
    heatmap_size = tuple(int(v) for v in cfg.MODEL.EXTRA.HEATMAP_SIZE)
    image_size = tuple(int(v) for v in cfg.MODEL.IMAGE_SIZE)
    depth_dim = int(cfg.MODEL.EXTRA.DEPTH_DIM)
    depth_bound = float(cfg.MODEL.EXTRA.get("DEPTH_BOUND", 1000.0))
    num_joints = int(cfg.MODEL.NUM_JOINTS)
    flip_test = bool(cfg.TEST.FLIP_TEST)
    shift_heatmap = bool(cfg.TEST.SHIFT_HEATMAP)
    post_process = bool(cfg.TEST.POST_PROCESS)

    def apply(state, imgs):
        return model.apply({"params": state.params,
                            "batch_stats": state.batch_stats},
                           imgs, train=False)

    def step(state, batch):
        imgs = normalize_images(batch["input"])
        out = apply(state, imgs)
        if flip_test:
            out_f = apply(state, imgs[:, :, ::-1, :])
            if target_type == "gaussian":
                out_f = flip_back(out_f, flip_pairs)
            else:
                out_f = flip_back_volume(out_f, flip_pairs, num_joints,
                                         depth_dim)
            if shift_heatmap:
                # reference: shift flipped maps right by one pixel [H]
                out_f = out_f.at[:, :, 1:, :].set(out_f[:, :, :-1, :])
            out = (out + out_f) * 0.5

        if target_type == "gaussian":
            preds, maxvals = get_final_preds(
                out, batch["center"], batch["scale"], post_process)
            return {"preds": preds, "maxvals": maxvals, "loss_out": out}
        coords = softmax_integral(out, num_joints, depth_dim)
        # normalized -> crop pixels -> source pixels; z -> mm
        xy_crop = (coords[..., :2] + 0.5) * jnp.asarray(
            image_size, jnp.float32)
        xy_src = transform_preds(xy_crop, batch["center"], batch["scale"],
                                 image_size)
        z_mm = coords[..., 2] * (2.0 * depth_bound)
        return {"preds": jnp.concatenate(
            [xy_src, z_mm[..., None]], axis=-1), "loss_out": out}

    if fused_steps > 1:
        inner = step

        def step(state, superbatch):          # noqa: F811
            # stateless scan: one dispatch evaluates K stacked batches
            return jax.lax.scan(lambda s, b: (s, inner(s, b)),
                                state, superbatch)[1]

    if mesh is not None:
        from epipolarpose_tpu.parallel import replicated
        return jax.jit(step, in_shardings=(replicated(mesh), None),
                       out_shardings=replicated(mesh))
    return jax.jit(step)
