#!/usr/bin/env python
"""One-command repro of the flagship train-step profile (docs/PROFILE_r2.md).

When jax/libtpu bump, re-run this instead of re-deriving the experiments:

    python tools/profile_step.py --step      # roofline + piecewise timings
    python tools/profile_step.py --conv1x1   # Mosaic matmul+stats-epilogue
                                             # vs XLA on the 15 1x1 shapes
    python tools/profile_step.py             # both

--step reproduces the roofline (XLA cost analysis vs measured) and the
piecewise timings table. --conv1x1 reproduces the round-2 headroom
experiment that measured-closed the train-BN item: a Pallas blocked matmul
emitting (y, sum_y, sum_y^2) with the stats tile resident in VMEM across
the M grid, against XLA's matmul + stats reductions. The round-2 verdict
(XLA already fuses the stats epilogue; Mosaic matmuls trail on big-M
shapes) holds until this script says otherwise.

Timings use K-step lax.scan + a host transfer fence, so they are free of
per-dispatch RTT (required through the tunneled PJRT device).
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

# ResNet-50 @ 256^2 bs128: all 15 distinct (M, K, N) 1x1-conv shapes.
# M = batch * H * W per stage (64^2, 32^2, 16^2, 8^2 feature maps).
CONV1X1_SHAPES = [
    (524288, 64, 64), (524288, 64, 256), (524288, 256, 64),
    (131072, 256, 128), (131072, 128, 512), (131072, 256, 512),
    (131072, 512, 128),
    (32768, 512, 256), (32768, 256, 1024), (32768, 512, 1024),
    (32768, 1024, 256),
    (8192, 1024, 512), (8192, 512, 2048), (8192, 1024, 2048),
    (8192, 2048, 512),
]


def timed_scan(fn, args, K=10, iters=3):
    """Time fn under a K-step scan per dispatch; returns seconds/step.

    Two compiler traps guarded against (round-3 review): (1) consuming
    only one element of one output leaf lets XLA dead-code-eliminate the
    rest of the computation (a stats epilogue, a backward pass) — here the
    FULL output pytree is the scan carry, so every leaf is live and
    materialized each step, like the real pipeline's tensors, without
    adding artificial reduction traffic; (2) a loop-invariant body can be
    hoisted out of the scan — the first floating input leaf is perturbed
    by a numerically-negligible (~1e-30) function of the carry, chaining
    each iteration to the previous one. ``fn`` must therefore RETURN its
    full outputs (not slices) for the timing to cover them.
    """
    out_shapes = jax.eval_shape(lambda a: fn(*a), args)

    @jax.jit
    def run(args):
        def body(c, _):
            scalar = jax.tree.leaves(c)[0].ravel()[0].astype(jnp.float32)
            eps = jnp.tanh(scalar) * jnp.float32(1e-30)
            leaves, td = jax.tree.flatten(args)
            new, done = [], False
            for leaf in leaves:
                if not done and jnp.issubdtype(
                        jnp.result_type(leaf), jnp.floating):
                    new.append(leaf + eps.astype(leaf.dtype))
                    done = True
                else:
                    new.append(leaf)
            return fn(*jax.tree.unflatten(td, new)), None
        init = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                            out_shapes)
        return jax.lax.scan(body, init, None, length=K)[0]

    def fence(out):
        # host transfer of one element; per-device program ordering means
        # the whole last program (all carried leaves) has completed
        return float(jax.tree.leaves(out)[0].ravel()[0])

    _ = fence(run(args))                     # compile + fence
    t0 = time.time()
    for _ in range(iters):
        out = run(args)
    _ = fence(out)
    return (time.time() - t0) / (iters * K)


def timed_state_scan(step, state, batch, K=10, iters=3):
    """Time a ``(state, batch) -> (state, metrics)`` train step by
    threading the STATE through a K-step scan: the gradient/optimizer
    update is live (it feeds the next iteration — no DCE of the backward
    pass), and the batch is perturbed from the carried params so no
    iteration is loop-invariant. Returns seconds/step."""
    @jax.jit
    def run(state):
        def body(s, _):
            p0 = jax.tree.leaves(s.params)[0].ravel()[0]
            b = dict(batch,
                     input=batch["input"] + p0.astype(
                         batch["input"].dtype) * 1e-30)
            s2, m = step(s, b)
            return s2, m["loss"]
        return jax.lax.scan(body, state, None, length=K)[1]

    _ = float(run(state)[-1])                # compile + fence
    t0 = time.time()
    for _ in range(iters):
        losses = run(state)
    _ = float(losses[-1])                    # last loss depends on every
    return (time.time() - t0) / (iters * K)  # step's updated state


# --------------------------------------------------------------- conv1x1
def fused_matmul_stats(x, w, tile_m=1024, tile_n=None, interpret=False):
    """Pallas: y = x @ w plus per-column (sum_y, sum_y^2) in one pass.

    Grid is (N-tiles, M-tiles) with M INNER so the (2, TILE_N) stats
    accumulator stays resident in VMEM across the whole M sweep of one
    column block; stats write out once on the last M step.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    _, N = w.shape
    tile_n = tile_n or min(N, 256)
    assert M % tile_m == 0 and N % tile_n == 0

    def kernel(x_ref, w_ref, y_ref, stats_ref, acc_ref):
        i = pl.program_id(1)                 # M index (inner)
        y = jnp.dot(x_ref[:], w_ref[:],
                    preferred_element_type=jnp.float32)
        y_ref[:] = y.astype(y_ref.dtype)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[0, :] += jnp.sum(y, axis=0)
        acc_ref[1, :] += jnp.sum(y * y, axis=0)

        @pl.when(i == pl.num_programs(1) - 1)
        def _():
            stats_ref[:] = acc_ref[:]

    return pl.pallas_call(
        kernel,
        grid=(N // tile_n, M // tile_m),
        in_specs=[
            pl.BlockSpec((tile_m, K), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_m, tile_n), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, N), x.dtype),
            jax.ShapeDtypeStruct((2, N), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, tile_n), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N + 3 * M * N,
            bytes_accessed=(M * K + K * N + M * N) * x.dtype.itemsize
            + 2 * N * 4,
            transcendentals=0),
    )(x, w)


def xla_matmul_stats(x, w):
    y = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    yf = y.astype(jnp.float32)
    return y, jnp.stack([yf.sum(0), (yf * yf).sum(0)])


def bench_conv1x1(tile_ms=(512, 1024, 2048, 4096)):
    if jax.default_backend() not in ("tpu", "axon"):
        print("conv1x1: needs a TPU backend (Mosaic); skipping on "
              f"{jax.default_backend()}")
        return
    rng = np.random.default_rng(0)
    total_xla = total_fused = 0.0
    print(f"{'(M, K, N)':>22} | {'XLA ms':>8} | {'fused ms':>9} | tile_m")
    for (M, K, N) in CONV1X1_SHAPES:
        x = jax.device_put(rng.standard_normal((M, K)).astype(jnp.bfloat16))
        w = jax.device_put(rng.standard_normal((K, N)).astype(jnp.bfloat16))
        t_xla = timed_scan(xla_matmul_stats, (x, w))
        best = (np.inf, None)
        for tm in tile_ms:
            if M % tm:
                continue
            try:
                fn = functools.partial(fused_matmul_stats, tile_m=tm)
                t = timed_scan(fn, (x, w))
                if t < best[0]:
                    best = (t, tm)
            except Exception as e:
                print(f"  tile_m={tm}: {type(e).__name__}: {e}")
        total_xla += t_xla
        total_fused += best[0] if np.isfinite(best[0]) else t_xla
        print(f"{str((M, K, N)):>22} | {t_xla * 1e3:8.2f} | "
              f"{best[0] * 1e3:9.2f} | {best[1]}")
    print(f"\naggregate over {len(CONV1X1_SHAPES)} shapes: "
          f"XLA {total_xla * 1e3:.1f} ms vs fused {total_fused * 1e3:.1f} ms"
          f" -> {'FUSED WINS: revisit PROFILE_r2 verdict' if total_fused < total_xla * 0.97 else 'XLA holds (PROFILE_r2 verdict stands)'}")


# ------------------------------------------------------------------ step
def bench_step():
    import pathlib
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from epipolarpose_tpu.config import load_config
    from epipolarpose_tpu.core import create_train_state, make_train_step
    from epipolarpose_tpu.core.steps import normalize_images
    from epipolarpose_tpu.models import get_model
    from epipolarpose_tpu.ops import integral_l1_loss, softmax_integral

    root = pathlib.Path(__file__).resolve().parents[1]
    cfg = load_config(root / "experiments" / "h36m"
                      / "train_fs_r50_256_integral.yaml")
    bs, S, J, D = 128, 256, 17, int(cfg.MODEL.EXTRA.DEPTH_DIM)
    model = get_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 1000)
    rng = np.random.default_rng(0)
    batch = jax.device_put({
        "input": rng.uniform(0, 1, (bs, S, S, 3)).astype(np.float32),
        "joints": rng.uniform(20, S - 20, (bs, J, 2)).astype(np.float32),
        "joints_vis": np.ones((bs, J), np.float32),
        "center": np.full((bs, 2), S / 2, np.float32),
        "scale": np.full((bs, 2), S / 200, np.float32),
        "joints_3d": rng.uniform(-400, 400, (bs, J, 3)).astype(np.float32),
    })
    step = make_train_step(cfg, model, donate=False)

    # full step + XLA cost analysis roofline
    lowered = step.lower(state, batch)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", 0.0)
    bytes_ = cost.get("bytes accessed", 0.0)
    t_step = timed_state_scan(step, state, batch, K=10, iters=3)
    print(f"full step: {t_step * 1e3:.1f} ms = {bs / t_step:.0f} img/s")
    print(f"XLA cost: {flops / 1e12:.2f} TFLOP, {bytes_ / 1e9:.1f} GB "
          f"accessed per step")
    if bytes_:
        print(f"HBM-bound floor @819 GB/s: {bytes_ / 819e9 * 1e3:.1f} ms "
              f"({bytes_ / 819e9 / t_step * 100:.0f}% of measured)"
              f" | MXU floor @197 TFLOP/s: {flops / 197e12 * 1e3:.1f} ms")

    # piecewise: forward eval-BN vs train-BN, loss fwd vs fwd+bwd
    imgs = normalize_images(batch["input"])

    # full outputs returned (timed_scan carries them): nothing is DCE-able
    def fwd_eval(p):
        return model.apply({"params": p, "batch_stats": state.batch_stats},
                           imgs, train=False)

    def fwd_train(p):
        return model.apply(
            {"params": p, "batch_stats": state.batch_stats}, imgs,
            train=True, mutable=["batch_stats"])

    t_fe = timed_scan(fwd_eval, (state.params,))
    t_ft = timed_scan(fwd_train, (state.params,))
    print(f"forward eval-BN: {t_fe * 1e3:.1f} ms | train-BN: "
          f"{t_ft * 1e3:.1f} ms (+{(t_ft - t_fe) * 1e3:.1f} ms stats)")

    vol = jax.device_put(rng.standard_normal(
        (bs, 64, 64, J * D)).astype(np.float32))
    tgt = jax.device_put(rng.uniform(-0.5, 0.5, (bs, J, 3)).astype(
        np.float32))
    tw = jax.device_put(np.ones((bs, J, 3), np.float32))

    def loss_fwd(v):
        # scalar loss: the whole forward is live through it
        return integral_l1_loss(softmax_integral(v, J, D), tgt, tw)[None]

    def loss_bwd(v):
        # FULL gradient returned — a [:1] slice would let XLA drop most
        # of the backward (round-3 review)
        return jax.grad(
            lambda vv: integral_l1_loss(
                softmax_integral(vv, J, D), tgt, tw))(v)

    print(f"soft-argmax+L1 fwd: {timed_scan(loss_fwd, (vol,)) * 1e3:.1f} ms"
          f" | fwd+bwd: {timed_scan(loss_bwd, (vol,)) * 1e3:.1f} ms")


def fence_check():
    """Reproduce the round-3 fencing hazard (docs/PROFILE_r3.md §3): per-
    iteration block_until_ready vs host-materialization timings on a real
    compute dispatch. On a healthy backend both columns agree (+float is
    ~one link RTT); through the tunneled axon device the first block-
    fenced iteration after an unfenced backlog returns early and the
    float column absorbs the real compute time."""
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2048, 2048)).astype(np.float32))

    @jax.jit
    def heavy(x):
        def body(c, _):
            return jnp.tanh(c @ x), None
        return jax.lax.scan(body, x, None, length=600)[0]

    out = heavy(x)                       # compile; deliberately UNFENCED
    for i in range(6):
        t0 = time.time()
        out = heavy(x)
        jax.block_until_ready(out)
        t1 = time.time()
        # scalar materialization: waits for the compute without adding a
        # bulk d2h transfer to the column
        _ = float(np.asarray(out.ravel()[0]))
        print(f"iter {i}: block {1e3 * (t1 - t0):8.1f} ms"
              f"   +float {1e3 * (time.time() - t1):8.1f} ms")


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--step", action="store_true")
    p.add_argument("--conv1x1", action="store_true")
    p.add_argument("--fence-check", action="store_true",
                   help="block_until_ready vs host-materialize fence A/B "
                        "(PROFILE_r3 §3)")
    args = p.parse_args()
    from epipolarpose_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache("tools")
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    if args.fence_check:
        fence_check()
        return
    if args.step or not args.conv1x1:
        bench_step()
    if args.conv1x1 or not args.step:
        bench_conv1x1()


if __name__ == "__main__":
    main()
