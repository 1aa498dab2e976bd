"""Benchmark: rays/s through the 2-bounce refraction trace, forward+backward,
with roofline accounting (VERDICT.md round-1 item 4).

Workloads (BENCH_DETAIL.json gets every row; stdout prints ONE headline JSON
line for the driver):
  - mouse_vh  (9,246 faces, VMEM-resident kernel)   256x256 + full Pointgray
    view (1280x960 = 1,228,800 rays — the reference's actual per-iteration
    batch, captured_data.py:90-91)
  - dog_vh    (145,666 faces -> HBM-streaming kernel) 256x256 + full view
  - monkey_vh (184,090 faces -> streaming)            256x256

Per config: the full differentiable step (3 closest-hit oracle queries,
Moller-Trumbore re-intersection, Snell/Fresnel chain, ray loss, backward to
vertex gradients) and the oracle query alone. Roofline: achieved FLOP/s and
HBM bytes/s from XLA's compiled cost analysis divided against chip peaks
(TPU v5e: 197 TFLOP/s bf16 — conservative denominator, the kernel's MT
matmuls run in f32 — and 819 GB/s HBM).

The reference publishes no numbers (BASELINE.md): `vs_baseline` is measured
rays/s against this project's own first working implementation (brute-force
oracle, 440,538 rays/s fwd+bwd, round 1) on the SAME 256x256 mouse workload,
so rounds are comparable.
"""

import json
import sys
import time

import numpy as np

BASELINE_RAYS_PER_S = 4.4e5          # round-1 brute-force, mouse 256x256

# chip peaks for the roofline denominators
PEAKS = {
    # device_kind prefix: (name, peak_flops_bf16, hbm_bytes_per_s)
    "TPU v5 lite": ("v5e", 197e12, 819e9),
    "TPU v5": ("v5p", 459e12, 2765e9),
    "TPU v4": ("v4", 275e12, 1228e9),
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def chip_peaks():
    import jax
    kind = jax.devices()[0].device_kind
    for prefix, peaks in PEAKS.items():
        if kind.startswith(prefix):
            return kind, *peaks
    return kind, "?", None, None


def make_rays(v, resy, resx, supersample=1):
    """Synthetic camera looking at the mesh: full-pixel-grid rays plus the
    screen point behind the object (the capture geometry of data/synthetic)."""
    import jax.numpy as jnp
    from drt_tpu.data.synthetic import intrinsics, look_at_extrinsic
    from drt_tpu.render.camera import CameraM, generate_rays

    center = v.mean(axis=0)
    radius = float(np.linalg.norm(v - center, axis=1).max())
    cam_pos = center + np.array([3.5 * radius, 0.0, 0.3 * radius])
    R = look_at_extrinsic(cam_pos, center)
    K = intrinsics(resy, resx, 45.0)
    cam = CameraM(jnp.asarray(R, jnp.float32), jnp.asarray(K, jnp.float32),
                  jnp.asarray(np.linalg.inv(R), jnp.float32),
                  jnp.asarray(np.linalg.inv(K), jnp.float32))
    origin, ray_dir = generate_rays(resy, resx, cam, supersample)
    screen_point = jnp.asarray(center - 2.5 * radius * (cam_pos - center)
                               / np.linalg.norm(cam_pos - center), jnp.float32)
    return origin, ray_dir, screen_point


def cost_of(compiled):
    """(flops, bytes) from XLA cost analysis; 0s if unavailable."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), \
            float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def bench_config(name, ply_path, resy, resx, iters, backend="auto",
                 supersample=1):
    import jax
    import jax.numpy as jnp
    from drt_tpu.geometry.vec import safe_normalize
    from drt_tpu.intersect import get_intersect_fn
    from drt_tpu.mesh import build_mesh_state, load_ply
    from drt_tpu.render import render_transparent

    v, f = load_ply(ply_path)
    ms = build_mesh_state(v, f)
    intersect_fn = get_intersect_fn(backend)
    ior, ext_ior = 1.4723, 1.00029

    origin, ray_dir, screen_point = make_rays(v, resy, resx, supersample)
    n_rays = origin.shape[0]

    from drt_tpu.render.chunked import auto_ray_chunk, chunked_sum
    ray_chunk = auto_ray_chunk(n_rays)
    lane_valid = jnp.ones((n_rays,), bool)   # padded False past n_rays

    def loss_fn(vertices):
        m = ms.with_vertices(vertices)

        def body(o, d, lv):
            res = render_transparent(o, d, m, intersect_fn, ior, ext_ior,
                                     lane_mask=lv)
            target = safe_normalize(screen_point - res.origin)
            diff = res.direction - target
            return jnp.sum(jnp.where(res.valid[:, None], diff * diff, 0.0))

        return chunked_sum(body, (origin, ray_dir, lane_valid), ray_chunk,
                           pad_values=(0.0, 1.0, False))

    def time_it(fn, *args, n=iters):
        out = fn(*args)
        jax.block_until_ready(out)               # compile + warmup
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    # oracle query alone (one closest-hit pass over the full batch)
    oracle = jax.jit(lambda o, d, vert: intersect_fn(
        o, d, vert, ms.faces, ms.face_valid).t)
    dt_oracle = time_it(oracle, origin, ray_dir, ms.vertices)

    # candidate-prepass alone (the XLA slab stage feeding the Pallas kernel)
    # so the oracle splits into prepass vs kernel (VERDICT r1 weak item 2).
    from drt_tpu.intersect.culled import _chunk_aabbs
    from drt_tpu.intersect.pallas_kernel import (
        RAY_TILE, TRI_CHUNK, _candidates)

    def prepass(o, d, vert):
        shift = jax.lax.stop_gradient(
            jnp.mean(o.astype(jnp.float32), axis=0))
        oc = o.astype(jnp.float32) - shift
        dc = d.astype(jnp.float32)
        pad = (-oc.shape[0]) % RAY_TILE
        if pad:
            oc = jnp.pad(oc, ((0, pad), (0, 0)))
            dc = jnp.pad(dc, ((0, pad), (0, 0)), constant_values=1.0)
        T = oc.shape[0] // RAY_TILE
        ot = oc.reshape(T, RAY_TILE, 3).transpose(0, 2, 1)
        dt = dc.reshape(T, RAY_TILE, 3).transpose(0, 2, 1)
        lo_c, hi_c, chunk_valid = _chunk_aabbs(
            vert, ms.faces, ms.face_valid, shift, TRI_CHUNK)
        return _candidates(ot, dt, lo_c, hi_c, chunk_valid, 0.0)

    dt_prepass = time_it(jax.jit(prepass), origin, ray_dir, ms.vertices)

    # Analytic MXU work of the oracle: XLA's cost analysis cannot see inside
    # pallas_call, so count the kernel's Moller-Trumbore matmuls from the
    # candidate lists — each candidate chunk visited by a ray tile is one
    # [16,4C]^T @ [16,RT] dot (upper bound: the kernel prunes chunks whose
    # slab re-test loses to the running best_t).
    _, counts = jax.jit(prepass)(origin, ray_dir, ms.vertices)
    n_cand = int(np.asarray(counts).sum())
    oracle_mxu_flops = n_cand * 2 * 16 * (4 * TRI_CHUNK) * RAY_TILE

    # forward-only loss so the backward share of the step is visible
    dt_fwd = time_it(jax.jit(loss_fn), ms.vertices)

    # Exactness vs the brute all-pairs oracle on a ray subsample. This runs
    # on the real chip, where matmul-precision bugs actually manifest (CPU
    # tests compute f32 matmuls exactly and cannot catch them — the round-2
    # bf16-MXU false-miss bug was invisible to the whole CPU suite).
    stride = max(1, n_rays // 4096)
    o_s, d_s = origin[::stride], ray_dir[::stride]
    t_fast = intersect_fn(o_s, d_s, ms.vertices, ms.faces, ms.face_valid).t
    t_ref = get_intersect_fn("brute")(o_s, d_s, ms.vertices, ms.faces,
                                      ms.face_valid).t
    hit_f = np.isfinite(np.asarray(t_fast))
    hit_r = np.isfinite(np.asarray(t_ref))
    n_mismatch = int((hit_f != hit_r).sum())

    # full fwd+bwd step
    step = jax.jit(jax.grad(loss_fn))
    lowered = step.lower(ms.vertices)
    compiled = lowered.compile()
    flops, nbytes = cost_of(compiled)
    dt_step = time_it(step, ms.vertices)

    kind, chip, peak_flops, peak_bw = chip_peaks()
    row = {
        "mesh": name, "faces": ms.num_faces, "rays": int(n_rays),
        "res": f"{resx}x{resy}" + (f"@ss{supersample}" if supersample > 1
                                   else ""),
        "backend": backend,
        "streaming_kernel": ms.faces.shape[0] * 160 > 10 * 1024 * 1024,
        "step_ms": round(dt_step * 1e3, 2),
        "rays_per_s_step": round(n_rays / dt_step),
        "oracle_ms": round(dt_oracle * 1e3, 2),
        "rays_per_s_oracle": round(n_rays / dt_oracle),
        "prepass_ms": round(dt_prepass * 1e3, 2),
        "fwd_ms": round(dt_fwd * 1e3, 2),
        "oracle_mxu_gflops": round(oracle_mxu_flops / 1e9, 2),
        "oracle_mxu_tflops_per_s": round(
            oracle_mxu_flops / dt_oracle / 1e12, 3),
        "oracle_hit_mismatch_vs_brute": n_mismatch,
        "oracle_exact_sample": int(hit_f.size),
        "step_gflops": round(flops / 1e9, 2),
        "achieved_tflops": round(flops / dt_step / 1e12, 3),
        "achieved_gbps": round(nbytes / dt_step / 1e9, 1),
    }
    if peak_flops:
        row["mfu_pct_vs_bf16_peak"] = round(100 * flops / dt_step
                                            / peak_flops, 2)
        row["hbm_bw_pct"] = round(100 * nbytes / dt_step / peak_bw, 1)
        row["oracle_mxu_mfu_pct"] = round(
            100 * oracle_mxu_flops / dt_oracle / peak_flops, 2)
        # Speed-of-light anchor (VERDICT r2 item 9): an external, algorithm-
        # independent lower bound on step time, so "fast" stops being
        # relative to this project's own brute baseline. Derivation in
        # BASELINE.md "Speed-of-light anchor": (a) bytes that MUST cross HBM
        # at least once under perfect fusion + a fully cached mesh — ray
        # dirs 12N + screen targets 12N in, vertex grads 12V out, mesh
        # (verts+faces) read once; (b) fundamental MT+refraction flops — one
        # exact ray-triangle test per oracle query (3 queries) + 2
        # refractions, forward ~500 flops/ray, backward ~2x — at the f32
        # MXU peak (bf16 peak / 2). SOL = max of the two.
        Vn, Fn = ms.num_vertices, ms.num_faces
        sol_bytes = 24 * n_rays + 12 * Vn + 12 * Fn + 12 * Vn
        sol_flops = n_rays * 1500.0
        sol_s = max(sol_bytes / peak_bw, sol_flops / (peak_flops / 2))
        row["sol_ms"] = round(sol_s * 1e3, 3)
        row["sol_bound"] = ("bytes" if sol_bytes / peak_bw
                            >= sol_flops / (peak_flops / 2) else "flops")
        row["sol_pct"] = round(100 * sol_s / dt_step, 2)
    log(f"  {json.dumps(row)}")
    return row


def main(full: bool = True):
    import jax
    from drt_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    kind, chip, peak_flops, peak_bw = chip_peaks()
    log(f"device: {kind} ({chip}), peaks: {peak_flops and peak_flops/1e12}"
        f" TF bf16, {peak_bw and peak_bw/1e9} GB/s")

    data = "/root/reference/data/"
    rows = []
    configs = [("mouse_vh", data + "mouse_vh.ply", 256, 256, 10)]
    if full:
        configs += [
            ("mouse_vh", data + "mouse_vh.ply", 960, 1280, 5),
            ("dog_vh", data + "dog_vh.ply", 256, 256, 5),
            ("dog_vh", data + "dog_vh.ply", 960, 1280, 3),
            ("monkey_vh", data + "monkey_vh.ply", 256, 256, 5),
            # BASELINE config 5: high-res tiger, 4x supersampled rays
            # (2x2 sub-pixel grid over the full Redmi 1920x1080 view =
            # 8,294,400 rays in one fwd+bwd step on one chip; the pod
            # shards this batch along the ray axis, tests/test_parallel.py)
            ("tiger_vh", data + "tiger_vh.ply", 1080, 1920, 2, "auto", 2),
        ]
    for cfg in configs:
        try:
            rows.append(bench_config(*cfg))
        except Exception as e:                    # record, don't die
            log(f"  FAILED {cfg[0]} {cfg[2]}x{cfg[3]}: {e!r}")
            rows.append({"mesh": cfg[0], "res": f"{cfg[3]}x{cfg[2]}",
                         "error": repr(e)})

    # Never clobber committed rows from a DIFFERENT device (ADVICE r4 high:
    # a CPU-backend run once overwrote the TPU table): if BENCH_DETAIL.json
    # exists for another device kind, divert to a device-suffixed file.
    detail_path = "BENCH_DETAIL.json"
    try:
        with open(detail_path) as fh:
            prev_device = json.load(fh).get("device")
    except (OSError, ValueError):
        prev_device = None
    if prev_device is not None and prev_device != kind:
        slug = "".join(c if c.isalnum() else "_" for c in kind).strip("_")
        detail_path = f"BENCH_DETAIL.{slug}.json"
        log(f"BENCH_DETAIL.json holds '{prev_device}' rows; this run is "
            f"'{kind}' — writing {detail_path} instead")
    with open(detail_path, "w") as fh:
        json.dump({"device": kind, "rows": rows}, fh, indent=1)

    head = next((r for r in rows if r["mesh"] == "mouse_vh"
                 and r.get("rays_per_s_step")), None)
    full_row = next((r for r in rows if r["mesh"] == "mouse_vh"
                     and r.get("rays") == 1228800
                     and r.get("rays_per_s_step")), None)
    if head is None:   # every mouse config failed: still emit the one line
        print(json.dumps({"metric": "rays/s fwd+bwd 2-bounce refraction",
                          "value": 0, "unit": "rays/s", "vs_baseline": 0.0,
                          "error": "all mouse_vh configs failed"}))
        return
    value = (full_row or head)["rays_per_s_step"]
    metric = ("rays/s fwd+bwd 2-bounce refraction (mouse_vh, "
              + ("full 1280x960 view" if full_row else "256x256 rays")
              + ", 1 chip)")
    # vs_baseline is computed from the SAME value it is paired with
    # (VERDICT r3 weak #4: the r3 line paired the full-view value with the
    # 256x256 row's ratio); the denominator is named explicitly.
    print(json.dumps({
        "metric": metric, "value": value, "unit": "rays/s",
        "vs_baseline": round(value / BASELINE_RAYS_PER_S, 3),
        "baseline": "round-1 brute-force oracle, mouse 256x256, "
                    f"{BASELINE_RAYS_PER_S:.0f} rays/s",
        "rays_per_s_256": head["rays_per_s_step"],
    }))


if __name__ == "__main__":
    main(full="--quick" not in sys.argv)
