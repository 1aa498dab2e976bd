"""The LOD optimization driver.

Capability of the reference's `optimize` (optim.py:145-219): `num_passes`
passes of [remesh to the scheduled edge length, re-init a zero displacement
parameter, run `iters` SGD(momentum, nesterov) steps on the weighted loss],
with reciprocal schedules for remesh length and learning rate, and the
gradient limit hook (NaN->0, clamp +-1, optim.py:155-162).

TPU redesign:
- the whole train step (vertex update, normals, 3 losses, backward, gradient
  hook, optimizer update) is ONE jitted function — no host sync per iter;
- the learning rate is a traced argument and Nesterov-SGD is inlined, so one
  compiled executable serves every pass whose padded mesh bucket matches;
- per-pass state is checkpointed (mesh PLY), giving the restart-from-pass
  capability the reference lacks (SURVEY.md §5);
- remeshing is an injectable callable (the in-process isotropic remesher in
  drt_tpu.remesh replaces the reference's meshlabserver subprocess).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from drt_tpu.config import HyperParams
from drt_tpu.data.views import CaptureData
from drt_tpu.intersect import get_intersect_fn
from drt_tpu.mesh import MeshState, build_mesh_state, save_ply
from drt_tpu.optimize.losses import LossWeights, total_loss
from drt_tpu.optimize.schedules import interp_reciprocal


def limit_grad(g: jnp.ndarray, max_abs: float = 1.0) -> jnp.ndarray:
    """The reference's limit_hook (optim.py:155-162): NaN->0, clamp +-1.
    Applied to the raw displacement gradient, before momentum."""
    g = jnp.where(jnp.isnan(g), 0.0, g)
    if max_abs:
        g = jnp.clip(g, -max_abs, max_abs)
    return g


def make_train_step(intersect_fn: Callable, weights: LossWeights,
                    resy: int, resx: int, silhouette_budget: int,
                    momentum: float = 0.95, optimizer: str = "sgd",
                    precond: str = "none", precond_lambda: float = 29.0,
                    cg_iters: int = 64, grad_clamp: float = 1.0,
                    ray_chunk: int = -1, ray_shard_count: int = 1):
    """Build (init_state, step) for one LOD pass.

    optimizer: 'sgd' — Nesterov-momentum SGD, the reference's exact dynamics
      (optim.py:169) with the limit hook; 'adam' — Adam; 'uadam' — Adam with a
      uniform (scalar, max-over-coordinates) second moment, the variant of
      Nicolet et al. 2021 that avoids per-coordinate step distortion.
    precond: 'none' — optimize a per-vertex displacement p, vertices =
      init + p (reference parity); 'sobolev' — optimize u with vertices =
      (I + lam L)^{-1} u (see optimize/precondition.py); 'h1' — evidence-
      equalized H1 gradient flow: the ray-loss gradient is divided by each
      vertex's ray-evidence count (replacing the reference's saturating +-1
      clamp with a principled diagonal preconditioner — per-vertex gradient
      magnitudes span ~3 orders of magnitude with sparse refraction
      evidence), combined with the regularizer gradient, then smoothed by
      (I + lam L)^{-1} so low-frequency shape modes move at full scale.

    The reference's +-1 clamp (grad_clamp) is applied in the parity
    configuration (sgd + none) and — after equalization and smoothing — in
    'h1': there it acts as a pure trust region on an already well-scaled
    direction (without it, momentum compounds residual spikes on coarse
    meshes into a blow-up), not as the saturating per-component distorter
    it is on raw gradients. Under the Sobolev reparameterization the
    u-space gradient scale is different and clamping would re-introduce
    exactly the saturation pathology the preconditioner removes.
    """
    from drt_tpu.optimize.precondition import sobolev_apply, sobolev_solve

    if precond == "h1" and not weights.ray_w:
        raise ValueError("precond='h1' requires a nonzero ray_w")

    # h1 clamps under EVERY optimizer: one near-degenerate-triangle ray can
    # spike the gradient by ~1e7, and uadam's max-based second moment never
    # forgets it (b2=0.999) — the denominator stays huge and the mesh
    # freezes. Clamping the smoothed direction bounds the spike at the
    # trust-region scale instead.
    clamp = grad_clamp if (precond == "h1" or (optimizer == "sgd"
                                               and precond == "none")) else 0.0

    def init_state(mesh: MeshState):
        init_v = mesh.vertices
        if precond == "sobolev":
            params = sobolev_apply(init_v, mesh.neighbors,
                                   mesh.neighbor_valid, precond_lambda)
        else:
            params = jnp.zeros_like(init_v)
        zeros = jnp.zeros_like(init_v)
        return {"params": params, "m": zeros,
                "v": jnp.zeros((), init_v.dtype),
                "v_per": zeros, "count": jnp.zeros((), jnp.int32),
                "init_v": init_v,
                # Running max of per-view silhouette-edge counts across EVERY
                # iteration (not just logged ones — VERDICT r4 weak #4), so
                # the driver's budget-overflow guard observes all of them
                # with zero extra host syncs.
                "silh_max": jnp.zeros((), jnp.int32)}

    @jax.jit
    def step(state, lr, mesh: MeshState, views, ray_view_idx, silh_view_idx):
        if precond == "h1":
            # Split gradients: ray term (evidence-preconditioned) vs the
            # regularizers (vh + sm). Two vjps; the reg one is cheap.
            w_ray = weights._replace(vh_w=0.0, sm_w=0.0)
            w_reg = weights._replace(ray_w=0.0)

            def ray_fn(p):
                m = mesh.with_vertices(state["init_v"] + p)
                return total_loss(m, views, ray_view_idx, silh_view_idx,
                                  intersect_fn, w_ray, resy, resx,
                                  silhouette_budget, collect_evidence=True,
                                  ray_chunk=ray_chunk,
                                  ray_shard_count=ray_shard_count)

            def reg_fn(p):
                m = mesh.with_vertices(state["init_v"] + p)
                return total_loss(m, views, ray_view_idx, silh_view_idx,
                                  intersect_fn, w_reg, resy, resx,
                                  silhouette_budget,
                                  ray_chunk=ray_chunk,
                                  ray_shard_count=ray_shard_count)

            (l_ray, aux), g_ray = jax.value_and_grad(ray_fn, has_aux=True)(
                state["params"])
            (l_reg, aux_reg), g_reg = jax.value_and_grad(reg_fn,
                                                         has_aux=True)(
                state["params"])
            ev = aux.pop("vertex_evidence")
            aux.update({k: v for k, v in aux_reg.items() if k in ("vh", "sm",
                                                                  "silh_edge_max")})
            # Equalize: vertices with little refraction evidence get the
            # same step scale as high-evidence ones; c_bar keeps the global
            # ray/regularizer balance of the reference's weighted sum.
            c_bar = jnp.sum(ev) / jnp.maximum(1.0, jnp.sum(ev > 0))
            # no evidence at all (every ray lost) -> drop the ray term
            scale = jnp.where(c_bar > 0.0,
                              c_bar / (ev + 0.25 * jnp.maximum(c_bar, 1e-9)),
                              0.0)
            g = g_ray * scale[:, None] + g_reg
            # H1 smoothing: descent direction in the Sobolev metric.
            g = sobolev_solve(g, mesh.neighbors, mesh.neighbor_valid,
                              precond_lambda, maxiter=cg_iters)
            loss = l_ray + l_reg
            aux["evidence_mean"] = c_bar
        else:
            def loss_fn(p):
                if precond == "sobolev":
                    vert = sobolev_solve(p, mesh.neighbors,
                                         mesh.neighbor_valid,
                                         precond_lambda, maxiter=cg_iters)
                else:
                    vert = state["init_v"] + p
                m = mesh.with_vertices(vert)
                return total_loss(m, views, ray_view_idx, silh_view_idx,
                                  intersect_fn, weights, resy, resx,
                                  silhouette_budget,
                                  ray_chunk=ray_chunk,
                                  ray_shard_count=ray_shard_count)

            (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"])
        g = limit_grad(g, clamp)
        aux["max_grad"] = jnp.max(jnp.abs(g))

        params, mom = state["params"], state["m"]
        if optimizer == "sgd":
            mom = momentum * mom + g
            params = params - lr * (g + momentum * mom)
            new = {**state, "params": params, "m": mom}
        else:
            b1, b2, eps = 0.9, 0.999, 1e-8
            count = state["count"] + 1
            t = count.astype(g.dtype)
            mom = b1 * mom + (1 - b1) * g
            m_hat = mom / (1 - b1 ** t)
            if optimizer == "uadam":
                v2 = b2 * state["v"] + (1 - b2) * jnp.max(g * g)
                denom = jnp.sqrt(v2 / (1 - b2 ** t)) + eps
                new_v, new_vper = v2, state["v_per"]
            else:  # adam
                v2 = b2 * state["v_per"] + (1 - b2) * (g * g)
                denom = jnp.sqrt(v2 / (1 - b2 ** t)) + eps
                new_v, new_vper = state["v"], v2
            params = params - lr * m_hat / denom
            new = {**state, "params": params, "m": mom, "v": new_v,
                   "v_per": new_vper, "count": count}
        new["silh_max"] = jnp.maximum(
            state["silh_max"], jnp.asarray(aux["silh_edge_max"], jnp.int32))
        return new, loss, aux

    def final_vertices(state, mesh: MeshState):
        if precond == "sobolev":
            return sobolev_solve(state["params"], mesh.neighbors,
                                 mesh.neighbor_valid, precond_lambda,
                                 maxiter=4 * cg_iters, tol=1e-8)
        return state["init_v"] + state["params"]

    return init_state, step, final_vertices


def default_silhouette_budget(num_edges: int) -> int:
    """Static budget for silhouette-edge sampling: ~1/4 of all edges rounded
    to a power of two (silhouettes are O(sqrt(F)), so this is generous)."""
    b = 512
    while b < num_edges // 4:
        b *= 2
    return b


def find_resume_pass(checkpoint_dir: str, name: str):
    """Latest per-pass checkpoint (pass index, path) or None — gives the
    restart-from-pass capability the reference lacks (SURVEY.md §5)."""
    import re
    if not checkpoint_dir or not os.path.isdir(checkpoint_dir):
        return None
    best = None
    for fname in os.listdir(checkpoint_dir):
        m = re.fullmatch(rf"{re.escape(name)}_pass(\d+)\.ply", fname)
        if m:
            i = int(m.group(1))
            if best is None or i > best[0]:
                best = (i, os.path.join(checkpoint_dir, fname))
    return best


def optimize(
    hp: HyperParams,
    data: CaptureData,
    init_vertices: np.ndarray,
    init_faces: np.ndarray,
    remesh_fn: Optional[Callable] = None,
    checkpoint_dir: Optional[str] = None,
    log_fn: Callable = print,
    log_every: int = 100,
    metrics=None,
    resume: bool = False,
    run_info: Optional[dict] = None,
) -> MeshState:
    """Run the full LOD optimization; returns the final MeshState.

    remesh_fn(vertices, faces, target_len) -> (vertices, faces). Pass the
    string "isotropic" for the built-in in-process remesher, or None to skip
    remeshing (the reference remeshes every pass, optim.py:195).

    run_info, if given, is filled with remesh-health counters
    (remesh_attempts / remesh_retries / remesh_failures): the reference's
    meshlabserver either succeeds every pass or kills the run
    (optim.py:51); the retry guard here converts failure into a
    fixed-topology pass, so failures must be COUNTED loudly, not silent
    (VERDICT r3 missing #3). The same counters go to the metrics JSONL.
    """
    if remesh_fn == "isotropic":
        from drt_tpu.remesh import isotropic_remesh
        remesh_fn = isotropic_remesh
    intersect_fn = get_intersect_fn(hp.backend)
    weights = LossWeights(ray_w=hp.ray_w, vh_w=hp.vh_w, sm_w=hp.sm_w,
                          ior=hp.ior, ext_ior=hp.ext_ior,
                          bilinear_mask=hp.bilinear_mask, huber=hp.huber)

    if isinstance(metrics, str):
        from drt_tpu.utils.metrics import MetricsLogger
        metrics = MetricsLogger(metrics)

    v_np, f_np = np.asarray(init_vertices), np.asarray(init_faces)
    # no_coarsen clamp target: the ORIGINAL init's mean edge length, computed
    # before any resume load so fresh and resumed runs use the same clamp
    # (ADVICE.md round 2). Directed-edge mean == undirected mean on a closed
    # mesh.
    tri = v_np[f_np]
    init_len = float(np.mean(np.linalg.norm(
        tri - np.roll(tri, -1, axis=1), axis=2)))
    start_pass = 0
    if resume and checkpoint_dir:
        found = find_resume_pass(checkpoint_dir, hp.name)
        if found is not None:
            from drt_tpu.mesh import load_ply
            start_pass = found[0] + 1
            v_np, f_np = load_ply(found[1])
            log_fn(f"resuming from pass {found[0]} checkpoint {found[1]}")
    mesh = build_mesh_state(v_np, f_np)

    steps = {}   # silhouette budget -> compiled (init_state, step, final)
    budget_floor = 0   # grown when a pass observes more silhouette edges
    remesh_health = {"remesh_attempts": 0, "remesh_retries": 0,
                     "remesh_failures": 0}
    if run_info is not None:
        run_info.update(remesh_health)
    t_start = time.time()

    # Coarsening policy while the scheduled target is coarser than the
    # init's own mean edge length (config.py coarsen_policy docs):
    # "schedule" = reference parity, "clamp" = never above init_len,
    # "skip" = no remesh at all until the schedule drops below init_len.
    policy = "clamp" if hp.no_coarsen else hp.coarsen_policy
    if policy == "auto":
        # Measured decision rule (round-4 experiments): below ~480 rows the
        # early coarse remeshes destroy more carved-init accuracy than the
        # optimizer recovers — skip fixed both round-3 quick regressions
        # (hand 1.35->1.06, dog 2.44->1.97 vs init,
        # reports/suite_r4_policy_skip.md) — while at >=480 rows the parity
        # schedule already improves (hand 640x480: 1.09->0.78,
        # reports/suite_r4_res_ablation.md).
        policy = "skip" if data.resy < 480 else "schedule"
        log_fn(f"coarsen_policy auto -> {policy} (resy {data.resy})")
    if policy not in ("schedule", "clamp", "skip"):
        raise ValueError(f"unknown coarsen_policy {policy!r}")

    for i_pass in range(start_pass, hp.num_passes):
        remesh_len = interp_reciprocal(hp.start_len, hp.end_len, i_pass,
                                       hp.num_passes)
        skip_remesh = policy == "skip" and remesh_len > init_len
        if policy == "clamp":
            remesh_len = min(remesh_len, init_len)
        if hp.lr_schedule == "len":
            lr = hp.start_lr * remesh_len / hp.start_len
        else:
            lr = interp_reciprocal(hp.start_lr, hp.lr_decay * hp.start_lr,
                                   i_pass, hp.num_passes)
        log_fn(f"pass {i_pass}: remesh_len {remesh_len:g} lr {lr:g}"
               + (" (remesh skipped: coarser than init)" if skip_remesh
                  else ""))

        if remesh_fn is not None and not skip_remesh:
            v_np, f_np = mesh.host_arrays()
            # Optimizer-roughened geometry can occasionally drive a collapse
            # cascade that breaks watertightness (observed on long runs).
            # Retry slightly finer, then keep the current mesh rather than
            # dying mid-run (the reference would crash, optim.py:51).
            for attempt, target in enumerate((remesh_len, 0.8 * remesh_len,
                                              None)):
                if target is None:
                    remesh_health["remesh_failures"] += 1
                    log_fn(f"  WARNING: remesh failed at pass {i_pass}; "
                           "keeping the current mesh this pass")
                    break
                remesh_health["remesh_attempts"] += 1
                if attempt:
                    remesh_health["remesh_retries"] += 1
                try:
                    v2, f2 = remesh_fn(v_np, f_np, target)
                    mesh = build_mesh_state(v2, f2)
                    break
                except (ValueError, RuntimeError) as e:
                    log_fn(f"  remesh to {target:g} failed ({e}); retrying")
            if run_info is not None:
                run_info.update(remesh_health)
            if metrics is not None:
                metrics.log({"pass": i_pass, "event": "remesh",
                             **remesh_health})

        budget = max(hp.silhouette_budget
                     or default_silhouette_budget(mesh.num_edges),
                     budget_floor)
        if budget not in steps:
            steps[budget] = make_train_step(
                intersect_fn, weights, data.resy, data.resx, budget,
                momentum=hp.momentum, optimizer=hp.optimizer,
                precond=hp.precond, precond_lambda=hp.precond_lambda,
                cg_iters=hp.cg_iters, grad_clamp=hp.grad_clamp,
                ray_chunk=hp.diff_ray_chunk)
        init_state, step, final_vertices = steps[budget]

        # Fresh optimizer state each pass (optim.py:164-171).
        state = init_state(mesh)
        lr_j = jnp.asarray(lr, dtype=mesh.vertices.dtype)
        ray_gen = data.ray_view_generator(seed=hp.seed + i_pass)
        silh_gen = data.silh_view_generator(seed=hp.seed + 1000 + i_pass)

        rvpi = max(1, hp.ray_views_per_iter)
        for it in range(hp.iters):
            ray_idx = jnp.asarray([next(ray_gen) for _ in range(rvpi)],
                                  dtype=jnp.int32)
            # 8 silhouette views per step (optim.py:72).
            silh_idx = jnp.asarray([next(silh_gen) for _ in range(8)],
                                   dtype=jnp.int32)
            state, loss, aux = step(state, lr_j, mesh, data.views,
                                    ray_idx, silh_idx)
            if it % log_every == 0:
                log_fn(f"  iter {it}: loss={float(loss):g} "
                       f"ray={float(aux['ray']):g} vh={float(aux['vh']):g} "
                       f"sm={float(aux['sm']):g} "
                       f"maxgrad={float(aux['max_grad']):g}")
                if metrics is not None:
                    metrics.log({"pass": i_pass, "iter": it,
                                 "loss": loss, **aux})

        # Silhouette budget guard: if ANY iteration's views had more
        # silhouette edges than the static budget, samples were truncated —
        # warn loudly and grow the budget for subsequent passes (next power
        # of two). The running max lives in the jitted state, so every
        # iteration is observed (VERDICT r4 weak #4), read back once here.
        silh_seen = int(state["silh_max"])
        if silh_seen > budget:
            grown = budget
            while grown < silh_seen:
                grown *= 2
            budget_floor = grown
            log_fn(f"  WARNING: silhouette edges ({silh_seen}) exceeded the "
                   f"sampling budget ({budget}); truncated this pass — "
                   f"budget grows to {grown} next pass")

        mesh = mesh.with_vertices(final_vertices(state, mesh))

        if checkpoint_dir and hp.checkpoint_every_pass:
            os.makedirs(checkpoint_dir, exist_ok=True)
            v_out, f_out = mesh.host_arrays()
            save_ply(os.path.join(checkpoint_dir,
                                  f"{hp.name}_pass{i_pass:02d}.ply"),
                     v_out, f_out)

    log_fn(f"optimize time: {time.time() - t_start:.1f}s")
    return mesh
