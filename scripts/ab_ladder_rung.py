"""A/B: the plan_batch host-fallback rung's cost attribution (round 5).

Measures, on the bench scenarios at B=1024 (33 beam-missed lanes):
  1. ladder wall time and plans/s (plan_batch host_fallback=True);
  2. the no-fallback race pipeline as the baseline;
  3. the rung stage-by-stage: unreached-lane grid download, the native
     exact A* searches (sequential vs threaded), the 33-lane refine,
     and the scatter-back.

Chip findings (2026-08-21, single v5e via the remote tunnel):
  - no_fallback 285.8 plans/s; ladder (f32 rung) 143-216/s with huge
    run-to-run variance.
  - Attribution: search+race(dev) 2.4 s, f32 grid download of the 33
    lanes 3.2-4.3 s (~8 MB/s tunnel bandwidth), host A* x33 0.064 s
    sequential / 0.036 s threaded(2), refine33 0.19-0.56 s, scatter
    0.04-0.43 s.  The download WAS the rung.
  - Fix (landed in pipeline.plan_batch): the exact kino A* only
    thresholds the field (gtop_core.cpp k_dist_at/k_shot_ok), so the
    rung ships a bit-packed (d > margin) mask (32x smaller) expanded
    to a {0, 10000} two-level field — decisions bitwise-identical
    (tests/test_search.py::test_host_fallback_packed_mask_bitwise).
    Post-fix: 227-266 plans/s probe reps, bench row 266.1, 1024/1024.

Run: python scripts/ab_ladder_rung.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from grad_traj_optimization_tpu import fixtures, native, pipeline
    from grad_traj_optimization_tpu.config import OptimizerConfig
    from grad_traj_optimization_tpu.fields import sdf

    B = 1024
    cfg = OptimizerConfig()
    map_cfg, pts, valid, wps = fixtures.random_scenarios(
        B, n_waypoints=7, seed=42, max_obstacle_points=4096
    )
    origin = jnp.asarray(map_cfg.origin, jnp.float32)
    res = map_cfg.resolution
    occ = jax.jit(
        jax.vmap(
            lambda p, v: sdf.rasterize(
                p, origin, res, map_cfg.grid_shape, valid_mask=v
            )
        )
    )(jnp.asarray(pts, jnp.float32), jnp.asarray(valid))
    dist = sdf.edt_batch(occ, res)
    _ = float(dist[0, 0, 0, 0])
    starts = np.concatenate(
        [np.asarray(wps)[:, 0], np.zeros((B, 3))], 1
    ).astype(np.float32)
    goals = np.concatenate(
        [np.asarray(wps)[:, -1], np.zeros((B, 3))], 1
    ).astype(np.float32)
    origins_b = np.broadcast_to(np.asarray(origin), (B, 3))

    def run(hf):
        return pipeline.plan_batch(
            dist, origins_b, res, starts, goals, cfg=cfg, beam=64,
            max_iters=16, retries=1, host_fallback=hf,
        )

    r = run(True)
    rn = run(False)
    print(f"warm: ok {int(r.ok.sum())}/{B} host {r.n_host_fallback}")
    for tag, hf in (("no_fallback", False), ("ladder", True)):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = run(hf)
            _ = float(jnp.sum(r.solution.cost))
            ts.append(time.perf_counter() - t0)
        print(
            f"{tag}: {min(ts):.3f}s = {B / min(ts):.1f} plans/s "
            f"ok={int(r.ok.sum())}"
        )

    # rung micro-attribution: grid download (f32 vs packed) and the
    # host searches sequential vs threaded
    idx = np.where(~np.asarray(rn.reached))[0]
    print(f"unreached lanes: {len(idx)}")
    t0 = time.perf_counter()
    dist_f32 = np.asarray(dist[jnp.asarray(idx)])
    t_f32 = time.perf_counter() - t0
    t0 = time.perf_counter()
    packed = np.asarray(
        pipeline._pack_safe_u8(dist[jnp.asarray(idx)], 0.2)
    )
    t_pack = time.perf_counter() - t0
    print(
        f"download: f32 {dist_f32.nbytes / 1e6:.1f} MB {t_f32:.3f}s, "
        f"packed {packed.nbytes / 1e6:.2f} MB {t_pack:.3f}s"
    )
    if native.available():
        ob = np.asarray(origins_b, np.float32)

        def srch(ji):
            j, i = ji
            return native.kino_search(
                dist_f32[j], ob[i], float(res),
                starts[i].astype(np.float64),
                goals[i].astype(np.float64), max_tau=0.5,
            )

        t0 = time.perf_counter()
        for ji in enumerate(idx):
            srch(ji)
        t_seq = time.perf_counter() - t0
        from concurrent.futures import ThreadPoolExecutor

        t0 = time.perf_counter()
        with ThreadPoolExecutor(2) as ex:
            list(ex.map(srch, list(enumerate(idx))))
        t_thr = time.perf_counter() - t0
        print(
            f"host A* x{len(idx)}: sequential {t_seq:.3f}s, "
            f"threaded(2) {t_thr:.3f}s"
        )


if __name__ == "__main__":
    main()
