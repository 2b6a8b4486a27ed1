"""Round-5 beam operating-point frontier: reach vs throughput.

The sort-payload rewrite made the batched beam ~11x faster (705
searches/s at B=1024, beam=64, 16 iters), which buys budget headroom:
wider beams and deeper iteration counts now cost milliseconds where
they used to cost tenths of seconds.  This sweep records the
(reach, searches/s) frontier so deployments can pick a point, and
checks whether a wider base beam beats the adaptive retry ladder on
end-to-end reach per second.

Run ON CHIP: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/ab_beam_frontier.py [batch]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from grad_traj_optimization_tpu import fixtures
    from grad_traj_optimization_tpu.fields import sdf
    from grad_traj_optimization_tpu.search import kinodynamic as kd

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    from _bench_common import build_bench_batch
    dist, origins_b, res, starts, goals, wps = build_bench_batch(B)
    _ = wps  # noqa: F841

    def measure(name, **kw):
        def run():
            return kd.search_batch(
                dist, origins_b, res, starts, goals, **kw
            )
        try:
            r = run()
            n_reached = int(jnp.sum(r.reached))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                r2 = run()
                _ = float(jnp.sum(r2.cost))
                ts.append(time.perf_counter() - t0)
            out = {
                "arm": name, "searches_per_s": round(B / min(ts), 1),
                "reached": n_reached, "wall_s": round(min(ts), 3), **kw,
            }
        except Exception as e:
            out = {"arm": name, "error": repr(e)[:200]}
        print(json.dumps(out), flush=True)

    for beam, iters in [(64, 16), (64, 24), (64, 32), (128, 16),
                        (128, 24), (256, 16), (96, 20)]:
        measure(f"b{beam}_i{iters}", beam=beam, max_iters=iters)

    # the adaptive ladder's end-to-end number at the default point
    def run_ad():
        return kd.search_batch_adaptive(
            dist, origins_b, res, starts, goals, beam=64, max_iters=16,
            retries=1,
        )

    r, n_re, _ = run_ad()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r2, _, _ = run_ad()
        _ = float(jnp.sum(r2.cost))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({
        "arm": "adaptive_b64_i16_retry1",
        "searches_per_s": round(B / min(ts), 1),
        "reached": int(jnp.sum(r.reached)),
        "n_retried": int(n_re), "wall_s": round(min(ts), 3),
    }), flush=True)
    print("# done", flush=True)


if __name__ == "__main__":
    main()
