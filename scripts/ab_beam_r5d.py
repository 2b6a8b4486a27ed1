"""Round-5d beam A/B: post-sort-rewrite second-order levers.

After the sort-payload rewrite (703 searches/s), the residual dedup
cost is the sorts themselves (stage-1 row sorts + the global 16k
3-operand sort).  Arms:

* approx512: lax.approx_max_k PartialReduce pre-cut + 512-element
  gathers — pre-rewrite this TIED because gathers dominated; now that
  sorts dominate the economics may have flipped.
* shot_topk sweep: the termination shot sweep is ~10% (0.14 ms) of a
  search; fewer swept slots per iteration trade shot-connect latency.
* adaptive deepen=1.0: the frontier showed DEPTH buys no reach
  (946 vs 945 at i24/i32) — a width-only retry rung should keep the
  991 reach at lower retry cost.

Run ON CHIP: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/ab_beam_r5d.py [batch]
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
                dist, origins_b, res, starts, goals, max_iters=16,
                beam=64, **kw,
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

    measure("exact512_base")
    measure("approx512", dedup="approx512")
    measure("approx1024", dedup="approx1024")
    # default is shot_topk=8 in box mode
    measure("shot_topk4", shot_topk=4)
    measure("shot_topk16", shot_topk=16)

    def run_ad(deepen):
        return kd.search_batch_adaptive(
            dist, origins_b, res, starts, goals, beam=64, max_iters=16,
            retries=1, deepen=deepen,
        )

    for deepen in (1.5, 1.0):
        r, n_re, _ = run_ad(deepen)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r2, _, _ = run_ad(deepen)
            _ = float(jnp.sum(r2.cost))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({
            "arm": f"adaptive_deepen{deepen}",
            "searches_per_s": round(B / min(ts), 1),
            "reached": int(jnp.sum(r.reached)),
            "n_retried": int(n_re), "wall_s": round(min(ts), 3),
        }), flush=True)
    print("# done", flush=True)


if __name__ == "__main__":
    main()
