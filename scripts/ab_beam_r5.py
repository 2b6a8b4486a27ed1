"""Round-5 batched-beam throughput A/B (VERDICT r4 item 1).

Chip-measures the two attributed levers on the bench workload
(B=1024, max_iters=16, beam=64):

* dedup sort work (~45% of round-4 runtime): the exact512 pre-cut's
  ``top_k(16000, 512)`` lowers as a FULL sort; arms swap it for
  lax.approx_max_k (TPU PartialReduce) or per-parent row top-k.
* Pontryagin heuristic transcendentals (~35%): ``heu="fast"`` swaps
  arccos/cos/cbrt chains for a polynomial + bit-trick cbrt
  (decision-identical on the 25-case CPU gate suite).

Prints one JSON line per arm; then ablation attribution for the
winning arm (ablate= stand-ins; only deltas are meaningful).

Run ON CHIP: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/ab_beam_r5.py [batch]
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

    def measure(name, reps=3, **kw):
        def run():
            return kd.search_batch(
                dist, origins_b, res, starts, goals,
                max_iters=16, beam=64, **kw,
            )
        try:
            r = run()
            n_reached = int(jnp.sum(r.reached))  # sync barrier
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                r2 = run()
                _ = float(jnp.sum(r2.cost))
                ts.append(time.perf_counter() - t0)
            out = {
                "arm": name, "searches_per_s": round(B / min(ts), 1),
                "reached": n_reached, "wall_s": round(min(ts), 3),
                **{k: v for k, v in kw.items() if k != "ablate"},
            }
        except Exception as e:
            out = {"arm": name, "error": repr(e)[:200]}
        print(json.dumps(out), flush=True)
        return out

    arms = [
        # round-5b: the sort-payload dedup (exact512 rewritten) vs the
        # legacy lexsort+gather formulation (lex512) — bitwise-equal
        # selections, the ONLY difference is gather elimination
        ("lex512_legacy", {"dedup": "lex512"}),
        ("sortpayload_exact512", {}),
        ("sortpayload_fast", {"heu": "fast"}),
        ("sortpayload_4096", {"dedup": "exact4096"}),
        ("parent_fast", {"dedup": "parent", "heu": "fast"}),
    ]
    results = {}
    for name, kw in arms:
        results[name] = measure(name, **kw)

    # ablation attribution for the new default
    best_name = "sortpayload_exact512"
    print(f"# ablations for {best_name}", flush=True)
    kw = dict(arms[[a[0] for a in arms].index(best_name)][1])
    for ab in ("noheu", "noshot", "nodedup,noheu"):
        measure(f"{best_name}::{ab}", ablate=ab, **kw)

    print("# done", flush=True)


if __name__ == "__main__":
    main()
