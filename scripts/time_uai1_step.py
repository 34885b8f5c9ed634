"""Times the UAI1 full-grid train step on the live backend (the real
TPU under the driver): s=61 full grid, radius 0.1, KernelNN kappa
(ker_width 1024), depth 6, L1 backward, batch 1 — the
UAI1_full_resolution.py:85-283 protocol.

Amortizes dispatch with the one-jit scanned epoch (n graphs => n steps
per epoch, params carried => real inter-step dependency; CLAUDE.md
measurement caveats). Prints per-step ms for loop_vjp on and off.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/time_uai1_step.py
"""
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from graph_pde_tpu.data import (load_or_generate_darcy, prepare_darcy,
                                    darcy_gkn_graphs)
    from graph_pde_tpu.models import GKNConfig, gkn_init
    from graph_pde_tpu.train import GKNTask
    from graph_pde_tpu.train.trainer import make_epoch_fn, stack_epoch
    from graph_pde_tpu.train.optim import adam_steplr

    n = 8
    fields = load_or_generate_darcy(n, 241, seed=0)
    arrays, _ = prepare_darcy(fields, n=n, r=4)  # s=61
    graphs = darcy_gkn_graphs(arrays, m=None, radius=0.1, seed=0)
    print(f"s={arrays.s} N={graphs.x.shape[1]} E={graphs.senders.shape[1]}",
          flush=True)

    import sys

    if "--loop-vjp" in sys.argv:
        variants = [("loop_vjp=False", dict(loop_vjp=False)),
                    ("loop_vjp=True", dict(loop_vjp=True))]
    else:
        # kcached_fused defaults 'off' (GKNConfig) — the fused arms MUST
        # force 'on' or they silently re-run the staged path (round-2
        # advisor finding: both arms measured the same code).
        variants = [
            ("staged bf16", dict(kcached_fused="off")),
            ("staged fp8ste", dict(kcached_fused="off",
                                   k_storage="float8_e4m3")),
            ("fused bf16", dict(kcached_fused="on")),
            ("fused fp8", dict(kcached_fused="on",
                               k_storage="float8_e4m3")),
        ]
        # the fused gate needs the host-verified receiver-span bound
        assert graphs.sorted_span > 0, (
            "graph lacks a verified sorted_span; the fused variants "
            "would silently fall back to the staged path")

    results = {}
    for label, kw in variants:
        cfg = GKNConfig(width=64, ker_width=1024, depth=6, ker_in=6,
                        in_width=6, relu_last=True, impl="kcached",
                        compute_dtype="bfloat16", **kw)
        params = gkn_init(jax.random.PRNGKey(0), cfg)
        task = GKNTask(cfg, u_normalizer=arrays.u_normalizer,
                       loss_type="l1")
        tx = adam_steplr(1e-4, weight_decay=5e-4, steps_per_epoch=1)
        opt_state = tx.init(params)
        epoch_fn = make_epoch_fn(task, tx)
        batches = jax.device_put(
            stack_epoch(graphs, 1, np.random.default_rng(0)))
        params = jax.device_put(params)

        p, o = params, opt_state
        t0 = time.perf_counter()
        p, o, loss, l2 = epoch_fn(p, o, batches)
        float(loss)
        print(f"{label}: first epoch (compile) "
              f"{time.perf_counter() - t0:.1f} s", flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            p, o, loss, l2 = epoch_fn(p, o, batches)
            float(loss)
            times.append(time.perf_counter() - t0)
        step_ms = min(times) / n * 1000
        results[label] = step_ms
        print(f"{label}: step {step_ms:.1f} ms "
              f"(epochs {[f'{t:.3f}' for t in times]})", flush=True)

    items = list(results.items())
    base_label, base_t = items[0]
    for lbl, t in items[1:]:
        print(f"speedup {lbl} over {base_label}: {base_t / t:.3f}x")


if __name__ == "__main__":
    main()
