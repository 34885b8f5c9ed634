"""Times the bench-protocol GKN epoch with batch_mode='vmap' (stacked,
per-graph vmap) vs 'flatten' (one disjoint-union graph per batch — the
reference DataLoader's batching layout, UAI1_full_resolution.py:223,
done statically) on the live backend.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/flatten_shootout.py
"""
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from graph_pde_tpu.data import (load_or_generate_darcy, prepare_darcy,
                                    darcy_gkn_graphs)
    from graph_pde_tpu.models import GKNConfig, gkn_init
    from graph_pde_tpu.train import GKNTask
    from graph_pde_tpu.train.trainer import make_epoch_fn, stack_epoch
    from graph_pde_tpu.train.optim import adam_steplr

    fields = load_or_generate_darcy(100, 61, seed=0)
    arrays, _ = prepare_darcy(fields, n=100)
    graphs = darcy_gkn_graphs(arrays, m=200, k=1, radius=0.2, seed=0)
    print(f"N={graphs.x.shape[1]} E={graphs.senders.shape[1]}", flush=True)

    kernel_layers = GKNConfig.kernel_nn3_layers(6, 256, 64)
    for impl in ("kcached", "pallas"):
        for mode in ("vmap", "flatten"):
            cfg = GKNConfig(width=64, ker_width=256, depth=4, ker_in=6,
                            in_width=6, kernel_layers=kernel_layers,
                            relu_last=False, impl=impl,
                            compute_dtype="bfloat16", batch_mode=mode)
            params = gkn_init(jax.random.PRNGKey(0), cfg)
            task = GKNTask(cfg, u_normalizer=arrays.u_normalizer,
                           loss_type="mse")
            tx = adam_steplr(1e-4, weight_decay=5e-4, steps_per_epoch=1)
            opt_state = tx.init(params)
            epoch_fn = make_epoch_fn(task, tx)
            batches = jax.device_put(
                stack_epoch(graphs, 20, np.random.default_rng(0)))
            p = jax.device_put(params)
            o = opt_state
            t0 = time.perf_counter()
            p, o, loss, l2 = epoch_fn(p, o, batches)
            float(loss)
            print(f"{impl}/{mode}: compile {time.perf_counter()-t0:.1f} s",
                  flush=True)
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                p, o, loss, l2 = epoch_fn(p, o, batches)
                float(loss)
                times.append(time.perf_counter() - t0)
            print(f"{impl}/{mode}: epoch {min(times)*1000:.1f} ms "
                  f"({[f'{t:.3f}' for t in times]})", flush=True)


if __name__ == "__main__":
    main()
