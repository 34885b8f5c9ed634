"""A/B: bench GKN epoch with vs without the sender-sorted gather
(round-3 default) — bisecting the BENCH_r03 regression."""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import bench


def main():
    from graph_pde_tpu.models import GKNConfig, gkn_init
    from graph_pde_tpu.train import GKNTask

    arrays, graphs = bench.build_data()
    kernel_layers = GKNConfig.kernel_nn3_layers(6, 256, 64)
    cfg = GKNConfig(width=64, ker_width=256, depth=4, ker_in=6,
                    in_width=6, kernel_layers=kernel_layers,
                    relu_last=False, impl="kcached",
                    compute_dtype="bfloat16")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    task = GKNTask(cfg, u_normalizer=arrays.u_normalizer,
                   loss_type="mse")

    t_with = bench.time_epoch_scanned(params, task, graphs, batch_size=20)
    print("with sender_sort:", t_with, flush=True)

    # strip the sender-sort aux -> _gather_src falls back to gather_rows
    graphs_ns = graphs.replace(sender_perm=None, sender_span=0)
    t_without = bench.time_epoch_scanned(params, task, graphs_ns,
                                         batch_size=20)
    print("without sender_sort:", t_without, flush=True)


if __name__ == "__main__":
    main()
