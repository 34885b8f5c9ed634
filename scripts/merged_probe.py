"""Probe: why does the merged o-major backward kernel fail Mosaic?

The split o-major kernels compile and run (PERF_NOTES round 3); the
merged form (shared h2/x/g streams, dwl accumulated across the
sequential E grid) fails the remote compile helper with a hidden
HTTP-500. This probe compiles the merged form alone at a ladder of
(block_e, chunk, kw_last, c_total) sizes to separate a VMEM ceiling
(small sizes pass) from a structural Mosaic rejection (everything
fails).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/merged_probe.py
"""
import time


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from graph_pde_tpu.ops.dense import dense_init
    from graph_pde_tpu.ops.pallas_edge_conv import fused_edge_messages

    key = jax.random.PRNGKey(0)

    ladder = [
        # (e, n, w, kw, block_e, chunk, merged)
        # Findings so far: noscr compiles in 255 s at grid=16 and times
        # out the compile helper at grid>=256 (Mosaic appears to unroll
        # the revisited-accumulator grid); scratch compiled in 11 s at
        # grid=16 but 3 x [kw, c_total] f32 slabs + be=512/ch=512 tiles
        # overflow VMEM. Try scratch with smaller tiles at full E.
        (1179648, 58081, 64, 256, 256, 256, "scratch"),
        (1179648, 58081, 64, 256, 512, 256, "scratch"),
        (1179648, 58081, 64, 256, 512, 512, "scratch"),
    ]
    for (e, n, w, kw, be, ch, form) in ladder:
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(e + kw), 4)
        x = jax.random.normal(k1, (n, w))
        senders = jax.random.randint(k2, (e,), 0, n, dtype=jnp.int32)
        attr = jax.random.normal(k3, (e, 6)) * 0.3
        kp = dense_init(k4, (6, kw // 2, kw, w * w))

        def loss(xx, kpp):
            m = fused_edge_messages(
                xx, senders, attr, kpp, in_channels=w, out_channels=w,
                compute_dtype="bfloat16", block_e=be, chunk=ch,
                resident=True, layout="o",
                merged_bwd=form)  # "noscr" | "scratch" (explicit pins)
            return jnp.sum(m * m)

        label = f"e={e} w={w} kw={kw} be={be} ch={ch} {form}"
        try:
            t0 = time.time()
            g = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, kp)
            s = float(jnp.sum(g[0]))
            print(f"{label:48} OK   sum(dx)={s:.3e}  "
                  f"({time.time()-t0:.0f}s)", flush=True)
        except Exception as ex:
            print(f"{label:48} FAIL {type(ex).__name__}: "
                  f"{str(ex)[:160]}", flush=True)


if __name__ == "__main__":
    main()
