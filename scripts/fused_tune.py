"""Fused-pallas edge-conv tuning shootout at the uai4_full_grid_241
scale (E~1.2M, w=64, kappa [6,128,256,4096]) — executes the round-1
tuning list (PERF_NOTES.md): block_e x chunk sweep and
dimension_semantics (PARALLEL on the independent grid axis) via
CompilerParams.

Measures amortized fwd and fwd+bwd ms per conv application with a
loop-carried dependency (CLAUDE.md: XLA hoists loop-invariant bodies).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/fused_tune.py
       [--e 1179648] [--quick]
"""
import argparse
import itertools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e", type=int, default=1179648)  # 1.2M, 512-mult
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--ker-width", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--omajor", action="store_true",
                    help="o-major layout arms vs resident i-major best")
    ap.add_argument("--fwdqt", action="store_true",
                    help="round-4 MFU probe: o-major fwd QTo GEMM vs "
                         "VPU slice-sum form at the best tile combos")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from graph_pde_tpu.ops.dense import dense_init
    from graph_pde_tpu.ops.pallas_edge_conv import fused_edge_messages

    w = args.width
    e = args.e
    n = 58081  # 241^2 nodes
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.device_put(jax.random.normal(k1, (n, w)))
    senders = jax.device_put(
        jax.random.randint(k2, (e,), 0, n, dtype=jnp.int32))
    attr = jax.device_put(jax.random.normal(k3, (e, 6)) * 0.3)
    kparams = jax.device_put(
        dense_init(k4, (6, args.ker_width // 2, args.ker_width, w * w)))

    def time_fn(fn, *ops, iters=args.iters):
        jfn = jax.jit(fn)
        out = jfn(*ops)
        float(jnp.sum(out))  # compile + sync
        t0 = time.perf_counter()
        out = jfn(*ops)
        float(jnp.sum(out))
        dt1 = time.perf_counter() - t0
        return dt1 * 1000 / iters

    results = {}
    if args.fwdqt:
        # fwd-only probe: pin merged_bwd=False below (explicit be=512
        # tiles exceed the merged kernel's VMEM budget) and skip the
        # step arm — the QTo form does not change the backward
        combos = [(512, 512, True, True, "o", qt)
                  for qt in ("gemm", "slices")]
        combos += [(512, 256, True, True, "o", "slices"),
                   (512, 1024, True, True, "o", "slices")]
    elif args.omajor:
        # o-major layout arms (resident) vs the round-3 resident best
        combos = [(512, 1024, True, True, "i", "gemm"),
                  (1024, 512, True, True, "i", "gemm")]
        combos += [(be, ch, True, True, "o", "gemm")
                   for be in (256, 512, 1024)
                   for ch in (256, 512, 1024)]
    else:
        combos = [(be, ch, ds, False, "i", "gemm")
                  for be in ((512, 1024) if args.quick
                             else (256, 512, 1024, 2048))
                  for ch in ((1024, 2048) if args.quick
                             else (1024, 2048, 4096))
                  for ds in (True, False)]
        # Wl-resident variants (whole last layer in VMEM, single E grid)
        combos += [(be, ch, True, True, "i", "gemm")
                   for be in (256, 512, 1024)
                   for ch in (512, 1024, 2048)]
    for block_e, chunk, ds, res, lay, fqt in combos:
        if chunk > w * w:
            continue
        label = (f"be={block_e} ch={chunk} ds={int(ds)}"
                 + (" RES" if res else "") + (" OMJ" if lay == "o" else "")
                 + (" QTSL" if fqt == "slices" else ""))

        def fwd_loop(x, senders, attr, kp, _be=block_e, _ch=chunk,
                     _ds=ds, _res=res, _lay=lay, _fqt=fqt):
            def body(carry, _):
                msg = fused_edge_messages(
                    carry, senders, attr, kp, in_channels=w,
                    out_channels=w, compute_dtype="bfloat16",
                    block_e=_be, chunk=_ch, dim_semantics=_ds,
                    resident=_res, layout=_lay, fwd_qt=_fqt,
                    merged_bwd=(False if args.fwdqt else None))
                # carry a dependency: fold messages back into x
                nxt = carry + 1e-12 * msg[: carry.shape[0]]
                return nxt, ()

            out, _ = jax.lax.scan(body, x, None, length=args.iters)
            return out

        def step_loop(x, senders, attr, kp, _be=block_e, _ch=chunk,
                      _ds=ds, _res=res, _lay=lay, _fqt=fqt):
            def one(xx, kpp):
                msg = fused_edge_messages(
                    xx, senders, attr, kpp, in_channels=w,
                    out_channels=w, compute_dtype="bfloat16",
                    block_e=_be, chunk=_ch, dim_semantics=_ds,
                    resident=_res, layout=_lay, fwd_qt=_fqt)
                return jnp.sum(msg * msg)

            def body(carry, _):
                xx, kpp = carry
                loss, grads = jax.value_and_grad(one, argnums=(0, 1))(
                    xx, kpp)
                gx, gk = grads
                xx = xx - 1e-12 * gx
                kpp = jax.tree_util.tree_map(
                    lambda p, g: p - 1e-12 * g, kpp, gk)
                return (xx, kpp), loss

            (xx, _), losses = jax.lax.scan(body, (x, kp), None,
                                           length=args.iters)
            return xx + jnp.sum(losses) * 0

        try:
            t_fwd = time_fn(fwd_loop, x, senders, attr, kparams)
            t_step = (float("nan") if args.fwdqt
                      else time_fn(step_loop, x, senders, attr, kparams))
        except Exception as ex:  # VMEM OOM etc. — record and move on
            print(f"{label}: FAILED {type(ex).__name__}: "
                  f"{str(ex)[:120]}", flush=True)
            continue
        results[label] = (t_fwd, t_step)
        print(f"{label}: fwd {t_fwd:.2f} ms  fwd+bwd {t_step:.2f} ms",
              flush=True)

    if not results:
        print("no arms succeeded")
        return
    best_f = min(results.items(), key=lambda kv: kv[1][0])
    best_s = min(results.items(), key=lambda kv: kv[1][1])
    print(f"BEST fwd: {best_f[0]} {best_f[1][0]:.2f} ms")
    print(f"BEST fwd+bwd: {best_s[0]} {best_s[1][1]:.2f} ms")


if __name__ == "__main__":
    main()
