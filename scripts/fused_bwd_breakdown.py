"""Where do the fused conv's backward milliseconds go at uai4 scale?

The round-3 o-major sweep left fwd at 26 ms but fwd+bwd at 118 ms —
a 3.5x fwd multiple where the MXU cycle count says ~3x and the
remainder is suspected to be the XLA gather-transpose (scatter-add of
dx_src [E, w] into x [N, w] by senders) plus the sequential dw kernel.
This harness separates them:

  fwd            : messages only
  fwd+dk         : grad wrt kernel params only (no dx scatter-add)
  fwd+dx         : grad wrt x only (includes scatter-add, no dw kernel)
  fwd+dk+dx      : full (the sweep's step arm)
  scatter        : isolated jnp scatter-add dx_src -> x by senders

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/fused_bwd_breakdown.py [--e 1179648]
"""
import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e", type=int, default=1179648)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--ker-width", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--arms", type=str, default="",
                    help="comma-separated substring filter on arm labels")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from graph_pde_tpu.ops.dense import dense_init
    from graph_pde_tpu.ops.pallas_edge_conv import fused_edge_messages

    w = args.width
    e = args.e
    n = 58081
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.device_put(jax.random.normal(k1, (n, w)))
    senders = jax.device_put(
        jax.random.randint(k2, (e,), 0, n, dtype=jnp.int32))
    attr = jax.device_put(jax.random.normal(k3, (e, 6)) * 0.3)
    kparams = jax.device_put(
        dense_init(k4, (6, args.ker_width // 2, args.ker_width, w * w)))

    import numpy as _np0

    sperm0 = _np0.argsort(_np0.asarray(senders), kind="stable")
    ss0 = _np0.asarray(senders)[sperm0]
    rb0 = ss0.reshape(-1, 512)
    span0 = int((rb0[:, -1] - rb0[:, 0]).max()) + 1
    st = (jax.device_put(jnp.asarray(sperm0, jnp.int32)), span0)

    def msg_of(xx, kpp, sender_sort=None, merged_bwd=False,
               wl_bf16=None, block_e=None):
        return fused_edge_messages(
            xx, senders, attr, kpp, in_channels=w, out_channels=w,
            compute_dtype="bfloat16", sender_sort=sender_sort,
            merged_bwd=merged_bwd, wl_bf16=wl_bf16, block_e=block_e)

    def time_fn(fn, *ops, iters=args.iters):
        jfn = jax.jit(fn)
        out = jfn(*ops)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        out = jfn(*ops)
        float(jnp.sum(out))
        return (time.perf_counter() - t0) * 1000 / iters

    def fwd_loop(x, kp):
        def body(carry, _):
            m = msg_of(carry, kp)
            # scalar fold keeps the loop-carried dependency (CLAUDE.md:
            # XLA hoists loop-invariant bodies) at any e vs n ratio
            return carry + 1e-12 * jnp.sum(m), ()
        out, _ = jax.lax.scan(body, x, None, length=args.iters)
        return out

    def grad_loop(argnums, sender_sort=None, merged_bwd=False,
                  wl_bf16=None, block_e=None):
        def loop(x, kp):
            def one(xx, kpp):
                m = msg_of(xx, kpp, sender_sort, merged_bwd,
                           wl_bf16, block_e)
                return jnp.sum(m * m)

            def body(carry, _):
                xx, kpp = carry
                g = jax.grad(one, argnums=argnums)(xx, kpp)
                if 0 in argnums:
                    xx = xx - 1e-12 * g[argnums.index(0)]
                if 1 in argnums:
                    kpp = jax.tree_util.tree_map(
                        lambda p, gg: p - 1e-12 * gg, kpp,
                        g[argnums.index(1)])
                return (xx, kpp), ()

            (xx, kpp), _ = jax.lax.scan(body, (x, kp), None,
                                        length=args.iters)
            return xx + kpp[0]["b"][0]
        return loop

    def scatter_loop(x, kp):
        dx_src = jax.random.normal(jax.random.PRNGKey(1),
                                   (e, w))

        def body(carry, _):
            upd = dx_src + 1e-12 * carry[senders]
            out = jnp.zeros_like(carry).at[senders].add(upd)
            return out * 1e-12 + carry, ()
        out, _ = jax.lax.scan(body, x, None, length=args.iters)
        return out

    # candidate replacement: permute dx_src to sender-sorted order
    # (random row gather) + block-local one-hot reduce (the machinery
    # that beat XLA's sorted-receiver scatter in round 2)
    import numpy as _np

    from graph_pde_tpu.ops.segment import sorted_block_segment_reduce

    sperm_np = _np.argsort(_np.asarray(senders), kind="stable")
    s_sorted_np = _np.asarray(senders)[sperm_np]
    # blockoh needs a per-512-block span bound; synthetic random senders
    # sorted globally have tiny block spans (E/N edges per node)
    eb = 512
    spans = [int(s_sorted_np[i:i + eb].max() - s_sorted_np[i:i + eb].min())
             for i in range(0, e - eb + 1, eb)]
    span = max(spans) + 1
    span = int(2 ** _np.ceil(_np.log2(max(span, 8))))
    print(f"sender-sorted block span bound: {span}", flush=True)
    sperm = jax.device_put(jnp.asarray(sperm_np, jnp.int32))
    s_sorted = jax.device_put(jnp.asarray(s_sorted_np, jnp.int32))
    mask = jax.device_put(jnp.ones((e,), jnp.float32))

    def permgather_loop(x, kp):
        dx_src = jax.random.normal(jax.random.PRNGKey(1), (e, w))

        def body(carry, _):
            upd = dx_src + 1e-12 * jnp.sum(carry)
            out = upd[sperm]
            return carry + 1e-12 * jnp.sum(out), ()
        out, _ = jax.lax.scan(body, x, None, length=args.iters)
        return out

    def permblockoh_loop(x, kp):
        dx_src = jax.random.normal(jax.random.PRNGKey(1), (e, w))

        def body(carry, _):
            upd = dx_src + 1e-12 * jnp.sum(carry)
            srt = upd[sperm]
            out = sorted_block_segment_reduce(
                srt, s_sorted, mask, n, span=span, mean=False)
            return carry + 1e-12 * out, ()
        out, _ = jax.lax.scan(body, x, None, length=args.iters)
        return out

    def permblockoh_bf16_loop(x, kp):
        dx_src = jax.random.normal(jax.random.PRNGKey(1), (e, w))

        def body(carry, _):
            upd = (dx_src + 1e-12 * jnp.sum(carry)).astype(jnp.bfloat16)
            srt = upd[sperm]
            out = sorted_block_segment_reduce(
                srt, s_sorted, mask.astype(jnp.bfloat16), n,
                span=span, mean=False)
            return carry + 1e-12 * out.astype(jnp.float32), ()
        out, _ = jax.lax.scan(body, x, None, length=args.iters)
        return out

    for label, fn in [
        ("fwd", fwd_loop),
        ("fwd+dk (no scatter)", grad_loop((1,))),
        ("fwd+dx (no dw kernel)", grad_loop((0,))),
        ("fwd+dk+dx (full)", grad_loop((0, 1))),
        ("fwd+dk+dx st-gather", grad_loop((0, 1), st)),
        ("fwd+dk+dx merged", grad_loop((0, 1), None, True)),
        ("fwd+dk+dx merged+st", grad_loop((0, 1), st, True)),
        # round-5 wl-bf16 probe: pinned f32 Wl reproduces the round-4
        # default (auto gate then caps the merged kernel at be=256);
        # the bf16-Wl arms isolate slab-dtype (be256) vs the unlocked
        # block size (be512)
        ("merged+st wlf32 (r4 default)",
         grad_loop((0, 1), st, True, wl_bf16=False)),
        ("merged+st wlbf16 be256",
         grad_loop((0, 1), st, True, wl_bf16=True, block_e=256)),
        ("merged+st wlbf16 be512",
         grad_loop((0, 1), st, True, wl_bf16=True, block_e=512)),
        ("scatter-add alone", scatter_loop),
        ("perm gather alone", permgather_loop),
        ("perm + blockoh", permblockoh_loop),
        ("perm + blockoh bf16", permblockoh_bf16_loop),
    ]:
        wanted = [a.strip() for a in args.arms.split(",") if a.strip()]
        if wanted and not any(a in label for a in wanted):
            continue
        try:
            t = time_fn(fn, x, kparams)
            print(f"{label:24} {t:7.2f} ms", flush=True)
        except Exception as ex:
            print(f"{label:24} FAILED {type(ex).__name__}: "
                  f"{str(ex)[:100]}", flush=True)


if __name__ == "__main__":
    main()
