"""T-step training on the torus: the grain-microstructure workflow.

The reference ships TorusGridSplitter-based checkpoints from an
out-of-repo grain experiment (SURVEY.md section 0); sampleT/assembleT
(mp/utilities.py:1321-1438) are its data path. This test exercises the
full loop: periodic sampleT training shards -> GKN with T output
channels -> assembleT full-field stitching."""
import numpy as np
import jax
import jax.numpy as jnp

from graph_pde_tpu.graph import TorusGridSplitter, make_box_grid, stack_graphs
from graph_pde_tpu.models import GKNConfig, gkn_init, gkn_apply
from graph_pde_tpu.train.optim import adam_steplr
import optax


def _periodic_problem(res=12, T=3, n=6, seed=0):
    """theta: smooth periodic field; Y[t]: analytic function of theta."""
    rng = np.random.default_rng(seed)
    from graph_pde_tpu.utils import gaussian_filter

    thetas, ys = [], []
    for _ in range(n):
        raw = rng.normal(size=(res, res)).astype(np.float32)
        theta = np.asarray(gaussian_filter(raw, sigma=2.0, mode="wrap"))
        y = np.stack([np.sin((t + 1) * theta) for t in range(T)])
        thetas.append(theta.reshape(-1, 1))
        ys.append(y.reshape(T, -1))
    return thetas, ys


def test_torus_timeseries_train_and_assemble():
    res, T = 12, 3
    grid = make_box_grid([[0, 1], [0, 1]], [res, res]) * (res - 1) / res
    sp = TorusGridSplitter(grid, res, r=2, m=48, radius=0.25, T=T, seed=0)
    thetas, ys = _periodic_problem(res, T)

    # training shards via sampleT (fixed edge capacity across shards)
    shards = []
    for theta, y in zip(thetas, ys):
        g, xy = sp.sampleT(theta, y, n_edge_pad=2048)
        shards.append(g)
    batch = stack_graphs(shards)

    cfg = GKNConfig(width=16, ker_width=32, depth=2, ker_in=5, in_width=3,
                    out_width=T, relu_last=False, impl="reference")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    tx = adam_steplr(2e-3, steps_per_epoch=1)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch):
        def loss_fn(p):
            out = jax.vmap(lambda g: gkn_apply(p, cfg, g))(batch)
            mask = (jnp.arange(out.shape[1])[None, :]
                    < batch.n_node[:, None]).astype(out.dtype)
            return jnp.sum(((out - batch.y) * mask[..., None]) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    losses = []
    for _ in range(30):
        params, opt, loss = step(params, opt, batch)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], losses[::10]

    # full-field eval: get_data shards -> predict -> assembleT
    theta, y_true = thetas[0], ys[0]
    test_shards = sp.get_data(theta)
    fwd = jax.jit(lambda g: gkn_apply(params, cfg, g))
    preds, xys = [], []
    for g, xy in test_shards:
        out = np.asarray(fwd(g))  # [n_pad, T]
        preds.append(out[: sp.m])
        xys.append(xy)
    full = sp.assembleT(preds, xys, sigma=1e-9)
    assert full.shape == (T, res * res)
    rel = np.linalg.norm(full - y_true) / np.linalg.norm(y_true)
    assert np.isfinite(rel) and rel < 1.0
