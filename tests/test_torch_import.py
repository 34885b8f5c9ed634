"""Import the reference's shipped trained checkpoints and verify numerical
parity of our GKN forward against the reference math using the REAL
trained weights."""
import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

CKPT = "/root/reference/graph-neural-operator/model/grain_new_r64_s64testm100"
CKPT2 = ("/root/reference/graph-neural-operator/model/"
         "grain_torus_r64_radius0.4testm100")


@pytest.mark.skipif(not os.path.exists(CKPT),
                    reason="reference checkpoints unavailable")
def test_load_and_parity_with_reference_weights():
    torch = pytest.importorskip("torch")
    from graph_pde_tpu.compat.torch_import import load_reference_kernelnn
    from graph_pde_tpu.models import gkn_apply
    from graph_pde_tpu.graph import build_graph

    params, cfg = load_reference_kernelnn(CKPT)
    assert cfg.width == 64 and cfg.depth == 6
    assert cfg.decoder_mlp

    # random small graph with the checkpoint's feature arity
    rng = np.random.default_rng(0)
    n = 30
    adj = rng.uniform(size=(n, n)) < 0.3
    np.fill_diagonal(adj, True)
    src, dst = np.where(adj)
    x = rng.normal(size=(n, cfg.in_width)).astype(np.float32)
    attr = rng.normal(size=(src.size, cfg.ker_in)).astype(np.float32)

    g = build_graph(x, src, dst, attr)
    jp = jax.tree_util.tree_map(jnp.asarray, params)
    ours = np.asarray(gkn_apply(jp, cfg, g))[:n]

    # reference forward re-implemented with torch ops on the extracted
    # weights (KernelNN with two-layer decoder, neurips5_GKN.py:29-38)
    tx = torch.from_numpy(x)
    h = tx @ torch.from_numpy(params["fc1"]["w"]) + torch.from_numpy(
        params["fc1"]["b"])
    kh = torch.from_numpy(attr)
    for i, layer in enumerate(params["kernel"]):
        kh = kh @ torch.from_numpy(layer["w"]) + torch.from_numpy(layer["b"])
        if i != len(params["kernel"]) - 1:
            kh = torch.relu(kh)
    weight = kh.view(-1, cfg.width, cfg.width)
    tsrc = torch.from_numpy(src)
    tdst = torch.from_numpy(dst)
    for t in range(cfg.depth):
        msg = torch.matmul(h[tsrc].unsqueeze(1), weight).squeeze(1)
        agg = torch.zeros(n, cfg.width)
        cnt = torch.zeros(n)
        agg.index_add_(0, tdst, msg)
        cnt.index_add_(0, tdst, torch.ones(src.size))
        out = agg / cnt.clamp(min=1).unsqueeze(1)
        out = out + h @ torch.from_numpy(params["root"]) + torch.from_numpy(
            params["bias"])
        h = out if t == cfg.depth - 1 else torch.relu(out)
    h = torch.relu(h @ torch.from_numpy(params["fc2"]["w"]) +
                   torch.from_numpy(params["fc2"]["b"]))
    ref = (h @ torch.from_numpy(params["fc3"]["w"]) +
           torch.from_numpy(params["fc3"]["b"])).numpy()

    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)


@pytest.mark.skipif(not os.path.exists(CKPT2),
                    reason="reference checkpoints unavailable")
def test_load_second_checkpoint():
    from graph_pde_tpu.compat.torch_import import load_reference_kernelnn

    params, cfg = load_reference_kernelnn(CKPT2)
    assert cfg.width == 64
    assert all(np.isfinite(l).all()
               for l in jax.tree_util.tree_leaves(params))
