"""End-to-end numeric parity of the GNGF model against an independent PyTorch
implementation of the documented reference math (models.py:239-655), with
identical weights copied into both frameworks.

This is the `allclose` parity evidence BASELINE.md asks for: forward outputs
and parameter gradients must agree between the JAX/TPU implementation and
torch autograd through the same pipeline (HPD softmax -> straight-through
top-k -> table gather + softmax blend -> bilinear interp -> sigmoid MLP ->
MSE + marginal JS/KL loss).

The torch model here is written from the SURVEY.md formulas — it is a test
oracle, not a copy of the reference code."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from collision_handling_in_instantngp_tpu.config import LossConfig, ModelConfig
from collision_handling_in_instantngp_tpu.models import gngf
from collision_handling_in_instantngp_tpu.train.loss import compute_loss

torch.manual_seed(0)

CFG = ModelConfig(
    hash_table_size=64,
    num_levels=4,
    n_min=8,
    n_max=32,
    feature_dim=2,
    mlp_hidden=(16, 16),
    hpd_hidden=(8, 16),
    topk_k=3,
    fused_hpd=False,  # dense path — the direct analog of the torch oracle
)
LCFG = LossConfig(gamma=-2.0, epsilon=1.0, l_mse=1.0, l_js_kl=1.0,
                  l_collisions=1e-3)


def _to_torch_mlp(params):
    """JAX layer list -> list of torch Linear with identical weights."""
    layers = []
    for lay in params:
        w = np.asarray(lay["w"])  # (in, out)
        lin = torch.nn.Linear(w.shape[0], w.shape[1])
        with torch.no_grad():
            lin.weight.copy_(torch.tensor(w.T))
            lin.bias.copy_(torch.tensor(np.asarray(lay["b"])))
        layers.append(lin)
    return torch.nn.ModuleList(layers)


def _torch_forward_and_loss(params, x_np, y_np, prev_coll, prev_min):
    """Independent torch implementation of the full GNGF pipeline + loss."""
    t, l, f, k = (CFG.hash_table_size, CFG.num_levels, CFG.feature_dim,
                  CFG.topk_k)
    n_ls = torch.tensor([8, 12, 20, 32], dtype=torch.float32)
    offsets = torch.tensor([[0, 0], [1, 0], [0, 1], [1, 1]], dtype=torch.float32)

    hpd = _to_torch_mlp(params["hpd"])
    mlp = _to_torch_mlp(params["mlp"])
    tables = torch.tensor(np.asarray(params["tables"]), requires_grad=True)

    x = torch.tensor(x_np)
    y = torch.tensor(y_np)

    scaled = x[:, None, :] * n_ls[None, :, None]                  # (P, L, 2)
    corners = torch.floor(scaled)[:, :, None, :] + offsets        # (P, L, 4, 2)

    # HPD
    h = corners
    for i, lin in enumerate(hpd):
        h = lin(h)
        if i < len(hpd) - 1:
            h = torch.relu(h)
    probs = torch.softmax(h, dim=-1)
    probs = torch.nan_to_num(probs)

    # straight-through top-k (torch autograd scatters grads of `values`
    # into the dense probs tensor natively through topk's backward)
    values, indices = torch.topk(probs, k=k, dim=-1, largest=True, sorted=True)

    # gather + softmax blend
    flat_tables = tables.reshape(l * t, f)
    level_off = (torch.arange(l) * t)[None, :, None, None]
    feats = flat_tables[(indices + level_off).reshape(-1)].reshape(
        indices.shape + (f,)
    )                                                             # (P,L,4,K,F)
    w = torch.softmax(values, dim=-1)
    blended = (feats * w[..., None]).sum(dim=-2)                  # (P,L,4,F)

    # bilinear
    frac = scaled - torch.floor(scaled)                           # (P,L,2)
    fw = offsets[None, None] * frac[:, :, None, :] + (
        1 - offsets[None, None]
    ) * (1 - frac[:, :, None, :])
    coeffs = fw.prod(dim=-1)                                      # (P,L,4)
    enc = (blended * coeffs[..., None]).sum(dim=2)                # (P,L,F)
    enc = enc.reshape(enc.shape[0], l * f)

    out = enc
    for i, lin in enumerate(mlp):
        out = lin(out)
        out = torch.relu(out) if i < len(mlp) - 1 else torch.sigmoid(out)

    # loss
    mse = torch.mean((out - y) ** 2)
    kl_bm = torch.nn.KLDivLoss(reduction="batchmean")
    total = LCFG.l_mse * mse
    p_batch, v = probs.shape[0], probs.shape[2]
    coll = torch.tensor(prev_coll) / (torch.tensor(prev_min) + LCFG.delta)
    for li in range(l):
        pm = probs[:, li].sum(0).sum(0) / (p_batch * v)
        q = torch.full((t,), 1.0 / t)
        kl = kl_bm(pm.log(), q)
        m = (pm + q) / 2
        js = (kl_bm(pm.log(), m) + kl_bm(q.log(), m)) / 2
        js_kl = -(LCFG.gamma + LCFG.epsilon) * js + LCFG.epsilon * kl
        total = total + LCFG.l_js_kl * js_kl + LCFG.l_collisions * coll[li]

    total.backward()
    grads = {
        "tables": tables.grad.numpy(),
        "hpd_w0": hpd[0].weight.grad.numpy().T,
        "hpd_wlast": hpd[-1].weight.grad.numpy().T,
        "mlp_w0": mlp[0].weight.grad.numpy().T,
    }
    return out.detach().numpy(), float(total), grads


@pytest.mark.parametrize("dedup", [False, True])
def test_forward_and_grad_parity(rng, dedup):
    """Both the dense per-row path and the unique-vertex dedup path must match
    torch autograd through the identical pipeline."""
    cfg = dataclasses.replace(CFG, dedup_vertices=dedup)
    statics = gngf.make_statics(cfg)
    params = gngf.init_params(jax.random.PRNGKey(42), cfg)

    p = 50
    x_np = rng.random((p, 2), dtype=np.float32)
    y_np = rng.random((p, 3), dtype=np.float32)
    prev_coll = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    prev_min = np.array([0.0, 0.0, 5.0, 10.0], np.float32)

    def jax_loss(params):
        out = gngf.forward(params, jnp.asarray(x_np), cfg, statics)
        aux = compute_loss(
            out.rgb, jnp.asarray(y_np), out.probs,
            jnp.asarray(prev_coll), jnp.asarray(prev_min), LCFG,
            cfg.num_levels, marginals=out.marginal,
        )
        return aux.total, out.rgb

    (jax_total, jax_rgb), jax_grads = jax.value_and_grad(
        jax_loss, has_aux=True
    )(params)

    torch_rgb, torch_total, torch_grads = _torch_forward_and_loss(
        params, x_np, y_np, prev_coll, prev_min
    )

    np.testing.assert_allclose(np.asarray(jax_rgb), torch_rgb, atol=1e-5)
    np.testing.assert_allclose(float(jax_total), torch_total, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax_grads["tables"]), torch_grads["tables"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(jax_grads["hpd"][0]["w"]), torch_grads["hpd_w0"], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jax_grads["hpd"][-1]["w"]), torch_grads["hpd_wlast"],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(jax_grads["mlp"][0]["w"]), torch_grads["mlp_w0"], atol=1e-5
    )


def test_vanilla_path_forward_parity(rng):
    """Spatial-hash path: same pipeline minus HPD (hash + gather + interp)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, use_hash_function=True, hash_table_size=64)
    statics = gngf.make_statics(cfg)
    params = gngf.init_params(jax.random.PRNGKey(7), cfg)

    p = 40
    x_np = rng.random((p, 2), dtype=np.float32)
    out = gngf.forward(params, jnp.asarray(x_np), cfg, statics)

    # torch oracle
    t, l, f = cfg.hash_table_size, cfg.num_levels, cfg.feature_dim
    n_ls = torch.tensor([8, 12, 20, 32], dtype=torch.float32)
    offsets = torch.tensor([[0, 0], [1, 0], [0, 1], [1, 1]], dtype=torch.float32)
    x = torch.tensor(x_np)
    scaled = x[:, None, :] * n_ls[None, :, None]
    corners = (torch.floor(scaled)[:, :, None, :] + offsets).to(torch.int64)
    primes = torch.tensor([1, 2654435761], dtype=torch.int64)
    acc = torch.zeros(corners.shape[:-1], dtype=torch.int64)
    for i in range(2):
        acc = torch.bitwise_xor(corners[..., i] * primes[i], acc)
    idx = torch.remainder(acc, t)

    np.testing.assert_array_equal(np.asarray(out.indices), idx.numpy())

    tables = torch.tensor(np.asarray(params["tables"]))
    feats = tables.reshape(l * t, f)[
        (idx + (torch.arange(l) * t)[None, :, None]).reshape(-1)
    ].reshape(idx.shape + (f,))
    frac = scaled - torch.floor(scaled)
    fw = offsets[None, None] * frac[:, :, None, :] + (
        1 - offsets[None, None]
    ) * (1 - frac[:, :, None, :])
    coeffs = fw.prod(dim=-1)
    enc = (feats * coeffs[..., None]).sum(dim=2).reshape(p, l * f)
    mlp = _to_torch_mlp(params["mlp"])
    o = enc
    for i, lin in enumerate(mlp):
        o = lin(o)
        o = torch.relu(o) if i < len(mlp) - 1 else torch.sigmoid(o)
    np.testing.assert_allclose(np.asarray(out.rgb), o.detach().numpy(), atol=1e-5)
