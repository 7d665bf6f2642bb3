"""Unique-vertex dedup path (ops/dedup.py): exact parity with the per-row
reference-structured paths.

The dedup path must be indistinguishable from the dense oracle: identical
forward outputs, identical loss marginals, identical collision statistics and
identical parameter trajectories over jitted epochs (gradients are the
count-weighted segment-sums of the per-row gradients — mathematically equal).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from collision_handling_in_instantngp_tpu.config import (
    ModelConfig,
    TopkScatterMode,
    experiment_from_grid_id,
)
from collision_handling_in_instantngp_tpu.models import gngf
from collision_handling_in_instantngp_tpu.ops import dedup as dedup_ops
from collision_handling_in_instantngp_tpu.ops.grid import scale_to_grid
from collision_handling_in_instantngp_tpu.train.loss import (
    compute_loss,
    marginal_slot_distribution,
)
from collision_handling_in_instantngp_tpu.train.train_step import (
    build_epoch_batches,
    make_epoch_fn,
)


def _cfg(**kw):
    base = dict(
        hash_table_size=64, hpd_hidden=(8, 16), mlp_hidden=(16,), topk_k=3,
        fused_hpd=False,
    )
    base.update(kw)
    return ModelConfig(**base)


def _coords(rng, p=257):
    return jnp.asarray(rng.random((p, 2)).astype(np.float32))


# ------------------------------ unit level --------------------------------- #

def test_vertex_ids_and_counts_match_bruteforce(rng):
    cfg = _cfg()
    statics = gngf.make_statics(cfg)
    x = _coords(rng, 123)
    _, corners = scale_to_grid(
        x, jnp.asarray(statics.n_ls), jnp.asarray(statics.offsets)
    )
    side = dedup_ops.grid_side(cfg.n_max)
    u = side * side
    ids = np.asarray(dedup_ops.vertex_ids(corners, side))

    c = np.asarray(corners).astype(np.int32)
    expect = c[..., 0] * side + c[..., 1]
    np.testing.assert_array_equal(ids, expect)
    assert ids.min() >= 0 and ids.max() < u

    counts = np.asarray(dedup_ops.counts_jnp(jnp.asarray(ids), cfg.num_levels, u))
    for l in range(cfg.num_levels):
        np.testing.assert_array_equal(
            counts[l], np.bincount(ids[:, l].ravel(), minlength=u)
        )
    # host-side precompute agrees with the in-graph computation bit-for-bit
    ids_np, counts_np = dedup_ops.build_geometry_np(
        np.asarray(x), statics.n_ls, statics.offsets, cfg.n_max
    )
    np.testing.assert_array_equal(ids_np, ids)
    np.testing.assert_array_equal(counts_np, counts)


def test_unique_coords_cover_all_ids():
    cfg = _cfg()
    uc = dedup_ops.unique_vertex_coords(cfg.n_max, cfg.input_dim)
    side = dedup_ops.grid_side(cfg.n_max)
    assert uc.shape == (side * side, 2)
    # id ordering: coords[id] == (id // side, id % side)
    ids = dedup_ops.vertex_ids_np(uc, side)
    np.testing.assert_array_equal(ids, np.arange(side * side))


# --------------------------- forward parity -------------------------------- #

@pytest.mark.parametrize("keep_topk_only", [False, True])
def test_forward_parity_vs_dense(rng, keep_topk_only):
    cfg = _cfg(keep_topk_only=keep_topk_only)
    assert gngf.dedup_enabled(cfg)
    statics = gngf.make_statics(cfg)
    params = gngf.init_params(jax.random.PRNGKey(0), cfg)
    x = _coords(rng)

    out_d = gngf.forward(params, x, cfg, statics, train=True)
    cfg_ref = dataclasses.replace(cfg, dedup_vertices=False)
    out_r = gngf.forward(params, x, cfg_ref, gngf.make_statics(cfg_ref), train=True)

    np.testing.assert_allclose(
        np.asarray(out_d.rgb), np.asarray(out_r.rgb), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(out_d.indices), np.asarray(out_r.indices)
    )
    # dedup emits the pre-reduced marginal; the dense path's marginal over
    # rows must agree
    assert out_d.probs is None and out_d.marginal is not None
    dense = out_r.probs  # (P, L, V, N) with N = T or K
    expect = np.stack([
        np.asarray(marginal_slot_distribution(dense[:, l]))
        for l in range(cfg.num_levels)
    ])
    np.testing.assert_allclose(
        np.asarray(out_d.marginal), expect, rtol=1e-5, atol=1e-7
    )


def test_forward_render_mode_no_counts(rng):
    """train=False skips the marginal/counts machinery entirely."""
    cfg = _cfg()
    statics = gngf.make_statics(cfg)
    params = gngf.init_params(jax.random.PRNGKey(0), cfg)
    out = gngf.forward(params, _coords(rng), cfg, statics, train=False)
    assert out.marginal is None and out.dedup_counts is None
    assert out.rgb.shape[-1] == 3


# ----------------------- gradient / epoch parity --------------------------- #

@pytest.mark.parametrize(
    "variant", ["default", "keep_topk_only", "noop_scatter", "precomputed"]
)
def test_epoch_parity_vs_per_row_paths(rng, variant):
    """Two jitted epochs with dedup on vs off: identical metrics, collision
    counts, and updated parameters (count-weighted gradients are exact)."""
    exp = experiment_from_grid_id(4061)
    model = _cfg()
    if variant == "keep_topk_only":
        model = dataclasses.replace(model, keep_topk_only=True)
    if variant == "noop_scatter":
        model = dataclasses.replace(model, topk_scatter=TopkScatterMode.NOOP)
    train = dataclasses.replace(exp.train, epochs=2)
    exp = dataclasses.replace(exp, model=model, train=train)

    p = 300
    coords = rng.random((p, 2)).astype(np.float32)
    targets = rng.random((p, 3)).astype(np.float32)
    perm = np.random.default_rng(0).permutation(p).astype(np.int32)

    results = {}
    for mode in ("dedup", "per_row"):
        m = dataclasses.replace(model, dedup_vertices=(mode == "dedup"))
        e = dataclasses.replace(exp, model=m)
        statics = gngf.make_statics(m)
        precomp = mode == "dedup" and variant == "precomputed"
        batches = build_epoch_batches(
            coords, targets, 1 / 3, perm,
            model_cfg=m if precomp else None,
            statics=statics if precomp else None,
        )
        if precomp:
            assert batches.dedup_ids is not None
        init_state, make_jitted = make_epoch_fn(e, statics)
        state, tx = init_state(jax.random.PRNGKey(7))
        epoch = make_jitted(tx, p)
        for _ in range(2):
            state, metrics, _ = epoch(state, batches)
        results[mode] = (state, metrics)

    sd, md = results["dedup"]
    sr, mr = results["per_row"]
    np.testing.assert_allclose(float(md.loss), float(mr.loss), rtol=1e-5)
    np.testing.assert_allclose(float(md.mse), float(mr.mse), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(md.js_kl_per_level), np.asarray(mr.js_kl_per_level),
        rtol=1e-4, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(md.collisions), np.asarray(mr.collisions)
    )
    np.testing.assert_allclose(
        np.asarray(md.image), np.asarray(mr.image), rtol=1e-5, atol=1e-6
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(sd.params),
        jax.tree_util.tree_leaves_with_path(sr.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-7,
            err_msg=f"param {jax.tree_util.keystr(pa)}",
        )


def test_dedup_disabled_for_batchnorm_and_hash():
    assert not gngf.dedup_enabled(_cfg(batchnorm_input=True))
    assert not gngf.dedup_enabled(_cfg(use_hash_function=True))
    # scaled table: dedup applies too (the streaming tail handles large U*T)
    from collision_handling_in_instantngp_tpu.config import (
        instantngp_scaled_model,
    )

    scaled = instantngp_scaled_model()
    assert gngf.dedup_enabled(scaled)
    uc = gngf.make_statics(scaled).unique_coords
    assert uc is not None and uc.shape == ((scaled.n_max + 2) ** 2, 2)


# ------------------------ streaming tail (scaled) --------------------------- #

@pytest.mark.parametrize("keep_topk_only", [False, True])
def test_unique_stream_matches_dense(rng, keep_topk_only):
    """The streaming unique tail (scaled-table path) must match the dense
    unique path in forward outputs AND parameter gradients."""
    cfg_dense = _cfg(
        keep_topk_only=keep_topk_only, n_max=16, hash_table_size=128,
        hpd_backend="jax",
    )
    cfg_stream = dataclasses.replace(cfg_dense, hpd_backend="unique_stream")
    statics = gngf.make_statics(cfg_dense)
    params = gngf.init_params(jax.random.PRNGKey(3), cfg_dense)
    x = _coords(rng, 200)
    y = jnp.asarray(rng.random((200, 3)).astype(np.float32))
    lcfg = experiment_from_grid_id(4061).loss

    def loss(params, cfg):
        out = gngf.forward(params, x, cfg, statics, train=True)
        aux = compute_loss(
            out.rgb, y, out.probs, jnp.zeros(4), jnp.zeros(4), lcfg,
            cfg.num_levels, marginals=out.marginal,
        )
        return aux.total, out

    (l_d, out_d), g_d = jax.value_and_grad(loss, has_aux=True)(params, cfg_dense)
    (l_s, out_s), g_s = jax.value_and_grad(loss, has_aux=True)(params, cfg_stream)

    np.testing.assert_allclose(float(l_s), float(l_d), rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(out_s.indices), np.asarray(out_d.indices)
    )
    np.testing.assert_allclose(
        np.asarray(out_s.marginal), np.asarray(out_d.marginal),
        rtol=1e-5, atol=1e-8,
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_s),
        jax.tree_util.tree_leaves_with_path(g_d),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7,
            err_msg=f"grad {jax.tree_util.keystr(pa)}",
        )


def test_unique_stream_noop_scatter(rng):
    """NOOP quirk under streaming: top-k straight-through gradient dropped,
    marginal gradient kept — matches the dense NOOP path."""
    from collision_handling_in_instantngp_tpu.config import TopkScatterMode

    cfg_dense = _cfg(
        n_max=16, hash_table_size=128, hpd_backend="jax",
        topk_scatter=TopkScatterMode.NOOP,
    )
    cfg_stream = dataclasses.replace(cfg_dense, hpd_backend="unique_stream")
    statics = gngf.make_statics(cfg_dense)
    params = gngf.init_params(jax.random.PRNGKey(3), cfg_dense)
    x = _coords(rng, 150)
    y = jnp.asarray(rng.random((150, 3)).astype(np.float32))
    lcfg = experiment_from_grid_id(4061).loss

    def loss(params, cfg):
        out = gngf.forward(params, x, cfg, statics, train=True)
        aux = compute_loss(
            out.rgb, y, out.probs, jnp.zeros(4), jnp.zeros(4), lcfg,
            cfg.num_levels, marginals=out.marginal,
        )
        return aux.total

    g_d = jax.grad(loss)(params, cfg_dense)
    g_s = jax.grad(loss)(params, cfg_stream)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_s),
        jax.tree_util.tree_leaves_with_path(g_d),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7,
            err_msg=f"grad {jax.tree_util.keystr(pa)}",
        )


# ----------------------- reverse-map gather backward ----------------------- #

def test_gather_rows_rev_backward_matches_onehot(rng):
    """The static reverse-map VJP of gather_rows (build_reverse_maps_np) must
    equal the chunked one-hot fallback exactly."""
    from collision_handling_in_instantngp_tpu.models import encoding as enc

    cfg = _cfg()
    statics = gngf.make_statics(cfg)
    side = dedup_ops.grid_side(cfg.n_max)
    u = side * side
    p = 211
    coords = np.asarray(_coords(rng, p))
    ids_np, _ = dedup_ops.build_geometry_np(
        coords, statics.n_ls, statics.offsets, cfg.n_max
    )
    rev = tuple(
        jnp.asarray(r)
        for r in dedup_ops.build_reverse_maps_np(ids_np, statics.n_ls, side)
    )
    local_maps = tuple(
        (jnp.asarray(a), jnp.asarray(b))
        for a, b in dedup_ops.local_of_global_np(statics.n_ls, side)
    )
    ids = jnp.asarray(ids_np)
    table = jnp.asarray(
        rng.standard_normal((cfg.num_levels, u, cfg.feature_dim)).astype(
            np.float32
        )
    )
    cot = jnp.asarray(
        rng.standard_normal(
            (p, cfg.num_levels, 4, cfg.feature_dim)
        ).astype(np.float32)
    )

    out_rev, vjp_rev = jax.vjp(
        lambda t: enc.gather_rows(t, ids, rev=rev, local_maps=local_maps),
        table,
    )
    out_oh, vjp_oh = jax.vjp(lambda t: enc.gather_rows(t, ids), table)
    np.testing.assert_array_equal(np.asarray(out_rev), np.asarray(out_oh))
    np.testing.assert_allclose(
        np.asarray(vjp_rev(cot)[0]), np.asarray(vjp_oh(cot)[0]),
        rtol=1e-6, atol=1e-6,
    )


def test_fit_span_with_dedup_engaged(rng):
    """fit(epoch_span>1) on a dedup-engaged config (exercises the span path's
    collect_indices=False indices skip) matches span=1 history."""
    import dataclasses as dc

    from collision_handling_in_instantngp_tpu.data import ImageData
    from collision_handling_in_instantngp_tpu.train.trainer import fit

    h = w = 24
    img = np.random.default_rng(3).integers(0, 256, size=(h, w, 3))
    data = ImageData(
        coords=(
            np.stack(
                np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), -1
            ).reshape(-1, 2).astype(np.float32) / (max(h, w) - 1)
        ),
        targets=(img.reshape(-1, 3) / 255.0).astype(np.float32),
        height=h, width=w, image=img.astype(np.int64), name="t.png",
    )
    exp = experiment_from_grid_id(4061)
    model = _cfg(n_max=8)
    train = dc.replace(
        exp.train, epochs=12, histograms_rate=5, save_params=False
    )
    exp = dc.replace(exp, model=model, train=train)

    # dedup must engage: duplicated rows exceed the unique count
    b = int(np.ceil(h * w / 3))
    assert b * model.num_corners * model.num_levels > (model.n_max + 2) ** 2

    r1 = fit(exp, data, verbose=False)
    r5 = fit(exp, data, verbose=False, epoch_span=4)
    assert len(r1.history) == len(r5.history) == 12
    for a, c in zip(r1.history, r5.history):
        for k in a:
            np.testing.assert_allclose(c[k], a[k], rtol=1e-5, atol=1e-7)


def test_gather_rows_cells_backward_matches_onehot(rng):
    """The cell-structured VJP (default dedup backward) must match the global
    one-hot fallback."""
    from collision_handling_in_instantngp_tpu.models import encoding as enc

    cfg = _cfg()
    statics = gngf.make_statics(cfg)
    side = dedup_ops.grid_side(cfg.n_max)
    u = side * side
    p = 307
    coords = np.asarray(_coords(rng, p))
    ids_np, _ = dedup_ops.build_geometry_np(
        coords, statics.n_ls, statics.offsets, cfg.n_max
    )
    ids = jnp.asarray(ids_np)
    cell_info = (tuple(int(n) for n in statics.n_ls), side)
    table = jnp.asarray(
        rng.standard_normal((cfg.num_levels, u, cfg.feature_dim)).astype(
            np.float32
        )
    )
    cot = jnp.asarray(
        rng.standard_normal(
            (p, cfg.num_levels, 4, cfg.feature_dim)
        ).astype(np.float32)
    )
    out_c, vjp_c = jax.vjp(
        lambda t: enc.gather_rows(t, ids, cell_info=cell_info), table
    )
    out_oh, vjp_oh = jax.vjp(lambda t: enc.gather_rows(t, ids), table)
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_oh))
    np.testing.assert_allclose(
        np.asarray(vjp_c(cot)[0]), np.asarray(vjp_oh(cot)[0]),
        rtol=1e-5, atol=1e-6,
    )


# ----------------------- active-vertex compaction --------------------------- #

def test_compact_geometry_np_consistency(rng):
    """compact_geometry_np: active covers exactly the touched ids, local ids
    round-trip through active, counts match the global counts at active rows
    (zero on padding), base is the v=0 global id."""
    cfg = _cfg()
    statics = gngf.make_statics(cfg)
    coords = np.asarray(_coords(rng, 100))
    ids, counts = dedup_ops.build_geometry_np(
        coords, statics.n_ls, statics.offsets, cfg.n_max
    )
    touched = np.unique(ids)
    u_c = int(touched.size) + 37  # deliberately padded
    active, ids_local, counts_c, base = dedup_ops.compact_geometry_np(
        ids, cfg.num_levels, u_c
    )
    np.testing.assert_array_equal(active[: touched.size], touched)
    assert (active[touched.size:] == -1).all()
    np.testing.assert_array_equal(active[ids_local], ids)
    np.testing.assert_array_equal(base, ids[:, :, 0])
    for l in range(cfg.num_levels):
        np.testing.assert_array_equal(
            counts_c[l, : touched.size], counts[l][touched]
        )
        assert (counts_c[l, touched.size:] == 0).all()
    # active_coords maps ids back to their integer (i, j) coords
    side = dedup_ops.grid_side(cfg.n_max)
    ac = np.asarray(dedup_ops.active_coords(jnp.asarray(active), side))
    np.testing.assert_array_equal(
        dedup_ops.vertex_ids_np(ac[: touched.size], side), touched
    )


def test_gather_rows_compact_matches_global(rng):
    """Compact-table gather + cell backward == global gather + cell backward
    restricted to the active rows; padded rows get exactly zero gradient."""
    from collision_handling_in_instantngp_tpu.models import encoding as enc

    cfg = _cfg()
    statics = gngf.make_statics(cfg)
    side = dedup_ops.grid_side(cfg.n_max)
    u = side * side
    p = 213
    coords = np.asarray(_coords(rng, p))
    ids_np, _ = dedup_ops.build_geometry_np(
        coords, statics.n_ls, statics.offsets, cfg.n_max
    )
    touched = np.unique(ids_np)
    u_c = int(touched.size) + 19
    active, ids_local, _, base = dedup_ops.compact_geometry_np(
        ids_np, cfg.num_levels, u_c
    )
    table_g = jnp.asarray(
        rng.standard_normal((cfg.num_levels, u, cfg.feature_dim)).astype(
            np.float32
        )
    )
    # compact table = the global rows at active (padding rows arbitrary)
    table_c = jnp.asarray(
        np.asarray(table_g)[:, np.maximum(active, 0)]
    )
    cot = jnp.asarray(
        rng.standard_normal(
            (p, cfg.num_levels, 4, cfg.feature_dim)
        ).astype(np.float32)
    )
    cell_info = (tuple(int(n) for n in statics.n_ls), side)

    out_g, vjp_g = jax.vjp(
        lambda t: enc.gather_rows(
            t, jnp.asarray(ids_np), cell_info=cell_info
        ),
        table_g,
    )
    out_c, vjp_c = jax.vjp(
        lambda t: enc.gather_rows(
            t, jnp.asarray(ids_local), cell_info=cell_info,
            active=jnp.asarray(active), base=jnp.asarray(base),
        ),
        table_c,
    )
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_g))
    dt_g = np.asarray(vjp_g(cot)[0])
    dt_c = np.asarray(vjp_c(cot)[0])
    np.testing.assert_allclose(
        dt_c[:, : touched.size], dt_g[:, touched], rtol=1e-6, atol=1e-6
    )
    assert (dt_c[:, touched.size:] == 0).all()


def test_epoch_parity_compact_vs_full(rng):
    """Two jitted epochs with active-vertex compaction on vs off: identical
    metrics, collisions, and updated parameters."""
    exp = experiment_from_grid_id(4061)
    model = _cfg()
    train = dataclasses.replace(exp.train, epochs=2)
    exp = dataclasses.replace(exp, model=model, train=train)
    statics = gngf.make_statics(model)

    p = 300
    coords = rng.random((p, 2)).astype(np.float32)
    targets = rng.random((p, 3)).astype(np.float32)
    perm = np.random.default_rng(0).permutation(p).astype(np.int32)

    results = {}
    for compact in (True, False):
        batches = build_epoch_batches(
            coords, targets, 1 / 3, perm,
            model_cfg=model, statics=statics, compact_dedup=compact,
        )
        assert batches.dedup_ids is not None
        assert (batches.dedup_active is not None) == compact
        init_state, make_jitted = make_epoch_fn(exp, statics)
        state, tx = init_state(jax.random.PRNGKey(7))
        epoch = make_jitted(tx, p)
        for _ in range(2):
            state, metrics, _ = epoch(state, batches)
        results[compact] = (state, metrics)

    sc, mc = results[True]
    sf, mf = results[False]
    np.testing.assert_allclose(float(mc.loss), float(mf.loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mc.js_kl_per_level), np.asarray(mf.js_kl_per_level),
        rtol=1e-4, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(mc.collisions), np.asarray(mf.collisions)
    )
    np.testing.assert_allclose(
        np.asarray(mc.image), np.asarray(mf.image), rtol=1e-5, atol=1e-6
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(sc.params),
        jax.tree_util.tree_leaves_with_path(sf.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-7,
            err_msg=f"param {jax.tree_util.keystr(pa)}",
        )


def test_epoch_parity_compact_streaming_kernels(rng):
    """Compaction x streaming tail x fused Pallas kernels (interpret),
    through build_epoch_batches + the jitted epoch: identical metrics and
    parameters vs the uncompacted jax streaming path."""
    exp = experiment_from_grid_id(4061)
    model = _cfg(
        n_max=32, hash_table_size=4096, topk_k=4,
        hpd_backend="unique_stream_pallas_interpret",
    )
    train = dataclasses.replace(exp.train, epochs=2)
    exp = dataclasses.replace(exp, model=model, train=train)
    statics = gngf.make_statics(model)

    p = 300
    coords = rng.random((p, 2)).astype(np.float32)
    targets = rng.random((p, 3)).astype(np.float32)
    perm = np.random.default_rng(0).permutation(p).astype(np.int32)

    results = {}
    for compact in (True, False):
        m = model if compact else dataclasses.replace(
            model, hpd_backend="unique_stream"
        )
        e = dataclasses.replace(exp, model=m)
        batches = build_epoch_batches(
            coords, targets, 1 / 3, perm,
            model_cfg=m, statics=statics, compact_dedup=compact,
        )
        assert (batches.dedup_active is not None) == compact
        init_state, make_jitted = make_epoch_fn(e, statics)
        state, tx = init_state(jax.random.PRNGKey(7))
        epoch = make_jitted(tx, p)
        for _ in range(2):
            state, metrics, _ = epoch(state, batches)
        results[compact] = (state, metrics)

    sc, mc = results[True]
    sf, mf = results[False]
    np.testing.assert_allclose(float(mc.loss), float(mf.loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mc.collisions), np.asarray(mf.collisions)
    )
    np.testing.assert_allclose(
        np.asarray(mc.image), np.asarray(mf.image), rtol=1e-5, atol=1e-6
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(sc.params),
        jax.tree_util.tree_leaves_with_path(sf.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-7,
            err_msg=f"param {jax.tree_util.keystr(pa)}",
        )


def test_epoch_parity_cell_table_gather(rng):
    """Cell-table gather (ModelConfig.dedup_cell_gather) vs the per-vertex
    compact gather: identical metrics and parameters over 2 jitted epochs."""
    exp = experiment_from_grid_id(4061)
    train = dataclasses.replace(exp.train, epochs=2)

    p = 300
    coords = rng.random((p, 2)).astype(np.float32)
    targets = rng.random((p, 3)).astype(np.float32)
    perm = np.random.default_rng(0).permutation(p).astype(np.int32)

    results = {}
    for cell in (True, False):
        model = _cfg(dedup_cell_gather=cell)
        e = dataclasses.replace(exp, model=model, train=train)
        statics = gngf.make_statics(model)
        batches = build_epoch_batches(
            coords, targets, 1 / 3, perm, model_cfg=model, statics=statics,
        )
        assert batches.dedup_active is not None
        assert (batches.dedup_cell_corners is not None) == cell
        init_state, make_jitted = make_epoch_fn(e, statics)
        state, tx = init_state(jax.random.PRNGKey(7))
        epoch = make_jitted(tx, p)
        for _ in range(2):
            state, metrics, _ = epoch(state, batches)
        results[cell] = (state, metrics)

    sc, mc = results[True]
    sf, mf = results[False]
    np.testing.assert_allclose(float(mc.loss), float(mf.loss), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mc.image), np.asarray(mf.image), rtol=1e-6, atol=1e-7
    )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(sc.params),
        jax.tree_util.tree_leaves_with_path(sf.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8,
            err_msg=f"param {jax.tree_util.keystr(pa)}",
        )


def test_fit_histograms_with_compaction(rng):
    """fit() with active-vertex compaction engaged and histogram epochs:
    the per-row selected-slot indices (take(idx_u, compact ids)) feeding the
    histogram statistics must match the uncompacted run exactly."""
    import dataclasses as dc

    from collision_handling_in_instantngp_tpu.data import ImageData
    from collision_handling_in_instantngp_tpu.train.trainer import fit

    h, w = 24, 20
    img = np.random.default_rng(3).integers(0, 256, size=(h, w, 3))
    data = ImageData(
        coords=(
            np.stack(
                np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), -1
            ).reshape(-1, 2).astype(np.float32) / (max(h, w) - 1)
        ),
        targets=(img.reshape(-1, 3) / 255.0).astype(np.float32),
        height=h, width=w, image=img.astype(np.int64), name="t.png",
    )
    exp = experiment_from_grid_id(4061)
    model = _cfg()   # n_max=32: a 1/3 batch of 160 pixels touches < 85%
    train = dc.replace(
        exp.train, epochs=6, histograms_rate=3, save_params=False
    )
    exp = dc.replace(exp, model=model, train=train)

    hists = {}
    for compact in (True, False):
        res = fit(
            exp, data, verbose=False, compact_dedup=compact,
        )
        hists[compact] = res.history
    for a, b in zip(hists[True], hists[False]):
        for k in a:
            if k.startswith("hist_") or k.startswith("counts_"):
                np.testing.assert_array_equal(
                    np.asarray(a[k]), np.asarray(b[k]), err_msg=k
                )
            elif isinstance(a[k], (int, float)):
                np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-7)


def test_cells_backward_scatter_regime(rng):
    """Few pixel rows vs many cells (the scaled fine-level regime): the
    scatter-add segment-sum branch must equal the one-hot fallback."""
    from collision_handling_in_instantngp_tpu.models import encoding as enc

    cfg = _cfg(n_max=64)   # finest cell grid 65^2 = 4225 >> 4*p
    statics = gngf.make_statics(cfg)
    side = dedup_ops.grid_side(cfg.n_max)
    u = side * side
    p = 37
    coords = np.asarray(_coords(rng, p))
    ids_np, _ = dedup_ops.build_geometry_np(
        coords, statics.n_ls, statics.offsets, cfg.n_max
    )
    # confirm the scatter branch actually engages at the finest level
    assert p < (int(statics.n_ls[-1]) + 1) ** 2 // 4
    ids = jnp.asarray(ids_np)
    cell_info = (tuple(int(n) for n in statics.n_ls), side)
    table = jnp.asarray(
        rng.standard_normal((cfg.num_levels, u, cfg.feature_dim)).astype(
            np.float32
        )
    )
    cot = jnp.asarray(
        rng.standard_normal(
            (p, cfg.num_levels, 4, cfg.feature_dim)
        ).astype(np.float32)
    )
    out_c, vjp_c = jax.vjp(
        lambda t: enc.gather_rows(t, ids, cell_info=cell_info), table
    )
    out_oh, vjp_oh = jax.vjp(lambda t: enc.gather_rows(t, ids), table)
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_oh))
    np.testing.assert_allclose(
        np.asarray(vjp_c(cot)[0]), np.asarray(vjp_oh(cot)[0]),
        rtol=1e-5, atol=1e-6,
    )
