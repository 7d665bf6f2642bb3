"""Streaming scaled-table HPD-tail kernels (ops/pallas/hpd_stream.py) vs the
jax lax.scan oracle, under the Pallas interpreter (CPU). The real-TPU
execution of the same kernels is exercised by bench.py --mode scaled."""

import numpy as np
import jax
import jax.numpy as jnp

from collision_handling_in_instantngp_tpu.ops.fused_hpd import hpd_tail_unique
from collision_handling_in_instantngp_tpu.ops.pallas import hpd_stream

U, H, L, K = 700, 32, 3, 4  # U not a multiple of the 512-row block
T = hpd_stream.LANE_TILE * 2  # two lane tiles exercises the running merge


def _setup(rng, u=U, t=T):
    h = jnp.asarray(rng.standard_normal((u, H)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.standard_normal((H, t)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal(t).astype(np.float32) * 0.1)
    counts = jnp.asarray(
        rng.integers(0, 5, size=(L, u)).astype(np.float32)
    )
    return h, w, b, counts


def test_supports_gate():
    assert hpd_stream.supports(2**14, 4)
    assert hpd_stream.supports(hpd_stream.LANE_TILE, 1)
    assert not hpd_stream.supports(2**14, 128)   # wide-K grid configs
    assert not hpd_stream.supports(256, 4)       # flagship table width
    assert not hpd_stream.supports(3000, 4)      # non-tile-multiple


def test_stream_forward_matches_jax(rng):
    h, w, b, counts = _setup(rng)
    marg_j, vals_j, idx_j = hpd_tail_unique(
        h, w, b, counts, K, "highest", False, None, "jax"
    )
    marg_p, vals_p, idx_p = hpd_tail_unique(
        h, w, b, counts, K, "highest", False, None, "pallas_interpret"
    )
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_j))
    np.testing.assert_allclose(
        np.asarray(vals_p), np.asarray(vals_j), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(marg_p), np.asarray(marg_j), rtol=1e-5, atol=1e-6
    )


def test_stream_vjp_matches_jax(rng):
    """The backward is the shared jax streaming VJP either way — this pins
    that the kernel-forward residuals (indices) feed it identically."""
    h, w, b, counts = _setup(rng)
    gm = jnp.asarray(rng.standard_normal((L, T)).astype(np.float32))
    gv = jnp.asarray(rng.standard_normal((U, K)).astype(np.float32))

    def scalar(backend):
        def f(h, w, b):
            marg, vals, _ = hpd_tail_unique(
                h, w, b, counts, K, "highest", False, None, backend
            )
            return jnp.sum(marg * gm) + jnp.sum(vals * gv)
        return f

    g_j = jax.grad(scalar("jax"), argnums=(0, 1, 2))(h, w, b)
    g_p = jax.grad(scalar("pallas_interpret"), argnums=(0, 1, 2))(h, w, b)
    for a, b_, name in zip(g_p, g_j, ("dh", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=3e-5, err_msg=name
        )


def test_stream_k1_single_tile(rng):
    """K=1 and exactly one lane tile (no merge step)."""
    h, w, b, counts = _setup(rng, u=520, t=hpd_stream.LANE_TILE)
    marg_j, vals_j, idx_j = hpd_tail_unique(
        h, w, b, counts, 1, "highest", False, None, "jax"
    )
    marg_p, vals_p, idx_p = hpd_tail_unique(
        h, w, b, counts, 1, "highest", False, None, "pallas_interpret"
    )
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_j))
    np.testing.assert_allclose(
        np.asarray(vals_p), np.asarray(vals_j), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(marg_p), np.asarray(marg_j), rtol=1e-5, atol=1e-6
    )


def test_stream_noop_topk_vjp(rng):
    """Reference should_inplace_scatter=None quirk: the straight-through
    top-k backward drops; the marginal gradient still flows."""
    h, w, b, counts = _setup(rng)
    gm = jnp.asarray(rng.standard_normal((L, T)).astype(np.float32))
    gv = jnp.asarray(rng.standard_normal((U, K)).astype(np.float32))

    def scalar(backend):
        def f(h, w, b):
            marg, vals, _ = hpd_tail_unique(
                h, w, b, counts, K, "highest", True, None, backend
            )
            return jnp.sum(marg * gm) + jnp.sum(vals * gv)
        return f

    g_j = jax.grad(scalar("jax"), argnums=(0, 1, 2))(h, w, b)
    g_p = jax.grad(scalar("pallas_interpret"), argnums=(0, 1, 2))(h, w, b)
    for a, b_, name in zip(g_p, g_j, ("dh", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=3e-5, err_msg=name
        )


# --------------------- fused single-sweep kernels --------------------------- #

def test_fused_supports_gate():
    assert hpd_stream.fused_supports(2**14, 4, 128)
    assert not hpd_stream.fused_supports(2**14, 128, 128)  # wide K
    assert not hpd_stream.fused_supports(2**14, 4, 512)    # weight too wide


def test_fused_fwd_matches_split(rng):
    """The fused forward must agree with the split select+marginal pair
    (same math from the same cached logits) and with the jax oracle."""
    h, w, b, counts = _setup(rng)
    marg_f, vals_f, idx_f, m_f, s_f = hpd_stream.hpd_stream_fused_fwd(
        h, w, b, counts, K, interpret=True
    )
    vals_s, idx_s, m_s, s_s = hpd_stream.hpd_stream_select(
        h, w, b, K, interpret=True
    )
    marg_s = hpd_stream.hpd_stream_marginal(
        h, w, b, counts, m_s, s_s, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_s))
    np.testing.assert_allclose(
        np.asarray(vals_f), np.asarray(vals_s), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_s), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_f), np.asarray(s_s), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(marg_f), np.asarray(marg_s), rtol=1e-5, atol=1e-6
    )


def test_fused_bwd_matches_split(rng):
    """The fused backward must agree with the B1+B2 split pair."""
    h, w, b, counts = _setup(rng)
    gm = jnp.asarray(rng.standard_normal((L, T)).astype(np.float32))
    gv = jnp.asarray(rng.standard_normal((U, K)).astype(np.float32))
    vals, idx, m, s = hpd_stream.hpd_stream_select(h, w, b, K, interpret=True)
    for noop in (False, True):
        out_f = hpd_stream.hpd_stream_fused_bwd(
            h, w, b, counts, idx, vals, m, s, gm, gv, K,
            noop_topk=noop, interpret=True,
        )
        out_s = hpd_stream.hpd_tail_unique_pallas_bwd(
            h, w, b, counts, idx, vals, m, s, gm, gv, K,
            noop_topk=noop, interpret=True,
        )
        for a, b_, name in zip(out_f, out_s, ("dh", "dw", "db")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-5,
                err_msg=f"{name} noop={noop}",
            )


def test_split_kernels_vjp_when_fused_gated_off(rng, monkeypatch):
    """Force the split select/marginal/B1/B2 path (fused gate off) through
    the full custom-vjp op — keeps the split kernels covered now that the
    fused variants take these shapes by default."""
    monkeypatch.setattr(hpd_stream, "FUSED_W_MAX_BYTES", 0)
    h, w, b, counts = _setup(rng)
    gm = jnp.asarray(rng.standard_normal((L, T)).astype(np.float32))
    gv = jnp.asarray(rng.standard_normal((U, K)).astype(np.float32))

    def scalar(backend):
        def f(h, w, b):
            marg, vals, _ = hpd_tail_unique(
                h, w, b, counts, K, "highest", False, None, backend
            )
            return jnp.sum(marg * gm) + jnp.sum(vals * gv)
        return f

    g_j = jax.grad(scalar("jax"), argnums=(0, 1, 2))(h, w, b)
    g_p = jax.grad(scalar("pallas_interpret"), argnums=(0, 1, 2))(h, w, b)
    for a, b_, name in zip(g_p, g_j, ("dh", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=3e-5, err_msg=name
        )


def test_kernel_precision_normalization():
    """Every form jax.lax accepts — string, Precision enum, (lhs, rhs)
    pair — must canonicalize instead of reaching the Mosaic lowering crash
    (runs/hw_session_20260818_224639.log:28-46). 'high' passes through: the
    kernels implement it as the 3-pass bf16 hi/lo decomposition (_kdot)."""
    P = jax.lax.Precision
    assert hpd_stream._kernel_precision("default") == "default"
    assert hpd_stream._kernel_precision("highest") == "highest"
    assert hpd_stream._kernel_precision(None) == "highest"
    assert hpd_stream._kernel_precision("high") == "high"
    assert hpd_stream._kernel_precision(P.HIGH) == "high"
    assert hpd_stream._kernel_precision(("high", "high")) == "high"
    assert hpd_stream._kernel_precision((P.DEFAULT, P.HIGH)) == "high"
    assert hpd_stream._kernel_precision((P.DEFAULT, P.DEFAULT)) == "default"
    assert hpd_stream._kernel_precision((P.HIGH, P.HIGHEST)) == "highest"


def test_high_precision_matches_highest_closely(rng):
    """The in-kernel 3-pass bf16 'high' dots must track the fp32 'highest'
    results to ~2^-22 relative (XLA HIGH semantics): same top-k indices on
    non-degenerate data, close values/marginals."""
    h, w, b, counts = _setup(rng)
    marg_hi, vals_hi, idx_hi, m_hi, s_hi = hpd_stream.hpd_stream_fused_fwd(
        h, w, b, counts, K, precision="highest", interpret=True
    )
    marg_h, vals_h, idx_h, m_h, s_h = hpd_stream.hpd_stream_fused_fwd(
        h, w, b, counts, K, precision="high", interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx_h), np.asarray(idx_hi))
    np.testing.assert_allclose(
        np.asarray(vals_h), np.asarray(vals_hi), rtol=2e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(marg_h), np.asarray(marg_hi), rtol=2e-3, atol=1e-4
    )


def test_entry_points_accept_all_precisions(rng):
    """Every kernel entry point must accept 'default'/'high'/'highest' and
    the enum form; interpret mode on CPU proves acceptance (the Mosaic
    lowering itself is exercised by bench.py --precision high on TPU)."""
    import warnings

    h, w, b, counts = _setup(rng)
    gm = jnp.asarray(rng.standard_normal((L, T)).astype(np.float32))
    gv = jnp.asarray(rng.standard_normal((U, K)).astype(np.float32))
    for prec in ("default", "high", "highest", jax.lax.Precision.HIGH):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            vals, idx, m, s = hpd_stream.hpd_stream_select(
                h, w, b, K, precision=prec, interpret=True
            )
            hpd_stream.hpd_stream_marginal(
                h, w, b, counts, m, s, precision=prec, interpret=True
            )
            hpd_stream.hpd_stream_fused_fwd(
                h, w, b, counts, K, precision=prec, interpret=True
            )
            hpd_stream.hpd_stream_fused_bwd(
                h, w, b, counts, idx, vals, m, s, gm, gv, K,
                precision=prec, interpret=True,
            )
            hpd_stream.hpd_tail_unique_pallas_bwd(
                h, w, b, counts, idx, vals, m, s, gm, gv, K,
                precision=prec, interpret=True,
            )


def test_colfold_sweep_bitwise_matches_argmax(rng, monkeypatch):
    """The colfold top-k sweep variant must select BITWISE-identical
    (vals, idx, m, s, marginal) to the argmax variant — it is comparisons
    only, with the same first-lowest-global-index tie rule. Duplicated
    logit values are planted to exercise the tie paths."""
    h, w, b, counts = _setup(rng)
    # plant exact duplicates of some large values across tiles and columns
    w = np.array(w)
    # same column in both tiles and two columns in one tile
    w[:, 37] = w[:, hpd_stream.LANE_TILE + 37]
    w[:, 1] = w[:, hpd_stream.LANE_TILE + 129]
    import jax.numpy as jnp

    w = jnp.asarray(w)
    outs = {}
    for variant in ("argmax", "colfold"):
        monkeypatch.setattr(hpd_stream, "TOPK_SWEEP_VARIANT", variant)
        outs[variant] = hpd_stream.hpd_stream_fused_fwd(
            h, w, b, counts, K, interpret=True
        )
    for a, c in zip(outs["argmax"], outs["colfold"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_auto_sweep_policy_gates_on_precision(rng, monkeypatch):
    """TOPK_SWEEP_VARIANT='auto' must pick colfold at bf16 precisions and
    argmax at exact fp32 (A/B-measured policy, hw_r5_queue.log 2026-08-20:
    +21% at 'default', -1% at 'highest'). Pinned by checking the variants
    still agree bitwise when auto flips between them."""
    h, w, b, counts = _setup(rng)
    monkeypatch.setattr(hpd_stream, "TOPK_SWEEP_VARIANT", "auto")
    # 'default' (auto->colfold) vs forced argmax: same outputs either way
    out_auto = hpd_stream.hpd_stream_fused_fwd(
        h, w, b, counts, K, precision="default", interpret=True
    )
    monkeypatch.setattr(hpd_stream, "TOPK_SWEEP_VARIANT", "argmax")
    out_forced = hpd_stream.hpd_stream_fused_fwd(
        h, w, b, counts, K, precision="default", interpret=True
    )
    for a, c in zip(out_auto, out_forced):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    # gate arithmetic: colfold scratch only fits when nt*k*128 is bounded
    assert hpd_stream._colfold_supported(2 ** 14, 4)
    assert not hpd_stream._colfold_supported(2 ** 14, 16)
