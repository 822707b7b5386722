"""ops tests: masked reductions, masked MHA, Pallas flash attention
(interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from glearning_benchmark_tpu.ops.attention import multi_head_attention
from glearning_benchmark_tpu.ops.pallas_attention import flash_attention
from glearning_benchmark_tpu.ops.segment import masked_max, masked_mean, masked_sum


def test_masked_reductions():
    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 3, 4))
    mask = jnp.asarray([[True, True, False], [True, False, False]])
    s = np.asarray(masked_sum(x, mask))
    np.testing.assert_allclose(s[0], np.arange(8, dtype=np.float32).reshape(2, 4).sum(0))
    m = np.asarray(masked_mean(x, mask))
    np.testing.assert_allclose(m[1], np.arange(12, 16, dtype=np.float32))
    mx = np.asarray(masked_max(x, mask))
    np.testing.assert_allclose(mx[0], np.arange(4, 8, dtype=np.float32))


def test_mha_key_masking():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 4, 2, 8)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 4, 2, 8)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 4, 2, 8)), dtype=jnp.float32)
    mask = jnp.asarray([[True, True, False, False]])
    out = multi_head_attention(q, k, v, key_mask=mask)
    # changing masked-out keys must not change the output
    k2 = k.at[:, 2:].set(99.0)
    v2 = v.at[:, 2:].set(-99.0)
    out2 = multi_head_attention(q, k2, v2, key_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


@pytest.mark.parametrize("shape", [(2, 200, 4, 16), (1, 130, 2, 32), (3, 512, 4, 64)])
def test_flash_attention_matches_reference(shape):
    b, l, h, d = shape
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=shape), dtype=jnp.float32) for _ in range(3))
    mask = np.ones((b, l), bool)
    mask[0, l // 3:] = False
    ref = np.asarray(multi_head_attention(q, k, v, key_mask=jnp.asarray(mask)))
    out = np.asarray(flash_attention(q, k, v, jnp.asarray(mask), interpret=True))
    np.testing.assert_allclose(out[mask], ref[mask], atol=1e-5)


def test_flash_attention_all_valid():
    rng = np.random.default_rng(2)
    shape = (2, 256, 2, 16)
    q, k, v = (jnp.asarray(rng.normal(size=shape), dtype=jnp.float32) for _ in range(3))
    mask = jnp.ones(shape[:2], dtype=bool)
    ref = np.asarray(multi_head_attention(q, k, v, key_mask=mask))
    out = np.asarray(flash_attention(q, k, v, mask, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_flash_attention_gradients_match_xla():
    """Custom-VJP gradients (dQ/dK/dV kernels) against XLA autodiff through
    the dense reference, masked rows included (interpret mode). Also covers
    head dims 4 (the benchmark's d16/4h shape) that stay unpadded in HBM."""
    import jax

    b, l, h, d = 2, 130, 4, 4
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.normal(size=(b, l, h, d)), dtype=jnp.float32)
               for _ in range(3))
    mask = np.ones((b, l), bool)
    mask[1, 90:] = False
    maskj = jnp.asarray(mask)
    w = jnp.asarray(rng.normal(size=(b, l, h, d)), dtype=jnp.float32)
    w = w * maskj[:, :, None, None]  # no gradient through padded rows

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, maskj, interpret=True) * w)

    def loss_ref(q, k, v):
        return jnp.sum(multi_head_attention(q, k, v, key_mask=maskj) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=1e-4)


def test_flash_attention_packed_segments():
    """Packed rows: block-diagonal segment mask matches the XLA seg path,
    forward and gradients (interpret mode)."""
    import jax

    b, l, h, d = 2, 256, 4, 16
    rng = np.random.default_rng(4)
    q, k, v = (jnp.asarray(rng.normal(size=(b, l, h, d)), dtype=jnp.float32)
               for _ in range(3))
    # rows pack 3 / 2 segments with trailing padding (seg 0)
    seg = np.zeros((b, l), np.int32)
    seg[0, :80] = 1
    seg[0, 80:150] = 2
    seg[0, 150:230] = 3
    seg[1, :128] = 1
    seg[1, 128:200] = 2
    segj = jnp.asarray(seg)
    w = jnp.asarray(rng.normal(size=(b, l, h, d)), dtype=jnp.float32)
    w = w * (segj > 0)[:, :, None, None]

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, seg=segj, interpret=True) * w)

    def loss_ref(q, k, v):
        return jnp.sum(multi_head_attention(q, k, v, seg=segj) * w)

    ref = np.asarray(multi_head_attention(q, k, v, seg=segj))
    out = np.asarray(flash_attention(q, k, v, seg=segj, interpret=True))
    valid = seg > 0
    np.testing.assert_allclose(out[valid], ref[valid], atol=1e-5)
    # pad-segment queries emit exact zeros in both paths
    np.testing.assert_array_equal(out[~valid], 0.0)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=1e-4)


def test_flash_attention_dropout_matches_reference_mask():
    """In-kernel dropout: fwd and grads equal XLA attention given the SAME
    keep mask (replicated bit-exactly by dropout_keep_reference)."""
    import jax
    from jax import nn as jnn

    from glearning_benchmark_tpu.ops.pallas_attention import (
        dropout_keep_reference,
    )

    b, l, h, d = 1, 130, 2, 8
    p_drop, seed = 0.3, 1234
    rng = np.random.default_rng(5)
    q, k, v = (jnp.asarray(rng.normal(size=(b, l, h, d)), dtype=jnp.float32)
               for _ in range(3))
    mask = np.ones((b, l), bool)
    mask[0, 100:] = False
    maskj = jnp.asarray(mask)
    w = jnp.asarray(rng.normal(size=(b, l, h, d)), dtype=jnp.float32)
    w = w * maskj[:, :, None, None]

    # the kernel hashes absolute (b*h + h_idx, row, col) indices
    keep = dropout_keep_reference(seed, b * h, l, l, p_drop)
    keep = keep.reshape(b, h, l, l)

    def ref_attn(q, k, v):
        scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
        logits = jnp.einsum("blhd,bshd->bhls", q, k) * scale
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(maskj[:, None, None, :], logits, neg)
        probs = jnn.softmax(logits, axis=-1)
        probs = jnp.where(maskj[:, None, None, :], probs, 0.0)
        probs = jnp.where(keep, probs / (1.0 - p_drop), 0.0)
        return jnp.einsum("bhls,bshd->blhd", probs, v)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, maskj, interpret=True,
                                       p_drop=p_drop, seed=seed) * w)

    def loss_ref(q, k, v):
        return jnp.sum(ref_attn(q, k, v) * w)

    out = np.asarray(flash_attention(q, k, v, maskj, interpret=True,
                                     p_drop=p_drop, seed=seed))
    ref = np.asarray(ref_attn(q, k, v))
    np.testing.assert_allclose(out[mask], ref[mask], atol=1e-5)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=1e-4)


def test_flash_dropout_statistics_and_seed_sensitivity():
    from glearning_benchmark_tpu.ops.pallas_attention import (
        dropout_keep_reference,
    )

    keep = np.asarray(dropout_keep_reference(7, 16, 128, 128, 0.25))
    frac = keep.mean()
    assert abs(frac - 0.75) < 0.01, frac
    keep2 = np.asarray(dropout_keep_reference(8, 16, 128, 128, 0.25))
    assert (keep != keep2).mean() > 0.1  # different seed, different mask
    # p_drop=0 keeps everything
    assert np.asarray(dropout_keep_reference(7, 4, 64, 64, 0.0)).all()


def test_dropout_keep_mask_statistics():
    """Quantized-byte keep mask (ops/attention.py dropout_keep_mask): rate
    quantizes to round(p*256)/256, the effective rate is returned for the
    unbiased rescale, streams differ across keys, n%4 != 0 shapes work."""
    import jax
    import numpy as np
    from glearning_benchmark_tpu.ops.attention import dropout_keep_mask

    keep, p_eff = dropout_keep_mask(jax.random.PRNGKey(0), (64, 129), 0.1)
    assert p_eff == 26 / 256
    rate = 1.0 - float(np.asarray(keep).mean())
    assert abs(rate - p_eff) < 0.01, rate

    keep2, _ = dropout_keep_mask(jax.random.PRNGKey(1), (64, 129), 0.1)
    assert np.asarray(keep != keep2).mean() > 0.05  # key-sensitive stream

    keep0, p0 = dropout_keep_mask(jax.random.PRNGKey(0), (8, 8), 0.0)
    assert p0 == 0.0 and np.asarray(keep0).all()

    # unbiasedness: E[x * keep / (1 - p_eff)] == E[x]
    x = np.ones((512, 512), np.float32)
    keep3, p3 = dropout_keep_mask(jax.random.PRNGKey(2), x.shape, 0.1)
    scaled = x * np.asarray(keep3) / (1.0 - p3)
    assert abs(scaled.mean() - 1.0) < 0.005


def test_hash_keep_mask_statistics():
    """Counter-hash keep mask (r5 generator behind cheap_dropout and the
    XLA attention-prob path): quantized rate, per-position marginals
    across seeds, seed sensitivity, determinism, odd last-dim shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from glearning_benchmark_tpu.ops.attention import hash_keep_mask

    keep, p_eff = hash_keep_mask(jnp.uint32(1234), (64, 129), 0.1)
    assert p_eff == 26 / 256
    assert keep.shape == (64, 129)
    rate = 1.0 - float(np.asarray(keep).mean())
    assert abs(rate - p_eff) < 0.012, rate

    # deterministic for a fixed seed; different seeds decorrelate to the
    # independent-stream agreement level (p^2 + (1-p)^2 ~ 0.817)
    k1 = np.asarray(hash_keep_mask(jnp.uint32(1234), (64, 129), 0.1)[0])
    assert (np.asarray(keep) == k1).all()
    k2 = np.asarray(hash_keep_mask(jnp.uint32(99), (64, 129), 0.1)[0])
    agree = (k1 == k2).mean()
    assert abs(agree - 0.817) < 0.02, agree

    # per-position marginal over many seeds: no stuck positions (the
    # finalizer is a bijection, so any fixed position cycles through all
    # u32 values as the seed varies)
    drops = np.zeros(64, np.int64)
    for s in range(200):
        kk = np.asarray(hash_keep_mask(jnp.uint32(s), (4, 16), 0.1)[0])
        drops += ~kk.reshape(-1)
    frac = drops / 200.0
    assert frac.max() < 0.25 and abs(frac.mean() - 26 / 256) < 0.02

    # rate that quantizes to zero keeps everything
    k0, p0 = hash_keep_mask(jnp.uint32(0), (8, 8), 0.001)
    assert p0 == 0.0 and np.asarray(k0).all()


def test_cheap_dropout_activation_semantics():
    """cheap_dropout (the r5 residual/FFN nn.Dropout replacement): zeros
    exactly p_eff of elements, rescales survivors by exactly 1/(1-p_eff)
    (unbiased), preserves dtype (bf16 stays bf16), and rate=0 / tiny rates
    that quantize to 0 are identity."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from glearning_benchmark_tpu.ops.attention import cheap_dropout

    x = jnp.ones((256, 257), jnp.bfloat16)
    y = cheap_dropout(jax.random.PRNGKey(0), x, 0.1)
    assert y.dtype == jnp.bfloat16
    yf = np.asarray(y, np.float32)
    p_eff = 26 / 256
    surv = 1.0 / (1.0 - p_eff)
    # every element is exactly 0 or exactly the rescaled value
    assert set(np.unique(yf)) <= {0.0, np.float32(jnp.bfloat16(surv))}
    drop_frac = (yf == 0).mean()
    assert abs(drop_frac - p_eff) < 0.01, drop_frac
    # unbiased in expectation
    assert abs(yf.mean() - 1.0) < 0.02

    # identity when the rate quantizes to zero
    z = cheap_dropout(jax.random.PRNGKey(0), x, 0.001)
    assert np.asarray(z == x).all()


def test_encoder_layer_dropout_sites_use_cheap_mask():
    """The transformer's residual/FFN dropout now runs the blocked-byte
    mask: with attention-prob dropout off (attn_p_drop=0) and mlp dropout
    on, a training-mode forward must differ from eval, and every hidden
    activation perturbation must be consistent with the quantized rate
    (trained model output distributions are not asserted — just that the
    stochastic path is live and deterministic under a fixed rng)."""
    import jax
    import jax.numpy as jnp
    from glearning_benchmark_tpu.models.transformer import SimpleTransformer

    model = SimpleTransformer(vocab_size=32, d_model=16, nhead=4, nlayers=1,
                              d_ff=32, p_drop=0.3, max_pos=16, num_classes=2,
                              use_query_nodes=False, attn_p_drop=0.0)
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), bool)
    params = model.init(jax.random.PRNGKey(0), ids, mask, deterministic=True)
    out_det = model.apply(params, ids, mask, deterministic=True)
    out_a = model.apply(params, ids, mask, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    out_b = model.apply(params, ids, mask, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    out_c = model.apply(params, ids, mask, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
    import numpy as np
    assert np.allclose(np.asarray(out_a), np.asarray(out_b))   # rng-determined
    assert not np.allclose(np.asarray(out_a), np.asarray(out_det))  # live
    assert not np.allclose(np.asarray(out_a), np.asarray(out_c))    # key-sensitive
