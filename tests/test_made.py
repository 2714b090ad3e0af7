"""MADE / IAF: mask invariants and the autoregressive property
(SURVEY.md section 4: d out_i / d in_j == 0 whenever ord(j) >= ord(i))."""

import jax
import jax.numpy as jnp
import numpy as np

from npe_tpu.ops.made import MaskGenerator, iaf_transform, made_apply, made_init, made_masks


def test_mask_connectivity_rule():
    gen = MaskGenerator(8, [8], l=0.0, seed=1234)
    gen.shuffle("Full")
    layer_masks, direct = gen.masks()
    ordering = gen.ordering
    # direct mask: in j -> out i allowed iff ord(j) + 1 <= ord(i), i.e.
    # strictly earlier in the ordering (`mask_generator.py:94,99-100`).
    expect = (ordering[:, None] + 1 <= ordering[None, :]).astype(np.float32)
    np.testing.assert_array_equal(direct, expect)
    # with l=0 all hidden connectivity degenerates to min(prev)=1
    assert set(np.unique(gen.conns[0])) == {1}


def test_masks_deterministic_replay():
    """reset('Once') at load must reproduce the training-time masks
    (reference `API.py:33-36` vs `train_IAN.py:404-405`)."""
    a = made_masks(16, [16], seed=1234, n_shuffles=1)
    b = made_masks(16, [16], seed=1234, n_shuffles=1)
    for ma, mb in zip(a[0], b[0]):
        np.testing.assert_array_equal(ma, mb)
    np.testing.assert_array_equal(a[1], b[1])


def test_made_autoregressive_property():
    d = 10
    v = made_init(jax.random.PRNGKey(0), "m", d, [d])
    gen = MaskGenerator(d, [d], seed=1234)
    gen.shuffle("Full")
    ordering = gen.ordering  # same seed/protocol as made_init

    f = lambda z: made_apply(v, "m", z[None], n_hidden=1)[0]
    jac = jax.jacobian(f)(jnp.ones(d))  # jac[i, j] = d out_i / d in_j
    for i in range(d):
        for j in range(d):
            if ordering[j] >= ordering[i]:
                assert abs(float(jac[i, j])) < 1e-6, (i, j)


def test_iaf_transform():
    z = jnp.array([1.0, 2.0])
    mu = jnp.array([0.5, 0.0])
    ls = jnp.array([0.0, jnp.log(2.0)])
    out = iaf_transform(z, mu, ls)
    np.testing.assert_allclose(np.asarray(out), [0.5, 1.0], rtol=1e-6)


def test_made_hidden_any_size():
    """Reference limitation (README.md:67-69) lifted: hidden != latent dim."""
    v = made_init(jax.random.PRNGKey(0), "m", 6, [13])
    out = made_apply(v, "m", jnp.ones((2, 6)), n_hidden=1)
    assert out.shape == (2, 6)
