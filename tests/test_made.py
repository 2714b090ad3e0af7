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


def test_made_apply_keeps_compute_dtype_with_f32_mask():
    """Mixed-precision regression (round 3): weights_mask is non-trainable
    and stays f32 while the W alongside it is cast to bf16 for the compute
    pass; the 0/1 mask must cast to W's dtype instead of promoting the MADE
    output (and everything downstream -- the IAF'd latent feeds the decoder,
    whose convs require matching dtypes) back to float32."""
    v = made_init(jax.random.PRNGKey(0), "l_IAF_mu", 16, [128], seed=1234)
    z = jnp.zeros((2, 16), jnp.bfloat16)
    v16 = {
        k: a.astype(jnp.bfloat16) if not k.endswith("weights_mask") else a
        for k, a in v.items()
    }
    for k in v16:
        if k.endswith("weights_mask"):
            assert v16[k].dtype == jnp.float32  # the mixed-dtype premise
    out = made_apply(v16, "l_IAF_mu", z)
    assert out.dtype == jnp.bfloat16


def test_full_ian_bf16_train_step_traces():
    """The full IAN G/D steps must trace under cfg['compute_dtype']=bfloat16
    (the frozen-MADE mask multiply was the dtype hole; eval_shape catches
    any strict-dtype op like conv_general_dilated without compiling)."""
    from npe_tpu.models import get_config
    from npe_tpu.training import train_step as TS

    module = get_config("IAN")
    cfg = dict(module.cfg)
    cfg["compute_dtype"] = "bfloat16"
    cfg["batch_size"] = 2
    variables = module.init(jax.random.PRNGKey(0))
    state = TS.init_train_state(module, variables, cfg)
    gen_step, discrim_step = TS.make_train_steps(module, cfg, donate=False)
    x = jnp.zeros((2, 64, 64, 3))
    z = jnp.zeros((2, cfg["num_latents"]))
    jax.eval_shape(lambda s: gen_step(s, x, z, jax.random.PRNGKey(1), 2e-4), state)
    jax.eval_shape(lambda s: discrim_step(s, x, z, jax.random.PRNGKey(1), 2e-4), state)
