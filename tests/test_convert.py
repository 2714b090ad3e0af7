"""Theano-layout parity tests via torch (CPU) golden computations.

torch's conv2d is cross-correlation over NCHW/OIHW -- the exact convention
of the reference's cuDNN layers (flip_filters=False). These tests build
weights in the REFERENCE layout, run torch as the stand-in for Theano+cuDNN,
convert the weights with utils/convert.py, run our NHWC/HWIO ops, and demand
agreement. This operationalizes "pixel-parity vs the Theano checkpoint"
without the (missing) reference artifacts (SURVEY.md section 7)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from npe_tpu.ops.conv import conv2d, deconv2d
from npe_tpu.ops.linear import dense
from npe_tpu.utils.convert import convert_param


def test_forward_conv_parity_with_torch():
    rng = np.random.RandomState(0)
    x_nchw = rng.randn(2, 3, 16, 16).astype(np.float32)
    w_oihw = rng.randn(8, 3, 5, 5).astype(np.float32) * 0.1

    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x_nchw), torch.from_numpy(w_oihw), stride=2, padding=2
    ).numpy()

    w_hwio = convert_param("enc_conv1.W", w_oihw)
    ours = np.asarray(
        conv2d(jnp.asarray(x_nchw.transpose(0, 2, 3, 1)), jnp.asarray(w_hwio), stride=2, padding=2)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_deconv_parity_with_torch_grad():
    """The reference deconv is cuDNN's conv-input-gradient with output
    hardcoded to 2x input (`layers.py:460,467-483`). torch equivalent:
    conv_transpose2d with stride 2, padding=crop=2, output_padding=1."""
    rng = np.random.RandomState(1)
    x_nchw = rng.randn(2, 6, 4, 4).astype(np.float32)
    # reference DeconvLayer W shape: (num_input_channels, num_filters, k, k)
    w_ref = rng.randn(6, 4, 5, 5).astype(np.float32) * 0.1

    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x_nchw), torch.from_numpy(w_ref), stride=2, padding=2, output_padding=1
    ).numpy()
    assert ref.shape == (2, 4, 8, 8)

    w_ours = convert_param("dec_conv1.W", w_ref)  # -> (kh, kw, cin, cout)
    ours = np.asarray(
        deconv2d(jnp.asarray(x_nchw.transpose(0, 2, 3, 1)), jnp.asarray(w_ours), stride=2, crop=2)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_fc1_row_permutation():
    """enc_fc1 consumes conv4 features; the reference flattens NCHW
    (C,H,W-major), we flatten NHWC. The converter's row permutation must
    make both produce the same dense output."""
    rng = np.random.RandomState(2)
    c, h, w, out = 1024, 4, 4, 10
    feat_nchw = rng.randn(3, c, h, w).astype(np.float32)
    w_ref = rng.randn(c * h * w, out).astype(np.float32) * 0.01

    ref = feat_nchw.reshape(3, -1) @ w_ref  # reference flatten order

    w_ours = convert_param("enc_fc1.W", w_ref)
    feat_nhwc = jnp.asarray(feat_nchw.transpose(0, 2, 3, 1))
    ours = np.asarray(dense(feat_nhwc, jnp.asarray(w_ours)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_decoder_fc_reshape_semantics():
    """l_dec_fc2 output reshaped ([0],C,4,4) C-order in the reference; our
    unflatten_nchw must place the same coefficients at the same (c,h,w)."""
    from npe_tpu.models.common import unflatten_nchw

    y = np.arange(2 * 8 * 2 * 2, dtype=np.float32).reshape(2, 32)
    ref = y.reshape(2, 8, 2, 2)  # NCHW
    ours = np.asarray(unflatten_nchw(jnp.asarray(y), 8, 2, 2))  # NHWC
    np.testing.assert_array_equal(ours.transpose(0, 3, 1, 2), ref)


def test_convert_inverse_roundtrip():
    from npe_tpu.utils.convert import convert_param, convert_param_to_theano

    rng = np.random.RandomState(4)
    cases = {
        "enc_conv2.W": rng.randn(256, 128, 5, 5).astype(np.float32),
        "dec_conv2.W": rng.randn(512, 256, 5, 5).astype(np.float32),
        "dec_conv2aW": rng.randn(512, 512, 3, 3).astype(np.float32),
        "enc_fc1.W": rng.randn(1024 * 16, 10).astype(np.float32),
        "mu_bnorm.gamma": rng.randn(100).astype(np.float32),
    }
    for name, ref in cases.items():
        back = convert_param_to_theano(name, convert_param(name, ref))
        np.testing.assert_array_equal(back, ref, err_msg=name)


def test_convert_npz_roundtrip(tmp_path):
    from npe_tpu.utils.convert import convert_theano_npz

    rng = np.random.RandomState(3)
    src = str(tmp_path / "theano.npz")
    ref_params = {
        "enc_conv1.W": rng.randn(128, 3, 5, 5).astype(np.float32),
        "enc_conv1.b": rng.randn(128).astype(np.float32),
        "dec_conv1.W": rng.randn(1024, 512, 5, 5).astype(np.float32),
        "bnorm2.beta": rng.randn(256).astype(np.float32),
    }
    np.savez(src, **ref_params)
    dst = str(tmp_path / "ours.npz")
    out = convert_theano_npz(src, dst)
    assert out["enc_conv1.W"].shape == (5, 5, 3, 128)
    assert out["dec_conv1.W"].shape == (5, 5, 1024, 512)
    assert out["enc_conv1.b"].shape == (128,)
    with np.load(dst) as f:
        assert f["bnorm2.beta"].shape == (256,)


def test_convert_py2_pickled_metadata(tmp_path):
    """Genuine reference checkpoints carry metadata cPickled under Python 2
    (`train_IAN.py:571` pickles np.float32 via py2 cPickle); such pickles
    store raw byte-strings with SHORT_BINSTRING opcodes that py3's default
    ASCII codec refuses. The converter must decode them (latin1) instead of
    silently dropping epoch/itr/learning_rate/made_orderings."""
    import pickle

    from npe_tpu.utils.checkpoints import load_weights
    from npe_tpu.utils.convert import convert_theano_npz

    # Hand-assembled protocol-2 stream mimicking a py2 dict pickle:
    # {'epoch': 5, 'payload': <4 raw bytes with a non-ascii \xb7>} where the
    # value uses SHORT_BINSTRING (U) exactly as py2 pickles numpy scalar
    # payloads -- py3 pickle.loads(...) without encoding='latin1' raises.
    raw = (
        b"\x80\x02}q\x00(X\x05\x00\x00\x00epochq\x01K\x05"
        b"X\x07\x00\x00\x00payloadq\x02U\x04\x17\xb7Q9q\x03u."
    )
    try:
        pickle.loads(raw)
        raise AssertionError("expected the ASCII codec to refuse this stream")
    except UnicodeDecodeError:
        pass

    src = str(tmp_path / "theano.npz")
    np.savez(
        src,
        **{"enc_conv1.b": np.ones(4, np.float32), "metadata": np.asarray(raw)},
    )
    dst = str(tmp_path / "ours.npz")
    convert_theano_npz(src, dst)
    meta = load_weights(dst, {"enc_conv1.b": np.zeros(4, np.float32)})
    assert meta["epoch"] == 5  # survived, not silently dropped
