"""Theano/Lasagne checkpoint converter.

The reference saves name-keyed .npz checkpoints (`GANcheckpoints.py:11-30`)
with Lasagne layer-name-prefixed parameter names ('enc_conv1.W', 'bnorm2.
beta', 'dec_conv2aW', ...). This module ports such a checkpoint into this
framework's layout:

  * forward-conv W:  OIHW -> HWIO           (transpose 2,3,1,0)
  * deconv W:        (Cin, Cout, kh, kw) -> (kh, kw, Cin, Cout)
                     (reference DeconvLayer.get_W_shape, `layers.py:449-452`)
  * enc_fc1.W:       input rows permuted from NCHW-flatten (C,H,W) to the
                     NHWC-flatten (H,W,C) this framework uses
  * everything else: copied verbatim (dense, BN, minibatch, MADE).

MADE masks are NOT in reference checkpoints (non-trainable); to reproduce a
specific trained flow exactly, pass its `ordering` to `made_masks` -- the
connectivity rule is deterministic given the ordering (ops/made.py).
"""

import logging

import numpy as np

logger = logging.getLogger(__name__)

DECONV_NAMES = ("dec_conv1.W", "dec_conv2.W", "dec_conv3.W", "dec_conv4.W", "dec_out.W")
FC1_SPATIAL = (1024, 4, 4)  # enc_conv4 output, NCHW


def convert_param(name, arr):
    arr = np.asarray(arr)
    if name in DECONV_NAMES and arr.ndim == 4:
        return arr.transpose(2, 3, 0, 1)
    if arr.ndim == 4 and name.endswith("W"):
        # forward conv (enc_conv*.W) and MDCL shared filters (*W)
        return arr.transpose(2, 3, 1, 0)
    if name == "enc_fc1.W":
        c, h, w = FC1_SPATIAL
        return arr.reshape(c, h, w, -1).transpose(1, 2, 0, 3).reshape(c * h * w, -1)
    return arr


def convert_param_to_theano(name, arr):
    """Inverse of `convert_param`: export this framework's weights in the
    reference's layout (so a Theano/Lasagne user could load them)."""
    arr = np.asarray(arr)
    if name in DECONV_NAMES and arr.ndim == 4:
        return arr.transpose(2, 3, 0, 1)  # (kh,kw,cin,cout) -> (cin,cout,kh,kw)
    if arr.ndim == 4 and name.endswith("W"):
        return arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
    if name == "enc_fc1.W":
        c, h, w = FC1_SPATIAL
        return arr.reshape(h, w, c, -1).transpose(2, 0, 1, 3).reshape(c * h * w, -1)
    return arr


def convert_to_theano_npz(variables, dst_path, metadata=None):
    """Export a variables dict to a reference-layout checkpoint."""
    from npe_tpu.utils.checkpoints import save_weights

    out = {k: convert_param_to_theano(k, v) for k, v in variables.items()}
    save_weights(dst_path, out, metadata)
    return out


def main():
    """CLI: python -m npe_tpu.utils.convert <theano.npz> <out.npz>
    [--reverse]."""
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--reverse", action="store_true", help="npe_tpu -> Theano layout")
    a = p.parse_args()
    if a.reverse:
        with np.load(a.src, allow_pickle=False) as f:
            variables = {k: f[k] for k in f.files if k != "__metadata__"}
        convert_to_theano_npz(variables, a.dst)
    else:
        convert_theano_npz(a.src, a.dst)
    print(f"wrote {a.dst}")


def convert_theano_npz(src_path, dst_path, metadata=None):
    """Convert a reference checkpoint file to this framework's layout."""
    from npe_tpu.utils.checkpoints import METADATA_KEY, save_weights

    with np.load(src_path, allow_pickle=True) as f:
        stored = {k: f[k] for k in f.files}
    meta = {}
    if "metadata" in stored:
        # The reference stores pickle.dumps(metadata) under 'metadata'
        # (`GANcheckpoints.py:19`); np.load yields it as a 0-d bytes array.
        import pickle

        raw = stored.pop("metadata")
        try:
            item = raw.item() if hasattr(raw, "item") else raw
            if isinstance(item, bytes):
                # Genuine reference checkpoints were pickled under Python 2
                # (cPickle of a dict holding np.float32, `train_IAN.py:571`);
                # py2 numpy pickles need encoding='latin1' to unpickle on
                # py3 (the default ASCII codec raises on them). latin1 also
                # decodes py3 pickles of plain dicts fine.
                meta = pickle.loads(item, encoding="latin1")
            else:
                meta = item
            if not isinstance(meta, dict):
                logger.warning(
                    "%s: metadata unpickled to %s, not dict; dropping it",
                    src_path,
                    type(meta).__name__,
                )
                meta = {}
        except Exception as e:
            logger.warning(
                "%s: could not unpickle reference metadata (%s); converting "
                "without epoch/itr/learning_rate/made_orderings",
                src_path,
                e,
            )
            meta = {}
    converted = {k: convert_param(k, v) for k, v in stored.items() if k != METADATA_KEY}
    save_weights(dst_path, converted, metadata or meta)
    return converted


if __name__ == "__main__":
    main()
