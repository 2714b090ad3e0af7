"""npe_tpu: a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
ajbrock/Neural-Photo-Editor (Introspective Adversarial Networks + the Neural
Photo Editor).

Re-architected TPU-first, not a port:
  * pure functional layers over flat, name-keyed parameter dicts (the
    reference's checkpoint ABI, `GANcheckpoints.py:11-57`, carries over so
    Theano weights can be converted 1:1);
  * `jax.lax.conv_general_dilated` everywhere the reference touched cuDNN
    (reference `layers.py:436-483`, `IAN_simple.py:56-68`);
  * the whole interactive edit-propagation step compiles to a single XLA
    program (reference ran two GPU round trips + host-side scipy per mouse
    event, `NPE.py:192-235`);
  * data-parallel / tensor-parallel training via `jax.sharding` meshes.

Layout:
    npe_tpu.ops        -- layer/op library (reference `layers.py`, `mask_generator.py`)
    npe_tpu.models     -- IAN / IANv1 / IAN_simple model zoo (reference `IAN*.py`)
    npe_tpu.api        -- plat-style inference API (reference `API.py`)
    npe_tpu.editor     -- headless edit engine + GUI (reference `NPE.py`)
    npe_tpu.training   -- training / sampling drivers (reference `train_IAN.py`, `sample_IAN.py`)
    npe_tpu.parallel   -- mesh / sharding utilities (new; reference was single-GPU)
    npe_tpu.utils      -- checkpoints, metrics, plotting (reference `GANcheckpoints.py`,
                          `metrics_logging.py`, `discgen_utils.py`)
    npe_tpu.data       -- data pipeline (reference used Fuel CelebA)
"""

__version__ = "0.1.0"

from npe_tpu.utils.ranges import to_tanh, from_tanh  # noqa: F401
