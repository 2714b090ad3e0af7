from npe_tpu.utils.ranges import to_tanh, from_tanh  # noqa: F401
