from npe_tpu.models import ian_simple, ian, ian_v1  # noqa: F401

REGISTRY = {
    "IAN_simple": ian_simple,
    "IAN": ian,
    "IANv1": ian_v1,
}


def get_config(name):
    """Config-as-code lookup, the reference's `imp.load_source` convention
    (`API.py:18`, `train_IAN.py:381`). Accepts a registry name
    ('IAN_simple', 'IAN_simple.py', or a path ending in one of those), or a
    path to a user config module -- any .py file exporting the model
    interface (cfg, init, encode_stats, decode, ...) can be a config, same
    as the reference's arbitrary config files."""
    import importlib.util
    import os

    base = os.path.basename(str(name))
    if base.endswith(".py"):
        base = base[:-3]
    if base in REGISTRY:
        return REGISTRY[base]
    path = str(name)
    if os.path.isfile(path) and path.endswith(".py"):
        spec = importlib.util.spec_from_file_location(f"npe_tpu_user_config_{base}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        missing = [a for a in ("cfg", "init", "encode_stats", "decode") if not hasattr(mod, a)]
        if missing:
            raise KeyError(f"config file {name!r} lacks required attrs {missing}")
        return mod
    raise KeyError(f"unknown model config {name!r}; have {sorted(REGISTRY)}")
