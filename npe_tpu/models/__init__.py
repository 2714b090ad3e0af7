from npe_tpu.models import ian_simple, ian, ian_v1  # noqa: F401

REGISTRY = {
    "IAN_simple": ian_simple,
    "IAN": ian,
    "IANv1": ian_v1,
}


def get_config(name):
    """Config-as-code lookup, the reference's `imp.load_source` convention
    (`API.py:18`, `train_IAN.py:381`) with a registry instead of file paths.
    Accepts 'IAN_simple', 'IAN_simple.py', or a path ending in one of those.
    """
    import os

    base = os.path.basename(str(name))
    if base.endswith(".py"):
        base = base[:-3]
    if base not in REGISTRY:
        raise KeyError(f"unknown model config {name!r}; have {sorted(REGISTRY)}")
    return REGISTRY[base]
