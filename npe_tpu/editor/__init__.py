from npe_tpu.editor.engine import EditSession  # noqa: F401
