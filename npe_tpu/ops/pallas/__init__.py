from npe_tpu.ops.pallas.editor_kernels import blur_matrix, edit_tail, edit_tail_reference  # noqa: F401
from npe_tpu.ops.pallas.staging import stage_uint8_to_tanh  # noqa: F401
