from npe_tpu.ops.initializers import normal, orthogonal, glorot_uniform, constant  # noqa: F401
from npe_tpu.ops.conv import conv2d, deconv2d, dilated_conv2d, avg_pool, global_avg_pool  # noqa: F401
from npe_tpu.ops.linear import dense  # noqa: F401
from npe_tpu.ops.norm import batch_norm_apply, batch_renorm_apply  # noqa: F401
from npe_tpu.ops.activations import lrelu, elu, relu, sigmoid, tanh  # noqa: F401
from npe_tpu.ops.sampling import gaussian_sample  # noqa: F401
from npe_tpu.ops.minibatch import minibatch_discrimination  # noqa: F401
from npe_tpu.ops.mdcl import compose_mdcl_kernel, mdcl_apply, mdclw_kernel, subpixel_shuffle  # noqa: F401
from npe_tpu.ops.beta import beta_mean  # noqa: F401
from npe_tpu.ops.made import MaskGenerator, made_masks, made_apply, iaf_transform  # noqa: F401
