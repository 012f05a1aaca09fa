from hypelcnn_tpu.ops.window_gather import gather_patches, gather_patches_pallas, gather_patches_xla
from hypelcnn_tpu.ops.nn import leaky_relu, local_response_normalization, scale_in_to_out, squash

__all__ = [
    "gather_patches",
    "gather_patches_pallas",
    "gather_patches_xla",
    "leaky_relu",
    "local_response_normalization",
    "scale_in_to_out",
    "squash",
]
