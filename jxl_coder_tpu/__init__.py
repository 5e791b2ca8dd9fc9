"""jxl_coder_tpu: TPU-native JPEG XL codec (JAX/XLA/Pallas).

From-scratch reimplementation of the capability surface of awxkee/jxl-coder
(see SURVEY.md), designed TPU-first: host-side Python/C++ bitstream layer,
device-side jnp/Pallas compute, group-grid sharding via shard_map.
"""
__version__ = "0.1.0"
