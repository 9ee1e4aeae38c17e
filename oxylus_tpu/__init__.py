"""oxylus_tpu — a TPU-native simulation & rendering framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the Oxylus game engine
(C++/Vulkan reference): SoA-pytree ECS advanced by a single jit'd frame step, batched
rigid-body physics, a Pallas meshlet visibility-buffer rasterizer, and a fused post-FX
stack — plus the host-side runtime around them (app/module system, asset pipeline,
scene serialization compatible with reference scene JSON, scripting, snapshots).
"""

__version__ = "0.1.0"

from . import utils  # noqa: F401
