"""cmad_tpu — a TPU-native rebuild of CMAD (Constitutive Models via AD).

Same capabilities as ``sandialabs/cmad`` (material-point constitutive models
with AD-derived sensitivities, a differentiable 3D FE layer, calibration
objectives, a YAML deck CLI), re-architected for TPU execution:

- flat, batched state vectors (structure-of-arrays over integration points)
- masked batched Newton solves instead of per-point Python loops
- pjit/shard_map element-parallel assembly over a jax device mesh
- float32-on-TPU / float64-on-CPU precision policy (see cmad_tpu.config)
"""
from cmad_tpu import config as _config

_config.setup()

__version__ = "0.1.0"
