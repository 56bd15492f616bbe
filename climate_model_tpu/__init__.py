"""climate_model_tpu: a TPU-native hydrostatic climate dynamical core.

Brand-new rebuild of the capability surface of Potopoles/Climate_Model
(see SURVEY.md) on JAX/XLA/Pallas: functional state pytrees, jit/scan time
stepping, 2-D lat-lon domain decomposition over a TPU mesh, fused Pallas
stencil kernels for the hot operators.
"""

__version__ = "0.5.0"
