"""heatray_tpu — a TPU-native differentiable path tracer.

A from-scratch JAX/Pallas re-design of the capabilities of galdar496/heatray
(an OpenRL/OpenGL C++ interactive path tracer): wavefront ray pipeline,
QMC progressive accumulation, next-event estimation with punctual +
environment lights, PBR (roughness/metallic/clearcoat/multiscatter) and glass
BSDFs, ACES display pipeline — end-to-end differentiable and shardable over a
TPU device mesh.
"""

__version__ = "0.1.0"
