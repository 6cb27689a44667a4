"""EfficientVLM-TPU: a TPU-native (JAX/XLA/Pallas/pjit) vision-language
model compression framework.

Re-implements, TPU-first, the capabilities of the EfficientVLM reference
(X-VLM two-stage compression: general distillation + modal-adaptive
structured pruning), with:

- one functional gated model core (teacher vs student = config; gates = args)
- hard-concrete L0 gates over attention heads / FFN dims, Lagrangian-driven
- single jitted train steps (student fwd + teacher fwd + KD + 3 optimizers)
- data parallelism via jax.sharding.Mesh + XLA collectives (ICI/DCN)
- Pallas fused-attention kernels on the hot path
- physical pruning export producing genuinely smaller XLA programs
"""

__version__ = "0.1.0"
