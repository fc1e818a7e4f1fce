"""tacorl_tpu — a TPU-native JAX framework with the capabilities of TACO-RL.

Re-designed from scratch for TPU (JAX/XLA/Pallas/pjit); capability surface
mirrors the reference stack (see SURVEY.md): Play-LMP latent-plan pretraining,
CQL / TACO-RL offline RL, SAC / CQL-online, relay imitation learning, CALVIN &
D4RL & real-world execution paths, config-driven experiment composition,
checkpoint/resume with config round-trip, and a full evaluation stack.
"""

__version__ = "0.1.0"
