"""Test configuration: force the CPU backend with 8 virtual devices so
pjit/sharding paths run without TPU hardware.

The environment's sitecustomize imports jax and registers the tunneled
TPU backend in every interpreter, so JAX_PLATFORMS set from user code is
ignored — the jax.config API is the only reliable override.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
