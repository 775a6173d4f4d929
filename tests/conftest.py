import os

# Tests run on a virtual multi-device CPU mesh; exact-mode parity needs x64.
# NOTE: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var,
# so the platform must be forced through jax.config before any jax use.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Bit-exact parity with the reference (g++ -O2, no -mfma) requires strict
# per-op IEEE arithmetic: capping the ISA at SSE4.2 stops LLVM from
# contracting mul+add chains into FMAs (found empirically; no XLA flag
# disables contraction directly).
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=SSE4_2").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
