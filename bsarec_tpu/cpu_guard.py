"""Honor `JAX_PLATFORM_NAME=cpu` before any JAX backend init.

Import this module (`import bsarec_tpu.cpu_guard  # noqa: F401`) at the
top of every entry point, before anything touches a backend. On this
image `JAX_PLATFORMS=axon` is baked into the environment and plain
`JAX_PLATFORMS=cpu` is ignored, so CPU runs must flip the config knob
instead; doing it after the first backend use is a no-op, and skipping
it leaves the process initializing the axon TPU plugin — which HANGS
every jax call when the relay is wedged (CLAUDE.md "Environment rules").

Importing jax here does not initialize a backend (backends are created
lazily on first use), so this is safe to import from anywhere as long
as no array op ran yet.
"""

import os

if os.environ.get("JAX_PLATFORM_NAME", "").lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
