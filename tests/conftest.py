"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests use the virtual devices; kernel parity tests run
Pallas in interpreter mode on CPU.  Real-TPU execution is exercised by
bench.py / the driver, not the unit suite.

Note: this image registers a remote-TPU PJRT plugin in sitecustomize for
every interpreter; tests force JAX_PLATFORMS=cpu so the remote chip is
never claimed by the suite.  Prefer `make test` (which also skips the
plugin registration entirely) when running by hand.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
