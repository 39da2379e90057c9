"""Test configuration: run tests on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax and registers a TPU backend before
any test code runs, so env-var-based platform selection is too late. Instead:
  * XLA_FLAGS is set before the (lazily created) CPU client exists, giving 8
    virtual CPU devices for sharding tests;
  * the default device is pinned to CPU so all non-sharded test computations
    run there with deterministic f32 math;
  * matmul precision is raised to HIGHEST — numerical tests must not depend
    on a backend's default (bf16 on TPU).
Sharded tests build their Mesh explicitly from jax.devices("cpu").
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_default_device", jax.devices("cpu")[0])


def cpu_mesh_devices():
    return jax.devices("cpu")
