"""Test harness: run JAX on a virtual 8-device CPU mesh.

The container boots an ``axon`` TPU PJRT plugin from sitecustomize and pins
``JAX_PLATFORMS=axon``, so jax is typically already imported (TPU-backed)
before pytest starts. ``jax.config.update("jax_platforms", "cpu")`` reliably
re-selects the host platform, and the CPU client is created lazily, so setting
``XLA_FLAGS`` here is still early enough to get 8 virtual devices
(SURVEY.md section 4: multi-device tests via
``--xla_force_host_platform_device_count``)."""

import os

# interpret-mode kernels execute the same math rolled or unrolled; the
# unrolled default (a Mosaic scheduling win on the chip) only slows the
# CPU interpreter down (7 min vs 3 min for test_ops_fused)
os.environ.setdefault("BEVRENDER_EXTRACT_UNROLL", "0")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU platform"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"
