import os

# Must run before jax is backend-initialized: tests run on a virtual 8-device
# CPU mesh so multi-chip sharding is exercised without TPU hardware.
# (The environment pins JAX_PLATFORMS=axon for the tunneled TPU; tests
# override it — real-TPU benchmarks run outside pytest.)
# NBLDPC_TEST_TPU=1 skips the CPU pinning so `pytest -m tpu` runs on the
# real (axon-tunneled) chip; everything else stays on the virtual CPU mesh.
if os.environ.get("NBLDPC_TEST_TPU", "").lower() in ("", "0", "false"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
