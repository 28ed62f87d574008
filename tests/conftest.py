import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding is
# exercised without TPU hardware.  bench.py / production never import this.
#
# NOTE: this environment's sitecustomize registers an "axon" TPU PJRT plugin
# and programmatically forces jax_platforms="axon,cpu" (env vars are not
# enough) — override via jax.config after import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
