"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4).

The environment presets a TPU plugin (JAX_PLATFORMS=axon via sitecustomize),
so env-var overrides from inside the process are too late; use the jax
config API instead — it wins as long as no backend has been initialized,
which pytest guarantees for conftest."""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'  # belt-and-suspenders for subprocesses

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
