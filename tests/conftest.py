"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4).

The environment presets a TPU plugin (JAX_PLATFORMS=axon via sitecustomize),
so env-var overrides from inside the process are too late; use the jax
config API instead — it wins as long as no backend has been initialized,
which pytest guarantees for conftest."""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'  # belt-and-suspenders for subprocesses
# The suite is compile-bound on this 1-CPU host: -O0 compiles ~3x faster
# with identical semantics (integer/rANS paths unaffected, float tests
# carry tolerances) — measured 181->95s on the fast tier and 425->239s on
# the numerics-heavy slow modules. Production code never sets this.
# Appended so an explicit caller override still wins.
if '--xla_backend_optimization_level' not in os.environ.get('XLA_FLAGS', ''):
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_backend_optimization_level=0')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
