"""Test configuration: force an 8-device virtual CPU backend so sharding and
collective tests run without TPU hardware (reference has no test suite at all;
see SURVEY.md §4 — this is the JAX-native fake-backend pattern).

Note: this machine's sitecustomize registers a TPU PJRT plugin and pins
JAX_PLATFORMS at interpreter startup, so the env var alone is not enough —
we also update jax.config before any backend is initialised.
"""

import os

# Must run before jax initialises its backends.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: XLA:CPU compiles dominate this suite's
# runtime on the 1-core host; cache them across runs (driver re-runs the
# suite every round). Cache keys include platform/flags so this cannot
# collide with the TPU bench cache.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _tmp_cwd(tmp_path_factory):
    """Run the whole session from a tmpdir: parity tests execute the
    reference's own code, which writes debris (e.g. imresize_pseudoSR.py:59
    sio.savemat('rot59.mat')) into the cwd."""
    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("cwd"))
    yield
    os.chdir(cwd)
