"""Test harness configuration.

Tests run on CPU with 8 simulated devices so the multi-chip sharding path
is exercised without TPU hardware (SURVEY.md section 4 item 4).  The env
vars must be set before jax is imported anywhere.
"""

import os

# Force CPU: the machine environment routes jax to a tunneled TPU
# ("axon") and its sitecustomize sets jax.config jax_platforms="axon,cpu"
# AFTER reading env vars — so mutating os.environ["JAX_PLATFORMS"] here is
# ineffective; the config itself must be overridden after import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402  (env vars above must precede this import)

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb  # noqa: E402

if _xb.backends_are_initialized():  # pragma: no cover
    from jax.extend.backend import clear_backends

    clear_backends()
assert jax.device_count() == 8, jax.devices()

# Persistent compile cache: XLA CPU compiles are slow on this machine
# (~0.4s even for trivial ops), so cache EVERYTHING — repeated test runs
# then skip all recompiles.  Must be set via jax.config (the env vars are
# not honoured for the min-time/min-size knobs in this jax version).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# Build the native C tokenizer in-place when a compiler is available
# (~2 s, one-time): without it the native-parity tests skip and
# StreamingCorpus's indexing pass silently loses its C fast path.  Runs
# BEFORE any pylda_tpu import so pylda_tpu.native sees the fresh .so.
def _ensure_native_built() -> None:
    import glob
    import pathlib
    import shutil
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parent.parent
    if glob.glob(str(repo / "pylda_tpu" / "native" / "_fastcorpus*.so")):
        return
    if shutil.which("gcc") is None and shutil.which("cc") is None:
        return
    subprocess.run(
        [sys.executable, "setup.py", "build_ext", "--inplace"],
        cwd=repo, check=False, capture_output=True, timeout=300,
    )


_ensure_native_built()
