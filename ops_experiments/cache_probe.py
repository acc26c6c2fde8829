"""Why does the JAX persistent compile cache stay empty through the axon
tunnel? (VERDICT r4 next #7 — one-shot diagnostic, record the answer.)

Compiles a small jit twice with JAX_RAISE_PERSISTENT_CACHE_ERRORS=1 so any
silently-swallowed cache write/read failure surfaces, then lists the cache
dir and reports compile-time deltas.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python \
    ops_experiments/cache_probe.py
"""

import os
import sys
import time

CACHE = "/tmp/jax_cache_probe"
os.environ["JAX_COMPILATION_CACHE_DIR"] = CACHE
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
os.environ["JAX_RAISE_PERSISTENT_CACHE_ERRORS"] = "1"

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

os.makedirs(CACHE, exist_ok=True)
print("backend:", jax.default_backend(), flush=True)
try:
    # explicit config mirror of the env (some versions read only the config)
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_raise_persistent_cache_errors", True)
except Exception as e:  # noqa: BLE001
    print("config update:", e, flush=True)


@jax.jit
def f(x):
    return jnp.tanh(x @ x.T).sum()


t0 = time.time()
try:
    print("result:", float(f(jnp.ones((256, 256)))), flush=True)
    print("first call: {:.1f}s".format(time.time() - t0), flush=True)
except Exception as e:  # noqa: BLE001
    print("FIRST-CALL/CACHE ERROR: {}: {}".format(type(e).__name__, e),
          flush=True)
entries = os.listdir(CACHE)
print("cache entries after compile:", len(entries), entries[:4], flush=True)
# second process would prove reads; within-process the trace cache hides it —
# report what the cache layer logged instead
print("done", flush=True)
