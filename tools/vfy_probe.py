
# runnable from /root/repo (package not installed): put repo root on sys.path
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
t0 = time.time()
from orion_kmer_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
print("import:", round(time.time() - t0, 1), flush=True)
t0 = time.time()
x = jax.device_put(jnp.arange(1024, dtype=jnp.int32))
print("sum:", int(x.sum()), "op dt:", round(time.time() - t0, 2), flush=True)
t0 = time.time()
y = jax.device_put(jnp.arange(2048, dtype=jnp.int32))
print("sum2:", int(y.sum()), "op dt:", round(time.time() - t0, 2), flush=True)
