import numpy as np
import jax, jax.numpy as jnp
from orion_kmer_tpu.engine import DeviceCountTable
from jax._src import cache_key as ck
from jax._src.compiler import get_compile_options
import jax._src.xla_bridge as xb

fn = DeviceCountTable._chain_fn(31, 1)
B = 1 << 22
sd = jax.ShapeDtypeStruct
args = (sd((B // 16,), jnp.uint32), sd((B // 32,), jnp.uint32),
        sd((B,), jnp.uint32), sd((B,), jnp.uint32), sd((), jnp.int32))
low = fn.lower(*args)
module = low.compiler_ir()  # MLIR module
backend = xb.get_backend()
co = get_compile_options(num_replicas=1, num_partitions=1)
import inspect
sig = inspect.signature(ck.get)
print("sig:", sig)
try:
    key = ck.get(module, tuple(jax.devices()), co, backend)
except TypeError:
    key = ck.get(module, np.array([[d.id for d in jax.devices()]]), co, backend)
print("key:", key)
