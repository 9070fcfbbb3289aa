import sys
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from orion_kmer_tpu.engine import DeviceCountTable
import numpy as np

fn = DeviceCountTable._chain_fn(31, 1)
B = 1 << 22
sd = jax.ShapeDtypeStruct
args = (sd((B // 16,), jnp.uint32), sd((B // 32,), jnp.uint32),
        sd((B,), jnp.uint32), sd((B,), jnp.uint32), sd((), jnp.int32))
low = fn.lower(*args)
open(sys.argv[1], "w").write(low.as_text())
