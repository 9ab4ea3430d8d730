"""Exit 0 iff the TPU answers a tiny matmul within ~7 min.

The probe runs in a daemon thread: if the backend hangs waiting for a
device claim, the main thread os._exit(1)s — the process never held a
claim, so this cannot wedge the terminal further.
"""
import os, threading

ok = []

def work():
    import jax, jax.numpy as jnp
    x = jnp.ones((64, 64), jnp.float32)
    ok.append(float((x @ x).sum()))

t = threading.Thread(target=work, daemon=True)
t.start()
t.join(420)
os._exit(0 if ok else 1)
