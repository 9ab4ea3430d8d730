#!/usr/bin/env python
"""Probe: does Pallas/Mosaic work on the axon TPU runtime at all?

Informational only (the chain treats failure as data, not error):
 1. elementwise kernel — does pallas_call lower and run?
 2. tiled 1024^3 matmul kernel (f32 and bf16) — MXU rates vs jnp.dot.

All timings are fetch-based (block_until_ready is a no-op on this
runtime — see doc/design.md section 6 / platform notes).
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("AB_CPU"):  # flow check without the chip (interpret mode)
    jax.config.update("jax_platforms", "cpu")
else:
    import _tpu_pidfile  # script dir is sys.path[0]

    _tpu_pidfile.register()
INTERPRET = bool(os.environ.get("AB_CPU"))

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fetch(x):
    return float(np.asarray(x.ravel()[0]))


def timeit(f, *a, n=5):
    out = f(*a)
    fetch(out)
    best = np.inf
    for _ in range(n):
        st = time.time()
        out = f(*a)
        fetch(out)
        best = min(best, time.time() - st)
    return best, out


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}", flush=True)

    # ---- 1. elementwise ----
    def double_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.arange(1024 * 1024, dtype=jnp.float32).reshape(1024, 1024)

    @jax.jit
    def double(x):
        return pl.pallas_call(
            double_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )(x)

    try:
        y = double(x)
        ok = np.allclose(np.asarray(y[:2, :2]), np.asarray(x[:2, :2]) * 2.0)
        print(f"elementwise pallas kernel: ran, correct={ok}", flush=True)
    except Exception as e:
        print(f"elementwise pallas kernel FAILED: {type(e).__name__}: {e}", flush=True)
        print("pallas unusable on this runtime; stopping probe", flush=True)
        return

    # ---- 2. tiled matmul, f32 and bf16 ----
    M = N = K = 1024
    TM = TN = 256

    def mm_kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)

    def make_mm(dtype):
        @jax.jit
        def mm(a, b):
            return pl.pallas_call(
                mm_kernel,
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
                grid_spec=pl.GridSpec(
                    grid=(M // TM, N // TN),
                    in_specs=[
                        pl.BlockSpec((TM, K), lambda i, j: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((K, TN), lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                                           memory_space=pltpu.VMEM),
                ),
                interpret=INTERPRET,
            )(a, b)
        return mm

    rng = np.random.default_rng(0)
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        a = jnp.asarray(rng.standard_normal((M, K)), dtype)
        b = jnp.asarray(rng.standard_normal((K, N)), dtype)
        flops = 2.0 * M * N * K
        try:
            t_pl, out_pl = timeit(make_mm(dtype), a, b)
            ref = jax.jit(lambda a, b: jnp.dot(
                a, b, preferred_element_type=jnp.float32))
            t_xla, out_x = timeit(ref, a, b)
            rel = float(jnp.abs(out_pl - out_x).max() / jnp.abs(out_x).max())
            print(
                f"matmul[{tag}] 1024^3: pallas {t_pl*1e3:.2f} ms "
                f"({flops/t_pl/1e12:.2f} Tflop/s)  xla {t_xla*1e3:.2f} ms "
                f"({flops/t_xla/1e12:.2f} Tflop/s)  maxrel {rel:.1e}",
                flush=True,
            )
        except Exception as e:
            print(f"matmul[{tag}] pallas FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
