"""Speed-of-light check for the fused Gram tiles.

The channel-block MOSM Gram forward measures ~12-22 ms at N=16k. Its tile
math is τ-chain FMAs plus one exp and one cos per (entry, q). This probe
measures, at the SAME tile/grid shapes, progressively simpler Pallas
kernels so the achievable VPU floor can be separated from our kernel's
overhead:

  copy        - read x tiles, write a (T,T) constant: pure grid+DMA cost
  fma         - the τ-chain only (no transcendentals)
  exp         - τ-chain + exp
  expcos      - τ-chain + exp + cos  (≈ one MOSM q-component)
  mosm_q2     - the real block-engine tile (Q=2, D=1) via ops/block_mosm

Usage: python benchmarks/gram_floor.py [n] (TPU). One JSON line per shape.
"""
import os
import sys
import json
import functools

import numpy as np


TILE = 512


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from _timing import device_ms

    x = jnp.asarray(np.sort(np.random.RandomState(0).rand(n, 1) * 100.0),
                    dtype=jnp.float32)

    def make_kernel(mode):
        def kern(x1_ref, x2_ref, out_ref):
            t1 = x1_ref[:, 0][:, None]
            t2 = x2_ref[:, 0][None, :]
            td = t1 - t2
            if mode == "copy":
                out_ref[:, :] = td
                return
            e = td * td * 0.37
            a = td * 0.21
            if mode == "fma":
                out_ref[:, :] = e + a
                return
            E = jnp.exp(-0.5 * e)
            if mode == "exp":
                out_ref[:, :] = E
                return
            out_ref[:, :] = 1.3 * E * jnp.cos(2.0 * np.pi * a + 0.1)

        def run(xv):
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
                grid=(n // TILE, n // TILE),
                in_specs=[
                    pl.BlockSpec((TILE, 1), lambda i, j: (i, 0)),
                    pl.BlockSpec((TILE, 1), lambda i, j: (j, 0)),
                ],
                out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
            )(xv, xv)
            # chain: feed a scalar of the output back into x
            return xv + 1e-30 * out[0, 0]

        return run

    for mode in ["copy", "fma", "exp", "expcos"]:
        ms = device_ms(make_kernel(mode), x, target_sec=8.0)
        print(json.dumps({"mode": mode, "full_grid_ms": round(ms, 2)}),
              flush=True)

    # the real engine at the same N (upper-half grid only)
    import mogptk_tpu.ops.block_mosm as bm
    O, Q, D = 4, 2, 1
    counts = (n // O,) * O
    rng = np.random.RandomState(1)
    params = (jnp.asarray(0.5 + rng.rand(O, Q), jnp.float32),
              jnp.asarray(0.1 + rng.rand(O, Q, D), jnp.float32),
              jnp.asarray(0.2 + rng.rand(O, Q, D), jnp.float32),
              jnp.asarray(0.1 * rng.randn(O, Q, D), jnp.float32),
              jnp.asarray(0.1 * rng.randn(O, Q), jnp.float32))
    twopi = float((2 * np.pi) ** (D / 2))

    def run_engine(xv):
        K = bm.mosm_gram_sorted(xv, counts, *params, twopi, True)
        return xv + 1e-30 * K[0, 0]

    ms = device_ms(run_engine, x, target_sec=8.0)
    print(json.dumps({"mode": "mosm_q2_engine", "upper_half_ms": round(ms, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
