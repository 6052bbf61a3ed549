"""Cold-start wall time: fresh process → first N=16k training step done.

VERDICT r3 #6: the usability claim around compile latency needs a number.
Two modes, one per process (the compilation cache is the variable):

    python benchmarks/cold_start.py cold     # fresh empty cache dir
    python benchmarks/cold_start.py primed   # the persistent /tmp/jax_cache
                                             # (as left by precompile()/bench)

Prints one JSON line: {"mode", "n", "first_step_s", "import_s"}. The
measured span covers import, model build, jit trace, compile (or cache
load), and ONE executed training step fetched to the host.
"""
import os
import sys
import json
import time
import tempfile

t_start = time.perf_counter()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "primed"
    n_per = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    import jax
    # split attributes the COLD wall, so it gets a fresh cache too; use
    # "split_primed" to see the primed decomposition (cache-load vs trace)
    cache = (tempfile.mkdtemp(prefix="cold_cache_")
             if mode in ("cold", "split")
             else os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
    if mode == "split_primed":
        mode = "split"
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import numpy as np
    import optax
    from _bench_mod import bench
    import mogptk_tpu.gpr as gpr
    gpr.use_pallas(True)
    t_import = time.perf_counter() - t_start

    xs, ys = bench.make_data()
    model = bench._build_model(xs, ys, trace_probes=16)
    loss_fn = model.make_loss_fn()
    train0, fixed = model._split_raws()
    optimizer = optax.adam(1e-3)
    opt_state0 = optimizer.init(train0)

    @jax.jit
    def step(params, opt_state):
        value, grads = jax.value_and_grad(loss_fn)(params, fixed)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, value

    if mode == "split":
        # attribute the cold wall: host-side trace+lower vs the remote
        # backend compile (the part no program restructuring can remove if
        # it dominates even for modest graphs)
        t0 = time.perf_counter()
        lowered = step.lower(train0, opt_state0)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, _, value = compiled(train0, opt_state0)
        v = float(np.asarray(value))
        t_exec = time.perf_counter() - t0
        assert np.isfinite(v), v
        print(json.dumps({"mode": mode, "n": n_per * bench.CHANNELS,
                          "import_s": round(t_import, 1),
                          "trace_lower_s": round(t_lower, 1),
                          "backend_compile_s": round(t_compile, 1),
                          "first_exec_s": round(t_exec, 1)}))
        return

    _, _, value = step(train0, opt_state0)
    v = float(np.asarray(value))
    assert np.isfinite(v), v
    t_first = time.perf_counter() - t_start
    print(json.dumps({"mode": mode, "n": n_per * bench.CHANNELS,
                      "first_step_s": round(t_first, 1),
                      "import_s": round(t_import, 1)}))


if __name__ == "__main__":
    main()
