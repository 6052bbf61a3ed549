"""Does single-pass bf16 accumulation in the blocked Cholesky change what
the headline config TRAINS to?

The S-panel accumulation is the N**3/3 bulk of the factorization; "high"
(bf16x3) runs it at ~1/3 the MXU rate of "default" (one bf16 pass).
chol_acc measured the one-shot factor error (maxdiff_L 1.4e-2 default vs
6.4e-4 high at N=16k) — this script measures what actually matters for the
probe-gradient training path: train the bench config under each update
precision, then evaluate BOTH final parameter sets under the same
high-precision loss and compare.  If the trained optimum matches within the
SLQ probe noise (~1e-3 relative), "default" is a legitimate fast mode.

Run:  python benchmarks/chol_precision_train.py [steps]
"""
import os
import sys
import json

import numpy as np



def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import optax
    from _bench_mod import bench
    import mogptk_tpu.gpr as gpr
    from _timing import device_ms

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    gpr.use_pallas(True)

    xs, ys = bench.make_data()

    def build():
        N, X, Y = gpr.merge_data(xs, ys)
        kernel = gpr.MultiOutputSpectralMixtureKernel(bench.Q, output_dims=bench.CHANNELS)
        rng = np.random.RandomState(1)
        kernel.mean.assign(0.05 + 0.3 * rng.rand(bench.CHANNELS, bench.Q, 1))
        kernel.variance.assign(0.2 + 0.3 * rng.rand(bench.CHANNELS, bench.Q, 1))
        return gpr.Exact(kernel, X, Y, variance=0.1, trace_probes=16, seed=7)

    out = {}
    finals = {}
    for prec in ("high", "default"):
        gpr.config.blocked_cholesky_update_precision = prec
        gpr.config.bump()
        model = build()
        loss_fn = model.make_loss_fn()
        train0, fixed = model._split_raws()
        optimizer = optax.adam(1e-3)

        @jax.jit
        def train(params, T):
            opt_state = optimizer.init(params)
            def body(i, carry):
                params, opt_state = carry
                _, grads = jax.value_and_grad(loss_fn)(params, fixed)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state
            return jax.lax.fori_loop(0, T, body, (params, opt_state))[0]

        # bound single-executable time: ~70 ms/step -> 300 steps = 21 s, fine
        params_T = train(train0, steps)
        finals[prec] = [np.asarray(p) for p in params_T]

        def step_body(carry):
            params, opt_state = carry
            _, grads = jax.value_and_grad(loss_fn)(params, fixed)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state
        ms = device_ms(step_body, (train0, optimizer.init(train0)),
                       target_sec=12.0, max_exec_sec=60.0)
        out["step_ms_" + prec] = round(ms, 2)
        print(f"step_ms[{prec}] = {ms:.2f}", flush=True)

    # evaluate both optima under the SAME high-precision loss
    gpr.config.blocked_cholesky_update_precision = "high"
    gpr.config.bump()
    model = build()
    loss_fn = model.make_loss_fn()
    _, fixed = model._split_raws()
    eval_loss = jax.jit(loss_fn)
    for prec, params in finals.items():
        v = float(np.asarray(eval_loss([jnp.asarray(p) for p in params], fixed)))
        out["final_loss_" + prec] = round(v, 4)
        print(f"final_loss[{prec}] (high-precision eval) = {v:.4f}", flush=True)
    rel = [float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30))
           for a, b in zip(finals["default"], finals["high"])]
    out["max_param_rel_diff"] = round(max(rel), 6)
    out["loss_rel_diff"] = round(abs(out["final_loss_default"] - out["final_loss_high"])
                                 / abs(out["final_loss_high"]), 8)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
