"""Numerical parity harness: LML and predictions vs the reference implementation.

Builds identical models (same data, same constrained parameter values) in
mogptk_tpu (JAX, f64 CPU) and in the reference (PyTorch, f64 CPU, imported
read-only from /root/reference) and compares:

- exact-GP log marginal likelihood for every kernel family,
- posterior mean/variance at held-out points.

The north-star requirement (BASELINE.md) is LML matched to 1e-5 rtol.
Run: python benchmarks/parity_check.py
"""
import sys
import os
import json
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import mogptk_tpu.gpr as ours

sys.path.insert(0, "/root/reference")
import torch
import mogptk.gpr as ref


def make_data(multi=False, n=40, seed=0):
    rng = np.random.RandomState(seed)
    if multi:
        x0 = np.sort(rng.uniform(0, 8, n)).reshape(-1, 1)
        x1 = np.sort(rng.uniform(0, 8, n - 5)).reshape(-1, 1)
        y0 = np.sin(1.1 * x0) + 0.1 * rng.randn(n, 1)
        y1 = np.cos(1.1 * x1) + 0.1 * rng.randn(n - 5, 1)
        _, Xo, Yo = ours.merge_data([x0, x1], [y0, y1])
        _, Xr, Yr = ref.merge_data([torch.tensor(x0), torch.tensor(x1)],
                                   [torch.tensor(y0), torch.tensor(y1)])
        return np.asarray(Xo), np.asarray(Yo), Xr, Yr
    x = np.sort(rng.uniform(0, 8, n)).reshape(-1, 1)
    y = np.sin(1.1 * x) + 0.1 * rng.randn(n, 1)
    return x, y, torch.tensor(x), torch.tensor(y)


def set_params(kernel_ours, kernel_ref, values):
    """Assign identical constrained values to same-named parameters."""
    for name, val in values.items():
        getattr(kernel_ours, name).assign(np.asarray(val))
        getattr(kernel_ref, name).assign(torch.tensor(np.asarray(val, dtype=np.float64)))


def compare(name, kernel_pair, values, multi, results):
    ko, kr = kernel_pair
    set_params(ko, kr, values)
    Xo, Yo, Xr, Yr = make_data(multi=multi)
    mo = ours.Exact(ko, Xo, Yo, variance=0.1, jitter=0.0)
    mr = ref.Exact(kr, Xr, Yr, variance=0.1)

    lml_o = float(mo.log_marginal_likelihood())
    try:
        lml_r = float(mr.log_marginal_likelihood().detach())
    except Exception as e:
        # the reference raises CholeskyException on non-PSD kernels (e.g.
        # MOHSM at some parameters); parity here means we fail identically
        ours_failed = not np.isfinite(lml_o)
        results.append({"kernel": name, "reference_cholesky_failed": True,
                        "ours_nonfinite": bool(ours_failed),
                        "pass_1e-5": bool(ours_failed)})
        print("%-22s reference Cholesky FAILED (non-PSD); ours non-finite: %s  %s"
              % (name, ours_failed, "PASS (identical failure)" if ours_failed else "FAIL"))
        return
    rel = abs(lml_o - lml_r) / abs(lml_r)

    # prediction parity at interior points
    if multi:
        Xs = np.asarray(Xo)[::7]
    else:
        Xs = np.linspace(0.5, 7.5, 9).reshape(-1, 1)
    mu_o, var_o = mo.predict_f(Xs)
    mu_r, var_r = mr.predict_f(torch.tensor(np.asarray(Xs, dtype=np.float64)))
    mu_err = float(np.abs(np.asarray(mu_o) - mu_r.detach().numpy()).max())
    var_err = float(np.abs(np.asarray(var_o) - var_r.detach().numpy()).max())

    ok = rel < 1e-5
    results.append({"kernel": name, "lml_ours": lml_o, "lml_ref": lml_r,
                    "lml_rel_err": rel, "pred_mu_maxerr": mu_err,
                    "pred_var_maxerr": var_err, "pass_1e-5": bool(ok)})
    print("%-22s lml rel err %.2e  mu maxerr %.2e  var maxerr %.2e  %s"
          % (name, rel, mu_err, var_err, "PASS" if ok else "FAIL"))


def main():
    results = []

    compare("SquaredExponential",
            (ours.SquaredExponentialKernel(), ref.SquaredExponentialKernel()),
            {"magnitude": 1.3, "lengthscale": [0.7]}, False, results)

    compare("SpectralMixture",
            (ours.SpectralMixtureKernel(Q=2), ref.SpectralMixtureKernel(Q=2)),
            {"magnitude": [0.8, 0.5], "mean": [[0.2], [0.6]], "variance": [[0.3], [0.2]]},
            False, results)

    compare("Matern52",
            (ours.MaternKernel(nu=2.5), ref.MaternKernel(nu=2.5)),
            {"magnitude": 0.9, "lengthscale": [1.2]}, False, results)

    compare("Periodic",
            (ours.PeriodicKernel(), ref.PeriodicKernel()),
            {"magnitude": 1.1, "period": [1.5], "lengthscale": [0.8]}, False, results)

    compare("MOSM(Q=2)",
            (ours.MultiOutputSpectralMixtureKernel(2, output_dims=2),
             ref.MultiOutputSpectralMixtureKernel(2, output_dims=2)),
            {"weight": [[0.7, 0.4], [0.5, 0.9]],
             "mean": [[[0.2], [0.5]], [[0.3], [0.7]]],
             "variance": [[[0.3], [0.2]], [[0.25], [0.4]]],
             "delay": [[[0.1], [0.0]], [[0.0], [0.2]]],
             "phase": [[0.1, 0.0], [0.0, 0.2]]}, True, results)

    compare("MOSM(Q=1)",
            (ours.MultiOutputSpectralKernel(output_dims=2),
             ref.MultiOutputSpectralKernel(output_dims=2)),
            {"weight": [0.7, 0.5], "mean": [[0.3], [0.5]],
             "variance": [[0.3], [0.4]], "delay": [[0.1], [0.0]],
             "phase": [0.1, 0.0]}, True, results)

    compare("uMOSM",
            (ours.UncoupledMultiOutputSpectralKernel(output_dims=2),
             ref.UncoupledMultiOutputSpectralKernel(output_dims=2)),
            {"weight": [[0.8, 0.0], [0.3, 0.6]], "mean": [[0.3], [0.5]],
             "variance": [[0.3], [0.4]], "delay": [[0.1], [0.0]],
             "phase": [0.1, 0.0]}, True, results)

    compare("CSM(Rq=2)",
            (ours.CrossSpectralKernel(output_dims=2, Rq=2),
             ref.CrossSpectralKernel(output_dims=2, Rq=2)),
            {"amplitude": [[0.7, 0.3], [0.5, 0.6]], "mean": [0.4],
             "variance": [0.3], "shift": [[0.1, 0.0], [0.0, 0.2]]}, True, results)

    compare("CONV",
            (ours.GaussianConvolutionProcessKernel(output_dims=2),
             ref.GaussianConvolutionProcessKernel(output_dims=2)),
            {"weight": [0.8, 0.6], "variance": [[0.5], [0.7]],
             "base_variance": [0.4]}, True, results)

    compare("MOHSM",
            (ours.MultiOutputHarmonizableSpectralKernel(output_dims=2),
             ref.MultiOutputHarmonizableSpectralKernel(output_dims=2)),
            {"weight": [0.7, 0.5], "mean": [[0.3], [0.5]],
             "variance": [[0.6], [0.7]], "lengthscale": [1.5, 1.8],
             "center": [4.0], "delay": [[0.1], [0.0]], "phase": [0.1, 0.0]},
            True, results)

    # LMC: subkernel params set individually
    klo = ours.LinearModelOfCoregionalizationKernel(
        ours.SpectralKernel(), ours.SpectralKernel(), output_dims=2)
    klr = ref.LinearModelOfCoregionalizationKernel(
        ref.SpectralKernel(), ref.SpectralKernel(), output_dims=2)
    for kk, tt in ((klo, klr),):
        pass
    for q, (m, v) in enumerate([(0.3, 0.2), (0.6, 0.4)]):
        klo[q].mean.assign([m]); klo[q].variance.assign([v])
        klr[q].mean.assign(torch.tensor([m], dtype=torch.float64))
        klr[q].variance.assign(torch.tensor([v], dtype=torch.float64))
    klo.weight.assign([[[0.7], [0.4]], [[0.5], [0.9]]])
    klr.weight.assign(torch.tensor([[[0.7], [0.4]], [[0.5], [0.9]]], dtype=torch.float64))
    compare("LMC", (klo, klr), {}, True, results)

    n_pass = sum(r["pass_1e-5"] for r in results)
    print("\n%d/%d kernel families match the reference LML to 1e-5 rtol" % (n_pass, len(results)))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "PARITY_RESULTS.json"), "w") as f:
        json.dump(results, f, indent=1)




def compare_inference():
    """ELBO/LML parity for the sparse and variational inference schemes at
    identical parameters and inducing points."""
    results = []
    x, y, xr, yr = make_data(multi=False, n=36)
    Z = np.linspace(0.5, 7.5, 9).reshape(-1, 1)

    def pair_kernels():
        ko, kr = ours.SquaredExponentialKernel(), ref.SquaredExponentialKernel()
        set_params(ko, kr, {"magnitude": 1.2, "lengthscale": [0.9]})
        return ko, kr

    # Titsias collapsed ELBO
    ko, kr = pair_kernels()
    mo = ours.Titsias(ko, x, y, Z=__import__("jax.numpy", fromlist=["asarray"]).asarray(Z), variance=0.1)
    mr = ref.Titsias(kr, xr, yr, Z=torch.tensor(Z), variance=0.1)
    a, b = float(mo.elbo()), float(mr.elbo().detach())
    rel = abs(a - b) / abs(b)
    results.append(("Titsias ELBO", a, b, rel))

    # Snelson FITC LML
    ko, kr = pair_kernels()
    mo = ours.Snelson(ko, x, y, Z=__import__("jax.numpy", fromlist=["asarray"]).asarray(Z), variance=0.1)
    mr = ref.Snelson(kr, xr, yr, Z=torch.tensor(Z), variance=0.1)
    a, b = float(mo.log_marginal_likelihood()), float(mr.log_marginal_likelihood().detach())
    rel = abs(a - b) / abs(b)
    results.append(("Snelson LML", a, b, rel))

    # SparseHensman ELBO at initialization (q_sqrt = I: the reference's
    # diagonal-only KL trace equals the correct full-triangle trace there)
    ko, kr = pair_kernels()
    mo = ours.SparseHensman(ko, x, y, Z=__import__("jax.numpy", fromlist=["asarray"]).asarray(Z),
                            likelihood=ours.GaussianLikelihood(0.4))
    mr = ref.SparseHensman(kr, xr, yr, Z=torch.tensor(Z),
                           likelihood=ref.GaussianLikelihood(0.4))
    a, b = float(mo.elbo()), float(mr.elbo().detach())
    rel = abs(a - b) / abs(b)
    results.append(("SparseHensman ELBO@init", a, b, rel))

    # OpperArchambeau ELBO at initialization
    ko, kr = pair_kernels()
    mo = ours.OpperArchambeau(ko, x, y, likelihood=ours.GaussianLikelihood(0.4))
    mr = ref.OpperArchambeau(kr, xr, yr, likelihood=ref.GaussianLikelihood(0.4))
    a, b = float(mo.elbo()), float(mr.elbo().detach())
    rel = abs(a - b) / abs(b)
    results.append(("OpperArchambeau ELBO", a, b, rel))

    # non-Gaussian variational expectation (StudentT via GH quadrature)
    yb = np.abs(y) + 0.1
    lo_ = ours.StudentTLikelihood(dof=4, scale=0.5)
    lr_ = ref.StudentTLikelihood(dof=4, scale=0.5)
    import jax.numpy as jnp
    mu_ = 0.3 * np.ones_like(y)
    var_ = 0.2 * np.ones_like(y)
    a = float(lo_.variational_expectation(jnp.asarray(x), jnp.asarray(y), jnp.asarray(mu_), jnp.asarray(var_)))
    b = float(lr_.variational_expectation(torch.tensor(x), torch.tensor(y), torch.tensor(mu_), torch.tensor(var_)).detach())
    rel = abs(a - b) / abs(b)
    results.append(("StudentT var-exp (GH)", a, b, rel))

    print()
    for name, a, b, rel in results:
        print("%-26s ours %.8f  ref %.8f  rel err %.2e  %s"
              % (name, a, b, rel, "PASS" if rel < 1e-5 else "FAIL"))
    return results


if __name__ == "__main__":
    main()
    compare_inference()
