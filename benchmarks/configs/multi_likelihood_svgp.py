"""BASELINE.md config #5: multi-likelihood Hensman SVGP — a Bernoulli
classification channel and a Student-T regression channel trained jointly
through Gauss-Hermite quadrature (mirrors the reference's
examples/08_Multi_Likelihood_Classification.ipynb; classification data
synthesized inline instead of sklearn.make_classification).
"""
import sys, os, time
import jax
# f64 like the reference: the uncollapsed Hensman bound over 1000 variational
# points (full q_sqrt tril) is genuinely fragile in f32 — it NaNs on CPU-f32
# too, so unlike the abalone config this is NOT the TPU matmul-precision
# issue and set_matmul_precision("highest") does not rescue it.
jax.config.update("jax_enable_x64", True)
import numpy as np
import mogptk_tpu as mogptk


def main():
    rng = np.random.RandomState(1)
    n = 500

    # channel 0: binary labels from a smooth latent logit
    x1 = np.sort(rng.uniform(-3.0, 3.0, n))
    logit = 2.5 * np.sin(1.3 * x1) + 0.5 * x1
    y1 = (rng.rand(n) < 1.0 / (1.0 + np.exp(-logit))).astype(float)

    # channel 1: heavy-tailed regression
    x2 = np.linspace(-3.0, 3.0, n)
    y2 = x2 + 1.5 * np.sin(3.0 * x2) + rng.standard_t(3, n) * 0.3

    data = mogptk.DataSet(
        mogptk.Data(x1, y1, name="classification"),
        mogptk.Data(x2, y2, name="regression"),
    )

    likelihood = mogptk.gpr.MultiOutputLikelihood(
        mogptk.gpr.BernoulliLikelihood(),
        mogptk.gpr.StudentTLikelihood(),
    )
    kernel = mogptk.gpr.LinearModelOfCoregionalizationKernel(
        mogptk.gpr.SquaredExponentialKernel(),
        mogptk.gpr.SquaredExponentialKernel(),
        output_dims=2,
    )
    model = mogptk.Model(data, kernel,
                         inference=mogptk.Hensman(likelihood=likelihood))
    t0 = time.time()
    model.train(method="Adam", lr=0.02, iters=500, verbose=True)
    print("trained in %.1fs (SVGP, Bernoulli + Student-T via GH quadrature)"
          % (time.time() - t0))

    X, mu, _, _ = model.predict([x1, x2])
    acc = float(np.mean((np.asarray(mu[0]) > 0.5) == (y1 > 0.5)))
    mae = float(np.mean(np.abs(np.asarray(mu[1]) - (x2 + 1.5 * np.sin(3.0 * x2)))))
    print("classification accuracy:", round(acc, 3))
    print("regression MAE vs true latent:", round(mae, 3))


if __name__ == "__main__":
    main()
