"""BASELINE.md config #4: abalone 8-D inputs, sparse variational GP (Titsias,
N≈4k, M=500 inducing points) — mirrors the reference's sparse multi-input
case study (examples/07_Sparse_Multi_Input.ipynb)."""
import sys, os, time
import jax
# f64 like the reference: Titsias with 500 *trained* inducing points is
# numerically fragile in f32 — the jitter ladder (gpr.use_jitter_ladder)
# keeps the factorizations finite, but the f32 optimization itself diverges
# (loss goes NaN through gradient overflow with all factors finite).
jax.config.update("jax_enable_x64", True)
import numpy as np
import pandas as pd
import mogptk_tpu as mogptk

DATA = "/root/reference/examples/data/abalone/abalone.data"


def main():
    np.random.seed(0)  # remove_randomly draws the test split from np.random
    cols = ["sex", "length", "diameter", "height", "whole", "shucked",
            "viscera", "shell", "rings"]
    df = pd.read_csv(DATA, names=cols)
    feats = ["length", "diameter", "height", "whole", "shucked", "viscera", "shell"]
    X = df[feats].to_numpy(dtype=np.float64)
    # one binary feature from sex to reach 8 input dims like the case study
    X = np.concatenate([X, (df["sex"] == "M").to_numpy(dtype=np.float64).reshape(-1, 1)], axis=1)
    # standardize inputs (the case study normalizes X; raw scales differ 20x)
    X = (X - X.mean(axis=0)) / (X.std(axis=0) + 1e-9)
    y = df["rings"].to_numpy(dtype=np.float64)

    data = mogptk.Data(X, y, name="abalone")
    data.transform(mogptk.TransformStandard())
    data.remove_randomly(pct=0.2)

    mogptk.gpr.use_jitter_ladder(4)
    kernel = mogptk.gpr.SquaredExponentialKernel(input_dims=8)
    model = mogptk.Model(data, kernel,
                         inference=mogptk.Titsias(inducing_points=500,
                                                  init_inducing_points="random"))
    t0 = time.time()
    model.train(method="Adam", lr=0.01, iters=300, verbose=True)
    print("trained in %.1fs (N=%d, M=500)" % (time.time() - t0, int(np.sum(data.mask))))
    print("test MAE (rings):", model.error("MAE"))


if __name__ == "__main__":
    main()
