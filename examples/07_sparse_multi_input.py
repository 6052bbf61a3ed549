"""Sparse inference on multi-dimensional inputs (abalone-style workload)
(mirrors examples/07_Sparse_Multi_Input.ipynb)."""
import numpy as np
import mogptk_tpu as mogptk

# synthetic 4-D regression problem, N=1000, sparse with 64 inducing points
rng = np.random.RandomState(0)
X = rng.rand(1000, 4) * 2.0
y = np.sin(X[:, 0] * 3) + 0.5 * X[:, 1] ** 2 + 0.3 * np.cos(X[:, 2] * 5) + 0.05 * rng.randn(1000)

data = mogptk.Data(X, y, name="4d")
data.remove_randomly(pct=0.2)

kernel = mogptk.gpr.SquaredExponentialKernel(input_dims=4)
model = mogptk.Model(data, kernel,
                     inference=mogptk.Titsias(inducing_points=64, init_inducing_points="random"))
model.train(method="Adam", lr=0.02, iters=300, verbose=True)
print("test MAE:", model.error("MAE"))
