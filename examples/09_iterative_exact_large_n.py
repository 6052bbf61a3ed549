"""Iterative exact inference (BBMM): exact GP training without Cholesky and
without materializing the Gram matrix — TPU-native extension beyond the
reference's capability surface (its only exact path is O(N²)-memory
Cholesky)."""
import numpy as np
import mogptk_tpu as mogptk

rng = np.random.RandomState(0)
t = np.linspace(0, 12, 400)
y1 = np.sin(2 * np.pi * 0.4 * t) + 0.1 * rng.randn(len(t))
y2 = 0.7 * np.sin(2 * np.pi * 0.4 * t + 0.8) + 0.1 * rng.randn(len(t))
dataset = mogptk.DataSet(t, [y1, y2], names=["A", "B"])
dataset[0].remove_range(8, 10)

model = mogptk.MOSM(dataset, Q=1,
                    inference=mogptk.Iterative(max_cg_iters=100, num_probes=16))
model.init_parameters("LS")
model.train(method="Adam", lr=0.02, iters=150, verbose=True)
print("imputation MAE over the removed range:", model.error("MAE"))
# scale note: the same model form runs at N=65,536+ on one TPU chip
# (benchmarks/bignum_exact.py), where the Gram alone would exceed HBM.
