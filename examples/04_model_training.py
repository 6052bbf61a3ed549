"""Training: optimizers, loss history, warm resume, persistence
(mirrors examples/04_Model_Training.ipynb)."""
import numpy as np
import matplotlib
matplotlib.use("Agg")
import mogptk_tpu as mogptk

t = np.linspace(0, 10, 120)
y = np.sin(2 * np.pi * 0.4 * t) + 0.1 * np.random.randn(len(t))
data = mogptk.Data(t, y)
data.remove_relative_range(0.75, 1.0)

model = mogptk.SM(data, Q=1)
model.init_parameters("LS")

# Adam, then refine with LBFGS (warm resume concatenates histories)
model.train(method="Adam", lr=0.05, iters=200, verbose=True)
model.train(method="LBFGS", iters=50)
print("iters total:", model.iters, " final loss:", model.losses[-1])
print("LML:", model.log_marginal_likelihood(), " BIC:", model.BIC(), " AIC:", model.AIC())

model.save("/tmp/trained_sm")
loaded = mogptk.LoadModel("/tmp/trained_sm")
print("reloaded loss:", loaded.loss())
