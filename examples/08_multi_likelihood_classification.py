"""Multi-likelihood SVGP: Bernoulli classification + Student-T regression in
one multi-output model (mirrors examples/08_Multi_Likelihood_Classification.ipynb)."""
import numpy as np
import mogptk_tpu as mogptk

rng = np.random.RandomState(0)
t = np.linspace(0, 6, 80)
y_class = (np.sin(1.5 * t) > 0).astype(np.float64)
y_reg = np.cos(1.5 * t) + 0.2 * rng.standard_t(df=3, size=len(t))

dataset = mogptk.DataSet(t, [y_class, y_reg], names=["events", "signal"])

likelihood = mogptk.gpr.MultiOutputLikelihood(
    mogptk.gpr.BernoulliLikelihood(),
    mogptk.gpr.StudentTLikelihood(dof=3, scale=0.2),
)
model = mogptk.MOSM(dataset, Q=1, inference=mogptk.Hensman(likelihood=likelihood))
model.train(method="Adam", lr=0.02, iters=300, verbose=True)

X, mu, lo, up = model.predict()
acc = np.mean((np.asarray(mu[0]) > 0.5) == (y_class > 0.5))
print("classification accuracy:", acc)
