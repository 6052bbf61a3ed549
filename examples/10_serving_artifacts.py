"""Serving a trained model without the training stack: export the posterior
as a self-contained artifact (mogptk_tpu/serving.py — TPU-native extension
beyond the reference, whose only persistence is whole-object pickling).

The .gpx artifact holds the predict graph as multi-platform StableHLO with
a SYMBOLIC batch size (one artifact, any query length, cpu or tpu) plus the
host metadata to invert the data transformations. The serving process needs
mogptk_tpu.serving and jax — no Model, DataSet, kernel, or training data.
"""
import tempfile
import numpy as np
import mogptk_tpu as mogptk
from mogptk_tpu import serving

rng = np.random.RandomState(0)
t = np.linspace(0, 10, 120)
y1 = np.sin(2 * np.pi * 0.4 * t) + 0.05 * rng.randn(len(t))
y2 = np.cos(2 * np.pi * 0.3 * t) + 0.05 * rng.randn(len(t))
dataset = mogptk.DataSet(t, [y1, y2], names=["A", "B"])
for channel in dataset:
    channel.transform(mogptk.TransformStandard())

model = mogptk.MOSM(dataset, Q=1)
model.init_parameters("LS")
model.train(method="Adam", lr=0.02, iters=100, verbose=True)

path = serving.export_predictor(model, tempfile.mkdtemp() + "/mosm")
print("artifact:", path)

# --- serving side: nothing but the artifact ---------------------------------
pred = serving.Predictor(path)
xq = [np.linspace(0.0, 10.0, 37)] * 2          # any length — n is symbolic
_, mu, lower, upper = pred.predict(xq, sigma=2)

_, mu_ref, _, _ = model.predict(xq)
for j in range(2):
    assert np.allclose(mu[j], mu_ref[j], rtol=1e-6, atol=1e-8)
print("served mean matches Model.predict on", [len(m) for m in mu], "points")
