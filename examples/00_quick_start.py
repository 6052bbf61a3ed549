"""Quick start: two-channel multi-output GP with the MOSM kernel
(mirrors the reference tutorial examples/00_Quick_Start.ipynb)."""
import numpy as np
import matplotlib
matplotlib.use("Agg")
import mogptk_tpu as mogptk

t = np.linspace(0, 10, 100)
y1 = np.sin(0.5 * 2 * np.pi * t) + 0.1 * np.random.randn(len(t))
y2 = 2.0 * np.sin(0.2 * 2 * np.pi * t) + 0.1 * np.random.randn(len(t))

dataset = mogptk.DataSet(t, [y1, y2], names=["A", "B"])
for channel in dataset:
    channel.transform(mogptk.TransformStandard())
    channel.remove_randomly(pct=0.3)

model = mogptk.MOSM(dataset, Q=2)
model.init_parameters("LS")
model.train(method="Adam", lr=0.02, iters=300, verbose=True)

X, mu, lower, upper = model.predict()
print("MAE:", model.error("MAE"))
fig, _ = model.plot_prediction()
fig.savefig("/tmp/quick_start_prediction.png", dpi=80)
print("saved /tmp/quick_start_prediction.png")
